"""Quality sanity checks for the training-data-pipeline extensions —
not just 'runs', but 'finds what it must find'."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sqlbackuphistoryetl_spark.extensions.dedup import (
    minhash_lsh_candidates,
    ngram_jaccard_verify,
    simhash_buckets,
)
from sqlbackuphistoryetl_spark.extensions.multimodal import (
    decode_image,
    extract_payload_metadata,
)
from sqlbackuphistoryetl_spark.extensions.similarity import (
    brute_force_topk,
    mine_hard_negatives,
    rp_lsh_topk,
    rrf_fuse,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base),
        (2, base),  # exact dup
        (3, base.replace("today", "tomorrow")),  # near dup
        (4, "completely different content about spark query engines and shuffles"),
        (5, "yet another unrelated document mentioning databases and backups"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_minhash_finds_dups_not_unrelated(spark, docs):
    pairs = {(r["id_a"], r["id_b"]): r["est_jaccard"]
             for r in minhash_lsh_candidates(docs, min_est_jaccard=0.5).collect()}
    assert pairs.get((1, 2)) == 1.0  # exact dup: identical signatures
    assert (1, 3) in pairs or (2, 3) in pairs  # near dup caught
    assert (1, 4) not in pairs and (4, 5) not in pairs


def test_ngram_jaccard_exact_verify(spark, docs):
    cand = minhash_lsh_candidates(docs, min_est_jaccard=0.3)
    verified = {(r["id_a"], r["id_b"]): r["jaccard"]
                for r in ngram_jaccard_verify(docs, cand).collect()}
    assert verified[(1, 2)] == 1.0
    if (1, 3) in verified:
        assert 0.5 < verified[(1, 3)] < 1.0


def test_minhash_cross_screens_incoming_only(spark, docs):
    """Incremental dedup: candidates pair incoming against existing only
    — never existing-vs-existing (the cost the cross path exists to
    avoid) — and the planted cross-corpus dup is found."""
    from sqlbackuphistoryetl_spark.extensions.dedup import minhash_lsh_cross

    existing = docs.filter(F.col("doc_id").isin(1, 4))
    incoming = docs.filter(F.col("doc_id").isin(2, 3, 5))
    pairs = {
        (r["incoming_id"], r["existing_id"]): r["est_jaccard"]
        for r in minhash_lsh_cross(
            incoming, existing, min_est_jaccard=0.5
        ).collect()
    }
    assert pairs.get((2, 1)) == 1.0          # exact dup across corpora
    assert (3, 1) in pairs                   # near dup across corpora
    assert all(i in (2, 3, 5) and e in (1, 4) for i, e in pairs)
    assert (5, 4) not in pairs               # unrelated docs stay apart


def test_simhash_buckets(spark, docs):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in simhash_buckets(docs, max_hamming=3).collect()}
    assert pairs.get((1, 2)) == 0  # identical docs: distance 0
    assert all(h <= 3 for h in pairs.values())


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.99, 0.1, 0.0, 0.0]),   # nearest to 1
        (3, [0.0, 1.0, 0.0, 0.0]),    # orthogonal to 1
        (4, [-1.0, 0.0, 0.0, 0.0]),   # opposite
        (5, [0.7, 0.7, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )


def test_brute_force_topk_exact(spark, vectors):
    q = vectors.filter(F.col("vec_id") == 1)
    out = brute_force_topk(vectors, q, k=3).collect()
    assert [r["neighbor_id"] for r in out] == [2, 5, 3]
    assert out[0]["cosine"] == pytest.approx(0.99 / (0.99**2 + 0.01) ** 0.5, rel=1e-6)


def test_rp_lsh_recalls_close_neighbor(spark, vectors):
    q = vectors.filter(F.col("vec_id") == 1)
    out = rp_lsh_topk(vectors, q, k=2, planes=16, band_bits=4, dims=4).collect()
    # near-identical vectors share sketch bands with overwhelming odds
    assert out and out[0]["neighbor_id"] == 2


def test_multimodal_metadata_plumbing(spark):
    import hashlib

    rows = [(1, b"hello world", "text/plain"), (2, None, "image/png"),
            (3, b"\x89PNG...", "image/png")]
    df = spark.createDataFrame(rows, ["doc_id", "payload", "content_type"])
    out = {r["doc_id"]: r for r in extract_payload_metadata(df).collect()}
    assert out[1]["byte_len"] == 11
    assert out[1]["sha256"] == hashlib.sha256(b"hello world").hexdigest()
    assert out[1]["decode_status"] == "ok"
    assert out[2]["byte_len"] is None and out[2]["sha256"] is None
    assert out[3]["decode_status"] == "stubbed"


def test_decode_image_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_decode_and_featurize_shape_and_determinism(spark):
    from sqlbackuphistoryetl_spark.extensions.multimodal import decode_and_featurize

    rows = [(1, b"frame-data-a", "image/png"), (2, b"frame-data-b", "image/png"),
            (3, None, "image/png")]
    df = spark.createDataFrame(rows, ["doc_id", "payload", "content_type"])
    out = {r["doc_id"]: r for r in decode_and_featurize(df, feature_dim=16).collect()}
    assert len(out[1]["feature"]) == 16
    assert all(-1.0 <= v <= 1.0 for v in out[1]["feature"])
    assert out[1]["feature"] != out[2]["feature"]  # payload-dependent
    assert out[3]["feature"] is None
    # deterministic across runs
    again = {r["doc_id"]: r for r in decode_and_featurize(df, feature_dim=16).collect()}
    assert again[1]["feature"] == out[1]["feature"]


def test_featurize_feeds_similarity_search(spark):
    from sqlbackuphistoryetl_spark.extensions.multimodal import decode_and_featurize
    from sqlbackuphistoryetl_spark.extensions.similarity import brute_force_topk

    rows = [(i, f"payload-{i}".encode(), "image/png") for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "payload", "content_type"])
    feats = decode_and_featurize(df, feature_dim=8).select(
        "doc_id", "feature"
    )
    out = brute_force_topk(feats, feats.limit(2), k=3, id_col="doc_id", vec_col="feature")
    assert out.count() == 6  # 2 queries x top-3


def test_sample_frames_fanout(spark):
    from sqlbackuphistoryetl_spark.extensions.multimodal import sample_frames

    payload = bytes(range(256)) * 2  # 512 bytes -> 8 frames of 64
    df = spark.createDataFrame(
        [(7, payload, "video/mp4"), (8, None, "video/mp4")],
        ["doc_id", "payload", "content_type"],
    )
    out = sample_frames(df, frame_size=64, stride=2).collect()
    by_idx = {r["frame_index"]: r for r in out}
    assert sorted(by_idx) == [0, 2, 4, 6]  # every 2nd of 8 frames
    assert all(r["doc_id"] == 7 and r["n_frames"] == 8 for r in out)
    assert by_idx[2]["frame_bytes"] == payload[128:192]
    assert all(r["decoder"] == "fake-slice" for r in out)  # non-AVI path


def test_resize_image_is_stubbed():
    from sqlbackuphistoryetl_spark.extensions.multimodal import resize_image

    with pytest.raises(NotImplementedError):
        resize_image(b"\x89PNG", 64, 64)


def test_jaccard_implementations_agree(spark):
    """ngram_jaccard_all_pairs (inverted index) must equal
    ngram_jaccard_verify (array intersect/union) on every pair with a
    shared gram."""
    from sqlbackuphistoryetl_spark.extensions.dedup import (
        ngram_jaccard_all_pairs,
        ngram_jaccard_verify,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "completely different text with no overlap at all"),
        (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (5, "short text"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    inv = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in ngram_jaccard_all_pairs(docs).collect()
    }
    ids = docs.select(F.col("doc_id").alias("_gid"))
    pairs = (
        ids.alias("a")
        .join(ids.alias("b"), F.col("a._gid") < F.col("b._gid"))
        .select(F.col("a._gid").alias("id_a"), F.col("b._gid").alias("id_b"))
    )
    ver = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in ngram_jaccard_verify(docs, pairs).collect()
        if r["jaccard"] > 0
    }
    assert inv == ver
    assert inv[(1, 4)] == 1.0  # exact dup


def test_ivf_topk_recalls_close_neighbor(spark):
    from sqlbackuphistoryetl_spark.extensions.similarity import ivf_topk

    import random

    rng = random.Random(7)
    base = [rng.uniform(-1, 1) for _ in range(16)]
    near = list(base)
    near[0] += 0.01
    rows = [(1, base), (2, near)] + [
        (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(3, 120)
    ]
    vecs = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = ivf_topk(
        vecs, vecs.filter(F.col("vec_id") == 1), k=1, n_centroids=16, n_probe=4
    ).collect()
    assert out and out[0]["neighbor_id"] == 2


def test_ngram_stop_gram_cap_bounds_candidates(spark):
    """A planted hot gram (shared by every doc) must not generate
    candidates once df > max_gram_df; pairs sharing rare grams survive
    with jaccard identical to the uncapped path."""
    from sqlbackuphistoryetl_spark.extensions.dedup import ngram_jaccard_all_pairs

    hot = "common boiler plate"  # one 3-gram present in every doc
    rows = [(i, f"{hot} unique{i} filler{i} words{i}") for i in range(1, 40)]
    # docs 100/101 share a rare tail beyond the hot gram
    rows += [(100, f"{hot} alpha beta gamma delta epsilon"),
             (101, f"{hot} alpha beta gamma delta zeta")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    capped = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in ngram_jaccard_all_pairs(docs, max_gram_df=10).collect()
    }
    # hot-gram-only pairs are pruned: candidate set is bounded by the
    # rare-gram posting list, not the 41*40/2 hot-gram pair explosion
    assert (1, 2) not in capped
    assert len(capped) < 10
    # the rare-gram pair survives, scored over its FULL gram set
    assert (100, 101) in capped
    uncapped = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in ngram_jaccard_all_pairs(docs).collect()
    }
    assert capped[(100, 101)] == uncapped[(100, 101)]
    # a cap nothing exceeds reproduces the exact output bit-for-bit
    high = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in ngram_jaccard_all_pairs(docs, max_gram_df=10_000).collect()
    }
    assert high == uncapped


def test_rp_lsh_self_join_symmetric(spark, vectors):
    """queries IS corpus → the persisted self-join fast path. Neighbor
    relation must be symmetric for the mutually-nearest pair and the
    cosine must bit-match brute_force_topk (same dot/(na*nb) formula)."""
    out = rp_lsh_topk(vectors, vectors, k=2, planes=16, band_bits=4, dims=4)
    rows = out.collect()
    by_query = {}
    for r in rows:
        by_query.setdefault(r["query_id"], []).append(r)
    # 1 and 2 are near-identical: each must surface the other as top hit
    assert by_query[1][0]["neighbor_id"] == 2
    assert by_query[2][0]["neighbor_id"] == 1
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in brute_force_topk(vectors, vectors, k=2).collect()
    }
    for r in rows:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact:
            assert r["cosine"] == exact[key]  # bit-identical, not approx


def test_unit_normalizes_once_per_row(spark, vectors):
    """_unit: elements equal x/||v|| and the result has L2 norm 1.
    The implementation binds the norm through a single-element outer
    transform (expression-level let) so the aggregate runs once per row,
    not once per element — this asserts the values stay correct."""
    import math

    from sqlbackuphistoryetl_spark.extensions.similarity import _norm, _unit

    out = vectors.select(
        "vec_id", _unit(F.col("embedding")).alias("u"), _norm(F.col("embedding")).alias("n")
    ).collect()
    for r in out:
        assert abs(math.sqrt(sum(x * x for x in r["u"])) - 1.0) < 1e-12
        orig = dict((row["vec_id"], row["embedding"]) for row in vectors.collect())[r["vec_id"]]
        for x, ux in zip(orig, r["u"]):
            assert abs(ux - x / r["n"]) < 1e-12


def test_cache_generations_bounded_and_releasable(spark, docs, vectors):
    """VERDICT r2 #4: repeated pipeline calls must not accumulate
    session-lifetime cache blocks; release_caches() empties everything."""
    from sqlbackuphistoryetl_spark.extensions import cachereg
    from sqlbackuphistoryetl_spark.extensions.dedup import (
        ngram_jaccard_all_pairs,
        simhash_buckets,
    )
    from sqlbackuphistoryetl_spark.extensions.similarity import embedding_near_dup_pairs

    def n_cached():
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    cachereg.release_caches()
    base = n_cached()
    for _ in range(3):  # each generation replaces the previous one
        minhash_lsh_candidates(docs, min_est_jaccard=0.5).count()
    assert n_cached() <= base + 1
    for _ in range(2):
        simhash_buckets(docs, max_hamming=3).count()
        ngram_jaccard_all_pairs(docs).count()
        rp_lsh_topk(vectors, vectors, k=2, planes=16, band_bits=4, dims=4).count()
        embedding_near_dup_pairs(vectors, threshold=0.9).count()
    # one live GENERATION per owner, max — a generation may hold more
    # than one frame (ngram_jaccard persists posting + sizes since r4,
    # the per-gram df aggregate since the r6 prefilter rework, and the
    # pairable gram sliver since the checkpoint→registered-persist swap
    # — the old localCheckpoint's blocks were owned by nobody and only
    # ContextCleaner/GC ever freed them, so this very count was
    # GC-timing-flaky)
    assert n_cached() <= base + 8
    cachereg.release_caches()
    # back to the foreign baseline: other test modules sharing this
    # session may hold their own (non-cachereg) persisted frames
    assert n_cached() <= base


def test_kmeans_centroids_converge_and_drive_ivf(spark):
    """train_centroids_kmeans on three separated blobs must place one
    centroid near each blob mean, and ivf_topk(centroids=trained) at
    full probe must reproduce brute-force top-k exactly."""
    import random

    from sqlbackuphistoryetl_spark.extensions.similarity import (
        ivf_topk,
        train_centroids_kmeans,
    )

    rng = random.Random(7)
    blobs = {0: [10.0, 0.0, 0.0, 0.0], 1: [0.0, 10.0, 0.0, 0.0], 2: [0.0, 0.0, 10.0, 0.0]}
    rows = []
    for i in range(120):
        b = blobs[i % 3]
        rows.append((i, [x + rng.uniform(-0.5, 0.5) for x in b]))
    vecs = spark.createDataFrame(rows, ["vec_id", "embedding"])

    cents = train_centroids_kmeans(vecs, n_centroids=3, iters=4,
                                   sample_rows_per_centroid=64)
    assert len(cents) == 3 and all(len(c) == 4 for c in cents)
    # each blob mean has a trained centroid within noise distance
    for b in blobs.values():
        d = min(sum((x - y) ** 2 for x, y in zip(b, c)) ** 0.5 for c in cents)
        assert d < 1.0, (b, cents)

    queries = vecs.filter(F.col("vec_id") < 6)
    approx = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ivf_topk(vecs, queries, k=3, n_probe=3, centroids=cents).collect()
    }
    exact = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in brute_force_topk(vecs, queries, k=3).collect()
    }
    assert approx == exact


def test_embedding_cross_contamination_equals_exact(spark):
    """Cross-corpus LSH screen vs exact brute-force cross product at a
    threshold under the banding's recall bound: identical pair sets."""
    from sqlbackuphistoryetl_spark.extensions.similarity import (
        embedding_cross_contamination,
        with_cosine,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    bench = emb.filter(F.col("vec_id") < 10)
    corpus = emb.filter(F.col("vec_id") >= 10)
    got = {
        (r["corpus_id"], r["bench_id"])
        for r in embedding_cross_contamination(
            corpus, bench, threshold=0.35, planes=32, band_bits=2
        ).collect()
    }
    exact = (
        corpus.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
        .crossJoin(
            bench.select(F.col("vec_id").alias("bid"), F.col("embedding").alias("bv"))
        )
    )
    exact = with_cosine(exact, "cv", "bv")
    want = {
        (r["cid"], r["bid"])
        for r in exact.filter(F.col("cosine") >= 0.35).collect()
    }
    assert got == want and len(want) > 0


def test_bm25_scores_hand_computed(spark):
    """BM25 against a hand-derived score on a 3-doc corpus."""
    import math

    from pyspark.sql import functions as F

    from sqlbackuphistoryetl_spark.functions.textfns import bm25_scores

    docs = spark.createDataFrame(
        [
            (1, "data model data pipeline"),        # dl=4, tf(data)=2 tf(model)=1
            (2, "the cat sat"),                      # dl=3, no query terms... 'the'!
            (3, "unrelated words here entirely"),    # dl=4, no match
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in bm25_scores(
        docs, ["data", "model"], k1=1.2, b=0.75).collect()}
    assert set(out) == {1}
    n, avgdl = 3, (4 + 3 + 4) / 3
    def idf(df_t):
        return math.log(1.0 + (n - df_t + 0.5) / (df_t + 0.5))
    def contrib(tf, dl, df_t, k1=1.2, b=0.75):
        return idf(df_t) * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))
    expected = contrib(2, 4, 1) + contrib(1, 4, 1)
    assert abs(out[1]["bm25"] - expected) < 1e-9
    assert out[1]["n_matched_terms"] == 2

    import pytest

    with pytest.raises(ValueError):
        bm25_scores(docs, [])


def test_ngram_containment_subset_doc(spark):
    """A doc fully contained in a larger one must score containment 1.0
    from its side even though Jaccard is small."""
    from sqlbackuphistoryetl_spark.extensions.dedup import (
        ngram_containment_pairs,
    )

    small = "alpha beta gamma delta epsilon"
    big = small + " " + " ".join(f"w{i} x{i} y{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, small), (2, big), (3, "totally different words only")],
        ["doc_id", "text"],
    )
    rows = {(r["id_a"], r["id_b"]): r for r in ngram_containment_pairs(
        docs, n=3, min_containment=0.5).collect()}
    assert (1, 2) in rows
    r = rows[(1, 2)]
    assert r["containment_a"] == 1.0          # all of small's grams in big
    assert r["containment_b"] < 0.1           # big barely overlaps small
    assert r["shared"] == r["n_a"]
    assert (1, 3) not in rows and (2, 3) not in rows


def test_ngram_containment_capped_counts_exact(spark):
    """With a stop-gram cap, surviving pairs' shared counts must equal
    the uncapped exact counts (the cap only gates candidate generation)."""
    from pyspark.sql import functions as F

    from sqlbackuphistoryetl_spark.extensions.dedup import (
        ngram_containment_pairs,
    )

    # 'common common common' grams are shared by every doc (hot gram)
    docs = spark.createDataFrame(
        [(i, f"common common common unique{i} tail{i} shared shared shared")
         for i in range(6)],
        ["doc_id", "text"],
    )
    uncapped = {
        (r["id_a"], r["id_b"]): (r["shared"], r["containment_a"])
        for r in ngram_containment_pairs(docs, n=3, min_containment=0.0).collect()
    }
    capped = {
        (r["id_a"], r["id_b"]): (r["shared"], r["containment_a"])
        for r in ngram_containment_pairs(
            docs, n=3, min_containment=0.0, max_gram_df=100).collect()
    }
    # cap of 100 excludes nothing here: identical outputs
    assert capped == uncapped


def test_ngram_rescore_scope_equivalence(spark):
    """rescore_candidates_only must be a pure performance knob: capped
    Jaccard and containment outputs are identical either way."""
    from sqlbackuphistoryetl_spark.extensions.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_all_pairs,
    )

    # hot prefix (df=40, over the cap) + per-pair unique phrases (df=2)
    # so candidates survive the stop-gram cap and the hot grams still
    # count in the exact re-score
    rows = []
    for i in range(20):
        body = f"alpha beta gamma secret{i} phrase{i} marker{i} omega theta"
        rows.append((i, body))
        rows.append((i + 100, body + f" extra{i}"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    for fn, kw in (
        (ngram_jaccard_all_pairs, dict(max_gram_df=10)),
        (ngram_containment_pairs, dict(max_gram_df=10, min_containment=0.0)),
    ):
        a = {tuple(sorted(r.asDict().items()))
             for r in fn(docs, **kw, rescore_candidates_only=False).collect()}
        b = {tuple(sorted(r.asDict().items()))
             for r in fn(docs, **kw, rescore_candidates_only=True).collect()}
        assert a == b and a, fn.__name__


def test_ivf_index_probe_equals_one_shot(spark, tmp_path):
    """The persisted inverted file (ivf_build_index → ivf_probe_index)
    must return exactly what one-shot ivf_topk returns for the same
    centroids — stored norms/cosines are the same IEEE expressions as
    recomputed ones — at partial AND full probe."""
    import random

    from sqlbackuphistoryetl_spark.extensions.similarity import (
        ivf_build_index,
        ivf_probe_index,
        ivf_topk,
        sampled_centroids,
    )

    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(150)]
    vecs = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = sampled_centroids(vecs, 8)
    path = str(tmp_path / "ivf")
    returned = ivf_build_index(vecs, path, centroids=cents)
    assert returned == cents
    queries = vecs.filter(F.col("vec_id") < 5)

    for n_probe in (3, 8):  # partial (pruned scan) and full probe
        probe = {
            (r["query_id"], r["rank"]): (r["neighbor_id"], round(r["cosine"], 12))
            for r in ivf_probe_index(
                spark, path, queries, cents, k=4, n_probe=n_probe
            ).collect()
        }
        one_shot = {
            (r["query_id"], r["rank"]): (r["neighbor_id"], round(r["cosine"], 12))
            for r in ivf_topk(
                vecs, queries, k=4, n_probe=n_probe, centroids=cents
            ).collect()
        }
        assert probe == one_shot


def test_ivf_probe_prunes_partitions(spark, tmp_path):
    """At partial probe the index scan must read only probed cell
    directories: the IN-list lands on the partition column, so the
    FileSourceScan's partition filters carry it and the scan reads a
    strict subset of the cell dirs."""
    import random

    from sqlbackuphistoryetl_spark.extensions.similarity import (
        ivf_build_index,
        ivf_probe_index,
        sampled_centroids,
    )

    rng = random.Random(13)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(200)]
    vecs = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = sampled_centroids(vecs, 8)
    path = str(tmp_path / "ivf")
    ivf_build_index(vecs, path, centroids=cents)
    out = ivf_probe_index(
        spark, path, vecs.filter(F.col("vec_id") == 0), cents, k=3, n_probe=2
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    # A bare "cell" mention is satisfied by the join's implicit
    # isnotnull(cell) even with pruning regressed (r5 advice) — require
    # the driver-side IN-list itself: `cell#… IN (…)` or `cell#… = n`
    # (Catalyst folds a single-probe list to equality).
    assert m and re.search(r"cell#\d+L? (IN \(|= )", m.group(1)), plan


def test_capped_no_hot_skips_rescore(spark):
    """r6 cost cut: with a cap no gram exceeds, the string-joined
    candidate counts are exact, so the array re-score (collect_list +
    array_intersect) must NOT appear in the plan; with hot grams
    present it must. Guards the has_hot driver decision both ways."""
    from sqlbackuphistoryetl_spark.extensions.dedup import (
        ngram_containment_pairs,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma secret{i % 4} tail{i % 4} word{i}")
         for i in range(12)],
        ["doc_id", "text"],
    )
    lazy_no_hot = ngram_containment_pairs(
        docs, n=3, min_containment=0.0, max_gram_df=10_000
    )
    plan = lazy_no_hot._jdf.queryExecution().optimizedPlan().toString()
    assert "collect_list" not in plan, plan
    lazy_hot = ngram_containment_pairs(
        docs, n=3, min_containment=0.0, max_gram_df=5
    )
    plan_hot = lazy_hot._jdf.queryExecution().optimizedPlan().toString()
    assert "collect_list" in plan_hot, plan_hot


class TestHardNegativeMining:
    def _emb(self, spark, rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )

    def test_ranks_margins_and_exclusions(self, spark):
        corpus = self._emb(spark, [
            (0, [1.0, 0.0], 0),        # query
            (1, [0.9, 0.1], 0),        # positive (same label, not a negative)
            (2, [1.0, 0.01], 1),       # hard negative: cos ~ 1
            (3, [0.0, 1.0], 1),        # easy negative: cos 0
            (4, [-1.0, 0.0], 2),       # antipodal negative: cos -1
        ])
        out = {
            r["neighbor_id"]: r
            for r in mine_hard_negatives(
                corpus, corpus.filter(F.col("vec_id") == 0), k=5
            ).collect()
        }
        # the same-label row is never a negative; self is excluded
        assert set(out) == {2, 3, 4}
        assert [out[i]["rank"] for i in (2, 3, 4)] == [1, 2, 3]
        # margins grow as negatives get easier, hard one is negative
        pos = out[2]["pos_cosine"]
        assert all(abs(r["pos_cosine"] - pos) < 1e-9 for r in out.values())
        assert out[2]["margin"] < 0 < out[3]["margin"] < out[4]["margin"]
        assert abs(out[3]["margin"] - pos) < 1e-6
        assert abs(out[4]["margin"] - (pos + 1.0)) < 1e-6

    def test_no_positive_yields_null_margin(self, spark):
        corpus = self._emb(spark, [
            (0, [1.0, 0.0], 7),   # unique label: no positive exists
            (1, [0.5, 0.5], 1),
            (2, [0.0, 1.0], 2),
        ])
        rows = mine_hard_negatives(
            corpus, corpus.filter(F.col("vec_id") == 0), k=5
        ).collect()
        assert len(rows) == 2
        assert all(r["pos_cosine"] is None and r["margin"] is None for r in rows)

    def test_k_truncates_per_query(self, spark):
        corpus = self._emb(
            spark,
            [(i, [1.0, float(i) / 10.0], i % 2) for i in range(12)],
        )
        out = mine_hard_negatives(
            corpus, corpus.filter(F.col("vec_id") < 2), k=3
        ).collect()
        per_q = {}
        for r in out:
            per_q.setdefault(r["query_id"], []).append(r)
        assert set(per_q) == {0, 1}
        for q, rows in per_q.items():
            assert len(rows) == 3
            assert sorted(r["rank"] for r in rows) == [1, 2, 3]
            # every returned negative has the other parity's label
            assert all(r["neighbor_label"] != q % 2 for r in rows)

    def test_queries_are_broadcast(self, spark):
        corpus = self._emb(spark, [(i, [1.0, 0.5], i % 3) for i in range(20)])
        plan = (
            mine_hard_negatives(corpus, corpus.filter(F.col("vec_id") < 2), k=2)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastNestedLoopJoin" in plan
        assert "BatchEvalPython" not in plan


class TestRRFFuse:
    def _rank(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, rank long")

    def test_hand_math_and_union_semantics(self, spark):
        a = self._rank(spark, [(1, 1), (2, 2)])
        b = self._rank(spark, [(2, 1), (3, 2)])
        out = {r["doc_id"]: r for r in rrf_fuse([a, b]).collect()}
        assert set(out) == {1, 2, 3}
        assert out[1]["rank_1"] == 1 and out[1]["rank_2"] is None
        assert abs(out[1]["rrf"] - 1 / 61) < 1e-12
        assert abs(out[2]["rrf"] - (1 / 62 + 1 / 61)) < 1e-12
        assert abs(out[3]["rrf"] - 1 / 62) < 1e-12

    def test_consensus_beats_single_list_head(self, spark):
        # doc 2 is mid-list in BOTH systems, doc 1 tops only one —
        # the k=60 damping makes the consensus doc win
        a = self._rank(spark, [(1, 1), (2, 2), (3, 3)])
        b = self._rank(spark, [(4, 1), (2, 2), (5, 3)])
        top = rrf_fuse([a, b], topn=1).collect()[0]
        assert top["doc_id"] == 2

    def test_topn_tie_breaks_on_id(self, spark):
        a = self._rank(spark, [(7, 1), (9, 2)])
        b = self._rank(spark, [(9, 1), (7, 2)])
        rows = rrf_fuse([a, b], topn=2).collect()
        # symmetric ranks -> equal rrf; id ascending decides
        assert [r["doc_id"] for r in rows] == [7, 9]

    def test_three_lists_and_custom_k(self, spark):
        lists = [self._rank(spark, [(1, r)]) for r in (1, 2, 3)]
        out = rrf_fuse(lists, k=10).collect()[0]
        assert abs(out["rrf"] - (1 / 11 + 1 / 12 + 1 / 13)) < 1e-12

    def test_empty_rankings_rejected(self, spark):
        with pytest.raises(ValueError):
            rrf_fuse([])


class TestProductQuantization:
    def test_train_encode_adc_pipeline(self, spark):
        import numpy as np

        from sqlbackuphistoryetl_spark.extensions.similarity import (
            pq_adc_topk,
            pq_encode,
            pq_train,
        )

        rng = np.random.RandomState(7)
        base = rng.randn(80, 16)
        # vec 1 is a near-copy of vec 0: PQ codes must coincide and ADC
        # must rank it first for query 0
        base[1] = base[0] + 0.01
        rows = [(i, [float(v) for v in base[i]]) for i in range(80)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

        books = pq_train(emb, m=4, k=8, iters=3)
        assert len(books) == 4 and len(books[0]) == 8 and len(books[0][0]) == 4
        # determinism: same call, same books
        assert pq_train(emb, m=4, k=8, iters=3) == books

        codes = {r["vec_id"]: r["codes"] for r in pq_encode(emb, books).collect()}
        assert len(codes) == 80 and all(len(c) == 4 for c in codes.values())
        assert codes[0] == codes[1]  # near-copies share a cell path
        assert all(0 <= c < 8 for c in codes[0])

        out = pq_adc_topk(
            pq_encode(emb, books), books,
            emb.filter("vec_id = 0"), topk=3,
        ).collect()
        ranked = [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])]
        # ADC of the query's own code is minimal; the near-copy ties it
        assert set(ranked[:2]) == {0, 1}

    def test_adc_plan_is_jvm_side(self, spark):
        import contextlib
        import io

        import numpy as np

        from sqlbackuphistoryetl_spark.extensions.similarity import (
            pq_adc_topk,
            pq_encode,
        )

        rng = np.random.RandomState(1)
        rows = [(i, [float(v) for v in rng.randn(8)]) for i in range(20)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        books = [[[0.0] * 4, [1.0] * 4]] * 2  # m=2, k=2
        codes = pq_encode(emb, books)
        out = pq_adc_topk(codes, books, emb.filter("vec_id = 0"), topk=2)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            out.explain("formatted")
        plan = buf.getvalue()
        # the scoring side: one broadcast join, no Python beyond the
        # encode stage's ArrowEvalPython, no cartesian explosion
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


class TestIVFPQ:
    def test_residual_encode_and_probe_search(self, spark):
        import numpy as np

        from sqlbackuphistoryetl_spark.extensions.similarity import (
            ivf_pq_encode,
            ivf_pq_topk,
        )

        rng = np.random.RandomState(3)
        # two well-separated clusters so coarse assignment is decisive
        a = rng.randn(40, 8) + 10.0
        b = rng.randn(40, 8) - 10.0
        base = np.vstack([a, b])
        base[1] = base[0] + 0.001  # near-copy inside cluster A
        rows = [(i, [float(v) for v in base[i]]) for i in range(80)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        coarse = [[10.0] * 8, [-10.0] * 8]
        books = [
            [[float(c) - 1.5] * 4 for c in range(4)] for _ in range(2)
        ]  # m=2, k=4 over the residual
        idx = ivf_pq_encode(emb, coarse, books)
        got = {r["vec_id"]: r for r in idx.collect()}
        assert all(got[i]["cell"] == 0 for i in range(40))
        assert all(got[i]["cell"] == 1 for i in range(40, 80))
        assert got[0]["codes"] == got[1]["codes"]  # near-copies share codes

        # n_probe=1: only cluster A candidates are scored for query 0
        out = ivf_pq_topk(
            idx, coarse, books, emb.filter("vec_id = 0"),
            n_probe=1, topk=50,
        ).collect()
        assert {r["cell"] for r in out} == {0}
        ranked = [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])]
        assert set(ranked[:2]) == {0, 1}
        # n_probe=2 reaches the other cluster too
        out2 = ivf_pq_topk(
            idx, coarse, books, emb.filter("vec_id = 0"),
            n_probe=2, topk=100,
        )
        assert out2.count() == 80
