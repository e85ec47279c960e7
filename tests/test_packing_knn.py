"""Unit tests for sequence packing (concat-and-chunk span metadata) and
k-NN label voting — the edge cases the DuckDB oracle gate can't reach
(zero-token docs, doc >> seq_len, vote ties, pluggable neighbor stage)
plus the plan shapes the 100 TB design depends on."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from sqlbackuphistoryetl_spark.extensions.packing import global_cumsum, pack_sequences
from sqlbackuphistoryetl_spark.extensions.similarity import knn_label_vote


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# ---------------------------------------------------------------- packing


@pytest.fixture(scope="module")
def docs(spark):
    # tokens: 3, 0 (dropped), 10, 5, 4  → cumsum 3, 13, 18, 22
    return spark.createDataFrame(
        [(0, 3), (1, 0), (2, 10), (3, 5), (4, 4)], "doc_id long, n_tok long"
    )


def test_pack_sequences_spans(spark, docs):
    out = (
        pack_sequences(docs, "n_tok", ["doc_id"], seq_len=8)
        .orderBy("seq_id", "doc_id")
        .collect()
    )
    got = [(r.seq_id, r.doc_id, r.tok_begin, r.tok_end) for r in out]
    # stream: d0[0,3) d2[3,13) d3[13,18) d4[18,22); seqs of 8 tokens
    assert got == [
        (0, 0, 0, 3),   # d0 fully in seq 0
        (0, 2, 0, 5),   # d2 tokens 0..5 fill seq 0
        (1, 2, 5, 10),  # d2 tokens 5..10 open seq 1
        (1, 3, 0, 3),   # d3 tokens 0..3 close seq 1 (stream pos 13..16)
        (2, 3, 3, 5),   # d3 tail opens seq 2
        (2, 4, 0, 4),   # d4 fully in seq 2
    ]
    # zero-token doc 1 occupies no stream position
    assert all(r.doc_id != 1 for r in out)
    # every slice is non-empty and within the doc
    assert all(r.tok_end > r.tok_begin for r in out)


def test_pack_sequences_doc_longer_than_seq(spark):
    df = spark.createDataFrame([(0, 20)], "doc_id long, n_tok long")
    out = pack_sequences(df, "n_tok", ["doc_id"], seq_len=8).orderBy("seq_id").collect()
    assert [(r.seq_id, r.tok_begin, r.tok_end) for r in out] == [
        (0, 0, 8), (1, 8, 16), (2, 16, 20),
    ]


def test_pack_sequences_conservation(spark, docs):
    """Slices tile each document exactly once: per-doc slice_tokens sum
    back to n_tok, and every full sequence holds exactly seq_len."""
    out = pack_sequences(docs, "n_tok", ["doc_id"], seq_len=8)
    per_doc = {
        r.doc_id: r.s
        for r in out.groupBy("doc_id").agg(F.sum("slice_tokens").alias("s")).collect()
    }
    assert per_doc == {0: 3, 2: 10, 3: 5, 4: 4}
    per_seq = {
        r.seq_id: r.s
        for r in out.groupBy("seq_id").agg(F.sum("slice_tokens").alias("s")).collect()
    }
    assert per_seq == {0: 8, 1: 8, 2: 6}  # last sequence is the remainder


def test_global_cumsum_matches_naive(spark):
    df = spark.createDataFrame(
        [(i, (i * 7) % 5) for i in range(200)], "doc_id long, w long"
    )
    got = {
        r.doc_id: r.cum_end
        for r in global_cumsum(df, "w", ["doc_id"], num_partitions=7).collect()
    }
    acc, want = 0, {}
    for i in range(200):
        acc += (i * 7) % 5
        want[i] = acc
    assert got == want


def test_packing_plan_no_single_task_window(spark, docs):
    """The global cumsum must never funnel the corpus through one task:
    no SinglePartition exchange, and the window runs partitioned by the
    physical partition id."""
    out = pack_sequences(docs, "n_tok", ["doc_id"], seq_len=8, num_partitions=4)
    plan = _explain(out)
    assert "SinglePartition" not in plan
    assert "rangepartitioning" in plan  # the one range exchange
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------- knn vote


@pytest.fixture(scope="module")
def labeled_vecs(spark):
    # three tight clusters on the axes; labels follow clusters
    rows = []
    for i in range(6):
        rows.append((i, [1.0, 0.01 * i, 0.0], 0))
    for i in range(6, 12):
        rows.append((i, [0.01 * i, 1.0, 0.0], 1))
    for i in range(12, 18):
        rows.append((i, [0.0, 0.01 * i, 1.0], 2))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_knn_vote_predicts_cluster_label(spark, labeled_vecs):
    queries = labeled_vecs.filter(F.col("vec_id").isin(0, 7, 13))
    out = {
        r.query_id: (r.predicted_label, r.votes)
        for r in knn_label_vote(labeled_vecs, queries, k=5).collect()
    }
    assert out[0] == (0, 5)
    assert out[7] == (1, 5)
    assert out[13] == (2, 5)


def test_knn_vote_tie_breaks_smallest_label(spark):
    # two neighbors each of labels 3 and 5 at identical geometry:
    # the 4-NN vote ties 2-2 and must pick label 3
    rows = [
        (0, [1.0, 0.0], 9),
        (1, [1.0, 0.001], 5),
        (2, [1.0, -0.001], 5),
        (3, [1.0, 0.002], 3),
        (4, [1.0, -0.002], 3),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = knn_label_vote(df, df.filter(F.col("vec_id") == 0), k=4).collect()
    assert len(out) == 1
    assert out[0].predicted_label == 3
    assert out[0].votes == 2


def test_knn_vote_pluggable_topk(spark, labeled_vecs):
    """The approximate scale path drops in without touching the vote:
    an injected neighbor stage (here: brute force restricted to one
    cluster) changes the candidates, not the voting semantics."""
    from sqlbackuphistoryetl_spark.extensions.similarity import brute_force_topk

    only_cluster1 = labeled_vecs.filter(F.col("label") == 1)
    out = knn_label_vote(
        labeled_vecs,
        labeled_vecs.filter(F.col("vec_id") == 0),
        k=3,
        topk_fn=lambda c, q, kk: brute_force_topk(only_cluster1, q, k=kk),
    ).collect()
    assert out[0].predicted_label == 1  # votes can only come from cluster 1


# ---------------------------------------------------------------- pii


def test_redact_pii_all_categories(spark):
    from sqlbackuphistoryetl_spark.functions.textfns import pii_counts, redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@x-corp.co.uk now, ip 192.168.0.1, "
                "ssn 123-45-6789, tel +44 20 7946 0958 ok"),
            (2, "clean text with no identifiers at all"),
            (3, "two mails: a@b.io and c@d.io"),
        ],
        "id long, text string",
    )
    out = {
        r.id: r
        for r in df.select(
            "id", *pii_counts("text"), redact_pii("text").alias("red")
        ).collect()
    }
    assert (out[1].n_email, out[1].n_ssn, out[1].n_ip, out[1].n_phone) == (1, 1, 1, 1)
    assert out[1].red == (
        "mail <EMAIL> now, ip <IP>, ssn <SSN>, tel <PHONE> ok"
    )
    assert out[2].red == "clean text with no identifiers at all"
    assert out[2].n_email == 0
    assert out[3].n_email == 2
    assert out[3].red == "two mails: <EMAIL> and <EMAIL>"


def test_redact_pii_order_protects_ssn_from_phone(spark):
    """xxx-xx-xxxx must surface as <SSN>, never be half-consumed by the
    generic phone shape (pattern order is part of the contract)."""
    from sqlbackuphistoryetl_spark.functions.textfns import redact_pii

    df = spark.createDataFrame([("ssn 321-54-9876 then +1 555 123 4567",)], ["text"])
    red = df.select(redact_pii("text").alias("r")).collect()[0].r
    assert red == "ssn <SSN> then <PHONE>"


def test_redact_pii_plan_is_map_side(spark):
    from sqlbackuphistoryetl_spark.functions.textfns import redact_pii

    df = spark.createDataFrame([("x",)], ["text"]).select(redact_pii("text"))
    plan = _explain(df)
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------- rarity


def test_rare_token_profile_counts(spark):
    from sqlbackuphistoryetl_spark.functions.textfns import rare_token_profile

    df = spark.createDataFrame(
        [
            (1, "common common common"),
            (2, "common weird"),
            (3, "common common oddball"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_grams, r.n_rare, r.rare_ratio)
        for r in rare_token_profile(df, min_count=2, ngram_n=1).collect()
    }
    # 'common' appears 6x (frequent); 'weird'/'oddball' once each (rare)
    assert out[1] == (3, 0, 0.0)
    assert out[2] == (2, 1, 0.5)
    assert out[3] == (3, 1, 1.0 / 3.0)


def test_rare_token_profile_trigrams_short_doc(spark):
    """Docs shorter than n emit ONE short gram (never zero — a 2-token
    doc still gets scored), and identical short docs make each other
    frequent."""
    from sqlbackuphistoryetl_spark.functions.textfns import rare_token_profile

    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "x y z w")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_grams, r.n_rare)
        for r in rare_token_profile(df, min_count=2, ngram_n=3).collect()
    }
    assert out[1] == (1, 0)  # "a b" gram appears twice -> frequent
    assert out[2] == (1, 0)
    assert out[3] == (2, 2)  # "x y z", "y z w" are singletons


# ---------------------------------------------------------------- centroids


def test_label_centroid_sums_exact(spark):
    from sqlbackuphistoryetl_spark.extensions.similarity import label_centroid_sums

    df = spark.createDataFrame(
        [
            (0, [1.0, -0.5]),
            (0, [0.5, 0.25]),
            (1, [-1.0, 2.0]),
        ],
        "label int, embedding array<float>",
    )
    out = {
        (r.label, r.dim): (r.qsum, r.n)
        for r in label_centroid_sums(df).collect()
    }
    # floor(x*1e6 + 0.5): exact components quantize exactly
    assert out[(0, 0)] == (1_500_000, 2)
    assert out[(0, 1)] == (-500_000 + 250_000, 2)
    assert out[(1, 0)] == (-1_000_000, 1)
    assert out[(1, 1)] == (2_000_000, 1)
    # recovered centroid: qsum / (n * scale)
    assert abs(out[(0, 0)][0] / (2 * 1e6) - 0.75) < 1e-6


def test_materialize_sequences_equals_stream_chunks(spark):
    """Reassembled sequences must equal chunking the concatenated token
    stream directly — no gap, overlap, or misorder across doc splits."""
    from sqlbackuphistoryetl_spark.extensions.packing import (
        materialize_sequences,
        pack_sequences,
    )

    rows = [(i, " ".join(f"d{i}t{j}" for j in range(3 + i))) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with_tok = df.selectExpr(
        "doc_id", "size(regexp_extract_all(text, '\\\\S+', 0)) as n_tok"
    )
    spans = pack_sequences(with_tok, "n_tok", ["doc_id"], seq_len=7)
    got = {
        r.seq_id: (r.seq_tokens, r.seq_text)
        for r in materialize_sequences(spans, df).collect()
    }
    stream = [t for i in range(6) for t in rows[i][1].split()]
    want = {
        k: (len(stream[k * 7 : (k + 1) * 7]),
            " ".join(stream[k * 7 : (k + 1) * 7]))
        for k in range((len(stream) + 6) // 7)
    }
    assert got == want


# ---------------------------------------------------------------- PCA


def test_covariance_sums_hand_values(spark):
    from sqlbackuphistoryetl_spark.extensions.similarity import (
        covariance_sums,
    )

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], ["vec_id", "embedding"]
    )
    s = {(r["i"], r["j"]): r["s"] for r in covariance_sums(emb).collect()}
    assert s[(-1, -1)] == 2
    assert s[(0, -1)] == 1000 and s[(1, -1)] == 1000
    assert s[(0, 0)] == 1_000_000 and s[(1, 1)] == 1_000_000
    assert s[(0, 1)] == 0
    assert len(s) == 3 + 2 + 1  # triangle + dims + count


def test_pca_project_variance_and_determinism(spark):
    import numpy as np

    from sqlbackuphistoryetl_spark.extensions.similarity import pca_project

    # strongly correlated 2D cloud: PC1 must align with the diagonal
    rows = [(i, [float(i % 21 - 10), float(i % 21 - 10) + (0.2 if i % 2 else -0.2)])
            for i in range(200)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    proj, ev = pca_project(emb, k=2)
    P = np.array([r["proj"] for r in proj.orderBy("vec_id").collect()])
    v = P.var(axis=0)
    assert v[0] > 100 * v[1]  # diagonal dominates
    assert ev[0] > 100 * ev[1]
    # deterministic incl. sign across calls
    proj2, _ = pca_project(emb, k=2)
    P2 = np.array([r["proj"] for r in proj2.orderBy("vec_id").collect()])
    assert np.array_equal(P, P2)
    import pytest as _pt
    one = spark.createDataFrame([(1, [1.0, 2.0])], ["vec_id", "embedding"])
    with _pt.raises(ValueError):
        pca_project(one, k=1)


def test_covariance_arrow_jvm_bit_identical(spark):
    """The Arrow (batched int64 matmul) and JVM (nested-transform)
    covariance paths must produce the SAME exact integer sums — the
    property that lets the fast path inherit the oracle gate."""
    from sqlbackuphistoryetl_spark.extensions.similarity import (
        covariance_sums,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = {(r["i"], r["j"]): r["s"]
         for r in covariance_sums(emb, impl="arrow").collect()}
    j = {(r["i"], r["j"]): r["s"]
         for r in covariance_sums(emb, impl="jvm").collect()}
    assert a == j and len(a) == 64 * 65 // 2 + 64 + 1
