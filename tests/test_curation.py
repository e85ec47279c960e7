"""Curation extensions: boilerplate-line removal, token-budget
selection, temperature sampling, split assignment, sessionization, and
the char-entropy profile (extensions/curation.py, operators/
sessionize.py, functions/textfns.py)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sqlbackuphistoryetl_spark.extensions.curation import (
    assign_split,
    remove_boilerplate_lines,
    select_token_budget,
    temperature_rates,
    temperature_sample,
)
from sqlbackuphistoryetl_spark.functions.textfns import char_entropy_profile
from sqlbackuphistoryetl_spark.operators.sessionize import (
    session_stats,
    sessionize,
)


# ------------------------------------------------------------ boilerplate


def _lined_docs(spark):
    rows = [
        (1, "COOKIE BANNER\nunique alpha\n\nbody one\nCOOKIE BANNER"),
        (2, "COOKIE BANNER\nbody two"),
        (3, "COOKIE BANNER\nbody three\n  COOKIE BANNER  "),
        (4, "only unique text here"),
        (5, "COOKIE BANNER"),  # all-boilerplate doc
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_boilerplate_removed_order_preserved(spark):
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate_lines(_lined_docs(spark), min_docs=3).collect()
    }
    # the banner (trimmed form, in 4 docs) goes; unique lines and the
    # EMPTY line stay, in original order
    assert out[1]["clean_text"] == "unique alpha\n\nbody one"
    assert out[1]["removed_lines"] == 2
    assert out[2]["clean_text"] == "body two"
    assert out[3]["clean_text"] == "body three"  # trimmed form matched
    assert out[4]["clean_text"] == "only unique text here"
    assert out[4]["removed_lines"] == 0
    # all-boilerplate doc survives, empty
    assert out[5]["clean_text"] == "" and out[5]["kept_lines"] == 0
    assert out[5]["removed_lines"] == 1


def test_boilerplate_threshold_not_met(spark):
    docs = spark.createDataFrame(
        [(1, "shared\na"), (2, "shared\nb")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in remove_boilerplate_lines(docs, min_docs=3).collect()}
    assert out[1]["clean_text"] == "shared\na"  # df=2 < 3 ⇒ kept


# ------------------------------------------------------------ token budget


def test_token_budget_take_while(spark):
    # quality order: d3 (q=9, 5 tok), d1 (q=7, 4 tok), d2 (q=5, 3 tok)
    docs = spark.createDataFrame(
        [(1, 7, 4), (2, 5, 3), (3, 9, 5)], ["doc_id", "q", "n_tok"]
    )
    out = select_token_budget(docs, 9, "n_tok", "q", "doc_id")
    got = {r["doc_id"]: r["cum_tokens"] for r in out.collect()}
    assert got == {3: 5, 1: 9}  # d2 would reach 12 > 9

    none = select_token_budget(docs, 0, "n_tok", "q", "doc_id")
    assert none.count() == 0
    with pytest.raises(ValueError):
        select_token_budget(docs, -1, "n_tok", "q", "doc_id")


def test_token_budget_matches_naive_window(spark):
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 17).alias("q"),
        (F.col("id") % 7 + 1).alias("n_tok"),
    )
    out = select_token_budget(docs, 300, "n_tok", "q", "doc_id")
    docs.createOrReplaceTempView("tb_docs")
    naive = docs.sparkSession.sql(
        """select doc_id, cum_tokens from (
             select doc_id, cast(sum(n_tok) over (order by q desc, doc_id
               rows between unbounded preceding and current row) as long)
               as cum_tokens
             from tb_docs) where cum_tokens <= 300"""
    )
    got = {(r["doc_id"], r["cum_tokens"]) for r in out.collect()}
    want = {(r["doc_id"], r["cum_tokens"]) for r in naive.collect()}
    assert got == want and len(want) > 0


# ------------------------------------------------------- temperature mix


def test_temperature_rates_shape():
    rates = temperature_rates({"en": 400, "de": 80, "fr": 20}, 200)
    # rarer groups keep a larger fraction; caps at 1.0
    assert rates["fr"] == 1.0
    assert rates["de"] > rates["en"] > 0
    assert temperature_rates({"x": 0}, 10)["x"] == 0.0


def test_temperature_sample_deterministic_and_balanced(spark):
    docs = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 8, "en").otherwise("fr").alias("lang"),
    )
    a = temperature_sample(docs, "lang", 300, "doc_id")
    b = temperature_sample(docs, "lang", 300, "doc_id")
    ra = {r["doc_id"] for r in a.collect()}
    assert ra == {r["doc_id"] for r in b.collect()}  # pure function of ids
    by_lang = {r["lang"]: r["cnt"] for r in a.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    # en (800 docs) must be downsampled harder than fr (200 docs)
    assert by_lang["en"] / 800 < by_lang["fr"] / 200


# ------------------------------------------------------------- tvt split


def test_assign_split_stable_under_growth(spark):
    docs = spark.range(500).select(F.col("id").alias("doc_id"))
    first = {r["doc_id"]: r["split"] for r in assign_split(docs, "doc_id").collect()}
    grown = spark.range(1500).select(F.col("id").alias("doc_id"))
    second = {r["doc_id"]: r["split"] for r in assign_split(grown, "doc_id").collect()}
    assert all(second[d] == s for d, s in first.items())  # frozen eval set
    counts = {}
    for s in second.values():
        counts[s] = counts.get(s, 0) + 1
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    with pytest.raises(ValueError):
        assign_split(docs, "doc_id", weights=[("a", 0.5), ("b", 0.4)])


# ---------------------------------------------------------- sessionize


def _events(spark):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: three events inside one session, then a 2h gap
        (1, 1, t0, 1.004),
        (2, 1, t0 + dt.timedelta(minutes=10), 2.0),
        (3, 1, t0 + dt.timedelta(minutes=35), 3.0),
        (4, 1, t0 + dt.timedelta(hours=3), 4.0),
        # user 2: simultaneous events tie-break on event_id
        (5, 2, t0, 0.5),
        (6, 2, t0, 0.5),
    ]
    return spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "value"]
    )


def test_sessionize_gap_and_ties(spark):
    s = sessionize(_events(spark), gap_minutes=30)
    seqs = {r["event_id"]: r["session_seq"] for r in s.collect()}
    assert seqs[1] == 1 and seqs[2] == 1  # 10 min gap: same session
    assert seqs[3] == 1  # 25 min after event 2: still within the gap
    assert seqs[4] == 2  # 2h25m idle ⇒ new session
    assert seqs[5] == 1 and seqs[6] == 1


def test_session_stats_exact_cents(spark):
    out = session_stats(_events(spark), gap_minutes=60)
    rows = {(r["user_id"], r["session_seq"]): r for r in out.collect()}
    first = rows[(1, 1)]
    assert first["n_events"] == 3
    # 1.004 → 100 cents (floor(x·100+0.5)), 2.0 → 200, 3.0 → 300
    assert first["value_cents"] == 600
    assert rows[(1, 2)]["n_events"] == 1
    assert rows[(2, 1)]["n_events"] == 2 and rows[(2, 1)]["value_cents"] == 100


# ------------------------------------------------------------ entropy


def test_char_entropy_known_values(spark):
    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in char_entropy_profile(docs).collect()}
    assert out[1]["entropy_bits"] == pytest.approx(0.0, abs=1e-6)
    assert out[2]["entropy_bits"] == pytest.approx(1.0, abs=1e-6)
    assert out[3]["entropy_bits"] == pytest.approx(2.0, abs=1e-6)
    assert out[2]["distinct_chars"] == 2
    assert out[3]["max_char_ratio"] == pytest.approx(0.25)
    assert out[1]["n_chars_counted"] == 4


# ------------------------------------------------- surprisal / outliers


def test_unigram_surprisal_hand_computed(spark):
    import math

    from sqlbackuphistoryetl_spark.functions.textfns import (
        unigram_surprisal_score,
    )

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in unigram_surprisal_score(docs).collect()}
    # corpus: a×2, b×2, c×1, total 5
    s = {t: math.log2(5) - math.log2(c) for t, c in [("a", 2), ("b", 2), ("c", 1)]}
    sq = {t: math.floor(v * 1e6 + 0.5) / 1e6 for t, v in s.items()}
    assert out[1]["n_tok"] == 3
    assert out[1]["mean_surprisal_bits"] == pytest.approx(
        (2 * sq["a"] + sq["b"]) / 3, abs=1e-9
    )
    assert out[2]["mean_surprisal_bits"] == pytest.approx(
        (sq["b"] + sq["c"]) / 2, abs=1e-9
    )


def test_trim_outliers_mad_fence(spark):
    from sqlbackuphistoryetl_spark.extensions.curation import (
        robust_outlier_bounds,
        trim_outliers,
    )

    df = spark.createDataFrame(
        [("g", v) for v in [10, 11, 12, 13, 1000]] + [("h", 5)],
        ["grp", "val"],
    )
    b = {r["grp"]: r for r in robust_outlier_bounds(df, "grp", "val", k=3.0).collect()}
    assert b["g"]["med"] == 12.0 and b["g"]["mad"] == 1.0
    kept = trim_outliers(df, "grp", "val", k=3.0)
    vals = sorted(r["val"] for r in kept.filter(F.col("grp") == "g").collect())
    assert vals == [10, 11, 12, 13]  # 1000 outside 12 ± 3
    # single-row group: MAD 0 ⇒ only the median survives (degenerate but
    # defined); h's sole row equals its own median, so it stays
    assert kept.filter(F.col("grp") == "h").count() == 1


# ------------------------------------------------- caps / sharded export


def test_cap_per_group_best_first(spark):
    from sqlbackuphistoryetl_spark.extensions.curation import cap_per_group

    df = spark.createDataFrame(
        [(i, "a" if i < 8 else "b", i * 10) for i in range(10)],
        ["doc_id", "src", "q"],
    )
    out = cap_per_group(df, "src", 3, ["-q", "doc_id"])
    by_src = {}
    for r in out.collect():
        by_src.setdefault(r["src"], []).append(r["doc_id"])
    assert sorted(by_src["a"]) == [5, 6, 7]  # top-3 by q desc
    assert sorted(by_src["b"]) == [8, 9]  # group smaller than cap: all kept


def test_write_sharded_jsonl_stable_order(spark, tmp_path):
    import json as jsonlib
    import glob

    from sqlbackuphistoryetl_spark.extensions.sharding import (
        write_sharded_jsonl,
    )

    df = spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") * 2).alias("payload")
    )
    path = str(tmp_path / "shards")
    n_shards = write_sharded_jsonl(df, path, ["doc_id"], shard_size=30)
    assert n_shards == 4  # 30+30+30+10

    # every shard holds its contiguous ordinal run; records carry ordinal
    seen = {}
    for d in glob.glob(f"{path}/shard=*"):
        shard = int(d.rsplit("=", 1)[1])
        rows = []
        for f in glob.glob(f"{d}/part-*.json"):
            with open(f) as fh:
                rows += [jsonlib.loads(line) for line in fh if line.strip()]
        seen[shard] = sorted(r["ordinal"] for r in rows)
    assert seen[0] == list(range(0, 30))
    assert seen[3] == list(range(90, 100))
    # ordinal order == doc_id order (the declared export order)
    full = spark.read.json(f"{path}")
    pairs = [(r["ordinal"], r["doc_id"]) for r in full.collect()]
    assert sorted(pairs) == [(i, i) for i in range(100)]


# ------------------------------------------------------------- funnel


def test_funnel_greedy_chain(spark):
    import pytest as _pt

    from sqlbackuphistoryetl_spark.operators.sessionize import (
        funnel_conversion,
    )

    t0 = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    rows = [
        # u1 completes in order, with decoys (click before view ignored)
        (1, 1, t0 + 0 * m, "click"),
        (2, 1, t0 + 1 * m, "view"),
        (3, 1, t0 + 2 * m, "click"),
        (4, 1, t0 + 3 * m, "purchase"),
        # u2 breaks at click (purchase precedes any click)
        (5, 2, t0 + 0 * m, "view"),
        (6, 2, t0 + 1 * m, "purchase"),
        # u3 never starts
        (7, 3, t0 + 0 * m, "purchase"),
        # u4: same-timestamp view/click — strict > excludes the tie
        (8, 4, t0, "view"),
        (9, 4, t0, "click"),
    ]
    ev = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "event_type"])
    out = {r["user_id"]: r for r in
           funnel_conversion(ev, ["view", "click", "purchase"]).collect()}
    assert out[1]["steps_completed"] == 3
    assert out[1]["step_0_ts"] == t0 + 1 * m  # earliest view, not the click
    assert out[1]["step_1_ts"] == t0 + 2 * m
    assert out[2]["steps_completed"] == 1
    assert out[2]["step_1_ts"] is None
    assert out[3]["steps_completed"] == 0
    assert out[4]["steps_completed"] == 1  # tie is not strictly after
    with _pt.raises(ValueError):
        funnel_conversion(ev, [])


def test_temperature_alpha_variants():
    from sqlbackuphistoryetl_spark.extensions.curation import (
        temperature_rates,
    )

    counts = {"big": 6400, "small": 100}
    flat = temperature_rates(counts, 200, alpha=0.25)
    mid = temperature_rates(counts, 200, alpha=0.5)
    steep = temperature_rates(counts, 200, alpha=0.75)
    # lower α flattens harder: the big/small keep-rate gap shrinks
    assert (flat["big"] / flat["small"]) < (mid["big"] / mid["small"]) \
        < (steep["big"] / steep["small"])
    # α=0.5 path unchanged by the generalization (same sqrt composition)
    import math
    w_big = math.floor(math.sqrt(6400 * 1e12))
    w_small = math.floor(math.sqrt(100 * 1e12))
    denom = w_big + w_small
    assert mid["big"] == min(1.0, (200 * w_big) / (denom * 6400))
    with pytest.raises(ValueError):
        temperature_rates(counts, 200, alpha=0.3)


# ------------------------------------------------------- RAG chunking


def test_chunk_documents_windows(spark):
    from sqlbackuphistoryetl_spark.extensions.curation import chunk_documents

    docs = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "ab"), (3, "")], ["doc_id", "text"]
    )
    out = chunk_documents(docs, chunk_chars=5, overlap=2)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["chunk_start"], r["chunk_text"])
        )
    # step 3: starts 0,3,6 — last ragged; consecutive share 2 chars
    assert sorted(by_doc[1]) == [
        (0, 0, "abcde"), (1, 3, "defgh"), (2, 6, "ghij")]
    # shorter than chunk (and than overlap boundary): one chunk
    assert by_doc[2] == [(0, 0, "ab")]
    assert 3 not in by_doc  # empty doc: no chunks
    # reconstruction: stripping the overlap from every chunk after the
    # first yields the original text
    parts = [t if i == 0 else t[2:] for i, _, t in sorted(by_doc[1])]
    assert "".join(parts) == "abcdefghij"
    import pytest as _pt
    with _pt.raises(ValueError):
        chunk_documents(docs, chunk_chars=0)
    with _pt.raises(ValueError):
        chunk_documents(docs, chunk_chars=5, overlap=5)


def test_compact_minhash_index_preserves_queries(spark, tmp_path):
    import glob

    from sqlbackuphistoryetl_spark.extensions.dedup_index import (
        append_minhash_index,
        compact_minhash_index,
        query_minhash_index,
        write_minhash_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = str(tmp_path / "idx")
    write_minhash_index(docs.filter(F.col("doc_id") < 100), path)
    # several small appends → file fragmentation
    for lo in range(100, 400, 100):
        append_minhash_index(
            docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 100)),
            path,
        )
    probe = docs.filter(F.col("doc_id") >= 400)
    before_pairs = {(r["incoming_id"], r["index_id"])
                    for r in query_minhash_index(spark, probe, path).collect()}
    files_before = len(glob.glob(f"{path}/entries/band=*/part-*"))
    compact_minhash_index(spark, path)
    files_after = len(glob.glob(f"{path}/entries/band=*/part-*"))
    after_pairs = {(r["incoming_id"], r["index_id"])
                   for r in query_minhash_index(spark, probe, path).collect()}
    assert after_pairs == before_pairs
    assert files_after < files_before


def test_leakage_safe_split_keeps_pairs_together(spark):
    from sqlbackuphistoryetl_spark.extensions.curation import (
        assign_split,
        assign_split_leakage_safe,
    )

    docs = spark.range(2000).select(F.col("id").alias("doc_id"))
    # chains: (0,1),(1,2) one group; (10,11); every 50th pairs with +1
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)]
        + [(i, i + 1) for i in range(100, 2000, 50)],
        ["id_a", "id_b"],
    )
    out = assign_split_leakage_safe(docs, pairs, "doc_id")
    split = {r["doc_id"]: r["split"] for r in out.collect()}
    assert split[0] == split[1] == split[2]
    assert split[10] == split[11]
    for i in range(100, 2000, 50):
        assert split[i] == split[i + 1], i
    # unpaired docs match the plain assignment (growth stability)
    plain = {r["doc_id"]: r["split"]
             for r in assign_split(docs, "doc_id").collect()}
    paired_ids = {0, 1, 2, 10, 11} | {
        j for i in range(100, 2000, 50) for j in (i, i + 1)}
    for d, s in split.items():
        if d not in paired_ids:
            assert s == plain[d]


def test_leakage_safe_split_string_uuid_ids(spark):
    """r3 ADVICE (medium): non-numeric ids used to be nulled by a
    cast("long") inside connected_components, silently emptying the
    component map — near-dup pairs could then straddle train/test. With
    the cast removed, string/UUID ids must group exactly like longs."""
    from sqlbackuphistoryetl_spark.extensions.curation import (
        assign_split_leakage_safe,
    )

    ids = [f"6e0f{i:04d}-aaaa-bbbb-cccc-{i:012d}" for i in range(200)]
    docs = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    pairs = spark.createDataFrame(
        [(ids[0], ids[1]), (ids[1], ids[2]), (ids[50], ids[51])],
        ["id_a", "id_b"],
    )
    out = assign_split_leakage_safe(docs, pairs, "doc_id")
    split = {r["doc_id"]: r["split"] for r in out.collect()}
    assert split[ids[0]] == split[ids[1]] == split[ids[2]]
    assert split[ids[50]] == split[ids[51]]
    assert len(split) == 200


def test_connected_components_rejects_null_ids(spark):
    import pytest

    from sqlbackuphistoryetl_spark.extensions.clustering import (
        connected_components,
    )

    pairs = spark.createDataFrame([(1, 2), (None, 3)], "id_a long, id_b long")
    with pytest.raises(ValueError, match="null ids"):
        connected_components(pairs)


def test_compression_ratio_signal(spark):
    import zlib

    from sqlbackuphistoryetl_spark.extensions.curation import compression_ratio

    prose = "The quick brown fox jumps over the lazy dog near the bank."
    template = "click here " * 40
    docs = spark.createDataFrame(
        [(1, prose), (2, template), (3, None), (4, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in compression_ratio(docs).collect()}
    # exact pinned values: stdlib zlib level 6 is deterministic
    want = len(zlib.compress(prose.encode(), 6))
    assert out[1]["raw_bytes"] == len(prose.encode())
    assert out[1]["zlib_bytes"] == want
    assert out[1]["ratio_ppm"] == want * 1_000_000 // len(prose.encode())
    # repetitive template compresses far below prose
    assert out[2]["ratio_ppm"] < out[1]["ratio_ppm"] // 3
    assert out[3]["raw_bytes"] is None and out[3]["ratio_ppm"] is None
    assert out[4]["raw_bytes"] == 0 and out[4]["ratio_ppm"] is None
    # cross-run determinism (the rows-only gate's substitute contract)
    again = {r["doc_id"]: r for r in compression_ratio(docs).collect()}
    assert all(
        again[k]["ratio_ppm"] == out[k]["ratio_ppm"] for k in out
    )
