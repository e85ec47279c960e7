"""Unit tests for the round-3 pipeline terminals: decontamination,
global shard assignment, backward as-of join, repetition profile —
the edge cases the DuckDB oracle gate can't exercise (nulls, ties,
strict-before semantics, empty inputs)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sqlbackuphistoryetl_spark.extensions.decontam import contamination_overlap
from sqlbackuphistoryetl_spark.extensions.sharding import global_ordinals
from sqlbackuphistoryetl_spark.functions.textfns import repetition_profile
from sqlbackuphistoryetl_spark.operators.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


# ---------------------------------------------------------------- asof


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01T10:00:00"), 1),
            ("A", _ts("2024-01-01T10:00:05"), 2),
            ("A", _ts("2024-01-01T09:00:00"), 3),  # before any quote
            ("B", _ts("2024-01-01T10:00:00"), 4),  # key with no quotes
        ],
        "sym string, ts timestamp, trade_id int",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01T10:00:00"), 100.0, 10),
            ("A", _ts("2024-01-01T10:00:00"), 101.0, 11),  # same-ts tie
            ("A", _ts("2024-01-01T10:00:03"), 102.0, 12),
        ],
        "sym string, ts timestamp, px double, qid int",
    )
    return trades, quotes


def test_asof_backward_exact_matches(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, ["sym"], "ts", ["px", "qid"], tiebreak_cols=["qid"]
    )
    rows = {r["trade_id"]: r for r in out.collect()}
    assert len(rows) == 4
    # equal ts allowed; tie at 10:00:00 resolved by LARGEST qid
    assert rows[1]["asof_px"] == 101.0 and rows[1]["asof_qid"] == 11
    # 10:00:05 sees the 10:00:03 quote
    assert rows[2]["asof_px"] == 102.0
    # trade before all quotes and key with no quotes -> nulls
    assert rows[3]["asof_px"] is None
    assert rows[4]["asof_px"] is None and rows[4]["asof_qid"] is None


def test_asof_backward_strict(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades,
        quotes,
        ["sym"],
        "ts",
        ["px"],
        allow_exact_matches=False,
        tiebreak_cols=["qid"],
    )
    rows = {r["trade_id"]: r for r in out.collect()}
    # strictly-before: the 10:00:00 trade must NOT see the 10:00:00 quotes
    assert rows[1]["asof_px"] is None
    assert rows[2]["asof_px"] == 102.0


def test_asof_null_payload_field_stays_row_consistent(spark):
    """A null FIELD in the newest right row must surface as null — not
    fall through to an older row's non-null value (the per-column
    last(ignorenulls) bug the struct payload exists to prevent)."""
    left = spark.createDataFrame(
        [("A", _ts("2024-01-01T12:00:00"), 1)], "k string, ts timestamp, lid int"
    )
    right = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01T10:00:00"), "old-value", 1),
            ("A", _ts("2024-01-01T11:00:00"), None, 2),  # newest, null field
        ],
        "k string, ts timestamp, v string, rid int",
    )
    out = asof_join(left, right, ["k"], "ts", ["v", "rid"]).collect()[0]
    assert out["asof_rid"] == 2
    assert out["asof_v"] is None  # NOT "old-value"


# ---------------------------------------------------------------- sharding


def test_global_ordinals_dense_and_ordered(spark):
    df = spark.range(0, 1000).select(
        F.col("id"),
        (F.col("id") % 7).alias("grp"),
    ).repartition(13)  # scrambled physical layout
    out = global_ordinals(df, ["grp", "id"], shard_size=64, num_partitions=8)
    rows = out.orderBy("ordinal").collect()
    assert [r["ordinal"] for r in rows] == list(range(1000))
    # ordinal order == (grp, id) lexicographic order
    keys = [(r["grp"], r["id"]) for r in rows]
    assert keys == sorted(keys)
    assert all(r["shard"] == r["ordinal"] // 64 for r in rows)
    # dense shard sizes: every shard but the last has exactly 64 rows
    from collections import Counter

    sizes = Counter(r["shard"] for r in rows)
    assert all(sizes[s] == 64 for s in list(sizes)[:-1])


def test_global_ordinals_empty_input(spark):
    df = spark.range(0).select(F.col("id"))
    out = global_ordinals(df, ["id"], shard_size=10)
    assert out.count() == 0


def test_adaptive_partitions_narrow_small_cap_large(spark):
    """Derived sort width (r13): confidently small inputs narrow below
    defaultParallelism, explicit counts pass through, and unknown/huge
    estimates keep the full width."""
    from sqlbackuphistoryetl_spark.extensions.sharding import (
        _adaptive_partitions,
    )

    cap = spark.sparkContext.defaultParallelism
    small = spark.range(0, 100).select(F.col("id"))
    assert _adaptive_partitions(small, None) < max(cap, 2)
    assert _adaptive_partitions(small, None) >= 1
    assert _adaptive_partitions(small, 7) == 7
    # a checkpointed frame carries its TRUE size -> still narrows
    ckpt = spark.range(0, 10).localCheckpoint(eager=True)
    assert _adaptive_partitions(ckpt, None) >= 1
    # a huge estimate keeps the full width (the 100 TB direction)
    big_est = spark.range(0, 1 << 40).select(F.col("id"))
    assert _adaptive_partitions(big_est, None) == cap


def test_global_ordinals_width_invariant(spark):
    """ordinal/shard are rank-in-total-order values — identical for any
    range-sort width (the derived-width change can never move them)."""
    df = spark.range(0, 500).select(
        F.col("id"), (F.col("id") % 5).alias("grp")
    ).repartition(11)
    base = {
        r["id"]: (r["ordinal"], r["shard"])
        for r in global_ordinals(
            df, ["grp", "id"], shard_size=37, num_partitions=1
        ).collect()
    }
    for p in (None, 3, 16):
        got = {
            r["id"]: (r["ordinal"], r["shard"])
            for r in global_ordinals(
                df, ["grp", "id"], shard_size=37, num_partitions=p
            ).collect()
        }
        assert got == base


# ---------------------------------------------------------------- decontam


def test_contamination_counts(spark):
    bench = spark.createDataFrame(
        [(0, "alpha beta gamma delta")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            (1, "x alpha beta gamma y"),      # shares 'alpha beta gamma'
            (2, "alpha beta gamma delta z"),  # shares 2 benchmark 3-grams
            (3, "nothing shared here at all"),
            (4, "too short"),                 # < n tokens -> 0 grams
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in contamination_overlap(train, bench, n=3).collect()
    }
    assert out[1]["n_contaminated"] == 1 and out[1]["n_ngrams"] == 3
    assert out[2]["n_contaminated"] == 2
    assert out[3]["n_contaminated"] == 0
    assert out[4]["n_ngrams"] == 0 and out[4]["contaminated_frac"] == 0.0


# ---------------------------------------------------------------- repetition


def test_repetition_profile_known_values(spark):
    docs = spark.createDataFrame(
        [
            (1, "a a a b"),        # top unigram 3/4; bigram 'a a' 2/3
            (2, "w x y z"),        # all distinct
            (3, "solo"),           # single token: no bigrams
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_profile(docs).collect()}
    assert out[1]["n_tokens"] == 4
    assert out[1]["distinct_ratio"] == 0.5
    assert out[1]["top_unigram_frac"] == 0.75
    assert out[1]["top_bigram_frac"] == pytest.approx(2 / 3)
    assert out[2]["distinct_ratio"] == 1.0 and out[2]["top_unigram_frac"] == 0.25
    assert out[3]["n_tokens"] == 1 and out[3]["top_bigram_frac"] == 0.0


def test_asof_join_forward_direction(spark):
    """direction='forward' attaches the EARLIEST right row at-or-after
    each left timestamp (pandas merge_asof parity), sharing the single
    union-then-window shuffle with the backward form."""
    import datetime as dtm

    from sqlbackuphistoryetl_spark.operators.asof import asof_join

    t = lambda m: dtm.datetime(2024, 1, 1, 12, m)  # noqa: E731
    left = spark.createDataFrame(
        [(1, "k", t(10)), (2, "k", t(30)), (3, "k", t(50)), (4, "z", t(0))],
        ["lid", "key", "ts"],
    )
    right = spark.createDataFrame(
        [("k", t(10), "at10"), ("k", t(20), "at20"), ("k", t(40), "at40")],
        ["key", "ts", "tag"],
    )
    fwd = {r["lid"]: r["asof_tag"] for r in asof_join(
        left, right, ["key"], "ts", ["tag"], direction="forward").collect()}
    assert fwd == {1: "at10", 2: "at40", 3: None, 4: None}
    strict = {r["lid"]: r["asof_tag"] for r in asof_join(
        left, right, ["key"], "ts", ["tag"], direction="forward",
        allow_exact_matches=False).collect()}
    assert strict[1] == "at20"  # the exact at10 match excluded
    import pytest as _pt
    with _pt.raises(ValueError):
        asof_join(left, right, ["key"], "ts", ["tag"], direction="nearest")
