"""Skew-safe aggregation (operators/skew.py) and sink compaction
(operators/retention.py: compact_partitions)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sqlbackuphistoryetl_spark.operators.skew import salted_agg


def test_salted_agg_equals_direct(spark):
    # hot key: 90% of rows on one key
    df = spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, "hot").otherwise(
            F.concat(F.lit("k"), (F.col("id") % 7).cast("string"))
        ).alias("k"),
        (F.col("id") % 100).alias("v"),
    )
    out = salted_agg(
        df, ["k"],
        [("v", "sum", "v_sum"), ("v", "count", "n"),
         ("v", "min", "v_min"), ("v", "max", "v_max")],
        buckets=8,
    )
    got = {r["k"]: (r["v_sum"], r["n"], r["v_min"], r["v_max"])
           for r in out.collect()}
    want = {r["k"]: (r["s"], r["n"], r["mn"], r["mx"])
            for r in df.groupBy("k").agg(
                F.sum("v").alias("s"), F.count("v").alias("n"),
                F.min("v").alias("mn"), F.max("v").alias("mx")).collect()}
    assert got == want
    with pytest.raises(ValueError):
        salted_agg(df, ["k"], [("v", "avg", "bad")])


def test_salted_agg_two_stage_plan(spark):
    from tests.test_plans_physical import _explain

    df = spark.range(100).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("v")
    )
    plan = _explain(salted_agg(df, ["k"], [("v", "sum", "s")], buckets=4))
    # two aggregate boundaries (each a partial+final HashAggregate pair)
    assert plan.count("HashAggregate") // 2 >= 3


def test_compact_partitions(spark, tmp_path):
    from sqlbackuphistoryetl_spark.operators.retention import (
        compact_partitions,
    )
    from sqlbackuphistoryetl_spark.operators.merge import PARTITION_COL
    import glob

    target = str(tmp_path / "sink")
    base = spark.range(50).select(
        F.col("id").alias("v"),
        F.lit("2025-01-01").alias(PARTITION_COL),
    )
    # many small appends -> many files in one date partition
    for _ in range(6):
        base.repartition(4).write.mode("append").partitionBy(
            PARTITION_COL).parquet(target)
    small = spark.range(5).select(
        F.col("id").alias("v"), F.lit("2025-01-02").alias(PARTITION_COL)
    )
    small.coalesce(1).write.mode("append").partitionBy(
        PARTITION_COL).parquet(target)

    before = spark.read.parquet(target)
    before_rows = sorted(r["v"] for r in before.collect())
    files_before = len(glob.glob(f"{target}/{PARTITION_COL}=2025-01-01/part-*"))
    assert files_before > 4

    n = compact_partitions(spark, target, max_files_per_partition=4)
    assert n == 1  # only the fragmented partition rewritten
    files_after = len(glob.glob(f"{target}/{PARTITION_COL}=2025-01-01/part-*"))
    assert files_after == 1
    after_rows = sorted(r["v"] for r in spark.read.parquet(target).collect())
    assert after_rows == before_rows  # byte-level relayout only
