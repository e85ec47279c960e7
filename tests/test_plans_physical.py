"""Physical-plan quality gates (SURVEY §4): the optimizations we rely
on at 100 TB must actually appear in the plan — filters reaching the
parquet scan, small dims broadcast, no Python in the hot path."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sqlbackuphistoryetl_spark import schema
from sqlbackuphistoryetl_spark.sources.extract import extract_backup_history
from sqlbackuphistoryetl_spark.sources.fixtures import consolidated_rows, raw_source_tables
from sqlbackuphistoryetl_spark.sources.readers import SourceTables


def _explain(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _parquet_sources(spark, tmp_path):
    """Persist raw tables to parquet so scans are real FileSourceScanExec."""
    src = raw_source_tables(spark)
    base = tmp_path / "raw"
    names = ["backupset", "backupmediafamily", "backupfile", "databases",
             "replica_states", "availability_groups"]
    for n in names:
        getattr(src, n).write.mode("overwrite").parquet(str(base / f"{n}.parquet"))
    return SourceTables(
        **{n: spark.read.parquet(str(base / f"{n}.parquet")) for n in names}
    )


def test_watermark_filter_pushed_to_scan(spark, tmp_path):
    src = _parquet_sources(spark, tmp_path)
    df = extract_backup_history(src, dt.datetime(2025, 1, 1, 10, 0))
    plan = _explain(df)
    # the watermark predicate must reach the backupset parquet scan
    assert "PushedFilters" in plan
    assert "backup_finish_date" in plan.split("PushedFilters")[1][:500]


def test_dimension_joins_broadcast(spark, tmp_path):
    src = _parquet_sources(spark, tmp_path)
    df = extract_backup_history(src, dt.datetime(2025, 1, 1, 10, 0))
    plan = _explain(df)
    assert plan.count("BroadcastHashJoin") >= 3  # databases, replica_states, AGs
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python anywhere


def test_extract_column_pruning(spark, tmp_path):
    src = _parquet_sources(spark, tmp_path)
    narrow = extract_backup_history(src, dt.datetime(2025, 1, 1, 10, 0)).select(
        "database_name", "BackupType"
    )
    plan = _explain(narrow)
    # pruned scan of backupset should NOT read every column: the narrow
    # projection needs database_name/type plus join keys; encryption
    # columns must be pruned out of ReadSchema
    scan_schema = plan.split("ReadSchema")[1][:400]
    assert "encryptor_type" not in scan_schema
    assert "key_algorithm" not in scan_schema


def test_chain_scan_prunes_partitions(spark, tmp_path):
    from sqlbackuphistoryetl_spark.operators.merge import idempotent_append

    target = str(tmp_path / "consolidated")
    df = spark.createDataFrame(consolidated_rows(), schema.CONSOLIDATED)
    idempotent_append(spark, df, target)
    sink = spark.read.parquet(target)
    pruned = sink.filter(F.col("backup_date") == F.lit("2025-01-01"))
    plan = _explain(pruned)
    assert "PartitionFilters" in plan
    assert "backup_date" in plan.split("PartitionFilters")[1][:300]


def _docs(spark):
    rows = [(i, f"alpha beta gamma delta epsilon zeta {i} eta theta") for i in range(50)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_ngram_jaccard_plan_no_cartesian(spark):
    """The inverted-index all-pairs jaccard must never plan an N² join:
    pairs form only through the gram equi-join, and the posting list is
    a persisted (reused) subplan."""
    from sqlbackuphistoryetl_spark.extensions.dedup import ngram_jaccard_all_pairs

    df = ngram_jaccard_all_pairs(_docs(spark), text_col="text", id_col="doc_id")
    plan = _explain(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "InMemoryTableScan" in plan  # posting list materialized once
    assert "BatchEvalPython" not in plan


def test_minhash_lsh_plan_no_cartesian(spark):
    from sqlbackuphistoryetl_spark.extensions.dedup import minhash_lsh_candidates

    df = minhash_lsh_candidates(_docs(spark), text_col="text", id_col="doc_id")
    plan = _explain(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan  # band join is an equi-join
    assert "BatchEvalPython" not in plan


def test_simhash_plan_no_cartesian(spark):
    from sqlbackuphistoryetl_spark.extensions.dedup import simhash_buckets

    df = simhash_buckets(_docs(spark), text_col="text", id_col="doc_id")
    plan = _explain(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_brute_force_topk_broadcasts_queries(spark):
    """Exact ANN is a deliberate broadcast cross join: queries (small)
    broadcast against the corpus — the plan must show the broadcast,
    never a shuffle cartesian."""
    from sqlbackuphistoryetl_spark.extensions.similarity import brute_force_topk

    vecs = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.0]) for i in range(30)], ["vec_id", "embedding"]
    )
    df = brute_force_topk(vecs, vecs.limit(2), k=3)
    plan = _explain(df)
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_rp_lsh_plan_equi_join(spark):
    from sqlbackuphistoryetl_spark.extensions.similarity import rp_lsh_topk

    vecs = spark.createDataFrame(
        [(i, [float(i % 7), 1.0, float(i % 3), 0.5]) for i in range(40)],
        ["vec_id", "embedding"],
    )
    df = rp_lsh_topk(vecs, vecs.limit(2), k=3, planes=8, band_bits=4, dims=4)
    plan = _explain(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan  # bucket join is equi
