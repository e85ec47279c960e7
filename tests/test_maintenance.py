"""Parquet small-file compaction (r9): file-count reduction, content
identity, no-op guard, partitioned layout, crash-window hygiene."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sqlbackuphistoryetl_spark.extensions.maintenance import (
    compact_parquet,
    table_stats,
)


def _fragmented(spark, path, n_rows=2000, n_files=32):
    (
        spark.range(n_rows)
        .select(
            F.col("id").alias("doc_id"),
            F.md5(F.col("id").cast("string")).alias("text"),
            (F.col("id") % 3).alias("part"),
        )
        .repartition(n_files)
        .write.mode("overwrite")
        .parquet(path)
    )


def test_compacts_and_preserves_content(spark, tmp_path):
    path = str(tmp_path / "t")
    _fragmented(spark, path)
    before = spark.read.parquet(path).orderBy("doc_id").collect()
    _, files_before = table_stats(spark, path)
    assert files_before >= 32

    stats = compact_parquet(spark, path, target_bytes=1 << 30)
    assert stats["skipped"] is False
    assert stats["files_before"] == files_before
    assert stats["files_after"] < files_before
    assert stats["files_after"] <= stats["n_out"]
    after = spark.read.parquet(path).orderBy("doc_id").collect()
    assert after == before
    # no leftover swap dirs
    assert not os.path.exists(path + ".compacting")
    assert not os.path.exists(path + ".pre-compact")


def test_noop_when_already_compact(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.range(100).coalesce(1).write.parquet(path)
    mtimes = {
        f: os.path.getmtime(os.path.join(path, f)) for f in os.listdir(path)
    }
    stats = compact_parquet(spark, path, target_bytes=1 << 30)
    assert stats["skipped"] is True
    # a no-op compaction must not rewrite a byte
    assert mtimes == {
        f: os.path.getmtime(os.path.join(path, f)) for f in os.listdir(path)
    }


def test_partitioned_layout_preserved(spark, tmp_path):
    path = str(tmp_path / "t")
    _fragmented(spark, path)
    # convert to a partitioned table first
    repart = str(tmp_path / "p")
    spark.read.parquet(path).write.partitionBy("part").parquet(repart)
    before = spark.read.parquet(repart).orderBy("doc_id").collect()
    stats = compact_parquet(
        spark, repart, target_bytes=1 << 30, partition_by=["part"]
    )
    assert stats["skipped"] is False
    dirs = sorted(d for d in os.listdir(repart) if d.startswith("part="))
    assert dirs == ["part=0", "part=1", "part=2"]
    after = spark.read.parquet(repart).orderBy("doc_id").collect()
    assert sorted(map(tuple, after)) == sorted(map(tuple, before))


class TestCrashRecovery:
    """r9 advice: between the swap's two renames the table is absent
    at its path; a re-run must repair every leftover state instead of
    crashing in table_stats."""

    def _setup(self, spark, tmp_path):
        import shutil

        path = str(tmp_path / "t")
        _fragmented(spark, path)
        rows = spark.read.parquet(path).orderBy("doc_id").collect()
        return path, rows, shutil

    def test_mid_window_rolls_forward(self, spark, tmp_path):
        import os

        path, rows, shutil = self._setup(spark, tmp_path)
        # simulate: .compacting fully written, path renamed away,
        # second rename never fired
        compact_parquet(spark, path, target_bytes=1 << 30)
        # rebuild the crash state from a fresh fragmented table
        _fragmented(spark, path)
        spark.read.parquet(path).coalesce(1).write.mode("overwrite").parquet(
            path + ".compacting"
        )
        os.rename(path, path + ".pre-compact")
        assert not os.path.exists(path)

        stats = compact_parquet(spark, path, target_bytes=1 << 30)
        assert stats["recovered"] == "rolled_forward"
        assert not os.path.exists(path + ".pre-compact")
        got = spark.read.parquet(path).orderBy("doc_id").collect()
        assert got == rows

    def test_mid_window_no_tmp_rolls_back(self, spark, tmp_path):
        import os

        path, rows, shutil = self._setup(spark, tmp_path)
        os.rename(path, path + ".pre-compact")

        stats = compact_parquet(spark, path, target_bytes=1 << 30)
        assert stats["recovered"] == "rolled_back"
        got = spark.read.parquet(path).orderBy("doc_id").collect()
        assert got == rows

    def test_completed_prior_drops_leftover(self, spark, tmp_path):
        import os

        path, rows, shutil = self._setup(spark, tmp_path)
        # crash after the second rename: compacted table in place,
        # .pre-compact never deleted
        shutil.copytree(path, path + ".pre-compact")

        stats = compact_parquet(spark, path, target_bytes=1 << 30)
        assert stats["recovered"] == "completed_prior"
        assert not os.path.exists(path + ".pre-compact")
        got = spark.read.parquet(path).orderBy("doc_id").collect()
        assert got == rows
