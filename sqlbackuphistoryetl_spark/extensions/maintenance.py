"""Table maintenance: parquet small-file compaction (r9).

The silent killer of 100 TB scans is not data volume but FILE COUNT:
a sink that accretes small files (streaming micro-batches, per-task
appends, fine-grained shard writes) pays per-file open cost on every
scan (``spark.sql.files.openCostInBytes`` models each file as 4 MB of
phantom I/O) and crushes the driver's listing. Compaction is the
standing maintenance job every long-lived table needs — the generic
twin of the MinHash index's purpose-built ``compact`` (dedup_index.py).

Design: one read → ``coalesce(ceil(bytes/target))`` (coalesce, not
repartition — compaction must not pay a shuffle; slight size skew
across output files is the accepted trade) → write to a sibling
``.compacting`` dir → rename swap. One complete layout survives every
crash point (rename is atomic on HDFS/local; the fsutil docstring's
object-store caveat applies — on S3-like stores run compaction
through a table format instead), but between the swap's two renames
the table is briefly ABSENT at its path; a re-run repairs that state
via ``_recover_interrupted_compaction`` (roll forward to the complete
``.compacting`` output, else roll back to ``.pre-compact``).
Partitioned tables pass ``partition_by``: the rewrite then shuffles on
the partition columns so each partition directory collapses to one
file per shuffle partition.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession

from sqlbackuphistoryetl_spark import fsutil


def table_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(total_bytes, n_data_files) — recursive listing, DATA files
    only. Hadoop's ContentSummary would count ``_SUCCESS`` and local
    ``.crc`` sidecars, inflating the count past the compaction
    threshold and defeating the no-op guard."""
    fs, hpath = fsutil._fs(spark, path)
    it = fs.listFiles(hpath, True)
    total = 0
    n = 0
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.startswith(("_", ".")):
            continue
        total += int(st.getLen())
        n += 1
    return total, n


def _recover_interrupted_compaction(spark: SparkSession, path: str) -> str | None:
    """Repair the states a crash during a previous :func:`compact_parquet`
    swap can leave behind, so a re-run never fails on a missing table.

    The swap is rename(path → .pre-compact) then rename(.compacting →
    path): between those two renames the table is ABSENT at its path
    (the one-rename exposure window — a reader in that instant sees no
    table, and a naive re-run used to crash in ``table_stats``).
    States and their repairs:

    - ``.pre-compact`` present, ``path`` missing → crashed inside the
      window. Roll FORWARD to ``.compacting`` if it exists (it was
      fully written before the first rename fired), else roll BACK to
      ``.pre-compact``.
    - ``.pre-compact`` AND ``path`` present → crashed after the second
      rename, before cleanup: compaction completed; drop the leftover.
    - ``.compacting`` present alone → crashed mid-write; the partial
      output is dropped by the normal pre-write cleanup below.
    """
    tmp = path.rstrip("/") + ".compacting"
    old = path.rstrip("/") + ".pre-compact"
    if not fsutil.exists(spark, old):
        return None
    if fsutil.exists(spark, path):
        fsutil.delete(spark, old)
        return "completed_prior"
    if fsutil.exists(spark, tmp):
        fsutil.rename(spark, tmp, path)
        fsutil.delete(spark, old)
        return "rolled_forward"
    fsutil.rename(spark, old, path)
    return "rolled_back"


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 << 20,
    partition_by: list[str] | None = None,
) -> dict:
    """Compact a parquet table in place; returns the before/after
    stats dict (``skipped=True`` when the table already meets the
    target — a no-op compaction must never rewrite data). A leftover
    ``.pre-compact``/``.compacting`` pair from a crashed prior run is
    repaired first (see :func:`_recover_interrupted_compaction`)."""
    recovered = _recover_interrupted_compaction(spark, path)
    bytes_before, files_before = table_stats(spark, path)
    n_out = max(1, math.ceil(bytes_before / target_bytes))
    if files_before <= n_out:
        return {
            "skipped": True,
            "bytes": bytes_before,
            "files_before": files_before,
            "files_after": files_before,
            "n_out": n_out,
            "recovered": recovered,
        }
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + ".compacting"
    old = path.rstrip("/") + ".pre-compact"
    fsutil.delete(spark, tmp)
    fsutil.delete(spark, old)
    if partition_by:
        (
            df.repartition(n_out, *partition_by)
            .write.mode("overwrite")
            .partitionBy(*partition_by)
            .parquet(tmp)
        )
    else:
        df.coalesce(n_out).write.mode("overwrite").parquet(tmp)
    # swap: the data is never lost at any crash point (one complete
    # layout always exists under SOME name), but between the two
    # renames the table is briefly absent at `path` — the exposure
    # window _recover_interrupted_compaction repairs on the next run
    fsutil.rename(spark, path, old)
    fsutil.rename(spark, tmp, path)
    fsutil.delete(spark, old)
    _, files_after = table_stats(spark, path)
    return {
        "skipped": False,
        "bytes": bytes_before,
        "files_before": files_before,
        "files_after": files_after,
        "n_out": n_out,
        "recovered": recovered,
    }
