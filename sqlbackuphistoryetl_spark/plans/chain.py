"""Restore-chain primitive procs — entry point 3 (SURVEY §3.3).

Library twins of the three reference procs, returning DataFrames with
the procs' exact output shapes:

- ``latest_full_backup``    ← Utility.GetLatestFullBackupFromSQLBackupHistoryConsolidated (sql:103-183)
- ``remaining_log_backups`` ← Utility.GetRemainingLogBackupsFromSQLBackupHistoryConsolidated (sql:188-267)
- ``last_diff_backup``      ← Utility.GetLastDiffBackupFromSQLBackupHistoryConsolidated (sql:271-395)

Each: filter → server→AG fallback (P9) → rank/clamp → project. LSN
comparisons are exact DecimalType(25,0). The windows are partitioned by
nothing here because the proc semantics are single-(db, server) —
the set-based many-entity variants live in the callers that need them
(see operators/windows.latest_with_ties partition_by).
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..operators.fallback import filter_with_fallback

def _proj() -> list[Column]:
    return [
        F.col("physical_device_name").alias("BackupPath"),
        F.col("backup_start_date").alias("BackupStartDate"),
        F.col("backup_finish_date").alias("BackupFinishDate"),
        F.col("first_lsn").alias("FirstLSN"),
        F.col("last_lsn").alias("LastLSN"),
        F.col("BackupType"),
    ]


def _fallback_scope(consolidated: DataFrame, base: Column, server_name: str) -> DataFrame:
    return filter_with_fallback(
        lambda cond: consolidated.filter(base & cond),
        F.col("server_name") == F.lit(server_name),
        F.col("ag_name") == F.lit(server_name),
    )


def latest_full_backup(
    consolidated: DataFrame, database_name: str, server_name: str
) -> DataFrame:
    """All stripes of the newest Full backup (dense_rank keeps ties —
    W1). Output: DatabaseName, BackupPath, BackupStartDate,
    BackupFinishDate, FirstLSN, LastLSN, BackupType."""
    base = (F.col("BackupType") == "Full") & (F.col("database_name") == database_name)
    scoped = _fallback_scope(consolidated, base, server_name)
    w = Window.orderBy(F.col("last_lsn").desc())
    ranked = scoped.withColumn("Rank", F.dense_rank().over(w))
    return ranked.filter(F.col("Rank") == 1).select(
        F.lit(database_name).alias("DatabaseName"), *_proj()
    )


def remaining_log_backups(
    consolidated: DataFrame,
    database_name: str,
    server_name: str,
    last_lsn: Decimal,
) -> DataFrame:
    """Log backups with last_lsn > X in restore order (LastLSN asc)."""
    base = (
        (F.col("BackupType") == "Log")
        & (F.col("database_name") == database_name)
        & (F.col("last_lsn") > F.lit(last_lsn))
    )
    scoped = _fallback_scope(consolidated, base, server_name)
    return scoped.select(*_proj()).orderBy(F.col("LastLSN").asc())


def last_diff_backup(
    consolidated: DataFrame,
    database_name: str,
    server_name: str,
    last_lsn: Decimal,
) -> DataFrame:
    """Latest applicable Diff after the Full at ``last_lsn``.

    Scans Diff+Full together (sql:310): when a *newer non-copy-only
    Full* exists past the LSN, only diffs strictly before it apply —
    the clamp at sql:346-369 (copy-only fulls never clamp). Then W1
    dense_rank keeps every stripe of the winning diff."""
    base = (
        F.col("BackupType").isin("Diff", "Full")
        & (F.col("database_name") == database_name)
        & (F.col("last_lsn") > F.lit(last_lsn))
    )
    scoped = _fallback_scope(consolidated, base, server_name).select(
        "BackupType", "is_copy_only", *_proj()[:5]
    )

    # clamp threshold: earliest non-copy-only Full past the LSN
    clamp_row = (
        scoped.filter((F.col("BackupType") == "Full") & (F.col("is_copy_only") == False))  # noqa: E712
        .agg(F.min("LastLSN").alias("clamp"))
        .first()
    )
    clamp = clamp_row["clamp"] if clamp_row else None

    diffs = scoped.filter(F.col("BackupType") == "Diff")
    if clamp is not None:
        diffs = diffs.filter(F.col("LastLSN") < F.lit(clamp))

    w = Window.orderBy(F.col("LastLSN").desc())
    ranked = diffs.withColumn("Rank", F.dense_rank().over(w))
    return ranked.filter(F.col("Rank") == 1).select(
        "BackupPath", "BackupStartDate", "BackupFinishDate", "FirstLSN", "LastLSN", "BackupType"
    )
