"""Per-server incremental extract transform (SURVEY §2.3 J1-J5, §2.8).

Re-expresses the reference's embedded T-SQL extract
(Get-BackupHistoryToETL.ps1:22-75) as one declarative DataFrame plan:

- J1: backupset ⋈ backupmediafamily on media_set_id (1 set : N stripe
  files) — inner join.
- J2-J4: AG-name resolution via sys.databases → replica_states
  (is_local=1) → availability_groups; all LEFT joins, all broadcast
  (small dimension side).
- J5: the correlated OUTER APPLY + FOR JSON PATH becomes
  group-by(backup_set_id) + to_json(collect_list(struct)) + LEFT join —
  de-correlated, set-based (functions/jsonfns.py).
- CASE type map D/I/L → Full/Diff/Log; bytes→MB with
  truncation-toward-zero (T-SQL convert(bigint, numeric) semantics,
  Get-BackupHistoryToETL.ps1:31-33,42-43).
- P4: watermark predicate backup_finish_date >= wm − 5 min (the replay
  buffer, Get-BackupHistoryToETL.ps1:20). Applied FIRST so Catalyst
  pushes it into the backupset scan (JDBC pushdown in production,
  parquet row-group skipping locally).

The reference's trailing ORDER BY backup_finish_date is dropped: global
sort buys nothing here — ordering only matters at sink-dedup, which is
key-based (SURVEY §2.9 "Ordered replay").
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.jsonfns import dbfiles_to_json_agg
from .readers import SourceTables

#: Get-BackupHistoryToETL.ps1:20 — "Add a small buffer to fix missing rows"
REPLAY_BUFFER_MINUTES = 5

def _type_map() -> F.Column:
    # CASE s.type WHEN 'D' Full WHEN 'I' Diff WHEN 'L' Log (no ELSE → NULL)
    return (
        F.when(F.col("type") == "D", "Full")
        .when(F.col("type") == "I", "Diff")
        .when(F.col("type") == "L", "Log")
    )


def _mb(col: str) -> F.Column:
    # convert(bigint, backup_size / 1048576): T-SQL divides the numeric
    # then truncates toward zero on convert; sizes are non-negative so
    # floor == truncation.
    return F.floor(F.col(col) / F.lit(1048576)).cast("long")


def extract_backup_history(
    src: SourceTables,
    last_etl_datetime: dt.datetime | None = None,
    replay_buffer_minutes: int = REPLAY_BUFFER_MINUTES,
) -> DataFrame:
    """The 18-column extract (Get-BackupHistoryToETL.ps1:30-49).

    Includes device_type / position / DBFileInformation — the reference
    loader drops them by accident (proc param mismatch, SURVEY §2.11.1);
    the engine loads all 18 on purpose because the restore-script
    generator depends on them.
    """
    s = src.backupset
    if last_etl_datetime is not None:
        wm = last_etl_datetime - dt.timedelta(minutes=replay_buffer_minutes)
        s = s.filter(F.col("backup_finish_date") >= F.lit(wm))

    m = src.backupmediafamily
    d = F.broadcast(src.databases.select("name", "database_id"))
    rs = F.broadcast(
        src.replica_states.filter(F.col("is_local") == True)  # noqa: E712 — J3's literal pushed into build side
        .select("database_id", "group_id")
    )
    grp = F.broadcast(src.availability_groups.select("group_id", F.col("name").alias("_ag_name")))
    files = dbfiles_to_json_agg(src.backupfile)

    joined = (
        s.join(m, "media_set_id", "inner")
        .join(d, s["database_name"] == d["name"], "left")
        .join(rs, "database_id", "left")
        .join(grp, "group_id", "left")
        .join(files, "backup_set_id", "left")
    )

    return joined.select(
        F.col("database_name"),
        _type_map().alias("BackupType"),
        F.col("physical_device_name"),
        F.col("backup_start_date"),
        F.col("backup_finish_date"),
        F.col("server_name"),
        F.col("_ag_name").alias("ag_name"),
        F.col("recovery_model"),
        F.col("first_lsn"),
        F.col("last_lsn"),
        _mb("backup_size").alias("UncompressedSizeMB"),
        _mb("compressed_backup_size").alias("CompressedSizeMB"),
        F.col("is_copy_only"),
        F.col("encryptor_type"),
        F.col("key_algorithm"),
        F.col("device_type"),
        F.col("position"),
        F.col("DBFileInformation"),
    )
