"""Set-based restore planning for EVERY database in one pass.

The reference procs (and their library twins in ``chain.py``) answer
one (database, server) at a time — fine for a DBA console, wrong shape
for a fleet: at 100 TB / thousands of databases you want the restore
plan for *all* of them without a driver loop issuing thousands of
queries. This module computes the same chains set-based:

- entity identity = ``coalesce(ag_name, server_name)`` — an AG
  database's chain is owned by the AG (backups from any replica merge
  into one chain; that is exactly why the reference's per-key procs
  fall back to ag_name), a standalone database's by its server.
- every stage is a window/aggregate/join keyed on
  ``(database_name, entity)`` — one shuffle key end-to-end, thresholds
  carried as small per-group tables (broadcast), never per-row driver
  state.

Stage logic mirrors GenerateRestoreScript (sql:555-1273): latest Full
(dense_rank with stripes, device_type ∈ {2,9}), latest applicable Diff
(skipped for copy-only fulls), remaining Logs incl. the first log past
the restore point, stripe collapse, STOPAT flag on the last two.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.stringagg import device_clause, sorted_string_agg

def _with_entity(df: DataFrame) -> DataFrame:
    return df.withColumn("entity", F.coalesce(F.col("ag_name"), F.col("server_name")))


def latest_full_all(
    consolidated: DataFrame,
    restore_to_time: dt.datetime | None = None,
    device_types: tuple[int, ...] = (2, 9),
) -> DataFrame:
    """All stripes of the newest Full per (database, entity)."""
    fulls = _with_entity(consolidated).filter(F.col("BackupType") == "Full")
    if restore_to_time is not None:
        fulls = fulls.filter(F.col("backup_start_date") <= F.lit(restore_to_time))
    if device_types is not None:
        fulls = fulls.filter(F.col("device_type").isin(*device_types))
    w = Window.partitionBy("database_name", "entity").orderBy(F.col("last_lsn").desc())
    return fulls.withColumn("Rank", F.dense_rank().over(w)).filter(F.col("Rank") == 1)


def restore_plan_all(
    consolidated: DataFrame,
    restore_to_time: dt.datetime,
) -> DataFrame:
    """Point-in-time restore plan for every (database, entity).

    Output: one row per restore step —
    (database_name, entity, seq, BackupType, first_lsn, last_lsn,
     backup_start_date, position, devices, stopat) in restore order.
    Striped backups are collapsed to a single step whose ``devices``
    lists every DISK=/URL= clause (sorted — deterministic A6).
    """
    scoped = _with_entity(consolidated)
    keys = ["database_name", "entity"]

    # ---- stage 1: latest full per group, stripes collapsed ----
    fulls = latest_full_all(consolidated, restore_to_time)
    full_steps = (
        fulls.groupBy(*keys, "first_lsn", "last_lsn", "backup_start_date",
                      "is_copy_only", "position")
        .agg(sorted_string_agg(device_clause(), ", ").alias("devices"))
        .withColumn("BackupType", F.lit("Full"))
    )
    # per-group threshold after the full stage (broadcastable: 1 row/group)
    full_lsn = full_steps.select(
        *keys,
        F.col("last_lsn").alias("full_lsn"),
        F.col("is_copy_only").alias("full_copy_only"),
    )

    # ---- stage 2: latest applicable diff (none after a copy-only full) ----
    diffs = (
        scoped.filter(
            (F.col("BackupType") == "Diff")
            & (F.col("backup_start_date") <= F.lit(restore_to_time))
        )
        .join(F.broadcast(full_lsn), keys)
        .filter((F.col("last_lsn") > F.col("full_lsn")) & (~F.col("full_copy_only")))
    )
    w = Window.partitionBy(*keys).orderBy(F.col("last_lsn").desc())
    diff_steps = (
        diffs.withColumn("Rank", F.dense_rank().over(w))
        .filter(F.col("Rank") == 1)
        .groupBy(*keys, "first_lsn", "last_lsn", "backup_start_date", "position")
        .agg(sorted_string_agg(device_clause(), ", ").alias("devices"))
        .withColumn("BackupType", F.lit("Diff"))
    )

    # threshold entering the log stage: diff lsn if a diff applied, else full lsn
    diff_lsn = diff_steps.select(*keys, F.col("last_lsn").alias("diff_lsn"))
    log_threshold = (
        full_lsn.join(diff_lsn, keys, "left")
        .select(*keys, F.coalesce("diff_lsn", "full_lsn").alias("threshold_lsn"))
    )

    # ---- stage 3: logs past the threshold, plus the first log after T ----
    logs = scoped.filter(F.col("BackupType") == "Log").join(
        F.broadcast(log_threshold), keys
    ).filter(F.col("last_lsn") > F.col("threshold_lsn"))
    asof = logs.filter(F.col("backup_start_date") <= F.lit(restore_to_time))
    after = logs.filter(F.col("backup_start_date") > F.lit(restore_to_time))
    w_first = Window.partitionBy(*keys).orderBy(
        F.col("backup_start_date").asc(), F.col("last_lsn").asc()
    )
    first_after = (
        after.withColumn("_r", F.dense_rank().over(w_first))
        .filter(F.col("_r") == 1)
        .drop("_r")
    )
    log_steps = (
        asof.unionByName(first_after)
        .dropDuplicates(["LogID"])
        .groupBy(*keys, "first_lsn", "last_lsn", "backup_start_date", "position")
        .agg(sorted_string_agg(device_clause(), ", ").alias("devices"))
        .withColumn("BackupType", F.lit("Log"))
    )

    # ---- assemble: restore order + STOPAT flag on last two logs ----
    plan = (
        full_steps.drop("is_copy_only")
        .unionByName(diff_steps)
        .unionByName(log_steps)
    )
    type_rank = (
        F.when(F.col("BackupType") == "Full", 0)
        .when(F.col("BackupType") == "Diff", 1)
        .otherwise(2)
    )
    w_seq = Window.partitionBy(*keys).orderBy(type_rank.asc(), F.col("last_lsn").asc())
    w_tail = Window.partitionBy(*keys).orderBy(type_rank.desc(), F.col("last_lsn").desc())
    return (
        plan.withColumn("seq", F.row_number().over(w_seq))
        .withColumn(
            "stopat",
            (F.col("BackupType") == "Log") & (F.row_number().over(w_tail) <= 2),
        )
        .select(
            "database_name", "entity", "seq", "BackupType", "first_lsn",
            "last_lsn", "backup_start_date", "position", "devices", "stopat",
        )
    )
