"""Restore-script generation — entry point 2, the flagship query
(SURVEY §3.2, Utility.GenerateRestoreScript sql:427-1316).

Pipeline (mirrors the proc's stages; each stage's LSN threshold comes
from the previous stage's result, so this is inherently 3 small
actions, not one plan — SURVEY §3.2):

1. FULL: as-of rank-filtered scan (W1) with device_type ∈ {2,9}.
2. MOVE clause from the full's DBFileInformation JSON (path surgery).
3. DIFF: same rank-as-of with last_lsn > full.last_lsn; skipped
   entirely when the full is copy-only (sql:837-852).
4. LOG: stripe-dedup (W2) + union of as-of logs with the first log
   *after* the restore point (tail overlap, sql:1056-1065), stripe
   collapse via sorted string_agg (A6), one RESTORE LOG row per backup
   ordered by last_lsn; STOPAT patched onto the last two (W3).

Heavy selection/rank/collapse runs in Spark; final command *text*
assembly happens driver-side on the collected (small) chain — same
split as the reference, where T-SQL control flow stitches strings.

Intentional deviations (documented, SURVEY §2.11) — in the DEFAULT
``style="spark"``; ``style="sqlserver"`` reproduces the reference's
PRINT bytes exactly (char(13) separator lines, NO-DIFF banner,
T-SQL cast-style STOPAT) for drop-in diffability:
- UTC everywhere (reference mixes getdate/getutcdate).
- '\n' line breaks (reference uses char(13) CR).
- STOPAT timestamps are ISO 'YYYY-MM-DD HH:MM:SS' (reference emits
  T-SQL cast-style 'mon dd yyyy hh:miAM').
- The first-after-T tail log keeps ALL its stripes (reference's
  ``select top (1) *`` grabs a single arbitrary stripe file —
  under-restores striped tails).
- String aggregation order is deterministic (sorted by device name).
"""

from __future__ import annotations

import datetime as dt
import json
from dataclasses import dataclass, field
from decimal import Decimal
from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.pathfns import ensure_trailing_backslash_py, file_name_py, leaf_path_py
from ..operators.stringagg import device_clause, sorted_string_agg

EXAMPLE_MOVE_COMMAND = (
    "\n"
    "MOVE N'MyLogicalDataFile1' TO N'X:\\MSSQL\\MyPhysicalDataFile01.mdf', \n"
    "MOVE N'MyLogicalDataFile2' TO N'X:\\MSSQL\\MyPhysicalDataFile02.ndf', \n"
    "MOVE N'MyLogFile' TO N'Y:\\MSSQL\\MyLogFile.ldf' \n"
)

_CHAIN_COLS = [
    "LogID",
    "database_name",
    "BackupType",
    "physical_device_name",
    "backup_start_date",
    "backup_finish_date",
    "server_name",
    "ag_name",
    "recovery_model",
    "first_lsn",
    "last_lsn",
    "UncompressedSizeMB",
    "CompressedSizeMB",
    "is_copy_only",
    "encryptor_type",
    "key_algorithm",
    "device_type",
    "position",
    "DBFileInformation",
]


@dataclass
class RestoreStep:
    restore_id: int
    history_log_id: int
    database_name: str
    backup_type: str
    backup_start_date: dt.datetime
    backup_finish_date: dt.datetime
    restore_command: str
    physical_device_name: str | None
    server_name: str | None
    ag_name: str | None
    recovery_model: str | None
    first_lsn: Decimal
    last_lsn: Decimal
    uncompressed_size_mb: int | None = None
    compressed_size_mb: int | None = None
    is_copy_only: bool | None = None
    encryptor_type: str | None = None
    key_algorithm: str | None = None


def tsql_datetime_varchar(t: dt.datetime) -> str:
    """T-SQL default datetime→varchar cast, 'mon dd yyyy hh:miAM': day
    and 12-hour hour right-justified to width 2 (sql:1265 —
    ``cast(@RestoreToTime as varchar(50))``)."""
    hour12 = t.hour % 12 or 12
    ampm = "AM" if t.hour < 12 else "PM"
    return f"{t.strftime('%b')} {t.day:2d} {t.year} {hour12:2d}:{t.minute:02d}{ampm}"


_RULE = "-" * 67


@dataclass
class RestoreScript:
    steps: list[RestoreStep] = field(default_factory=list)
    style: str = "spark"

    def to_script(self, style: str | None = None) -> str:
        """PRINT-style output (sql:824-829,1295-1310).

        ``style="sqlserver"`` reproduces the reference's PRINT stream
        byte-for-byte: a bare char(13) line before each section after
        the first (sql:843,1024,1290) and the NO-DIFF banner when no
        diff applies (sql:844-846). The default "spark" style keeps the
        compact banner-only form.
        """
        style = style or self.style
        sqlsrv = style == "sqlserver"
        parts: list[str] = []
        for step in self.steps:
            if step.backup_type == "Full":
                parts.append("----------------INITIAL FULL BACKUP RESTORE COMMAND----------------")
                parts.append(step.restore_command)
                parts.append(_RULE)
            elif step.backup_type == "Diff":
                if sqlsrv:
                    parts.append("\r")
                parts.append("--------------------DIFF BACKUP RESTORE COMMAND--------------------")
                parts.append(step.restore_command)
                parts.append(_RULE)
        if sqlsrv and not any(s.backup_type == "Diff" for s in self.steps):
            parts.append("\r")
            parts.append(_RULE)
            parts.append("-----------------------NO DIFF BACKUPS FOUND-----------------------")
            parts.append(_RULE)
        logs = [s for s in self.steps if s.backup_type == "Log"]
        if logs:
            if sqlsrv:
                parts.append("\r")
            parts.append("--------------------LOG BACKUP RESTORE COMMAND---------------------")
            parts.extend(s.restore_command for s in logs)
            parts.append(_RULE)
        return "\n".join(parts)


def _scope(consolidated: DataFrame, database: str, server: str | None, ag: str | None):
    key = (
        (F.col("ag_name") == F.lit(ag))
        if ag is not None
        else (F.col("server_name") == F.lit(server))
    )
    return consolidated.filter((F.col("database_name") == F.lit(database)) & key)


def _rank1_latest(df: DataFrame) -> DataFrame:
    w = Window.orderBy(F.col("last_lsn").desc())
    return df.withColumn("Rank", F.dense_rank().over(w)).filter(F.col("Rank") == 1)


def _move_clause(
    json_file_info: str | None,
    data_path: str | None,
    log_path: str | None,
    file_name_prefix: str | None,
) -> str:
    """MOVE ... TO ... list from the full's DBFileInformation JSON
    (sql:724-763). Falls back to the example MOVE when the JSON is
    missing (sql:704-712)."""
    if not json_file_info:
        return EXAMPLE_MOVE_COMMAND
    data_path = ensure_trailing_backslash_py(data_path)
    log_path = ensure_trailing_backslash_py(log_path)
    clauses = []
    for f in json.loads(json_file_info):
        physical = f["physical_name"]
        leaf = leaf_path_py(physical)
        fname = file_name_py(physical, file_name_prefix)
        if f.get("file_type") == "L":
            full_path = (log_path or leaf) + fname
        else:  # 'D' data file
            full_path = (data_path or leaf) + fname
        clauses.append(f"MOVE N'{f['logical_name']}' TO N'{full_path}'")
    return ", \n".join(clauses)


#: @Help output (sql:449-480) — parameter docs as data, per the reference.
RESTORE_SCRIPT_HELP: list[dict[str, object]] = [
    dict(ID=1, ProcParameters="source_db", Description="Name of source database",
         IsRequired=True, Example="'MyDB1'", AdditionalInfo="Required parameter"),
    dict(ID=2, ProcParameters="destination_db", Description="Name of destination database",
         IsRequired=False, Example="'MyDB1_Restored'",
         AdditionalInfo="Optional. Defaults to source_db if not provided"),
    dict(ID=3, ProcParameters="source_db_server",
         Description="Source machine name. Use if source database is standalone.",
         IsRequired=True, Example="'SQLQA01'",
         AdditionalInfo="Provide only one of source_db_server / source_ag_name"),
    dict(ID=4, ProcParameters="source_ag_name",
         Description="Source Availability Group name. Use if source database is part of an AG.",
         IsRequired=True, Example="'AG01'",
         AdditionalInfo="Provide only one of source_db_server / source_ag_name"),
    dict(ID=5, ProcParameters="restore_to_time", Description="Restore to point in time",
         IsRequired=False, Example="'2022-04-27 22:19:20'",
         AdditionalInfo="Defaults to current UTC time"),
    dict(ID=6, ProcParameters="restore_data_path",
         Description="Data path to restore all data files", IsRequired=False,
         Example="'X:\\MSSQL\\DATA'",
         AdditionalInfo="Defaults to the data path found in the backup file"),
    dict(ID=7, ProcParameters="restore_log_path",
         Description="Log path to restore all log files", IsRequired=False,
         Example="'Y:\\MSSQL\\LOG'",
         AdditionalInfo="Defaults to the log path found in the backup file"),
    dict(ID=8, ProcParameters="file_name_prefix",
         Description="Prefix added to all restored physical files", IsRequired=False,
         Example="'Restored_'",
         AdditionalInfo="Renames MyDBData01.mdf to Restored_MyDBData01.mdf"),
    dict(ID=9, ProcParameters="help", Description="Return this help table",
         IsRequired=False, Example="True",
         AdditionalInfo="Only returns help, does not generate any scripts"),
]


def restore_script_help() -> list[dict[str, object]]:
    return [dict(r) for r in RESTORE_SCRIPT_HELP]


def generate_restore_script(
    consolidated: DataFrame,
    source_db: str,
    destination_db: str | None = None,
    source_db_server: str | None = None,
    source_ag_name: str | None = None,
    restore_to_time: dt.datetime | None = None,
    restore_data_path: str | None = None,
    restore_log_path: str | None = None,
    file_name_prefix: str | None = None,
    help: bool = False,  # noqa: A002 — mirrors the proc's @Help param
    style: str = "spark",
) -> RestoreScript | list[dict[str, object]]:
    if help:  # short-circuit before any validation, like the proc (sql:449-480)
        return restore_script_help()
    if not source_db:
        raise ValueError("Please provide a valid source_db")
    if (source_db_server is None) == (source_ag_name is None):
        raise ValueError(
            "For standalone source DBs provide only source_db_server; "
            "for AG source DBs provide only source_ag_name"
        )
    restore_time_provided = restore_to_time is not None
    if restore_to_time is None:
        restore_to_time = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)

    scoped = _scope(consolidated, source_db, source_db_server, source_ag_name)

    # ---------------- FULL (sql:555-671) ----------------
    fulls = _rank1_latest(
        scoped.filter(
            (F.col("BackupType") == "Full")
            & (F.col("backup_start_date") <= F.lit(restore_to_time))
            & F.col("device_type").isin(2, 9)
        )
    )
    full_rows = fulls.select(*_CHAIN_COLS).orderBy("physical_device_name").collect()
    if not full_rows:
        raise ValueError("No available full backups found")

    dest = destination_db or full_rows[0]["database_name"]
    head = full_rows[0]
    move_cmd = _move_clause(
        head["DBFileInformation"], restore_data_path, restore_log_path, file_name_prefix
    )

    device_list = ", \n".join(_device_clause_py(r) for r in full_rows)
    full_cmd = (
        "--execute as login = 'sa'\ngo\n\n"
        f"RESTORE DATABASE [{dest}] FROM \n{device_list}\n"
        f" WITH {move_cmd}\n,NORECOVERY,  NOUNLOAD,  STATS = 5;"
    )
    steps = [
        _step(1, head, "Full", full_cmd,
              devices=", ".join(r["physical_device_name"] for r in full_rows))
    ]
    last_lsn: Decimal = head["last_lsn"]

    # ---------------- DIFF (sql:837-1035) ----------------
    next_id = 2
    if not head["is_copy_only"]:  # copy-only full ⇒ no diffs apply (sql:837-852)
        diffs = _rank1_latest(
            scoped.filter(
                (F.col("BackupType") == "Diff")
                & (F.col("last_lsn") > F.lit(last_lsn))
                & (F.col("backup_start_date") <= F.lit(restore_to_time))
            )
        )
        diff_rows = diffs.select(*_CHAIN_COLS).orderBy("physical_device_name").collect()
        if diff_rows:
            diff_devices = ", \n".join(_device_clause_py(r) for r in diff_rows)
            diff_cmd = (
                f"RESTORE DATABASE [{dest}] FROM \n{diff_devices}"
                " WITH NORECOVERY,  STATS = 5"
            )
            steps.append(
                _step(next_id, diff_rows[0], "Diff", diff_cmd,
                      devices=diff_rows[0]["physical_device_name"])
            )
            next_id += 1
            last_lsn = diff_rows[0]["last_lsn"]

    # ---------------- LOG (sql:1039-1259) ----------------
    logs_all = scoped.filter(
        (F.col("BackupType") == "Log") & (F.col("last_lsn") > F.lit(last_lsn))
    )
    asof = logs_all.filter(F.col("backup_start_date") <= F.lit(restore_to_time))
    # tail overlap: ALL stripes of the earliest log after the restore
    # point (strengthened from the reference's arbitrary top(1) row)
    after = logs_all.filter(F.col("backup_start_date") > F.lit(restore_to_time))
    w_first = Window.orderBy(F.col("backup_start_date").asc(), F.col("last_lsn").asc())
    first_after = (
        after.withColumn("_r", F.dense_rank().over(w_first)).filter(F.col("_r") == 1).drop("_r")
    )
    logs = asof.unionByName(first_after).dropDuplicates(["LogID"])

    # W2 stripe-dedup + A6 collapse: one row per striped log backup with
    # a combined device clause, FILE = position preserved
    w2 = Window.partitionBy("first_lsn", "last_lsn")
    collapsed = (
        logs.withColumn("LogIDPartitioned", F.min("LogID").over(w2))
        .groupBy(
            "LogIDPartitioned",
            *[c for c in _CHAIN_COLS if c not in ("LogID", "physical_device_name", "device_type")],
        )
        .agg(sorted_string_agg(device_clause(), ", \n").alias("devices"))
        .orderBy(F.col("last_lsn").asc())
    )
    log_rows = collapsed.collect()
    for r in log_rows:
        cmd = (
            f"RESTORE LOG [{dest}] FROM {r['devices']} WITH FILE = "
            f"{r['position']},NORECOVERY, NOUNLOAD, STATS = 10;"
        )
        steps.append(_step(next_id, r, "Log", cmd, devices=r["devices"],
                           log_id_key="LogIDPartitioned"))
        next_id += 1

    # STOPAT on the last two log restores (sql:1261-1273); sqlserver
    # style emits the reference's T-SQL varchar-cast datetime bytes
    if restore_time_provided:
        when = (
            tsql_datetime_varchar(restore_to_time)
            if style == "sqlserver"
            else restore_to_time.strftime("%Y-%m-%d %H:%M:%S")
        )
        stopat = f", STOPAT = '{when}';"
        log_steps = [s for s in steps if s.backup_type == "Log"]
        for s in log_steps[-2:]:
            s.restore_command = s.restore_command.replace(";", stopat)

    return RestoreScript(steps=steps, style=style)


def _device_clause_py(row: Any) -> str:
    prefix = "URL = N'" if row["device_type"] == 9 else "DISK = N'"
    return f"{prefix}{row['physical_device_name']}'"


def _step(
    restore_id: int,
    row: Any,
    backup_type: str,
    command: str,
    devices: str | None,
    log_id_key: str = "LogID",
) -> RestoreStep:
    return RestoreStep(
        restore_id=restore_id,
        history_log_id=row[log_id_key],
        database_name=row["database_name"],
        backup_type=backup_type,
        backup_start_date=row["backup_start_date"],
        backup_finish_date=row["backup_finish_date"],
        restore_command=command,
        physical_device_name=devices,
        server_name=row["server_name"],
        ag_name=row["ag_name"],
        recovery_model=row["recovery_model"],
        first_lsn=row["first_lsn"],
        last_lsn=row["last_lsn"],
        uncompressed_size_mb=row["UncompressedSizeMB"],
        compressed_size_mb=row["CompressedSizeMB"],
        is_copy_only=row["is_copy_only"],
        encryptor_type=row["encryptor_type"],
        key_algorithm=row["key_algorithm"],
    )
