"""Watermark control table (SURVEY §2.1 S1/S5, §2.9).

Mirror of Utility.SQLBackupHistorySourceServers (sql:42-51): one row
per source server with the high-water mark of backup_finish_date
successfully ETL'd. Kept as a *manual* table (parquet locally, a JDBC
table in production) rather than Structured Streaming state — exact
parity with the reference plus restartability (SURVEY §2.9 row 1).

The keyed UPDATE (Update-LastETLDateTimeForServer.ps1:34-53) becomes a
set-based upsert: new maxima LEFT-join onto the control table,
greatest() wins, atomic swap. Updating every server in one write is the
scalable form of the reference's per-server UPDATE loop.
"""

from __future__ import annotations

import datetime as dt
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import fsutil
from ..schema import SOURCE_SERVERS


def read_source_servers(spark: SparkSession, control_path: str) -> DataFrame:
    """S1 scan: (ServerName, LastETLDatetime)."""
    return spark.read.schema(SOURCE_SERVERS).parquet(control_path)


def init_source_servers(
    spark: SparkSession,
    control_path: str,
    servers: list[str],
    initial_watermark: dt.datetime | None = None,
) -> None:
    """Create the control table. Default watermark = now (UTC), matching
    the reference's DF_LastETLDatetime getutcdate() default (sql:51)."""
    wm = initial_watermark or dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    df = spark.createDataFrame([(s, wm) for s in servers], SOURCE_SERVERS)
    df.coalesce(1).write.mode("overwrite").parquet(control_path)


def update_watermarks(
    spark: SparkSession,
    control_path: str,
    new_marks: DataFrame,
) -> None:
    """Advance LastETLDatetime per server (S5 upsert).

    ``new_marks``: (ServerName, MaxETLDateTime). Servers absent from
    new_marks keep their mark (empty extract ⇒ watermark untouched,
    Invoke-SQLBackupHistoryETL.ps1:44-67). Marks only move forward.
    """
    current = read_source_servers(spark, control_path)
    updated = (
        current.join(F.broadcast(new_marks), "ServerName", "left")
        .select(
            "ServerName",
            F.greatest(
                F.col("LastETLDatetime"),
                F.coalesce(F.col("MaxETLDateTime"), F.col("LastETLDatetime")),
            ).alias("LastETLDatetime"),
        )
    )
    _atomic_overwrite(spark, updated, control_path)


def _atomic_overwrite(spark: SparkSession, df: DataFrame, path: str) -> None:
    """Write-to-temp + directory swap (cannot overwrite a path being
    read). All path mutations go through the Hadoop FS API so the
    control table can live on HDFS/S3A/ABFS, not just local disk; the
    swap is one tiny single-file directory (see fsutil object-store
    caveat)."""
    tmp = f"{path.rstrip('/')}__tmp_{uuid.uuid4().hex}"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    fsutil.delete(spark, path)
    fsutil.rename(spark, tmp, path)


def rewind_watermark(
    spark: SparkSession,
    control_path: str,
    server: str,
    to: dt.datetime,
) -> None:
    """Operational backfill: move ONE server's LastETLDatetime backwards
    so the next run re-extracts from ``to`` (the reference's documented
    manual fix-up — an UPDATE on ETLConfig.SourceServersToETL; here an
    atomic control-table rewrite). Forward moves are rejected: advancing
    belongs to ``update_watermarks`` (which is monotone); a typo'd
    forward jump would silently skip history. Replays are safe — the
    idempotent sink absorbs the overlap."""
    current = read_source_servers(spark, control_path)
    names = [r["ServerName"] for r in current.select("ServerName").collect()]
    if server not in names:
        raise ValueError(f"unknown server {server!r}")
    mark = current.filter(F.col("ServerName") == server).first()["LastETLDatetime"]
    if to > mark:
        raise ValueError(
            f"rewind_watermark only moves backwards: {to} > current {mark}"
        )
    updated = current.select(
        "ServerName",
        F.when(F.col("ServerName") == server, F.lit(to))
        .otherwise(F.col("LastETLDatetime"))
        .alias("LastETLDatetime"),
    )
    _atomic_overwrite(spark, updated, control_path)
