"""Production JDBC sinks (SURVEY §2.1 S4/S5 — config layer).

The test harness writes parquet; production points the same merge at a
JDBC target. Set-based throughout — the reference's one-round-trip-per
-row loader (Add-BackupHistoryToTarget.ps1:69-98) is the scalability
defect the survey flags as "do not port" (§4): JDBC batch writes ship
``batchsize`` rows per round trip from every executor in parallel.

Untestable in this container (no SQL Server); kept thin and covered by
the parquet twins that share all the logic that matters (dedup,
anti-join, watermark math).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from ..operators.merge import dedup_batch
from ..schema import CONSOLIDATED_KEY
from .auth import TokenProvider, aad_connection_properties


def _resolve_properties(
    properties: dict[str, str] | None,
    token_provider: TokenProvider | None,
) -> dict[str, str]:
    """Connection properties, with an AAD access token injected when a
    provider is configured (S8 — New-AzureSQLDbConnectionWithCert.ps1)."""
    if token_provider is not None:
        return aad_connection_properties(token_provider, properties)
    return dict(properties or {})


def jdbc_append_new_rows(
    batch: DataFrame,
    url: str,
    table: str,
    existing_keys: DataFrame,
    properties: dict[str, str] | None = None,
    batchsize: int = 10_000,
    token_provider: TokenProvider | None = None,
) -> int:
    """Idempotent JDBC append: in-batch dedup + anti-join against the
    key slice the caller read back for the overlap window (J6), then a
    set-based batched INSERT. Mirrors operators.merge.idempotent_append
    with a JDBC tail instead of parquet — including the appended-row
    count riding the write job as an Observation (merge.py:97-105):
    cache+count would materialize the batch twice for one number."""
    from functools import reduce

    deduped = dedup_batch(batch)
    cond = reduce(
        lambda a, b: a & b,
        [deduped[k].eqNullSafe(existing_keys[k]) for k in CONSOLIDATED_KEY],
    )
    fresh = deduped.join(existing_keys, cond, "left_anti")
    obs = Observation()
    fresh = fresh.observe(obs, F.count(F.lit(1)).alias("n"))
    writer = (
        fresh.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode("append")
    )
    for k, v in _resolve_properties(properties, token_provider).items():
        writer = writer.option(k, v)
    writer.save()
    return int(obs.get["n"])


def jdbc_update_watermark(
    spark,
    url: str,
    table: str,
    server_name: str,
    new_mark: dt.datetime,
    properties: dict[str, str] | None = None,
    token_provider: TokenProvider | None = None,
) -> None:
    """Keyed watermark UPDATE (S5) via a parameterized JDBC statement —
    never string interpolation (the reference's injection-by-splice is
    §2.11.2's bug register entry)."""
    jvm = spark._jvm
    props = jvm.java.util.Properties()
    for k, v in _resolve_properties(properties, token_provider).items():
        props.setProperty(k, v)
    conn = jvm.java.sql.DriverManager.getConnection(url, props)
    try:
        # ANSI-quoted identifiers: Spark's JDBC writer creates columns
        # quoted (case-preserved), so case-folding engines (Derby →
        # upper) would not resolve the unquoted names; SQL Server
        # accepts the quoted form under its default QUOTED_IDENTIFIER.
        stmt = conn.prepareStatement(
            f'update {table} set "LastETLDatetime" = ? where "ServerName" = ?'  # noqa: S608 — table name is config, values parameterized
        )
        stmt.setTimestamp(1, jvm.java.sql.Timestamp(int(new_mark.timestamp() * 1000)))
        stmt.setString(2, server_name)
        stmt.executeUpdate()
        stmt.close()
    finally:
        conn.close()
