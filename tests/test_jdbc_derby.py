"""REAL JDBC round-trip for the production twins (r5 verdict task 5).

Every other test drives the parquet twins; these exercise the actual
JDBC code paths — ``jdbc_append_new_rows`` / ``jdbc_extract_reader`` /
``jdbc_update_watermark`` — against embedded Apache Derby, which ships
on the Spark classpath (pyspark/jars/derby-*.jar, there for the Hive
metastore). Derby runs inside the driver JVM, so local[n] executors
(threads of the same JVM) satisfy Derby's one-JVM embedded contract.

Engine notes the test encodes:
- Spark's DerbyDialect maps StringType to CLOB, which Derby refuses in
  comparison predicates — production DDL always types key/predicate
  columns explicitly, reproduced here via ``createTableColumnTypes``
  (passed through the sink's ``properties`` pass-through, proving that
  seam works).
- Derby accepts Spark's ``(query) alias`` derived-table form used by
  ``jdbc_extract_reader``.
- Spark's JDBC writer creates QUOTED (case-preserved) column names, so
  caller-authored extract SQL must quote identifiers on case-folding
  engines — and the engine's own generated statements do (sinks.py).
"""

from __future__ import annotations

import datetime as dt
import glob
import os

import pytest
from pyspark.sql import functions as F

from sqlbackuphistoryetl_spark import schema
from sqlbackuphistoryetl_spark.plans.sinks import (
    jdbc_append_new_rows,
    jdbc_update_watermark,
)
from sqlbackuphistoryetl_spark.sources.fixtures import consolidated_rows
from sqlbackuphistoryetl_spark.sources.readers import jdbc_extract_reader


def _derby_jar() -> bool:
    import pyspark

    return bool(
        glob.glob(os.path.join(os.path.dirname(pyspark.__file__), "jars", "derby-*.jar"))
    )


pytestmark = pytest.mark.skipif(
    not _derby_jar(), reason="no embedded Derby jar on the Spark classpath"
)

# Explicit VARCHARs for every string column: DerbyDialect's default CLOB
# mapping cannot appear in equality predicates (the anti-join read-back
# and the watermark UPDATE both need them).
CONSOLIDATED_VARCHARS = (
    "database_name VARCHAR(256), BackupType VARCHAR(16), "
    "physical_device_name VARCHAR(512), server_name VARCHAR(256), "
    "ag_name VARCHAR(256), recovery_model VARCHAR(32), "
    "encryptor_type VARCHAR(64), key_algorithm VARCHAR(64), "
    "DBFileInformation VARCHAR(4000)"
)


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    url = f"jdbc:derby:{tmp_path_factory.mktemp('derby')}/etldb;create=true"
    yield url
    # embedded Derby writes derby.log into the JVM's user.dir
    if os.path.exists("derby.log"):
        os.remove("derby.log")


def test_jdbc_append_extract_replay_roundtrip(spark, derby_url):
    """S4/J6 over live JDBC: first append inserts all rows (table
    auto-created), read-back sees them with values intact, and a full
    replay (+ an in-batch dup) against the read-back key slice appends
    ZERO rows — the idempotency contract, executed end-to-end on a real
    database engine for the first time."""
    # Null strings are filled before the JDBC write: Spark's
    # DerbyDialect types null string parameters as setNull(CLOB), which
    # Derby refuses to store into the VARCHAR columns the predicate
    # contract needs (ERROR 22005). SQL Server's dialect (NVARCHAR) has
    # no such clash; this is a Derby-harness accommodation, not an
    # engine behavior.
    str_cols = [f.name for f in schema.CONSOLIDATED if f.dataType.simpleString() == "string"]
    rows = [
        {**r, **{c: (r.get(c) if r.get(c) is not None else "-") for c in str_cols}}
        for r in consolidated_rows()
    ]
    batch = spark.createDataFrame(rows, schema.CONSOLIDATED)
    props = {"createTableColumnTypes": CONSOLIDATED_VARCHARS}

    no_keys = batch.select(*schema.CONSOLIDATED_KEY).limit(0)
    n1 = jdbc_append_new_rows(batch, derby_url, "consolidated", no_keys, props)
    assert n1 == len(rows)

    # read-back: values survive the JDBC round trip
    full = jdbc_extract_reader(spark, derby_url, "select * from consolidated")
    assert full.count() == len(rows)
    got = {
        (r["database_name"], str(r["first_lsn"]), r["physical_device_name"])
        for r in full.collect()
    }
    want = {
        (r["database_name"], str(r["first_lsn"]), r["physical_device_name"])
        for r in rows
    }
    assert got == want

    # source-side predicate pushdown shape: WHERE runs inside the query
    one_db = jdbc_extract_reader(
        spark,
        derby_url,
        'select "database_name", "last_lsn" from consolidated '
        "where \"database_name\" = 'db_sa1'",
    )
    assert one_db.count() == sum(1 for r in rows if r["database_name"] == "db_sa1")

    # replay: anti-join against the key slice read back over JDBC
    existing = jdbc_extract_reader(
        spark,
        derby_url,
        'select "last_lsn", "first_lsn", "database_name", '
        '"physical_device_name" from consolidated',
    )
    replay = spark.createDataFrame(rows + [rows[0]], schema.CONSOLIDATED)
    n2 = jdbc_append_new_rows(replay, derby_url, "consolidated", existing, props)
    assert n2 == 0
    assert (
        jdbc_extract_reader(spark, derby_url, 'select "LogID" from consolidated').count()
        == len(rows)
    )


def test_jdbc_watermark_update_parameterized(spark, derby_url):
    """S5 over live JDBC: the parameterized UPDATE advances exactly the
    targeted server's watermark (and no other row)."""
    servers = spark.createDataFrame(
        [
            ("SQLNODE01", dt.datetime(2025, 1, 1, 9, 0, 0)),
            ("SQLNODE02", dt.datetime(2025, 1, 1, 9, 0, 0)),
        ],
        "ServerName string, LastETLDatetime timestamp",
    )
    (
        servers.write.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "source_servers")
        .option("createTableColumnTypes", "ServerName VARCHAR(256)")
        .mode("overwrite")
        .save()
    )
    new_mark = dt.datetime(2025, 1, 1, 12, 5, 0)
    jdbc_update_watermark(spark, derby_url, "source_servers", "SQLNODE01", new_mark)

    back = {
        r["ServerName"]: r["LastETLDatetime"]
        for r in jdbc_extract_reader(
            spark, derby_url, "select * from source_servers"
        ).collect()
    }
    assert back["SQLNODE01"] == new_mark
    assert back["SQLNODE02"] == dt.datetime(2025, 1, 1, 9, 0, 0)


def test_jdbc_injectionish_server_name_is_safe(spark, derby_url):
    """The reference's injection-by-splice bug (SURVEY §2.11.2) stays
    impossible: a hostile server name travels as a bound parameter, so
    it simply matches no row instead of executing."""
    servers = spark.createDataFrame(
        [("SQLNODE01", dt.datetime(2025, 1, 1, 9, 0, 0))],
        "ServerName string, LastETLDatetime timestamp",
    )
    (
        servers.write.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "source_servers_inj")
        .option("createTableColumnTypes", "ServerName VARCHAR(256)")
        .mode("overwrite")
        .save()
    )
    hostile = "x'; drop table source_servers_inj; --"
    jdbc_update_watermark(
        spark, derby_url, "source_servers_inj", hostile, dt.datetime(2030, 1, 1)
    )
    back = jdbc_extract_reader(
        spark, derby_url, "select * from source_servers_inj"
    ).collect()
    assert len(back) == 1
    assert back[0]["LastETLDatetime"] == dt.datetime(2025, 1, 1, 9, 0, 0)


# ---------------------------------------------------------------- r7:
# the composed loop — Invoke-SQLBackupHistoryETL's deployment shape with
# Derby as BOTH the control/sink database and the msdb source.

MSDB_VARCHARS = {
    "backupset": (
        "database_name VARCHAR(256), type VARCHAR(4), "
        "server_name VARCHAR(256), recovery_model VARCHAR(32), "
        "encryptor_type VARCHAR(64), key_algorithm VARCHAR(64)"
    ),
    "backupmediafamily": "physical_device_name VARCHAR(512)",
    "backupfile": (
        "logical_name VARCHAR(256), physical_drive VARCHAR(16), "
        "physical_name VARCHAR(512), file_type VARCHAR(4)"
    ),
    "databases": "name VARCHAR(256)",
    "replica_states": "group_id VARCHAR(64)",
    "availability_groups": "group_id VARCHAR(64), name VARCHAR(256)",
}


def _derby_safe_source_rows():
    """raw_source_rows with every string non-null and every
    post-watermark backupset covered by an AG + file rows — the Derby
    setNull(CLOB)-vs-VARCHAR accommodation documented on the first
    test, applied to the msdb-shaped inputs."""
    from sqlbackuphistoryetl_spark.sources.fixtures import raw_source_rows

    rows = raw_source_rows()
    for bs in rows["backupset"]:
        bs["encryptor_type"] = bs["encryptor_type"] or "NONE"
        bs["key_algorithm"] = bs["key_algorithm"] or "none"
    # put db_sa1 (database_id 5) in its own AG so ag_name is never null
    rows["replica_states"].append(
        dict(database_id=5, group_id="ag-guid-2", is_local=True)
    )
    rows["availability_groups"].append(
        dict(group_id="ag-guid-2", name="AG02")
    )
    # a file row for the log backup (set 2) so DBFileInformation != null
    rows["backupfile"].append(
        dict(backup_set_id=2, logical_name="db_sa1_log", physical_drive="L:",
             physical_name="L:\\MSSQL\\LOG\\db_sa1_log.ldf", file_type="L",
             file_number=1, state=0)
    )
    return rows


def _write_msdb_to_derby(spark, url, rows, mode="overwrite"):
    for name in ("backupset", "backupmediafamily", "backupfile",
                 "databases", "replica_states", "availability_groups"):
        (
            spark.createDataFrame(rows[name], getattr(schema, name.upper()))
            .write.format("jdbc")
            .option("url", url)
            .option("dbtable", f"msdb_{name}")
            .option("createTableColumnTypes", MSDB_VARCHARS[name])
            .mode(mode)
            .save()
        )


def _jdbc_sources(spark, url):
    from sqlbackuphistoryetl_spark.sources.readers import SourceTables

    def _read(name):
        return (
            spark.read.format("jdbc")
            .option("url", url)
            .option("dbtable", f"msdb_{name}")
            .load()
        )

    return SourceTables(
        backupset=_read("backupset"),
        backupmediafamily=_read("backupmediafamily"),
        backupfile=_read("backupfile"),
        databases=_read("databases"),
        replica_states=_read("replica_states"),
        availability_groups=_read("availability_groups"),
    )


def test_jdbc_run_etl_end_to_end(spark, derby_url):
    """r6 verdict task 5: the full incremental loop over live JDBC —
    two incremental runs plus a pure replay, Derby serving as control
    table, consolidated sink AND msdb source. Asserts watermark
    advance, LogID continuity, and zero duplicates under replay."""
    from decimal import Decimal

    from sqlbackuphistoryetl_spark.plans.etl import run_etl_jdbc
    from sqlbackuphistoryetl_spark.sources.fixtures import B, _ts

    rows = _derby_safe_source_rows()
    _write_msdb_to_derby(spark, derby_url, rows)

    # control table: one registered server, watermark 09:00
    (
        spark.createDataFrame(
            [("SQLNODE01", dt.datetime(2025, 1, 1, 9, 0, 0))],
            "ServerName string, LastETLDatetime timestamp",
        )
        .write.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "etl_control")
        .option("createTableColumnTypes", "ServerName VARCHAR(256)")
        .mode("overwrite")
        .save()
    )
    props = {"createTableColumnTypes": CONSOLIDATED_VARCHARS}
    srcs = {"SQLNODE01": _jdbc_sources(spark, derby_url)}

    def _run():
        return run_etl_jdbc(
            spark, srcs, derby_url,
            control_table="etl_control",
            target_table="etl_consolidated",
            properties=props,
        )

    def _sink():
        return jdbc_extract_reader(
            spark, derby_url, "select * from etl_consolidated"
        ).collect()

    def _marks():
        return {
            r["ServerName"]: r["LastETLDatetime"]
            for r in jdbc_extract_reader(
                spark, derby_url, "select * from etl_control"
            ).collect()
        }

    # run 1: sets 1 (2 stripes), 2, 3 pass the 09:00 watermark -> 4 rows;
    # the old set 4 (01:10) is filtered at the source
    r1 = _run()
    assert r1.servers_ok == ["SQLNODE01"] and r1.rows_appended == 4
    sink1 = _sink()
    assert len(sink1) == 4
    assert _marks()["SQLNODE01"] == _ts(12, 5)
    logids1 = sorted(r["LogID"] for r in sink1)
    assert len(set(logids1)) == 4

    # run 2: a new log backup lands at 13:00; the overlap window replays
    # sets finishing >= 12:00 too -- anti-join must drop them
    new_set = dict(
        backup_set_id=5, media_set_id=5, database_name="db_sa1", type="L",
        backup_start_date=_ts(13), backup_finish_date=_ts(13, 1),
        server_name="SQLNODE01", recovery_model="FULL",
        first_lsn=B + 2200, last_lsn=B + 2300,
        backup_size=Decimal(1_048_575), compressed_backup_size=Decimal(524_288),
        is_copy_only=False, encryptor_type="NONE", key_algorithm="none",
        position=1,
    )
    (
        spark.createDataFrame([new_set], schema.BACKUPSET)
        .write.format("jdbc").option("url", derby_url)
        .option("dbtable", "msdb_backupset").mode("append").save()
    )
    (
        spark.createDataFrame(
            [dict(media_set_id=5,
                  physical_device_name="X:\\bk\\new_log2.trn", device_type=2)],
            schema.BACKUPMEDIAFAMILY,
        )
        .write.format("jdbc").option("url", derby_url)
        .option("dbtable", "msdb_backupmediafamily").mode("append").save()
    )
    # a file row so DBFileInformation is non-null (the Derby VARCHAR
    # accommodation; NULL surfacing via the left join is covered by the
    # parquet twins)
    (
        spark.createDataFrame(
            [dict(backup_set_id=5, logical_name="db_sa1_log",
                  physical_drive="L:",
                  physical_name="L:\\MSSQL\\LOG\\db_sa1_log.ldf",
                  file_type="L", file_number=1, state=0)],
            schema.BACKUPFILE,
        )
        .write.format("jdbc").option("url", derby_url)
        .option("dbtable", "msdb_backupfile").mode("append").save()
    )
    r2 = _run()
    assert r2.rows_appended == 1
    sink2 = _sink()
    assert len(sink2) == 5
    assert _marks()["SQLNODE01"] == _ts(13, 1)
    # LogID continuity: the new row's id exceeds every run-1 id
    new_row = [r for r in sink2 if str(r["first_lsn"]) == str(B + 2200)]
    assert len(new_row) == 1 and new_row[0]["LogID"] > max(logids1)
    assert new_row[0]["BackupType"] == "Log"

    # run 3: pure replay -- nothing new, zero appended, watermark stays
    r3 = _run()
    assert r3.rows_appended == 0
    assert len(_sink()) == 5
    assert _marks()["SQLNODE01"] == _ts(13, 1)
