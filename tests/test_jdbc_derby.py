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
