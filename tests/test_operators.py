"""Unit tests for the reusable operator layer (SURVEY §2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sqlbackuphistoryetl_spark.functions.jsonfns import explode_dbfile_information
from sqlbackuphistoryetl_spark.functions.pathfns import (
    ensure_trailing_backslash,
    file_name,
    leaf_path,
)
from sqlbackuphistoryetl_spark.operators.fallback import server_then_ag
from sqlbackuphistoryetl_spark.operators.stringagg import sorted_string_agg
from sqlbackuphistoryetl_spark.operators.windows import (
    latest_with_ties,
    stripe_group_id,
    tail_n_per_key,
)


def test_latest_with_ties_set_based(spark):
    df = spark.createDataFrame(
        [("a", 1, "x1"), ("a", 2, "x2"), ("a", 2, "x3"), ("b", 5, "y1")],
        ["k", "v", "tag"],
    )
    out = latest_with_ties(df, ["k"], "v").orderBy("tag").collect()
    assert [(r["k"], r["tag"]) for r in out] == [("a", "x2"), ("a", "x3"), ("b", "y1")]


def test_stripe_group_id(spark):
    df = spark.createDataFrame(
        [(10, "f1", "l1"), (11, "f1", "l1"), (12, "f2", "l2")],
        ["LogID", "first_lsn", "last_lsn"],
    )
    out = {r["LogID"]: r["LogIDPartitioned"] for r in stripe_group_id(df).collect()}
    assert out == {10: 10, 11: 10, 12: 12}


def test_tail_n_per_key(spark):
    df = spark.createDataFrame([("a", i) for i in range(5)], ["k", "v"])
    out = tail_n_per_key(df, ["k"], "v", 2).filter("is_tail").collect()
    assert sorted(r["v"] for r in out) == [3, 4]


def test_sorted_string_agg(spark):
    df = spark.createDataFrame([("g", "b"), ("g", "a"), ("g", "c")], ["k", "s"])
    out = df.groupBy("k").agg(sorted_string_agg("s", ",").alias("agg")).first()
    assert out["agg"] == "a,b,c"


def test_fallback_probe(spark):
    df = spark.createDataFrame(
        [("srv1", None, 1), ("node2", "AG9", 2)],
        ["server_name", "ag_name", "v"],
    )
    assert server_then_ag(df, "srv1").first()["v"] == 1
    assert server_then_ag(df, "AG9").first()["v"] == 2  # fallback path
    assert server_then_ag(df, "missing").count() == 0


def test_path_functions(spark):
    df = spark.createDataFrame([("D:\\MSSQL\\DATA\\db.mdf",)], ["p"])
    row = df.select(
        leaf_path("p").alias("leaf"),
        file_name("p").alias("name"),
        file_name("p", "Restored_").alias("prefixed"),
        ensure_trailing_backslash(F.lit("X:\\NEW")).alias("fixed"),
        ensure_trailing_backslash(F.lit("")).alias("empty"),
    ).first()
    assert row["leaf"] == "D:\\MSSQL\\DATA\\"
    assert row["name"] == "db.mdf"
    assert row["prefixed"] == "Restored_db.mdf"
    assert row["fixed"] == "X:\\NEW\\"
    assert row["empty"] is None


def test_explode_dbfile_information(spark):
    info = (
        '[{"logical_name":"d1","physical_drive":"D:","physical_name":"D:\\\\a\\\\f.mdf",'
        '"file_type":"D","file_number":"1"},'
        '{"logical_name":"l1","physical_drive":"L:","physical_name":"L:\\\\b\\\\f.ldf",'
        '"file_type":"L","file_number":"2"}]'
    )
    df = spark.createDataFrame([(1, info)], ["id", "DBFileInformation"])
    rows = explode_dbfile_information(df).orderBy("file_number").collect()
    assert [r["logical_name"] for r in rows] == ["d1", "l1"]
    assert rows[0]["physical_name"] == "D:\\a\\f.mdf"


def test_dbfiles_json_null_state_kept(spark):
    """Pins the documented NULL-state deviation (jsonfns.py:
    dbfiles_to_json_agg): the reference's T-SQL `state <> 8` drops
    NULL-state backup files (NULL <> 8 is UNKNOWN); this engine keeps
    them — a file of unknown state must still appear in the restore
    metadata. state=8 (dropped) is excluded either way."""
    from pyspark.sql import functions as F

    from sqlbackuphistoryetl_spark.functions.jsonfns import dbfiles_to_json_agg

    rows = [
        (1, "f_live", "C:", "C:\\f_live.mdf", "D", 1, 0),
        (1, "f_null", "C:", "C:\\f_null.mdf", "D", 2, None),
        (1, "f_dropped", "C:", "C:\\f_dropped.mdf", "D", 3, 8),
    ]
    bf = spark.createDataFrame(
        rows,
        "backup_set_id int, logical_name string, physical_drive string, "
        "physical_name string, file_type string, file_number int, state int",
    )
    out = dbfiles_to_json_agg(bf).collect()
    assert len(out) == 1
    import json as _json

    names = [f["logical_name"] for f in _json.loads(out[0]["DBFileInformation"])]
    assert names == ["f_live", "f_null"]
