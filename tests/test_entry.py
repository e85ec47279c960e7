"""Local mirror of the driver's DuckDB-oracle gate (stricter: exact
value equality after normalization, not just hash match)."""

from __future__ import annotations

import datetime as dt
import decimal
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, float):
        return f"f:{v!r}"
    if isinstance(v, dt.datetime):
        return f"ts:{v.isoformat()}"
    if isinstance(v, bool):
        return f"b:{v}"
    if v is None:
        return "null"
    return f"{type(v).__name__[0]}:{v}"


def _spark_result(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    cols = sorted(df.columns)
    rows = [tuple(_norm(r[c]) for c in cols) for r in df.collect()]
    return cols, sorted(rows)


def _oracle_result(ddb, name):
    sql = entry_mod.oracle_sql()[name]
    cur = ddb.execute(sql)
    names = [d[0] for d in cur.description]
    data = cur.fetchall()
    order = sorted(range(len(names)), key=lambda i: names[i])
    cols = [names[i] for i in order]
    rows = [tuple(_norm(row[i]) for i in order) for row in data]
    return cols, sorted(rows)


ORACLE_QUERIES = sorted(
    k for k in entry_mod.queries() if k in entry_mod.oracle_sql()
)
ROWS_ONLY_QUERIES = sorted(
    k for k in entry_mod.queries() if k not in entry_mod.oracle_sql()
)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, ddb, name):
    s_cols, s_rows = _spark_result(spark, name)
    o_cols, o_rows = _oracle_result(ddb, name)
    assert s_cols == o_cols, f"{name}: column mismatch {s_cols} vs {o_cols}"
    assert len(s_rows) == len(o_rows), f"{name}: rowcount {len(s_rows)} vs {len(o_rows)}"
    mismatches = [
        (a, b) for a, b in zip(s_rows, o_rows) if a != b
    ]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:3]}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    n = df.count()
    assert n > 0
    assert set(df.columns) == {"o_custkey", "o_orderkey", "o_orderdate", "n_name", "lines_json"}


def test_approx_distinct_within_rsd(spark):
    """approx_count_distinct (rsd=0.02) must land within 5% of the exact
    per-group distinct count. The gate now emits this contract as a
    hashable ``within_5pct`` flag (oracle emits ``true``), so the same
    invariant is both unit-tested here and driver-checked cross-engine."""
    rows = entry_mod.queries()["approx_distinct_users"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["exact_users"] > 0
        assert r["within_5pct"] is True, r


def test_percentile_approx_within_tolerance(spark):
    """The documented 100 TB swap-in for the exact percentile gates:
    percentile_approx (t-digest, one pass, no per-group sort) must land
    within 5% relative error of the exact interpolated quantiles on the
    gate corpus — the contract that makes the swap safe."""
    import os

    sf = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    nt = F.size(F.expr(r"regexp_extract_all(text, '\\S+', 0)"))
    d = docs.select("lang", nt.alias("nt"))
    both = d.groupBy("lang").agg(
        F.percentile("nt", 0.9).alias("exact"),
        F.percentile_approx("nt", 0.9, 10000).alias("approx"),
    )
    for r in both.collect():
        assert abs(r["approx"] - r["exact"]) <= 0.05 * max(r["exact"], 1), r
