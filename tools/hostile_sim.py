"""Driver-contract sim under a configurable (hostile) Spark session.

Usage: python hostile_sim.py <tz> <inferNTZ:true|false> <sf_dir> [query ...]
Compares Spark vs DuckDB with a STRICT canon (str for everything,
repr for float) to surface any env-sensitive value drift.
"""
import hashlib
import sys

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

tz, infer_ntz, SF = sys.argv[1], sys.argv[2], sys.argv[3]
only = sys.argv[4:]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

spark = (
    SparkSession.builder.master("local[8]")
    .appName("hostile-sim")
    .config("spark.sql.session.timeZone", tz)
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", infer_ntz)
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as E


def canon(v):
    import decimal
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    return str(v)


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(canon(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest(), lines


con = duckdb.connect()
for t in TABLES:
    con.execute(f"create view {t} as select * from read_parquet('{SF}/{t}.parquet')")

queries = E.queries()
oracles = E.oracle_sql()
names = only or list(queries)
match = mismatch = rows_only = err = 0
for name in names:
    fn = queries[name]
    try:
        df = fn(spark, SF)
        cols = df.columns
        rows = [tuple(r) for r in df.collect()]
        if name not in oracles:
            rows_only += 1
            print(f"  {name}: rows-only ({len(rows)} rows)")
            continue
        orc = con.execute(oracles[name])
        ocols = [d[0] for d in orc.description]
        orows = orc.fetchall()
        h1, l1 = value_hash(cols, rows)
        h2, l2 = value_hash(ocols, orows)
        if len(rows) == len(orows) and h1 == h2:
            match += 1
        else:
            mismatch += 1
            print(f"  MISMATCH {name}: spark={len(rows)} oracle={len(orows)}")
            diff1 = [x for x in l1 if x not in set(l2)][:3]
            diff2 = [x for x in l2 if x not in set(l1)][:3]
            for d in diff1:
                print(f"    spark : {d[:200]}")
            for d in diff2:
                print(f"    oracle: {d[:200]}")
    except Exception as e:
        err += 1
        print(f"  ERR {name}: {type(e).__name__}: {str(e)[:300]}")

print(f"[{tz} inferNTZ={infer_ntz} {SF}] {match} match, {mismatch} mismatch, "
      f"{rows_only} rows-only, {err} err")
spark.stop()
