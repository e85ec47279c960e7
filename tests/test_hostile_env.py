"""Environment-invariance regression guard for the driver gates.

The driver owns its SparkSession: its timezone, NTZ inference, and the
events parquet encoding (µs NTZ vs TIMESTAMP(NANOS) with sub-µs bits)
are all outside the gates' control. Rounds 1-3 lost three queries to
exactly this (date_trunc NTZ coercion, scaled decimals, raw-ts output);
tools/hostile_sim.py found and round 4 fixed them. This test pins a
representative slice of that matrix inside the suite: a non-UTC session
timezone and ns-encoded events must produce byte-identical results to
the DuckDB oracle.
"""

from __future__ import annotations

import decimal
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")

# event-time-sensitive gates plus the three that were red on the driver
GATES = [
    "q1_pricing_summary",
    "hourly_event_rollup",
    "chain_state_fold",
    "j6_watermark_antijoin_dedup",
    "p4_watermark_overlap_window",
    "a3_retention_cutoff",
    "o4_first_event_after",
    "retention_filter_counts",
    "funnel_view_click_purchase",
    "event_sessionization",
    "approx_distinct_users",
    "asof_last_purchase",
    "skew_salted_agg",  # r5: _ts_us min/max over events through the salt merge
    # r5: order/lineitem-date gates hardened to epoch-µs / zone-free
    # formatting after the full-window Kolkata+legacy matrix caught them
    "j2_customers_without_recent_orders",
    "a4_min_after_threshold",
    "u1_union_distinct_tail",
    "datefmt_stopat",
    # r6: frozen-weights sigmoid scoring — transcendental output parity
    # must hold regardless of session zone (it has no time inputs; this
    # pins that nothing in the scoring plan grows one by accident).
    "quality_model_score",
    # r6 late: micro-nat ln parity through the PMI ratio — same
    # transcendental-output class as quality_model_score; no time
    # inputs, pinned so the fixed-shape-ratio doctrine can't drift.
    "pmi_collocations",
]

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if v != v else repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    return str(v)


def _rows_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("\x01".join(_canon(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def ns_sf_dir(tmp_path_factory):
    """SF dir whose events.parquet is TIMESTAMP(NANOS) with nonzero
    sub-µs bits (the legacy driver encoding), other tables symlinked."""
    dst = tmp_path_factory.mktemp("sfns")
    t = pq.read_table(f"{SF_DIR}/events.parquet")
    us = t["ts"].cast(pa.int64()).to_numpy()
    sub = np.random.default_rng(7).integers(0, 1000, size=len(us))
    cols = {n: t[n] for n in t.column_names}
    cols["ts"] = pa.array(us * 1000 + sub).cast(pa.timestamp("ns"))
    pq.write_table(pa.table(cols), str(dst / "events.parquet"), version="2.6")
    for name in TABLES:
        if name != "events":
            os.symlink(f"{SF_DIR}/{name}.parquet", str(dst / f"{name}.parquet"))
    return str(dst)


def _run_hostile(spark, sf_dir, gate, tz, infer_ntz):
    oracles = entry_mod.oracle_sql()
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"create view {name} as "
            f"select * from read_parquet('{sf_dir}/{name}.parquet')"
        )
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    prev_ntz = spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled")
    spark.conf.set("spark.sql.session.timeZone", tz)
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", infer_ntz)
    try:
        df = entry_mod.queries()[gate](spark, sf_dir)
        got = _rows_key(df.columns, [tuple(r) for r in df.collect()])
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", prev_ntz)
    orc = con.execute(oracles[gate])
    want = _rows_key([d[0] for d in orc.description], orc.fetchall())
    assert got == want, f"{gate}: {len(got)} vs {len(want)} rows"


@pytest.mark.parametrize("gate", GATES)
def test_gate_survives_hostile_session(spark, ns_sf_dir, gate):
    _run_hostile(spark, ns_sf_dir, gate, "America/New_York", "true")


@pytest.mark.parametrize(
    "gate",
    ["q1_pricing_summary", "hourly_event_rollup", "chain_state_fold",
     "j6_watermark_antijoin_dedup"],
)
def test_gate_survives_legacy_ntz_inference(spark, ns_sf_dir, gate):
    """inferTimestampNTZ=false makes NTZ parquet read as TIMESTAMP
    instants — the legacy reader behavior; combined with a half-hour
    offset zone it shifts every rendered wall-clock."""
    _run_hostile(spark, ns_sf_dir, gate, "Asia/Kolkata", "false")
