"""Set-based fleet planner must agree with the per-database script
generator on every chain (same fixture, same PIT)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sqlbackuphistoryetl_spark.plans.chain_all import latest_full_all, restore_plan_all
from sqlbackuphistoryetl_spark.plans.restore_script import generate_restore_script
from sqlbackuphistoryetl_spark.sources.fixtures import B


def _t(h, m=0):
    return dt.datetime(2025, 1, 1, h, m, 0)


def test_latest_full_all_groups(spark, consolidated):
    out = latest_full_all(consolidated, restore_to_time=_t(4, 30)).collect()
    by_key = {}
    for r in out:
        by_key.setdefault((r["database_name"], r["entity"]), []).append(r)
    # db_sa1 standalone: F1's two stripes; db_ag1 under its AG identity
    assert len(by_key[("db_sa1", "SQLNODE01")]) == 2
    assert {r["last_lsn"] for r in by_key[("db_sa1", "SQLNODE01")]} == {B + 200}
    assert [r["last_lsn"] for r in by_key[("db_ag1", "AG01")]] == [B + 200]


def test_plan_all_matches_per_db_script(spark, consolidated):
    pit = _t(4, 30)
    plan = restore_plan_all(consolidated, pit)
    rows = plan.orderBy("database_name", "entity", "seq").collect()
    grouped = {}
    for r in rows:
        grouped.setdefault((r["database_name"], r["entity"]), []).append(r)

    # db_sa1: same chain the script generator produces
    script = generate_restore_script(
        consolidated, "db_sa1", source_db_server="SQLNODE01", restore_to_time=pit
    )
    expected = [(s.backup_type, s.last_lsn) for s in script.steps]
    got = [(r["BackupType"], r["last_lsn"]) for r in grouped[("db_sa1", "SQLNODE01")]]
    assert got == expected

    # db_ag1 under its AG identity
    script_ag = generate_restore_script(
        consolidated, "db_ag1", source_ag_name="AG01", restore_to_time=pit
    )
    got_ag = [(r["BackupType"], r["last_lsn"]) for r in grouped[("db_ag1", "AG01")]]
    assert got_ag == [(s.backup_type, s.last_lsn) for s in script_ag.steps]

    # stopat flags: exactly the last two Log steps per group
    sa1 = grouped[("db_sa1", "SQLNODE01")]
    assert [r["stopat"] for r in sa1] == [False, False, True, True]

    # striped full collapsed into one step listing both devices
    assert sa1[0]["devices"].count("DISK = N'") == 2


def test_plan_all_copy_only_group(spark, consolidated):
    # PIT 08:20 — latest full is the copy-only URL backup: no Diff step
    plan = restore_plan_all(consolidated, _t(8, 20))
    sa1 = (
        plan.filter((F.col("database_name") == "db_sa1") & (F.col("entity") == "SQLNODE01"))
        .orderBy("seq")
        .collect()
    )
    assert [r["BackupType"] for r in sa1] == ["Full", "Log"]
    assert sa1[0]["devices"].startswith("URL = N'")
