"""Chain primitive procs (SURVEY §3.3) — golden restore chains."""

from __future__ import annotations

from sqlbackuphistoryetl_spark.plans.chain import (
    last_diff_backup,
    latest_full_backup,
    remaining_log_backups,
)
from sqlbackuphistoryetl_spark.sources.fixtures import B


def test_latest_full_keeps_all_stripes(spark, consolidated):
    # Latest Full for db_sa1 = device_type-7 row (procs don't filter
    # device_type — only GenerateRestoreScript does, sql:140-142 vs 568)
    rows = latest_full_backup(consolidated, "db_sa1", "SQLNODE01").collect()
    assert len(rows) == 1 and rows[0]["LastLSN"] == B + 1400

    # striped full: restrict fixture to the F1 era via ag fixture db
    rows = latest_full_backup(
        consolidated.filter("backup_start_date < '2025-01-01 05:00:00'"),
        "db_sa1", "SQLNODE01",
    ).collect()
    assert len(rows) == 2  # dense_rank keeps both stripes
    assert {r["BackupPath"] for r in rows} == {
        "X:\\bk\\db_sa1_full_1_s1.bak", "X:\\bk\\db_sa1_full_1_s2.bak"
    }
    assert all(r["LastLSN"] == B + 200 for r in rows)


def test_latest_full_ag_fallback(spark, consolidated):
    # db_ag1 has server_name=SQLNODE02; querying by "AG01" hits zero
    # rows by server_name, then falls back to ag_name (sql:145-170)
    rows = latest_full_backup(consolidated, "db_ag1", "AG01").collect()
    assert len(rows) == 1
    assert rows[0]["BackupPath"] == "X:\\bk\\db_ag1_full_1.bak"
    assert rows[0]["DatabaseName"] == "db_ag1"


def test_remaining_logs_ordered(spark, consolidated):
    rows = remaining_log_backups(consolidated, "db_sa1", "SQLNODE01", B + 450).collect()
    lsns = [r["LastLSN"] for r in rows]
    assert lsns == sorted(lsns)
    assert lsns[0] == B + 500  # L3 is the first log past 450
    assert all(lsn > B + 450 for lsn in lsns)


def test_remaining_logs_ag_fallback(spark, consolidated):
    rows = remaining_log_backups(consolidated, "db_ag1", "AG01", B + 200).collect()
    assert [r["LastLSN"] for r in rows] == [B + 300, B + 400]


def test_last_diff_clamped_by_newer_full(spark, consolidated):
    # From F1 (last_lsn B+200): D1 (B+450) applies; D2 (B+800) is
    # clamped by F2 (non-copy-only full at B+700) — sql:346-369
    rows = last_diff_backup(consolidated, "db_sa1", "SQLNODE01", B + 200).collect()
    assert len(rows) == 1
    assert rows[0]["LastLSN"] == B + 450
    assert rows[0]["BackupPath"] == "X:\\bk\\db_sa1_diff_1.bak"


def test_last_diff_copy_only_full_does_not_clamp(spark, consolidated):
    # From F2 (B+700): D2 (B+800) applies; the copy-only full (B+1000)
    # and the device-7 full (B+1400) must not clamp it away...
    # device-7 full is NOT copy-only → clamps at B+1400; D2 < clamp ⇒ survives.
    rows = last_diff_backup(consolidated, "db_sa1", "SQLNODE01", B + 700).collect()
    assert len(rows) == 1
    assert rows[0]["LastLSN"] == B + 800


def test_last_diff_none_after_copy_only(spark, consolidated):
    # Past every diff: nothing applies
    rows = last_diff_backup(consolidated, "db_sa1", "SQLNODE01", B + 1400).collect()
    assert rows == []
