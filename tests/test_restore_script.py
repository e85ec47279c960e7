"""GenerateRestoreScript golden scenarios (SURVEY §3.2, §5.3)."""

from __future__ import annotations

import datetime as dt

import pytest

from sqlbackuphistoryetl_spark.plans.restore_script import generate_restore_script
from sqlbackuphistoryetl_spark.sources.fixtures import B


def _t(h, m=0):
    return dt.datetime(2025, 1, 1, h, m, 0)


def test_param_validation(consolidated):
    with pytest.raises(ValueError):
        generate_restore_script(consolidated, "")
    with pytest.raises(ValueError):
        generate_restore_script(consolidated, "db_sa1")  # neither server nor ag
    with pytest.raises(ValueError):
        generate_restore_script(consolidated, "db_sa1",
                                source_db_server="X", source_ag_name="Y")
    with pytest.raises(ValueError, match="No available full backups"):
        generate_restore_script(consolidated, "nope", source_db_server="SQLNODE01")


def test_full_diff_logs_to_pit(consolidated):
    """PIT 04:30: F1 (striped) → D1 → L3 → tail L4, STOPAT on last 2."""
    rs = generate_restore_script(
        consolidated, "db_sa1", source_db_server="SQLNODE01", restore_to_time=_t(4, 30)
    )
    types = [s.backup_type for s in rs.steps]
    assert types == ["Full", "Diff", "Log", "Log"]

    full = rs.steps[0]
    assert "RESTORE DATABASE [db_sa1] FROM " in full.restore_command
    assert "DISK = N'X:\\bk\\db_sa1_full_1_s1.bak'" in full.restore_command
    assert "DISK = N'X:\\bk\\db_sa1_full_1_s2.bak'" in full.restore_command
    assert "MOVE N'db_sa1_data' TO N'D:\\MSSQL\\DATA\\db_sa1.mdf'" in full.restore_command
    assert "MOVE N'db_sa1_log' TO N'L:\\MSSQL\\LOG\\db_sa1_log.ldf'" in full.restore_command
    assert full.restore_command.endswith(",NORECOVERY,  NOUNLOAD,  STATS = 5;")

    diff = rs.steps[1]
    assert diff.last_lsn == B + 450
    assert diff.restore_command.endswith("WITH NORECOVERY,  STATS = 5")

    logs = rs.steps[2:]
    assert [s.last_lsn for s in logs] == [B + 500, B + 650]  # L3 then tail L4
    # STOPAT patched onto the last two log restores
    for s in logs[-2:]:
        assert "STOPAT = '2025-01-01 04:30:00'" in s.restore_command


def test_copy_only_full_skips_diffs(consolidated):
    """PIT 08:20: latest full = copy-only URL backup ⇒ no diff stage."""
    rs = generate_restore_script(
        consolidated, "db_sa1", source_db_server="SQLNODE01", restore_to_time=_t(8, 20)
    )
    types = [s.backup_type for s in rs.steps]
    assert "Diff" not in types
    assert rs.steps[0].last_lsn == B + 1000
    assert "URL = N'https://acct.blob.core.windows.net/bk/db_sa1_co.bak'" in rs.steps[0].restore_command
    # logs after the copy-only full: L6 (started 08:30 > PIT → tail)
    assert [s.last_lsn for s in rs.steps[1:]] == [B + 1200]


def test_device_type_7_excluded(consolidated):
    """PIT way in the future: device_type=7 full is invisible; falls to
    copy-only full at B+1000 (sql:568)."""
    rs = generate_restore_script(
        consolidated, "db_sa1", source_db_server="SQLNODE01", restore_to_time=_t(23)
    )
    assert rs.steps[0].last_lsn == B + 1000


def test_striped_log_collapses_to_one_restore(consolidated):
    """PIT 02:30 from F1: L1 then striped L2 as ONE restore with both
    devices (W2 + A6)."""
    rs = generate_restore_script(
        consolidated, "db_sa1", source_db_server="SQLNODE01", restore_to_time=_t(2, 30)
    )
    log_steps = [s for s in rs.steps if s.backup_type == "Log"]
    l2 = [s for s in log_steps if s.last_lsn == B + 400]
    assert len(l2) == 1
    assert "DISK = N'X:\\bk\\db_sa1_log_2_s1.trn'" in l2[0].restore_command
    assert "DISK = N'X:\\bk\\db_sa1_log_2_s2.trn'" in l2[0].restore_command
    assert "WITH FILE = 1" in l2[0].restore_command


def test_ag_database_by_ag_name(consolidated):
    rs = generate_restore_script(
        consolidated, "db_ag1", source_ag_name="AG01", restore_to_time=_t(3)
    )
    assert [s.backup_type for s in rs.steps] == ["Full", "Log", "Log"]
    assert rs.steps[0].database_name == "db_ag1"


def test_destination_and_paths(consolidated):
    rs = generate_restore_script(
        consolidated, "db_sa1", destination_db="db_sa1_restored",
        source_db_server="SQLNODE01", restore_to_time=_t(4, 30),
        restore_data_path="X:\\NEW\\DATA", restore_log_path="Y:\\NEW\\LOG",
        file_name_prefix="Restored_",
    )
    cmd = rs.steps[0].restore_command
    assert "RESTORE DATABASE [db_sa1_restored] FROM" in cmd
    assert "MOVE N'db_sa1_data' TO N'X:\\NEW\\DATA\\Restored_db_sa1.mdf'" in cmd
    assert "MOVE N'db_sa1_log' TO N'Y:\\NEW\\LOG\\Restored_db_sa1_log.ldf'" in cmd
    # log restores target the destination too
    assert all("RESTORE LOG [db_sa1_restored]" in s.restore_command
               for s in rs.steps if s.backup_type == "Log")


def test_no_stopat_without_pit(consolidated):
    rs = generate_restore_script(consolidated, "db_sa1", source_db_server="SQLNODE01")
    assert all("STOPAT" not in s.restore_command for s in rs.steps)


def test_to_script_sections(consolidated):
    rs = generate_restore_script(
        consolidated, "db_sa1", source_db_server="SQLNODE01", restore_to_time=_t(4, 30)
    )
    text = rs.to_script()
    assert "INITIAL FULL BACKUP RESTORE COMMAND" in text
    assert "DIFF BACKUP RESTORE COMMAND" in text
    assert "LOG BACKUP RESTORE COMMAND" in text


def test_help_short_circuits(consolidated):
    from sqlbackuphistoryetl_spark.plans.restore_script import generate_restore_script

    out = generate_restore_script(consolidated, "", help=True)
    assert isinstance(out, list) and len(out) == 9
    assert out[0]["ProcParameters"] == "source_db"
    assert all({"ID", "Description", "IsRequired", "Example"} <= set(r) for r in out)


def test_sqlserver_print_style(spark, consolidated):
    """style='sqlserver' reproduces the reference PRINT stream shape:
    char(13) separator lines before DIFF/LOG sections (sql:843,1024,
    1290), the NO-DIFF banner when no diff applies (sql:844-846), and
    the T-SQL varchar-cast STOPAT format (sql:1265)."""
    import datetime as dt

    from sqlbackuphistoryetl_spark.plans.restore_script import (
        generate_restore_script,
        tsql_datetime_varchar,
    )

    assert tsql_datetime_varchar(dt.datetime(2025, 1, 1, 4, 30)) == "Jan  1 2025  4:30AM"
    assert tsql_datetime_varchar(dt.datetime(2025, 11, 25, 16, 5)) == "Nov 25 2025  4:05PM"
    assert tsql_datetime_varchar(dt.datetime(2025, 3, 2, 0, 59)) == "Mar  2 2025 12:59AM"

    rs = generate_restore_script(
        consolidated, "db_sa1", source_db_server="SQLNODE01",
        restore_to_time=dt.datetime(2025, 1, 1, 4, 30), style="sqlserver",
    )
    script = rs.to_script()
    assert "STOPAT = 'Jan  1 2025  4:30AM';" in script
    assert "\n\r\n" in script  # bare char(13) separator lines
    # same chain, sqlserver style has a diff ⇒ no NO-DIFF banner
    if "DIFF BACKUP RESTORE COMMAND" not in script:
        assert "NO DIFF BACKUPS FOUND" in script
    # default style unchanged
    default = generate_restore_script(
        consolidated, "db_sa1", source_db_server="SQLNODE01",
        restore_to_time=dt.datetime(2025, 1, 1, 4, 30),
    ).to_script()
    assert "STOPAT = '2025-01-01 04:30:00';" in default
    assert "\r" not in default and "NO DIFF" not in default
