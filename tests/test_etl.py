"""End-to-end ETL run (SURVEY §3.1): extract → merge → watermark."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sqlbackuphistoryetl_spark.plans.etl import run_etl
from sqlbackuphistoryetl_spark.plans.watermark import init_source_servers, read_source_servers
from sqlbackuphistoryetl_spark.sources.fixtures import raw_source_tables


def test_run_etl_end_to_end(spark, tmp_path):
    control = str(tmp_path / "control")
    target = str(tmp_path / "consolidated")
    sources = {"SQLNODE01": raw_source_tables(spark)}
    init_source_servers(spark, control, ["SQLNODE01", "SQLNODE_DOWN"],
                        initial_watermark=dt.datetime(2025, 1, 1, 9, 0))

    r1 = run_etl(spark, sources, control, target)
    assert r1.servers_ok == ["SQLNODE01"]
    assert r1.servers_skipped == ["SQLNODE_DOWN"]
    # watermark 09:00 − 5 min: picks up sets 1-3 (finish ≥ 08:55), not set 4
    assert r1.rows_appended == 4  # 2 stripes + 1 log + 1 diff

    marks = {r["ServerName"]: r["LastETLDatetime"]
             for r in read_source_servers(spark, control).collect()}
    assert marks["SQLNODE01"] == dt.datetime(2025, 1, 1, 12, 5)  # max finish
    assert marks["SQLNODE_DOWN"] == dt.datetime(2025, 1, 1, 9, 0)  # untouched

    # run 2: pure replay (watermark advanced, 5-min overlap) ⇒ no new rows
    r2 = run_etl(spark, sources, control, target)
    assert r2.rows_appended == 0
    sink = spark.read.parquet(target)
    assert sink.count() == 4
    assert sink.select(F.max("LogID")).first()[0] >= 1
    # loaded rows carry all 18 columns + LogID + partition col
    assert "DBFileInformation" in sink.columns and "position" in sink.columns


def test_empty_server_watermark_untouched(spark, tmp_path):
    control = str(tmp_path / "control")
    target = str(tmp_path / "consolidated")
    sources = {"SQLNODE01": raw_source_tables(spark)}
    # watermark in the future ⇒ extract yields nothing
    init_source_servers(spark, control, ["SQLNODE01"],
                        initial_watermark=dt.datetime(2030, 1, 1))
    r = run_etl(spark, sources, control, target)
    assert r.rows_appended == 0
    marks = read_source_servers(spark, control).collect()
    assert marks[0]["LastETLDatetime"] == dt.datetime(2030, 1, 1)


def test_logid_hwm_sidecar(spark, tmp_path):
    """The incremental path seeds LogIDs from the one-row sidecar, not a
    full-sink scan; ids stay unique and increasing across runs, and a
    missing sidecar (pre-existing sink) is reseeded by a one-time scan."""
    from sqlbackuphistoryetl_spark import fsutil
    from sqlbackuphistoryetl_spark.plans import etl as etl_mod

    control = str(tmp_path / "control")
    target = str(tmp_path / "consolidated")
    sources = {"SQLNODE01": raw_source_tables(spark)}
    init_source_servers(spark, control, ["SQLNODE01"],
                        initial_watermark=dt.datetime(2025, 1, 1, 9, 0))
    run_etl(spark, sources, control, target)
    hwm_path = etl_mod._hwm_path(target)
    assert fsutil.exists(spark, hwm_path)
    hwm1 = etl_mod._read_logid_hwm(spark, target)
    max_id1 = spark.read.parquet(target).agg(F.max("LogID")).first()[0]
    assert hwm1 >= max_id1

    # replay run: hwm only moves forward, no duplicate ids in the sink
    run_etl(spark, sources, control, target)
    assert etl_mod._read_logid_hwm(spark, target) >= hwm1
    ids = [r["LogID"] for r in spark.read.parquet(target).select("LogID").collect()]
    assert len(ids) == len(set(ids))

    # sidecar lost ⇒ fallback full scan reseeds from the sink itself
    fsutil.delete(spark, hwm_path)
    assert etl_mod._read_logid_hwm(spark, target) == max_id1


def test_rewind_watermark_backfill(spark, tmp_path):
    """Operational backfill: rewind moves one server's mark backwards
    (others untouched), rejects forward jumps and unknown servers, and
    the replay after a rewind appends nothing new (idempotent sink)."""
    from sqlbackuphistoryetl_spark.plans.watermark import rewind_watermark

    control = str(tmp_path / "control")
    target = str(tmp_path / "consolidated")
    sources = {"SQLNODE01": raw_source_tables(spark)}
    init_source_servers(spark, control, ["SQLNODE01", "SQLNODE02"],
                        initial_watermark=dt.datetime(2025, 1, 1, 9, 0))
    run_etl(spark, sources, control, target)
    n_after_first = spark.read.parquet(target).count()

    rewind_watermark(spark, control, "SQLNODE01", dt.datetime(2025, 1, 1, 0, 0))
    marks = {r["ServerName"]: r["LastETLDatetime"]
             for r in read_source_servers(spark, control).collect()}
    assert marks["SQLNODE01"] == dt.datetime(2025, 1, 1, 0, 0)
    assert marks["SQLNODE02"] == dt.datetime(2025, 1, 1, 9, 0)  # untouched

    # full replay from the rewound mark: sink absorbs the overlap
    r = run_etl(spark, sources, control, target)
    assert r.rows_appended >= 0
    # nothing duplicated: the same logical rows, plus any older rows now
    # in range (watermark 00:00 sees set 4 too)
    sink = spark.read.parquet(target)
    key_rows = sink.select("database_name", "BackupType", "first_lsn",
                           "last_lsn", "physical_device_name").distinct().count()
    assert key_rows == sink.count() >= n_after_first

    import pytest as _pt
    with _pt.raises(ValueError):
        rewind_watermark(spark, control, "SQLNODE01", dt.datetime(2030, 1, 1))
    with _pt.raises(ValueError):
        rewind_watermark(spark, control, "NOPE", dt.datetime(2020, 1, 1))


def test_single_source_read_per_run(spark, tmp_path):
    """r3 verdict task 4: run_etl must pull each source exactly once —
    the append AND the watermark maxima both derive from one
    materialized batch (localCheckpoint), never from re-executing the
    extract lineage (a second pull from N production servers, and a
    consistency hazard if rows land between the two jobs).

    The probe: backupset flows through an accumulator-counting RDD map,
    so every executed pass over the source adds its row count."""
    from sqlbackuphistoryetl_spark.sources.fixtures import raw_source_rows
    from sqlbackuphistoryetl_spark.sources.readers import SourceTables
    from sqlbackuphistoryetl_spark import schema

    control = str(tmp_path / "control")
    target = str(tmp_path / "consolidated")

    rows = raw_source_rows()
    acc = spark.sparkContext.accumulator(0)

    def counted(row):
        acc.add(1)
        return row

    plain = spark.createDataFrame(rows["backupset"], schema.BACKUPSET)
    n_src = plain.count()
    counted_bs = spark.createDataFrame(
        plain.rdd.map(counted), schema=plain.schema
    )
    sources = {
        "SQLNODE01": SourceTables(
            backupset=counted_bs,
            backupmediafamily=spark.createDataFrame(
                rows["backupmediafamily"], schema.BACKUPMEDIAFAMILY),
            backupfile=spark.createDataFrame(
                rows["backupfile"], schema.BACKUPFILE),
            databases=spark.createDataFrame(rows["databases"], schema.DATABASES),
            replica_states=spark.createDataFrame(
                rows["replica_states"], schema.REPLICA_STATES),
            availability_groups=spark.createDataFrame(
                rows["availability_groups"], schema.AVAILABILITY_GROUPS),
        )
    }
    init_source_servers(spark, control, ["SQLNODE01"],
                        initial_watermark=dt.datetime(2025, 1, 1, 9, 0))
    r = run_etl(spark, sources, control, target)
    assert r.rows_appended > 0
    # one materialization pass — not one per downstream consumer
    assert acc.value == n_src, (
        f"backupset scanned {acc.value} source rows for {n_src}-row table: "
        "extract lineage re-executed"
    )


def test_hwm_written_before_append(spark, tmp_path, monkeypatch):
    """Crash-window ordering (r4 ADVICE): the LogID sidecar is written
    BEFORE the idempotent append, so a crash between the two leaves an
    hwm that still bounds every id the crashed attempt may have
    committed — replays then cost only id gaps, never collisions from a
    re-derived LOWER hwm."""
    from sqlbackuphistoryetl_spark.plans import etl as etl_mod

    control = str(tmp_path / "control")
    target = str(tmp_path / "consolidated")
    sources = {"SQLNODE01": raw_source_tables(spark)}
    init_source_servers(spark, control, ["SQLNODE01"],
                        initial_watermark=dt.datetime(2025, 1, 1, 9, 0))

    class Boom(RuntimeError):
        pass

    def crash_append(*a, **k):
        raise Boom("simulated crash during append")

    monkeypatch.setattr(etl_mod, "idempotent_append", crash_append)
    try:
        run_etl(spark, sources, control, target)
        raise AssertionError("append crash should propagate")
    except Boom:
        pass
    # the sidecar advanced even though the append never committed
    hwm_after_crash = etl_mod._read_logid_hwm(spark, target)
    assert hwm_after_crash > 0

    # recovery run: fresh ids start above the crashed attempt's mark
    monkeypatch.undo()
    run_etl(spark, sources, control, target)
    ids = [r["LogID"] for r in
           spark.read.parquet(target).select("LogID").collect()]
    assert len(ids) == len(set(ids))
    assert min(ids) > hwm_after_crash
