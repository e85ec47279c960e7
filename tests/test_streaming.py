"""Structured Streaming ingest variant (SURVEY §2.9)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from sqlbackuphistoryetl_spark import schema
from sqlbackuphistoryetl_spark.sources.fixtures import consolidated_rows
from sqlbackuphistoryetl_spark.streaming.ingest import (
    stream_ingest,
    streaming_backup_rollup,
)

# streaming source schema = consolidated with LogID already assigned
STREAM_SCHEMA = schema.CONSOLIDATED


def _write_landing(spark, rows, path, fname):
    spark.createDataFrame(rows, STREAM_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_stream_ingest_dedups_replay(spark, tmp_path):
    landing = str(tmp_path / "landing")
    target = str(tmp_path / "consolidated")
    ckpt = str(tmp_path / "ckpt")
    rows = consolidated_rows()

    # Watermark delay must tolerate cross-server event-time skew: the
    # fixture's AG rows are hours "behind" db_sa1's — with the default
    # 5-minute delay they'd be (correctly) discarded as late data.
    delay = "30 days"

    # batch 1: first 10 rows
    _write_landing(spark, rows[:10], landing, "b1")
    q = stream_ingest(spark, landing, target, ckpt, STREAM_SCHEMA, watermark_delay=delay)
    q.awaitTermination(120)

    assert spark.read.parquet(target).count() == 10

    # batch 2: overlap (rows 8-9 again) + the rest + an in-batch dup
    _write_landing(spark, rows[8:] + [rows[8]], landing, "b2")
    q = stream_ingest(spark, landing, target, ckpt, STREAM_SCHEMA, watermark_delay=delay)
    q.awaitTermination(120)

    sink = spark.read.parquet(target)
    assert sink.count() == len(rows)
    dups = sink.groupBy(*schema.CONSOLIDATED_KEY).count().filter("count > 1")
    assert dups.count() == 0


def test_streaming_rollup_memory_sink(spark, tmp_path):
    landing = str(tmp_path / "landing")
    _write_landing(spark, consolidated_rows(), landing, "b1")
    stream = spark.readStream.schema(STREAM_SCHEMA).parquet(landing)
    rollup = streaming_backup_rollup(stream, window_duration="1 hour")
    q = (
        rollup.writeStream.format("memory")
        .queryName("rollup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode only emits closed windows; finalize by checking the
    # aggregation shape instead on a complete-mode run
    q2 = (
        streaming_backup_rollup(
            spark.readStream.schema(STREAM_SCHEMA).parquet(landing)
        )
        .writeStream.format("memory")
        .queryName("rollup_complete")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    out = spark.sql("select * from rollup_complete").collect()
    assert out
    full_hours = {
        (r["window_start"].hour, r["BackupType"]): r["n_backups"] for r in out
        if r["server_name"] == "SQLNODE01"
    }
    # hour 0 holds the two F1 stripes
    assert full_hours[(0, "Full")] == 2


def test_stateful_chain_tracker_across_microbatches(spark, tmp_path):
    """applyInPandasWithState: state (chain head per database) must carry
    across micro-batches; a log whose first_lsn jumps past the head is a
    gap."""
    import datetime as dt
    from decimal import Decimal

    from sqlbackuphistoryetl_spark.streaming.stateful import track_chain_state

    landing = str(tmp_path / "landing")

    def row(kind, first, last, minute):
        base = {f.name: None for f in STREAM_SCHEMA.fields}
        base.update(
            LogID=first,
            database_name="db1",
            BackupType=kind,
            physical_device_name=f"X:\\b\\{first}.bak",
            backup_start_date=dt.datetime(2025, 1, 1, 0, minute),
            backup_finish_date=dt.datetime(2025, 1, 1, 0, minute, 30),
            server_name="S1",
            first_lsn=Decimal(first),
            last_lsn=Decimal(last),
        )
        return tuple(base[f.name] for f in STREAM_SCHEMA.fields)

    # batch file 1: Full anchors at 100, log 100->200
    _write_landing(spark, [row("Full", 1, 100, 1), row("Log", 100, 200, 2)], landing, "b1")
    # batch file 2: log 200->300 (ok), then gap: log 450->500
    _write_landing(spark, [row("Log", 200, 300, 3), row("Log", 450, 500, 4)], landing, "b2")

    stream = (
        spark.readStream.schema(STREAM_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(landing)
    )
    q = (
        track_chain_state(stream)
        .writeStream.format("memory")
        .queryName("chain_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from chain_state order by events_seen").collect()
    assert [r["status"] for r in out] == ["anchor", "ok", "ok", "gap"]
    assert out[-1]["chain_head"] == "500"
    assert out[-1]["events_seen"] == 4  # state survived the batch boundary


def test_chain_batch_twin_matches_streaming_transitions(spark):
    """§2.9 row 4: chain_status_batch applies the IDENTICAL transition
    table as track_chain_state (same prefix as the streaming test above
    ⇒ same statuses/head), plus the replay and no-anchor branches."""
    import datetime as dt
    from decimal import Decimal

    from sqlbackuphistoryetl_spark.streaming.stateful import (
        chain_status_batch,
    )

    def row(db, kind, first, last, minute):
        return (
            "S1", db, kind, Decimal(first), Decimal(last),
            dt.datetime(2025, 1, 1, 0, minute),
        )

    rows = [
        row("db1", "Full", 1, 100, 1),
        row("db1", "Log", 100, 200, 2),
        row("db1", "Log", 200, 300, 3),
        row("db1", "Log", 450, 500, 4),   # gap: jumped past head 300
        row("db1", "Log", 150, 250, 5),   # fully covered ⇒ replay, head stays
        row("db2", "Log", 5, 9, 1),       # log before any anchor
    ]
    df = spark.createDataFrame(
        rows,
        "server_name string, database_name string, BackupType string, "
        "first_lsn decimal(25,0), last_lsn decimal(25,0), "
        "backup_finish_date timestamp",
    )
    out = chain_status_batch(df).orderBy("database_name", "seen").collect()
    db1 = [r for r in out if r["database_name"] == "db1"]
    # first four transitions = the streaming test's expected sequence
    assert [r["status"] for r in db1] == ["anchor", "ok", "ok", "gap", "replay"]
    assert str(db1[-1]["chain_head"]) == "500"
    assert [r["seen"] for r in db1] == [1, 2, 3, 4, 5]
    db2 = [r for r in out if r["database_name"] == "db2"]
    assert [(r["status"], str(r["chain_head"])) for r in db2] == [("no_anchor", "9")]


def test_batch_twin_matches_streaming_dedup_keys(spark, tmp_path):
    """§2.9 row 2: the batch twin (session_window) and the streaming
    dropDuplicatesWithinWatermark must keep the same set of first-seen
    keys when every duplicate arrives inside the watermark window —
    one shared definition of 'duplicate within the watermark'."""
    import datetime as dt

    from sqlbackuphistoryetl_spark.streaming.ingest import (
        dedup_within_watermark_batch,
    )

    base = dt.datetime(2025, 3, 1, 12, 0, 0)
    rows = [
        # key A: burst of 3 within 5 min, then a 4th far outside
        (1, "A", base),
        (1, "A", base + dt.timedelta(minutes=1)),
        (1, "A", base + dt.timedelta(minutes=2)),
        (1, "A", base + dt.timedelta(hours=2)),
        # key B: two events exactly 5 min apart (boundary: session_window
        # treats the gap as INCLUSIVE, so these merge) and one beyond
        (2, "B", base),
        (2, "B", base + dt.timedelta(minutes=5)),
        (2, "B", base + dt.timedelta(minutes=10, seconds=1)),
    ]
    sdf = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])

    batch = dedup_within_watermark_batch(
        sdf, ["user_id", "event_type"], ts_col="ts", delay="5 minutes"
    ).collect()
    kept_batch = {(r["user_id"], r["event_type"], r["kept_ts"]) for r in batch}
    assert kept_batch == {
        (1, "A", base),
        (1, "A", base + dt.timedelta(hours=2)),
        (2, "B", base),
        (2, "B", base + dt.timedelta(minutes=10, seconds=1)),
    }
    by_session = {(r["user_id"], r["kept_ts"].isoformat()): r["n_in_session"] for r in batch}
    assert by_session[(1, base.isoformat())] == 3  # burst collapsed

    # streaming side: replay in event-time order through
    # dropDuplicatesWithinWatermark and compare kept keys
    landing = str(tmp_path / "dedup_landing")
    spark.createDataFrame(rows, ["user_id", "event_type", "ts"]).coalesce(
        1
    ).write.parquet(landing)
    stream = (
        spark.readStream.schema("user_id long, event_type string, ts timestamp")
        .parquet(landing)
        .withWatermark("ts", "5 minutes")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup_stream_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    kept_stream = {
        (r["user_id"], r["event_type"])
        for r in spark.sql("select * from dedup_stream_out").collect()
    }
    # one micro-batch ⇒ stream keeps exactly one row per key-burst chain
    # that the batch twin also splits on
    assert kept_stream == {(1, "A"), (2, "B")}


def test_sessionize_matches_native_session_window(spark):
    """operators/sessionize.py's window-chain sessionization and Spark's
    native session_window (the Structured-Streaming session operator,
    run batch-side) are independent implementations of the same gap
    semantics — sessions must agree 1:1 on (user, start, size).
    Includes an exactly-at-gap pair (both treat the bound as
    inclusive: same session)."""
    import datetime as dtm

    from sqlbackuphistoryetl_spark.operators.sessionize import session_stats

    t0 = dtm.datetime(2024, 1, 1, 8, 0, 0)
    rows = []
    eid = 0
    for u in range(5):
        t = t0
        for i in range(20):
            # gaps cycle: 1 min, 30 min (exactly at gap), 31 min (over)
            t = t + dtm.timedelta(minutes=[1, 30, 31][i % 3])
            rows.append((eid, u, t, 1.0))
            eid += 1
    ev = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "value"])

    mine = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in session_stats(ev, gap_minutes=30).collect()
    }
    native = {
        (r["user_id"], r["sw"]["start"], r["n"])
        for r in ev.groupBy(
            F.session_window("ts", "30 minutes").alias("sw"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert mine == native and len(mine) > 5


def test_stream_dedup_ingest_screens_against_index(spark, tmp_path):
    """Streaming near-dup ingest (stream_dedup_ingest): batch 2's
    near-dup of a batch-1 doc is screened out via the persistent index;
    replaying batch 1's file content (new stream, same docs, fresh
    checkpoint) appends nothing — the index is the idempotency ledger."""
    from sqlbackuphistoryetl_spark.streaming.ingest import stream_dedup_ingest

    landing = str(tmp_path / "landing")
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "mh_index")
    schema = "doc_id long, text string"

    d1 = [(1, "the quick brown fox jumps over the lazy dog " * 4),
          (2, "completely different content about spark physical plans " * 4),
          (3, "completely different content about spark physical plans " * 4)]
    spark.createDataFrame(d1, schema).coalesce(1).write.mode(
        "append").parquet(landing)
    q = stream_dedup_ingest(spark, landing, corpus, index,
                            str(tmp_path / "ck1"), schema,
                            min_est_jaccard=0.5)
    q.awaitTermination(120)
    got1 = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
    assert got1 == {1, 2}  # 3 is an exact within-batch dup of 2

    # batch 2: one near-dup of doc 1 (one word changed), one novel doc
    d2 = [(10, "the quick brown fox jumps over the lazy cat " * 4),
          (11, "entirely novel text on duckdb oracle gates " * 4)]
    spark.createDataFrame(d2, schema).coalesce(1).write.mode(
        "append").parquet(landing)
    q = stream_dedup_ingest(spark, landing, corpus, index,
                            str(tmp_path / "ck1"), schema,
                            min_est_jaccard=0.5)
    q.awaitTermination(120)
    got2 = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
    assert got2 == {1, 2, 11}  # 10 screened as near-dup of 1

    # replay batches through a FRESH checkpoint: index screens them all
    q = stream_dedup_ingest(spark, landing, corpus, index,
                            str(tmp_path / "ck_replay"), schema,
                            min_est_jaccard=0.5)
    q.awaitTermination(120)
    got3 = sorted(r["doc_id"] for r in spark.read.parquet(corpus).collect())
    assert got3 == sorted(got2)  # nothing re-appended


def test_streaming_corpus_report_matches_batch(spark, tmp_path):
    from sqlbackuphistoryetl_spark.streaming.ingest import (
        streaming_corpus_report,
    )

    landing = str(tmp_path / "docs_landing")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.filter(F.col("doc_id") < 250).write.mode("append").parquet(landing)
    docs.filter(F.col("doc_id") >= 250).write.mode("append").parquet(landing)

    q = streaming_corpus_report(
        spark, landing, str(tmp_path / "ck"),
        schema="doc_id long, text string, lang string, source string, n_chars long",
        query_name="t_corpus_report",
    )
    q.awaitTermination(120)
    got = {(r["lang"], r["source"]): (r["n_docs"], r["total_chars"], r["total_tokens"])
           for r in spark.sql("select * from t_corpus_report").collect()}
    n_tok = F.size(F.expr(r"regexp_extract_all(text, '\\S+', 0)"))
    want = {(r["lang"], r["source"]): (r["n"], r["c"], r["t"])
            for r in docs.groupBy("lang", "source").agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.length("text").cast("long")).alias("c"),
                F.sum(n_tok.cast("long")).alias("t")).collect()}
    assert got == want and len(got) > 10


def test_stream_ingest_assigns_sidecar_logids(spark, tmp_path):
    """LogID-less landing batches draw surrogate ids from the same
    sidecar high-water mark as the batch ETL: unique across
    micro-batches (no fixed-stride collisions), monotone sidecar."""
    from pyspark.sql import types as T

    from sqlbackuphistoryetl_spark.plans import etl as etl_mod

    landing = str(tmp_path / "landing")
    target = str(tmp_path / "consolidated")
    ckpt = str(tmp_path / "ckpt")
    rows = consolidated_rows()
    noid_schema = T.StructType(
        [f for f in schema.CONSOLIDATED.fields if f.name != "LogID"]
    )

    def strip(row):
        d = dict(row.asDict()) if hasattr(row, "asDict") else dict(row)
        d.pop("LogID", None)
        return d

    spark.createDataFrame([strip(r) for r in rows[:10]], noid_schema).coalesce(
        1
    ).write.mode("append").parquet(landing)
    q = stream_ingest(spark, landing, target, ckpt, noid_schema,
                      watermark_delay="30 days")
    q.awaitTermination(120)
    hwm1 = etl_mod._read_logid_hwm(spark, target)
    ids1 = [r["LogID"] for r in spark.read.parquet(target).select("LogID").collect()]
    assert len(ids1) == len(set(ids1)) == 10
    assert hwm1 >= max(ids1)

    spark.createDataFrame([strip(r) for r in rows[10:]], noid_schema).coalesce(
        1
    ).write.mode("append").parquet(landing)
    q = stream_ingest(spark, landing, target, ckpt, noid_schema,
                      watermark_delay="30 days")
    q.awaitTermination(120)
    sink = spark.read.parquet(target)
    ids = [r["LogID"] for r in sink.select("LogID").collect()]
    assert len(ids) == len(set(ids)) == len(rows)
    assert etl_mod._read_logid_hwm(spark, target) >= max(ids) and max(ids) > hwm1
