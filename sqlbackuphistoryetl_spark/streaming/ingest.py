"""Structured Streaming formalization of the ingest (SURVEY §2.9).

The reference is a scheduled micro-batch puller with a manual watermark
table; its streaming concepts map 1:1 onto Structured Streaming:

| reference                               | here                          |
|-----------------------------------------|-------------------------------|
| LastETLDatetime per source              | engine watermark / checkpoint |
| 5-min replay buffer + ignore_dup_key    | dropDuplicatesWithinWatermark |
| row-at-a-time proc loader               | foreachBatch → set-based merge|
| (absent) frequency rollups              | windowed streaming aggregation|

``stream_ingest`` reads extracted-batch parquet landing files as a
stream and merges each micro-batch idempotently (same anti-join sink as
batch mode — exactly-once on the logical key even across restarts,
because the merge itself is idempotent; checkpointing only bounds
reprocessing).

Scale notes: state in dropDuplicatesWithinWatermark is bounded by the
watermark delay (5 min of keys), not history; the foreachBatch merge
prunes sink partitions by the batch's own date range.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.merge import idempotent_append
from ..schema import CONSOLIDATED_KEY


def stream_ingest(
    spark: SparkSession,
    landing_path: str,
    target_path: str,
    checkpoint_path: str,
    schema,
    watermark_delay: str = "5 minutes",
    available_now: bool = True,
) -> StreamingQuery:
    """Stream extracted-batch files from ``landing_path`` into the
    consolidated sink with watermark-bounded dedup.

    ``schema``: the extract's 18/19-column schema (streaming file
    sources require a declared schema — SURVEY §1.3, no inference).
    """
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "16")
        .parquet(landing_path)
        .withWatermark("backup_finish_date", watermark_delay)
        .dropDuplicatesWithinWatermark(CONSOLIDATED_KEY)
    )

    def _merge_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        bounds = batch.agg(F.min("backup_start_date").alias("lo")).first()
        overlap_start = bounds["lo"]
        if "LogID" not in batch.columns:
            # Surrogate ids ride the same one-row sidecar high-water mark
            # as the batch ETL (plans/etl.py) — a fixed batch_id stride
            # over monotonically_increasing_id is NOT collision-free
            # (mono ids embed the partition id in bits 33+, so ≥128
            # partitions overflow any stride that still leaves batch
            # headroom). Replayed batches draw fresh ids from the
            # current mark; their rows are dropped by the anti-join
            # anyway, so replays cost id gaps, never collisions.
            from ..plans.etl import _read_logid_hwm, _write_logid_hwm

            sess = batch.sparkSession
            prev_hwm = _read_logid_hwm(sess, target_path)
            batch = batch.withColumn(
                "LogID",
                (F.monotonically_increasing_id() + F.lit(prev_hwm + 1)).cast("long"),
            )
            batch = batch.localCheckpoint(eager=True)  # pin ids once
            new_hwm = batch.agg(F.max("LogID")).first()[0]
            # Sidecar BEFORE the append (r4 ADVICE, same ordering as
            # run_etl): written first, the mark bounds every id the
            # append may commit, so a crash between the two costs only
            # an id gap on replay — never a collision from a re-derived
            # LOWER hwm when the replayed batch lands in fewer
            # partitions.
            if new_hwm is not None and new_hwm > prev_hwm:
                _write_logid_hwm(sess, target_path, new_hwm)
            idempotent_append(
                sess, batch, target_path, overlap_start=overlap_start
            )
            return
        idempotent_append(
            batch.sparkSession, batch, target_path, overlap_start=overlap_start
        )

    writer = (
        stream.writeStream.foreachBatch(_merge_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_within_watermark_batch(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    delay: str = "5 minutes",
) -> DataFrame:
    """Batch twin of ``dropDuplicatesWithinWatermark`` (§2.9 row 2):
    one kept row per (keys, session), where a session is a maximal chain
    of same-key events whose inter-arrival gaps are <= ``delay``
    (session_window's gap bound is inclusive) — exactly Spark's native
    ``session_window`` semantics for point events, so the streaming and
    batch paths share one definition of "duplicate within the watermark".

    Returns (keys..., kept_ts = earliest event of the session,
    n_in_session = kept + dropped count). Scale: one hash shuffle on the
    grouping keys; session merging is per-key local state, no window
    over the full table.
    """
    return (
        df.groupBy(F.session_window(F.col(ts_col), delay).alias("sw"), *keys)
        .agg(
            F.min(ts_col).alias("kept_ts"),
            F.count(F.lit(1)).alias("n_in_session"),
        )
        .select(*keys, "kept_ts", "n_in_session")
    )


def streaming_backup_rollup(
    stream: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window backup-frequency rollup per (server, type) — the
    §2.9 'extension layer' aggregation the reference lacks. Works on any
    streaming DataFrame with the consolidated schema."""
    return (
        stream.withWatermark("backup_finish_date", watermark_delay)
        .groupBy(
            F.window("backup_finish_date", window_duration).alias("win"),
            F.col("server_name"),
            F.col("BackupType"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_backups"),
            F.sum(F.col("UncompressedSizeMB").cast("long")).alias("total_mb"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "server_name",
            "BackupType",
            "n_backups",
            "total_mb",
        )
    )


def stream_dedup_ingest(
    spark: SparkSession,
    landing_path: str,
    corpus_path: str,
    index_path: str,
    checkpoint_path: str,
    schema,
    min_est_jaccard: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming incremental corpus ingest with near-dup screening: each
    micro-batch of documents is checked against the PERSISTENT MinHash
    index (extensions/dedup_index.py); survivors are appended to the
    corpus AND their band entries to the index, so later batches —
    including later files of the same stream — see them.

    The dedup-service loop the cross-corpus docstring promises
    (dedup.py: minhash_lsh_cross), closed over Structured Streaming:

      micro-batch → query_minhash_index → anti-join flagged →
      append_minhash_index → append corpus

    The index append runs FIRST and doubles as the idempotency ledger: a
    replayed batch's docs match their own indexed signatures
    (est_jaccard 1.0 ≥ any threshold) and are dropped by the screen, so
    the corpus never receives a row twice. The two appends are not
    atomic — a crash BETWEEN them leaves a doc indexed but unstored
    (screened out on replay instead of duplicated; the dedup contract
    degrades to at-most-once for the crashed batch, never to corpus
    duplicates). Repair is one ``sync_index_with_corpus`` run, which
    reconciles the index against what the corpus actually holds.
    Within-batch screening is EXACT dedup only (md5 + min-id) — two
    near-but-not-identical duplicates arriving in the same micro-batch
    both pass; the first indexed batch screens all later ones.

    State is all on disk (index parquet), not in streaming state — no
    watermark needed, unbounded lateness tolerated, and the index is
    shared with any batch pipeline writing through the same path.
    """
    from sqlbackuphistoryetl_spark.extensions.dedup_index import (
        append_minhash_index,
        query_minhash_index,
    )
    from sqlbackuphistoryetl_spark import fsutil

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "4")
        .parquet(landing_path)
    )

    def _screen_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        sess = batch.sparkSession
        # within-batch exact dedup (min id per content hash)
        keep = (
            batch.select(F.col(id_col), F.md5(F.col(text_col)).alias("_h"))
            .groupBy("_h").agg(F.min(id_col).alias(id_col)).select(id_col)
        )
        batch = batch.join(keep, id_col, "left_semi")
        if fsutil.exists(sess, f"{index_path}/meta"):
            flagged = query_minhash_index(
                sess, batch, index_path, min_est_jaccard,
                text_col=text_col, id_col=id_col,
            ).select(F.col("incoming_id").alias(id_col)).distinct()
            batch = batch.join(flagged, id_col, "left_anti")
            # one barrier: accepted set reused for index + corpus writes
            batch = batch.localCheckpoint(eager=True)
            if batch.isEmpty():
                return
            # ledger first (see docstring): a crash after this line
            # screens the batch out on replay instead of duplicating it
            append_minhash_index(batch, index_path, text_col, id_col)
            batch.write.mode("append").parquet(corpus_path)
        else:
            batch = batch.localCheckpoint(eager=True)
            from sqlbackuphistoryetl_spark.extensions.dedup_index import (
                write_minhash_index,
            )
            write_minhash_index(batch, index_path, text_col, id_col)
            batch.write.mode("append").parquet(corpus_path)

    writer = (
        stream.writeStream.foreachBatch(_screen_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_corpus_report(
    spark: SparkSession,
    landing_path: str,
    checkpoint_path: str,
    schema,
    query_name: str = "corpus_report",
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming twin of the batch ``corpus_report`` gate: running
    per-(lang, source) doc/char/token totals over a document landing
    stream, maintained incrementally (complete-mode agg state is one
    row per group — group cardinality, not corpus size). The final
    table after draining the stream equals the batch report over the
    same files (asserted in tests), so monitoring and batch accounting
    share one definition.
    """
    stream = spark.readStream.schema(schema).parquet(landing_path)
    n_tok = F.size(F.expr(r"regexp_extract_all(text, '\\S+', 0)"))
    agg = stream.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text").cast("long")).alias("total_chars"),
        F.sum(n_tok.cast("long")).alias("total_tokens"),
    )
    writer = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
