"""Persistent MinHash LSH index — the warm side of incremental dedup.

``minhash_lsh_cross`` (dedup.py) screens an incoming batch against an
existing corpus by building BOTH sides' band entries in one job. At
production scale the existing side is petabytes that never change
between ingests — its band entries are precomputed once, stored, and
only the incoming batch pays signature cost per run. This module is
that stored side:

- :func:`write_minhash_index` — materialize (band, bucket, id, sig)
  entries to parquet, partitioned by band, with the signature
  parameters persisted alongside so queries can never silently use a
  mismatched sketch.
- :func:`append_minhash_index` — extend the index with an accepted
  batch (parquet append; same layout).
- :func:`query_minhash_index` — screen a new batch: signature + band
  the incoming docs only, band-join against the stored entries,
  estimate-filter before the pair-dedup shuffle.

Scale shape: the index is O(corpus × bands) narrow rows. A query
shuffles O(|incoming| × bands + collisions) — never re-reads, re-hashes
or self-pairs the stored corpus. Partitioning by band keeps each band's
bucket space in its own file set; at 100 TB, bucket-sort the entries
within partitions (or bucketBy(bucket) via ``sources/bucketed.py``) so
the band join co-locates without a full index shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqlbackuphistoryetl_spark.extensions import cachereg
from sqlbackuphistoryetl_spark.extensions.dedup import (
    _band_entries,
    minhash_signatures,
)

_META_SCHEMA = "num_hashes int, bands int, shingle_len int"


def _entries(
    df: DataFrame, text_col: str, id_col: str,
    num_hashes: int, bands: int, shingle_len: int,
) -> DataFrame:
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_len)
    return _band_entries(sigs, num_hashes, bands)


def write_minhash_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_len: int = 5,
) -> None:
    """Build and persist the band-entry index for ``df``. Overwrites any
    index at ``path``; the sketch parameters ride along in a one-row
    meta table."""
    entries = _entries(df, text_col, id_col, num_hashes, bands, shingle_len)
    entries.write.mode("overwrite").partitionBy("band").parquet(f"{path}/entries")
    meta = df.sparkSession.createDataFrame(
        [(num_hashes, bands, shingle_len)], _META_SCHEMA
    )
    meta.coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def read_index_meta(spark: SparkSession, path: str) -> tuple[int, int, int]:
    r = spark.read.parquet(f"{path}/meta").first()
    return r["num_hashes"], r["bands"], r["shingle_len"]


def append_minhash_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Add an accepted batch's entries to an existing index (the step
    after screening: survivors join the corpus so the NEXT batch sees
    them). Signature parameters come from the stored meta — an appended
    batch can never use a mismatched sketch."""
    num_hashes, bands, shingle_len = read_index_meta(df.sparkSession, path)
    entries = _entries(df, text_col, id_col, num_hashes, bands, shingle_len)
    entries.write.mode("append").partitionBy("band").parquet(f"{path}/entries")


def query_minhash_index(
    spark: SparkSession,
    incoming: DataFrame,
    path: str,
    min_est_jaccard: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Candidate near-dup pairs between ``incoming`` and the stored
    corpus: (incoming_id, index_id, est_jaccard), estimate-filtered
    map-side before the pair-dedup shuffle (same discipline as
    ``minhash_lsh_cross``). Only the incoming side is hashed."""
    num_hashes, bands, shingle_len = read_index_meta(spark, path)
    cachereg.begin("minhash_index_query")
    in_bands = cachereg.persist(
        "minhash_index_query",
        _entries(incoming, text_col, id_col, num_hashes, bands, shingle_len),
    )
    idx = spark.read.parquet(f"{path}/entries")
    l, r = in_bands.alias("l"), idx.alias("r")
    return (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket")),
        )
        .select(
            F.col("l._id").alias("incoming_id"),
            F.col("r._id").alias("index_id"),
            (
                F.size(
                    F.filter(
                        F.zip_with(F.col("l.sig"), F.col("r.sig"), lambda a, b: a == b),
                        lambda x: x,
                    )
                ).cast("double")
                / F.lit(float(num_hashes))
            ).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= min_est_jaccard)
        .dropDuplicates(["incoming_id", "index_id"])
    )


def compact_minhash_index(spark: SparkSession, path: str) -> None:
    """Rewrite the index's entry files: many appended micro-batches
    leave many small files per band; compaction coalesces each band's
    entries into parallelism-sized files sorted by bucket, so band
    joins scan fewer, row-group-skippable files. Entries are immutable
    rows — compaction is a pure relayout (same rows, verified cheap by
    count). Atomic via temp-dir + rename, like the retention rewrite.
    """
    import uuid

    from sqlbackuphistoryetl_spark import fsutil

    entries = spark.read.parquet(f"{path}/entries")
    tmp = f"{path}/_entries_compact_{uuid.uuid4().hex}"
    (
        entries.repartition("band")
        .sortWithinPartitions("bucket")
        .write.mode("overwrite")
        .partitionBy("band")
        .parquet(tmp)
    )
    fsutil.delete(spark, f"{path}/entries")
    fsutil.rename(spark, tmp, f"{path}/entries")


def delete_from_minhash_index(
    spark: SparkSession, path: str, ids: DataFrame, id_col: str = "doc_id"
) -> None:
    """Remove documents from the index (the corpus-deletion / takedown
    path): one anti-join rewrite of the entries, atomic via temp-dir +
    rename. Cost is one pass over the index — batch takedowns together.
    The deleted docs stop matching future queries immediately; their
    corpus rows are the caller's to delete (the index never stores
    text, only signatures)."""
    import uuid

    from sqlbackuphistoryetl_spark import fsutil

    entries = spark.read.parquet(f"{path}/entries")
    doomed = ids.select(F.col(id_col).alias("_id"))
    kept = entries.join(F.broadcast(doomed), "_id", "left_anti")
    tmp = f"{path}/_entries_delete_{uuid.uuid4().hex}"
    kept.write.mode("overwrite").partitionBy("band").parquet(tmp)
    fsutil.delete(spark, f"{path}/entries")
    fsutil.rename(spark, tmp, f"{path}/entries")


def sync_index_with_corpus(
    spark: SparkSession,
    path: str,
    old_corpus: DataFrame,
    new_corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict[str, int]:
    """Bring the index in line with a new corpus snapshot by applying
    only the DIFF (extensions/versioning.py: corpus_diff): removed and
    changed ids drop out of the index, added and changed docs re-sign
    and append. Cost is one index rewrite (the deletes) plus signature
    work proportional to the churn — never a full-corpus re-hash, which
    is the point of keeping an index at 100 TB.

    Returns the applied churn counts {added, removed, changed}.
    """
    from sqlbackuphistoryetl_spark.extensions.versioning import corpus_diff

    diff = corpus_diff(old_corpus, new_corpus, id_col=id_col,
                       content_cols=[text_col])
    churn = diff.filter(F.col("status") != "unchanged").select(
        id_col, "status"
    ).localCheckpoint(eager=True)
    counts = {r["status"]: r["n"] for r in churn.groupBy("status")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    doomed = churn.filter(F.col("status").isin("removed", "changed"))
    if counts.get("removed", 0) or counts.get("changed", 0):
        delete_from_minhash_index(spark, path, doomed, id_col=id_col)
    fresh_ids = churn.filter(F.col("status").isin("added", "changed"))
    if counts.get("added", 0) or counts.get("changed", 0):
        fresh = new_corpus.join(fresh_ids.select(id_col), id_col, "left_semi")
        append_minhash_index(fresh, path, text_col, id_col)
    return {s: counts.get(s, 0) for s in ("added", "removed", "changed")}
