"""Corpus snapshot diffing — the data-ops primitive behind dataset
versioning: given two snapshots of a corpus, classify every document as
added / removed / changed / unchanged by content fingerprint.

Training pipelines re-crawl and re-curate; before re-running a 100 TB
dedup + tokenize chain, the first question is always "what actually
changed since the last snapshot" — the answer bounds the incremental
work (only added/changed docs need re-processing; removed ids need
tombstones in downstream indexes).

Scale shape: ONE full-outer equi-join on the id — the minimum possible
for a keyed diff — with the content fingerprint computed map-side on
each side, so the join carries (id, md5) pairs, never text. With both
snapshots written bucketed by id (the recommended layout for versioned
corpora) the join is co-located and shuffle-free; otherwise it is one
keyed shuffle per side, both AQE-managed. The summary is a map-side-
partial hash aggregate over the (tiny) status column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def content_fingerprint(*cols: Column | str) -> Column:
    """md5 over the '|'-joined string forms of the content columns —
    the cross-engine-stable change detector (never float-formatting-
    sensitive columns; text/int columns only)."""
    return F.md5(
        F.concat_ws(
            "|", *[F.col(c).cast("string") if isinstance(c, str) else c.cast("string") for c in cols]
        )
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    content_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff of two corpus snapshots.

    Output: one row per id present in either snapshot —
    (id_col, status ∈ {added, removed, changed, unchanged},
    old_md5, new_md5). ``content_cols`` defaults to ["text"].
    """
    content_cols = content_cols or ["text"]
    o = old.select(
        F.col(id_col), content_fingerprint(*content_cols).alias("old_md5")
    )
    n = new.select(
        F.col(id_col), content_fingerprint(*content_cols).alias("new_md5")
    )
    joined = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("old_md5").isNull(), F.lit("added"))
        .when(F.col("new_md5").isNull(), F.lit("removed"))
        .when(F.col("old_md5") != F.col("new_md5"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(id_col, status.alias("status"), "old_md5", "new_md5")


def diff_summary(diff: DataFrame) -> DataFrame:
    """Per-status counts of a ``corpus_diff`` frame — the one-line
    answer "N added / M changed" that gates an incremental re-run."""
    return diff.groupBy("status").agg(F.count(F.lit(1)).alias("n_docs"))
