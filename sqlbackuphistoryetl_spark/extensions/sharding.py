"""Deterministic global ordinals and shard assignment for corpus export.

The terminal stage of a training-data pipeline writes the curated
corpus as numbered shards in a stable global order (so a training run
reads deterministic data regardless of cluster layout). The naive
expression — ``row_number() OVER (ORDER BY ...)`` with no partition —
collapses the whole corpus into ONE task and is exactly the kind of
plan that works at sf0.1 and dies at 100 TB.

``global_ordinals`` computes the same answer with a two-phase plan that
never funnels data through one task:

1. range-repartition by the sort key (Spark samples the key
   distribution and builds balanced, non-overlapping key ranges —
   the same machinery behind a distributed sort);
2. one tiny job collects the per-partition row COUNTS (a few hundred
   longs — driver-side by design, not a data collect);
3. each partition then ranks locally (window partitioned by the
   physical partition id) and adds its broadcast prefix-sum offset.

Cost: one shuffle (the range exchange) + one O(partitions) count job.
The per-partition window sorts only its own range — fully parallel.

The sort key must be a TOTAL order (include a unique tiebreak column);
equal keys may straddle a range boundary, and only a total order makes
the assignment unique and engine-reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sqlbackuphistoryetl_spark.extensions import cachereg


# the shared width policy lives in extensions/partitioning.py (r14:
# promoted from this module's leading-underscore helper per r13 advice;
# packing.global_cumsum imports the same public function). The alias
# keeps the documented test surface stable.
from sqlbackuphistoryetl_spark.extensions.partitioning import (  # noqa: E402
    adaptive_partitions as _adaptive_partitions,
)


def global_ordinals(
    df: DataFrame,
    order_cols: list[str],
    shard_size: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``ordinal`` (dense 0..N-1 in ``order_cols`` order) and —
    when ``shard_size`` is given — ``shard = ordinal div shard_size``.

    The range-partitioned frame is persisted for the duration of the
    call's generation (cachereg) so the count job and the ranked output
    see the SAME partition boundaries; Spark's range sampler is
    seeded per-RDD, so an unpersisted recompute could legally re-draw
    boundaries between the two jobs.
    """
    p = _adaptive_partitions(df, num_partitions)
    cachereg.begin("global_ordinals")
    ranged = cachereg.persist(
        "global_ordinals",
        df.repartitionByRange(p, *[F.col(c) for c in order_cols]).withColumn(
            "_pid", F.spark_partition_id()
        ),
    )
    counts = {
        r["_pid"]: r["n"]
        for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    if offsets:
        # one parsed literal map, not 2·p F.lit round-trips (r13)
        off_map = F.expr(
            "map("
            + ", ".join(f"{int(pid)}, {int(off)}" for pid, off in offsets.items())
            + ")"
        )
        offset = F.coalesce(off_map[F.col("_pid")], F.lit(0))
    else:
        offset = F.lit(0)
    w = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in order_cols])
    out = ranged.withColumn(
        "ordinal", (F.row_number().over(w) - 1 + offset).cast("long")
    ).drop("_pid")
    if shard_size is not None:
        # integer div — a double quotient would round above 2^53 rows
        out = out.withColumn("shard", F.expr(f"ordinal div {int(shard_size)}"))
    return out


def write_sharded_jsonl(
    df: DataFrame,
    path: str,
    order_cols: list[str],
    shard_size: int,
    num_partitions: int | None = None,
) -> int:
    """Export terminal: write the corpus as numbered JSONL shards of
    exactly ``shard_size`` rows (last shard ragged) in a stable global
    order — the layout a training dataloader consumes.

    Rides :func:`global_ordinals` (one range shuffle + O(partitions)
    count job), then ``partitionBy("shard")`` writes each shard's rows
    together; ``ordinal`` rides along inside each record so a reader
    can verify stream order. Returns the number of shards written.

    At 100 TB: shard count = N/shard_size directories, each written by
    the tasks owning its ordinal range — no single-writer funnel. Rows
    within a shard file are in ordinal order because each range
    partition holds a contiguous ordinal run.
    """
    ranked = global_ordinals(df, order_cols, shard_size=shard_size,
                             num_partitions=num_partitions)
    ranked.write.mode("overwrite").partitionBy("shard").json(path)
    # shard count from the FS listing — no second data pass
    from sqlbackuphistoryetl_spark import fsutil

    spark = df.sparkSession
    return sum(
        1 for n in fsutil.list_child_names(spark, path) if n.startswith("shard=")
    )
