"""Skew-mitigation operators for hot-key aggregation.

AQE splits skewed JOIN partitions automatically, but a skewed
``groupBy`` still funnels one key's full row mass into one reduce task:
the map-side partial combine already bounds the wire for algebraic
aggregates, yet pathological cases (a bot user with 10⁹ events, the
empty-string line in a boilerplate scan) can overwhelm even the partial
path when upstream partitions are key-clustered. ``salted_agg`` makes
the two-stage shape explicit and plan-guaranteed:

1. stage 1 aggregates on (keys…, salt) — the hot key fans out across
   ``buckets`` reducers;
2. stage 2 merges the per-salt partials on the true keys — at most
   ``buckets`` rows per key reach the final task.

Only algebraic aggregates compose this way (sum/count/min/max — merge
of partials == aggregate of whole); the API takes (column, op) pairs
and refuses anything non-algebraic rather than silently mis-merging.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: op name -> (stage-1 aggregate, stage-2 merge aggregate)
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    buckets: int = 32,
    salt_col: str | Column | None = None,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs``: (column, op, output_name) with op ∈ sum|count|min|max.
    ``salt_col``: expression to salt by (default: a deterministic hash
    of the whole row via ``spark_partition_id`` + monotonic id is NOT
    used — it would break retry determinism; the default salts by
    ``xxhash64`` of all non-key columns, which spreads a hot key's rows
    by content).
    """
    bad = [op for _, op, _ in aggs if op not in _ALGEBRAIC]
    if bad:
        raise ValueError(
            f"non-algebraic ops {bad}: only {sorted(_ALGEBRAIC)} merge "
            "correctly across salt buckets"
        )
    if salt_col is None:
        others = [c for c in df.columns if c not in keys]
        if not others:
            raise ValueError(
                "no non-key columns to derive a deterministic salt from; "
                "pass salt_col explicitly"
            )
        salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in others]), F.lit(buckets))
    elif isinstance(salt_col, str):
        salt_col = F.pmod(F.xxhash64(F.col(salt_col)), F.lit(buckets))

    stage1 = df.withColumn("_salt", salt_col).groupBy(*keys, "_salt").agg(
        *[
            _ALGEBRAIC[op][0](F.col(col)).alias(f"_p_{name}")
            for col, op, name in aggs
        ]
    )
    return stage1.groupBy(*keys).agg(
        *[
            _ALGEBRAIC[op][1](F.col(f"_p_{name}")).alias(name)
            for _, op, name in aggs
        ]
    )
