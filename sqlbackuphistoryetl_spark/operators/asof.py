"""Backward as-of join (pandas ``merge_asof`` semantics, distributed).

For every left row, attach the payload of the latest right row with the
same key whose timestamp is <= (or strictly <, with
``allow_exact_matches=False``) the left row's timestamp. The reference's
restore-chain walk is exactly this shape — "the newest Full backup at
or before the STOPAT time" (sql:864-875 TOP 1 ... where last_lsn <= @x
order by last_lsn desc) — generalized to any keyed event feed.

Spark has no as-of join operator; the scalable composition is the
union-then-window form rather than an inequality join:

1. tag both sides and align schemas (``unionByName`` with missing
   columns null-filled);
2. ONE shuffle partitioned by the join key, ordered by
   (ts, side, tiebreak) — right rows sort before left rows at equal
   timestamps iff exact matches are allowed;
3. ``last(payload, ignorenulls=True)`` over rows UNBOUNDED
   PRECEDING..CURRENT ROW carries the newest right payload forward;
4. keep only left rows.

Cost: one shuffle of |L|+|R| narrow rows — no range-join cross
product, no per-key collect. Skewed keys behave like any other
window skew (AQE/salting apply). An inequality-join formulation
(l.ts >= r.ts) would explode to |L|·|R| per key before a TOP-1 —
that is the plan this operator exists to avoid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    payload_cols: list[str],
    allow_exact_matches: bool = True,
    tiebreak_cols: list[str] | None = None,
    prefix: str = "asof_",
    direction: str = "backward",
) -> DataFrame:
    """Left rows + ``{prefix}{c}`` for each payload column (null when no
    qualifying right row exists). ``tiebreak_cols`` (right-side columns)
    make the winner among right rows with identical (key, ts)
    deterministic — the LARGEST tiebreak value wins, matching "latest
    entry wins" replay semantics.

    ``direction`` follows pandas ``merge_asof``: "backward" (default)
    attaches the latest right row at-or-before the left timestamp;
    "forward" the earliest right row at-or-after it. Forward is the
    same one-shuffle union-then-window plan traversed in descending
    time — no second shuffle, no inequality join.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    tiebreak_cols = tiebreak_cols or []
    out_cols = list(left.columns)

    l_tag = left.withColumn("_side", F.lit(1))
    # one struct per right row (not per-column last()): a null FIELD in
    # the newest right row must surface as null, not fall through to an
    # older row's value — ignorenulls skips whole-struct nulls only.
    r_tag = (
        right.select(
            *on,
            F.col(ts_col),
            F.struct(*[F.col(c).alias(c) for c in payload_cols]).alias("_rp"),
            *[F.col(c).alias(f"_tb_{c}") for c in tiebreak_cols],
        )
        .withColumn("_side", F.lit(0))
    )
    u = l_tag.unionByName(r_tag, allowMissingColumns=True)

    # at equal ts: side 0 (right) first => included in the left row's
    # preceding frame => exact matches allowed; side order flipped for
    # strict-before. Right-side peers order by tiebreak ASC so last()
    # takes the largest.
    side_order = F.col("_side").asc() if allow_exact_matches else F.col("_side").desc()
    ts_order = F.col(ts_col).asc() if direction == "backward" else F.col(ts_col).desc()
    order = [ts_order, side_order] + [
        F.col(f"_tb_{c}").asc_nulls_first() for c in tiebreak_cols
    ]
    w = (
        Window.partitionBy(*[F.col(c) for c in on])
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last(F.col("_rp"), ignorenulls=True).over(w)
    return (
        u.select(*out_cols, F.col("_side"), matched.alias("_m"))
        .filter(F.col("_side") == 1)
        .select(
            *out_cols,
            *[F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in payload_cols],
        )
    )
