"""Gap-based sessionization of event streams (batch form).

The batch twin of ``session_window`` streaming aggregation
(streaming/ingest.py): assign every event to a session that closes when
the actor is idle for longer than ``gap``; then reduce each session to
its summary row. This is the classic two-window plan:

1. ``lag(ts)`` over (user, ts-order) marks session starts
   (gap exceeded, or first event);
2. a running sum of the start flags over the same window numbers the
   sessions per user;
3. one hash-aggregate on (user, session_seq) produces the summaries.

Both windows and the aggregate share ONE partitioning (user_id), so the
whole plan costs a single shuffle; Spark plans the two window functions
in one Window node. Per-user ordering happens inside each hash
partition — no global sort. Skew note for 100 TB: a monster user (bot
traffic) serializes its own partition only; salting cannot apply here
because session numbering needs the user's full ordered history, so the
mitigation is upstream bot filtering or a per-user event cap.

Sum determinism: ``value`` is quantized to integer cents
(floor(x·100+0.5), one IEEE multiply+floor on identical inputs) before
summing, so session totals are exact integers — order-free and
bit-identical across engines (the repo-wide float-SUM rule,
__spark_entry__.py module docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Append ``session_seq`` (1-based per-user session number): a new
    session starts at the first event and whenever the time since the
    previous event exceeds ``gap_minutes``. Order within a user is
    (ts, order_tiebreak) — total, so numbering is deterministic even
    with equal timestamps."""
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(order_tiebreak).asc()
    )
    # TIMESTAMP_NTZ has no direct long cast; route via an explicit UTC
    # epoch conversion (session tz is pinned to UTC in session.py, so
    # this is deterministic for LTZ inputs too).
    ts_s = F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    prev = F.lag(ts_s).over(w)
    is_new = F.when(
        prev.isNull() | (ts_s - prev > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    run = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(order_tiebreak).asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.withColumn("session_seq", F.sum(is_new).over(run))


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_tiebreak: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """One row per (user, session): start/end timestamps, event count,
    and the exact session value total in integer cents."""
    s = sessionize(events, user_col, ts_col, order_tiebreak, gap_minutes)
    cents = F.floor(F.col(value_col) * F.lit(100.0) + F.lit(0.5)).cast("long")
    return (
        s.groupBy(user_col, "session_seq")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents).alias("value_cents"),
        )
    )
