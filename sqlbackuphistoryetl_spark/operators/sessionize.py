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


def funnel_conversion(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel: for each user, the earliest strictly-increasing
    timestamp chain through ``steps`` (step k must occur AFTER the
    user's chosen step k-1 occurrence; the chain is the greedy earliest
    one, the standard funnel definition). Output: one row per user with
    ``step_<k>_ts`` per stage (NULL once the funnel breaks) and
    ``steps_completed``.

    Plan: ONE shuffle — a single (user) hash-aggregate over sorted
    per-user (ts, type) structs, then the chain walk runs as a per-row
    ``aggregate`` fold over that array, entirely in codegen. No
    len(steps) self-joins, no window cascade; per-user state is the
    user's own events (same bound as sessionization). The fold carries
    [ts_0 … ts_{k-1}] and assigns ts_k := first event of type k after
    ts_{k-1} — greedy earliest chain.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    n = len(steps)
    ev = events.select(
        F.col(user_col),
        F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("tp")).alias("_e"),
    )
    per_user = ev.groupBy(user_col).agg(
        F.array_sort(F.collect_list("_e")).alias("_evs")
    )
    # fold state: array of length n (NULL = step not reached), typed to
    # the input ts column — hardcoding "timestamp" here coerced
    # timestamp_ntz inputs to TIMESTAMP, shifting collected wall-clocks
    # under a non-UTC session (and broke bigint event-time columns).
    ts_type = events.schema[ts_col].dataType
    init = F.array(*[F.lit(None).cast(ts_type) for _ in range(n)])
    step_arr = F.array(*[F.lit(s) for s in steps])

    def advance(acc, e):
        # the first un-filled step whose predecessor is filled and whose
        # type matches this event gets this event's ts
        return F.transform(
            acc,
            lambda ts, i: F.when(
                ts.isNull()
                & (e["tp"] == F.element_at(step_arr, i + 1))
                & ((i == 0) | F.element_at(acc, i).isNotNull())
                & ((i == 0) | (e["ts"] > F.element_at(acc, i))),
                e["ts"],
            ).otherwise(ts),
        )

    chain = F.aggregate("_evs", init, advance)
    out = per_user.select(user_col, chain.alias("_chain"))
    cols = [
        F.element_at("_chain", k + 1).alias(f"step_{k}_ts") for k in range(n)
    ]
    completed = F.size(F.filter("_chain", lambda t: t.isNotNull()))
    return out.select(user_col, *cols, completed.alias("steps_completed"))
