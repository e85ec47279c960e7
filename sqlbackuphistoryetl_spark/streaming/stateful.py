"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference has no streaming state machine, but its core invariant —
"a restore chain is an LSN-contiguous sequence per database"
(GetRemainingLogBackups..., SQLObjectsToCreateOnTarget.sql:225,264:
each log must satisfy ``last_lsn > previous`` and logs chain
``first_lsn <= prev.last_lsn < next.first_lsn`` contiguously) — is a
natural *continuous monitor*: as backup events stream in, track the
chain head per (server, database) and flag gaps (a log whose
``first_lsn`` jumps past the tracked head means a missing backup ⇒ the
database is no longer point-in-time restorable past the gap).

Arbitrary stateful processing (``applyInPandasWithState``) is the right
tool because the per-group transition depends on state carried across
micro-batches — not expressible as a windowed aggregation.

Scale notes: state is one row per (server, database) — bounded by fleet
size, not event volume; groups hash-partition across executors and each
micro-batch ships only that batch's events. LSNs travel as strings in
state (DECIMAL(25,0) exceeds int64; Python ints compare exactly after
parse).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

CHAIN_EVENT_OUT = StructType(
    [
        StructField("server_name", StringType(), True),
        StructField("database_name", StringType(), True),
        StructField("BackupType", StringType(), True),
        StructField("first_lsn", StringType(), True),
        StructField("last_lsn", StringType(), True),
        StructField("chain_head", StringType(), True),
        StructField("status", StringType(), True),
        StructField("events_seen", LongType(), True),
    ]
)

CHAIN_STATE = StructType(
    [
        StructField("head_lsn", StringType(), True),
        StructField("events_seen", LongType(), True),
    ]
)


def _classify(kind: str, first: int, last: int, head: int | None) -> tuple[str, int]:
    """Transition function. Full/Diff re-anchor the chain; a Log is
    contiguous iff it covers or touches the head (first_lsn <= head);
    a Log that starts past the head is a gap (missing backup between).
    Returns (status, new_head)."""
    if kind in ("Full", "Diff"):
        return "anchor", last
    if head is None:
        return "no_anchor", last
    if first <= head:
        if last <= head:
            return "replay", head  # already-covered (overlap replay)
        return "ok", last
    return "gap", last  # jumped past the head: backups missing in between


def chain_status_batch(
    df: DataFrame,
    key_cols: tuple[str, ...] = ("server_name", "database_name"),
    order_col: str = "backup_finish_date",
    tiebreak_col: str | None = None,
    kind_col: str = "BackupType",
    first_col: str = "first_lsn",
    last_col: str = "last_lsn",
) -> DataFrame:
    """Deterministic BATCH TWIN of ``track_chain_state``: the identical
    per-(key) chain recurrence (``_classify``) expressed as a JVM-side
    sequential fold — ``array_sort(collect_list(event))`` per group,
    then ``F.aggregate`` threading (head, seen) through the ordered
    events. No Python, no state store; same transition table, so the
    streaming operator's output is checkable against this one (and this
    one against a SQL oracle).

    Output: key cols + (kind, first_lsn, last_lsn, chain_head, status,
    seen) — one row per event, LSNs as DECIMAL(25,0) (exceeds int64;
    exact compare in-engine).

    Scale notes: one shuffle (the groupBy); each group's event array is
    a restore chain, bounded by per-database backup frequency × retention
    (thousands, not millions) — the same boundedness the streaming
    operator's state row relies on. The fold appends to the output array
    per element (O(chain²) element copies per group); for the domain's
    chain lengths this is noise, and groups parallelize across the
    cluster.
    """
    from pyspark.sql import functions as F

    d25 = "decimal(25,0)"
    order_fields = [F.col(order_col).alias("_o")]
    if tiebreak_col is not None:
        order_fields.append(F.col(tiebreak_col).alias("_tb"))
    ev = F.struct(
        *order_fields,
        F.col(kind_col).alias("kind"),
        F.col(first_col).cast(d25).alias("first_lsn"),
        F.col(last_col).cast(d25).alias("last_lsn"),
    )
    grouped = df.groupBy(*key_cols).agg(
        F.array_sort(F.collect_list(ev)).alias("_evs")
    )

    out_t = (
        "array<struct<kind:string,first_lsn:decimal(25,0),"
        "last_lsn:decimal(25,0),chain_head:decimal(25,0),"
        "status:string,seen:bigint>>"
    )
    acc0 = F.struct(
        F.lit(None).cast(d25).alias("head"),
        F.lit(0).cast("long").alias("seen"),
        F.array().cast(out_t).alias("out"),
    )

    def _step(acc, e):
        is_anchor = e["kind"].isin("Full", "Diff")
        head = acc["head"]
        covered = (e["first_lsn"] <= head) & (e["last_lsn"] <= head)
        new_head = (
            F.when(is_anchor, e["last_lsn"])
            .when(head.isNull(), e["last_lsn"])
            .when(covered, head)
            .otherwise(e["last_lsn"])
        )
        status = (
            F.when(is_anchor, F.lit("anchor"))
            .when(head.isNull(), F.lit("no_anchor"))
            .when(covered, F.lit("replay"))
            .when(e["first_lsn"] <= head, F.lit("ok"))
            .otherwise(F.lit("gap"))
        )
        seen = acc["seen"] + 1
        elem = F.struct(
            e["kind"].alias("kind"),
            e["first_lsn"].alias("first_lsn"),
            e["last_lsn"].alias("last_lsn"),
            new_head.alias("chain_head"),
            status.alias("status"),
            seen.alias("seen"),
        )
        return F.struct(
            new_head.alias("head"),
            seen.alias("seen"),
            F.concat(acc["out"], F.array(elem)).alias("out"),
        )

    folded = grouped.select(
        *key_cols, F.aggregate("_evs", acc0, _step).alias("_acc")
    )
    return folded.select(
        *key_cols, F.explode("_acc.out").alias("_e")
    ).select(*key_cols, "_e.*")


def track_chain_state(
    events: DataFrame,
    output_mode: str = "update",
) -> DataFrame:
    """Per-(server, database) chain monitor over a streaming DataFrame
    with consolidated-schema columns. Emits one row per event with its
    chain status and the tracked head after applying it."""

    def _fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            head_s, seen = state.get
            head = int(head_s) if head_s is not None else None
        else:
            head, seen = None, 0
        out_rows = []
        for pdf in pdfs:
            # event-time order within the batch — state transitions are
            # order-sensitive
            pdf = pdf.sort_values("backup_finish_date")
            for r in pdf.itertuples(index=False):
                first, last = int(str(r.first_lsn)), int(str(r.last_lsn))
                status, head = _classify(r.BackupType, first, last, head)
                seen += 1
                out_rows.append(
                    (
                        key[0],
                        key[1],
                        r.BackupType,
                        str(first),
                        str(last),
                        str(head),
                        status,
                        seen,
                    )
                )
        state.update((str(head) if head is not None else None, seen))
        if out_rows:
            yield pd.DataFrame(out_rows, columns=[f.name for f in CHAIN_EVENT_OUT])

    return (
        events.groupBy("server_name", "database_name")
        .applyInPandasWithState(
            _fn,
            outputStructType=CHAIN_EVENT_OUT,
            stateStructType=CHAIN_STATE,
            outputMode=output_mode,
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
