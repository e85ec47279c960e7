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
