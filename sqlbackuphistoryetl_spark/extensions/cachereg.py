"""Generation-scoped cache ownership for the extension pipelines.

The banded / posting-list frames the dedup and similarity pipelines
persist are consumed by a self-join *inside the returned lazy plan*, so
they cannot be unpersisted before the caller's terminal action without
losing the barrier they exist for. What can be bounded is session
lifetime: each public pipeline call opens a new cache *generation* for
its owner key and releases the previous generation's blocks — by the
time a caller issues the next call, the previous result has either been
consumed or will transparently recompute (unpersist never breaks
correctness, only the cache benefit). ``release_caches()`` drops
everything for callers that want a clean session (bulk drivers, tests).

At 100 TB the same discipline holds: a generation's cache is bounded by
one pipeline invocation's working set, not the session's history.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_LIVE: dict[str, list[DataFrame]] = {}


def begin(owner: str) -> None:
    """Open a new cache generation for ``owner``, releasing the previous
    generation's persisted frames (non-blocking)."""
    for df in _LIVE.pop(owner, []):
        df.unpersist(blocking=False)
    _LIVE[owner] = []


def persist(
    owner: str,
    df: DataFrame,
    level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """Persist ``df`` under ``owner``'s current generation and return it."""
    df = df.persist(level)
    _LIVE.setdefault(owner, []).append(df)
    return df


def register(owner: str, df: DataFrame) -> None:
    """Adopt an ALREADY-persisted frame into ``owner``'s current
    generation (for pipelines that manage persist/materialize ordering
    themselves, e.g. iterative loops)."""
    _LIVE.setdefault(owner, []).append(df)


def release_caches(owner: str | None = None) -> None:
    """Release every live cache (or just ``owner``'s). Safe to call at
    any time — downstream plans recompute instead of failing."""
    keys = [owner] if owner is not None else list(_LIVE)
    for k in keys:
        for df in _LIVE.pop(k, []):
            df.unpersist(blocking=False)
