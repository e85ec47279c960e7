"""Server→AG fallback combinator (SURVEY §2.2 P9, §7.4.3).

Every chain proc in the reference filters by ``server_name = @X`` and,
if ``@@ROWCOUNT = 0``, re-runs the identical query with
``ag_name = @X`` (sql:145-170,231-255,317-343). The procedural
rowcount-branch maps to one cheap ``head(1)`` probe — deliberately
mirrors the reference's two-phase semantics (auditable) instead of a
clever union.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def filter_with_fallback(
    build: Callable[[Column], DataFrame],
    primary: Column,
    fallback: Column,
) -> DataFrame:
    """Return ``build(primary)`` if non-empty else ``build(fallback)``."""
    first = build(primary)
    if first.limit(1).count() > 0:
        return first
    return build(fallback)


def server_then_ag(df: DataFrame, name: str) -> DataFrame:
    """Rows where server_name = name; if none, rows where ag_name = name."""
    return filter_with_fallback(
        lambda cond: df.filter(cond),
        F.col("server_name") == F.lit(name),
        F.col("ag_name") == F.lit(name),
    )
