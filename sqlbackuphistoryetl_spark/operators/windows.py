"""Window operators (SURVEY §2.5).

W1  latest_with_ties — dense_rank desc, keep rank 1. The reference uses
    dense_rank (NOT row_number) so every stripe (file) of the newest
    backup survives: stripes share last_lsn
    (sql:138,164,562,619,862,918). Our version is *set-based*: the
    reference pre-filters to one database/server so its window is
    unpartitioned; partitioning by the entity keys computes the same
    answer for every entity in one pass — the form that scales to 100 TB
    (no driver loop over databases).

W2  stripe_group_id — min(id) over (partition by first_lsn, last_lsn):
    one canonical id per striped backup (sql:1049,1059,1136,1146).

W3  tail_n_per_key — row_number desc <= n marker, used for the STOPAT
    patch on the last two log restores (sql:1261-1273).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_with_ties(
    df: DataFrame,
    partition_by: Sequence[str | Column],
    order_col: str | Column,
    rank_col: str = "Rank",
    keep: int = 1,
) -> DataFrame:
    """dense_rank() over (partition by ... order by order_col DESC),
    keeping ``rank <= keep`` — ties (stripes) all survive."""
    order = F.col(order_col) if isinstance(order_col, str) else order_col
    w = Window.partitionBy(*partition_by).orderBy(order.desc()) if partition_by else Window.orderBy(order.desc())
    out = df.withColumn(rank_col, F.dense_rank().over(w))
    return out.filter(F.col(rank_col) <= keep)


def stripe_group_id(
    df: DataFrame,
    id_col: str = "LogID",
    group_cols: Sequence[str] = ("first_lsn", "last_lsn"),
    out_col: str = "LogIDPartitioned",
) -> DataFrame:
    """min(id) over (partition by group_cols) — canonical id for a
    striped backup ("Get only 1 logid for a striped log backup")."""
    w = Window.partitionBy(*group_cols)
    return df.withColumn(out_col, F.min(id_col).over(w))


def tail_n_per_key(
    df: DataFrame,
    partition_by: Sequence[str | Column],
    order_col: str | Column,
    n: int,
    flag_col: str = "is_tail",
) -> DataFrame:
    """Flag the last ``n`` rows per key by descending order_col."""
    order = F.col(order_col) if isinstance(order_col, str) else order_col
    w = Window.partitionBy(*partition_by).orderBy(order.desc()) if partition_by else Window.orderBy(order.desc())
    return df.withColumn(flag_col, F.row_number().over(w) <= n)
