"""Bucketed parquet layout — the co-located-join storage contract.

At 100 TB the dominant recurring cost of the curation/ETL graph is
re-shuffling the same fact tables on the same keys every run (dedup
pairs on doc id, diff on doc id, merge anti-join on the backup key).
Spark's answer is bucketing: write the table hash-partitioned AND
sorted by the join key once, and every subsequent equi-join or
aggregation on that key is exchange-free — the shuffle is paid once at
write time, amortized over every downstream run.

``bucketBy`` requires the table catalog (it records bucket metadata),
so these helpers register EXTERNAL tables: data lives at ``path``
(any Hadoop-visible store), only metadata goes to the catalog. The
bucket count is part of the contract — both sides of a co-located join
must agree on it (and stay within 2× of target file sizes: at 100 TB
pick buckets ≈ table_bytes / 1 GiB, a power of two so half-scale
re-writes still align).

`tests/test_plans_physical.py::test_bucketed_join_shuffle_free`
asserts the payoff: a join of two bucketed tables plans with ZERO
Exchange on either side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as an external parquet table bucketed (and sorted,
    default = the bucket cols) for exchange-free downstream joins."""
    sort_cols = sort_cols or bucket_cols
    (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*sort_cols)
        .option("path", path)
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table WITH its bucket metadata (a plain
    ``spark.read.parquet(path)`` of the same files loses the bucketing
    and re-shuffles downstream — always read through the catalog)."""
    return spark.table(table)
