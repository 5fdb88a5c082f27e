"""100 TB storage layout: date-partitioned and bucketed Parquet sinks.

The reference rents Snowflake micro-partitions (SURVEY.md §4 "partition
pruning by date"); on Spark the equivalent contract is explicit:

- **Date partitioning** (`partitionBy("observation_date")`) — time-sliced
  queries prune to the touched directories (static + dynamic partition
  pruning), and the partition-scoped upsert (operators/upsert.py) rewrites
  only the dates present in a batch.
- **Bucketing** (`bucketBy(n, key)`) — pre-shuffles a table ONCE at write
  time; every later equi-join/aggregation on the bucket key skips its
  exchange. The fct⋈dim pattern doesn't need it (dims broadcast), but
  fct⋈fct joins (self-joins, as-of between two big streams) at 100 TB
  amortize their shuffle here.

Both are plain writer options — kept in one module so layout policy (what
to partition on, bucket counts) lives in one reviewable place.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Directory-partitioned Parquet write (one dir level per column)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (and optionally sorted) Parquet table in the session
    catalog. Joins/aggregations between tables bucketed the same way on the
    same key run exchange-free; sorted buckets additionally skip the sort
    of a sort-merge join."""
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_partition_pruned(
    spark: SparkSession, path: str
) -> DataFrame:
    """Read a partitioned table; filters on the partition columns prune at
    planning time (PartitionFilters in the scan node)."""
    return spark.read.parquet(path)
