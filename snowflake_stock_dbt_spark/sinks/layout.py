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


def describe_files(spark: SparkSession, path: str) -> tuple[int, int]:
    """(file_count, total_bytes) of the parquet data files under ``path`` —
    driver-side filesystem metadata only, no Spark job."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    n, total = 0, 0
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        status = it.next()
        name = status.getPath().getName()
        if name.endswith(".parquet") and not name.startswith((".", "_")):
            n += 1
            total += status.getLen()
    return n, total


def compact_path(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
    min_files_to_compact: int = 2,
) -> tuple[int, int]:
    """Small-file compaction: rewrite ``path`` so each output file is about
    ``target_file_bytes``. Returns (files_before, files_after).

    Streaming sinks and per-batch upserts accrete small files; at 100 TB
    the scan's task count (and the NameNode/listing cost) is proportional
    to file count, so periodic compaction is standard lake maintenance.
    ``sort_cols`` additionally clusters rows within each output file
    (repartitionByRange + sortWithinPartitions), which tightens parquet
    row-group min/max bounds — the poor man's Z-order for one key prefix.

    The rewrite is read -> cache -> overwrite (the same break-the-cycle
    pattern as merge_upsert_write); partition directory structure is NOT
    preserved — compact unpartitioned tables or one partition directory at
    a time.
    """
    before, total_bytes = describe_files(spark, path)
    if before < min_files_to_compact:
        return before, before
    n_out = max(1, -(-total_bytes // target_file_bytes))  # ceil division
    df = spark.read.parquet(path)
    if sort_cols:
        cols = [df[c] for c in sort_cols]
        df = df.repartitionByRange(n_out, *cols).sortWithinPartitions(*cols)
    else:
        df = df.repartition(n_out)
    df.cache()
    df.count()
    df.write.mode("overwrite").parquet(path)
    df.unpersist()
    after, _ = describe_files(spark, path)
    return before, after
