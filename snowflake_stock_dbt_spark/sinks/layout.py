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
from ..sources.tables import read_parquet


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
    return read_parquet(spark, path)


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
    df = read_parquet(spark, path)
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


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
) -> DataFrame:
    """Append an interleaved-bit Z-order key column (``_zkey``).

    Each clustering column is scaled to a ``bits``-wide integer rank using
    the column's min/max (one tiny stats aggregate, broadcast back — the
    sanctioned 1-row-stats cross join), then the ranks' bits are
    interleaved: bit ``i`` of column ``j`` lands at position
    ``i * len(cols) + j``. Sorting by ``_zkey`` places rows that are close
    in EVERY clustering dimension into the same parquet row groups, so
    min/max row-group stats prune point/range queries on ANY of the
    columns — the multi-dimensional upgrade of ``compact_path``'s
    single-prefix range clustering.

    All integer bit arithmetic in JVM expressions; no UDFs, no shuffle
    beyond the stats aggregate.
    """
    from pyspark.sql import functions as F

    n = len(cols)
    stats = df.agg(
        *[
            agg
            for c in cols
            for agg in (
                F.min(F.col(c).cast("double")).alias(f"_min_{c}"),
                F.max(F.col(c).cast("double")).alias(f"_max_{c}"),
            )
        ]
    )
    out = df.crossJoin(F.broadcast(stats))
    max_rank = (1 << bits) - 1
    ranks = []
    for c in cols:
        span = F.col(f"_max_{c}") - F.col(f"_min_{c}")
        scaled = F.when(span > 0,
            F.floor(
                (F.col(c).cast("double") - F.col(f"_min_{c}"))
                / span
                * max_rank
            )
        ).otherwise(F.lit(0))
        ranks.append(F.least(scaled, F.lit(max_rank)).cast("long"))
    zkey = F.lit(0).cast("long")
    for i in range(bits):
        for j, rank in enumerate(ranks):
            zkey = zkey + (
                F.shiftleft(
                    F.shiftright(rank, i).bitwiseAND(F.lit(1)),
                    i * n + j,
                )
            )
    return out.withColumn("_zkey", zkey).drop(
        *[f"_min_{c}" for c in cols], *[f"_max_{c}" for c in cols]
    )


def zorder_write(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = 8,
) -> None:
    """Write ``df`` Z-order-clustered on ``cols`` into ``n_files`` files.

    repartitionByRange on the z-key assigns contiguous z-ranges to files;
    the within-partition sort tightens row-group min/max bounds inside
    each file. Queries filtering any clustered column then skip files and
    row groups whose stats exclude the predicate — parquet readers get
    this from footer stats alone.
    """
    keyed = zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
