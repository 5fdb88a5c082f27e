"""Partitioning guards for fan-out operators.

A row-explosion operator (shingling, per-bit votes, per-seed hashes) does
its heavy work in the SAME tasks that read the input. When the input is a
handful of files (locally: one small parquet), the whole fan-out pipeline
runs on those few cores no matter how wide the cluster is. These helpers
insert a cheap pre-explosion shuffle of the *narrow* rows only when the
input's parallelism is actually below the cluster's — at 100 TB the scan
already has thousands of splits and the guard is a no-op.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def ensure_min_parallelism(df: DataFrame, *keys: Column | str) -> DataFrame:
    """Repartition ``df`` up to the cluster's default parallelism (hashed on
    ``keys`` when given, round-robin otherwise) — only if it currently has
    fewer partitions. Never reduces partition count."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *keys) if keys else df.repartition(target)
