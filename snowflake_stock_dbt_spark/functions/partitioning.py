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
    ``keys`` when given, round-robin otherwise) — only if its scan-side
    parallelism looks lower. Never reduces partition count (``repartition``
    to a higher count only).

    The probe is ``df.inputFiles()`` — a metadata-only catalog call — NOT
    ``df.rdd.getNumPartitions()``: the ``.rdd`` conversion forces full
    physical planning at every call site. File count is the right proxy for
    the failure mode this guards (a fan-out pipeline stuck on a handful of
    input splits); a 100 TB scan has thousands of files and the guard
    no-ops, while a local one-file parquet triggers the pre-explosion
    spread. Frames with no file lineage (in-memory ranges, streaming)
    report zero files and get the spread, which is the safe direction.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if len(df.inputFiles()) >= target:
        return df
    return df.repartition(target, *keys) if keys else df.repartition(target)
