"""Incremental aggregate maintenance (materialized-view refresh).

The 100 TB pattern: a base aggregate snapshot exists; a new batch arrives;
instead of re-aggregating the full history, aggregate only the batch into
the same *partial-aggregate* shape and merge the two keyed states. Works
for any algebraic aggregate — COUNT/SUM merge by +, MIN/MAX by min/max,
AVG by (sum, count). Medians/distincts need sketches (q46/q57 carry those).

Sums are kept in DECIMAL(38,6) through the merge (exact, order- and
batching-independent — :mod:`..functions.numeric`), so maintaining the
aggregate incrementally yields *bit-identical* results to a full
recompute, which is exactly what the q91 oracle asserts.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import DEC

#: Partial-state columns produced by :func:`partial_aggregate`.
_STATE_COLS = ("n_rows", "sum_dec", "min_val", "max_val")


def partial_aggregate(df: DataFrame, keys: list[str], value: str) -> DataFrame:
    """Aggregate one batch into mergeable partial state per key."""
    return df.groupBy(*keys).agg(
        F.count(value).alias("n_rows"),
        F.sum(F.col(value).cast(DEC)).alias("sum_dec"),
        F.min(value).alias("min_val"),
        F.max(value).alias("max_val"),
    )


def merge_partials(keys: list[str], *states: DataFrame) -> DataFrame:
    """Merge partial-aggregate states (snapshot + deltas) into one.

    A union + one keyed aggregation: at scale the union is free (no
    shuffle) and the merge shuffles only pre-aggregated state — rows per
    key per batch, not raw events.
    """
    unioned = reduce(DataFrame.unionByName, states)
    return unioned.groupBy(*keys).agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("sum_dec").alias("sum_dec"),
        F.min("min_val").alias("min_val"),
        F.max("max_val").alias("max_val"),
    )


def finalize(merged: DataFrame, keys: list[str]) -> DataFrame:
    """Project merged state to the user-facing aggregate columns."""
    return merged.select(
        *keys,
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("sum_dec").cast("double").alias("total"),
        (F.col("sum_dec").cast("double") / F.col("n_rows").cast("double")).alias(
            "mean"
        ),
        F.col("min_val").alias("min_val"),
        F.col("max_val").alias("max_val"),
    )
