"""[EXT] Interval sweep-line operators (max concurrency over half-open
intervals), window-algebra form: the +1/-1 delta stream with a running
sum per group — never a global ordering.

Half-open [start, end) semantics are pinned by the tie order: at equal
timestamps closes (-1) sort before opens (+1), so back-to-back intervals
never overlap; ``id_col`` makes the order total, so the running sum is
row-identical across engines and partitionings. Consumed by q220
(plans/insights.py) and differentially tested against a brute-force
pairwise-overlap count on Hypothesis-generated intervals."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def max_concurrency(
    df: DataFrame,
    group_cols: list[str],
    start_col: str,
    end_col: str,
    id_col: str,
) -> DataFrame:
    """Peak number of simultaneously-open half-open intervals per group.

    Returns one row per group: ``max_concurrent`` and ``n_events``.
    Intervals with end <= start contribute their boundary events but can
    never overlap anything (the close sorts at-or-before the open).
    """
    starts = df.select(
        *group_cols,
        F.col(start_col).alias("_t"),
        F.lit(1).alias("_delta"),
        F.col(id_col).alias("_id"),
    )
    ends = df.select(
        *group_cols,
        F.col(end_col).alias("_t"),
        F.lit(-1).alias("_delta"),
        F.col(id_col).alias("_id"),
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("_t", "_delta", "_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    swept = starts.unionByName(ends).select(
        *group_cols, F.sum("_delta").over(w).alias("_open")
    )
    return swept.groupBy(*group_cols).agg(
        F.max("_open").cast("long").alias("max_concurrent"),
        (F.count("*") / 2).cast("long").alias("n_events"),
    )
