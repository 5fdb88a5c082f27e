"""Deterministic ("oracle-parity") numeric aggregation helpers.

Floating-point SUM/AVG/STDDEV are order-dependent: Spark and DuckDB (and two
runs of the same engine with different partitioning) can disagree in the last
bits. The engine therefore computes additive aggregates over doubles via an
**exact decimal accumulator**:

    sum(x)  ->  CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)

The per-row decimal cast is deterministic, the decimal sum is exact (hence
order/partitioning independent), and the final cast to double is
round-to-nearest of the same exact value on every engine — so results are
bit-identical across Spark, DuckDB, and any cluster size. This mirrors what
Snowflake does internally for NUMBER aggregation and costs nothing at scale
(decimal sums are still a single map-side-combinable hash aggregation).

AVG is computed as dec_sum(x)/count(x) with the division done in IEEE double
(deterministic given identical inputs). STDDEV (sample) is computed from the
exact sums of x and x² — see :func:`dec_std_expr`.

Every oracle SQL string in plans/ mirrors the same recipe.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Accumulator type: 6 fractional digits keeps full precision for the test
#: corpus's money-like doubles while leaving 32 integral digits of headroom
#: (no overflow until ~1e32 — far beyond 100 TB of row sums).
DEC = "decimal(38,6)"


def dec_sum(col: Column | str) -> Column:
    """Order-independent SUM over doubles, returned as DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def dec_avg(col: Column | str) -> Column:
    """Order-independent AVG over doubles, returned as DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return dec_sum(c) / F.count(c).cast("double")


def dec_sum_window(col: Column | str, window) -> Column:
    """Order-independent windowed SUM (frame must be deterministic)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).over(window).cast("double")


def dec_avg_window(col: Column | str, window) -> Column:
    """Order-independent windowed AVG, as DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return dec_sum_window(c, window) / F.count(c).over(window).cast("double")


def dec_std_columns(col: Column | str) -> tuple[Column, Column, Column]:
    """Building blocks for a deterministic sample stddev.

    Returns (n, sum, sum_sq) aggregate columns; combine with
    ``std = sqrt((sum_sq - sum*sum/n) / (n-1))`` computed in double.
    The per-row square is computed in double (deterministic), then summed
    exactly in decimal.
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.count(c).cast("double")
    s1 = dec_sum(c)
    s2 = F.sum((c * c).cast(DEC)).cast("double")
    return n, s1, s2


# SQL fragments for the DuckDB oracle, kept here so the recipe lives in one
# place. ``{x}`` is the column expression.
SQL_DEC_SUM = "CAST(SUM(CAST({x} AS DECIMAL(38,6))) AS DOUBLE)"
SQL_DEC_AVG = (
    "CAST(SUM(CAST({x} AS DECIMAL(38,6))) AS DOUBLE) / CAST(COUNT({x}) AS DOUBLE)"
)


def exact_grouped_percentiles(
    df,
    group_col: str,
    value_col: str,
    percentiles: dict[str, float],
    window=None,
):
    """Exact interpolated percentiles per group, the DISTRIBUTED way.

    ``F.expr("percentile(v, p)")`` buffers every raw value into one
    final-aggregation task per group — with few groups that is a
    parallelism ceiling of |groups| and an O(rows) single-task sort
    (measured superlinear: 2.6 s -> 19.8 s for 4x rows at 3 groups,
    tools/scale_probe.py). This formulation never materializes raw
    values per task:

    1. ``GROUP BY (group, value)`` with counts — map-side combinable,
       output bounded by the DISTINCT value domain, not row count;
    2. cumulative counts over the per-group value order (window over
       distinct values only);
    3. each percentile's flanking values selected by count range, then
       interpolated with EXACTLY Spark's ``percentile`` formula
       ``(higher - pos) * lower_v + (pos - lower) * higher_v`` so
       results are bit-identical to the built-in (and to DuckDB's
       ``quantile_cont``, which the q45 oracle pins).

    Returns one row per group: (group, min, <named percentiles>, max).
    """
    from pyspark.sql import Window

    v = F.col(value_col)
    counts = (
        df.where(v.isNotNull())
        .groupBy(group_col, value_col)
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy(group_col).orderBy(value_col)
    wg = Window.partitionBy(group_col)
    cum = (
        counts.withColumn("cum_end", F.sum("cnt").over(w))
        .withColumn("n", F.max("cum_end").over(wg))
        .withColumn("cum_start", F.col("cum_end") - F.col("cnt"))
    )
    aggs = [F.min(value_col).alias("min_value")]
    post = []
    for name, p in percentiles.items():
        pos = F.lit(float(p)) * (F.col("n") - 1).cast("double")
        fpos = F.floor(pos)
        cpos = F.ceil(pos)
        aggs.append(
            F.max(
                F.when(
                    (F.col("cum_start") <= fpos) & (fpos < F.col("cum_end")), v
                )
            ).alias(f"__lo_{name}")
        )
        aggs.append(
            F.max(
                F.when(
                    (F.col("cum_start") <= cpos) & (cpos < F.col("cum_end")), v
                )
            ).alias(f"__hi_{name}")
        )
        post.append((name, float(p)))
    aggs.append(F.max(value_col).alias("max_value"))
    aggs.append(F.max("n").alias("__n"))
    out = cum.groupBy(group_col).agg(*aggs)
    for name, p in post:
        pos = F.lit(p) * (F.col("__n") - 1).cast("double")
        lower = F.floor(pos)
        higher = F.ceil(pos)
        lo_v, hi_v = F.col(f"__lo_{name}"), F.col(f"__hi_{name}")
        out = out.withColumn(
            name,
            F.when(lower == higher, lo_v).otherwise(
                (higher.cast("double") - pos) * lo_v
                + (pos - lower.cast("double")) * hi_v
            ),
        )
    keep = [group_col, "min_value", *[n for n, _ in post], "max_value"]
    return out.select(*keep)
