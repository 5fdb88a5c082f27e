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
