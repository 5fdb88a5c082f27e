"""Parameterized z-score outlier operator (SURVEY.md §2.9).

The reference implements this twice with different knobs:
- SQL flavor: two-sided, |z| >= 3, CROSS JOIN of a stats CTE
  (sql/03_analytics_queries.sql:34-65);
- pandas "liquidity shocks": one-sided, z > 2, empty/zero-std early-outs
  (app/streamlit_app.py:190-203).

One function serves both call sites. Always the two-pass form — aggregate
global stats, then broadcast — never an unpartitioned window, which funnels
every row through a single task at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import dec_std_columns


def zscore_outliers(
    df: DataFrame,
    col: str,
    threshold: float = 3.0,
    two_sided: bool = True,
    z_col: str = "z_score",
) -> DataFrame:
    """Rows of ``df`` whose ``col`` z-score crosses ``threshold``.

    Stats use the exact-decimal sums of functions/numeric.py, so scores are
    identical across engines and cluster layouts. Zero/NULL stddev yields no
    outliers (the reference's zero-std early-out; NULLIF guard in SQL).
    """
    metric = F.col(col)
    base = df.where(metric.isNotNull())
    n, s1, s2 = dec_std_columns(metric)
    stats = base.agg(n.alias("n"), s1.alias("s1"), s2.alias("s2")).select(
        (F.col("s1") / F.col("n")).alias("_mean"),
        F.sqrt(
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
            / (F.col("n") - F.lit(1.0))
        ).alias("_std"),
    )
    scored = base.crossJoin(F.broadcast(stats)).withColumn(
        z_col, (metric - F.col("_mean")) / F.nullif(F.col("_std"), F.lit(0.0))
    )
    cond = (
        F.abs(F.col(z_col)) >= threshold if two_sided else F.col(z_col) > threshold
    )
    return scored.where(cond).drop("_mean", "_std")
