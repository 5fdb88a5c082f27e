"""Interactive serving layer — the reference's Streamlit compute, engine-side.

Reference app/streamlit_app.py: apply_filters (:167-187 — equality filters
unless 'All', metric threshold with null→0, sort desc, optional limit),
get_filter_options (:156-164 — sorted distinct non-null values),
insights (:406-443 — total-volume KPI, top-5 by volume) and
compute_liquidity_shocks (:190-203 — one-sided z > 2).

The app stays thin: it calls these with widget state; ``df.persist()``
replaces ``st.cache_data``. All compute is DataFrame-native, so the same
code serves 60k rows locally or 100 TB on a cluster.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.zscore import zscore_outliers

#: UI row-limit choices (reference app/streamlit_app.py:22); None = 'All'.
RESULT_LIMITS = [5, 10, 20, 50, 100, 200, None]


def apply_filters(
    df: DataFrame,
    equality_filters: dict[str, object] | None = None,
    metric: str | None = None,
    min_threshold: float = 0.0,
    sort_by: str | None = None,
    tiebreaker: str | None = None,
    limit: int | None = 20,
) -> DataFrame:
    """Filter → threshold → sort → limit (reference apply_filters :167-187).

    ``equality_filters`` values equal to 'All' are skipped, mirroring the
    sentinel option the UI prepends (:354-362). The metric threshold uses
    COALESCE(metric, 0) like the pandas ``fillna(0)`` (:183). A
    ``tiebreaker`` column pins deterministic output under ``limit``.
    """
    out = df
    for col, val in (equality_filters or {}).items():
        if val != "All":
            out = out.where(F.col(col) == F.lit(val))
    if metric is not None:
        out = out.where(F.coalesce(F.col(metric), F.lit(0.0)) >= min_threshold)
    if sort_by is not None:
        order: list[Column] = [F.col(sort_by).desc_nulls_last()]
        if tiebreaker:
            order.append(F.col(tiebreaker).asc())
        out = out.orderBy(*order)
    if limit is not None:
        out = out.limit(limit)
    return out


def distinct_options(df: DataFrame, col: str) -> list[str]:
    """Sorted distinct non-null values (reference get_filter_options :156-164).
    The UI prepends the 'All' sentinel itself (serving-layer concern, J5)."""
    rows = (
        df.select(col)
        .where(F.col(col).isNotNull())
        .distinct()
        .orderBy(col)
        .collect()
    )
    return [r[0] for r in rows]


def insights(df: DataFrame, volume_col: str = "volume", top_n: int = 5):
    """KPI block (reference :406-443): total volume (null→0) + top-N rows."""
    total = df.agg(
        F.sum(F.coalesce(F.col(volume_col), F.lit(0)).cast("decimal(38,6)"))
        .cast("double")
        .alias("total_volume")
    )
    top = df.orderBy(F.col(volume_col).desc_nulls_last()).limit(top_n)
    return total, top


def liquidity_shocks(
    df: DataFrame, volume_col: str = "volume", threshold: float = 2.0
) -> DataFrame:
    """One-sided z > 2 volume shocks (reference compute_liquidity_shocks
    :190-203 — note the cutoff and sidedness differ from the SQL flavor)."""
    return zscore_outliers(
        df, volume_col, threshold=threshold, two_sided=False, z_col="volume_z_score"
    )
