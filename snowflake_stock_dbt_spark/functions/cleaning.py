"""Shared cleaning/coercion expressions (SURVEY.md §2.8 F1-F22).

One implementation serves every layer — the reference spreads the same rules
across Snowflake SQL (sql/02_load_data.sql:93-107), dbt
(models/stg_most_actives.sql:5-21) and pandas (app/streamlit_app.py:60-88).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def clean_string(col: Column | str) -> Column:
    """TRIM then empty-string -> NULL (reference NULLIF(TRIM(x), ''),
    sql/02_load_data.sql:93-98)."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(c)
    return F.when(t == "", None).otherwise(t)


def coalesce_unknown(col: Column | str) -> Column:
    """NULL -> 'Unknown' (reference COALESCE/fillna,
    sql/03_analytics_queries.sql:69; app/streamlit_app.py:80-87)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit("Unknown"))


def try_double(col: Column | str) -> Column:
    """Safe numeric parse: malformed -> NULL (reference TRY_TO_NUMBER,
    sql/02_load_data.sql:100-103)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("double")


def try_decimal(col: Column | str, precision: int = 18, scale: int = 4) -> Column:
    """Reference TRY_TO_DECIMAL(x, 18, 4) (sql/02_load_data.sql:100)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast(f"decimal({precision},{scale})")


def try_long(col: Column | str) -> Column:
    """Reference TRY_TO_NUMBER for integer metrics (sql/02_load_data.sql:101-103).

    Parses via decimal so values like '123.0' integerize the same way
    Snowflake's TO_NUMBER(38,0) would, then narrows to long.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("decimal(38,0)").cast("long")


def try_timestamp(col: Column | str) -> Column:
    """Reference TRY_TO_TIMESTAMP_TZ (sql/02_load_data.sql:106): scraper emits
    UTC ISO-8601 with offset (scraper/scrape.py:124); with the session pinned
    to UTC this parses losslessly; malformed -> NULL."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("timestamp")


def bucketize_market_cap(col: Column | str) -> Column:
    """pd.cut(bins=[-inf, 2e9, 1e10, inf], labels=[Small, Mid, Large]) with
    fillna('Unknown') (reference app/streamlit_app.py:82-87). pd.cut bins are
    right-closed, hence <= on the boundaries."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(c.isNull(), F.lit("Unknown"))
        .when(c <= F.lit(2e9), F.lit("Small"))
        .when(c <= F.lit(1e10), F.lit("Mid"))
        .otherwise(F.lit("Large"))
    )
