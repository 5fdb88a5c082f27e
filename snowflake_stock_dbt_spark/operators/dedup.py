"""Latest-wins dedup — the reference's QUALIFY ROW_NUMBER() = 1 idiom.

Reference sites: sql/02_load_data.sql:109-112 (MERGE source dedup, partition
by natural key, order ingested_at DESC) and
dbt_project/models/stg_most_actives.sql:50-53 / dim_entity.sql:15-31
(explicit ``nulls last``).

OSS Spark SQL has no QUALIFY; the idiom is a row_number window + filter.
``dropDuplicates`` is NOT equivalent — it keeps an arbitrary row, while the
reference's semantics pin "latest by ordering column" (SURVEY.md §2.5 W1/W2).

Scale: the window shuffles once on the partition keys; at 100 TB restrict
the input to candidate partitions first (e.g. only the ingest batch's keys)
rather than windowing full history — see operators/upsert.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_wins(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
    rn_col: str = "_rn",
) -> DataFrame:
    """Keep exactly one row per ``keys``: the first under ``order_by``.

    ``order_by`` should end with a unique tiebreaker so the survivor is
    deterministic; string entries are wrapped in explicit
    ``desc_nulls_last`` ordering per SURVEY.md §2.5's null-ordering trap
    (Snowflake DESC defaults NULLS FIRST, Spark NULLS LAST — the reference's
    dbt models spell ``nulls last``, which matches this).
    """
    order_cols = [
        F.col(c).desc_nulls_last() if isinstance(c, str) else c for c in order_by
    ]
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    return (
        df.withColumn(rn_col, F.row_number().over(w))
        .where(F.col(rn_col) == 1)
        .drop(rn_col)
    )
