"""Slowly-changing-dimension type-2 maintenance (the dbt snapshot analog).

The reference's dbt project materializes latest-wins dimensions
(dbt_project/models/dim_entity.sql:15-31); the companion pattern every
warehouse needs next is the versioned history — dbt's ``snapshot`` with the
``check`` strategy: when a tracked attribute changes, close the current row
and open a new one. This operator is that merge as a pure DataFrame
transform, shuffle-bounded by the key join (no windows over the whole
history, no driver-side actions).

Row shape: key columns + tracked columns + ``valid_from`` / ``valid_to`` /
``is_current``. ``valid_to`` is NULL on current rows.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scd2_initial(batch: DataFrame, ts_col: str) -> DataFrame:
    """Seed a history table from a first batch (every row current)."""
    return batch.select(
        *[c for c in batch.columns if c != ts_col],
        F.col(ts_col).alias("valid_from"),
        F.lit(None).cast(batch.schema[ts_col].dataType).alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def _any_differs(tracked: list[str], left: str, right: str) -> Column:
    """NULL-safe inequality across the tracked columns."""
    diffs = [
        ~F.col(f"{left}.{c}").eqNullSafe(F.col(f"{right}.{c}")) for c in tracked
    ]
    return reduce(lambda a, b: a | b, diffs)


def scd2_apply(
    history: DataFrame,
    batch: DataFrame,
    key: str | list[str],
    tracked: list[str],
    ts_col: str,
) -> DataFrame:
    """One snapshot step: ``history`` (SCD2 shape) + ``batch`` (key +
    tracked + ts) -> new history.

    - changed key: current row closes (``valid_to`` = batch ts,
      ``is_current`` = false) and a new current row opens;
    - new key: new current row;
    - unchanged key and all non-current rows: carried through untouched.

    ``batch`` must hold one row per key (pre-aggregate a multi-observation
    batch to its latest row first — latest_wins does exactly that).
    """
    keys = [key] if isinstance(key, str) else list(key)
    cur = history.where(F.col("is_current")).alias("c")
    closed_history = history.where(~F.col("is_current"))
    b = batch.alias("b")

    joined = cur.join(b, [F.col(f"c.{k}") == F.col(f"b.{k}") for k in keys], "full_outer")
    batch_present = F.col(f"b.{keys[0]}").isNotNull()
    cur_present = F.col(f"c.{keys[0]}").isNotNull()
    changed = cur_present & batch_present & _any_differs(tracked, "c", "b")

    hist_cols = [*keys, *tracked, "valid_from", "valid_to", "is_current"]

    # Current rows carried or closed (key vanished from batch => carried).
    kept_current = joined.where(cur_present).select(
        *[F.col(f"c.{k}").alias(k) for k in keys],
        *[F.col(f"c.{t}").alias(t) for t in tracked],
        F.col("c.valid_from").alias("valid_from"),
        F.when(changed, F.col(f"b.{ts_col}"))
        .otherwise(F.col("c.valid_to"))
        .alias("valid_to"),
        (~changed).alias("is_current"),
    )
    # Newly opened rows: changed keys + brand-new keys.
    opened = joined.where(batch_present & (changed | ~cur_present)).select(
        *[F.col(f"b.{k}").alias(k) for k in keys],
        *[F.col(f"b.{t}").alias(t) for t in tracked],
        F.col(f"b.{ts_col}").alias("valid_from"),
        F.lit(None).cast(batch.schema[ts_col].dataType).alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return (
        closed_history.select(*hist_cols)
        .unionByName(kept_current)
        .unionByName(opened)
    )
