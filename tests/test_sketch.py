"""Count-min sketch (operators/sketch.py): mergeability + overestimate
contracts beyond the q95 oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_stock_dbt_spark.operators.sketch import (
    cms_estimate,
    cms_sketch,
)
from snowflake_stock_dbt_spark.sources.tables import load_table


def _cells(df):
    return {(r["j"], r["bucket"]): r["c"] for r in df.collect()}


def test_cms_merges_cellwise(spark, sf_dir):
    """sketch(A ∪ B) must equal the cell-wise sum of sketch(A) and
    sketch(B) — the property that makes the sketch usable for stream/batch
    unions and map-side combination."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("k")
    )
    a = ev.where(F.hash("k") % 2 == 0)
    b = ev.where(F.hash("k") % 2 != 0)
    full = _cells(cms_sketch(ev, "k"))
    merged: dict = {}
    for part in (a, b):
        for cell, c in _cells(cms_sketch(part, "k")).items():
            merged[cell] = merged.get(cell, 0) + c
    assert merged == full


def test_cms_estimate_never_underestimates(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("k")
    )
    sketch = cms_sketch(ev, "k")
    exact = ev.groupBy("k").agg(F.count("*").alias("exact_n"))
    est = cms_estimate(sketch, exact.select("k"), "k")
    joined = exact.join(est, "k").collect()
    assert joined
    assert all(r["cms_n"] >= r["exact_n"] for r in joined)
