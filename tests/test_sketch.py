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


def test_cms_absent_key_estimates_without_dropping(spark):
    """Point-query contract for keys NOT in the sketched stream: every
    probed key must come back (never silently dropped), and a key with an
    all-empty bucket row estimates 0 — the true CMS answer. A tiny input
    over a wide sketch guarantees empty buckets exist for most probes."""
    data = spark.createDataFrame([("a",), ("a",), ("b",)], ["k"])
    sketch = cms_sketch(data, "k")
    probes = spark.createDataFrame(
        [("a",), ("b",)] + [(f"absent_{i}",) for i in range(50)], ["k"]
    )
    est = {r["k"]: r["cms_n"] for r in cms_estimate(sketch, probes, "k").collect()}
    assert len(est) == 52  # no probe dropped
    assert est["a"] >= 2 and est["b"] >= 1
    # 3 occupied cells per hash row out of 1024: the chance any absent key
    # collides in all 4 rows is ~ (3/1024)^4; with 50 keys, essentially all
    # must estimate exactly 0 — and at minimum, none may be dropped and
    # none may underestimate to a negative.
    assert all(v >= 0 for v in est.values())
    assert sum(1 for i in range(50) if est[f"absent_{i}"] == 0) == 50
