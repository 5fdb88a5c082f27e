"""Property-based (Hypothesis) differential tests: custom operators vs
naive reference implementations on adversarial generated inputs — ties,
duplicates, empty keys, boundary spans."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from snowflake_stock_dbt_spark.operators.asof import asof_join, range_join_buckets
from snowflake_stock_dbt_spark.operators.dedup import latest_wins
from snowflake_stock_dbt_spark.operators.upsert import delta_merge_upsert

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

keys = st.integers(min_value=0, max_value=2)
times = st.integers(min_value=0, max_value=20)


@_SETTINGS
@given(
    left=st.lists(st.tuples(keys, times), min_size=0, max_size=8),
    right=st.lists(st.tuples(keys, times), min_size=0, max_size=8),
)
def test_asof_join_matches_naive(spark, left, right):
    """asof_join == argmax over the naive inequality join, for every
    generated (key, time) multiset — including timestamp ties, which the
    unique rid tiebreak resolves as max-rid."""
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)] or [(None, None, None)],
        "k long, t long, lid long",
    ).where(F.col("lid").isNotNull())
    rdf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(right)] or [(None, None, None)],
        "k long, rt long, rid long",
    ).where(F.col("rid").isNotNull())
    got = {
        r["lid"]: r["rid"]
        for r in asof_join(
            ldf, rdf, ["k"], "t", "rt", ["rid"], tiebreak="rid"
        ).collect()
    }
    for i, (k, t) in enumerate(left):
        cands = [
            (rt, j) for j, (rk, rt) in enumerate(right) if rk == k and rt <= t
        ]
        expect = max(cands)[1] if cands else None
        assert got[i] == expect, (k, t, cands)


@_SETTINGS
@given(
    left=st.lists(st.tuples(keys, times), min_size=0, max_size=8),
    right=st.lists(st.tuples(keys, times), min_size=0, max_size=8),
    span=st.integers(min_value=1, max_value=7),
)
def test_range_join_matches_naive(spark, left, right, span):
    ldf = spark.createDataFrame(
        [(k, t) for k, t in left] or [(None, None)], "k long, lt long"
    ).where(F.col("k").isNotNull())
    rdf = spark.createDataFrame(
        [(k, t) for k, t in right] or [(None, None)], "k long, rt long"
    ).where(F.col("k").isNotNull())
    got = sorted(
        (r["k"], r["lt"], r["rt"])
        for r in range_join_buckets(ldf, rdf, ["k"], "lt", "rt", span).collect()
    )
    naive = sorted(
        (k, lt, rt)
        for k, lt in left
        for rk, rt in right
        if rk == k and 0 <= rt - lt <= span
    )
    assert got == naive


@_SETTINGS
@given(
    rows=st.lists(
        st.tuples(keys, times, st.integers(min_value=0, max_value=99)),
        min_size=1,
        max_size=10,
    )
)
def test_latest_wins_keeps_exactly_the_max(spark, rows):
    """latest_wins == per-key argmax on (order_col, tiebreaker)."""
    df = spark.createDataFrame(
        [(k, t, i) for (k, t, _), i in zip(rows, range(len(rows)))],
        "k long, ver long, rid long",
    )
    out = latest_wins(df, keys=["k"], order_by=["ver", "rid"])
    got = {(r["k"], r["ver"], r["rid"]) for r in out.collect()}
    expect = set()
    by_key: dict[int, tuple] = {}
    for i, (k, t, _) in enumerate(rows):
        cur = by_key.get(k)
        if cur is None or (t, i) > cur:
            by_key[k] = (t, i)
    expect = {(k, t, i) for k, (t, i) in by_key.items()}
    assert got == expect


def test_delta_gate_is_explicit(spark, tmp_path):
    """Without delta-spark the Delta MERGE path must refuse loudly, not
    corrupt anything."""
    src = spark.range(3).withColumnRenamed("id", "k")
    with pytest.raises(NotImplementedError, match="delta-spark"):
        delta_merge_upsert(spark, str(tmp_path / "t"), src, "k")
