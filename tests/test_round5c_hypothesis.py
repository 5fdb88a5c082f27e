"""Hypothesis differential tests for the allocation/balance operators:
window-algebra closed forms vs naive sequential Python folds on
adversarial generated inputs (zero weights excluded by contract; zero
flows, all-negative drifts, ties, single-row groups all included)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from snowflake_stock_dbt_spark.operators.allocation import (
    clamped_running_balance,
    largest_remainder,
)

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

flows = st.lists(
    st.integers(min_value=-50, max_value=50), min_size=1, max_size=12
)


@_SETTINGS
@given(xs=flows, ys=flows)
def test_lindley_identity_equals_sequential_fold(spark, xs, ys):
    """Two keys in one frame: the closed form must equal the per-key
    sequential fold at every step."""
    rows = [(0, i, x) for i, x in enumerate(xs)] + [
        (1, i, x) for i, x in enumerate(ys)
    ]
    df = spark.createDataFrame(rows, "k long, t long, flow long")
    got = {
        (r["k"], r["t"]): r["balance"]
        for r in clamped_running_balance(df, ["k"], ["t"], "flow").collect()
    }
    for k, series in ((0, xs), (1, ys)):
        bal = 0
        for t, x in enumerate(series):
            bal = max(0, bal + x)
            assert got[(k, t)] == bal, (k, t, series)


@_SETTINGS
@given(
    weights=st.lists(
        st.integers(min_value=1, max_value=1000), min_size=1, max_size=10
    ),
    budget=st.integers(min_value=0, max_value=10_000),
)
def test_largest_remainder_exact_and_fair(spark, weights, budget):
    """Σ alloc == budget exactly, and every member gets floor or ceil of
    its exact proportional share — for any weights and budget, including
    budget 0 and budgets larger than the weight total."""
    rows = [(0, i, w, budget) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "g long, i long, w long, b long")
    got = {
        r["i"]: r["alloc"]
        for r in largest_remainder(df, ["g"], "w", "b", ["i"]).collect()
    }
    tot = sum(weights)
    assert sum(got.values()) == budget
    for i, w in enumerate(weights):
        # floor <= alloc <= ceil, and alloc == exact when it divides
        # (a zero-remainder row never receives a leftover unit).
        base, rem = divmod(budget * w, tot)
        assert base <= got[i] <= base + (1 if rem else 0), (
            i,
            w,
            got[i],
            base,
            rem,
        )


intervals = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=0, max_value=15),
    ),
    min_size=1,
    max_size=12,
)


@_SETTINGS
@given(iv=intervals)
def test_sweep_equals_brute_force_half_open(spark, iv):
    """max_concurrency == brute-force max over event points of the
    half-open containment count — including zero-length intervals and
    exact end==start adjacency."""
    from snowflake_stock_dbt_spark.operators.sweep import max_concurrency

    rows = [(0, s, s + d, i) for i, (s, d) in enumerate(iv)]
    df = spark.createDataFrame(rows, "g long, s long, e long, id long")
    got = max_concurrency(df, ["g"], "s", "e", "id").collect()[0]
    best = 0
    for s, _ in iv:  # the max is attained at some interval start
        best = max(
            best,
            sum(1 for s2, d2 in iv if s2 <= s < s2 + d2),
        )
    assert got["max_concurrent"] == best, (iv, got)
    assert got["n_events"] == len(iv)
