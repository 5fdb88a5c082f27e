"""[EXT] Exact integer allocation / balance operators.

Two "inherently sequential"-looking per-group computations, each solved
with pure window algebra so they distribute (no fold, no applyInPandas):

- :func:`largest_remainder` — prorate an integer budget across group
  members proportionally to integer weights such that the allocations
  sum EXACTLY to the budget and every member receives the floor or the
  ceil of its exact proportional share (Hamilton's method).
- :func:`clamped_running_balance` — the floor-at-zero running balance
  B_t = max(0, B_{t-1} + x_t), solved closed-form via the Lindley
  identity B_t = S_t - min(0, min_{k<=t} S_k) (S = prefix sum): the
  subtracted term is exactly the total deficit the clamp has forgiven.

Both are consumed by the oracle-paired queries q218 / q229
(plans/insights.py) and differentially tested against naive sequential
Python folds on Hypothesis-generated adversarial inputs
(tests/test_round5c_hypothesis.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def largest_remainder(
    df: DataFrame,
    group_cols: list[str],
    weight_col: str,
    budget_col: str,
    tiebreak_cols: list[str],
    out_col: str = "alloc",
) -> DataFrame:
    """Allocate ``budget_col`` units across each group proportionally to
    ``weight_col``, exactly (Σ alloc == budget per group).

    All arithmetic is int64: base share = (budget·w) DIV W, and the
    leftover units go to the largest remainders (budget·w) % W, ties
    broken by ``tiebreak_cols`` then by weight so equal-keyed rows with
    different weights stay multiset-deterministic. Requires
    budget·max(weight) < 2^63 (document the bound at the call site).

    CONTRACT (callers must guarantee; not checked row-side): weights
    >= 1 and budgets >= 0. A group whose weight total is 0 divides by
    zero in DIV, which is NULL in Spark — the group's allocations come
    back NULL, not 0. Negative weights or budgets break the floor/ceil
    guarantee outright (Spark's DIV truncates toward zero, so "base +
    0/1" no longer brackets the exact share). Both registry call sites
    (q146 token budgets, q175 PPS shards) filter to positive weights
    upstream; tests/test_properties.py pins the w>=1 contract with
    Hypothesis.

    One shuffle: every window shares the ``group_cols`` partitioning.
    """
    wg = Window.partitionBy(*group_cols)
    with_tot = df.withColumn("_tot_w", F.sum(weight_col).over(wg))
    shares = with_tot.withColumn(
        "_base", F.expr(f"{budget_col} * {weight_col} DIV _tot_w")
    ).withColumn("_rem", F.expr(f"({budget_col} * {weight_col}) % _tot_w"))
    wr = Window.partitionBy(*group_cols).orderBy(
        F.col("_rem").desc(), *tiebreak_cols, F.col(weight_col)
    )
    return (
        shares.withColumn("_leftover", F.col(budget_col) - F.sum("_base").over(wg))
        .withColumn("_rk", F.row_number().over(wr))
        .withColumn(
            out_col,
            (
                F.col("_base")
                + F.when(F.col("_rk") <= F.col("_leftover"), F.lit(1)).otherwise(
                    F.lit(0)
                )
            ).cast("long"),
        )
        .drop("_tot_w", "_base", "_rem", "_leftover", "_rk")
    )


def clamped_running_balance(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str | Column],
    flow_col: str,
    out_col: str = "balance",
) -> DataFrame:
    """Floor-at-zero running balance via the Lindley identity.

    Equals the sequential fold ``B_t = max(0, B_{t-1} + flow_t)`` on
    every key's series (induction: min(0, running-min of the prefix sum)
    is exactly the cumulative forgiven deficit), computed as two
    same-partitioning windows — prefix sum, then prefix min.
    ``order_cols`` must be a total order within each key.
    """
    wcum = (
        Window.partitionBy(*key_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        df.withColumn("_s", F.sum(flow_col).over(wcum))
        .withColumn(
            out_col,
            F.col("_s")
            - F.least(F.lit(0).cast("long"), F.min("_s").over(wcum)),
        )
        .drop("_s")
    )
