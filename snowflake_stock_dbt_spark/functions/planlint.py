"""Physical-plan linter: the engine's scale discipline as a library call.

tests/test_plan_guards.py enforces these rules over the built-in query
library; ``lint_plan`` exposes the same checks to USER queries, so a
pipeline author can gate their own jobs ("fail CI if my DataFrame plan
picked up a cartesian product") without copying the test:

- **cartesian**: a CartesianProduct node — O(n*m), never survives scale.
- **nested-loop join**: BroadcastNestedLoopJoin outside the sanctioned
  1-row/stats-broadcast pattern (allowed only when the caller says so).
- **row Python**: BatchEvalPython — row-at-a-time Python UDF in the hot
  path (~10-100x slower than Arrow seams; PLANS.md).
- **python seam**: any Arrow seam (MapInPandas & friends) when the
  caller declares the query should be pure-JVM.
- **unpushed scan filter**: a parquet/ORC scan whose PushedFilters list
  is empty while the plan filters on a scannable column right above it —
  the filter runs post-scan, reading every row group.
- **wide shuffle count**: more Exchange nodes than the caller's budget.

Returns a list of finding strings (empty = clean); ``assert_plan_clean``
raises with the findings, for test/CI use.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def _formatted_plan(df: DataFrame) -> str:
    # Private-API coupling, deliberate: `df._jdf`/`spark._jvm` are the
    # only way to get the formatted explain as a STRING on classic
    # (py4j) PySpark — `df.explain()` prints to stdout. Verified on
    # Spark 4.1; if an upgrade removes them (Connect-only builds have no
    # _jvm), swap to capturing `df.explain("formatted")` stdout — the
    # downstream string checks are unchanged.
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def lint_plan(
    df: DataFrame,
    allow_nested_loop: bool = False,
    allow_python: bool = True,
    max_exchanges: int | None = None,
) -> list[str]:
    """Lint ``df``'s physical plan; returns human-readable findings."""
    plan = _formatted_plan(df)
    findings: list[str] = []
    if "CartesianProduct" in plan:
        findings.append(
            "cartesian: CartesianProduct in plan — O(n*m) pair "
            "materialization; add an equi-join key or broadcast a bounded side"
        )
    if not allow_nested_loop and "BroadcastNestedLoopJoin" in plan:
        findings.append(
            "nested-loop: BroadcastNestedLoopJoin — fine only for 1-row "
            "stats broadcasts; pass allow_nested_loop=True if deliberate"
        )
    if "BatchEvalPython" in plan:
        findings.append(
            "row-python: BatchEvalPython — row-at-a-time Python UDF; use "
            "built-in functions or an Arrow seam (pandas_udf/mapInPandas)"
        )
    if not allow_python:
        for op in ("MapInPandas", "FlatMapGroupsInPandas", "ArrowEvalPython"):
            if op in plan:
                findings.append(
                    f"python-seam: {op} in a query declared pure-JVM"
                )
    # Scans with an empty pushed-filter list while a Filter sits in the plan.
    scans_no_push = len(
        re.findall(r"PushedFilters: \[\]", plan)
    )
    has_filter = re.search(r"\(\d+\) Filter", plan) is not None
    if scans_no_push and has_filter:
        findings.append(
            f"unpushed-filter: {scans_no_push} file scan(s) push no filters "
            "while the plan filters above the scan — check the predicate is "
            "on a plain column (casts/UDFs around the column defeat pushdown)"
        )
    if max_exchanges is not None:
        # formatted mode names each node in the tree AND the detail
        # section, so this counts 2x the physical exchanges — budgets are
        # expressed in the same doubled unit as tests/test_plan_guards.py.
        n = plan.count("Exchange")
        if n > max_exchanges:
            findings.append(
                f"shuffles: {n} Exchange mentions exceed budget "
                f"{max_exchanges} — a shuffle stage was added"
            )
    return findings


def assert_plan_clean(df: DataFrame, **kwargs) -> None:
    """Raise AssertionError listing every finding (CI-gate form)."""
    findings = lint_plan(df, **kwargs)
    if findings:
        raise AssertionError(
            "plan lint failed:\n" + "\n".join(f"  - {f}" for f in findings)
        )
