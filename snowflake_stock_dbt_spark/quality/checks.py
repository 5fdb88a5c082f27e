"""dbt-style declarative data-quality checks (SURVEY.md §5).

The reference tests data, not code: dbt ``not_null``/``unique``/
``relationships`` tests (dbt_project/models/schema.yml:16-76) plus strict
post-load aggregates (sql/02_load_data.sql:62-73,167-182). Here each check
is a function DataFrame → CheckResult; a model's check suite runs like
``dbt test`` after materialization.

Every check is a single aggregation Catalyst can push down — no collect of
data rows, only counts — so the suite is 100 TB-safe.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class CheckResult:
    check: str
    column: str
    failures: int

    @property
    def passed(self) -> bool:
        return self.failures == 0


def not_null(df: DataFrame, col: str) -> CheckResult:
    """dbt not_null (schema.yml:16-32,42-49,66-69)."""
    n = df.where(F.col(col).isNull()).count()
    return CheckResult("not_null", col, n)


def unique(df: DataFrame, col: str) -> CheckResult:
    """dbt unique (schema.yml:16-20,37-41,54-58): values appearing > once.
    Same group/having shape as the strict dup check (sql/02_load_data.sql:170-175)."""
    n = (
        df.where(F.col(col).isNotNull())
        .groupBy(col)
        .count()
        .where(F.col("count") > 1)
        .count()
    )
    return CheckResult("unique", col, n)


def relationships(child: DataFrame, col: str, parent: DataFrame, parent_col: str) -> CheckResult:
    """dbt relationships test = referential left-anti join (schema.yml:62-65):
    every child FK value must exist in the parent."""
    n = (
        child.select(F.col(col))
        .where(F.col(col).isNotNull())
        .join(
            parent.select(F.col(parent_col).alias(col)).distinct(), [col], "left_anti"
        )
        .count()
    )
    return CheckResult("relationships", f"{col}->{parent_col}", n)


def accepted_range(
    df: DataFrame, col: str, min_value=None, max_value=None
) -> CheckResult:
    """Values outside [min_value, max_value] (NULLs pass — pair with not_null)."""
    cond = F.lit(False)
    if min_value is not None:
        cond = cond | (F.col(col) < min_value)
    if max_value is not None:
        cond = cond | (F.col(col) > max_value)
    n = df.where(F.col(col).isNotNull()).where(cond).count()
    return CheckResult("accepted_range", col, n)


def run_checks(checks: list[CheckResult], raise_on_failure: bool = True) -> list[CheckResult]:
    """Evaluate a suite like ``dbt test``; raise listing every failure."""
    failed = [c for c in checks if not c.passed]
    if failed and raise_on_failure:
        detail = "; ".join(f"{c.check}({c.column})={c.failures}" for c in failed)
        raise AssertionError(f"data-quality failures: {detail}")
    return checks
