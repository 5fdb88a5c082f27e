"""[EXT] As-of join and range join — temporal operators Spark lacks natively.

Not in the reference (its only joins are equi-joins, SURVEY.md §2.3); these
are the standard time-series operators a market-data engine needs (the
reference's domain is stock quotes) and a core LLM-pipeline primitive
(attach the latest profile/state row to every observation).

Both are implemented as compositions of built-in DataFrame ops — no UDFs,
no driver loops — so Catalyst plans them with ordinary shuffles:

- :func:`asof_join` uses the union-and-window trick: tag both sides, union
  on (keys, time), and carry the most recent right row forward with
  ``last(ignorenulls=True)`` over an ordered window. ONE shuffle on the join
  keys (the window's partitionBy), versus the naive inequality-join which is
  O(|L|·|R|) per key. At 100 TB this is the only formulation that works:
  state per partition is a single carried struct, nothing materializes the
  cross product.

- :func:`range_join_buckets` equi-joins on coarse time buckets (span-sized)
  so each row meets only candidates within ±1 bucket, then applies the exact
  range predicate. Turns an inequality join into an equi-join + cheap
  filter — the standard interval-bucketing rewrite (what Databricks' range
  join hint does under the hood).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    right_payload: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward as-of join: for every left row, the latest right row with
    ``right_time <= left_time`` on the same keys (inclusive match).

    Returns all left columns plus ``right_payload`` columns and
    ``matched_{right_time}`` (all NULL when no right row precedes — i.e.
    LEFT ASOF JOIN semantics). If several right rows share one timestamp the
    winner is the greatest ``tiebreak`` value; pass a unique column to pin
    determinism (required for oracle parity).
    """
    payload_struct = F.struct(
        F.col(right_time).alias("__t"), *[F.col(c) for c in right_payload]
    )
    r = right.select(
        *[F.col(k) for k in on],
        F.col(right_time).alias("__time"),
        # side 0 sorts before side 1 at equal time => inclusive (<=) match.
        F.lit(0).alias("__side"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("__tb"),
        payload_struct.alias("__payload"),
    )
    l = left.select(
        *[F.col(k) for k in on],
        F.col(left_time).alias("__time"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__tb"].dataType).alias("__tb"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
    )
    r = r.withColumn("__left", F.lit(None).cast(l.schema["__left"].dataType))
    unioned = l.unionByName(r)
    w = (
        Window.partitionBy(*on)
        .orderBy(
            F.col("__time").asc_nulls_last(),
            F.col("__side").asc(),
            F.col("__tb").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    ).where(F.col("__side") == 1)
    out_cols = [F.col(f"__left.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col(f"__match.__t").alias(f"matched_{right_time}"))
    out_cols.extend(F.col(f"__match.{c}").alias(c) for c in right_payload)
    return carried.select(*out_cols)


def range_join_buckets(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    span: int,
) -> DataFrame:
    """Pairs (l, r) on the same keys with ``0 <= right_time - left_time <=
    span`` (times are numeric, e.g. epoch-µs; ``span`` in the same unit).

    The left side explodes into its own bucket and the preceding one is
    covered from the right side's single bucket: right rows in bucket b can
    only match left rows in buckets {b-1, b}, so the left emits (b, b+1) and
    the equi-join on bucket ids bounds candidates to a 2-span window before
    the exact predicate runs. Column name collisions are the caller's to
    avoid (alias before calling).
    """
    # floor, not truncate-toward-zero: for negative times truncation would
    # misassign boundary rows to the wrong bucket and silently drop
    # qualifying pairs. floor(x/span) on doubles is exact while |x| < 2^53
    # (epoch-µs ~1.7e15 is well inside).
    bucket = lambda c: F.floor(F.col(c) / F.lit(span)).cast("long")  # noqa: E731
    l = left.withColumn(
        "__bk", F.explode(F.array(bucket(left_time), bucket(left_time) + 1))
    )
    r = right.withColumn("__bk", bucket(right_time))
    joined = l.join(r, [*on, "__bk"]).where(
        (F.col(right_time) >= F.col(left_time))
        & (F.col(right_time) - F.col(left_time) <= span)
    )
    # A right row in bucket b+1 within span of a left row in b is found via
    # the left's (b+1) copy; the same pair cannot also match via b, so no
    # dedup is needed — each qualifying pair appears exactly once.
    return joined.drop("__bk")
