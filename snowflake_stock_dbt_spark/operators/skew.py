"""Skew-handling joins: key salting.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime, but it only splits *sort-merge* partitions — a pathological hot
key inside an aggregation-feeding join, or a deliberately partitioned
pipeline, still wants explicit salting. The classic rewrite:

    left  ⋈ right on k
 →  (left + salt ∈ [0,S)) ⋈ (right × replicate S) on (k, salt)

The hot key's rows scatter over S reducers; the small/replicated side pays
S× its size. Correctness is unchanged — every (l, r) pair meets exactly
once, at salt = l.salt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``on`` with the left side's keys salted ``n_salts``
    ways and the right side replicated to match. Use when the LEFT side is
    skewed and the RIGHT side is small enough to pay ``n_salts``× its
    shuffle size (the usual big-fact ⋈ medium-dim shape that is too big to
    broadcast). Output columns match ``left.join(right, on, how)``.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            "salted_join supports inner/left joins only: replicating the "
            f"right side breaks {how!r} semantics"
        )
    salt = F.monotonically_increasing_id() % n_salts
    l = left.withColumn("__salt", salt.cast("int"))
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(s) for s in range(n_salts)]))
    )
    return l.join(r, [*on, "__salt"], how).drop("__salt")


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    partial_aggs: dict,
    merge_aggs: dict,
    n_salts: int = 8,
    salt_col=None,
) -> DataFrame:
    """Two-stage (salted) aggregation for hot grouping keys.

    Stage 1 groups by (keys, salt) so a hot key's rows spread over
    ``n_salts`` reducers; stage 2 merges the per-salt partials by key.
    ``partial_aggs`` maps output name -> aggregate Column over the input
    (e.g. ``{"n": F.count("*")}``); ``merge_aggs`` maps the same names to
    a merge function applied to the partial column (e.g. ``F.sum``).

    For algebraic aggregates (count/sum/min/max) this is semantically
    identical to a direct groupBy — which Spark's map-side partial
    aggregation already exploits; explicit salting matters when the
    aggregation is paired with windows/joins that pin the partitioning, or
    when per-reducer state (exact distincts, large collect buffers) is
    what skews.

    The default salt is ``hash(all columns) % n_salts`` — a pure function
    of row content, so it is stable across task retries and re-plans.
    CAVEAT: the default is only safe for algebraic partials. For
    distributive-only partials (e.g. ``F.count_distinct(v)`` merged by
    SUM) the salt MUST be derived from the aggregated value itself —
    pass ``salt_col=F.abs(F.hash("v")) % n_salts`` — so every occurrence
    of one distinct value lands in exactly one salt; any other salt
    splits equal values across salts and the stage-2 SUM overcounts.
    """
    salt = (
        salt_col
        if salt_col is not None
        else F.abs(F.hash(*[F.col(c) for c in df.columns])) % n_salts
    )
    staged = df.withColumn("__salt", salt.cast("int"))
    partial = staged.groupBy(*keys, "__salt").agg(
        *[col.alias(f"__p_{name}") for name, col in partial_aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[fn(f"__p_{name}").alias(name) for name, fn in merge_aggs.items()]
    )
