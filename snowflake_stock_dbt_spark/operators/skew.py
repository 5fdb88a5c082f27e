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
