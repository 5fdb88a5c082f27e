"""[EXT] Vector/embedding column expressions (array<float> columns).

Two arithmetic profiles, same semantics:

- *fast path*: ``F.zip_with`` product + ``F.aggregate`` double fold —
  single-pass, JVM-codegen, no explode; the profile to run at 100 TB. A
  sequential left fold is deterministic for a fixed array, but float
  addition order differs from other engines' accumulators, so results can
  differ in the last bits across engines.
- *exact path*: per-element products cast to DECIMAL(38,18) and summed
  exactly — order/partitioning/engine independent, used by the oracle-checked
  queries and as ground truth in tests.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_fast(a: Column, b: Column) -> Column:
    """Dot product via zip_with + sequential double fold (no explode)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_fast(a: Column) -> Column:
    return F.sqrt(dot_fast(a, a))


def cosine_fast(a: Column, b: Column) -> Column:
    """Cosine similarity, fast profile; NULL when either norm is 0."""
    return dot_fast(a, b) / F.nullif(norm_fast(a) * norm_fast(b), F.lit(0.0))
