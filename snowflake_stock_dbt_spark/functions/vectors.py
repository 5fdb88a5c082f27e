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


# Exact profile, fused (no explode): per-element double products rounded to
# 18 fractional digits, then summed exactly in a decimal fold. 10^18 ulp
# granularity makes the sum order-independent, so the fused fold equals the
# oracle's SUM(CAST(x AS DECIMAL(38,18))) bit-for-bit. DECIMAL(30,18) gives
# 12 integral digits of headroom — products of unit-ish embedding floats
# never approach it — while (30,18)+(28,18) stays under Spark's 38-digit
# cap WITHOUT scale loss (a (38,18) accumulator would silently drop to
# scale 17 on addition and break oracle parity).
_ACC = "decimal(30,18)"
_PROD = "decimal(28,18)"


def dot_exact(a: Column, b: Column) -> Column:
    """Order/partitioning/engine-independent dot product, as DOUBLE."""
    return F.aggregate(
        F.zip_with(
            a, b, lambda x, y: (x.cast("double") * y.cast("double")).cast(_PROD)
        ),
        F.lit(0).cast(_ACC),
        lambda acc, v: (acc + v).cast(_ACC),
    ).cast("double")


def dot_exact_lits(vec_col: str, values) -> Column:
    """:func:`dot_exact` against a LITERAL vector, built as one parsed
    SQL expression (optimization round 11). The Column-API form costs
    ``len(values)`` ``F.lit`` py4j round trips per call — 17k socket
    round trips and ~3 s of pure plan-build for one LSH banding pass
    (16 planes x 64 dims x 2 frames, measured with cProfile). A single
    ``F.expr`` string parses JVM-side in one call and resolves to the
    identical expression tree: same zip_with product cast to
    DECIMAL(28,18), same DECIMAL(30,18) fold, same DOUBLE result.
    ``values`` are embedded as double literals (``1.0D``); non-finite
    values have no SQL literal form ('infD' fails to parse), so those
    fall back to the Column-API dot (ADVICE r11 — defensive, current LSH
    planes are finite)."""
    import math

    vals = [float(v) for v in values]
    if not all(math.isfinite(v) for v in vals):
        return dot_exact(F.col(vec_col), F.array(*[F.lit(v) for v in vals]))
    arr = ", ".join(f"{v!r}D" for v in vals)
    return F.expr(
        f"CAST(aggregate(zip_with(`{vec_col}`, array({arr}), "
        f"(x, y) -> CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS {_PROD})), "
        f"CAST(0 AS {_ACC}), (acc, v) -> CAST(acc + v AS {_ACC})) AS DOUBLE)"
    )


def norm_exact(a: Column) -> Column:
    return F.sqrt(dot_exact(a, a))


def cosine_exact(a: Column, b: Column) -> Column:
    """Cosine similarity, exact-decimal profile; NULL when either norm is 0."""
    return dot_exact(a, b) / F.nullif(norm_exact(a) * norm_exact(b), F.lit(0.0))
