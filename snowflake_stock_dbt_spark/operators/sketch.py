"""Count-min sketch: sublinear frequency estimation for heavy-hitter
queries at 100 TB.

A CMS is a depth×width counter grid; each key increments one bucket per
hash row, and a key's estimate is the MIN over its buckets — always an
overestimate, with error ≤ 2N/width at ~86% per row (Cormode & Muthu-
krishnan, J. Algorithms 2005). The sketch is the scale path where exact
per-key counts (a full keyed shuffle whose state is the key cardinality)
stop fitting: the sketch state is ``depth × width`` counters regardless
of cardinality, it is map-side combinable, and two sketches merge by
cell-wise addition (stream/batch unions for free).

Everything is deterministic (fixed md5-derived hash family — the same
:func:`..functions.text.hash60` the MinHash family uses), so the whole
sketch, not just an accuracy claim, is cross-engine checkable (q95).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import hash60

CMS_DEPTH = 4
CMS_WIDTH = 1024


def _bucket(key, j: int, width: int):
    return hash60(F.concat(F.lit(f"{j}:"), key)) % width


def cms_sketch(
    df: DataFrame,
    key,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build the sketch: (j, bucket, c) rows, ≤ depth×width of them.

    One explode (depth rows per input row) feeding a map-side-combinable
    keyed count — the shuffle carries at most depth×width partial cells
    per task, independent of input size or key cardinality.
    """
    key = F.col(key) if isinstance(key, str) else key
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _bucket(key, j, width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("cell")
    )
    return cells.groupBy("cell.j", "cell.bucket").agg(
        F.count("*").alias("c")
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-estimate each key in ``keys``: min over its depth buckets.

    The sketch is tiny (≤ depth×width rows) and broadcasts; per hash row
    one broadcast equi-join probes the key's bucket, and a keyed MIN
    folds the rows — no shuffle of the (potentially huge) key list.

    The join is a LEFT join with missing cells coalesced to 0: a probed
    key whose bucket holds no sketch row means zero increments landed
    there, and the true CMS estimate for that key is the MIN including
    that 0 — an inner join would silently drop the empty bucket from the
    MIN (inflating absent keys) or drop the key entirely when all its
    buckets are empty, where the correct answer is 0.
    """
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _bucket(F.col(key_col), j, width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(key_col, "cell.j", "cell.bucket")
    return (
        probes.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("c", F.lit(0))).alias("cms_n"))
    )


def cms_bucket_sql(expr: str, j: int, width: int = CMS_WIDTH) -> str:
    """DuckDB twin of the bucket assignment."""
    return (
        f"CAST(('0x' || substr(md5('{j}:' || {expr}), 1, 15)) AS BIGINT)"
        f" % {width}"
    )


def misra_gries_candidates(
    df: DataFrame, key_col: str, capacity: int
) -> DataFrame:
    """Per-partition Misra–Gries heavy-hitter CANDIDATES (≤ ``capacity``
    distinct keys per partition, one column named ``key_col``).

    The mergeable-summaries form (Agarwal et al., TODS 2013): each Arrow
    batch's ``value_counts`` merges into the running counter table; when
    the table exceeds ``capacity`` keys, the (capacity+1)-th largest
    count is subtracted from every counter and non-positive counters are
    dropped. Per-partition estimation error is ≤ n_p/(capacity+1), so by
    the pigeonhole argument any key with GLOBAL count > N/(capacity+1)
    must survive in at least one partition — the union of per-partition
    candidates is a SUPERSET of the true heavy hitters, never a sample.

    This is the bounded-memory scale path for heavy hitters over a key
    space too large to groupBy: the Python seam holds at most
    ``capacity`` counters per partition regardless of input size or key
    cardinality, and the merge step is vectorized pandas, not per-row
    Python. Output is candidates only — callers MUST exact-recount
    (semi-join + keyed count), which also makes the composition
    deterministic: arrival order affects which EXTRA candidates survive,
    never whether a true heavy hitter does.
    """
    import pandas as pd

    field = df.schema[key_col]

    def mg(batches):
        counts = pd.Series(dtype="int64")
        for pdf in batches:
            vc = pdf[key_col].dropna().value_counts()
            counts = counts.add(vc, fill_value=0)
            if len(counts) > capacity:
                # Subtract the (capacity+1)-th largest count from every
                # counter and drop non-positive ones: at most `capacity`
                # survive, and the total subtracted mass per reduction is
                # what bounds the additive error at n_p/(capacity+1).
                t = counts.nlargest(capacity + 1).iloc[-1]
                counts = counts - t
                counts = counts[counts > 0]
        yield pd.DataFrame({key_col: counts.index})

    from pyspark.sql.types import StructType

    return df.select(key_col).mapInPandas(
        mg, StructType([field]), barrier=False
    )


def heavy_hitters_exact(
    df: DataFrame, key_col: str, k: int, capacity: int | None = None
) -> DataFrame:
    """Exact heavy hitters (keys with count ≥ N/k) at bounded memory:
    MG candidates (superset of the answer, ≤ capacity keys/partition) →
    distinct → semi-join back → keyed exact recount → threshold against
    the 1-row total anchor. Returns (key_col, cnt, share_milli) with
    ``share_milli = cnt·1000 DIV N`` on the exact integer grid.

    Two scans of the input (sketch pass + recount pass) and ONE keyed
    shuffle bounded by the candidate set — never a groupBy over the full
    key space. capacity defaults to k (the smallest value with a
    zero-false-negative guarantee; see misra_gries_candidates).
    """
    cand = misra_gries_candidates(df, key_col, capacity or k).distinct()
    total = df.groupBy().agg(F.count("*").alias("__n"))
    counted = (
        df.join(F.broadcast(cand), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count("*").alias("cnt"))
    )
    return (
        counted.crossJoin(F.broadcast(total))
        .where(F.col("cnt") * k >= F.col("__n"))
        .select(
            key_col,
            "cnt",
            F.expr("CAST(cnt * 1000 DIV __n AS BIGINT)").alias("share_milli"),
        )
    )


# --- HyperLogLog (deterministic, cross-engine) -------------------------------
#
# q46 demonstrates Spark's built-in HLL++ against the exact count, but a
# JVM-internal sketch can never carry a value oracle. This is the
# from-scratch HLL (Flajolet et al., AofA 2007) on the SAME md5-derived
# hash the MinHash/CMS families use, so the REGISTERS themselves — not
# just an accuracy claim — hash-match DuckDB: bucket = h mod m, w = the
# remaining 54 bits, rho = leading zeros of w + 1 via an exact integer
# CASE ladder (no float log2 — the q328 power-of-two-boundary rule), and
# the raw estimate alpha_64·m²/Σ2^-M_j computed entirely in integer /
# DECIMAL(38) arithmetic.
#
# Scale: the register table is |groups|·m cells AFTER map-side partial
# MAX — the fixed-size mergeable summary that replaces countDistinct's
# full keyed shuffle; two sketches (stream windows, table unions) merge
# by cell-wise MAX, which is exactly the groupBy(...).max the operator
# is built from.

HLL_P = 6
HLL_M = 1 << HLL_P  # 64 registers
HLL_WBITS = 60 - HLL_P  # remaining hash bits fed to rho
#: alpha_64 = 0.709 (the small-m constant from the HLL paper), carried
#: as the exact rational 709/1000 inside the integer estimate.
HLL_ALPHA_MILLI = 709
#: alpha·m²·2^WBITS — the integer numerator of the raw estimate (needs
#: DECIMAL(38)/HUGEINT: ~1.05e23).
HLL_EST_NUM = HLL_ALPHA_MILLI * HLL_M * HLL_M * (1 << HLL_WBITS)


def hll_rho_sql(w_expr: str) -> str:
    """Exact-integer rho(w) = leading zeros of the WBITS-wide word + 1,
    as a shared CASE-ladder text both engines evaluate identically.

    The w = 0 branch (probability 2^-WBITS+p per key — unreachable on any
    real corpus, but data-dependent) CLAMPS to WBITS instead of the
    textbook WBITS+1: hll_estimate folds registers as
    shiftleft(1, WBITS - mreg), and mreg = WBITS+1 would shift by -1 —
    which Spark silently wraps (masked to << 63, a huge negative
    corrupting s_used) while DuckDB raises. Clamping keeps both engines
    identical and costs at most one half-unit in one register's harmonic
    term in the astronomically rare all-zero-suffix case (standard HLL
    implementations size the register word one bit wider for the same
    reason)."""
    branches = " ".join(
        f"WHEN {w_expr} >= {1 << (HLL_WBITS - r)} THEN {r}"
        for r in range(1, HLL_WBITS + 1)
    )
    return f"CASE {branches} ELSE {HLL_WBITS} END"


def hll_registers(
    df: DataFrame, group_cols: str | tuple[str, ...], key_col: str
) -> DataFrame:
    """Per-group HLL register table: (*groups, bucket, mreg). Mergeable
    by construction — MAX is associative/commutative, so partial
    aggregation bounds the shuffle at |groups|·m cells per task
    regardless of key cardinality or arrival order, and register tables
    from disjoint slices (days, streams, shards) MAX-merge into the
    union's exact sketch (q341's persisted rollup relies on this).

    A single string group keeps the historical ``grp`` output name; a
    tuple keeps the original column names (composite keys)."""
    single = isinstance(group_cols, str)
    gc = ["grp"] if single else list(group_cols)
    h = hash60(F.concat(F.lit("hll:"), F.col(key_col).cast("string")))
    first = (
        [F.col(group_cols).alias("grp")]
        if single
        else [F.col(c) for c in gc]
    )
    base = df.select(*first, h.alias("h")).select(
        *gc,
        F.expr(f"h % {HLL_M}").cast("int").alias("bucket"),
        F.expr(f"h div {HLL_M}").alias("w"),
    )
    return (
        base.withColumn("rho", F.expr(hll_rho_sql("w")).cast("int"))
        .groupBy(*gc, "bucket")
        .agg(F.max("rho").alias("mreg"))
    )


def hll_estimate(
    registers: DataFrame, group_cols: tuple[str, ...] = ("grp",)
) -> DataFrame:
    """Fold a register table to (*group_cols, n_used, est): the raw HLL
    estimate in pure integer arithmetic — absent registers contribute
    2^WBITS to the harmonic denominator (rho 0). ``group_cols`` lets a
    windowed stream (q340) keep its composite key."""
    wb = HLL_WBITS
    return (
        registers.groupBy(*group_cols)
        .agg(
            F.count("*").cast("long").alias("n_used"),
            F.sum(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), {wb} - mreg)")
            ).alias("s_used"),
        )
        .withColumn(
            "s_total",
            F.col("s_used")
            + (F.lit(HLL_M).cast("long") - F.col("n_used"))
            * F.lit(1 << wb).cast("long"),
        )
        .withColumn(
            "est",
            F.expr(
                f"CAST(CAST({HLL_EST_NUM} AS DECIMAL(38,0)) DIV "
                "(CAST(1000 AS DECIMAL(38,0)) * s_total) AS BIGINT)"
            ),
        )
        .select(*group_cols, "n_used", "est")
    )


# --- Bloom filter (deterministic, cross-engine) -------------------------------
#
# q190 exercises Spark's own runtime bloom-filter injection; this is the
# EXPLICIT filter (Bloom, CACM 1970) on the shared md5 hash family, so
# the bit array itself — not just a pruning claim — hash-matches DuckDB,
# and the false-positive rate is audited EXACTLY against an anti-join
# ground truth (q345). Classic use at 100 TB: ship the k·m-bit array to
# the probe side and skip the shuffle for keys that cannot match.
#
# Bit layout: BLOOM_BITS bits packed 32 per BIGINT word (bit 31 max —
# no sign-bit hazards in either engine); k = BLOOM_K md5-derived hash
# functions. Build is one explode + bit_or agg (mergeable: two filters
# OR together); the array is |words| rows, broadcastable.

BLOOM_BITS = 4096
BLOOM_WORD = 32
BLOOM_K = 3


def _bloom_pos(key, j: int):
    return hash60(F.concat(F.lit(f"bloom{j}:"), key)) % BLOOM_BITS


def bloom_bits_sql(expr: str, j: int) -> str:
    """DuckDB twin of :func:`_bloom_pos` (bit position of hash j)."""
    from ..functions.text import hash60_sql

    hashed = hash60_sql(f"'bloom{j}:' || {expr}")
    return f"{hashed} % {BLOOM_BITS}"


def bloom_build(df: DataFrame, key_col: str) -> DataFrame:
    """Build the packed filter: (word INT, bits BIGINT) — one row per
    nonzero 32-bit word, OR-merged; map-side combinable and unionable."""
    key = F.col(key_col).cast("string")
    pos = F.explode(
        F.array(*[_bloom_pos(key, j) for j in range(BLOOM_K)])
    ).alias("pos")
    return (
        df.select(pos)
        .select(
            F.expr(f"pos div {BLOOM_WORD}").cast("int").alias("word"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {BLOOM_WORD} AS INT))"
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )


def bloom_probe(
    probes: DataFrame, bits: DataFrame, key_col: str
) -> DataFrame:
    """Probe: a key is POSITIVE iff all k bits are set. Returns the probe
    frame plus a ``bloom_positive`` int (1/0). The filter side is
    broadcast (|words| rows)."""
    key = F.col(key_col).cast("string")
    exploded = probes.select(
        F.col(key_col),
        F.posexplode(
            F.array(*[_bloom_pos(key, j) for j in range(BLOOM_K)])
        ).alias("j", "pos"),
    ).select(
        key_col,
        "j",
        F.expr(f"pos div {BLOOM_WORD}").cast("int").alias("word"),
        F.expr(f"CAST(pos % {BLOOM_WORD} AS INT)").alias("bit"),
    )
    hit = (
        exploded.join(F.broadcast(bits), "word", "left")
        .select(
            key_col,
            F.when(
                F.expr("(bits >> bit) & 1 = 1"), F.lit(1)
            ).otherwise(F.lit(0)).alias("h"),
        )
        .groupBy(key_col)
        .agg(F.min("h").alias("bloom_positive"))
    )
    return hit
