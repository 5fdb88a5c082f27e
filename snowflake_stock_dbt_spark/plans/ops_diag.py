"""[EXT] Operational diagnostics family (round 5): replica checksum diff,
runtime-filtered joins, equi-depth histograms, and join-skew reports.

Not in the reference (SURVEY.md §2 stops at warehouse analytics); these
are the fleet-operations primitives a 100 TB deployment runs around the
analytics: anti-entropy validation between replicas without moving rows
(merkle-style bucket checksums), Spark's runtime bloom-filter join
pruning exercised and plan-guarded, optimizer-grade equi-depth statistics
built exactly, and the skew diagnosis that tells you WHICH keys need the
salting operator (operators/skew.py) before a join falls over.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import hash60, hash60_sql
from ..sources.tables import load_table

# ---------------------------------------------------------------------------
# Q189 — Merkle-style bucket checksum diff between two table replicas:
# hash every row to one int64 (the engine's md5-prefix hash60, identical
# on both engines), fold per bucket with the ORDER-INDEPENDENT pair
# (bit_xor, count), and join the two replicas' bucket summaries — only
# buckets, never rows, cross the wire, which is the whole point of
# anti-entropy at 100 TB: 2^k bucket rows replace a full-table compare,
# and mismatched buckets localize the repair scan.
#
# The "replica" here is the same orders table with deterministic drift
# injected (every o_orderkey % 997 == 0 gets +1.00 on its total price),
# so the expected answer is exactly the drifted buckets. Doubles never
# enter the hash: the price is fixed to DECIMAL(18,2) first, whose
# string rendering is identical across engines.
# ---------------------------------------------------------------------------

CHECKSUM_BUCKETS = 64
_DRIFT_MOD = 997


def q189_replica_checksum_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(18,2)")
    drifted = F.when(
        F.col("o_orderkey") % _DRIFT_MOD == 0, price + F.lit(1).cast("decimal(18,2)")
    ).otherwise(price)

    def summarize(price_col, side: str) -> DataFrame:
        row_hash = hash60(
            F.concat_ws(
                "|", F.col("o_orderkey").cast("string"), price_col.cast("string")
            )
        )
        return (
            orders.select(
                (F.col("o_orderkey") % CHECKSUM_BUCKETS).alias("bucket"),
                row_hash.alias("h"),
            )
            .groupBy("bucket")
            .agg(
                F.count("*").alias(f"{side}_rows"),
                F.expr("bit_xor(h)").alias(f"{side}_checksum"),
            )
        )

    a = summarize(price, "primary")
    b = summarize(drifted, "replica")
    return (
        a.join(b, "bucket", "full_outer")
        .where(
            (F.col("primary_checksum") != F.col("replica_checksum"))
            | (F.col("primary_rows") != F.col("replica_rows"))
            | F.col("primary_checksum").isNull()
            | F.col("replica_checksum").isNull()
        )
        .select(
            "bucket", "primary_rows", "replica_rows",
            "primary_checksum", "replica_checksum",
        )
    )


_H_PRIMARY = hash60_sql(
    "CAST(o_orderkey AS VARCHAR) || '|' || CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)"
)
_H_REPLICA = hash60_sql(
    "CAST(o_orderkey AS VARCHAR) || '|' || CAST("
    "CASE WHEN o_orderkey % {mod} = 0 "
    "THEN CAST(o_totalprice AS DECIMAL(18,2)) + 1.00 "
    "ELSE CAST(o_totalprice AS DECIMAL(18,2)) END AS VARCHAR)".format(
        mod=_DRIFT_MOD
    )
)

Q189_SQL = f"""
WITH a AS (
    SELECT o_orderkey % {CHECKSUM_BUCKETS} AS bucket,
           COUNT(*) AS primary_rows,
           bit_xor({_H_PRIMARY}) AS primary_checksum
    FROM orders GROUP BY 1
),
b AS (
    SELECT o_orderkey % {CHECKSUM_BUCKETS} AS bucket,
           COUNT(*) AS replica_rows,
           bit_xor({_H_REPLICA}) AS replica_checksum
    FROM orders GROUP BY 1
)
SELECT bucket, primary_rows, replica_rows,
       primary_checksum, replica_checksum
FROM a FULL OUTER JOIN b USING (bucket)
WHERE primary_checksum <> replica_checksum
   OR primary_rows <> replica_rows
   OR primary_checksum IS NULL OR replica_checksum IS NULL
"""


# ---------------------------------------------------------------------------
# Q190 — Selective-dimension join shaped for Spark's runtime bloom-filter
# pruning (InjectRuntimeFilter, SPARK-32268): revenue by order week for
# URGENT orders only. At cluster scale the optimizer builds a bloom
# filter from the filtered orders side and pushes might_contain into the
# lineitem scan, cutting the probe-side shuffle to ~the selectivity of
# the dim filter; the injection is exercised and pinned by
# tests/test_plan_guards.py::test_runtime_bloom_filter_injects (the
# size thresholds that gate injection are production-tuned, so the
# dedicated test lowers them rather than this plan lying about its
# default-conf shape). Semantics are exact either way — the bloom
# filter only prunes, the join re-checks.
# ---------------------------------------------------------------------------


def q190_runtime_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    from ..functions.numeric import dec_sum

    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.weekofyear("o_orderdate").alias("order_week"))
        .agg(
            F.count("*").alias("n_items"),
            dec_sum(revenue).alias("revenue"),
        )
        .orderBy("order_week")
    )


Q190_SQL = """
SELECT weekofyear(o_orderdate) AS order_week,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6)))
            AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Q194 — Exact equi-depth histogram (the optimizer-statistics primitive):
# B buckets of ~equal row count over l_extendedprice, built on the
# flat-scaling VALUE-COUNTS form (the q45 lesson: aggregate to distinct
# values FIRST — domain-bounded — then one window over values, never a
# window over rows). bucket(v) = floor(B * rows_before(v) / total), so
# bucket boundaries, counts, and min/max are all exact integers/values —
# no approx-percentile sketch, bit-identical on any engine.
# ---------------------------------------------------------------------------

HIST_BUCKETS = 16


def q194_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    vc = li.groupBy(F.col("l_extendedprice").alias("v")).agg(
        F.count("*").alias("cnt")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    tot = vc.agg(F.sum("cnt").alias("total"))
    bucketed = (
        vc.withColumn("before", F.coalesce(F.sum("cnt").over(w), F.lit(0)))
        .crossJoin(F.broadcast(tot))
        .select(
            F.expr(f"CAST({HIST_BUCKETS} * before DIV total AS INT)").alias(
                "bucket"
            ),
            "v",
            "cnt",
        )
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
            F.sum("cnt").alias("n_rows"),
            F.count("*").alias("n_distinct"),
        )
        .orderBy("bucket")
    )


Q194_SQL = f"""
WITH vc AS (
    SELECT l_extendedprice AS v, COUNT(*) AS cnt FROM lineitem GROUP BY 1
),
tot AS (SELECT SUM(cnt) AS total FROM vc),
bucketed AS (
    SELECT CAST({HIST_BUCKETS} * COALESCE(SUM(cnt) OVER (
               ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) // total AS INT) AS bucket,
           v, cnt
    FROM vc CROSS JOIN tot
)
SELECT bucket, MIN(v) AS lo, MAX(v) AS hi,
       CAST(SUM(cnt) AS BIGINT) AS n_rows, COUNT(*) AS n_distinct
FROM bucketed GROUP BY bucket ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# Q195 — Join-skew diagnosis: per-key frequency of the orders->customer
# join key, the global (total, distinct) stats as a 1-row broadcast, and
# for the top-20 heaviest keys the skew factor (key frequency vs the
# uniform expectation total/n_keys) plus the salt fan-out the salted-join
# operator (operators/skew.py) would need to level that key. All
# arithmetic on exact ints (ceil as (a + b - 1) div b); the one double is
# an int/int division, correctly rounded identically everywhere.
# ---------------------------------------------------------------------------

SKEW_TOP_K = 20


def q195_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    freq = orders.groupBy(F.col("o_custkey").alias("join_key")).agg(
        F.count("*").alias("cnt")
    )
    stats = freq.agg(
        F.sum("cnt").alias("total"), F.count("*").alias("n_keys")
    )
    # Top-K via orderBy+limit (per-partition TakeOrdered heap); rank
    # attaches AFTER the cut — constant K-row window, never the key set.
    top = freq.orderBy(F.col("cnt").desc(), F.col("join_key")).limit(
        SKEW_TOP_K
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("join_key"))
    return (
        top.withColumn("rank", F.row_number().over(w).cast("int"))
        .crossJoin(F.broadcast(stats))
        .select(
            "rank",
            "join_key",
            "cnt",
            (
                (F.col("cnt") * F.col("n_keys")).cast("double")
                / F.col("total").cast("double")
            ).alias("skew_factor"),
            F.expr(
                "CAST((cnt * n_keys + total - 1) DIV total AS INT)"
            ).alias("suggested_salt"),
        )
    )


Q195_SQL = f"""
WITH freq AS (
    SELECT o_custkey AS join_key, COUNT(*) AS cnt FROM orders GROUP BY 1
),
stats AS (SELECT SUM(cnt) AS total, COUNT(*) AS n_keys FROM freq),
ranked AS (
    SELECT join_key, cnt,
           CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, join_key) AS INT)
             AS rank
    FROM freq
)
SELECT rank, join_key, cnt,
       CAST(cnt * n_keys AS DOUBLE) / CAST(total AS DOUBLE) AS skew_factor,
       CAST((cnt * n_keys + total - 1) // total AS INT) AS suggested_salt
FROM ranked CROSS JOIN stats
WHERE rank <= {SKEW_TOP_K}
"""


# ---------------------------------------------------------------------------
# Q213 — Benford first-digit audit over order totals: the classic
# forensic-accounting screen (Benford 1938; Nigrini's fraud audits) —
# compare the observed first-significant-digit distribution of amounts
# against log10(1 + 1/d) and flag digits that deviate. A data-quality /
# anomaly primitive alongside q182's reconciliation and q90's drift chi².
#
# Determinism: amounts become exact integer cents (double → DECIMAL(18,2)
# via shortest-string, ×100), the first digit is the first character of
# the integer's decimal string (identical CAST text both engines), the
# observed share is ppm by integral division, and the expected ppm values
# are Python-precomputed literals injected into BOTH engines — the only
# float op left is the chi² contribution, an identical fixed-order IEEE
# expression rounded to 9 dp.
#
# Scale shape: one 9-bucket keyed agg (map-side combined) + the 1-row
# total broadcast (q03 pattern).
# ---------------------------------------------------------------------------

#: floor(log10(1 + 1/d) * 1e6) for d = 1..9 — computed once here, used as
#: literals on both engines so no transcendental runs inside a query.
import math as _math

BENFORD_EXPECTED_PPM = {
    d: int(_math.floor(_math.log10(1.0 + 1.0 / d) * 1_000_000))
    for d in range(1, 10)
}


def q213_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    digits = (
        o.select(F.substring(cents.cast("string"), 1, 1).cast("int").alias("digit"))
        .where(F.col("digit") >= 1)
        .groupBy("digit")
        .agg(F.count("*").alias("n"))
    )
    total = o.agg(F.count("*").alias("n_total"))
    expected = F.create_map(
        *[
            x
            for d, ppm in BENFORD_EXPECTED_PPM.items()
            for x in (F.lit(d), F.lit(ppm))
        ]
    )
    joined = digits.crossJoin(F.broadcast(total)).select(
        "digit",
        "n",
        F.expr("n * 1000000 DIV n_total").cast("long").alias("observed_ppm"),
        expected[F.col("digit")].cast("long").alias("expected_ppm"),
        "n_total",
    )
    exp_n = F.col("expected_ppm").cast("double") * F.col("n_total").cast(
        "double"
    ) / F.lit(1000000.0)
    chi2 = (F.col("n").cast("double") - exp_n) * (
        F.col("n").cast("double") - exp_n
    ) / exp_n
    return joined.select(
        "digit",
        "n",
        "observed_ppm",
        "expected_ppm",
        (F.col("observed_ppm") - F.col("expected_ppm")).alias("deviation_ppm"),
        F.round(chi2, 9).alias("chi2_term"),
    ).orderBy("digit")


_BENFORD_CASE = " ".join(
    f"WHEN {d} THEN {ppm}" for d, ppm in BENFORD_EXPECTED_PPM.items()
)

Q213_SQL = f"""
WITH digits AS (
    SELECT CAST(SUBSTRING(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                                   AS BIGINT) AS VARCHAR), 1, 1) AS INT)
               AS digit,
           COUNT(*) AS n
    FROM orders
    GROUP BY 1
),
total AS (SELECT COUNT(*) AS n_total FROM orders),
joined AS (
    SELECT digit, n,
           CAST(n * 1000000 // n_total AS BIGINT) AS observed_ppm,
           CAST(CASE digit {_BENFORD_CASE} END AS BIGINT) AS expected_ppm,
           n_total
    FROM digits, total
    WHERE digit >= 1
)
SELECT digit, n, observed_ppm, expected_ppm,
       observed_ppm - expected_ppm AS deviation_ppm,
       round((CAST(n AS DOUBLE)
              - CAST(expected_ppm AS DOUBLE) * CAST(n_total AS DOUBLE)
                / 1000000.0)
             * (CAST(n AS DOUBLE)
                - CAST(expected_ppm AS DOUBLE) * CAST(n_total AS DOUBLE)
                  / 1000000.0)
             / (CAST(expected_ppm AS DOUBLE) * CAST(n_total AS DOUBLE)
                / 1000000.0), 9) AS chi2_term
FROM joined
ORDER BY digit
"""


# ---------------------------------------------------------------------------
# Q264 — JOIN-SIZE PROFILER: predict an M:N join's output cardinality
# and its skew BEFORE running it, from per-key counts alone — the
# pre-flight check a 100 TB deployment runs before an orders⋈events
# subject join (output rows = Σ_k c_o(k)·c_e(k), a quantity the
# optimizer only estimates; computing it exactly costs two keyed
# COUNTs, never the join itself). Reports the top-10 heaviest keys
# (the candidates for operators/skew.py salting), each key's exact
# output contribution and ppm share, and the total — q195 profiles one
# table's key skew; this profiles the JOIN the two tables are about to
# do. All counts/products exact int64 (c_o·c_e < 2^63 far past any real
# per-key fan-out); shares by integral ppm division.
# ---------------------------------------------------------------------------

_PROFILE_TOP = 10


def q264_join_size_profiler(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    ev = load_table(spark, sf_dir, "events")
    co = o.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count("*").alias("n_orders")
    )
    ce = ev.groupBy(F.col("user_id").alias("k")).agg(
        F.count("*").alias("n_events")
    )
    per_key = co.join(ce, "k").select(
        "k",
        "n_orders",
        "n_events",
        (F.col("n_orders") * F.col("n_events")).alias("out_rows"),
    )
    totals = per_key.groupBy().agg(
        F.sum("out_rows").cast("long").alias("total_out"),
        F.count("*").cast("long").alias("n_join_keys"),
    )
    w = Window.orderBy(F.col("out_rows").desc(), F.col("k"))
    return (
        per_key.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _PROFILE_TOP)
        .crossJoin(F.broadcast(totals))
        .select(
            F.col("k").alias("join_key"),
            F.col("n_orders").cast("long").alias("n_orders"),
            F.col("n_events").cast("long").alias("n_events"),
            F.col("out_rows").cast("long").alias("out_rows"),
            F.col("rank").cast("int").alias("rank"),
            "total_out",
            "n_join_keys",
            F.expr("out_rows * 1000000 div total_out").alias("share_ppm"),
        )
        .orderBy("rank")
    )


Q264_SQL = f"""
WITH co AS (
    SELECT o_custkey AS k, COUNT(*) AS n_orders FROM orders GROUP BY 1
),
ce AS (
    SELECT user_id AS k, COUNT(*) AS n_events FROM events GROUP BY 1
),
per_key AS (
    SELECT co.k, n_orders, n_events, n_orders * n_events AS out_rows
    FROM co JOIN ce USING (k)
),
totals AS (
    SELECT CAST(SUM(out_rows) AS BIGINT) AS total_out,
           CAST(COUNT(*) AS BIGINT) AS n_join_keys
    FROM per_key
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (ORDER BY out_rows DESC, k) AS rank
    FROM per_key
)
SELECT k AS join_key, CAST(n_orders AS BIGINT) AS n_orders,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(out_rows AS BIGINT) AS out_rows, CAST(rank AS INT) AS rank,
       total_out, n_join_keys,
       CAST(out_rows AS BIGINT) * 1000000 // total_out AS share_ppm
FROM ranked CROSS JOIN totals
WHERE rank <= {_PROFILE_TOP}
ORDER BY rank
"""


# ---------------------------------------------------------------------------
# Q270 — COLUMN-PROFILE DRIFT (the data-diff tool): split orders into
# two date halves at the midpoint of the observed o_orderdate range and
# report, per column, non-null counts and exact distinct counts on each
# side plus drift ppm — the snapshot-over-snapshot schema health check
# a pipeline runs before promoting a new partition (q69's profile,
# diffed across time). The midpoint pivot rides the lazy 1-row
# broadcast-anchor pattern (q216) — no driver scalar at plan build.
#
# Every stat is a COUNT: type-blind and exactly portable. Values are
# unpivoted through CAST(... AS STRING) only to share one column —
# both engines' renderings are injective per type, so distinct counts
# agree even where the rendered text differs.
# ---------------------------------------------------------------------------

_PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


def q270_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    anchor = orders.groupBy().agg(
        F.min(F.col("o_orderdate").cast("date")).alias("d0"),
        F.max(F.col("o_orderdate").cast("date")).alias("d1"),
    )
    stack_expr = "stack({n}, {args}) AS (col, v)".format(
        n=len(_PROFILE_COLS),
        args=", ".join(
            f"'{c}', CAST({c} AS STRING)" for c in _PROFILE_COLS
        ),
    )
    halves = (
        orders.crossJoin(F.broadcast(anchor))
        .withColumn(
            "half",
            F.when(
                F.datediff(F.col("o_orderdate").cast("date"), F.col("d0")) * 2
                < F.datediff(F.col("d1"), F.col("d0")),
                F.lit("a"),
            ).otherwise(F.lit("b")),
        )
        .selectExpr("half", stack_expr)
    )
    per = halves.groupBy("col", "half").agg(
        F.count("v").alias("n"), F.count_distinct("v").alias("d")
    )
    wide = per.groupBy("col").agg(
        F.coalesce(
            F.max(F.when(F.col("half") == "a", F.col("n"))), F.lit(0)
        ).cast("long").alias("n_a"),
        F.coalesce(
            F.max(F.when(F.col("half") == "b", F.col("n"))), F.lit(0)
        ).cast("long").alias("n_b"),
        F.coalesce(
            F.max(F.when(F.col("half") == "a", F.col("d"))), F.lit(0)
        ).cast("long").alias("d_a"),
        F.coalesce(
            F.max(F.when(F.col("half") == "b", F.col("d"))), F.lit(0)
        ).cast("long").alias("d_b"),
    )
    return wide.selectExpr(
        "col",
        "n_a",
        "n_b",
        "d_a",
        "d_b",
        "CAST(abs(n_b - n_a) * 1000000 DIV greatest(n_a, 1) AS BIGINT)"
        " AS count_drift_ppm",
        "CAST(abs(d_b - d_a) * 1000000 DIV greatest(d_a, 1) AS BIGINT)"
        " AS distinct_drift_ppm",
    ).orderBy("col")


_PROFILE_UNION = "\n    UNION ALL\n".join(
    f"    SELECT half, '{c}' AS col, CAST({c} AS VARCHAR) AS v FROM based"
    for c in _PROFILE_COLS
)

Q270_SQL = f"""
WITH anchor AS (
    SELECT MIN(CAST(o_orderdate AS DATE)) AS d0,
           MAX(CAST(o_orderdate AS DATE)) AS d1
    FROM orders
),
based AS (
    SELECT o.*,
           CASE WHEN (CAST(o_orderdate AS DATE) - d0) * 2 < (d1 - d0)
                THEN 'a' ELSE 'b' END AS half
    FROM orders o CROSS JOIN anchor
),
unp AS (
{_PROFILE_UNION}
),
per AS (
    SELECT col, half, COUNT(v) AS n, COUNT(DISTINCT v) AS d
    FROM unp GROUP BY 1, 2
),
wide AS (
    SELECT col,
           CAST(COALESCE(MAX(CASE WHEN half = 'a' THEN n END), 0) AS BIGINT) AS n_a,
           CAST(COALESCE(MAX(CASE WHEN half = 'b' THEN n END), 0) AS BIGINT) AS n_b,
           CAST(COALESCE(MAX(CASE WHEN half = 'a' THEN d END), 0) AS BIGINT) AS d_a,
           CAST(COALESCE(MAX(CASE WHEN half = 'b' THEN d END), 0) AS BIGINT) AS d_b
    FROM per GROUP BY col
)
SELECT col, n_a, n_b, d_a, d_b,
       CAST(abs(n_b - n_a) * 1000000 // GREATEST(n_a, 1) AS BIGINT)
           AS count_drift_ppm,
       CAST(abs(d_b - d_a) * 1000000 // GREATEST(d_a, 1) AS BIGINT)
           AS distinct_drift_ppm
FROM wide
ORDER BY col
"""


# ---------------------------------------------------------------------------
# Q273 — COHEN'S KAPPA inter-rater agreement, per language: two
# independent rule-based quality raters over documents — rater A passes
# docs with ≥ 50 whitespace tokens (length gate), rater B passes docs
# whose distinct-token ratio is ≥ 1/2 (repetition gate; 2·|distinct| ≥
# |tokens| in integers). κ corrects raw agreement for chance:
#   κ = (N·(n11+n00) − (a1·b1 + a0·b0)) / (N² − (a1·b1 + a0·b0))
# reported as exact ppm — numerator can go NEGATIVE (worse than
# chance), so the oracle pins Spark DIV's truncation-toward-zero
# explicitly (the q241 idiom). The calibration gauge for rule-based
# labeling pipelines: low κ means the rules measure different things.
#
# Plan: one scan → per-doc booleans → one keyed agg per lang → pure
# column algebra on the |langs|-row frame. No joins, no windows.
# ---------------------------------------------------------------------------

_KAPPA_MIN_TOKENS = 50


def q273_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    rated = docs.select(
        "lang",
        (F.size(toks) >= _KAPPA_MIN_TOKENS).cast("int").alias("ra"),
        (F.size(F.array_distinct(toks)) * 2 >= F.size(toks))
        .cast("int")
        .alias("rb"),
    )
    cells = rated.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.expr("ra * rb")).cast("long").alias("n11"),
        F.sum(F.expr("ra * (1 - rb)")).cast("long").alias("n10"),
        F.sum(F.expr("(1 - ra) * rb")).cast("long").alias("n01"),
        F.sum(F.expr("(1 - ra) * (1 - rb)")).cast("long").alias("n00"),
    )
    return cells.selectExpr(
        "lang",
        "n_docs",
        "n11",
        "n10",
        "n01",
        "n00",
        # kden = 0 iff both raters are constant AND agree (pe = po = 1);
        # κ is conventionally 1 there — pinned to avoid a 0/0.
        "CAST(CASE WHEN n_docs * n_docs"
        " = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)"
        " THEN 1000000 ELSE"
        " 1000000 * (n_docs * (n11 + n00)"
        " - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)))"
        " DIV (n_docs * n_docs"
        " - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)))"
        " END AS BIGINT) AS kappa_ppm",
    ).orderBy("lang")


Q273_SQL = f"""
WITH rated AS (
    SELECT lang,
           CASE WHEN len(string_split_regex(TRIM(text), '\\s+'))
                     >= {_KAPPA_MIN_TOKENS} THEN 1 ELSE 0 END AS ra,
           CASE WHEN len(list_distinct(string_split_regex(TRIM(text), '\\s+')))
                     * 2 >= len(string_split_regex(TRIM(text), '\\s+'))
                THEN 1 ELSE 0 END AS rb
    FROM documents
),
cells AS (
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(ra * rb) AS BIGINT) AS n11,
           CAST(SUM(ra * (1 - rb)) AS BIGINT) AS n10,
           CAST(SUM((1 - ra) * rb) AS BIGINT) AS n01,
           CAST(SUM((1 - ra) * (1 - rb)) AS BIGINT) AS n00
    FROM rated GROUP BY lang
),
terms AS (
    SELECT *,
           1000000 * (n_docs * (n11 + n00)
               - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)))
               AS knum,
           n_docs * n_docs
               - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))
               AS kden
    FROM cells
)
SELECT lang, n_docs, n11, n10, n01, n00,
       CAST(CASE WHEN kden = 0 THEN 1000000
                 WHEN knum >= 0 THEN knum // kden
                 ELSE -((-knum) // kden) END AS BIGINT) AS kappa_ppm
FROM terms
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# Q284 — ID-SEQUENCE GAP AUDIT, per ingest day: if event_id is meant to
# be a dense monotone sequence, each day's span (max − min + 1) minus
# its distinct-id count is the number of MISSING ids (dropped or
# late-routed records), and count − distinct is the number of DUPLICATE
# ids — the two ingestion-health numbers a pipeline pages on. gap ppm
# is exact against the span. Cross-day interleaving shows up as span
# overlap, which this deliberately measures per-day (the operational
# question is "did today's ingest lose records", not global density).
#
# Plan: one (day) keyed agg — count, distinct, min, max — no joins.
# ---------------------------------------------------------------------------


def q284_id_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("day", F.col("ts")).cast("date").alias("day")
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.count_distinct("event_id").alias("n_ids"),
            F.min("event_id").alias("min_id"),
            F.max("event_id").alias("max_id"),
        )
        .selectExpr(
            "day",
            "CAST(n_rows AS BIGINT) AS n_rows",
            "CAST(n_ids AS BIGINT) AS n_ids",
            "CAST(min_id AS BIGINT) AS min_id",
            "CAST(max_id AS BIGINT) AS max_id",
            "CAST(max_id - min_id + 1 - n_ids AS BIGINT) AS n_missing",
            "CAST(n_rows - n_ids AS BIGINT) AS n_dup_ids",
            "CAST((max_id - min_id + 1 - n_ids) * 1000000"
            " DIV (max_id - min_id + 1) AS BIGINT) AS gap_ppm",
        )
        .orderBy("day")
    )


Q284_SQL = """
SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_ids,
       CAST(MIN(event_id) AS BIGINT) AS min_id,
       CAST(MAX(event_id) AS BIGINT) AS max_id,
       CAST(MAX(event_id) - MIN(event_id) + 1 - COUNT(DISTINCT event_id)
            AS BIGINT) AS n_missing,
       CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT) AS n_dup_ids,
       CAST((MAX(event_id) - MIN(event_id) + 1 - COUNT(DISTINCT event_id))
            * 1000000 // (MAX(event_id) - MIN(event_id) + 1) AS BIGINT)
           AS gap_ppm
FROM events
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Q291 — EVENT-TIME DISORDER / WATERMARK-SIZING AUDIT: treating
# event_id as the arrival order, how out-of-order does each event
# type's stream arrive? Lateness of a record = (running max event time
# seen so far) − (its own event time), in whole seconds — exactly what
# a Structured Streaming watermark must absorb. Reports, per type: the
# late-record count, the max lateness, and the coverage curve (ppm of
# records a 60 s / 300 s / 3600 s watermark would have admitted) — the
# number that sizes `withWatermark` before deploying q29/q42/q60.
#
# Plan: one cumulative-max window over (type, arrival order) + one
# keyed agg with conditional sums — the q286 curve shape. Integers
# end-to-end (epoch seconds).
# ---------------------------------------------------------------------------

_WM_HORIZONS_S = (60, 300, 3600)


def q291_disorder_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    late = (
        ev.select(
            "event_type",
            "event_id",
            # Integer DIV, not /-then-cast (the q222 ADVICE lesson):
            # exact for any epoch magnitude.
            F.expr("unix_micros(ts) DIV 1000000").alias("sec"),
        )
        .withColumn("seen", F.max("sec").over(w))
        .withColumn("lateness", F.col("seen") - F.col("sec"))
    )
    aggs = [
        F.count("*").alias("n_events"),
        F.sum((F.col("lateness") > 0).cast("int")).alias("n_late"),
        F.max("lateness").alias("max_lateness_s"),
    ] + [
        F.sum((F.col("lateness") <= k).cast("int")).alias(f"w{k}")
        for k in _WM_HORIZONS_S
    ]
    out = late.groupBy("event_type").agg(*aggs)
    ppm = [
        f"CAST(w{k} * 1000000 DIV n_events AS BIGINT) AS within_{k}s_ppm"
        for k in _WM_HORIZONS_S
    ]
    return out.selectExpr(
        "event_type",
        "CAST(n_events AS BIGINT) AS n_events",
        "CAST(n_late AS BIGINT) AS n_late",
        "CAST(max_lateness_s AS BIGINT) AS max_lateness_s",
        *ppm,
    ).orderBy("event_type")


Q291_SQL = f"""
WITH late AS (
    SELECT event_type,
           MAX(epoch_us(CAST(ts AS TIMESTAMP)) // 1000000) OVER (
               PARTITION BY event_type ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS lateness
    FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN lateness > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_late,
       CAST(MAX(lateness) AS BIGINT) AS max_lateness_s,
       {", ".join(
           f"CAST(SUM(CASE WHEN lateness <= {k} THEN 1 ELSE 0 END)"
           f" * 1000000 // COUNT(*) AS BIGINT) AS within_{k}s_ppm"
           for k in _WM_HORIZONS_S
       )}
FROM late
GROUP BY event_type
ORDER BY event_type
"""




# ---------------------------------------------------------------------------
# Q337 — Bucketed co-located join: the exchange-free join the 100 TB
# posture keeps promising, executed and PINNED. Both fact tables are
# written ONCE as bucketed catalog tables (sinks/layout.py:
# write_bucketed_table — bucketBy(16) on the join key, the pre-shuffle a
# lake pays at ingest), and the revenue join then runs as a sort-merge
# join with ZERO Exchange operators on either side (the MERGE hint pins
# SMJ so AQE's broadcast conversion cannot hide the property at bench
# scale; tests assert the exchange-free plan). Content contract: the
# bucketed round-trip changes nothing — the oracle is the plain
# parquet join.
#
# Scale: at 1000 executors this is THE shape for repeated fact-fact
# joins — the shuffle happens once at write time and every subsequent
# join on the bucket key is map-side merge; the only cost left is the
# in-bucket sort, which sortBy at write time would also remove.
# ---------------------------------------------------------------------------

_BUCKETS = 16


def _bucketed_table_names(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Deterministic per-corpus catalog names; the write is idempotent
    per session (skipped when the tables already exist)."""
    import hashlib
    import os
    import shutil

    from ..sinks.layout import write_bucketed_table

    digest = hashlib.sha256(
        os.path.abspath(sf_dir).encode()
    ).hexdigest()[:10]
    names = {"orders": f"bkt_{digest}_orders",
             "lineitem": f"bkt_{digest}_lineitem"}
    keys = {"orders": "o_orderkey", "lineitem": "l_orderkey"}
    for src, table in names.items():
        if spark.catalog.tableExists(table):
            continue
        # The managed-table LOCATION can outlive the in-memory catalog
        # (a previous process wrote it); evict the orphan before the
        # one-time bucketed write or saveAsTable refuses loudly.
        wh = spark.conf.get(
            "spark.sql.warehouse.dir", "spark-warehouse"
        ).removeprefix("file:")
        shutil.rmtree(os.path.join(wh, table), ignore_errors=True)
        write_bucketed_table(
            load_table(spark, sf_dir, src), table, [keys[src]], _BUCKETS
        )
    return names["orders"], names["lineitem"]


def q337_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.numeric import dec_sum

    t_orders, t_lineitem = _bucketed_table_names(spark, sf_dir)
    o = spark.table(t_orders)
    li = spark.table(t_lineitem)
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        o.hint("merge")
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_orderkey").cast("long").alias("n_orders"),
            F.count("*").cast("long").alias("n_items"),
            dec_sum(revenue).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


Q337_SQL = """
SELECT o_orderpriority,
       CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""




# ---------------------------------------------------------------------------
# Q343 — Salted skewed JOIN, registered (operators/skew.py:salted_join —
# until now exercised only by tests + bench_skew.py). The shape: a
# skewed fact (events; q195 reports its heavy keys) equi-joined to a
# medium per-key dim that is too big to broadcast at cluster scale —
# the case where one hot user pins an entire reducer. The left side's
# keys are salted 8 ways and the dim replicated to match, so the hot
# key's rows spread over 8 reducers; output equals the plain join
# EXACTLY (the oracle is that plain join — salting is pure physical
# redistribution). The dim's values flow into the aggregate
# (value × user-event-count) so a dropped/duplicated replica breaks the
# value hash loudly.
#
# Scale: salting trades n_salts× dim shuffle volume for hot-key reducer
# spread — the standard fact⋈dim skew mitigation when AQE's runtime
# skew-join split can't see the skew (pinned partitioning upstream).
# ---------------------------------------------------------------------------

_SALTS = 8


def q343_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.numeric import dec_sum
    from ..operators.skew import salted_join

    ev = load_table(spark, sf_dir, "events")
    dim = ev.groupBy("user_id").agg(F.count("*").alias("u_events"))
    joined = salted_join(
        ev.select("user_id", "event_type", "value"),
        dim,
        ["user_id"],
        n_salts=_SALTS,
    )
    return (
        joined.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("u_events").cast("long").alias("weight_sum"),
            dec_sum(F.col("value") * F.col("u_events")).alias(
                "weighted_value"
            ),
        )
        .orderBy("event_type")
    )


Q343_SQL = """
WITH dim AS (
    SELECT user_id, COUNT(*) AS u_events FROM events GROUP BY user_id
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(u_events) AS BIGINT) AS weight_sum,
       CAST(SUM(CAST(value * u_events AS DECIMAL(38,6))) AS DOUBLE)
           AS weighted_value
FROM events JOIN dim USING (user_id)
GROUP BY event_type
ORDER BY event_type
"""




# ---------------------------------------------------------------------------
# Q344 — Columnar-format interchange parity under the DRIVER contract:
# lineitem written to ORC (sources/formats.py — the round-trips were
# test-only until now) and read back; the checked aggregate runs over
# the ORC scan while the oracle runs over the original parquet, so any
# value the format shifts — timestamps are the classic ORC/parquet
# hazard (different epoch/zone conventions) — breaks the hash loudly.
# max_ship_us pins the timestamp domain explicitly.
#
# Scale: the one-time conversion is a linear columnar rewrite; the scan
# behind the aggregate keeps pushdown/pruning (ORC is in COLUMNAR —
# PushedFilters verified by tests/test_layout.py).
# ---------------------------------------------------------------------------


def _orc_lineitem_path(spark: SparkSession, sf_dir: str) -> str:
    import hashlib
    import os

    from ..sources.formats import write_table
    from ..sources.tables import load_table as _lt

    norm = os.path.abspath(os.path.normpath(sf_dir))
    # The cache key digests the source CONTENT signature (every source
    # file's name/size/mtime), not just the path: a corpus regenerated
    # in place would otherwise silently serve the stale ORC while the
    # oracle reads the fresh parquet — a confusing hash-mismatch instead
    # of a rebuild. (q332/q341 artifacts carry recount audits for the
    # same reason; this artifact is cheaper to just re-key.)
    sig_parts = [norm]
    src = f"{norm}/lineitem.parquet"
    if os.path.isdir(src):
        for e in sorted(os.scandir(src), key=lambda x: x.name):
            st = e.stat()
            sig_parts.append(f"{e.name}:{st.st_size}:{st.st_mtime_ns}")
    elif os.path.exists(src):
        st = os.stat(src)
        sig_parts.append(f"lineitem.parquet:{st.st_size}:{st.st_mtime_ns}")
    digest = hashlib.sha256("|".join(sig_parts).encode()).hexdigest()[:12]
    # The directory prefix keys on basename PLUS a full-path hash
    # (ADVICE r10): two distinct corpora sharing a basename (/a/sf0.01
    # and /b/sf0.01) always differ in content digest but used to share
    # the `{base}-` prune prefix, so alternating between them evicted
    # and rebuilt each other's ORC tree every regeneration.
    base = (
        f"{os.path.basename(norm)}."
        f"{hashlib.sha256(norm.encode()).hexdigest()[:8]}"
    )
    root = "/tmp/spark_graft_orc"
    path = f"{root}/{base}-{digest}/lineitem.orc"
    if not os.path.exists(f"{path}/_SUCCESS"):
        # At most ONE ORC tree per corpus basename: the content-signature
        # key means every regeneration (even a touch) mints a new digest,
        # and the superseded sibling would otherwise be stranded forever
        # (ADVICE r9). Prune before writing the fresh artifact.
        import shutil

        if os.path.isdir(root):
            for e in os.scandir(root):
                if (
                    e.is_dir()
                    and e.name.startswith(f"{base}-")
                    and e.name != f"{base}-{digest}"
                ):
                    shutil.rmtree(e.path, ignore_errors=True)
        write_table(_lt(spark, sf_dir, "lineitem"), path, fmt="orc")
    return path


def q344_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.numeric import dec_sum
    from ..sources.formats import read_table

    li = read_table(spark, _orc_lineitem_path(spark, sf_dir), fmt="orc")
    return (
        li.groupBy("l_linenumber")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            dec_sum("l_quantity").alias("qty_sum"),
            dec_sum("l_extendedprice").alias("price_sum"),
            F.max(F.unix_micros("l_shipdate")).cast("long").alias(
                "max_ship_us"
            ),
        )
        .orderBy("l_linenumber")
    )


Q344_SQL = """
SELECT l_linenumber,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS qty_sum,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
           AS price_sum,
       CAST(MAX(epoch_us(CAST(l_shipdate AS TIMESTAMP))) AS BIGINT)
           AS max_ship_us
FROM lineitem
GROUP BY l_linenumber
ORDER BY l_linenumber
"""


OPS_DIAG_QUERIES = {
    "q344_orc_roundtrip": q344_orc_roundtrip,
    "q343_salted_join": q343_salted_join,
    "q337_bucketed_join": q337_bucketed_join,
    "q270_profile_drift": q270_profile_drift,
    "q284_id_gap_audit": q284_id_gap_audit,
    "q291_disorder_audit": q291_disorder_audit,
    "q273_cohens_kappa": q273_cohens_kappa,
    "q264_join_size_profiler": q264_join_size_profiler,
    "q213_benford_audit": q213_benford_audit,
    "q189_replica_checksum_diff": q189_replica_checksum_diff,
    "q190_runtime_filter_join": q190_runtime_filter_join,
    "q194_equidepth_histogram": q194_equidepth_histogram,
    "q195_skew_report": q195_skew_report,
}

OPS_DIAG_ORACLES = {
    "q344_orc_roundtrip": Q344_SQL,
    "q343_salted_join": Q343_SQL,
    "q337_bucketed_join": Q337_SQL,
    "q270_profile_drift": Q270_SQL,
    "q284_id_gap_audit": Q284_SQL,
    "q291_disorder_audit": Q291_SQL,
    "q273_cohens_kappa": Q273_SQL,
    "q264_join_size_profiler": Q264_SQL,
    "q213_benford_audit": Q213_SQL,
    "q189_replica_checksum_diff": Q189_SQL,
    "q190_runtime_filter_join": Q190_SQL,
    "q194_equidepth_histogram": Q194_SQL,
    "q195_skew_report": Q195_SQL,
}
