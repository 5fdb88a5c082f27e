"""Statistical-methods query family (split from plans/insights.py in
round 7 — VERDICT item 8: no plans/ module above 3k lines; pure
mechanical move, plan guards + the oracle sweep prove no drift).

Exact-integer implementations of the classical statistics toolbox over
the warehouse tables: Markov transition matrices, VaR/CVaR, weighted
medians, decile lift, Kolmogorov-Smirnov drift, Mann-Whitney rank-sum,
histogram intersection, Shewhart control charts, Kaplan-Meier survival,
and empirical quantile mapping. Every query keeps its original qNNN
registry key and DuckDB value oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import exact_grouped_percentiles
from ..sources.tables import load_table

# ---------------------------------------------------------------------------
# Q219 — Markov next-event transition matrix: P(next event type | current
# event type) from each user's time-ordered event stream. LEAD window
# per user (bounded partitions), then one keyed count aggregation;
# probabilities are double divisions of exact counts. The per-source
# total runs as a window over the |types|^2 aggregate, not the events.
# ---------------------------------------------------------------------------


def q219_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").cast("long").alias("n"))
    )
    wt = Window.partitionBy("from_type")
    return trans.select(
        "from_type",
        "to_type",
        "n",
        (
            F.col("n").cast("double")
            / F.sum("n").over(wt).cast("double")
        ).alias("p"),
    ).orderBy("from_type", "to_type")


Q219_SQL = """
WITH seq AS (
    SELECT event_type AS from_type,
           LEAD(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS to_type
    FROM events
),
trans AS (
    SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       CAST(n AS DOUBLE) /
       CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
FROM trans
ORDER BY from_type, to_type
"""


# ---------------------------------------------------------------------------
# Q231 — Value-at-Risk / CVaR on day-over-day revenue changes, with the
# DISCRETE (order-statistic) definitions so the whole computation stays
# integer-exact: VaR(5%) is the k-th smallest daily change where
# k = ceil(0.05·n) (integral arithmetic: (n·5 + 99) DIV 100), CVaR is
# the mean of the k changes at or below it — one int64 sum divided by
# k. Rank ties are broken by day, so the cutoff is engine-independent
# even when change values repeat. Windows run over the (nation × day)
# aggregate.
# ---------------------------------------------------------------------------

VAR_PCT = 5


def q231_var_cvar(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    daily = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "n_name",
            F.to_date("l_shipdate").alias("day"),
            F.floor(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
                * 100
                + F.lit(0.5)
            )
            .cast("long")
            .alias("rev_c"),
        )
        .groupBy("n_name", "day")
        .agg(F.sum("rev_c").alias("rev_c"))
    )
    wd = Window.partitionBy("n_name").orderBy("day")
    changes = daily.select(
        "n_name",
        "day",
        (F.col("rev_c") - F.lag("rev_c").over(wd)).alias("change_c"),
    ).where(F.col("change_c").isNotNull())
    wrank = Window.partitionBy("n_name").orderBy("change_c", "day")
    wall = Window.partitionBy("n_name")
    ranked = changes.select(
        "n_name",
        "change_c",
        F.row_number().over(wrank).alias("rk"),
        F.count("*").over(wall).alias("n_changes"),
    ).withColumn("k", F.expr(f"(n_changes * {VAR_PCT} + 99) DIV 100"))
    return (
        ranked.where(F.col("rk") <= F.col("k"))
        .groupBy("n_name", "n_changes", "k")
        .agg(
            F.max("change_c").alias("var_c"),
            F.sum("change_c").alias("tail_c"),
        )
        .select(
            "n_name",
            F.col("n_changes").cast("long").alias("n_changes"),
            (F.col("var_c").cast("double") / 100.0).alias("var_usd"),
            (
                F.col("tail_c").cast("double")
                / (F.col("k").cast("double") * 100.0)
            ).alias("cvar_usd"),
        )
        .orderBy("n_name")
    )


Q231_SQL = f"""
WITH daily AS (
    SELECT n_name, CAST(l_shipdate AS DATE) AS day,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100
                               + 0.5) AS BIGINT)) AS BIGINT) AS rev_c
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY 1, 2
),
changes AS (
    SELECT n_name, day,
           rev_c - LAG(rev_c) OVER (PARTITION BY n_name ORDER BY day)
               AS change_c
    FROM daily
    QUALIFY change_c IS NOT NULL
),
ranked AS (
    SELECT n_name, change_c,
           ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY change_c, day)
               AS rk,
           COUNT(*) OVER (PARTITION BY n_name) AS n_changes,
           (COUNT(*) OVER (PARTITION BY n_name) * {VAR_PCT} + 99) // 100 AS k
    FROM changes
)
SELECT n_name, CAST(n_changes AS BIGINT) AS n_changes,
       CAST(MAX(change_c) AS DOUBLE) / 100.0 AS var_usd,
       CAST(SUM(change_c) AS DOUBLE) / (CAST(k AS DOUBLE) * 100.0) AS cvar_usd
FROM ranked
WHERE rk <= k
GROUP BY n_name, n_changes, k
ORDER BY n_name
"""


# ---------------------------------------------------------------------------
# Q237 — Exact weighted median (weights = quantity) per return flag, in
# the distributed value-counts form: GROUP BY (flag, price) with weight
# sums (map-side combinable, domain-bounded), cumulative weight over
# the per-flag price order, answer = the smallest price whose
# cumulative weight reaches half the total (discrete lower weighted
# median — all-integer test: 2·cumw >= totw with weights in exact
# units). The unweighted twin is q45; this closes the weighted-quantile
# gap neither engine has a builtin for.
# ---------------------------------------------------------------------------


def q237_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    vc = (
        li.select(
            "l_returnflag",
            "l_extendedprice",
            F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("w"),
        )
        .groupBy("l_returnflag", "l_extendedprice")
        .agg(F.sum("w").alias("w"))
    )
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("l_returnflag")
    hit = vc.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum("w").over(wcum).alias("cumw"),
        F.sum("w").over(wall).alias("totw"),
    ).where(F.col("cumw") * 2 >= F.col("totw"))
    wpick = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    return (
        hit.withColumn("rn", F.row_number().over(wpick))
        .where(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("l_extendedprice").alias("weighted_median_price"),
            F.col("totw").cast("long").alias("total_weight"),
        )
        .orderBy("l_returnflag")
    )


Q237_SQL = """
WITH vc AS (
    SELECT l_returnflag, l_extendedprice,
           CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS w
    FROM lineitem GROUP BY 1, 2
),
cums AS (
    SELECT l_returnflag, l_extendedprice,
           SUM(w) OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
           SUM(w) OVER (PARTITION BY l_returnflag) AS totw
    FROM vc
)
SELECT l_returnflag,
       MIN(l_extendedprice) AS weighted_median_price,
       CAST(MIN(totw) AS BIGINT) AS total_weight
FROM cums
WHERE cumw * 2 >= totw
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Q238 — Decile lift / cumulative-gains chart: customers ranked by
# exact-decimal monetary value into NTILE(10) deciles (custkey
# tiebreaker), then each decile reports its cumulative share of
# customers and of revenue, and the lift ratio. Shares are double
# divisions of exact decimal/integer cumulatives; the decile window
# runs over the per-customer AGGREGATE.
# ---------------------------------------------------------------------------


def q238_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("monetary_d")
    )
    ranked = per_cust.select(
        "o_custkey",
        "monetary_d",
        F.ntile(10)
        .over(Window.orderBy(F.col("monetary_d").desc(), F.col("o_custkey")))
        .alias("decile"),
    )
    deciles = ranked.groupBy("decile").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum("monetary_d").alias("rev_d"),
    )
    wcum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    return (
        deciles.select(
            "decile",
            "n_customers",
            F.col("rev_d").cast("double").alias("decile_revenue"),
            (
                F.sum("n_customers").over(wcum).cast("double")
                / F.sum("n_customers").over(wall).cast("double")
            ).alias("cum_cust_share"),
            (
                F.sum("rev_d").over(wcum).cast("double")
                / F.sum("rev_d").over(wall).cast("double")
            ).alias("cum_rev_share"),
        )
        .select(
            "decile",
            "n_customers",
            "decile_revenue",
            "cum_cust_share",
            "cum_rev_share",
            (F.col("cum_rev_share") / F.col("cum_cust_share")).alias("lift"),
        )
        .orderBy("decile")
    )


Q238_SQL = """
WITH per_cust AS (
    SELECT o_custkey,
           SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS monetary_d
    FROM orders GROUP BY o_custkey
),
ranked AS (
    SELECT o_custkey, monetary_d,
           NTILE(10) OVER (ORDER BY monetary_d DESC, o_custkey) AS decile
    FROM per_cust
),
deciles AS (
    SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
           SUM(monetary_d) AS rev_d
    FROM ranked GROUP BY decile
),
cums AS (
    SELECT decile, n_customers,
           CAST(rev_d AS DOUBLE) AS decile_revenue,
           CAST(SUM(n_customers) OVER (ORDER BY decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               / CAST(SUM(n_customers) OVER () AS DOUBLE) AS cum_cust_share,
           CAST(SUM(rev_d) OVER (ORDER BY decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               / CAST(SUM(rev_d) OVER () AS DOUBLE) AS cum_rev_share
    FROM deciles
)
SELECT decile, n_customers, decile_revenue, cum_cust_share, cum_rev_share,
       cum_rev_share / cum_cust_share AS lift
FROM cums
ORDER BY decile
"""


# ---------------------------------------------------------------------------
# Q245 — Exact two-sample Kolmogorov-Smirnov drift statistic between
# two years' price distributions, per return flag. The KS statistic is
# D = max over the merged value domain of |F1(v) - F2(v)|; kept EXACT
# by cross-multiplying the empirical CDFs to integers:
#     D_num = max |c1(v)·n2 - c2(v)·n1|,   D = D_num / (n1·n2)
# where c_i(v) are cumulative counts over the per-(flag, value)
# aggregate — value-counts state, windows over the (flag × distinct
# value) grid, never over raw rows. The continuous-domain complement of
# q90's binned chi-square drift test.
# ---------------------------------------------------------------------------

KS_Y0 = 2000
KS_Y1 = 2001


def q245_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    vc = (
        li.where(F.year("l_shipdate").isin(KS_Y0, KS_Y1))
        .select(
            "l_returnflag",
            "l_extendedprice",
            (F.year("l_shipdate") == KS_Y0).cast("long").alias("is0"),
            (F.year("l_shipdate") == KS_Y1).cast("long").alias("is1"),
        )
        .groupBy("l_returnflag", "l_extendedprice")
        .agg(F.sum("is0").alias("d0"), F.sum("is1").alias("d1"))
    )
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("l_returnflag")
    cums = vc.select(
        "l_returnflag",
        F.sum("d0").over(wcum).alias("c0"),
        F.sum("d1").over(wcum).alias("c1"),
        F.sum("d0").over(wall).alias("n0"),
        F.sum("d1").over(wall).alias("n1"),
    )
    return (
        cums.groupBy("l_returnflag", "n0", "n1")
        .agg(
            F.max(
                F.abs(F.col("c0") * F.col("n1") - F.col("c1") * F.col("n0"))
            ).alias("d_num")
        )
        .select(
            "l_returnflag",
            F.col("n0").cast("long").alias("n0"),
            F.col("n1").cast("long").alias("n1"),
            (
                F.col("d_num").cast("double")
                / (F.col("n0") * F.col("n1")).cast("double")
            ).alias("ks_d"),
        )
        .orderBy("l_returnflag")
    )


Q245_SQL = f"""
WITH vc AS (
    SELECT l_returnflag, l_extendedprice,
           CAST(SUM(CASE WHEN year(l_shipdate) = {KS_Y0} THEN 1 ELSE 0 END)
                AS BIGINT) AS d0,
           CAST(SUM(CASE WHEN year(l_shipdate) = {KS_Y1} THEN 1 ELSE 0 END)
                AS BIGINT) AS d1
    FROM lineitem
    WHERE year(l_shipdate) IN ({KS_Y0}, {KS_Y1})
    GROUP BY 1, 2
),
cums AS (
    SELECT l_returnflag,
           SUM(d0) OVER w AS c0, SUM(d1) OVER w AS c1,
           SUM(d0) OVER wa AS n0, SUM(d1) OVER wa AS n1
    FROM vc
    WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_extendedprice
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           wa AS (PARTITION BY l_returnflag)
)
SELECT l_returnflag,
       CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
       CAST(MAX(ABS(c0 * n1 - c1 * n0)) AS DOUBLE)
           / CAST(n0 * n1 AS DOUBLE) AS ks_d
FROM cums
GROUP BY l_returnflag, n0, n1
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Q246 — Exact Mann-Whitney U (rank-sum) between the same two samples
# as q245, with proper midrank tie handling and ZERO floating point
# until the final readout: ranks are kept in HALF-UNITS (rank2 =
# 2·rank, so every midrank is an integer), making R1 and U exact
# integers over the value-counts grid:
#     midrank2(v) = 2·cum_before(v) + cnt(v) + 1
#     R1_2 = Σ d0(v)·midrank2(v);   U1_2 = R1_2 − n0(n0+1)
# The rank-based complement of q245's CDF-based KS — together they are
# the standard nonparametric drift pair.
# ---------------------------------------------------------------------------


def q246_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    vc = (
        li.where(F.year("l_shipdate").isin(KS_Y0, KS_Y1))
        .select(
            "l_returnflag",
            "l_extendedprice",
            (F.year("l_shipdate") == KS_Y0).cast("long").alias("is0"),
            (F.year("l_shipdate") == KS_Y1).cast("long").alias("is1"),
        )
        .groupBy("l_returnflag", "l_extendedprice")
        .agg(F.sum("is0").alias("d0"), F.sum("is1").alias("d1"))
    )
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wall = Window.partitionBy("l_returnflag")
    ranked = vc.select(
        "l_returnflag",
        "d0",
        (
            2 * F.coalesce(F.sum(F.col("d0") + F.col("d1")).over(wcum), F.lit(0))
            + F.col("d0")
            + F.col("d1")
            + 1
        ).alias("midrank2"),
        F.sum("d0").over(wall).alias("n0"),
        F.sum("d1").over(wall).alias("n1"),
    )
    return (
        ranked.groupBy("l_returnflag", "n0", "n1")
        .agg(F.sum(F.col("d0") * F.col("midrank2")).alias("r1_2"))
        .select(
            "l_returnflag",
            F.col("n0").cast("long").alias("n0"),
            F.col("n1").cast("long").alias("n1"),
            ((F.col("r1_2") - F.col("n0") * (F.col("n0") + 1)) / 2)
            .cast("double")
            .alias("u1"),
            # normalized effect size: U / (n0·n1) in [0, 1]
            (
                (F.col("r1_2") - F.col("n0") * (F.col("n0") + 1)).cast("double")
                / (2.0 * (F.col("n0") * F.col("n1")).cast("double"))
            ).alias("auc"),
        )
        .orderBy("l_returnflag")
    )


Q246_SQL = f"""
WITH vc AS (
    SELECT l_returnflag, l_extendedprice,
           CAST(SUM(CASE WHEN year(l_shipdate) = {KS_Y0} THEN 1 ELSE 0 END)
                AS BIGINT) AS d0,
           CAST(SUM(CASE WHEN year(l_shipdate) = {KS_Y1} THEN 1 ELSE 0 END)
                AS BIGINT) AS d1
    FROM lineitem
    WHERE year(l_shipdate) IN ({KS_Y0}, {KS_Y1})
    GROUP BY 1, 2
),
ranked AS (
    SELECT l_returnflag, d0,
           2 * COALESCE(SUM(d0 + d1) OVER (
               PARTITION BY l_returnflag ORDER BY l_extendedprice
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + d0 + d1 + 1 AS midrank2,
           SUM(d0) OVER (PARTITION BY l_returnflag) AS n0,
           SUM(d1) OVER (PARTITION BY l_returnflag) AS n1
    FROM vc
)
SELECT l_returnflag,
       CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
       CAST((SUM(d0 * midrank2) - n0 * (n0 + 1)) / 2 AS DOUBLE) AS u1,
       CAST(SUM(d0 * midrank2) - n0 * (n0 + 1) AS DOUBLE)
           / (2.0 * CAST(n0 * n1 AS DOUBLE)) AS auc
FROM ranked
GROUP BY l_returnflag, n0, n1
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Q247 — Distribution-similarity matrix by histogram intersection:
# pairwise between supplier nations, over $1000 price buckets, kept
# EXACT with the q245 cross-multiplication: for nations a, b with
# bucket counts c_a(v), c_b(v) and totals n_a, n_b,
#     HI = Σ_v min(c_a(v)·n_b, c_b(v)·n_a) / (n_a·n_b)   ∈ [0, 1]
# — one integer sum, one final division. The numeric-distribution
# sibling of q230's shingle-set overlap matrix. Histograms are keyed
# aggregates; the pair join runs on the (bucket) key over the
# |nations|-bounded histogram frame, never over lineitem.
# Bound: c·n < 2^63 holds up to ~3e9 rows per group; past that,
# rescale counts to ppm ints first (c·1e6 DIV n) before the min-sum.
# ---------------------------------------------------------------------------

HI_BUCKET_C = 100_000  # $1000 buckets, in cents


def q247_histogram_intersection(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    hist = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "n_name",
            F.expr(
                "CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)"
                f" DIV {HI_BUCKET_C}"
            ).alias("bucket"),
        )
        .groupBy("n_name", "bucket")
        .agg(F.count("*").cast("long").alias("c"))
    )
    totals = hist.groupBy("n_name").agg(F.sum("c").alias("n_rows"))
    h = hist.join(F.broadcast(totals), "n_name")
    pairs = (
        h.alias("a")
        .join(
            h.alias("b"),
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.n_name") < F.col("b.n_name")),
        )
        .groupBy(
            F.col("a.n_name").alias("nation_a"),
            F.col("b.n_name").alias("nation_b"),
            F.col("a.n_rows").alias("n_a"),
            F.col("b.n_rows").alias("n_b"),
        )
        .agg(
            F.sum(
                F.least(
                    F.col("a.c") * F.col("b.n_rows"),
                    F.col("b.c") * F.col("a.n_rows"),
                )
            ).alias("hi_num")
        )
    )
    return pairs.select(
        "nation_a",
        "nation_b",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        (
            F.col("hi_num").cast("double")
            / (F.col("n_a") * F.col("n_b")).cast("double")
        ).alias("similarity"),
    ).orderBy(F.col("similarity").desc(), "nation_a", "nation_b")


Q247_SQL = f"""
WITH hist AS (
    SELECT n_name,
           CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
               // {HI_BUCKET_C} AS bucket,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY 1, 2
),
totals AS (
    SELECT n_name, CAST(SUM(c) AS BIGINT) AS n_rows FROM hist GROUP BY 1
),
h AS (SELECT hist.*, t.n_rows FROM hist JOIN totals t USING (n_name)),
pairs AS (
    SELECT a.n_name AS nation_a, b.n_name AS nation_b,
           a.n_rows AS n_a, b.n_rows AS n_b,
           CAST(SUM(LEAST(a.c * b.n_rows, b.c * a.n_rows)) AS BIGINT)
               AS hi_num
    FROM h a JOIN h b ON a.bucket = b.bucket AND a.n_name < b.n_name
    GROUP BY 1, 2, 3, 4
)
SELECT nation_a, nation_b, n_a, n_b,
       CAST(hi_num AS DOUBLE) / CAST(n_a * n_b AS DOUBLE) AS similarity
FROM pairs
ORDER BY similarity DESC, nation_a, nation_b
"""


# ---------------------------------------------------------------------------
# Q248 — Shewhart control chart (3σ out-of-control days) on each
# nation's daily revenue, with the control limits from a TRAILING
# 28-day window (excluding the day under test) and the 3σ test kept
# EXACT by cross-multiplication — no sqrt, no float compare:
#     |x − S/n| > 3·σ   ⟺   (n·x − S)²·(n−1) > 9·n·(n·Q − S²)
# where S, Q are the window's exact sum and sum-of-squares of integer
# cents. Squares reach ~1e22, so the algebra runs in DECIMAL(38,0) on
# the Spark side and HUGEINT (int128) in DuckDB — both exact. The
# point-based complement of q172's CUSUM drift detector.
# ---------------------------------------------------------------------------

SPC_WINDOW = 28


def q248_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    daily = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "n_name",
            F.to_date("l_shipdate").alias("day"),
            F.floor(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
                * 100
                + F.lit(0.5)
            )
            .cast("long")
            .alias("rev_c"),
        )
        .groupBy("n_name", "day")
        .agg(F.sum("rev_c").alias("rev_c"))
        .select(
            "n_name",
            "day",
            "rev_c",
            F.col("rev_c").cast("decimal(38,0)").alias("xd"),
            (F.col("rev_c").cast("decimal(38,0)") * F.col("rev_c")).alias(
                "xd2"
            ),
        )
    )
    wtrail = (
        Window.partitionBy("n_name")
        .orderBy("day")
        .rowsBetween(-SPC_WINDOW, -1)
    )
    stats = daily.select(
        "n_name",
        "day",
        "rev_c",
        "xd",
        F.count("*").over(wtrail).cast("decimal(38,0)").alias("nw"),
        F.sum("xd").over(wtrail).alias("sw"),
        F.sum("xd2").over(wtrail).alias("qw"),
    ).where(F.col("nw") == F.lit(SPC_WINDOW))
    lhs = (
        (F.col("nw") * F.col("xd") - F.col("sw"))
        * (F.col("nw") * F.col("xd") - F.col("sw"))
        * (F.col("nw") - 1)
    )
    rhs = 9 * F.col("nw") * (F.col("nw") * F.col("qw") - F.col("sw") * F.col("sw"))
    return (
        stats.where(lhs > rhs)
        .select(
            "n_name",
            "day",
            (F.col("rev_c").cast("double") / 100.0).alias("rev_usd"),
            (
                F.col("sw").cast("double")
                / (F.lit(float(SPC_WINDOW)) * 100.0)
            ).alias("window_mean_usd"),
        )
        .orderBy("n_name", "day")
    )


Q248_SQL = f"""
WITH daily AS (
    SELECT n_name, CAST(l_shipdate AS DATE) AS day,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100
                               + 0.5) AS BIGINT)) AS BIGINT) AS rev_c
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY 1, 2
),
stats AS (
    SELECT n_name, day, rev_c,
           CAST(rev_c AS HUGEINT) AS xd,
           CAST(COUNT(*) OVER w AS HUGEINT) AS nw,
           CAST(SUM(CAST(rev_c AS HUGEINT)) OVER w AS HUGEINT) AS sw,
           CAST(SUM(CAST(rev_c AS HUGEINT) * CAST(rev_c AS HUGEINT)) OVER w
                AS HUGEINT) AS qw
    FROM daily
    WINDOW w AS (PARTITION BY n_name ORDER BY day
                 ROWS BETWEEN {SPC_WINDOW} PRECEDING AND 1 PRECEDING)
)
SELECT n_name, day,
       CAST(rev_c AS DOUBLE) / 100.0 AS rev_usd,
       CAST(sw AS DOUBLE) / ({SPC_WINDOW}.0 * 100.0) AS window_mean_usd
FROM stats
WHERE nw = {SPC_WINDOW}
  AND (nw * xd - sw) * (nw * xd - sw) * (nw - 1)
      > 9 * nw * (nw * qw - sw * sw)
ORDER BY n_name, day
"""


# ---------------------------------------------------------------------------
# Q256 — KAPLAN-MEIER SURVIVAL CURVE with right-censoring: the estimator
# S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ), where subjects whose failure has not
# been observed by the corpus horizon are RIGHT-CENSORED (still alive —
# they leave the risk set without a death). Censoring handling
# is exactly what q66's retention matrix lacks: naive retention treats
# a still-active user as churned at their last observed day, biasing
# survival down; KM is the standard correction (Kaplan & Meier 1958).
#
# SUBJECTS: each purchase event, with "failure" = the same user's NEXT
# error event (time-to-failure in whole hours) and right-censoring at
# the corpus horizon when no later error exists — the case a naive
# "mean time to error" silently drops. The next-error lookup is ONE
# user-keyed window (min over the following frame), never a join.
#
# Determinism of the product: at-risk counts nᵢ and death counts dᵢ are
# exact integers (reverse-cumulative window sums); S(t) is a LEFT FOLD
# over the day-ascending step array — Spark `aggregate` over the sorted
# collected array, DuckDB `list_reduce` over the identically-sorted
# list — so both engines execute the SAME sequence of correctly-rounded
# IEEE (1 − d/n) multiplications. The step array is bounded by the
# corpus day span (#distinct event days), so the single-row collect is
# driver-bounded state like a k-means codebook, not data-scale state.
# The horizon is a lazy 1-row broadcast anchor (q216 pattern).
# ---------------------------------------------------------------------------

_US_PER_HOUR = 3_600_000_000


def q256_km_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    base = ev.where(
        F.col("event_type").isin("purchase", "error")
    ).select("user_id", "event_type", us.alias("us"), "event_id")
    w_next = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    next_err = F.min(
        F.when(F.col("event_type") == "error", F.col("us"))
    ).over(w_next)
    subjects = base.withColumn("err_us", next_err).where(
        F.col("event_type") == "purchase"
    )
    horizon = ev.select(us.alias("us")).groupBy().agg(
        F.max("us").alias("h")
    )
    lifed = subjects.crossJoin(F.broadcast(horizon)).select(
        F.expr("(coalesce(err_us, h) - us) div 3600000000").alias("t"),
        F.col("err_us").isNull().cast("int").alias("censored"),
    )
    per_day = lifed.groupBy("t").agg(
        F.sum(1 - F.col("censored")).cast("long").alias("d"),
        F.sum("censored").cast("long").alias("c"),
    )
    w_rev = (
        Window.orderBy(F.col("t").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    steps = (
        per_day.withColumn(
            "n", F.sum(F.col("d") + F.col("c")).over(w_rev)
        )
        .where(F.col("d") > 0)
        .select("t", "d", "n")
    )
    arr = steps.groupBy().agg(
        F.array_sort(F.collect_list(F.struct("t", "d", "n"))).alias("a")
    )
    exploded = arr.select(
        F.col("a"), F.posexplode("a").alias("i", "s")
    )
    s_hat = F.aggregate(
        F.slice(F.col("a"), 1, F.col("i") + 1),
        F.lit(1.0),
        lambda acc, x: acc * (F.lit(1.0) - x["d"] / x["n"]),
    )
    return exploded.select(
        F.col("s.t").alias("t_days"),
        F.col("s.n").alias("n_at_risk"),
        F.col("s.d").alias("deaths"),
        F.round(s_hat, 9).alias("s_hat"),
    ).orderBy("t_days")


Q256_SQL = f"""
WITH ev AS (
    SELECT user_id, event_type,
           epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id
    FROM events
),
base AS (
    SELECT user_id, event_type, us, event_id
    FROM ev WHERE event_type IN ('purchase', 'error')
),
with_next AS (
    SELECT *,
           MIN(CASE WHEN event_type = 'error' THEN us END) OVER (
               PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
           ) AS err_us
    FROM base
),
horizon AS (SELECT MAX(us) AS h FROM ev),
lifed AS (
    SELECT (COALESCE(err_us, h) - us) // {_US_PER_HOUR} AS t,
           CASE WHEN err_us IS NULL THEN 1 ELSE 0 END AS censored
    FROM with_next CROSS JOIN horizon
    WHERE event_type = 'purchase'
),
per_day AS (
    SELECT t, CAST(SUM(1 - censored) AS BIGINT) AS d,
           CAST(SUM(censored) AS BIGINT) AS c
    FROM lifed GROUP BY t
),
steps AS (
    SELECT t, d,
           CAST(SUM(d + c) OVER (
               ORDER BY t DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n
    FROM per_day
),
stepped AS (SELECT t, d, n FROM steps WHERE d > 0),
arr AS (
    SELECT list_sort(list({{'t': t, 'd': d, 'n': n}})) AS a FROM stepped
),
exploded AS (
    SELECT a, a[r.i + 1] AS s, CAST(r.i AS INT) AS i
    FROM arr CROSS JOIN range(0, 100000) r(i)
    WHERE r.i < len(a)
)
SELECT s.t AS t_days, s.n AS n_at_risk, s.d AS deaths,
       round(list_reduce(
           list_prepend(1.0::DOUBLE,
               list_transform(a[1 : i + 1],
                              x -> 1.0 - CAST(x.d AS DOUBLE)
                                   / CAST(x.n AS DOUBLE))),
           (acc, x) -> acc * x
       ), 9) AS s_hat
FROM exploded
ORDER BY t_days
"""


# ---------------------------------------------------------------------------
# Q266 — QUANTILE MAPPING (empirical quantile normalization, the
# batch-effect / score-calibration transform): map supplier account
# balances onto the CUSTOMER balance distribution by percentile — each
# supplier value lands at the customer value occupying the same
# quantile, on a Q=100 percentile grid. mapped(b) is the classic
# empirical quantile function: the SMALLEST customer value whose
# cumulative count covers fraction b/Q — evaluated with the
# cross-multiplied integer test cum_c·Q ≥ b·n_c, never a float CDF
# compare. Both CDFs are value-counts (distinct-value-bounded, the q45
# lesson); the percentile spine is Q rows broadcast against the
# customer CDF, so the whole mapping is linear in distinct values.
# ---------------------------------------------------------------------------

_QMAP_Q = 100


def q266_quantile_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    sv = s.groupBy(F.col("s_acctbal").alias("v")).agg(
        F.count("*").alias("cnt")
    )
    w_s = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    s_tot = sv.groupBy().agg(F.sum("cnt").alias("n_s"))
    s_cdf = (
        sv.withColumn("before", F.coalesce(F.sum("cnt").over(w_s), F.lit(0)))
        .crossJoin(F.broadcast(s_tot))
        .select(
            "v",
            F.expr(f"CAST({_QMAP_Q} * before DIV n_s AS INT)").alias(
                "bucket"
            ),
        )
    )
    cv = c.groupBy(F.col("c_acctbal").alias("cval")).agg(
        F.count("*").alias("cnt")
    )
    w_c = Window.orderBy("cval").rowsBetween(
        Window.unboundedPreceding, 0
    )
    c_tot = cv.groupBy().agg(F.sum("cnt").alias("n_c"))
    c_cdf = (
        cv.withColumn("cum", F.sum("cnt").over(w_c))
        .crossJoin(F.broadcast(c_tot))
        .select("cval", "cum", "n_c")
    )
    spine = spark.range(_QMAP_Q).select(F.col("id").cast("int").alias("bucket"))
    mapping = (
        c_cdf.join(
            F.broadcast(spine),
            F.col("cum") * _QMAP_Q >= F.col("bucket") * F.col("n_c"),
        )
        .groupBy("bucket")
        .agg(F.min("cval").alias("mapped"))
    )
    return (
        s_cdf.join(F.broadcast(mapping), "bucket")
        .select(
            F.col("v").alias("supplier_balance"),
            "bucket",
            F.col("mapped").alias("mapped_customer_balance"),
        )
        .orderBy("supplier_balance")
    )


Q266_SQL = f"""
WITH sv AS (
    SELECT s_acctbal AS v, COUNT(*) AS cnt FROM supplier GROUP BY 1
),
s_tot AS (SELECT SUM(cnt) AS n_s FROM sv),
s_cdf AS (
    SELECT v,
           CAST({_QMAP_Q} * COALESCE(SUM(cnt) OVER (
               ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING), 0) // n_s AS INT) AS bucket
    FROM sv CROSS JOIN s_tot
),
cv AS (
    SELECT c_acctbal AS cval, COUNT(*) AS cnt FROM customer GROUP BY 1
),
c_tot AS (SELECT SUM(cnt) AS n_c FROM cv),
c_cdf AS (
    SELECT cval,
           SUM(cnt) OVER (
               ORDER BY cval ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS cum,
           n_c
    FROM cv CROSS JOIN c_tot
),
spine AS (SELECT CAST(r.i AS INT) AS bucket FROM range(0, {_QMAP_Q}) r(i)),
mapping AS (
    SELECT bucket, MIN(cval) AS mapped
    FROM c_cdf JOIN spine ON cum * {_QMAP_Q} >= bucket * n_c
    GROUP BY bucket
)
SELECT s_cdf.v AS supplier_balance, s_cdf.bucket,
       mapping.mapped AS mapped_customer_balance
FROM s_cdf JOIN mapping USING (bucket)
ORDER BY supplier_balance
"""


# ---------------------------------------------------------------------------
# Q242 — Time-to-convert by cohort: users cohorted by the week of
# their FIRST view; conversion = their first purchase AFTER that view.
# Reports per cohort: users, converters, conversion ppm (integral),
# and the exact median / p90 of the view→purchase latency in seconds
# (value-counts percentile form on the per-user latency aggregate).
# First-event extremes are keyed MIN aggregates — no per-user sort.
# ---------------------------------------------------------------------------


def q242_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    firsts = (
        ev.where(F.col("event_type").isin("view", "purchase"))
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(
                    F.col("event_type") == "view", F.unix_micros(F.col("ts"))
                )
            ).alias("first_view_us"),
            F.min(
                F.when(
                    F.col("event_type") == "purchase",
                    F.unix_micros(F.col("ts")),
                )
            ).alias("first_buy_us"),
        )
        .where(F.col("first_view_us").isNotNull())
        .select(
            "user_id",
            F.date_trunc(
                "week", F.timestamp_micros(F.col("first_view_us"))
            )
            .cast("date")
            .alias("cohort"),
            F.when(
                F.col("first_buy_us") > F.col("first_view_us"),
                (
                    (F.col("first_buy_us") - F.col("first_view_us"))
                    / F.lit(1_000_000)
                ).cast("long"),
            ).alias("latency_s"),
        )
    )
    converted = firsts.where(F.col("latency_s").isNotNull())
    pct = exact_grouped_percentiles(
        converted,
        "cohort",
        "latency_s",
        {"median_s": 0.5, "p90_s": 0.9},
    ).select("cohort", "median_s", "p90_s")
    counts = firsts.groupBy("cohort").agg(
        F.count("*").cast("long").alias("n_users"),
        F.count("latency_s").cast("long").alias("n_converted"),
    )
    return (
        counts.join(F.broadcast(pct), "cohort", "left")
        .select(
            "cohort",
            "n_users",
            "n_converted",
            F.expr("n_converted * 1000000 DIV n_users").cast("long").alias(
                "conversion_ppm"
            ),
            "median_s",
            "p90_s",
        )
        .orderBy("cohort")
    )


Q242_SQL = """
WITH firsts AS (
    SELECT user_id,
           MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
               AS first_view_us,
           MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
               AS first_buy_us
    FROM events WHERE event_type IN ('view', 'purchase')
    GROUP BY user_id
    HAVING MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
           IS NOT NULL
),
cohorted AS (
    SELECT user_id,
           CAST(date_trunc('week', make_timestamp(first_view_us)) AS DATE)
               AS cohort,
           CASE WHEN first_buy_us > first_view_us
                THEN CAST((first_buy_us - first_view_us) // 1000000 AS BIGINT)
           END AS latency_s
    FROM firsts
)
SELECT cohort,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(COUNT(latency_s) AS BIGINT) AS n_converted,
       CAST(COUNT(latency_s) * 1000000 // COUNT(*) AS BIGINT)
           AS conversion_ppm,
       quantile_cont(latency_s, 0.5) AS median_s,
       quantile_cont(latency_s, 0.9) AS p90_s
FROM cohorted
GROUP BY cohort
ORDER BY cohort
"""


# ---------------------------------------------------------------------------
# Q154 — exponentially time-decayed moving average of daily revenue
# (EWMA with a 1-day half-life, 16-day horizon): the smoothing step of
# every monitoring/forecasting pipeline, made EXACT and cross-engine.
# True recursive EWMA needs (1-α)^t weights whose floats drift; with
# α = 1/2 every weight is a power of two, and truncating below 2^-15
# (the standard FIR approximation — the dropped tail is < 0.003% of the
# mass) makes the whole thing integer arithmetic: per-day revenue is an
# exact DECIMAL(38,2) sum, each contribution multiplies by the INTEGER
# weight 2^(15-gap), and the final EWMA is ONE double division of two
# exactly-representable integers (the lm.py determinism contract).
#
# Scale shape: the expensive input is reduced FIRST by a keyed daily
# agg (map-side combined); the decay is then an equi-join — each day
# explodes into its 16 future target days (date_add), joined back on
# (group, day) — never a range/window scan over raw rows. Work is
# |groups × days| × 16 regardless of raw row count.
# ---------------------------------------------------------------------------

_EWMA_HORIZON = 16


def q154_ewma_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    h = _EWMA_HORIZON
    base = (
        li.select(
            F.col("l_returnflag"),
            F.to_date("l_shipdate").alias("d"),
            F.col("l_extendedprice").cast("decimal(38,2)").alias("p"),
        )
        .groupBy("l_returnflag", "d")
        .agg(F.sum("p").alias("rev"))
    )
    contrib = base.select(
        "l_returnflag",
        "d",
        "rev",
        F.explode(F.sequence(F.lit(0), F.lit(h - 1))).alias("gap"),
    ).select(
        "l_returnflag",
        F.date_add("d", F.col("gap")).alias("day"),
        "gap",
        "rev",
        F.expr(f"shiftleft(CAST(1 AS BIGINT), {h - 1} - gap)").alias("w"),
    )
    anchor = base.select("l_returnflag", F.col("d").alias("day"))
    return (
        contrib.join(anchor, ["l_returnflag", "day"])
        .groupBy("l_returnflag", "day")
        .agg(
            F.max(F.when(F.col("gap") == 0, F.col("rev")))
            .cast("double")
            .alias("day_revenue"),
            (
                F.sum(F.col("rev") * F.col("w")).cast("double")
                / F.sum("w").cast("double")
            ).alias("ewma_revenue"),
        )
    )


Q154_SQL = f"""
WITH base AS (
    SELECT l_returnflag, CAST(l_shipdate AS DATE) AS d,
           SUM(CAST(l_extendedprice AS DECIMAL(38,2))) AS rev
    FROM lineitem GROUP BY 1, 2
),
contrib AS (
    SELECT l_returnflag, d + CAST(r.g AS INT) AS day, r.g AS gap, rev,
           CAST(1 AS BIGINT) << ({_EWMA_HORIZON} - 1 - CAST(r.g AS INT)) AS w
    FROM base CROSS JOIN range(0, {_EWMA_HORIZON}) r(g)
)
SELECT c.l_returnflag, c.day,
       CAST(MAX(CASE WHEN c.gap = 0 THEN c.rev END) AS DOUBLE)
           AS day_revenue,
       CAST(SUM(c.rev * c.w) AS DOUBLE) / CAST(SUM(c.w) AS DOUBLE)
           AS ewma_revenue
FROM contrib c
JOIN base b ON b.l_returnflag = c.l_returnflag AND b.d = c.day
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Q173 — weekday SEASONALITY index: each weekday's mean daily revenue
# relative to the group's overall mean daily revenue (index > 1 = a
# strong day) — the decomposition-lite profile demand forecasting
# starts from. Two keyed aggs over the bounded daily series + one
# broadcast join; indices are a fixed chain of divisions over
# exact-decimal sums. Weekday numbering pinned to DuckDB's
# Sunday=0..Saturday=6 (Spark's dayofweek is Sunday=1, shifted by 1).
# ---------------------------------------------------------------------------


def q173_weekday_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    daily = (
        li.select(
            "l_returnflag",
            F.to_date("l_shipdate").alias("d"),
            F.col("l_extendedprice").cast("decimal(38,2)").alias("p"),
        )
        .groupBy("l_returnflag", "d")
        .agg(F.sum("p").alias("rev"))
        .select(
            "l_returnflag",
            (F.dayofweek("d") - 1).alias("weekday"),
            "rev",
        )
    )
    per_day = daily.groupBy("l_returnflag", "weekday").agg(
        F.count("*").alias("n_days"),
        F.sum("rev").cast("double").alias("s"),
    )
    overall = daily.groupBy("l_returnflag").agg(
        F.count("*").alias("n_all"),
        F.sum("rev").cast("double").alias("s_all"),
    )
    idx = (
        (F.col("s") / F.col("n_days"))
        / (F.col("s_all") / F.col("n_all"))
    )
    return per_day.join(F.broadcast(overall), "l_returnflag").select(
        "l_returnflag",
        "weekday",
        "n_days",
        F.round(F.col("s") / F.col("n_days"), 9).alias("mean_revenue"),
        F.round(idx, 9).alias("seasonality_index"),
    )


Q173_SQL = """
WITH daily AS (
    SELECT l_returnflag,
           dayofweek(CAST(l_shipdate AS DATE)) AS weekday,
           SUM(CAST(l_extendedprice AS DECIMAL(38,2))) AS rev
    FROM lineitem GROUP BY 1, CAST(l_shipdate AS DATE), 2
),
per_day AS (
    SELECT l_returnflag, weekday, COUNT(*) AS n_days,
           CAST(SUM(rev) AS DOUBLE) AS s
    FROM daily GROUP BY 1, 2
),
overall AS (
    SELECT l_returnflag, COUNT(*) AS n_all, CAST(SUM(rev) AS DOUBLE) AS s_all
    FROM daily GROUP BY 1
)
SELECT p.l_returnflag, p.weekday, p.n_days,
       round(p.s / p.n_days, 9) AS mean_revenue,
       round((p.s / p.n_days) / (o.s_all / o.n_all), 9)
           AS seasonality_index
FROM per_day p JOIN overall o USING (l_returnflag)
"""


STATS_QUERIES = {
    "q154_ewma_revenue": q154_ewma_revenue,
    "q173_weekday_seasonality": q173_weekday_seasonality,
    "q242_time_to_convert": q242_time_to_convert,
    "q219_markov_transitions": q219_markov_transitions,
    "q231_var_cvar": q231_var_cvar,
    "q237_weighted_median": q237_weighted_median,
    "q238_decile_lift": q238_decile_lift,
    "q245_ks_drift": q245_ks_drift,
    "q246_mann_whitney": q246_mann_whitney,
    "q247_histogram_intersection": q247_histogram_intersection,
    "q248_control_chart": q248_control_chart,
    "q256_km_survival": q256_km_survival,
    "q266_quantile_mapping": q266_quantile_mapping,
}

STATS_ORACLES = {
    "q154_ewma_revenue": Q154_SQL,
    "q173_weekday_seasonality": Q173_SQL,
    "q242_time_to_convert": Q242_SQL,
    "q219_markov_transitions": Q219_SQL,
    "q231_var_cvar": Q231_SQL,
    "q237_weighted_median": Q237_SQL,
    "q238_decile_lift": Q238_SQL,
    "q245_ks_drift": Q245_SQL,
    "q246_mann_whitney": Q246_SQL,
    "q247_histogram_intersection": Q247_SQL,
    "q248_control_chart": Q248_SQL,
    "q256_km_survival": Q256_SQL,
    "q266_quantile_mapping": Q266_SQL,
}
