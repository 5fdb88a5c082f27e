"""[EXT] Business-insight / warehouse-ops query family (q216-q224).

Classic analytics shapes the reference's dashboard users would reach for
next (reference scope: sql/03_analytics_queries.sql has the top-N /
trend / z-score trio; these are the standard follow-ons), each built the
distributed way and each paired with a DuckDB oracle of identical
semantics and column names:

- q216 market-basket association rules with apriori pruning
- q217 RFM customer segmentation (ntile quartiles)
- q218 exact largest-remainder allocation (proration contract)
- q219 Markov next-event transition matrix
- q220 interval-sweep max concurrency gauge
- q221 blocked edit-distance near-duplicate names
- q222 exact distinct-user rollup via 32-bit bitmap words
- q223 small-file compaction planner (cumulative-sum bucketing)
- q224 revenue-pacing drawdown vs the uniform run-rate

Determinism contracts follow the house rules: integer/decimal math in
every accumulation, double division only of exactly-agreed integers or
decimals, unique tiebreakers under every window order and LIMIT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from ..functions.localframe import local_frame

from ..functions.numeric import exact_grouped_percentiles
from ..functions.partitioning import ensure_min_parallelism
from ..functions.text import shingles_from_tokens, tokens
from ..sources.tables import load_table
from .stats import SPC_WINDOW  # shared by q250's composition of the q248 chart

# ---------------------------------------------------------------------------
# Q216 — Market-basket association rules over order baskets.
#
# Apriori-style two-stage plan: (1) item supports with a min-support
# prune, (2) pair generation ONLY among surviving frequent items — the
# monotonicity lemma (a pair's support <= either item's support)
# guarantees no pair with support >= PAIR_MIN is lost when items below
# ITEM_MIN are dropped, because ITEM_MIN <= PAIR_MIN. At 100 TB the
# prune is what keeps the self-join candidate count proportional to
# (frequent items per basket)^2 instead of (all items per basket)^2.
#
# confidence/lift are double divisions of exact BIGINT counts — both
# engines divide the same integers, so results are bit-identical.
# ---------------------------------------------------------------------------

ITEM_MIN_SUPPORT = 3
PAIR_MIN_SUPPORT = 3


def q216_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    n_orders = items.select("ok").distinct().groupBy().agg(
        F.count("*").cast("long").alias("n_orders")
    )
    freq = (
        items.groupBy("pk")
        .agg(F.count("*").cast("long").alias("supp"))
        .where(F.col("supp") >= ITEM_MIN_SUPPORT)
    )
    # Keep only frequent items inside each basket, then pair with pk < pk2.
    fitems = items.join(F.broadcast(freq), "pk").select("ok", "pk", "supp")
    pairs = (
        fitems.alias("a")
        .join(
            fitems.alias("b"),
            (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")),
        )
        .groupBy(
            F.col("a.pk").alias("part_a"),
            F.col("b.pk").alias("part_b"),
            F.col("a.supp").alias("n_a"),
            F.col("b.supp").alias("n_b"),
        )
        .agg(F.count("*").cast("long").alias("n_pair"))
        .where(F.col("n_pair") >= PAIR_MIN_SUPPORT)
    )
    return (
        pairs.crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "n_pair",
            "n_a",
            "n_b",
            (F.col("n_pair").cast("double") / F.col("n_a").cast("double")).alias(
                "confidence_ab"
            ),
            (
                (F.col("n_pair") * F.col("n_orders")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "part_a", "part_b")
    )


Q216_SQL = f"""
WITH items AS (
    SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
),
n AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM items),
freq AS (
    SELECT pk, CAST(COUNT(*) AS BIGINT) AS supp FROM items
    GROUP BY pk HAVING COUNT(*) >= {ITEM_MIN_SUPPORT}
),
fitems AS (SELECT i.ok, i.pk, f.supp FROM items i JOIN freq f USING (pk)),
pairs AS (
    SELECT a.pk AS part_a, b.pk AS part_b, a.supp AS n_a, b.supp AS n_b,
           CAST(COUNT(*) AS BIGINT) AS n_pair
    FROM fitems a JOIN fitems b ON a.ok = b.ok AND a.pk < b.pk
    GROUP BY 1, 2, 3, 4 HAVING COUNT(*) >= {PAIR_MIN_SUPPORT}
)
SELECT part_a, part_b, n_pair, n_a, n_b,
       CAST(n_pair AS DOUBLE) / CAST(n_a AS DOUBLE) AS confidence_ab,
       CAST(n_pair * n_orders AS DOUBLE) / CAST(n_a * n_b AS DOUBLE) AS lift
FROM pairs CROSS JOIN n
ORDER BY lift DESC, part_a, part_b
"""


# ---------------------------------------------------------------------------
# Q217 — RFM segmentation: quartile-score every customer on Recency /
# Frequency / Monetary and report the segment distribution.
#
# The global anchor date is a 1-row aggregate broadcast by cross join
# (house z-score pattern — never a global window). Each NTILE order
# carries c_custkey as the unique tiebreaker, so bucket boundaries are
# identical across engines (both implement standard NTILE: larger
# buckets first). Monetary sums run through the exact-decimal recipe.
# ---------------------------------------------------------------------------


def q217_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    anchor = o.groupBy().agg(F.max(F.to_date("o_orderdate")).alias("anchor"))
    per_cust = (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.to_date("o_orderdate")).alias("last_order"),
            F.count("*").cast("long").alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("monetary_d"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "o_custkey",
            F.datediff("anchor", "last_order").cast("long").alias("recency_days"),
            "frequency",
            "monetary_d",
        )
    )
    scored = per_cust.select(
        "o_custkey",
        "monetary_d",
        F.ntile(4)
        .over(Window.orderBy(F.col("recency_days").asc(), F.col("o_custkey")))
        .alias("r_score"),
        F.ntile(4)
        .over(Window.orderBy(F.col("frequency").desc(), F.col("o_custkey")))
        .alias("f_score"),
        F.ntile(4)
        .over(Window.orderBy(F.col("monetary_d").desc(), F.col("o_custkey")))
        .alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.sum("monetary_d").cast("double").alias("total_monetary"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


Q217_SQL = """
WITH per_cust AS (
    SELECT o_custkey,
           CAST(date_diff('day', MAX(CAST(o_orderdate AS DATE)),
                (SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders))
                AS BIGINT) AS recency_days,
           CAST(COUNT(*) AS BIGINT) AS frequency,
           SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS monetary_d
    FROM orders GROUP BY o_custkey
),
scored AS (
    SELECT o_custkey, monetary_d,
           NTILE(4) OVER (ORDER BY recency_days ASC, o_custkey) AS r_score,
           NTILE(4) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
           NTILE(4) OVER (ORDER BY monetary_d DESC, o_custkey) AS m_score
    FROM per_cust
)
SELECT r_score, f_score, m_score,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(monetary_d) AS DOUBLE) AS total_monetary
FROM scored
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Q218 — Exact largest-remainder allocation: prorate a per-order rebate
# budget across its line items proportionally to extended price, in
# integer cents, such that the allocations sum EXACTLY to the budget
# (the invariant every naive `ROUND(budget * share)` implementation
# violates). The oracle returns every line's allocation, so the
# hash-match proves the contract line-by-line, not just in aggregate.
#
# All math is int64: weights/budgets enter as FLOOR(x + 0.5) cents
# (identical on both engines), base shares are integer division, the
# leftover units go to the largest remainders (tiebreak l_linenumber).
# Bounds: budget <= ~5e5, weight <= ~1e9 => budget*weight <= ~5e14,
# comfortably inside int64. One shuffle: all three windows share the
# l_orderkey partitioning.
# ---------------------------------------------------------------------------


def q218_discount_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # Budget: 1% of the order total, in integer cents (== totalprice
    # rounded to whole dollars, expressed in cents).
    budgets = o.select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") + F.lit(0.5)).cast("long").alias("budget_c"),
    )
    lines = li.select(
        "l_orderkey",
        "l_linenumber",
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("weight_c"),
    ).join(budgets, F.col("l_orderkey") == F.col("o_orderkey"))
    # The corpus does NOT guarantee (l_orderkey, l_linenumber) unique —
    # duplicate line ids with different weights exist; the operator's
    # weight-joined tiebreak keeps the output MULTISET deterministic.
    # Bound: budget <= ~5e5, weight <= ~1e9 => budget·weight <= ~5e14.
    from ..operators.allocation import largest_remainder

    return (
        largest_remainder(
            lines,
            ["l_orderkey"],
            "weight_c",
            "budget_c",
            ["l_linenumber"],
            out_col="alloc_c",
        )
        .select("l_orderkey", "l_linenumber", "alloc_c")
        .orderBy("l_orderkey", "l_linenumber")
    )


Q218_SQL = """
WITH budgets AS (
    SELECT o_orderkey,
           CAST(FLOOR(o_totalprice + 0.5) AS BIGINT) AS budget_c
    FROM orders
),
lines AS (
    SELECT l_orderkey, l_linenumber, budget_c,
           CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS weight_c
    FROM lineitem JOIN budgets ON l_orderkey = o_orderkey
),
with_tot AS (
    SELECT *, SUM(weight_c) OVER (PARTITION BY l_orderkey) AS tot_w
    FROM lines
),
shares AS (
    SELECT l_orderkey, l_linenumber, budget_c, weight_c,
           (budget_c * weight_c) // tot_w AS base_c,
           (budget_c * weight_c) % tot_w AS rem
    FROM with_tot
)
SELECT l_orderkey, l_linenumber,
       CAST(base_c + CASE WHEN ROW_NUMBER() OVER (
                PARTITION BY l_orderkey
                ORDER BY rem DESC, l_linenumber, weight_c
            ) <= budget_c - SUM(base_c) OVER (PARTITION BY l_orderkey)
            THEN 1 ELSE 0 END AS BIGINT) AS alloc_c
FROM shares
ORDER BY l_orderkey, l_linenumber
"""


# ---------------------------------------------------------------------------
# Q220 — Max-concurrency gauge by interval sweep: each event opens a
# half-open activity interval [ts, ts + HOLD_S), clipped at its day
# boundary; the answer is the peak number of simultaneously-open
# intervals per (event_type, day). The sweep is the classic +1/-1
# delta stream with a running sum — but partitioned by (event_type,
# day), never a global window, so partitions stay bounded at 100 TB.
#
# Tie order at equal timestamps is pinned (delta ASC puts closes before
# opens — half-open semantics; event_id makes the order total), so the
# running sum is row-identical across engines.
# ---------------------------------------------------------------------------

HOLD_S = 300


def q220_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sweep import max_concurrency

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.to_date("ts").alias("day"),
        F.unix_micros(F.col("ts")).alias("us"),
        F.unix_micros(F.date_add(F.to_date("ts"), 1).cast("timestamp")).alias(
            "day_end_us"
        ),
    )
    intervals = ev.select(
        "event_type",
        "day",
        F.col("us").alias("t_start"),
        F.least(F.col("us") + F.lit(HOLD_S * 1_000_000), F.col("day_end_us"))
        .alias("t_end"),
        "event_id",
    )
    return max_concurrency(
        intervals, ["event_type", "day"], "t_start", "t_end", "event_id"
    ).orderBy("event_type", "day")


Q220_SQL = f"""
WITH ev AS (
    SELECT event_id, event_type, CAST(ts AS DATE) AS day,
           epoch_us(ts) AS us,
           epoch_us(CAST(CAST(ts AS DATE) + INTERVAL 1 DAY AS TIMESTAMP))
               AS day_end_us
    FROM events
),
deltas AS (
    SELECT event_type, day, us AS t, 1 AS delta, event_id FROM ev
    UNION ALL
    SELECT event_type, day,
           LEAST(us + {HOLD_S} * 1000000, day_end_us) AS t, -1 AS delta,
           event_id
    FROM ev
),
swept AS (
    SELECT event_type, day,
           SUM(delta) OVER (
               PARTITION BY event_type, day ORDER BY t, delta, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS open_now
    FROM deltas
)
SELECT event_type, day,
       CAST(MAX(open_now) AS BIGINT) AS max_concurrent,
       CAST(COUNT(*) / 2 AS BIGINT) AS n_events
FROM swept
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Q221 — Blocked edit-distance near-duplicate part names: candidate
# pairs are generated ONLY within a block (the name's last word), never
# all-pairs — the fuzzy-join discipline of plans/warehouse.py's q92
# applied to Levenshtein. Both engines implement the classic
# Wagner-Fischer distance, so the scores agree exactly.
#
# Distinct names are deduped BEFORE pairing (the |names|^2 term shrinks
# to |distinct names in block|^2), and each surviving name pair is
# re-joined to its part-count so the report says how many rows each
# near-dup class covers.
# ---------------------------------------------------------------------------

EDIT_MAX = 4


def q221_name_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    names = (
        p.groupBy(F.col("p_name").alias("name"))
        .agg(F.count("*").cast("long").alias("n_parts"))
        .select(
            "name",
            "n_parts",
            F.element_at(F.split(F.col("name"), " "), -1).alias("block"),
        )
    )
    pairs = (
        names.alias("a")
        .join(
            names.alias("b"),
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.name") < F.col("b.name")),
        )
        .select(
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            F.col("a.n_parts").alias("parts_a"),
            F.col("b.n_parts").alias("parts_b"),
            F.levenshtein(F.col("a.name"), F.col("b.name")).cast("long").alias(
                "edit_dist"
            ),
        )
        .where(F.col("edit_dist") <= EDIT_MAX)
    )
    return pairs.orderBy("edit_dist", "name_a", "name_b")


Q221_SQL = f"""
WITH names AS (
    SELECT p_name AS name, CAST(COUNT(*) AS BIGINT) AS n_parts,
           split_part(p_name, ' ', -1) AS block
    FROM part GROUP BY p_name
)
SELECT a.name AS name_a, b.name AS name_b,
       a.n_parts AS parts_a, b.n_parts AS parts_b,
       CAST(levenshtein(a.name, b.name) AS BIGINT) AS edit_dist
FROM names a JOIN names b ON a.block = b.block AND a.name < b.name
WHERE levenshtein(a.name, b.name) <= {EDIT_MAX}
ORDER BY edit_dist, name_a, name_b
"""


# ---------------------------------------------------------------------------
# Q222 — Exact distinct users via bitmap words: users are packed into
# 32-bit words (word = user_id DIV 32, bit = pmod(user_id, 32) — exact
# integer arithmetic, never double-divide-then-truncate, so negative
# ids and ids past 2^53 still bucket correctly), daily
# per-word bitmaps are OR-aggregated, and weekly distincts come from
# OR-ing the DAILY word bitmaps — the raw events are touched exactly
# once. This is the exact-bitmap answer to "COUNT(DISTINCT) doesn't
# roll up": the word bitmaps are an additive, mergeable summary
# (bounded at |users|/32 words per period) that re-aggregates to any
# coarser grain with no rescan — unlike approx sketches, with zero
# error. The DuckDB oracle computes the SAME numbers via plain
# COUNT(DISTINCT), so the hash-match proves bitmap exactness.
#
# Bits stay in the low 32 of an int64 (1 << (uid % 32)), so no sign
# games; bit_count is JVM-side on both engines. Assumes NON-NEGATIVE
# ids (Spark's % takes the dividend's sign) — true for every id column
# in the corpus; a general deployment would pre-shift by min(id).
# ---------------------------------------------------------------------------


def q222_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily_words = (
        ev.select(
            F.date_trunc("week", F.col("ts")).cast("date").alias("week"),
            F.to_date("ts").alias("day"),
            F.expr("user_id DIV 32").alias("word"),
            F.expr("shiftleft(1L, CAST(pmod(user_id, 32) AS INT))").alias("bit"),
        )
        .groupBy("week", "day", "word")
        .agg(F.bit_or("bit").alias("day_mask"))
    )
    daily = daily_words.groupBy("week", "day").agg(
        F.sum(F.bit_count("day_mask")).cast("long").alias("day_users")
    )
    weekly = (
        daily_words.groupBy("week", "word")
        .agg(F.bit_or("day_mask").alias("week_mask"))
        .groupBy("week")
        .agg(F.sum(F.bit_count("week_mask")).cast("long").alias("week_users"))
    )
    return (
        daily.groupBy("week")
        .agg(
            F.count("*").cast("long").alias("n_days"),
            F.sum("day_users").cast("long").alias("sum_daily_users"),
        )
        .join(weekly, "week")
        .select("week", "n_days", "week_users", "sum_daily_users")
        .orderBy("week")
    )


Q222_SQL = """
WITH daily AS (
    SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
           CAST(ts AS DATE) AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS day_users
    FROM events GROUP BY 1, 2
),
weekly AS (
    SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS week_users
    FROM events GROUP BY 1
)
SELECT d.week, CAST(COUNT(*) AS BIGINT) AS n_days, w.week_users,
       CAST(SUM(d.day_users) AS BIGINT) AS sum_daily_users
FROM daily d JOIN weekly w ON d.week = w.week
GROUP BY d.week, w.week_users
ORDER BY d.week
"""


# ---------------------------------------------------------------------------
# Q223 — Small-file compaction planner: group each partition's files
# into ~TARGET-byte output buckets by cumulative-sum bucketing (the
# greedy sequential coalesce Spark's own file compaction performs).
# Files are walked in a stable order (doc_id); a file lands in bucket
# floor(bytes-before-it / TARGET). One window per partition — the
# planner itself is a metadata-sized job even when the data is 100 TB,
# because it reads the MANIFEST (here: the documents table standing in
# for a file listing: doc_id=file, n_chars=bytes, source=partition).
# ---------------------------------------------------------------------------

COMPACT_TARGET = 4000


def q223_compaction_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    planned = d.select(
        "source",
        "doc_id",
        "n_chars",
        (
            F.coalesce(F.sum("n_chars").over(w), F.lit(0))
            / F.lit(COMPACT_TARGET)
        )
        .cast("long")
        .alias("bucket"),
    )
    return (
        planned.groupBy("source", "bucket")
        .agg(
            F.count("*").cast("long").alias("n_files"),
            F.sum("n_chars").cast("long").alias("total_bytes"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("source", "bucket")
    )


Q223_SQL = f"""
WITH planned AS (
    SELECT source, doc_id, n_chars,
           CAST(COALESCE(SUM(n_chars) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) // {COMPACT_TARGET} AS BIGINT) AS bucket
    FROM documents
)
SELECT source, bucket, CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(n_chars) AS BIGINT) AS total_bytes,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM planned
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Q224 — Revenue-pacing drawdown: for each supplier nation, how far
# behind the uniform run-rate its cumulative daily revenue ever falls.
# The demeaned series is kept EXACT by scaling instead of dividing:
#     X_t = n_days * cum_rev_t - t * total_rev       (int64, exact)
# (X is the centered cumulative sum times n_days, so running-max(X) - X
# is the drawdown times n_days; a plain cumulative revenue never draws
# down because revenue is nonnegative.) Revenue enters as whole dollars
# (FLOOR(x + 0.5) — identical on both engines), keeping every X within
# 2^53 at bench scale so even the final int->double casts are exact;
# at warehouse scale the same plan lifts to DECIMAL(38,0) unchanged.
# The only double math is one division of exactly-agreed integers.
#
# Per-nation windows over the (nation x day) AGGREGATE (<= ~2.5k rows
# per nation), not over lineitem; dims broadcast.
# ---------------------------------------------------------------------------


def q224_pacing_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
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
                + F.lit(0.5)
            )
            .cast("long")
            .alias("rev_usd"),
        )
        .groupBy("n_name", "day")
        .agg(F.sum("rev_usd").alias("rev_usd"))
    )
    wn = Window.partitionBy("n_name")
    wcum = (
        Window.partitionBy("n_name")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    paced = daily.select(
        "n_name",
        "day",
        (
            F.count("*").over(wn) * F.sum("rev_usd").over(wcum)
            - F.row_number().over(Window.partitionBy("n_name").orderBy("day"))
            * F.sum("rev_usd").over(wn)
        ).alias("x"),
        F.count("*").over(wn).cast("long").alias("n_days"),
    )
    dd = paced.select(
        "n_name",
        "day",
        "n_days",
        (F.max("x").over(wcum) - F.col("x")).alias("dd_x"),
    )
    wpick = Window.partitionBy("n_name").orderBy(
        F.col("dd_x").desc(), F.col("day")
    )
    return (
        dd.withColumn("rn", F.row_number().over(wpick))
        .where(F.col("rn") == 1)
        .select(
            "n_name",
            (F.col("dd_x").cast("double") / F.col("n_days").cast("double")).alias(
                "max_drawdown"
            ),
            F.col("day").alias("dd_date"),
        )
        .orderBy("n_name")
    )


Q224_SQL = """
WITH daily AS (
    SELECT n_name, CAST(l_shipdate AS DATE) AS day,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) + 0.5)
                         AS BIGINT)) AS BIGINT) AS rev_usd
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY 1, 2
),
paced AS (
    SELECT n_name, day,
           CAST(COUNT(*) OVER (PARTITION BY n_name)
               * SUM(rev_usd) OVER (
                   PARTITION BY n_name ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY day)
               * SUM(rev_usd) OVER (PARTITION BY n_name) AS BIGINT) AS x,
           CAST(COUNT(*) OVER (PARTITION BY n_name) AS BIGINT) AS n_days
    FROM daily
),
dd AS (
    SELECT n_name, day, n_days,
           MAX(x) OVER (
               PARTITION BY n_name ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - x AS dd_x
    FROM paced
)
SELECT n_name,
       CAST(dd_x AS DOUBLE) / CAST(n_days AS DOUBLE) AS max_drawdown,
       day AS dd_date
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY n_name ORDER BY dd_x DESC, day) AS rn
    FROM dd
)
WHERE rn = 1
ORDER BY n_name
"""


# ---------------------------------------------------------------------------
# Q225 — l-diversity audit: the homogeneity-attack complement of q208's
# k-anonymity. Same customer table, but the quasi-identifier set drops
# c_mktsegment — that column becomes the SENSITIVE attribute: a class
# can be k-anonymous yet leak the segment outright if every member
# shares one. Reports per class: size k, distinct sensitive values l,
# and the modal value's share (ppm, integral division — the direct
# re-identification confidence of the homogeneity attack).
# ---------------------------------------------------------------------------

L_DIVERSE_MIN = 3


def q225_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    per_value = (
        cust.select(
            "c_nationkey",
            F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("bal_bucket"),
            "c_mktsegment",
        )
        .groupBy("c_nationkey", "bal_bucket", "c_mktsegment")
        .agg(F.count("*").cast("long").alias("n"))
    )
    return (
        per_value.groupBy("c_nationkey", "bal_bucket")
        .agg(
            F.sum("n").cast("long").alias("k"),
            F.count("*").cast("long").alias("l_distinct"),
            F.max("n").cast("long").alias("modal_n"),
        )
        .select(
            "c_nationkey",
            "bal_bucket",
            "k",
            "l_distinct",
            F.expr("modal_n * 1000000 DIV k").cast("long").alias("modal_ppm"),
            (F.col("l_distinct") >= L_DIVERSE_MIN).alias("diverse"),
        )
        .orderBy("c_nationkey", "bal_bucket")
    )


Q225_SQL = f"""
WITH per_value AS (
    SELECT c_nationkey,
           CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
           c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
    FROM customer GROUP BY 1, 2, 3
)
SELECT c_nationkey, bal_bucket,
       CAST(SUM(n) AS BIGINT) AS k,
       CAST(COUNT(*) AS BIGINT) AS l_distinct,
       CAST(MAX(n) * 1000000 // SUM(n) AS BIGINT) AS modal_ppm,
       COUNT(*) >= {L_DIVERSE_MIN} AS diverse
FROM per_value
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Q226 — Cohort LTV curves: customers cohorted by first-order month,
# cumulative revenue tracked by cohort age in months. Months are pure
# integer arithmetic (year*12 + month-1) — no months_between floats.
# Revenue stays DECIMAL through the cumulative window; the only double
# math is the final LTV division by an exact cohort size. Keyed aggs +
# one window over the (cohort x age) grid, never over orders.
# ---------------------------------------------------------------------------


def q226_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        "o_custkey",
        (
            F.year(F.col("o_orderdate")) * 12
            + F.month(F.col("o_orderdate"))
            - 1
        ).alias("month_m"),
        F.col("o_totalprice").cast("decimal(38,6)").alias("priced"),
    )
    wcust = Window.partitionBy("o_custkey")
    aged = base.select(
        "o_custkey",
        F.min("month_m").over(wcust).alias("cohort_m"),
        (F.col("month_m") - F.min("month_m").over(wcust)).alias("age"),
        "priced",
    )
    sizes = (
        aged.select("o_custkey", "cohort_m")
        .distinct()
        .groupBy("cohort_m")
        .agg(F.count("*").cast("long").alias("n_customers"))
    )
    monthly = aged.groupBy("cohort_m", "age").agg(
        F.sum("priced").alias("revd"),
        F.count("*").cast("long").alias("n_orders"),
    )
    wage = (
        Window.partitionBy("cohort_m")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        monthly.select(
            "cohort_m",
            "age",
            "n_orders",
            F.sum("revd").over(wage).alias("cumd"),
        )
        .join(F.broadcast(sizes), "cohort_m")
        .select(
            F.format_string(
                "%04d-%02d",
                F.expr("cohort_m DIV 12"),
                (F.col("cohort_m") % 12 + 1).cast("int"),
            ).alias("cohort"),
            "age",
            "n_customers",
            "n_orders",
            F.col("cumd").cast("double").alias("cum_revenue"),
            (F.col("cumd").cast("double") / F.col("n_customers").cast("double")).alias(
                "ltv"
            ),
        )
        .orderBy("cohort", "age")
    )


Q226_SQL = """
WITH base AS (
    SELECT o_custkey,
           CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)
               AS month_m,
           CAST(o_totalprice AS DECIMAL(38,6)) AS priced
    FROM orders
),
aged AS (
    SELECT o_custkey,
           MIN(month_m) OVER (PARTITION BY o_custkey) AS cohort_m,
           month_m - MIN(month_m) OVER (PARTITION BY o_custkey) AS age,
           priced
    FROM base
),
sizes AS (
    SELECT cohort_m, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM aged GROUP BY 1
),
monthly AS (
    SELECT cohort_m, age, SUM(priced) AS revd,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM aged GROUP BY 1, 2
)
SELECT printf('%04d-%02d', CAST(m.cohort_m // 12 AS INTEGER),
              CAST(m.cohort_m % 12 + 1 AS INTEGER)) AS cohort,
       m.age, s.n_customers, m.n_orders,
       CAST(SUM(m.revd) OVER (
           PARTITION BY m.cohort_m ORDER BY m.age
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS cum_revenue,
       CAST(SUM(m.revd) OVER (
           PARTITION BY m.cohort_m ORDER BY m.age
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           / CAST(s.n_customers AS DOUBLE) AS ltv
FROM monthly m JOIN sizes s ON m.cohort_m = s.cohort_m
ORDER BY cohort, age
"""


# ---------------------------------------------------------------------------
# Q227 — Moving-average crossover signals (golden/death cross): 7-row
# vs 28-row moving averages of each nation's daily revenue, emitting
# the days where the short average crosses the long one. The crossing
# test never divides: ma7 > ma28  ⟺  sum7*n28 > sum28*n7, compared in
# exact int64 cents — the whole signal pipeline is integer, so the
# oracle matches bit-for-bit with no float discipline needed at all.
# Warmup rows (first 27 days) are excluded so both windows are full.
# ---------------------------------------------------------------------------

MA_SHORT = 7
MA_LONG = 28


def q227_ma_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    ws = (
        Window.partitionBy("n_name")
        .orderBy("day")
        .rowsBetween(-(MA_SHORT - 1), 0)
    )
    wl = (
        Window.partitionBy("n_name")
        .orderBy("day")
        .rowsBetween(-(MA_LONG - 1), 0)
    )
    wd = Window.partitionBy("n_name").orderBy("day")
    mas = daily.select(
        "n_name",
        "day",
        F.sum("rev_c").over(ws).alias("sum_s"),
        F.count("*").over(ws).alias("n_s"),
        F.sum("rev_c").over(wl).alias("sum_l"),
        F.count("*").over(wl).alias("n_l"),
        F.row_number().over(wd).alias("rn"),
    ).select(
        "n_name",
        "day",
        "sum_s",
        "n_s",
        "sum_l",
        "n_l",
        "rn",
        F.signum(
            (F.col("sum_s") * F.col("n_l") - F.col("sum_l") * F.col("n_s"))
            .cast("double")
        )
        .cast("long")
        .alias("sig"),
    )
    flagged = mas.select(
        "n_name",
        "day",
        "rn",
        "sig",
        F.lag("sig").over(wd).alias("prev_sig"),
        (F.col("sum_s").cast("double") / (F.col("n_s") * 100.0)).alias("ma_short"),
        (F.col("sum_l").cast("double") / (F.col("n_l") * 100.0)).alias("ma_long"),
    )
    return (
        flagged.where(
            (F.col("rn") > MA_LONG)
            & (F.col("sig") != 0)
            & (F.col("prev_sig") != 0)
            & (F.col("sig") != F.col("prev_sig"))
        )
        .select(
            "n_name",
            "day",
            F.when(F.col("sig") > 0, F.lit("golden"))
            .otherwise(F.lit("death"))
            .alias("signal"),
            "ma_short",
            "ma_long",
        )
        .orderBy("n_name", "day")
    )


Q227_SQL = f"""
WITH daily AS (
    SELECT n_name, CAST(l_shipdate AS DATE) AS day,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100
                               + 0.5) AS BIGINT)) AS BIGINT) AS rev_c
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY 1, 2
),
mas AS (
    SELECT n_name, day,
           SUM(rev_c) OVER w{MA_SHORT} AS sum_s,
           COUNT(*) OVER w{MA_SHORT} AS n_s,
           SUM(rev_c) OVER w{MA_LONG} AS sum_l,
           COUNT(*) OVER w{MA_LONG} AS n_l,
           ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY day) AS rn
    FROM daily
    WINDOW w{MA_SHORT} AS (PARTITION BY n_name ORDER BY day
                ROWS BETWEEN {MA_SHORT - 1} PRECEDING AND CURRENT ROW),
           w{MA_LONG} AS (PARTITION BY n_name ORDER BY day
                ROWS BETWEEN {MA_LONG - 1} PRECEDING AND CURRENT ROW)
),
flagged AS (
    SELECT n_name, day, rn,
           CAST(SIGN(sum_s * n_l - sum_l * n_s) AS BIGINT) AS sig,
           LAG(CAST(SIGN(sum_s * n_l - sum_l * n_s) AS BIGINT)) OVER (
               PARTITION BY n_name ORDER BY day) AS prev_sig,
           CAST(sum_s AS DOUBLE) / (n_s * 100.0) AS ma_short,
           CAST(sum_l AS DOUBLE) / (n_l * 100.0) AS ma_long
    FROM mas
)
SELECT n_name, day,
       CASE WHEN sig > 0 THEN 'golden' ELSE 'death' END AS signal,
       ma_short, ma_long
FROM flagged
WHERE rn > {MA_LONG} AND sig != 0 AND prev_sig != 0 AND sig != prev_sig
ORDER BY n_name, day
"""


# ---------------------------------------------------------------------------
# Q228 — Seasonal forecast backtest: train a weekday-mean revenue
# forecast per nation on pre-cutoff days, score MAE on post-cutoff
# days. The entire error pipeline is integer micro-cents:
# forecast = (train_total_cents * 1e6) DIV n_train_days (integral
# division), per-day error = |actual*1e6 - forecast| — so the MAE is a
# double division of one exact int64 sum. The backtest join hits the
# (nation x weekday) AGGREGATE (<= 175 rows, broadcast), not the
# training rows. ISO weekday (1=Mon) on both engines.
# ---------------------------------------------------------------------------

BACKTEST_CUTOFF = "2000-01-01"


def q228_seasonal_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
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
            (F.expr("weekday(day)") + 1).cast("int").alias("dow"),
        )
    )
    cut = F.lit(BACKTEST_CUTOFF).cast("date")
    model = (
        daily.where(F.col("day") < cut)
        .groupBy("n_name", "dow")
        .agg(
            F.sum("rev_c").alias("train_c"),
            F.count("*").cast("long").alias("n_train"),
        )
        .select(
            "n_name",
            "dow",
            F.expr("train_c * 1000000 DIV n_train").alias("forecast_u"),
        )
    )
    test = daily.where(F.col("day") >= cut)
    return (
        test.join(F.broadcast(model), ["n_name", "dow"])
        .select(
            "n_name",
            F.abs(F.col("rev_c") * F.lit(1_000_000) - F.col("forecast_u")).alias(
                "err_u"
            ),
        )
        .groupBy("n_name")
        .agg(
            F.count("*").cast("long").alias("n_test_days"),
            F.sum("err_u").alias("total_err_u"),
        )
        .select(
            "n_name",
            "n_test_days",
            (
                F.col("total_err_u").cast("double")
                / (F.col("n_test_days").cast("double") * 1e8)
            ).alias("mae_usd"),
        )
        .orderBy("n_name")
    )


Q228_SQL = f"""
WITH daily AS (
    SELECT n_name, CAST(l_shipdate AS DATE) AS day,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100
                               + 0.5) AS BIGINT)) AS BIGINT) AS rev_c,
           CAST(isodow(CAST(l_shipdate AS DATE)) AS INTEGER) AS dow
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY 1, 2, 4
),
model AS (
    SELECT n_name, dow,
           SUM(rev_c) * 1000000 // COUNT(*) AS forecast_u
    FROM daily WHERE day < DATE '{BACKTEST_CUTOFF}'
    GROUP BY 1, 2
)
SELECT t.n_name, CAST(COUNT(*) AS BIGINT) AS n_test_days,
       CAST(SUM(ABS(t.rev_c * 1000000 - m.forecast_u)) AS DOUBLE)
           / (CAST(COUNT(*) AS DOUBLE) * 1e8) AS mae_usd
FROM daily t JOIN model m ON t.n_name = m.n_name AND t.dow = m.dow
WHERE t.day >= DATE '{BACKTEST_CUTOFF}'
GROUP BY t.n_name
ORDER BY t.n_name
"""


# ---------------------------------------------------------------------------
# Q229 — Clamped running balance (inventory floor-at-zero) WITHOUT a
# sequential fold: the recurrence B_t = max(0, B_{t-1} + x_t) looks
# like it needs per-key iteration, but the Lindley identity solves it
# in closed form with two windows:
#     S_t = Σ x_k  (prefix sum);   B_t = S_t - min(0, min_{k<=t} S_k)
# Proof sketch (induction): subtracting the most negative prefix ever
# seen is exactly the total deficit forgiven by the clamp so far.
# This turns an "inherently stateful" simulation into running-sum +
# running-min — shuffle-once, bounded partitions, no applyInPandas.
#
# Flows: returns/acks restock (+qty for returnflag R/A), normal ships
# deplete (-qty for N); quantities are integral doubles -> exact int64.
# ---------------------------------------------------------------------------


def q229_clamped_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    flows = (
        li.select(
            "l_partkey",
            F.to_date("l_shipdate").alias("day"),
            F.when(
                F.col("l_returnflag").isin("R", "A"),
                F.floor(F.col("l_quantity") + F.lit(0.5)),
            )
            .otherwise(-F.floor(F.col("l_quantity") + F.lit(0.5)))
            .cast("long")
            .alias("net"),
        )
        .groupBy("l_partkey", "day")
        .agg(F.sum("net").alias("net"))
    )
    from ..operators.allocation import clamped_running_balance

    series = clamped_running_balance(
        flows, ["l_partkey"], ["day"], "net", out_col="balance"
    )
    return (
        series.groupBy("l_partkey")
        .agg(
            F.max_by("balance", "day").cast("long").alias("final_balance"),
            F.max("balance").cast("long").alias("peak_balance"),
            F.sum((F.col("balance") == 0).cast("long"))
            .cast("long")
            .alias("n_stockout_days"),
            F.count("*").cast("long").alias("n_days"),
        )
        .orderBy("l_partkey")
    )


Q229_SQL = """
WITH flows AS (
    SELECT l_partkey, CAST(l_shipdate AS DATE) AS day,
           CAST(SUM(CASE WHEN l_returnflag IN ('R', 'A')
                    THEN CAST(FLOOR(l_quantity + 0.5) AS BIGINT)
                    ELSE -CAST(FLOOR(l_quantity + 0.5) AS BIGINT) END)
                AS BIGINT) AS net
    FROM lineitem GROUP BY 1, 2
),
prefix AS (
    SELECT l_partkey, day,
           SUM(net) OVER (PARTITION BY l_partkey ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
    FROM flows
),
series AS (
    SELECT l_partkey, day,
           s - LEAST(0, MIN(s) OVER (PARTITION BY l_partkey ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS balance
    FROM prefix
)
SELECT l_partkey,
       CAST(max_by(balance, day) AS BIGINT) AS final_balance,
       CAST(MAX(balance) AS BIGINT) AS peak_balance,
       CAST(SUM(CASE WHEN balance = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_stockout_days,
       CAST(COUNT(*) AS BIGINT) AS n_days
FROM series
GROUP BY l_partkey
ORDER BY l_partkey
"""


# ---------------------------------------------------------------------------
# Q230 — Source overlap matrix: exact pairwise shingle Jaccard and
# containment between corpus SOURCES (the shard-level twin of the
# doc-level dedup family — "how much of src A is already in src B" is
# the first question before merging two crawls). Pair discovery is the
# shingle equi-join at SOURCE granularity: each shingle contributes at
# most |sources-sharing-it|² candidates, and that factor is bounded by
# the source count (here 20), so the join is linear in distinct
# (shingle, source) rows no matter how large the corpus grows.
# jaccard/containment are double divisions of exact BIGINT set sizes.
# ---------------------------------------------------------------------------

OVERLAP_SHINGLE_K = 3


def q230_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = ensure_min_parallelism(docs, F.col("doc_id")).select(
        "source", tokens("text").alias("t")
    )
    sh = toks.select(
        "source",
        F.explode(shingles_from_tokens("t", OVERLAP_SHINGLE_K)).alias("shingle"),
    ).distinct()
    sizes = sh.groupBy("source").agg(F.count("*").cast("long").alias("n_sh"))
    pairs = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count("*").cast("long").alias("n_inter"))
    )
    return (
        pairs.join(
            F.broadcast(sizes.withColumnRenamed("source", "src_a")), "src_a"
        )
        .withColumnRenamed("n_sh", "n_a")
        .join(F.broadcast(sizes.withColumnRenamed("source", "src_b")), "src_b")
        .withColumnRenamed("n_sh", "n_b")
        .select(
            "src_a",
            "src_b",
            "n_inter",
            "n_a",
            "n_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double")
            ).alias("jaccard"),
            (
                F.col("n_inter").cast("double")
                / F.least("n_a", "n_b").cast("double")
            ).alias("containment"),
        )
        .orderBy(F.col("jaccard").desc(), "src_a", "src_b")
    )


Q230_SQL = rf"""
WITH toks AS (
    SELECT source, string_split_regex(TRIM(text), '\s+') AS t
    FROM documents
),
sh AS (
    SELECT DISTINCT source,
           concat_ws(' ', t[i+1], t[i+2], t[i+3]) AS shingle
    FROM toks, UNNEST(range(0, GREATEST(len(t) - {OVERLAP_SHINGLE_K - 1}, 0)))
         AS r(i)
),
sizes AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY source
),
pairs AS (
    SELECT a.source AS src_a, b.source AS src_b,
           CAST(COUNT(*) AS BIGINT) AS n_inter
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
    GROUP BY 1, 2
)
SELECT p.src_a, p.src_b, p.n_inter, sa.n_sh AS n_a, sb.n_sh AS n_b,
       CAST(p.n_inter AS DOUBLE)
           / CAST(sa.n_sh + sb.n_sh - p.n_inter AS DOUBLE) AS jaccard,
       CAST(p.n_inter AS DOUBLE)
           / CAST(LEAST(sa.n_sh, sb.n_sh) AS DOUBLE) AS containment
FROM pairs p
JOIN sizes sa ON p.src_a = sa.source
JOIN sizes sb ON p.src_b = sb.source
ORDER BY jaccard DESC, src_a, src_b
"""


# ---------------------------------------------------------------------------
# Q232 — Order-fulfilment SLA report: ship latency (days from order to
# line ship) per order priority — exact p50/p90/p99 via the flat-scaling
# value-counts percentile form (the q45 recipe; the latency domain is
# small-integer days, so the distinct-value state is tiny), plus the
# >90-day breach rate in exact ppm (integral division).
# ---------------------------------------------------------------------------

SLA_BREACH_DAYS = 90


def q232_fill_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lat = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "o_orderpriority",
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
        .cast("long")
        .alias("lat_days"),
    )
    pct = exact_grouped_percentiles(
        lat,
        "o_orderpriority",
        "lat_days",
        {"p50_days": 0.5, "p90_days": 0.9, "p99_days": 0.99},
    ).select("o_orderpriority", "p50_days", "p90_days", "p99_days")
    breach = lat.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum((F.col("lat_days") > SLA_BREACH_DAYS).cast("long")).alias(
            "n_breach"
        ),
    )
    return (
        breach.join(F.broadcast(pct), "o_orderpriority")
        .select(
            "o_orderpriority",
            "n_lines",
            "p50_days",
            "p90_days",
            "p99_days",
            F.expr("n_breach * 1000000 DIV n_lines").cast("long").alias(
                "breach_ppm"
            ),
        )
        .orderBy("o_orderpriority")
    )


Q232_SQL = f"""
WITH lat AS (
    SELECT o_orderpriority,
           CAST(date_diff('day', CAST(o_orderdate AS DATE),
                          CAST(l_shipdate AS DATE)) AS BIGINT) AS lat_days
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       quantile_cont(lat_days, 0.5)  AS p50_days,
       quantile_cont(lat_days, 0.9)  AS p90_days,
       quantile_cont(lat_days, 0.99) AS p99_days,
       CAST(SUM(CASE WHEN lat_days > {SLA_BREACH_DAYS} THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT) AS breach_ppm
FROM lat
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q233 — Calendar-range window frames: trailing 7-CALENDAR-DAY revenue
# per nation via RANGE BETWEEN on an epoch-day key, contrasted with the
# 7-ROW frame on the same series. On sparse series the two genuinely
# differ (a nation with no sales yesterday still ages out of the range
# frame) — the classic bug when "last 7 days" is implemented as "last 7
# rows". The range frame is first-class in both engines: Spark
# rangeBetween over a numeric order key, DuckDB RANGE BETWEEN ...
# PRECEDING. All revenue in int64 cents, so both frames hash exactly.
# ---------------------------------------------------------------------------

RANGE_DAYS = 7


def q233_range_frame_window(spark: SparkSession, sf_dir: str) -> DataFrame:
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
            F.datediff("day", F.lit("1970-01-01").cast("date")).cast(
                "long"
            ).alias("eday"),
        )
    )
    wrange = (
        Window.partitionBy("n_name")
        .orderBy("eday")
        .rangeBetween(-(RANGE_DAYS - 1), 0)
    )
    wrows = (
        Window.partitionBy("n_name")
        .orderBy("eday")
        .rowsBetween(-(RANGE_DAYS - 1), 0)
    )
    return daily.select(
        "n_name",
        "day",
        "rev_c",
        F.sum("rev_c").over(wrange).alias("trail_cal_c"),
        F.count("*").over(wrange).cast("long").alias("days_in_cal"),
        F.sum("rev_c").over(wrows).alias("trail_rows_c"),
    ).orderBy("n_name", "day")


Q233_SQL = f"""
WITH daily AS (
    SELECT n_name, CAST(l_shipdate AS DATE) AS day,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100
                               + 0.5) AS BIGINT)) AS BIGINT) AS rev_c,
           CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT)
               AS eday
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY 1, 2, 4
)
SELECT n_name, day, rev_c,
       CAST(SUM(rev_c) OVER wr AS BIGINT) AS trail_cal_c,
       CAST(COUNT(*) OVER wr AS BIGINT) AS days_in_cal,
       CAST(SUM(rev_c) OVER wo AS BIGINT) AS trail_rows_c
FROM daily
WINDOW wr AS (PARTITION BY n_name ORDER BY eday
              RANGE BETWEEN {RANGE_DAYS - 1} PRECEDING AND CURRENT ROW),
       wo AS (PARTITION BY n_name ORDER BY eday
              ROWS BETWEEN {RANGE_DAYS - 1} PRECEDING AND CURRENT ROW)
ORDER BY n_name, day
"""


# ---------------------------------------------------------------------------
# Q235 — Cumulative distinct parts per nation by month. Spark bans
# COUNT(DISTINCT) over windows; the distributed answer is the
# FIRST-OCCURRENCE derivation: a part joins the running distinct count
# exactly once, in the month it first ships, so cumulative-distinct =
# prefix sum of first-occurrence counts. The DuckDB oracle computes the
# same numbers through a genuinely different path — COUNT(DISTINCT ...)
# OVER a range window, which DuckDB does support — so the hash-match
# cross-validates the derivation, not just the arithmetic.
# ---------------------------------------------------------------------------


def q235_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    shipped = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "n_name",
            "l_partkey",
            (
                F.year(F.col("l_shipdate")) * 12
                + F.month(F.col("l_shipdate"))
                - 1
            ).alias("month_m"),
        )
    )
    first_seen = shipped.groupBy("n_name", "l_partkey").agg(
        F.min("month_m").alias("first_m")
    )
    # Month spine: every ACTIVE (nation, month) — months where only
    # already-seen parts ship must still appear, with new_parts = 0.
    spine = shipped.select("n_name", "month_m").distinct()
    monthly = spine.join(
        first_seen.groupBy(
            "n_name", F.col("first_m").alias("month_m")
        ).agg(F.count("*").cast("long").alias("new_parts")),
        ["n_name", "month_m"],
        "left",
    ).select(
        "n_name",
        "month_m",
        F.coalesce("new_parts", F.lit(0).cast("long")).alias("new_parts"),
    )
    wcum = (
        Window.partitionBy("n_name")
        .orderBy("month_m")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return monthly.select(
        "n_name",
        F.format_string(
            "%04d-%02d",
            F.expr("month_m DIV 12"),
            (F.col("month_m") % 12 + 1).cast("int"),
        ).alias("month"),
        "new_parts",
        F.sum("new_parts").over(wcum).cast("long").alias("cum_parts"),
    ).orderBy("n_name", "month")


Q235_SQL = """
WITH shipped AS (
    SELECT n_name, l_partkey,
           CAST(year(l_shipdate) * 12 + month(l_shipdate) - 1 AS BIGINT)
               AS month_m
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
),
-- DISTINCT window aggregate: a different computation path than the
-- engine's first-occurrence derivation (cross-validation, not an echo).
cum AS (
    SELECT DISTINCT n_name, month_m,
           CAST(COUNT(DISTINCT l_partkey) OVER (
               PARTITION BY n_name ORDER BY month_m
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_parts
    FROM shipped
)
SELECT n_name,
       printf('%04d-%02d', CAST(month_m // 12 AS INTEGER),
              CAST(month_m % 12 + 1 AS INTEGER)) AS month,
       cum_parts - COALESCE(LAG(cum_parts) OVER (
           PARTITION BY n_name ORDER BY month_m), 0) AS new_parts,
       cum_parts
FROM cum
ORDER BY n_name, month
"""


# ---------------------------------------------------------------------------
# Q236 — RAKE-style keyphrase extraction: candidate phrases are maximal
# stopword-free token runs; each word scores degree/frequency (degree =
# total length of phrases it appears in, frequency = its occurrence
# count), and a phrase scores the sum over its words. The score is kept
# on the INTEGER GRID — score_ppm = Σ (deg·1e6 DIV freq) — so the sum
# is order-free and the full value oracle holds (a float Σ deg/freq
# would be summation-order-dependent).
#
# Distributed shape: posexplode the token array (after the fan-out
# repartition), run-id = cumulative stopword count per doc (bounded
# per-doc windows), keyed aggs for word stats, stats broadcast back
# onto the distinct-phrase explode.
# ---------------------------------------------------------------------------

RAKE_MIN_WORDS = 2
RAKE_TOP = 50


def q236_rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import QUALITY_STOPWORDS

    docs = load_table(spark, sf_dir, "documents")
    toks = ensure_min_parallelism(docs, F.col("doc_id")).select(
        "doc_id", F.posexplode(tokens("text")).alias("pos", "word")
    )
    flagged = toks.select(
        "doc_id",
        "pos",
        "word",
        F.col("word").isin(QUALITY_STOPWORDS).cast("int").alias("is_stop"),
    )
    wrun = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    runs = flagged.select(
        "doc_id",
        "pos",
        "word",
        "is_stop",
        F.sum("is_stop").over(wrun).alias("run_id"),
    ).where(F.col("is_stop") == 0)
    phrases = (
        runs.groupBy("doc_id", "run_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "word"))
                    ),
                    lambda st: st["word"],
                ),
                " ",
            ).alias("phrase"),
            F.count("*").cast("long").alias("p_len"),
        )
        .where(F.col("p_len") >= RAKE_MIN_WORDS)
    )
    word_stats = (
        phrases.select(
            F.explode(F.split("phrase", " ")).alias("word"), "p_len"
        )
        .groupBy("word")
        .agg(
            F.count("*").cast("long").alias("freq"),
            F.sum("p_len").cast("long").alias("deg"),
        )
    )
    scored = (
        phrases.groupBy("phrase", "p_len")
        .agg(F.count("*").cast("long").alias("n_occurrences"))
        .select(
            "phrase",
            "p_len",
            "n_occurrences",
            F.explode(F.split("phrase", " ")).alias("word"),
        )
        .join(F.broadcast(word_stats), "word")
        .groupBy("phrase", "p_len", "n_occurrences")
        .agg(F.sum(F.expr("deg * 1000000 DIV freq")).cast("long").alias(
            "score_ppm"
        ))
    )
    return (
        scored.orderBy(F.col("score_ppm").desc(), "phrase")
        .limit(RAKE_TOP)
        .select(
            "phrase",
            F.col("p_len").cast("long").alias("n_words"),
            "n_occurrences",
            "score_ppm",
        )
    )


def _sql_stoplist() -> str:
    from ..functions.text import QUALITY_STOPWORDS

    return ", ".join(f"'{w}'" for w in QUALITY_STOPWORDS)


Q236_SQL = rf"""
WITH arrs AS (
    SELECT doc_id, string_split_regex(TRIM(text), '\s+') AS t
    FROM documents
),
toks AS (
    SELECT doc_id, t[CAST(i AS INTEGER)] AS word, CAST(i AS BIGINT) AS pos,
           CASE WHEN t[CAST(i AS INTEGER)] IN ({_sql_stoplist()})
                THEN 1 ELSE 0 END AS is_stop
    FROM arrs, UNNEST(range(1, len(t) + 1)) AS r(i)
),
runs AS (
    SELECT doc_id, pos, word,
           SUM(is_stop) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
    FROM toks
    QUALIFY is_stop = 0
),
phrases AS (
    SELECT doc_id, run_id,
           string_agg(word, ' ' ORDER BY pos) AS phrase,
           CAST(COUNT(*) AS BIGINT) AS p_len
    FROM runs GROUP BY doc_id, run_id
    HAVING COUNT(*) >= {RAKE_MIN_WORDS}
),
word_stats AS (
    SELECT w.word, CAST(COUNT(*) AS BIGINT) AS freq,
           CAST(SUM(p.p_len) AS BIGINT) AS deg
    FROM phrases p, UNNEST(string_split(p.phrase, ' ')) AS w(word)
    GROUP BY w.word
),
occ AS (
    SELECT phrase, p_len, CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM phrases GROUP BY phrase, p_len
)
SELECT o.phrase, CAST(o.p_len AS BIGINT) AS n_words, o.n_occurrences,
       CAST(SUM(s.deg * 1000000 // s.freq) AS BIGINT) AS score_ppm
FROM occ o, UNNEST(string_split(o.phrase, ' ')) AS w(word)
JOIN word_stats s ON s.word = w.word
GROUP BY o.phrase, o.p_len, o.n_occurrences
ORDER BY score_ppm DESC, phrase
LIMIT {RAKE_TOP}
"""


# ---------------------------------------------------------------------------
# Q239 — Next-order affinity ("bought X, next order bought Y"): the
# TEMPORAL counterpart of q216's same-basket rules. Orders per customer
# are ranked by (date, orderkey); basket r joins basket r+1 of the same
# customer, and (X -> Y) pairs are counted across customers. The join
# fan-out is bounded by (parts per basket)² per consecutive-order pair
# — never a customer-history cross product.
# ---------------------------------------------------------------------------

AFFINITY_MIN_N = 2


def q239_next_order_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    seq = o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number()
        .over(
            Window.partitionBy("o_custkey").orderBy(
                "o_orderdate", "o_orderkey"
            )
        )
        .alias("rank"),
    )
    baskets = (
        li.select("l_orderkey", "l_partkey")
        .distinct()
        .join(seq, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("o_custkey", "rank", "l_partkey")
    )
    pairs = (
        baskets.alias("a")
        .join(
            baskets.alias("b"),
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.rank") + 1 == F.col("b.rank")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_x"),
            F.col("b.l_partkey").alias("part_y"),
        )
        .agg(F.count("*").cast("long").alias("n"))
        .where(F.col("n") >= AFFINITY_MIN_N)
    )
    return pairs.orderBy(F.col("n").desc(), "part_x", "part_y")


Q239_SQL = f"""
WITH seq AS (
    SELECT o_orderkey, o_custkey,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS rank
    FROM orders
),
baskets AS (
    SELECT DISTINCT s.o_custkey, s.rank, l.l_partkey
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) l
    JOIN seq s ON l.l_orderkey = s.o_orderkey
)
SELECT a.l_partkey AS part_x, b.l_partkey AS part_y,
       CAST(COUNT(*) AS BIGINT) AS n
FROM baskets a
JOIN baskets b ON a.o_custkey = b.o_custkey AND a.rank + 1 = b.rank
GROUP BY 1, 2
HAVING COUNT(*) >= {AFFINITY_MIN_N}
ORDER BY n DESC, part_x, part_y
"""


# ---------------------------------------------------------------------------
# Q240 — DAU/WAU stickiness: per ISO week, the weekly active users,
# the average daily actives (as an exact integral-division ppm of WAU
# — the canonical product-analytics "stickiness" ratio), and the
# peak-day share. All counts exact; ratios are integral ppm so the
# whole row hashes.
# ---------------------------------------------------------------------------


def q240_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.date_trunc("week", F.col("ts")).cast("date").alias("week"),
        F.to_date("ts").alias("day"),
        "user_id",
    )
    daily = base.groupBy("week", "day").agg(
        F.countDistinct("user_id").cast("long").alias("dau")
    )
    weekly = base.groupBy("week").agg(
        F.countDistinct("user_id").cast("long").alias("wau")
    )
    return (
        daily.groupBy("week")
        .agg(
            F.count("*").cast("long").alias("n_days"),
            F.sum("dau").alias("sum_dau"),
            F.max("dau").cast("long").alias("peak_dau"),
        )
        .join(weekly, "week")
        .select(
            "week",
            "n_days",
            "wau",
            F.expr("sum_dau * 1000000 DIV (n_days * wau)")
            .cast("long")
            .alias("stickiness_ppm"),
            F.expr("peak_dau * 1000000 DIV wau").cast("long").alias(
                "peak_share_ppm"
            ),
        )
        .orderBy("week")
    )


Q240_SQL = """
WITH daily AS (
    SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
           CAST(ts AS DATE) AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
    FROM events GROUP BY 1, 2
),
weekly AS (
    SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
    FROM events GROUP BY 1
)
SELECT d.week, CAST(COUNT(*) AS BIGINT) AS n_days, w.wau,
       CAST(SUM(d.dau) * 1000000 // (COUNT(*) * w.wau) AS BIGINT)
           AS stickiness_ppm,
       CAST(MAX(d.dau) * 1000000 // w.wau AS BIGINT) AS peak_share_ppm
FROM daily d JOIN weekly w ON d.week = w.week
GROUP BY d.week, w.wau
ORDER BY d.week
"""


# ---------------------------------------------------------------------------
# Q241 — Revenue bridge (price-volume-mix): decompose each brand's
# revenue change between two years into a volume effect and a
# price/mix residual, with EXACT integer algebra:
#     volume_effect = R0 · (Q1 - Q0) DIV Q0     (integral division)
#     price_mix     = ΔR - volume_effect        (residual, exact)
# The residual absorbs the sub-cent truncation of the integral
# division, so the bridge ties out to ΔR per part BY CONSTRUCTION —
# the invariant every float PVM implementation only approximates.
# Parts present in only one year go to explicit NEW (+R1) /
# DISCONTINUED (-R0) buckets, so the four effects sum to the brand's
# TOTAL revenue change — nothing silently dropped. Computed per part
# (the mix grain), aggregated per brand, dims broadcast.
# ---------------------------------------------------------------------------

BRIDGE_Y0 = 2000
BRIDGE_Y1 = 2001


def q241_revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    yearly = (
        li.where(F.year("l_shipdate").isin(BRIDGE_Y0, BRIDGE_Y1))
        .select(
            "l_partkey",
            F.year("l_shipdate").alias("yr"),
            F.floor(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
                * 100
                + F.lit(0.5)
            )
            .cast("long")
            .alias("rev_c"),
            F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("qty"),
        )
        .groupBy("l_partkey", "yr")
        .agg(F.sum("rev_c").alias("r"), F.sum("qty").alias("q"))
    )
    pivoted = (
        yearly.groupBy("l_partkey")
        .pivot("yr", [BRIDGE_Y0, BRIDGE_Y1])
        .agg(F.first("r").alias("r"), F.first("q").alias("q"))
        .select(
            "l_partkey",
            F.col(f"{BRIDGE_Y0}_r").alias("r0"),
            F.col(f"{BRIDGE_Y0}_q").alias("q0"),
            F.col(f"{BRIDGE_Y1}_r").alias("r1"),
            F.col(f"{BRIDGE_Y1}_q").alias("q1"),
        )
    )
    matched = F.col("r0").isNotNull() & F.col("r1").isNotNull()
    per_part = pivoted.select(
        "l_partkey",
        (F.coalesce("r1", F.lit(0)) - F.coalesce("r0", F.lit(0))).alias(
            "delta_c"
        ),
        F.when(matched, F.expr("r0 * (q1 - q0) DIV q0"))
        .otherwise(F.lit(0))
        .alias("volume_c"),
        F.when(F.col("r0").isNull(), F.col("r1")).otherwise(F.lit(0)).alias(
            "new_c"
        ),
        F.when(F.col("r1").isNull(), -F.col("r0")).otherwise(F.lit(0)).alias(
            "disc_c"
        ),
    ).select(
        "l_partkey",
        "delta_c",
        "volume_c",
        "new_c",
        "disc_c",
        (
            F.col("delta_c") - F.col("volume_c") - F.col("new_c")
            - F.col("disc_c")
        ).alias("price_mix_c"),
    )
    return (
        per_part.join(
            F.broadcast(p.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand")
        .agg(
            F.count("*").cast("long").alias("n_parts"),
            (F.sum("delta_c").cast("double") / 100.0).alias("delta_usd"),
            (F.sum("volume_c").cast("double") / 100.0).alias("volume_usd"),
            (F.sum("price_mix_c").cast("double") / 100.0).alias(
                "price_mix_usd"
            ),
            (F.sum("new_c").cast("double") / 100.0).alias("new_usd"),
            (F.sum("disc_c").cast("double") / 100.0).alias(
                "discontinued_usd"
            ),
        )
        .orderBy("p_brand")
    )


Q241_SQL = f"""
WITH yearly AS (
    SELECT l_partkey, year(l_shipdate) AS yr,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100
                               + 0.5) AS BIGINT)) AS BIGINT) AS r,
           CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS q
    FROM lineitem
    WHERE year(l_shipdate) IN ({BRIDGE_Y0}, {BRIDGE_Y1})
    GROUP BY 1, 2
),
pivoted AS (
    SELECT COALESCE(a.l_partkey, b.l_partkey) AS l_partkey,
           a.r AS r0, a.q AS q0, b.r AS r1, b.q AS q1
    FROM (SELECT * FROM yearly WHERE yr = {BRIDGE_Y0}) a
    FULL OUTER JOIN (SELECT * FROM yearly WHERE yr = {BRIDGE_Y1}) b
      ON a.l_partkey = b.l_partkey
),
per_part AS (
    -- Spark's DIV truncates toward zero; DuckDB's // floors. The volume
    -- term can be negative, so pin TRUNCATION explicitly here.
    SELECT l_partkey,
           COALESCE(r1, 0) - COALESCE(r0, 0) AS delta_c,
           CASE WHEN r0 IS NULL OR r1 IS NULL THEN 0
                WHEN r0 * (q1 - q0) >= 0
                THEN r0 * (q1 - q0) // q0
                ELSE -((-(r0 * (q1 - q0))) // q0) END AS volume_c,
           CASE WHEN r0 IS NULL THEN r1 ELSE 0 END AS new_c,
           CASE WHEN r1 IS NULL THEN -r0 ELSE 0 END AS disc_c
    FROM pivoted
)
SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(delta_c) AS DOUBLE) / 100.0 AS delta_usd,
       CAST(SUM(volume_c) AS DOUBLE) / 100.0 AS volume_usd,
       CAST(SUM(delta_c - volume_c - new_c - disc_c) AS DOUBLE) / 100.0
           AS price_mix_usd,
       CAST(SUM(new_c) AS DOUBLE) / 100.0 AS new_usd,
       CAST(SUM(disc_c) AS DOUBLE) / 100.0 AS discontinued_usd
FROM per_part JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY p_brand
"""


# ---------------------------------------------------------------------------
# Q243 — Single-pass write audit via DataFrame Observation: the
# production pattern for "load the table AND collect its audit metrics
# without a second scan". `df.observe(...)` attaches aggregate
# expressions that are computed as the rows stream through the ONE
# write action (here a `noop`-sink write standing in for the parquet
# sink) — at 100 TB this halves the audit cost vs the naive
# write-then-re-aggregate. The metrics surface as a 1-row DataFrame
# (bounded driver state, the q03 pattern); revenue runs through the
# exact-decimal recipe so the row hashes against the oracle.
#
# This function is intentionally EAGER (it runs the write when called):
# Observation semantics require an action — that action is the point.
# ---------------------------------------------------------------------------


def q243_observed_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Observation

    from ..functions.numeric import dec_sum

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_shipdate",
    )
    obs = Observation("load_audit")
    # Observation bans DISTINCT aggregates (they can't stream through a
    # single pass) — cardinality checks stay in quality/checks.py; the
    # observable metrics are streaming-friendly folds only.
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.max("l_orderkey").alias("max_orderkey"),
        F.sum(F.col("l_shipdate").isNull().cast("long")).alias(
            "null_shipdates"
        ),
        dec_sum(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        ).alias("revenue"),
        F.min(F.to_date("l_shipdate")).alias("first_ship"),
        F.max(F.to_date("l_shipdate")).alias("last_ship"),
    )
    # The ONE action: a production load writes parquet here; the noop
    # sink keeps the corpus read-only while driving the identical scan.
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return local_frame(
        spark,
        [
            (
                m["n_rows"],
                m["max_orderkey"],
                m["null_shipdates"],
                m["revenue"],
                m["first_ship"],
                m["last_ship"],
            )
        ],
        "n_rows long, max_orderkey long, null_shipdates long, revenue double,"
        " first_ship date, last_ship date",
    )


Q243_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MAX(l_orderkey) AS BIGINT) AS max_orderkey,
       CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS null_shipdates,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                     AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
       MIN(CAST(l_shipdate AS DATE)) AS first_ship,
       MAX(CAST(l_shipdate AS DATE)) AS last_ship
FROM lineitem
"""


# ---------------------------------------------------------------------------
# Q244 — Pareto frontier (2-D skyline): the parts no other part
# dominates on (retail price, size) — both lower is better. The
# distributed form is the price-ordered sweep (a point survives iff no
# strictly-cheaper point has size <= its own, and no same-price point
# is strictly smaller), computed WITHOUT a global window: per-bucket
# range-frame minima + a metadata-sized bucket-spine prefix min
# broadcast back (the SNM bucketed-sweep pattern). The ORACLE takes a
# genuinely different path — the NOT EXISTS dominance test — so the
# hash-match cross-validates the sweep derivation itself.
#
# Output also carries each frontier part's dominance count (how many
# parts it dominates), an anti-join-free keyed count via the same
# ordering trick in the oracle and a broadcast frontier probe in the
# engine: |frontier| is tiny, so the count join broadcasts.
# ---------------------------------------------------------------------------


PARETO_BUCKET_C = 100_000  # $1000 price buckets for the two-level sweep


def q244_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        # integer cents so the strict comparisons are exact cross-engine
        F.floor(F.col("p_retailprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("price_c"),
        F.col("p_size").cast("long").alias("size"),
    ).withColumn("bucket", F.expr(f"price_c DIV {PARETO_BUCKET_C}"))
    # Two-level sweep — NEVER a global window (the q187/SNM bucketed
    # pattern): (1) running min size over strictly-cheaper parts WITHIN
    # each price bucket, (2) per-bucket minima rolled into a prefix-min
    # over the tiny bucket spine, broadcast back as "best of all earlier
    # buckets". Earlier buckets are strictly cheaper by construction.
    wb = (
        Window.partitionBy("bucket")
        .orderBy("price_c")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    wsame = Window.partitionBy("price_c")
    local = p.select(
        "p_partkey",
        "price_c",
        "size",
        "bucket",
        F.min("size").over(wb).alias("min_in_bucket"),
        F.min("size").over(wsame).alias("min_same_price"),
    )
    bucket_mins = p.groupBy("bucket").agg(F.min("size").alias("bmin"))
    wspine = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prefix = bucket_mins.select(
        "bucket", F.min("bmin").over(wspine).alias("min_earlier_buckets")
    )
    candidates = local.join(F.broadcast(prefix), "bucket").where(
        # no strictly-cheaper part with size <= ours ...
        (
            F.least(
                F.coalesce("min_in_bucket", F.lit(2**62)),
                F.coalesce("min_earlier_buckets", F.lit(2**62)),
            )
            > F.col("size")
        )
        # ... and no same-price part with size strictly below ours
        & (F.col("size") == F.col("min_same_price"))
    )
    frontier = candidates.select("p_partkey", "price_c", "size")
    dominated = (
        p.alias("x")
        .join(
            F.broadcast(frontier.alias("f")),
            (
                (F.col("f.price_c") <= F.col("x.price_c"))
                & (F.col("f.size") <= F.col("x.size"))
                & (
                    (F.col("f.price_c") < F.col("x.price_c"))
                    | (F.col("f.size") < F.col("x.size"))
                )
            ),
        )
        .groupBy(F.col("f.p_partkey").alias("p_partkey"))
        .agg(F.count("*").cast("long").alias("n_dominated"))
    )
    return (
        frontier.join(F.broadcast(dominated), "p_partkey", "left")
        .select(
            "p_partkey",
            "price_c",
            "size",
            F.coalesce("n_dominated", F.lit(0).cast("long")).alias(
                "n_dominated"
            ),
        )
        .orderBy("price_c", "size", "p_partkey")
    )


Q244_SQL = """
WITH pts AS (
    SELECT p_partkey,
           CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT) AS price_c,
           CAST(p_size AS BIGINT) AS size
    FROM part
),
-- the DOMINANCE definition directly: a different computation path than
-- the engine's price-ordered sweep (cross-validation, not an echo)
frontier AS (
    SELECT a.* FROM pts a
    WHERE NOT EXISTS (
        SELECT 1 FROM pts b
        WHERE b.price_c <= a.price_c AND b.size <= a.size
          AND (b.price_c < a.price_c OR b.size < a.size)
    )
)
SELECT f.p_partkey, f.price_c, f.size,
       CAST((SELECT COUNT(*) FROM pts x
             WHERE f.price_c <= x.price_c AND f.size <= x.size
               AND (f.price_c < x.price_c OR f.size < x.size))
            AS BIGINT) AS n_dominated
FROM frontier f
ORDER BY price_c, size, p_partkey
"""


# ---------------------------------------------------------------------------
# Q249 — Quarantine routing: classify every lineitem against an ordered
# rule set and report the routing outcome — the load-time data-quality
# pattern that complements quality/checks.py's assertions (those FAIL a
# load; this ROUTES bad rows to a dead-letter table with a reason).
# First-failing-rule-wins is pinned by evaluation order (CASE WHEN), so
# a row violating several rules lands in exactly one bucket and the
# bucket totals always sum to the table count. Single scan, keyed agg.
# ---------------------------------------------------------------------------


def q249_quarantine_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    routed = li.join(
        F.broadcast(o.select("o_orderkey", "o_orderdate")),
        F.col("l_orderkey") == F.col("o_orderkey"),
        "left",
    ).select(
        F.when(F.col("o_orderkey").isNull(), F.lit("orphan_orderkey"))
        .when(F.col("l_quantity") <= 0, F.lit("nonpositive_qty"))
        .when(
            (F.col("l_discount") < 0) | (F.col("l_discount") > 0.5),
            F.lit("discount_out_of_range"),
        )
        .when(F.col("l_extendedprice") <= 0, F.lit("nonpositive_price"))
        .when(
            F.to_date("l_shipdate") < F.to_date("o_orderdate"),
            F.lit("ships_before_order"),
        )
        .otherwise(F.lit("valid"))
        .alias("route"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("price_c"),
    )
    total = routed.groupBy().agg(F.count("*").alias("n_total"))
    return (
        routed.groupBy("route")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("price_c").cast("long").alias("total_price_c"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "route",
            "n_rows",
            "total_price_c",
            F.expr("n_rows * 1000000 DIV n_total").cast("long").alias(
                "share_ppm"
            ),
        )
        .orderBy("route")
    )


Q249_SQL = """
WITH routed AS (
    SELECT CASE
             WHEN o.o_orderkey IS NULL THEN 'orphan_orderkey'
             WHEN l.l_quantity <= 0 THEN 'nonpositive_qty'
             WHEN l.l_discount < 0 OR l.l_discount > 0.5
                  THEN 'discount_out_of_range'
             WHEN l.l_extendedprice <= 0 THEN 'nonpositive_price'
             WHEN CAST(l.l_shipdate AS DATE) < CAST(o.o_orderdate AS DATE)
                  THEN 'ships_before_order'
             ELSE 'valid'
           END AS route,
           CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
),
total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM routed)
SELECT route, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(price_c) AS BIGINT) AS total_price_c,
       CAST(COUNT(*) * 1000000 // n_total AS BIGINT) AS share_ppm
FROM routed CROSS JOIN total
GROUP BY route, n_total
ORDER BY route
"""


# ---------------------------------------------------------------------------
# Q250 — Daily business healthcheck (insight-family capstone): ONE lazy
# plan emits, per (nation, recent day): revenue, day-over-day change,
# the 7-vs-28 MA state (q227's integer crossing test), the 3σ control
# flag (q248's cross-multiplied algebra), and the pacing drawdown to
# date (q224's scaled Lindley form) — every signal exact-integer, every
# window sharing ONE n_name partitioning, so the whole report costs a
# single shuffle over the (nation × day) aggregate plus the 1-row
# anchor broadcast that bounds the output to the last 14 days.
# The capstone proof: the operators compose without re-scanning.
# ---------------------------------------------------------------------------

HEALTH_DAYS = 14


def q250_daily_healthcheck(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    wcum = wd.rowsBetween(Window.unboundedPreceding, 0)
    ws = wd.rowsBetween(-(MA_SHORT - 1), 0)
    wl = wd.rowsBetween(-(MA_LONG - 1), 0)
    wspc = wd.rowsBetween(-SPC_WINDOW, -1)
    wall = Window.partitionBy("n_name")
    sig = daily.select(
        "n_name",
        "day",
        "rev_c",
        (F.col("rev_c") - F.lag("rev_c").over(wd)).alias("dod_c"),
        # 7-vs-28 MA state by integer cross-multiplication (q227)
        F.signum(
            (
                F.sum("rev_c").over(ws) * F.count("*").over(wl)
                - F.sum("rev_c").over(wl) * F.count("*").over(ws)
            ).cast("double")
        )
        .cast("long")
        .alias("ma_sig"),
        # 3σ control flag on the trailing window (q248, exact decimal)
        F.count("*").over(wspc).cast("decimal(38,0)").alias("nw"),
        F.sum(F.col("rev_c").cast("decimal(38,0)")).over(wspc).alias("sw"),
        F.sum(
            (F.col("rev_c").cast("decimal(38,0)") * F.col("rev_c"))
        )
        .over(wspc)
        .alias("qw"),
        # pacing drawdown to date (q224's scaled demeaned series)
        (
            F.count("*").over(wall) * F.sum("rev_c").over(wcum)
            - F.row_number().over(wd) * F.sum("rev_c").over(wall)
        ).alias("x"),
        F.count("*").over(wall).cast("long").alias("n_days"),
    )
    xd = F.col("rev_c").cast("decimal(38,0)")
    spc_flag = (
        (F.col("nw") == SPC_WINDOW)
        & (
            (F.col("nw") * xd - F.col("sw"))
            * (F.col("nw") * xd - F.col("sw"))
            * (F.col("nw") - 1)
            > 9 * F.col("nw") * (F.col("nw") * F.col("qw") - F.col("sw") * F.col("sw"))
        )
    )
    enriched = sig.select(
        "n_name",
        "day",
        "rev_c",
        "dod_c",
        F.when(F.col("ma_sig") > 0, F.lit("short_above"))
        .when(F.col("ma_sig") < 0, F.lit("short_below"))
        .otherwise(F.lit("level"))
        .alias("ma_state"),
        spc_flag.alias("spc_outlier"),
        (F.max("x").over(wcum) - F.col("x")).alias("dd_x"),
        "n_days",
    )
    anchor = daily.groupBy().agg(F.max("day").alias("max_day"))
    return (
        enriched.crossJoin(F.broadcast(anchor))
        .where(F.col("day") >= F.date_sub("max_day", HEALTH_DAYS - 1))
        .select(
            "n_name",
            "day",
            (F.col("rev_c").cast("double") / 100.0).alias("rev_usd"),
            (F.col("dod_c").cast("double") / 100.0).alias("dod_usd"),
            "ma_state",
            "spc_outlier",
            (
                F.col("dd_x").cast("double")
                / (F.col("n_days").cast("double") * 100.0)
            ).alias("drawdown_usd"),
        )
        .orderBy("n_name", "day")
    )


Q250_SQL = f"""
WITH daily AS (
    SELECT n_name, CAST(l_shipdate AS DATE) AS day,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100
                               + 0.5) AS BIGINT)) AS BIGINT) AS rev_c
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY 1, 2
),
sig AS (
    SELECT n_name, day, rev_c,
           rev_c - LAG(rev_c) OVER wd AS dod_c,
           CAST(SIGN(SUM(rev_c) OVER ws * COUNT(*) OVER wl
                     - SUM(rev_c) OVER wl * COUNT(*) OVER ws) AS BIGINT)
               AS ma_sig,
           CAST(COUNT(*) OVER wspc AS HUGEINT) AS nw,
           CAST(SUM(CAST(rev_c AS HUGEINT)) OVER wspc AS HUGEINT) AS sw,
           CAST(SUM(CAST(rev_c AS HUGEINT) * CAST(rev_c AS HUGEINT))
                OVER wspc AS HUGEINT) AS qw,
           CAST(COUNT(*) OVER wall AS HUGEINT)
               * CAST(SUM(rev_c) OVER wcum AS HUGEINT)
           - CAST(ROW_NUMBER() OVER wd AS HUGEINT)
               * CAST(SUM(rev_c) OVER wall AS HUGEINT) AS x,
           CAST(COUNT(*) OVER wall AS BIGINT) AS n_days
    FROM daily
    WINDOW wd AS (PARTITION BY n_name ORDER BY day),
           wcum AS (PARTITION BY n_name ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           ws AS (PARTITION BY n_name ORDER BY day
                  ROWS BETWEEN {MA_SHORT - 1} PRECEDING AND CURRENT ROW),
           wl AS (PARTITION BY n_name ORDER BY day
                  ROWS BETWEEN {MA_LONG - 1} PRECEDING AND CURRENT ROW),
           wspc AS (PARTITION BY n_name ORDER BY day
                    ROWS BETWEEN {SPC_WINDOW} PRECEDING AND 1 PRECEDING),
           wall AS (PARTITION BY n_name)
),
enriched AS (
    SELECT n_name, day, rev_c, dod_c,
           CASE WHEN ma_sig > 0 THEN 'short_above'
                WHEN ma_sig < 0 THEN 'short_below'
                ELSE 'level' END AS ma_state,
           nw = {SPC_WINDOW}
             AND (nw * CAST(rev_c AS HUGEINT) - sw)
                 * (nw * CAST(rev_c AS HUGEINT) - sw) * (nw - 1)
                 > 9 * nw * (nw * qw - sw * sw) AS spc_outlier,
           MAX(x) OVER (PARTITION BY n_name ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - x AS dd_x,
           n_days
    FROM sig
)
SELECT n_name, day,
       CAST(rev_c AS DOUBLE) / 100.0 AS rev_usd,
       CAST(dod_c AS DOUBLE) / 100.0 AS dod_usd,
       ma_state, spc_outlier,
       CAST(dd_x AS DOUBLE) / (CAST(n_days AS DOUBLE) * 100.0)
           AS drawdown_usd
FROM enriched
WHERE day >= (SELECT MAX(day) FROM daily) - INTERVAL {HEALTH_DAYS - 1} DAY
ORDER BY n_name, day
"""


# ---------------------------------------------------------------------------
# Q252 — INTERVAL-UNION ISLANDS over VARIABLE-length activity spans: each
# event opens [ts, ts + dur) with a per-event duration derived from its
# value (exact integer seconds in [60, 3600]); overlapping/touching
# spans per user merge into maximal "islands" (total engaged-time
# blocks). This is the general interval-union operator — NOT gap
# sessionization (q27), which only looks at consecutive-event gaps: with
# variable durations an earlier event can outlast several later ones, so
# a new island starts only when an event's start exceeds the RUNNING MAX
# of all previous ends. One user-keyed window chain (running max →
# boundary flag → cumulative island id) + one keyed agg — single
# shuffle, the q27 scale shape. All arithmetic integer µs/seconds.
# ---------------------------------------------------------------------------

_ISLAND_MIN_S = 60
_ISLAND_MOD_S = 3541  # duration = 60 + |value*60| % 3541 -> [60, 3600]


def q252_interval_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    # NULL/NaN values (the corpus ships both — q08 counts them) pin to
    # duration 0 BEFORE the cast: Spark's non-ANSI NaN->long is 0 while
    # DuckDB's raises, so the guard is a determinism requirement.
    v = F.when(
        F.col("value").isNull() | F.isnan("value"), F.lit(0.0)
    ).otherwise(F.col("value"))
    # FLOOR(ABS(...)) explicitly: a bare double->BIGINT cast truncates
    # in Spark but ROUNDS half-even in DuckDB (the F6-F8 parity lesson).
    dur_us = (
        F.lit(_ISLAND_MIN_S)
        + F.pmod(F.floor(F.abs(v) * 60), F.lit(_ISLAND_MOD_S))
    ) * F.lit(1_000_000)
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    wprev = w.rowsBetween(Window.unboundedPreceding, -1)
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    spans = ev.select(
        "user_id",
        "event_id",
        us.alias("us"),
        (us + dur_us).alias("end_us"),
    )
    flagged = (
        spans.withColumn("prev_max_end", F.max("end_us").over(wprev))
        .withColumn(
            "new_island",
            F.when(
                F.col("prev_max_end").isNull()
                | (F.col("us") > F.col("prev_max_end")),
                1,
            ).otherwise(0),
        )
        .withColumn("island", F.sum("new_island").over(wcum))
    )
    return (
        flagged.groupBy("user_id", "island")
        .agg(
            F.min("us").alias("island_start_us"),
            F.max("end_us").alias("island_end_us"),
            F.count("*").cast("long").alias("n_events"),
        )
        .withColumn(
            "engaged_s",
            (
                (F.col("island_end_us") - F.col("island_start_us"))
                / F.lit(1_000_000)
            ).cast("long"),
        )
    )


Q252_SQL = f"""
WITH spans AS (
    SELECT user_id, event_id,
           epoch_us(CAST(ts AS TIMESTAMP)) AS us,
           epoch_us(CAST(ts AS TIMESTAMP))
             + ({_ISLAND_MIN_S}
                + (CAST(FLOOR(ABS(CASE WHEN value IS NULL OR isnan(value)
                                      THEN 0.0 ELSE value END) * 60)
                        AS BIGINT)
                   % {_ISLAND_MOD_S}))
               * 1000000 AS end_us
    FROM events
),
flagged AS (
    SELECT *,
           MAX(end_us) OVER (
               PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ) AS prev_max_end
    FROM spans
),
islands AS (
    SELECT *, SUM(CASE WHEN prev_max_end IS NULL OR us > prev_max_end
                       THEN 1 ELSE 0 END) OVER (
        PARTITION BY user_id ORDER BY us, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS island
    FROM flagged
)
SELECT user_id, CAST(island AS BIGINT) AS island,
       MIN(us) AS island_start_us,
       MAX(end_us) AS island_end_us,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       (MAX(end_us) - MIN(us)) // 1000000 AS engaged_s
FROM islands
GROUP BY user_id, island
"""


# ---------------------------------------------------------------------------
# Q265 — SLIDING-WINDOW RATE-LIMITER AUDIT: for every event, the count
# of the same user's events in the trailing 24 h (RANGE frame on epoch
# µs — the "last 24 hours ≠ last N rows" discipline q233 pins), flagged
# THROTTLED where the rolling count exceeds the quota; reported per
# user (events, throttled, peak rolling rate). This is the offline
# audit of an API rate limiter: which users would have been throttled,
# how often, and how hot their worst burst ran. One user-keyed RANGE
# window + one keyed agg — all integers; ties at the same microsecond
# are all inside the frame on both engines (RANGE semantics), so no
# tiebreak ambiguity exists.
# ---------------------------------------------------------------------------

_RATE_QUOTA = 3  # max events per trailing 24 h before throttling
_RATE_WINDOW_US = 86_400_000_000


def q265_rate_limiter_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("us"))
        .rangeBetween(-(_RATE_WINDOW_US - 1), 0)
    )
    rolled = ev.select("user_id", us.alias("us")).withColumn(
        "rolling", F.count("*").over(w)
    )
    return (
        rolled.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(
                (F.col("rolling") > _RATE_QUOTA).cast("int")
            ).cast("long").alias("n_throttled"),
            F.max("rolling").cast("long").alias("peak_rate"),
        )
        .orderBy("user_id")
    )


Q265_SQL = f"""
WITH rolled AS (
    SELECT user_id,
           CAST(COUNT(*) OVER (
               PARTITION BY user_id
               ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
               RANGE BETWEEN {_RATE_WINDOW_US - 1} PRECEDING
                         AND CURRENT ROW
           ) AS BIGINT) AS rolling
    FROM events
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN rolling > {_RATE_QUOTA} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_throttled,
       CAST(MAX(rolling) AS BIGINT) AS peak_rate
FROM rolled
GROUP BY user_id
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Q278 — MAX DRAWDOWN + UNDERWATER STREAKS per event_type: from the
# daily close series (q209's last-tick-of-day pick, (us, event_id)
# tiebreak), the running peak via a cumulative-max window, drawdown =
# peak − close (one IEEE subtraction of identical doubles on both
# engines — deterministic), plus how many days the series spent below
# its peak and the LONGEST consecutive underwater run (gaps-and-islands
# on the below-peak flag: island id = running count of at-peak days) —
# the risk triple every pacing/treasury dashboard shows.
#
# Plan: one keyed day agg + three frames over ONE (event_type, day)
# window partitioning + a small keyed island agg. Daily grain keeps
# every window partition calendar-bounded.
# ---------------------------------------------------------------------------


def q278_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
            F.struct(
                F.unix_micros(F.col("ts")).alias("us"),
                F.col("event_id").alias("event_id"),
                F.col("value").alias("v"),
            ).alias("tick"),
        )
        .groupBy("event_type", "day")
        .agg(F.max("tick")["v"].alias("close"))
    )
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_ord = Window.partitionBy("event_type").orderBy("day")
    marked = (
        daily.withColumn("peak", F.max("close").over(w))
        .withColumn("uw", (F.col("close") < F.col("peak")).cast("int"))
        .withColumn(
            "island",
            F.sum(1 - F.col("uw")).over(
                w_ord.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    streaks = (
        marked.where(F.col("uw") == 1)
        .groupBy("event_type", "island")
        .agg(F.count("*").alias("run"))
        .groupBy("event_type")
        .agg(F.max("run").cast("long").alias("max_underwater_days"))
    )
    base = marked.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days"),
        F.max(F.col("peak") - F.col("close")).alias("max_drawdown"),
        F.sum("uw").cast("long").alias("n_underwater_days"),
    )
    return (
        base.join(streaks, "event_type", "left")
        .select(
            "event_type",
            "n_days",
            "max_drawdown",
            "n_underwater_days",
            F.coalesce("max_underwater_days", F.lit(0))
            .cast("long")
            .alias("max_underwater_days"),
        )
        .orderBy("event_type")
    )


Q278_SQL = """
WITH daily AS (
    SELECT event_type,
           CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
           MAX({'us': epoch_us(CAST(ts AS TIMESTAMP)),
                'event_id': event_id, 'v': value}).v AS close
    FROM events
    GROUP BY 1, 2
),
marked AS (
    SELECT event_type, day, close,
           MAX(close) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
    FROM daily
),
flagged AS (
    SELECT *,
           CASE WHEN close < peak THEN 1 ELSE 0 END AS uw,
           SUM(CASE WHEN close < peak THEN 0 ELSE 1 END) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
    FROM marked
),
streaks AS (
    SELECT event_type, CAST(MAX(run) AS BIGINT) AS max_underwater_days
    FROM (
        SELECT event_type, island, COUNT(*) AS run
        FROM flagged WHERE uw = 1 GROUP BY 1, 2
    ) GROUP BY event_type
),
base AS (
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           MAX(peak - close) AS max_drawdown,
           CAST(SUM(uw) AS BIGINT) AS n_underwater_days
    FROM flagged GROUP BY event_type
)
SELECT b.event_type, b.n_days, b.max_drawdown, b.n_underwater_days,
       CAST(COALESCE(s.max_underwater_days, 0) AS BIGINT)
           AS max_underwater_days
FROM base b LEFT JOIN streaks s USING (event_type)
ORDER BY b.event_type
"""


# ---------------------------------------------------------------------------
# Q311 — MIX-SHIFT DECOMPOSITION: each nation's revenue change between
# the two date halves (q270's lazy midpoint anchor) split into a GROWTH
# effect (what the nation would have gained had it merely tracked the
# overall market: rev0·ΔR DIV R0, truncation pinned — it goes negative
# in a down market) and a MIX effect (the residual: genuine share gain
# or loss) — the decomposition behind every "did we grow or did the
# market?" review. Revenue is exact 1e-4 dollars (q305's integer cents
# × (100 − disc) product); Σ growth ≈ ΔR and Σ mix ≈ 0 within
# |nations| units of truncation slack, pinned by the property test.
# ---------------------------------------------------------------------------


def q311_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.col("o_custkey").alias("c_custkey"),
        F.col("o_orderdate").cast("date").alias("order_d"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_name").alias("nation"),
    )
    anchor = orders.groupBy().agg(
        F.min("order_d").alias("d0"), F.max("order_d").alias("d1")
    )
    rev = (
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
        * (
            100
            - (F.col("l_discount").cast("decimal(4,2)") * 100).cast("int")
        )
    ).alias("rev_e4")
    base = (
        li.select("l_orderkey", rev)
        .join(orders, "l_orderkey")
        .join(F.broadcast(cust), "c_custkey")
        .join(F.broadcast(nation), "c_nationkey")
        .crossJoin(F.broadcast(anchor))
        .select(
            "nation",
            F.when(
                F.datediff(F.col("order_d"), F.col("d0")) * 2
                < F.datediff(F.col("d1"), F.col("d0")),
                F.lit(0),
            )
            .otherwise(F.lit(1))
            .alias("half"),
            "rev_e4",
        )
    )
    per_nation = base.groupBy("nation").agg(
        F.sum(F.when(F.col("half") == 0, F.col("rev_e4")).otherwise(0))
        .cast("decimal(38,0)")
        .alias("rev0"),
        F.sum(F.when(F.col("half") == 1, F.col("rev_e4")).otherwise(0))
        .cast("decimal(38,0)")
        .alias("rev1"),
    )
    totals = per_nation.groupBy().agg(
        F.sum("rev0").alias("r0"), F.sum("rev1").alias("r1")
    )
    return (
        per_nation.crossJoin(F.broadcast(totals))
        .selectExpr(
            "nation",
            "CAST(rev0 AS BIGINT) AS rev0_e4",
            "CAST(rev1 AS BIGINT) AS rev1_e4",
            "CAST(rev1 - rev0 AS BIGINT) AS delta_e4",
            # growth at market rate; DIV truncates toward zero on both
            # engines' DECIMAL/HUGEINT paths for negative numerators.
            "CAST(rev0 * (r1 - r0) DIV r0 AS BIGINT) AS growth_e4",
            "CAST((rev1 - rev0) - (rev0 * (r1 - r0) DIV r0) AS BIGINT)"
            " AS mix_e4",
        )
        .orderBy("nation")
    )


Q311_SQL = """
WITH anchor AS (
    SELECT MIN(CAST(o_orderdate AS DATE)) AS d0,
           MAX(CAST(o_orderdate AS DATE)) AS d1
    FROM orders
),
base AS (
    SELECT n.n_name AS nation,
           CASE WHEN (CAST(o.o_orderdate AS DATE) - a.d0) * 2
                     < (a.d1 - a.d0) THEN 0 ELSE 1 END AS half,
           CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           * (100 - CAST(CAST(l.l_discount AS DECIMAL(4,2)) * 100 AS INT))
               AS rev_e4
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    CROSS JOIN anchor a
),
per_nation AS (
    SELECT nation,
           SUM(CASE WHEN half = 0 THEN CAST(rev_e4 AS HUGEINT) ELSE 0 END)
               AS rev0,
           SUM(CASE WHEN half = 1 THEN CAST(rev_e4 AS HUGEINT) ELSE 0 END)
               AS rev1
    FROM base GROUP BY 1
),
totals AS (SELECT SUM(rev0) AS r0, SUM(rev1) AS r1 FROM per_nation),
scored AS (
    SELECT nation, rev0, rev1,
           CASE WHEN rev0 * (r1 - r0) >= 0
                THEN rev0 * (r1 - r0) // r0
                ELSE -((-(rev0 * (r1 - r0))) // r0) END AS growth
    FROM per_nation CROSS JOIN totals
)
SELECT nation,
       CAST(rev0 AS BIGINT) AS rev0_e4,
       CAST(rev1 AS BIGINT) AS rev1_e4,
       CAST(rev1 - rev0 AS BIGINT) AS delta_e4,
       CAST(growth AS BIGINT) AS growth_e4,
       CAST((rev1 - rev0) - growth AS BIGINT) AS mix_e4
FROM scored
ORDER BY nation
"""


INSIGHTS_QUERIES = {
    "q252_interval_islands": q252_interval_islands,
    "q278_drawdown": q278_drawdown,
    "q311_mix_shift": q311_mix_shift,
    "q265_rate_limiter_audit": q265_rate_limiter_audit,
    "q216_market_basket": q216_market_basket,
    "q217_rfm_segments": q217_rfm_segments,
    "q218_discount_allocation": q218_discount_allocation,
    "q220_max_concurrency": q220_max_concurrency,
    "q221_name_neardup": q221_name_neardup,
    "q222_bitmap_distinct": q222_bitmap_distinct,
    "q223_compaction_planner": q223_compaction_planner,
    "q224_pacing_drawdown": q224_pacing_drawdown,
    "q225_l_diversity": q225_l_diversity,
    "q226_cohort_ltv": q226_cohort_ltv,
    "q227_ma_crossover": q227_ma_crossover,
    "q228_seasonal_backtest": q228_seasonal_backtest,
    "q229_clamped_balance": q229_clamped_balance,
    "q230_source_overlap": q230_source_overlap,
    "q232_fill_latency": q232_fill_latency,
    "q233_range_frame_window": q233_range_frame_window,
    "q235_cumulative_distinct": q235_cumulative_distinct,
    "q236_rake_keyphrases": q236_rake_keyphrases,
    "q239_next_order_affinity": q239_next_order_affinity,
    "q240_stickiness": q240_stickiness,
    "q241_revenue_bridge": q241_revenue_bridge,
    "q243_observed_audit": q243_observed_audit,
    "q244_pareto_frontier": q244_pareto_frontier,
    "q249_quarantine_routing": q249_quarantine_routing,
    "q250_daily_healthcheck": q250_daily_healthcheck,
}

INSIGHTS_ORACLES = {
    "q252_interval_islands": Q252_SQL,
    "q278_drawdown": Q278_SQL,
    "q311_mix_shift": Q311_SQL,
    "q265_rate_limiter_audit": Q265_SQL,
    "q216_market_basket": Q216_SQL,
    "q217_rfm_segments": Q217_SQL,
    "q218_discount_allocation": Q218_SQL,
    "q220_max_concurrency": Q220_SQL,
    "q221_name_neardup": Q221_SQL,
    "q222_bitmap_distinct": Q222_SQL,
    "q223_compaction_planner": Q223_SQL,
    "q224_pacing_drawdown": Q224_SQL,
    "q225_l_diversity": Q225_SQL,
    "q226_cohort_ltv": Q226_SQL,
    "q227_ma_crossover": Q227_SQL,
    "q228_seasonal_backtest": Q228_SQL,
    "q229_clamped_balance": Q229_SQL,
    "q230_source_overlap": Q230_SQL,
    "q232_fill_latency": Q232_SQL,
    "q233_range_frame_window": Q233_SQL,
    "q235_cumulative_distinct": Q235_SQL,
    "q236_rake_keyphrases": Q236_SQL,
    "q239_next_order_affinity": Q239_SQL,
    "q240_stickiness": Q240_SQL,
    "q241_revenue_bridge": Q241_SQL,
    "q243_observed_audit": Q243_SQL,
    "q244_pareto_frontier": Q244_SQL,
    "q249_quarantine_routing": Q249_SQL,
    "q250_daily_healthcheck": Q250_SQL,
}


# Moved to plans/stats.py in round 7 (module-size split); re-exported
# so existing test imports keep resolving.
from .stats import (  # noqa: E402,F401
    HI_BUCKET_C,
    KS_Y0,
    KS_Y1,
    VAR_PCT,
    _QMAP_Q,
    _US_PER_HOUR,
    q242_time_to_convert,
    q219_markov_transitions,
    q231_var_cvar,
    q237_weighted_median,
    q238_decile_lift,
    q245_ks_drift,
    q246_mann_whitney,
    q247_histogram_intersection,
    q248_control_chart,
    q256_km_survival,
    q266_quantile_mapping,
)
