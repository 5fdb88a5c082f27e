"""[EXT] Relational-surface extensions: multi-dimensional aggregation
(ROLLUP / CUBE / GROUPING SETS), set operations, pivot, and the temporal
joins (as-of, range) from operators/asof.py.

The reference uses none of these (SURVEY.md §2.4 "no grouping sets / cube /
rollup / pivot", §2.7 "no set operations", §2.3 "no as-of/range joins") —
they complete the query surface a warehouse user expects, each as a stock
Catalyst operator (Expand for grouping sets, hash joins for set ops) so the
100 TB story is the engine's own: one shuffle per aggregation, map-side
partial aggregation, AQE-coalesced partitions.

Grouping flags use ``grouping_id()`` — Spark and DuckDB both expose the
same first-column-is-MSB bitmask (verified empirically), so the oracle
compares it directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import SQL_DEC_SUM, dec_sum
from ..operators.asof import asof_join, range_join_buckets
from ..sources.tables import load_table

RANGE_SPAN_US = 6 * 3600 * 1_000_000  # 6-hour window for the range join


# ---------------------------------------------------------------------------
# Q31 — ROLLUP over lineitem: per (returnflag, linestatus), per returnflag,
# and grand total in one pass (Catalyst Expand => single shuffle).
# ---------------------------------------------------------------------------


def q31_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread=True: the ROLLUP's exact-decimal partial aggregation is
    # CPU-dense and the local corpus is a 1-file scan (guide §2.5);
    # measured 1.90s -> 1.11s at sf0.1, no-op at scale.
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_items"),
            dec_sum("l_quantity").alias("sum_qty"),
            dec_sum("l_extendedprice").alias("sum_price"),
            F.grouping_id().cast("long").alias("gid"),
        )
    )


Q31_SQL = f"""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_items,
       {SQL_DEC_SUM.format(x='l_quantity')} AS sum_qty,
       {SQL_DEC_SUM.format(x='l_extendedprice')} AS sum_price,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# ---------------------------------------------------------------------------
# Q32 — CUBE over orders: all 4 grouping combinations of status × priority.
# ---------------------------------------------------------------------------


def q32_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            dec_sum("o_totalprice").alias("total_price"),
            F.grouping_id().cast("long").alias("gid"),
        )
    )


Q32_SQL = f"""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       {SQL_DEC_SUM.format(x='o_totalprice')} AS total_price,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# ---------------------------------------------------------------------------
# Q33 — GROUPING SETS: two independent one-column aggregations of lineitem
# in one Expand pass instead of two scans + a union.
# ---------------------------------------------------------------------------


def q33_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"]], "l_returnflag", "l_linestatus"
        )
        .agg(
            F.count("*").alias("n_items"),
            dec_sum("l_discount").alias("sum_disc"),
            F.grouping_id().cast("long").alias("gid"),
        )
    )


Q33_SQL = f"""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_items,
       {SQL_DEC_SUM.format(x='l_discount')} AS sum_disc,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
"""


# ---------------------------------------------------------------------------
# Q34 — set operations over the customer/supplier nation domains:
# INTERSECT, EXCEPT (both directions), UNION, tagged and stacked.
# Distinct inputs are tiny (≤ #nations) so every branch is a cheap
# hash-aggregated join; the distincts themselves are map-side combined.
# ---------------------------------------------------------------------------


def q34_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_nationkey").alias("nationkey"))
        .distinct()
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .select(F.col("s_nationkey").alias("nationkey"))
        .distinct()
    )
    tag = lambda df, t: df.select(F.lit(t).alias("op"), "nationkey")  # noqa: E731
    return (
        tag(cust.intersect(supp), "intersect")
        .unionByName(tag(cust.subtract(supp), "cust_only"))
        .unionByName(tag(supp.subtract(cust), "supp_only"))
        .unionByName(tag(cust.union(supp).distinct(), "union"))
    )


Q34_SQL = """
WITH c AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
     s AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
SELECT 'intersect' AS op, nationkey FROM (SELECT nationkey FROM c INTERSECT SELECT nationkey FROM s)
UNION ALL
SELECT 'cust_only' AS op, nationkey FROM (SELECT nationkey FROM c EXCEPT SELECT nationkey FROM s)
UNION ALL
SELECT 'supp_only' AS op, nationkey FROM (SELECT nationkey FROM s EXCEPT SELECT nationkey FROM c)
UNION ALL
SELECT 'union' AS op, nationkey FROM (SELECT nationkey FROM c UNION SELECT nationkey FROM s)
"""


# ---------------------------------------------------------------------------
# Q35 — pivot: returnflag rows × linestatus columns, decimal-exact sums.
# Explicit pivot values keep the output schema static (no extra distinct
# scan, and a stable driver contract).
# ---------------------------------------------------------------------------


def q35_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(dec_sum("l_quantity"))
        .withColumnRenamed("F", "qty_f")
        .withColumnRenamed("O", "qty_o")
    )


Q35_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_linestatus = 'F'
                     THEN CAST(l_quantity AS DECIMAL(38,6)) END) AS DOUBLE) AS qty_f,
       CAST(SUM(CASE WHEN l_linestatus = 'O'
                     THEN CAST(l_quantity AS DECIMAL(38,6)) END) AS DOUBLE) AS qty_o
FROM lineitem
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Q36 — as-of join: for every purchase event, the user's most recent click
# at or before it (backward inclusive). Single shuffle on user_id via the
# union-and-window formulation (operators/asof.py).
# ---------------------------------------------------------------------------


def q36_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "us", F.unix_micros(F.col("ts"))
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("us").alias("purchase_us")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("us").alias("click_us"),
        F.col("value").alias("click_value"),
    )
    return asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_time="purchase_us",
        right_time="click_us",
        right_payload=["click_id", "click_value"],
        tiebreak="click_id",
    ).withColumnRenamed("matched_click_us", "last_click_us")


Q36_SQL = """
WITH p AS (
    SELECT user_id, event_id AS purchase_id,
           epoch_us(CAST(ts AS TIMESTAMP)) AS purchase_us
    FROM events WHERE event_type = 'purchase'
),
c AS (
    SELECT user_id, event_id AS click_id,
           epoch_us(CAST(ts AS TIMESTAMP)) AS click_us, value AS click_value
    FROM events WHERE event_type = 'click'
)
SELECT p.user_id, p.purchase_id, p.purchase_us,
       c.click_us AS last_click_us, c.click_id, c.click_value
FROM p ASOF LEFT JOIN c
  ON p.user_id = c.user_id AND c.click_us <= p.purchase_us
"""


# ---------------------------------------------------------------------------
# Q37 — range join: purchases within 6 h AFTER a view by the same user,
# aggregated per user. Bucketed-equi-join rewrite (operators/asof.py) keeps
# it shuffle-bounded instead of a per-key cross product.
# ---------------------------------------------------------------------------


def q37_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "us", F.unix_micros(F.col("ts"))
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", F.col("us").alias("view_us")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("us").alias("purchase_us")
    )
    pairs = range_join_buckets(
        views,
        purchases,
        on=["user_id"],
        left_time="view_us",
        right_time="purchase_us",
        span=RANGE_SPAN_US,
    )
    return pairs.groupBy("user_id").agg(
        F.count("*").alias("n_pairs"),
        F.sum(F.col("purchase_us") - F.col("view_us")).alias("total_gap_us"),
    )


Q37_SQL = f"""
WITH v AS (
    SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS view_us
    FROM events WHERE event_type = 'view'
),
p AS (
    SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS purchase_us
    FROM events WHERE event_type = 'purchase'
)
SELECT v.user_id, COUNT(*) AS n_pairs,
       CAST(SUM(p.purchase_us - v.view_us) AS BIGINT) AS total_gap_us
FROM v JOIN p
  ON v.user_id = p.user_id
 AND p.purchase_us >= v.view_us
 AND p.purchase_us - v.view_us <= {RANGE_SPAN_US}
GROUP BY v.user_id
"""


# ---------------------------------------------------------------------------
# Q43 — the canonical warehouse join pipeline: lineitem ⋈ orders ⋈ customer
# ⋈ nation ⋈ region, revenue rolled up by region/nation. The scale shape:
# the two big tables shuffle-join on orderkey; customer joins on the
# shuffled custkey; nation and region are broadcast. Revenue uses the
# exact-decimal recipe.
# ---------------------------------------------------------------------------


def q43_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    revenue = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias(
        "rev"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("r_name", "n_name", revenue)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_items"),
            dec_sum("rev").alias("revenue"),
        )
    )


Q43_SQL = f"""
SELECT r_name, n_name,
       COUNT(*) AS n_items,
       {SQL_DEC_SUM.format(x='l_extendedprice * (1.0 - l_discount)')} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


# ---------------------------------------------------------------------------
# Q44 — semi/anti join surface: customers WITH at least one 'F'-status
# order (left_semi) and customers WITHOUT any order at all (left_anti),
# tagged and stacked. Both plans are single broadcast/shuffle hash joins
# that never materialize the matched rows.
# ---------------------------------------------------------------------------


def q44_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders")
    with_f = c.join(
        o.where(F.col("o_orderstatus") == "F").select("o_custkey"),
        c.c_custkey == F.col("o_custkey"),
        "left_semi",
    ).select(F.lit("has_f_order").alias("op"), "c_custkey")
    without = c.join(
        o.select("o_custkey"), c.c_custkey == F.col("o_custkey"), "left_anti"
    ).select(F.lit("no_orders").alias("op"), "c_custkey")
    return with_f.unionByName(without)


Q44_SQL = """
SELECT 'has_f_order' AS op, c_custkey
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
UNION ALL
SELECT 'no_orders' AS op, c_custkey
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""




# ---------------------------------------------------------------------------
# Q49 — full outer join: daily click vs purchase activity; days with only
# one side survive with NULLs. Completes the outer-join surface (the
# reference uses inner joins only).
# ---------------------------------------------------------------------------


def q49_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = lambda t: (  # noqa: E731
        ev.where(F.col("event_type") == t)
        .groupBy(F.to_date("ts").alias("day"), F.col("user_id"))
        .agg(F.count("*").alias(f"n_{t}"))
    )
    clicks, purchases = daily("click"), daily("purchase")
    return (
        clicks.join(purchases, ["day", "user_id"], "full_outer")
        .select(
            "day",
            "user_id",
            F.coalesce("n_click", F.lit(0)).alias("n_click"),
            F.coalesce("n_purchase", F.lit(0)).alias("n_purchase"),
        )
    )


Q49_SQL = """
WITH c AS (
    SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, user_id,
           COUNT(*) AS n_click
    FROM events WHERE event_type = 'click' GROUP BY 1, 2
),
p AS (
    SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, user_id,
           COUNT(*) AS n_purchase
    FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
)
SELECT COALESCE(c.day, p.day) AS day,
       COALESCE(c.user_id, p.user_id) AS user_id,
       COALESCE(n_click, 0) AS n_click,
       COALESCE(n_purchase, 0) AS n_purchase
FROM c FULL OUTER JOIN p ON c.day = p.day AND c.user_id = p.user_id
"""


# ---------------------------------------------------------------------------
# Q50 — ranking-window trio: rank, dense_rank, ntile over a unique order
# key (o_totalprice ties broken by o_orderkey ⇒ deterministic on every
# engine). One shuffle on the partition key.
# ---------------------------------------------------------------------------


def q50_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc_nulls_last(), F.col("o_orderkey")
    )
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cdist"),
        )
        .where(F.col("rnk") <= 100)
    )


Q50_SQL = """
SELECT o_orderpriority, o_orderkey, o_totalprice, rnk, drnk, quartile,
       pct_rank, cdist
FROM (
    SELECT o_orderpriority, o_orderkey, o_totalprice,
           CAST(RANK() OVER w AS INT) AS rnk,
           CAST(DENSE_RANK() OVER w AS INT) AS drnk,
           CAST(NTILE(4) OVER w AS INT) AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC NULLS LAST, o_orderkey)
)
WHERE rnk <= 100
"""


# ---------------------------------------------------------------------------
# Q62 — UNPIVOT (the inverse of q35's pivot): wide per-priority metrics to
# long (priority, metric, value) via stack() — Spark's generator runs in
# the project, no shuffle beyond the source aggregate.
# ---------------------------------------------------------------------------


def q62_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderpriority").agg(
        F.count("*").cast("double").alias("n_orders"),
        dec_sum("o_totalprice").alias("sum_price"),
        F.max("o_totalprice").cast("double").alias("max_price"),
    )
    return wide.select(
        "o_orderpriority",
        F.expr(
            "stack(3, 'n_orders', n_orders, 'sum_price', sum_price, "
            "'max_price', max_price) AS (metric, value)"
        ),
    ).orderBy("o_orderpriority", "metric")


Q62_SQL = f"""
WITH wide AS (
    SELECT o_orderpriority,
           CAST(COUNT(*) AS DOUBLE) AS n_orders,
           {SQL_DEC_SUM.format(x='o_totalprice')} AS sum_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
    FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, metric, value FROM (
    SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS value FROM wide
    UNION ALL
    SELECT o_orderpriority, 'sum_price', sum_price FROM wide
    UNION ALL
    SELECT o_orderpriority, 'max_price', max_price FROM wide
)
ORDER BY o_orderpriority, metric
"""


# ---------------------------------------------------------------------------
# Q63 — Date-spine gap fill (the dbt calendar-spine pattern): a complete
# daily spine from min to max order date via sequence+explode, left-joined
# to the daily counts so quiet days appear as 0 instead of vanishing —
# what a trend chart or window over days needs. The spine is tiny (one row
# per day) and broadcast; the fact side aggregates before the join.
# ---------------------------------------------------------------------------


def q63_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count("*").alias("n_orders")
    )
    bounds = o.agg(
        F.min(F.to_date("o_orderdate")).alias("d0"),
        F.max(F.to_date("o_orderdate")).alias("d1"),
    )
    spine = bounds.select(
        F.explode(F.sequence("d0", "d1")).alias("day")
    )
    return (
        spine.join(daily, "day", "left")
        .select("day", F.coalesce("n_orders", F.lit(0)).alias("n_orders"))
        .orderBy("day")
    )


Q63_SQL = """
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n_orders
    FROM orders GROUP BY 1
),
spine AS (
    SELECT UNNEST(generate_series(
        (SELECT MIN(CAST(o_orderdate AS DATE)) FROM orders),
        (SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders),
        INTERVAL 1 DAY))::DATE AS day
)
SELECT spine.day, COALESCE(daily.n_orders, 0) AS n_orders
FROM spine LEFT JOIN daily ON spine.day = daily.day
ORDER BY spine.day
"""


# ---------------------------------------------------------------------------
# Q92 — Fuzzy (edit-distance) join with blocking: near-matching part names
# within a blocking key. The standard entity-resolution shape: distinct
# names first (dedup the entity table), equi-join on a cheap block key so
# candidate pairs are bounded per block, then the expensive levenshtein
# runs only inside blocks — never all-pairs. Both engines ship native
# levenshtein, so the oracle is exact.
#
# Scale shape: distinct-agg (one shuffle) then a block-key equi-join whose
# fan-out is the square of the block size, not the table size. At 100 TB
# the block key (here: the trailing token) is what keeps this tractable —
# the same pattern as the MinHash-LSH band join (q22).
# ---------------------------------------------------------------------------

_FUZZY_MAX_DIST = 2


def q92_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    names = p.select("p_name").distinct().select(
        F.col("p_name").alias("name"),
        F.element_at(F.split("p_name", " "), -1).alias("block"),
    )
    a = names.alias("a")
    b = names.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.name") < F.col("b.name")),
        )
        .where(
            F.levenshtein(F.col("a.name"), F.col("b.name")) <= _FUZZY_MAX_DIST
        )
        .select(
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            F.levenshtein(F.col("a.name"), F.col("b.name")).alias("dist"),
            F.col("a.block").alias("block"),
        )
        .orderBy("name_a", "name_b")
    )


Q92_SQL = f"""
WITH names AS (
    SELECT DISTINCT p_name AS name,
           string_split(p_name, ' ')[-1] AS block
    FROM part
)
SELECT a.name AS name_a, b.name AS name_b,
       CAST(levenshtein(a.name, b.name) AS INT) AS dist,
       a.block AS block
FROM names a JOIN names b
  ON a.block = b.block AND a.name < b.name
WHERE levenshtein(a.name, b.name) <= {_FUZZY_MAX_DIST}
ORDER BY name_a, name_b
"""


# ---------------------------------------------------------------------------
# Q170 — referential-integrity REPORT: per-relationship orphan counts
# and rates across the warehouse's FK edges (lineitem→orders,
# lineitem→part, lineitem→supplier, orders→customer, customer→nation,
# supplier→nation, nation→region) — the dbt `relationships` test
# (quality/checks.py) turned into a registered, oracle-checked query a
# monitoring job can schedule. Each edge is one LEFT ANTI join against
# the (broadcast-where-small) parent key set; rates are one exact-int
# division. Never a row-level full join: only key columns move.
# ---------------------------------------------------------------------------

_FK_EDGES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


def q170_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAZY union of seven one-row per-edge aggregates — building or
    explaining the report executes nothing (the previous form ran seven
    eager ``.first()`` jobs at plan-construction time and handed the
    guards a trivial LocalRelation, making the per-edge join shapes
    uninspectable). Each branch counts total and orphan rows in the SAME
    left-join pass over key columns only; the distinct parent key set is
    small for every edge, so AQE/broadcast applies per branch."""
    edge_frames = []
    for child, ck, parent, pk in _FK_EDGES:
        c = load_table(spark, sf_dir, child)
        p = load_table(spark, sf_dir, parent).select(
            F.col(pk).alias("__pk")
        ).distinct()
        edge_frames.append(
            c.select(F.col(ck).alias("__ck"))
            .join(p, F.col("__ck") == F.col("__pk"), "left")
            .agg(
                F.lit(f"{child}.{ck}->{parent}.{pk}").alias("relationship"),
                F.count("*").alias("n_rows"),
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col("__ck").isNotNull() & F.col("__pk").isNull(),
                            1,
                        ).otherwise(0)
                    ),
                    F.lit(0),
                ).cast("bigint").alias("n_orphans"),
            )
        )
    out = edge_frames[0]
    for frame in edge_frames[1:]:
        out = out.unionByName(frame)
    return out.select(
        "relationship",
        "n_rows",
        "n_orphans",
        (
            F.col("n_orphans").cast("double") / F.col("n_rows").cast("double")
        ).alias("orphan_rate"),
    )


_FK_UNION = "\nUNION ALL\n".join(
    f"""SELECT '{child}.{ck}->{parent}.{pk}' AS relationship,
       (SELECT COUNT(*) FROM {child}) AS n_rows,
       (SELECT COUNT(*) FROM {child} c
        WHERE c.{ck} IS NOT NULL
          AND c.{ck} NOT IN (SELECT {pk} FROM {parent})) AS n_orphans"""
    for child, ck, parent, pk in _FK_EDGES
)

Q170_SQL = f"""
WITH base AS (
{_FK_UNION}
)
SELECT relationship, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_orphans AS BIGINT) AS n_orphans,
       CAST(n_orphans AS DOUBLE) / CAST(n_rows AS DOUBLE) AS orphan_rate
FROM base
"""


# ---------------------------------------------------------------------------
# Q263 — RIGHT-TO-BE-FORGOTTEN BLAST-RADIUS audit: given a deletion
# request set (subjects = customers with c_custkey ≡ 0 mod 97 — a
# deterministic stand-in for an uploaded forget list), report how many
# rows each table loses when the delete CASCADES down the FK graph
# (customer → orders → lineitem, plus events keyed by the same subject
# id) — the planning report a data-platform team runs BEFORE executing
# a GDPR/CCPA erasure, sized per table with exact ppm shares. The
# cascade is pure semi-join algebra: subjects broadcast into orders,
# affected orderkeys semi-join into lineitem — one broadcast + one
# equi-join, no row is ever materialized twice. Output is
# metadata-sized (one row per table) at any corpus scale.
# ---------------------------------------------------------------------------

_FORGET_MOD = 97


def q263_forget_blast_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")
    subjects = c.where(
        F.col("c_custkey") % _FORGET_MOD == 0
    ).select("c_custkey")
    aff_orders = o.join(
        F.broadcast(subjects), o.o_custkey == subjects.c_custkey, "left_semi"
    )
    aff_orderkeys = aff_orders.select("o_orderkey")
    aff_lineitem = li.join(
        aff_orderkeys, li.l_orderkey == aff_orderkeys.o_orderkey, "left_semi"
    )
    aff_events = ev.join(
        F.broadcast(subjects), ev.user_id == subjects.c_custkey, "left_semi"
    )

    def _row(name: str, affected, total) -> DataFrame:
        a = affected.groupBy().agg(F.count("*").alias("affected_rows"))
        t = total.groupBy().agg(F.count("*").alias("total_rows"))
        return a.crossJoin(F.broadcast(t)).select(
            F.lit(name).alias("table_name"),
            F.col("affected_rows").cast("long"),
            F.col("total_rows").cast("long"),
            F.expr(
                "affected_rows * 1000000 div total_rows"
            ).alias("share_ppm"),
        )

    return (
        _row("customer", subjects, c)
        .unionByName(_row("orders", aff_orders, o))
        .unionByName(_row("lineitem", aff_lineitem, li))
        .unionByName(_row("events", aff_events, ev))
        .orderBy("table_name")
    )


Q263_SQL = f"""
WITH subjects AS (
    SELECT c_custkey FROM customer WHERE c_custkey % {_FORGET_MOD} = 0
),
aff_orders AS (
    SELECT o_orderkey FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM subjects)
),
rows_per AS (
    SELECT 'customer' AS table_name,
           (SELECT COUNT(*) FROM subjects) AS affected_rows,
           (SELECT COUNT(*) FROM customer) AS total_rows
    UNION ALL
    SELECT 'orders',
           (SELECT COUNT(*) FROM aff_orders),
           (SELECT COUNT(*) FROM orders)
    UNION ALL
    SELECT 'lineitem',
           (SELECT COUNT(*) FROM lineitem
            WHERE l_orderkey IN (SELECT o_orderkey FROM aff_orders)),
           (SELECT COUNT(*) FROM lineitem)
    UNION ALL
    SELECT 'events',
           (SELECT COUNT(*) FROM events
            WHERE user_id IN (SELECT c_custkey FROM subjects)),
           (SELECT COUNT(*) FROM events)
)
SELECT table_name, CAST(affected_rows AS BIGINT) AS affected_rows,
       CAST(total_rows AS BIGINT) AS total_rows,
       CAST(affected_rows AS BIGINT) * 1000000 // total_rows AS share_ppm
FROM rows_per
ORDER BY table_name
"""


# ---------------------------------------------------------------------------
# Q299 — AS-OF LATE-DATA BLAST RADIUS: how many of q36's as-of matches
# CHANGE when a late batch of clicks lands (deterministic fixture, the
# q189 precedent: clicks with event_id % 10 == 0 are "late")? Runs the
# identical backward-inclusive as-of join twice — without and with the
# late batch — and diffs the matched click per purchase with null-safe
# equality. THE number a backfill planner needs before re-running
# downstream attribution: if changed_ppm is tiny, patch incrementally;
# if large, recompute the window.
#
# Plan: two asof joins (operators/asof.py single-shuffle formulation)
# + one purchase-keyed equi-join + one 1-row agg.
# ---------------------------------------------------------------------------

_LATE_MOD = 10


def q299_asof_late_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "us", F.unix_micros(F.col("ts"))
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("us").alias("purchase_us"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("us").alias("click_us"),
    )
    on_time = clicks.where(F.col("click_id") % _LATE_MOD != 0)
    j_base = asof_join(
        purchases,
        on_time,
        on=["user_id"],
        left_time="purchase_us",
        right_time="click_us",
        right_payload=["click_id"],
        tiebreak="click_id",
    ).select("purchase_id", F.col("click_id").alias("base_click"))
    j_full = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_time="purchase_us",
        right_time="click_us",
        right_payload=["click_id"],
        tiebreak="click_id",
    ).select("purchase_id", F.col("click_id").alias("full_click"))
    diff = j_base.join(j_full, "purchase_id")
    return diff.groupBy().agg(
        F.count("*").cast("long").alias("n_purchases"),
        F.sum(F.col("base_click").isNotNull().cast("int"))
        .cast("long")
        .alias("n_matched_base"),
        F.sum(F.col("full_click").isNotNull().cast("int"))
        .cast("long")
        .alias("n_matched_full"),
        F.sum(
            (~F.col("base_click").eqNullSafe(F.col("full_click"))).cast(
                "int"
            )
        )
        .cast("long")
        .alias("n_changed"),
    ).selectExpr(
        "n_purchases",
        "n_matched_base",
        "n_matched_full",
        "n_changed",
        "CAST(n_changed * 1000000 DIV n_purchases AS BIGINT)"
        " AS changed_ppm",
    )


Q299_SQL = f"""
WITH p AS (
    SELECT user_id, event_id AS purchase_id,
           epoch_us(CAST(ts AS TIMESTAMP)) AS purchase_us
    FROM events WHERE event_type = 'purchase'
),
c AS (
    SELECT user_id, event_id AS click_id,
           epoch_us(CAST(ts AS TIMESTAMP)) AS click_us
    FROM events WHERE event_type = 'click'
),
jb AS (
    SELECT p.purchase_id, c.click_id AS base_click
    FROM p ASOF LEFT JOIN (
        SELECT * FROM c WHERE click_id % {_LATE_MOD} <> 0
    ) c ON p.user_id = c.user_id AND c.click_us <= p.purchase_us
),
jf AS (
    SELECT p.purchase_id, c.click_id AS full_click
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND c.click_us <= p.purchase_us
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(CASE WHEN base_click IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_matched_base,
       CAST(SUM(CASE WHEN full_click IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_matched_full,
       CAST(SUM(CASE WHEN base_click IS DISTINCT FROM full_click
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
       CAST(SUM(CASE WHEN base_click IS DISTINCT FROM full_click
                     THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
           AS changed_ppm
FROM jb JOIN jf USING (purchase_id)
"""


RELATIONAL_QUERIES = {
    "q299_asof_late_impact": q299_asof_late_impact,
    "q263_forget_blast_radius": q263_forget_blast_radius,
    "q31_rollup": q31_rollup,
    "q32_cube": q32_cube,
    "q33_grouping_sets": q33_grouping_sets,
    "q34_set_ops": q34_set_ops,
    "q35_pivot": q35_pivot,
    "q36_asof_join": q36_asof_join,
    "q37_range_join": q37_range_join,
    "q43_revenue_rollup": q43_revenue_rollup,
    "q44_semi_anti": q44_semi_anti,
    "q49_full_outer": q49_full_outer,
    "q50_ranking": q50_ranking,
    "q62_unpivot": q62_unpivot,
    "q63_date_spine": q63_date_spine,
    "q92_fuzzy_join": q92_fuzzy_join,
    "q170_fk_orphans": q170_fk_orphans,
}

RELATIONAL_ORACLES = {
    "q299_asof_late_impact": Q299_SQL,
    "q263_forget_blast_radius": Q263_SQL,
    "q31_rollup": Q31_SQL,
    "q32_cube": Q32_SQL,
    "q33_grouping_sets": Q33_SQL,
    "q34_set_ops": Q34_SQL,
    "q35_pivot": Q35_SQL,
    "q36_asof_join": Q36_SQL,
    "q37_range_join": Q37_SQL,
    "q43_revenue_rollup": Q43_SQL,
    "q44_semi_anti": Q44_SQL,
    "q49_full_outer": Q49_SQL,
    "q50_ranking": Q50_SQL,
    "q62_unpivot": Q62_SQL,
    "q63_date_spine": Q63_SQL,
    "q92_fuzzy_join": Q92_SQL,
    "q170_fk_orphans": Q170_SQL,
}
