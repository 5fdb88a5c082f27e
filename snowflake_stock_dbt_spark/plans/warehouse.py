"""Classic warehouse analytics (q82-q87): the TPC-H-shaped query family over
the ``lineitem``/``orders``/``customer``/``supplier``/``part``/``nation``/
``region`` star. The reference's analytics layer (sql/03_analytics_queries.sql)
is a single-fact dashboard; this module exercises the multi-fact shapes a
warehouse engine must also serve — wide aggregate scans, 3-way big-table
joins with dimension broadcasts, semi-join EXISTS, and argmax-by-aggregate.

Scale shapes (100 TB):
- q82 is a pure scan + 8-column hash aggregate over 6 groups: map-side
  partial aggregation reduces each task to a handful of rows; the shuffle is
  bytes, not gigabytes. The shipdate filter is pushed to the parquet scan.
- q83/q84 shuffle-join lineitem⋈orders on orderkey (the two big tables);
  customer joins on the already-shuffled custkey; nation/region broadcast.
  Selective date/segment filters are pushed below every join.
- q85 aggregates per supplier first (shuffle on suppkey), then finds the
  max revenue with a single-row broadcast join — no global sort.
- q86 is one conditional aggregate over a month of shipments (scan-only).
- q87 is a left-semi join (EXISTS): the probe side never materializes
  matched lineitem rows, and both sides are filtered before the join.

All money aggregates use the exact-decimal recipe
(:mod:`..functions.numeric`) so values are bit-identical cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import SQL_DEC_AVG, SQL_DEC_SUM, dec_avg, dec_sum
from ..sources.tables import load_table

# ---------------------------------------------------------------------------
# Q82 — pricing summary report (TPC-H Q1 shape): returnflag/linestatus
# rollup of quantity, gross/discounted/charged revenue, and means, over
# everything shipped up to a cutoff.
# ---------------------------------------------------------------------------

_Q82_CUTOFF = "1999-12-01 00:00:00"


def q82_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread=True: TPC-H-Q1-shaped exact-decimal aggregation over a
    # 1-file local scan (guide §2.5); measured 1.55s -> 1.11s at sf0.1.
    # The shipdate filter still reaches the scan (PushedFilters checked
    # in plans/r12).
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.to_timestamp(F.lit(_Q82_CUTOFF)))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity").alias("sum_qty"),
            dec_sum("l_extendedprice").alias("sum_base_price"),
            dec_sum(disc_price).alias("sum_disc_price"),
            dec_sum(charge).alias("sum_charge"),
            dec_avg("l_quantity").alias("avg_qty"),
            dec_avg("l_extendedprice").alias("avg_price"),
            dec_avg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q82_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {SQL_DEC_SUM.format(x='l_quantity')} AS sum_qty,
       {SQL_DEC_SUM.format(x='l_extendedprice')} AS sum_base_price,
       {SQL_DEC_SUM.format(x='l_extendedprice * (1.0 - l_discount)')}
           AS sum_disc_price,
       {SQL_DEC_SUM.format(x='l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)')}
           AS sum_charge,
       {SQL_DEC_AVG.format(x='l_quantity')} AS avg_qty,
       {SQL_DEC_AVG.format(x='l_extendedprice')} AS avg_price,
       {SQL_DEC_AVG.format(x='l_discount')} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_Q82_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Q83 — shipping priority (TPC-H Q3 shape): top-10 unshipped-revenue orders
# for one market segment around a pivot date.
# ---------------------------------------------------------------------------

_Q83_SEGMENT = "BUILDING"
_Q83_DATE = "1998-06-01 00:00:00"


def q83_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pivot = F.to_timestamp(F.lit(_Q83_DATE))
    revenue = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias(
        "rev"
    )
    return (
        li.where(F.col("l_shipdate") > pivot)
        .join(
            o.where(F.col("o_orderdate") < pivot),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            # The filtered segment is 1/5 of an already-small dimension —
            # broadcast it so the big join output never reshuffles.
            F.broadcast(c.where(F.col("c_mktsegment") == _Q83_SEGMENT)),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("l_orderkey", "o_orderdate", "o_orderpriority", revenue)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dec_sum("rev").alias("revenue"))
        # l_orderkey is unique per group: a deterministic LIMIT tiebreaker.
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


Q83_SQL = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       {SQL_DEC_SUM.format(x='l_extendedprice * (1.0 - l_discount)')} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = '{_Q83_SEGMENT}'
  AND o_orderdate < TIMESTAMP '{_Q83_DATE}'
  AND l_shipdate  > TIMESTAMP '{_Q83_DATE}'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Q84 — local supplier volume (TPC-H Q5 shape): revenue where customer and
# supplier share a nation, rolled up by nation within one region and one
# order-year.
# ---------------------------------------------------------------------------

_Q84_REGION = "ASIA"
_Q84_FROM = "1996-01-01 00:00:00"
_Q84_TO = "1997-01-01 00:00:00"


def q84_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    revenue = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias(
        "rev"
    )
    return (
        li.join(
            o.where(
                (F.col("o_orderdate") >= F.to_timestamp(F.lit(_Q84_FROM)))
                & (F.col("o_orderdate") < F.to_timestamp(F.lit(_Q84_TO)))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        # supplier is dimension-sized here; the local-supplier condition
        # (c_nationkey = s_nationkey) rides on the broadcast equi-join.
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(r.where(F.col("r_name") == _Q84_REGION)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_name", revenue)
        .groupBy("n_name")
        .agg(dec_sum("rev").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


Q84_SQL = f"""
SELECT n_name,
       {SQL_DEC_SUM.format(x='l_extendedprice * (1.0 - l_discount)')} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = '{_Q84_REGION}'
  AND o_orderdate >= TIMESTAMP '{_Q84_FROM}'
  AND o_orderdate <  TIMESTAMP '{_Q84_TO}'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# ---------------------------------------------------------------------------
# Q85 — top supplier(s) (TPC-H Q15 shape): suppliers whose shipped revenue
# in a quarter equals the maximum. The argmax is a 1-row broadcast join
# against the per-supplier aggregate — no global sort, no window over the
# whole table.
# ---------------------------------------------------------------------------

_Q85_FROM = "1997-01-01 00:00:00"
_Q85_TO = "1997-04-01 00:00:00"


def q85_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        li.where(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit(_Q85_FROM)))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit(_Q85_TO)))
        )
        .groupBy("l_suppkey")
        .agg(
            dec_sum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
            ).alias("total_revenue")
        )
    )
    top = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.join(F.broadcast(top), rev.total_revenue == top.max_revenue)
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q85_SQL = f"""
WITH rev AS (
    SELECT l_suppkey,
           {SQL_DEC_SUM.format(x='l_extendedprice * (1.0 - l_discount)')}
               AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '{_Q85_FROM}'
      AND l_shipdate <  TIMESTAMP '{_Q85_TO}'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# Q86 — promotion revenue share (TPC-H Q14 shape): percent of one month's
# discounted revenue attributable to PROMO-type parts. One conditional
# aggregate; part joins by broadcast.
# ---------------------------------------------------------------------------

_Q86_FROM = "1998-03-01 00:00:00"
_Q86_TO = "1998-04-01 00:00:00"


def q86_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0))
    return (
        li.where(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit(_Q86_FROM)))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit(_Q86_TO)))
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (F.lit(100.0) * dec_sum(promo) / dec_sum(disc)).alias(
                "promo_revenue_pct"
            ),
            F.count("*").alias("n_items"),
        )
    )


Q86_SQL = f"""
SELECT 100.0 * {SQL_DEC_SUM.format(
    x="CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END"
)}
     / {SQL_DEC_SUM.format(x='l_extendedprice * (1.0 - l_discount)')}
       AS promo_revenue_pct,
       COUNT(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '{_Q86_FROM}'
  AND l_shipdate <  TIMESTAMP '{_Q86_TO}'
"""


# ---------------------------------------------------------------------------
# Q87 — late-shipment priority backlog (TPC-H Q4 shape): orders in a
# quarter having at least one line shipped more than 60 days after the
# order date, counted by priority. The EXISTS is a left-semi join: matched
# lineitem rows are never materialized.
# ---------------------------------------------------------------------------

_Q87_FROM = "1996-07-01 00:00:00"
_Q87_TO = "1996-10-01 00:00:00"
_Q87_LATE_DAYS = 60


def q87_priority_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    window = o.where(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit(_Q87_FROM)))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit(_Q87_TO)))
    )
    late = window.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {_Q87_LATE_DAYS} DAYS")
        ),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q87_SQL = f"""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '{_Q87_FROM}'
  AND o_orderdate <  TIMESTAMP '{_Q87_TO}'
  AND EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL {_Q87_LATE_DAYS} DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q91 — Incremental aggregate maintenance: the per-type events aggregate is
# maintained as BASE (history before the cutoff) merged with DELTA (the new
# batch) — never re-scanning history. The oracle is the full recompute, so
# a green row *proves* merge(base, delta) == full, bit-identical (exact
# decimal sums make the merge batching-independent).
# ---------------------------------------------------------------------------

_Q91_CUTOFF = "2024-01-20 00:00:00"


def q91_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.incremental import (
        finalize,
        merge_partials,
        partial_aggregate,
    )

    ev = load_table(spark, sf_dir, "events")
    cutoff = F.to_timestamp(F.lit(_Q91_CUTOFF))
    base = partial_aggregate(
        ev.where(F.col("ts") < cutoff), ["event_type"], "value"
    )
    delta = partial_aggregate(
        ev.where(F.col("ts") >= cutoff), ["event_type"], "value"
    )
    merged = merge_partials(["event_type"], base, delta)
    return finalize(merged, ["event_type"]).orderBy("event_type")


Q91_SQL = """
SELECT event_type,
       COUNT(value) AS n_rows,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
           / CAST(COUNT(value) AS DOUBLE) AS mean,
       MIN(value) AS min_val,
       MAX(value) AS max_val
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Q96 — bilateral trade volume (TPC-H Q7 shape): shipped revenue between
# two nations, both directions, by ship-year. Two nation-filtered
# dimension broadcasts bracket the lineitem⋈orders shuffle join.
# ---------------------------------------------------------------------------

_Q96_NATION_A = "NATION_1"
_Q96_NATION_B = "NATION_2"


def q96_bilateral_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    pair = n.where(F.col("n_name").isin(_Q96_NATION_A, _Q96_NATION_B))
    supp = s.join(
        F.broadcast(pair), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust = c.join(
        F.broadcast(pair), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("ship_year"),
            (
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
            ).alias("rev"),
        )
        .groupBy("supp_nation", "cust_nation", "ship_year")
        .agg(dec_sum("rev").alias("revenue"), F.count("*").alias("n_items"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


Q96_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS ship_year,
       {SQL_DEC_SUM.format(x='l_extendedprice * (1.0 - l_discount)')} AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name IN ('{_Q96_NATION_A}', '{_Q96_NATION_B}')
  AND n2.n_name IN ('{_Q96_NATION_A}', '{_Q96_NATION_B}')
  AND n1.n_name <> n2.n_name
GROUP BY supp_nation, cust_nation, ship_year
ORDER BY supp_nation, cust_nation, ship_year
"""


# ---------------------------------------------------------------------------
# Q97 — returned-item revenue report (TPC-H Q10 shape): customers ranked
# by revenue lost to returns in one quarter, top 20 with their nation.
# ---------------------------------------------------------------------------

_Q97_FROM = "1997-04-01 00:00:00"
_Q97_TO = "1997-07-01 00:00:00"


def q97_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.where(F.col("l_returnflag") == "R")
        .join(
            o.where(
                (F.col("o_orderdate") >= F.to_timestamp(F.lit(_Q97_FROM)))
                & (F.col("o_orderdate") < F.to_timestamp(F.lit(_Q97_TO)))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation"),
            (
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
            ).alias("rev"),
        )
        .groupBy("c_custkey", "c_name", "nation")
        .agg(dec_sum("rev").alias("lost_revenue"))
        .orderBy(F.col("lost_revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


Q97_SQL = f"""
SELECT c_custkey, c_name, n_name AS nation,
       {SQL_DEC_SUM.format(x='l_extendedprice * (1.0 - l_discount)')}
           AS lost_revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '{_Q97_FROM}'
  AND o_orderdate <  TIMESTAMP '{_Q97_TO}'
GROUP BY c_custkey, c_name, n_name
ORDER BY lost_revenue DESC, c_custkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q98 — large-volume orders (TPC-H Q18 shape): orders whose total quantity
# exceeds a threshold, with their customer. The HAVING runs on the
# pre-join aggregate of lineitem (groupBy orderkey), so only qualifying
# orderkeys reach the join — the aggregate-then-join ordering that matters
# at 100 TB.
# ---------------------------------------------------------------------------

_Q98_MIN_QTY = 250.0


def q98_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dec_sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > _Q98_MIN_QTY)
    )
    return (
        big.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
        .orderBy(
            F.col("o_totalprice").desc(), F.col("o_orderdate"), F.col("o_orderkey")
        )
        .limit(100)
    )


Q98_SQL = f"""
WITH big AS (
    SELECT l_orderkey,
           {SQL_DEC_SUM.format(x='l_quantity')} AS total_qty
    FROM lineitem GROUP BY l_orderkey
    HAVING {SQL_DEC_SUM.format(x='l_quantity')} > {_Q98_MIN_QTY}
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM big
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Q100 — Salted two-stage aggregation: the hot-key rewrite (stage 1 groups
# by (key, salt) to spread a skewed key over n reducers; stage 2 merges
# partials by key), oracle-checked equal to the direct GROUP BY. The
# decimal partial sums make the merge batching-independent, so salting
# cannot change a single bit of the result — exactly the property that
# makes the rewrite safe to deploy against skew at 100 TB. Measured
# skew evidence lives in bench_skew.py; this query pins the semantics.
# ---------------------------------------------------------------------------


def q100_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.numeric import DEC
    from ..operators.skew import salted_aggregate

    ev = load_table(spark, sf_dir, "events")
    out = salted_aggregate(
        ev,
        keys=["event_type"],
        partial_aggs={
            "n_events": F.count("*"),
            "total_dec": F.sum(F.col("value").cast(DEC)),
            "max_value": F.max("value"),
        },
        merge_aggs={
            "n_events": F.sum,
            "total_dec": F.sum,
            "max_value": F.max,
        },
    )
    return out.select(
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("total_dec").cast("double").alias("total_value"),
        "max_value",
    ).orderBy("event_type")


Q100_SQL = f"""
SELECT event_type,
       COUNT(*) AS n_events,
       {SQL_DEC_SUM.format(x='value')} AS total_value,
       MAX(value) AS max_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Q103 — customer order-count distribution (TPC-H Q13 shape): LEFT join so
# zero-order customers count, then a distribution-of-counts second
# aggregation. Two keyed aggregations, no window.
# ---------------------------------------------------------------------------


def q103_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q103_SQL = """
WITH per_cust AS (
    SELECT c_custkey, COUNT(o_orderkey) AS c_count
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ---------------------------------------------------------------------------
# Q104 — small-quantity-order revenue (TPC-H Q17 shape): lineitems whose
# quantity is under 20% of their part's average, summed. The per-part
# average is a keyed aggregate joined back — never a correlated subquery
# per row. NO broadcast hint: avg_qty has |part| cardinality (billions of
# rows at 100 TB), so the correct plan is the classic Q17
# aggregate-then-shuffle-join — the agg already hash-partitions avg_qty
# on the join key, so the join adds only the lineitem-side shuffle, and
# AQE is free to downgrade to broadcast at small scale.
# ---------------------------------------------------------------------------


def q104_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    avg_qty = li.groupBy(F.col("l_partkey").alias("p_key")).agg(
        dec_avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(avg_qty, li.l_partkey == avg_qty.p_key)
        .where(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            (dec_sum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"),
            F.count("*").alias("n_items"),
        )
    )


Q104_SQL = f"""
WITH avg_qty AS (
    SELECT l_partkey AS p_key,
           {SQL_DEC_AVG.format(x='l_quantity')} AS avg_qty
    FROM lineitem GROUP BY l_partkey
)
SELECT {SQL_DEC_SUM.format(x='l_extendedprice')} / 7.0 AS avg_yearly,
       COUNT(*) AS n_items
FROM lineitem JOIN avg_qty ON l_partkey = p_key
WHERE l_quantity < 0.2 * avg_qty
"""


# ---------------------------------------------------------------------------
# Q105 — dormant high-value customers (TPC-H Q22 shape): above-average-
# balance customers with NO orders since a cutoff, counted by nation.
# Global average via the 1-row broadcast; the "no recent orders" is a
# left-anti join against the date-filtered orders (every customer in this
# corpus has SOME order, so the classic no-orders-ever form is empty —
# the dormancy window keeps the anti-join meaningful).
# ---------------------------------------------------------------------------

_Q105_SINCE = "2000-01-01 00:00:00"


def q105_prospects(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    pos = c.where(F.col("c_acctbal") > 0.0)
    avg_bal = pos.agg(dec_avg("c_acctbal").alias("avg_bal"))
    recent = o.where(
        F.col("o_orderdate") >= F.to_timestamp(F.lit(_Q105_SINCE))
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            dec_sum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("n_name")
    )


Q105_SQL = f"""
SELECT n_name,
       COUNT(*) AS numcust,
       {SQL_DEC_SUM.format(x='c_acctbal')} AS totacctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (
        SELECT {SQL_DEC_AVG.format(x='c_acctbal')}
        FROM customer WHERE c_acctbal > 0.0
      )
  AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '{_Q105_SINCE}'
      )
GROUP BY n_name
ORDER BY n_name
"""


# ---------------------------------------------------------------------------
# Q119 — supplier-count distribution per part attribute (TPC-H Q16 shape;
# partsupp stands in as DISTINCT (l_partkey, l_suppkey) from lineitem).
# The excluded-supplier subquery is a LEFT ANTI join (NOT EXISTS — never a
# per-row NOT IN rewrite), part is broadcast.
# ---------------------------------------------------------------------------

_Q119_SIZES = [1, 9, 14, 19, 23, 36, 45, 49]


def q119_supplier_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    sup = load_table(spark, sf_dir, "supplier")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    excluded = sup.where(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    pf = p.where(
        (F.col("p_brand") != "Brand#13")
        & ~F.col("p_type").startswith("PROMO")
        & F.col("p_size").isin(_Q119_SIZES)
    )
    return (
        ps.join(excluded, "l_suppkey", "left_anti")
        .join(F.broadcast(pf), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), "p_brand", "p_type", "p_size"
        )
    )


Q119_SQL = f"""
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#13'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN ({", ".join(str(x) for x in _Q119_SIZES)})
  AND NOT EXISTS (
      SELECT 1 FROM supplier
      WHERE s_suppkey = ps.l_suppkey AND s_acctbal < 0
  )
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# Q120 — disjunctive-predicate revenue (TPC-H Q19 shape): three OR'd
# brand/size/quantity bands. Catalyst pushes the common part of the
# disjunction into the broadcast join; revenue is the exact-decimal sum.
# ---------------------------------------------------------------------------


def q120_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    band = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return j.where(band).agg(
        dec_sum(rev).alias("revenue"),
        F.count("*").alias("n_lineitems"),
    )


Q120_SQL = f"""
SELECT {SQL_DEC_SUM.format(x='l_extendedprice * (1.0 - l_discount)')} AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


# ---------------------------------------------------------------------------
# Q121 — nation market share per year within a region (TPC-H Q8 shape):
# both nation ROLES (supplier nation = numerator, customer nation filters
# the region). Share = exact-decimal conditional sum / exact-decimal sum,
# divided once in IEEE double.
# ---------------------------------------------------------------------------

_Q121_REGION = "ASIA"
_Q121_NATION = "NATION_7"


def q121_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("rev")
    base = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(
            F.broadcast(r.where(F.col("r_name") == _Q121_REGION)),
            F.col("cn_region") == F.col("r_regionkey"),
        )
        .select(F.year("o_orderdate").alias("o_year"), "supp_nation", rev)
    )
    return (
        base.groupBy("o_year")
        .agg(
            dec_sum(F.when(F.col("supp_nation") == _Q121_NATION, F.col("rev"))).alias(
                "nation_rev"
            ),
            dec_sum("rev").alias("total_rev"),
        )
        .select(
            "o_year",
            (F.coalesce(F.col("nation_rev"), F.lit(0.0)) / F.col("total_rev")).alias(
                "mkt_share"
            ),
        )
        .orderBy("o_year")
    )


Q121_SQL = f"""
WITH base AS (
    SELECT EXTRACT(year FROM o_orderdate) AS o_year,
           sn.n_name AS supp_nation,
           l_extendedprice * (1.0 - l_discount) AS rev
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN region ON cn.n_regionkey = r_regionkey
    WHERE r_name = '{_Q121_REGION}'
)
SELECT CAST(o_year AS INT) AS o_year,
       COALESCE({SQL_DEC_SUM.format(x=f"CASE WHEN supp_nation = '{_Q121_NATION}' THEN rev END")}, 0.0)
       / {SQL_DEC_SUM.format(x='rev')} AS mkt_share
FROM base
GROUP BY o_year
ORDER BY o_year
"""


# ---------------------------------------------------------------------------
# Q122 — profit per supplier nation per year (TPC-H Q9 shape; cost
# surrogate 0.1 * p_retailprice * l_quantity since the corpus has no
# partsupp). Exact-decimal sum of a signed amount.
# ---------------------------------------------------------------------------


def q122_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    sup = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    p = load_table(spark, sf_dir, "part")
    amount = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        - F.lit(0.1) * F.col("p_retailprice") * F.col("l_quantity")
    ).alias("amount")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select("n_name", F.year("o_orderdate").alias("o_year"), amount)
        .groupBy("n_name", "o_year")
        .agg(dec_sum("amount").alias("profit"))
        .orderBy("n_name", F.desc("o_year"))
    )


Q122_SQL = f"""
SELECT n_name, CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
       {SQL_DEC_SUM.format(x='l_extendedprice * (1.0 - l_discount) - 0.1 * p_retailprice * l_quantity')} AS profit
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN part ON l_partkey = p_partkey
GROUP BY n_name, o_year
ORDER BY n_name, o_year DESC
"""


# ---------------------------------------------------------------------------
# Q123 — shipping-delay distribution per priority class (TPC-H Q12 shape;
# the corpus has no l_shipmode/l_commitdate, so the bins are ship-lag
# days). COUNT_IF split into high/low priority, integer-exact.
# ---------------------------------------------------------------------------


def q123_ship_delay_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bin_col = (
        F.when(lag <= 30, "0-30")
        .when(lag <= 90, "31-90")
        .otherwise("90+")
        .alias("ship_lag_bin")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(bin_col, high.alias("is_high"))
        .groupBy("ship_lag_bin")
        .agg(
            F.sum(F.when(F.col("is_high"), 1).otherwise(0))
            .cast("long")
            .alias("high_line_count"),
            F.sum(F.when(F.col("is_high"), 0).otherwise(1))
            .cast("long")
            .alias("low_line_count"),
        )
        .orderBy("ship_lag_bin")
    )


Q123_SQL = """
SELECT CASE WHEN CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE) <= 30
            THEN '0-30'
            WHEN CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE) <= 90
            THEN '31-90'
            ELSE '90+' END AS ship_lag_bin,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
ORDER BY ship_lag_bin
"""


# ---------------------------------------------------------------------------
# Q124 — sole late supplier on multi-supplier orders (TPC-H Q21 shape;
# lateness surrogate: shipped > 90 days after order date). Per-order
# distinct/late supplier counts replace the correlated EXISTS / NOT
# EXISTS pair — one keyed agg instead of two correlated scans.
# ---------------------------------------------------------------------------


def q124_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    sup = load_table(spark, sf_dir, "supplier")
    late = F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 90
    ls = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("l_orderkey", "l_suppkey", late.alias("is_late"))
        .distinct()
    )
    per_order = ls.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
            "n_late"
        ),
    )
    return (
        ls.where(F.col("is_late"))
        .join(
            per_order.where((F.col("n_supp") > 1) & (F.col("n_late") == 1)),
            "l_orderkey",
        )
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


Q124_SQL = """
WITH ls AS (
    SELECT DISTINCT l_orderkey, l_suppkey,
           (CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE) > 90) AS is_late
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
per_order AS (
    SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT CASE WHEN is_late THEN l_suppkey END) AS n_late
    FROM ls GROUP BY 1
)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM ls
JOIN per_order USING (l_orderkey)
JOIN supplier ON l_suppkey = s_suppkey
WHERE ls.is_late AND per_order.n_supp > 1 AND per_order.n_late = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q135–Q138 — the four TPC-H shapes that closed out the 22 (round 4):
# Q6, Q2, Q11, Q20. The corpus ships no ``partsupp`` table, so the three
# catalog-shaped queries derive their part–supplier facts from lineitem
# (unit cost = min extendedprice/quantity observed for the pair; availqty
# analog = shipped quantity) — the SHAPES (decorrelated per-group argmin,
# global-fraction HAVING, nested semi-join chains) are the TPC-H ones,
# which is what the engine must prove it plans well.
# ---------------------------------------------------------------------------

_Q135_FROM = "1996-01-01 00:00:00"
_Q135_TO = "1997-01-01 00:00:00"


def q135_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: revenue delta from discount forecasting — a pure
    scan + one unconditional aggregate; every predicate (date range,
    discount band, quantity cap) pushes to the parquet scan, and the
    shuffle is one partial-aggregated row per task."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit(_Q135_FROM)))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit(_Q135_TO)))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dec_sum(
                F.col("l_extendedprice") * F.col("l_discount")
            ).alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


Q135_SQL = f"""
SELECT {SQL_DEC_SUM.format(x='l_extendedprice * l_discount')} AS revenue,
       COUNT(*) AS n_lineitems
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{_Q135_FROM}'
  AND l_shipdate < TIMESTAMP '{_Q135_TO}'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


_Q136_REGION = "ASIA"
_Q136_SIZE_MAX = 15


def q136_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each small part, the cheapest supplier in one
    region — the correlated MIN subquery DECORRELATED into one keyed
    aggregation + an argmin join-back (min over struct(cost, suppkey):
    exact lexicographic tie-break, no window over the whole catalog).
    Unit cost is the pair's min observed extendedprice/quantity (both
    engines evaluate the identical correctly-rounded division, so the
    argmin is deterministic). Dims broadcast; the only big shuffle keys
    on (partkey, suppkey)."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = load_table(spark, sf_dir, "part")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region")
    rsup = (
        su.join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .where(F.col("r_name") == _Q136_REGION)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cost = (
        li.join(F.broadcast(rsup.select("s_suppkey")),
                li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(
                F.col("l_extendedprice") / F.col("l_quantity")
            ).alias("unit_cost")
        )
    )
    best = cost.groupBy("l_partkey").agg(
        F.min(F.struct("unit_cost", "l_suppkey")).alias("m")
    ).select(
        "l_partkey",
        F.col("m.unit_cost").alias("unit_cost"),
        F.col("m.l_suppkey").alias("l_suppkey"),
    )
    return (
        best.join(
            F.broadcast(
                pa.where(F.col("p_size") <= _Q136_SIZE_MAX).select(
                    "p_partkey", "p_name", "p_size"
                )
            ),
            best.l_partkey == F.col("p_partkey"),
        )
        .join(F.broadcast(rsup), best.l_suppkey == rsup.s_suppkey)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            "unit_cost",
        )
        .orderBy(
            F.desc("s_acctbal"), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


Q136_SQL = f"""
WITH rsup AS (
    SELECT s_suppkey, s_name, s_acctbal, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = '{_Q136_REGION}'
),
cost AS (
    SELECT l_partkey, l_suppkey,
           MIN(l_extendedprice / l_quantity) AS unit_cost
    FROM lineitem
    WHERE l_suppkey IN (SELECT s_suppkey FROM rsup)
    GROUP BY 1, 2
),
best AS (
    SELECT l_partkey, unit_cost, l_suppkey FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY l_partkey ORDER BY unit_cost, l_suppkey
        ) AS rn
        FROM cost
    ) WHERE rn = 1
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
FROM best
JOIN part ON p_partkey = l_partkey AND p_size <= {_Q136_SIZE_MAX}
JOIN rsup ON s_suppkey = l_suppkey
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


_Q137_NATION = "NATION_3"
_Q137_FRACTION = 0.002


def q137_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose shipped value through one nation's
    suppliers exceeds a fraction of that nation's total — a keyed
    aggregate HAVING-filtered against a 1-row global aggregate
    (broadcast, the q03 two-pass pattern; never a global window). Both
    sides use the exact-decimal recipe so the threshold comparison is
    bit-identical cross-engine."""
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    nsup = (
        su.join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .where(F.col("n_name") == _Q137_NATION)
        .select("s_suppkey")
    )
    value = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    nli = li.join(F.broadcast(nsup), li.l_suppkey == nsup.s_suppkey)
    per_part = nli.groupBy("l_partkey").agg(dec_sum(value).alias("part_value"))
    total = nli.agg(dec_sum(value).alias("total_value"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(
            F.col("part_value") > F.col("total_value") * F.lit(_Q137_FRACTION)
        )
        .select("l_partkey", "part_value")
        .orderBy(F.desc("part_value"), "l_partkey")
    )


_Q137_VALUE = "l_extendedprice * (1.0 - l_discount)"

Q137_SQL = f"""
WITH nsup AS (
    SELECT s_suppkey FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = '{_Q137_NATION}'
),
nli AS (
    SELECT l_partkey, {_Q137_VALUE} AS v
    FROM lineitem WHERE l_suppkey IN (SELECT s_suppkey FROM nsup)
),
total AS (SELECT {SQL_DEC_SUM.format(x='v')} AS total_value FROM nli)
SELECT l_partkey, {SQL_DEC_SUM.format(x='v')} AS part_value
FROM nli
GROUP BY l_partkey
HAVING {SQL_DEC_SUM.format(x='v')} >
       (SELECT total_value FROM total) * {_Q137_FRACTION}
ORDER BY part_value DESC, l_partkey
"""


_Q138_PREFIX = "small"
_Q138_SHARE = 0.15


def q138_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who dominate supply of a name-filtered
    part family (shipped > 15% of a part's corpus-wide quantity; this
    corpus spreads suppliers near-uniformly, max pair share ≈0.23, so
    Q20's 50% cut would be vacuous) — the nested IN/EXISTS chains
    decorrelated into two keyed aggregations, a threshold join on
    partkey, and a final LEFT-SEMI join onto supplier (+ its nation for
    the report). Quantity sums are integral-valued doubles, so the
    share comparison is exact everywhere."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = load_table(spark, sf_dir, "part")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    fam = pa.where(F.col("p_name").startswith(_Q138_PREFIX)).select(
        "p_partkey"
    )
    fam_li = li.join(F.broadcast(fam), li.l_partkey == fam.p_partkey)
    per_pair = fam_li.groupBy("l_partkey", "l_suppkey").agg(
        dec_sum("l_quantity").alias("pair_qty")
    )
    per_part = fam_li.groupBy("l_partkey").agg(
        dec_sum("l_quantity").alias("part_qty")
    )
    dominant = (
        per_pair.join(per_part, "l_partkey")
        .where(F.col("pair_qty") > F.col("part_qty") * F.lit(_Q138_SHARE))
        .select("l_suppkey")
        .distinct()
    )
    return (
        su.join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(dominant, su.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_name", "n_name", "s_acctbal")
        .orderBy("s_name")
    )


Q138_SQL = f"""
WITH fam_li AS (
    SELECT l_partkey, l_suppkey, l_quantity
    FROM lineitem
    WHERE l_partkey IN (
        SELECT p_partkey FROM part WHERE p_name LIKE '{_Q138_PREFIX}%'
    )
),
per_pair AS (
    SELECT l_partkey, l_suppkey,
           {SQL_DEC_SUM.format(x='l_quantity')} AS pair_qty
    FROM fam_li GROUP BY 1, 2
),
per_part AS (
    SELECT l_partkey, {SQL_DEC_SUM.format(x='l_quantity')} AS part_qty
    FROM fam_li GROUP BY 1
),
dominant AS (
    SELECT DISTINCT l_suppkey
    FROM per_pair JOIN per_part USING (l_partkey)
    WHERE pair_qty > part_qty * {_Q138_SHARE}
)
SELECT s_name, n_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (SELECT l_suppkey FROM dominant)
ORDER BY s_name
"""


# ---------------------------------------------------------------------------
# Q181 — revenue CONCENTRATION per nation: the exact Gini coefficient
# (via the tie-correct average-rank identity G = 2·Σ r_i·x_i/(n·Σx)
# − (n+1)/n, with average ranks from the q179 value-counts machinery —
# never a per-group sort of raw rows) plus the Herfindahl–Hirschman
# index Σ share² — the "is this market dominated by few customers"
# pair every marketplace-analytics stack reports. Ranks are doubled
# into exact integers; Σ r·x and Σ x² accumulate in decimals; the
# final chain is fixed IEEE.
# ---------------------------------------------------------------------------


def q181_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey", "c_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(38,2)")).alias("rev")
        )
        .select(
            "c_nationkey",
            "c_custkey",
            F.col("rev").cast("double").alias("x"),
        )
    )
    counts = rev.groupBy("c_nationkey", "x").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("c_nationkey").orderBy("x")
    ranks = counts.withColumn("cum_end", F.sum("cnt").over(w)).select(
        "c_nationkey",
        "x",
        (F.lit(2) * F.col("cum_end") - F.col("cnt") + 1)
        .cast("long")
        .alias("r2"),
    )
    d = "decimal(38,6)"
    mom = (
        rev.join(F.broadcast(ranks), ["c_nationkey", "x"])
        .groupBy("c_nationkey")
        .agg(
            F.count("*").cast("double").alias("n"),
            F.sum(F.col("x").cast(d)).cast("double").alias("sx"),
            F.sum((F.col("r2") * F.col("x")).cast(d))
            .cast("double")
            .alias("srx2"),
            F.sum((F.col("x") * F.col("x")).cast(d))
            .cast("double")
            .alias("sxx"),
        )
    )
    # r2 = 2*avg_rank, so 2*Σ r·x = Σ r2·x.
    gini = F.col("srx2") / (F.col("n") * F.col("sx")) - (
        F.col("n") + 1
    ) / F.col("n")
    hhi = F.col("sxx") / (F.col("sx") * F.col("sx"))
    return mom.select(
        "c_nationkey",
        F.col("n").cast("long").alias("n_customers"),
        F.round(gini, 9).alias("gini"),
        F.round(hhi, 9).alias("hhi"),
    )


Q181_SQL = """
WITH rev AS (
    SELECT c.c_nationkey, c.c_custkey,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS x
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1, 2
),
counts AS (
    SELECT c_nationkey, x, COUNT(*) AS cnt FROM rev GROUP BY 1, 2
),
ranks AS (
    SELECT c_nationkey, x,
           CAST(2 * SUM(cnt) OVER (
               PARTITION BY c_nationkey ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) - cnt + 1 AS BIGINT) AS r2
    FROM counts
),
mom AS (
    SELECT rev.c_nationkey,
           CAST(COUNT(*) AS DOUBLE) AS n,
           CAST(SUM(CAST(rev.x AS DECIMAL(38,6))) AS DOUBLE) AS sx,
           CAST(SUM(CAST(ranks.r2 * rev.x AS DECIMAL(38,6))) AS DOUBLE)
               AS srx2,
           CAST(SUM(CAST(rev.x * rev.x AS DECIMAL(38,6))) AS DOUBLE) AS sxx
    FROM rev JOIN ranks USING (c_nationkey, x)
    GROUP BY 1
)
SELECT c_nationkey, CAST(n AS BIGINT) AS n_customers,
       round(srx2 / (n * sx) - (n + 1) / n, 9) AS gini,
       round(sxx / (sx * sx), 9) AS hhi
FROM mom
"""


# ---------------------------------------------------------------------------
# Q182 — order-total RECONCILIATION audit: recompute every order's
# total from its line items (Σ extprice·(1−disc)·(1+tax), the TPC-H
# identity) and bucket the header-vs-detail gaps — the financial
# close's "does the rollup tie out" check. This corpus genuinely
# violates the identity (the generator prices headers independently),
# which is exactly what the audit exists to surface. Determinism: each
# line's term is an exactly-representable 6-decimal value (2-dec price
# × 2-dec discount factor × 2-dec tax factor), summed through the
# exact-decimal accumulator; the gap is one subtraction of identical
# doubles. One keyed agg + one join + a 5-way bucket projection.
# ---------------------------------------------------------------------------


def q182_order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_totalprice").cast("double").alias("header")
    )
    term = (
        F.col("l_extendedprice")
        * (F.lit(1.0) - F.col("l_discount"))
        * (F.lit(1.0) + F.col("l_tax"))
    ).cast("decimal(38,6)")
    detail = li.groupBy("l_orderkey").agg(
        F.sum(term).cast("double").alias("recomputed")
    )
    gap = F.col("header") - F.col("recomputed")
    bucket = (
        F.when(gap == 0.0, "exact")
        .when(F.abs(gap) < 1.0, "lt_1")
        .when(F.abs(gap) < 100.0, "lt_100")
        .when(F.abs(gap) < 10000.0, "lt_10k")
        .otherwise("gte_10k")
    )
    return (
        o.join(detail, o.o_orderkey == detail.l_orderkey)
        .select(gap.alias("gap"), bucket.alias("gap_bucket"))
        .groupBy("gap_bucket")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.min("gap"), 9).alias("min_gap"),
            F.round(F.max("gap"), 9).alias("max_gap"),
        )
    )


Q182_SQL = """
WITH detail AS (
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
                         * (1.0 + l_tax) AS DECIMAL(38,6))) AS DOUBLE)
               AS recomputed
    FROM lineitem GROUP BY 1
),
gaps AS (
    SELECT CAST(o.o_totalprice AS DOUBLE) - d.recomputed AS gap
    FROM orders o JOIN detail d ON o.o_orderkey = d.l_orderkey
)
SELECT CASE WHEN gap = 0.0 THEN 'exact'
            WHEN ABS(gap) < 1.0 THEN 'lt_1'
            WHEN ABS(gap) < 100.0 THEN 'lt_100'
            WHEN ABS(gap) < 10000.0 THEN 'lt_10k'
            ELSE 'gte_10k' END AS gap_bucket,
       COUNT(*) AS n_orders,
       round(MIN(gap), 9) AS min_gap,
       round(MAX(gap), 9) AS max_gap
FROM gaps
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Q183 — ABC (Pareto) CLASSIFICATION of parts by revenue: rank parts by
# revenue, class A = the head covering 80% of cumulative revenue, B =
# the next 15%, C = the tail — the inventory-management staple. The
# cumulative share runs over the AGGREGATED part frame (bounded by the
# catalog, not order volume) in exact integer cents, with the class
# threshold test cross-multiplied (cum*100 <= total*80) so no float
# boundary can flip a part's class. Output is the 3-row class summary
# with exact counts and revenue shares.
# ---------------------------------------------------------------------------


def q183_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    per_part = (
        li.groupBy("l_partkey")
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(38,2)")) * 100)
            .cast("long")
            .alias("cents")
        )
    )
    w = Window.orderBy(F.col("cents").desc(), F.col("l_partkey"))
    tot = per_part.agg(F.sum("cents").alias("total"))
    classed = (
        per_part.withColumn("cum", F.sum("cents").over(w))
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "abc_class",
            F.when(F.col("cum") * 100 <= F.col("total") * 80, "A")
            .when(F.col("cum") * 100 <= F.col("total") * 95, "B")
            .otherwise("C"),
        )
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count("*").alias("n_parts"),
            F.sum("cents").alias("class_cents"),
            F.max("total").alias("total"),
        )
        .select(
            "abc_class",
            "n_parts",
            (
                F.col("class_cents").cast("double")
                / F.col("total").cast("double")
            ).alias("revenue_share"),
        )
    )


Q183_SQL = """
WITH per_part AS (
    SELECT l_partkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2))) * 100 AS BIGINT)
               AS cents
    FROM lineitem GROUP BY 1
),
tot AS (SELECT SUM(cents) AS total FROM per_part),
classed AS (
    SELECT cents, total,
           CASE WHEN SUM(cents) OVER (
                    ORDER BY cents DESC, l_partkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                ) * 100 <= total * 80 THEN 'A'
                WHEN SUM(cents) OVER (
                    ORDER BY cents DESC, l_partkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                ) * 100 <= total * 95 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM per_part CROSS JOIN tot
)
SELECT abc_class, COUNT(*) AS n_parts,
       CAST(SUM(cents) AS DOUBLE) / CAST(MAX(total) AS DOUBLE)
           AS revenue_share
FROM classed
GROUP BY abc_class
"""


# ---------------------------------------------------------------------------
# Q212 — Top-N-plus-OTHER revenue rollup: per supplier nation, the top-3
# parts by revenue as named rows and everything else folded into one
# 'OTHER' row — the standard dashboard pie/bar contract (show leaders,
# never drop the tail silently). The OTHER fold is the part the naive
# rank-filter query gets wrong.
#
# Determinism: revenue stays DECIMAL(38,6) through BOTH aggregation
# levels (per-part, then per-label) — ranking compares exact decimals and
# the OTHER bucket's re-aggregation is order-free; only the final output
# casts to double. Scale shape: keyed agg → per-nation rank window over
# the (nation x part) aggregate (not lineitem) → second keyed agg,
# dims broadcast.
# ---------------------------------------------------------------------------

TOPN_OTHER_N = 3


def q212_topn_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    per_part = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "n_name",
            "l_partkey",
            (
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
            ).cast("decimal(38,6)").alias("revd"),
        )
        .groupBy("n_name", "l_partkey")
        .agg(F.sum("revd").alias("revd"), F.count("*").alias("n_items"))
    )
    w = Window.partitionBy("n_name").orderBy(
        F.col("revd").desc(), F.col("l_partkey")
    )
    labeled = per_part.withColumn("rn", F.row_number().over(w)).select(
        "n_name",
        F.when(
            F.col("rn") <= TOPN_OTHER_N, F.col("l_partkey").cast("string")
        )
        .otherwise(F.lit("OTHER"))
        .alias("part_label"),
        "revd",
        "n_items",
    )
    return (
        labeled.groupBy("n_name", "part_label")
        .agg(
            F.count("*").cast("long").alias("n_parts"),
            F.sum("n_items").cast("long").alias("n_items"),
            F.sum("revd").cast("double").alias("revenue"),
        )
        .orderBy(
            "n_name",
            (F.col("part_label") == "OTHER").cast("int"),
            F.col("revenue").desc(),
            "part_label",
        )
    )


Q212_SQL = f"""
WITH per_part AS (
    SELECT n_name, l_partkey,
           SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6)))
               AS revd,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY n_name, l_partkey
),
labeled AS (
    SELECT n_name,
           CASE WHEN ROW_NUMBER() OVER (
                    PARTITION BY n_name ORDER BY revd DESC, l_partkey
                ) <= {TOPN_OTHER_N}
                THEN CAST(l_partkey AS VARCHAR) ELSE 'OTHER' END AS part_label,
           revd, n_items
    FROM per_part
)
SELECT n_name, part_label,
       COUNT(*) AS n_parts,
       CAST(SUM(n_items) AS BIGINT) AS n_items,
       CAST(SUM(revd) AS DOUBLE) AS revenue
FROM labeled
GROUP BY n_name, part_label
ORDER BY n_name, CASE WHEN part_label = 'OTHER' THEN 1 ELSE 0 END,
         revenue DESC, part_label
"""


# ---------------------------------------------------------------------------
# Q214 — Incremental JOIN maintenance (the join counterpart of q91's
# incremental aggregate): maintain J = orders ⋈ lineitem under row
# arrivals using the classic delta algebra
#
#   J_new = (A₀ ⋈ B₀) ∪ (ΔA ⋈ B₀) ∪ (A₀ ⋈ ΔB) ∪ (ΔA ⋈ ΔB)
#
# with A split on o_orderdate and B split on l_shipdate at the same
# cutoff. The four terms partition J_new EXACTLY once each — and the
# oracle is the DIRECT join on the full tables, so the hash-match PROVES
# the delta decomposition (overlap or omission in any term breaks it).
# In production A₀ ⋈ B₀ is the stored materialization; here it is
# recomputed because queries are stateless — the delta terms are the
# contract under test.
#
# Scale shape: deltas are the small sides (one day's arrivals vs years
# of base) — both delta-side joins broadcast; the base×base term is the
# one pre-materialized at 100 TB. Final rollup is a keyed exact-decimal
# agg by priority.
# ---------------------------------------------------------------------------

IVM_CUTOFF = "2001-01-01"


def q214_incremental_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cut = F.lit(IVM_CUTOFF).cast("date")
    a0 = o.where(F.to_date("o_orderdate") < cut)
    da = o.where(F.to_date("o_orderdate") >= cut)
    b0 = li.where(F.to_date("l_shipdate") < cut)
    db = li.where(F.to_date("l_shipdate") >= cut)
    key = F.col("o_orderkey") == F.col("l_orderkey")
    pieces = (
        a0.join(b0, key)
        .unionByName(F.broadcast(da).join(b0, key))
        .unionByName(a0.join(F.broadcast(db), key))
        .unionByName(F.broadcast(da).join(db, key))
    )
    return (
        pieces.select(
            "o_orderpriority",
            (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
            .cast("decimal(38,6)")
            .alias("revd"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.sum("revd").cast("double").alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


Q214_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6)))
            AS DOUBLE) AS revenue
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q253 — RATIO-TO-PARENT contribution report down the geography
# hierarchy (region → nation → supplier): every supplier row carries its
# exact revenue plus its share of its nation, the nation's share of its
# region, and the region's share of the grand total — the drill-down
# decomposition a rollup (q31/q43: totals per level) doesn't give you:
# ratio-to-parent is what a treemap / contribution dashboard actually
# renders, and (share_sup × share_nat × share_reg) recovers each
# supplier's global share by construction.
#
# Plan: ONE fact-side agg to supplier grain (revenue kept as exact
# DECIMAL(38,6) — window sums over doubles would be order-dependent),
# then three window sums over the tiny supplier-grain frame; ratios are
# doubles of exactly-agreed decimals (cast-then-divide, each step
# correctly rounded). Dimensions broadcast. At 100 TB the fact agg is
# the only big shuffle; the window chain runs on |suppliers| rows.
# ---------------------------------------------------------------------------


def q253_ratio_to_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    sup = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("r_name", "n_name", "s_suppkey", rev.alias("rev"))
        .groupBy("r_name", "n_name", "s_suppkey")
        .agg(F.sum(F.col("rev").cast("decimal(38,6)")).alias("rev_d"))
    )
    w_nat = Window.partitionBy("r_name", "n_name")
    w_reg = Window.partitionBy("r_name")
    w_all = Window.partitionBy()
    nat_d = F.sum("rev_d").over(w_nat)
    reg_d = F.sum("rev_d").over(w_reg)
    tot_d = F.sum("rev_d").over(w_all)
    return sup.select(
        "r_name",
        "n_name",
        "s_suppkey",
        F.col("rev_d").cast("double").alias("revenue"),
        F.round(
            F.col("rev_d").cast("double") / nat_d.cast("double"), 9
        ).alias("share_of_nation"),
        F.round(nat_d.cast("double") / reg_d.cast("double"), 9).alias(
            "nation_share_of_region"
        ),
        F.round(reg_d.cast("double") / tot_d.cast("double"), 9).alias(
            "region_share_of_total"
        ),
    )


Q253_SQL = """
WITH sup AS (
    SELECT r_name, n_name, s_suppkey,
           SUM(CAST(l_extendedprice * (1.0 - l_discount)
                    AS DECIMAL(38,6))) AS rev_d
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY 1, 2, 3
),
shares AS (
    SELECT r_name, n_name, s_suppkey, rev_d,
           SUM(rev_d) OVER (PARTITION BY r_name, n_name) AS nat_d,
           SUM(rev_d) OVER (PARTITION BY r_name) AS reg_d,
           SUM(rev_d) OVER () AS tot_d
    FROM sup
)
SELECT r_name, n_name, s_suppkey,
       CAST(rev_d AS DOUBLE) AS revenue,
       round(CAST(rev_d AS DOUBLE) / CAST(nat_d AS DOUBLE), 9)
           AS share_of_nation,
       round(CAST(nat_d AS DOUBLE) / CAST(reg_d AS DOUBLE), 9)
           AS nation_share_of_region,
       round(CAST(reg_d AS DOUBLE) / CAST(tot_d AS DOUBLE), 9)
           AS region_share_of_total
FROM shares
"""


# ---------------------------------------------------------------------------
# Q286 — FULFILLMENT FILL-RATE CURVE: per order priority, the exact
# cumulative fraction (ppm) of line items shipped within 7/14/30/60/90
# days of the order date — the SLA attainment CDF logistics teams track
# (q123's delay bins unrolled into the within-k curve, which is the
# actionable form: "are we hitting 95 % in 30 days for URGENT?").
#
# Plan: ONE lineitem⋈orders equi-join (the fact-to-fact shuffle; at
# 100 TB both sides bucket on orderkey) → one keyed agg with five
# conditional sums — the whole curve in a single pass, never five
# scans. All integers; ppm via exact integral division.
# ---------------------------------------------------------------------------

_FILL_HORIZONS = (7, 14, 30, 60, 90)


def q286_fill_rate_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_shipdate").cast("date").alias("ship_d")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        "o_orderpriority",
        F.col("o_orderdate").cast("date").alias("order_d"),
    )
    joined = li.join(orders, "l_orderkey").select(
        "o_orderpriority",
        F.datediff(F.col("ship_d"), F.col("order_d")).alias("lag_days"),
    )
    aggs = [F.count("*").alias("n_items")] + [
        F.sum((F.col("lag_days") <= k).cast("int")).alias(f"w{k}")
        for k in _FILL_HORIZONS
    ]
    out = joined.groupBy("o_orderpriority").agg(*aggs)
    ppm_cols = [
        f"CAST(w{k} * 1000000 DIV n_items AS BIGINT) AS within_{k}d_ppm"
        for k in _FILL_HORIZONS
    ]
    return out.selectExpr(
        "o_orderpriority", "CAST(n_items AS BIGINT) AS n_items", *ppm_cols
    ).orderBy("o_orderpriority")


Q286_SQL = f"""
WITH joined AS (
    SELECT o.o_orderpriority,
           CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE)
               AS lag_days
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       {", ".join(
           f"CAST(SUM(CASE WHEN lag_days <= {k} THEN 1 ELSE 0 END)"
           f" * 1000000 // COUNT(*) AS BIGINT) AS within_{k}d_ppm"
           for k in _FILL_HORIZONS
       )}
FROM joined
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q293 — WITHIN-BRAND PRICE DISPERSION: the squared coefficient of
# variation of retail prices inside each brand, exact to the milli —
# the assortment-pricing gauge ("is Brand#13 one price point or a
# spread?"). Prices enter as integer CENTS (double → DECIMAL(18,2) →
# ×100, exact for money-grained values), then
# CV²·1000 = 1000·(n·Σx² − (Σx)²) DIV (Σx)² — the q248/q282 integer
# algebra; mean ships as exact milli-cents. Σx² of cents can pass
# int64 at the x4 probe, so sums ride DECIMAL(38,0).
#
# Plan: one keyed agg over part — no joins, |brands| output rows.
# ---------------------------------------------------------------------------


def q293_brand_price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    cents = (
        (F.col("p_retailprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("x")
    )
    return (
        part.select("p_brand", cents)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
            F.sum(
                (F.col("x") * F.col("x")).cast("decimal(38,0)")
            ).alias("sxx"),
        )
        .selectExpr(
            "p_brand",
            "CAST(n AS BIGINT) AS n_parts",
            "CAST(sx * 1000 DIV n AS BIGINT) AS mean_millicents",
            "CAST(1000 * (n * sxx - sx * sx) DIV (sx * sx) AS BIGINT)"
            " AS cv2_milli",
        )
        .orderBy("p_brand")
    )


Q293_SQL = """
WITH cents AS (
    SELECT p_brand,
           CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
    FROM part
),
sums AS (
    SELECT p_brand, COUNT(*) AS n,
           SUM(CAST(x AS HUGEINT)) AS sx,
           SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
    FROM cents GROUP BY 1
)
SELECT p_brand,
       CAST(n AS BIGINT) AS n_parts,
       CAST(sx * 1000 // n AS BIGINT) AS mean_millicents,
       CAST(1000 * (n * sxx - sx * sx) // (sx * sx) AS BIGINT) AS cv2_milli
FROM sums
ORDER BY p_brand
"""


# ---------------------------------------------------------------------------
# Q298 — CYCLE-TIME DECOMPOSITION: per order priority, the (lower)
# median days from order to FIRST shipment and the median shipping
# WINDOW (first → last line shipped) — splits "slow to start" from
# "slow to finish", the two levers fulfillment actually tunes.
# Medians use the engine's cross-multiplied value-counts convention
# (2·cum ≥ n → MIN value; the q296 integer-median recipe) so the whole
# report is exact.
#
# Plan: one lineitem keyed agg (order grain) → broadcast-joined to
# orders → two value-counts CDFs at (priority, days) grain. Never a
# per-group sort of raw rows.
# ---------------------------------------------------------------------------


def _priority_lower_median(spans: DataFrame, col: str) -> DataFrame:
    vc = spans.groupBy("prio", col).agg(F.count("*").alias("cnt"))
    w_cum = Window.partitionBy("prio").orderBy(col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy("prio")
    cdf = vc.select(
        "prio",
        col,
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    return (
        cdf.where(F.col("cum") * 2 >= F.col("n"))
        .groupBy("prio")
        .agg(F.min(col).alias(f"med_{col}"))
    )


def q298_cycle_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ship = li.groupBy("l_orderkey").agg(
        F.min(F.col("l_shipdate").cast("date")).alias("first_ship"),
        F.max(F.col("l_shipdate").cast("date")).alias("last_ship"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.col("o_orderpriority").alias("prio"),
        F.col("o_orderdate").cast("date").alias("order_d"),
    )
    spans = ship.join(orders, "l_orderkey").select(
        "prio",
        F.datediff(F.col("first_ship"), F.col("order_d")).alias("to_first"),
        F.datediff(F.col("last_ship"), F.col("first_ship")).alias("window"),
    )
    m1 = _priority_lower_median(spans, "to_first")
    m2 = _priority_lower_median(spans, "window")
    base = spans.groupBy("prio").agg(
        F.count("*").cast("long").alias("n_orders")
    )
    return (
        base.join(F.broadcast(m1), "prio")
        .join(F.broadcast(m2), "prio")
        .select(
            F.col("prio").alias("o_orderpriority"),
            "n_orders",
            F.col("med_to_first").cast("long").alias("med_days_to_first_ship"),
            F.col("med_window").cast("long").alias("med_ship_window_days"),
        )
        .orderBy("o_orderpriority")
    )


Q298_SQL = """
WITH ship AS (
    SELECT l_orderkey,
           MIN(CAST(l_shipdate AS DATE)) AS first_ship,
           MAX(CAST(l_shipdate AS DATE)) AS last_ship
    FROM lineitem GROUP BY 1
),
spans AS (
    SELECT o.o_orderpriority AS prio,
           s.first_ship - CAST(o.o_orderdate AS DATE) AS to_first,
           s.last_ship - s.first_ship AS wdw
    FROM ship s JOIN orders o ON o.o_orderkey = s.l_orderkey
),
cdf1 AS (
    SELECT prio, to_first,
           SUM(cnt) OVER (PARTITION BY prio ORDER BY to_first
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           SUM(cnt) OVER (PARTITION BY prio) AS n
    FROM (SELECT prio, to_first, COUNT(*) AS cnt FROM spans GROUP BY 1, 2)
),
m1 AS (SELECT prio, MIN(to_first) AS med1 FROM cdf1
       WHERE cum * 2 >= n GROUP BY 1),
cdf2 AS (
    SELECT prio, wdw,
           SUM(cnt) OVER (PARTITION BY prio ORDER BY wdw
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           SUM(cnt) OVER (PARTITION BY prio) AS n
    FROM (SELECT prio, wdw, COUNT(*) AS cnt FROM spans GROUP BY 1, 2)
),
m2 AS (SELECT prio, MIN(wdw) AS med2 FROM cdf2
       WHERE cum * 2 >= n GROUP BY 1),
base AS (SELECT prio, COUNT(*) AS n_orders FROM spans GROUP BY 1)
SELECT b.prio AS o_orderpriority,
       CAST(b.n_orders AS BIGINT) AS n_orders,
       CAST(m1.med1 AS BIGINT) AS med_days_to_first_ship,
       CAST(m2.med2 AS BIGINT) AS med_ship_window_days
FROM base b JOIN m1 USING (prio) JOIN m2 USING (prio)
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q302 — OPEN-ORDER AGING (WIP report): unfulfilled orders
# (o_orderstatus = 'O') bucketed by age in days relative to the
# newest order date in the corpus (the "as of the data" clock, a lazy
# 1-row anchor — q216 pattern), per priority: the working-capital /
# backlog report. Buckets 0–30 / 31–60 / 61–90 / 90+, exact counts +
# oldest order age.
# ---------------------------------------------------------------------------


def q302_open_order_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    anchor = orders.groupBy().agg(
        F.max(F.col("o_orderdate").cast("date")).alias("asof")
    )
    aged = (
        orders.where(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(anchor))
        .select(
            "o_orderpriority",
            F.datediff(
                F.col("asof"), F.col("o_orderdate").cast("date")
            ).alias("age"),
        )
    )
    return (
        aged.groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_open"),
            F.sum((F.col("age") <= 30).cast("int"))
            .cast("long")
            .alias("d0_30"),
            F.sum(((F.col("age") > 30) & (F.col("age") <= 60)).cast("int"))
            .cast("long")
            .alias("d31_60"),
            F.sum(((F.col("age") > 60) & (F.col("age") <= 90)).cast("int"))
            .cast("long")
            .alias("d61_90"),
            F.sum((F.col("age") > 90).cast("int"))
            .cast("long")
            .alias("d90_plus"),
            F.max("age").cast("long").alias("oldest_age_days"),
        )
        .orderBy("o_orderpriority")
    )


Q302_SQL = """
WITH anchor AS (
    SELECT MAX(CAST(o_orderdate AS DATE)) AS asof_d FROM orders
),
aged AS (
    SELECT o_orderpriority,
           asof_d - CAST(o_orderdate AS DATE) AS age
    FROM orders CROSS JOIN anchor
    WHERE o_orderstatus = 'O'
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_open,
       CAST(SUM(CASE WHEN age <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS d0_30,
       CAST(SUM(CASE WHEN age > 30 AND age <= 60 THEN 1 ELSE 0 END)
            AS BIGINT) AS d31_60,
       CAST(SUM(CASE WHEN age > 60 AND age <= 90 THEN 1 ELSE 0 END)
            AS BIGINT) AS d61_90,
       CAST(SUM(CASE WHEN age > 90 THEN 1 ELSE 0 END) AS BIGINT) AS d90_plus,
       CAST(MAX(age) AS BIGINT) AS oldest_age_days
FROM aged
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q305 — DISCOUNT LIFT: does discounting move volume? Line items
# bucketed by discount band (0 / ≤5 % / ≤10 % / >10 %): item counts,
# exact revenue in 1e-4 dollars (price cents × (100 − disc pct) —
# integer arithmetic end-to-end, no float product), mean quantity in
# exact milli, and the volume lift of each band vs the zero-discount
# baseline in ppm (cross-multiplied integers, |bands|-row broadcast).
# ---------------------------------------------------------------------------


def q305_discount_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_pct = (
        (F.col("l_discount").cast("decimal(4,2)") * 100)
        .cast("int")
        .alias("dp")
    )
    base = li.select(
        disc_pct,
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("price_c"),
        F.col("l_quantity").cast("long").alias("qty"),
    ).select(
        F.when(F.col("dp") == 0, "0_none")
        .when(F.col("dp") <= 5, "1_to5pct")
        .when(F.col("dp") <= 10, "2_to10pct")
        .otherwise("3_over10pct")
        .alias("band"),
        "dp",
        "price_c",
        "qty",
    )
    bands = base.groupBy("band").agg(
        F.count("*").cast("long").alias("n_items"),
        F.sum(
            (F.col("price_c") * (100 - F.col("dp"))).cast("decimal(38,0)")
        ).alias("rev"),
        F.sum("qty").alias("sq"),
    )
    zero = bands.where(F.col("band") == "0_none").select(
        F.col("n_items").alias("z_n"), F.col("sq").alias("z_sq")
    )
    return (
        bands.crossJoin(F.broadcast(zero))
        .selectExpr(
            "band",
            "n_items",
            "CAST(rev AS BIGINT) AS revenue_e4",
            "CAST(sq * 1000 DIV n_items AS BIGINT) AS mean_qty_milli",
            # lift vs zero band: (band mean qty) / (zero mean qty) ppm,
            # cross-multiplied to integers.
            "CAST(sq * z_n * 1000000 DIV (n_items * z_sq) AS BIGINT)"
            " AS qty_lift_ppm",
        )
        .orderBy("band")
    )


Q305_SQL = """
WITH base AS (
    SELECT CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS INT) AS dp,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS price_c,
           CAST(l_quantity AS BIGINT) AS qty
    FROM lineitem
),
banded AS (
    SELECT CASE WHEN dp = 0 THEN '0_none'
                WHEN dp <= 5 THEN '1_to5pct'
                WHEN dp <= 10 THEN '2_to10pct'
                ELSE '3_over10pct' END AS band,
           dp, price_c, qty
    FROM base
),
bands AS (
    SELECT band, COUNT(*) AS n_items,
           SUM(CAST(price_c AS HUGEINT) * (100 - dp)) AS rev,
           SUM(qty) AS sq
    FROM banded GROUP BY 1
),
zero AS (SELECT n_items AS z_n, sq AS z_sq FROM bands WHERE band = '0_none')
SELECT band,
       CAST(n_items AS BIGINT) AS n_items,
       CAST(rev AS BIGINT) AS revenue_e4,
       CAST(sq * 1000 // n_items AS BIGINT) AS mean_qty_milli,
       CAST(sq * z_n * 1000000 // (n_items * z_sq) AS BIGINT)
           AS qty_lift_ppm
FROM bands CROSS JOIN zero
ORDER BY band
"""


# ---------------------------------------------------------------------------
# Q307 — SINGLE-SOURCE RISK: parts observed shipping from exactly one
# supplier (lineitem evidence), rolled up per brand with risk ppm —
# the supply-chain fragility report ("which brands die if one supplier
# does?"). One (part, supplier) distinct frame → part-grain distinct
# counts → brand rollup via a broadcast part-dim join.
# ---------------------------------------------------------------------------


def q307_single_source_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    suppliers_per_part = (
        li.select("l_partkey", "l_suppkey")
        .distinct()
        .groupBy("l_partkey")
        .agg(F.count("*").alias("n_suppliers"))
    )
    return (
        suppliers_per_part.join(F.broadcast(part), "l_partkey")
        .groupBy("p_brand")
        .agg(
            F.count("*").cast("long").alias("n_parts"),
            F.sum((F.col("n_suppliers") == 1).cast("int"))
            .cast("long")
            .alias("n_single_source"),
        )
        .selectExpr(
            "p_brand",
            "n_parts",
            "n_single_source",
            "CAST(n_single_source * 1000000 DIV n_parts AS BIGINT)"
            " AS risk_ppm",
        )
        .orderBy("p_brand")
    )


Q307_SQL = """
WITH spp AS (
    SELECT l_partkey, COUNT(DISTINCT l_suppkey) AS n_suppliers
    FROM lineitem GROUP BY 1
)
SELECT p.p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(CASE WHEN s.n_suppliers = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_single_source,
       CAST(SUM(CASE WHEN s.n_suppliers = 1 THEN 1 ELSE 0 END)
            * 1000000 // COUNT(*) AS BIGINT) AS risk_ppm
FROM spp s JOIN part p ON p.p_partkey = s.l_partkey
GROUP BY p.p_brand
ORDER BY p.p_brand
"""


# ---------------------------------------------------------------------------
# Q308 — RETURN RATES BY BRAND: share of line items flagged returned
# (l_returnflag = 'R') per part brand, with the returned revenue in
# exact cents — the product-quality league table. One fact scan + a
# broadcast part-dim join + one keyed agg.
# ---------------------------------------------------------------------------


def q308_return_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    cents = (
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("price_c")
    )
    flagged = li.select(
        "l_partkey",
        cents,
        (F.col("l_returnflag") == "R").cast("int").alias("ret"),
    )
    return (
        flagged.join(F.broadcast(part), "l_partkey")
        .groupBy("p_brand")
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.sum("ret").cast("long").alias("n_returned"),
            F.sum(F.col("ret") * F.col("price_c"))
            .cast("long")
            .alias("returned_cents"),
        )
        .selectExpr(
            "p_brand",
            "n_items",
            "n_returned",
            "CAST(n_returned * 1000000 DIV n_items AS BIGINT)"
            " AS return_ppm",
            "returned_cents",
        )
        .orderBy("p_brand")
    )


Q308_SQL = """
SELECT p.p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_returned,
       CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
            * 1000000 // COUNT(*) AS BIGINT) AS return_ppm,
       CAST(SUM(CASE WHEN l.l_returnflag = 'R'
                     THEN CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
                               AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS returned_cents
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
GROUP BY p.p_brand
ORDER BY p.p_brand
"""


# ---------------------------------------------------------------------------
# Q314 — SPEND-DECILE MIGRATION MATRIX: customers' order-spend decile
# in the first date half vs the second (q270's midpoint anchor) — the
# customer-value migration table ("are our top-decile customers
# staying top-decile?"). Deciles come from the cross-multiplied
# value-counts CDF per half (decile(v) = (cum_below·10) DIV n + 1 —
# customers tied on spend share a decile, deterministic on both
# engines; never an ntile sort of raw rows). Customers active in only
# one half are excluded (the matrix is about MOVEMENT). Output ≤ 100
# cells with counts and within-origin share ppm.
# ---------------------------------------------------------------------------


def q314_decile_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    anchor = orders.groupBy().agg(
        F.min(F.col("o_orderdate").cast("date")).alias("d0"),
        F.max(F.col("o_orderdate").cast("date")).alias("d1"),
    )
    spend = (
        orders.crossJoin(F.broadcast(anchor))
        .select(
            "o_custkey",
            F.when(
                F.datediff(F.col("o_orderdate").cast("date"), F.col("d0"))
                * 2
                < F.datediff(F.col("d1"), F.col("d0")),
                F.lit(0),
            )
            .otherwise(F.lit(1))
            .alias("half"),
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("cents"),
        )
        .groupBy("o_custkey", "half")
        .agg(F.sum("cents").alias("spend"))
    )
    vc = spend.groupBy("half", "spend").agg(F.count("*").alias("cnt"))
    w_cum = Window.partitionBy("half").orderBy("spend").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.partitionBy("half")
    cdf = vc.select(
        "half",
        "spend",
        F.coalesce(F.sum("cnt").over(w_cum), F.lit(0)).alias("below"),
        F.sum("cnt").over(w_all).alias("n"),
    ).selectExpr(
        "half",
        "spend",
        "CAST(below * 10 DIV n AS INT) + 1 AS decile",
    )
    assigned = spend.join(cdf, ["half", "spend"]).select(
        "o_custkey", "half", "decile"
    )
    both = (
        assigned.where(F.col("half") == 0)
        .select("o_custkey", F.col("decile").alias("d0"))
        .join(
            assigned.where(F.col("half") == 1).select(
                "o_custkey", F.col("decile").alias("d1")
            ),
            "o_custkey",
        )
    )
    matrix = both.groupBy("d0", "d1").agg(
        F.count("*").cast("long").alias("n_customers")
    )
    return matrix.selectExpr(
        "d0",
        "d1",
        "n_customers",
        "CAST(n_customers * 1000000 DIV "
        "SUM(n_customers) OVER (PARTITION BY d0) AS BIGINT)"
        " AS share_of_origin_ppm",
    ).orderBy("d0", "d1")


Q314_SQL = """
WITH anchor AS (
    SELECT MIN(CAST(o_orderdate AS DATE)) AS d0,
           MAX(CAST(o_orderdate AS DATE)) AS d1
    FROM orders
),
spend AS (
    SELECT o_custkey,
           CASE WHEN (CAST(o_orderdate AS DATE) - a.d0) * 2
                     < (a.d1 - a.d0) THEN 0 ELSE 1 END AS half,
           SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
               AS spend
    FROM orders CROSS JOIN anchor a
    GROUP BY 1, 2
),
vc AS (SELECT half, spend, COUNT(*) AS cnt FROM spend GROUP BY 1, 2),
cdf AS (
    SELECT half, spend,
           CAST(COALESCE(SUM(cnt) OVER (PARTITION BY half ORDER BY spend
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               * 10 // SUM(cnt) OVER (PARTITION BY half) AS INT) + 1
               AS decile
    FROM vc
),
assigned AS (
    SELECT s.o_custkey, s.half, c.decile
    FROM spend s JOIN cdf c ON c.half = s.half AND c.spend = s.spend
),
matrix AS (
    SELECT a0.decile AS d0, a1.decile AS d1, COUNT(*) AS n_customers
    FROM assigned a0
    JOIN assigned a1 ON a1.o_custkey = a0.o_custkey AND a1.half = 1
    WHERE a0.half = 0
    GROUP BY 1, 2
)
SELECT d0, d1,
       CAST(n_customers AS BIGINT) AS n_customers,
       CAST(n_customers * 1000000 // SUM(n_customers)
            OVER (PARTITION BY d0) AS BIGINT) AS share_of_origin_ppm
FROM matrix
ORDER BY d0, d1
"""


# ---------------------------------------------------------------------------
# Q315 — BUSINESS-DAY SHIPPING LAG: order→ship lag in BUSINESS days
# (weekends excluded) per priority — the SLA teams actually quote.
# Closed-form integer arithmetic, no calendar explode: with d = day
# index from epoch Monday (so dow = d % 7, 0 = Monday), business days
# between order day a and ship day b (exclusive of a, inclusive of b,
# clamping each endpoint forward to its next business day) is
#   bd(x) = (x DIV 7)·5 + min(x % 7, 5)   [business days in [0, x)]
#   lag   = bd(b') − bd(a')               [a', b' = weekend-clamped]
# Every step is integer DIV/mod, identical on both engines. Output:
# per priority, lower-median and max business-day lag + the calendar
# median for contrast (the weekend-inflation gauge).
# ---------------------------------------------------------------------------


def _bd_expr(col: str) -> str:
    """SQL for business days in [epoch-Monday, day-index col)."""
    return f"(({col}) DIV 7) * 5 + least(({col}) % 7, 5)"


def q315_business_day_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_shipdate").cast("date").alias("ship_d")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.col("o_orderpriority").alias("prio"),
        F.col("o_orderdate").cast("date").alias("order_d"),
    )
    # Day index with dow 0 = Monday: 1970-01-01 was a Thursday, so
    # shift by +3 to land epoch Monday (1969-12-29) at index 0.
    joined = li.join(orders, "l_orderkey").selectExpr(
        "prio",
        "datediff(order_d, DATE '1969-12-29') AS a",
        "datediff(ship_d, DATE '1969-12-29') AS b",
    )
    clamped = joined.selectExpr(
        "prio",
        # clamp weekend endpoints forward to Monday
        "CASE WHEN a % 7 >= 5 THEN a + (7 - a % 7) ELSE a END AS a2",
        "CASE WHEN b % 7 >= 5 THEN b + (7 - b % 7) ELSE b END AS b2",
        "b - a AS cal_lag",
    ).selectExpr(
        "prio",
        "cal_lag",
        f"({_bd_expr('b2')}) - ({_bd_expr('a2')}) AS bd_lag",
    )
    vc = clamped.groupBy("prio", "bd_lag").agg(F.count("*").alias("cnt"))
    w_cum = Window.partitionBy("prio").orderBy("bd_lag").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy("prio")
    med_bd = (
        vc.select(
            "prio",
            "bd_lag",
            F.sum("cnt").over(w_cum).alias("cum"),
            F.sum("cnt").over(w_all).alias("n"),
        )
        .where(F.col("cum") * 2 >= F.col("n"))
        .groupBy("prio")
        .agg(F.min("bd_lag").alias("med_bd_lag"))
    )
    vc_cal = clamped.groupBy("prio", "cal_lag").agg(
        F.count("*").alias("cnt")
    )
    med_cal = (
        vc_cal.select(
            "prio",
            "cal_lag",
            F.sum("cnt")
            .over(
                Window.partitionBy("prio")
                .orderBy("cal_lag")
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            .alias("cum"),
            F.sum("cnt").over(w_all).alias("n"),
        )
        .where(F.col("cum") * 2 >= F.col("n"))
        .groupBy("prio")
        .agg(F.min("cal_lag").alias("med_cal_lag"))
    )
    base = clamped.groupBy("prio").agg(
        F.count("*").cast("long").alias("n_items"),
        F.max("bd_lag").cast("long").alias("max_bd_lag"),
    )
    return (
        base.join(F.broadcast(med_bd), "prio")
        .join(F.broadcast(med_cal), "prio")
        .select(
            F.col("prio").alias("o_orderpriority"),
            "n_items",
            F.col("med_bd_lag").cast("long").alias("med_bd_lag"),
            F.col("med_cal_lag").cast("long").alias("med_cal_lag"),
            "max_bd_lag",
        )
        .orderBy("o_orderpriority")
    )


Q315_SQL = """
WITH joined AS (
    SELECT o.o_orderpriority AS prio,
           CAST(o.o_orderdate AS DATE) - DATE '1969-12-29' AS a,
           CAST(l.l_shipdate AS DATE) - DATE '1969-12-29' AS b
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
clamped AS (
    SELECT prio, b - a AS cal_lag,
           CASE WHEN a % 7 >= 5 THEN a + (7 - a % 7) ELSE a END AS a2,
           CASE WHEN b % 7 >= 5 THEN b + (7 - b % 7) ELSE b END AS b2
    FROM joined
),
lagged AS (
    SELECT prio, cal_lag,
           ((b2 // 7) * 5 + LEAST(b2 % 7, 5))
           - ((a2 // 7) * 5 + LEAST(a2 % 7, 5)) AS bd_lag
    FROM clamped
),
cdf_bd AS (
    SELECT prio, bd_lag,
           SUM(cnt) OVER (PARTITION BY prio ORDER BY bd_lag
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           SUM(cnt) OVER (PARTITION BY prio) AS n
    FROM (SELECT prio, bd_lag, COUNT(*) AS cnt FROM lagged GROUP BY 1, 2)
),
med_bd AS (SELECT prio, MIN(bd_lag) AS med_bd_lag FROM cdf_bd
           WHERE cum * 2 >= n GROUP BY 1),
cdf_cal AS (
    SELECT prio, cal_lag,
           SUM(cnt) OVER (PARTITION BY prio ORDER BY cal_lag
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           SUM(cnt) OVER (PARTITION BY prio) AS n
    FROM (SELECT prio, cal_lag, COUNT(*) AS cnt FROM lagged GROUP BY 1, 2)
),
med_cal AS (SELECT prio, MIN(cal_lag) AS med_cal_lag FROM cdf_cal
            WHERE cum * 2 >= n GROUP BY 1),
base AS (
    SELECT prio, COUNT(*) AS n_items, MAX(bd_lag) AS max_bd_lag
    FROM lagged GROUP BY 1
)
SELECT b.prio AS o_orderpriority,
       CAST(b.n_items AS BIGINT) AS n_items,
       CAST(m1.med_bd_lag AS BIGINT) AS med_bd_lag,
       CAST(m2.med_cal_lag AS BIGINT) AS med_cal_lag,
       CAST(b.max_bd_lag AS BIGINT) AS max_bd_lag
FROM base b JOIN med_bd m1 USING (prio) JOIN med_cal m2 USING (prio)
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q316 — FUNCTIONAL-DEPENDENCY MINER (the profiling classic): for each
# candidate column pair (A → B) over orders, does A determine B?
# FD holds iff |distinct A| = |distinct (A,B)|; the violation count
# |distinct (A,B)| − |distinct A| is how many extra B-values break it,
# reported with holds flag. Candidate pairs over 4 columns = 12
# directed pairs, all computed in ONE pass (Spark's multi-distinct
# expand; at 100 TB you'd trade this for per-pair sketches). The
# discovered o_orderkey → * dependencies are the primary-key proof.
# ---------------------------------------------------------------------------

_FD_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]


def q316_fd_miner(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    aggs = []
    for a in _FD_COLS:
        aggs.append(F.count_distinct(F.col(a)).alias(f"d_{a}"))
        for b in _FD_COLS:
            if a != b:
                aggs.append(
                    F.count_distinct(F.col(a), F.col(b)).alias(
                        f"d_{a}__{b}"
                    )
                )
    wide = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{a}', '{b}', d_{a}, d_{a}__{b}"
        for a in _FD_COLS
        for b in _FD_COLS
        if a != b
    )
    n_pairs = sum(1 for a in _FD_COLS for b in _FD_COLS if a != b)
    return (
        wide.selectExpr(
            f"stack({n_pairs}, {stack_args})"
            " AS (det, dep, d_det, d_pair)"
        )
        .selectExpr(
            "det",
            "dep",
            "CAST(d_det AS BIGINT) AS n_distinct_det",
            "CAST(d_pair AS BIGINT) AS n_distinct_pair",
            "CAST(d_pair - d_det AS BIGINT) AS n_violations",
            "CAST(CASE WHEN d_pair = d_det THEN 1 ELSE 0 END AS INT)"
            " AS fd_holds",
        )
        .orderBy("det", "dep")
    )


def _q316_sql() -> str:
    cells = []
    for a in _FD_COLS:
        for b in _FD_COLS:
            if a == b:
                continue
            cells.append(
                f"SELECT '{a}' AS det, '{b}' AS dep,"
                f" COUNT(DISTINCT {a}) AS d_det,"
                f" COUNT(DISTINCT ({a}, {b})) AS d_pair FROM orders"
            )
    union = "\n    UNION ALL\n    ".join(cells)
    return f"""
WITH cells AS (
    {union}
)
SELECT det, dep,
       CAST(d_det AS BIGINT) AS n_distinct_det,
       CAST(d_pair AS BIGINT) AS n_distinct_pair,
       CAST(d_pair - d_det AS BIGINT) AS n_violations,
       CAST(CASE WHEN d_pair = d_det THEN 1 ELSE 0 END AS INT) AS fd_holds
FROM cells
ORDER BY det, dep
"""


Q316_SQL = _q316_sql()


WAREHOUSE_QUERIES = {
    "q314_decile_migration": q314_decile_migration,
    "q315_business_day_lag": q315_business_day_lag,
    "q316_fd_miner": q316_fd_miner,
    "q307_single_source_risk": q307_single_source_risk,
    "q308_return_rates": q308_return_rates,
    "q286_fill_rate_curve": q286_fill_rate_curve,
    "q293_brand_price_dispersion": q293_brand_price_dispersion,
    "q298_cycle_time": q298_cycle_time,
    "q302_open_order_aging": q302_open_order_aging,
    "q305_discount_lift": q305_discount_lift,
    "q253_ratio_to_parent": q253_ratio_to_parent,
    "q214_incremental_join": q214_incremental_join,
    "q82_pricing_summary": q82_pricing_summary,
    "q83_shipping_priority": q83_shipping_priority,
    "q84_local_supplier_volume": q84_local_supplier_volume,
    "q85_top_supplier": q85_top_supplier,
    "q86_promo_revenue": q86_promo_revenue,
    "q87_priority_backlog": q87_priority_backlog,
    "q91_incremental_agg": q91_incremental_agg,
    "q96_bilateral_trade": q96_bilateral_trade,
    "q97_returned_items": q97_returned_items,
    "q98_large_orders": q98_large_orders,
    "q100_salted_agg": q100_salted_agg,
    "q103_order_distribution": q103_order_distribution,
    "q104_small_qty_revenue": q104_small_qty_revenue,
    "q105_prospects": q105_prospects,
    "q119_supplier_distribution": q119_supplier_distribution,
    "q120_disjunctive_revenue": q120_disjunctive_revenue,
    "q121_market_share": q121_market_share,
    "q122_nation_profit": q122_nation_profit,
    "q123_ship_delay_bins": q123_ship_delay_bins,
    "q124_sole_late_supplier": q124_sole_late_supplier,
    "q135_forecast_revenue": q135_forecast_revenue,
    "q136_min_cost_supplier": q136_min_cost_supplier,
    "q137_important_stock": q137_important_stock,
    "q138_part_promotion": q138_part_promotion,
    "q181_revenue_concentration": q181_revenue_concentration,
    "q182_order_reconciliation": q182_order_reconciliation,
    "q183_abc_classification": q183_abc_classification,
    "q212_topn_other": q212_topn_other,
}

WAREHOUSE_ORACLES = {
    "q286_fill_rate_curve": Q286_SQL,
    "q293_brand_price_dispersion": Q293_SQL,
    "q298_cycle_time": Q298_SQL,
    "q302_open_order_aging": Q302_SQL,
    "q305_discount_lift": Q305_SQL,
    "q307_single_source_risk": Q307_SQL,
    "q308_return_rates": Q308_SQL,
    "q314_decile_migration": Q314_SQL,
    "q315_business_day_lag": Q315_SQL,
    "q316_fd_miner": Q316_SQL,
    "q253_ratio_to_parent": Q253_SQL,
    "q82_pricing_summary": Q82_SQL,
    "q83_shipping_priority": Q83_SQL,
    "q84_local_supplier_volume": Q84_SQL,
    "q85_top_supplier": Q85_SQL,
    "q86_promo_revenue": Q86_SQL,
    "q87_priority_backlog": Q87_SQL,
    "q91_incremental_agg": Q91_SQL,
    "q96_bilateral_trade": Q96_SQL,
    "q97_returned_items": Q97_SQL,
    "q98_large_orders": Q98_SQL,
    "q100_salted_agg": Q100_SQL,
    "q103_order_distribution": Q103_SQL,
    "q104_small_qty_revenue": Q104_SQL,
    "q105_prospects": Q105_SQL,
    "q119_supplier_distribution": Q119_SQL,
    "q120_disjunctive_revenue": Q120_SQL,
    "q121_market_share": Q121_SQL,
    "q122_nation_profit": Q122_SQL,
    "q123_ship_delay_bins": Q123_SQL,
    "q124_sole_late_supplier": Q124_SQL,
    "q135_forecast_revenue": Q135_SQL,
    "q136_min_cost_supplier": Q136_SQL,
    "q137_important_stock": Q137_SQL,
    "q138_part_promotion": Q138_SQL,
    "q181_revenue_concentration": Q181_SQL,
    "q182_order_reconciliation": Q182_SQL,
    "q183_abc_classification": Q183_SQL,
    "q212_topn_other": Q212_SQL,
    "q214_incremental_join": Q214_SQL,
}


# Moved to plans/stats.py / plans/graph_queries.py in round 7
# (module-size split); re-exported so existing imports keep resolving.
from .stats import (  # noqa: E402,F401
    _EWMA_HORIZON,
    q154_ewma_revenue,
    q173_weekday_seasonality,
)
from .graph_queries import (  # noqa: E402,F401
    _CF_MIN_ITEM,
    _CF_MIN_PAIR,
    _CF_TOP_K,
    q93_pagerank,
    q117_triangle_counts,
    q141_k_core,
    q167_clustering_coefficient,
    q191_hits_scores,
    q204_lpa_communities,
    q207_bfs_hops,
    q215_weighted_paths,
    q177_frequent_pairs,
    q251_item_item_cf,
)
