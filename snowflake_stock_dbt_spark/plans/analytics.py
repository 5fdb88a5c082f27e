"""The five stakeholder analytics queries (reference sql/03_analytics_queries.sql:6-148).

Re-expressed on the driver's TPC-H-ish corpus with the star-schema roles of
FIXTURES.md §6: fct ≈ ``lineitem``/``orders`` (date grain ``l_shipdate``/
``o_orderdate``), dim ≈ ``part``/``customer``/``nation``/``region``.

Each query ships as (a) a DataFrame function — the engine implementation —
and (b) a DuckDB SQL oracle string with identical semantics and column
aliases, used by the driver's differential check.

Determinism contract (needed for hash-compare):
- every ORDER BY under a LIMIT carries a unique tiebreaker key;
- double aggregation uses the exact-decimal recipe of functions/numeric.py;
- window frames are ordered by a unique key sequence.

Scale notes (100 TB): dims are broadcast (J1 mapping, SURVEY.md §2.3);
global stats use two-pass agg→broadcast, never an unpartitioned window
(SURVEY.md §2.9); top-K compiles to TakeOrderedAndProject, not a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import SQL_DEC_AVG, SQL_DEC_SUM, dec_avg, dec_std_columns, dec_sum
from ..sources.tables import load_table

# ---------------------------------------------------------------------------
# Q1 — Top 10 entities by metric (reference sql/03_analytics_queries.sql:6-22)
# fct=lineitem, dim=part, metric=MAX(l_extendedprice).
# p_partkey joins the GROUP BY as the deterministic tiebreaker under LIMIT.
# ---------------------------------------------------------------------------


def q01_top_by_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy("p_partkey", "p_name", "p_brand", "p_type")
        .agg(F.max("l_extendedprice").alias("latest_metric"))
        .orderBy(F.desc("latest_metric"), F.asc("p_partkey"))
        .limit(10)
    )


Q01_SQL = """
SELECT p_partkey, p_name, p_brand, p_type,
       MAX(l_extendedprice) AS latest_metric
FROM lineitem
JOIN part ON l_partkey = p_partkey
GROUP BY p_partkey, p_name, p_brand, p_type
ORDER BY latest_metric DESC, p_partkey
LIMIT 10
"""

# ---------------------------------------------------------------------------
# Q2 — Metric trend over time (reference sql/03_analytics_queries.sql:24-32)
# Daily average price/volume + distinct active entities on the l_shipdate grain.
# ---------------------------------------------------------------------------


def q02_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy(F.to_date("l_shipdate").alias("observation_date"))
        .agg(
            dec_avg("l_extendedprice").alias("avg_price"),
            dec_avg("l_quantity").alias("avg_volume"),
            F.countDistinct("l_suppkey").alias("active_entities"),
        )
        .orderBy("observation_date")
    )


Q02_SQL = f"""
SELECT CAST(l_shipdate AS DATE) AS observation_date,
       {SQL_DEC_AVG.format(x='l_extendedprice')} AS avg_price,
       {SQL_DEC_AVG.format(x='l_quantity')} AS avg_volume,
       COUNT(DISTINCT l_suppkey) AS active_entities
FROM lineitem
GROUP BY CAST(l_shipdate AS DATE)
ORDER BY observation_date
"""

# ---------------------------------------------------------------------------
# Q3 — Z-score outliers (reference sql/03_analytics_queries.sql:34-65)
# fct=events (heavy-tailed ``value`` metric), dim=customer (user_id joins
# c_custkey). Two-pass form: global stats aggregated then broadcast via a
# 1-row cross join — the reference's CROSS JOIN volume_stats, and the shape
# that survives 100 TB (an unpartitioned window would funnel everything
# through one task, SURVEY.md §2.9). Stats come from exact decimal sums so
# both engines score identically.
# ---------------------------------------------------------------------------

ZSCORE_THRESHOLD = 3.0


def q03_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    metric = F.col("value")

    n, s1, s2 = dec_std_columns(metric)
    stats = (
        events.where(metric.isNotNull())
        .agg(n.alias("n"), s1.alias("s1"), s2.alias("s2"))
        .select(
            (F.col("s1") / F.col("n")).alias("mean_v"),
            F.sqrt(
                (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
                / (F.col("n") - F.lit(1.0))
            ).alias("std_v"),
        )
    )

    scored = (
        events.where(metric.isNotNull())
        .join(F.broadcast(customer), events.user_id == customer.c_custkey)
        .crossJoin(F.broadcast(stats))
        .select(
            F.to_date("ts").alias("observation_date"),
            "event_id",
            "c_name",
            "event_type",
            metric.alias("volume"),
            (
                (metric - F.col("mean_v")) / F.nullif(F.col("std_v"), F.lit(0.0))
            ).alias("volume_z_score"),
        )
    )
    return scored.where(F.abs(F.col("volume_z_score")) >= ZSCORE_THRESHOLD).orderBy(
        F.abs(F.col("volume_z_score")).desc(), F.col("event_id")
    )


Q03_SQL = f"""
WITH volume_stats AS (
    SELECT CAST(COUNT(value) AS DOUBLE) AS n,
           {SQL_DEC_SUM.format(x='value')} AS s1,
           {SQL_DEC_SUM.format(x='value * value')} AS s2
    FROM events
    WHERE value IS NOT NULL
),
derived AS (
    SELECT s1 / n AS mean_v,
           sqrt((s2 - s1 * s1 / n) / (n - 1.0)) AS std_v
    FROM volume_stats
),
scored AS (
    SELECT CAST(e.ts AS DATE) AS observation_date,
           e.event_id,
           c.c_name,
           e.event_type,
           e.value AS volume,
           (e.value - s.mean_v) / NULLIF(s.std_v, 0.0) AS volume_z_score
    FROM events AS e
    JOIN customer AS c ON e.user_id = c.c_custkey
    CROSS JOIN derived AS s
    WHERE e.value IS NOT NULL
)
SELECT * FROM scored
WHERE ABS(volume_z_score) >= {ZSCORE_THRESHOLD}
ORDER BY ABS(volume_z_score) DESC, event_id
"""

# ---------------------------------------------------------------------------
# Q4 — Geographic rollup (reference sql/03_analytics_queries.sql:67-78)
# fct=orders, geography=customer→nation→region. COALESCE on the group key
# mirrors the reference's 'Unknown' defaulting (n_name is non-null here, but
# the semantics are the contract).
# ---------------------------------------------------------------------------


def q04_geo_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    geo = customer.join(
        F.broadcast(
            nation.join(region, nation.n_regionkey == region.r_regionkey).select(
                "n_nationkey", "n_name", "r_name"
            )
        ),
        customer.c_nationkey == F.col("n_nationkey"),
    )
    return (
        orders.join(F.broadcast(geo), orders.o_custkey == geo.c_custkey)
        .groupBy(
            F.coalesce(F.col("n_name"), F.lit("Unknown")).alias("location"),
            F.col("r_name").alias("region_name"),
        )
        .agg(
            F.countDistinct("c_custkey").alias("entity_count"),
            dec_avg("o_totalprice").alias("avg_price"),
            dec_sum("o_totalprice").alias("total_volume"),
        )
        .orderBy(F.desc("total_volume"), F.asc("location"))
    )


Q04_SQL = f"""
SELECT COALESCE(n.n_name, 'Unknown') AS location,
       r.r_name AS region_name,
       COUNT(DISTINCT c.c_custkey) AS entity_count,
       {SQL_DEC_AVG.format(x='o.o_totalprice')} AS avg_price,
       {SQL_DEC_SUM.format(x='o.o_totalprice')} AS total_volume
FROM orders AS o
JOIN customer AS c ON o.o_custkey = c.c_custkey
JOIN nation AS n ON c.c_nationkey = n.n_nationkey
JOIN region AS r ON n.n_regionkey = r.r_regionkey
GROUP BY COALESCE(n.n_name, 'Unknown'), r.r_name
ORDER BY total_volume DESC, location
"""

# ---------------------------------------------------------------------------
# Q5 — Risk watchlist: volume spikes with weak price momentum
# (reference sql/03_analytics_queries.sql:80-148). fct=lineitem per part:
# 7-row moving average of l_quantity (ROWS BETWEEN 6 PRECEDING AND CURRENT
# ROW, W3) + LAG(l_extendedprice, 7) (W4), ratio/momentum guards (F13/F15),
# compound predicate (P4), multi-key sort + LIMIT 50 (O4).
# Window ordering carries (l_shipdate, l_orderkey, l_linenumber) so frames
# are total-ordered — shipdate alone has ties, which would make the frame
# contents (hence the moving average) nondeterministic.
# ---------------------------------------------------------------------------


def q05_risk_watchlist(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    order_keys = [F.col("l_shipdate"), F.col("l_orderkey"), F.col("l_linenumber")]
    w = Window.partitionBy("l_partkey").orderBy(*order_keys)
    w7 = w.rowsBetween(-6, 0)

    vol = F.col("l_quantity")
    price = F.col("l_extendedprice")
    windowed = lineitem.select(
        F.to_date("l_shipdate").alias("observation_date"),
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        vol.alias("volume"),
        price.alias("price"),
        (
            F.sum(vol.cast("decimal(38,6)")).over(w7).cast("double")
            / F.count(vol).over(w7).cast("double")
        ).alias("volume_7d_avg"),
        F.lag(price, 7).over(w).alias("price_7d_ago"),
    )
    flags = windowed.select(
        "*",
        F.when(
            F.col("volume_7d_avg").isNull() | (F.col("volume_7d_avg") == 0), None
        )
        .otherwise(F.col("volume") / F.col("volume_7d_avg"))
        .alias("volume_spike_ratio"),
        F.when(
            F.col("price_7d_ago").isNull() | (F.col("price_7d_ago") == 0), None
        )
        .otherwise((F.col("price") - F.col("price_7d_ago")) / F.col("price_7d_ago"))
        .alias("price_momentum_7d"),
    )
    return (
        flags.where(
            (F.col("volume_spike_ratio") >= 1.5) & (F.col("price_momentum_7d") <= 0)
        )
        .select(
            "observation_date",
            "l_partkey",
            "l_orderkey",
            "l_linenumber",
            "volume",
            "volume_7d_avg",
            "volume_spike_ratio",
            "price",
            "price_momentum_7d",
        )
        .orderBy(
            F.desc("volume_spike_ratio"),
            F.asc("price_momentum_7d"),
            F.asc("l_orderkey"),
            F.asc("l_linenumber"),
        )
        .limit(50)
    )


Q05_SQL = """
WITH windowed AS (
    SELECT CAST(l_shipdate AS DATE) AS observation_date,
           l_partkey, l_orderkey, l_linenumber,
           l_quantity AS volume,
           l_extendedprice AS price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) OVER w7 AS DOUBLE)
             / CAST(COUNT(l_quantity) OVER w7 AS DOUBLE) AS volume_7d_avg,
           LAG(l_extendedprice, 7) OVER wo AS price_7d_ago
    FROM lineitem
    WINDOW
      w7 AS (PARTITION BY l_partkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
      wo AS (PARTITION BY l_partkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber)
),
flags AS (
    SELECT *,
           CASE WHEN volume_7d_avg IS NULL OR volume_7d_avg = 0 THEN NULL
                ELSE volume / volume_7d_avg END AS volume_spike_ratio,
           CASE WHEN price_7d_ago IS NULL OR price_7d_ago = 0 THEN NULL
                ELSE (price - price_7d_ago) / price_7d_ago END AS price_momentum_7d
    FROM windowed
)
SELECT observation_date, l_partkey, l_orderkey, l_linenumber,
       volume, volume_7d_avg, volume_spike_ratio, price, price_momentum_7d
FROM flags
WHERE volume_spike_ratio >= 1.5
  AND price_momentum_7d <= 0
ORDER BY volume_spike_ratio DESC, price_momentum_7d ASC, l_orderkey, l_linenumber
LIMIT 50
"""

# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Q140 — daily VWAP + trailing-7-day smoothing: the stock-dashboard
# time-series op the reference's trend chart implies (volume-weighted
# price instead of q02's plain mean, plus the moving average every
# finance UI overlays). Determinism: VWAP = exact-decimal Σ(p·v)/Σ(v)
# (one correctly-rounded division of identical doubles), then QUANTIZED
# to a 1e-6 integer grid BEFORE the window — windowed AVG of doubles is
# NOT cross-engine stable (DuckDB's segment-tree accumulates in a
# different order than Spark's running frame), but windowed SUM of
# int64 is exact in any order. The trailing window is unpartitioned by
# design: it runs over the DATE-grain aggregate, a calendar-bounded
# frame (≤ ~37k rows/century) — bounded state, not a scale hazard.
# ---------------------------------------------------------------------------


def q140_vwap_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pv = F.col("l_extendedprice") * F.col("l_quantity")
    daily = li.groupBy(
        F.to_date("l_shipdate").alias("observation_date")
    ).agg(
        dec_sum(pv).alias("pv"),
        dec_sum("l_quantity").alias("total_volume"),
    )
    vq = F.floor(F.col("pv") / F.col("total_volume") * F.lit(1e6)).cast(
        "long"
    )
    w = Window.orderBy("observation_date").rowsBetween(-6, 0)
    keyed = daily.select("observation_date", "total_volume", vq.alias("vq"))
    return keyed.select(
        "observation_date",
        (F.col("vq").cast("double") / F.lit(1e6)).alias("vwap"),
        (
            F.sum("vq").over(w).cast("double")
            / F.count("*").over(w)
            / F.lit(1e6)
        ).alias("vwap_trail7"),
        "total_volume",
    ).orderBy("observation_date")


Q140_SQL = f"""
WITH daily AS (
    SELECT CAST(l_shipdate AS DATE) AS observation_date,
           {SQL_DEC_SUM.format(x='l_extendedprice * l_quantity')} AS pv,
           {SQL_DEC_SUM.format(x='l_quantity')} AS total_volume
    FROM lineitem
    GROUP BY 1
),
keyed AS (
    SELECT observation_date, total_volume,
           CAST(FLOOR(pv / total_volume * 1000000.0) AS BIGINT) AS vq
    FROM daily
)
SELECT observation_date,
       CAST(vq AS DOUBLE) / 1000000.0 AS vwap,
       CAST(SUM(vq) OVER w AS DOUBLE) / COUNT(*) OVER w / 1000000.0
           AS vwap_trail7,
       total_volume
FROM keyed
WINDOW w AS (ORDER BY observation_date
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
ORDER BY observation_date
"""


ANALYTICS_QUERIES = {
    "q01_top_by_metric": q01_top_by_metric,
    "q02_daily_trend": q02_daily_trend,
    "q03_zscore_outliers": q03_zscore_outliers,
    "q04_geo_rollup": q04_geo_rollup,
    "q05_risk_watchlist": q05_risk_watchlist,
    "q140_vwap_trend": q140_vwap_trend,
}

ANALYTICS_ORACLES = {
    "q01_top_by_metric": Q01_SQL,
    "q02_daily_trend": Q02_SQL,
    "q03_zscore_outliers": Q03_SQL,
    "q04_geo_rollup": Q04_SQL,
    "q05_risk_watchlist": Q05_SQL,
    "q140_vwap_trend": Q140_SQL,
}
