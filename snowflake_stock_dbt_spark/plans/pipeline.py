"""ELT-pipeline and serving-layer operators as driver-checkable queries.

Covers the reference's load/transform/serve operator inventory (SURVEY.md §2)
on the driver corpus: latest-wins dedup (W1/W2), surrogate-key hashing
(F4/F5), strict load-quality aggregates (A5-A7), dup-key detection (P7),
bucketization (F17), serving filter→threshold→sort→limit (P5-P6/O5),
distinct option lists (A10), JSON prop extraction ([EXT] per SURVEY.md §2.8),
MERGE-upsert semantics (J6), and a TPC-H-Q1-style pricing summary (the
classic wide-agg shape Catalyst turns into a single hash aggregate).

All timestamps are compared at microsecond precision: the events table is
TIMESTAMP(NANOS) on disk; Spark reads it truncated (sources/tables.py), so
every oracle casts ``ts`` with ``CAST(ts AS TIMESTAMP)`` — DuckDB's own
truncating ns→µs cast — before ordering, grouping, or output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.keys import sha_key, sha_key_sql
from ..functions.numeric import SQL_DEC_SUM, dec_sum
from ..operators.dedup import latest_wins
from ..operators.upsert import merge_upsert
from ..serving.filters import apply_filters
from ..sources.tables import load_table

# ---------------------------------------------------------------------------
# Q6 — Latest-wins dedup (reference sql/02_load_data.sql:109-112, W1;
# dim_entity latest-record-per-entity, dbt models/dim_entity.sql:15-31, W2).
# One row per (user_id, event_type): the latest by ts, event_id tiebreak.
# ---------------------------------------------------------------------------


def q06_latest_wins_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    deduped = latest_wins(
        events,
        keys=["user_id", "event_type"],
        order_by=[F.col("ts").desc_nulls_last(), F.col("event_id").desc()],
    )
    return deduped.select(
        "user_id",
        "event_type",
        F.col("ts").alias("last_ts"),
        F.col("value").alias("last_value"),
        "event_id",
    )


Q06_SQL = """
SELECT user_id, event_type,
       CAST(ts AS TIMESTAMP) AS last_ts,
       value AS last_value,
       event_id
FROM events
QUALIFY ROW_NUMBER() OVER (
    PARTITION BY user_id, event_type
    ORDER BY CAST(ts AS TIMESTAMP) DESC NULLS LAST, event_id DESC
) = 1
"""

# ---------------------------------------------------------------------------
# Q7 — Surrogate-key hashing (reference sql/02_load_data.sql:81-91, F4/F5):
# SHA2(CONCAT_WS('|', COALESCE(TRIM(col),'')...), 256), bit-identical across
# Spark / Snowflake / DuckDB. entity_sk from attributes; observation_sk adds
# the grain column — exactly the reference's two-key recipe.
# ---------------------------------------------------------------------------


def q07_surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey",
        sha_key(F.col("c_name"), F.col("c_mktsegment")).alias("entity_sk"),
        sha_key(
            F.col("c_name"), F.col("c_mktsegment"), F.col("c_custkey").cast("string")
        ).alias("observation_sk"),
    )


Q07_SQL = f"""
SELECT c_custkey,
       {sha_key_sql('c_name', 'c_mktsegment')} AS entity_sk,
       {sha_key_sql('c_name', 'c_mktsegment', 'CAST(c_custkey AS VARCHAR)')} AS observation_sk
FROM customer
"""

# ---------------------------------------------------------------------------
# Q8 — Strict post-load quality aggregate (reference sql/02_load_data.sql:66-73,
# A5/A6): one row of COUNT(*) + conditional counts. COUNT_IF is expressed as
# SUM(CASE WHEN...) so both engines return plain BIGINT.
# ---------------------------------------------------------------------------


def _count_if(cond) -> F.Column:
    return F.sum(F.when(cond, 1).otherwise(0)).cast("long")


def q08_quality_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return events.agg(
        F.count("*").alias("raw_row_count"),
        _count_if(F.col("user_id").isNull()).alias("missing_user_rows"),
        _count_if(F.col("value").isNull() | F.isnan("value")).alias(
            "invalid_value_rows"
        ),
        _count_if(F.col("props").isNull() | (F.trim("props") == "")).alias(
            "missing_props_rows"
        ),
        _count_if(k.isNull()).alias("invalid_props_rows"),
    )


Q08_SQL = """
SELECT COUNT(*) AS raw_row_count,
       CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS missing_user_rows,
       CAST(SUM(CASE WHEN value IS NULL OR isnan(value) THEN 1 ELSE 0 END) AS BIGINT) AS invalid_value_rows,
       CAST(SUM(CASE WHEN props IS NULL OR TRIM(props) = '' THEN 1 ELSE 0 END) AS BIGINT) AS missing_props_rows,
       CAST(SUM(CASE WHEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS invalid_props_rows
FROM events
"""

# ---------------------------------------------------------------------------
# Q9 — Duplicate-key detection (reference sql/02_load_data.sql:170-175, A7/P7):
# GROUP BY natural key HAVING COUNT(*) > 1.
# ---------------------------------------------------------------------------


def q09_dup_key_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id", "event_type", "ts")
        .count()
        .where(F.col("count") > 1)
        .select(
            "user_id", "event_type", F.col("ts").alias("dup_ts"),
            F.col("count").alias("duplicate_count"),
        )
    )


Q09_SQL = """
SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS dup_ts,
       COUNT(*) AS duplicate_count
FROM events
GROUP BY user_id, event_type, CAST(ts AS TIMESTAMP)
HAVING COUNT(*) > 1
"""

# ---------------------------------------------------------------------------
# Q10 — Bucketization (reference app/streamlit_app.py:82-87, F17): pd.cut
# right-closed bins + 'Unknown' for NULL, as a CASE expression, then a
# group-count over the derived label.
# ---------------------------------------------------------------------------


def q10_bucketize(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    bucket = (
        F.when(bal.isNull(), F.lit("Unknown"))
        .when(bal <= 0, F.lit("Negative"))
        .when(bal <= 1000, F.lit("Small"))
        .when(bal <= 5000, F.lit("Mid"))
        .otherwise(F.lit("Large"))
    )
    return (
        customer.select(bucket.alias("balance_bucket"))
        .groupBy("balance_bucket")
        .agg(F.count("*").alias("customer_count"))
        .orderBy("balance_bucket")
    )


Q10_SQL = """
SELECT CASE
         WHEN c_acctbal IS NULL THEN 'Unknown'
         WHEN c_acctbal <= 0 THEN 'Negative'
         WHEN c_acctbal <= 1000 THEN 'Small'
         WHEN c_acctbal <= 5000 THEN 'Mid'
         ELSE 'Large'
       END AS balance_bucket,
       COUNT(*) AS customer_count
FROM customer
GROUP BY 1
ORDER BY balance_bucket
"""

# ---------------------------------------------------------------------------
# Q11 — Serving filter chain (reference app/streamlit_app.py:167-187,
# P5/P6/O5): equality filters (with 'All' sentinel skip), COALESCE(metric,0)
# threshold, sort desc, LIMIT 20 — via the engine's serving layer.
# ---------------------------------------------------------------------------


def q11_filter_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return apply_filters(
        events.select("event_id", "user_id", "event_type", "value"),
        equality_filters={"event_type": "purchase", "user_id": "All"},
        metric="value",
        min_threshold=10.0,
        sort_by="value",
        tiebreaker="event_id",
        limit=20,
    )


Q11_SQL = """
SELECT event_id, user_id, event_type, value
FROM events
WHERE event_type = 'purchase'
  AND COALESCE(value, 0.0) >= 10.0
ORDER BY value DESC NULLS LAST, event_id
LIMIT 20
"""

# ---------------------------------------------------------------------------
# Q12 — Distinct option list (reference app/streamlit_app.py:156-164, A10):
# sorted distinct non-null values for a filter widget.
# ---------------------------------------------------------------------------


def q12_distinct_options(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.select("event_type")
        .where(F.col("event_type").isNotNull())
        .distinct()
        .orderBy("event_type")
    )


Q12_SQL = """
SELECT DISTINCT event_type FROM events
WHERE event_type IS NOT NULL
ORDER BY event_type
"""

# ---------------------------------------------------------------------------
# Q13 — JSON prop extraction + rollup ([EXT], SURVEY.md §2.8: the reference
# has no JSON functions; events.props is the driver's semi-structured column).
# get_json_object stays JVM-side; sums are exact ints.
# ---------------------------------------------------------------------------


def q13_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_props"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").alias("sum_k"),
        )
        .orderBy("event_type")
    )


Q13_SQL = """
SELECT event_type,
       COUNT(k) AS n_props,
       MIN(k) AS min_k,
       MAX(k) AS max_k,
       CAST(SUM(k) AS BIGINT) AS sum_k
FROM (
    SELECT event_type,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
)
GROUP BY event_type
ORDER BY event_type
"""

# ---------------------------------------------------------------------------
# Q59 — from_json with an explicit schema (the declared-schema counterpart
# to q13's get_json_object path, SURVEY.md §2.8 note): parse props into a
# typed struct once, then aggregate on the extracted field. At scale the
# schema-on-read parse happens in one codegen pass; malformed documents
# null out (non-ANSI), they don't fail the job — the TRY_TO_* loading
# contract applied to JSON.
# ---------------------------------------------------------------------------


def q59_from_json_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    events = load_table(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.LongType())])
    parsed = events.select(
        "event_type", F.from_json(F.col("props"), schema).alias("p")
    )
    return (
        # Integer `div`, not double /10 + cast: exact for |k| > 2^53 and
        # truncates toward zero exactly like DuckDB's `//` (verified for
        # negatives: both give -7//10 = 0, -17//10 = -1).
        parsed.select(
            "event_type", F.expr("p.k div 10").cast("long").alias("k_decile")
        )
        .groupBy("event_type", "k_decile")
        .agg(F.count("*").alias("n_events"))
        .orderBy("event_type", "k_decile")
    )


Q59_SQL = """
SELECT event_type,
       CAST(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS BIGINT)
           AS k_decile,
       COUNT(*) AS n_events
FROM events
GROUP BY event_type, k_decile
ORDER BY event_type, k_decile
"""


# ---------------------------------------------------------------------------
# Q69 — Column profiling: per-column count / nulls / min / max / exact avg
# for the numeric measures, computed in ONE aggregation pass (all metrics
# as aggregate columns) and unpivoted to long form — the df.summary()
# analog a warehouse's data-profiler runs, kept deterministic via the
# exact-decimal average recipe.
# ---------------------------------------------------------------------------

_PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def q69_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.numeric import dec_avg

    li = load_table(spark, sf_dir, "lineitem")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(c).alias(f"{c}__n"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"{c}__nulls"),
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
            dec_avg(c).alias(f"{c}__avg"),
        ]
    wide = li.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', {c}__n, {c}__nulls, {c}__min, {c}__max, {c}__avg"
        for c in _PROFILE_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stacked}) "
            "AS (column_name, n, n_nulls, min_v, max_v, avg_v)"
        )
    ).orderBy("column_name")


def _profile_sql() -> str:
    from ..functions.numeric import SQL_DEC_AVG

    parts = [
        f"""
SELECT '{c}' AS column_name,
       COUNT({c}) AS n,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       MIN({c}) AS min_v,
       MAX({c}) AS max_v,
       {SQL_DEC_AVG.format(x=c)} AS avg_v
FROM lineitem"""
        for c in _PROFILE_COLS
    ]
    return " UNION ALL ".join(parts) + " ORDER BY column_name"


Q69_SQL = _profile_sql()


# ---------------------------------------------------------------------------
# Q14 — MERGE upsert semantics (reference sql/02_load_data.sql:78-165, J6):
# matched rows replaced wholesale from source, unmatched inserted. Source =
# every 7th order re-priced; result = anti-join + union, the exact relational
# content of the reference MERGE.
# ---------------------------------------------------------------------------


def q14_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    source = orders.where(F.col("o_orderkey") % 7 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 1.1
    )
    return merge_upsert(orders, source, "o_orderkey")


Q14_SQL = """
WITH src AS (
    SELECT o_orderkey, o_custkey, o_orderstatus,
           o_totalprice * 1.1 AS o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 7 = 0
),
kept AS (
    SELECT * FROM orders
    WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src)
)
SELECT * FROM kept
UNION ALL
SELECT * FROM src
"""

# ---------------------------------------------------------------------------
# Q15 — Pricing summary (TPC-H Q1 shape): the canonical wide hash-aggregate —
# map-side partial agg + single shuffle on two low-cardinality keys. The
# reference's A-category aggregates (SURVEY.md §2.4) generalized to the
# classic OLAP form; per-row products in double, sums in exact decimal.
# ---------------------------------------------------------------------------


def q15_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread=True: same shape and rationale as q82 (guide §2.5);
    # measured 1.07s -> 0.86s at sf0.1, no-op at scale.
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity").alias("sum_qty"),
            dec_sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price.cast("decimal(38,6)")).cast("double").alias(
                "sum_disc_price"
            ),
            F.sum(charge.cast("decimal(38,6)")).cast("double").alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q15_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {SQL_DEC_SUM.format(x='l_quantity')} AS sum_qty,
       {SQL_DEC_SUM.format(x='l_extendedprice')} AS sum_base_price,
       {SQL_DEC_SUM.format(x='l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {SQL_DEC_SUM.format(x='l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Q126 — VARIANT-typed semi-structured access (Spark 4's VARIANT):
# parse_json once into the binary variant encoding, then typed path
# extraction with try_variant_get — the modern engine path for JSON
# columns (single parse, no per-path re-parse like get_json_object, and
# the open-schema alternative to q59's fixed from_json struct). Exact
# integer aggregates keep the full value oracle.
# ---------------------------------------------------------------------------


def q126_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    k = F.try_variant_get(v, "$.k", "bigint")
    missing = F.try_variant_get(v, "$.absent_field", "bigint")
    return (
        events.select("event_type", k.alias("k"), missing.alias("m"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.count("k").alias("n_with_k"),
            F.sum("k").cast("long").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            F.count("m").alias("n_with_absent_field"),
        )
        .orderBy("event_type")
    )


Q126_SQL = """
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
       CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
           AS k_sum,
       MIN(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_min,
       MAX(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max,
       COUNT(TRY_CAST(json_extract_string(props, '$.absent_field') AS BIGINT))
           AS n_with_absent_field
FROM events
GROUP BY event_type
ORDER BY event_type
"""


PIPELINE_QUERIES = {
    "q06_latest_wins_dedup": q06_latest_wins_dedup,
    "q07_surrogate_keys": q07_surrogate_keys,
    "q08_quality_metrics": q08_quality_metrics,
    "q09_dup_key_check": q09_dup_key_check,
    "q10_bucketize": q10_bucketize,
    "q11_filter_sort_limit": q11_filter_sort_limit,
    "q12_distinct_options": q12_distinct_options,
    "q13_json_props": q13_json_props,
    "q59_from_json_histogram": q59_from_json_histogram,
    "q69_profile": q69_profile,
    "q14_upsert_merge": q14_upsert_merge,
    "q15_pricing_summary": q15_pricing_summary,
    "q126_variant_props": q126_variant_props,
}

PIPELINE_ORACLES = {
    "q06_latest_wins_dedup": Q06_SQL,
    "q07_surrogate_keys": Q07_SQL,
    "q08_quality_metrics": Q08_SQL,
    "q09_dup_key_check": Q09_SQL,
    "q10_bucketize": Q10_SQL,
    "q11_filter_sort_limit": Q11_SQL,
    "q12_distinct_options": Q12_SQL,
    "q13_json_props": Q13_SQL,
    "q59_from_json_histogram": Q59_SQL,
    "q69_profile": Q69_SQL,
    "q14_upsert_merge": Q14_SQL,
    "q15_pricing_summary": Q15_SQL,
    "q126_variant_props": Q126_SQL,
}
