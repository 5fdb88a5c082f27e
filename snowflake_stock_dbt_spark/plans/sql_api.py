"""[EXT] SQL-string entry path: the engine's ``spark.sql`` surface.

The reference's users write SQL worksheets (reference
sql/03_analytics_queries.sql); this module proves the engine accepts the
same contract: register the corpus as views (sources/tables.py:
register_views) and run SQL text — including constructs the DataFrame
queries don't exercise: a scalar subquery, an IN-subquery, and a
correlated EXISTS. Catalyst compiles them to the same joins/aggregates as
the DataFrame API (scalar subquery → broadcast, IN → left-semi), so the
SQL door costs nothing at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import register_views

#: Orders that beat their priority class's average price, from customers in
#: nations that actually have suppliers. Dialect-portable: runs verbatim on
#: Spark and DuckDB.
Q51_TEXT = """
SELECT o.o_orderkey, o.o_orderpriority, o.o_totalprice
FROM orders o
WHERE o.o_totalprice > (
        SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
               / COUNT(*)
        FROM orders o2
        WHERE o2.o_orderpriority = o.o_orderpriority
      )
  AND o.o_custkey IN (
        SELECT c_custkey FROM customer
        WHERE c_nationkey IN (SELECT s_nationkey FROM supplier)
      )
  AND EXISTS (
        SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
      )
"""


def q51_sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(Q51_TEXT)


#: Latest order per customer, written with Snowflake's QUALIFY — the
#: reference's dedup idiom (reference sql/02_load_data.sql:109-112) as its
#: users would type it. Spark SQL has no QUALIFY; the engine rewrites it
#: (sqldialect.rewrite_qualify). DuckDB supports QUALIFY natively, so the
#: oracle runs the SAME text verbatim — dialect parity end to end.
Q55_TEXT = """
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
FROM orders
QUALIFY ROW_NUMBER() OVER (
            PARTITION BY o_custkey
            ORDER BY o_orderdate DESC NULLS LAST, o_orderkey DESC
        ) = 1
"""


def q55_qualify_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The full worksheet door (scalar rewrites + QUALIFY); this statement
    # only exercises QUALIFY, but routing it through compile_snowflake_sql
    # keeps q55 pinning the whole dialect path.
    from ..sqldialect import compile_snowflake_sql

    register_views(spark, sf_dir)
    return spark.sql(compile_snowflake_sql(Q55_TEXT))


# ---------------------------------------------------------------------------
# Q102 — WITH RECURSIVE (Spark 4's recursive CTE): ancestor closure of a
# deterministic binary-tree hierarchy over supplier ids (parent = id div
# 2), depth-bounded by the tree height. The recursion is the fixpoint
# operator the SQL surface gains in Spark 4 — each step is an ordinary
# join/projection batch, so it scales like the iterative operators in
# operators/graph.py. The DuckDB oracle runs the same recursion with its
# own integer-division spelling (`//` vs Spark's `div`).
# ---------------------------------------------------------------------------

_Q102_SPARK = """
WITH RECURSIVE anc AS (
    SELECT s_suppkey AS node, s_suppkey AS ancestor, 0 AS depth
    FROM supplier
    UNION ALL
    SELECT node, ancestor div 2 AS ancestor, depth + 1
    FROM anc WHERE ancestor > 0
)
SELECT node, CAST(ancestor AS BIGINT) AS ancestor, CAST(depth AS INT) AS depth
FROM anc
ORDER BY node, depth
"""

Q102_TEXT = """
WITH RECURSIVE anc AS (
    SELECT s_suppkey AS node, s_suppkey AS ancestor, 0 AS depth
    FROM supplier
    UNION ALL
    SELECT node, ancestor // 2 AS ancestor, depth + 1
    FROM anc WHERE ancestor > 0
)
SELECT node, CAST(ancestor AS BIGINT) AS ancestor, CAST(depth AS INT) AS depth
FROM anc
ORDER BY node, depth
"""


def q102_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_Q102_SPARK)


#: Top-2 most recent orders per large customer via a LATERAL correlated
#: subquery — the "for each row, run this parameterized subquery" idiom
#: SQL authors reach for before learning window functions. Catalyst
#: DECORRELATES it (DecorrelateInnerQuery): the per-row subquery becomes
#: one window/join over the orders side — no per-customer rescan — so
#: the text costs the same as the QUALIFY formulation at 100 TB. Runs
#: verbatim on DuckDB (native LATERAL), dialect parity end to end.
Q168_TEXT = """
SELECT c.c_custkey, t.o_orderkey, t.o_orderdate, t.o_totalprice
FROM customer c,
LATERAL (
    SELECT o_orderkey, o_orderdate, o_totalprice
    FROM orders o
    WHERE o.o_custkey = c.c_custkey
    ORDER BY o_orderdate DESC, o_orderkey DESC
    LIMIT 2
) t
WHERE c.c_acctbal > 9000
"""


def q168_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(Q168_TEXT)


SQL_API_QUERIES = {
    "q51_sql_surface": q51_sql_surface,
    "q55_qualify_surface": q55_qualify_surface,
    "q102_recursive_cte": q102_recursive_cte,
    "q168_lateral_topn": q168_lateral_topn,
}
SQL_API_ORACLES = {
    "q51_sql_surface": Q51_TEXT,
    "q55_qualify_surface": Q55_TEXT,
    "q102_recursive_cte": Q102_TEXT,
    "q168_lateral_topn": Q168_TEXT,
}
