"""snowflake_stock_dbt_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference repo jilango/Snowflake-Stock-DBT (Snowflake + dbt + Streamlit stock
"most actives" ELT pipeline), re-expressed Spark-first:

- bronze/silver/star ELT with explicit schemas, SHA-256 surrogate keys and
  latest-wins window dedup (reference: sql/02_load_data.sql, dbt models),
- a stakeholder analytics query library (reference: sql/03_analytics_queries.sql),
- dbt-style declarative data-quality checks (reference: dbt_project/models/schema.yml),
- a serving/filter layer (reference: app/streamlit_app.py),
- [EXT] LLM-data-pipeline operators: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard), embedding similarity search, text analysis, multimodal
  column plumbing, and Structured Streaming ingestion.

Everything is built on the public Apache Spark DataFrame/SQL API so Catalyst
supplies optimization (pushdown, broadcast joins, AQE) that the reference
rented from Snowflake.
"""

__version__ = "0.1.0"
