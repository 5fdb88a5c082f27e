from .analytics import ANALYTICS_ORACLES, ANALYTICS_QUERIES
from .events import EVENT_ORACLES, EVENT_QUERIES
from .llm_text import LLM_TEXT_ORACLES, LLM_TEXT_QUERIES
from .multimodal_plans import MULTIMODAL_ORACLES, MULTIMODAL_QUERIES
from .pipeline import PIPELINE_ORACLES, PIPELINE_QUERIES
from .relational import RELATIONAL_ORACLES, RELATIONAL_QUERIES
from .scale import SCALE_ORACLES, SCALE_QUERIES
from .sql_api import SQL_API_ORACLES, SQL_API_QUERIES
from .streaming_plans import STREAMING_ORACLES, STREAMING_QUERIES
from .vectors import VECTOR_ORACLES, VECTOR_QUERIES

#: Every driver-checkable query: name -> fn(spark, sf_dir) -> DataFrame.
ALL_QUERIES = {
    **ANALYTICS_QUERIES,
    **PIPELINE_QUERIES,
    **LLM_TEXT_QUERIES,
    **VECTOR_QUERIES,
    **EVENT_QUERIES,
    **STREAMING_QUERIES,
    **RELATIONAL_QUERIES,
    **MULTIMODAL_QUERIES,
    **SCALE_QUERIES,
    **SQL_API_QUERIES,
}

#: DuckDB oracle SQL for each query (omitted => driver does rows-only check).
ALL_ORACLES = {
    **ANALYTICS_ORACLES,
    **PIPELINE_ORACLES,
    **LLM_TEXT_ORACLES,
    **VECTOR_ORACLES,
    **EVENT_ORACLES,
    **STREAMING_ORACLES,
    **RELATIONAL_ORACLES,
    **MULTIMODAL_ORACLES,
    **SCALE_ORACLES,
    **SQL_API_ORACLES,
}

__all__ = [
    "ALL_ORACLES",
    "ALL_QUERIES",
    "ANALYTICS_ORACLES",
    "ANALYTICS_QUERIES",
    "PIPELINE_ORACLES",
    "PIPELINE_QUERIES",
]
