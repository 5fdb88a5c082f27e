"""[EXT] Streaming queries exposed through the driver contract.

q29 drives a real Structured Streaming job (file source → watermark →
tumbling window → memory sink, complete mode) and returns its final state —
which equals the batch tumbling-window semantics, so it carries a full SQL
oracle. q30 is streaming first-seen dedup; survivor rows depend on stream
encounter order, so only the key set is contractual → emitted as sorted
keys + count, which IS deterministic and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import SQL_DEC_SUM
from ..streaming.pipeline import (
    run_streaming_query,
    stream_events,
    streaming_dedup,
    streaming_tumbling_agg,
)

WINDOW_S = 300


def q29_streaming_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(spark, sf_dir)
    agg = streaming_tumbling_agg(ev, window_s=WINDOW_S)
    return run_streaming_query(spark, agg, output_mode="complete")


Q29_SQL = f"""
SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // {WINDOW_S * 1_000_000})
         * {WINDOW_S * 1_000_000} AS window_start_us,
       event_type,
       COUNT(*) AS n_events,
       {SQL_DEC_SUM.format(x='value')} AS total_value
FROM events
GROUP BY 1, 2
"""


def q30_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = stream_events(spark, sf_dir)
    deduped = streaming_dedup(ev, keys=["user_id", "event_type"])
    out = run_streaming_query(spark, deduped, output_mode="append")
    # Survivor payload depends on encounter order; the key set does not.
    return (
        out.groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n_rows"))
        .orderBy("user_id", "event_type")
    )


Q30_SQL = """
SELECT user_id, event_type, CAST(1 AS BIGINT) AS n_rows
FROM events
GROUP BY user_id, event_type
ORDER BY user_id, event_type
"""


STREAMING_QUERIES = {
    "q29_streaming_window": q29_streaming_window,
    "q30_streaming_dedup": q30_streaming_dedup,
}

STREAMING_ORACLES = {
    "q29_streaming_window": Q29_SQL,
    "q30_streaming_dedup": Q30_SQL,
}
