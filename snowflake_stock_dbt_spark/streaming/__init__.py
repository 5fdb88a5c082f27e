from .pipeline import (
    run_streaming_query,
    stream_events,
    streaming_dedup,
    streaming_tumbling_agg,
)

__all__ = [
    "run_streaming_query",
    "stream_events",
    "streaming_dedup",
    "streaming_tumbling_agg",
]
