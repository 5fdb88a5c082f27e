"""[EXT] foreachBatch idempotent upsert sink — the production shape for
"stream into a warehouse table".

The memory-sink driver in pipeline.py is the test/driver harness; a real
deployment lands micro-batches into a mutable table. Spark's contract for
that is ``foreachBatch``: each micro-batch arrives as a batch DataFrame
plus a monotonically increasing ``batch_id``, and the sink function must
be IDEMPOTENT because a batch can be re-delivered after a failure
(Structured Streaming guarantees at-least-once delivery to foreachBatch;
exactly-once is the sink's job).

Idempotency here comes from the MERGE itself: the batch is first reduced
to one row per key (latest-wins — the reference's dedup-before-MERGE,
sql/02_load_data.sql:109-112), then key-merged into the target
(operators/upsert.py), so replaying a delivered batch rewrites identical
rows — a no-op. This mirrors the reference's COPY → dedup → MERGE
pipeline, continuously.

At 100 TB: pass ``partition_col`` so each micro-batch only rewrites the
partitions it touches (dynamic partition overwrite); with Delta/Iceberg
on the classpath, swap the inner call for ``delta_merge_upsert`` and the
transaction log replaces the directory overwrite.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup import latest_wins
from ..operators.upsert import merge_upsert_write


def start_upsert_stream(
    stream_df: DataFrame,
    path: str,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
    checkpoint_dir: str | None = None,
    partition_col: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously upsert a stream into the Parquet table at ``path``.

    Each micro-batch is deduped to one row per ``keys`` (first under
    ``order_by`` — give it a unique tiebreaker) and MERGEd by key.
    Returns the started query; callers drive it (``processAllAvailable``
    for drain-now semantics, or let it run on a trigger).
    """
    spark = stream_df.sparkSession

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # foreachBatch hands over a LAZY frame: every action below would
        # otherwise re-scan the micro-batch's source files (observed: a
        # 3-row batch reporting 6 input rows — isEmpty + the merge's jobs
        # each re-read). Persist once per batch.
        batch_df.persist()
        try:
            if batch_df.isEmpty():
                return
            src = latest_wins(batch_df, keys=keys, order_by=order_by)
            merge_upsert_write(
                spark, path, src, list(keys), partition_col=partition_col
            )
        finally:
            batch_df.unpersist()

    writer = stream_df.writeStream.foreachBatch(sink).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
