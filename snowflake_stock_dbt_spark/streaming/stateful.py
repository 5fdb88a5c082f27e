"""[EXT] Custom stateful streaming operator via ``applyInPandasWithState``.

The reference has no streaming at all (SURVEY.md §2.10); this is the
north-star "custom stateful operator" seam: arbitrary per-key state the
built-in windowed aggregations can't express (running profiles, decaying
counters, model state). The operator here keeps per-user running totals —
deliberately simple so its final state is provably equal to the batch
``groupBy`` aggregate, which is how it is tested and oracle-checked.

Determinism note: the state accumulates ``value`` in integer micro-units
after a HALF_UP quantize to 6 decimal places — the same rounding Spark's
``cast(value AS DECIMAL(38,6))`` and DuckDB's decimal cast apply — so the
emitted totals are bit-identical to the engine's exact-decimal batch
recipe (functions/numeric.py) regardless of arrival order or batching.

At scale: state lives in the state store partitioned by user_id (RocksDB
provider on a real cluster); timeouts would evict idle users; output mode
``update`` emits one row per touched user per micro-batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, micro long"


def _update_user_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, micro = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        micro += int(pdf["micro"].fillna(0).sum())
    state.update((n, micro))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [micro / 1_000_000]}
    )


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, exact total) maintained in keyed state;
    emits the updated totals for every user touched by a micro-batch.

    The rounding to micro-units happens JVM-side BEFORE the Python seam
    (``cast(value AS DECIMAL(38,6)) × 1e6 → long``) — the Arrow batch
    carries ready-to-sum integers and the Python hook only adds them, so
    the stateful operator's per-row cost stays in codegen."""
    with_micro = events.withColumn(
        "micro",
        (F.col("value").cast("decimal(38,6)") * F.lit(1_000_000)).cast("long"),
    ).select("user_id", "micro")
    return with_micro.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithState twin (Spark 4's arbitrary-state API, SPARK-46815):
# the same per-user running totals as stateful_user_totals, but on the
# new StatefulProcessor contract — named ValueState cells (schema'd,
# TTL-capable), explicit lifecycle (init/handleInputRows/close), and
# timeMode/timer hooks the old GroupState API lacks. Output equality
# with the q41 operator AND the batch aggregate is oracle-checked
# (q185), proving the engine carries its custom-state semantics forward
# onto the API Spark is migrating stateful pipelines to.
# ---------------------------------------------------------------------------

from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)


class UserTotalsProcessor(StatefulProcessor):
    """Per-user (count, exact micro-unit total) in a named ValueState."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        n, micro = (
            self._totals.get() if self._totals.exists() else (0, 0)
        )
        for pdf in rows:
            n += len(pdf)
            micro += int(pdf["micro"].fillna(0).sum())
        self._totals.update((n, micro))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [micro / 1_000_000],
            }
        )

    def close(self) -> None:
        pass


def stateful_user_totals_tws(events: DataFrame) -> DataFrame:
    """``transformWithStateInPandas`` flavor of :func:`stateful_user_totals`
    — identical JVM-side micro-unit quantization, identical emissions."""
    with_micro = events.withColumn(
        "micro",
        (F.col("value").cast("decimal(38,6)") * F.lit(1_000_000)).cast("long"),
    ).select("user_id", "micro")
    return with_micro.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
