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
        micro += int(pdf["micro"].sum())  # skipna sum == fillna(0).sum(), no per-key copy
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
            micro += int(pdf["micro"].sum())  # skipna sum == fillna(0).sum(), no per-key copy
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


# ---------------------------------------------------------------------------
# Gap-based SESSIONIZATION on transformWithStateInPandas — the canonical
# arbitrary-state operator the new API exists for: per-key ListState of
# open session fragments, EVENT-TIME TIMERS to close sessions once the
# watermark proves the gap, and exact micro-unit sums. Unlike the
# built-in session_window (streaming/pipeline.py), this formulation is
# user-extensible (attach any per-session state or custom close logic).
#
# Correctness of the fragment merge: within a fragment every adjacent
# event gap < GAP by construction; merging two fragments when
# next.first - cur.last < GAP cannot create an over-gap adjacency — if
# two merged-order-adjacent events x (from A) and y (from B) had
# y - x >= GAP, x must be A's last and y B's first (any other A/B event
# would lie between them), contradicting the merge condition — so
# interval-level state is sufficient and event times need not be kept.
# ---------------------------------------------------------------------------

SESSION_GAP_US = 1800 * 1_000_000
SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start_us long, session_end_us long, "
    "n_events long, total_value double"
)
_FRAG_SCHEMA = "first_us long, last_us long, n long, micro long"


def _merge_fragments(frags: list[tuple], gap_us: int) -> list[tuple]:
    """Merge (first_us, last_us, n, micro) fragments whose sorted
    inter-fragment distance is < gap_us; pure function, unit-tested."""
    frags = sorted(frags)
    out: list[list] = []
    for f in frags:
        if out and f[0] - out[-1][1] < gap_us:
            cur = out[-1]
            cur[1] = max(cur[1], f[1])
            cur[2] += f[2]
            cur[3] += f[3]
        else:
            out.append(list(f))
    return [tuple(f) for f in out]


def _fragments_of(pairs: list[tuple], gap_us: int) -> list[tuple]:
    """Session fragments from sorted (us, micro) event pairs."""
    frags = []
    for us, micro in pairs:
        if frags and us - frags[-1][1] < gap_us:
            cur = frags[-1]
            cur[1] = us
            cur[2] += 1
            cur[3] += micro
        else:
            frags.append([us, us, 1, micro])
    return [tuple(f) for f in frags]


class SessionizeProcessor(StatefulProcessor):
    """Per-user open-session fragments + event-time close timers."""

    def __init__(self, gap_us: int = SESSION_GAP_US) -> None:
        self._gap_us = gap_us

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._sessions = handle.getListState("sessions", _FRAG_SCHEMA)
        # The currently-armed timer's expiry (ms). TWS keeps a SET of
        # (key, expiry) timers, so re-arming without deleting would
        # accumulate one stale timer per batch that touches the key;
        # tracking the armed expiry lets _arm() delete-before-re-arm and
        # keep the documented one-LIVE-timer-per-key cost model true.
        self._armed = handle.getValueState("armed_ms", "expiry_ms long")

    def _arm(self, expiry_ms: int) -> None:
        prev = self._armed.get()[0] if self._armed.exists() else None
        if prev == expiry_ms:
            return
        if prev is not None:
            self._handle.deleteTimer(prev)
        self._handle.registerTimer(expiry_ms)
        self._armed.update((expiry_ms,))

    def _stored(self) -> list[tuple]:
        return [tuple(t) for t in self._sessions.get()] if (
            self._sessions.exists()
        ) else []

    def handleInputRows(self, key, rows, timerValues):
        pairs = []
        for pdf in rows:
            pairs.extend(
                zip(
                    (int(v) for v in pdf["us"]),
                    (int(v) for v in pdf["micro"].fillna(0)),
                )
            )
        pairs.sort()
        merged = _merge_fragments(
            self._stored() + _fragments_of(pairs, self._gap_us), self._gap_us
        )
        self._sessions.put(merged)
        # ONE LIVE timer per key, at the EARLIEST fragment close (ceil
        # to ms so the us->ms grain can never fire early): expiry emits
        # every closeable fragment and re-arms for the next-earliest
        # remaining, so per-key timer traffic is O(close events), not
        # O(fragments) — a fragment-per-timer formulation cost 95k
        # Python expiry round-trips at sf0.1 (17 s); this one costs
        # #users. _arm() deletes the previously-armed timer before
        # re-arming (TWS keeps a SET of timers, so a bare registerTimer
        # would leak one stale timer per batch touching the key); a
        # stale firing would still be harmless — expiry re-checks the
        # watermark against CURRENT state — but the cost model holds
        # only with the delete.
        earliest = min(f[1] for f in merged) + self._gap_us
        self._arm(-(earliest // -1000))
        return iter(())

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        (user_id,) = key
        wm_us = timerValues.getCurrentWatermarkInMs() * 1000
        closed = []
        still_open = []
        for frag in self._stored():
            first_us, last_us, n, micro = frag
            if last_us + self._gap_us <= wm_us:
                closed.append(frag)
            else:
                still_open.append(frag)
        # The timer that just fired is gone from the timer set; drop the
        # book-keeping so _arm() doesn't try to delete it later.
        self._armed.clear()
        if still_open:
            # Re-arm for the next-earliest close among surviving
            # fragments (the one-LIVE-timer-per-key discipline).
            earliest = min(f[1] for f in still_open) + self._gap_us
            self._arm(-(earliest // -1000))
        if closed:
            if still_open:
                self._sessions.put(still_open)
            else:
                self._sessions.clear()
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start_us": [f[0] for f in closed],
                    "session_end_us": [f[1] + self._gap_us for f in closed],
                    "n_events": [f[2] for f in closed],
                    "total_value": [f[3] / 1_000_000 for f in closed],
                }
            )

    def close(self) -> None:
        pass


def stateful_sessions_tws(
    events: DataFrame, gap_us: int = SESSION_GAP_US, watermark: str = "30 minutes"
) -> DataFrame:
    """Gap-based sessions via :class:`SessionizeProcessor`: same output
    contract as the native ``session_window`` aggregation
    (streaming/pipeline.py:streaming_session_agg) — (user_id,
    session_start_us, session_end_us = last event + gap, n_events,
    exact-decimal total_value). Quantization to micro-units happens
    JVM-side before the Arrow seam, exactly as q41."""
    prepared = (
        events.withWatermark("ts", watermark)
        .withColumn("us", F.unix_micros("ts"))
        .withColumn(
            "micro",
            (F.col("value").cast("decimal(38,6)") * F.lit(1_000_000)).cast(
                "long"
            ),
        )
        .select("user_id", "ts", "us", "micro")
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=SessionizeProcessor(gap_us),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="EventTime",
    )


# ---------------------------------------------------------------------------
# Initial-state bootstrap (transformWithStateInPandas initialState=...):
# warm-start the per-user totals from a BATCH aggregate — the operational
# shape of migrating a running pipeline onto the new API, or resuming
# from a compacted history table instead of replaying the full log.
# handleInitialState seeds each key's ValueState before the first input
# row; streamed rows then accumulate on top, so the final emission per
# user equals the batch aggregate over history + stream.
# ---------------------------------------------------------------------------


class WarmStartTotalsProcessor(UserTotalsProcessor):
    """UserTotalsProcessor whose state is seeded from an initial-state
    relation of (user_id, n, micro) rows."""

    def handleInitialState(self, key, initialState, timerValues) -> None:
        self._totals.update(
            (
                int(initialState["n"].iloc[0]),
                int(initialState["micro"].iloc[0]),
            )
        )


def stateful_user_totals_warmstart(
    events: DataFrame, history: DataFrame
) -> DataFrame:
    """Per-user running totals over ``events`` (a stream), warm-started
    from ``history`` — a BATCH frame of prior (user_id, n, micro)
    aggregates fed through the initialState channel. Same JVM-side
    micro-unit quantization as :func:`stateful_user_totals`."""
    with_micro = events.withColumn(
        "micro",
        (F.col("value").cast("decimal(38,6)") * F.lit(1_000_000)).cast("long"),
    ).select("user_id", "micro")
    return with_micro.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=WarmStartTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
        initialState=history.groupBy("user_id"),
    )


# ---------------------------------------------------------------------------
# MapState: per-user map of event_type -> count — the third state
# primitive (Value/List/Map) on a keyed sub-dictionary the flat
# ValueState can't index. Each batch updates only the touched map
# entries and emits the updated (user, type, n) rows; counts are
# monotone, so latest-wins post-processing recovers the final table.
# ---------------------------------------------------------------------------

TYPE_COUNT_SCHEMA = "user_id long, event_type string, n_events long"


class TypeCountsProcessor(StatefulProcessor):
    """Per-user MapState: event_type -> running count."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._counts = handle.getMapState(
            "counts", "event_type string", "n long"
        )

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        delta: dict[str, int] = {}
        for pdf in rows:
            for et in pdf["event_type"]:
                delta[et] = delta.get(et, 0) + 1
        out_t, out_n = [], []
        for et, d in delta.items():
            prior = (
                self._counts.getValue((et,))[0]
                if self._counts.containsKey((et,))
                else 0
            )
            n = prior + d
            self._counts.updateValue((et,), (n,))
            out_t.append(et)
            out_n.append(n)
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(out_t),
                "event_type": out_t,
                "n_events": out_n,
            }
        )

    def close(self) -> None:
        pass


def stateful_type_counts(events: DataFrame) -> DataFrame:
    return events.select("user_id", "event_type").groupBy(
        "user_id"
    ).transformWithStateInPandas(
        statefulProcessor=TypeCountsProcessor(),
        outputStructType=TYPE_COUNT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


RATE_LIMIT_SCHEMA = (
    "user_id long, n_events long, n_throttled long, peak_rate long"
)
# q265's window/quota, imported from the batch twin rather than
# re-declared: q301's oracle IS q265's SQL, so a single source of truth
# keeps the streaming processor and its oracle from silently diverging
# (round-6 ADVICE finding).
from ..plans.insights import _RATE_QUOTA as _RL_QUOTA  # noqa: E402
from ..plans.insights import _RATE_WINDOW_US as _RL_WINDOW_US  # noqa: E402


class RateLimiterProcessor(StatefulProcessor):
    """Per-user sliding-window rate limiter: ListState of event-time
    stamps (µs) inside the trailing window + ValueState running
    (n_events, n_throttled, peak). The streaming twin of the batch
    q265 audit — for each event, the rolling count is |stamps in
    (t − W, t]| over ALL stamps known when its batch lands, which
    equals the batch RANGE-frame count under the engine's event-time-
    ordered feed contract (the q196 assumption) PLUS one corollary the
    contract does not state: duplicate-timestamp events for one user
    must not straddle a microbatch boundary. The batch RANGE frame
    counts ALL timestamp ties for each event; this rolling count only
    sees stamps landed by the event's batch, and an ordered feed does
    not order ties. The engine's event fixtures carry unique per-user
    microsecond stamps, so the equality holds; a future fixture with
    per-user timestamp ties split across batches would fail the q301
    oracle HERE, not in the batch plan. Stamps older than
    (newest − W) are pruned each batch, so state per key is bounded by
    the window's event capacity, not history length.
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._stamps = handle.getListState("stamps", "us long")
        self._totals = handle.getValueState(
            "totals", "n long, throttled long, peak long"
        )

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        import bisect

        new = []
        for pdf in rows:
            new.extend(int(v) for v in pdf["us"])
        prior = (
            [int(t[0]) for t in self._stamps.get()]
            if self._stamps.exists()
            else []
        )
        new.sort()
        stamps = sorted(prior + new)
        n, throttled, peak = (
            tuple(int(v) for v in self._totals.get())
            if self._totals.exists()
            else (0, 0, 0)
        )
        for us in new:
            lo = bisect.bisect_left(stamps, us - (_RL_WINDOW_US - 1))
            hi = bisect.bisect_right(stamps, us)
            rolling = hi - lo
            n += 1
            peak = max(peak, rolling)
            if rolling > _RL_QUOTA:
                throttled += 1
        self._totals.update((n, throttled, peak))
        keep_from = stamps[-1] - (_RL_WINDOW_US - 1)
        self._stamps.put([(s,) for s in stamps if s >= keep_from])
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "n_throttled": [throttled],
                "peak_rate": [peak],
            }
        )

    def close(self) -> None:
        pass


def stateful_rate_limiter(events: DataFrame) -> DataFrame:
    prepared = events.select(
        "user_id", F.unix_micros(F.col("ts")).alias("us")
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RateLimiterProcessor(),
        outputStructType=RATE_LIMIT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
