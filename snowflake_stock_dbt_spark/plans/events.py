"""[EXT] Event-stream batch queries over the ``events`` table.

The reference is batch-only (SURVEY.md §2.10); these implement the standard
event-time operators a streaming ingest needs, in their batch form —
sessionization (gap-based) and tumbling-window aggregation. The streaming
variants live in streaming/pipeline.py; the batch forms here are the
oracle-checkable semantics contract.

Timestamps are compared as epoch microseconds (long) to sidestep
timezone/precision representation differences between engines; the events
table is TIMESTAMP(NANOS) on disk and both engines truncate to µs the same
way (sources/tables.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import SQL_DEC_SUM, dec_sum
from ..functions.partitioning import ensure_min_parallelism
from ..sources.tables import load_table

SESSION_GAP_S = 1800
WINDOW_S = 300


def q27_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a new session starts after >30 min idle.
    lag + cumulative-sum windows, then one aggregate per (user, session)."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # The cumulative window runs on the projected frame where ts survives
    # only as epoch-µs; same total order (µs truncation is injective here
    # because ties fall back to event_id in both engines).
    wcum = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    with_gap = ev.select(
        "user_id", "event_id", "value", us.alias("us"),
        F.lag(us, 1).over(w).alias("prev_us"),
    ).withColumn(
        "new_session",
        F.when(
            F.col("prev_us").isNull()
            | ((F.col("us") - F.col("prev_us")) > SESSION_GAP_S * 1_000_000),
            1,
        ).otherwise(0),
    )
    sessions = with_gap.withColumn(
        "session_idx", F.sum("new_session").over(wcum).cast("long")
    )
    return (
        sessions.groupBy("user_id", "session_idx")
        .agg(
            F.min("us").alias("session_start_us"),
            F.max("us").alias("session_end_us"),
            F.count("*").alias("n_events"),
            dec_sum("value").alias("total_value"),
        )
    )


Q27_SQL = f"""
WITH base AS (
    SELECT user_id, event_id, value,
           epoch_us(CAST(ts AS TIMESTAMP)) AS us,
           LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS prev_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
),
flagged AS (
    SELECT *, CASE WHEN prev_us IS NULL
                     OR us - prev_us > {SESSION_GAP_S} * 1000000
                   THEN 1 ELSE 0 END AS new_session
    FROM base
),
numbered AS (
    SELECT *, CAST(SUM(new_session) OVER (
        PARTITION BY user_id ORDER BY us, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS BIGINT) AS session_idx
    FROM flagged
)
SELECT user_id, session_idx,
       MIN(us) AS session_start_us,
       MAX(us) AS session_end_us,
       COUNT(*) AS n_events,
       {SQL_DEC_SUM.format(x='value')} AS total_value
FROM numbered
GROUP BY user_id, session_idx
"""


def q28_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling-window aggregation via the streaming-compatible
    ``F.window`` operator (epoch-aligned), emitted as epoch-µs window start."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", f"{WINDOW_S} seconds").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("active_users"),
            dec_sum("value").alias("total_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "active_users",
            "total_value",
        )
    )


Q28_SQL = f"""
SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // {WINDOW_S * 1_000_000})
         * {WINDOW_S * 1_000_000} AS window_start_us,
       event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS active_users,
       {SQL_DEC_SUM.format(x='value')} AS total_value
FROM events
GROUP BY 1, 2
"""


#: Hopping-window geometry: 5-minute windows advancing every minute —
#: each event lands in exactly width/hop = 5 overlapping windows (the
#: hop divides the width, so membership is total and the per-event
#: window set is a closed-form k = 0..4 replication, which is what makes
#: the oracle exact).
HOP_S = 60
HOP_FACTOR = WINDOW_S // HOP_S


def q133_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute windows sliding every 60s via the streaming-compatible
    ``F.window(ts, width, slide)`` — the overlapping-window flavor q28's
    tumbling shape doesn't cover (trend smoothing / rate-limiting reads).
    Scale: Spark expands each event to width/hop = 5 window rows before
    the keyed agg — a constant-factor map-side explode, shuffling only
    the aggregated (window, type) cells like q28."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", f"{WINDOW_S} seconds", f"{HOP_S} seconds").alias(
                "w"
            ),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("active_users"),
            dec_sum("value").alias("total_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            "active_users",
            "total_value",
        )
    )


Q133_SQL = f"""
WITH hopped AS (
    SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // {HOP_S * 1_000_000})
             * {HOP_S * 1_000_000}
             - k.k * {HOP_S * 1_000_000} AS window_start_us,
           event_type, user_id, value
    FROM events CROSS JOIN (
        SELECT unnest(generate_series(0, {HOP_FACTOR - 1})) AS k
    ) k
)
SELECT window_start_us, event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS active_users,
       {SQL_DEC_SUM.format(x='value')} AS total_value
FROM hopped
GROUP BY 1, 2
"""


def q42_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization via Spark's native ``session_window``
    (streaming-compatible; merges events < gap apart). Semantics contract:
    window.start = first event ts, window.end = last event ts + gap —
    the oracle rebuilds both from the lag/cumsum formulation of q27."""
    ev = ensure_min_parallelism(load_table(spark, sf_dir, "events"), F.col("user_id"))
    return (
        ev.groupBy(
            F.session_window("ts", f"{SESSION_GAP_S} seconds").alias("w"), "user_id"
        )
        .agg(
            F.count("*").alias("n_events"),
            dec_sum("value").alias("total_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
            "total_value",
        )
    )


Q42_SQL = f"""
WITH base AS (
    SELECT user_id, event_id, value,
           epoch_us(CAST(ts AS TIMESTAMP)) AS us,
           LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS prev_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
),
flagged AS (
    SELECT *, CASE WHEN prev_us IS NULL
                     OR us - prev_us >= {SESSION_GAP_S} * 1000000
                   THEN 1 ELSE 0 END AS new_session
    FROM base
),
numbered AS (
    SELECT *, SUM(new_session) OVER (
        PARTITION BY user_id ORDER BY us, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS session_idx
    FROM flagged
)
SELECT user_id,
       MIN(us) AS session_start_us,
       MAX(us) + {SESSION_GAP_S * 1_000_000} AS session_end_us,
       COUNT(*) AS n_events,
       {SQL_DEC_SUM.format(x='value')} AS total_value
FROM numbered
GROUP BY user_id, session_idx
"""


# ---------------------------------------------------------------------------
# Q61 — Inter-event gap profile per user: LEAD for the next event time,
# running FIRST_VALUE / frame-to-end LAST_VALUE for the journey endpoints
# (completing the window-function family next to q05's LAG and q50's
# ranking trio). Gaps stay integer microseconds — sums and counts are
# exact, no cross-engine float drift. The oracle casts SUM to BIGINT:
# DuckDB's SUM(BIGINT) yields HUGEINT, which pandas renders as float64
# ("5.0" vs Spark's "5" under a stringifying value-hash) — this was the
# round-1 driver hash mismatch (CORRECTNESS_r01.json q61).
# ---------------------------------------------------------------------------


def q61_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    rows = ev.select(
        "user_id",
        F.first("event_id").over(w).alias("first_event_id"),
        F.last("event_id").over(wfull).alias("last_event_id"),
        (
            F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))
        ).alias("gap_us"),
    )
    return (
        rows.groupBy("user_id")
        .agg(
            F.min("first_event_id").alias("first_event_id"),
            F.min("last_event_id").alias("last_event_id"),
            F.count("gap_us").alias("n_gaps"),
            F.sum("gap_us").alias("sum_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
        )
        .orderBy("user_id")
    )


Q61_SQL = """
WITH r AS (
    SELECT user_id,
           FIRST_VALUE(event_id) OVER w AS first_event_id,
           LAST_VALUE(event_id) OVER (PARTITION BY user_id
               ORDER BY CAST(ts AS TIMESTAMP), event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS last_event_id,
           epoch_us(LEAD(CAST(ts AS TIMESTAMP)) OVER w)
               - epoch_us(CAST(ts AS TIMESTAMP)) AS gap_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
)
SELECT user_id,
       MIN(first_event_id) AS first_event_id,
       MIN(last_event_id) AS last_event_id,
       COUNT(gap_us) AS n_gaps,
       CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us,
       MAX(gap_us) AS max_gap_us
FROM r
GROUP BY user_id
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Q66 — Retention cohort matrix (the product-analytics staple): users
# cohorted by first-activity day, activity counted per week offset. Two
# keyed aggregations and one join — every step shuffles on user/cohort
# keys, no window over the full corpus.
# ---------------------------------------------------------------------------


def q66_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    first = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        days.join(first, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.floor(F.datediff("day", "cohort_day") / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort_day", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_day", "week_offset")
    )


Q66_SQL = """
WITH days AS (
    SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
    FROM events
),
first AS (
    SELECT user_id, MIN(day) AS cohort_day FROM days GROUP BY user_id
)
SELECT cohort_day,
       CAST(date_diff('day', cohort_day, day) // 7 AS INT) AS week_offset,
       COUNT(DISTINCT days.user_id) AS n_users
FROM days JOIN first USING (user_id)
GROUP BY 1, 2
ORDER BY cohort_day, week_offset
"""


# ---------------------------------------------------------------------------
# Q67 — Ordered funnel (signup → click after it → purchase after that):
# per-step keyed min-aggregations chained by join, then three 1-row counts
# composed by broadcast cross join (the sanctioned scalar-stats shape).
# ---------------------------------------------------------------------------


def q67_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    s = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(s, "user_id")
        .where(F.col("ts") > F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    return (
        s.agg(F.count("*").alias("n_signup"))
        .crossJoin(c.agg(F.count("*").alias("n_signup_click")))
        .crossJoin(p.agg(F.count("*").alias("n_full_funnel")))
    )


Q67_SQL = """
WITH e AS (
    SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
),
s AS (
    SELECT user_id, MIN(ts) AS s_ts FROM e
    WHERE event_type = 'signup' GROUP BY user_id
),
c AS (
    SELECT e.user_id, MIN(e.ts) AS c_ts
    FROM e JOIN s USING (user_id)
    WHERE e.event_type = 'click' AND e.ts > s.s_ts
    GROUP BY e.user_id
),
p AS (
    SELECT e.user_id, MIN(e.ts) AS p_ts
    FROM e JOIN c USING (user_id)
    WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
    GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM s) AS n_signup,
       (SELECT COUNT(*) FROM c) AS n_signup_click,
       (SELECT COUNT(*) FROM p) AS n_full_funnel
"""


# ---------------------------------------------------------------------------
# Q75 — SCD2 state history from an event log: collapse each user's
# consecutive runs of the same event_type into validity ranges
# (valid_from/valid_to in epoch-µs, NULL valid_to = current) — the dbt
# snapshot shape derived from a log instead of periodic batches (the batch
# maintenance operator is operators/scd2.py). Change detection is one LAG,
# run numbering one cumulative SUM, then a keyed agg + one LEAD — three
# user-partitioned windows, no global window.
# ---------------------------------------------------------------------------


# q75's core moved to operators/scd2.py in round 8 (the incremental
# extend operator builds on it); re-imported here so every in-module
# caller keeps its name.
from ..operators.scd2 import scd2_history_from  # noqa: E402


def q75_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        scd2_history_from(ev)
        .drop("run_id")
        .orderBy("user_id", "valid_from_us")
    )


Q75_SQL = """
WITH base AS (
    SELECT user_id, event_type, event_id,
           epoch_us(CAST(ts AS TIMESTAMP)) AS us,
           CASE WHEN LAG(event_type) OVER w IS NULL
                  OR LAG(event_type) OVER w <> event_type
                THEN 1 ELSE 0 END AS chg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
),
runs AS (
    SELECT *, SUM(chg) OVER (
        PARTITION BY user_id ORDER BY us, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS run_id
    FROM base
),
seg AS (
    SELECT user_id, run_id,
           MIN(event_type) AS event_type,
           MIN(us) AS valid_from_us,
           COUNT(*) AS n_events
    FROM runs
    GROUP BY user_id, run_id
)
SELECT user_id, event_type, valid_from_us,
       LEAD(valid_from_us) OVER (PARTITION BY user_id ORDER BY run_id)
           AS valid_to_us,
       n_events
FROM seg
ORDER BY user_id, valid_from_us
"""


# ---------------------------------------------------------------------------
# Q331 — INCREMENTAL SCD2 maintenance from a log: the event stream splits
# into a base load plus two later "ingest day" batches (cutoffs at 60% /
# 80% of the corpus time range via a 1-row min/max anchor), the base
# builds the q75 run history once, and each batch EXTENDS it through
# operators/scd2.py:scd2_extend_from_log — only affected users' CURRENT
# runs are recomputed (one weighted seed row per user + the batch's own
# events), closed runs and untouched users carry through. The operator's
# contract is EXACT rebuild parity, so the oracle IS Q75_SQL: any drift
# in the fold (a lost run, a miscounted extension, a seed ordered after
# a batch event) breaks the hash.
# ---------------------------------------------------------------------------


def q331_scd2_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.scd2 import scd2_extend_from_log

    ev = load_table(spark, sf_dir, "events")
    anchor = ev.groupBy().agg(
        F.min(F.unix_micros("ts")).alias("__lo"),
        F.max(F.unix_micros("ts")).alias("__hi"),
    )
    tagged = (
        ev.crossJoin(F.broadcast(anchor))
        .withColumn("__us", F.unix_micros("ts"))
        .withColumn("__span", F.col("__hi") - F.col("__lo"))
        .withColumn("__c1", F.col("__lo") + F.expr("__span * 3 DIV 5"))
        .withColumn("__c2", F.col("__lo") + F.expr("__span * 4 DIV 5"))
    )
    base = tagged.where(F.col("__us") < F.col("__c1"))
    batch1 = tagged.where(
        (F.col("__us") >= F.col("__c1")) & (F.col("__us") < F.col("__c2"))
    )
    batch2 = tagged.where(F.col("__us") >= F.col("__c2"))
    cols = ["user_id", "event_type", "event_id", "ts"]
    hist = scd2_history_from(base.select(*cols))
    hist = scd2_extend_from_log(hist, batch1.select(*cols))
    hist = scd2_extend_from_log(hist, batch2.select(*cols))
    return hist.drop("run_id").orderBy("user_id", "valid_from_us")


#: Two increments folded == one-shot rebuild, so the oracle is q75's.
Q331_SQL = Q75_SQL


# ---------------------------------------------------------------------------
# Q88 — Gap-fill + interpolation: per-user daily purchase totals, re-gridded
# onto each user's own active day range, with forward-fill and linear
# interpolation for missing days. The canonical time-series repair operator
# (reference app charts assume a dense date axis; this builds one).
#
# Scale shape: the spine is generated per key from that key's own min/max
# day (no global-range cross join — a user active for a week costs 7 rows),
# and the fill is two frame-bounded window passes over (user, day) — both
# run inside one shuffle on user_id. At 100 TB the state per key is the
# key's own day count, never the global calendar.
# ---------------------------------------------------------------------------


def q88_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(dec_sum("value").alias("v"))
    )
    bounds = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = bounds.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    grid = spine.join(daily, ["user_id", "day"], "left")
    w_back = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("v").isNotNull(), F.col("day"))
    filled = grid.select(
        "user_id",
        "day",
        F.col("v").alias("observed"),
        F.last("v", ignorenulls=True).over(w_back).alias("pv"),
        F.first("v", ignorenulls=True).over(w_fwd).alias("nv"),
        F.last(obs_day, ignorenulls=True).over(w_back).alias("pd"),
        F.first(obs_day, ignorenulls=True).over(w_fwd).alias("nd"),
    )
    frac = F.datediff("day", "pd").cast("double") / F.datediff(
        "nd", "pd"
    ).cast("double")
    interp = (
        F.when(F.col("observed").isNotNull(), F.col("observed"))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.col("pv") + (F.col("nv") - F.col("pv")) * frac,
        )
        .otherwise(F.coalesce("pv", "nv"))
    )
    return filled.select(
        "user_id",
        "day",
        "observed",
        F.col("pv").alias("ffill"),
        interp.alias("interpolated"),
    ).orderBy("user_id", "day")


Q88_SQL = """
WITH daily AS (
    SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS v
    FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
),
bounds AS (
    SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
),
spine AS (
    SELECT user_id,
           UNNEST(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
    FROM bounds
),
grid AS (
    SELECT s.user_id, s.day, daily.v
    FROM spine s LEFT JOIN daily ON s.user_id = daily.user_id
                                AND s.day = daily.day
),
w AS (
    SELECT user_id, day, v,
        last_value(v IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        first_value(v IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY day
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
        first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY day
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
    FROM grid
)
SELECT user_id, day, v AS observed, pv AS ffill,
       CASE WHEN v IS NOT NULL THEN v
            WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                pv + (nv - pv) * (CAST(date_diff('day', pd, day) AS DOUBLE)
                                  / CAST(date_diff('day', pd, nd) AS DOUBLE))
            ELSE COALESCE(pv, nv) END AS interpolated
FROM w
ORDER BY user_id, day
"""


# ---------------------------------------------------------------------------
# Q99 — Point-in-time (temporal) join: each purchase joined to the user's
# activity state (SCD2 run of non-purchase event types) valid at purchase
# time. The dimension-history join every warehouse needs for "what did the
# record look like THEN" — done as a backward as-of join (union + one
# window shuffle, operators/asof.py), never an interval cross join. The
# oracle is the equivalent interval join over the same history CTE.
# ---------------------------------------------------------------------------


def q99_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    history = scd2_history_from(
        ev.where(F.col("event_type") != "purchase")
    ).select(
        "user_id",
        "run_id",
        F.col("event_type").alias("state"),
        "valid_from_us",
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.unix_micros("ts").alias("purchase_us"),
    )
    out = asof_join(
        purchases,
        history,
        on=["user_id"],
        left_time="purchase_us",
        right_time="valid_from_us",
        right_payload=["state"],
        # run_id, NOT valid_from_us: adjacent runs can share a microsecond
        # timestamp (empty [t,t) interval), and the oracle's interval join
        # deterministically picks the later (non-empty) run — which is the
        # max run_id. valid_from_us ties would make the carried state
        # nondeterministic.
        tiebreak="run_id",
    )
    return out.select(
        "purchase_id",
        "user_id",
        "purchase_us",
        "state",
        F.col("matched_valid_from_us").alias("state_since_us"),
    ).orderBy("purchase_id")


Q99_SQL = """
WITH base AS (
    SELECT user_id, event_type, event_id,
           epoch_us(CAST(ts AS TIMESTAMP)) AS us,
           CASE WHEN LAG(event_type) OVER w IS NULL
                  OR LAG(event_type) OVER w <> event_type
                THEN 1 ELSE 0 END AS chg
    FROM events
    WHERE event_type <> 'purchase'
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
),
runs AS (
    SELECT *, SUM(chg) OVER (
        PARTITION BY user_id ORDER BY us, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS run_id
    FROM base
),
seg AS (
    SELECT user_id, run_id,
           MIN(event_type) AS state,
           MIN(us) AS valid_from_us,
           LEAD(MIN(us)) OVER (PARTITION BY user_id ORDER BY run_id)
               AS valid_to_us
    FROM runs
    GROUP BY user_id, run_id
),
purchases AS (
    SELECT user_id, event_id AS purchase_id,
           epoch_us(CAST(ts AS TIMESTAMP)) AS purchase_us
    FROM events WHERE event_type = 'purchase'
)
SELECT purchase_id, p.user_id, purchase_us, seg.state,
       seg.valid_from_us AS state_since_us
FROM purchases p
LEFT JOIN seg
  ON p.user_id = seg.user_id
 AND seg.valid_from_us <= p.purchase_us
 AND (seg.valid_to_us IS NULL OR p.purchase_us < seg.valid_to_us)
ORDER BY purchase_id
"""



# ---------------------------------------------------------------------------
# Q127 — behavioral transition matrix: per (prev_event_type, event_type)
# bigram counts over each user's time-ordered stream, with per-source
# totals for transition probabilities as an exact rational (count/total).
# One window shuffle on user_id + one keyed agg — the Markov-flow
# primitive behind funnel discovery and next-event models.
# ---------------------------------------------------------------------------


def q127_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.lag("event_type").over(w).alias("prev_event"),
        F.col("event_type").alias("next_event"),
    ).where(F.col("prev_event").isNotNull())
    counts = pairs.groupBy("prev_event", "next_event").agg(
        F.count("*").alias("n_transitions")
    )
    wsrc = Window.partitionBy("prev_event")
    return (
        counts.withColumn(
            "src_total", F.sum("n_transitions").over(wsrc)
        )
        .select(
            "prev_event",
            "next_event",
            "n_transitions",
            "src_total",
            (
                F.col("n_transitions").cast("double")
                / F.col("src_total").cast("double")
            ).alias("p_transition"),
        )
        .orderBy("prev_event", "next_event")
    )


Q127_SQL = """
WITH pairs AS (
    SELECT LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS prev_event,
           event_type AS next_event
    FROM events
),
counts AS (
    SELECT prev_event, next_event, COUNT(*) AS n_transitions
    FROM pairs WHERE prev_event IS NOT NULL
    GROUP BY 1, 2
)
SELECT prev_event, next_event, n_transitions,
       CAST(SUM(n_transitions) OVER (PARTITION BY prev_event) AS BIGINT)
           AS src_total,
       CAST(n_transitions AS DOUBLE)
           / CAST(SUM(n_transitions) OVER (PARTITION BY prev_event) AS DOUBLE)
           AS p_transition
FROM counts
ORDER BY prev_event, next_event
"""


# ---------------------------------------------------------------------------
# Q157 — Z-ORDER clustering keys (the Delta/Iceberg OPTIMIZE ZORDER
# recipe): scale each clustering column onto a 16-bit grid from its
# global min/max (one tiny agg, 1-row broadcast — the q03 stats
# pattern), interleave the bits into a 32-bit Morton code, and derive
# the range shard (top 5 bits -> 32 shards). Writing files ordered by
# this key co-locates rows that are close in BOTH dimensions, so
# min/max file pruning works for either predicate — the multi-column
# layout step sinks/layout.py's single-column range clustering cannot
# express. The bit interleave is pure integer arithmetic (identical
# generated expression text on both engines); the grid scaling is two
# IEEE ops on identical doubles. At scale: one stats pass + one
# per-row projection + repartitionByRange(shard) at the sink.
# ---------------------------------------------------------------------------

_Z_GRID = 65535
_Z_SHARD_SHIFT = 27  # 32-bit Morton code -> 32 range shards


def _zorder_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared q157/q161 projection: events with grid bins, Morton code,
    and range shard (plus the clustering columns for footer stats)."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.agg(
        F.min("user_id").alias("minu"),
        F.max("user_id").alias("maxu"),
        F.min("value").alias("minv"),
        F.max("value").alias("maxv"),
    )
    xb = F.floor(
        ((F.col("user_id") - F.col("minu")) * F.lit(float(_Z_GRID)))
        / (F.col("maxu") - F.col("minu"))
    ).cast("long")
    yb = F.floor(
        ((F.col("value") - F.col("minv")) * F.lit(float(_Z_GRID)))
        / (F.col("maxv") - F.col("minv"))
    ).cast("long")
    binned = (
        ev.where(F.col("value").isNotNull())
        .crossJoin(F.broadcast(stats))
        .select(
            "event_id",
            "user_id",
            "value",
            F.least(xb, F.lit(65535)).alias("xb"),
            F.least(yb, F.lit(65535)).alias("yb"),
        )
    )
    z = F.expr("(shiftright(xb, 0) % 2) * 1 + (shiftright(yb, 0) % 2) * 2 + (shiftright(xb, 1) % 2) * 4 + (shiftright(yb, 1) % 2) * 8 + (shiftright(xb, 2) % 2) * 16 + (shiftright(yb, 2) % 2) * 32 + (shiftright(xb, 3) % 2) * 64 + (shiftright(yb, 3) % 2) * 128 + (shiftright(xb, 4) % 2) * 256 + (shiftright(yb, 4) % 2) * 512 + (shiftright(xb, 5) % 2) * 1024 + (shiftright(yb, 5) % 2) * 2048 + (shiftright(xb, 6) % 2) * 4096 + (shiftright(yb, 6) % 2) * 8192 + (shiftright(xb, 7) % 2) * 16384 + (shiftright(yb, 7) % 2) * 32768 + (shiftright(xb, 8) % 2) * 65536 + (shiftright(yb, 8) % 2) * 131072 + (shiftright(xb, 9) % 2) * 262144 + (shiftright(yb, 9) % 2) * 524288 + (shiftright(xb, 10) % 2) * 1048576 + (shiftright(yb, 10) % 2) * 2097152 + (shiftright(xb, 11) % 2) * 4194304 + (shiftright(yb, 11) % 2) * 8388608 + (shiftright(xb, 12) % 2) * 16777216 + (shiftright(yb, 12) % 2) * 33554432 + (shiftright(xb, 13) % 2) * 67108864 + (shiftright(yb, 13) % 2) * 134217728 + (shiftright(xb, 14) % 2) * 268435456 + (shiftright(yb, 14) % 2) * 536870912 + (shiftright(xb, 15) % 2) * 1073741824 + (shiftright(yb, 15) % 2) * 2147483648")
    return binned.select(
        "event_id",
        "user_id",
        "value",
        "xb",
        "yb",
        z.cast("long").alias("zval"),
    ).withColumn(
        "shard", F.expr(f"shiftright(zval, {_Z_SHARD_SHIFT})").cast("int")
    )


def q157_zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _zorder_frame(spark, sf_dir).select(
        "event_id", "xb", "yb", "zval", "shard"
    )


Q157_SQL = f"""
WITH stats AS (
    SELECT MIN(user_id) AS minu, MAX(user_id) AS maxu,
           MIN(value) AS minv, MAX(value) AS maxv
    FROM events
),
binned AS (
    SELECT event_id,
           LEAST(CAST(FLOOR((user_id - minu) * {float(_Z_GRID)}
                            / (maxu - minu)) AS BIGINT),
                 65535) AS xb,
           LEAST(CAST(FLOOR((value - minv) * {float(_Z_GRID)}
                            / (maxv - minv)) AS BIGINT),
                 65535) AS yb
    FROM events CROSS JOIN stats
    WHERE value IS NOT NULL
),
coded AS (
    SELECT event_id, xb, yb, CAST(((xb >> 0) % 2) * 1 + ((yb >> 0) % 2) * 2 + ((xb >> 1) % 2) * 4 + ((yb >> 1) % 2) * 8 + ((xb >> 2) % 2) * 16 + ((yb >> 2) % 2) * 32 + ((xb >> 3) % 2) * 64 + ((yb >> 3) % 2) * 128 + ((xb >> 4) % 2) * 256 + ((yb >> 4) % 2) * 512 + ((xb >> 5) % 2) * 1024 + ((yb >> 5) % 2) * 2048 + ((xb >> 6) % 2) * 4096 + ((yb >> 6) % 2) * 8192 + ((xb >> 7) % 2) * 16384 + ((yb >> 7) % 2) * 32768 + ((xb >> 8) % 2) * 65536 + ((yb >> 8) % 2) * 131072 + ((xb >> 9) % 2) * 262144 + ((yb >> 9) % 2) * 524288 + ((xb >> 10) % 2) * 1048576 + ((yb >> 10) % 2) * 2097152 + ((xb >> 11) % 2) * 4194304 + ((yb >> 11) % 2) * 8388608 + ((xb >> 12) % 2) * 16777216 + ((yb >> 12) % 2) * 33554432 + ((xb >> 13) % 2) * 67108864 + ((yb >> 13) % 2) * 134217728 + ((xb >> 14) % 2) * 268435456 + ((yb >> 14) % 2) * 536870912 + ((xb >> 15) % 2) * 1073741824 + ((yb >> 15) % 2) * 2147483648 AS BIGINT) AS zval FROM binned
)
SELECT event_id, xb, yb, zval,
       CAST(zval >> {_Z_SHARD_SHIFT} AS INT) AS shard
FROM coded
"""


# ---------------------------------------------------------------------------
# Q158 — last-touch ATTRIBUTION: every purchase is credited to the same
# user's most recent click within a 7-day window (NULL when none) — the
# marketing-analytics staple, expressed as the existing backward as-of
# join (operators/asof.py: union-and-window, ONE shuffle, never a
# per-row subquery) followed by the window cutoff. The oracle replays
# it as the textbook correlated form (left join + row_number) — two
# independent formulations, one answer.
# ---------------------------------------------------------------------------

_ATTRIB_WINDOW_US = 7 * 86400 * 1_000_000


def q158_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_event_id"),
        "user_id",
        F.col("ts").alias("cts"),
    )
    m = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_time="ts",
        right_time="cts",
        right_payload=["click_event_id"],
        tiebreak="click_event_id",
    )
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("matched_cts"))
    in_window = gap <= F.lit(_ATTRIB_WINDOW_US)
    return m.select(
        "purchase_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.when(in_window, F.col("click_event_id")).alias("click_event_id"),
        F.when(in_window, gap).cast("long").alias("gap_us"),
    )


Q158_SQL = f"""
WITH p AS (
    SELECT event_id AS purchase_id, user_id, CAST(ts AS TIMESTAMP) AS pts
    FROM events WHERE event_type = 'purchase'
),
c AS (
    SELECT event_id AS click_event_id, user_id, CAST(ts AS TIMESTAMP) AS cts
    FROM events WHERE event_type = 'click'
),
m AS (
    SELECT p.purchase_id, p.user_id, p.pts, c.click_event_id,
           epoch_us(p.pts) - epoch_us(c.cts) AS gap_us,
           ROW_NUMBER() OVER (PARTITION BY p.purchase_id
               ORDER BY c.cts DESC, c.click_event_id DESC) AS rn
    FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.cts <= p.pts
)
SELECT purchase_id, user_id, pts AS purchase_ts,
       CASE WHEN gap_us <= {_ATTRIB_WINDOW_US} THEN click_event_id END
           AS click_event_id,
       CAST(CASE WHEN gap_us <= {_ATTRIB_WINDOW_US} THEN gap_us END
            AS BIGINT) AS gap_us
FROM m WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Q161 — data-skipping MANIFEST over the Z-order shards (q157's payoff,
# measured): per-shard row counts and min/max of both clustering
# dimensions — the file-footer stats a lakehouse reader prunes with —
# plus each shard's would-be-scanned verdict for a fixed probe predicate
# on EITHER dimension. Morton sharding keeps both dimensions' per-shard
# ranges narrow, so point/range predicates on either column touch few
# shards; the manifest is one keyed agg over the q157 projection, and
# the pruning verdicts are per-row comparisons on the 32-row result.
# ---------------------------------------------------------------------------

_PRUNE_USER_LO, _PRUNE_USER_HI = 40, 49
_PRUNE_VALUE_LO, _PRUNE_VALUE_HI = 10.0, 20.0


def q161_skipping_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = (
        _zorder_frame(spark, sf_dir)
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("user_id").alias("min_user"),
            F.max("user_id").alias("max_user"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )
    return m.select(
        "shard",
        "n_rows",
        "min_user",
        "max_user",
        "min_value",
        "max_value",
        (
            (F.col("max_user") >= _PRUNE_USER_LO)
            & (F.col("min_user") <= _PRUNE_USER_HI)
        ).alias("scan_for_user_probe"),
        (
            (F.col("max_value") >= _PRUNE_VALUE_LO)
            & (F.col("min_value") <= _PRUNE_VALUE_HI)
        ).alias("scan_for_value_probe"),
    )


Q161_SQL = f"""
WITH keyed AS ({Q157_SQL.strip()}),
m AS (
    SELECT k.shard,
           COUNT(*) AS n_rows,
           MIN(e.user_id) AS min_user, MAX(e.user_id) AS max_user,
           MIN(e.value) AS min_value, MAX(e.value) AS max_value
    FROM events e JOIN keyed k USING (event_id)
    GROUP BY k.shard
)
SELECT shard, n_rows, min_user, max_user, min_value, max_value,
       (max_user >= {_PRUNE_USER_LO} AND min_user <= {_PRUNE_USER_HI})
           AS scan_for_user_probe,
       (max_value >= {_PRUNE_VALUE_LO} AND min_value <= {_PRUNE_VALUE_HI})
           AS scan_for_value_probe
FROM m
"""


# ---------------------------------------------------------------------------
# Q165 — session PATH mining: the top-20 three-step event-type paths
# walked inside sessions (q27's >30-min-gap sessionization rebuilt on
# the same contract), the product-analytics "what do users do next"
# query. Paths come from two LEAD windows partitioned by (user,
# session) — no self-joins; corpus-wide counts are one keyed agg; top-N
# stays a sort-limit heap.
# ---------------------------------------------------------------------------

PATH_TOP_N = 20


def q165_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    with_gap = ev.select(
        "user_id", "event_id", "event_type", us.alias("us"),
        F.lag(us, 1).over(w).alias("prev_us"),
    ).withColumn(
        "new_session",
        F.when(
            F.col("prev_us").isNull()
            | ((F.col("us") - F.col("prev_us")) > SESSION_GAP_S * 1_000_000),
            1,
        ).otherwise(0),
    )
    sessions = with_gap.withColumn(
        "session_idx", F.sum("new_session").over(wcum).cast("long")
    )
    ws = Window.partitionBy("user_id", "session_idx").orderBy(
        "us", "event_id"
    )
    steps = sessions.select(
        "event_type",
        F.lead("event_type", 1).over(ws).alias("t1"),
        F.lead("event_type", 2).over(ws).alias("t2"),
    ).where(F.col("t2").isNotNull())
    return (
        steps.select(
            F.concat_ws(">", "event_type", "t1", "t2").alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(PATH_TOP_N)
    )


Q165_SQL = f"""
WITH base AS (
    SELECT user_id, event_id, event_type,
           epoch_us(CAST(ts AS TIMESTAMP)) AS us,
           LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS prev_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
),
numbered AS (
    SELECT *, CAST(SUM(CASE WHEN prev_us IS NULL
                     OR us - prev_us > {SESSION_GAP_S} * 1000000
                   THEN 1 ELSE 0 END) OVER (
        PARTITION BY user_id ORDER BY us, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS BIGINT) AS session_idx
    FROM base
),
steps AS (
    SELECT event_type,
           LEAD(event_type, 1) OVER ws AS t1,
           LEAD(event_type, 2) OVER ws AS t2
    FROM numbered
    WINDOW ws AS (PARTITION BY user_id, session_idx ORDER BY us, event_id)
)
SELECT event_type || '>' || t1 || '>' || t2 AS path, COUNT(*) AS n
FROM steps WHERE t2 IS NOT NULL
GROUP BY 1
ORDER BY n DESC, path
LIMIT {PATH_TOP_N}
"""


# ---------------------------------------------------------------------------
# Q174 — SNAPSHOT state diff (the CDC reconciliation primitive): the
# per-user aggregate state as of cutoff T1 vs as of T2, every user
# classified new / changed / unchanged — what an incremental pipeline
# computes to decide which downstream rows to touch. One scan (each
# cutoff is a conditional aggregate over the same pass — no second
# read), exact int64/decimal state, classification from exact
# comparisons. The q91 incremental-agg machinery proves merge ==
# recompute; this is its user-facing report.
# ---------------------------------------------------------------------------

_SNAP_T1 = "2024-01-20 00:00:00"
_SNAP_T2 = "2024-01-30 00:00:00"


def q174_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    t1 = F.col("ts") < F.to_timestamp(F.lit(_SNAP_T1))
    t2 = F.col("ts") < F.to_timestamp(F.lit(_SNAP_T2))
    agg = ev.where(t2).groupBy("user_id").agg(
        F.sum(F.when(t1, 1).otherwise(0)).cast("long").alias("n1"),
        F.count("*").cast("long").alias("n2"),
        F.sum(F.when(t1, F.col("value").cast("decimal(38,6)")))
        .cast("double")
        .alias("v1"),
        F.sum(F.col("value").cast("decimal(38,6)"))
        .cast("double")
        .alias("v2"),
    )
    status = (
        F.when(F.col("n1") == 0, F.lit("new"))
        .when(
            (F.col("n1") == F.col("n2"))
            & (F.col("v1").eqNullSafe(F.col("v2"))),
            F.lit("unchanged"),
        )
        .otherwise(F.lit("changed"))
    )
    return agg.select(
        "user_id", "n1", "n2", "v1", "v2", status.alias("status")
    )


Q174_SQL = f"""
SELECT user_id,
       CAST(SUM(CASE WHEN ts < TIMESTAMP '{_SNAP_T1}' THEN 1 ELSE 0 END)
            AS BIGINT) AS n1,
       CAST(COUNT(*) AS BIGINT) AS n2,
       CAST(SUM(CASE WHEN ts < TIMESTAMP '{_SNAP_T1}'
                THEN CAST(value AS DECIMAL(38,6)) END) AS DOUBLE) AS v1,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS v2,
       CASE WHEN SUM(CASE WHEN ts < TIMESTAMP '{_SNAP_T1}' THEN 1 ELSE 0 END) = 0
                THEN 'new'
            WHEN SUM(CASE WHEN ts < TIMESTAMP '{_SNAP_T1}' THEN 1 ELSE 0 END)
                     = COUNT(*)
             AND CAST(SUM(CASE WHEN ts < TIMESTAMP '{_SNAP_T1}'
                      THEN CAST(value AS DECIMAL(38,6)) END) AS DOUBLE)
                 IS NOT DISTINCT FROM
                 CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
                THEN 'unchanged'
            ELSE 'changed' END AS status
FROM events
WHERE ts < TIMESTAMP '{_SNAP_T2}'
GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# Q199 — EXACT rolling 7-day distinct users per day, via an interval
# sweep instead of a per-window rescan. COUNT(DISTINCT) over a sliding
# window doesn't decompose, and the naive formulation rescans 7 days of
# data per output day (7x read amplification at 100 TB). The sweep is
# linear: a user active on day d contributes to every window ending in
# [d, d+6], so per user the contribution set is a UNION OF INTERVALS —
# merged with one lag-window pass over that user's distinct active days
# (gap > 6 days starts a new interval; the q196 session-merge shape on a
# day grid). Each interval becomes a +1/-1 delta pair, and the rolling
# count is the running sum of deltas over the DAY SPINE — a window over
# ~calendar-days rows (domain-bounded), never over events. Exact, no
# sketch, fully value-oracled against a brute-force range join.
# ---------------------------------------------------------------------------

ROLLING_WINDOW_DAYS = 7


def q199_rolling_distinct_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    win = ROLLING_WINDOW_DAYS
    ev = load_table(spark, sf_dir, "events")
    pairs = ev.select(
        "user_id", F.to_date(F.col("ts")).alias("day")
    ).distinct()
    uw = Window.partitionBy("user_id").orderBy("day")
    grouped = pairs.withColumn(
        "new_iv",
        F.when(
            F.datediff(F.col("day"), F.lag("day").over(uw)) > win - 1, 1
        ).otherwise(0),
    ).withColumn(
        "iv",
        F.sum("new_iv").over(
            uw.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    intervals = grouped.groupBy("user_id", "iv").agg(
        F.min("day").alias("cover_start"),
        F.date_add(F.max("day"), win - 1).alias("cover_end"),
    )
    deltas = intervals.select(
        F.col("cover_start").alias("day"), F.lit(1).alias("delta")
    ).unionByName(
        intervals.select(
            F.date_add(F.col("cover_end"), 1).alias("day"),
            F.lit(-1).alias("delta"),
        )
    )
    daily_delta = deltas.groupBy("day").agg(F.sum("delta").alias("d"))
    span = ev.agg(
        F.to_date(F.min("ts")).alias("lo"), F.to_date(F.max("ts")).alias("hi")
    )
    spine = span.select(
        F.explode(F.sequence("lo", "hi")).alias("day")
    )
    sw = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    rolled = (
        spine.join(daily_delta, "day", "left")
        .withColumn(
            "n_active_users",
            F.sum(F.coalesce("d", F.lit(0))).over(sw).cast("long"),
        )
        .select("day", "n_active_users")
    )
    event_days = pairs.select("day").distinct()
    return rolled.join(event_days, "day").orderBy("day")


Q199_SQL = f"""
WITH pairs AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
days AS (SELECT DISTINCT day FROM pairs)
SELECT d.day, COUNT(DISTINCT p.user_id) AS n_active_users
FROM days d
JOIN pairs p
  ON p.day BETWEEN d.day - {ROLLING_WINDOW_DAYS - 1} AND d.day
GROUP BY d.day
ORDER BY d.day
"""


# ---------------------------------------------------------------------------
# Q205 — Day-over-day movers: per (day, event_type) counts with
# previous-day comparison (exact int ratio), within-day rank, and rank
# delta — the daily "what changed" report an operations dashboard leads
# with. Two lag windows partitioned by event_type + one rank window
# partitioned by day, all over the (day x type) aggregate (calendar x
# type bounded, never over events).
# ---------------------------------------------------------------------------


def q205_daily_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.count("*").alias("n"))
    tw = Window.partitionBy("event_type").orderBy("day")
    dw = Window.partitionBy("day").orderBy(
        F.col("n").desc(), F.col("event_type")
    )
    out = (
        daily.withColumn("prev_n", F.lag("n").over(tw))
        .withColumn("rank", F.row_number().over(dw).cast("int"))
        .withColumn("prev_rank", F.lag("rank").over(tw))
    )
    return out.select(
        "day",
        "event_type",
        "n",
        "prev_n",
        (
            (F.col("n") - F.col("prev_n")).cast("double")
            / F.col("prev_n").cast("double")
        ).alias("pct_change"),
        "rank",
        (F.col("prev_rank") - F.col("rank")).cast("int").alias("rank_delta"),
    ).orderBy("day", "rank")


Q205_SQL = """
WITH daily AS (
    SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
    FROM events GROUP BY 1, 2
),
ranked AS (
    SELECT day, event_type, n,
           LAG(n) OVER (PARTITION BY event_type ORDER BY day) AS prev_n,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY day ORDER BY n DESC, event_type
           ) AS INT) AS rank
    FROM daily
)
SELECT day, event_type, n, prev_n,
       CAST(n - prev_n AS DOUBLE) / CAST(prev_n AS DOUBLE) AS pct_change,
       rank,
       CAST(LAG(rank) OVER (PARTITION BY event_type ORDER BY day) - rank
            AS INT) AS rank_delta
FROM ranked
ORDER BY day, rank
"""


# ---------------------------------------------------------------------------
# Q206 — A/B test readout: users split into two arms by the
# deterministic hash (the q65 idiom — reproducible, no RNG state),
# conversion = more purchases than errors (a per-user comparison that
# splits the population at any SF — "has >= 1 purchase" saturates to
# 100% on this corpus and degenerates the z-score), and the
# two-proportion z-score
# with pooled standard error — the experiment-analysis primitive. Every
# number is a fixed-order IEEE expression over exact integers (counts),
# mirrored in the oracle, so even the z-statistic hash-matches.
# ---------------------------------------------------------------------------


def q206_ab_test_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import hash60

    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.when(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            > F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)),
            1,
        )
        .otherwise(0)
        .alias("converted")
    )
    armed = users.select(
        (hash60(F.col("user_id").cast("string")) % 2).alias("arm"),
        "converted",
    )
    agg = armed.groupBy("arm").agg(
        F.count("*").alias("n"), F.sum("converted").alias("conv")
    )
    a = agg.where(F.col("arm") == 0).select(
        F.col("n").alias("n_a"), F.col("conv").alias("conv_a")
    )
    b = agg.where(F.col("arm") == 1).select(
        F.col("n").alias("n_b"), F.col("conv").alias("conv_b")
    )
    rate_a = F.col("conv_a").cast("double") / F.col("n_a").cast("double")
    rate_b = F.col("conv_b").cast("double") / F.col("n_b").cast("double")
    pooled = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    se = F.sqrt(
        pooled
        * (F.lit(1.0) - pooled)
        * (
            F.lit(1.0) / F.col("n_a").cast("double")
            + F.lit(1.0) / F.col("n_b").cast("double")
        )
    )
    return a.crossJoin(b).select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        rate_a.alias("rate_a"),
        rate_b.alias("rate_b"),
        (rate_b - rate_a).alias("lift"),
        ((rate_b - rate_a) / se).alias("z_score"),
    )


def _q206_sql() -> str:
    from ..functions.text import hash60_sql

    h = hash60_sql("CAST(user_id AS VARCHAR)")
    return f"""
WITH users AS (
    SELECT user_id,
           CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   > SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                THEN 1 ELSE 0 END AS converted
    FROM events GROUP BY user_id
),
armed AS (SELECT {h} % 2 AS arm, converted FROM users),
agg AS (
    SELECT arm, COUNT(*) AS n, CAST(SUM(converted) AS BIGINT) AS conv
    FROM armed GROUP BY arm
),
a AS (SELECT n AS n_a, conv AS conv_a FROM agg WHERE arm = 0),
b AS (SELECT n AS n_b, conv AS conv_b FROM agg WHERE arm = 1)
SELECT n_a, conv_a, n_b, conv_b,
       CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS rate_a,
       CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rate_b,
       CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)
         - CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS lift,
       (CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)
         - CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE))
       / sqrt((CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
              * (1.0 - CAST(conv_a + conv_b AS DOUBLE)
                       / CAST(n_a + n_b AS DOUBLE))
              * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
         AS z_score
FROM a CROSS JOIN b
"""


Q206_SQL = _q206_sql()


# ---------------------------------------------------------------------------
# Q209 — Daily OHLC bars per event_type: the time-series resampling
# primitive under every candlestick chart and bar-based feature pipeline
# (open/high/low/close/volume per calendar day, plus the overnight gap
# vs the previous bar's close). Open/close are picked by a row_number
# window ordered (epoch-µs, event_id) — the unique tiebreaker both
# engines sort identically (the q27 convention) — NOT by min/max_by on a
# struct, whose cross-engine ordering semantics are murkier. high/low/
# count are plain keyed aggregates; gap is one lag window over the
# (type x day) bar frame, double subtraction (single IEEE op, exact).
#
# Scale shape: one window sort per (type, day) partition + one keyed
# agg; the bar frame the lag runs on is calendar x type bounded.
# ---------------------------------------------------------------------------


def q209_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & ~F.isnan("value")
    )
    base = ev.select(
        F.to_date("ts").alias("day"),
        "event_type",
        F.unix_micros(F.col("ts")).alias("us"),
        "event_id",
        "value",
    )
    wa = Window.partitionBy("event_type", "day").orderBy("us", "event_id")
    wd = Window.partitionBy("event_type", "day").orderBy(
        F.col("us").desc(), F.col("event_id").desc()
    )
    marked = base.select(
        "day",
        "event_type",
        "value",
        F.row_number().over(wa).alias("r_open"),
        F.row_number().over(wd).alias("r_close"),
    )
    bars = marked.groupBy("event_type", "day").agg(
        F.max(F.when(F.col("r_open") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("r_close") == 1, F.col("value"))).alias("close"),
        F.count("*").alias("n_events"),
    )
    tw = Window.partitionBy("event_type").orderBy("day")
    return (
        bars.withColumn(
            "gap", F.col("open") - F.lag("close").over(tw)
        )
        .select("event_type", "day", "open", "high", "low", "close", "n_events", "gap")
        .orderBy("event_type", "day")
    )


Q209_SQL = """
WITH base AS (
    SELECT CAST(ts AS DATE) AS day, event_type,
           epoch_us(ts) AS us, event_id, value
    FROM events
    WHERE value IS NOT NULL AND NOT isnan(value)
),
marked AS (
    SELECT day, event_type, value,
           ROW_NUMBER() OVER (
               PARTITION BY event_type, day ORDER BY us, event_id
           ) AS r_open,
           ROW_NUMBER() OVER (
               PARTITION BY event_type, day ORDER BY us DESC, event_id DESC
           ) AS r_close
    FROM base
),
bars AS (
    SELECT event_type, day,
           MAX(CASE WHEN r_open = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN r_close = 1 THEN value END) AS close,
           COUNT(*) AS n_events
    FROM marked GROUP BY event_type, day
)
SELECT event_type, day, open, high, low, close, n_events,
       open - LAG(close) OVER (PARTITION BY event_type ORDER BY day) AS gap
FROM bars
ORDER BY event_type, day
"""


# ---------------------------------------------------------------------------
# Q257 — U-SHAPED (position-based) MULTI-TOUCH ATTRIBUTION: each user's
# LAST purchase is the conversion; every earlier non-purchase event is a
# touch; 100 credit units split 40/20/40 (first / middle / last — the
# standard U-shape marketers run next to q158's last-touch single-credit
# model). Credit is EXACT INTEGER by construction: k=1 → 100, k=2 →
# 50/50, k≥3 → 40 + 40 at the ends and the middle 20 divided by
# largest-remainder among the k−2 middles (base = 20 DIV (k−2), the
# first 20 % (k−2) middles in journey order get +1) — Σ credit = 100
# per converting user, always. Rolled up per event_type.
#
# Plan: one user-keyed window chain (conversion timestamp via max-when,
# journey position + count via two frames of the same window partition)
# + one keyed agg. No joins at all — the conversion anchor rides the
# window, the q27 single-shuffle shape.
# ---------------------------------------------------------------------------


def q257_ushape_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    base = ev.select(
        "user_id", "event_type", us.alias("us"), "event_id"
    )
    w_all = Window.partitionBy("user_id")
    conv = F.max(
        F.when(
            F.col("event_type") == "purchase",
            F.struct("us", "event_id"),
        )
    ).over(w_all)
    touches = (
        base.withColumn("conv", conv)
        .where(
            F.col("conv").isNotNull()
            & (F.col("event_type") != "purchase")
            & (
                (F.col("us") < F.col("conv.us"))
                | (
                    (F.col("us") == F.col("conv.us"))
                    & (F.col("event_id") < F.col("conv.event_id"))
                )
            )
        )
        .select("user_id", "event_type", "us", "event_id")
    )
    w_ord = Window.partitionBy("user_id").orderBy("us", "event_id")
    w_cnt = Window.partitionBy("user_id")
    ranked = touches.withColumn(
        "pos", F.row_number().over(w_ord)
    ).withColumn("k", F.count("*").over(w_cnt))
    m = F.col("k") - 2
    credit = (
        F.when(F.col("k") == 1, F.lit(100))
        .when(F.col("k") == 2, F.lit(50))
        .when((F.col("pos") == 1) | (F.col("pos") == F.col("k")), F.lit(40))
        .otherwise(
            F.expr("20 div (k - 2)")
            + F.when(F.col("pos") - 1 <= F.expr("20 % (k - 2)"), 1).otherwise(
                0
            )
        )
    )
    return (
        ranked.withColumn("credit", credit)
        .groupBy("event_type")
        .agg(
            F.sum("credit").cast("long").alias("total_credit"),
            F.count("*").cast("long").alias("n_touches"),
            F.sum(F.when(F.col("pos") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_first"),
            F.sum(F.when(F.col("pos") == F.col("k"), 1).otherwise(0))
            .cast("long")
            .alias("n_last"),
        )
        .orderBy("event_type")
    )


Q257_SQL = """
WITH base AS (
    SELECT user_id, event_type,
           epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id
    FROM events
),
with_conv AS (
    SELECT *,
           MAX(CASE WHEN event_type = 'purchase'
                    THEN {'us': us, 'event_id': event_id} END)
               OVER (PARTITION BY user_id) AS conv
    FROM base
),
touches AS (
    SELECT user_id, event_type, us, event_id
    FROM with_conv
    WHERE conv IS NOT NULL AND event_type <> 'purchase'
      AND (us < conv.us OR (us = conv.us AND event_id < conv.event_id))
),
ranked AS (
    SELECT *,
           ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY us, event_id
           ) AS pos,
           COUNT(*) OVER (PARTITION BY user_id) AS k
    FROM touches
),
credited AS (
    SELECT event_type, pos, k,
           CASE WHEN k = 1 THEN 100
                WHEN k = 2 THEN 50
                WHEN pos = 1 OR pos = k THEN 40
                ELSE 20 // (k - 2)
                     + CASE WHEN pos - 1 <= 20 % (k - 2)
                            THEN 1 ELSE 0 END
           END AS credit
    FROM ranked
)
SELECT event_type,
       CAST(SUM(credit) AS BIGINT) AS total_credit,
       CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST(SUM(CASE WHEN pos = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
       CAST(SUM(CASE WHEN pos = k THEN 1 ELSE 0 END) AS BIGINT) AS n_last
FROM credited
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Q267 — GROWTH ACCOUNTING (new / retained / resurrected / churned): the
# canonical weekly active-user decomposition every growth team runs.
# Grain is the Monday-start week (date_trunc 'week' agrees between Spark
# and DuckDB). For each user-week of activity:
#   new         — the user's first-ever active week,
#   retained    — also active the immediately preceding week,
#   resurrected — active before, but not the preceding week.
# churned(w) counts users active in w−1 and not in w — emitted from each
# user-week whose NEXT active week is not w+1, landed at week w+1, and
# kept only for weeks that exist in the activity table (no phantom
# post-corpus week). Identity: active(w) = new + retained + resurrected,
# pinned by construction.
#
# Plan: one distinct user-week frame, one user-keyed window chain
# (lag/lead/min over the same partition — single shuffle), one keyed
# agg per status, one semi-join for the churn clamp. All integers.
# ---------------------------------------------------------------------------


def q267_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    uw = ev.select(
        "user_id",
        F.date_trunc("week", F.col("ts")).cast("date").alias("week"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("week")
    marked = (
        uw.withColumn("prev_w", F.lag("week").over(w))
        .withColumn("next_w", F.lead("week").over(w))
        .withColumn("first_w", F.min("week").over(Window.partitionBy("user_id")))
    )
    status = (
        F.when(F.col("week") == F.col("first_w"), F.lit("new"))
        .when(F.col("prev_w") == F.date_sub(F.col("week"), 7), F.lit("retained"))
        .otherwise(F.lit("resurrected"))
    )
    active = marked.groupBy("week").agg(
        F.count("*").cast("long").alias("n_active"),
        F.sum((status == "new").cast("int")).cast("long").alias("n_new"),
        F.sum((status == "retained").cast("int")).cast("long").alias("n_retained"),
        F.sum((status == "resurrected").cast("int"))
        .cast("long")
        .alias("n_resurrected"),
    )
    churn_rows = (
        marked.where(
            F.col("next_w").isNull()
            | (F.col("next_w") > F.date_add(F.col("week"), 7))
        )
        .select(F.date_add(F.col("week"), 7).alias("week"))
        .join(uw.select("week").distinct(), "week", "left_semi")
        .groupBy("week")
        .agg(F.count("*").cast("long").alias("n_churned"))
    )
    return (
        active.join(churn_rows, "week", "left")
        .select(
            "week",
            "n_active",
            "n_new",
            "n_retained",
            "n_resurrected",
            F.coalesce("n_churned", F.lit(0)).cast("long").alias("n_churned"),
        )
        .orderBy("week")
    )


Q267_SQL = """
WITH uw AS (
    SELECT DISTINCT user_id,
           CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS week
    FROM events
),
marked AS (
    SELECT user_id, week,
           LAG(week)  OVER (PARTITION BY user_id ORDER BY week) AS prev_w,
           LEAD(week) OVER (PARTITION BY user_id ORDER BY week) AS next_w,
           MIN(week)  OVER (PARTITION BY user_id) AS first_w
    FROM uw
),
active AS (
    SELECT week,
           CAST(COUNT(*) AS BIGINT) AS n_active,
           CAST(SUM(CASE WHEN week = first_w THEN 1 ELSE 0 END) AS BIGINT)
               AS n_new,
           CAST(SUM(CASE WHEN week <> first_w
                          AND prev_w = week - INTERVAL 7 DAY
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
           CAST(SUM(CASE WHEN week <> first_w
                          AND (prev_w IS NULL
                               OR prev_w <> week - INTERVAL 7 DAY)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
    FROM marked GROUP BY week
),
churn AS (
    SELECT CAST(week + INTERVAL 7 DAY AS DATE) AS week,
           CAST(COUNT(*) AS BIGINT) AS n_churned
    FROM marked
    WHERE next_w IS NULL OR next_w > week + INTERVAL 7 DAY
    GROUP BY 1
)
SELECT a.week, a.n_active, a.n_new, a.n_retained, a.n_resurrected,
       CAST(COALESCE(c.n_churned, 0) AS BIGINT) AS n_churned
FROM active a LEFT JOIN churn c ON a.week = c.week
ORDER BY a.week
"""


# ---------------------------------------------------------------------------
# Q272 — TIME-DECAY MULTI-TOUCH ATTRIBUTION: q257's sibling with the
# third canonical credit model — each touch earns weight 2^(−Δdays)
# where Δdays = whole days between the touch and the user's converting
# purchase (q257's anchor, same tiebreak). EXACT arithmetIC: the decay
# is a power of two, so scaling by 2^CAP turns every weight into the
# integer 2^(CAP − min(Δdays, CAP)) — no floats anywhere, and a 30-day
# cap bounds the exponent (a touch a month out earns the 1-unit floor,
# the standard half-life-capped convention). Shares are integer ppm of
# the grand total via a window over the |event_type|-row agg result.
# ---------------------------------------------------------------------------

_DECAY_CAP_DAYS = 30


def q272_time_decay_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    base = ev.select("user_id", "event_type", us.alias("us"), "event_id")
    w_all = Window.partitionBy("user_id")
    conv = F.max(
        F.when(F.col("event_type") == "purchase", F.struct("us", "event_id"))
    ).over(w_all)
    touches = (
        base.withColumn("conv", conv)
        .where(
            F.col("conv").isNotNull()
            & (F.col("event_type") != "purchase")
            & (
                (F.col("us") < F.col("conv.us"))
                | (
                    (F.col("us") == F.col("conv.us"))
                    & (F.col("event_id") < F.col("conv.event_id"))
                )
            )
        )
        .withColumn(
            "d",
            F.least(
                F.expr("(conv.us - us) div 86400000000"),
                F.lit(_DECAY_CAP_DAYS),
            ),
        )
        .withColumn(
            "weight",
            F.expr(f"shiftleft(1L, {_DECAY_CAP_DAYS} - CAST(d AS INT))"),
        )
    )
    per_type = touches.groupBy("event_type").agg(
        F.sum("weight").cast("long").alias("total_weight"),
        F.count("*").cast("long").alias("n_touches"),
    )
    return per_type.select(
        "event_type",
        "total_weight",
        "n_touches",
        F.expr(
            "CAST(total_weight * 1000000 DIV "
            "SUM(total_weight) OVER () AS BIGINT)"
        ).alias("share_ppm"),
    ).orderBy("event_type")


Q272_SQL = f"""
WITH base AS (
    SELECT user_id, event_type,
           epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id
    FROM events
),
with_conv AS (
    SELECT *,
           MAX(CASE WHEN event_type = 'purchase'
                    THEN {{'us': us, 'event_id': event_id}} END)
               OVER (PARTITION BY user_id) AS conv
    FROM base
),
touches AS (
    SELECT event_type,
           (1::BIGINT << {_DECAY_CAP_DAYS})
           // (1::BIGINT << CAST(LEAST((conv.us - us) // 86400000000,
                                       {_DECAY_CAP_DAYS}) AS INT)) AS weight
    FROM with_conv
    WHERE conv IS NOT NULL AND event_type <> 'purchase'
      AND (us < conv.us OR (us = conv.us AND event_id < conv.event_id))
),
per_type AS (
    SELECT event_type,
           CAST(SUM(weight) AS BIGINT) AS total_weight,
           CAST(COUNT(*) AS BIGINT) AS n_touches
    FROM touches GROUP BY event_type
)
SELECT event_type, total_weight, n_touches,
       CAST(total_weight * 1000000 // SUM(total_weight) OVER () AS BIGINT)
           AS share_ppm
FROM per_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Q277 — FREQUENT EVENT TRIGRAMS (sequential 3-pattern mining): the
# most common consecutive event-type triples across all user journeys —
# q219's Markov bigrams extended one step, the pattern miner product
# teams use to find canonical flows (browse→cart→purchase). Two leads
# over the same user-keyed window (one shuffle), a keyed count, and a
# rank over the ≤|types|³ trigram frame; support ppm is exact.
# ---------------------------------------------------------------------------

_TRIGRAM_TOP = 20


def q277_event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    seq = (
        ev.select(
            "user_id",
            "event_type",
            F.unix_micros(F.col("ts")).alias("us"),
            "event_id",
        )
        .withColumn("e2", F.lead("event_type", 1).over(w))
        .withColumn("e3", F.lead("event_type", 2).over(w))
        .where(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    )
    counts = seq.groupBy(
        F.col("event_type").alias("e1"), "e2", "e3"
    ).agg(F.count("*").cast("long").alias("n"))
    ranked = counts.select(
        "e1",
        "e2",
        "e3",
        "n",
        F.expr("CAST(n * 1000000 DIV SUM(n) OVER () AS BIGINT)").alias(
            "support_ppm"
        ),
        F.row_number()
        .over(
            Window.orderBy(
                F.col("n").desc(),
                F.col("e1").asc(),
                F.col("e2").asc(),
                F.col("e3").asc(),
            )
        )
        .cast("int")
        .alias("rank"),
    )
    return ranked.where(F.col("rank") <= _TRIGRAM_TOP).orderBy("rank")


Q277_SQL = f"""
WITH seq AS (
    SELECT event_type AS e1,
           LEAD(event_type, 1) OVER w AS e2,
           LEAD(event_type, 2) OVER w AS e3
    FROM events
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
),
counts AS (
    SELECT e1, e2, e3, CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    GROUP BY 1, 2, 3
),
ranked AS (
    SELECT e1, e2, e3, n,
           CAST(n * 1000000 // SUM(n) OVER () AS BIGINT) AS support_ppm,
           CAST(ROW_NUMBER() OVER (
               ORDER BY n DESC, e1 ASC, e2 ASC, e3 ASC
           ) AS INT) AS rank
    FROM counts
)
SELECT e1, e2, e3, n, support_ppm, rank
FROM ranked WHERE rank <= {_TRIGRAM_TOP}
ORDER BY rank
"""


# ---------------------------------------------------------------------------
# Q282 — EVENT BURSTINESS (Fano factor) per event_type: the
# variance-to-mean ratio of DAILY event counts over observed days —
# F ≈ 1 is Poisson-like arrival, F ≫ 1 is bursty (incident storms,
# bot traffic), F < 1 is metronomic. Computed entirely on the integer
# grid: with x = daily count, F·1000 = 1000·(n·Σx² − (Σx)²) DIV (n·Σx)
# — population variance over mean, one exact integral quotient, no
# float accumulation anywhere (the q248 n·Σx²−(Σx)² algebra).
#
# Plan: one (event_type, day) keyed agg → one event_type keyed agg.
# ---------------------------------------------------------------------------


def q282_event_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
    ).agg(F.count("*").alias("x"))
    return (
        daily.groupBy("event_type")
        .agg(
            F.count("*").alias("n_days"),
            F.sum("x").alias("sx"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
        .selectExpr(
            "event_type",
            "CAST(n_days AS BIGINT) AS n_days",
            "CAST(sx AS BIGINT) AS n_events",
            "CAST(1000 * (n_days * sxx - sx * sx) DIV (n_days * sx)"
            " AS BIGINT) AS fano_milli",
        )
        .orderBy("event_type")
    )


Q282_SQL = """
WITH daily AS (
    SELECT event_type,
           CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
           COUNT(*) AS x
    FROM events GROUP BY 1, 2
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(x) AS BIGINT) AS n_events,
       CAST(1000 * (COUNT(*) * SUM(x * x) - SUM(x) * SUM(x))
            // (COUNT(*) * SUM(x)) AS BIGINT) AS fano_milli
FROM daily
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Q285 — RUN-LENGTH COMPRESSION PROFILE: consecutive same-event-type
# runs inside each user's journey (gaps-and-islands: island id = the
# running count of type-CHANGE rows), rolled up per event_type — run
# counts, longest run, mean run length in exact milli, and the RLE
# compression ratio ppm (runs per event). The session-replay storage
# gauge, and a behavioral signal (long repeat-runs = rage clicks /
# scraper loops).
#
# Plan: two frames over ONE user-keyed window partitioning + one keyed
# island agg + one keyed rollup — the q27/q252 single-shuffle shape.
# ---------------------------------------------------------------------------


def q285_event_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    marked = (
        ev.select(
            "user_id",
            "event_type",
            F.unix_micros(F.col("ts")).alias("us"),
            "event_id",
        )
        .withColumn("prev_type", F.lag("event_type").over(w))
        .withColumn(
            "chg",
            (
                F.col("prev_type").isNull()
                | (F.col("prev_type") != F.col("event_type"))
            ).cast("int"),
        )
        .withColumn(
            "island",
            F.sum("chg").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    runs = marked.groupBy("user_id", "island", "event_type").agg(
        F.count("*").alias("run_len")
    )
    return (
        runs.groupBy("event_type")
        .agg(
            F.count("*").alias("n_runs"),
            F.sum("run_len").alias("n_events"),
            F.max("run_len").alias("max_run"),
        )
        .selectExpr(
            "event_type",
            "CAST(n_runs AS BIGINT) AS n_runs",
            "CAST(n_events AS BIGINT) AS n_events",
            "CAST(max_run AS BIGINT) AS max_run",
            "CAST(n_events * 1000 DIV n_runs AS BIGINT) AS mean_run_milli",
            "CAST(n_runs * 1000000 DIV n_events AS BIGINT)"
            " AS compression_ppm",
        )
        .orderBy("event_type")
    )


Q285_SQL = """
WITH base AS (
    SELECT user_id, event_type,
           epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id
    FROM events
),
marked AS (
    SELECT user_id, event_type, us, event_id,
           CASE WHEN LAG(event_type) OVER w IS NULL
                  OR LAG(event_type) OVER w <> event_type
                THEN 1 ELSE 0 END AS chg
    FROM base
    WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
islanded AS (
    SELECT user_id, event_type,
           SUM(chg) OVER (PARTITION BY user_id
               ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
    FROM marked
),
runs AS (
    SELECT user_id, island, event_type, COUNT(*) AS run_len
    FROM islanded GROUP BY 1, 2, 3
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_runs,
       CAST(SUM(run_len) AS BIGINT) AS n_events,
       CAST(MAX(run_len) AS BIGINT) AS max_run,
       CAST(SUM(run_len) * 1000 // COUNT(*) AS BIGINT) AS mean_run_milli,
       CAST(COUNT(*) * 1000000 // SUM(run_len) AS BIGINT) AS compression_ppm
FROM runs
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Q287 — CROSS-CORRELATION LEAD-LAG DISCOVERY: for every ordered pair
# of event types, which daily-count lag (0..MAX_LAG days) maximizes the
# covariance between "x today" and "y lag days later" — the does-search-
# lead-purchase probe. Per (leader, follower): the best lag, its
# scaled covariance m = 1000·(n·Σxy − Σx·Σy) DIV n² (integer grid, the
# q248 algebra; inner-join day alignment, n = aligned days), ranked
# cov desc / lag asc. Negative covariances pin Spark DIV's truncation
# in the oracle (the q241 idiom).
#
# Plan: one (type, day) keyed agg → an 8-row lag spine exploded onto
# the tiny daily frame → one self equi-join on (type-pair, shifted
# day) → keyed agg per (pair, lag) → one window rank. Everything after
# the first agg is |types|·|days|-scale, i.e. metadata.
# ---------------------------------------------------------------------------

_XCORR_MAX_LAG = 7


def q287_crosscorr_leadlag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
    ).agg(F.count("*").alias("x"))
    lags = F.explode(
        F.sequence(F.lit(0), F.lit(_XCORR_MAX_LAG))
    ).alias("lag")
    lead = daily.select(
        F.col("event_type").alias("a"),
        F.col("day").alias("d"),
        F.col("x").alias("xa"),
        lags,
    ).withColumn("target_day", F.expr("date_add(d, lag)"))
    follow = daily.select(
        F.col("event_type").alias("b"),
        F.col("day").alias("target_day"),
        F.col("x").alias("xb"),
    )
    pairs = (
        lead.join(follow, "target_day")
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b", "lag")
        .agg(
            F.count("*").alias("n"),
            F.sum("xa").alias("sx"),
            F.sum("xb").alias("sy"),
            F.sum(F.col("xa") * F.col("xb")).alias("sxy"),
        )
        .selectExpr(
            "a",
            "b",
            "lag",
            "CAST(n AS BIGINT) AS n_days",
            "CAST(1000 * (n * sxy - sx * sy) DIV (n * n) AS BIGINT)"
            " AS cov_milli",
        )
    )
    w = Window.partitionBy("a", "b").orderBy(
        F.col("cov_milli").desc(), F.col("lag").asc()
    )
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            F.col("a").alias("leader"),
            F.col("b").alias("follower"),
            F.col("lag").cast("int").alias("best_lag"),
            "n_days",
            "cov_milli",
        )
        .orderBy("leader", "follower")
    )


Q287_SQL = f"""
WITH daily AS (
    SELECT event_type,
           CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
           COUNT(*) AS x
    FROM events GROUP BY 1, 2
),
pairs AS (
    SELECT a.event_type AS a, b.event_type AS b, l.lag,
           COUNT(*) AS n,
           SUM(a.x) AS sx, SUM(b.x) AS sy, SUM(a.x * b.x) AS sxy
    FROM daily a
    CROSS JOIN range(0, {_XCORR_MAX_LAG + 1}) l(lag)
    JOIN daily b ON b.day = a.day + CAST(l.lag AS INT) * INTERVAL 1 DAY
               AND b.event_type <> a.event_type
    GROUP BY 1, 2, 3
),
scored AS (
    SELECT a, b, CAST(lag AS INT) AS lag, CAST(n AS BIGINT) AS n_days,
           CAST(CASE WHEN 1000 * (n * sxy - sx * sy) >= 0
                     THEN 1000 * (n * sxy - sx * sy) // (n * n)
                     ELSE -((-(1000 * (n * sxy - sx * sy))) // (n * n))
                END AS BIGINT) AS cov_milli
    FROM pairs
),
ranked AS (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY a, b ORDER BY cov_milli DESC, lag ASC
    ) AS rk
    FROM scored
)
SELECT a AS leader, b AS follower, lag AS best_lag, n_days, cov_milli
FROM ranked WHERE rk = 1
ORDER BY leader, follower
"""


# ---------------------------------------------------------------------------
# Q288 — RETENTION HALF-LIFE per daily cohort: the smallest day offset
# k ≥ 1 at which a first-seen cohort's active share falls below 1/2
# (the one-number summary PMs quote from q66's retention matrix),
# decided with the cross-multiplied integer test 2·active(k) <
# cohort_size — no float ratio. Cohorts that never decay below half
# within the observed window report -1 (right-censored). Day grain:
# the corpus spans ~a month, so daily cohorts give a full curve where
# weekly grain collapses to one cohort.
#
# Plan: q66's cohort matrix (distinct user-week frame, first-week via
# a user window, one keyed agg) + one MIN-when agg per cohort.
# ---------------------------------------------------------------------------


def q288_retention_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    uw = ev.select(
        "user_id",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
    ).distinct()
    first = uw.groupBy("user_id").agg(F.min("day").alias("cohort"))
    matrix = (
        uw.join(first, "user_id")
        .groupBy(
            "cohort",
            F.datediff(F.col("day"), F.col("cohort")).cast("int").alias("k"),
        )
        .agg(F.count("*").alias("active"))
    )
    size = matrix.where(F.col("k") == 0).select(
        "cohort", F.col("active").alias("cohort_size")
    )
    return (
        matrix.join(size, "cohort")
        .groupBy("cohort")
        .agg(
            F.max("cohort_size").cast("long").alias("cohort_size"),
            F.min(
                F.when(
                    (F.col("k") >= 1)
                    & (F.col("active") * 2 < F.col("cohort_size")),
                    F.col("k"),
                )
            ).alias("hl"),
        )
        .select(
            "cohort",
            "cohort_size",
            F.coalesce(F.col("hl"), F.lit(-1))
            .cast("long")
            .alias("half_life_days"),
        )
        .orderBy("cohort")
    )


Q288_SQL = """
WITH uw AS (
    SELECT DISTINCT user_id,
           CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day
    FROM events
),
first AS (SELECT user_id, MIN(day) AS cohort FROM uw GROUP BY 1),
matrix AS (
    SELECT f.cohort,
           CAST(uw.day - f.cohort AS INT) AS k,
           COUNT(*) AS active
    FROM uw JOIN first f USING (user_id)
    GROUP BY 1, 2
),
size AS (SELECT cohort, active AS cohort_size FROM matrix WHERE k = 0)
SELECT m.cohort,
       CAST(MAX(s.cohort_size) AS BIGINT) AS cohort_size,
       CAST(COALESCE(MIN(CASE WHEN m.k >= 1 AND m.active * 2 < s.cohort_size
                              THEN m.k END), -1) AS BIGINT)
           AS half_life_days
FROM matrix m JOIN size s USING (cohort)
GROUP BY m.cohort
ORDER BY m.cohort
"""


# ---------------------------------------------------------------------------
# Q292 — SEGMENTED FUNNEL BY GEOGRAPHY: q67's ordered
# signup→click→purchase funnel, broken out by the user's nation
# (events.user_id ⋈ customer.c_custkey ⋈ nation — the cross-domain
# join the warehouse exists for), with exact per-step conversion ppm.
# Same strictly-later-timestamp step semantics as q67; the dims ride
# broadcast joins so the fact scans stay shuffle-free on the segment.
# ---------------------------------------------------------------------------


def q292_segmented_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_name").alias("nation"),
    )
    s = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(s, "user_id")
        .where(F.col("ts") > F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c.select("user_id", "c_ts"), "user_id")
        .where(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    seg = (
        s.select("user_id")
        .join(F.broadcast(cust), "user_id")
        .join(F.broadcast(nation), "c_nationkey")
        .join(c.select("user_id", F.lit(1).alias("clicked")), "user_id", "left")
        .join(p.select("user_id", F.lit(1).alias("purchased")), "user_id", "left")
    )
    return (
        seg.groupBy("nation")
        .agg(
            F.count("*").cast("long").alias("n_signup"),
            F.sum(F.coalesce("clicked", F.lit(0))).cast("long").alias("n_click"),
            F.sum(F.coalesce("purchased", F.lit(0)))
            .cast("long")
            .alias("n_purchase"),
        )
        .selectExpr(
            "nation",
            "n_signup",
            "n_click",
            "n_purchase",
            "CAST(n_click * 1000000 DIV n_signup AS BIGINT)"
            " AS click_conv_ppm",
            "CAST(CASE WHEN n_click = 0 THEN 0"
            " ELSE n_purchase * 1000000 DIV n_click END AS BIGINT)"
            " AS purchase_conv_ppm",
        )
        .orderBy("nation")
    )


Q292_SQL = """
WITH s AS (
    SELECT user_id, MIN(ts) AS s_ts FROM events
    WHERE event_type = 'signup' GROUP BY 1
),
c AS (
    SELECT e.user_id, MIN(e.ts) AS c_ts
    FROM events e JOIN s ON s.user_id = e.user_id
    WHERE e.event_type = 'click' AND e.ts > s.s_ts
    GROUP BY 1
),
p AS (
    SELECT e.user_id, MIN(e.ts) AS p_ts
    FROM events e JOIN c ON c.user_id = e.user_id
    WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
    GROUP BY 1
),
seg AS (
    SELECT n.n_name AS nation, s.user_id,
           CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END AS clicked,
           CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END AS purchased
    FROM s
    JOIN customer cu ON cu.c_custkey = s.user_id
    JOIN nation n ON n.n_nationkey = cu.c_nationkey
    LEFT JOIN c ON c.user_id = s.user_id
    LEFT JOIN p ON p.user_id = s.user_id
)
SELECT nation,
       CAST(COUNT(*) AS BIGINT) AS n_signup,
       CAST(SUM(clicked) AS BIGINT) AS n_click,
       CAST(SUM(purchased) AS BIGINT) AS n_purchase,
       CAST(SUM(clicked) * 1000000 // COUNT(*) AS BIGINT)
           AS click_conv_ppm,
       CAST(CASE WHEN SUM(clicked) = 0 THEN 0
                 ELSE SUM(purchased) * 1000000 // SUM(clicked) END AS BIGINT)
           AS purchase_conv_ppm
FROM seg
GROUP BY nation
ORDER BY nation
"""


# ---------------------------------------------------------------------------
# Q294 — POWER-USER CONCENTRATION: what share of all events do the top
# 1 % most-active users generate (k = ceil(n_users/100), rank by count
# desc / user_id asc — deterministic under count ties)? The abuse /
# multi-tenant-fairness gauge. k rides the rank frame itself (count
# window over the user-grain agg), so there is no driver scalar.
# ---------------------------------------------------------------------------


def q294_power_user_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    w_rank = Window.orderBy(F.col("n").desc(), F.col("user_id").asc())
    w_all = Window.partitionBy()
    ranked = per_user.select(
        "n",
        F.row_number().over(w_rank).alias("rk"),
        F.count("*").over(w_all).alias("n_users"),
        F.sum("n").over(w_all).alias("total"),
    )
    return (
        ranked.where(
            F.col("rk") <= F.expr("CAST((n_users + 99) DIV 100 AS INT)")
        )
        .groupBy()
        .agg(
            F.max("n_users").cast("long").alias("n_users"),
            F.count("*").cast("long").alias("k_top"),
            F.sum("n").cast("long").alias("top_events"),
            F.max("total").cast("long").alias("total_events"),
        )
        .selectExpr(
            "n_users",
            "k_top",
            "top_events",
            "total_events",
            "CAST(top_events * 1000000 DIV total_events AS BIGINT)"
            " AS top1pct_share_ppm",
        )
    )


Q294_SQL = """
WITH per_user AS (
    SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1
),
ranked AS (
    SELECT n,
           ROW_NUMBER() OVER (ORDER BY n DESC, user_id ASC) AS rk,
           COUNT(*) OVER () AS n_users,
           SUM(n) OVER () AS total
    FROM per_user
)
SELECT CAST(MAX(n_users) AS BIGINT) AS n_users,
       CAST(COUNT(*) AS BIGINT) AS k_top,
       CAST(SUM(n) AS BIGINT) AS top_events,
       CAST(MAX(total) AS BIGINT) AS total_events,
       CAST(SUM(n) * 1000000 // MAX(total) AS BIGINT) AS top1pct_share_ppm
FROM ranked
WHERE rk <= (n_users + 99) // 100
"""


# ---------------------------------------------------------------------------
# Q295 — DOUBLE-FIRE AUDIT: events of the same (user, type) arriving
# within DEDUP_WINDOW seconds of the previous one — the client-side
# double-click / retry-storm detector that sizes a dedup-within-
# watermark rule (q30's batch twin). Per event_type: duplicate-
# suspect counts and ppm, plus the worst same-second burst.
#
# Plan: one (user, type)-keyed window (lag + a RANGE frame count),
# one keyed agg.
# ---------------------------------------------------------------------------

_DOUBLE_FIRE_S = 5


def q295_double_fire_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        "event_type",
        F.expr("unix_micros(ts)").alias("us"),
        "event_id",
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("us", "event_id")
    w_rng = (
        Window.partitionBy("user_id", "event_type")
        .orderBy("us")
        .rangeBetween(0, 0)
    )
    marked = base.withColumn("prev_us", F.lag("us").over(w)).withColumn(
        "same_us", F.count("*").over(w_rng)
    )
    return (
        marked.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(
                (
                    F.col("prev_us").isNotNull()
                    & (
                        F.col("us") - F.col("prev_us")
                        <= _DOUBLE_FIRE_S * 1_000_000
                    )
                ).cast("int")
            )
            .cast("long")
            .alias("n_suspect"),
            F.max("same_us").cast("long").alias("max_same_us_burst"),
        )
        .selectExpr(
            "event_type",
            "n_events",
            "n_suspect",
            "CAST(n_suspect * 1000000 DIV n_events AS BIGINT)"
            " AS suspect_ppm",
            "max_same_us_burst",
        )
        .orderBy("event_type")
    )


Q295_SQL = f"""
WITH base AS (
    SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
           event_id
    FROM events
),
marked AS (
    SELECT event_type, us,
           LAG(us) OVER (PARTITION BY user_id, event_type
                         ORDER BY us, event_id) AS prev_us,
           COUNT(*) OVER (PARTITION BY user_id, event_type
                          ORDER BY us
                          RANGE BETWEEN CURRENT ROW AND CURRENT ROW)
               AS same_us
    FROM base
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN prev_us IS NOT NULL
                      AND us - prev_us <= {_DOUBLE_FIRE_S * 1_000_000}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_suspect,
       CAST(SUM(CASE WHEN prev_us IS NOT NULL
                      AND us - prev_us <= {_DOUBLE_FIRE_S * 1_000_000}
                     THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
           AS suspect_ppm,
       CAST(MAX(same_us) AS BIGINT) AS max_same_us_burst
FROM marked
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Q306 — INTER-EVENT GAP PROFILE: per event type, the lower-median and
# p90 (same cross-multiplied convention, 10·cum ≥ 9·n) of the gaps in
# seconds between a user's consecutive events of that type — the
# cadence fingerprint ("how often does a user click?") and the input
# for session-gap / TTL tuning. Gaps are integers (µs DIV 1e6); both
# quantiles come from value-counts CDFs, never per-group sorts of raw
# rows (the q45 lesson).
# ---------------------------------------------------------------------------


def q306_interevent_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("us", "event_id")
    gaps = (
        ev.select(
            "user_id",
            "event_type",
            F.expr("unix_micros(ts)").alias("us"),
            "event_id",
        )
        .withColumn("prev", F.lag("us").over(w))
        .where(F.col("prev").isNotNull())
        .select(
            "event_type",
            F.expr("(us - prev) DIV 1000000").alias("gap_s"),
        )
    )
    vc = gaps.groupBy("event_type", "gap_s").agg(F.count("*").alias("cnt"))
    w_cum = Window.partitionBy("event_type").orderBy("gap_s").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy("event_type")
    cdf = vc.select(
        "event_type",
        "gap_s",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    med = (
        cdf.where(F.col("cum") * 2 >= F.col("n"))
        .groupBy("event_type")
        .agg(F.min("gap_s").alias("med_gap_s"))
    )
    p90 = (
        cdf.where(F.col("cum") * 10 >= F.col("n") * 9)
        .groupBy("event_type")
        .agg(F.min("gap_s").alias("p90_gap_s"))
    )
    base = gaps.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_gaps")
    )
    return (
        base.join(F.broadcast(med), "event_type")
        .join(F.broadcast(p90), "event_type")
        .selectExpr(
            "event_type",
            "n_gaps",
            "CAST(med_gap_s AS BIGINT) AS med_gap_s",
            "CAST(p90_gap_s AS BIGINT) AS p90_gap_s",
        )
        .orderBy("event_type")
    )


Q306_SQL = """
WITH gaps AS (
    SELECT event_type,
           (us - prev) // 1000000 AS gap_s
    FROM (
        SELECT event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us,
               LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id
               ) AS prev
        FROM events
    )
    WHERE prev IS NOT NULL
),
vc AS (SELECT event_type, gap_s, COUNT(*) AS cnt FROM gaps GROUP BY 1, 2),
cdf AS (
    SELECT event_type, gap_s,
           SUM(cnt) OVER (PARTITION BY event_type ORDER BY gap_s
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           SUM(cnt) OVER (PARTITION BY event_type) AS n
    FROM vc
),
med AS (SELECT event_type, MIN(gap_s) AS med_gap_s FROM cdf
        WHERE cum * 2 >= n GROUP BY 1),
p90 AS (SELECT event_type, MIN(gap_s) AS p90_gap_s FROM cdf
        WHERE cum * 10 >= n * 9 GROUP BY 1),
base AS (SELECT event_type, COUNT(*) AS n_gaps FROM gaps GROUP BY 1)
SELECT b.event_type,
       CAST(b.n_gaps AS BIGINT) AS n_gaps,
       CAST(m.med_gap_s AS BIGINT) AS med_gap_s,
       CAST(p.p90_gap_s AS BIGINT) AS p90_gap_s
FROM base b JOIN med m USING (event_type) JOIN p90 p USING (event_type)
ORDER BY b.event_type
"""


# ---------------------------------------------------------------------------
# Q304 — HOUR-OF-DAY LOAD PROFILE: per event type, the peak UTC hour
# (argmax count via min(struct(-n, hour)) — the map-side-combinable
# argmax, q204's lesson), its exact share ppm of the type's traffic,
# and the peak-to-mean ratio milli (peak·24·1000 DIV total) — the
# capacity-planning diurnal gauge.
# ---------------------------------------------------------------------------


def q304_hourly_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.hour(F.col("ts")).alias("hr")
    ).agg(F.count("*").alias("n"))
    return (
        hourly.groupBy("event_type")
        .agg(
            F.sum("n").alias("total"),
            F.min(F.struct((-F.col("n")).alias("neg_n"), F.col("hr"))).alias(
                "pick"
            ),
        )
        .selectExpr(
            "event_type",
            "CAST(total AS BIGINT) AS n_events",
            "CAST(pick.hr AS INT) AS peak_hour",
            "CAST(-pick.neg_n AS BIGINT) AS peak_count",
            "CAST(-pick.neg_n * 1000000 DIV total AS BIGINT)"
            " AS peak_share_ppm",
            "CAST(-pick.neg_n * 24 * 1000 DIV total AS BIGINT)"
            " AS peak_to_mean_milli",
        )
        .orderBy("event_type")
    )


Q304_SQL = """
WITH hourly AS (
    SELECT event_type,
           EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) AS hr,
           COUNT(*) AS n
    FROM events GROUP BY 1, 2
),
picked AS (
    SELECT event_type, SUM(n) AS total,
           MIN({'neg_n': -n, 'hr': hr}) AS pick
    FROM hourly GROUP BY 1
)
SELECT event_type,
       CAST(total AS BIGINT) AS n_events,
       CAST(pick.hr AS INT) AS peak_hour,
       CAST(-pick.neg_n AS BIGINT) AS peak_count,
       CAST(-pick.neg_n * 1000000 // total AS BIGINT) AS peak_share_ppm,
       CAST(-pick.neg_n * 24 * 1000 // total AS BIGINT)
           AS peak_to_mean_milli
FROM picked
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Q313 — COLD-START BEHAVIOR MIX: how does the event-type mix of each
# user's FIRST week (days 0–6 from their first event) differ from
# steady state (day 7+)? Per type: cold-phase share ppm, steady share
# ppm, and the delta — the onboarding-funnel health readout ("new
# users browse, veterans purchase"). One user-keyed window min + one
# keyed agg + shares over the |types|-row frame.
# ---------------------------------------------------------------------------


def q313_coldstart_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    marked = (
        ev.select(
            "user_id",
            "event_type",
            F.expr("unix_micros(ts)").alias("us"),
        )
        .withColumn("first_us", F.min("us").over(w))
        .withColumn(
            "phase",
            F.when(
                F.expr("(us - first_us) DIV 86400000000") <= 6,
                F.lit("cold"),
            ).otherwise(F.lit("steady")),
        )
    )
    counts = marked.groupBy("event_type").agg(
        F.sum((F.col("phase") == "cold").cast("int")).alias("n_cold"),
        F.sum((F.col("phase") == "steady").cast("int")).alias("n_steady"),
    )
    return counts.selectExpr(
        "event_type",
        "CAST(n_cold AS BIGINT) AS n_cold",
        "CAST(n_steady AS BIGINT) AS n_steady",
        "CAST(n_cold * 1000000 DIV greatest(SUM(n_cold) OVER (), 1)"
        " AS BIGINT) AS cold_share_ppm",
        "CAST(n_steady * 1000000 DIV greatest(SUM(n_steady) OVER (), 1)"
        " AS BIGINT) AS steady_share_ppm",
        "CAST(n_cold * 1000000 DIV greatest(SUM(n_cold) OVER (), 1)"
        " - n_steady * 1000000 DIV greatest(SUM(n_steady) OVER (), 1)"
        " AS BIGINT) AS mix_delta_ppm",
    ).orderBy("event_type")


Q313_SQL = """
WITH marked AS (
    SELECT event_type,
           CASE WHEN (us - MIN(us) OVER (PARTITION BY user_id))
                     // 86400000000 <= 6
                THEN 'cold' ELSE 'steady' END AS phase
    FROM (
        SELECT user_id, event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us
        FROM events
    )
),
counts AS (
    SELECT event_type,
           SUM(CASE WHEN phase = 'cold' THEN 1 ELSE 0 END) AS n_cold,
           SUM(CASE WHEN phase = 'steady' THEN 1 ELSE 0 END) AS n_steady
    FROM marked GROUP BY 1
)
SELECT event_type,
       CAST(n_cold AS BIGINT) AS n_cold,
       CAST(n_steady AS BIGINT) AS n_steady,
       CAST(n_cold * 1000000 // GREATEST(SUM(n_cold) OVER (), 1)
            AS BIGINT) AS cold_share_ppm,
       CAST(n_steady * 1000000 // GREATEST(SUM(n_steady) OVER (), 1)
            AS BIGINT) AS steady_share_ppm,
       CAST(n_cold * 1000000 // GREATEST(SUM(n_cold) OVER (), 1)
            - n_steady * 1000000 // GREATEST(SUM(n_steady) OVER (), 1)
            AS BIGINT) AS mix_delta_ppm
FROM counts
ORDER BY event_type
"""


EVENT_QUERIES = {
    "q331_scd2_incremental": q331_scd2_incremental,
    "q267_growth_accounting": q267_growth_accounting,
    "q313_coldstart_mix": q313_coldstart_mix,
    "q277_event_trigrams": q277_event_trigrams,
    "q282_event_burstiness": q282_event_burstiness,
    "q285_event_runs": q285_event_runs,
    "q287_crosscorr_leadlag": q287_crosscorr_leadlag,
    "q288_retention_halflife": q288_retention_halflife,
    "q292_segmented_funnel": q292_segmented_funnel,
    "q294_power_user_share": q294_power_user_share,
    "q295_double_fire_audit": q295_double_fire_audit,
    "q304_hourly_peaks": q304_hourly_peaks,
    "q306_interevent_gaps": q306_interevent_gaps,
    "q272_time_decay_attribution": q272_time_decay_attribution,
    "q257_ushape_attribution": q257_ushape_attribution,
    "q199_rolling_distinct_users": q199_rolling_distinct_users,
    "q209_ohlc_bars": q209_ohlc_bars,
    "q205_daily_movers": q205_daily_movers,
    "q206_ab_test_readout": q206_ab_test_readout,
    "q27_sessionize": q27_sessionize,
    "q28_tumbling_window": q28_tumbling_window,
    "q133_hopping_window": q133_hopping_window,
    "q42_session_window": q42_session_window,
    "q61_event_gaps": q61_event_gaps,
    "q66_retention_cohorts": q66_retention_cohorts,
    "q67_funnel": q67_funnel,
    "q75_scd2_history": q75_scd2_history,
    "q88_gap_fill": q88_gap_fill,
    "q99_point_in_time": q99_point_in_time,
    "q127_event_transitions": q127_event_transitions,
    "q157_zorder_keys": q157_zorder_keys,
    "q158_last_touch_attribution": q158_last_touch_attribution,
    "q161_skipping_manifest": q161_skipping_manifest,
    "q165_session_paths": q165_session_paths,
    "q174_snapshot_diff": q174_snapshot_diff,
}

EVENT_ORACLES = {
    "q331_scd2_incremental": Q331_SQL,
    "q267_growth_accounting": Q267_SQL,
    "q277_event_trigrams": Q277_SQL,
    "q282_event_burstiness": Q282_SQL,
    "q285_event_runs": Q285_SQL,
    "q287_crosscorr_leadlag": Q287_SQL,
    "q288_retention_halflife": Q288_SQL,
    "q292_segmented_funnel": Q292_SQL,
    "q294_power_user_share": Q294_SQL,
    "q295_double_fire_audit": Q295_SQL,
    "q304_hourly_peaks": Q304_SQL,
    "q306_interevent_gaps": Q306_SQL,
    "q313_coldstart_mix": Q313_SQL,
    "q272_time_decay_attribution": Q272_SQL,
    "q257_ushape_attribution": Q257_SQL,
    "q199_rolling_distinct_users": Q199_SQL,
    "q209_ohlc_bars": Q209_SQL,
    "q205_daily_movers": Q205_SQL,
    "q206_ab_test_readout": Q206_SQL,
    "q27_sessionize": Q27_SQL,
    "q28_tumbling_window": Q28_SQL,
    "q133_hopping_window": Q133_SQL,
    "q42_session_window": Q42_SQL,
    "q61_event_gaps": Q61_SQL,
    "q66_retention_cohorts": Q66_SQL,
    "q67_funnel": Q67_SQL,
    "q75_scd2_history": Q75_SQL,
    "q88_gap_fill": Q88_SQL,
    "q99_point_in_time": Q99_SQL,
    "q127_event_transitions": Q127_SQL,
    "q157_zorder_keys": Q157_SQL,
    "q158_last_touch_attribution": Q158_SQL,
    "q161_skipping_manifest": Q161_SQL,
    "q165_session_paths": Q165_SQL,
    "q174_snapshot_diff": Q174_SQL,
}
