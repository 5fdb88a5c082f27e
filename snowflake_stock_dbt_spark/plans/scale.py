"""[EXT] Scale-path query variants: exact quantiles and sketch-based
distinct counts.

SURVEY.md §2.4 flags ``approx_count_distinct`` as the 100 TB-friendly
variant of the trend query's COUNT(DISTINCT) (A2): the exact form shuffles
every distinct value, the HyperLogLog++ sketch is a fixed-size mergeable
state. q46 carries the sketch INSIDE an oracle-checked contract by
asserting its documented accuracy instead of its raw estimate.

q45's percentiles interpolate identically in Spark (`percentile`) and
DuckDB (`quantile_cont`) — linear interpolation over the sorted values in
IEEE double — verified bit-exact on the corpus, so it ships with a full
value oracle. At 100 TB you'd swap in `approx_percentile` (t-digest /
KLL-style sketch) exactly like q46 swaps in HLL.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import SQL_DEC_SUM as SQL_DEC_SUM_X
from ..functions.numeric import exact_grouped_percentiles
from ..functions.text import hash60, hash60_sql
from ..sources.tables import load_table

APPROX_RSD = 0.01
APPROX_TOLERANCE = 0.02


def q45_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped percentiles WITHOUT the built-in ``percentile``:
    the builtin buffers all raw values into |groups| final tasks
    (superlinear under scale, tools/scale_probe.py caught 2.6->19.8 s at
    4x) — the value-counts formulation keeps every stage distributed and
    reproduces the builtin's interpolation bit-for-bit
    (functions/numeric.py:exact_grouped_percentiles)."""
    li = load_table(spark, sf_dir, "lineitem")
    out = exact_grouped_percentiles(
        li,
        "l_returnflag",
        "l_extendedprice",
        {"p50_price": 0.5, "p95_price": 0.95, "p99_price": 0.99},
    )
    return out.select(
        "l_returnflag",
        F.col("min_value").alias("min_price"),
        "p50_price",
        "p95_price",
        "p99_price",
        F.col("max_value").alias("max_price"),
    )


Q45_SQL = """
SELECT l_returnflag,
       MIN(l_extendedprice) AS min_price,
       quantile_cont(l_extendedprice, 0.5)  AS p50_price,
       quantile_cont(l_extendedprice, 0.95) AS p95_price,
       quantile_cont(l_extendedprice, 0.99) AS p99_price,
       MAX(l_extendedprice) AS max_price
FROM lineitem
GROUP BY l_returnflag
"""


def q46_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact vs HLL++ distinct users per event type. The sketch estimate
    itself is engine-local, so the contract column is the ACCURACY CLAIM:
    the oracle pins ``approx_within_tol = true``, and a sketch drifting
    past the tolerance fails the hash-compare."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", APPROX_RSD).alias("approx_users"),
    )
    rel_err = F.abs(F.col("approx_users") - F.col("exact_users")) / F.col(
        "exact_users"
    )
    return agg.select(
        "event_type",
        "exact_users",
        (rel_err <= APPROX_TOLERANCE).alias("approx_within_tol"),
    )


APPROX_PCT_ACCURACY = 10000
APPROX_PCT_TOLERANCE = 0.005


def q57_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based percentiles (the 100 TB path for q45): Spark's
    approx_percentile keeps a bounded summary per group instead of sorting
    every value. Same contract shape as q46 — the estimate itself is
    engine-local, so the checked columns are the exact percentiles plus
    the ACCURACY CLAIM (relative error within tolerance), which the oracle
    pins to true."""
    li = load_table(spark, sf_dir, "lineitem")
    acc = APPROX_PCT_ACCURACY
    # Exact-percentile partials buffer every value, and a single-row-group
    # corpus file pins that build to ONE task (profiled r11: 2.2 s serial).
    # Spread on the high-cardinality key first (no-op at cluster scale);
    # the grouped merge is unchanged and the approx sketch stays within
    # the pinned tolerance under any partial split.
    from ..functions.partitioning import ensure_min_parallelism

    li = ensure_min_parallelism(
        li.select("l_returnflag", "l_extendedprice", "l_orderkey"),
        F.col("l_orderkey"),
    ).drop("l_orderkey")
    agg = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("p50_exact"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("p95_exact"),
        F.expr(f"approx_percentile(l_extendedprice, 0.5, {acc})").alias("a50"),
        F.expr(f"approx_percentile(l_extendedprice, 0.95, {acc})").alias("a95"),
    )
    tol = APPROX_PCT_TOLERANCE

    def within(a: str, e: str) -> F.Column:
        return (F.abs(F.col(a) - F.col(e)) / F.col(e) <= tol).alias(
            f"{e.split('_')[0]}_within_tol"
        )

    return agg.select(
        "l_returnflag",
        "p50_exact",
        "p95_exact",
        within("a50", "p50_exact"),
        within("a95", "p95_exact"),
    )


Q57_SQL = """
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.5)  AS p50_exact,
       quantile_cont(l_extendedprice, 0.95) AS p95_exact,
       TRUE AS p50_within_tol,
       TRUE AS p95_within_tol
FROM lineitem
GROUP BY l_returnflag
"""


Q46_SQL = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS approx_within_tol
FROM events
GROUP BY event_type
"""


GROUPED_Z_THRESHOLD = 1.7  # price is near-uniform (max |z| ~ sqrt(3))


def q68_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group standardization (the grouped form of q03's global
    z-score): group stats as ONE exact-decimal aggregation, broadcast-
    joined back — never a stats window over each group's full partition.
    This is the shape that survives a skewed 100 TB group layout: the
    stats frame is |groups| rows regardless of data size."""
    from ..functions.numeric import dec_std_columns

    # spread=True: exact-decimal group stats over a 1-file local scan
    # (guide §2.5); measured 1.59s -> 1.24s at sf0.1, no-op at scale.
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    n, s1, s2 = dec_std_columns("l_extendedprice")
    stats = li.groupBy("l_returnflag").agg(
        n.alias("n"), s1.alias("s1"), s2.alias("s2")
    )
    mean = F.col("s1") / F.col("n")
    std = F.sqrt(
        (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
        / (F.col("n") - 1)
    )
    z = (F.col("l_extendedprice") - mean) / F.nullif(std, F.lit(0.0))
    return (
        li.join(F.broadcast(stats), "l_returnflag")
        .select(
            "l_returnflag",
            "l_orderkey",
            "l_linenumber",
            "l_extendedprice",
            F.round(z, 9).alias("zscore"),
        )
        .where(F.abs(F.col("zscore")) >= GROUPED_Z_THRESHOLD)
    )


Q68_SQL = f"""
WITH stats AS (
    SELECT l_returnflag,
           CAST(COUNT(l_extendedprice) AS DOUBLE) AS n,
           {SQL_DEC_SUM_X.format(x='l_extendedprice')} AS s1,
           {SQL_DEC_SUM_X.format(x='l_extendedprice * l_extendedprice')} AS s2
    FROM lineitem GROUP BY l_returnflag
),
scored AS (
    SELECT li.l_returnflag, li.l_orderkey, li.l_linenumber,
           li.l_extendedprice,
           round((li.l_extendedprice - s1 / n)
                 / NULLIF(sqrt((s2 - s1 * s1 / n) / (n - 1)), 0.0), 9)
               AS zscore
    FROM lineitem li JOIN stats USING (l_returnflag)
)
SELECT * FROM scored WHERE abs(zscore) >= {GROUPED_Z_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# Q79 — Pairwise Pearson correlation over lineitem measures, from ONE
# aggregation pass: sums / sums-of-squares / cross-products as exact-decimal
# aggregate columns, correlations assembled driver-free from the 1-row
# frame. The df.stat.corr analog that scales: one shuffle of a dozen
# partial sums regardless of row count, and bit-identical cross-engine
# (every aggregate is decimal-exact; the final arithmetic is fixed-order
# IEEE on both sides, rounded to 9 dp for the 1-ulp sqrt boundary).
# ---------------------------------------------------------------------------

_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount"]


def q79_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread=True: ~28 exact-decimal product sums per row serialize on a
    # 1-file scan locally (guide §2.5); measured 2.57s -> 1.12s at sf0.1.
    li = load_table(spark, sf_dir, "lineitem", spread=True)
    dec = lambda c: F.col(c).cast("double").cast("decimal(38,12)")  # noqa: E731
    aggs = [F.count("*").cast("double").alias("n")]
    for c in _CORR_COLS:
        aggs.append(F.sum(dec(c)).cast("double").alias(f"s_{c}"))
        aggs.append(F.sum((dec(c) * dec(c)).cast("decimal(38,12)")).cast("double").alias(f"ss_{c}"))
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i + 1 :]:
            aggs.append(
                F.sum((dec(a) * dec(b)).cast("decimal(38,12)"))
                .cast("double")
                .alias(f"sp_{a}_{b}")
            )
    # Persist the 1-row stats frame: the per-pair selects below are separate
    # plan branches, and without this each one re-scans lineitem for its own
    # copy of the aggregation (observed: 6 scans in the unpersisted plan).
    stats = li.agg(*aggs).persist()

    pairs = None
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i + 1 :]:
            n = F.col("n")
            cov = F.col(f"sp_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}") / n
            va = F.col(f"ss_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}") / n
            vb = F.col(f"ss_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}") / n
            row = stats.select(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.round(cov / F.nullif(F.sqrt(va * vb), F.lit(0.0)), 9).alias("pearson_r"),
            )
            pairs = row if pairs is None else pairs.unionByName(row)
    return pairs.orderBy("col_a", "col_b")


def _corr_oracle() -> str:
    dec = lambda c: f"CAST(CAST({c} AS DOUBLE) AS DECIMAL(38,12))"  # noqa: E731
    sums = ["COUNT(*)::DOUBLE AS n"]
    for c in _CORR_COLS:
        sums.append(f"CAST(SUM({dec(c)}) AS DOUBLE) AS s_{c}")
        sums.append(
            f"CAST(SUM(CAST({dec(c)} * {dec(c)} AS DECIMAL(38,12))) AS DOUBLE) AS ss_{c}"
        )
    selects = []
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i + 1 :]:
            sums.append(
                f"CAST(SUM(CAST({dec(a)} * {dec(b)} AS DECIMAL(38,12))) AS DOUBLE) AS sp_{a}_{b}"
            )
            selects.append(
                f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
                f"round((sp_{a}_{b} - s_{a} * s_{b} / n) / "
                f"NULLIF(sqrt((ss_{a} - s_{a} * s_{a} / n) * (ss_{b} - s_{b} * s_{b} / n)), 0.0), 9)"
                f" AS pearson_r FROM stats"
            )
    union = " UNION ALL ".join(selects)
    return (
        f"WITH stats AS (SELECT {', '.join(sums)} FROM lineitem)\n"
        f"SELECT * FROM ({union}) ORDER BY col_a, col_b"
    )


Q79_SQL = _corr_oracle()


# ---------------------------------------------------------------------------
# Q80 — Fixed-width numeric histogram of events.value: min/max pass →
# bucket assignment → keyed count. Two scans, two tiny shuffles; the
# profiling histogram every column-stats page shows. Bucket edges are exact
# integer math over floor()'d doubles, so both engines bin identically.
# ---------------------------------------------------------------------------

HIST_BUCKETS = 20


def q80_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & ~F.isnan("value")
    )
    lohi = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    binned = ev.crossJoin(F.broadcast(lohi)).select(
        F.least(
            F.lit(HIST_BUCKETS - 1),
            F.floor(
                (F.col("value") - F.col("lo"))
                / F.nullif(F.col("hi") - F.col("lo"), F.lit(0.0))
                * HIST_BUCKETS
            ),
        )
        .cast("long")
        .alias("bucket")
    )
    return (
        binned.groupBy("bucket")
        .agg(F.count("*").alias("n_rows"))
        .orderBy("bucket")
    )


Q80_SQL = f"""
WITH base AS (
    SELECT value FROM events WHERE value IS NOT NULL AND NOT isnan(value)
),
lohi AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM base)
SELECT LEAST({HIST_BUCKETS - 1},
             CAST(floor((value - lo) / NULLIF(hi - lo, 0.0) * {HIST_BUCKETS}) AS BIGINT))
           AS bucket,
       COUNT(*) AS n_rows
FROM base CROSS JOIN lohi
GROUP BY 1
ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# Q95 — Count-min sketch frequency estimation: per-user event counts read
# from a 4x1024 counter grid instead of an exact per-key aggregation. The
# sketch state is depth x width counters regardless of key cardinality,
# merges by cell-wise addition, and its estimate is a deterministic
# function of the data and the fixed md5 hash family — so unlike the HLL
# (q46) / t-digest (q57) contracts, the ENTIRE estimate is value-checked
# cross-engine, not just an accuracy claim. Exact counts ride along to
# exhibit the overcount (always >= 0).
#
# Scale shape: one explode(depth) -> map-side-combined count builds the
# sketch (shuffle bounded by depth x width cells per task); estimation
# broadcasts the tiny sketch into the probe join — the exact side exists
# here only because the oracle needs it.
# ---------------------------------------------------------------------------


def q95_cms_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import cms_estimate, cms_sketch

    ev = load_table(spark, sf_dir, "events")
    keyed = ev.select(F.col("user_id").cast("string").alias("user_key"))
    sketch = cms_sketch(keyed, "user_key")
    exact = keyed.groupBy("user_key").agg(F.count("*").alias("exact_n"))
    est = cms_estimate(sketch, exact.select("user_key"), "user_key")
    return (
        exact.join(est, "user_key")
        .select(
            "user_key",
            "exact_n",
            "cms_n",
            (F.col("cms_n") - F.col("exact_n")).alias("overcount"),
        )
        .orderBy("user_key")
    )


def _cms_cells_sql() -> str:
    from ..operators.sketch import CMS_DEPTH, cms_bucket_sql

    selects = [
        f"SELECT {j} AS j, {cms_bucket_sql('CAST(user_id AS VARCHAR)', j)}"
        f" AS bucket FROM events"
        for j in range(CMS_DEPTH)
    ]
    return "\nUNION ALL\n".join(selects)


def _cms_probes_sql() -> str:
    from ..operators.sketch import CMS_DEPTH, cms_bucket_sql

    selects = [
        f"SELECT user_key, {j} AS j,"
        f" {cms_bucket_sql('user_key', j)} AS bucket FROM exact"
        for j in range(CMS_DEPTH)
    ]
    return "\nUNION ALL\n".join(selects)


Q95_SQL = f"""
WITH exact AS (
    SELECT CAST(user_id AS VARCHAR) AS user_key, COUNT(*) AS exact_n
    FROM events GROUP BY 1
),
cells AS (
{_cms_cells_sql()}
),
sketch AS (
    SELECT j, bucket, COUNT(*) AS c FROM cells GROUP BY j, bucket
),
probes AS (
{_cms_probes_sql()}
),
est AS (
    SELECT user_key, MIN(c) AS cms_n
    FROM probes JOIN sketch USING (j, bucket)
    GROUP BY user_key
)
SELECT exact.user_key,
       CAST(exact_n AS BIGINT) AS exact_n,
       CAST(cms_n AS BIGINT) AS cms_n,
       CAST(cms_n - exact_n AS BIGINT) AS overcount
FROM exact JOIN est ON exact.user_key = est.user_key
ORDER BY exact.user_key
"""


# ---------------------------------------------------------------------------
# Q148 — per-group WINSORIZATION (outlier capping at exact percentiles):
# the curation step that tames heavy-tailed metrics before training-mix
# statistics. Composes q45's distributed value-counts percentiles (never
# the buffering builtin) with the q78-style broadcast of the per-group
# bounds; clipping and the clipped-sum replay bit-identically because
# the interpolated bounds are the SAME doubles on both engines (the q45
# proof) and the sum uses the exact-decimal recipe.
# ---------------------------------------------------------------------------

_WINSOR_LO = 0.01
_WINSOR_HI = 0.99


def q148_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pcts = exact_grouped_percentiles(
        li,
        "l_returnflag",
        "l_extendedprice",
        {"p_lo": _WINSOR_LO, "p_hi": _WINSOR_HI},
    ).select("l_returnflag", "p_lo", "p_hi")
    v = F.col("l_extendedprice")
    clipped = F.least(F.greatest(v, F.col("p_lo")), F.col("p_hi"))
    return (
        li.join(F.broadcast(pcts), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.when(v < F.col("p_lo"), 1).otherwise(0))
            .cast("long")
            .alias("n_clipped_low"),
            F.sum(F.when(v > F.col("p_hi"), 1).otherwise(0))
            .cast("long")
            .alias("n_clipped_high"),
            F.sum(clipped.cast("decimal(38,6)"))
            .cast("double")
            .alias("sum_winsorized"),
            F.min("p_lo").alias("p_lo"),
            F.min("p_hi").alias("p_hi"),
        )
        .orderBy("l_returnflag")
    )


Q148_SQL = f"""
WITH pct AS (
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, {_WINSOR_LO}) AS p_lo,
           quantile_cont(l_extendedprice, {_WINSOR_HI}) AS p_hi
    FROM lineitem GROUP BY l_returnflag
)
SELECT li.l_returnflag,
       COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN l_extendedprice < p_lo THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clipped_low,
       CAST(SUM(CASE WHEN l_extendedprice > p_hi THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clipped_high,
       {SQL_DEC_SUM_X.format(x='LEAST(GREATEST(l_extendedprice, p_lo), p_hi)')}
           AS sum_winsorized,
       MIN(p_lo) AS p_lo,
       MIN(p_hi) AS p_hi
FROM lineitem li JOIN pct USING (l_returnflag)
GROUP BY li.l_returnflag
ORDER BY li.l_returnflag
"""


# ---------------------------------------------------------------------------
# Q153 — ROBUST outlier detection via median/MAD (the Iglewicz–Hoaglin
# modified z-score): flag events whose |0.6745·(x − median)/MAD| > 3.5.
# The robust twin of q03's mean/stddev z-score — medians don't move when
# the outliers themselves get wilder, which is why curation pipelines
# prefer MAD fences on heavy-tailed metrics. Two passes of q45's
# distributed value-counts percentile machinery (never the buffering
# builtin): per-group median, then per-group median of |x − median|;
# both results are tiny per-group tables broadcast back. The modified
# z-score is two IEEE ops on identical doubles, so the filter and the
# reported score replay bit-identically (q45 pins the percentile
# interpolation equality with DuckDB's quantile_cont).
# ---------------------------------------------------------------------------

_MAD_CONSISTENCY = 0.6745
_MAD_FENCE = 3.5


def q153_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    med = exact_grouped_percentiles(
        ev, "event_type", "value", {"med": 0.5}
    ).select("event_type", "med")
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "dev", F.abs(F.col("value") - F.col("med"))
    )
    mad = exact_grouped_percentiles(
        dev, "event_type", "dev", {"mad": 0.5}
    ).select("event_type", "mad")
    rz = (
        F.lit(_MAD_CONSISTENCY)
        * (F.col("value") - F.col("med"))
        / F.nullif(F.col("mad"), F.lit(0.0))
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .withColumn("rz", rz)
        .where(F.abs(F.col("rz")) > _MAD_FENCE)
        .select(
            "event_id",
            "event_type",
            "value",
            F.round("rz", 9).alias("robust_z"),
        )
    )


Q153_SQL = f"""
WITH med AS (
    SELECT event_type, quantile_cont(value, 0.5) AS med
    FROM events GROUP BY 1
),
dev AS (
    SELECT e.event_id, e.event_type, e.value, m.med,
           ABS(e.value - m.med) AS dev
    FROM events e JOIN med m USING (event_type)
),
mad AS (
    SELECT event_type, quantile_cont(dev, 0.5) AS mad FROM dev GROUP BY 1
),
scored AS (
    SELECT d.event_id, d.event_type, d.value,
           {_MAD_CONSISTENCY} * (d.value - d.med) / NULLIF(m.mad, 0.0) AS rz
    FROM dev d JOIN mad m USING (event_type)
)
SELECT event_id, event_type, value, round(rz, 9) AS robust_z
FROM scored WHERE ABS(rz) > {_MAD_FENCE}
"""


# ---------------------------------------------------------------------------
# Q155 — distributed least-squares via NORMAL EQUATIONS: fit
# l_extendedprice ~ beta0 + beta1·l_quantity + beta2·l_discount with one
# exact-decimal moment pass (the MLlib linear-regression "summarizer"
# shape: nine X'X / X'y cells of bounded state, map-side combined), then
# solve the 3×3 system in closed form by Cramer's rule. The solve is a
# FIXED expression tree over the nine moment doubles (each an exact
# decimal sum cast to double), so both engines execute the identical
# IEEE op sequence — the q79 determinism recipe extended from
# correlations to a full regression. Fit quality is reported as the
# FLOOR-quantized sum of absolute residuals (order-independent integer
# sum; true SSE in doubles would be order-dependent — the PLANS.md
# STDDEV trap). At 100 TB this is one scan + one 9-cell shuffle, plus
# one broadcast-join scan for residuals; nothing grows with rows.
# ---------------------------------------------------------------------------

# Cramer solve over the moment columns (identical text drives Spark's
# F.expr and the DuckDB oracle — the determinism contract is "same
# expression tree, same doubles"). A = [[n,sx1,sx2],[sx1,s11,s12],
# [sx2,s12,s22]], b = [sy,s1y,s2y].
_REG_DET = (
    "(n*(s11*s22 - s12*s12) - sx1*(sx1*s22 - s12*sx2)"
    " + sx2*(sx1*s12 - s11*sx2))"
)
_REG_DET0 = (
    "(sy*(s11*s22 - s12*s12) - sx1*(s1y*s22 - s12*s2y)"
    " + sx2*(s1y*s12 - s11*s2y))"
)
_REG_DET1 = (
    "(n*(s1y*s22 - s12*s2y) - sy*(sx1*s22 - s12*sx2)"
    " + sx2*(sx1*s2y - s1y*sx2))"
)
_REG_DET2 = (
    "(n*(s11*s2y - s1y*s12) - sx1*(sx1*s2y - s1y*sx2)"
    " + sy*(sx1*s12 - s11*sx2))"
)
_REG_BETAS = {
    "beta0": f"{_REG_DET0} / {_REG_DET}",
    "beta1": f"{_REG_DET1} / {_REG_DET}",
    "beta2": f"{_REG_DET2} / {_REG_DET}",
}
#: Residual quantization grid for the order-independent fit metric.
_REG_RES_SCALE = 1000


def q155_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.numeric import dec_sum

    # spread=True: the normal-equation moment sums are exact-decimal
    # (CPU-dense) over a 1-file local scan (guide §2.5); 2.25s -> 1.26s.
    li = load_table(spark, sf_dir, "lineitem", spread=True).select(
        F.col("l_quantity").cast("double").alias("x1"),
        F.col("l_discount").cast("double").alias("x2"),
        F.col("l_extendedprice").cast("double").alias("y"),
    )
    mom = li.agg(
        F.count("*").cast("double").alias("n"),
        dec_sum("x1").alias("sx1"),
        dec_sum("x2").alias("sx2"),
        dec_sum(F.col("x1") * F.col("x1")).alias("s11"),
        dec_sum(F.col("x1") * F.col("x2")).alias("s12"),
        dec_sum(F.col("x2") * F.col("x2")).alias("s22"),
        dec_sum("y").alias("sy"),
        dec_sum(F.col("x1") * F.col("y")).alias("s1y"),
        dec_sum(F.col("x2") * F.col("y")).alias("s2y"),
    )
    betas = mom.select(
        F.col("n"),
        *[F.expr(e).alias(name) for name, e in _REG_BETAS.items()],
    )
    r = F.col("y") - (
        F.col("beta0")
        + F.col("beta1") * F.col("x1")
        + F.col("beta2") * F.col("x2")
    )
    return (
        li.crossJoin(F.broadcast(betas))
        .agg(
            F.max("n").cast("long").alias("n_rows"),
            F.round(F.max("beta0"), 9).alias("beta0"),
            F.round(F.max("beta1"), 9).alias("beta1"),
            F.round(F.max("beta2"), 9).alias("beta2"),
            F.sum(F.floor(F.abs(r) * F.lit(float(_REG_RES_SCALE))))
            .cast("long")
            .alias("abs_residual_q"),
        )
    )


Q155_SQL = f"""
WITH pts AS (
    SELECT CAST(l_quantity AS DOUBLE) AS x1,
           CAST(l_discount AS DOUBLE) AS x2,
           CAST(l_extendedprice AS DOUBLE) AS y
    FROM lineitem
),
mom AS (
    SELECT CAST(COUNT(*) AS DOUBLE) AS n,
           {SQL_DEC_SUM_X.format(x='x1')} AS sx1,
           {SQL_DEC_SUM_X.format(x='x2')} AS sx2,
           {SQL_DEC_SUM_X.format(x='x1 * x1')} AS s11,
           {SQL_DEC_SUM_X.format(x='x1 * x2')} AS s12,
           {SQL_DEC_SUM_X.format(x='x2 * x2')} AS s22,
           {SQL_DEC_SUM_X.format(x='y')} AS sy,
           {SQL_DEC_SUM_X.format(x='x1 * y')} AS s1y,
           {SQL_DEC_SUM_X.format(x='x2 * y')} AS s2y
    FROM pts
),
betas AS (
    SELECT n,
           {_REG_BETAS['beta0']} AS beta0,
           {_REG_BETAS['beta1']} AS beta1,
           {_REG_BETAS['beta2']} AS beta2
    FROM mom
)
SELECT CAST(MAX(n) AS BIGINT) AS n_rows,
       round(MAX(beta0), 9) AS beta0,
       round(MAX(beta1), 9) AS beta1,
       round(MAX(beta2), 9) AS beta2,
       CAST(SUM(FLOOR(ABS(y - (beta0 + beta1 * x1 + beta2 * x2))
                      * {float(_REG_RES_SCALE)})) AS BIGINT)
           AS abs_residual_q
FROM pts CROSS JOIN betas
"""


# ---------------------------------------------------------------------------
# Q163 — QUANTILE DISCRETIZER (MLlib QuantileDiscretizer analog, exact):
# per-group price deciles from the q45 value-counts machinery, bounds
# broadcast back, each row binned by counting exceeded bounds (nine
# comparisons on identical doubles — no searchsorted UDF), then the
# per-bucket histogram with exact-decimal sums. The feature-binning step
# of classical feature engineering, at one stats pass + one scan.
# ---------------------------------------------------------------------------


def q163_quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pcts = exact_grouped_percentiles(
        li, "l_returnflag", "l_extendedprice",
        {"d1": 0.1, "d2": 0.2, "d3": 0.3, "d4": 0.4, "d5": 0.5, "d6": 0.6, "d7": 0.7, "d8": 0.8, "d9": 0.9},
    ).select("l_returnflag", "d1", "d2", "d3", "d4", "d5", "d6", "d7", "d8", "d9")
    bucket = ((F.col("l_extendedprice") > F.col("d1")).cast("int") + (F.col("l_extendedprice") > F.col("d2")).cast("int") + (F.col("l_extendedprice") > F.col("d3")).cast("int") + (F.col("l_extendedprice") > F.col("d4")).cast("int") + (F.col("l_extendedprice") > F.col("d5")).cast("int") + (F.col("l_extendedprice") > F.col("d6")).cast("int") + (F.col("l_extendedprice") > F.col("d7")).cast("int") + (F.col("l_extendedprice") > F.col("d8")).cast("int") + (F.col("l_extendedprice") > F.col("d9")).cast("int") + F.lit(1)).alias("decile")
    return (
        li.join(F.broadcast(pcts), "l_returnflag")
        .select("l_returnflag", bucket, "l_extendedprice")
        .groupBy("l_returnflag", "decile")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("l_extendedprice").cast("decimal(38,6)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


Q163_SQL = f"""
WITH pct AS (
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.1)  AS d1,
           quantile_cont(l_extendedprice, 0.2)  AS d2,
           quantile_cont(l_extendedprice, 0.3)  AS d3,
           quantile_cont(l_extendedprice, 0.4)  AS d4,
           quantile_cont(l_extendedprice, 0.5)  AS d5,
           quantile_cont(l_extendedprice, 0.6)  AS d6,
           quantile_cont(l_extendedprice, 0.7)  AS d7,
           quantile_cont(l_extendedprice, 0.8)  AS d8,
           quantile_cont(l_extendedprice, 0.9)  AS d9
    FROM lineitem GROUP BY l_returnflag
),
binned AS (
    SELECT li.l_returnflag,
           CAST(l_extendedprice > d1 AS INT) + CAST(l_extendedprice > d2 AS INT) + CAST(l_extendedprice > d3 AS INT) + CAST(l_extendedprice > d4 AS INT) + CAST(l_extendedprice > d5 AS INT) + CAST(l_extendedprice > d6 AS INT) + CAST(l_extendedprice > d7 AS INT) + CAST(l_extendedprice > d8 AS INT) + CAST(l_extendedprice > d9 AS INT) + 1 AS decile,
           l_extendedprice
    FROM lineitem li JOIN pct USING (l_returnflag)
)
SELECT l_returnflag, decile, COUNT(*) AS n_rows,
       {SQL_DEC_SUM_X.format(x='l_extendedprice')} AS sum_price
FROM binned
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Q171 — ROBUST trend detection on the daily revenue series: Theil–Sen
# median slope + the Mann–Kendall S statistic, per return flag, over a
# DETERMINISTIC 1-in-8 hash sample of day pairs. The classical
# estimators are O(days²) in pairs; the sampled variant is the standard
# scale adaptation, and hashing (not RNG) picks the SAME pairs on every
# engine/run — so the whole thing carries a full value oracle (the q71
# deterministic-sampling rule applied to pair space). Slopes are one
# double division per pair on identical inputs; the median reuses the
# q45 value-counts machinery (never the buffering builtin); S is an
# exact integer sum. Pair volume is bounded by the DAILY series (grows
# with time, not data) — the first keyed agg reduces the raw scan.
# ---------------------------------------------------------------------------

_TS_EPOCH = "1995-01-01"
_TS_SAMPLE_MOD = 8


def q171_robust_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import hash60

    li = load_table(spark, sf_dir, "lineitem")
    base = (
        li.select(
            "l_returnflag",
            F.datediff(F.to_date("l_shipdate"), F.lit(_TS_EPOCH).cast("date"))
            .alias("x"),
            F.col("l_extendedprice").cast("decimal(38,2)").alias("p"),
        )
        .groupBy("l_returnflag", "x")
        .agg(F.sum("p").cast("double").alias("y"))
    )
    # Hash each DAY once (|days| md5 calls), sample a pair iff
    # (h1 + h2) % MOD == 0 — uniform over pairs, deterministic, and the
    # 9.4M-candidate filter is one add+mod per pair instead of an md5
    # (the first registration md5'd every candidate pair inside the
    # |flags|-parallel join stage: 11.4s; this shape is ~2s).
    hashed = base.withColumn(
        "h",
        hash60(
            F.concat_ws(
                ":", F.lit("ts"), F.col("l_returnflag"),
                F.col("x").cast("string"),
            )
        ),
    )
    a = hashed.select(
        "l_returnflag", F.col("x").alias("x1"), F.col("y").alias("y1"),
        F.col("h").alias("h1"),
    )
    b = hashed.select(
        "l_returnflag", F.col("x").alias("x2"), F.col("y").alias("y2"),
        F.col("h").alias("h2"),
    )
    # Salt the 3-key self-join (guide §2.5): parallelism of a join keyed
    # on l_returnflag alone is |flags| = 3 tasks evaluating ~9.4M
    # candidate pairs serially (profiled r11: ~2.6 s/task). Salting the
    # a-side on the deterministic day index and replicating the tiny
    # b-side 16x spreads the candidate evaluation over 48 key groups;
    # every (x1, x2) pair still meets exactly once, at salt = x1 % 16.
    _TS_SALTS = 16
    a_s = a.withColumn(
        "__salt", F.pmod(F.col("x1"), F.lit(_TS_SALTS)).cast("int")
    )
    b_s = b.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(_TS_SALTS - 1)))
    )
    pairs = (
        a_s.join(b_s, ["l_returnflag", "__salt"])
        .where(F.col("x1") < F.col("x2"))
        .where(
            F.pmod(F.col("h1") + F.col("h2"), F.lit(_TS_SAMPLE_MOD)) == 0
        )
        .drop("__salt")
    )
    # The equi-join's parallelism is |flags|; re-spread the sampled
    # pairs before the slope/median stage (the cosine_neardup rule).
    pairs = pairs.repartition(
        pairs.sparkSession.sparkContext.defaultParallelism,
        F.col("x1"),
        F.col("x2"),
    )
    slopes = pairs.select(
        "l_returnflag",
        (
            (F.col("y2") - F.col("y1"))
            / (F.col("x2") - F.col("x1")).cast("double")
        ).alias("slope"),
        F.when(F.col("y2") > F.col("y1"), 1)
        .when(F.col("y2") < F.col("y1"), -1)
        .otherwise(0)
        .alias("sgn"),
    ).persist()
    med = exact_grouped_percentiles(
        slopes, "l_returnflag", "slope", {"ts_slope": 0.5}
    ).select("l_returnflag", "ts_slope")
    mk = slopes.groupBy("l_returnflag").agg(
        F.count("*").alias("n_pairs"),
        F.sum("sgn").cast("long").alias("mk_s"),
    )
    return mk.join(med, "l_returnflag").select(
        "l_returnflag",
        "n_pairs",
        "mk_s",
        F.round("ts_slope", 9).alias("ts_slope"),
    )


Q171_SQL = f"""
WITH base AS (
    SELECT l_returnflag,
           CAST(l_shipdate AS DATE) - DATE '{_TS_EPOCH}' AS x,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2))) AS DOUBLE) AS y
    FROM lineitem GROUP BY 1, CAST(l_shipdate AS DATE)
),
hashed AS (
    SELECT *, {hash60_sql("'ts:' || l_returnflag || ':' || CAST(x AS VARCHAR)")} AS h
    FROM base
),
pairs AS (
    SELECT a.l_returnflag, a.x AS x1, b.x AS x2, a.y AS y1, b.y AS y2
    FROM hashed a JOIN hashed b
      ON a.l_returnflag = b.l_returnflag AND a.x < b.x
    WHERE (a.h + b.h) % {_TS_SAMPLE_MOD} = 0
),
slopes AS (
    SELECT l_returnflag,
           (y2 - y1) / CAST(x2 - x1 AS DOUBLE) AS slope,
           CASE WHEN y2 > y1 THEN 1 WHEN y2 < y1 THEN -1 ELSE 0 END AS sgn
    FROM pairs
)
SELECT l_returnflag,
       COUNT(*) AS n_pairs,
       CAST(SUM(sgn) AS BIGINT) AS mk_s,
       round(quantile_cont(slope, 0.5), 9) AS ts_slope
FROM slopes
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Q172 — CUSUM changepoint detection on the daily revenue series: the
# day t maximizing |Σ_{i<=t}(y_i − ȳ)| — the classical single-
# changepoint location statistic — per return flag. Made EXACT by
# clearing denominators: the statistic's numerator N_t = n·P_t − t·S
# (P_t = prefix sum of revenue in integer cents, S = total cents) is
# pure int64 arithmetic, so the argmax can never be flipped by float
# accumulation — and integer window sums are accumulation-order-safe,
# dodging the segment-tree-vs-running-frame trap that makes double
# cumsums engine-specific (the q140 lesson). One daily agg, one
# per-flag 1-row broadcast, one ordered window over the BOUNDED daily
# series, one argmax row_number.
# ---------------------------------------------------------------------------


def q172_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    base = (
        li.select(
            "l_returnflag",
            F.to_date("l_shipdate").alias("d"),
            F.col("l_extendedprice").cast("decimal(38,2)").alias("p"),
        )
        .groupBy("l_returnflag", "d")
        .agg((F.sum("p") * 100).cast("long").alias("cents"))
    )
    tot = base.groupBy("l_returnflag").agg(
        F.count("*").alias("n"), F.sum("cents").alias("s")
    )
    w = Window.partitionBy("l_returnflag").orderBy("d")
    cum = (
        base.join(F.broadcast(tot), "l_returnflag")
        .withColumn("pt", F.sum("cents").over(w))
        .withColumn("t", F.row_number().over(w))
        .withColumn(
            "n_t", F.col("n") * F.col("pt") - F.col("t") * F.col("s")
        )
    )
    pick = Window.partitionBy("l_returnflag").orderBy(
        F.abs(F.col("n_t")).desc(), F.col("d")
    )
    return (
        cum.withColumn("rn", F.row_number().over(pick))
        .where(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("d").alias("changepoint_day"),
            F.col("n").cast("long").alias("n_days"),
            F.abs(F.col("n_t")).cast("long").alias("cusum_numer"),
            F.round(
                F.abs(F.col("n_t")).cast("double")
                / F.col("n").cast("double")
                / F.lit(100.0),
                9,
            ).alias("cusum_stat"),
        )
    )


Q172_SQL = """
WITH base AS (
    SELECT l_returnflag, CAST(l_shipdate AS DATE) AS d,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2))) * 100 AS BIGINT)
               AS cents
    FROM lineitem GROUP BY 1, 2
),
tot AS (
    SELECT l_returnflag, COUNT(*) AS n, SUM(cents) AS s
    FROM base GROUP BY 1
),
cum AS (
    SELECT base.l_returnflag, base.d, tot.n,
           tot.n * SUM(base.cents) OVER (
               PARTITION BY base.l_returnflag ORDER BY base.d
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) - ROW_NUMBER() OVER (
               PARTITION BY base.l_returnflag ORDER BY base.d
           ) * tot.s AS n_t
    FROM base JOIN tot USING (l_returnflag)
)
SELECT l_returnflag, d AS changepoint_day,
       CAST(n AS BIGINT) AS n_days,
       CAST(ABS(n_t) AS BIGINT) AS cusum_numer,
       round(CAST(ABS(n_t) AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 9)
           AS cusum_stat
FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY l_returnflag ORDER BY ABS(n_t) DESC, d
    ) AS rn
    FROM cum
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Q179 — EXACT distributed SPEARMAN rank correlation (l_quantity vs
# l_discount per return flag): rho = Pearson over average ranks, with
# the ranks coming from the q45 value-counts frame — avg rank of a tied
# value = cum_start + (cnt+1)/2, computed per DISTINCT value (domains
# here are ~50 and ~11 values), broadcast back, doubled into integers
# (denominator 2 cleared) so every moment is an exact int64 sum. The
# classical rank-correlation estimator with no global sort, no pair
# enumeration, and a fixed-IEEE final chain (the q79 recipe on ranks).
# ---------------------------------------------------------------------------


def _rank_map(df, group_col: str, value_col: str, out: str):
    """Per (group, distinct value): DOUBLED average rank (exact int)."""
    counts = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(group_col, value_col)
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy(group_col).orderBy(value_col)
    return (
        counts.withColumn("cum_end", F.sum("cnt").over(w))
        .select(
            group_col,
            value_col,
            # doubled avg rank: 2*(cum_start + (cnt+1)/2) = 2*cum_end - cnt + 1
            (F.lit(2) * F.col("cum_end") - F.col("cnt") + 1)
            .cast("long")
            .alias(out),
        )
    )


def q179_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("double").alias("x"),
        F.col("l_discount").cast("double").alias("y"),
    )
    rx = _rank_map(li, "l_returnflag", "x", "rx")
    ry = _rank_map(li, "l_returnflag", "y", "ry")
    ranked = li.join(F.broadcast(rx), ["l_returnflag", "x"]).join(
        F.broadcast(ry), ["l_returnflag", "y"]
    )
    # Product terms are < 2^63 per element (rx <= 2n), but their SUMS
    # pass int64 around n ~ 1e9 rows — accumulate in DECIMAL(38,0)
    # (exact, like DuckDB's BIGINT->HUGEINT sums) and round to double
    # once, the dec_sum contract.
    d = "decimal(38,0)"
    mom = ranked.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(F.col("rx").cast(d)).cast("double").alias("sx"),
        F.sum(F.col("ry").cast(d)).cast("double").alias("sy"),
        F.sum((F.col("rx") * F.col("rx")).cast(d)).cast("double").alias("sxx"),
        F.sum((F.col("ry") * F.col("ry")).cast(d)).cast("double").alias("syy"),
        F.sum((F.col("rx") * F.col("ry")).cast(d)).cast("double").alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    ) * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    return mom.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n_rows"),
        F.round(num / F.nullif(den, F.lit(0.0)), 9).alias("spearman_rho"),
    )


Q179_SQL = """
WITH pts AS (
    SELECT l_returnflag, CAST(l_quantity AS DOUBLE) AS x,
           CAST(l_discount AS DOUBLE) AS y
    FROM lineitem
),
cx AS (
    SELECT l_returnflag, x, COUNT(*) AS cnt FROM pts
    WHERE x IS NOT NULL GROUP BY 1, 2
),
rx AS (
    SELECT l_returnflag, x,
           CAST(2 * SUM(cnt) OVER (
               PARTITION BY l_returnflag ORDER BY x
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) - cnt + 1 AS BIGINT) AS rx
    FROM cx
),
cy AS (
    SELECT l_returnflag, y, COUNT(*) AS cnt FROM pts
    WHERE y IS NOT NULL GROUP BY 1, 2
),
ry AS (
    SELECT l_returnflag, y,
           CAST(2 * SUM(cnt) OVER (
               PARTITION BY l_returnflag ORDER BY y
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) - cnt + 1 AS BIGINT) AS ry
    FROM cy
),
ranked AS (
    SELECT p.l_returnflag, rx.rx, ry.ry
    FROM pts p
    JOIN rx ON rx.l_returnflag = p.l_returnflag AND rx.x = p.x
    JOIN ry ON ry.l_returnflag = p.l_returnflag AND ry.y = p.y
),
mom AS (
    SELECT l_returnflag,
           CAST(COUNT(*) AS DOUBLE) AS n,
           CAST(SUM(rx) AS DOUBLE) AS sx,
           CAST(SUM(ry) AS DOUBLE) AS sy,
           CAST(SUM(rx * rx) AS DOUBLE) AS sxx,
           CAST(SUM(ry * ry) AS DOUBLE) AS syy,
           CAST(SUM(rx * ry) AS DOUBLE) AS sxy
    FROM ranked GROUP BY 1
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
       round((n * sxy - sx * sy)
             / NULLIF(sqrt(n * sxx - sx * sx)
                      * sqrt(n * syy - sy * sy), 0.0), 9) AS spearman_rho
FROM mom
"""


# ---------------------------------------------------------------------------
# Q180 — percentile-rank (CDF) TRANSFORM, the cume_dist semantics
# WITHOUT a window over the data: cume_dist(v) = (# rows <= v)/n comes
# straight from the value-counts frame (cum_end / n per DISTINCT
# value — ~50 quantity values per flag), broadcast back onto rows. The
# oracle deliberately uses DuckDB's NATIVE cume_dist() window so the
# distributed formulation is proven equivalent to the built-in
# semantics (the q45 proof pattern, applied to ranking). A full
# per-group sort window would single-thread each group at 100 TB; this
# shape is one distinct-value agg + a broadcast join.
# ---------------------------------------------------------------------------


def q180_percentile_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("double").alias("qty"),
    )
    counts = (
        li.groupBy("l_returnflag", "qty").agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("l_returnflag").orderBy("qty")
    wg = Window.partitionBy("l_returnflag")
    cdf = (
        counts.withColumn("cum_end", F.sum("cnt").over(w))
        .withColumn("n", F.sum("cnt").over(wg))
        .select(
            "l_returnflag",
            "qty",
            (F.col("cum_end").cast("double") / F.col("n").cast("double"))
            .alias("pct_rank"),
        )
    )
    return li.join(F.broadcast(cdf), ["l_returnflag", "qty"]).select(
        "l_returnflag",
        "l_orderkey",
        "l_linenumber",
        F.col("qty").alias("l_quantity"),
        F.round("pct_rank", 9).alias("pct_rank"),
    )


Q180_SQL = """
SELECT l_returnflag, l_orderkey, l_linenumber,
       CAST(l_quantity AS DOUBLE) AS l_quantity,
       round(cume_dist() OVER (
           PARTITION BY l_returnflag ORDER BY CAST(l_quantity AS DOUBLE)
       ), 9) AS pct_rank
FROM lineitem
"""


# ---------------------------------------------------------------------------
# Q203 — Seasonal decomposition of the daily revenue series (the
# classical trend x weekday-seasonality x residual split, multiplicative
# form): per l_returnflag, trend = centered 7-day moving average,
# weekday index = mean detrended ratio, normalized so the 7 indices
# average to 1, residual = actual − trend·seasonal. The q171/q173
# primitives composed into the full decomposition a forecasting pipeline
# consumes.
#
# Determinism discipline (every mean is a mean of DOUBLES, which a
# group agg would sum in nondeterministic order): the series is integer
# CENTS (q172's recipe); the frame sum is exact ints in deterministic
# frame order; each detrended ratio is (cents·frame_n)/frame_cents —
# one division of exact ints; ratios enter the weekday mean through the
# pagerank FLOOR·1e12 grid (integer sums, order-free); normalization is
# s_q·7/Σs_q — again exact ints. The only remaining float ops are
# single divisions/products mirrored expression-for-expression in the
# oracle, so the whole decomposition hash-matches.
# ---------------------------------------------------------------------------


def q203_seasonal_decomposition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    daily = (
        li.select(
            "l_returnflag",
            F.to_date("l_shipdate").alias("d"),
            F.col("l_extendedprice").cast("decimal(38,2)").alias("p"),
        )
        .groupBy("l_returnflag", "d")
        .agg((F.sum("p") * 100).cast("long").alias("cents"))
    )
    fw = (
        Window.partitionBy("l_returnflag")
        .orderBy("d")
        .rowsBetween(-3, 3)
    )
    trended = daily.withColumn(
        "f_cents", F.sum("cents").over(fw)
    ).withColumn("f_n", F.count("*").over(fw))
    # Detrended ratio as ONE division of exact ints, then onto the
    # 1e12 floor grid for the order-free weekday mean.
    trended = trended.withColumn(
        "r_q",
        F.floor(
            (F.col("cents") * F.col("f_n")).cast("double")
            / F.col("f_cents").cast("double")
            * F.lit(1e12)
        ).cast("long"),
    ).withColumn("wd", F.dayofweek("d"))
    wd_idx = trended.groupBy("l_returnflag", "wd").agg(
        F.sum("r_q").alias("a"), F.count("*").alias("b")
    )
    # s_wd = a/b on the 1e6 grid; normalized s_q*7/Σs_q — exact ints.
    wd_idx = wd_idx.withColumn(
        "s_q",
        F.floor(
            F.col("a").cast("double") / F.col("b").cast("double") / F.lit(1e6)
        ).cast("long"),
    )
    norm = wd_idx.groupBy("l_returnflag").agg(
        F.sum("s_q").alias("sum_sq")
    )
    seasonal = (
        wd_idx.join(F.broadcast(norm), "l_returnflag")
        .select(
            "l_returnflag",
            "wd",
            (
                (F.col("s_q") * 7).cast("double")
                / F.col("sum_sq").cast("double")
            ).alias("seasonal"),
        )
    )
    out = trended.join(seasonal, ["l_returnflag", "wd"]).select(
        "l_returnflag",
        "d",
        F.col("cents"),
        (
            F.col("f_cents").cast("double")
            / (F.col("f_n") * 100).cast("double")
        ).alias("trend"),
        "seasonal",
        (
            F.col("cents").cast("double") / F.lit(100.0)
            - (
                F.col("f_cents").cast("double")
                / (F.col("f_n") * 100).cast("double")
            )
            * F.col("seasonal")
        ).alias("residual"),
    )
    # No round(): every output double is produced by an identical
    # fixed-order IEEE expression over exact ints on both engines, so
    # the raw bits already match — round() at 9 dp would REINTRODUCE a
    # cross-engine boundary (HALF_UP vs half-even on repeating-decimal
    # trend values like sum/700).
    return out.orderBy("l_returnflag", "d")


Q203_SQL = """
WITH daily AS (
    SELECT l_returnflag, CAST(l_shipdate AS DATE) AS d,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2))) * 100 AS BIGINT)
             AS cents
    FROM lineitem GROUP BY 1, 2
),
trended AS (
    SELECT l_returnflag, d, cents,
           SUM(cents) OVER w AS f_cents,
           COUNT(*) OVER w AS f_n,
           CAST(FLOOR(CAST(cents * COUNT(*) OVER w AS DOUBLE)
                      / CAST(SUM(cents) OVER w AS DOUBLE) * 1e12) AS BIGINT)
             AS r_q,
           dayofweek(d) + 1 AS wd
    FROM daily
    WINDOW w AS (PARTITION BY l_returnflag ORDER BY d
                 ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
wd_idx AS (
    SELECT l_returnflag, wd,
           CAST(FLOOR(CAST(SUM(r_q) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                      / 1e6) AS BIGINT) AS s_q
    FROM trended GROUP BY 1, 2
),
norm AS (
    SELECT l_returnflag, CAST(SUM(s_q) AS BIGINT) AS sum_sq
    FROM wd_idx GROUP BY 1
),
seasonal AS (
    SELECT wd_idx.l_returnflag, wd,
           CAST(s_q * 7 AS DOUBLE) / CAST(sum_sq AS DOUBLE) AS seasonal
    FROM wd_idx JOIN norm USING (l_returnflag)
)
SELECT t.l_returnflag, t.d, t.cents,
       CAST(f_cents AS DOUBLE) / CAST(f_n * 100 AS DOUBLE) AS trend,
       s.seasonal AS seasonal,
       CAST(cents AS DOUBLE) / 100.0
         - (CAST(f_cents AS DOUBLE) / CAST(f_n * 100 AS DOUBLE))
           * s.seasonal AS residual
FROM trended t
JOIN seasonal s ON s.l_returnflag = t.l_returnflag AND s.wd = t.wd
ORDER BY t.l_returnflag, t.d
"""


# ---------------------------------------------------------------------------
# Q210 — Autocorrelation function (ACF) of the daily revenue series at
# lags 1..7: the diagnostic under every forecasting/seasonality decision
# (q135's linear forecast, q173/q203's weekday seasonality assume the
# structure this query MEASURES). Standard ACF estimator with the global
# mean:  r_k = Σ(x_t-x̄)(x_{t+k}-x̄) / Σ(x_t-x̄)².
#
# Determinism (the q79 recipe, extended to lagged cross-products): the
# series is integer CENTS per day (o_totalprice is a 2-decimal grid, so
# SUM over DECIMAL(38,6) * 100 is exact), every Σxy / Σx / Σx² runs as
# an exact integer-decimal aggregate (order-free), and only the final
# assembly — identical expression text on both engines — is IEEE, then
# rounded to 9 dp. Product ceiling: daily cents ~1e14 at a 100 TB
# corpus → products ~1e28, summed over ~1e5 days → 1e33, inside
# DECIMAL(38,0)/HUGEINT headroom.
#
# Scale shape: one keyed day agg (map-side combined), one lag window
# over the CALENDAR-BOUNDED daily frame (~365 rows/year — never over
# orders), a 7-struct explode of that frame, one 7-row agg, one 1-row
# global-stats broadcast.
# ---------------------------------------------------------------------------

ACF_MAX_LAG = 7


def q210_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(38,6)")) * 100)
        .cast("decimal(38,0)")
        .cast("long")
        .alias("x")
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        "x",
        *[F.lag("x", k).over(w).alias(f"l{k}") for k in range(1, ACF_MAX_LAG + 1)],
    )
    pairs = (
        lagged.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(k).alias("lag"),
                            F.col("x").alias("xv"),
                            F.col(f"l{k}").alias("yv"),
                        )
                        for k in range(1, ACF_MAX_LAG + 1)
                    ]
                )
            ).alias("p")
        )
        .select("p.*")
        .where(F.col("yv").isNotNull())
    )
    dec19 = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    per = pairs.groupBy("lag").agg(
        F.count("*").cast("double").alias("n_k"),
        F.sum(dec19("xv") * dec19("yv")).cast("double").alias("sxy"),
        F.sum(dec19("xv")).cast("double").alias("sx"),
        F.sum(dec19("yv")).cast("double").alias("sy"),
    )
    stats = daily.agg(
        F.count("*").cast("double").alias("n"),
        F.sum(dec19("x")).cast("double").alias("s"),
        F.sum(dec19("x") * dec19("x")).cast("double").alias("ss"),
    )
    joined = per.crossJoin(F.broadcast(stats))
    mean = F.col("s") / F.col("n")
    num = (
        F.col("sxy")
        - mean * (F.col("sx") + F.col("sy"))
        + F.col("n_k") * mean * mean
    )
    den = F.col("ss") - F.col("n") * mean * mean
    return joined.select(
        "lag",
        F.col("n_k").cast("long").alias("n_pairs"),
        F.round(num / den, 9).alias("acf"),
    ).orderBy("lag")


def _acf_oracle() -> str:
    lag_selects = " UNION ALL ".join(
        f"SELECT {k} AS lag, x AS xv, l{k} AS yv FROM lagged WHERE l{k} IS NOT NULL"
        for k in range(1, ACF_MAX_LAG + 1)
    )
    lag_cols = ", ".join(
        f"LAG(x, {k}) OVER (ORDER BY day) AS l{k}"
        for k in range(1, ACF_MAX_LAG + 1)
    )
    return f"""
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) * 100
                     AS DECIMAL(38,0)) AS BIGINT) AS x
    FROM orders GROUP BY 1
),
lagged AS (SELECT x, {lag_cols} FROM daily),
pairs AS ({lag_selects}),
per AS (
    SELECT lag,
           CAST(COUNT(*) AS DOUBLE) AS n_k,
           CAST(SUM(CAST(xv AS HUGEINT) * CAST(yv AS HUGEINT)) AS DOUBLE) AS sxy,
           CAST(SUM(CAST(xv AS HUGEINT)) AS DOUBLE) AS sx,
           CAST(SUM(CAST(yv AS HUGEINT)) AS DOUBLE) AS sy
    FROM pairs GROUP BY lag
),
stats AS (
    SELECT CAST(COUNT(*) AS DOUBLE) AS n,
           CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS s,
           CAST(SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS DOUBLE) AS ss
    FROM daily
)
SELECT lag, CAST(n_k AS BIGINT) AS n_pairs,
       round((sxy - (s / n) * (sx + sy) + n_k * (s / n) * (s / n))
             / (ss - n * (s / n) * (s / n)), 9) AS acf
FROM per, stats
ORDER BY lag
"""


Q210_SQL = _acf_oracle()


# ---------------------------------------------------------------------------
# Q261 — KENDALL'S τ-b rank correlation per return flag: does daily
# revenue move with daily quantity? τ-b counts CONCORDANT vs DISCORDANT
# day pairs with the standard tie correction
# τ_b = (C − D) / (√(n₀−T_x)·√(n₀−T_y)) — the rank-correlation sibling
# of q179's Spearman ρ with a fundamentally different estimator (pair
# orientation, not rank moments): τ is the one with the direct
# probabilistic reading P(concordant) − P(discordant) and is the robust
# choice under heavy ties. ALL counts are exact int64 from one pair
# join; the three-operation double chain at the end is identical IEEE
# on both engines. Pair volume is |days|² per group — the DAILY series
# grows with time, not data volume (the q171 adjudication verbatim), so
# the pair stage is metadata-scale at any corpus size; the raw scan
# reduces in the first keyed agg.
# ---------------------------------------------------------------------------


def q261_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    daily = (
        li.groupBy(
            "l_returnflag", F.col("l_shipdate").cast("date").alias("day")
        )
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast(
                    "long"
                )
            ).alias("x"),
            F.sum(F.col("l_quantity").cast("long")).alias("y"),
        )
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_returnflag") == F.col("b.l_returnflag"))
        & (F.col("a.day") < F.col("b.day")),
    )
    dx = F.col("b.x") - F.col("a.x")
    dy = F.col("b.y") - F.col("a.y")
    counts = pairs.groupBy(
        F.col("a.l_returnflag").alias("l_returnflag")
    ).agg(
        F.count("*").alias("n0"),
        F.sum(
            ((dx > 0) & (dy > 0) | (dx < 0) & (dy < 0)).cast("long")
        ).alias("c"),
        F.sum(
            ((dx > 0) & (dy < 0) | (dx < 0) & (dy > 0)).cast("long")
        ).alias("d"),
        F.sum((dx == 0).cast("long")).alias("tx"),
        F.sum((dy == 0).cast("long")).alias("ty"),
    )
    tau = (F.col("c") - F.col("d")).cast("double") / (
        F.sqrt((F.col("n0") - F.col("tx")).cast("double"))
        * F.sqrt((F.col("n0") - F.col("ty")).cast("double"))
    )
    return counts.select(
        "l_returnflag",
        F.col("n0").cast("long").alias("n_pairs"),
        F.col("c").cast("long").alias("concordant"),
        F.col("d").cast("long").alias("discordant"),
        F.round(tau, 9).alias("tau_b"),
    ).orderBy("l_returnflag")


Q261_SQL = """
WITH daily AS (
    SELECT l_returnflag, CAST(l_shipdate AS DATE) AS day,
           SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS x,
           SUM(CAST(l_quantity AS BIGINT)) AS y
    FROM lineitem GROUP BY 1, 2
),
pairs AS (
    SELECT a.l_returnflag, b.x - a.x AS dx, b.y - a.y AS dy
    FROM daily a
    JOIN daily b ON a.l_returnflag = b.l_returnflag AND a.day < b.day
),
counts AS (
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n0,
           CAST(SUM(CASE WHEN (dx > 0 AND dy > 0) OR (dx < 0 AND dy < 0)
                         THEN 1 ELSE 0 END) AS BIGINT) AS c,
           CAST(SUM(CASE WHEN (dx > 0 AND dy < 0) OR (dx < 0 AND dy > 0)
                         THEN 1 ELSE 0 END) AS BIGINT) AS d,
           CAST(SUM(CASE WHEN dx = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tx,
           CAST(SUM(CASE WHEN dy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ty
    FROM pairs GROUP BY 1
)
SELECT l_returnflag, n0 AS n_pairs, c AS concordant, d AS discordant,
       round(CAST(c - d AS DOUBLE)
             / (sqrt(CAST(n0 - tx AS DOUBLE))
                * sqrt(CAST(n0 - ty AS DOUBLE))), 9) AS tau_b
FROM counts
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Q269 — CONSISTENT-HASH REBALANCE REPORT: what fraction of documents
# moves shards when the fleet grows 16 → 17, under (a) naive mod-hash
# placement and (b) a consistent-hash ring with 64 virtual nodes per
# shard. The capacity-planning number every sharded store needs: mod
# placement moves ~N/(N+1) ≈ 94 % of all keys on a single-node add;
# the ring moves ~1/(N+1) ≈ 6 % — this query measures both exactly on
# the engine's cross-engine md5 hash60.
#
# Plan: the two rings are 1024/1088-row frames packed into ONE sorted
# array-of-structs row each and broadcast (the q151 packed-centroid
# pattern) — per doc, the assigned vnode is the first array element
# with pos ≥ h (wrap → element 1), a JVM-side higher-order filter; no
# join explosion, one scan, one final 2-row unpivot.
# ---------------------------------------------------------------------------

_RING_SHARDS = 16
_RING_VNODES = 64


def _ring_packed(spark: SparkSession, n_shards: int, out: str) -> DataFrame:
    """One row: ``out`` = array<struct<pos,shard>> sorted by pos."""
    vn = spark.range(n_shards * _RING_VNODES).select(
        (F.col("id") / _RING_VNODES).cast("int").alias("shard"),
        (F.col("id") % _RING_VNODES).cast("int").alias("v"),
    )
    pos = hash60(F.concat_ws(":", F.lit("vn"), F.col("shard"), F.col("v")))
    return vn.select(pos.alias("pos"), "shard").groupBy().agg(
        F.sort_array(F.collect_list(F.struct("pos", "shard"))).alias(out)
    )


def q269_shard_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    rings = _ring_packed(spark, _RING_SHARDS, "ring_a").crossJoin(
        _ring_packed(spark, _RING_SHARDS + 1, "ring_b")
    )
    h = hash60(F.concat(F.lit("doc:"), F.col("doc_id")))

    def assign(ring: str) -> F.Column:
        hit = F.element_at(
            F.filter(F.col(ring), lambda x: x["pos"] >= F.col("h")), 1
        )
        return F.coalesce(hit, F.element_at(F.col(ring), 1))["shard"]

    per_doc = (
        docs.select(h.alias("h"))
        .crossJoin(F.broadcast(rings))
        .select(
            ((F.col("h") % _RING_SHARDS)
             != (F.col("h") % (_RING_SHARDS + 1))).cast("int").alias("mv_mod"),
            (assign("ring_a") != assign("ring_b")).cast("int").alias("mv_ring"),
        )
    )
    totals = per_doc.groupBy().agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("mv_mod").cast("long").alias("moved_mod"),
        F.sum("mv_ring").cast("long").alias("moved_ring"),
    )
    return (
        totals.selectExpr(
            "n_docs",
            "stack(2, 'mod', moved_mod, 'ring', moved_ring)"
            " AS (scheme, n_moved)",
        )
        .selectExpr(
            "scheme",
            "n_docs",
            "CAST(n_moved AS BIGINT) AS n_moved",
            "CAST(n_moved * 1000000 DIV n_docs AS BIGINT) AS moved_ppm",
        )
        .orderBy("scheme")
    )


Q269_SQL = f"""
WITH vn AS (
    SELECT CAST(s.i AS INT) AS shard, CAST(v.i AS INT) AS v
    FROM range(0, {_RING_SHARDS + 1}) s(i), range(0, {_RING_VNODES}) v(i)
),
ring AS (
    SELECT shard, v,
           CAST(('0x' || substr(md5('vn:' || shard || ':' || v), 1, 15))
                AS BIGINT) AS pos
    FROM vn
),
docs AS (
    SELECT doc_id,
           CAST(('0x' || substr(md5('doc:' || doc_id), 1, 15)) AS BIGINT) AS h
    FROM documents
),
asg AS (
    SELECT d.doc_id, d.h,
           COALESCE(arg_min(r.shard, r.pos)
                        FILTER (WHERE r.pos >= d.h
                                  AND r.shard < {_RING_SHARDS}),
                    arg_min(r.shard, r.pos)
                        FILTER (WHERE r.shard < {_RING_SHARDS})) AS shard_a,
           COALESCE(arg_min(r.shard, r.pos) FILTER (WHERE r.pos >= d.h),
                    arg_min(r.shard, r.pos)) AS shard_b
    FROM docs d CROSS JOIN ring r
    GROUP BY d.doc_id, d.h
),
moved AS (
    SELECT COUNT(*) AS n_docs,
           SUM(CASE WHEN h % {_RING_SHARDS} <> h % {_RING_SHARDS + 1}
                    THEN 1 ELSE 0 END) AS moved_mod,
           SUM(CASE WHEN shard_a <> shard_b THEN 1 ELSE 0 END) AS moved_ring
    FROM asg
)
SELECT scheme, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_moved AS BIGINT) AS n_moved,
       CAST(n_moved * 1000000 // n_docs AS BIGINT) AS moved_ppm
FROM (
    SELECT n_docs, 'mod' AS scheme, moved_mod AS n_moved FROM moved
    UNION ALL
    SELECT n_docs, 'ring' AS scheme, moved_ring AS n_moved FROM moved
)
ORDER BY scheme
"""


# ---------------------------------------------------------------------------
# Q297 — χ² INDEPENDENCE TEST (weekday × order priority): is order
# priority independent of the day of week? The contingency-table
# independence check (q90's drift χ² compares two snapshots of ONE
# variable; this tests association BETWEEN two variables). Per cell,
# the exact contribution 1e6·(o·N − r·c)² / (N·r·c) is computed on
# HUGEINT/DECIMAL(38) (int64 overflows at the x4 probe) with per-cell
# truncation — the declared cross-engine semantics — and rolled up per
# weekday with the cell count (dof = (R−1)(C−1) reconstructible).
#
# Plan: one contingency agg + two marginal aggs joined back (weekday
# marginal broadcast, priority marginal broadcast, 1-row N anchor).
# ---------------------------------------------------------------------------


def q297_independence_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        F.dayofweek(F.col("o_orderdate")).alias("weekday"),
        F.col("o_orderpriority").alias("prio"),
    )
    obs = base.groupBy("weekday", "prio").agg(F.count("*").alias("o"))
    row_m = obs.groupBy("weekday").agg(F.sum("o").alias("r"))
    col_m = obs.groupBy("prio").agg(F.sum("o").alias("c"))
    n = obs.groupBy().agg(F.sum("o").alias("nn"))
    d38 = "DECIMAL(38,0)"
    cells = (
        obs.join(F.broadcast(row_m), "weekday")
        .join(F.broadcast(col_m), "prio")
        .crossJoin(F.broadcast(n))
        .selectExpr(
            "weekday",
            f"CAST(o AS {d38}) AS o",
            f"CAST(r AS {d38}) AS r",
            f"CAST(c AS {d38}) AS c",
            f"CAST(nn AS {d38}) AS nn",
        )
        .selectExpr(
            "weekday",
            "CAST(1000000 * (o * nn - r * c) * (o * nn - r * c)"
            " DIV (nn * r * c) AS BIGINT) AS contrib_micro",
        )
    )
    return (
        cells.groupBy("weekday")
        .agg(
            F.count("*").cast("long").alias("n_cells"),
            F.sum("contrib_micro").cast("long").alias("chi2_micro"),
        )
        .orderBy("weekday")
    )


Q297_SQL = """
WITH base AS (
    SELECT dayofweek(CAST(o_orderdate AS DATE)) + 1 AS weekday,
           o_orderpriority AS prio
    FROM orders
),
obs AS (SELECT weekday, prio, COUNT(*) AS o FROM base GROUP BY 1, 2),
row_m AS (SELECT weekday, SUM(o) AS r FROM obs GROUP BY 1),
col_m AS (SELECT prio, SUM(o) AS c FROM obs GROUP BY 1),
n AS (SELECT SUM(o) AS nn FROM obs),
cells AS (
    SELECT obs.weekday,
           CAST(1000000 * (CAST(obs.o AS HUGEINT) * nn - r * c)
                        * (CAST(obs.o AS HUGEINT) * nn - r * c)
                // (CAST(nn AS HUGEINT) * r * c) AS BIGINT) AS contrib_micro
    FROM obs
    JOIN row_m USING (weekday)
    JOIN col_m USING (prio)
    CROSS JOIN n
)
SELECT weekday,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(contrib_micro) AS BIGINT) AS chi2_micro
FROM cells
GROUP BY weekday
ORDER BY weekday
"""


# ---------------------------------------------------------------------------
# Q326 — Exact heavy hitters at bounded memory (Misra–Gries candidates +
# exact recount, operators/sketch.py:misra_gries_candidates). The scale
# story CMS (q95) can't give: q95 estimates ALL keys with overcounts, this
# returns the EXACT answer for the keys that matter (count ≥ N/k) while
# keeping per-partition state ≤ k counters — a groupBy over the full key
# space never happens on the sketch pass, and the recount pass aggregates
# only the ≤ k·partitions surviving candidates. The oracle is the plain
# HAVING query: MG candidates are a guaranteed superset of the true heavy
# hitters (Agarwal et al., TODS 2013 mergeability), so the recount filter
# makes the composition's output independent of partitioning/arrival order.
# ---------------------------------------------------------------------------

_HH_K = 128


def q326_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import heavy_hitters_exact

    ev = load_table(spark, sf_dir, "events")
    return heavy_hitters_exact(ev, "user_id", k=_HH_K).orderBy(
        F.col("cnt").desc(), "user_id"
    )


Q326_SQL = f"""
WITH n AS (SELECT COUNT(*) AS nn FROM events),
c AS (
    SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id
)
SELECT user_id, CAST(cnt AS BIGINT) AS cnt,
       CAST(cnt * 1000 // nn AS BIGINT) AS share_milli
FROM c, n
WHERE cnt * {_HH_K} >= nn
ORDER BY cnt DESC, user_id
"""




# ---------------------------------------------------------------------------
# Q336 — Deterministic HyperLogLog distinct-count (operators/sketch.py:
# hll_registers/hll_estimate). Completes the mergeable-summaries trio:
# CMS (q95, frequency), Misra-Gries (q326, heavy hitters), HLL (q336,
# cardinality). q46 already shows Spark's HLL++ against the exact count,
# but a JVM-internal sketch cannot carry a value oracle; this HLL runs
# on the shared md5 hash family with an exact-integer rho ladder and an
# integer-arithmetic estimate, so registers AND estimate hash-match
# DuckDB bit-for-bit. Output per event_type: registers used, the raw
# integer estimate, the exact distinct count, and the signed error ppm
# (both engines truncate integer division toward zero — verified).
#
# Scale: the sketch pass shuffles at most |groups|·64 register cells
# after map-side partial MAX — cardinality-independent state, the whole
# point; the exact side (for the audit) is the expensive full
# countDistinct the sketch replaces at 100 TB.
# ---------------------------------------------------------------------------


def q336_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import hll_estimate, hll_registers

    ev = load_table(spark, sf_dir, "events")
    est = hll_estimate(
        hll_registers(ev, "event_type", "user_id")
    ).withColumnRenamed("grp", "event_type")
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_distinct")
    )
    return (
        est.join(exact, "event_type")
        .selectExpr(
            "event_type",
            "CAST(n_used AS BIGINT) AS n_used",
            "est",
            "exact_distinct",
            "CAST((est - exact_distinct) * 1000000 DIV exact_distinct"
            " AS BIGINT) AS err_ppm",
        )
        .orderBy("event_type")
    )


Q336_SQL = """
WITH h AS (
    SELECT event_type, CAST(('0x' || substr(md5('hll:' || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h FROM events
),
b AS (
    SELECT event_type, CAST(h % 64 AS INT) AS bucket,
           h // 64 AS w
    FROM h
),
regs AS (
    SELECT event_type, bucket, MAX(CASE WHEN w >= 9007199254740992 THEN 1 WHEN w >= 4503599627370496 THEN 2 WHEN w >= 2251799813685248 THEN 3 WHEN w >= 1125899906842624 THEN 4 WHEN w >= 562949953421312 THEN 5 WHEN w >= 281474976710656 THEN 6 WHEN w >= 140737488355328 THEN 7 WHEN w >= 70368744177664 THEN 8 WHEN w >= 35184372088832 THEN 9 WHEN w >= 17592186044416 THEN 10 WHEN w >= 8796093022208 THEN 11 WHEN w >= 4398046511104 THEN 12 WHEN w >= 2199023255552 THEN 13 WHEN w >= 1099511627776 THEN 14 WHEN w >= 549755813888 THEN 15 WHEN w >= 274877906944 THEN 16 WHEN w >= 137438953472 THEN 17 WHEN w >= 68719476736 THEN 18 WHEN w >= 34359738368 THEN 19 WHEN w >= 17179869184 THEN 20 WHEN w >= 8589934592 THEN 21 WHEN w >= 4294967296 THEN 22 WHEN w >= 2147483648 THEN 23 WHEN w >= 1073741824 THEN 24 WHEN w >= 536870912 THEN 25 WHEN w >= 268435456 THEN 26 WHEN w >= 134217728 THEN 27 WHEN w >= 67108864 THEN 28 WHEN w >= 33554432 THEN 29 WHEN w >= 16777216 THEN 30 WHEN w >= 8388608 THEN 31 WHEN w >= 4194304 THEN 32 WHEN w >= 2097152 THEN 33 WHEN w >= 1048576 THEN 34 WHEN w >= 524288 THEN 35 WHEN w >= 262144 THEN 36 WHEN w >= 131072 THEN 37 WHEN w >= 65536 THEN 38 WHEN w >= 32768 THEN 39 WHEN w >= 16384 THEN 40 WHEN w >= 8192 THEN 41 WHEN w >= 4096 THEN 42 WHEN w >= 2048 THEN 43 WHEN w >= 1024 THEN 44 WHEN w >= 512 THEN 45 WHEN w >= 256 THEN 46 WHEN w >= 128 THEN 47 WHEN w >= 64 THEN 48 WHEN w >= 32 THEN 49 WHEN w >= 16 THEN 50 WHEN w >= 8 THEN 51 WHEN w >= 4 THEN 52 WHEN w >= 2 THEN 53 WHEN w >= 1 THEN 54 ELSE 54 END) AS mreg
    FROM b GROUP BY 1, 2
),
folded AS (
    SELECT event_type, COUNT(*) AS n_used,
           SUM(CAST(1 AS BIGINT) << (54 - mreg)) AS s_used
    FROM regs GROUP BY 1
),
est AS (
    SELECT event_type, n_used,
           CAST(CAST(52314966193040288382976 AS HUGEINT) // (1000 * CAST(
               s_used + (64 - n_used)
                        * (CAST(1 AS BIGINT) << 54)
           AS HUGEINT)) AS BIGINT) AS est
    FROM folded
),
ex AS (
    SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
    FROM events GROUP BY 1
)
SELECT est.event_type,
       CAST(n_used AS BIGINT) AS n_used,
       est,
       CAST(exact_distinct AS BIGINT) AS exact_distinct,
       CAST((est - exact_distinct) * 1000000 // exact_distinct AS BIGINT)
           AS err_ppm
FROM est JOIN ex USING (event_type)
ORDER BY est.event_type
"""




# ---------------------------------------------------------------------------
# Q341 — HLL register ROLLUP from the persisted daily store: sketches as
# lake artifacts (sinks/sketch_store.py), completing the
# index-as-artifact family on the sketch side (IVF q318/q322/q332, band
# q323/q330, SimHash q329). Per-day registers are written ONCE at
# ingest (day-partitioned parquet); a range query — here "distinct users
# per event_type over the corpus's last 7 days" — prunes its scan to
# those day partitions and MAX-merges ≤ |groups|·64 cells per day,
# never rescanning raw events. Mergeable-summaries exactness: the merge
# of daily sketches IS the sketch of the union, so the oracle computes
# the q336 register math DIRECTLY on the range-filtered events and the
# hashes must match bit-for-bit. The exact countDistinct rides along as
# the audit (same columns as q336).
# ---------------------------------------------------------------------------

_ROLLUP_DAY_US = 86400000000
_ROLLUP_DAYS = 7


def q341_hll_rollup(
    spark: SparkSession, sf_dir: str, *, verify_store: bool | None = None
) -> DataFrame:
    from ..operators.sketch import hll_estimate, hll_registers
    from ..sinks.sketch_store import (
        hll_store_path,
        load_hll_registers,
        save_hll_registers,
    )

    # Loud-by-default recount audit on the loaded artifact, droppable
    # when the store's meta counter is trusted (round-8 VERDICT item 3:
    # the serve-path cost model is ONE pruned register scan; the O(index)
    # recount is an integrity check, not part of the query). Default ON
    # (tests and the registered query keep the loud path); set
    # SPARK_GRAFT_TRUST_SKETCH_STORE=1 — or pass verify_store=False —
    # for the trusted serve path. Results are identical either way
    # (pinned by tests/test_round9_properties.py).
    if verify_store is None:
        verify_store = (
            os.environ.get("SPARK_GRAFT_TRUST_SKETCH_STORE", "") != "1"
        )

    ev = load_table(spark, sf_dir, "events")
    daily = hll_registers(
        ev.withColumn(
            "day", F.expr(f"unix_micros(ts) div {_ROLLUP_DAY_US}")
        ),
        ("day", "event_type"),
        "user_id",
    )
    path = hll_store_path(sf_dir)
    save_hll_registers(spark, daily, path, meta={"source": sf_dir})
    loaded, meta = load_hll_registers(spark, path)
    if verify_store:
        n_loaded = loaded.count()
        if n_loaded != meta["n_rows"]:
            raise ValueError(
                f"HLL store at {path} failed its recount audit: "
                f"{n_loaded} rows loaded, meta says {meta['n_rows']}"
            )
    # The range anchor stays LAZY (q216 broadcast-anchor pattern): the
    # 1-row max-day frame joins in, so no driver action runs at plan
    # construction (partition pruning on `day` still applies at runtime
    # via dynamic filtering at cluster scale).
    mx = loaded.agg(F.max("day").alias("max_day"))
    recent = loaded.crossJoin(F.broadcast(mx)).where(
        F.col("day") > F.col("max_day") - _ROLLUP_DAYS
    )
    merged = recent.groupBy("event_type", "bucket").agg(
        F.max("mreg").alias("mreg")
    )
    est = hll_estimate(merged, group_cols=("event_type",))
    exact = (
        ev.withColumn(
            "day", F.expr(f"unix_micros(ts) div {_ROLLUP_DAY_US}")
        )
        .crossJoin(F.broadcast(mx))
        .where(F.col("day") > F.col("max_day") - _ROLLUP_DAYS)
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").cast("long").alias("exact_distinct"))
    )
    return (
        est.join(exact, "event_type")
        .selectExpr(
            "event_type",
            "CAST(n_used AS BIGINT) AS n_used",
            "est",
            "exact_distinct",
            "CAST((est - exact_distinct) * 1000000 DIV exact_distinct"
            " AS BIGINT) AS err_ppm",
        )
        .orderBy("event_type")
    )


Q341_SQL = """
WITH d AS (
    SELECT event_type, user_id,
           epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
    FROM events
),
mx AS (SELECT MAX(day) AS max_day FROM d),
recent AS (
    SELECT event_type, user_id FROM d, mx WHERE day > max_day - 7
),
h AS (
    SELECT event_type, CAST(('0x' || substr(md5('hll:' || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h FROM recent
),
b AS (
    SELECT event_type, CAST(h % 64 AS INT) AS bucket,
           h // 64 AS w
    FROM h
),
regs AS (
    SELECT event_type, bucket, MAX(CASE WHEN w >= 9007199254740992 THEN 1 WHEN w >= 4503599627370496 THEN 2 WHEN w >= 2251799813685248 THEN 3 WHEN w >= 1125899906842624 THEN 4 WHEN w >= 562949953421312 THEN 5 WHEN w >= 281474976710656 THEN 6 WHEN w >= 140737488355328 THEN 7 WHEN w >= 70368744177664 THEN 8 WHEN w >= 35184372088832 THEN 9 WHEN w >= 17592186044416 THEN 10 WHEN w >= 8796093022208 THEN 11 WHEN w >= 4398046511104 THEN 12 WHEN w >= 2199023255552 THEN 13 WHEN w >= 1099511627776 THEN 14 WHEN w >= 549755813888 THEN 15 WHEN w >= 274877906944 THEN 16 WHEN w >= 137438953472 THEN 17 WHEN w >= 68719476736 THEN 18 WHEN w >= 34359738368 THEN 19 WHEN w >= 17179869184 THEN 20 WHEN w >= 8589934592 THEN 21 WHEN w >= 4294967296 THEN 22 WHEN w >= 2147483648 THEN 23 WHEN w >= 1073741824 THEN 24 WHEN w >= 536870912 THEN 25 WHEN w >= 268435456 THEN 26 WHEN w >= 134217728 THEN 27 WHEN w >= 67108864 THEN 28 WHEN w >= 33554432 THEN 29 WHEN w >= 16777216 THEN 30 WHEN w >= 8388608 THEN 31 WHEN w >= 4194304 THEN 32 WHEN w >= 2097152 THEN 33 WHEN w >= 1048576 THEN 34 WHEN w >= 524288 THEN 35 WHEN w >= 262144 THEN 36 WHEN w >= 131072 THEN 37 WHEN w >= 65536 THEN 38 WHEN w >= 32768 THEN 39 WHEN w >= 16384 THEN 40 WHEN w >= 8192 THEN 41 WHEN w >= 4096 THEN 42 WHEN w >= 2048 THEN 43 WHEN w >= 1024 THEN 44 WHEN w >= 512 THEN 45 WHEN w >= 256 THEN 46 WHEN w >= 128 THEN 47 WHEN w >= 64 THEN 48 WHEN w >= 32 THEN 49 WHEN w >= 16 THEN 50 WHEN w >= 8 THEN 51 WHEN w >= 4 THEN 52 WHEN w >= 2 THEN 53 WHEN w >= 1 THEN 54 ELSE 54 END) AS mreg
    FROM b GROUP BY 1, 2
),
folded AS (
    SELECT event_type, COUNT(*) AS n_used,
           SUM(CAST(1 AS BIGINT) << (54 - mreg)) AS s_used
    FROM regs GROUP BY 1
),
est AS (
    SELECT event_type, n_used,
           CAST(CAST(52314966193040288382976 AS HUGEINT) // (1000 * CAST(
               s_used + (64 - n_used)
                        * (CAST(1 AS BIGINT) << 54)
           AS HUGEINT)) AS BIGINT) AS est
    FROM folded
),
ex AS (
    SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
    FROM recent GROUP BY 1
)
SELECT est.event_type,
       CAST(n_used AS BIGINT) AS n_used,
       est,
       CAST(exact_distinct AS BIGINT) AS exact_distinct,
       CAST((est - exact_distinct) * 1000000 // exact_distinct AS BIGINT)
           AS err_ppm
FROM est JOIN ex USING (event_type)
ORDER BY est.event_type
"""




# ---------------------------------------------------------------------------
# Q345 — Explicit Bloom filter with an EXACT false-positive audit:
# completes the classic sketch quartet (CMS q95 frequency, Misra–Gries
# q326 heavy hitters, HLL q336/q340/q341 cardinality, Bloom q345
# membership). q190 exercises Spark's own runtime bloom injection; this
# one is built from the shared md5 hash family (operators/sketch.py:
# bloom_build/bloom_probe), so the packed bit array itself hash-matches
# DuckDB, and the audit measures what a filter claim never states
# precisely: the filter is built over customers WITH orders, probed
# with EVERY customer, and each probe's verdict is joined against the
# exact anti-join ground truth — zero false negatives by construction
# (tested), false positives counted exactly per nation.
#
# Scale: build is one explode + bit_or agg (mergeable, map-side
# combined, |words| rows); the probe side broadcasts the 128-word
# array — the shuffle-skipping join-pruning shape, here with its FP
# cost measured instead of asserted.
# ---------------------------------------------------------------------------


def q345_bloom_filter_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import bloom_build, bloom_probe

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    keys = orders.select(F.col("o_custkey").alias("k")).distinct()
    bits = bloom_build(keys, "k")
    # The synthetic corpus gives EVERY customer an order, so real keys
    # alone would leave no absent probes (a vacuous audit); a shifted
    # copy of the key space is guaranteed-absent membership traffic.
    probes = cust.select("c_custkey", "c_nationkey").unionAll(
        cust.select(
            (F.col("c_custkey") + F.lit(1_000_000_000)).alias("c_custkey"),
            "c_nationkey",
        )
    )
    verdict = bloom_probe(probes.select("c_custkey"), bits, "c_custkey")
    present = keys.select(
        F.col("k").alias("c_custkey"), F.lit(1).alias("present")
    )
    return (
        probes.join(verdict, "c_custkey")
        .join(present, "c_custkey", "left")
        .na.fill(0, ["present"])
        .groupBy("c_nationkey")
        .agg(
            F.count("*").cast("long").alias("n_probes"),
            F.sum("present").cast("long").alias("n_present"),
            F.sum("bloom_positive").cast("long").alias("n_positive"),
            F.sum(
                F.when(
                    (F.col("bloom_positive") == 1) & (F.col("present") == 0),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_false_pos"),
        )
        .selectExpr(
            "c_nationkey",
            "n_probes",
            "n_present",
            "n_positive",
            "n_false_pos",
            "CAST(1000000 * n_false_pos DIV NULLIF(n_probes - n_present, 0)"
            " AS BIGINT) AS fp_ppm_absent",
        )
        .orderBy("c_nationkey")
    )


Q345_SQL = """
WITH keys AS (
    SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS k FROM orders
),
pos AS (
    SELECT CAST(('0x' || substr(md5('bloom0:' || k), 1, 15)) AS BIGINT) % 4096 AS pos FROM keys
    UNION ALL
    SELECT CAST(('0x' || substr(md5('bloom1:' || k), 1, 15)) AS BIGINT) % 4096 AS pos FROM keys
    UNION ALL
    SELECT CAST(('0x' || substr(md5('bloom2:' || k), 1, 15)) AS BIGINT) % 4096 AS pos FROM keys
),
bits AS (
    SELECT CAST(pos // 32 AS INT) AS word,
           bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT))
               AS bits
    FROM pos GROUP BY 1
),
probes AS (
    SELECT c_custkey, c_nationkey, CAST(c_custkey AS VARCHAR) AS k
    FROM customer
    UNION ALL
    SELECT c_custkey + 1000000000, c_nationkey,
           CAST(c_custkey + 1000000000 AS VARCHAR)
    FROM customer
),
pp AS (
    SELECT c_custkey, c_nationkey, CAST(('0x' || substr(md5('bloom0:' || k), 1, 15)) AS BIGINT) % 4096 AS pos FROM probes
    UNION ALL
    SELECT c_custkey, c_nationkey, CAST(('0x' || substr(md5('bloom1:' || k), 1, 15)) AS BIGINT) % 4096 AS pos FROM probes
    UNION ALL
    SELECT c_custkey, c_nationkey, CAST(('0x' || substr(md5('bloom2:' || k), 1, 15)) AS BIGINT) % 4096 AS pos FROM probes
),
hits AS (
    SELECT c_custkey, c_nationkey,
           MIN(CASE WHEN (bits >> CAST(pos % 32 AS INT)) & 1 = 1
                    THEN 1 ELSE 0 END) AS bloom_positive
    FROM pp
    LEFT JOIN bits ON bits.word = CAST(pos // 32 AS INT)
    GROUP BY 1, 2
),
truth AS (
    SELECT p.c_custkey,
           CASE WHEN p.k IN (SELECT k FROM keys) THEN 1 ELSE 0 END AS present
    FROM (SELECT DISTINCT c_custkey, k FROM probes) p
)
SELECT c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_probes,
       CAST(SUM(present) AS BIGINT) AS n_present,
       CAST(SUM(bloom_positive) AS BIGINT) AS n_positive,
       CAST(SUM(CASE WHEN bloom_positive = 1 AND present = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
       CAST(1000000 * SUM(CASE WHEN bloom_positive = 1 AND present = 0
                               THEN 1 ELSE 0 END)
            // NULLIF(COUNT(*) - SUM(present), 0) AS BIGINT)
           AS fp_ppm_absent
FROM hits JOIN truth USING (c_custkey)
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


SCALE_QUERIES = {
    "q345_bloom_filter_audit": q345_bloom_filter_audit,
    "q341_hll_rollup": q341_hll_rollup,
    "q336_hll_distinct": q336_hll_distinct,
    "q326_heavy_hitters": q326_heavy_hitters,
    "q269_shard_rebalance": q269_shard_rebalance,
    "q297_independence_chi2": q297_independence_chi2,
    "q261_kendall_tau": q261_kendall_tau,
    "q210_autocorrelation": q210_autocorrelation,
    "q203_seasonal_decomposition": q203_seasonal_decomposition,
    "q45_quantiles": q45_quantiles,
    "q46_approx_distinct": q46_approx_distinct,
    "q57_approx_quantiles": q57_approx_quantiles,
    "q68_grouped_zscore": q68_grouped_zscore,
    "q79_correlation": q79_correlation,
    "q80_value_histogram": q80_value_histogram,
    "q95_cms_frequency": q95_cms_frequency,
    "q148_winsorize": q148_winsorize,
    "q153_mad_outliers": q153_mad_outliers,
    "q155_linear_regression": q155_linear_regression,
    "q163_quantile_binning": q163_quantile_binning,
    "q171_robust_trend": q171_robust_trend,
    "q172_cusum_changepoint": q172_cusum_changepoint,
    "q179_spearman": q179_spearman,
    "q180_percentile_rank": q180_percentile_rank,
}

SCALE_ORACLES = {
    "q345_bloom_filter_audit": Q345_SQL,
    "q341_hll_rollup": Q341_SQL,
    "q336_hll_distinct": Q336_SQL,
    "q326_heavy_hitters": Q326_SQL,
    "q269_shard_rebalance": Q269_SQL,
    "q297_independence_chi2": Q297_SQL,
    "q261_kendall_tau": Q261_SQL,
    "q210_autocorrelation": Q210_SQL,
    "q203_seasonal_decomposition": Q203_SQL,
    "q45_quantiles": Q45_SQL,
    "q46_approx_distinct": Q46_SQL,
    "q57_approx_quantiles": Q57_SQL,
    "q68_grouped_zscore": Q68_SQL,
    "q79_correlation": Q79_SQL,
    "q80_value_histogram": Q80_SQL,
    "q95_cms_frequency": Q95_SQL,
    "q148_winsorize": Q148_SQL,
    "q153_mad_outliers": Q153_SQL,
    "q155_linear_regression": Q155_SQL,
    "q163_quantile_binning": Q163_SQL,
    "q171_robust_trend": Q171_SQL,
    "q172_cusum_changepoint": Q172_SQL,
    "q179_spearman": Q179_SQL,
    "q180_percentile_rank": Q180_SQL,
}
