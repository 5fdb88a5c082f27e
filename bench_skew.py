"""Skewed-key join benchmark: salted_join vs plain shuffle join.

Evidence harness for operators/skew.py (round-1 review asked for measured
proof, not an unused operator). Generates a left table where ``HOT_FRAC`` of
rows share one key, joins a 50k-key dim with broadcast disabled (the
big-fact ⋈ medium-dim shape that is too big to broadcast at 100 TB), and
times plain vs salted, best-of-2, through a same-key aggregation.

Run: ``python bench_skew.py`` → one JSON line. Numbers are recorded in
PLANS.md ("Skew evidence"). Local speedup is bounded by core count (the
straggler still runs at memory bandwidth on one of 8 local cores); on a
real cluster the plain join's wall-clock is the single hot reducer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N = 12_000_000
HOT_FRAC = 0.95
KEYS = 50_000
SALTS = 8


def main() -> None:
    from pyspark.sql import functions as F

    from snowflake_stock_dbt_spark.operators.skew import salted_join
    from snowflake_stock_dbt_spark.session import get_spark

    spark = get_spark("bench_skew")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    base = "/tmp/spark_graft_skew_bench"
    left = spark.range(N).select(
        F.when(F.rand(7) < HOT_FRAC, F.lit(0))
        .otherwise((F.rand(11) * KEYS).cast("long"))
        .alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.range(KEYS).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    left.write.mode("overwrite").parquet(f"{base}/left")
    right.write.mode("overwrite").parquet(f"{base}/right")
    lt = spark.read.parquet(f"{base}/left")
    rt = spark.read.parquet(f"{base}/right")

    def agg(joined):
        return joined.groupBy("k").agg(F.sum(F.col("w") * F.col("v")).alias("s"))

    def timed(build):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            build().count()
            best = min(best, time.perf_counter() - t0)
        return best

    plain = timed(lambda: agg(lt.join(rt, ["k"])))
    salted = timed(lambda: agg(salted_join(lt, rt, ["k"], n_salts=SALTS)))

    # Skewed exact-distinct aggregation: the per-reducer state (distinct
    # sets), not the row count, is what skews — the case salted_aggregate
    # exists for. Compare a direct groupBy count_distinct against the
    # two-stage salted form (stage 1 dedups (k, salt)-locally, stage 2
    # merges per-salt partial distinct counts — exact because the salt is
    # derived from the distinct-counted value, so equal values never split
    # across salts).
    from snowflake_stock_dbt_spark.operators.skew import salted_aggregate

    plain_agg = timed(
        lambda: lt.groupBy("k").agg(F.countDistinct("v").alias("d"))
    )
    salted_agg = timed(
        lambda: salted_aggregate(
            lt,
            keys=["k"],
            partial_aggs={"d": F.count_distinct(F.col("v"))},
            merge_aggs={"d": F.sum},
            n_salts=SALTS,
            salt_col=F.abs(F.hash("v")) % SALTS,
        )
    )
    print(
        json.dumps(
            {
                "metric": "skew_join_seconds",
                "plain": round(plain, 3),
                "salted": round(salted, 3),
                "speedup": round(plain / salted, 3),
                "agg_plain": round(plain_agg, 3),
                "agg_salted": round(salted_agg, 3),
                "agg_speedup": round(plain_agg / salted_agg, 3),
                "rows": N,
                "hot_frac": HOT_FRAC,
                "n_salts": SALTS,
            }
        )
    )


if __name__ == "__main__":
    main()
