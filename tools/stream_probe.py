"""Drain-phase breakdown for the streaming family (optimization round 12).

Wraps run_streaming_query's lifecycle with wall-clock brackets and dumps
each micro-batch's StreamingQueryProgress durationMs (triggerExecution,
getBatch, addBatch, walCommit, commitOffsets, queryPlanning, latestOffset)
so the between-jobs machinery VERDICT r11 item 3 points at is attributed,
not guessed.

Usage:
    python tools/stream_probe.py q60_stream_stream_join q196_sessionize_tws
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    names = sys.argv[1:] or ["q60_stream_stream_join"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry
    from snowflake_stock_dbt_spark.session import get_spark
    from snowflake_stock_dbt_spark.streaming import pipeline as sp

    spark = get_spark(app_name="stream_probe")
    qs = entry.queries()

    # Monkeypatch run_streaming_query to capture progress.
    orig = sp.run_streaming_query
    captured: list[dict] = []

    def patched(spark, df, output_mode="complete", state_partitions=None,
                state_provider=None):
        import uuid
        name = f"probe_{uuid.uuid4().hex[:8]}"
        provider_key = "spark.sql.streaming.stateStore.providerClass"
        prior = spark.conf.get("spark.sql.shuffle.partitions")
        prior_provider = spark.conf.get(provider_key, None)
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
        if state_provider is not None:
            spark.conf.set(provider_key, state_provider)
        t0 = time.perf_counter()
        try:
            q = (df.writeStream.format("memory").queryName(name)
                 .outputMode(output_mode).start())
            t_start = time.perf_counter()
            try:
                q.processAllAvailable()
                t_drain = time.perf_counter()
            finally:
                prog = [json.loads(p.json) for p in q.recentProgress]
                q.stop()
                q.awaitTermination()
                t_stop = time.perf_counter()
        finally:
            if state_partitions is not None:
                spark.conf.set("spark.sql.shuffle.partitions", prior)
            if state_provider is not None:
                if prior_provider is None:
                    spark.conf.unset(provider_key)
                else:
                    spark.conf.set(provider_key, prior_provider)
        out = spark.table(name).localCheckpoint(eager=True)
        t_ckpt = time.perf_counter()
        spark.catalog.dropTempView(name)
        captured.append({
            "start_s": round(t_start - t0, 3),
            "drain_s": round(t_drain - t_start, 3),
            "stop_s": round(t_stop - t_drain, 3),
            "ckpt_s": round(t_ckpt - t_stop, 3),
            "batches": [
                {
                    "batchId": p.get("batchId"),
                    "numInputRows": p.get("numInputRows"),
                    "durationMs": p.get("durationMs"),
                    "stateOperators": [
                        {k: so.get(k) for k in (
                            "operatorName", "commitTimeMs", "numRowsTotal",
                            "numStateStoreInstances")}
                        for so in p.get("stateOperators", [])
                    ],
                }
                for p in prog
            ],
        })
        return out

    sp.run_streaming_query = patched
    # Plans import run_streaming_query by name at module import time:
    # patch those references too.
    from snowflake_stock_dbt_spark.plans import streaming_plans as spl
    spl.run_streaming_query = patched

    report = {}
    for name in names:
        if name not in qs:
            print(f"!! unknown {name}", file=sys.stderr)
            continue
        # Warm-up on the smallest corpus (pays stream cold-start).
        qs[name](spark, "/root/testdata/sf0.001").collect()
        captured.clear()
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).collect()
        wall = time.perf_counter() - t0
        report[name] = {"wall_s": round(wall, 3), "drains": list(captured)}
        spark.catalog.clearCache()
    sp.run_streaming_query = orig
    print(json.dumps(report, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
