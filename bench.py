"""Benchmark runner (driver contract).

Runs every headline query from ``__spark_entry__.queries()`` against
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": total_sec, "unit": "sec",
     "queries": {"q01...": sec, ...}, "sf": 0.1}

Each query is timed to full materialization (collect) after warm-up passes
that exercise every runtime path (codegen, streaming state store,
Arrow/pandas workers) at the smallest corpus; order is fixed so run-to-run
numbers are comparable.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    import __spark_entry__ as entry_mod
    from snowflake_stock_dbt_spark.session import get_spark

    #: Queries whose first execution warms a whole runtime path (plain
    #: codegen+scan, Structured Streaming + state store, Arrow/pandas
    #: workers, text explode, wide aggregate codegen) — run once at the
    #: smallest corpus so timed queries measure the plan, not cold-start.
    WARMUP = [
        "q01_top_by_metric",
        "q29_streaming_window",
        "q41_stateful_totals",
        "q38_media_decode",
        "q21_minhash_signatures",
        "q23_simhash",
    ]

    spark = get_spark(app_name="bench")
    qs = entry_mod.queries()
    for w in WARMUP:
        if w in qs:
            qs[w](spark, "/root/testdata/sf0.001").collect()
    spark.catalog.clearCache()

    # Two timed runs per query, report the min: single-shot timings on a
    # shared host mix plan cost with CPU-contention noise (observed 10-40x
    # spikes on identical plans); the min of two runs is the steady-state
    # number the plan actually costs.
    RUNS = 2
    times: dict[str, float] = {}
    for name in sorted(qs):
        best = float("inf")
        for _ in range(RUNS):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
            # Isolate runs: drop persisted intermediates so one query's
            # cache (or memory pressure) can't distort the next timing.
            spark.catalog.clearCache()
        times[name] = round(best, 4)

    total = round(sum(times.values()), 4)
    print(
        json.dumps(
            {
                "metric": "query_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
