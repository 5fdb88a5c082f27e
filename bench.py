"""Benchmark runner (driver contract).

Runs every headline query from ``__spark_entry__.queries()`` against
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": total_sec, "unit": "sec",
     "queries": {"q01...": sec, ...}, "sf": 0.1}

Each query is timed to full materialization (collect) after a warm-up pass
of the session (first query pays JVM/codegen warm-up; order is fixed so
run-to-run numbers are comparable).
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

    # Recycle the whole JVM every RECYCLE_EVERY queries: long single-JVM
    # suites accumulate state (broadcast blocks, streaming state stores,
    # generated classes) that measurably inflates late queries — a context
    # restart alone is not enough because the degradation lives in the JVM,
    # not the SparkContext. Gateway restart costs ~10 s and keeps each
    # query's time a function of its plan, not its suite position.
    RECYCLE_EVERY = 10

    def fresh_session():
        s = get_spark(app_name="bench")
        # Warm up codegen/IO on the smallest corpus so the first timed
        # query doesn't pay session start-up.
        next(iter(entry_mod.queries().values()))(
            s, "/root/testdata/sf0.001"
        ).collect()
        return s

    def restart_jvm(s):
        from pyspark import SparkContext

        s.stop()
        gw = SparkContext._gateway
        if gw is not None:
            gw.shutdown()
        SparkContext._gateway = None
        SparkContext._jvm = None
        os.environ.pop("PYSPARK_GATEWAY_PORT", None)
        os.environ.pop("PYSPARK_GATEWAY_SECRET", None)
        return fresh_session()

    spark = fresh_session()
    qs = entry_mod.queries()

    times: dict[str, float] = {}
    for i, name in enumerate(sorted(qs)):
        if i > 0 and i % RECYCLE_EVERY == 0:
            spark = restart_jvm(spark)
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).collect()
        times[name] = round(time.perf_counter() - t0, 4)
        # Isolate queries: drop any persisted intermediates so one query's
        # cache (or memory pressure) can't distort the next one's time.
        spark.catalog.clearCache()

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
