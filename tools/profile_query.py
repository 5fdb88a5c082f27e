"""Stage-level profiler for registered queries (optimization round 11).

Runs each named query in ONE shared session with the Spark event log
enabled, then parses the log to attribute wall time to jobs and stages:
per query it reports job count, stage count, task count, summed executor
run time, shuffle read/write bytes, input bytes, and the top stages by
executor run time — the data §1/§2 of the optimization guide says to
collect before touching anything (the UI is disabled in this sandbox, so
the event log is the measurement channel).

Usage:
    python tools/profile_query.py q331_scd2_incremental q171_robust_trend
    python tools/profile_query.py --top 20        # slowest 20 from BENCH_FULL
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

EVDIR = "/tmp/spark-graft-events"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--top", type=int, default=0,
                    help="profile the N slowest queries from BENCH_FULL.json")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--json-out", default="")
    args = ap.parse_args()

    names = list(args.queries)
    if args.top:
        with open(os.path.join(REPO, "BENCH_FULL.json")) as f:
            bench = json.load(f)["queries"]
        names += [k for k, _ in sorted(bench.items(), key=lambda kv: -kv[1])
                  ][: args.top]
    if not names:
        ap.error("no queries given")

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)

    import __spark_entry__ as entry
    from snowflake_stock_dbt_spark.operators.similarity import (
        release_persisted_frames,
    )
    from snowflake_stock_dbt_spark.session import get_spark

    spark = get_spark(app_name="profile", extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": f"file://{EVDIR}",
        "spark.eventLog.compress": "false",
    })
    qs = entry.queries()
    walls: dict[str, float] = {}
    plan_s: dict[str, float] = {}
    for name in names:
        if name not in qs:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        # Warm-up at the smallest corpus pays codegen/stream cold start.
        qs[name](spark, "/root/testdata/sf0.001").collect()
        release_persisted_frames()
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"PROFILE::{name}")
        t0 = time.perf_counter()
        df = qs[name](spark, args.sf_dir)
        t_plan = time.perf_counter()
        df.collect()
        walls[name] = time.perf_counter() - t0
        plan_s[name] = t_plan - t0
        spark.sparkContext.setJobDescription(None)
        release_persisted_frames()
        spark.catalog.clearCache()
    spark.stop()

    report = parse_eventlog(EVDIR, walls, plan_s)
    print(json.dumps({"wall": walls, "plan_build_s": plan_s}, indent=1))
    for name in names:
        if name in report:
            print_report(name, report[name], walls.get(name, 0.0),
                         plan_s.get(name, 0.0))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(report, f, indent=1)
    return 0


def parse_eventlog(evdir: str, walls: dict, plan_s: dict) -> dict:
    """{query: {jobs, stages: [...], tasks, exec_ms, shuffle_r/w, input}}"""
    files = []
    for f in os.listdir(evdir):
        p = os.path.join(evdir, f)
        if f.startswith("."):
            continue
        if os.path.isdir(p):  # rolling event-log dir (eventlog_v2_*)
            files += [os.path.join(p, g) for g in sorted(os.listdir(p))
                      if g.startswith("events_")]
        else:
            files.append(p)
    job_desc: dict[int, str] = {}
    job_stages: dict[int, list[int]] = {}
    stage_info: dict[int, dict] = {}
    for path in files:
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except Exception:
                    continue
                kind = ev.get("Event")
                if kind == "SparkListenerJobStart":
                    desc = (ev.get("Properties") or {}).get(
                        "spark.job.description", "")
                    jid = ev["Job ID"]
                    job_desc[jid] = desc
                    job_stages[jid] = [
                        s["Stage ID"] for s in ev.get("Stage Infos", [])
                    ]
                elif kind == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    acc = {a["Name"]: a.get("Value")
                           for a in si.get("Accumulables", [])}
                    stage_info[si["Stage ID"]] = {
                        "name": si.get("Name", ""),
                        "tasks": si.get("Number of Tasks", 0),
                        "exec_ms": _num(acc.get(
                            "internal.metrics.executorRunTime")),
                        "cpu_ms": _num(acc.get(
                            "internal.metrics.executorCpuTime")) / 1e6,
                        "shuf_r": _num(acc.get(
                            "internal.metrics.shuffle.read.remoteBytesRead"))
                        + _num(acc.get(
                            "internal.metrics.shuffle.read.localBytesRead")),
                        "shuf_w": _num(acc.get(
                            "internal.metrics.shuffle.write.bytesWritten")),
                        "input": _num(acc.get(
                            "internal.metrics.input.bytesRead")),
                        "wall_ms": (si.get("Completion Time", 0)
                                    - si.get("Submission Time", 0))
                        if si.get("Submission Time") else 0,
                    }
    out: dict[str, dict] = {}
    for jid, desc in job_desc.items():
        if not desc.startswith("PROFILE::"):
            continue
        q = desc.split("::", 1)[1]
        rec = out.setdefault(q, {"jobs": 0, "stages": []})
        rec["jobs"] += 1
        for sid in job_stages.get(jid, []):
            if sid in stage_info:
                rec["stages"].append(dict(stage_info.pop(sid), id=sid))
    return out


def print_report(name: str, rec: dict, wall: float, plan: float) -> None:
    stages = rec["stages"]
    tot_exec = sum(s["exec_ms"] for s in stages)
    tot_cpu = sum(s["cpu_ms"] for s in stages)
    print(f"\n=== {name}: wall {wall:.2f}s (plan-build {plan:.2f}s) | "
          f"{rec['jobs']} jobs, {len(stages)} stages, "
          f"{sum(s['tasks'] for s in stages)} tasks | "
          f"exec {tot_exec/1e3:.2f}s cpu {tot_cpu/1e3:.2f}s | "
          f"shufW {sum(s['shuf_w'] for s in stages)/1e6:.1f}MB "
          f"input {sum(s['input'] for s in stages)/1e6:.1f}MB")
    for s in sorted(stages, key=lambda s: -s["exec_ms"])[:8]:
        print(f"  stage {s['id']:>4} wall {s['wall_ms']/1e3:6.2f}s "
              f"exec {s['exec_ms']/1e3:7.2f}s cpu {s['cpu_ms']/1e3:7.2f}s "
              f"tasks {s['tasks']:>3} shufW {s['shuf_w']/1e6:7.1f}MB "
              f" {s['name'][:70]}")


def _num(v) -> float:
    try:
        return float(v)
    except (TypeError, ValueError):
        return 0.0


if __name__ == "__main__":
    raise SystemExit(main())
