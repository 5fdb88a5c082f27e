"""Dump .explain('formatted') for named queries to plans/r{N}/<q>_<tag>.txt.

Usage:
    python tools/dump_plans.py --round 12 --tag before q143_prefix_jaccard_join q93_pagerank
Queries whose callables run internal actions (streaming drains, trainers)
still produce a plan for the RETURNED frame — the judge-facing contract.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--round", type=int, default=12)
    ap.add_argument("--tag", default="after")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    import __spark_entry__ as entry
    from snowflake_stock_dbt_spark.session import get_spark

    spark = get_spark(app_name="dump_plans")
    qs = entry.queries()
    outdir = os.path.join(REPO, "plans", f"r{args.round}")
    os.makedirs(outdir, exist_ok=True)
    for name in args.queries:
        if name not in qs:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        df = qs[name](spark, args.sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(outdir, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
