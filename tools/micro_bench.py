"""Noise-proof micro-bench: medians of ISOLATED reps for the pinned
heavy queries (round-5 VERDICT item 3).

Why this exists: BENCH_r{N}.json cross-day suite numbers vary ~14%
run-to-run on this host (two identical-code runs measured 59.6 s vs
67.8 s on the common-68 suite), which produced a false "drift" alarm in
round 4 and a phantom q60 1.84→3.17 s creep across rounds — each burning
a controlled re-adjudication. A suite pass times every query once inside
one long-lived JVM where page-cache state, GC pressure, and CPU
contention from the preceding 249 queries all leak into the number.

The fix is structural, not statistical: each pinned query runs in its
OWN fresh process (fresh JVM, fresh state-store dirs, no inherited
cache), does one warm-up pass at sf0.001 to pay codegen/stream/Arrow
cold-start, then runs ``REPS`` timed reps at the bench corpus with a
cache clear between reps. The recorded number is the MEDIAN of those
reps — robust to a single contention spike in a way min-of-two inside a
suite is not. Results land in ``MICRO_BENCH.json`` at the repo root;
``bench.py`` embeds them in its one-line JSON (key ``micro``) so the
driver's BENCH_r{N}.json carries them, and its comparator prefers these
medians over suite numbers for the pinned set.

Usage: ``python tools/micro_bench.py [--queries a,b] [--reps 4]``
(also self-invoked with ``--single NAME`` for the per-query child).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT_PATH = os.path.join(REPO, "MICRO_BENCH.json")

#: The pinned rotation (round-5 VERDICT item 3): the heaviest iterative /
#: stateful / candidate-generation plans, i.e. exactly the ones whose
#: suite numbers have historically moved with host noise.
PINNED = [
    "q60_stream_stream_join",
    "q74_dedup_survivors",
    "q93_pagerank",
    "q118_semantic_dedup",
    "q151_knn_graph",
    "q169_stream_join_then_window",
    "q176_minhash_accuracy",
    "q178_knn_clusters",
    "q196_sessionize_tws",
    "q204_lpa_communities",
    # Round-6 additions to the rotation: the heaviest new plans (kept
    # ADDITIVE — prior keys stay comparable across rounds).
    "q251_item_item_cf",
    "q259_mutual_nn",
    # Round-7 addition (round-6 VERDICT item 2): q56 moved 1.31x r5→r6 in
    # suite numbers but sat outside the rotation, so the noise-proof
    # medians couldn't adjudicate it. Now they can.
    "q56_ann_lsh",
    # Round-8 additions: the two MMR plans are fixed-cost round chains
    # (corpus-independent, so suite position noise dominates their raw
    # numbers) — exactly the profile the medians exist to adjudicate.
    "q334_mmr_rerank",
    "q342_hybrid_mmr",
    # The round-8 close bench caught q317 at 70.8 s (the 4^6-node LCP
    # tree); pinned so the ~4 s post-fix median can never silently creep.
    "q317_suffix_dedup",
    # Round-9 additions (round-8 VERDICT item 2 / What's-wrong #1): the
    # driver's r8 comparator flagged q94 3.3x and q95 1.84x with no
    # isolated evidence to adjudicate against — both are short plans
    # whose suite numbers ride host noise; pinned so every future flag
    # has a median to compare with.
    "q94_phash_neardup",
    "q95_cms_frequency",
    # Round-10 additions (round-9 VERDICT item 2 / What's-wrong #1): the
    # driver's r9 tail showed q79 2.7x and q82 2.7x inside the q78–q92
    # turbulence band; the judge's isolated medians cleared ~half and
    # asked for a pinned adjudication — q79 is the slowest single-pass
    # agg in the registry, so it stays in the rotation.
    "q79_correlation",
    "q82_pricing_summary",
    # Round-10 new heavy entries: the BQ kNN graph (the round's scale
    # lever) and the from-artifacts composite (its suite number is the
    # probe path; the build path is adjudicated in PLANS.md).
    "q350_knn_graph_bq",
    "q349_curation_from_artifacts",
]

REPS = 4


def run_single(name: str, sf_dir: str, reps: int) -> None:
    """Child-process body: warm up, then ``reps`` timed reps."""
    import __spark_entry__ as E
    from snowflake_stock_dbt_spark.session import get_spark

    spark = get_spark(app_name=f"micro-{name}")
    fn = E.queries()[name]
    fn(spark, "/root/testdata/sf0.001").collect()  # cold-start payment
    spark.catalog.clearCache()
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        times.append(round(time.perf_counter() - t0, 4))
        spark.catalog.clearCache()
    print("MICRO " + json.dumps({"name": name, "reps": times}), flush=True)


def merged_results(results: dict, scoped: bool, out_path: str) -> dict:
    """A scoped (--queries) re-measure must MERGE into the standing
    medians, not clobber the rest of the rotation (a --queries q118 run
    once silently dropped the other 12 entries)."""
    if scoped and os.path.exists(out_path):
        with open(out_path) as f:
            prior = json.load(f).get("queries", {})
        prior.update(results)
        return prior
    return results


def main() -> int:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = REPS
    if "--reps" in args:
        reps = int(args[args.index("--reps") + 1])
    if "--single" in args:
        run_single(args[args.index("--single") + 1], sf_dir, reps)
        return 0
    names = PINNED
    if "--queries" in args:
        names = args[args.index("--queries") + 1].split(",")

    results: dict[str, dict] = {}
    for name in names:
        proc = subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--single",
                name,
                "--reps",
                str(reps),
            ],
            capture_output=True,
            text=True,
            cwd=REPO,
            timeout=900,
        )
        line = next(
            (
                ln
                for ln in proc.stdout.splitlines()
                if ln.startswith("MICRO ")
            ),
            None,
        )
        if line is None:
            print(
                f"FAIL {name}: no MICRO line\n{proc.stderr[-2000:]}",
                file=sys.stderr,
            )
            return 1
        rec = json.loads(line[len("MICRO ") :])
        med = round(statistics.median(rec["reps"]), 4)
        results[name] = {"reps": rec["reps"], "median": med}
        print(f"{name}: median {med}s reps {rec['reps']}", flush=True)

    commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        capture_output=True,
        text=True,
        cwd=REPO,
    ).stdout.strip()
    results = merged_results(results, "--queries" in args, OUT_PATH)
    with open(OUT_PATH, "w") as f:
        json.dump(
            {
                "sf_dir": sf_dir,
                "commit": commit,
                "reps_per_query": reps,
                "queries": results,
            },
            f,
            indent=1,
            sort_keys=True,
        )
        f.write("\n")
    print(f"wrote {OUT_PATH} @ {commit}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
