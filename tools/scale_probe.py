"""Scaling-exponent probe for the iterative / state-heavy operators.

Builds synthetic corpora at 1x / 2x / 4x the sf0.1 row counts (key-offset
copies; document text is salted per copy so near-dup candidate structure
stays realistic instead of forming cross-copy clique blowups), times the
top-8 most expensive registry queries at each scale, and prints a
rows-vs-seconds table with the fitted scaling exponent
``log(t_4x / t_1x) / log 4``.

An exponent near 1.0 means the plan is linear in input (what a 100 TB
cluster needs); near 2.0 means an accidental quadratic that small-SF
correctness tests would never catch. Results are recorded in PLANS.md §9.

Usage: ``python tools/scale_probe.py [--factors 1,2,4] [--queries q93,...]``
Corpora land under /tmp/spark_graft_scaleprobe (scratch; rebuilt when absent).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as E
from snowflake_stock_dbt_spark.session import get_spark

BASE_SF = os.environ.get("SPARK_GRAFT_PROBE_BASE", "/root/testdata/sf0.1")
OUT_ROOT = "/tmp/spark_graft_scaleprobe"

#: --growth=distinct corpus parameters (round-8 VERDICT item 4): the
#: salted key-offset copies make every doc's clones GENUINE near-dups,
#: so dedup-audit candidate volume grows quadratically BY CONSTRUCTION
#: and the measured exponent reflects the corpus, not the plan. The
#: distinct mode instead resamples EVERY copy's text (c=0 included, so
#: all factors share one text distribution) from a large synthetic
#: vocabulary — sparse shingle space, like real crawl growth — and
#: plants near-dups at a FIXED rate: each selected even/odd doc pair
#: within a copy shares one resampled text, the odd one salted, giving
#: exactly n·factor·(1/DISTINCT_PAIR_MOD)/2 near-dup pairs — LINEAR in
#: corpus size. Token counts per doc are preserved from the base corpus.
DISTINCT_VOCAB = 65536
DISTINCT_PAIR_MOD = 20  # 1-in-20 doc pairs are near-dups (5% of docs)

#: --growth=gauss corpus parameters (round-9 VERDICT item 3): the base
#: synthetic embeddings are UNIFORM on the 64-d sphere, which
#: concentrates pairwise distances (p5/p95 = 1.26/1.55) — the worst case
#: for triangle pruning, beam agreement, and k-means balance. Real text
#: embeddings cluster. This mode resamples EVERY copy's vector (c=0
#: included, so all factors share one distribution) from a fixed
#: mixture of GAUSS_CLUSTERS spherical Gaussians: unit center by hashed
#: cluster id, per-dim Box-Muller noise sigma=GAUSS_SIGMA, final vector
#: re-normalized. sigma=0.2 puts mean within-cluster cosine ~0.28 —
#: straddling SEMDEDUP_THRESHOLD=0.3, so keep/drop verdicts have real
#: variance — while cross-cluster cosine stays ~0 (near-orthogonal
#: random centers), i.e. genuinely clusterable geometry. ``label`` is
#: set to the true mixture component. Deterministic (hash-seeded).
GAUSS_CLUSTERS = 128
GAUSS_SIGMA = 0.2
GAUSS_DIM = 64

#: The queries VERDICT.md (round 2, item 4) asks to probe, i.e. the top-8
#: most expensive in BENCH_r02.
DEFAULT_QUERIES = [
    "q93_pagerank",
    "q41_stateful_totals",
    "q74_dedup_survivors",
    "q54_neardup_groups",
    "q56_ann_lsh",
    "q60_stream_stream_join",
    "q57_approx_quantiles",
    "q45_quantiles",
]

#: Tables those queries read, with the key columns to offset per copy.
#: Offsets keep id spaces disjoint so joins/groups scale in KEYS (the way
#: real data grows), not in per-key density.
TABLES = ["lineitem", "orders", "events", "documents", "embeddings", "customer"]

#: Dimension-shaped tables copied verbatim (factor-independent) so every
#: registry query — including the worksheet-verbatim family, which
#:
#: derives its scrape feed from `customer` and its star from
#: supplier/nation/region — can run against a probe corpus.
STATIC_TABLES = ["region", "nation", "supplier", "part"]


def _offsets(spark, base):
    o = {}
    o["orderkey"] = (
        spark.read.parquet(f"{base}/orders.parquet").agg(F.max("o_orderkey")).first()[0]
        + 1
    )
    o["custkey"] = (
        spark.read.parquet(f"{base}/orders.parquet").agg(F.max("o_custkey")).first()[0]
        + 1
    )
    o["event"] = (
        spark.read.parquet(f"{base}/events.parquet").agg(F.max("event_id")).first()[0]
        + 1
    )
    o["user"] = (
        spark.read.parquet(f"{base}/events.parquet").agg(F.max("user_id")).first()[0]
        + 1
    )
    o["doc"] = (
        spark.read.parquet(f"{base}/documents.parquet").agg(F.max("doc_id")).first()[0]
        + 1
    )
    o["vec"] = (
        spark.read.parquet(f"{base}/embeddings.parquet").agg(F.max("vec_id")).first()[0]
        + 1
    )
    o["cust2"] = (
        spark.read.parquet(f"{base}/customer.parquet").agg(F.max("c_custkey")).first()[0]
        + 1
    )
    return o


def _distinct_text(c: int):
    """Fresh-document text for the --growth=distinct corpus: per-doc
    deterministic resampling from a DISTINCT_VOCAB-token id space (token
    count preserved), with a fixed near-dup rate — selected even/odd doc
    pairs share one seed and the odd doc appends a salt token, so it is
    a genuine near-dup of its even twin and of nothing else. Pure JVM
    column expressions; xxhash64 is fine here because probe corpora are
    performance-only (oracle comparisons never run on them)."""
    n_tok = F.greatest(F.lit(1), F.size(F.split(F.col("text"), " ")))
    paired = (
        F.pmod(F.xxhash64(F.lit("nd"), (F.col("doc_id") / 2).cast("long"), F.lit(c)), F.lit(DISTINCT_PAIR_MOD))
        == 0
    )
    seed = F.when(paired, (F.col("doc_id") / 2).cast("long") * 2).otherwise(
        F.col("doc_id")
    )
    body = F.array_join(
        F.transform(
            F.sequence(F.lit(1), n_tok),
            lambda p: F.concat(
                F.lit("t"),
                F.pmod(
                    F.xxhash64(F.lit("tok"), seed, F.lit(c), p),
                    F.lit(DISTINCT_VOCAB),
                ).cast("string"),
            ),
        ),
        " ",
    )
    return F.when(
        paired & (F.col("doc_id") % 2 == 1),
        F.concat(body, F.lit(f" neardup{c}")),
    ).otherwise(body)


def _uniform01(*seed_cols):
    """Deterministic uniform (0,1) double from hashed seed columns."""
    m = 1 << 40
    return (
        F.pmod(F.xxhash64(*seed_cols), F.lit(m)).cast("double") + F.lit(0.5)
    ) / F.lit(float(m))


def _gauss_embedding(vid):
    """Unit-normalized mixture-of-Gaussians draw for one (offset) vec_id
    — see GAUSS_CLUSTERS. Pure JVM column expressions: per-dim centers
    are uniform[-1,1] hashes of (cluster, dim), noise is Box-Muller from
    two (vec, dim) hashes, and both the center and the sum are L2
    re-normalized. Returns (embedding array<float>, label int)."""
    dims = F.sequence(F.lit(0), F.lit(GAUSS_DIM - 1))
    cid = F.pmod(F.xxhash64(F.lit("cl"), vid), F.lit(GAUSS_CLUSTERS))

    def l2norm(arr):
        return F.sqrt(
            F.aggregate(
                arr, F.lit(0.0), lambda a, x: a + x * x
            )
        )

    center = F.transform(
        dims, lambda p: _uniform01(F.lit("ctr"), cid, p) * 2.0 - 1.0
    )
    cn = l2norm(center)
    raw = F.zip_with(
        center,
        dims,
        lambda cv, p: cv / cn
        + F.lit(GAUSS_SIGMA)
        * F.sqrt(-2.0 * F.log(_uniform01(F.lit("g1"), vid, p)))
        * F.cos(F.lit(2.0 * math.pi) * _uniform01(F.lit("g2"), vid, p)),
    )
    rn = l2norm(raw)
    emb = F.transform(raw, lambda x: (x / rn).cast("float"))
    return emb, cid.cast("int")


def _copy(table, df, c, off, growth="salted"):
    """The c-th key-offset copy of one table."""
    if table == "lineitem":
        return df.withColumn("l_orderkey", F.col("l_orderkey") + c * off["orderkey"])
    if table == "orders":
        return df.withColumn(
            "o_orderkey", F.col("o_orderkey") + c * off["orderkey"]
        ).withColumn("o_custkey", F.col("o_custkey") + c * off["custkey"])
    if table == "events":
        return df.withColumn(
            "event_id", F.col("event_id") + c * off["event"]
        ).withColumn("user_id", F.col("user_id") + c * off["user"])
    if table == "documents":
        if growth == "distinct":
            # Fresh distinct documents at a fixed near-dup rate — see
            # _distinct_text. Note c=0 is resampled too, so every factor
            # draws from the same text distribution.
            return (
                df.withColumn("text", _distinct_text(c))
                .withColumn("n_chars", F.length("text"))
                .withColumn("doc_id", F.col("doc_id") + c * off["doc"])
            )
        # Salt the text per copy: clones keep realistic shingle statistics
        # without forming cross-copy duplicate cliques (which would make
        # near-dup pair counts scale quadratically BY CONSTRUCTION of the
        # synthetic corpus, not by any property of the operator).
        out = df.withColumn("doc_id", F.col("doc_id") + c * off["doc"])
        if c > 0:
            out = out.withColumn(
                "text", F.concat(F.col("text"), F.lit(f" copytoken{c}"))
            ).withColumn("n_chars", F.length("text"))
        return out
    if table == "embeddings":
        out = df.withColumn("vec_id", F.col("vec_id") + c * off["vec"])
        if growth == "gauss":
            emb, lab = _gauss_embedding(F.col("vec_id"))
            out = out.withColumn("embedding", emb).withColumn("label", lab)
        return out
    if table == "customer":
        return df.withColumn("c_custkey", F.col("c_custkey") + c * off["cust2"])
    raise ValueError(table)


def build_corpus(spark, factor: int, growth: str = "salted") -> str:
    root = OUT_ROOT if growth == "salted" else f"{OUT_ROOT}_{growth}"
    out = f"{root}/x{factor}"
    marker = f"{out}/.complete"
    if os.path.exists(marker):
        return out
    off = _offsets(spark, BASE_SF)
    for t in TABLES:
        base = spark.read.parquet(f"{BASE_SF}/{t}.parquet")
        parts = [_copy(t, base, c, off, growth) for c in range(factor)]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    for t in STATIC_TABLES:
        spark.read.parquet(f"{BASE_SF}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out}/{t}.parquet")
    with open(marker, "w") as f:
        f.write("ok")
    return out


def main() -> int:
    factors = [1, 2, 4]
    queries = DEFAULT_QUERIES
    growth = "salted"
    for a in sys.argv[1:]:
        if a.startswith("--factors"):
            factors = [int(x) for x in a.split("=", 1)[1].split(",")]
        if a.startswith("--queries"):
            queries = [
                n
                for n in E.queries()
                if any(n.startswith(p) for p in a.split("=", 1)[1].split(","))
            ]
        if a.startswith("--growth"):
            growth = a.split("=", 1)[1]
            if growth not in ("salted", "distinct", "gauss"):
                raise SystemExit(f"unknown --growth mode {growth!r}")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("scale_probe")
    qs = E.queries()

    dirs = {k: build_corpus(spark, k, growth) for k in factors}

    def run(name: str, d: str) -> None:
        # noop datasource: full materialization of every column. A bare
        # .count() is WRONG here — Catalyst prunes unused aggregate
        # expressions (counting q45's groups never computes the
        # percentiles), which silently flattens the curve.
        qs[name](spark, d).write.format("noop").mode("overwrite").save()

    # Warmup (JIT, codegen, state-store init) on the smallest corpus —
    # and REFUSE silently-empty probes: a query that returns zero rows on
    # the probe corpus is timing harness overhead, not a plan (the
    # pre-round-8 streaming reader streamed zero rows from the x{N}
    # directory corpora and journaled flat "exponents" for q41/q60/q185).
    for name in queries:
        if qs[name](spark, dirs[factors[0]]).isEmpty():
            raise SystemExit(
                f"PROBE-EMPTY {name}: returns 0 rows on the x{factors[0]} "
                "corpus — the timing would be meaningless; fix the reader "
                "or drop the query from the probe set"
            )
        run(name, dirs[factors[0]])
        if "--warm-all-factors" in sys.argv:
            # Round-10 methodology fix for the TRAINER-CACHE ASYMMETRY:
            # queries that memoize per-corpus driver state (the k-means
            # codebook cache keys on sf_dir) get that state warmed at
            # factors[0] only by the default warmup, so every LATER
            # factor's timed run silently includes training while the
            # first factor's does not — inflating the top-octave
            # exponent (measured: q350's apparent 2.2 octave collapsed
            # to 1.13 once training was isolated). This mode warms every
            # factor so the timed pass measures the serving path
            # uniformly; time training separately when it matters.
            for kf in factors[1:]:
                run(name, dirs[kf])

    times: dict[str, dict[int, float]] = {}
    for k in factors:
        for name in queries:
            t0 = time.monotonic()
            run(name, dirs[k])
            dt = time.monotonic() - t0
            times.setdefault(name, {})[k] = dt
            print(f"PROBE {name} x{k} {dt:.2f}s", flush=True)

    lo, hi = factors[0], factors[-1]
    print("\nquery            " + "".join(f"  x{k:<6}" for k in factors) + "  exponent")
    summary = {}
    for name in queries:
        t = times[name]
        exp = math.log(t[hi] / t[lo]) / math.log(hi / lo)
        summary[name] = {"times": t, "exponent": round(exp, 2)}
        row = "".join(f"  {t[k]:6.2f}" for k in factors)
        print(f"{name:<18}{row}  {exp:5.2f}")
    print("\nPROBE-JSON " + json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
