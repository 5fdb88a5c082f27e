"""Verdict-level A/B of the two-level beam assignment vs the flat exact
scan (round-9 VERDICT item 1).

The round-9 floor pins ASSIGNMENT agreement (>= 70% of rows keep their
flat-argmin bucket under beam-4). But the user-visible semantics of the
IVF family are downstream VERDICTS: q118/q346 emit keep/drop decisions,
q151 emits kNN edges. A 13–25% assignment disagreement near cluster
boundaries could flip an unknown fraction of those — this tool measures
it, at probe scale where the two-level path actually activates
(size-derived k >= TWO_LEVEL_MIN_K).

For each query it runs the FULL pipeline twice on the same corpus —
once with ``SPARK_GRAFT_FLAT_ASSIGN=1`` (flat exact argmin at any k,
the pre-round-9 semantics) and once with the production beam path —
clearing the k-means training cache between arms so each arm trains its
own codebook, exactly as a real deployment of that arm would.

Reported per query:
- q118_semantic_dedup:  fraction of vec_ids whose ``kept`` verdict flips
  (plus bucket agreement as the assignment-level control).
- q151_knn_graph:       edge-set symmetric difference over union, and
  the fraction of (src, dst) edges present in both arms.
- q346_multimodal_curation: fraction of doc_ids whose ``keep`` flips
  (text/media components are embedding-independent, so every flip here
  traces to the semantic-dedup arm).

Usage:
  python tools/beam_agreement.py [--factor=8] [--growth=salted|gauss]
                                 [--queries=q118,q151,q346]

Prints one AGREE line per query and a final AGREE-JSON summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402
from snowflake_stock_dbt_spark.session import get_spark  # noqa: E402


def _reset_arm_state() -> None:
    """Each arm trains its own codebook (the whole point of the A/B) and
    must not read the other arm's cached frames."""
    import snowflake_stock_dbt_spark.operators.similarity as sim

    sim._KMEANS_TRAIN_CACHE.clear()
    sim.release_persisted_frames()


def _run_arm(spark, qfn, sf_dir: str, flat: bool):
    os.environ["SPARK_GRAFT_FLAT_ASSIGN"] = "1" if flat else "0"
    _reset_arm_state()
    t0 = time.monotonic()
    rows = qfn(spark, sf_dir).collect()
    dt = time.monotonic() - t0
    os.environ["SPARK_GRAFT_FLAT_ASSIGN"] = "0"
    return rows, dt


def _verdicts_q118(rows):
    return {r["vec_id"]: bool(r["kept"]) for r in rows}, {
        r["vec_id"]: r["bucket"] for r in rows
    }


def main() -> int:
    factor = 8
    growth = "salted"
    prefixes = ["q118", "q151", "q346"]
    for a in sys.argv[1:]:
        if a.startswith("--factor"):
            factor = int(a.split("=", 1)[1])
        if a.startswith("--growth"):
            growth = a.split("=", 1)[1]
        if a.startswith("--queries"):
            prefixes = a.split("=", 1)[1].split(",")

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("beam_agreement")
    from tools.scale_probe import build_corpus

    corpus = build_corpus(spark, factor, growth)
    qs = E.queries()
    names = sorted(
        n for n in qs if any(n.startswith(p) for p in prefixes)
    )
    summary: dict[str, dict] = {}
    for name in names:
        flat_rows, t_flat = _run_arm(spark, qs[name], corpus, flat=True)
        beam_rows, t_beam = _run_arm(spark, qs[name], corpus, flat=False)
        rec: dict = {
            "t_flat_s": round(t_flat, 2),
            "t_beam_s": round(t_beam, 2),
            "n_flat": len(flat_rows),
            "n_beam": len(beam_rows),
        }
        if name.startswith("q118"):
            kf, bf = _verdicts_q118(flat_rows)
            kb, bb = _verdicts_q118(beam_rows)
            ids = set(kf) | set(kb)
            flips = sum(1 for i in ids if kf.get(i) != kb.get(i))
            bucket_agree = sum(
                1 for i in ids if bf.get(i) == bb.get(i)
            ) / max(1, len(ids))
            rec.update(
                verdict_flip_rate=round(flips / max(1, len(ids)), 4),
                n_flips=flips,
                bucket_agreement=round(bucket_agree, 4),
                dropped_flat=sum(1 for v in kf.values() if not v),
                dropped_beam=sum(1 for v in kb.values() if not v),
            )
        elif name.startswith("q151"):
            ef = {(r["src_id"], r["dst_id"]) for r in flat_rows}
            eb = {(r["src_id"], r["dst_id"]) for r in beam_rows}
            union = ef | eb
            inter = ef & eb
            rec.update(
                edge_jaccard=round(len(inter) / max(1, len(union)), 4),
                edge_flip_rate=round(
                    len(union - inter) / max(1, len(union)), 4
                ),
                edges_flat=len(ef),
                edges_beam=len(eb),
            )
        elif name.startswith("q346"):
            kf = {r["doc_id"]: bool(r["keep"]) for r in flat_rows}
            kb = {r["doc_id"]: bool(r["keep"]) for r in beam_rows}
            ids = set(kf) | set(kb)
            flips = sum(1 for i in ids if kf.get(i) != kb.get(i))
            rec.update(
                verdict_flip_rate=round(flips / max(1, len(ids)), 4),
                n_flips=flips,
                dropped_flat=sum(1 for v in kf.values() if not v),
                dropped_beam=sum(1 for v in kb.values() if not v),
            )
        summary[name] = rec
        print(f"AGREE {name} x{factor} {growth} {json.dumps(rec)}", flush=True)
    print(
        "AGREE-JSON "
        + json.dumps(
            {"factor": factor, "growth": growth, "queries": summary}
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
