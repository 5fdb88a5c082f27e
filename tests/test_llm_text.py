"""Differential tests for the [EXT] text-analysis/dedup query set (q16-q24)."""

from __future__ import annotations

import pytest

from snowflake_stock_dbt_spark.plans.llm_text import LLM_TEXT_ORACLES, LLM_TEXT_QUERIES

from .oracle_utils import compare_query


@pytest.mark.parametrize("name", sorted(LLM_TEXT_QUERIES))
def test_llm_text_matches_oracle_sf001(spark, oracle_sf_dir, name):
    n, _ = compare_query(
        spark, oracle_sf_dir, LLM_TEXT_QUERIES[name], LLM_TEXT_ORACLES[name], name
    )
    assert n > 0, f"{name}: expected non-trivial result"


def test_jaccard_finds_planted_near_dups(spark, oracle_sf_dir):
    df = LLM_TEXT_QUERIES["q20_ngram_jaccard"](spark, oracle_sf_dir)
    rows = df.collect()
    assert len(rows) > 0
    assert all(r["jaccard"] >= 0.8 for r in rows)


def test_lsh_candidates_superset_of_exact_pairs(spark, oracle_sf_dir):
    """Every j>=0.8 pair must be an LSH candidate (16x4 banding catches
    high-similarity pairs with overwhelming probability on this corpus)."""
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in LLM_TEXT_QUERIES["q20_ngram_jaccard"](spark, oracle_sf_dir).collect()
    }
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in LLM_TEXT_QUERIES["q22_minhash_lsh_pairs"](
            spark, oracle_sf_dir
        ).collect()
    }
    assert exact, "expected planted near-dups"
    missing = exact - cand
    assert not missing, f"LSH missed high-jaccard pairs: {missing}"


def test_winnowing_guarantee(spark):
    """Winnowing's core property: two documents sharing a run of at least
    w + k - 1 tokens must share at least one fingerprint; disjoint-vocab
    documents share none."""
    from snowflake_stock_dbt_spark.operators.textdedup import (
        winnowing_fingerprints,
    )

    shared = "alpha bravo charlie delta echo foxtrot"  # 6 tokens >= w+k-1
    docs = spark.createDataFrame(
        [
            (1, f"one two {shared} three"),
            (2, f"{shared} nine ten eleven"),
            (3, "completely different words entirely here now"),
        ],
        "doc_id long, text string",
    )
    fps = winnowing_fingerprints(docs, "doc_id", "text", k=3, w=4).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2]
    assert not (by_doc[1] & by_doc[3]) and not (by_doc[2] & by_doc[3])


def test_bigram_lm_scores_properties(spark):
    """Toy-model contract for the LM filter (operators/lm.py): quantized
    probabilities stay on [0, 1e9]; a document whose bigrams are corpus-
    frequent outscores one full of one-off bigrams (the filter's whole
    purpose); docs with < 2 tokens don't appear."""
    from snowflake_stock_dbt_spark.operators.lm import bigram_lm_scores

    rows = [(i, "the cat sat") for i in range(5)]
    rows += [(100, "zq xv kw"), (101, "one"), (102, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in bigram_lm_scores(df).collect()}
    assert set(got) == {0, 1, 2, 3, 4, 100}  # 101/102 have no bigrams
    for r in got.values():
        assert 0 <= r["avg_qprob"] <= 1_000_000_000
        assert r["total_qprob"] >= r["avg_qprob"] * r["n_bigrams"]
    # 'the cat'/'cat sat' occur 5x each; 'zq xv'/'xv kw' once
    assert got[0]["avg_qprob"] > got[100]["avg_qprob"]
    assert got[0]["n_bigrams"] == 2
