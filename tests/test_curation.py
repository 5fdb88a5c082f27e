"""Corpus-curation queries (q70-q74) vs their DuckDB oracles, plus semantic
invariants the oracles alone don't state."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from snowflake_stock_dbt_spark.plans.curation import (
    BENCH_SOURCE,
    CURATION_ORACLES,
    CURATION_QUERIES,
    STRATUM_RATES,
)
from .oracle_utils import compare_query


@pytest.mark.parametrize("name", sorted(CURATION_QUERIES))
def test_curation_matches_oracle_sf001(spark, oracle_sf_dir, name):
    n, _ = compare_query(
        spark, oracle_sf_dir, CURATION_QUERIES[name], CURATION_ORACLES[name], name
    )
    assert n > 0


def test_stratified_sample_tracks_target_rates(spark, oracle_sf_dir):
    rows = CURATION_QUERIES["q71_stratified_sample"](spark, oracle_sf_dir).collect()
    by_lang = {r["lang"]: r for r in rows}
    for lang, pct in STRATUM_RATES.items():
        if lang in by_lang and by_lang[lang]["n_docs"] >= 50:
            # Deterministic-hash sampling concentrates near the target rate.
            assert abs(by_lang[lang]["kept_frac"] - pct / 100) < 0.2, lang


def test_decontamination_excludes_benchmark_docs(spark, oracle_sf_dir):
    from snowflake_stock_dbt_spark.sources.tables import load_table

    out = CURATION_QUERIES["q73_decontamination"](spark, oracle_sf_dir)
    docs = load_table(spark, oracle_sf_dir, "documents")
    bench_ids = {
        r["doc_id"]
        for r in docs.where(F.col("source") == BENCH_SOURCE)
        .select("doc_id")
        .collect()
    }
    out_ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert not (out_ids & bench_ids)
    assert out_ids  # train side is non-empty


def test_dedup_survivors_only_multi_member_clusters(spark, oracle_sf_dir):
    rows = CURATION_QUERIES["q74_dedup_survivors"](spark, oracle_sf_dir).collect()
    assert rows
    for r in rows:
        assert r["cluster_size"] >= 2
        assert r["n_dropped"] == r["cluster_size"] - 1
        assert r["chars_dropped"] > 0


def test_repetition_flags_planted_repetitive_doc(spark, oracle_sf_dir):
    """A degenerate all-same-token document must be flagged; signals stay in
    [0, 1]."""
    from snowflake_stock_dbt_spark.plans import curation as C

    out = CURATION_QUERIES["q70_repetition_signals"](spark, oracle_sf_dir)
    stats = out.agg(
        F.min("distinct_ratio"), F.max("distinct_ratio"),
        F.min("top_bigram_frac"), F.max("top_bigram_frac"),
    ).first()
    for v in stats:
        assert 0.0 <= v <= 1.0
    # Planted check on a constructed frame (not the corpus): pure repetition.
    docs = spark.createDataFrame(
        [(1, "spam " * 50), (2, "a unique stream of distinct tokens here")],
        "doc_id long, text string",
    ).withColumn("lang", F.lit("en")).withColumn("source", F.lit("x")).withColumn(
        "n_chars", F.length("text")
    )
    import snowflake_stock_dbt_spark.sources.tables as tables

    orig = tables.load_table
    try:
        tables.load_table = lambda s, d, n: docs  # noqa: ARG005
        C.load_table = tables.load_table
        flagged = {
            r["doc_id"]: r["is_repetitive"]
            for r in CURATION_QUERIES["q70_repetition_signals"](
                spark, oracle_sf_dir
            ).collect()
        }
    finally:
        tables.load_table = orig
        C.load_table = orig
    assert flagged[1] is True
    assert flagged[2] is False


def test_pii_functions_detect_and_redact(spark):
    from snowflake_stock_dbt_spark.functions.text import pii_count, redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@corp.example.org or call 555-123-4567"),
            (2, "server 192.168.1.100 ssn 123-45-6789"),
            (3, "nothing sensitive here, just 12345 and v1.2.3"),
        ],
        "id long, t string",
    )
    out = df.select(
        "id",
        pii_count("t", "email").alias("e"),
        pii_count("t", "phone").alias("p"),
        pii_count("t", "ipv4").alias("ip"),
        pii_count("t", "ssn").alias("s"),
        redact_pii("t").alias("r"),
    )
    rows = {r["id"]: r for r in out.collect()}
    assert (rows[1]["e"], rows[1]["p"]) == (1, 1)
    assert (rows[2]["ip"], rows[2]["s"]) == (1, 1)
    assert (rows[3]["e"], rows[3]["p"], rows[3]["ip"], rows[3]["s"]) == (0, 0, 0, 0)
    assert "jane" not in rows[1]["r"] and "[PII]" in rows[1]["r"]
    assert "123-45-6789" not in rows[2]["r"] and "192.168" not in rows[2]["r"]
    assert rows[3]["r"] == "nothing sensitive here, just 12345 and v1.2.3"
