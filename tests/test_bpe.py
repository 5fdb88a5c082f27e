"""BPE merge-training operator tests (operators/bpe.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_stock_dbt_spark.operators.bpe import (
    _merge_fold,
    bpe_train,
    word_counts,
)


def test_merge_fold_greedy_left(spark):
    df = spark.createDataFrame(
        [(["a", "a", "a"],), (["a", "a", "a", "a"],), (["a", "b", "a", "b"],)],
        "syms array<string>",
    )
    out = [
        r[0]
        for r in df.select(_merge_fold(F.col("syms"), "a", "a")).collect()
    ]
    assert out[0] == ["aa", "a"]  # odd run keeps the trailing singleton
    assert out[1] == ["aa", "aa"]
    assert out[2] == ["a", "b", "a", "b"]  # no (a,a) pair present
    out2 = [
        r[0]
        for r in df.select(_merge_fold(F.col("syms"), "a", "b")).collect()
    ]
    assert out2[2] == ["ab", "ab"]  # non-overlapping merges both apply


def test_word_counts(spark):
    df = spark.createDataFrame(
        [("the cat the hat",), ("  the  ",), ("",)], "text string"
    )
    got = {r["word"]: r["cnt"] for r in word_counts(df, "text").collect()}
    assert got == {"the": 3, "cat": 1, "hat": 1}


def test_bpe_train_deterministic_toy(spark):
    """'low low lower': round 1 must merge ('l','o') — count 3, and ties
    break lexicographically; subsequent merges follow the learned symbol."""
    df = spark.createDataFrame([("low low lower",)], "text string")
    merges = bpe_train(spark, df, "text", n_merges=2).collect()
    r1 = merges[0]
    assert (r1["left_sym"], r1["right_sym"]) == ("l", "o")
    assert r1["pair_count"] == 3
    # 3 words x len: low(3)+low(3)+lower(5)=11 symbols, minus one per merge
    # occurrence: 11 - 3 = 8 after round 1
    assert r1["corpus_symbols_after"] == 8
    r2 = merges[1]
    assert (r2["left_sym"], r2["right_sym"]) == ("lo", "w")
    assert r2["pair_count"] == 3
    assert r2["corpus_symbols_after"] == 5


def test_bpe_train_stops_when_no_pairs(spark):
    df = spark.createDataFrame([("a b c",)], "text string")
    merges = bpe_train(spark, df, "text", n_merges=4).collect()
    assert merges == []  # single-char words have no adjacent pairs


def test_bpe_encode_roundtrip_and_toy(spark):
    """Encoding must be lossless (tokens re-concatenate to the word) and
    follow merge rank order: with merges [(l,o),(lo,w)], 'lower' encodes
    as [low, e, r], 'slow' as [s, low]."""
    from snowflake_stock_dbt_spark.operators.bpe import bpe_encode_words

    words = spark.createDataFrame(
        [("lower",), ("slow",), ("oo",)], "word string"
    )
    got = {
        r["word"]: r["syms"]
        for r in bpe_encode_words(words, [("l", "o"), ("lo", "w")]).collect()
    }
    assert got["lower"] == ["low", "e", "r"]
    assert got["slow"] == ["s", "low"]
    assert got["oo"] == ["o", "o"]  # untouched by unrelated merges
    for w, syms in got.items():
        assert "".join(syms) == w


def test_bpe_encode_agrees_exactly_with_training_totals(spark, sf_dir):
    """EXACT cross-operator gate: tokenizing the corpus with the trained
    merge list must reproduce training's own bookkeeping — the final
    round's corpus_symbols_after IS the total token count of the encoded
    corpus (training applies the same merges to the same word frame).
    Also pins the heuristic bpe_ish_token_count as a sane upper-ish
    proxy, and encoding-without-merges == character count."""
    from snowflake_stock_dbt_spark.operators.bpe import bpe_encode_docs
    from snowflake_stock_dbt_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    merge_rows = bpe_train(spark, docs, "text", n_merges=4).collect()
    merges = [(r["left_sym"], r["right_sym"]) for r in merge_rows]
    enc = bpe_encode_docs(docs, "text", merges)
    total = enc.agg(F.sum("n_bpe_tokens")).first()[0]
    assert total == merge_rows[-1]["corpus_symbols_after"]
    # zero merges degenerates to per-word character counts
    enc0 = bpe_encode_docs(docs, "text", [])
    chars = (
        docs.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("w"))
        .where(F.col("w") != "")
        .agg(F.sum(F.length("w")))
        .first()[0]
    )
    assert enc0.agg(F.sum("n_bpe_tokens")).first()[0] == chars
    # more merges never increases the token count, and words lower-bound it
    words_total = enc.agg(F.sum("n_words")).first()[0]
    assert words_total <= total <= chars


def test_bpe_train_sizes_match_full_aggregation(spark):
    """The r11 optimization derives corpus_symbols_after as
    n_syms -= pair_count for a != b merges (no per-round corpus scan).
    Pin it against the ground-truth aggregation over the re-encoded
    corpus for a mix that exercises BOTH branches: 'eeee' forces an
    a == b merge (overlapping runs, floor(run/2) merges), the rest are
    ordinary a != b merges."""
    from snowflake_stock_dbt_spark.operators.bpe import bpe_encode_words

    rows = [("eeee eeee low low lower",), ("eeee low lowest be bee",)]
    df = spark.createDataFrame(rows, "text string")
    merges = bpe_train(spark, df, "text", n_merges=5).collect()
    assert merges, "training produced no merges"
    wc = word_counts(df, "text")
    merge_list: list[tuple[str, str]] = []
    for m in merges:
        merge_list.append((m["left_sym"], m["right_sym"]))
        enc = bpe_encode_words(wc, merge_list)
        truth = enc.agg(
            F.sum(F.col("cnt") * F.size("syms")).alias("s")
        ).collect()[0]["s"]
        assert m["corpus_symbols_after"] == truth, (
            f"round {m['round']} ({m['left_sym']},{m['right_sym']}): "
            f"derived {m['corpus_symbols_after']} != aggregated {truth}"
        )
