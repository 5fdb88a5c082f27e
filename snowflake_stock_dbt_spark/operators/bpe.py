"""Distributed BPE merge training (byte-pair encoding, Sennrich 2016).

Tokenizer training is a first-class training-data-pipeline operation: the
merge table IS the tokenizer. The classic algorithm is sequential
(count adjacent symbol pairs → merge the most frequent → repeat); the
distributed formulation keeps every heavy step relational:

- the corpus collapses to DISTINCT words with counts (one keyed agg —
  at 100 TB the word-count frame is bounded by vocabulary, not rows);
- each round's pair statistics are one map-side-combinable aggregation
  over the word frame (adjacent symbol pairs weighted by word count);
- the argmax merge decision is a driver-side collect of ONE row per
  round (the same bounded-probe pattern as operators/graph.py);
- applying a merge is a map-only array fold per word — greedy
  left-to-right, exactly the sequential algorithm's semantics (overlap
  only matters for a==b runs, where the fold keeps odd occurrences).

Per round: one shuffle (pair agg) + two 1-row collects. Lineage is
truncated every few rounds with localCheckpoint so N rounds stay N
shuffles, not a 2^N plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from ..functions.localframe import local_frame

from ..functions.text import tokens


def word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Distinct words with corpus frequencies (the BPE working set)."""
    return (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def _merge_fold(syms, a: str, b: str):
    """Greedy left-to-right merge of adjacent (a, b) into a||b — the fold
    mirrors sequential BPE: a freshly-merged symbol is never reused as
    the left side of an overlapping merge (for a==b runs this keeps the
    1st, 3rd, ... occurrences)."""
    la, lb = F.lit(a), F.lit(b)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == la)
            & (x == lb)
            # element_at(-1) of the PRE-merge acc could itself be a fresh
            # merge; guard with a sentinel-free check: a merged last
            # element equals a||b, which only collides with `a` when
            # b == '' (impossible: symbols are non-empty).
            ,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(la, lb)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    spark: SparkSession,
    df: DataFrame,
    text_col: str,
    n_merges: int = 6,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges; returns the merge table
    (round, left_sym, right_sym, pair_count, corpus_symbols_after).

    Ties in pair frequency break deterministically to the
    lexicographically smallest (left, right) pair, so the merge table is
    engine- and partitioning-independent (all-integer/string output).
    """
    words = word_counts(df, text_col).withColumn(
        "syms", F.expr("regexp_extract_all(word, '.', 0)")
    )
    n_syms = None  # computed lazily below; carried across rounds
    rows = []
    for r in range(1, n_merges + 1):
        pairs = (
            words.where(F.size("syms") >= 2)
            .select(
                "cnt",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("syms") - 1),
                        lambda i: F.struct(
                            F.element_at(F.col("syms"), i).alias("a"),
                            F.element_at(F.col("syms"), i + 1).alias("b"),
                        ),
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("pc"))
        )
        best = pairs.orderBy(
            F.desc("pc"), F.asc("a"), F.asc("b")
        ).limit(1).collect()
        if not best:
            break
        a, b, pc = best[0]["a"], best[0]["b"], best[0]["pc"]
        # Checkpoint EVERY round (lazily): each post-merge state feeds two
        # jobs — this round's symbol-count agg and the next round's pair
        # agg — so materializing it once halves the per-round work; with
        # the old every-3rd-round policy both jobs re-ran up to three
        # chained merge folds (measured 9.4s -> 3.7s at sf0.1).
        if n_syms is None:
            # One-time pre-merge size of the character-level corpus —
            # folded into the same round as the first merge decision.
            n_syms = words.agg(
                F.sum(F.col("cnt") * F.size("syms")).alias("s")
            ).collect()[0]["s"]
        words = words.withColumn(
            "syms", _merge_fold(F.col("syms"), a, b)
        ).localCheckpoint(eager=False)
        if a != b:
            # A merged occurrence removes exactly one symbol, and for
            # a != b the greedy fold merges EVERY counted (a, b)
            # adjacency: overlap of two occurrences would need the
            # shared symbol to be both a right `b` and a left `a`,
            # i.e. a == b; and a fresh merge (the string a||b) can never
            # equal `a` (b is non-empty), so no chained re-merge either.
            # n_syms is therefore derivable without a corpus scan —
            # one full-frame job per round removed (opt r11); pinned
            # against the aggregated size in tests/test_bpe.py.
            n_syms -= int(pc)
        else:
            # a == b runs CAN overlap (pc counts run_len-1 adjacencies,
            # the fold merges floor(run_len/2)) — pay the exact scan.
            n_syms = words.agg(
                F.sum(F.col("cnt") * F.size("syms")).alias("s")
            ).collect()[0]["s"]
        rows.append((r, a, b, int(pc), int(n_syms)))
    return local_frame(
        spark,
        rows,
        "round int, left_sym string, right_sym string, "
        "pair_count bigint, corpus_symbols_after bigint",
    )


def bpe_encode_words(
    words: DataFrame, merges: list[tuple[str, str]], word_col: str = "word"
) -> DataFrame:
    """Apply a trained merge list to a frame of distinct words: adds
    ``syms`` (array<string>) — the word's BPE token sequence.

    Exactly the sequential tokenizer's semantics: characters, then each
    merge applied greedily left-to-right IN TRAINING ORDER (rank order
    is what makes BPE encoding deterministic). The merge list is the
    tokenizer artifact itself — bounded driver state (n_merges rows,
    like MLlib model coefficients), embedded as literals in one chained
    fold per merge, so encoding is a pure map-side projection: zero
    shuffles over the vocabulary frame, whole-stage codegen end to end.
    """
    col = F.expr(f"regexp_extract_all({word_col}, '.', 0)")
    for a, b in merges:
        col = _merge_fold(col, a, b)
    return words.withColumn("syms", col)


def bpe_encode_docs(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize a document corpus with a trained merge list; returns
    (id, n_words, n_bpe_tokens, token_sha) — count plus an order-exact
    sha256 digest of the token stream, so the full encoding (not just
    its length) is value-checkable.

    Scale shape: encode the DISTINCT-word vocabulary once (map-only,
    vocabulary-bounded — the word_counts trick training already uses),
    then one equi-join from the exploded word stream back to the
    encoded vocabulary and one keyed agg per document. Two shuffles
    total, both on high-cardinality keys (word, id); the join's build
    side is vocabulary-sized and broadcastable when small.
    """
    words = df.select(
        F.col(id_col),
        F.posexplode(tokens(text_col)).alias("wpos", "word"),
    ).where(F.col("word") != "")
    vocab = bpe_encode_words(
        words.select("word").distinct(), merges
    ).select(
        "word",
        F.size("syms").alias("ntok"),
        F.array_join("syms", " ").alias("toks_str"),
    )
    return (
        words.join(vocab, "word")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("ntok").cast("long").alias("n_bpe_tokens"),
            F.sha2(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("wpos", "toks_str"))
                        ),
                        lambda s: s["toks_str"],
                    ),
                    " ",
                ),
                256,
            ).alias("token_sha"),
        )
    )
