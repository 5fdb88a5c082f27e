"""[EXT] N-gram language-model scoring — the CCNet-shape quality filter.

Production pretraining pipelines score documents with a small language
model and filter/bucket on the score (CCNet scores with KenLM
perplexity; Gopher/RefinedWeb keep LM-likelihood heuristics in their
rule sets). The distributed formulation is fully relational:

- **train**: bigram counts over the corpus — one keyed aggregation,
  bounded by the realized bigram vocabulary (≪ corpus size at 100 TB);
  history counts are one more aggregation over the count frame, and
  add-one smoothing needs just the distinct-token count;
- **score**: the per-doc bigram stream joins the stats table on the
  bigram key and aggregates per document — two keyed shuffles, the same
  shape as TF-IDF (plans/llm_text.py q58).

Determinism contract (why this is value-oracle-able where true log-space
perplexity is not): every arithmetic step is either exact-integer or a
single correctly-rounded IEEE operation — counts are ints, the smoothed
probability (c+1)/(ch+V) is ONE double division of exactly-representable
ints, the 1e9 quantization is ONE multiply + FLOOR, and all sums/ratios
downstream are int64. ``ln``/``exp`` never appear: libm transcendentals
are NOT guaranteed correctly rounded and differ across engines in the
last ulp, which is exactly the cross-engine trap PLANS.md documents for
STDDEV. The quantized mean conditional probability is monotone in the
true per-doc geometric mean for fixed length and serves the same
filter/bucket purpose; a production pipeline wanting real perplexity
exponentiates offline from the same counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.partitioning import ensure_min_parallelism
from ..functions.text import tokens

#: Probability quantization grid: FLOOR(p * 1e9). p <= 1, so quantized
#: values and any realistic corpus-wide sum stay far below 2^53/2^63.
LM_Q_SCALE = 1_000_000_000


def _bigram_stream(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, a, b) for every adjacent token pair, built from the token
    array in place — no self-join, no shuffle. Guarded with size >= 2:
    Spark's sequence(1, 0) is the DESCENDING [1, 0], not empty
    (PLANS.md gotcha)."""
    t = tokens(text_col)
    pairs = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.struct(
                F.element_at(t, i).alias("a"),
                F.element_at(t, i + 1).alias("b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    # Spread docs across the cluster BEFORE the explode fan-out (the
    # _exploded_shingles rule): a one-file local parquet would otherwise
    # pin the tokenize/bigram/hash pipeline to a couple of scan tasks —
    # measured 6s of the 7s q152 cost before this spread.
    return (
        ensure_min_parallelism(df, F.col(id_col))
        .select(F.col(id_col), F.explode(pairs).alias("p"))
        .select(id_col, "p.a", "p.b")
        .where((F.col("a") != "") & (F.col("b") != ""))
    )


def bigram_lm_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Score every document (with >= 2 tokens) by its mean add-one-
    smoothed bigram probability under the corpus's own bigram model:
    returns (id, n_bigrams, total_qprob, avg_qprob) with probabilities
    on the FLOOR(p*1e9) integer grid — bit-identical on any engine.

    p(b|a) = (c(a,b) + 1) / (ch(a) + V), ch(a) = Σ_b c(a,b) (history
    occurrences), V = distinct corpus tokens. The stats table is keyed
    (a, b); the scoring join is the only corpus-sized shuffle.
    """
    # The bigram stream feeds both the count aggregation and the scoring
    # join; persist it once (the exploding HOF dominates its cost).
    bg = _bigram_stream(df, id_col, text_col).persist()
    cnt = bg.groupBy("a", "b").agg(F.count("*").alias("c"))
    hist = cnt.groupBy("a").agg(F.sum("c").alias("ch"))
    vocab = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .where(F.col("w") != "")
        .agg(F.countDistinct("w").alias("v"))
    )
    stats = (
        cnt.join(hist, "a")
        .crossJoin(F.broadcast(vocab))
        .select(
            "a",
            "b",
            F.floor(
                F.lit(float(LM_Q_SCALE))
                * (
                    (F.col("c") + 1).cast("double")
                    / (F.col("ch") + F.col("v")).cast("double")
                )
            )
            .cast("long")
            .alias("qp"),
        )
    )
    return (
        bg.join(stats, ["a", "b"])
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum("qp").cast("long").alias("total_qprob"),
            F.expr("sum(qp) div count(*)").cast("long").alias("avg_qprob"),
        )
    )


COLLOC_MIN_SUPPORT = 5
COLLOC_TOP_N = 50


def collocations_by_lift(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    min_support: int = COLLOC_MIN_SUPPORT, top_n: int = COLLOC_TOP_N,
) -> DataFrame:
    """[EXT] Collocation mining: the top-N adjacent token pairs by LIFT
    c(a,b)·N / (c(a)·c(b)) with a minimum support — the association
    measure under PMI without its logarithm (PMI = log2(lift) is
    monotone in it, and ``ln`` is the cross-engine trap lm.py documents),
    so the ranking is identical and the statistic carries a full value
    oracle. The phrase-detection step tokenizer pipelines run before
    merging multiword units.

    Scale shape: unigram and bigram counts are vocabulary-bounded keyed
    aggs (map-side combined); the stats joins key on tokens; N is a
    1-row broadcast; the lift is ONE double division of exact int64
    products (< 2^53 far beyond gate scale); top-N is a sort-limit
    (TakeOrderedAndProject), never a global window.
    """
    toks = df.select(F.explode(tokens(text_col)).alias("tok")).where(
        F.col("tok") != ""
    )
    uni = toks.groupBy("tok").agg(F.count("*").alias("c"))
    total = uni.agg(F.sum("c").alias("n_tokens"))
    bg = (
        _bigram_stream(df, id_col, text_col)
        .groupBy("a", "b")
        .agg(F.count("*").alias("c_ab"))
        .where(F.col("c_ab") >= min_support)
    )
    lift = (
        (F.col("c_ab") * F.col("n_tokens")).cast("double")
        / (F.col("c_a") * F.col("c_b")).cast("double")
    )
    return (
        bg.join(uni.select(F.col("tok").alias("a"), F.col("c").alias("c_a")), "a")
        .join(uni.select(F.col("tok").alias("b"), F.col("c").alias("c_b")), "b")
        .crossJoin(F.broadcast(total))
        .select(
            "a", "b", "c_ab", "c_a", "c_b",
            F.round(lift, 9).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "a", "b")
        .limit(top_n)
    )
