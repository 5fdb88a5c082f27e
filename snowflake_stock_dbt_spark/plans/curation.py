"""Corpus-curation queries (q70-q74): the operations a training-data
pipeline runs between "raw crawl" and "training mix" — repetition filtering,
stratified sampling, vocabulary profiling, benchmark decontamination, and
dedup survivor selection. No reference counterpart (the reference is a
stock dashboard); these extend the LLM-pipeline surface the same way
plans/llm_text.py does, with full DuckDB value oracles.

Scale shapes (100 TB):
- q70/q72 are explode -> keyed agg with map-side partial aggregation; the
  shuffle key includes doc_id/source so no reducer sees more than one
  document/source worth of token counts.
- q71 is a scan-only projection + small agg (the sampling decision is a
  deterministic hash per row — no shuffle to decide membership).
- q73 broadcasts the benchmark shingle set (benchmarks are tiny next to a
  crawl) into a semi-join against the train side's shingles.
- q74 reuses the q54 component labels (label propagation, one join + one
  min-agg per round) and adds one keyed agg on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import SQL_DEC_SUM, dec_sum
from ..functions.partitioning import ensure_min_parallelism
from ..functions.text import (
    PII_PATTERNS,
    hash60,
    hash60_sql,
    pii_count,
    redact_pii,
    shingles_from_tokens,
    tokens,
)
from ..operators.textdedup import minhash_lsh_pairs
from ..sources.tables import load_table
from .llm_text import _SQL_SHINGLES, _SQL_TOKS, Q54_CTES

# ---------------------------------------------------------------------------
# Q70 — Repetition signals (the Gopher/C4 quality-filter family): per-doc
# duplicate-token ratio, most-frequent-token share, most-frequent-bigram
# share. All ratios are quotients of exact integers, so the doubles are
# bit-identical cross-engine.
# ---------------------------------------------------------------------------

#: A doc is flagged repetitive when its top bigram covers > 20% of bigram
#: slots or fewer than 30% of its tokens are distinct (Gopher-style cutoffs).
REP_TOP_BIGRAM_MAX = 0.20
REP_DISTINCT_MIN = 0.30


def q70_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # Pre-spread + persist: the token array feeds three branches (sizes,
    # unigram counts, bigram counts); tokenization should run once.
    toks = (
        ensure_min_parallelism(docs, F.col("doc_id"))
        .select("doc_id", tokens("text").alias("t"))
        .persist()
    )
    base = toks.select(
        "doc_id",
        F.size("t").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("t")).cast("long").alias("n_distinct"),
    )
    top_uni = (
        toks.select("doc_id", F.explode("t").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_token_n"))
    )
    bigrams = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at("t", i), F.element_at("t", i + 1)
                ),
            )
        ).alias("bg"),
    )
    top_bi = (
        bigrams.groupBy("doc_id", "bg")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bigram_n"))
    )
    out = (
        base.join(top_uni, "doc_id")
        .join(top_bi, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_distinct") / F.col("n_tokens")).alias("distinct_ratio"),
            (F.col("top_token_n") / F.col("n_tokens")).alias("top_token_frac"),
            (F.col("top_bigram_n") / (F.col("n_tokens") - 1)).alias(
                "top_bigram_frac"
            ),
        )
        .withColumn(
            "is_repetitive",
            (F.col("top_bigram_frac") > REP_TOP_BIGRAM_MAX)
            | (F.col("distinct_ratio") < REP_DISTINCT_MIN),
        )
    )
    return out.orderBy("doc_id")


Q70_SQL = rf"""
WITH {_SQL_TOKS},
base AS (
    SELECT doc_id, len(t) AS n_tokens,
           len(list_distinct(t)) AS n_distinct
    FROM toks
),
uni AS (
    SELECT doc_id, MAX(c) AS top_token_n FROM (
        SELECT doc_id, u.tok, COUNT(*) AS c
        FROM toks, UNNEST(t) AS u(tok)
        GROUP BY doc_id, u.tok
    ) GROUP BY doc_id
),
bi AS (
    SELECT doc_id, MAX(c) AS top_bigram_n FROM (
        SELECT doc_id, t[i+1] || ' ' || t[i+2] AS bg, COUNT(*) AS c
        FROM toks, UNNEST(range(0, GREATEST(len(t) - 1, 0))) AS r(i)
        GROUP BY doc_id, bg
    ) GROUP BY doc_id
)
SELECT base.doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_distinct AS DOUBLE) / n_tokens AS distinct_ratio,
       CAST(top_token_n AS DOUBLE) / n_tokens AS top_token_frac,
       CAST(top_bigram_n AS DOUBLE) / (n_tokens - 1) AS top_bigram_frac,
       (CAST(top_bigram_n AS DOUBLE) / (n_tokens - 1) > {REP_TOP_BIGRAM_MAX}
        OR CAST(n_distinct AS DOUBLE) / n_tokens < {REP_DISTINCT_MIN})
           AS is_repetitive
FROM base JOIN uni USING (doc_id) JOIN bi USING (doc_id)
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Q71 — Stratified sampling: rebalance the language mix with per-language
# keep rates decided by a deterministic per-row hash (no shuffle, no RNG
# state, reproducible across engines and re-runs).
# ---------------------------------------------------------------------------

#: Keep-rate percent per language; the catch-all rate downsamples the tail.
STRATUM_RATES = {"en": 80, "es": 40, "de": 40}
STRATUM_DEFAULT_RATE = 10


def q71_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    rate = F.lit(STRATUM_DEFAULT_RATE)
    for lang, pct in STRATUM_RATES.items():
        rate = F.when(F.col("lang") == lang, F.lit(pct)).otherwise(rate)
    keep = (hash60(F.col("doc_id").cast("string")) % 100) < rate
    return (
        docs.select("lang", keep.alias("keep"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("long").alias("n_kept"),
        )
        .withColumn("kept_frac", F.col("n_kept") / F.col("n_docs"))
        .orderBy("lang")
    )


_RATE_CASE = " ".join(
    f"WHEN lang = '{lang}' THEN {pct}" for lang, pct in STRATUM_RATES.items()
)

Q71_SQL = f"""
WITH h AS (
    SELECT lang,
           {hash60_sql("CAST(doc_id AS VARCHAR)")} % 100
               < (CASE {_RATE_CASE} ELSE {STRATUM_DEFAULT_RATE} END) AS keep
    FROM documents
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
           AS kept_frac
FROM h
GROUP BY lang
ORDER BY lang
"""


# ---------------------------------------------------------------------------
# Q72 — Per-source vocabulary profile: corpus-mix reporting (docs, token
# volume, exact distinct vocabulary, type-token ratio) grouped by source.
# countDistinct is exact here (profiling); q46 carries the HLL sketch twin
# for the approximate-at-scale path.
# ---------------------------------------------------------------------------


def q72_source_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(tokens("text")).alias("tok"))
    return (
        tok.groupBy("source")
        .agg(
            F.count("*").alias("total_tokens"),
            F.countDistinct("tok").alias("vocab_size"),
        )
        .join(
            docs.groupBy("source").agg(F.count("*").alias("n_docs")), "source"
        )
        .select(
            "source",
            "n_docs",
            "total_tokens",
            "vocab_size",
            (F.col("vocab_size") / F.col("total_tokens")).alias("type_token_ratio"),
            (F.col("total_tokens") / F.col("n_docs")).alias("avg_doc_tokens"),
        )
        .orderBy("source")
    )


Q72_SQL = rf"""
WITH {_SQL_TOKS},
flat AS (
    SELECT d.source, u.tok
    FROM toks JOIN documents d USING (doc_id), UNNEST(t) AS u(tok)
),
agg AS (
    SELECT source, COUNT(*) AS total_tokens,
           COUNT(DISTINCT tok) AS vocab_size
    FROM flat GROUP BY source
),
nd AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source)
SELECT source, n_docs, total_tokens, vocab_size,
       CAST(vocab_size AS DOUBLE) / total_tokens AS type_token_ratio,
       CAST(total_tokens AS DOUBLE) / n_docs AS avg_doc_tokens
FROM agg JOIN nd USING (source)
ORDER BY source
"""


# ---------------------------------------------------------------------------
# Q73 — Benchmark decontamination: fraction of each training document's
# 3-word shingles that appear anywhere in the "benchmark" partition
# (source = src0 stands in for an eval set). The benchmark shingle set is
# broadcast — benchmarks are KBs-to-MBs next to a crawl — so the check adds
# no extra shuffle over the train corpus.
# ---------------------------------------------------------------------------

BENCH_SOURCE = "src0"
CONTAM_THRESHOLD = 0.5


def q73_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # Spread before the shingle fan-out (single-file inputs pin parallelism)
    # and persist the exploded frame: it feeds three branches (bench set,
    # per-doc sizes, the semi-join probe) and the tokenize/shingle HOFs are
    # the dominant cost — recomputing them per branch measured 33 s vs 2 s
    # at sf0.1.
    toks = ensure_min_parallelism(docs, F.col("doc_id")).select(
        "doc_id", "source", tokens("text").alias("t")
    )
    sh_flat = toks.select(
        "doc_id",
        "source",
        F.explode(shingles_from_tokens("t")).alias("s"),
    ).persist()
    bench_set = (
        sh_flat.where(F.col("source") == BENCH_SOURCE).select("s").distinct()
    )
    train_sh = sh_flat.where(F.col("source") != BENCH_SOURCE)
    base = train_sh.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_shingles")
    )
    hits = (
        train_sh.join(F.broadcast(bench_set), "s", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        base.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_overlap"),
            (
                F.coalesce(F.col("n_hits"), F.lit(0)) / F.col("n_shingles")
            ).alias("overlap_frac"),
        )
        .withColumn(
            "is_contaminated", F.col("overlap_frac") >= CONTAM_THRESHOLD
        )
        .orderBy("doc_id")
    )


Q73_SQL = rf"""
WITH {_SQL_TOKS}, {_SQL_SHINGLES},
src AS (SELECT doc_id, source FROM documents),
bench AS (
    SELECT DISTINCT shingle FROM sh JOIN src USING (doc_id)
    WHERE src.source = '{BENCH_SOURCE}'
),
train AS (
    SELECT sh.doc_id, sh.shingle FROM sh JOIN src USING (doc_id)
    WHERE src.source <> '{BENCH_SOURCE}'
),
counts AS (
    SELECT doc_id,
           COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN shingle IN (SELECT shingle FROM bench)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap
    FROM train GROUP BY doc_id
)
SELECT doc_id, n_shingles, n_overlap,
       CAST(n_overlap AS DOUBLE) / n_shingles AS overlap_frac,
       CAST(n_overlap AS DOUBLE) / n_shingles >= {CONTAM_THRESHOLD}
           AS is_contaminated
FROM counts
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Q74 — Dedup survivor report: aggregate the q54 near-dup components into
# per-cluster rows (keeper, members dropped, bytes saved) — the number a
# curation run actually reports ("dedup removed N docs / M bytes").
# ---------------------------------------------------------------------------


def q74_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import neardup_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", k=3)
    comp = neardup_components(pairs, docs, id_col="doc_id")
    return (
        comp.join(docs.select("doc_id", "n_chars"), "doc_id")
        .groupBy("component")
        .agg(
            F.count("*").alias("cluster_size"),
            F.sum(F.when(~F.col("is_keeper"), F.col("n_chars")).otherwise(0))
            .cast("long")
            .alias("chars_dropped"),
        )
        .where(F.col("cluster_size") > 1)
        .select(
            F.col("component").alias("keeper_doc_id"),
            F.col("cluster_size").cast("long").alias("cluster_size"),
            (F.col("cluster_size") - 1).cast("long").alias("n_dropped"),
            "chars_dropped",
        )
        .orderBy("keeper_doc_id")
    )


Q74_SQL = (
    Q54_CTES
    + """
SELECT comp.component AS keeper_doc_id,
       CAST(sizes.cluster_size AS BIGINT) AS cluster_size,
       CAST(sizes.cluster_size - 1 AS BIGINT) AS n_dropped,
       CAST(SUM(CASE WHEN comp.doc_id <> comp.component THEN d.n_chars
                     ELSE 0 END) AS BIGINT) AS chars_dropped
FROM comp
JOIN documents d USING (doc_id)
JOIN sizes USING (component)
WHERE sizes.cluster_size > 1
GROUP BY comp.component, sizes.cluster_size
ORDER BY keeper_doc_id
"""
)


# ---------------------------------------------------------------------------
# Q76 — Per-domain contribution cap (the C4/RefinedWeb "no domain dominates
# the mix" rule): keep at most DOMAIN_CAP docs per source, chosen by
# deterministic hash order so the subset is reproducible and unbiased by
# doc_id assignment. One ranking window per source partition — the shuffle
# key is the domain, exactly the cardinality that needs balancing.
# ---------------------------------------------------------------------------

DOMAIN_CAP = 20


def q76_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    h = hash60(F.col("doc_id").cast("string"))
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id", "source")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .withColumn("kept", F.col("rk") <= DOMAIN_CAP)
        .orderBy("doc_id")
    )


Q76_SQL = f"""
WITH ranked AS (
    SELECT doc_id, source,
           ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY {hash60_sql("CAST(doc_id AS VARCHAR)")}, doc_id
           ) AS rk
    FROM documents
)
SELECT doc_id, source, CAST(rk AS BIGINT) AS rk, rk <= {DOMAIN_CAP} AS kept
FROM ranked
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Q77 — PII scrub report: per-source counts of each PII category plus the
# redaction byte delta. The synthetic corpus carries no PII, so the query
# plants a deterministic probe suffix on a doc_id-keyed subset — both
# engines build the identical text, making the regex-engine parity (Java vs
# RE2, restricted to their common subset) the thing actually under test.
# Per-row regexp_count/replace is embarrassingly parallel; the only shuffle
# is the final per-source rollup.
# ---------------------------------------------------------------------------


def q77_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    probe = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com"),
            ),
        ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 7 == 0, F.lit(" call 555-123-4567")).otherwise(
            F.lit("")
        ),
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(
                F.lit(" host 10.0.0."), (F.col("doc_id") % 256).cast("string")
            ),
        ).otherwise(F.lit("")),
    )
    probed = docs.select("source", probe.alias("t"))
    return (
        probed.groupBy("source")
        .agg(
            F.sum(pii_count("t", "email")).cast("long").alias("n_emails"),
            F.sum(pii_count("t", "phone")).cast("long").alias("n_phones"),
            F.sum(pii_count("t", "ipv4")).cast("long").alias("n_ips"),
            F.sum(pii_count("t", "ssn")).cast("long").alias("n_ssns"),
            F.sum(F.length("t") - F.length(redact_pii("t")))
            .cast("long")
            .alias("chars_redacted"),
        )
        .orderBy("source")
    )


def _pii_probe_sql() -> str:
    return """text
        || CASE WHEN doc_id % 5 = 0
                THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                ELSE '' END
        || CASE WHEN doc_id % 7 = 0 THEN ' call 555-123-4567' ELSE '' END
        || CASE WHEN doc_id % 11 = 0
                THEN ' host 10.0.0.' || CAST(doc_id % 256 AS VARCHAR)
                ELSE '' END"""


def _pii_redact_sql(expr: str) -> str:
    for pat in PII_PATTERNS.values():
        expr = f"regexp_replace({expr}, '{pat}', '[PII]', 'g')"
    return expr


Q77_SQL = f"""
WITH probed AS (SELECT source, {_pii_probe_sql()} AS t FROM documents)
SELECT source,
       CAST(SUM(len(regexp_extract_all(t, '{PII_PATTERNS["email"]}'))) AS BIGINT) AS n_emails,
       CAST(SUM(len(regexp_extract_all(t, '{PII_PATTERNS["phone"]}'))) AS BIGINT) AS n_phones,
       CAST(SUM(len(regexp_extract_all(t, '{PII_PATTERNS["ipv4"]}'))) AS BIGINT) AS n_ips,
       CAST(SUM(len(regexp_extract_all(t, '{PII_PATTERNS["ssn"]}'))) AS BIGINT) AS n_ssns,
       CAST(SUM(len(t) - len({_pii_redact_sql("t")})) AS BIGINT) AS chars_redacted
FROM probed
GROUP BY source
ORDER BY source
"""


# ---------------------------------------------------------------------------
# Q89 — Sequence packing: assign documents to fixed token-budget context
# windows by running offset (offset-based packing — the throughput-oriented
# scheme sequence trainers use when exact bin-packing isn't worth a global
# sort). Deterministic: docs are laid out per source in doc_id order; a doc
# belongs to the bin its starting offset falls in.
#
# Scale shape: one window cumsum per source partition (single shuffle on
# source), then a keyed agg on (source, bin). No driver-side loop, no
# global sort — at 100 TB each source's layout is an independent prefix sum.
# ---------------------------------------------------------------------------

PACK_BUDGET_TOKENS = 2048


def q89_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    laid = docs.select(
        "source",
        "doc_id",
        token_count("text").alias("n_tok"),
    ).withColumn("cum", F.sum("n_tok").over(w))
    binned = laid.select(
        "source",
        "doc_id",
        "n_tok",
        F.floor((F.col("cum") - F.col("n_tok")) / PACK_BUDGET_TOKENS)
        .cast("long")
        .alias("bin"),
    )
    return (
        binned.groupBy("source", "bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("source", "bin")
    )


Q89_SQL = f"""
WITH laid AS (
    SELECT source, doc_id,
           CASE WHEN TRIM(text) = '' THEN 0
                ELSE len(string_split_regex(TRIM(text), '\\s+')) END AS n_tok
    FROM documents
),
cums AS (
    SELECT source, doc_id, n_tok,
           SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM laid
)
SELECT source,
       CAST((cum - n_tok) // {PACK_BUDGET_TOKENS} AS BIGINT) AS bin,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM cums
GROUP BY source, bin
ORDER BY source, bin
"""


# ---------------------------------------------------------------------------
# Q90 — Distribution-drift check (chi-square homogeneity): does the
# event-type mix change between the first and second half of the month?
# The two-snapshot contingency test a pipeline runs before accepting a new
# data drop. Counts are exact integers; expected counts and the statistic
# are the same double expression on both engines, so the result is
# bit-identical.
#
# The contingency table is DENSIFIED to the full periods × types grid
# (observed-only cells would drop the expected-count term of any
# (period, type) combo absent from one period — biasing the statistic low
# exactly when drift adds/removes a type, the case the check exists to
# catch — and would let dof disagree with (r-1)(c-1)).
#
# Scale shape: one keyed agg to the (period × type) contingency table
# (tiny), the dense grid is a cross join of the two distinct-value frames
# (both broadcast-sized), then broadcast joins of the margin aggregates —
# the 100 TB cost is the first scan, everything after is constant-size.
# ---------------------------------------------------------------------------

_DRIFT_SPLIT = "2024-01-16 00:00:00"


def q90_drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cells = (
        ev.select(
            F.when(
                F.col("ts") < F.to_timestamp(F.lit(_DRIFT_SPLIT)), "before"
            )
            .otherwise("after")
            .alias("period"),
            "event_type",
        )
        .groupBy("period", "event_type")
        .agg(F.count("*").alias("o"))
    )
    grid = (
        cells.select("period")
        .distinct()
        .crossJoin(cells.select("event_type").distinct())
    )
    dense = grid.join(cells, ["period", "event_type"], "left").select(
        "period", "event_type", F.coalesce("o", F.lit(0)).alias("o")
    )
    row_tot = dense.groupBy("period").agg(F.sum("o").alias("rt"))
    col_tot = dense.groupBy("event_type").agg(F.sum("o").alias("ct"))
    n_tot = dense.agg(F.sum("o").alias("n"))
    joined = (
        dense.join(F.broadcast(row_tot), "period")
        .join(F.broadcast(col_tot), "event_type")
        .crossJoin(F.broadcast(n_tot))
    )
    e = (
        F.col("rt").cast("double")
        * F.col("ct").cast("double")
        / F.col("n").cast("double")
    )
    dev = (F.col("o").cast("double") - e) * (F.col("o").cast("double") - e) / e
    return joined.agg(
        F.sum(dev.cast("decimal(38,6)")).cast("double").alias("chi2"),
        (
            (F.countDistinct("period") - F.lit(1))
            * (F.countDistinct("event_type") - F.lit(1))
        ).alias("dof"),
        F.max("n").alias("n"),
    )


Q90_SQL = f"""
WITH cells AS (
    SELECT CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '{_DRIFT_SPLIT}'
                THEN 'before' ELSE 'after' END AS period,
           event_type, COUNT(*) AS o
    FROM events GROUP BY 1, 2
),
grid AS (
    SELECT p.period, t.event_type
    FROM (SELECT DISTINCT period FROM cells) p
    CROSS JOIN (SELECT DISTINCT event_type FROM cells) t
),
dense AS (
    SELECT g.period, g.event_type, COALESCE(c.o, 0) AS o
    FROM grid g LEFT JOIN cells c
      ON g.period = c.period AND g.event_type = c.event_type
),
rt AS (SELECT period, SUM(o) AS rt FROM dense GROUP BY 1),
ct AS (SELECT event_type, SUM(o) AS ct FROM dense GROUP BY 1),
n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM dense)
SELECT CAST(SUM(CAST(
           (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
         * (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
         / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
       AS DECIMAL(38,6))) AS DOUBLE) AS chi2,
       CAST((COUNT(DISTINCT dense.period) - 1)
          * (COUNT(DISTINCT dense.event_type) - 1) AS BIGINT) AS dof,
       MAX(n.n) AS n
FROM dense, rt, ct, n
WHERE dense.period = rt.period AND dense.event_type = ct.event_type
"""


# ---------------------------------------------------------------------------
# Q101 — Curation verdict: the end-to-end per-document keep/drop decision a
# training-data pipeline actually ships — length bounds, quality score,
# repetition (distinct-token ratio), and PII (on the q77 planted probe so
# the signal has real hits) composed into one verdict with a precedence-
# ordered drop reason. Every signal is a native column expression computed
# in ONE scan pass; the oracle replays the identical arithmetic.
# ---------------------------------------------------------------------------

VERDICT_MIN_TOKENS = 20
VERDICT_MAX_TOKENS = 1000
VERDICT_MIN_QUALITY = 0.5
VERDICT_MIN_DISTINCT = 0.30


def q101_curation_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import pii_count, quality_score, token_count

    docs = load_table(spark, sf_dir, "documents")
    probe = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com"),
            ),
        ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 7 == 0, F.lit(" call 555-123-4567")).otherwise(
            F.lit("")
        ),
    )
    toks = docs.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        quality_score("text").alias("quality"),
        (
            F.size(F.array_distinct(tokens("text"))).cast("double")
            / F.size(tokens("text")).cast("double")
        ).alias("distinct_ratio"),
        (
            pii_count(probe, "email")
            + pii_count(probe, "phone")
            + pii_count(probe, "ipv4")
            + pii_count(probe, "ssn")
        ).alias("pii_total"),
    )
    reason = (
        F.when(
            (F.col("n_tokens") < VERDICT_MIN_TOKENS)
            | (F.col("n_tokens") > VERDICT_MAX_TOKENS),
            "length",
        )
        .when(F.col("quality") < VERDICT_MIN_QUALITY, "quality")
        .when(F.col("distinct_ratio") < VERDICT_MIN_DISTINCT, "repetition")
        .when(F.col("pii_total") > 0, "pii")
    )
    return toks.select(
        "doc_id",
        "n_tokens",
        "quality",
        "distinct_ratio",
        F.col("pii_total").cast("long").alias("pii_total"),
        reason.isNull().alias("keep"),
        reason.alias("drop_reason"),
    ).orderBy("doc_id")


def _q101_sql() -> str:
    from ..functions.text import PII_PATTERNS, QUALITY_STOPWORDS

    sw = ", ".join(f"'{w}'" for w in QUALITY_STOPWORDS)
    probe = (
        "text || (CASE WHEN doc_id % 5 = 0 THEN ' contact user' || "
        "CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END)"
        " || (CASE WHEN doc_id % 7 = 0 THEN ' call 555-123-4567' ELSE '' END)"
    )
    pii = " + ".join(
        f"len(regexp_extract_all(probe, '{PII_PATTERNS[k]}'))"
        for k in ("email", "phone", "ipv4", "ssn")
    )
    return rf"""
WITH base AS (
    SELECT doc_id, text, {probe} AS probe,
           string_split_regex(TRIM(text), '\s+') AS t,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM documents
),
sig AS (
    SELECT doc_id,
           CASE WHEN TRIM(text) = '' THEN 0
                ELSE CAST(len(t) AS BIGINT) END AS n_tokens,
           0.4 * least(CAST(n_chars AS DOUBLE) / 500.0, 1.0)
           + 0.4 * least((CASE WHEN len(t) > 0 AND TRIM(text) <> ''
                  THEN CAST(len(list_filter(t, x -> x IN ({sw}))) AS DOUBLE)
                       / CAST(len(t) AS DOUBLE)
                  ELSE 0.0 END) * 4.0, 1.0)
           + 0.2 * (1.0 - least((CASE WHEN n_chars > 0
                  THEN CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE)
                       / CAST(n_chars AS DOUBLE)
                  ELSE 0.0 END) * 5.0, 1.0)) AS quality,
           CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE)
               AS distinct_ratio,
           CAST({pii} AS BIGINT) AS pii_total
    FROM base
)
SELECT doc_id, n_tokens, quality, distinct_ratio, pii_total,
       (CASE WHEN n_tokens < {VERDICT_MIN_TOKENS}
               OR n_tokens > {VERDICT_MAX_TOKENS} THEN 'length'
             WHEN quality < {VERDICT_MIN_QUALITY} THEN 'quality'
             WHEN distinct_ratio < {VERDICT_MIN_DISTINCT} THEN 'repetition'
             WHEN pii_total > 0 THEN 'pii' END) IS NULL AS keep,
       CASE WHEN n_tokens < {VERDICT_MIN_TOKENS}
              OR n_tokens > {VERDICT_MAX_TOKENS} THEN 'length'
            WHEN quality < {VERDICT_MIN_QUALITY} THEN 'quality'
            WHEN distinct_ratio < {VERDICT_MIN_DISTINCT} THEN 'repetition'
            WHEN pii_total > 0 THEN 'pii' END AS drop_reason
FROM sig
ORDER BY doc_id
"""


Q101_SQL = _q101_sql()


# ---------------------------------------------------------------------------
# Q146 — token-budget-constrained deterministic sampling (the MIXTURE
# step of a pretraining pipeline: each language gets a token budget and
# the sample must be reproducible across runs/engines/cluster sizes).
# Docs are ordered per language by a content-independent hash (the q65
# split idiom — no RNG state, stable under repartitioning), a windowed
# cumulative token sum finds the budget frontier, and a doc is selected
# while the budget is not yet exhausted BEFORE it (so the crossing doc
# is included — budgets are met, never silently undershot). One window
# per language partition; no global ordering anywhere.
# ---------------------------------------------------------------------------

TOKEN_BUDGET_PER_LANG = 2000


def q146_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    h = hash60(F.col("doc_id").cast("string"))
    w = Window.partitionBy("lang").orderBy(h, "doc_id")
    base = docs.select(
        "doc_id", "lang", token_count("text").alias("n_tokens")
    )
    cum = base.withColumn(
        "cum_tokens", F.sum("n_tokens").over(w).cast("long")
    )
    return cum.select(
        "doc_id",
        "lang",
        "n_tokens",
        "cum_tokens",
        (
            F.col("cum_tokens") - F.col("n_tokens")
            < F.lit(TOKEN_BUDGET_PER_LANG)
        ).alias("selected"),
    )


Q146_SQL = rf"""
WITH base AS (
    SELECT doc_id, lang,
           CASE WHEN TRIM(text) = '' THEN 0
                ELSE CAST(len(string_split_regex(TRIM(text), '\s+')) AS BIGINT)
           END AS n_tokens,
           {hash60_sql("CAST(doc_id AS VARCHAR)")} AS h
    FROM documents
),
cum AS (
    SELECT doc_id, lang, n_tokens,
           CAST(SUM(n_tokens) OVER (
               PARTITION BY lang ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_tokens
    FROM base
)
SELECT doc_id, lang, n_tokens, cum_tokens,
       cum_tokens - n_tokens < {TOKEN_BUDGET_PER_LANG} AS selected
FROM cum
"""


# ---------------------------------------------------------------------------
# Q152 — DSIR-style data selection (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling"): score every raw document by
# how target-like its HASHED-BIGRAM feature profile is, then keep the
# top-N. Features are word bigrams hashed into DSIR_BUCKETS buckets (the
# paper's hashed n-gram generative model); the target distribution is the
# English slice of the corpus standing in for the paper's trusted corpus
# (Wikipedia/books), the raw distribution is the whole pool.
#
# Determinism contract (the lm.py recipe — no libm): per-bucket smoothed
# probabilities under target and raw are add-one ratios of exact int64
# counts; the per-bucket importance ratio
#     ((t+1) * (r_tot+B)) / ((r+1) * (t_tot+B))
# is ONE correctly-rounded double division of exactly-representable
# integer products (< 2^53 at gate scale; the production path keeps the
# B-row weight table in decimals), quantized with ONE multiply + FLOOR
# onto the 1e9 grid. A document's score is the exact int64 sum of
# count[bucket] * qweight[bucket] — the linear-domain surrogate of DSIR's
# per-feature log-likelihood-ratio sum (monotone per bucket; ln never
# appears, the PLANS.md cross-engine trap). Deterministic selection =
# global top-N (TakeOrderedAndProject — no full sort materializes); the
# paper's Gumbel resampling adds noise we deliberately omit.
#
# Scale shape: bigram explode -> (doc_id, bucket) keyed agg (map-side
# combined, doc_id in the key); the weight table is B rows of bounded
# state broadcast back; one more doc_id-keyed agg; top-N via sort-limit.
# Never a global window over the corpus.
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 256
DSIR_Q_SCALE = 1_000_000_000
DSIR_SELECT_N = 100
DSIR_TARGET_LANG = "en"


def q152_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.lm import _bigram_stream

    docs = load_table(spark, sf_dir, "documents")
    bg = _bigram_stream(docs, "doc_id", "text")
    feat = bg.select(
        "doc_id",
        F.pmod(
            hash60(F.concat(F.lit("dsir:"), F.col("a"), F.lit(" "), F.col("b"))),
            F.lit(DSIR_BUCKETS),
        ).alias("bucket"),
    )
    dbc = feat.groupBy("doc_id", "bucket").agg(F.count("*").alias("c"))
    dbc = dbc.persist()  # feeds raw counts, target counts, and scoring
    raw = dbc.groupBy("bucket").agg(F.sum("c").alias("r"))
    tgt = (
        dbc.join(
            F.broadcast(
                docs.where(F.col("lang") == DSIR_TARGET_LANG).select("doc_id")
            ),
            "doc_id",
            "left_semi",
        )
        .groupBy("bucket")
        .agg(F.sum("c").alias("t"))
    )
    w = raw.join(tgt, "bucket", "left").na.fill({"t": 0})
    tots = w.agg(
        F.sum("r").alias("r_tot"), F.sum("t").alias("t_tot")
    )
    b = F.lit(DSIR_BUCKETS)
    wq = w.crossJoin(F.broadcast(tots)).select(
        "bucket",
        F.floor(
            (
                ((F.col("t") + 1) * (F.col("r_tot") + b)).cast("double")
                / ((F.col("r") + 1) * (F.col("t_tot") + b)).cast("double")
            )
            * F.lit(float(DSIR_Q_SCALE))
        )
        .cast("long")
        .alias("qw"),
    )
    scored = (
        dbc.join(F.broadcast(wq), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            F.sum(F.col("c") * F.col("qw")).cast("long").alias("imp_score"),
        )
    )
    top = scored.orderBy(F.col("imp_score").desc(), "doc_id").limit(
        DSIR_SELECT_N
    )
    # Rank attaches AFTER the top-N cut, so the window runs over a
    # constant-size (N-row) frame, not the corpus.
    rw = Window.orderBy(F.col("imp_score").desc(), "doc_id")
    return top.withColumn("rank", F.row_number().over(rw).cast("int"))


Q152_SQL = rf"""
WITH tok AS (
    SELECT doc_id, string_split_regex(TRIM(text), '\s+') AS t FROM documents
),
bg AS (
    SELECT doc_id, t[r.i] AS a, t[r.i + 1] AS b
    FROM tok, UNNEST(range(1, GREATEST(len(t), 1))) AS r(i)
    WHERE t[r.i] <> '' AND t[r.i + 1] <> ''
),
feat AS (
    SELECT doc_id,
           {hash60_sql("'dsir:' || a || ' ' || b")} % {DSIR_BUCKETS} AS bucket
    FROM bg
),
dbc AS (
    SELECT doc_id, bucket, COUNT(*) AS c FROM feat GROUP BY 1, 2
),
raw AS (SELECT bucket, SUM(c) AS r FROM dbc GROUP BY 1),
tgt AS (
    SELECT dbc.bucket, SUM(dbc.c) AS t
    FROM dbc JOIN documents d USING (doc_id)
    WHERE d.lang = '{DSIR_TARGET_LANG}'
    GROUP BY 1
),
w AS (
    SELECT raw.bucket, raw.r, COALESCE(tgt.t, 0) AS t
    FROM raw LEFT JOIN tgt USING (bucket)
),
tots AS (SELECT SUM(r) AS r_tot, SUM(t) AS t_tot FROM w),
wq AS (
    SELECT bucket,
           CAST(FLOOR(
               (CAST((t + 1) * (r_tot + {DSIR_BUCKETS}) AS DOUBLE)
                / CAST((r + 1) * (t_tot + {DSIR_BUCKETS}) AS DOUBLE))
               * {float(DSIR_Q_SCALE)}
           ) AS BIGINT) AS qw
    FROM w CROSS JOIN tots
),
scored AS (
    SELECT dbc.doc_id,
           CAST(SUM(c) AS BIGINT) AS n_bigrams,
           CAST(SUM(c * qw) AS BIGINT) AS imp_score
    FROM dbc JOIN wq USING (bucket) GROUP BY 1
),
ranked AS (
    SELECT *, CAST(ROW_NUMBER() OVER (
        ORDER BY imp_score DESC, doc_id
    ) AS INT) AS rank
    FROM scored
)
SELECT doc_id, n_bigrams, imp_score, rank
FROM ranked WHERE rank <= {DSIR_SELECT_N}
"""


# ---------------------------------------------------------------------------
# Q156 — training-mix allocation by WATER-FILLING: given per-language
# token inventories and a target mixture, find the largest total token
# budget whose mix hits the target without upsampling any language
# (lambda = min over languages of available/target — the binding
# language caps the mix), then report each language's allocation and
# sampling rate. The static "data mixing" step every pretraining run
# performs before sampling (DoReMi et al. tune the target weights; the
# allocation arithmetic is this). Determinism: token counts are exact
# int64; cap/lambda/alloc/rate are each a fixed chain of identical IEEE
# ops on exactly-representable inputs, so both engines produce the same
# doubles (q79's fixed-order contract). One keyed agg + a 1-row
# broadcast — nothing scales with corpus size past the first pass.
# ---------------------------------------------------------------------------

#: Target mixture in integer percent (sums to 100).
MIX_TARGET_PCT = {"en": 40, "de": 15, "es": 15, "fr": 15, "zh": 15}


def q156_mixture_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    pct = F.lit(None).cast("long")
    for lang, p_ in MIX_TARGET_PCT.items():
        pct = F.when(F.col("lang") == lang, F.lit(p_)).otherwise(pct)
    counts = (
        docs.select("lang", token_count("text").alias("n_tok"))
        .groupBy("lang")
        .agg(F.sum("n_tok").alias("n_tokens"))
        .withColumn("target_pct", pct)
        .where(F.col("target_pct").isNotNull())
        .withColumn(
            "cap",
            (F.col("n_tokens") * F.lit(100)).cast("double")
            / F.col("target_pct").cast("double"),
        )
    )
    lam = counts.agg(F.min("cap").alias("lam"))
    alloc = F.col("lam") * F.col("target_pct").cast("double") / F.lit(100.0)
    return counts.crossJoin(F.broadcast(lam)).select(
        "lang",
        "n_tokens",
        "target_pct",
        F.floor(alloc).cast("long").alias("alloc_tokens"),
        F.round(alloc / F.col("n_tokens").cast("double"), 9).alias(
            "sample_rate"
        ),
        (F.col("cap") == F.col("lam")).alias("is_binding"),
    )


_MIX_CASE = " ".join(
    f"WHEN lang = '{lang}' THEN {p_}" for lang, p_ in MIX_TARGET_PCT.items()
)

Q156_SQL = rf"""
WITH counts AS (
    SELECT lang,
           CAST(SUM(CASE WHEN TRIM(text) = '' THEN 0
                ELSE len(string_split_regex(TRIM(text), '\s+')) END)
                AS BIGINT) AS n_tokens,
           CAST(CASE {_MIX_CASE} END AS BIGINT) AS target_pct
    FROM documents
    GROUP BY lang
),
capped AS (
    SELECT *, CAST(n_tokens * 100 AS DOUBLE) / CAST(target_pct AS DOUBLE)
                  AS cap
    FROM counts WHERE target_pct IS NOT NULL
),
lam AS (SELECT MIN(cap) AS lam FROM capped)
SELECT lang, n_tokens, target_pct,
       CAST(FLOOR(lam * CAST(target_pct AS DOUBLE) / 100.0) AS BIGINT)
           AS alloc_tokens,
       round(lam * CAST(target_pct AS DOUBLE) / 100.0
             / CAST(n_tokens AS DOUBLE), 9) AS sample_rate,
       cap = lam AS is_binding
FROM capped CROSS JOIN lam
"""


# ---------------------------------------------------------------------------
# Q162 — training-shard MANIFEST: deterministic hash sharding of the
# corpus plus, per shard, the bookkeeping a reproducible training run
# records — doc count, token budget, and a membership FINGERPRINT (md5
# of the ordered member id list) that lets any later run prove it read
# the identical shard. Sharding is a stateless per-row hash (no
# shuffle to decide membership — the q71 property); the manifest is one
# keyed agg whose only wide state is the member list itself, bounded by
# shard size (choose shard count ∝ corpus size in production, same
# contract as q118's k ∝ n).
# ---------------------------------------------------------------------------

_MANIFEST_SHARDS = 16


def q162_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    shard = F.pmod(
        hash60(F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))),
        F.lit(_MANIFEST_SHARDS),
    )
    return (
        docs.select(
            shard.alias("shard"),
            "doc_id",
            token_count("text").alias("n_tok"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(F.collect_list("doc_id")),
                        lambda x: x.cast("string"),
                    ),
                )
            ).alias("member_fp"),
        )
    )


Q162_SQL = rf"""
WITH base AS (
    SELECT {hash60_sql("'shard:' || CAST(doc_id AS VARCHAR)")}
               % {_MANIFEST_SHARDS} AS shard,
           doc_id,
           CASE WHEN TRIM(text) = '' THEN 0
                ELSE CAST(len(string_split_regex(TRIM(text), '\s+')) AS BIGINT)
           END AS n_tok
    FROM documents
)
SELECT shard,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
           AS member_fp
FROM base
GROUP BY shard
"""


# ---------------------------------------------------------------------------
# Q175 — systematic PPS sampling (probability proportional to size):
# per language, docs are laid on the cumulative-weight line (weight =
# n_chars, order = doc_id) and one of every W/k weight units selects
# the doc under it — the classical systematic estimator, made fully
# deterministic and integer-exact: a doc is selected iff
# floor(cum·k/W) > floor((cum−w)·k/W) (integer division both engines),
# with n_hits > 1 = certainty inclusion of oversized docs. No RNG, no
# floats, stable under repartitioning; the sampling weight story the
# token-budget sampler (q146) and stratified sampler (q71) complete.
# One per-language window cumsum (int64-safe in any accumulation
# order) + a per-row projection.
# ---------------------------------------------------------------------------

_PPS_K = 20


def q175_pps_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("doc_id")
    wall = Window.partitionBy("lang")
    base = docs.select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("weight")
    )
    cum = (
        base.withColumn("cum", F.sum("weight").over(w))
        .withColumn("total", F.sum("weight").over(wall))
    )
    k = F.lit(_PPS_K)
    hits = F.expr(f"(cum * {_PPS_K}) div total") - F.expr(
        f"((cum - weight) * {_PPS_K}) div total"
    )
    return (
        cum.withColumn("n_hits", hits.cast("long"))
        .where(F.col("n_hits") > 0)
        .select("doc_id", "lang", "weight", F.col("cum").cast("long"), "n_hits")
    )


Q175_SQL = f"""
WITH base AS (
    SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS weight FROM documents
),
cum AS (
    SELECT doc_id, lang, weight,
           SUM(weight) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS cum,
           SUM(weight) OVER (PARTITION BY lang) AS total
    FROM base
)
SELECT doc_id, lang, weight, CAST(cum AS BIGINT) AS cum,
       CAST((cum * {_PPS_K}) // total
          - ((cum - weight) * {_PPS_K}) // total AS BIGINT) AS n_hits
FROM cum
WHERE (cum * {_PPS_K}) // total - ((cum - weight) * {_PPS_K}) // total > 0
"""


# ---------------------------------------------------------------------------
# Q200 — the CURATION PIPELINE capstone: exact dedup → quality/PII
# verdict → per-domain cap → token-budget shard packing, composed as ONE
# lazy plan ending in a shard manifest — the shape a pretraining data
# run actually executes, proving the engine's curation operators chain
# without materialization barriers. Stage rules are the registered
# operators' own (q19 fingerprint dedup, q101 verdict thresholds on the
# REAL text — no synthetic PII probe here, q76 hash-ranked domain cap,
# q89 packing arithmetic), so each stage is individually oracle-proven
# AND the composition carries its own full value oracle. Every stage is
# keyed-window/agg shaped: fingerprint groups, per-source ranks, one
# prefix sum per source — no global sort, no driver loop, one scan.
# ---------------------------------------------------------------------------


def q200_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import (
        fingerprint,
        pii_count,
        quality_score,
        token_count,
        tokens,
    )

    docs = load_table(spark, sf_dir, "documents")
    fw = Window.partitionBy("fingerprint")
    scored = docs.select(
        "doc_id",
        "source",
        fingerprint("text").alias("fingerprint"),
        token_count("text").alias("n_tokens"),
        quality_score("text").alias("quality"),
        (
            F.size(F.array_distinct(tokens("text"))).cast("double")
            / F.size(tokens("text")).cast("double")
        ).alias("distinct_ratio"),
        (
            pii_count(F.col("text"), "email")
            + pii_count(F.col("text"), "phone")
            + pii_count(F.col("text"), "ipv4")
            + pii_count(F.col("text"), "ssn")
        ).alias("pii_total"),
    )
    survivors = scored.withColumn(
        "keeper", F.col("doc_id") == F.min("doc_id").over(fw)
    ).where(
        F.col("keeper")
        & F.col("n_tokens").between(VERDICT_MIN_TOKENS, VERDICT_MAX_TOKENS)
        & (F.col("quality") >= VERDICT_MIN_QUALITY)
        & (F.col("distinct_ratio") >= VERDICT_MIN_DISTINCT)
        & (F.col("pii_total") == 0)
    )
    cap_w = Window.partitionBy("source").orderBy(
        hash60(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    capped = survivors.withColumn(
        "rk", F.row_number().over(cap_w)
    ).where(F.col("rk") <= DOMAIN_CAP)
    pack_w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = capped.withColumn(
        "cum", F.sum("n_tokens").over(pack_w)
    ).withColumn(
        "bin",
        F.floor(
            (F.col("cum") - F.col("n_tokens")) / PACK_BUDGET_TOKENS
        ).cast("long"),
    )
    return (
        packed.groupBy("source", "bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("source", "bin")
    )


def _q200_sql() -> str:
    from ..functions.text import PII_PATTERNS, QUALITY_STOPWORDS

    sw = ", ".join(f"'{w}'" for w in QUALITY_STOPWORDS)
    pii = " + ".join(
        f"len(regexp_extract_all(text, '{PII_PATTERNS[k]}'))"
        for k in ("email", "phone", "ipv4", "ssn")
    )
    h60 = hash60_sql("CAST(doc_id AS VARCHAR)")
    return rf"""
WITH base AS (
    SELECT doc_id, source, text,
           sha256(TRIM(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
             AS fingerprint,
           string_split_regex(TRIM(text), '\s+') AS t,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM documents
),
sig AS (
    SELECT doc_id, source, fingerprint,
           CASE WHEN TRIM(text) = '' THEN 0
                ELSE CAST(len(t) AS BIGINT) END AS n_tokens,
           0.4 * least(CAST(n_chars AS DOUBLE) / 500.0, 1.0)
           + 0.4 * least((CASE WHEN len(t) > 0 AND TRIM(text) <> ''
                  THEN CAST(len(list_filter(t, x -> x IN ({sw}))) AS DOUBLE)
                       / CAST(len(t) AS DOUBLE)
                  ELSE 0.0 END) * 4.0, 1.0)
           + 0.2 * (1.0 - least((CASE WHEN n_chars > 0
                  THEN CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE)
                       / CAST(n_chars AS DOUBLE)
                  ELSE 0.0 END) * 5.0, 1.0)) AS quality,
           CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE)
               AS distinct_ratio,
           CAST({pii} AS BIGINT) AS pii_total,
           MIN(doc_id) OVER (PARTITION BY fingerprint) AS keeper_id
    FROM base
),
survivors AS (
    SELECT doc_id, source, n_tokens
    FROM sig
    WHERE doc_id = keeper_id
      AND n_tokens BETWEEN {VERDICT_MIN_TOKENS} AND {VERDICT_MAX_TOKENS}
      AND quality >= {VERDICT_MIN_QUALITY}
      AND distinct_ratio >= {VERDICT_MIN_DISTINCT}
      AND pii_total = 0
),
capped AS (
    SELECT doc_id, source, n_tokens
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY source ORDER BY {h60}, doc_id
        ) AS rk
        FROM survivors
    ) WHERE rk <= {DOMAIN_CAP}
),
packed AS (
    SELECT source, doc_id, n_tokens,
           CAST((SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) - n_tokens) // {PACK_BUDGET_TOKENS} AS BIGINT) AS bin
    FROM capped
)
SELECT source, bin,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM packed
GROUP BY source, bin
ORDER BY source, bin
"""


Q200_SQL = _q200_sql()


# ---------------------------------------------------------------------------
# Q208 — k-anonymity audit over the customer quasi-identifiers: a privacy
# readout the curation layer needs next to the PII scan (q77) — PII finds
# *direct* identifiers inside text; k-anonymity measures *indirect*
# re-identification risk from attribute combinations (Sweeney 2002). The
# quasi-identifier is (nation, market segment, account-balance thousand-
# bucket); every equivalence class reports its size k, a risk band
# (k < 5 high / k < 20 medium / else low), and its exact ppm share of the
# table via integral division against the 1-row total broadcast (the q03
# pattern — no float ratios, so the oracle is bit-identical).
#
# Scale shape: one keyed agg (map-side combined) + one 1-row broadcast.
# The class count is bounded by |nations| x |segments| x |buckets|, not
# row count.
# ---------------------------------------------------------------------------

K_ANON_HIGH = 5
K_ANON_MEDIUM = 20


def q208_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    classes = (
        cust.select(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("bal_bucket"),
        )
        .groupBy("c_nationkey", "c_mktsegment", "bal_bucket")
        .agg(F.count("*").alias("k"))
    )
    total = cust.agg(F.count("*").alias("n_rows"))
    return (
        classes.crossJoin(F.broadcast(total))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "bal_bucket",
            "k",
            F.when(F.col("k") < K_ANON_HIGH, F.lit("high"))
            .when(F.col("k") < K_ANON_MEDIUM, F.lit("medium"))
            .otherwise(F.lit("low"))
            .alias("risk"),
            F.expr("k * 1000000 DIV n_rows").cast("long").alias("share_ppm"),
        )
        .orderBy("c_nationkey", "c_mktsegment", "bal_bucket")
    )


Q208_SQL = f"""
WITH classes AS (
    SELECT c_nationkey, c_mktsegment,
           CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket,
           COUNT(*) AS k
    FROM customer
    GROUP BY c_nationkey, c_mktsegment, FLOOR(c_acctbal / 1000.0)
),
total AS (SELECT COUNT(*) AS n_rows FROM customer)
SELECT c_nationkey, c_mktsegment, bal_bucket, k,
       CASE WHEN k < {K_ANON_HIGH} THEN 'high'
            WHEN k < {K_ANON_MEDIUM} THEN 'medium'
            ELSE 'low' END AS risk,
       CAST(k * 1000000 // n_rows AS BIGINT) AS share_ppm
FROM classes, total
ORDER BY c_nationkey, c_mktsegment, bal_bucket
"""


# ---------------------------------------------------------------------------
# Q254 — TEMPERATURE-SCALED mixture quotas (the mT5/XLM-R α-sampling
# law, Conneau et al. 2020: sample source s ∝ n_s^α with α = 0.5):
# per-source character inventories are tempered by the square root —
# boosting tail sources, damping the head — and a fixed document budget
# is divided EXACTLY by largest-remainder on the tempered weights
# (operators/allocation.py, the q218 proration contract: Σ quota ==
# budget, every quota within 1 of its real share). Distinct from q156,
# which water-fills toward an externally-given target mix; here the mix
# IS the tempered inventory. Determinism: inventories are exact int64;
# w9 = FLOOR(sqrt(chars)·1e6) is one correctly-rounded sqrt + product +
# floor (identical on both engines — the pagerank grid recipe); the
# allocation is pure int64. One keyed agg + one |sources|-row window.
# ---------------------------------------------------------------------------

#: Document budget divided across sources; α is fixed at 0.5 (sqrt).
TEMP_MIX_BUDGET = 10_000
_TEMP_WSCALE = 1_000_000


def q254_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.allocation import largest_remainder

    docs = load_table(spark, sf_dir, "documents")
    inv = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("chars"),
    )
    weighted = inv.select(
        "source",
        "n_docs",
        "chars",
        F.floor(
            F.sqrt(F.col("chars").cast("double"))
            * F.lit(float(_TEMP_WSCALE))
        ).alias("w9"),
        F.lit(TEMP_MIX_BUDGET).cast("long").alias("budget"),
        F.lit(1).alias("g"),
    )
    alloc = largest_remainder(
        weighted,
        group_cols=["g"],
        weight_col="w9",
        budget_col="budget",
        tiebreak_cols=["source"],
        out_col="quota",
    )
    wg = Window.partitionBy("g")
    return alloc.select(
        "source",
        "n_docs",
        "chars",
        "w9",
        "quota",
        F.round(
            F.col("chars").cast("double")
            / F.sum("chars").over(wg).cast("double"),
            9,
        ).alias("raw_share"),
        F.round(
            F.col("quota").cast("double") / F.lit(float(TEMP_MIX_BUDGET)),
            9,
        ).alias("tempered_share"),
    )


Q254_SQL = f"""
WITH inv AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS chars
    FROM documents GROUP BY source
),
weighted AS (
    SELECT *,
           CAST(FLOOR(sqrt(CAST(chars AS DOUBLE)) * {float(_TEMP_WSCALE)})
                AS BIGINT) AS w9
    FROM inv
),
shares AS (
    SELECT *,
           SUM(w9) OVER () AS tot_w,
           SUM(chars) OVER () AS tot_chars,
           ({TEMP_MIX_BUDGET} * w9) // SUM(w9) OVER () AS base,
           ({TEMP_MIX_BUDGET} * w9) % SUM(w9) OVER () AS rem
    FROM weighted
)
SELECT source, n_docs, chars, w9,
       CAST(base + CASE WHEN ROW_NUMBER() OVER (
                ORDER BY rem DESC, source, w9
            ) <= {TEMP_MIX_BUDGET} - SUM(base) OVER ()
            THEN 1 ELSE 0 END AS BIGINT) AS quota,
       round(CAST(chars AS DOUBLE) / CAST(tot_chars AS DOUBLE), 9)
           AS raw_share,
       round(CAST(base + CASE WHEN ROW_NUMBER() OVER (
                ORDER BY rem DESC, source, w9
            ) <= {TEMP_MIX_BUDGET} - SUM(base) OVER ()
            THEN 1 ELSE 0 END AS DOUBLE) / {float(TEMP_MIX_BUDGET)}, 9)
           AS tempered_share
FROM shares
"""


# ---------------------------------------------------------------------------
# Q276 — DETERMINISTIC SOURCE-INTERLEAVE SCHEDULE: the strided global
# training order data-mixing pipelines materialize — document r of
# source s lands at global position r·K + idx(s) (K sources, idx by
# source-name order), so every source drains round-robin and the
# schedule is reproducible from keys alone, no RNG. Emits the first 50
# schedule rows (global_pos is unique by construction — a collision-
# free mixed-radix code — so the LIMIT is deterministic).
#
# Plan: one per-source rank window + a broadcast join to the
# |sources|-row index map; TakeOrderedAndProject caps the output.
# ---------------------------------------------------------------------------

_INTERLEAVE_HEAD = 50


def q276_interleave_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    srcmap = (
        docs.select("source")
        .distinct()
        .select(
            "source",
            (F.row_number().over(Window.orderBy("source")) - 1).alias("idx"),
        )
        .withColumn("n_src", F.count("*").over(Window.partitionBy()))
    )
    ranked = docs.select(
        "source",
        "doc_id",
        (
            F.row_number().over(
                Window.partitionBy("source").orderBy("doc_id")
            )
            - 1
        ).alias("rnk"),
    )
    return (
        ranked.join(F.broadcast(srcmap), "source")
        .select(
            (F.col("rnk") * F.col("n_src") + F.col("idx"))
            .cast("long")
            .alias("global_pos"),
            "source",
            "doc_id",
        )
        .orderBy("global_pos")
        .limit(_INTERLEAVE_HEAD)
    )


Q276_SQL = f"""
WITH srcmap AS (
    SELECT source,
           ROW_NUMBER() OVER (ORDER BY source) - 1 AS idx,
           COUNT(*) OVER () AS n_src
    FROM (SELECT DISTINCT source FROM documents)
),
ranked AS (
    SELECT source, doc_id,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) - 1 AS rnk
    FROM documents
)
SELECT CAST(r.rnk * s.n_src + s.idx AS BIGINT) AS global_pos,
       r.source, r.doc_id
FROM ranked r JOIN srcmap s USING (source)
ORDER BY global_pos
LIMIT {_INTERLEAVE_HEAD}
"""


# ---------------------------------------------------------------------------
# Q280 — TRAIN/VAL/TEST SPLIT CONTAMINATION MATRIX: distinct 3-word
# shingle overlap between q65's hash splits, for the three canonical
# leakage directions (train→val, train→test, val→test) — the
# pre-training check that the eval splits aren't already memorized
# verbatim in train. Contamination ppm is |A∩B| / |B's distinct
# shingles| in exact integers (B = the eval side).
#
# Plan: ONE tokenize/shingle explode → distinct (split, shingle) frame
# reused by both the pair join and the per-split denominators; the
# shingle-keyed equi-join produces only co-occurring shingles (never
# all-pairs); output is 3 rows.
# ---------------------------------------------------------------------------

_CONTAM_PAIRS = [("train", "val"), ("train", "test"), ("val", "test")]


def q280_split_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = hash60(F.col("doc_id").cast("string")) % 100
    split = F.when(h < 80, "train").when(h < 90, "val").otherwise("test")
    toks = ensure_min_parallelism(docs, F.col("doc_id")).select(
        split.alias("split"), tokens("text").alias("t")
    )
    sh = (
        toks.select(
            "split", F.explode(shingles_from_tokens("t")).alias("s")
        )
        .distinct()
    )
    denom = sh.groupBy("split").agg(F.count("*").alias("n_shingles"))
    pair_cond = F.lit(False)
    for a, b in _CONTAM_PAIRS:
        pair_cond = pair_cond | (
            (F.col("l.split") == a) & (F.col("r.split") == b)
        )
    shared = (
        sh.alias("l")
        .join(sh.alias("r"), on="s")
        .where(pair_cond)
        .groupBy(
            F.col("l.split").alias("from_split"),
            F.col("r.split").alias("to_split"),
        )
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    return (
        shared.join(
            F.broadcast(denom.withColumnRenamed("split", "to_split")),
            "to_split",
        )
        .selectExpr(
            "from_split",
            "to_split",
            "n_shared",
            "CAST(n_shingles AS BIGINT) AS n_eval_shingles",
            "CAST(n_shared * 1000000 DIV n_shingles AS BIGINT)"
            " AS contamination_ppm",
        )
        .orderBy("from_split", "to_split")
    )


Q280_SQL = f"""
WITH marked AS (
    SELECT CASE WHEN {hash60_sql('CAST(doc_id AS VARCHAR)')} % 100 < 80
                THEN 'train'
                WHEN {hash60_sql('CAST(doc_id AS VARCHAR)')} % 100 < 90
                THEN 'val' ELSE 'test' END AS split,
           string_split_regex(TRIM(text), '\\s+') AS t
    FROM documents
),
sh AS (
    SELECT DISTINCT split,
           concat_ws(' ', t[i+1], t[i+2], t[i+3]) AS s
    FROM marked, UNNEST(range(0, GREATEST(len(t) - 2, 0))) AS r(i)
),
denom AS (SELECT split, COUNT(*) AS n_shingles FROM sh GROUP BY 1),
shared AS (
    SELECT l.split AS from_split, r.split AS to_split, COUNT(*) AS n_shared
    FROM sh l JOIN sh r USING (s)
    WHERE (l.split, r.split) IN (('train','val'), ('train','test'),
                                 ('val','test'))
    GROUP BY 1, 2
)
SELECT from_split, to_split,
       CAST(n_shared AS BIGINT) AS n_shared,
       CAST(d.n_shingles AS BIGINT) AS n_eval_shingles,
       CAST(n_shared * 1000000 // d.n_shingles AS BIGINT)
           AS contamination_ppm
FROM shared JOIN denom d ON d.split = shared.to_split
ORDER BY from_split, to_split
"""


# ---------------------------------------------------------------------------
# Q300 — RELEASE-READINESS REPORT (round-6 capstone): one row per
# source with the go/no-go signals a training-data release review
# reads, all exact integers and all from ONE token explode + one
# doc-grain pass + one fingerprint agg:
#   oov_ppm            — q274's min-count-vocab OOV share,
#   tokens_per_sent    — q279's run-on proxy (milli),
#   dup_doc_ppm        — docs sharing a normalized fingerprint WITHIN
#                        the source (q19's fingerprint),
#   verdict            — PASS iff oov < 20 %, toks/sent < 120, and
#                        dups < 5 % (pinned thresholds).
# The composition capstone for the q267–q299 additions: every signal
# is independently oracle-checked elsewhere; this query certifies the
# JOIN of those signals at source grain stays consistent.
# ---------------------------------------------------------------------------

_RR_OOV_MAX_PPM = 200_000
_RR_TPS_MAX_MILLI = 120_000
_RR_DUP_MAX_PPM = 50_000


def q300_release_readiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    occ = (
        ensure_min_parallelism(docs, F.col("doc_id"))
        .select("source", tokens("text").alias("t"))
        .select("source", F.explode("t").alias("token"))
        .where(F.col("token") != "")
        .groupBy("source", "token")
        .agg(F.count("*").alias("cnt"))
    )
    gl = occ.groupBy("token").agg(F.sum("cnt").alias("g"))
    oov = (
        occ.join(gl, "token")
        .groupBy("source")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.sum(F.when(F.col("g") < 3, F.col("cnt")).otherwise(0)).alias(
                "n_oov"
            ),
        )
    )
    sents = F.filter(
        F.transform(F.split(F.col("text"), r"[.!?]+"), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    per_doc = docs.select(
        "source",
        F.size(sents).cast("long").alias("n_sents"),
        F.sha2(
            F.trim(
                F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " ")
            ),
            256,
        ).alias("fp"),
    )
    dups = (
        per_doc.groupBy("source", "fp")
        .agg(F.count("*").alias("k"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_fps"),
            F.sum("k").alias("n_docs"),
            F.sum(F.when(F.col("k") >= 2, F.col("k")).otherwise(0)).alias(
                "n_dup_docs"
            ),
        )
    )
    sent_tot = per_doc.groupBy("source").agg(
        F.sum("n_sents").alias("n_sentences")
    )
    joined = (
        oov.join(F.broadcast(dups), "source")
        .join(F.broadcast(sent_tot), "source")
        .selectExpr(
            "source",
            "CAST(n_docs AS BIGINT) AS n_docs",
            "CAST(n_tokens AS BIGINT) AS n_tokens",
            "CAST(n_oov * 1000000 DIV n_tokens AS BIGINT) AS oov_ppm",
            "CAST(n_tokens * 1000 DIV greatest(n_sentences, 1) AS BIGINT)"
            " AS tokens_per_sent_milli",
            "CAST(n_dup_docs * 1000000 DIV n_docs AS BIGINT)"
            " AS dup_doc_ppm",
        )
    )
    verdict = (
        (F.col("oov_ppm") < _RR_OOV_MAX_PPM)
        & (F.col("tokens_per_sent_milli") < _RR_TPS_MAX_MILLI)
        & (F.col("dup_doc_ppm") < _RR_DUP_MAX_PPM)
    )
    return joined.withColumn(
        "verdict", F.when(verdict, "PASS").otherwise("HOLD")
    ).orderBy("source")


Q300_SQL = f"""
WITH occ AS (
    SELECT source, t.token, COUNT(*) AS cnt
    FROM documents,
         UNNEST(string_split_regex(TRIM(text), '\\s+')) AS t(token)
    WHERE t.token <> ''
    GROUP BY 1, 2
),
gl AS (SELECT token, SUM(cnt) AS g FROM occ GROUP BY 1),
oov AS (
    SELECT source, SUM(cnt) AS n_tokens,
           SUM(CASE WHEN g < 3 THEN cnt ELSE 0 END) AS n_oov
    FROM occ JOIN gl USING (token) GROUP BY 1
),
per_doc AS (
    SELECT source,
           len(list_filter(
               list_transform(string_split_regex(text, '[.!?]+'),
                              s -> TRIM(s)),
               s -> s <> '')) AS n_sents,
           sha256(TRIM(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
               AS fp
    FROM documents
),
dups AS (
    SELECT source, SUM(k) AS n_docs,
           SUM(CASE WHEN k >= 2 THEN k ELSE 0 END) AS n_dup_docs
    FROM (SELECT source, fp, COUNT(*) AS k FROM per_doc GROUP BY 1, 2)
    GROUP BY 1
),
sent_tot AS (SELECT source, SUM(n_sents) AS n_sentences
             FROM per_doc GROUP BY 1),
joined AS (
    SELECT o.source,
           CAST(d.n_docs AS BIGINT) AS n_docs,
           CAST(o.n_tokens AS BIGINT) AS n_tokens,
           CAST(o.n_oov * 1000000 // o.n_tokens AS BIGINT) AS oov_ppm,
           CAST(o.n_tokens * 1000 // GREATEST(s.n_sentences, 1) AS BIGINT)
               AS tokens_per_sent_milli,
           CAST(d.n_dup_docs * 1000000 // d.n_docs AS BIGINT) AS dup_doc_ppm
    FROM oov o JOIN dups d USING (source) JOIN sent_tot s USING (source)
)
SELECT *,
       CASE WHEN oov_ppm < {_RR_OOV_MAX_PPM}
             AND tokens_per_sent_milli < {_RR_TPS_MAX_MILLI}
             AND dup_doc_ppm < {_RR_DUP_MAX_PPM}
            THEN 'PASS' ELSE 'HOLD' END AS verdict
FROM joined
ORDER BY source
"""


# ---------------------------------------------------------------------------
# Q310 — CORPUS COMPOSITION MATRIX (the data card table): source ×
# lang doc and character counts with row-within-source and overall
# share ppm — the composition table every dataset release publishes.
# One keyed agg + two window shares over the |sources|×|langs| frame.
# ---------------------------------------------------------------------------


def q310_corpus_composition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("n_chars"),
    )
    return cells.selectExpr(
        "source",
        "lang",
        "CAST(n_docs AS BIGINT) AS n_docs",
        "CAST(n_chars AS BIGINT) AS n_chars",
        "CAST(n_docs * 1000000 DIV "
        "SUM(n_docs) OVER (PARTITION BY source) AS BIGINT)"
        " AS share_of_source_ppm",
        "CAST(n_chars * 1000000 DIV SUM(n_chars) OVER () AS BIGINT)"
        " AS share_of_corpus_chars_ppm",
    ).orderBy("source", "lang")


Q310_SQL = """
WITH cells AS (
    SELECT source, lang, COUNT(*) AS n_docs, SUM(n_chars) AS n_chars
    FROM documents GROUP BY 1, 2
)
SELECT source, lang,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(n_docs * 1000000 // SUM(n_docs)
            OVER (PARTITION BY source) AS BIGINT) AS share_of_source_ppm,
       CAST(n_chars * 1000000 // SUM(n_chars) OVER () AS BIGINT)
           AS share_of_corpus_chars_ppm
FROM cells
ORDER BY source, lang
"""


# ---------------------------------------------------------------------------
# Q324 — Point-in-time training-set assembly (the feature-store join): the
# orders table is the label spine, and every spine row picks up (a) its
# customer's strictly-prior order history via ONE partitioned window
# (n_prior_orders, prev_totalprice) and (b) the latest event for that
# customer at or before the order instant via the as-of union-window
# operator (operators/asof.py — one shuffle on the key, state is a single
# carried struct; never an inequality join). THE leakage-safe assembly
# shape: no feature can come from the future, because both feature paths
# are ordered scans, and the per-row cutoff is the spine's own timestamp.
# Ties at equal ts resolve to the max event_id on both engines.
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Q333 — Per-entity TEMPORAL train/valid/test split at DAY granularity
# + boundary blast-radius audit. q65 splits documents by hash (i.i.d.
# eval); user-level models need the TEMPORAL split — per user, the first
# ~80% of their history trains, the next ~10% validates, the rest tests
# — and practice rounds the cut to a CONTEXT boundary (here: calendar
# day) so no session/day is bisected across splits. Every user-day is
# assigned wholesale to the split of its first event.
#
# Rank math is pure integers (r*10 <= n*8; the first event always trains
# so no user has an empty train slice); ties break on event_id — the
# same total order on both engines. Day rounding MOVES events relative
# to the pure rank cut (a boundary day's tail events get pulled into the
# day's opening split); the audit column n_moved counts them per cell —
# the rounding's leak blast radius, which a reviewer must see before
# trusting the split (the q299 late-data blast-radius discipline applied
# to eval design).
#
# Output: split composition matrix (day-granular split × event_type:
# events, users, exact-decimal value sum, time span, n_moved).
#
# Scale: ONE shuffle by user_id; the rank and per-user count windows run
# on it, and the (user_id, day) windows reuse it too — HashPartitioning
# on a subset key satisfies the clustered distribution, so no second
# exchange. The final composition agg is map-side-combinable on a tiny
# key space.
# ---------------------------------------------------------------------------

_DAY_US = 86_400_000_000


def q333_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    whole = Window.partitionBy("user_id").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    day_w = Window.partitionBy("user_id", "day").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = (
        ev.select(
            "user_id",
            "event_type",
            "value",
            F.unix_micros("ts").alias("us"),
            F.row_number().over(w).alias("r"),
        )
        .withColumn("n", F.count("*").over(whole))
        .withColumn("day", F.expr(f"us div {_DAY_US}"))
    )
    tagged = ranked.withColumn(
        "split",
        F.when(
            (F.col("r") * 10 <= F.col("n") * 8) | (F.col("r") == 1), "train"
        )
        .when(F.col("r") * 10 <= F.col("n") * 9, "valid")
        .otherwise("test"),
    )
    dayed = tagged.withColumn("day_min_r", F.min("r").over(day_w)).withColumn(
        "day_split",
        F.max(
            F.when(F.col("r") == F.col("day_min_r"), F.col("split"))
        ).over(day_w),
    )
    moved = F.when(F.col("split") != F.col("day_split"), F.lit(1)).otherwise(
        F.lit(0)
    )
    return (
        dayed.groupBy(F.col("day_split").alias("split"), F.col("event_type"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            dec_sum("value").alias("value_sum"),
            F.min("us").cast("long").alias("min_us"),
            F.max("us").cast("long").alias("max_us"),
            F.sum(moved).cast("long").alias("n_moved"),
        )
        .orderBy("split", "event_type")
    )


Q333_SQL = f"""
WITH base AS (
    SELECT user_id, event_type, value,
           epoch_us(CAST(ts AS TIMESTAMP)) AS us,
           epoch_us(CAST(ts AS TIMESTAMP)) // {_DAY_US} AS day,
           ROW_NUMBER() OVER (
               PARTITION BY user_id
               ORDER BY CAST(ts AS TIMESTAMP), event_id
           ) AS r,
           COUNT(*) OVER (PARTITION BY user_id) AS n
    FROM events
),
tagged AS (
    SELECT *, CASE WHEN r * 10 <= n * 8 OR r = 1 THEN 'train'
                   WHEN r * 10 <= n * 9 THEN 'valid'
                   ELSE 'test' END AS split
    FROM base
),
dayed AS (
    SELECT *, MIN(r) OVER (PARTITION BY user_id, day) AS day_min_r
    FROM tagged
),
ds AS (
    SELECT *, MAX(CASE WHEN r = day_min_r THEN split END)
                  OVER (PARTITION BY user_id, day) AS day_split
    FROM dayed
)
SELECT day_split AS split, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       {SQL_DEC_SUM.format(x="value")} AS value_sum,
       CAST(MIN(us) AS BIGINT) AS min_us,
       CAST(MAX(us) AS BIGINT) AS max_us,
       CAST(SUM(CASE WHEN split <> day_split THEN 1 ELSE 0 END) AS BIGINT)
           AS n_moved
FROM ds
GROUP BY day_split, event_type
ORDER BY split, event_type
"""


def q324_feature_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    spine = orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        (F.row_number().over(w) - 1).cast("long").alias("n_prior_orders"),
        F.lag("o_totalprice").over(w).alias("prev_totalprice"),
    )
    ev = events.select(
        F.col("user_id").alias("o_custkey"),
        "ts",
        "event_id",
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_event_value"),
    )
    joined = asof_join(
        spine,
        ev,
        on=["o_custkey"],
        left_time="o_orderdate",
        right_time="ts",
        right_payload=["last_event_type", "last_event_value"],
        tiebreak="event_id",
    )
    return joined.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        "n_prior_orders",
        "prev_totalprice",
        F.col("matched_ts").alias("last_event_ts"),
        "last_event_type",
        "last_event_value",
    ).orderBy("o_orderkey")


Q324_SQL = """
WITH spine AS (
    SELECT o_orderkey, o_custkey, o_orderdate,
           CAST(ROW_NUMBER() OVER w - 1 AS BIGINT) AS n_prior_orders,
           LAG(o_totalprice) OVER w AS prev_totalprice
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
),
m AS (
    SELECT s.o_orderkey,
           CAST(e.ts AS TIMESTAMP) AS last_event_ts,
           e.event_type AS last_event_type,
           e.value AS last_event_value,
           ROW_NUMBER() OVER (
               PARTITION BY s.o_orderkey
               ORDER BY CAST(e.ts AS TIMESTAMP) DESC, e.event_id DESC
           ) AS rn
    FROM spine s
    JOIN events e
      ON e.user_id = s.o_custkey
     AND CAST(e.ts AS TIMESTAMP) <= s.o_orderdate
)
SELECT s.o_orderkey, s.o_custkey, s.o_orderdate,
       s.n_prior_orders, s.prev_totalprice,
       m.last_event_ts, m.last_event_type, m.last_event_value
FROM spine s
LEFT JOIN (SELECT * FROM m WHERE rn = 1) m USING (o_orderkey)
ORDER BY s.o_orderkey
"""


# ---------------------------------------------------------------------------
# Q325 — Deterministic negative sampling for contrastive/ranking training:
# per customer, NEG_SLOTS pseudo-random candidate parts drawn by the
# engine-portable hash60 over (custkey, slot), validated against the part
# dimension (an equi-join — key-space gaps just lower yield, never bias a
# surviving sample) and anti-joined against the customer's true purchases
# so no negative is secretly a positive. No RNG state, reproducible on any
# engine, stable under re-partitioning (the q65 hash-split discipline);
# collided slots are DROPPED, not resampled — resampling would make slot
# k's value depend on slots 0..k-1 and break per-slot reproducibility.
# Scale shape: one hash per (customer, slot), one equi-join to part, one
# keyed anti-join on (custkey, partkey); the 1-row key-range anchor rides
# a broadcast crossJoin (q03 pattern).
# ---------------------------------------------------------------------------

_NEG_SLOTS = 4


def q325_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pos = (
        orders.select("o_orderkey", "o_custkey")
        .join(
            li.select(F.col("l_orderkey").alias("o_orderkey"), "l_partkey"),
            "o_orderkey",
        )
        .select(
            F.col("o_custkey").alias("c_custkey"),
            F.col("l_partkey").alias("cand_partkey"),
        )
        .distinct()
    )
    rng = part.groupBy().agg(
        F.min("p_partkey").alias("__lo"), F.max("p_partkey").alias("__hi")
    )
    cand = (
        cust.crossJoin(F.broadcast(rng))
        .select(
            "c_custkey",
            F.explode(
                F.array(*[F.lit(s) for s in range(_NEG_SLOTS)])
            ).alias("slot"),
            "__lo",
            "__hi",
        )
        .select(
            "c_custkey",
            "slot",
            (
                F.col("__lo")
                + hash60(
                    F.concat_ws(
                        "#",
                        F.col("c_custkey").cast("string"),
                        F.col("slot").cast("string"),
                    )
                )
                % (F.col("__hi") - F.col("__lo") + 1)
            ).alias("cand_partkey"),
        )
    )
    return (
        cand.join(
            part.select(F.col("p_partkey").alias("cand_partkey")),
            "cand_partkey",
            "left_semi",
        )
        .join(pos, ["c_custkey", "cand_partkey"], "left_anti")
        .select(
            "c_custkey",
            "slot",
            F.col("cand_partkey").alias("neg_partkey"),
        )
        .orderBy("c_custkey", "slot")
    )


Q325_SQL = f"""
WITH rng AS (
    SELECT MIN(p_partkey) AS lo, MAX(p_partkey) AS hi FROM part
),
pos AS (
    SELECT DISTINCT o.o_custkey AS c_custkey, l.l_partkey AS cand_partkey
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
cand AS (
    SELECT c.c_custkey, s.slot,
           rng.lo + {hash60_sql("c.c_custkey || '#' || s.slot")}
                    % (rng.hi - rng.lo + 1) AS cand_partkey
    FROM customer c
    CROSS JOIN rng
    CROSS JOIN (
        SELECT unnest(generate_series(0, {_NEG_SLOTS - 1})) AS slot
    ) s
)
SELECT c.c_custkey, CAST(c.slot AS INT) AS slot,
       c.cand_partkey AS neg_partkey
FROM cand c
WHERE EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = c.cand_partkey)
  AND NOT EXISTS (
      SELECT 1 FROM pos
      WHERE pos.c_custkey = c.c_custkey
        AND pos.cand_partkey = c.cand_partkey
  )
ORDER BY c.c_custkey, c.slot
"""


CURATION_QUERIES = {
    "q324_feature_asof": q324_feature_asof,
    "q325_negative_sampling": q325_negative_sampling,
    "q276_interleave_schedule": q276_interleave_schedule,
    "q300_release_readiness": q300_release_readiness,
    "q310_corpus_composition": q310_corpus_composition,
    "q280_split_contamination": q280_split_contamination,
    "q254_temperature_mixture": q254_temperature_mixture,
    "q200_curation_pipeline": q200_curation_pipeline,
    "q208_k_anonymity": q208_k_anonymity,
    "q70_repetition_signals": q70_repetition_signals,
    "q71_stratified_sample": q71_stratified_sample,
    "q72_source_vocabulary": q72_source_vocabulary,
    "q73_decontamination": q73_decontamination,
    "q74_dedup_survivors": q74_dedup_survivors,
    "q76_domain_cap": q76_domain_cap,
    "q77_pii_scan": q77_pii_scan,
    "q89_sequence_packing": q89_sequence_packing,
    "q90_drift_chi2": q90_drift_chi2,
    "q101_curation_verdict": q101_curation_verdict,
    "q146_token_budget_sample": q146_token_budget_sample,
    "q152_dsir_selection": q152_dsir_selection,
    "q156_mixture_allocation": q156_mixture_allocation,
    "q162_shard_manifest": q162_shard_manifest,
    "q175_pps_sample": q175_pps_sample,
    "q333_temporal_split": q333_temporal_split,
}

CURATION_ORACLES = {
    "q333_temporal_split": Q333_SQL,
    "q324_feature_asof": Q324_SQL,
    "q325_negative_sampling": Q325_SQL,
    "q276_interleave_schedule": Q276_SQL,
    "q300_release_readiness": Q300_SQL,
    "q310_corpus_composition": Q310_SQL,
    "q280_split_contamination": Q280_SQL,
    "q254_temperature_mixture": Q254_SQL,
    "q200_curation_pipeline": Q200_SQL,
    "q208_k_anonymity": Q208_SQL,
    "q70_repetition_signals": Q70_SQL,
    "q71_stratified_sample": Q71_SQL,
    "q72_source_vocabulary": Q72_SQL,
    "q73_decontamination": Q73_SQL,
    "q74_dedup_survivors": Q74_SQL,
    "q76_domain_cap": Q76_SQL,
    "q77_pii_scan": Q77_SQL,
    "q89_sequence_packing": Q89_SQL,
    "q90_drift_chi2": Q90_SQL,
    "q101_curation_verdict": Q101_SQL,
    "q146_token_budget_sample": Q146_SQL,
    "q152_dsir_selection": Q152_SQL,
    "q156_mixture_allocation": Q156_SQL,
    "q162_shard_manifest": Q162_SQL,
    "q175_pps_sample": Q175_SQL,
}
