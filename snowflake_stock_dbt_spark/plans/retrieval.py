"""[EXT] Retrieval & record-linkage family (round 5): BM25 ranked search,
sorted-neighborhood dedup, and Fellegi-Sunter probabilistic linkage.

Not in the reference (its query surface stops at warehouse analytics —
SURVEY.md §2); these are the IR/linkage primitives a training-data
pipeline runs next to the dedup family: lexical retrieval for hard-negative
mining and eval-set construction, sort-based blocking as the third
candidate-generation archetype (alongside hash/LSH banding and IVF), and
weighted record linkage for entity resolution across source catalogs.

Determinism: every score is integer-grid math (the lm.py convention) —
BM25 on an exact rational grid floored to 1e-9, linkage weights as
integer log-likelihood constants — so all three carry full value oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from ..functions.localframe import local_frame

from ..sources.tables import load_table

# ---------------------------------------------------------------------------
# Q186 — BM25 ranked retrieval over the documents table.
#
# Okapi BM25 with k1 = 1.2, b = 0.75, and the ln-free Robertson-Sparck-
# Jones idf (N - df + 0.5)/(df + 0.5) — rationalized so every per-term
# score is an exact integer ratio:
#
#   idf   = (2(N - df) + 1) / (2 df + 1)
#   tfp   = tf (k1+1) / (tf + k1 (1 - b + b dl/avgdl))
#         = 88 tf TL / (40 TL tf + 12 TL + 36 dl N)      [avgdl = TL/N]
#   score = floor(idf * tfp * 1e9)   — summed over query terms.
#
# The products run in DECIMAL(38,0) (ceiling ~1e33 at a 1e9-doc corpus,
# inside DECIMAL(38) headroom; the floored quotient is < 64 * 1e9 per
# term, BIGINT-safe), with integral division on both engines — so the
# ranking is bit-identical everywhere, no transcendental in sight.
#
# Scale shape: one token explode -> (doc, term) tf agg (map-side
# combined), df agg over the 4-term semi-joined subset only, and the
# 1-row (N, TL) stats broadcast (the q03 pattern). Top-K is a heap.
# ---------------------------------------------------------------------------

BM25_QUERY_TERMS = ["spark", "table", "hash", "window"]
BM25_TOP_K = 20
_BM25_SCALE = 1_000_000_000


def q186_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term"),
    ).where(F.col("term") != "")
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_len")
    )
    qt = toks.where(F.col("term").isin(BM25_QUERY_TERMS))
    tf = qt.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("doc_freq"))
    per_term = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.expr(
                f"""CAST(
                    CAST(2 * (n_docs - doc_freq) + 1 AS DECIMAL(38,0))
                    * CAST(88 * tf * total_len AS DECIMAL(38,0))
                    * {_BM25_SCALE}
                    DIV (CAST(2 * doc_freq + 1 AS DECIMAL(38,0))
                         * CAST(40 * total_len * tf + 12 * total_len
                                + 36 * dl * n_docs AS DECIMAL(38,0)))
                    AS BIGINT)"""
            ).alias("term_score"),
        )
    )
    scored = per_term.groupBy("doc_id").agg(
        F.sum("term_score").alias("bm25_scaled"),
        F.count("*").alias("n_terms_hit"),
    )
    # Top-K via orderBy+limit (a per-partition TakeOrdered heap); the rank
    # column attaches AFTER the cut so the window runs over a constant
    # K-row frame, never the corpus (the q152 pattern).
    top = scored.orderBy(
        F.col("bm25_scaled").desc(), F.col("doc_id")
    ).limit(BM25_TOP_K)
    w = Window.orderBy(F.col("bm25_scaled").desc(), F.col("doc_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("int")).select(
        "doc_id", "bm25_scaled", "n_terms_hit", "rank"
    )


_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_QUERY_TERMS)

Q186_SQL = rf"""
WITH toks AS (
    SELECT doc_id, u.term
    FROM (SELECT doc_id,
                 string_split_regex(TRIM(text), '\s+') AS t FROM documents),
         UNNEST(t) AS u(term)
    WHERE u.term <> ''
),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total_len FROM dl),
tf AS (
    SELECT doc_id, term, COUNT(*) AS tf FROM toks
    WHERE term IN ({_BM25_TERMS_SQL}) GROUP BY doc_id, term
),
dfreq AS (SELECT term, COUNT(*) AS doc_freq FROM tf GROUP BY term),
per_term AS (
    SELECT tf.doc_id,
           CAST(CAST(2 * (n_docs - doc_freq) + 1 AS HUGEINT)
                * CAST(88 * tf * total_len AS HUGEINT)
                * {_BM25_SCALE}
                // (CAST(2 * doc_freq + 1 AS HUGEINT)
                    * CAST(40 * total_len * tf + 12 * total_len
                           + 36 * dl * n_docs AS HUGEINT))
                AS BIGINT) AS term_score
    FROM tf JOIN dfreq USING (term) JOIN dl ON dl.doc_id = tf.doc_id
    CROSS JOIN stats
),
scored AS (
    SELECT doc_id, CAST(SUM(term_score) AS BIGINT) AS bm25_scaled,
           COUNT(*) AS n_terms_hit
    FROM per_term GROUP BY doc_id
)
SELECT doc_id, bm25_scaled, n_terms_hit,
       CAST(ROW_NUMBER() OVER (ORDER BY bm25_scaled DESC, doc_id) AS INT)
         AS rank
FROM scored
ORDER BY rank
LIMIT {BM25_TOP_K}
"""


# ---------------------------------------------------------------------------
# Q187 — Sorted-neighborhood dedup (SNM, Hernandez & Stolfo 1995): the
# third candidate-generation archetype after hash/LSH banding (q21-q24)
# and IVF blocking (q26+): SORT the corpus by a cheap key and compare
# each record only against its w nearest neighbors in sort order.
#
# Sort key (lang, n_chars, doc_id); window w = 3 via LEAD over a window
# PARTITIONED by lang — candidate pairs are (doc, next-1..3 in order),
# scored by exact token-set Jaccard (array_intersect/union on distinct
# tokens: integers + one exact int/int double division).
#
# Scale note: partitioning the sort by lang keeps this shape shuffle-
# bounded, but a dominant language makes one window partition large; the
# production path is :func:`snm_pairs_bucketed` below — deterministic
# range buckets + prefix-sum global positions + a banded distance join,
# proved pair-for-pair equal to this windowed form
# (tests/test_round5_properties.py::test_snm_bucketed_equals_windowed).
# The windowed form stays registered because it IS the semantics the
# bucketed form must reproduce, and the oracle replays it directly.
# ---------------------------------------------------------------------------

SNM_WINDOW = 3
SNM_THRESHOLD = 0.5


def q187_snm_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "n_chars",
        F.array_distinct(
            F.filter(
                F.split(F.trim(F.col("text")), r"\s+"), lambda t: t != ""
            )
        ).alias("tset"),
    )
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    paired = docs.select(
        "lang",
        F.col("doc_id").alias("id_a"),
        F.col("tset").alias("set_a"),
        *[
            F.lead("doc_id", i).over(w).alias(f"id_b_{i}")
            for i in range(1, SNM_WINDOW + 1)
        ],
        *[
            F.lead("tset", i).over(w).alias(f"set_b_{i}")
            for i in range(1, SNM_WINDOW + 1)
        ],
    )
    arms = []
    for i in range(1, SNM_WINDOW + 1):
        arms.append(
            paired.where(F.col(f"id_b_{i}").isNotNull()).select(
                "lang",
                "id_a",
                F.col(f"id_b_{i}").alias("id_b"),
                F.lit(i).alias("neighbor_rank"),
                F.size(
                    F.array_intersect("set_a", F.col(f"set_b_{i}"))
                ).alias("n_inter"),
                F.size(
                    F.array_union("set_a", F.col(f"set_b_{i}"))
                ).alias("n_union"),
            )
        )
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return (
        out.withColumn(
            "jaccard",
            F.col("n_inter").cast("double") / F.col("n_union").cast("double"),
        )
        .where(F.col("jaccard") >= SNM_THRESHOLD)
        .select(
            "lang", "id_a", "id_b", "neighbor_rank",
            "n_inter", "n_union", "jaccard",
        )
    )


def snm_pairs_bucketed(
    docs: DataFrame,
    window: int = SNM_WINDOW,
    bucket_width: int = 16,
) -> DataFrame:
    """The PRODUCTION-SCALE twin of q187's windowed SNM: candidate pairs
    (id_a, id_b, neighbor_rank) identical to the per-lang LEAD window,
    but with the sort bucketed so no partition ever holds a whole
    language.

    Shape: deterministic range buckets (``n_chars div bucket_width`` —
    explicit, not sampled, so output is reproducible run-to-run, unlike
    repartitionByRange's sampled boundaries). The exact global sort
    position is recovered WITHOUT a global sort: row_number inside each
    (lang, bucket) — bucket-bounded window state — plus a prefix sum
    over the per-bucket counts (a window over bucket-count rows, never
    over documents). Neighbors at sort distance 1..w are then found by a
    banded self-join on ``pos div w`` (same band or next — two keyed
    equi-joins), which is exact for ANY bucket occupancy, including
    buckets sparser than w where the naive tail-head stitch misses
    pairs. Equality with the global window is proved by
    tests/test_round5_properties.py, so this plan can replace the
    windowed one at any scale without changing a single output pair.

    ``docs`` must carry (doc_id, lang, n_chars, tset).
    """
    b = docs.withColumn(
        "bucket", F.floor(F.col("n_chars") / bucket_width).cast("long")
    )
    # Exact global sort position WITHOUT a global sort: row_number inside
    # each (lang, bucket) — bucket-bounded window state — plus a prefix
    # sum over the per-bucket COUNTS, a window over bucket-count rows
    # (thousands at most), never over documents.
    inner_w = Window.partitionBy("lang", "bucket").orderBy(
        "n_chars", "doc_id"
    )
    ranked = b.withColumn("r", F.row_number().over(inner_w))
    counts = b.groupBy("lang", "bucket").agg(F.count("*").alias("cnt"))
    pw = (
        Window.partitionBy("lang")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = counts.withColumn(
        "prefix", F.coalesce(F.sum("cnt").over(pw), F.lit(0))
    ).select("lang", "bucket", "prefix")
    pos = ranked.join(prefix, ["lang", "bucket"]).select(
        "lang",
        "doc_id",
        "tset",
        (F.col("prefix") + F.col("r")).alias("pos"),
    )
    # Bounded-distance self-join via position bands of width w: a
    # partner at distance 1..w lives in the same band or the next one —
    # two keyed equi-joins, no range scan, no global anything.
    a_side = pos.select(
        "lang",
        F.col("doc_id").alias("id_a"),
        F.col("tset").alias("set_a"),
        F.col("pos").alias("pos_a"),
        F.floor(F.col("pos") / window).alias("band"),
    )
    b_side = pos.select(
        F.col("lang").alias("lang_b"),
        F.col("doc_id").alias("id_b"),
        F.col("tset").alias("set_b"),
        F.col("pos").alias("pos_b"),
        F.floor(F.col("pos") / window).alias("b_band"),
    )
    out = None
    for shift in (0, 1):
        arm = (
            a_side.withColumn("probe", F.col("band") + shift)
            .join(
                b_side,
                (F.col("probe") == F.col("b_band"))
                & (F.col("lang") == F.col("lang_b")),
            )
            .where(
                (F.col("pos_b") - F.col("pos_a") >= 1)
                & (F.col("pos_b") - F.col("pos_a") <= window)
            )
            .select(
                "lang",
                "id_a",
                "id_b",
                (F.col("pos_b") - F.col("pos_a")).cast("int").alias(
                    "neighbor_rank"
                ),
                "set_a",
                "set_b",
            )
        )
        out = arm if out is None else out.unionByName(arm)
    return (
        out.select(
            "lang",
            "id_a",
            "id_b",
            F.col("neighbor_rank").cast("int").alias("neighbor_rank"),
            F.size(F.array_intersect("set_a", "set_b")).alias("n_inter"),
            F.size(F.array_union("set_a", "set_b")).alias("n_union"),
        )
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double") / F.col("n_union").cast("double"),
        )
    )


_SNM_ARM_SQL = "\nUNION ALL\n".join(
    f"""SELECT lang, doc_id AS id_a,
       LEAD(doc_id, {i}) OVER w{i} AS id_b,
       {i} AS neighbor_rank,
       tset AS set_a,
       LEAD(tset, {i}) OVER w{i} AS set_b
FROM base
WINDOW w{i} AS (PARTITION BY lang ORDER BY n_chars, doc_id)"""
    for i in range(1, SNM_WINDOW + 1)
)

Q187_SQL = rf"""
WITH base AS (
    SELECT doc_id, lang, n_chars,
           list_distinct(list_filter(
               string_split_regex(TRIM(text), '\s+'), t -> t <> ''
           )) AS tset
    FROM documents
),
arms AS (
{_SNM_ARM_SQL}
),
scored AS (
    SELECT lang, id_a, id_b, CAST(neighbor_rank AS INT) AS neighbor_rank,
           CAST(len(list_intersect(set_a, set_b)) AS INT) AS n_inter,
           CAST(len(list_distinct(list_concat(set_a, set_b))) AS INT)
             AS n_union
    FROM arms WHERE id_b IS NOT NULL
)
SELECT lang, id_a, id_b, neighbor_rank, n_inter, n_union,
       CAST(n_inter AS DOUBLE) / CAST(n_union AS DOUBLE) AS jaccard
FROM scored
WHERE CAST(n_inter AS DOUBLE) / CAST(n_union AS DOUBLE) >= {SNM_THRESHOLD}
"""


# ---------------------------------------------------------------------------
# Q188 — Fellegi-Sunter probabilistic record linkage (1969): blocked
# candidate pairs scored by a sum of per-field agreement/disagreement
# log-likelihood weights, classified match / possible / nonmatch by two
# thresholds. The weights are integer constants (ln(m/u) resp.
# ln((1-m)/(1-u)) on a x16 grid, precomputed — in production they come
# from an EM fit, which is driver-side state just like trained k-means
# centroids), so the whole decision rule is exact integer arithmetic.
#
# Here: link customers to suppliers, blocked on nationkey (never
# all-pairs: |C|x|S| within a nation only), agreement fields
#   f1: account-balance bucket (floor(bal/1000))   w+ 40 / w- -15
#   f2: entity-key mod 7                           w+ 25 / w-  -8
#   f3: name numeric suffix mod 100                w+ 30 / w- -10
# ---------------------------------------------------------------------------

FS_MATCH_T = 50
FS_POSSIBLE_T = 10


def q188_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust_id"),
        F.col("c_nationkey").alias("nation"),
        F.floor(F.col("c_acctbal") / 1000).alias("c_balb"),
        (F.col("c_custkey") % 7).alias("c_k7"),
        (
            F.regexp_extract(F.col("c_name"), r"(\d+)$", 1).cast("long") % 100
        ).alias("c_sfx"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("supp_id"),
        F.col("s_nationkey").alias("nation"),
        F.floor(F.col("s_acctbal") / 1000).alias("s_balb"),
        (F.col("s_suppkey") % 7).alias("s_k7"),
        (
            F.regexp_extract(F.col("s_name"), r"(\d+)$", 1).cast("long") % 100
        ).alias("s_sfx"),
    )
    pairs = cust.join(F.broadcast(supp), "nation")
    score = (
        F.when(F.col("c_balb") == F.col("s_balb"), 40).otherwise(-15)
        + F.when(F.col("c_k7") == F.col("s_k7"), 25).otherwise(-8)
        + F.when(F.col("c_sfx") == F.col("s_sfx"), 30).otherwise(-10)
    )
    return (
        pairs.withColumn("fs_score", score.cast("long"))
        .where(F.col("fs_score") >= FS_POSSIBLE_T)
        .select(
            "nation",
            "cust_id",
            "supp_id",
            "fs_score",
            F.when(F.col("fs_score") >= FS_MATCH_T, "match")
            .otherwise("possible")
            .alias("decision"),
        )
    )


Q188_SQL = rf"""
WITH c AS (
    SELECT c_custkey AS cust_id, c_nationkey AS nation,
           CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS c_balb,
           c_custkey % 7 AS c_k7,
           CAST(regexp_extract(c_name, '(\d+)$', 1) AS BIGINT) % 100 AS c_sfx
    FROM customer
),
s AS (
    SELECT s_suppkey AS supp_id, s_nationkey AS nation,
           CAST(FLOOR(s_acctbal / 1000) AS BIGINT) AS s_balb,
           s_suppkey % 7 AS s_k7,
           CAST(regexp_extract(s_name, '(\d+)$', 1) AS BIGINT) % 100 AS s_sfx
    FROM supplier
),
scored AS (
    SELECT c.nation, cust_id, supp_id,
           CAST(CASE WHEN c_balb = s_balb THEN 40 ELSE -15 END
              + CASE WHEN c_k7 = s_k7 THEN 25 ELSE -8 END
              + CASE WHEN c_sfx = s_sfx THEN 30 ELSE -10 END AS BIGINT)
             AS fs_score
    FROM c JOIN s ON c.nation = s.nation
)
SELECT nation, cust_id, supp_id, fs_score,
       CASE WHEN fs_score >= {FS_MATCH_T} THEN 'match'
            ELSE 'possible' END AS decision
FROM scored WHERE fs_score >= {FS_POSSIBLE_T}
"""


# ---------------------------------------------------------------------------
# Q201 — Inverted index construction: the IR-infrastructure counterpart
# of q186's BM25 (which *searches*; this *builds* what a search system
# serves). Per term: document frequency, total term frequency, and the
# posting list (doc:tf pairs, doc-ordered) — emitted as a canonical
# string so the cross-engine value hash covers the postings themselves,
# not just their counts. One explode + two keyed aggs, map-side
# combined; posting lists shard naturally by term at scale (the shuffle
# key IS the index key).
# ---------------------------------------------------------------------------


def q201_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term"),
    ).where(F.col("term") != "")
    tf = toks.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    return (
        tf.groupBy("term")
        .agg(
            F.count("*").alias("doc_freq"),
            F.sum("tf").alias("total_tf"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("doc_id", "tf"))
                    ),
                    lambda s: F.concat_ws(
                        ":",
                        s["doc_id"].cast("string"),
                        s["tf"].cast("string"),
                    ),
                ),
                ",",
            ).alias("postings"),
        )
        .orderBy("term")
    )


Q201_SQL = r"""
WITH toks AS (
    SELECT doc_id, u.term
    FROM (SELECT doc_id,
                 string_split_regex(TRIM(text), '\s+') AS t FROM documents),
         UNNEST(t) AS u(term)
    WHERE u.term <> ''
),
tf AS (
    SELECT term, doc_id, COUNT(*) AS tf FROM toks GROUP BY term, doc_id
)
SELECT term,
       COUNT(*) AS doc_freq,
       CAST(SUM(tf) AS BIGINT) AS total_tf,
       string_agg(CAST(doc_id AS VARCHAR) || ':' || CAST(tf AS VARCHAR),
                  ',' ORDER BY doc_id) AS postings
FROM tf
GROUP BY term
ORDER BY term
"""


# ---------------------------------------------------------------------------
# Q202 — CDC apply (MERGE with deletes, no Delta required): reconcile a
# base snapshot against a change feed of I/U/D operations into the next
# snapshot — one full-outer key join, latest-op-wins per key. The base
# here is orders minus every 10th key; the feed re-inserts those (I),
# reprices every 7th key (U, +5.00 exact decimal), and tombstones every
# 13th (D, which outranks U/I by sequence). This is the lakehouse CDC
# pattern expressed in plain parquet + join semantics — the
# transactional-commit flavor lives behind the Delta-gated upsert
# (operators/upsert.py); the ANSWER is engine-neutral and fully
# value-oracled.
# ---------------------------------------------------------------------------

_CDC_INS_MOD = 10
_CDC_UPD_MOD = 7
_CDC_DEL_MOD = 13


def q202_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        "o_orderpriority",
    )
    base = orders.where(F.col("o_orderkey") % _CDC_INS_MOD != 0)
    inserts = orders.where(F.col("o_orderkey") % _CDC_INS_MOD == 0).select(
        "o_orderkey", "price", "o_orderpriority",
        F.lit("I").alias("op"), F.lit(1).alias("seq"),
    )
    updates = orders.where(F.col("o_orderkey") % _CDC_UPD_MOD == 0).select(
        "o_orderkey",
        (F.col("price") + F.lit(5).cast("decimal(18,2)")).alias("price"),
        "o_orderpriority",
        F.lit("U").alias("op"), F.lit(2).alias("seq"),
    )
    deletes = orders.where(F.col("o_orderkey") % _CDC_DEL_MOD == 0).select(
        "o_orderkey",
        F.lit(None).cast("decimal(18,2)").alias("price"),
        F.lit(None).cast("string").alias("o_orderpriority"),
        F.lit("D").alias("op"), F.lit(3).alias("seq"),
    )
    feed = inserts.unionByName(updates).unionByName(deletes)
    sw = Window.partitionBy("o_orderkey").orderBy(F.col("seq").desc())
    latest = (
        feed.withColumn("rn", F.row_number().over(sw))
        .where(F.col("rn") == 1)
        .select(
            F.col("o_orderkey").alias("f_key"),
            F.col("price").alias("f_price"),
            F.col("o_orderpriority").alias("f_priority"),
            "op",
        )
    )
    applied = base.join(
        latest, base.o_orderkey == latest.f_key, "full_outer"
    )
    return (
        applied.where(
            F.col("op").isNull() | (F.col("op") != "D")
        )
        .select(
            F.coalesce("o_orderkey", "f_key").alias("o_orderkey"),
            F.when(F.col("op").isNotNull(), F.col("f_price"))
            .otherwise(F.col("price"))
            .cast("double")
            .alias("o_totalprice"),
            F.when(F.col("op").isNotNull(), F.col("f_priority"))
            .otherwise(F.col("o_orderpriority"))
            .alias("o_orderpriority"),
        )
    )


Q202_SQL = f"""
WITH o AS (
    SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS price,
           o_orderpriority
    FROM orders
),
base AS (SELECT * FROM o WHERE o_orderkey % {_CDC_INS_MOD} <> 0),
feed AS (
    SELECT o_orderkey, price, o_orderpriority, 'I' AS op, 1 AS seq
    FROM o WHERE o_orderkey % {_CDC_INS_MOD} = 0
    UNION ALL
    SELECT o_orderkey, price + 5.00, o_orderpriority, 'U', 2
    FROM o WHERE o_orderkey % {_CDC_UPD_MOD} = 0
    UNION ALL
    SELECT o_orderkey, NULL, NULL, 'D', 3
    FROM o WHERE o_orderkey % {_CDC_DEL_MOD} = 0
),
latest AS (
    SELECT o_orderkey AS f_key, price AS f_price,
           o_orderpriority AS f_priority, op
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY o_orderkey ORDER BY seq DESC
        ) AS rn FROM feed
    ) WHERE rn = 1
)
SELECT COALESCE(base.o_orderkey, latest.f_key) AS o_orderkey,
       CAST(CASE WHEN latest.op IS NOT NULL THEN latest.f_price
                 ELSE base.price END AS DOUBLE) AS o_totalprice,
       CASE WHEN latest.op IS NOT NULL THEN latest.f_priority
            ELSE base.o_orderpriority END AS o_orderpriority
FROM base FULL OUTER JOIN latest ON base.o_orderkey = latest.f_key
WHERE latest.op IS NULL OR latest.op <> 'D'
"""


# ---------------------------------------------------------------------------
# Q211 — Hybrid search via Reciprocal-Rank Fusion (Cormack et al. 2009):
# fuse the lexical BM25 top-20 (q186, documents) with the dense cosine
# top-20 for one query embedding (q25's exact-decimal scoring) through
#
#   RRF(d) = Σ_lists 1 / (60 + rank_list(d))
#
# computed on the parts-per-billion integer grid (1e9 DIV (60 + rank) —
# integral division, at most two terms per doc added as exact integers),
# so the fused ranking needs no float summation anywhere. The synthetic
# corpus aligns vec_id with doc_id (TESTDATA.md), which is exactly the
# doc-embedding layout a hybrid index serves.
#
# Scale shape: both input rankings are K-row frames (top-K heaps
# upstream); the fusion is a K-vs-K full-outer join + a K-row sort —
# driver-free, corpus-size-independent.
# ---------------------------------------------------------------------------

RRF_K = 60
RRF_LIST_K = 20
RRF_TOP = 10
RRF_DENSE_QUERY = 0
_RRF_SCALE = 1_000_000_000


def q211_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import cosine_topk_exact

    lex = q186_bm25_search(spark, sf_dir).select(
        F.col("doc_id").alias("id"), F.col("rank").alias("lex_rank")
    )
    emb = load_table(spark, sf_dir, "embeddings")
    dense = cosine_topk_exact(
        emb.where(F.col("vec_id") == RRF_DENSE_QUERY), emb, k=RRF_LIST_K
    ).select(F.col("neighbor_id").alias("id"), F.col("rank").alias("dense_rank"))
    fused = lex.join(dense, "id", "full_outer").select(
        "id",
        "lex_rank",
        "dense_rank",
        F.expr(
            f"COALESCE({_RRF_SCALE} DIV ({RRF_K} + lex_rank), 0)"
            f" + COALESCE({_RRF_SCALE} DIV ({RRF_K} + dense_rank), 0)"
        )
        .cast("long")
        .alias("rrf_ppb"),
    )
    top = fused.orderBy(F.col("rrf_ppb").desc(), F.col("id")).limit(RRF_TOP)
    w = Window.orderBy(F.col("rrf_ppb").desc(), F.col("id"))
    return top.withColumn("rank", F.row_number().over(w).cast("int")).select(
        "id", "lex_rank", "dense_rank", "rrf_ppb", "rank"
    )


Q211_SQL = f"""
WITH lex AS (
    SELECT doc_id AS id, rank AS lex_rank FROM ({Q186_SQL}) t
),
dq AS (
    SELECT embedding AS e FROM embeddings WHERE vec_id = {RRF_DENSE_QUERY}
),
qe AS (
    SELECT CAST(r.i AS INT) AS pos, CAST(e[r.i + 1] AS DOUBLE) AS v
    FROM dq CROSS JOIN range(0, 4096) r(i) WHERE r.i < len(e)
),
ce AS (
    SELECT vec_id AS c_id, CAST(r.i AS INT) AS pos,
           CAST(embedding[r.i + 1] AS DOUBLE) AS v
    FROM embeddings CROSS JOIN range(0, 4096) r(i)
    WHERE r.i < len(embedding)
),
dots AS (
    SELECT c_id, CAST(SUM(CAST(qe.v * ce.v AS DECIMAL(38,18))) AS DOUBLE) AS dot
    FROM qe JOIN ce USING (pos)
    WHERE c_id <> {RRF_DENSE_QUERY}
    GROUP BY c_id
),
qn AS (
    SELECT sqrt(CAST(SUM(CAST(v * v AS DECIMAL(38,18))) AS DOUBLE)) AS qn
    FROM qe
),
cn AS (
    SELECT c_id, sqrt(CAST(SUM(CAST(v * v AS DECIMAL(38,18))) AS DOUBLE)) AS cn
    FROM ce GROUP BY c_id
),
dranked AS (
    SELECT c_id AS id,
           CAST(ROW_NUMBER() OVER (
               ORDER BY dot / NULLIF(qn * cn, 0.0) DESC NULLS LAST, c_id
           ) AS INT) AS dense_rank
    FROM dots CROSS JOIN qn JOIN cn USING (c_id)
),
dense AS (SELECT id, dense_rank FROM dranked WHERE dense_rank <= {RRF_LIST_K}),
fused AS (
    SELECT COALESCE(lex.id, dense.id) AS id, lex_rank, dense_rank,
           CAST(COALESCE({_RRF_SCALE} // ({RRF_K} + lex_rank), 0)
                + COALESCE({_RRF_SCALE} // ({RRF_K} + dense_rank), 0)
                AS BIGINT) AS rrf_ppb
    FROM lex FULL OUTER JOIN dense ON lex.id = dense.id
)
SELECT id, lex_rank, dense_rank, rrf_ppb,
       CAST(ROW_NUMBER() OVER (ORDER BY rrf_ppb DESC, id) AS INT) AS rank
FROM fused
ORDER BY rrf_ppb DESC, id
LIMIT {RRF_TOP}
"""


# ---------------------------------------------------------------------------
# Q255 — POSITIONAL PHRASE SEARCH: exact-adjacency phrase matching
# ("term1 term2" as a quoted query) via a positional posting join — the
# capability q201's frequency-only postings can't serve (tf postings
# prove co-occurrence, not adjacency; every real search engine keeps
# positions precisely for this). Tokens are numbered over the
# EMPTY-FILTERED token array (so positions are adjacency-meaningful
# regardless of whitespace runs); a phrase hit is p1 ⋈ p2 on (doc_id,
# pos2 = pos1 + 1). The fixed query set joins in as a BROADCAST frame,
# which pushes term selectivity into the posting build. Per phrase and
# doc: match count. All integers. Scale: postings are linear in corpus
# tokens; the phrase join is equi on (term-selected) postings keyed by
# doc — never a cross product.
# ---------------------------------------------------------------------------

#: Quoted phrase queries (terms drawn from the synthetic vocabulary).
PHRASE_QUERIES = [
    ("p1", "table", "hash"),
    ("p2", "customer", "join"),
    ("p3", "merge", "order"),
]


def q255_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pos = docs.select(
        "doc_id",
        F.posexplode(
            F.filter(
                F.split(F.trim(F.col("text")), r"\s+"),
                lambda x: x != "",
            )
        ).alias("pos", "term"),
    )
    phrases = local_frame(
        spark, PHRASE_QUERIES, "phrase_id string, t1 string, t2 string"
    )
    first = pos.join(
        F.broadcast(phrases), pos.term == phrases.t1
    ).select("phrase_id", "t2", "doc_id", "pos")
    hits = first.join(
        pos.alias("p2"),
        (F.col("p2.doc_id") == first.doc_id)
        & (F.col("p2.term") == first.t2)
        & (F.col("p2.pos") == first.pos + 1),
    )
    return (
        hits.groupBy("phrase_id", first.doc_id.alias("doc_id"))
        .agg(F.count("*").cast("long").alias("n_matches"))
        .orderBy("phrase_id", "doc_id")
    )


_PHRASE_VALUES = ", ".join(
    f"('{p}', '{a}', '{b}')" for p, a, b in PHRASE_QUERIES
)

Q255_SQL = rf"""
WITH d AS (
    SELECT doc_id,
           list_filter(string_split_regex(TRIM(text), '\s+'),
                       x -> x <> '') AS toks
    FROM documents
),
p AS (
    SELECT doc_id, toks[r.i + 1] AS term, CAST(r.i AS INT) AS pos
    FROM d CROSS JOIN range(0, 100000) r(i)
    WHERE r.i < len(toks)
),
phrases(phrase_id, t1, t2) AS (VALUES {_PHRASE_VALUES})
SELECT ph.phrase_id, a.doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches
FROM phrases ph
JOIN p a ON a.term = ph.t1
JOIN p b ON b.doc_id = a.doc_id AND b.term = ph.t2 AND b.pos = a.pos + 1
GROUP BY 1, 2
ORDER BY 1, 2
"""




# ---------------------------------------------------------------------------
# Q334 — MMR diversified top-k retrieval (Carbonell & Goldstein, SIGIR
# 1998): the diversification stage RAG context assembly runs after
# candidate retrieval — q211 fuses rankings (RRF), q334 de-redundifies
# one. Per query: exact-cosine top-m candidates, then k greedy rounds of
# argmax(w_rel·rel − w_div·max-sim-to-selected), λ = 0.7 as the integer
# weights 7/3.
#
# Determinism: relevance and pairwise similarity land on an integer
# NANO-cosine grid (ROUND(cos·1e9) — the q25 exact-decimal cosine
# first), so every greedy comparison is integer math; ties break to the
# smallest cand_id. The greedy loop is unrolled identically on both
# engines (operators/similarity.mmr_rerank ↔ the step CTEs below).
#
# Scale: candidate generation is the only corpus-scale stage (q25's
# broadcast-queries shape, no |corpus|×dim shuffle); everything after
# runs on bounded candidate state (|Q|·m rows, |Q|·m² pair sims) that is
# localCheckpointed so the k rounds never replay the scan. Cost is
# O(|Q|·m²) pair scoring + k bounded rounds — independent of corpus size
# past retrieval.
# ---------------------------------------------------------------------------

MMR_NQ = 5
MMR_M = 12
MMR_K = 5
MMR_W_REL = 7
MMR_W_DIV = 3


def _candidate_pairsim(emb: DataFrame, cand: DataFrame) -> DataFrame:
    """Nano-grid pairwise cosine (query_id, a_id, b_id, sim_n) between a
    bounded candidate set's embeddings — MMR's diversity input, shared
    by q334 (per-query candidates) and q342 (the fused hybrid list)."""
    from ..functions.vectors import dot_exact, norm_exact

    vecs = emb.select(
        "vec_id",
        F.col("embedding").alias("vec"),
        norm_exact(F.col("embedding")).alias("vn"),
    )
    av = vecs.selectExpr(
        "vec_id AS a_id", "vec AS a_vec", "vn AS a_n"
    ).join(
        F.broadcast(cand.select("query_id", F.col("cand_id").alias("a_id"))),
        "a_id",
    )
    bv = vecs.selectExpr(
        "vec_id AS b_id", "vec AS b_vec", "vn AS b_n"
    ).join(
        F.broadcast(cand.select("query_id", F.col("cand_id").alias("b_id"))),
        "b_id",
    )
    return (
        av.join(bv, "query_id")
        .where(F.col("a_id") != F.col("b_id"))
        .select(
            "query_id",
            "a_id",
            "b_id",
            F.round(
                dot_exact(F.col("a_vec"), F.col("b_vec"))
                / F.nullif(F.col("a_n") * F.col("b_n"), F.lit(0.0))
                * F.lit(1e9)
            )
            .cast("long")
            .alias("sim_n"),
        )
    )


def q334_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import cosine_topk_exact, mmr_rerank_arrow

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < MMR_NQ)
    topm = cosine_topk_exact(queries, emb, k=MMR_M)
    # Checkpoint the bounded candidate list BEFORE fanning it into the
    # a/b sides of the pair-sim join and the greedy rounds — otherwise
    # the corpus-scale top-m scan upstream executes once per reference
    # (measured 3× on q342's x16 probe before the same fix there).
    cand = topm.select(
        "query_id",
        F.col("neighbor_id").alias("cand_id"),
        F.round(F.col("cosine") * F.lit(1e9)).cast("long").alias("rel_n"),
    ).localCheckpoint()
    pairsim = _candidate_pairsim(emb, cand)
    # Arrow path: ONE shuffle by query_id, the greedy rounds run per
    # group on bounded candidate state (the unrolled-join reference
    # mmr_rerank is pinned row-for-row equal in tests and is what the
    # SQL oracle replays; the relational form cost ~6 s of round-job
    # scheduling per run at ANY corpus size — measured micro medians
    # 14.5 s vs ~3 s after the switch).
    return mmr_rerank_arrow(
        cand, pairsim, k=MMR_K, w_rel=MMR_W_REL, w_div=MMR_W_DIV
    ).orderBy("query_id", "sel_rank")


def _mmr_unrolled_sql(nq: int, m: int, k: int, w_rel: int, w_div: int) -> str:
    """DuckDB twin of q334: q25-shaped candidate generation to rank m,
    nano-grid quantization, then the k greedy rounds as unrolled CTEs."""
    head = f"""
qv AS (
    SELECT vec_id AS q_id, embedding AS e FROM embeddings
    WHERE vec_id < {nq}
),
qe AS (
    SELECT q_id, CAST(r.i AS INT) AS pos, CAST(e[r.i + 1] AS DOUBLE) AS v
    FROM qv CROSS JOIN range(0, 4096) r(i) WHERE r.i < len(e)
),
ce AS (
    SELECT vec_id AS c_id, CAST(r.i AS INT) AS pos,
           CAST(embedding[r.i + 1] AS DOUBLE) AS v
    FROM embeddings CROSS JOIN range(0, 4096) r(i)
    WHERE r.i < len(embedding)
),
qn AS (
    SELECT q_id, sqrt(CAST(SUM(CAST(v * v AS DECIMAL(38,18))) AS DOUBLE)) AS qn
    FROM qe GROUP BY q_id
),
cn AS (
    SELECT c_id, sqrt(CAST(SUM(CAST(v * v AS DECIMAL(38,18))) AS DOUBLE)) AS cn
    FROM ce GROUP BY c_id
),
dots AS (
    SELECT q_id, c_id,
           CAST(SUM(CAST(qe.v * ce.v AS DECIMAL(38,18))) AS DOUBLE) AS dot
    FROM qe JOIN ce USING (pos)
    WHERE q_id <> c_id
    GROUP BY q_id, c_id
),
rel AS (
    SELECT q_id AS query_id, c_id AS cand_id,
           dot / NULLIF(qn * cn, 0.0) AS cosine
    FROM dots JOIN qn USING (q_id) JOIN cn USING (c_id)
),
cand AS (
    SELECT query_id, cand_id,
           CAST(ROUND(cosine * 1000000000) AS BIGINT) AS rel_n
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC NULLS LAST, cand_id
        ) AS rnk
        FROM rel
    ) WHERE rnk <= {m}
),
pc AS (
    SELECT c1.query_id, c1.cand_id AS a_id, c2.cand_id AS b_id
    FROM cand c1 JOIN cand c2 USING (query_id)
    WHERE c1.cand_id <> c2.cand_id
),
pd AS (
    SELECT pc.query_id, pc.a_id, pc.b_id,
           CAST(SUM(CAST(ea.v * eb.v AS DECIMAL(38,18))) AS DOUBLE) AS dot
    FROM pc
    JOIN ce ea ON ea.c_id = pc.a_id
    JOIN ce eb ON eb.c_id = pc.b_id AND eb.pos = ea.pos
    GROUP BY 1, 2, 3
),
psim AS (
    SELECT pd.query_id, pd.a_id, pd.b_id,
           CAST(ROUND(pd.dot / NULLIF(ca.cn * cb.cn, 0.0) * 1000000000)
                AS BIGINT) AS sim_n
    FROM pd
    JOIN cn ca ON ca.c_id = pd.a_id
    JOIN cn cb ON cb.c_id = pd.b_id
),
sel1 AS (
    SELECT query_id, cand_id, 1 AS sel_rank, rel_n FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY rel_n DESC, cand_id
        ) AS rn FROM cand
    ) WHERE rn = 1
),
selset1 AS (SELECT query_id, cand_id FROM sel1)"""
    union = "\n    UNION ALL ".join(
        f"SELECT * FROM sel{t}" for t in range(1, k + 1)
    )
    return (
        "WITH"
        + head
        + _mmr_step_ctes(k, w_rel, w_div)
        + f"""
SELECT query_id, cand_id, CAST(sel_rank AS INT) AS sel_rank, rel_n
FROM ({union})
ORDER BY query_id, sel_rank
"""
    )


def _mmr_step_ctes(k: int, w_rel: int, w_div: int) -> str:
    """The greedy MMR rounds 2..k as CTE text, given ``cand``
    (query_id, cand_id, rel_n), ``psim`` (query_id, a_id, b_id, sim_n),
    and ``sel1``/``selset1`` already defined — shared between q334's
    self-contained oracle and q342's fused-candidate capstone."""
    parts = []
    for t in range(2, k + 1):
        parts.append(f""",
step{t} AS (
    SELECT c.query_id, c.cand_id, c.rel_n, MAX(p.sim_n) AS maxsim_n
    FROM cand c
    JOIN psim p ON p.query_id = c.query_id AND p.a_id = c.cand_id
    JOIN selset{t - 1} s ON s.query_id = p.query_id AND s.cand_id = p.b_id
    WHERE NOT EXISTS (
        SELECT 1 FROM selset{t - 1} x
        WHERE x.query_id = c.query_id AND x.cand_id = c.cand_id
    )
    GROUP BY 1, 2, 3
),
sel{t} AS (
    SELECT query_id, cand_id, {t} AS sel_rank, rel_n FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id
            ORDER BY {w_rel} * rel_n - {w_div} * maxsim_n DESC, cand_id
        ) AS rn FROM step{t}
    ) WHERE rn = 1
),
selset{t} AS (
    SELECT * FROM selset{t - 1}
    UNION ALL SELECT query_id, cand_id FROM sel{t}
)""")
    return "".join(parts)


Q334_SQL = _mmr_unrolled_sql(MMR_NQ, MMR_M, MMR_K, MMR_W_REL, MMR_W_DIV)




# ---------------------------------------------------------------------------
# Q338 — Snapshot DIFF (CDC derivation): the inverse of q202. q202
# APPLIES a given change feed onto a snapshot; real pipelines must also
# DERIVE the feed when an upstream hands them full table dumps — diff
# consecutive snapshot versions into I/U/D change rows (what Iceberg's
# changelog scan / Delta CDF materialize). Version 2 is derived
# deterministically from the orders snapshot on BOTH engines (delete
# every 13th key, reprice every 7th by an exact +5.00, clone every 10th
# under a disjoint key range), so the diff itself — one full-outer key
# join, IS DISTINCT FROM on the tracked column, unchanged rows dropped —
# carries a full value oracle.
#
# Scale: ONE co-partitioned full-outer shuffle on the key (both sides
# would be bucket-co-located on a lake, q337's layout); the diff output
# is |changes|, not |snapshot|.
# ---------------------------------------------------------------------------

_DIFF_DEL_MOD = 13
_DIFF_UPD_MOD = 7
_DIFF_INS_MOD = 10
_DIFF_INS_OFFSET = 1_000_000_000_000


def q338_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    v1 = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("p")
    )
    v2 = v1.where(F.col("k") % _DIFF_DEL_MOD != 0).select(
        "k",
        F.when(
            F.col("k") % _DIFF_UPD_MOD == 0, F.col("p") + F.lit(5.0)
        )
        .otherwise(F.col("p"))
        .alias("p"),
    ).unionAll(
        v1.where(F.col("k") % _DIFF_INS_MOD == 0).select(
            (F.col("k") + F.lit(_DIFF_INS_OFFSET)).alias("k"), "p"
        )
    )
    a = v1.select(F.col("k").alias("a_k"), F.col("p").alias("old_price"))
    b = v2.select(F.col("k").alias("b_k"), F.col("p").alias("new_price"))
    d = a.join(b, a["a_k"] == b["b_k"], "full_outer").select(
        F.coalesce("a_k", "b_k").alias("o_orderkey"),
        F.when(F.col("b_k").isNull(), "D")
        .when(F.col("a_k").isNull(), "I")
        .when(
            F.expr("old_price IS DISTINCT FROM new_price"), "U"
        )
        .alias("change_type"),
        "old_price",
        "new_price",
    )
    return d.where(F.col("change_type").isNotNull()).orderBy(
        "change_type", "o_orderkey"
    )


Q338_SQL = f"""
WITH v1 AS (
    SELECT o_orderkey AS k, o_totalprice AS p FROM orders
),
v2 AS (
    SELECT k,
           CASE WHEN k % {_DIFF_UPD_MOD} = 0 THEN p + 5.0 ELSE p END AS p
    FROM v1 WHERE k % {_DIFF_DEL_MOD} <> 0
    UNION ALL
    SELECT k + {_DIFF_INS_OFFSET}, p FROM v1 WHERE k % {_DIFF_INS_MOD} = 0
),
d AS (
    SELECT COALESCE(v1.k, v2.k) AS o_orderkey,
           CASE WHEN v2.k IS NULL THEN 'D'
                WHEN v1.k IS NULL THEN 'I'
                WHEN v1.p IS DISTINCT FROM v2.p THEN 'U' END AS change_type,
           v1.p AS old_price, v2.p AS new_price
    FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k
)
SELECT change_type, o_orderkey, old_price, new_price
FROM d WHERE change_type IS NOT NULL
ORDER BY change_type, o_orderkey
"""




# ---------------------------------------------------------------------------
# Q342 — Hybrid-retrieval CAPSTONE: BM25 (q186) + dense cosine, RRF-fused
# (q211), then MMR-diversified (q334's greedy rounds) — the full modern
# retrieval stack lexical → dense → fuse → de-redundify, composed
# end-to-end with ONE value oracle (the component CTEs nested verbatim:
# Q211_SQL as the candidate feed, the shared _mmr_step_ctes for the
# rounds). Relevance for MMR is the fused rrf_ppb score; diversity is
# the nano-grid pairwise cosine over the fused list's embeddings.
#
# Scale: every corpus-scale stage belongs to the components (BM25 term
# aggs, broadcast dense scoring); the fusion and MMR rounds run on the
# bounded fused list (RRF_TOP rows).
# ---------------------------------------------------------------------------

MMRH_K = 5


def q342_hybrid_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import mmr_rerank_arrow

    fused = q211_rrf_hybrid(spark, sf_dir)
    # Checkpoint the fused list ONCE: every later reference (the a/b
    # pair-sim sides, the greedy rounds) would otherwise re-execute the
    # whole q211 pipeline — BM25 explode + dense scoring — per
    # reference; the x16 probe measured 79 s before, dominated by ~3
    # such replays.
    cand = fused.select(
        F.lit(0).cast("long").alias("query_id"),
        F.col("id").alias("cand_id"),
        F.col("rrf_ppb").alias("rel_n"),
    ).localCheckpoint()
    emb = load_table(spark, sf_dir, "embeddings")
    pairsim = _candidate_pairsim(emb, cand)
    out = mmr_rerank_arrow(
        cand, pairsim, k=MMRH_K, w_rel=MMR_W_REL, w_div=MMR_W_DIV
    )
    return out.select(
        F.col("cand_id").alias("id"),
        "sel_rank",
        F.col("rel_n").alias("rrf_ppb"),
    ).orderBy("sel_rank")


Q342_SQL = f"""
WITH fused AS MATERIALIZED ({Q211_SQL}),
cand AS MATERIALIZED (
    SELECT CAST(0 AS BIGINT) AS query_id, id AS cand_id,
           rrf_ppb AS rel_n
    FROM fused
),
ce AS MATERIALIZED (
    SELECT vec_id AS c_id, CAST(r.i AS INT) AS pos,
           CAST(embedding[r.i + 1] AS DOUBLE) AS v
    FROM embeddings
    JOIN cand ON cand.cand_id = embeddings.vec_id
    CROSS JOIN range(0, 4096) r(i)
    WHERE r.i < len(embedding)
),
cn AS (
    SELECT c_id, sqrt(CAST(SUM(CAST(v * v AS DECIMAL(38,18))) AS DOUBLE)) AS cn
    FROM ce GROUP BY c_id
),
pc AS (
    SELECT c1.query_id, c1.cand_id AS a_id, c2.cand_id AS b_id
    FROM cand c1 JOIN cand c2 USING (query_id)
    WHERE c1.cand_id <> c2.cand_id
),
pd AS (
    SELECT pc.query_id, pc.a_id, pc.b_id,
           CAST(SUM(CAST(ea.v * eb.v AS DECIMAL(38,18))) AS DOUBLE) AS dot
    FROM pc
    JOIN ce ea ON ea.c_id = pc.a_id
    JOIN ce eb ON eb.c_id = pc.b_id AND eb.pos = ea.pos
    GROUP BY 1, 2, 3
),
psim AS MATERIALIZED (
    SELECT pd.query_id, pd.a_id, pd.b_id,
           CAST(ROUND(pd.dot / NULLIF(ca.cn * cb.cn, 0.0) * 1000000000)
                AS BIGINT) AS sim_n
    FROM pd
    JOIN cn ca ON ca.c_id = pd.a_id
    JOIN cn cb ON cb.c_id = pd.b_id
),
sel1 AS (
    SELECT query_id, cand_id, 1 AS sel_rank, rel_n FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY rel_n DESC, cand_id
        ) AS rn FROM cand
    ) WHERE rn = 1
),
selset1 AS (SELECT query_id, cand_id FROM sel1){_mmr_step_ctes(MMRH_K, MMR_W_REL, MMR_W_DIV)}
SELECT cand_id AS id, CAST(sel_rank AS INT) AS sel_rank,
       rel_n AS rrf_ppb
FROM ({" UNION ALL ".join(f"SELECT * FROM sel{t}" for t in range(1, MMRH_K + 1))})
ORDER BY sel_rank
"""


RETRIEVAL_QUERIES = {
    "q342_hybrid_mmr": q342_hybrid_mmr,
    "q338_snapshot_diff": q338_snapshot_diff,
    "q334_mmr_rerank": q334_mmr_rerank,
    "q255_phrase_search": q255_phrase_search,
    "q211_rrf_hybrid": q211_rrf_hybrid,
    "q201_inverted_index": q201_inverted_index,
    "q202_cdc_apply": q202_cdc_apply,
    "q186_bm25_search": q186_bm25_search,
    "q187_snm_dedup": q187_snm_dedup,
    "q188_record_linkage": q188_record_linkage,
}

RETRIEVAL_ORACLES = {
    "q342_hybrid_mmr": Q342_SQL,
    "q338_snapshot_diff": Q338_SQL,
    "q334_mmr_rerank": Q334_SQL,
    "q255_phrase_search": Q255_SQL,
    "q211_rrf_hybrid": Q211_SQL,
    "q201_inverted_index": Q201_SQL,
    "q202_cdc_apply": Q202_SQL,
    "q186_bm25_search": Q186_SQL,
    "q187_snm_dedup": Q187_SQL,
    "q188_record_linkage": Q188_SQL,
}
