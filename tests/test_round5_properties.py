"""Independent re-proofs for the round-5 additions (q186-q195).

Each test recomputes the claimed semantics with a DIFFERENT mechanism
(Python fractions, numpy, raw-row replays) than either the Spark plan or
its DuckDB oracle, so a bug shared by both engines' SQL formulations
still gets caught.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import pytest
from pyspark.sql import functions as F


def _whitespace_tokens(text: str) -> list[str]:
    return [t for t in text.strip().split() if t]


def test_bm25_matches_fraction_replay(spark, sf_dir):
    """q186's integer-grid BM25 must equal an exact-rational replay with
    Python fractions (k1 = 6/5, b = 3/4, RSJ idf) floored to the same
    1e-9 grid — proving the DECIMAL(38,0) rationalization is the real
    formula, not an approximation of it."""
    import duckdb

    from snowflake_stock_dbt_spark.plans.retrieval import (
        BM25_QUERY_TERMS,
        BM25_TOP_K,
        q186_bm25_search,
    )

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    toks = {d: _whitespace_tokens(t) for d, t in rows}
    dl = {d: len(t) for d, t in toks.items() if t}
    n_docs = len(dl)
    total_len = sum(dl.values())
    k1, b = Fraction(6, 5), Fraction(3, 4)
    avgdl = Fraction(total_len, n_docs)
    tf = {}
    for d, t in toks.items():
        for term in t:
            if term in BM25_QUERY_TERMS:
                tf[(d, term)] = tf.get((d, term), 0) + 1
    df = {}
    for (d, term) in tf:
        df[term] = df.get(term, 0) + 1
    scores = {}
    for (d, term), f_dt in tf.items():
        idf = Fraction(2 * (n_docs - df[term]) + 1, 2 * df[term] + 1)
        tfp = (f_dt * (k1 + 1)) / (
            f_dt + k1 * (1 - b + b * Fraction(dl[d], 1) / avgdl)
        )
        scores[d] = scores.get(d, 0) + int(idf * tfp * 10**9)
    expected = sorted(
        ((s, d) for d, s in scores.items()), key=lambda x: (-x[0], x[1])
    )[:BM25_TOP_K]
    got = [
        (r["bm25_scaled"], r["doc_id"])
        for r in q186_bm25_search(spark, sf_dir).orderBy("rank").collect()
    ]
    assert got == expected


def test_snm_pairs_are_sort_neighbors_and_jaccard_exact(spark, sf_dir):
    """Every q187 pair must be within w positions of each other in the
    (lang, n_chars, doc_id) sort order, with the token-set Jaccard
    recomputed in Python; and every qualifying in-window pair must be
    emitted (completeness within the window, the SNM contract)."""
    import duckdb

    from snowflake_stock_dbt_spark.plans.retrieval import (
        SNM_THRESHOLD,
        SNM_WINDOW,
        q187_snm_dedup,
    )

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, lang, n_chars, text "
        f"FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    by_lang: dict[str, list] = {}
    for d, lang, nc, text in rows:
        by_lang.setdefault(lang, []).append(
            (nc, d, frozenset(_whitespace_tokens(text)))
        )
    expected = set()
    for lang, docs in by_lang.items():
        docs.sort()
        for i, (_, da, sa) in enumerate(docs):
            for j in range(i + 1, min(i + SNM_WINDOW + 1, len(docs))):
                _, db, sb = docs[j]
                inter = len(sa & sb)
                union = len(sa | sb)
                if union and inter / union >= SNM_THRESHOLD:
                    expected.add((lang, da, db, j - i, inter, union))
    got = {
        (
            r["lang"], r["id_a"], r["id_b"], r["neighbor_rank"],
            r["n_inter"], r["n_union"],
        )
        for r in q187_snm_dedup(spark, sf_dir).collect()
    }
    assert got == expected


def test_record_linkage_scores_replay(spark, sf_dir):
    """q188's agreement-weight sums and decisions must equal a raw-row
    Python replay of the Fellegi-Sunter rule."""
    import duckdb
    import math

    from snowflake_stock_dbt_spark.plans.retrieval import (
        FS_MATCH_T,
        FS_POSSIBLE_T,
        q188_record_linkage,
    )

    con = duckdb.connect()
    cust = con.sql(
        f"SELECT c_custkey, c_nationkey, c_acctbal, c_name "
        f"FROM '{sf_dir}/customer.parquet'"
    ).fetchall()
    supp = con.sql(
        f"SELECT s_suppkey, s_nationkey, s_acctbal, s_name "
        f"FROM '{sf_dir}/supplier.parquet'"
    ).fetchall()
    expected = {}
    for ck, cn, cb, cname in cust:
        for sk, sn, sb, sname in supp:
            if cn != sn:
                continue
            score = (
                (40 if math.floor(cb / 1000) == math.floor(sb / 1000) else -15)
                + (25 if ck % 7 == sk % 7 else -8)
                + (
                    30
                    if int(cname.split("#")[1]) % 100
                    == int(sname.split("#")[1]) % 100
                    else -10
                )
            )
            if score >= FS_POSSIBLE_T:
                expected[(cn, ck, sk)] = (
                    score, "match" if score >= FS_MATCH_T else "possible"
                )
    got = {
        (r["nation"], r["cust_id"], r["supp_id"]): (
            r["fs_score"], r["decision"]
        )
        for r in q188_record_linkage(spark, sf_dir).collect()
    }
    assert got == expected


def test_checksum_diff_flags_exactly_the_drifted_buckets(spark, sf_dir):
    """q189 must flag precisely the buckets containing a drifted key
    (o_orderkey % 997 == 0) and no others, with row counts equal on both
    sides (drift perturbs values, not cardinality)."""
    import duckdb

    from snowflake_stock_dbt_spark.plans.ops_diag import (
        CHECKSUM_BUCKETS,
        _DRIFT_MOD,
        q189_replica_checksum_diff,
    )

    con = duckdb.connect()
    keys = [
        k
        for (k,) in con.sql(
            f"SELECT o_orderkey FROM '{sf_dir}/orders.parquet'"
        ).fetchall()
    ]
    expected_buckets = sorted(
        {k % CHECKSUM_BUCKETS for k in keys if k % _DRIFT_MOD == 0}
    )
    rows = q189_replica_checksum_diff(spark, sf_dir).collect()
    assert sorted(r["bucket"] for r in rows) == expected_buckets
    for r in rows:
        assert r["primary_rows"] == r["replica_rows"]
        assert r["primary_checksum"] != r["replica_checksum"]


def test_hits_star_graph_and_bounds(spark, sf_dir):
    """On a synthetic star (many hubs -> one center), the center must be
    the unique max authority and every pure hub the max hub score; all
    scores lie in [0, 1] with the max exactly 1.0 per side. Also checks
    the trade-graph query output ranges (q191)."""
    from snowflake_stock_dbt_spark.operators.graph import hits
    from snowflake_stock_dbt_spark.plans.warehouse import q191_hits_scores

    edges = spark.createDataFrame(
        [(i, 100) for i in range(1, 9)] + [(1, 2)], "src LONG, dst LONG"
    )
    out = {r["id"]: (r["hub"], r["authority"]) for r in hits(edges).collect()}
    assert out[100][1] == 1.0  # center is the top authority
    assert out[100][0] == 0.0  # center points at nothing
    assert max(h for h, _ in out.values()) == 1.0
    rows = q191_hits_scores(spark, sf_dir).collect()
    hubs = [r["hub"] for r in rows]
    auths = [r["authority"] for r in rows]
    assert max(hubs) == 1.0 and max(auths) == 1.0
    assert min(hubs) >= 0.0 and min(auths) >= 0.0
    # Customers (even ids) never receive edges -> zero authority; and
    # suppliers (odd ids) never send -> zero hub.
    for r in rows:
        if r["node_id"] % 2 == 0:
            assert r["authority"] == 0.0
        else:
            assert r["hub"] == 0.0


def test_embedding_drift_matches_numpy(spark, sf_dir):
    """q192's centroid cosine must match numpy's cosine of the two
    snapshot MEAN vectors (the cos(sum,sum)=cos(mean,mean) identity) to
    1e-9, and the counts must replay exactly."""
    import duckdb

    from snowflake_stock_dbt_spark.plans.vectors import q192_embedding_drift

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT vec_id, label, embedding "
        f"FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    by_label: dict[int, dict[int, list]] = {}
    for vid, label, emb in rows:
        by_label.setdefault(label, {0: [], 1: []})[vid % 2].append(emb)
    got = {r["label"]: r for r in q192_embedding_drift(spark, sf_dir).collect()}
    for label, snaps in by_label.items():
        a = np.array(snaps[0], dtype=np.float64).mean(axis=0)
        b = np.array(snaps[1], dtype=np.float64).mean(axis=0)
        cos = float(
            a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
        )
        r = got[label]
        assert r["n_old"] == len(snaps[0]) and r["n_new"] == len(snaps[1])
        assert r["centroid_cosine"] == pytest.approx(cos, abs=1e-8)


def test_tokenizer_fertility_consistent_with_q132(spark, sf_dir):
    """q193's per-group sums must equal the groupwise totals of q132's
    per-doc encoding joined to the document dims."""
    from snowflake_stock_dbt_spark.plans.llm_text import (
        q132_bpe_encode,
        q193_tokenizer_fertility,
    )
    from snowflake_stock_dbt_spark.sources.tables import load_table

    enc = {r["doc_id"]: r for r in q132_bpe_encode(spark, sf_dir).collect()}
    dims = {
        r["doc_id"]: (r["lang"], r["source"])
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "source")
        .collect()
    }
    agg: dict[tuple, list] = {}
    for d, r in enc.items():
        key = dims[d]
        cur = agg.setdefault(key, [0, 0, 0])
        cur[0] += 1
        cur[1] += r["n_words"]
        cur[2] += r["n_bpe_tokens"]
    for r in q193_tokenizer_fertility(spark, sf_dir).collect():
        n_docs, n_words, n_tokens = agg[(r["lang"], r["source"])]
        assert (r["n_docs"], r["n_words"], r["n_tokens"]) == (
            n_docs, n_words, n_tokens,
        )
        assert r["fertility"] == pytest.approx(n_tokens / n_words)


def test_equidepth_histogram_partitions_rows(spark, sf_dir):
    """q194's buckets must partition the rows exactly (counts sum to the
    table size, ranges ordered and non-overlapping) and match a Python
    replay of the value-counts bucket assignment."""
    import duckdb

    from snowflake_stock_dbt_spark.plans.ops_diag import (
        HIST_BUCKETS,
        q194_equidepth_histogram,
    )

    con = duckdb.connect()
    vc = con.sql(
        f"SELECT l_extendedprice, COUNT(*) FROM '{sf_dir}/lineitem.parquet' "
        f"GROUP BY 1 ORDER BY 1"
    ).fetchall()
    total = sum(c for _, c in vc)
    expected: dict[int, list] = {}
    before = 0
    for v, c in vc:
        bucket = HIST_BUCKETS * before // total
        cur = expected.setdefault(bucket, [v, v, 0, 0])
        cur[1] = v
        cur[2] += c
        cur[3] += 1
        before += c
    rows = q194_equidepth_histogram(spark, sf_dir).collect()
    assert sum(r["n_rows"] for r in rows) == total
    got = {
        r["bucket"]: [r["lo"], r["hi"], r["n_rows"], r["n_distinct"]]
        for r in rows
    }
    assert got == expected
    ordered = sorted(rows, key=lambda r: r["bucket"])
    for a, b in zip(ordered, ordered[1:]):
        assert a["hi"] < b["lo"]


def test_skew_report_replays_and_salt_is_ceil(spark, sf_dir):
    """q195's top key must be the true modal key and suggested_salt the
    exact ceiling of cnt/(total/n_keys)."""
    import duckdb
    import math

    from snowflake_stock_dbt_spark.plans.ops_diag import q195_skew_report

    con = duckdb.connect()
    freq = dict(
        con.sql(
            f"SELECT o_custkey, COUNT(*) FROM '{sf_dir}/orders.parquet' "
            f"GROUP BY 1"
        ).fetchall()
    )
    total, n_keys = sum(freq.values()), len(freq)
    best = min((k for k, c in freq.items() if c == max(freq.values())))
    rows = q195_skew_report(spark, sf_dir).orderBy("rank").collect()
    assert rows[0]["join_key"] == best
    for r in rows:
        assert freq[r["join_key"]] == r["cnt"]
        assert r["suggested_salt"] == math.ceil(r["cnt"] * n_keys / total)
        assert r["skew_factor"] == pytest.approx(
            r["cnt"] * n_keys / total
        )


def test_snm_bucketed_equals_windowed(spark, sf_dir):
    """The production-scale banded SNM (snm_pairs_bucketed) must produce
    EXACTLY the per-lang windowed pairs of q187 — including across
    bucket boundaries and through buckets sparser than the window — for
    several bucket widths, so the bucketed plan can substitute at scale
    without changing one output pair."""
    from snowflake_stock_dbt_spark.plans.retrieval import (
        SNM_THRESHOLD,
        q187_snm_dedup,
        snm_pairs_bucketed,
    )
    from snowflake_stock_dbt_spark.sources.tables import load_table

    want = {
        tuple(r)
        for r in q187_snm_dedup(spark, sf_dir)
        .select("lang", "id_a", "id_b", "neighbor_rank", "n_inter", "n_union")
        .collect()
    }
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
    for width in (1, 7, 64):  # width 1 makes most buckets sparser than w
        got = {
            tuple(r)
            for r in snm_pairs_bucketed(docs, bucket_width=width)
            .where(F.col("jaccard") >= SNM_THRESHOLD)
            .select(
                "lang", "id_a", "id_b", "neighbor_rank", "n_inter", "n_union"
            )
            .collect()
        }
        assert got == want, f"bucket_width={width}"


def test_rolling_distinct_matches_bruteforce(spark, sf_dir):
    """q199's interval-sweep rolling distinct must equal a brute-force
    per-day set union over the raw (user, day) pairs."""
    import datetime
    import duckdb

    from snowflake_stock_dbt_spark.plans.events import (
        ROLLING_WINDOW_DAYS,
        q199_rolling_distinct_users,
    )

    con = duckdb.connect()
    pairs = con.sql(
        f"SELECT DISTINCT user_id, CAST(ts AS DATE) "
        f"FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    by_day: dict = {}
    for u, d in pairs:
        by_day.setdefault(d, set()).add(u)
    expected = {}
    for d in by_day:
        users = set()
        for k in range(ROLLING_WINDOW_DAYS):
            users |= by_day.get(d - datetime.timedelta(days=k), set())
        expected[d] = len(users)
    got = {
        r["day"]: r["n_active_users"]
        for r in q199_rolling_distinct_users(spark, sf_dir).collect()
    }
    assert got == expected


def test_curation_pipeline_manifest_invariants(spark, sf_dir):
    """q200's shard manifest must respect its stage contracts: bins are
    contiguous from 0 per source, the per-source doc total never exceeds
    the domain cap, doc-id ranges are ordered, and the packed doc count
    equals the independently-computed survivor-after-cap count."""
    from snowflake_stock_dbt_spark.plans.curation import (
        DOMAIN_CAP,
        q200_curation_pipeline,
    )

    rows = q200_curation_pipeline(spark, sf_dir).collect()
    by_source: dict = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    assert by_source, "empty manifest"
    for source, bins in by_source.items():
        idx = sorted(b["bin"] for b in bins)
        assert idx == list(range(len(idx))), source
        assert sum(b["n_docs"] for b in bins) <= DOMAIN_CAP, source
        for b in bins:
            assert b["first_doc"] <= b["last_doc"]
            assert b["n_docs"] >= 1 and b["n_tokens"] >= 1


def test_inverted_index_replays(spark, sf_dir):
    """q201's postings must equal a Python dictionary replay over the
    raw text — doc order, tf values, df and totals."""
    import duckdb

    from snowflake_stock_dbt_spark.plans.retrieval import q201_inverted_index

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    index: dict = {}
    for d, text in rows:
        for tok in _whitespace_tokens(text):
            index.setdefault(tok, {}).setdefault(d, 0)
            index[tok][d] += 1
    got = {r["term"]: r for r in q201_inverted_index(spark, sf_dir).collect()}
    assert set(got) == set(index)
    for term, posting in index.items():
        r = got[term]
        assert r["doc_freq"] == len(posting)
        assert r["total_tf"] == sum(posting.values())
        assert r["postings"] == ",".join(
            f"{d}:{posting[d]}" for d in sorted(posting)
        )


def test_cdc_apply_replays(spark, sf_dir):
    """q202's applied snapshot must equal a Python replay of the CDC
    rules (delete outranks update outranks insert; update wins over
    base; deleted keys absent; inserted keys present)."""
    import duckdb
    from decimal import Decimal

    from snowflake_stock_dbt_spark.plans.retrieval import (
        _CDC_DEL_MOD,
        _CDC_INS_MOD,
        _CDC_UPD_MOD,
        q202_cdc_apply,
    )

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)), "
        f"o_orderpriority FROM '{sf_dir}/orders.parquet'"
    ).fetchall()
    expected = {}
    for k, price, prio in rows:
        if k % _CDC_DEL_MOD == 0:
            continue
        if k % _CDC_UPD_MOD == 0:
            expected[k] = (float(price + Decimal("5.00")), prio)
        else:
            # base rows (not %INS) keep their values; %INS rows come
            # back via the insert op with identical values.
            expected[k] = (float(price), prio)
    got = {
        r["o_orderkey"]: (r["o_totalprice"], r["o_orderpriority"])
        for r in q202_cdc_apply(spark, sf_dir).collect()
    }
    assert got == expected


def test_seasonal_decomposition_matches_python_replay(spark, sf_dir):
    """q203's trend/seasonal/residual must equal a Python float replay
    of the exact pipeline (centered MA on integer cents, 1e12 floor-grid
    weekday means, s*7/sum normalization) — bit-for-bit, no tolerance."""
    import math
    import duckdb

    from snowflake_stock_dbt_spark.plans.scale import (
        q203_seasonal_decomposition,
    )

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT l_returnflag, CAST(l_shipdate AS DATE) AS d, "
        f"CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2))) * 100 AS BIGINT) "
        f"FROM '{sf_dir}/lineitem.parquet' GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    series: dict = {}
    for flag, d, cents in rows:
        series.setdefault(flag, []).append((d, int(cents)))
    expected = {}
    for flag, pts in series.items():
        n = len(pts)
        f_stats = []
        for i in range(n):
            lo, hi = max(0, i - 3), min(n, i + 4)
            f_cents = sum(c for _, c in pts[lo:hi])
            f_n = hi - lo
            f_stats.append((f_cents, f_n))
        rqs, wds = [], []
        for (d, c), (fc, fn) in zip(pts, f_stats):
            rqs.append(math.floor(float(c * fn) / float(fc) * 1e12))
            wds.append((d.weekday() + 1) % 7 + 1)
        agg: dict = {}
        for rq, wd in zip(rqs, wds):
            a, b = agg.get(wd, (0, 0))
            agg[wd] = (a + rq, b + 1)
        s_q = {
            wd: math.floor(float(a) / float(b) / 1e6)
            for wd, (a, b) in agg.items()
        }
        sum_sq = sum(s_q.values())
        for (d, c), (fc, fn), wd in zip(pts, f_stats, wds):
            trend = float(fc) / float(fn * 100)
            seasonal = float(s_q[wd] * 7) / float(sum_sq)
            expected[(flag, d)] = (
                c, trend, seasonal, c / 100.0 - trend * seasonal
            )
    got = {
        (r["l_returnflag"], r["d"]): (
            r["cents"], r["trend"], r["seasonal"], r["residual"]
        )
        for r in q203_seasonal_decomposition(spark, sf_dir).collect()
    }
    assert got == expected


def test_lpa_splits_barbell_and_is_deterministic(spark):
    """On a barbell (two 4-cliques bridged by one edge), synchronous LPA
    with min-tie-break must settle every clique on its own minimum
    label, giving exactly two communities; a repeat run is identical."""
    from snowflake_stock_dbt_spark.operators.graph import label_propagation

    def clique(ids):
        return [(a, b) for a in ids for b in ids if a != b]

    left, right = [1, 2, 3, 4], [10, 11, 12, 13]
    edges = spark.createDataFrame(
        clique(left) + clique(right) + [(4, 10), (10, 4)],
        "src LONG, dst LONG",
    )
    out1 = {
        r["id"]: r["community"] for r in label_propagation(edges).collect()
    }
    out2 = {
        r["id"]: r["community"] for r in label_propagation(edges).collect()
    }
    assert out1 == out2
    assert {out1[i] for i in left} == {1}
    assert {out1[i] for i in right} == {10}


def test_ab_test_readout_replays(spark, sf_dir):
    """q206's counts and z-score must equal a Python replay of the
    hash-armed two-proportion test."""
    import math
    import duckdb

    from snowflake_stock_dbt_spark.functions.text import hash60
    from snowflake_stock_dbt_spark.plans.events import q206_ab_test_readout

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT user_id, CASE WHEN "
        f"SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) > "
        f"SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) "
        f"THEN 1 ELSE 0 END FROM '{sf_dir}/events.parquet' GROUP BY 1"
    ).fetchall()
    # replicate the md5-prefix hash arm assignment in Python
    import hashlib

    def arm(uid: int) -> int:
        return int(hashlib.md5(str(uid).encode()).hexdigest()[:15], 16) % 2

    n = {0: 0, 1: 0}
    conv = {0: 0, 1: 0}
    for uid, c in rows:
        a = arm(uid)
        n[a] += 1
        conv[a] += c
    r = q206_ab_test_readout(spark, sf_dir).collect()[0]
    assert (r["n_a"], r["conv_a"], r["n_b"], r["conv_b"]) == (
        n[0], conv[0], n[1], conv[1],
    )
    ra, rb = conv[0] / n[0], conv[1] / n[1]
    pooled = (conv[0] + conv[1]) / (n[0] + n[1])
    se = math.sqrt(pooled * (1.0 - pooled) * (1.0 / n[0] + 1.0 / n[1]))
    assert r["z_score"] == pytest.approx((rb - ra) / se, rel=1e-12)
