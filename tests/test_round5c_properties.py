"""Independent re-proofs for the q216-q243 insight family (beyond the
DuckDB oracles): brute-force replays and structural invariants on
corpora and edge cases the oracle never sees. The sequential-fold
differentials for the allocation/sweep OPERATORS live in
test_round5c_hypothesis.py."""

from __future__ import annotations

from collections import Counter, defaultdict

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_q216_apriori_prune_loses_nothing(spark):
    """The ITEM_MIN prune must not drop any pair with support >=
    PAIR_MIN (monotonicity), and every reported count must equal the
    brute-force basket count."""
    from snowflake_stock_dbt_spark.plans.insights import (
        PAIR_MIN_SUPPORT,
        q216_market_basket,
    )
    from snowflake_stock_dbt_spark.sources.tables import load_table

    got = {
        (r["part_a"], r["part_b"]): (r["n_pair"], r["n_a"], r["n_b"])
        for r in q216_market_basket(spark, SF).collect()
    }
    baskets = defaultdict(set)
    for r in (
        load_table(spark, SF, "lineitem")
        .select("l_orderkey", "l_partkey")
        .collect()
    ):
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    item_n = Counter()
    pair_n = Counter()
    for items in baskets.values():
        for i in items:
            item_n[i] += 1
        s = sorted(items)
        for ai, a in enumerate(s):
            for b in s[ai + 1 :]:
                pair_n[(a, b)] += 1
    truth = {
        p: (n, item_n[p[0]], item_n[p[1]])
        for p, n in pair_n.items()
        if n >= PAIR_MIN_SUPPORT
    }
    assert got == truth


def test_q217_segments_conserve_customers_and_money(spark):
    from snowflake_stock_dbt_spark.plans.insights import q217_rfm_segments
    from snowflake_stock_dbt_spark.sources.tables import load_table

    out = q217_rfm_segments(spark, SF).collect()
    o = load_table(spark, SF, "orders")
    n_cust = o.select("o_custkey").distinct().count()
    assert sum(r["n_customers"] for r in out) == n_cust
    for r in out:
        assert 1 <= r["r_score"] <= 4
        assert 1 <= r["f_score"] <= 4
        assert 1 <= r["m_score"] <= 4
    total = sum(r["total_monetary"] for r in out)
    truth = o.agg(
        F.sum(F.col("o_totalprice").cast("decimal(38,6)")).cast("double")
    ).collect()[0][0]
    assert abs(total - truth) < 1e-6 * abs(truth)


def test_q218_allocation_is_exact_and_fair(spark):
    """Largest-remainder contract: per order the allocations sum EXACTLY
    to the budget, and every line gets floor or ceil of its proportional
    share (no line over- or under-paid by a full unit)."""
    from snowflake_stock_dbt_spark.plans.insights import (
        q218_discount_allocation,
    )
    from snowflake_stock_dbt_spark.sources.tables import load_table

    # (l_orderkey, l_linenumber) is NOT unique in this corpus — work in
    # multisets per order. Duplicate lines are byte-identical, so the
    # query's output multiset is still deterministic.
    alloc = defaultdict(list)
    for r in q218_discount_allocation(spark, SF).collect():
        alloc[r["l_orderkey"]].append((r["l_linenumber"], r["alloc_c"]))
    budgets = {
        r["o_orderkey"]: int(r["o_totalprice"] + 0.5)
        for r in load_table(spark, SF, "orders").collect()
    }
    weights = defaultdict(list)
    for r in load_table(spark, SF, "lineitem").collect():
        weights[r["l_orderkey"]].append(
            (r["l_linenumber"], int(r["l_extendedprice"] * 100 + 0.5))
        )
    checked = 0
    for ok, lines in weights.items():
        if ok not in budgets:
            continue
        b = budgets[ok]
        tot = sum(w for _, w in lines)
        got = alloc[ok]
        assert len(got) == len(lines)
        assert sum(a for _, a in got) == b, f"order {ok} != budget {b}"
        # duplicate line ids carry DIFFERENT weights; per-alloc pairing
        # is ambiguous there, so bound each alloc by its id's weight
        # RANGE and check the tight bound only for unique line ids.
        by_line_w = defaultdict(list)
        for ln, w in lines:
            by_line_w[ln].append(w)
        for ln, a in got:
            ws = by_line_w[ln]
            lo = b * min(ws) / tot
            hi = b * max(ws) / tot
            assert lo - 1 < a < hi + 1, (ok, ln, a, lo, hi)
        checked += 1
    assert checked > 100


def test_q219_rows_are_probabilities(spark):
    from snowflake_stock_dbt_spark.plans.insights import (
        q219_markov_transitions,
    )

    rows = q219_markov_transitions(spark, SF).collect()
    by_src = defaultdict(float)
    for r in rows:
        assert 0.0 < r["p"] <= 1.0
        by_src[r["from_type"]] += r["p"]
    for src, s in by_src.items():
        assert abs(s - 1.0) < 1e-9, (src, s)


def test_q220_sweep_brute_force_replay(spark):
    """Max concurrency equals the brute-force interval count, including
    the half-open boundary: an interval ending exactly when another
    starts does NOT overlap it."""
    import os
    import tempfile

    from snowflake_stock_dbt_spark.plans.insights import q220_max_concurrency

    # back-to-back: [0,300) and [300,600) never overlap; [100,400)
    # overlaps both.
    rows = [
        (1, "2024-01-01 00:00:00", "a", 1, 0.0, "{}"),
        (2, "2024-01-01 00:05:00", "a", 1, 0.0, "{}"),
        (3, "2024-01-01 00:01:40", "a", 2, 0.0, "{}"),
        # second type, to prove group isolation
        (4, "2024-01-01 00:00:00", "b", 3, 0.0, "{}"),
    ]

    df = spark.createDataFrame(
        [(i, ts, u, t, v, p) for (i, ts, t, u, v, p) in rows],
        "event_id bigint, ts_s string, user_id bigint, event_type string,"
        " value double, props string",
    ).select(
        "event_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        out = {
            (r["event_type"], str(r["day"])): r["max_concurrent"]
            for r in q220_max_concurrency(spark, d).collect()
        }
    assert out == {("a", "2024-01-01"): 2, ("b", "2024-01-01"): 1}


def test_q221_blocked_levenshtein_replay(spark):
    """Every reported pair shares a block and its distance matches a
    pure-python Wagner-Fischer replay; within-block completeness: no
    same-block pair under the threshold is missing."""
    from snowflake_stock_dbt_spark.plans.insights import (
        EDIT_MAX,
        q221_name_neardup,
    )
    from snowflake_stock_dbt_spark.sources.tables import load_table

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    got = {
        (r["name_a"], r["name_b"]): r["edit_dist"]
        for r in q221_name_neardup(spark, SF).collect()
    }
    names = sorted(
        {r["p_name"] for r in load_table(spark, SF, "part").collect()}
    )
    truth = {}
    for ai, a in enumerate(names):
        for b in names[ai + 1 :]:
            if a.split()[-1] == b.split()[-1] and lev(a, b) <= EDIT_MAX:
                truth[(a, b)] = lev(a, b)
    assert got == truth


def test_q222_bitmap_equals_direct_distinct(spark):
    from snowflake_stock_dbt_spark.plans.insights import q222_bitmap_distinct
    from snowflake_stock_dbt_spark.sources.tables import load_table

    out = {
        str(r["week"]): (r["week_users"], r["sum_daily_users"])
        for r in q222_bitmap_distinct(spark, SF).collect()
    }
    ev = load_table(spark, SF, "events")
    direct_w = {
        str(r["week"]): r["n"]
        for r in ev.groupBy(
            F.date_trunc("week", "ts").cast("date").alias("week")
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    daily = ev.groupBy(
        F.date_trunc("week", "ts").cast("date").alias("week"),
        F.to_date("ts").alias("day"),
    ).agg(F.countDistinct("user_id").alias("n"))
    direct_d = {
        str(r["week"]): r["s"]
        for r in daily.groupBy("week").agg(F.sum("n").alias("s")).collect()
    }
    assert {w: v[0] for w, v in out.items()} == direct_w
    assert {w: v[1] for w, v in out.items()} == direct_d


def test_q223_buckets_are_contiguous_and_sized(spark):
    """Buckets within a partition cover disjoint, increasing doc_id
    ranges, and no bucket except possibly the last starts after the
    target is already exceeded (greedy coalesce invariant: a bucket
    closes only once the running total crosses TARGET)."""
    from snowflake_stock_dbt_spark.plans.insights import (
        COMPACT_TARGET,
        q223_compaction_planner,
    )
    from snowflake_stock_dbt_spark.sources.tables import load_table

    out = q223_compaction_planner(spark, SF).collect()
    sizes = {
        r["doc_id"]: r["n_chars"]
        for r in load_table(spark, SF, "documents").collect()
    }
    by_src = defaultdict(list)
    for r in out:
        by_src[r["source"]].append(r)
    total_files = 0
    for src, rows in by_src.items():
        rows.sort(key=lambda r: r["bucket"])
        prev_last = -1
        for r in rows:
            assert r["first_doc"] > prev_last, (src, r)
            prev_last = r["last_doc"]
            total_files += r["n_files"]
            # all but the final file of a bucket fit under TARGET:
            # bytes-before-last-file < TARGET (else it'd be a new bucket)
            assert (
                r["total_bytes"] - sizes[r["last_doc"]] < COMPACT_TARGET
            ), (src, r)
    assert total_files == len(sizes)


def test_q224_drawdown_python_replay(spark):
    from snowflake_stock_dbt_spark.plans.insights import q224_pacing_drawdown
    from snowflake_stock_dbt_spark.sources.tables import load_table

    got = {
        r["n_name"]: (r["max_drawdown"], str(r["dd_date"]))
        for r in q224_pacing_drawdown(spark, SF).collect()
    }
    li = load_table(spark, SF, "lineitem")
    s = load_table(spark, SF, "supplier")
    n = load_table(spark, SF, "nation")
    rows = (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "n_name",
            F.to_date("l_shipdate").alias("day"),
            "l_extendedprice",
            "l_discount",
        )
        .collect()
    )
    daily = defaultdict(lambda: defaultdict(int))
    for r in rows:
        daily[r["n_name"]][str(r["day"])] += int(
            r["l_extendedprice"] * (1.0 - r["l_discount"]) + 0.5
        )
    for nation, days in daily.items():
        ordered = sorted(days)
        nd = len(ordered)
        total = sum(days.values())
        cum = 0
        runmax = None
        best = (-1, None)
        for t, d in enumerate(ordered, 1):
            cum += days[d]
            x = nd * cum - t * total
            runmax = x if runmax is None else max(runmax, x)
            dd = runmax - x
            if dd > best[0]:
                best = (dd, d)
        want = (best[0] / nd, best[1])
        have = got[nation]
        assert abs(have[0] - want[0]) < 1e-9 and have[1] == want[1], (
            nation,
            have,
            want,
        )


def test_q225_classes_match_q208_and_bounds(spark):
    """l-diversity classes are the q208 classes rolled up over the
    sensitive column: k sums match, 1 <= l <= k, modal share >= 1/l."""
    from snowflake_stock_dbt_spark.plans.curation import q208_k_anonymity
    from snowflake_stock_dbt_spark.plans.insights import q225_l_diversity

    l_rows = q225_l_diversity(spark, SF).collect()
    k_rows = q208_k_anonymity(spark, SF).collect()
    k_by_class = defaultdict(int)
    for r in k_rows:
        k_by_class[(r["c_nationkey"], r["bal_bucket"])] += r["k"]
    assert {
        (r["c_nationkey"], r["bal_bucket"]): r["k"] for r in l_rows
    } == dict(k_by_class)
    for r in l_rows:
        assert 1 <= r["l_distinct"] <= r["k"]
        # the modal value covers at least its equal share
        assert r["modal_ppm"] * r["l_distinct"] >= 1_000_000 - r["l_distinct"]


def test_q226_ltv_monotone_and_conserves_revenue(spark):
    from snowflake_stock_dbt_spark.plans.insights import q226_cohort_ltv
    from snowflake_stock_dbt_spark.sources.tables import load_table

    rows = q226_cohort_ltv(spark, SF).collect()
    by_cohort = defaultdict(list)
    for r in rows:
        by_cohort[r["cohort"]].append(r)
    final_total = 0.0
    for cohort, rs in by_cohort.items():
        rs.sort(key=lambda r: r["age"])
        for a, b in zip(rs, rs[1:]):
            assert b["cum_revenue"] > a["cum_revenue"], (cohort, a, b)
        final_total += rs[-1]["cum_revenue"]
    o = load_table(spark, SF, "orders")
    truth = o.agg(
        F.sum(F.col("o_totalprice").cast("decimal(38,6)")).cast("double")
    ).collect()[0][0]
    assert abs(final_total - truth) < 1e-6 * truth


def test_q227_signals_python_replay(spark):
    """Crossing days equal a python replay of the integer MA-compare on
    the same daily series."""
    from snowflake_stock_dbt_spark.plans.insights import (
        MA_LONG,
        MA_SHORT,
        q227_ma_crossover,
    )
    from snowflake_stock_dbt_spark.sources.tables import load_table

    got = {
        (r["n_name"], str(r["day"])): r["signal"]
        for r in q227_ma_crossover(spark, SF).collect()
    }
    li = load_table(spark, SF, "lineitem")
    s = load_table(spark, SF, "supplier")
    n = load_table(spark, SF, "nation")
    rows = (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name", F.to_date("l_shipdate").alias("day"),
                "l_extendedprice", "l_discount")
        .collect()
    )
    daily = defaultdict(lambda: defaultdict(int))
    for r in rows:
        daily[r["n_name"]][str(r["day"])] += int(
            r["l_extendedprice"] * (1.0 - r["l_discount"]) * 100 + 0.5
        )
    want = {}
    for nation, days in daily.items():
        ordered = sorted(days)
        vals = [days[d] for d in ordered]
        prev = None
        for i, d in enumerate(ordered):
            ss = sum(vals[max(0, i - MA_SHORT + 1) : i + 1])
            ns = min(i + 1, MA_SHORT)
            sl = sum(vals[max(0, i - MA_LONG + 1) : i + 1])
            nl = min(i + 1, MA_LONG)
            diff = ss * nl - sl * ns
            sig = (diff > 0) - (diff < 0)
            if (
                i + 1 > MA_LONG
                and prev is not None
                and sig != 0
                and prev != 0
                and sig != prev
            ):
                want[(nation, d)] = "golden" if sig > 0 else "death"
            prev = sig
    assert got == want


def test_q228_mae_python_replay(spark):
    from snowflake_stock_dbt_spark.plans.insights import (
        BACKTEST_CUTOFF,
        q228_seasonal_backtest,
    )
    from snowflake_stock_dbt_spark.sources.tables import load_table

    got = {
        r["n_name"]: (r["n_test_days"], r["mae_usd"])
        for r in q228_seasonal_backtest(spark, SF).collect()
    }
    li = load_table(spark, SF, "lineitem")
    s = load_table(spark, SF, "supplier")
    n = load_table(spark, SF, "nation")
    rows = (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name", F.to_date("l_shipdate").alias("day"),
                "l_extendedprice", "l_discount")
        .collect()
    )
    daily = defaultdict(lambda: defaultdict(int))
    for r in rows:
        daily[r["n_name"]][r["day"]] += int(
            r["l_extendedprice"] * (1.0 - r["l_discount"]) * 100 + 0.5
        )
    import datetime

    cut = datetime.date.fromisoformat(BACKTEST_CUTOFF)
    want = {}
    for nation, days in daily.items():
        train = defaultdict(lambda: [0, 0])
        for d, v in days.items():
            if d < cut:
                t = train[d.isoweekday()]
                t[0] += v
                t[1] += 1
        errs, n_test = 0, 0
        for d, v in days.items():
            if d >= cut and d.isoweekday() in train:
                tot, cnt = train[d.isoweekday()]
                fc = tot * 1_000_000 // cnt
                errs += abs(v * 1_000_000 - fc)
                n_test += 1
        if n_test:
            want[nation] = (n_test, errs / (n_test * 1e8))
    assert set(got) == set(want)
    for nation in want:
        assert got[nation][0] == want[nation][0]
        assert abs(got[nation][1] - want[nation][1]) < 1e-9


def test_q229_lindley_equals_sequential_recurrence(spark):
    """The two-window closed form must equal the true sequential fold
    B_t = max(0, B_{t-1} + x_t) on every part's series."""
    from snowflake_stock_dbt_spark.plans.insights import q229_clamped_balance
    from snowflake_stock_dbt_spark.sources.tables import load_table

    got = {
        r["l_partkey"]: (
            r["final_balance"],
            r["peak_balance"],
            r["n_stockout_days"],
            r["n_days"],
        )
        for r in q229_clamped_balance(spark, SF).collect()
    }
    li = load_table(spark, SF, "lineitem")
    rows = li.select(
        "l_partkey",
        F.to_date("l_shipdate").alias("day"),
        "l_returnflag",
        "l_quantity",
    ).collect()
    flows = defaultdict(lambda: defaultdict(int))
    for r in rows:
        q = int(r["l_quantity"] + 0.5)
        flows[r["l_partkey"]][str(r["day"])] += (
            q if r["l_returnflag"] in ("R", "A") else -q
        )
    for pk, days in flows.items():
        bal, peak, zero = 0, 0, 0
        for d in sorted(days):
            bal = max(0, bal + days[d])
            peak = max(peak, bal)
            zero += bal == 0
        assert got[pk] == (bal, peak, zero, len(days)), pk


def test_q230_overlap_python_replay(spark):
    """Pairwise source Jaccard/containment equal a python set replay of
    the 3-shingle sets."""
    from snowflake_stock_dbt_spark.plans.insights import q230_source_overlap
    from snowflake_stock_dbt_spark.sources.tables import load_table

    got = {
        (r["src_a"], r["src_b"]): (r["n_inter"], r["n_a"], r["n_b"])
        for r in q230_source_overlap(spark, SF).collect()
    }
    sets = defaultdict(set)
    for r in load_table(spark, SF, "documents").collect():
        t = r["text"].strip().split()
        for i in range(max(len(t) - 2, 0)):
            sets[r["source"]].add(" ".join(t[i : i + 3]))
    want = {}
    srcs = sorted(sets)
    for ai, a in enumerate(srcs):
        for b in srcs[ai + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter:
                want[(a, b)] = (inter, len(sets[a]), len(sets[b]))
    assert got == want


def test_q231_var_cvar_python_replay(spark):
    from snowflake_stock_dbt_spark.plans.insights import (
        VAR_PCT,
        q231_var_cvar,
    )
    from snowflake_stock_dbt_spark.sources.tables import load_table

    got = {
        r["n_name"]: (r["n_changes"], r["var_usd"], r["cvar_usd"])
        for r in q231_var_cvar(spark, SF).collect()
    }
    li = load_table(spark, SF, "lineitem")
    s = load_table(spark, SF, "supplier")
    n = load_table(spark, SF, "nation")
    rows = (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name", F.to_date("l_shipdate").alias("day"),
                "l_extendedprice", "l_discount")
        .collect()
    )
    daily = defaultdict(lambda: defaultdict(int))
    for r in rows:
        daily[r["n_name"]][str(r["day"])] += int(
            r["l_extendedprice"] * (1.0 - r["l_discount"]) * 100 + 0.5
        )
    for nation, days in daily.items():
        ordered = sorted(days)
        changes = [
            days[b] - days[a] for a, b in zip(ordered, ordered[1:])
        ]
        if not changes:
            assert nation not in got
            continue
        n_ch = len(changes)
        k = (n_ch * VAR_PCT + 99) // 100
        tail = sorted(changes)[:k]
        want = (n_ch, tail[-1] / 100.0, sum(tail) / (k * 100.0))
        have = got[nation]
        assert have[0] == want[0]
        assert abs(have[1] - want[1]) < 1e-9
        assert abs(have[2] - want[2]) < 1e-9


def test_q232_latency_python_replay(spark):
    """Percentiles equal a python linear-interpolation replay; breach ppm
    is exact integral division."""
    from snowflake_stock_dbt_spark.plans.insights import (
        SLA_BREACH_DAYS,
        q232_fill_latency,
    )
    from snowflake_stock_dbt_spark.sources.tables import load_table

    got = {
        r["o_orderpriority"]: (
            r["n_lines"],
            r["p50_days"],
            r["p90_days"],
            r["p99_days"],
            r["breach_ppm"],
        )
        for r in q232_fill_latency(spark, SF).collect()
    }
    o = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    rows = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "o_orderpriority",
            F.datediff(
                F.to_date("l_shipdate"), F.to_date("o_orderdate")
            ).alias("lat"),
        )
        .collect()
    )
    by_p = defaultdict(list)
    for r in rows:
        by_p[r["o_orderpriority"]].append(r["lat"])

    def q(vals, p):
        v = sorted(vals)
        h = (len(v) - 1) * p
        f = int(h)
        c = min(f + 1, len(v) - 1)
        return v[f] + (h - f) * (v[c] - v[f])

    for prio, vals in by_p.items():
        n = len(vals)
        breach = sum(1 for x in vals if x > SLA_BREACH_DAYS)
        want = (n, q(vals, 0.5), q(vals, 0.9), q(vals, 0.99),
                breach * 1_000_000 // n)
        have = got[prio]
        assert have[0] == want[0] and have[4] == want[4]
        for a, b in zip(have[1:4], want[1:4]):
            assert abs(a - b) < 1e-9


def test_q233_range_vs_rows_frames(spark):
    """The calendar frame is a subset of the 7-row frame on sparse
    series (rows reach further back in time), and a python replay
    reproduces both sums exactly."""
    from snowflake_stock_dbt_spark.plans.insights import (
        RANGE_DAYS,
        q233_range_frame_window,
    )

    rows = q233_range_frame_window(spark, SF).collect()
    assert any(r["trail_cal_c"] != r["trail_rows_c"] for r in rows), (
        "frames never diverged — the contrast is vacuous on this corpus"
    )
    series = defaultdict(list)
    for r in rows:
        series[r["n_name"]].append(r)
    for nation, rs in series.items():
        rs.sort(key=lambda r: r["day"])
        for i, r in enumerate(rs):
            assert r["days_in_cal"] <= RANGE_DAYS
            assert r["trail_cal_c"] <= r["trail_rows_c"], (nation, r)
            cal = sum(
                p["rev_c"]
                for p in rs[max(0, i - RANGE_DAYS + 1) : i + 1]
                if (r["day"] - p["day"]).days < RANGE_DAYS
            )
            rows7 = sum(p["rev_c"] for p in rs[max(0, i - RANGE_DAYS + 1) : i + 1])
            assert r["trail_cal_c"] == cal, (nation, r)
            assert r["trail_rows_c"] == rows7, (nation, r)


def test_q234_stream_bitmap_equals_batch(spark):
    """Drained streaming bitmap state equals the batch q222 answer
    row-for-row."""
    from snowflake_stock_dbt_spark.plans.insights import q222_bitmap_distinct
    from snowflake_stock_dbt_spark.plans.streaming_plans import (
        q234_stream_bitmap_distinct,
    )

    batch = sorted(map(tuple, q222_bitmap_distinct(spark, SF).collect()))
    stream = sorted(map(tuple, q234_stream_bitmap_distinct(spark, SF).collect()))
    assert stream == batch


def test_q235_cumulative_distinct_python_replay(spark):
    from snowflake_stock_dbt_spark.plans.insights import (
        q235_cumulative_distinct,
    )
    from snowflake_stock_dbt_spark.sources.tables import load_table

    got = {
        (r["n_name"], r["month"]): (r["new_parts"], r["cum_parts"])
        for r in q235_cumulative_distinct(spark, SF).collect()
    }
    li = load_table(spark, SF, "lineitem")
    s = load_table(spark, SF, "supplier")
    n = load_table(spark, SF, "nation")
    rows = (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name", "l_partkey", F.to_date("l_shipdate").alias("day"))
        .collect()
    )
    months = defaultdict(lambda: defaultdict(set))
    for r in rows:
        m = f"{r['day'].year:04d}-{r['day'].month:02d}"
        months[r["n_name"]][m].add(r["l_partkey"])
    want = {}
    for nation, by_m in months.items():
        seen = set()
        for m in sorted(by_m):
            new = by_m[m] - seen
            seen |= by_m[m]
            want[(nation, m)] = (len(new), len(seen))
    assert got == want


def test_q236_rake_python_replay(spark):
    """Full RAKE replay: phrases, word stats, and integer-grid scores."""
    from snowflake_stock_dbt_spark.functions.text import QUALITY_STOPWORDS
    from snowflake_stock_dbt_spark.plans.insights import (
        RAKE_MIN_WORDS,
        RAKE_TOP,
        q236_rake_keyphrases,
    )
    from snowflake_stock_dbt_spark.sources.tables import load_table

    got = [
        (r["phrase"], r["n_words"], r["n_occurrences"], r["score_ppm"])
        for r in q236_rake_keyphrases(spark, SF).collect()
    ]
    stop = set(QUALITY_STOPWORDS)
    phrases = []
    for r in load_table(spark, SF, "documents").collect():
        run = []
        for w in r["text"].strip().split() + ["the"]:  # sentinel flush
            if w in stop:
                if len(run) >= RAKE_MIN_WORDS:
                    phrases.append(tuple(run))
                run = []
            else:
                run.append(w)
    freq = Counter()
    deg = Counter()
    for p in phrases:
        for w in p:
            freq[w] += 1
            deg[w] += len(p)
    occ = Counter(phrases)
    scored = [
        (
            " ".join(p),
            len(p),
            c,
            sum(deg[w] * 1_000_000 // freq[w] for w in p),
        )
        for p, c in occ.items()
    ]
    scored.sort(key=lambda t: (-t[3], t[0]))
    assert got == scored[:RAKE_TOP]


def test_q237_weighted_median_python_replay(spark):
    from snowflake_stock_dbt_spark.plans.insights import q237_weighted_median
    from snowflake_stock_dbt_spark.sources.tables import load_table

    got = {
        r["l_returnflag"]: (r["weighted_median_price"], r["total_weight"])
        for r in q237_weighted_median(spark, SF).collect()
    }
    rows = load_table(spark, SF, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    ).collect()
    by_flag = defaultdict(list)
    for r in rows:
        by_flag[r["l_returnflag"]].append(
            (r["l_extendedprice"], int(r["l_quantity"] + 0.5))
        )
    for flag, vals in by_flag.items():
        vals.sort()
        tot = sum(w for _, w in vals)
        cum = 0
        for price, w in vals:
            cum += w
            if 2 * cum >= tot:
                assert got[flag] == (price, tot), flag
                break


def test_q238_lift_invariants(spark):
    """Deciles conserve customers/revenue; cumulative shares end at 1;
    lift is non-increasing down the ranking and >= 1 in decile 1."""
    from snowflake_stock_dbt_spark.plans.insights import q238_decile_lift
    from snowflake_stock_dbt_spark.sources.tables import load_table

    rows = sorted(
        q238_decile_lift(spark, SF).collect(), key=lambda r: r["decile"]
    )
    o = load_table(spark, SF, "orders")
    n_cust = o.select("o_custkey").distinct().count()
    assert sum(r["n_customers"] for r in rows) == n_cust
    assert abs(rows[-1]["cum_cust_share"] - 1.0) < 1e-12
    assert abs(rows[-1]["cum_rev_share"] - 1.0) < 1e-12
    assert rows[0]["lift"] >= 1.0
    for a, b in zip(rows, rows[1:]):
        assert b["lift"] <= a["lift"] + 1e-12, (a, b)


def test_q239_affinity_python_replay(spark):
    from snowflake_stock_dbt_spark.plans.insights import (
        AFFINITY_MIN_N,
        q239_next_order_affinity,
    )
    from snowflake_stock_dbt_spark.sources.tables import load_table

    got = {
        (r["part_x"], r["part_y"]): r["n"]
        for r in q239_next_order_affinity(spark, SF).collect()
    }
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", F.to_date("o_orderdate").alias("d")
    ).collect()
    items = defaultdict(set)
    for r in load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect():
        items[r["l_orderkey"]].add(r["l_partkey"])
    by_cust = defaultdict(list)
    for r in orders:
        by_cust[r["o_custkey"]].append((str(r["d"]), r["o_orderkey"]))
    pair_n = Counter()
    for ok_list in by_cust.values():
        ok_list.sort()
        for (_, a), (_, b) in zip(ok_list, ok_list[1:]):
            for x in items.get(a, ()):
                for y in items.get(b, ()):
                    pair_n[(x, y)] += 1
    want = {p: n for p, n in pair_n.items() if n >= AFFINITY_MIN_N}
    assert got == want


def test_q240_stickiness_bounds_and_replay(spark):
    from snowflake_stock_dbt_spark.plans.insights import q240_stickiness
    from snowflake_stock_dbt_spark.sources.tables import load_table

    rows = q240_stickiness(spark, SF).collect()
    ev = load_table(spark, SF, "events").select(
        F.date_trunc("week", "ts").cast("date").alias("week"),
        F.to_date("ts").alias("day"),
        "user_id",
    ).collect()
    weeks = defaultdict(lambda: defaultdict(set))
    for r in ev:
        weeks[str(r["week"])][str(r["day"])].add(r["user_id"])
    for r in rows:
        days = weeks[str(r["week"])]
        wau = len(set().union(*days.values()))
        daus = [len(u) for u in days.values()]
        assert r["wau"] == wau and r["n_days"] == len(days)
        assert r["stickiness_ppm"] == sum(daus) * 1_000_000 // (
            len(days) * wau
        )
        assert r["peak_share_ppm"] == max(daus) * 1_000_000 // wau
        # stickiness is bounded by (0, 1]; peak day can't exceed WAU
        assert 0 < r["stickiness_ppm"] <= 1_000_000
        assert 0 < r["peak_share_ppm"] <= 1_000_000


def test_q241_bridge_ties_out_and_replays(spark):
    """delta == volume + price_mix per brand (exact by construction),
    and per-part terms match a python replay with truncating division."""
    from snowflake_stock_dbt_spark.plans.insights import (
        BRIDGE_Y0,
        BRIDGE_Y1,
        q241_revenue_bridge,
    )
    from snowflake_stock_dbt_spark.sources.tables import load_table

    rows = q241_revenue_bridge(spark, SF).collect()
    assert rows, "no common parts between the bridge years"
    for r in rows:
        assert (
            abs(
                r["delta_usd"]
                - (
                    r["volume_usd"]
                    + r["price_mix_usd"]
                    + r["new_usd"]
                    + r["discontinued_usd"]
                )
            )
            < 1e-9
        ), r
    li = load_table(spark, SF, "lineitem").select(
        "l_partkey",
        F.year("l_shipdate").alias("yr"),
        "l_extendedprice",
        "l_discount",
        "l_quantity",
    ).collect()
    p = {
        r["p_partkey"]: r["p_brand"]
        for r in load_table(spark, SF, "part").collect()
    }
    agg = defaultdict(lambda: [0, 0, 0, 0])  # r0, q0, r1, q1
    for r in li:
        if r["yr"] not in (BRIDGE_Y0, BRIDGE_Y1):
            continue
        rev = int(r["l_extendedprice"] * (1.0 - r["l_discount"]) * 100 + 0.5)
        qty = int(r["l_quantity"] + 0.5)
        a = agg[r["l_partkey"]]
        if r["yr"] == BRIDGE_Y0:
            a[0] += rev
            a[1] += qty
        else:
            a[2] += rev
            a[3] += qty
    want = defaultdict(lambda: [0, 0, 0, 0, 0, 0])  # n,delta,vol,pm,new,disc
    for pk, (r0, q0, r1, q1) in agg.items():
        in0 = q0 > 0
        in1 = q1 > 0
        if not in0 and not in1:
            continue
        delta = r1 - r0
        if in0 and in1:
            num = r0 * (q1 - q0)
            vol = num // q0 if num >= 0 else -((-num) // q0)  # truncate
            new = disc = 0
        else:
            vol = 0
            new = r1 if not in0 else 0
            disc = -r0 if not in1 else 0
        w = want[p[pk]]
        w[0] += 1
        w[1] += delta
        w[2] += vol
        w[3] += delta - vol - new - disc
        w[4] += new
        w[5] += disc
    got = {
        r["p_brand"]: (
            r["n_parts"],
            round(r["delta_usd"] * 100),
            round(r["volume_usd"] * 100),
            round(r["price_mix_usd"] * 100),
            round(r["new_usd"] * 100),
            round(r["discontinued_usd"] * 100),
        )
        for r in rows
    }
    assert got == {b: tuple(v) for b, v in want.items()}


def test_q242_conversion_python_replay(spark):
    from snowflake_stock_dbt_spark.plans.insights import q242_time_to_convert
    from snowflake_stock_dbt_spark.sources.tables import load_table

    got = {
        str(r["cohort"]): (r["n_users"], r["n_converted"], r["conversion_ppm"])
        for r in q242_time_to_convert(spark, SF).collect()
    }
    ev = load_table(spark, SF, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us"),
        F.date_trunc("week", "ts").cast("date").alias("wk"), "ts",
    ).collect()
    firsts = {}
    for r in ev:
        if r["event_type"] not in ("view", "purchase"):
            continue
        u = firsts.setdefault(r["user_id"], {})
        k = r["event_type"]
        if k not in u or r["us"] < u[k][0]:
            u[k] = (r["us"], r["ts"])
    import datetime

    want = defaultdict(lambda: [0, 0])
    for u, d in firsts.items():
        if "view" not in d:
            continue
        view_ts = d["view"][1]
        monday = view_ts.date() - datetime.timedelta(
            days=view_ts.date().weekday()
        )
        w = want[str(monday)]
        w[0] += 1
        if "purchase" in d and d["purchase"][0] > d["view"][0]:
            w[1] += 1
    assert got == {
        c: (n, k, k * 1_000_000 // n) for c, (n, k) in want.items()
    }


def test_q243_observation_matches_direct_aggregate(spark):
    """The single-pass observed metrics equal a direct aggregation of
    the same frame (proves the observe expressions see every row of the
    write exactly once)."""
    from snowflake_stock_dbt_spark.functions.numeric import dec_sum
    from snowflake_stock_dbt_spark.plans.insights import q243_observed_audit
    from snowflake_stock_dbt_spark.sources.tables import load_table

    got = q243_observed_audit(spark, SF).collect()[0]
    li = load_table(spark, SF, "lineitem")
    want = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.max("l_orderkey").alias("max_orderkey"),
        dec_sum(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        ).alias("revenue"),
        F.min(F.to_date("l_shipdate")).alias("first_ship"),
        F.max(F.to_date("l_shipdate")).alias("last_ship"),
    ).collect()[0]
    assert got["n_rows"] == want["n_rows"]
    assert got["max_orderkey"] == want["max_orderkey"]
    assert got["null_shipdates"] == 0
    assert got["revenue"] == want["revenue"]  # bit-identical (exact decimal)
    assert got["first_ship"] == want["first_ship"]
    assert got["last_ship"] == want["last_ship"]


def test_q244_frontier_brute_force_replay(spark):
    """Frontier == brute-force dominance filter; dominance counts match."""
    from snowflake_stock_dbt_spark.plans.insights import q244_pareto_frontier
    from snowflake_stock_dbt_spark.sources.tables import load_table

    got = {
        r["p_partkey"]: (r["price_c"], r["size"], r["n_dominated"])
        for r in q244_pareto_frontier(spark, SF).collect()
    }
    pts = [
        (r["p_partkey"], int(r["p_retailprice"] * 100 + 0.5), r["p_size"])
        for r in load_table(spark, SF, "part").collect()
    ]
    want = {}
    for k, pc, sz in pts:
        if not any(
            (pc2 <= pc and sz2 <= sz and (pc2 < pc or sz2 < sz))
            for _, pc2, sz2 in pts
        ):
            nd = sum(
                1
                for _, pc2, sz2 in pts
                if pc <= pc2 and sz <= sz2 and (pc < pc2 or sz < sz2)
            )
            want[k] = (pc, sz, nd)
    assert got == want


def test_q244_cross_bucket_domination(spark):
    """A point whose only dominator sits in an EARLIER price bucket must
    still be killed (the bucket-spine prefix min path)."""
    import os
    import tempfile

    from snowflake_stock_dbt_spark.plans.insights import (
        PARETO_BUCKET_C,
        q244_pareto_frontier,
    )

    rows = [
        # (partkey, retailprice_usd, size): A dominates C across buckets;
        # B survives (smaller size, higher price); D same price as A,
        # bigger size -> dominated within the price group.
        (1, 10.0, 5, "x", "b", "t"),
        (2, (2 * PARETO_BUCKET_C + 50) / 100.0, 3, "x", "b", "t"),
        (3, (2 * PARETO_BUCKET_C + 90) / 100.0, 7, "x", "b", "t"),
        (4, 10.0, 9, "x", "b", "t"),
    ]
    df = spark.createDataFrame(
        rows,
        "p_partkey bigint, p_retailprice double, p_size int,"
        " p_name string, p_brand string, p_type string",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "part.parquet"))
        got = {
            r["p_partkey"]: r["n_dominated"]
            for r in q244_pareto_frontier(spark, d).collect()
        }
    # 1 dominates 3 (earlier bucket) and 4 (same price, larger size);
    # 2 also dominates 3 (same bucket, cheaper AND smaller); 3, 4 killed.
    assert got == {1: 2, 2: 1}


def test_q245_ks_python_replay(spark):
    from snowflake_stock_dbt_spark.plans.insights import (
        KS_Y0,
        KS_Y1,
        q245_ks_drift,
    )
    from snowflake_stock_dbt_spark.sources.tables import load_table

    got = {
        r["l_returnflag"]: (r["n0"], r["n1"], r["ks_d"])
        for r in q245_ks_drift(spark, SF).collect()
    }
    rows = load_table(spark, SF, "lineitem").select(
        "l_returnflag", "l_extendedprice", F.year("l_shipdate").alias("yr")
    ).collect()
    by_flag = defaultdict(lambda: ([], []))
    for r in rows:
        if r["yr"] == KS_Y0:
            by_flag[r["l_returnflag"]][0].append(r["l_extendedprice"])
        elif r["yr"] == KS_Y1:
            by_flag[r["l_returnflag"]][1].append(r["l_extendedprice"])
    for flag, (a, b) in by_flag.items():
        if not a or not b:
            assert flag not in got or 0 in (got[flag][0], got[flag][1])
            continue
        n0, n1 = len(a), len(b)
        vals = sorted(set(a) | set(b))
        sa, sb = sorted(a), sorted(b)
        import bisect

        dnum = max(
            abs(bisect.bisect_right(sa, v) * n1 - bisect.bisect_right(sb, v) * n0)
            for v in vals
        )
        want = (n0, n1, dnum / (n0 * n1))
        have = got[flag]
        assert have[0] == want[0] and have[1] == want[1]
        assert abs(have[2] - want[2]) < 1e-12, (flag, have, want)


def test_q246_mann_whitney_python_replay(spark):
    """U and AUC equal a scipy-free python replay with midrank ties, and
    U1 + U2 == n0·n1 (the rank-sum identity)."""
    from snowflake_stock_dbt_spark.plans.insights import (
        KS_Y0,
        KS_Y1,
        q246_mann_whitney,
    )
    from snowflake_stock_dbt_spark.sources.tables import load_table

    got = {
        r["l_returnflag"]: (r["n0"], r["n1"], r["u1"], r["auc"])
        for r in q246_mann_whitney(spark, SF).collect()
    }
    rows = load_table(spark, SF, "lineitem").select(
        "l_returnflag", "l_extendedprice", F.year("l_shipdate").alias("yr")
    ).collect()
    by_flag = defaultdict(lambda: ([], []))
    for r in rows:
        if r["yr"] == KS_Y0:
            by_flag[r["l_returnflag"]][0].append(r["l_extendedprice"])
        elif r["yr"] == KS_Y1:
            by_flag[r["l_returnflag"]][1].append(r["l_extendedprice"])
    for flag, (a, b) in by_flag.items():
        if not a or not b:
            continue
        pooled = sorted(
            [(v, 0) for v in a] + [(v, 1) for v in b]
        )
        # midranks in half-units
        r1_2 = 0
        i = 0
        while i < len(pooled):
            j = i
            while j < len(pooled) and pooled[j][0] == pooled[i][0]:
                j += 1
            midrank2 = (i + 1) + j  # 2 * average of ranks i+1..j
            r1_2 += midrank2 * sum(1 for k in range(i, j) if pooled[k][1] == 0)
            i = j
        n0, n1 = len(a), len(b)
        u1 = (r1_2 - n0 * (n0 + 1)) / 2
        assert got[flag][0] == n0 and got[flag][1] == n1
        assert abs(got[flag][2] - u1) < 1e-9, flag
        assert abs(got[flag][3] - u1 / (n0 * n1)) < 1e-12, flag
        assert 0.0 <= got[flag][3] <= 1.0


def test_q247_histogram_intersection_python_replay(spark):
    """Pairwise HI equals a python replay; similarity bounded (0, 1] and
    symmetric by construction (only a < b pairs emitted)."""
    from snowflake_stock_dbt_spark.plans.insights import (
        HI_BUCKET_C,
        q247_histogram_intersection,
    )
    from snowflake_stock_dbt_spark.sources.tables import load_table

    rows = q247_histogram_intersection(spark, SF).collect()
    li = load_table(spark, SF, "lineitem")
    s = load_table(spark, SF, "supplier")
    n = load_table(spark, SF, "nation")
    data = (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name", "l_extendedprice")
        .collect()
    )
    hists = defaultdict(Counter)
    for r in data:
        hists[r["n_name"]][
            int(r["l_extendedprice"] * 100 + 0.5) // HI_BUCKET_C
        ] += 1
    got = {(r["nation_a"], r["nation_b"]): r for r in rows}
    nations = sorted(hists)
    for ai, a in enumerate(nations):
        for b in nations[ai + 1 :]:
            na = sum(hists[a].values())
            nb = sum(hists[b].values())
            hi = sum(
                min(hists[a][k] * nb, hists[b][k] * na)
                for k in set(hists[a]) & set(hists[b])
            )
            r = got[(a, b)]
            assert r["n_a"] == na and r["n_b"] == nb
            assert abs(r["similarity"] - hi / (na * nb)) < 1e-12
            assert 0.0 < r["similarity"] <= 1.0


def test_q248_control_chart_python_replay(spark):
    """Flagged days equal an exact-integer python replay of the
    cross-multiplied 3-sigma test on the trailing window."""
    from snowflake_stock_dbt_spark.plans.insights import (
        SPC_WINDOW,
        q248_control_chart,
    )
    from snowflake_stock_dbt_spark.sources.tables import load_table

    got = {
        (r["n_name"], str(r["day"])) for r in q248_control_chart(spark, SF).collect()
    }
    li = load_table(spark, SF, "lineitem")
    s = load_table(spark, SF, "supplier")
    n = load_table(spark, SF, "nation")
    rows = (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name", F.to_date("l_shipdate").alias("day"),
                "l_extendedprice", "l_discount")
        .collect()
    )
    daily = defaultdict(lambda: defaultdict(int))
    for r in rows:
        daily[r["n_name"]][str(r["day"])] += int(
            r["l_extendedprice"] * (1.0 - r["l_discount"]) * 100 + 0.5
        )
    want = set()
    for nation, days in daily.items():
        ordered = sorted(days)
        vals = [days[d] for d in ordered]
        for i, d in enumerate(ordered):
            w = vals[max(0, i - SPC_WINDOW) : i]
            if len(w) != SPC_WINDOW:
                continue
            nw = SPC_WINDOW
            sw = sum(w)
            qw = sum(v * v for v in w)
            x = vals[i]
            if (nw * x - sw) ** 2 * (nw - 1) > 9 * nw * (nw * qw - sw * sw):
                want.add((nation, d))
    assert got == want


def test_q249_routing_partitions_the_table(spark):
    """Route buckets sum exactly to the table count (first-rule-wins
    puts every row in exactly one bucket), and a python replay agrees
    per bucket."""
    from snowflake_stock_dbt_spark.plans.insights import (
        q249_quarantine_routing,
    )
    from snowflake_stock_dbt_spark.sources.tables import load_table

    rows = q249_quarantine_routing(spark, SF).collect()
    li = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders")
    n_li = li.count()
    assert sum(r["n_rows"] for r in rows) == n_li
    odate = {
        r["o_orderkey"]: r["o_orderdate"] for r in o.collect()
    }
    want = Counter()
    for r in li.select(
        "l_orderkey", "l_quantity", "l_discount", "l_extendedprice",
        F.to_date("l_shipdate").alias("ship"),
    ).collect():
        od = odate.get(r["l_orderkey"])
        if od is None:
            want["orphan_orderkey"] += 1
        elif r["l_quantity"] <= 0:
            want["nonpositive_qty"] += 1
        elif r["l_discount"] < 0 or r["l_discount"] > 0.5:
            want["discount_out_of_range"] += 1
        elif r["l_extendedprice"] <= 0:
            want["nonpositive_price"] += 1
        elif r["ship"] < od.date():
            want["ships_before_order"] += 1
        else:
            want["valid"] += 1
    assert {r["route"]: r["n_rows"] for r in rows} == dict(want)


def test_q250_composes_the_standalone_signals(spark):
    """The capstone's per-day signals must agree with the standalone
    operators: SPC flags equal q248's flag set restricted to the report
    window, and the MA state sign matches q227's integer crossing test
    recomputed in python."""
    from snowflake_stock_dbt_spark.plans.insights import (
        MA_LONG,
        MA_SHORT,
        q248_control_chart,
        q250_daily_healthcheck,
    )
    from snowflake_stock_dbt_spark.sources.tables import load_table

    report = q250_daily_healthcheck(spark, SF).collect()
    assert report
    days_in_report = {(r["n_name"], str(r["day"])) for r in report}
    spc_truth = {
        (r["n_name"], str(r["day"]))
        for r in q248_control_chart(spark, SF).collect()
    }
    got_flags = {
        (r["n_name"], str(r["day"])) for r in report if r["spc_outlier"]
    }
    assert got_flags == spc_truth & days_in_report
    # MA state replay
    li = load_table(spark, SF, "lineitem")
    s = load_table(spark, SF, "supplier")
    n = load_table(spark, SF, "nation")
    rows = (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name", F.to_date("l_shipdate").alias("day"),
                "l_extendedprice", "l_discount")
        .collect()
    )
    daily = defaultdict(lambda: defaultdict(int))
    for r in rows:
        daily[r["n_name"]][str(r["day"])] += int(
            r["l_extendedprice"] * (1.0 - r["l_discount"]) * 100 + 0.5
        )
    states = {}
    for nation, days in daily.items():
        ordered = sorted(days)
        vals = [days[d] for d in ordered]
        for i, d in enumerate(ordered):
            ss = sum(vals[max(0, i - MA_SHORT + 1) : i + 1])
            ns = min(i + 1, MA_SHORT)
            sl = sum(vals[max(0, i - MA_LONG + 1) : i + 1])
            nl = min(i + 1, MA_LONG)
            diff = ss * nl - sl * ns
            states[(nation, d)] = (
                "short_above" if diff > 0
                else "short_below" if diff < 0 else "level"
            )
    for r in report:
        assert r["ma_state"] == states[(r["n_name"], str(r["day"]))], r
