"""bench.py regression-comparator baseline extraction: all three shapes the
driver has produced (raw line, parsed wrapper, truncated tail)."""

from __future__ import annotations

import json

from bench import _extract_queries


def test_extracts_raw_shape(tmp_path):
    p = tmp_path / "BENCH_r01.json"
    p.write_text(json.dumps({"metric": "s", "queries": {"q01": 1.5}}))
    assert _extract_queries(str(p)) == {"q01": 1.5}


def test_extracts_parsed_wrapper(tmp_path):
    p = tmp_path / "BENCH_r01.json"
    p.write_text(json.dumps({"parsed": {"queries": {"q01": 2.0}}, "tail": ""}))
    assert _extract_queries(str(p)) == {"q01": 2.0}


def test_extracts_truncated_tail(tmp_path):
    line = json.dumps({"metric": "s", "value": 1, "queries": {"q01": 1.0, "q02": 2.0}, "sf": 0.1})
    p = tmp_path / "BENCH_r01.json"
    p.write_text(json.dumps({"tail": line[10:], "parsed": None}))  # cut mid-JSON
    assert _extract_queries(str(p)) == {"q01": 1.0, "q02": 2.0}


def test_tail_cut_inside_queries_scavenges_complete_pairs(tmp_path):
    """A tail truncated mid-object still yields the complete pairs (the
    driver has recorded front-truncated tails, BENCH_r02.json; a partial
    baseline beats none)."""
    line = '{"queries": {"q01": 1.0, "q02"'
    p = tmp_path / "BENCH_r01.json"
    p.write_text(json.dumps({"tail": line, "parsed": None}))
    assert _extract_queries(str(p)) == {"q01": 1.0}


def test_front_truncated_tail_scavenges(tmp_path):
    line = '0.5, "q31_rollup": 1.7, "q32_cube": 0.48, "q33'
    p = tmp_path / "BENCH_r01.json"
    p.write_text(json.dumps({"tail": line}))
    assert _extract_queries(str(p)) == {"q31_rollup": 1.7, "q32_cube": 0.48}


def test_unreadable_returns_none(tmp_path):
    p = tmp_path / "BENCH_r01.json"
    p.write_text("not json")
    assert _extract_queries(str(p)) is None


def test_ensure_confs_records_failures():
    """__spark_entry__._ensure_confs must record a refused conf loudly
    (round-1 VERDICT: the silent swallow masked the q61 investigation)."""
    import __spark_entry__ as E

    class LockedConf:
        def get(self, k, default=None):
            return None

        def set(self, k, v):
            raise RuntimeError("conf is locked")

    class FakeSession:
        conf = LockedConf()

    E.CONF_FAILURES.clear()
    E._ensure_confs(FakeSession())
    assert set(E.CONF_FAILURES) == set(E._REQUIRED_RUNTIME_CONFS)
    assert "locked" in next(iter(E.CONF_FAILURES.values()))
    E.CONF_FAILURES.clear()


def test_summary_line_carries_parseable_queries_map():
    """VERDICT r11 item 1: the driver's PERF comparison consumes a
    ``queries`` map parsed from the final stdout line, whose artifact
    keeps only the last 2000 chars — the line must fit whole AND carry
    per-query seconds under exact names, slowest first, omission
    declared."""
    from bench import build_summary_line

    times = {f"q{i:03d}_{'x' * 16}": 0.01 * i for i in range(1, 352)}
    line = build_summary_line(
        sum(times.values()), 0.1, len(times), "abc1234", {}, None, times
    )
    assert len(line) <= 1900
    parsed = json.loads(line)
    assert parsed["unit"] == "sec"
    assert parsed["n_queries"] == 351
    qs = parsed["queries"]
    assert qs and all(k in times for k in qs)
    # Slowest-first fill: every included query is at least as slow as
    # every omitted one.
    floor = min(qs.values())
    omitted = [v for k, v in times.items() if k not in qs]
    assert all(round(v, 2) <= floor for v in omitted)
    assert parsed["queries_omitted"] == len(times) - len(qs)


def test_summary_line_small_suite_includes_everything():
    from bench import build_summary_line

    times = {"q01_small": 1.0, "q02_other": 2.0}
    line = build_summary_line(3.0, 0.1, 2, "abc", {"q01_small": "1->1"},
                              {"q01_small": 1.0, "_commit": "abc"}, times)
    parsed = json.loads(line)
    assert parsed["queries"] == {"q01_small": 1.0, "q02_other": 2.0}
    assert parsed["queries_omitted"] == 0
    assert "micro" in parsed and "top_movers" in parsed
