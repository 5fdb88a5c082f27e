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
