"""Format a scale_probe PROBE-JSON line as the PLANS.md exponent table.

Usage: python tools/probe_to_md.py /tmp/probe_r7_main.log
Reads the last PROBE-JSON line, prints a GitHub table with per-factor
seconds and both the full-range exponent (x1→max) and the TAIL exponent
(half→max — the one that exposes superlinearity that only appears after
caches/hash tables outgrow a working set).
"""

from __future__ import annotations

import json
import math
import sys


def _exp(t: dict[int, float], lo: int, hi: int) -> float:
    """log-log slope between two probed factors; NaN when a side is
    missing, the factors coincide, or a timing is zero/negative (a probe
    that failed or was below clock resolution must not raise)."""
    if lo == hi or lo not in t or hi not in t:
        return float("nan")
    if t[lo] <= 0 or t[hi] <= 0:
        return float("nan")
    return math.log(t[hi] / t[lo]) / math.log(hi / lo)


def exponents_table(
    times: dict[str, dict[int, float]], factors: list[int]
) -> list[tuple]:
    """(name, per-factor seconds dict, full exponent, tail exponent) per
    query, each computed over the factors THAT QUERY actually has — a
    query probed at fewer factors contributes its own subset instead of
    KeyError-ing the whole table (round-7 ADVICE)."""
    rows = []
    for name, t in sorted(times.items()):
        own = [k for k in factors if k in t]
        if not own:
            continue
        lo, hi = own[0], own[-1]
        mid = own[-2] if len(own) >= 2 else lo
        rows.append((name, t, _exp(t, lo, hi), _exp(t, mid, hi)))
    return rows


def main() -> int:
    path = sys.argv[1]
    line = None
    for ln in open(path):
        if ln.startswith("PROBE-JSON "):
            line = ln
    if line is None:
        print("no PROBE-JSON line found (probe still running?)")
        return 1
    data = json.loads(line[len("PROBE-JSON "):])
    factors = sorted(
        {int(k) for v in data.values() for k in v["times"]}
    )
    lo, hi = factors[0], factors[-1]
    mid = factors[-2] if len(factors) >= 2 else lo
    head = (
        "| query | "
        + " | ".join(f"x{k} s" for k in factors)
        + f" | exp(x{lo}→x{hi}) | exp(x{mid}→x{hi}) |"
    )
    sep = "|---" * (len(factors) + 3) + "|"
    print(head)
    print(sep)
    times = {
        name: {int(k): v for k, v in rec["times"].items()}
        for name, rec in data.items()
    }
    for name, t, full, tail in exponents_table(times, factors):
        cells = " | ".join(
            f"{t[k]:.2f}" if k in t else "—" for k in factors
        )
        print(f"| {name} | {cells} | {full:.2f} | {tail:.2f} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
