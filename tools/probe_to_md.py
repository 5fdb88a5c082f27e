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
    head = "| query | " + " | ".join(f"x{k} s" for k in factors) + " | exp(x1→x{0}) | exp(x{1}→x{0}) |".format(hi, mid)
    sep = "|---" * (len(factors) + 3) + "|"
    print(head)
    print(sep)
    for name, rec in sorted(data.items()):
        t = {int(k): v for k, v in rec["times"].items()}
        full = math.log(t[hi] / t[lo]) / math.log(hi / lo)
        tail = (
            math.log(t[hi] / t[mid]) / math.log(hi / mid)
            if hi != mid
            else float("nan")
        )
        cells = " | ".join(f"{t[k]:.2f}" for k in factors)
        print(f"| {name} | {cells} | {full:.2f} | {tail:.2f} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
