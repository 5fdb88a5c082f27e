"""Ad-hoc oracle checker: ``python tools/check_queries.py q82 q83 ...``

Runs the named queries (prefix match) from ``__spark_entry__.queries()``
against their DuckDB oracles at sf0.01 with the driver's order-insensitive
value-hash compare. Development aid for the full sweep in
.claude/skills/verify/SKILL.md.
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from snowflake_stock_dbt_spark.schemas import TESTDATA_TABLES  # noqa: E402
from snowflake_stock_dbt_spark.session import get_spark  # noqa: E402


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return hashlib.sha256(
        repr(sorted(tuple(repr(r[i]) for i in order) for r in rows)).encode()
    ).hexdigest()[:16]


def main() -> int:
    prefixes = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    # Oracle-parity runs must never silently cross the documented
    # approximation thresholds (two-level beam assign, block splitting at
    # k >= TWO_LEVEL_MIN_K): the registered SQL oracles are exact, so a
    # larger corpus would surface as a confusing value mismatch. The flag
    # makes those paths raise loudly at setup instead (ADVICE r9).
    os.environ.setdefault("SPARK_GRAFT_FORCE_EXACT", "1")
    spark = get_spark("check")
    con = duckdb.connect()
    # DuckDB's default limit is ~80% of PHYSICAL RAM, ignoring what a
    # co-resident Spark JVM already holds — a sweep run next to a bench
    # or probe died with "Failed to allocate block" once. sf0.01 oracles
    # need far less than this; cap so the check never races the JVM.
    con.sql("SET memory_limit='16GB'")
    con.sql("SET threads=8")
    for t in TESTDATA_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    qs, osql = E.queries(), E.oracle_sql()
    names = sorted(
        n for n in qs if not prefixes or any(n.startswith(p) for p in prefixes)
    )
    failed = 0
    for name in names:
        try:
            sdf = qs[name](spark, sf)
            srows = [tuple(r) for r in sdf.collect()]
            if name not in osql:
                print(f"RESULT {name} rows: {len(srows)} (no oracle)", flush=True)
                continue
            res = con.sql(osql[name])
            orows = res.fetchall()
            ocols = [d[0] for d in res.description]
            # Match the driver: schema (sorted column names) AND values.
            # Hash-only compare missed a renamed column once (q288 r6) —
            # sorted values are position-identical under a pure rename.
            schema_ok = sorted(sdf.columns) == sorted(ocols)
            ok = schema_ok and (
                value_hash(sdf.columns, srows) == value_hash(ocols, orows)
            )
            failed += 0 if ok else 1
            print(
                f"RESULT {name} rows: {len(srows)}/{len(orows)} "
                f"hash-match: {ok}"
                + ("" if schema_ok else
                   f" SCHEMA-MISMATCH spark={sorted(sdf.columns)}"
                   f" oracle={sorted(ocols)}"),
                flush=True,
            )
            if not ok and "--diff" in sys.argv:
                print(" spark:", sorted(srows)[:5])
                print(" oracle:", sorted(orows)[:5])
        except Exception as exc:
            failed += 1
            print(f"RESULT {name} ERROR {exc!r}"[:300], flush=True)
        finally:
            # Long sweeps must not accumulate per-query persisted frames
            # (ADVICE r9: _stabilize_assigned caches) in the storage layer.
            from snowflake_stock_dbt_spark.operators.similarity import (
                release_persisted_frames,
            )

            release_persisted_frames()
    print(f"CHECK-DONE failed={failed}", flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
