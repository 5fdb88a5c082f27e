"""Oracle result-type hygiene for the driver's pandas-based comparator.

The round-1 driver flagged q61 as a hash mismatch with identical values:
DuckDB's SUM(BIGINT) returns HUGEINT, which pandas converts to float64, so a
stringifying value-hash sees "5.0" vs Spark's "5". The local harness fetched
via fetchall() (hugeint -> Python int) and never saw it. This test closes the
gap for EVERY registered oracle: no oracle may emit a DuckDB type outside the
pandas-faithful whitelist.
"""

from __future__ import annotations

import pytest

from snowflake_stock_dbt_spark.plans import ALL_ORACLES
from tests.oracle_utils import duckdb_connection

SF_DIR = "/root/testdata/sf0.001"

# Types that round-trip through pandas/Arrow without changing the printed
# value family. HUGEINT/UHUGEINT (-> float64) and UBIGINT (-> uint64) are
# deliberately absent.
_ALLOWED_PREFIXES = (
    "BOOLEAN",
    "TINYINT",
    "SMALLINT",
    "INTEGER",
    "BIGINT",
    "FLOAT",
    "DOUBLE",
    "VARCHAR",
    "DATE",
    "TIMESTAMP",
    "BLOB",
)


@pytest.mark.parametrize("name", sorted(ALL_ORACLES))
def test_oracle_emits_pandas_faithful_types(name):
    con = duckdb_connection(SF_DIR)
    try:
        res = con.sql(ALL_ORACLES[name])
        cols = [d[0] for d in res.description]
        types = [str(t).upper() for t in res.types]
    finally:
        con.close()
    bad = [
        (c, t)
        for c, t in zip(cols, types)
        if not t.startswith(_ALLOWED_PREFIXES)
    ]
    assert not bad, (
        f"{name}: oracle emits driver-unsafe DuckDB types {bad}; cast them "
        "(e.g. CAST(SUM(x) AS BIGINT)) so pandas keeps the value family"
    )
