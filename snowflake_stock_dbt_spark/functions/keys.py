"""Surrogate-key hashing (SURVEY.md §2.8 F4/F5).

The reference builds entity/observation keys as
SHA2(CONCAT_WS('|', COALESCE(TRIM(col), '')...), 256)
(sql/02_load_data.sql:81-91; dbt models/stg_most_actives.sql:29-47).

CONCAT_WS null semantics differ between engines (Snowflake nulls the whole
result on a NULL arg, Spark skips NULL args) — the COALESCE('' ) guard makes
them identical, so it is mandatory here, not decorative (SURVEY.md §7.3).
SHA-256 emits the same lowercase hex in Spark, Snowflake and DuckDB, so keys
are bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def sha_key(*cols: Column | str, sep: str = "|") -> Column:
    """sha256 over a '|'-joined, ''-coalesced, trimmed column list."""
    guarded = [
        F.coalesce(F.trim(F.col(c) if isinstance(c, str) else c), F.lit(""))
        for c in cols
    ]
    return F.sha2(F.concat_ws(sep, *guarded), 256)


def sha_key_sql(*cols: str, sep: str = "|") -> str:
    """The DuckDB-oracle twin of :func:`sha_key` (DuckDB sha256())."""
    guarded = ", ".join(f"COALESCE(TRIM({c}), '')" for c in cols)
    return f"sha256(concat_ws('{sep}', {guarded}))"
