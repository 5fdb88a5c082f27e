"""Corpus schema probe (round-2 VERDICT.md item 8).

The driver REGENERATES /root/testdata between rounds and the events ``ts``
physical type has flipped before (TIMESTAMP(NANOS) in round 1 →
TIMESTAMP(MICROS) in round 2). When that happens, twenty event queries fail
at once with opaque TIMESTAMP_NTZ/PARQUET_TYPE_ILLEGAL errors; this probe
fails FIRST, loudly, naming the live dtype — so a future corpus flip is a
one-test diagnosis instead of a debugging session.
"""

from __future__ import annotations

import duckdb
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from snowflake_stock_dbt_spark.sources.tables import load_table

#: Every physical form normalize_instant knows how to handle.
_HANDLED_TS = {"timestamp[us]", "timestamp[ns]", "int64"}


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
)
def test_events_ts_physical_type_is_handled(sf):
    arrow_type = str(pq.read_schema(f"{sf}/events.parquet").field("ts").type)
    assert arrow_type in _HANDLED_TS, (
        f"CORPUS FLIP: {sf}/events.parquet ships ts as {arrow_type!r}, which "
        "sources/tables.py:normalize_instant does not handle — extend it "
        "(and re-run the full sweep) before touching any event query"
    )


def test_normalized_ts_matches_duckdb_instants(spark, oracle_sf_dir):
    """Whatever the physical form, the normalized column must be a plain
    TimestampType whose min/max epoch-µs agree with DuckDB's reading of
    the same file — the exact bridge every event oracle depends on."""
    ev = load_table(spark, oracle_sf_dir, "events")
    assert isinstance(ev.schema["ts"].dataType, T.TimestampType), (
        f"normalize_instant left ts as {ev.schema['ts'].dataType}"
    )
    got = ev.agg(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
        F.count("*").alias("n"),
    ).collect()[0]
    want = duckdb.sql(
        "SELECT epoch_us(MIN(CAST(ts AS TIMESTAMP))) AS lo, "
        "epoch_us(MAX(CAST(ts AS TIMESTAMP))) AS hi, COUNT(*) AS n "
        f"FROM read_parquet('{oracle_sf_dir}/events.parquet')"
    ).fetchall()[0]
    assert (got["lo"], got["hi"], got["n"]) == want
