"""TRY_-cast parity pinning (SURVEY.md §7.3): Spark ``try_cast`` vs DuckDB
``TRY_CAST`` on adversarial strings.

The silver promotion (models/stock.py) and every oracle comparison rely on
the two engines agreeing for the data that actually flows — machine-
formatted integers, decimals and ISO-8601 timestamps. That parity class is
asserted exactly. The engines genuinely DIVERGE on exotic classes
(documented below); the test pins today's behavior on both sides so an
engine upgrade that shifts the boundary is caught, not silently absorbed.

Known divergence classes (Spark vs DuckDB):
- decimal/scientific strings → BIGINT: DuckDB rounds ('.5' → 1,
  '-3.14' → -3, '1e5' → 100000); Spark returns NULL.
- '0x10' → BIGINT: DuckDB parses hex (16); Spark NULL.
- non-ASCII digits ('١٢٣') → DECIMAL: Spark parses (123); DuckDB NULL.
- 'Infinity' → TIMESTAMP: DuckDB has an infinity timestamp; Spark NULL.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

#: Machine-formatted class: the engines MUST agree on every one of these.
PARITY = [
    "", " ", "0", "-0", "+1", "  42  ", "1,000", "abc", "12abc",
    "1.2.3", "--5", "9" * 40, "1" + "0" * 20,
    "9223372036854775807", "9223372036854775808", "-9223372036854775809",
    "2024-01-01", "2024-01-01 10:00:00", "2024-01-01T10:00:00",
    "2024-01-01 10:00:00.123456", "2024-01-01 10:00:00+02:00",
    "2024-13-01", "2024-01-32", "01/02/2024", "today", "1718000000",
    "inf", "-inf", "NaN",
    # Adversarial whitespace / separators / exponent / sign forms that the
    # engines agree on (round-2 hardening):
    "\t42\n", "1e+308", "1e309", "-1e309",  # overflow -> double inf, both
    ".", "+", "-", "-.", "e5", ".e5", "5e", "5e+",  # degenerate numerics
    "0o17", "²", "+ 5", "5 5",  # octal prefix, superscript, inner spaces
    ",1", "1,", "1,00", "1.000,5", "(42)", "$42", "42%",  # locale-ish forms
]

#: Exotic class: pinned per-engine expectations for (BIGINT, DECIMAL, TS)
#: where they differ. {input: (spark_long, duck_long)}
KNOWN_LONG_DIVERGENCE = {
    "3.14": (None, 3),
    "123.4567": (None, 123),
    "123.45678": (None, 123),
    "-3.14": (None, -3),
    ".5": (None, 1),
    "5.": (None, 5),
    "1e5": (None, 100000),
    "1E-3": (None, 0),
    "0x10": (None, 16),
    # Round-2 additions — DuckDB's BIGINT parser accepts exponent forms,
    # leading-dot with sign, binary/underscore literals; Spark does not:
    " +1.5e2 ": (None, 150),
    "1e-999": (None, 0),
    "+.5": (None, 1),
    "0b101": (None, 5),
    "1_000": (None, 1000),
    "4.2e1": (None, 42),
    "42e0": (None, 42),
}

#: Inputs where the DOUBLE cast diverges too (DuckDB parses underscore
#: separators everywhere; Spark nowhere), so the doubles-agree clause of the
#: pinning test is asserted per-engine instead.
DOUBLE_ALSO_DIVERGES = {"1_000": (None, 1000.0)}


def _spark_casts(spark, values):
    df = spark.createDataFrame([(s,) for s in values], "s string").select(
        "s",
        F.expr("try_cast(s AS DOUBLE)").alias("d"),
        F.expr("try_cast(s AS BIGINT)").alias("l"),
        F.expr("CAST(try_cast(s AS DECIMAL(18,4)) AS STRING)").alias("dec"),
        F.expr("CAST(try_cast(s AS TIMESTAMP) AS STRING)").alias("ts"),
    )
    return {r["s"]: (r["d"], r["l"], r["dec"], r["ts"]) for r in df.collect()}


def _duck_casts(values):
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    out = {}
    for s in values:
        out[s] = con.sql(
            "SELECT TRY_CAST(? AS DOUBLE), TRY_CAST(? AS BIGINT), "
            "CAST(TRY_CAST(? AS DECIMAL(18,4)) AS VARCHAR), "
            "CAST(TRY_CAST(? AS TIMESTAMP) AS VARCHAR)",
            params=[s, s, s, s],
        ).fetchone()
    return out


def _eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return (math.isnan(a) and math.isnan(b)) or a == b
    return a == b


def test_machine_formatted_casts_agree(spark):
    s, d = _spark_casts(spark, PARITY), _duck_casts(PARITY)
    for v in PARITY:
        assert all(_eq(x, y) for x, y in zip(s[v], d[v])), (
            f"{v!r}: spark={s[v]} duck={d[v]}"
        )


def test_known_divergences_are_pinned(spark):
    vals = list(KNOWN_LONG_DIVERGENCE)
    s, d = _spark_casts(spark, vals), _duck_casts(vals)
    for v, (spark_l, duck_l) in KNOWN_LONG_DIVERGENCE.items():
        assert s[v][1] == spark_l, f"Spark BIGINT cast of {v!r} moved: {s[v][1]}"
        assert d[v][1] == duck_l, f"DuckDB BIGINT cast of {v!r} moved: {d[v][1]}"
        if v in DOUBLE_ALSO_DIVERGES:
            sd, dd = DOUBLE_ALSO_DIVERGES[v]
            assert s[v][0] == sd and d[v][0] == dd, f"DOUBLE pin moved for {v!r}"
        else:
            # Doubles and decimals still agree on these inputs.
            assert _eq(s[v][0], d[v][0]) and s[v][2] == d[v][2]


def test_unicode_digit_and_infinity_divergence(spark):
    vals = ["١٢٣", "１２３", "Infinity", "00042"]
    s, d = _spark_casts(spark, vals), _duck_casts(vals)
    # Non-ASCII decimal digits (Arabic-Indic and full-width): Spark's
    # DECIMAL parser accepts them, DuckDB's rejects.
    assert s["١٢٣"][2] == "123.0000" and d["١٢٣"][2] is None
    assert s["１２３"][2] == "123.0000" and d["１２３"][2] is None
    assert s["Infinity"][3] is None and d["Infinity"][3] == "infinity"
    # Zero-padded integers: Spark's TIMESTAMP parser reads '00042' as year
    # 42; DuckDB refuses. The BIGINT casts agree (both 42).
    assert s["00042"][3] == "0042-01-01 00:00:00" and d["00042"][3] is None
    assert s["00042"][1] == d["00042"][1] == 42
