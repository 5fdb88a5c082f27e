"""Property tests for the worksheet text preprocessors (worksheet.py).

The preprocessors are quote-aware scanners; the properties pin the
invariants the runner depends on: string literals are NEVER rewritten,
comments never survive, statement splitting loses nothing but the
semicolons, and the rewrites are idempotent.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from snowflake_stock_dbt_spark.worksheet import (
    flatten_names,
    pin_clock,
    split_statements,
    strip_comments,
)

# SQL-ish fragments: plain chunks never contain quote/comment starters;
# string literals may contain ANYTHING (inner quotes doubled).
_plain = st.text(
    alphabet="ABCdef123_ .,()=<>\n\t+*", min_size=0, max_size=30
).filter(lambda s: "--" not in s and "/*" not in s)
_literal_body = st.text(
    alphabet="abcXYZ -;_.'/*\\$", min_size=0, max_size=20
)


def _mk_literal(body: str) -> str:
    return "'" + body.replace("'", "''") + "'"


_segment = st.one_of(_plain, _literal_body.map(_mk_literal))
sqlish = st.lists(_segment, min_size=0, max_size=8).map("".join)


def _literals(sql: str) -> list[str]:
    """Extract single-quoted literal bodies via the same scanning rules."""
    out, i, n = [], 0, len(sql)
    while i < n:
        if sql[i] == "'":
            j = i + 1
            while j < n and (sql[j] != "'" or (j + 1 < n and sql[j + 1] == "'")):
                j += 2 if sql[j] == "'" else 1
            out.append(sql[i + 1 : j])
            i = j + 1
        else:
            i += 1
    return out


@settings(max_examples=200, deadline=None)
@given(sqlish)
def test_strip_comments_idempotent_and_preserves_literals(sql):
    once = strip_comments(sql)
    assert strip_comments(once) == once
    assert _literals(once) == _literals(sql)
    # no comment markers survive outside literals
    stripped_of_lits = re.sub(r"'(?:[^']|'')*'", "", once)
    assert "--" not in stripped_of_lits and "/*" not in stripped_of_lits


@settings(max_examples=200, deadline=None)
@given(sqlish)
def test_split_statements_preserves_content(sql):
    parts = split_statements(sql)
    # rejoining loses only semicolons and surrounding whitespace
    lost = re.sub(r"[;\s]", "", sql)
    kept = "".join(re.sub(r"[;\s]", "", p) for p in parts)
    assert kept == lost
    for p in parts:
        assert p.strip() == p and p != ""


@settings(max_examples=200, deadline=None)
@given(sqlish)
def test_flatten_names_never_touches_literals(sql):
    assert _literals(flatten_names(sql)) == _literals(sql)


@settings(max_examples=200, deadline=None)
@given(sqlish)
def test_pin_clock_never_touches_literals(sql):
    assert _literals(pin_clock(sql, "2024-06-01 00:00:00")) == _literals(sql)


def test_flatten_removes_all_three_part_names():
    out = flatten_names("A.B.C JOIN X1.Y_2.Z3 ON A.B.C.col")  # 3-part + ref
    no_lits = re.sub(r"'(?:[^']|'')*'", "", out)
    assert not re.search(r"\b\w+\.\w+\.\w+\b", no_lits.replace("c.col", ""))
