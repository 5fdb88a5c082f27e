"""Snowflake-dialect SQL preprocessing: QUALIFY rewrite.

The reference's SQL leans on Snowflake's ``QUALIFY`` for window-filter
dedup (reference sql/02_load_data.sql:109-112); OSS Spark SQL has no
QUALIFY, so the engine's SQL-string surface rewrites it into standard
form before ``spark.sql`` (SURVEY.md §7.3: "any SQL-string surface we
offer must rewrite QUALIFY or not accept it"):

    SELECT <sel> FROM <rest> QUALIFY <pred> [ORDER BY ...] [LIMIT n]
    →
    SELECT * [EXCEPT (__q0, ...)] FROM (
        SELECT <sel> [, <window-expr> AS __q0, ...] FROM <rest>
    ) WHERE <pred with window-exprs replaced by __qN>
    [ORDER BY ...] [LIMIT n]

Window expressions appearing directly in the predicate are hoisted into
the inner projection (hidden behind ``* EXCEPT``); predicates that only
reference select-list aliases need no helpers. The scanner respects
single-quoted strings, double-quoted identifiers, and nesting, so
subqueries and literals containing the word "qualify" are untouched.

Supported subset: one top-level QUALIFY per statement (Snowflake allows
exactly that), predicate window functions of the form
``name( args ) OVER ( spec )``. Deliberately NOT a full SQL parser — the
rewrite refuses (raises) rather than guessing when it cannot find the
top-level SELECT/FROM structure it needs.
"""

from __future__ import annotations

import re


def _scan_top_level(sql: str, word: str) -> list[int]:
    """Offsets where ``word`` appears as a token at paren-depth 0, outside
    string/identifier quotes."""
    out = []
    depth = 0
    i, n = 0, len(sql)
    wlen = len(word)
    while i < n:
        c = sql[i]
        if c == "'":
            i += 1
            while i < n and (sql[i] != "'" or (i + 1 < n and sql[i + 1] == "'")):
                i += 2 if sql[i] == "'" else 1
        elif c == '"':
            i += 1
            while i < n and sql[i] != '"':
                i += 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and sql[i : i + wlen].upper() == word:
            before = sql[i - 1] if i > 0 else " "
            after = sql[i + wlen] if i + wlen < n else " "
            if not (before.isalnum() or before == "_") and not (
                after.isalnum() or after == "_"
            ):
                out.append(i)
                i += wlen
                continue
        i += 1
    return out


def _skip_literal(sql: str, i: int) -> int:
    """Index just past the single-quoted literal opening at ``i``,
    honouring standard SQL ``''`` escapes (``'it''s'`` is ONE literal —
    closing at the first of the doubled quotes would treat the tail as
    code)."""
    n = len(sql)
    i += 1  # past the opening quote
    while i < n:
        if sql[i] == "'":
            if i + 1 < n and sql[i + 1] == "'":  # escaped quote
                i += 2
                continue
            return i + 1
        i += 1
    return n  # unterminated literal: consume to end, like before


def _match_paren(sql: str, open_idx: int) -> int:
    """Index just past the ``)`` matching the ``(`` at ``open_idx``."""
    depth = 0
    i, n = open_idx, len(sql)
    while i < n:
        c = sql[i]
        if c == "'":
            i = _skip_literal(sql, i) - 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise ValueError("unbalanced parentheses in SQL")


def _extract_window_exprs(pred: str) -> tuple[str, list[str]]:
    """Replace every ``fn(args) OVER (spec)`` in ``pred`` with ``__qN``;
    return (rewritten predicate, hoisted expressions in order)."""
    exprs: list[str] = []
    while True:
        m = re.search(r"\bOVER\s*\(", pred, re.IGNORECASE)
        if not m:
            break
        over_open = pred.index("(", m.start())
        end = _match_paren(pred, over_open)
        # Walk back from OVER across the window-function call: ')' of the
        # arg list, its matching '(', then the function name.
        j = m.start() - 1
        while j >= 0 and pred[j].isspace():
            j -= 1
        if j < 0 or pred[j] != ")":
            raise ValueError(
                "QUALIFY rewrite: expected 'fn(args) OVER (spec)' in "
                f"predicate near: {pred[max(0, m.start() - 40) : m.start()]!r}"
            )
        depth = 0
        k = j
        while k >= 0:
            if pred[k] == ")":
                depth += 1
            elif pred[k] == "(":
                depth -= 1
                if depth == 0:
                    break
            k -= 1
        k -= 1
        while k >= 0 and (pred[k].isalnum() or pred[k] in "_$"):
            k -= 1
        start = k + 1
        exprs.append(pred[start:end])
        pred = pred[:start] + f"__q{len(exprs) - 1}" + pred[end:]
    return pred, exprs


def rewrite_qualify(sql: str) -> str:
    """Rewrite one top-level QUALIFY into standard Spark SQL; statements
    without QUALIFY pass through unchanged."""
    hits = _scan_top_level(sql, "QUALIFY")
    if not hits:
        return sql
    if len(hits) > 1:
        raise ValueError("multiple top-level QUALIFY clauses")
    q = hits[0]
    head = sql[:q].rstrip()
    tail = sql[q + len("QUALIFY") :]

    # Split trailing top-level ORDER BY / LIMIT off the predicate.
    trail_at = len(tail)
    for word in ("ORDER", "LIMIT"):
        for off in _scan_top_level(tail, word):
            trail_at = min(trail_at, off)
    pred, trailing = tail[:trail_at].strip(), tail[trail_at:].strip()

    pred, hoisted = _extract_window_exprs(pred)

    if hoisted:
        froms = _scan_top_level(head, "FROM")
        if not froms:
            raise ValueError("QUALIFY rewrite: no top-level FROM in statement")
        f = froms[0]
        helpers = ", ".join(
            f"{e} AS __q{i}" for i, e in enumerate(hoisted)
        )
        inner = f"{head[:f].rstrip()}, {helpers} {head[f:]}"
        except_list = ", ".join(f"__q{i}" for i in range(len(hoisted)))
        outer = f"SELECT * EXCEPT ({except_list}) FROM (\n{inner}\n) WHERE {pred}"
    else:
        outer = f"SELECT * FROM (\n{head}\n) WHERE {pred}"
    return f"{outer}\n{trailing}" if trailing else outer


# ---------------------------------------------------------------------------
# Snowflake scalar-function rewrites. The reference's worksheets call
# TRY_TO_NUMBER / TRY_TO_DECIMAL / TRY_TO_TIMESTAMP_TZ / TO_VARCHAR / IFF /
# ZEROIFNULL (reference sql/02_load_data.sql:70-107); Spark SQL spells these
# differently. TRY_TO_NUMBER maps to DECIMAL(38,0), not BIGINT: Snowflake
# ROUNDS fractional text ('12.5' -> 13), which TRY_CAST AS DECIMAL
# reproduces and TRY_CAST AS BIGINT does not.
# ---------------------------------------------------------------------------


def _fn_try_to_number(args: list[str]) -> str:
    if len(args) == 1:
        return f"TRY_CAST({args[0]} AS DECIMAL(38,0))"
    if len(args) == 3:
        return f"TRY_CAST({args[0]} AS DECIMAL({args[1]},{args[2]}))"
    raise ValueError(f"TRY_TO_NUMBER arity {len(args)} unsupported")


def _fn_try_to_timestamp(args: list[str]) -> str:
    if len(args) != 1:
        raise ValueError("TRY_TO_TIMESTAMP_TZ with format unsupported")
    return f"TRY_CAST({args[0]} AS TIMESTAMP)"


_FN_REWRITES = {
    "TRY_TO_NUMBER": _fn_try_to_number,
    "TRY_TO_DECIMAL": _fn_try_to_number,
    "TRY_TO_TIMESTAMP_TZ": _fn_try_to_timestamp,
    "TO_VARCHAR": lambda a: f"CAST({a[0]} AS STRING)",
    "IFF": lambda a: f"IF({a[0]}, {a[1]}, {a[2]})",
    "ZEROIFNULL": lambda a: f"COALESCE({a[0]}, 0)",
}


def _split_top_args(s: str) -> list[str]:
    """Split on top-level commas, respecting parens and quotes."""
    args, depth, start, i, n = [], 0, 0, 0, len(s)
    while i < n:
        c = s[i]
        if c == "'":
            i += 1
            while i < n and s[i] != "'":
                i += 1
        elif c == '"':
            i += 1
            while i < n and s[i] != '"':
                i += 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            args.append(s[start:i].strip())
            start = i + 1
        i += 1
    last = s[start:].strip()
    if last:
        args.append(last)
    return args


def _find_fn_call(sql: str) -> tuple[int, str, int] | None:
    """(name_start, NAME, open_paren_idx) of the first rewritable call at
    any depth, outside quotes; None when there is none."""
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c == "'":
            i += 1
            while i < n and sql[i] != "'":
                i += 1
            i += 1
            continue
        if c == '"':
            i += 1
            while i < n and sql[i] != '"':
                i += 1
            i += 1
            continue
        if c.isalpha() or c == "_":
            j = i
            while j < n and (sql[j].isalnum() or sql[j] in "_$"):
                j += 1
            name = sql[i:j].upper()
            if name in _FN_REWRITES:
                k = j
                while k < n and sql[k].isspace():
                    k += 1
                if k < n and sql[k] == "(":
                    return i, name, k
            i = j
            continue
        i += 1
    return None


def rewrite_snowflake_functions(sql: str) -> str:
    """Replace every supported Snowflake scalar call (innermost-first, so
    nested calls inside argument lists are handled) with its Spark form."""
    while True:
        hit = _find_fn_call(sql)
        if hit is None:
            return sql
        start, name, open_idx = hit
        end = _match_paren(sql, open_idx)
        inner = rewrite_snowflake_functions(sql[open_idx + 1 : end - 1])
        repl = _FN_REWRITES[name](_split_top_args(inner))
        sql = sql[:start] + repl + sql[end:]


def rewrite_qualify_deep(sql: str) -> str:
    """Rewrite QUALIFY at the statement top level AND inside every
    parenthesized body (CTE definitions, subqueries) — the reference's
    dbt staging model puts its QUALIFY dedup inside a CTE
    (dbt_project/models/stg_most_actives.sql:44-48), where it is
    top-level *within that body*. Recursion bottom-up: inner paren
    groups first, so each rewrite_qualify call still sees exactly one
    top-level QUALIFY. Paren groups that are not query bodies (arg
    lists, window specs) contain no top-level QUALIFY and pass through
    unchanged."""
    out: list[str] = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c == "'":
            j = i + 1
            while j < n and (sql[j] != "'" or (j + 1 < n and sql[j + 1] == "'")):
                j += 2 if sql[j] == "'" else 1
            out.append(sql[i : j + 1])
            i = j + 1
        elif c == '"':
            j = i + 1
            while j < n and sql[j] != '"':
                j += 1
            out.append(sql[i : j + 1])
            i = j + 1
        elif c == "(":
            end = _match_paren(sql, i)
            out.append("(" + rewrite_qualify_deep(sql[i + 1 : end - 1]) + ")")
            i = end
        else:
            out.append(c)
            i += 1
    return rewrite_qualify("".join(out))


def compile_snowflake_sql(sql: str) -> str:
    """Full worksheet-dialect door: scalar-function rewrites + the QUALIFY
    rewrite (top-level and inside CTE/subquery bodies), ready for
    ``spark.sql``."""
    return rewrite_qualify_deep(rewrite_snowflake_functions(sql))


# ---------------------------------------------------------------------------
# Deterministic STDDEV: this engine defines the worksheet dialect's
# STDDEV(x) as the exact closed form
#
#     sqrt((n*SUMx2 - SUMx^2) / (n*(n-1)))
#
# with every sum carried in DECIMAL(38-bounded) integer arithmetic and
# exactly ONE double rounding at the end (decimal->double cast, IEEE
# division, IEEE sqrt — each correctly rounded and engine-independent).
# Native STDDEV accumulates central moments in engine-internal order
# (Spark: partitioned tree-agg M2; DuckDB: sequential), so two engines
# legitimately disagree in the last ulps — measured on the q112 star at
# sf0.01: Spark ...068957 vs DuckDB ...068942 vs closed form ...068946
# on BOTH. The closed form is the one STDDEV definition that can carry a
# cross-engine value oracle; precision bounds: |x| < 10^13,
# sum(x^2) < 10^26, sum(x) < 10^19, n < 10^12 — integer-valued doubles
# well past 100 TB star scale (the q248 control-chart algebra, applied
# at the dialect layer).
# ---------------------------------------------------------------------------


#: Columns the closed-form STDDEV rewrite is allowed to touch. The
#: DECIMAL(13,0) cast in the closed form truncates fractional values, so
#: the rewrite is ONLY exact for integer-valued arguments; every arg must
#: be declared here (worksheet `volume` is BIGINT in the bronze schema).
#: A new STDDEV over an undeclared column raises at compile time instead
#: of silently rounding — extend the set only after checking the column
#: is integer-valued end-to-end.
STDDEV_INTEGER_ARGS = frozenset({"volume"})


def rewrite_stddev_exact(sql: str) -> str:
    """Replace every ``STDDEV(<arg>)`` aggregate call with the exact
    closed form above. The replacement references ``<arg>`` five times —
    all aggregates over the same group, so semantics are unchanged
    **provided <arg> is integer-valued**: the closed form accumulates in
    DECIMAL(13,0)/DECIMAL(18,0), which would silently round fractional
    inputs. That precondition is enforced, not assumed — any STDDEV arg
    outside ``STDDEV_INTEGER_ARGS`` raises ValueError so a fractional
    column can never pass the value oracle while diverging from true
    stddev_samp. NULL handling matches native STDDEV (COUNT/SUM ignore
    NULLs; n<2 yields NULL via 0/0-free NULL propagation: n*(n-1)=0 makes
    the division +-inf/NaN — guarded with a NULLIF on the denominator).
    Single-quoted string literals are skipped by the token scan (same
    rule as ``_match_paren``), so ``'... STDDEV (' ...'`` text survives."""
    out = []
    rest = sql
    while True:
        found = None
        upper = rest.upper()
        i = 0
        while i < len(upper):
            if upper[i] == "'":  # skip string literals ('' escape-aware)
                i = _skip_literal(upper, i)
                continue
            if upper.startswith("STDDEV", i) and (
                i == 0 or not (upper[i - 1].isalnum() or upper[i - 1] == "_")
            ):
                j = i + len("STDDEV")
                # STDDEV_SAMP spelling shares the definition; skip any
                # other suffix (STDDEV_POP stays native/unused).
                if upper.startswith("_SAMP", j):
                    j += len("_SAMP")
                elif upper[j : j + 1] == "_":
                    i += 1
                    continue
                while j < len(rest) and rest[j].isspace():
                    j += 1
                if j < len(rest) and rest[j] == "(":
                    found = (i, j)
                    break
            i += 1
        if found is None:
            out.append(rest)
            return "".join(out)
        i, j = found
        end = _match_paren(rest, j)
        arg = rest[j + 1 : end - 1].strip()
        if arg.lower() not in STDDEV_INTEGER_ARGS:
            raise ValueError(
                f"rewrite_stddev_exact: STDDEV argument {arg!r} is not in "
                "STDDEV_INTEGER_ARGS — the closed form is only exact for "
                "integer-valued columns (DECIMAL(13,0) accumulation); "
                "declare the column after verifying it is integer-valued, "
                "or leave this statement on native STDDEV"
            )
        n = f"CAST(COUNT({arg}) AS DECIMAL(12,0))"
        q = (
            f"CAST(SUM(CAST({arg} AS DECIMAL(13,0)) * "
            f"CAST({arg} AS DECIMAL(13,0))) AS DECIMAL(26,0))"
        )
        s = f"CAST(SUM(CAST({arg} AS DECIMAL(18,0))) AS DECIMAL(19,0))"
        closed = (
            f"SQRT(CAST({n} * {q} - {s} * {s} AS DOUBLE) / "
            f"CAST(NULLIF({n} * ({n} - 1), 0) AS DOUBLE))"
        )
        out.append(rest[:i])
        out.append(closed)
        rest = rest[end:]
