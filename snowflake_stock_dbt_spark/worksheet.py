"""Worksheet runner: executes the reference's Snowflake SQL worksheets
VERBATIM against Spark.

The reference ships three SQL worksheets its users run top-to-bottom
(reference sql/01_create_tables.sql, sql/02_load_data.sql,
sql/03_analytics_queries.sql). This module is the engine's "worksheet
door": feed it those files unmodified and it executes every statement —
DDL becomes catalog state, COPY INTO becomes a declarative CSV scan +
append, MERGE becomes the engine's upsert operator, SELECT goes through
the Snowflake-dialect compiler (sqldialect.compile_snowflake_sql) into
``spark.sql``.

Statement handling (each cites the worksheet lines it exists for):

- ``USE DATABASE/SCHEMA`` (02:4-5) — namespace no-op; Spark temp views
  are flat, so three-part names are flattened to their object name.
- ``CREATE FILE FORMAT`` (02:8-13) — recorded as Spark CSV reader
  options (quote / header-skip / trim / empty-as-null).
- ``CREATE STAGE`` (02:16-17) — bound to a local landing directory the
  caller registers (Spark reads the landing path directly; SURVEY §2.1
  S6: PUT is n/a by design).
- ``CREATE TABLE`` (01:13-57) — an empty DataFrame with the
  Snowflake->Spark type mapping; DEFAULT expressions and UNIQUE
  constraints are recorded (defaults are applied by COPY INTO for
  columns the statement does not load).
- ``COPY INTO`` (02:23-60) — CSV scan with the named format's options,
  ``METADATA$FILENAME`` / ``METADATA$FILE_ROW_NUMBER`` / ``$N::TYPE``
  projection, FAILFAST for ON_ERROR = ABORT_STATEMENT, appended to the
  target table. One file = one Spark partition; the per-file row-number
  window shuffles by file name only, so at 100 TB parallelism equals
  file count and no global ordering is ever imposed.
- ``MERGE INTO`` (02:78-165) — parsed, validated to be the
  full-row-replace upsert the reference writes (every target column
  assigned identically in both branches), and compiled to
  operators.upsert.merge_upsert on the ON-clause equality keys. The
  USING subquery goes through the dialect door, so its QUALIFY /
  TRY_TO_* forms work unmodified.
- ``SELECT`` (02:66-73, 02:170-182, 03:6-148) — dialect-compiled and
  executed; the DataFrame is returned to the caller.

Determinism: ``CURRENT_TIMESTAMP()`` is pinned to a caller-supplied
clock literal and ``UUID_STRING()`` maps to ``uuid()``, so reruns and
cross-engine oracle checks see stable values (the clock column is the
only nondeterministic output in the reference's pipeline).

Restricted surface, loud failures: the parsers cover the statement
shapes the reference worksheets use (plus the obvious generalizations)
and raise ``WorksheetError`` — never guess — on anything else.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators.upsert import merge_upsert
from .sqldialect import _match_paren, _scan_top_level, _split_top_args, compile_snowflake_sql


class WorksheetError(ValueError):
    """A worksheet statement outside the supported (documented) surface."""


# ---------------------------------------------------------------------------
# Text preprocessing: comments, statement split, name flattening, clock pin.
# ---------------------------------------------------------------------------


def strip_comments(text: str) -> str:
    """Remove ``--`` line comments and ``/* */`` block comments outside
    string literals / quoted identifiers."""
    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c == "'":
            j = i + 1
            while j < n and (text[j] != "'" or (j + 1 < n and text[j + 1] == "'")):
                j += 2 if text[j] == "'" else 1
            out.append(text[i : j + 1])
            i = j + 1
        elif c == '"':
            j = i + 1
            while j < n and text[j] != '"':
                j += 1
            out.append(text[i : j + 1])
            i = j + 1
        elif c == "-" and text[i : i + 2] == "--":
            while i < n and text[i] != "\n":
                i += 1
        elif c == "/" and text[i : i + 2] == "/*":
            i += 2
            while i < n and text[i : i + 2] != "*/":
                i += 1
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def split_statements(text: str) -> list[str]:
    """Split comment-stripped worksheet text on ``;`` outside quotes."""
    stmts: list[str] = []
    cur: list[str] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c == "'":
            j = i + 1
            while j < n and (text[j] != "'" or (j + 1 < n and text[j + 1] == "'")):
                j += 2 if text[j] == "'" else 1
            cur.append(text[i : j + 1])
            i = j + 1
        elif c == '"':
            j = i + 1
            while j < n and text[j] != '"':
                j += 1
            cur.append(text[i : j + 1])
            i = j + 1
        elif c == ";":
            stmts.append("".join(cur).strip())
            cur = []
            i += 1
        else:
            cur.append(c)
            i += 1
    last = "".join(cur).strip()
    if last:
        stmts.append(last)
    return [s for s in stmts if s]


def _map_unquoted(sql: str, fn) -> str:
    """Apply ``fn`` to every maximal unquoted segment of ``sql``."""
    out: list[str] = []
    plain: list[str] = []
    i, n = 0, len(sql)

    def flush() -> None:
        if plain:
            out.append(fn("".join(plain)))
            plain.clear()

    while i < n:
        c = sql[i]
        if c == "'":
            j = i + 1
            while j < n and (sql[j] != "'" or (j + 1 < n and sql[j + 1] == "'")):
                j += 2 if sql[j] == "'" else 1
            flush()
            out.append(sql[i : j + 1])
            i = j + 1
        elif c == '"':
            j = i + 1
            while j < n and sql[j] != '"':
                j += 1
            flush()
            out.append(sql[i : j + 1])
            i = j + 1
        else:
            plain.append(c)
            i += 1
    flush()
    return "".join(out)


_QUALIFIED = re.compile(
    r"(@?)\b([A-Za-z_][\w$]*)\.([A-Za-z_][\w$]*)\.([A-Za-z_][\w$]*)"
)


def flatten_names(sql: str) -> str:
    """``DB.SCHEMA.OBJECT`` -> ``object`` (Spark temp views are flat);
    stage references keep their ``@``. Two-part column refs (``f.col``)
    are untouched."""
    return _map_unquoted(
        sql, lambda s: _QUALIFIED.sub(lambda m: m.group(1) + m.group(4).lower(), s)
    )


_CURRENT_TS = re.compile(r"\bCURRENT_TIMESTAMP\s*\(\s*\)|\bCURRENT_TIMESTAMP\b", re.I)
_UUID_STRING = re.compile(r"\bUUID_STRING\s*\(\s*\)", re.I)


def pin_clock(sql: str, clock: str | None) -> str:
    """Pin ``CURRENT_TIMESTAMP()`` to a literal (when a clock is given)
    and map ``UUID_STRING()`` to Spark's ``uuid()``."""

    def repl(s: str) -> str:
        if clock is not None:
            s = _CURRENT_TS.sub(f"TIMESTAMP '{clock}'", s)
        return _UUID_STRING.sub("uuid()", s)

    return _map_unquoted(sql, repl)


# ---------------------------------------------------------------------------
# Snowflake -> Spark type mapping (reference sql/01_create_tables.sql types).
# ---------------------------------------------------------------------------

_TYPE_RE = re.compile(r"^([A-Za-z_]+)\s*(?:\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\))?$")

_SIMPLE_TYPES = {
    "STRING": "string",
    "TEXT": "string",
    "VARCHAR": "string",
    "CHAR": "string",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
    "TIMESTAMP_TZ": "timestamp",
    "TIMESTAMP_LTZ": "timestamp",
    "TIMESTAMP_NTZ": "timestamp",
    "DATETIME": "timestamp",
    "FLOAT": "double",
    "FLOAT8": "double",
    "DOUBLE": "double",
    "REAL": "double",
    "BOOLEAN": "boolean",
    "INT": "bigint",
    "INTEGER": "bigint",
    "BIGINT": "bigint",
    "SMALLINT": "bigint",
    "TINYINT": "bigint",
    "VARIANT": "string",
}


def map_type(sf_type: str) -> str:
    """One Snowflake column type -> Spark DDL type string."""
    m = _TYPE_RE.match(sf_type.strip())
    if not m:
        raise WorksheetError(f"unsupported column type: {sf_type!r}")
    name, p, s = m.group(1).upper(), m.group(2), m.group(3)
    if name in ("NUMBER", "DECIMAL", "NUMERIC"):
        return f"decimal({p or 38},{s or 0})"
    if name in _SIMPLE_TYPES:
        return _SIMPLE_TYPES[name]
    raise WorksheetError(f"unsupported column type: {sf_type!r}")


# ---------------------------------------------------------------------------
# Runner.
# ---------------------------------------------------------------------------


@dataclass
class TableDef:
    """Catalog entry: current contents + declared defaults/constraints."""

    df: DataFrame
    defaults: dict[str, str] = field(default_factory=dict)  # col -> SQL expr
    unique: list[list[str]] = field(default_factory=list)


@dataclass
class StatementResult:
    kind: str  # use|file_format|stage|table|copy|merge|select|namespace
    statement: str
    df: DataFrame | None = None


class WorksheetRunner:
    """Executes Snowflake worksheet scripts statement by statement.

    ``clock`` pins CURRENT_TIMESTAMP to a literal for deterministic
    reruns; pass None to keep Spark's real current_timestamp().
    """

    def __init__(self, spark: SparkSession, clock: str | None = None):
        self.spark = spark
        self.clock = clock
        self.file_formats: dict[str, dict[str, str]] = {}
        self.stages: dict[str, dict[str, str | None]] = {}
        self.tables: dict[str, TableDef] = {}

    # -- public API --------------------------------------------------------

    def register_stage(self, name: str, path: str) -> None:
        """Bind a stage name (flattened, lower-case) to a landing dir."""
        self.stages[name.lower()] = {"path": path, "file_format": None}

    def register_table(self, name: str, df: DataFrame) -> None:
        """Expose an existing DataFrame to worksheet SQL under ``name``
        (how the dbt-model outputs dim_entity / fct_observations are made
        visible to the analytics worksheet)."""
        self.tables[name.lower()] = TableDef(df)

    def table(self, name: str) -> DataFrame:
        """Current contents of a worksheet table."""
        return self.tables[name.lower()].df

    def run_script(self, text: str) -> list[StatementResult]:
        prepared = pin_clock(flatten_names(strip_comments(text)), self.clock)
        return [self._dispatch(s) for s in split_statements(prepared)]

    def sql(self, statement: str) -> DataFrame:
        """Run one ad-hoc dialect statement against the runner's tables."""
        prepared = pin_clock(flatten_names(strip_comments(statement)), self.clock)
        return self._select(prepared)

    # -- dispatch ----------------------------------------------------------

    def _dispatch(self, stmt: str) -> StatementResult:
        head = stmt.split(None, 3)
        kw = " ".join(w.upper() for w in head[:2]) if len(head) >= 2 else stmt.upper()
        first = head[0].upper() if head else ""
        if first == "USE":
            return StatementResult("use", stmt)
        if first == "CREATE":
            target = re.sub(
                r"^CREATE\s+(OR\s+REPLACE\s+)?|\bIF\s+NOT\s+EXISTS\b",
                " ",
                stmt,
                flags=re.I,
            ).split(None, 2)
            obj = target[0].upper()
            if obj in ("DATABASE", "SCHEMA"):
                return StatementResult("namespace", stmt)
            if obj == "FILE" and target[1].upper() == "FORMAT":
                self._create_file_format(stmt)
                return StatementResult("file_format", stmt)
            if obj == "STAGE":
                self._create_stage(stmt)
                return StatementResult("stage", stmt)
            if obj == "TABLE":
                self._create_table(stmt)
                return StatementResult("table", stmt)
            raise WorksheetError(f"unsupported CREATE object: {kw}")
        if first == "COPY":
            return StatementResult("copy", stmt, self._copy_into(stmt))
        if first == "MERGE":
            return StatementResult("merge", stmt, self._merge(stmt))
        if first in ("SELECT", "WITH"):
            return StatementResult("select", stmt, self._select(stmt))
        raise WorksheetError(f"unsupported statement: {stmt[:80]!r}")

    # -- DDL ---------------------------------------------------------------

    def _create_file_format(self, stmt: str) -> None:
        m = re.match(
            r"CREATE\s+(?:OR\s+REPLACE\s+)?FILE\s+FORMAT\s+([A-Za-z_][\w$]*)\s+(.*)$",
            stmt,
            re.I | re.S,
        )
        if not m:
            raise WorksheetError(f"cannot parse FILE FORMAT: {stmt[:80]!r}")
        name, body = m.group(1).lower(), m.group(2)
        opts: dict[str, str] = {}
        for km in re.finditer(r"([A-Za-z_]+)\s*=\s*('(?:[^']|'')*'|\S+)", body):
            opts[km.group(1).upper()] = km.group(2).strip("'")
        if opts.get("TYPE", "CSV").upper() != "CSV":
            raise WorksheetError("only TYPE = CSV file formats are supported")
        self.file_formats[name] = opts

    def _create_stage(self, stmt: str) -> None:
        m = re.match(
            r"CREATE\s+(?:OR\s+REPLACE\s+)?STAGE\s+([A-Za-z_][\w$]*)\s*(.*)$",
            stmt,
            re.I | re.S,
        )
        if not m:
            raise WorksheetError(f"cannot parse STAGE: {stmt[:80]!r}")
        name, body = m.group(1).lower(), m.group(2)
        if name not in self.stages:
            raise WorksheetError(
                f"stage {name!r} has no landing path; call "
                f"register_stage({name!r}, <dir>) before running the script"
            )
        fm = re.search(r"FILE_FORMAT\s*=\s*([A-Za-z_][\w$]*)", body, re.I)
        if fm:
            self.stages[name]["file_format"] = fm.group(1).lower()

    def _create_table(self, stmt: str) -> None:
        m = re.match(
            r"CREATE\s+(?:OR\s+REPLACE\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?"
            r"([A-Za-z_][\w$]*)\s*\(",
            stmt,
            re.I,
        )
        if not m:
            raise WorksheetError(f"cannot parse CREATE TABLE: {stmt[:80]!r}")
        name = m.group(1).lower()
        open_idx = stmt.index("(", m.start(1))
        body = stmt[open_idx + 1 : _match_paren(stmt, open_idx) - 1]
        fields: list[str] = []
        defaults: dict[str, str] = {}
        unique: list[list[str]] = []
        for item in _split_top_args(body):
            up = item.upper()
            if up.startswith("CONSTRAINT") or up.startswith("UNIQUE") or up.startswith(
                "PRIMARY KEY"
            ):
                um = re.search(r"(?:UNIQUE|PRIMARY\s+KEY)\s*\(([^)]*)\)", item, re.I)
                if um:
                    unique.append(
                        [c.strip().lower() for c in um.group(1).split(",")]
                    )
                continue
            cm = re.match(
                r"([A-Za-z_][\w$]*)\s+([A-Za-z_]+(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)"
                r"(.*)$",
                item.strip(),
                re.S,
            )
            if not cm:
                raise WorksheetError(f"cannot parse column def: {item!r}")
            col, sf_type, rest = cm.group(1).lower(), cm.group(2), cm.group(3)
            dm = re.search(
                r"\bDEFAULT\b\s*(.*?)(?:\bNOT\s+NULL\b|$)", rest, re.I | re.S
            )
            if dm:
                defaults[col] = dm.group(1).strip()
            fields.append(f"{col} {map_type(sf_type)}")
        empty = self.spark.createDataFrame([], ", ".join(fields))
        self.tables[name] = TableDef(empty, defaults, unique)

    # -- COPY INTO ---------------------------------------------------------

    def _copy_into(self, stmt: str) -> DataFrame:
        m = re.match(r"COPY\s+INTO\s+([A-Za-z_][\w$]*)\s*", stmt, re.I)
        if not m:
            raise WorksheetError(f"cannot parse COPY INTO: {stmt[:80]!r}")
        table = m.group(1).lower()
        if table not in self.tables:
            raise WorksheetError(f"COPY INTO unknown table {table!r}")
        rest = stmt[m.end() :].lstrip()

        target_cols: list[str] | None = None
        if rest.startswith("("):
            end = _match_paren(rest, 0)
            target_cols = [
                c.strip().lower() for c in _split_top_args(rest[1:end - 1])
            ]
            rest = rest[end:].lstrip()

        fm = re.match(r"FROM\s*", rest, re.I)
        if not fm:
            raise WorksheetError("COPY INTO: expected FROM")
        rest = rest[fm.end() :].lstrip()

        if rest.startswith("("):
            end = _match_paren(rest, 0)
            inner = rest[1:end - 1].strip()
            tail = rest[end:]
            sm = re.match(r"SELECT\s+(.*?)\bFROM\s+@([A-Za-z_][\w$]*)", inner, re.I | re.S)
            if not sm:
                raise WorksheetError("COPY INTO: inner SELECT must read from @stage")
            exprs = _split_top_args(sm.group(1))
            stage = sm.group(2).lower()
        elif rest.startswith("@"):
            sm2 = re.match(r"@([A-Za-z_][\w$]*)", rest)
            stage = sm2.group(1).lower()
            tail = rest[sm2.end() :]
            exprs = None
        else:
            raise WorksheetError("COPY INTO: expected @stage or (SELECT ...)")

        fmt_name = None
        ff = re.search(
            r"FILE_FORMAT\s*=\s*\(\s*FORMAT_NAME\s*=\s*([A-Za-z_][\w$]*)\s*\)",
            tail,
            re.I,
        )
        if ff:
            fmt_name = ff.group(1).lower()
        on_error = "ABORT_STATEMENT"
        oe = re.search(r"ON_ERROR\s*=\s*([A-Za-z_]+)", tail, re.I)
        if oe:
            on_error = oe.group(1).upper()

        if stage not in self.stages:
            raise WorksheetError(f"unknown stage @{stage}")
        path = self.stages[stage]["path"]
        fmt = self.file_formats.get(
            fmt_name or self.stages[stage]["file_format"] or "", {}
        )

        reader = self.spark.read
        reader = reader.option("header", fmt.get("SKIP_HEADER", "0") == "1")
        reader = reader.option("quote", fmt.get("FIELD_OPTIONALLY_ENCLOSED_BY", '"'))
        if fmt.get("TRIM_SPACE", "FALSE").upper() == "TRUE":
            reader = reader.option("ignoreLeadingWhiteSpace", True)
            reader = reader.option("ignoreTrailingWhiteSpace", True)
        if fmt.get("EMPTY_FIELD_AS_NULL", "TRUE").upper() == "TRUE":
            reader = reader.option("nullValue", "")
        if "FIELD_DELIMITER" in fmt:
            reader = reader.option("sep", fmt["FIELD_DELIMITER"])
        reader = reader.option(
            "mode", "FAILFAST" if on_error == "ABORT_STATEMENT" else "PERMISSIVE"
        )
        raw = reader.csv(str(path))

        tdef = self.tables[table]
        tcols = target_cols or [f.name for f in tdef.df.schema.fields]
        if exprs is None:
            exprs = [f"${i + 1}" for i in range(len(tcols))]
        if len(exprs) != len(tcols):
            raise WorksheetError(
                f"COPY INTO: {len(tcols)} target columns vs {len(exprs)} expressions"
            )

        # One window per source file: matches METADATA$FILE_ROW_NUMBER
        # (1-based per file) and never imposes a global sort.
        w = Window.partitionBy(F.input_file_name()).orderBy(
            F.monotonically_increasing_id()
        )
        cols = []
        for tc, ex in zip(tcols, exprs):
            body, _, cast_t = ex.partition("::")
            body = body.strip()
            if body.upper() == "METADATA$FILENAME":
                c = F.input_file_name()
            elif body.upper() == "METADATA$FILE_ROW_NUMBER":
                c = F.row_number().over(w).cast("long")
            elif re.fullmatch(r"\$\d+", body):
                idx = int(body[1:]) - 1
                if idx >= len(raw.columns):
                    raise WorksheetError(
                        f"COPY INTO: ${idx + 1} but file has {len(raw.columns)} columns"
                    )
                c = F.col(raw.columns[idx])
            else:
                raise WorksheetError(f"COPY INTO: unsupported expression {ex!r}")
            if cast_t:
                c = c.cast(map_type(cast_t))
            cols.append(c.alias(tc))
        loaded = raw.select(*cols)

        # Fill unloaded target columns from DDL defaults (clock-pinned), NULL
        # otherwise, and align every column to the declared type.
        full = []
        for fdef in tdef.df.schema.fields:
            if fdef.name in loaded.columns:
                full.append(F.col(fdef.name).cast(fdef.dataType).alias(fdef.name))
            elif fdef.name in tdef.defaults:
                full.append(
                    F.expr(tdef.defaults[fdef.name]).cast(fdef.dataType).alias(fdef.name)
                )
            else:
                full.append(F.lit(None).cast(fdef.dataType).alias(fdef.name))
        appended = loaded.select(*full)
        tdef.df = tdef.df.unionByName(appended)
        return appended.agg(F.count("*").alias("rows_loaded"))

    # -- MERGE -------------------------------------------------------------

    def _merge(self, stmt: str) -> DataFrame:
        m = re.match(
            r"MERGE\s+INTO\s+([A-Za-z_][\w$]*)\s+(?:AS\s+)?([A-Za-z_][\w$]*)\s+"
            r"USING\s*\(",
            stmt,
            re.I | re.S,
        )
        if not m:
            raise WorksheetError(
                "MERGE: expected MERGE INTO <table> [AS] <alias> USING (<subquery>)"
            )
        table, t_alias = m.group(1).lower(), m.group(2)
        open_idx = stmt.index("(", m.end() - 1)
        end = _match_paren(stmt, open_idx)
        subquery = stmt[open_idx + 1 : end - 1].strip()
        rest = stmt[end:].lstrip()

        am = re.match(r"(?:AS\s+)?([A-Za-z_][\w$]*)\s+ON\s+", rest, re.I | re.S)
        if not am:
            raise WorksheetError("MERGE: expected source alias and ON clause")
        s_alias = am.group(1)
        rest = rest[am.end() :]

        whens = _scan_top_level(rest, "WHEN")
        if not whens:
            raise WorksheetError("MERGE: expected WHEN clauses")
        cond = rest[: whens[0]].strip()
        clauses = [
            rest[a:b].strip() for a, b in zip(whens, whens[1:] + [len(rest)])
        ]

        keys = self._merge_keys(cond, t_alias, s_alias)
        update_map: dict[str, str] | None = None
        insert_map: dict[str, str] | None = None
        for cl in clauses:
            um = re.match(
                r"WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+(.*)$", cl, re.I | re.S
            )
            im = re.match(
                r"WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s*\(", cl, re.I | re.S
            )
            if um:
                update_map = self._parse_assignments(um.group(1), t_alias, s_alias)
            elif im:
                o = cl.index("(", im.end() - 1)
                e = _match_paren(cl, o)
                ins_cols = [
                    self._strip_alias(c, t_alias).lower()
                    for c in _split_top_args(cl[o + 1 : e - 1])
                ]
                vm = re.match(r"\s*VALUES\s*\(", cl[e:], re.I | re.S)
                if not vm:
                    raise WorksheetError("MERGE: INSERT without VALUES")
                vo = cl.index("(", e + vm.end() - 1)
                ve = _match_paren(cl, vo)
                vals = _split_top_args(cl[vo + 1 : ve - 1])
                if len(vals) != len(ins_cols):
                    raise WorksheetError("MERGE: INSERT column/value count mismatch")
                insert_map = {
                    c: self._canon_source_expr(v, s_alias)
                    for c, v in zip(ins_cols, vals)
                }
            else:
                raise WorksheetError(f"MERGE: unsupported WHEN clause: {cl[:60]!r}")
        if update_map is None or insert_map is None:
            raise WorksheetError(
                "MERGE: both WHEN MATCHED UPDATE and WHEN NOT MATCHED INSERT required"
            )

        if table not in self.tables:
            raise WorksheetError(f"MERGE into unknown table {table!r}")
        tdef = self.tables[table]
        target_cols = [f.name for f in tdef.df.schema.fields]

        # Full-row-replace check: every target column must be assigned the
        # SAME source expression in both branches; anything else is not an
        # upsert and the runner refuses rather than approximating.
        assigns: dict[str, str] = {}
        for c in target_cols:
            u, i = update_map.get(c), insert_map.get(c)
            if u is None and c in keys and i is not None:
                # The match key is legitimately absent from UPDATE SET (on a
                # matched row tgt.key == src.key already); the INSERT branch
                # supplies its source expression.
                u = i
            if u is None or i is None or _norm_ws(u) != _norm_ws(i):
                raise WorksheetError(
                    f"MERGE: column {c!r} is not identically assigned in both "
                    f"branches (update={u!r}, insert={i!r}); only full-row-"
                    "replace MERGE (the reference's shape) is supported"
                )
            assigns[c] = u

        src = self._select(subquery)
        sel = []
        for fdef in tdef.df.schema.fields:
            expr = assigns[fdef.name]
            sel.append(F.expr(expr).cast(fdef.dataType).alias(fdef.name))
        source = src.select(*sel)

        target = tdef.df
        tdef.df = merge_upsert(target, source, keys)

        src_keys = source.select(*keys).distinct()
        tgt_keys = target.select(*keys).distinct().withColumn("_m", F.lit(1))
        return src_keys.join(tgt_keys, keys, "left").agg(
            F.sum(F.when(F.col("_m").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("rows_updated"),
            F.sum(F.when(F.col("_m").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("rows_inserted"),
        )

    def _merge_keys(self, cond: str, t_alias: str, s_alias: str) -> list[str]:
        keys = []
        for part in re.split(r"\bAND\b", cond, flags=re.I):
            em = re.match(
                r"\s*([A-Za-z_][\w$]*)\.([\w$]+)\s*=\s*([A-Za-z_][\w$]*)\.([\w$]+)\s*$",
                part,
            )
            if not em:
                raise WorksheetError(f"MERGE: unsupported ON term {part!r}")
            a1, c1, a2, c2 = em.groups()
            pair = {a1.lower(): c1.lower(), a2.lower(): c2.lower()}
            if set(pair) != {t_alias.lower(), s_alias.lower()} or c1.lower() != c2.lower():
                raise WorksheetError(
                    f"MERGE: ON must equate target and source on the same column "
                    f"name, got {part!r}"
                )
            keys.append(c1.lower())
        return keys

    def _parse_assignments(
        self, text: str, t_alias: str, s_alias: str
    ) -> dict[str, str]:
        out: dict[str, str] = {}
        for item in _split_top_args(text):
            lhs, _, rhs = item.partition("=")
            col = self._strip_alias(lhs.strip(), t_alias).lower()
            out[col] = self._canon_source_expr(rhs.strip(), s_alias)
        return out

    @staticmethod
    def _strip_alias(ident: str, alias: str) -> str:
        ident = ident.strip()
        prefix = alias + "."
        if ident.lower().startswith(prefix.lower()):
            return ident[len(prefix) :]
        return ident

    @staticmethod
    def _canon_source_expr(expr: str, s_alias: str) -> str:
        """Rewrite ``src.col`` refs to bare ``col`` (the expr later runs
        against the source frame directly)."""
        return re.sub(
            rf"\b{re.escape(s_alias)}\.([\w$]+)", r"\1", expr.strip(), flags=re.I
        )

    # -- SELECT ------------------------------------------------------------

    def _select(self, stmt: str) -> DataFrame:
        for name, tdef in self.tables.items():
            tdef.df.createOrReplaceTempView(name)
        return self.spark.sql(compile_snowflake_sql(stmt))


def _norm_ws(s: str) -> str:
    return re.sub(r"\s+", " ", s.strip()).lower()
