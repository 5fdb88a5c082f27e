"""[EXT] Text-analysis column expressions for LLM-data pipelines.

The reference has no text operators (SURVEY.md §2.8); these derive from the
build mandate (BASELINE.json north_star): token counting, shingling,
normalization/fingerprinting, quality scoring, language-ID heuristics, and a
deterministic cross-engine 60-bit hash used by MinHash/SimHash.

Everything is built from JVM-side ``pyspark.sql.functions`` (split, regexp,
higher-order array functions, md5/sha2) — no Python UDFs — so the hot path
stays inside whole-stage codegen and scales linearly with input bytes.

Cross-engine hash: ``hash60(x) = int(md5(x)[:15], 16)`` (60 bits). md5 hex
is identical everywhere; Spark parses it with conv(), DuckDB with
('0x' || substr)::BIGINT. 60 bits keeps it inside a signed 64-bit long.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Stopword markers per language for the heuristic language-ID. Short lists
#: on purpose: the operator contract is "deterministic argmax over marker
#: hits", not linguistic accuracy (plug a real model in via pandas_udf).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "es": ["el", "la", "de", "y", "que", "en", "un"],
    "fr": ["le", "la", "et", "les", "des", "un", "une"],
    "de": ["der", "die", "und", "das", "ein", "nicht"],
    "zh": ["的", "是", "了", "在", "我", "有"],
}

#: English stopwords used by the quality score.
QUALITY_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "for", "on", "with"]


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (array<string>)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: Column | str) -> Column:
    """Whitespace token count; 0 for empty/blank text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.trim(c) == "", F.lit(0)).otherwise(F.size(tokens(c))).cast("long")


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token count: runs of letters, digits, or single
    punctuation — a cheap proxy for BPE token budgeting."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")).cast("long")


def shingles_from_tokens(tok_col: Column | str, k: int = 3) -> Column:
    """Distinct k-word shingles from a PRE-MATERIALIZED token-array column.

    The token array must be its own projected column (not an inlined
    ``split(...)`` expression): higher-order-function lambdas defeat
    common-subexpression elimination, so an inlined split would be
    re-evaluated for every ``element_at`` — k copies per shingle position,
    an O(n·k) re-tokenize per row that also bloats the generated code
    (~3× slower end-to-end, measured on the documents corpus).
    """
    t = F.col(tok_col) if isinstance(tok_col, str) else tok_col
    n = F.size(t)
    idx = F.sequence(F.lit(1), n - (k - 1))
    joined = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(t, i + j) for j in range(k)])
    )
    return F.when(n >= k, F.array_distinct(joined)).otherwise(
        F.array().cast("array<string>")
    )


def word_shingles(col: Column | str, k: int = 3) -> Column:
    """Distinct k-word shingles (array<string>); empty array when < k tokens.

    Word-level (not character-level) shingling: character n-grams collide
    catastrophically on natural text, exploding the candidate-pair join.

    Prefer tokenizing into a real column and calling
    :func:`shingles_from_tokens` in hot paths — see that docstring.
    """
    return shingles_from_tokens(tokens(col), k)


def normalized_text(col: Column | str) -> Column:
    """lower → non-alphanumeric runs to single space → trim. The canonical
    form behind fingerprints and near-dup comparison."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"[^a-z0-9]+", " "))


def fingerprint(col: Column | str) -> Column:
    """64-hex-char document fingerprint: sha256 of the normalized text."""
    return F.sha2(normalized_text(col), 256)


def hash60(col: Column | str) -> Column:
    """Deterministic cross-engine 60-bit hash (md5 15-hex-char prefix)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def hash60_sql(expr: str) -> str:
    """DuckDB twin of :func:`hash60`."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def punct_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(r"[^\w\s]")).cast("long")


def stopword_count(col: Column | str, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or QUALITY_STOPWORDS
    return F.size(F.filter(tokens(col), lambda t: t.isin(*sw))).cast("long")


def quality_score(col: Column | str) -> Column:
    """Heuristic document quality in [0,1]: blend of length saturation,
    stopword presence, and (low) punctuation density — the standard cheap
    pre-filter in LLM data curation. Per-row double arithmetic only, so the
    score is deterministic on every engine."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c).cast("double")
    n_tok = token_count(c).cast("double")
    len_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    stop_ratio = F.when(
        n_tok > 0, stopword_count(c).cast("double") / n_tok
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        n_chars > 0, punct_count(c).cast("double") / n_chars
    ).otherwise(F.lit(0.0))
    return (
        F.lit(0.4) * len_score
        + F.lit(0.4) * F.least(stop_ratio * F.lit(4.0), F.lit(1.0))
        + F.lit(0.2) * (F.lit(1.0) - F.least(punct_ratio * F.lit(5.0), F.lit(1.0)))
    )


def lang_marker_hits(col: Column | str, lang: str) -> Column:
    """Occurrences of ``lang``'s marker tokens in the text."""
    return F.size(
        F.filter(tokens(col), lambda t: t.isin(*LANG_MARKERS[lang]))
    ).cast("long")


def lang_id(col: Column | str) -> Column:
    """Argmax language over marker hits; ties break by language code order;
    no hits at all → 'und' (undetermined)."""
    hits = {lang: lang_marker_hits(col, lang) for lang in sorted(LANG_MARKERS)}
    best = F.greatest(*hits.values())
    out = F.lit("und")
    # Build the CASE chain in reverse-alphabetical order so earlier languages
    # win ties (first WHEN that matches the max).
    for lang in sorted(hits, reverse=True):
        out = F.when((hits[lang] > 0) & (hits[lang] == best), F.lit(lang)).otherwise(
            out
        )
    return out


#: PII detector regexes, deliberately restricted to the Java∩RE2 subset
#: (no lookaround/backrefs) so the Spark expressions and the DuckDB oracle
#: match the same spans. Keys are the scrub-report category names.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}


def pii_count(col: Column | str, kind: str) -> Column:
    """Occurrences of one PII category (long)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(PII_PATTERNS[kind])).cast("long")


def redact_pii(col: Column | str, replacement: str = "[PII]") -> Column:
    """All PII categories replaced with ``replacement`` — one
    regexp_replace per category, chained (JVM-side, codegen-friendly)."""
    c = F.col(col) if isinstance(col, str) else col
    for pat in PII_PATTERNS.values():
        c = F.regexp_replace(c, pat, replacement)
    return c
