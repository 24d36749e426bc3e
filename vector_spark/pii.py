"""PII redaction: named-filter redact + per-doc PII scrub/count.

Mirrors the reference's VRL ``redact`` semantics
(website/cue/reference/remap/functions/redact.cue): filters are raw
regexes or NAMED filter classes, matches are replaced with
``[REDACTED]``, and string elements inside arrays are redacted while
non-strings are skipped.  The reference ships one named class
(``us_social_security_number``); the extra classes here (email, ipv4,
credit_card, phone) are the standard LLM-training-data scrub set —
"more to come!" per the reference doc.

Every pattern is deliberately written in the common subset of Java
regex (Spark) and RE2 (DuckDB oracle): no backreferences, no lookaround
— so the oracle applies the literal same pattern.

Scale design: pure codegen string ops (``regexp_replace`` /
``regexp_extract_all``) — narrow, no shuffle, whole-stage codegen; the
array path uses a HOF ``transform`` (interpreted, parity surface only).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

REDACTOR = "[REDACTED]"

# Named filter classes.  Order matters for the scrubbed text when
# patterns could overlap; this order is applied identically in the SQL
# twin.  (These patterns cannot overlap on the same span: email requires
# '@', ipv4 has no hyphens, ssn/card group shapes are incompatible under
# the \b anchors.)
PII_FILTERS: dict[str, str] = {
    "us_social_security_number": r"\b\d{3}-\d{2}-\d{4}\b",
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "credit_card": r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b",
    "phone": r"\+\d{1,2}[- ]\d{3}[- ]\d{3}[- ]\d{4}",
}


def _resolve(filters: list[str]) -> list[str]:
    """Each filter is a named class or a raw regex (redact.cue's string
    forms; the object form collapses to its patterns)."""
    return [PII_FILTERS.get(f, f) for f in filters]


def redact(
    col: Column | str, filters: list[str], redactor: str = REDACTOR
) -> Column:
    """redact for string columns: named classes and/or raw regexes."""
    c = F.col(col) if isinstance(col, str) else col
    for p in _resolve(filters):
        c = F.regexp_replace(c, p, redactor)
    return c


def redact_array(
    col: Column | str, filters: list[str], redactor: str = REDACTOR
) -> Column:
    """redact for array<string>: per-element, preserving nulls (the
    reference recurses into arrays and skips non-strings — array typing
    is static in Spark, so the skip case is the null element)."""
    c = F.col(col) if isinstance(col, str) else col
    pats = _resolve(filters)

    def one(x: Column) -> Column:
        for p in pats:
            x = F.regexp_replace(x, p, redactor)
        return x

    return F.transform(c, one)


def hit_count(col: Column | str, filt: str) -> Column:
    """How many spans the (named or raw) filter matches — long."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(_resolve([filt])[0]), F.lit(0))).cast(
        "long"
    )


def pii_scrub(
    df: DataFrame,
    col: str = "text",
    filters: list[str] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, {filter}_hits..., scrubbed): per-doc match counts per filter
    class plus the fully redacted text.  Counts are measured on the
    ORIGINAL text; the scrub applies all filters in order."""
    filters = list(PII_FILTERS) if filters is None else filters
    return df.select(
        id_col,
        *[hit_count(col, f).alias(f"{_short(f)}_hits") for f in filters],
        redact(col, filters).alias("scrubbed"),
    )


def _short(name: str) -> str:
    return "ssn" if name == "us_social_security_number" else name


def sql_pii_scrub(
    corpus_sql: str,
    col: str = "text",
    filters: list[str] | None = None,
    id_col: str = "doc_id",
) -> str:
    """DuckDB oracle: literal same patterns; RE2 needs the explicit 'g'
    flag for global replacement (Spark replaces all matches natively)."""
    filters = list(PII_FILTERS) if filters is None else filters
    pats = _resolve(filters)
    hits = ", ".join(
        f"CAST(len(regexp_extract_all({col}, '{p}')) AS BIGINT) AS {_short(f)}_hits"
        for f, p in zip(filters, pats)
    )
    scrub = col
    for p in pats:
        scrub = f"regexp_replace({scrub}, '{p}', '{REDACTOR}', 'g')"
    return f"""
SELECT {id_col}, {hits}, {scrub} AS scrubbed
FROM {corpus_sql}
"""
