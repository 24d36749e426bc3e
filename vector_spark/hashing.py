"""Portable deterministic hashing.

Vector keys hash-based behavior (sample bucketing src/transforms/sample.rs:112-155,
dedupe cache keys src/transforms/dedupe.rs:239-270, enrichment index
src/enrichment_tables/file.rs:536) on seahash.  SURVEY.md §2.3 fixes the
rebuild to ONE consistent hash; we additionally need that hash to be
computable identically in Spark AND in the DuckDB oracle so hash-gated
queries are value-checkable.

``portable_hash64(col)`` = first 15 hex digits of md5 as a bigint (60 bits,
never overflows int64, identical text algorithm in both engines):

- Spark  : ``conv(substring(md5(x), 1, 15), 16, 10)`` cast to bigint
- DuckDB : ``('0x' || substr(md5(x), 1, 15))::bigint``

For pure-internal hot paths (no oracle involved) prefer ``F.xxhash64`` —
it is JVM-codegen'd and cheaper than md5.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_hash64(col: Column | str) -> Column:
    """60-bit deterministic hash of the string form of ``col`` (Spark side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("bigint")


def portable_hash64_sql(expr: str) -> str:
    """The DuckDB-side rendering of :func:`portable_hash64` for oracle SQL."""
    return f"('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 15))::BIGINT"


def portable_bucket(col: Column | str, rate: int) -> Column:
    """Hash-bucket id in [0, rate) — Vector's ``sample`` key bucketing
    (seahash(key) % rate, src/transforms/sample.rs:124-131) under the
    rebuild's pinned hash."""
    return F.pmod(portable_hash64(col), F.lit(rate))


def portable_bucket_sql(expr: str, rate: int) -> str:
    return f"(({portable_hash64_sql(expr)}) % {rate} + {rate}) % {rate}"
