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


def portable_hash128(col: Column | str) -> tuple[Column, Column]:
    """120-bit deterministic hash as TWO bigints (md5 hex chars 1-15 and
    17-31; char 16 skipped to keep both halves under 60 bits / int64-safe).

    Use where a 60-bit key risks birthday collisions: exact dedup at
    10^12 docs expects ~4x10^5 silent collisions on 60 bits but < 1e-6 on
    120 bits — hash-only equality becomes safe without a text-confirm join.
    """
    c = F.col(col) if isinstance(col, str) else col
    h = F.md5(c.cast("string"))
    return (
        F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint"),
        F.conv(F.substring(h, 17, 15), 16, 10).cast("bigint"),
    )


def portable_hash128_sql(expr: str) -> tuple[str, str]:
    """DuckDB rendering of :func:`portable_hash128` (same two halves)."""
    h = f"md5(CAST({expr} AS VARCHAR))"
    return (
        f"('0x' || substr({h}, 1, 15))::BIGINT",
        f"('0x' || substr({h}, 17, 15))::BIGINT",
    )


def portable_bucket(col: Column | str, rate: int) -> Column:
    """Hash-bucket id in [0, rate) — Vector's ``sample`` key bucketing
    (seahash(key) % rate, src/transforms/sample.rs:124-131) under the
    rebuild's pinned hash."""
    return F.pmod(portable_hash64(col), F.lit(rate))


def portable_bucket_sql(expr: str, rate: int) -> str:
    return f"(({portable_hash64_sql(expr)}) % {rate} + {rate}) % {rate}"


def portable_bucket_py(value, rate: int) -> int:
    """Driver-side Python twin of :func:`portable_bucket` (same md5-prefix
    hash over the string form of the value).  Used by metadata-only scan
    planning to fold a point-lookup literal into its partition bucket —
    must stay bit-identical to the Spark and DuckDB renderings above."""
    import hashlib

    h = int(hashlib.md5(str(value).encode("utf-8")).hexdigest()[:15], 16)
    return h % rate
