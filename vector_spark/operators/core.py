"""filter / sample / throttle / dedupe — the stateless & windowed transforms.

Deterministic-variant policy (SURVEY.md §7): Vector's ``sample`` counter
mode and ``dedupe`` LRU window are stream-order sensitive; Spark gives no
row order, so the rebuild pins the key/hash-based variants and documents
the delta.  All hash-gated behavior uses the single portable hash from
vector_spark.hashing so the DuckDB oracle can verify values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from vector_spark.hashing import portable_bucket


def filter_events(df: DataFrame, condition: Column) -> DataFrame:
    """``filter`` transform: drop events not matching the condition
    (reference src/transforms/filter.rs:87-94).  NULL predicate = no match."""
    return df.filter(condition.isNotNull() & condition)


def sample(
    df: DataFrame,
    rate: int,
    key_field: str | None = None,
    exclude: Column | None = None,
    annotate: bool = True,
    order_by: list[str] | None = None,
) -> DataFrame:
    """``sample`` transform (reference src/transforms/sample.rs:112-155).

    Key-bucket mode (``key_field``): keep rows whose
    ``hash(key) % rate == 0`` — whole key groups survive together
    (sample.rs:124-131).

    Counter mode (``order_by``): the reference keeps every ``rate``-th
    event in STREAM order (sample.rs:133-137) — undefined for a
    distributed batch until an order is fixed, so this rebuild requires an
    explicit total order (e.g. ``["ts", "doc_id"]``; the listed columns
    must be a unique key) and keeps rows whose 0-based rank under that
    order satisfies ``rank % rate == 0`` — exactly the reference's
    behavior replayed over the sorted stream.  The rank is
    `sharding.global_row_number` (range exchange + per-partition window,
    no single-reducer sort), computed only over the order columns.

    ``exclude`` rows bypass sampling and are always kept
    (sample.rs:117-122).  Survivors are annotated with ``sample_rate``
    (sample.rs:139-152).
    """
    if key_field is None and order_by is None:
        raise NotImplementedError(
            "counter-mode sampling needs an explicit total order in batch: "
            "pass order_by=[...] (unique key), or key_field for "
            "deterministic bucket sampling (sample.rs:124-131)"
        )
    if key_field is not None:
        keep = portable_bucket(key_field, rate) == 0
    else:
        from vector_spark.sharding import global_row_number

        ranked = global_row_number(df, [F.asc(c) for c in order_by])
        df = ranked
        keep = (F.col("rank") % rate == 0)
    if exclude is not None:
        keep = keep | (exclude.isNotNull() & exclude)
    out = df.filter(keep)
    if key_field is None:
        out = out.drop("rank")
    if annotate:
        out = out.withColumn("sample_rate", F.lit(str(rate)))
    return out


def throttle(
    df: DataFrame,
    threshold: int,
    window_secs: int,
    ts_col: str = "ts",
    key_field: str | None = None,
    exclude: Column | None = None,
    tiebreaker: str | list[str] | None = None,
) -> DataFrame:
    """``throttle`` transform, batch rendering (reference
    src/transforms/throttle.rs:26-190).

    Vector enforces ``threshold`` events per ``window_secs`` per key with a
    GCRA rate limiter; the event-time batch analogue keeps the first
    ``threshold`` rows per (key, tumbling window) in event-time order.
    Excess rows are dropped (throttle.rs:150-170); ``exclude`` rows bypass.

    ``tiebreaker`` names the column(s) that break equal-``ts`` ties; pass
    one whenever (key, window, ts) is not unique or the kept set is
    nondeterministic (and would flap hash-parity gates).  With
    ``tiebreaker=None`` rows are ordered by ``ts`` alone — deterministic
    only when ts is unique per (key, window).
    """
    win = (F.unix_timestamp(F.col(ts_col)) / window_secs).cast("bigint")
    parts = [win] + ([F.col(key_field)] if key_field else [])
    tie = [tiebreaker] if isinstance(tiebreaker, str) else (tiebreaker or [])
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tie]
    w = Window.partitionBy(*parts).orderBy(*order)
    ranked = df.withColumn("_rn", F.row_number().over(w))
    keep = F.col("_rn") <= threshold
    if exclude is not None:
        keep = keep | (exclude.isNotNull() & exclude)
    return ranked.filter(keep).drop("_rn")


def dedupe(
    df: DataFrame,
    match_fields: list[str] | None = None,
    ignore_fields: list[str] | None = None,
    order_by: str | None = None,
) -> DataFrame:
    """``dedupe`` transform (reference src/transforms/dedupe.rs:124-285).

    Vector drops an event whose selected-field tuple was seen in a
    5000-entry LRU (dedupe.rs:86-90); values compare as (type_id, bytes) so
    int 1 != string "1" (dedupe.rs:195-213).  The batch rendering keeps ONE
    row per key tuple over the whole input (a superset of the LRU window —
    documented delta, SURVEY.md §7):

    - ``order_by`` given  -> keep the event-time-first row
      (``row_number() == 1``), deterministic;
    - ``order_by`` None   -> ``dropDuplicates`` (any winner, cheapest plan:
      partial + final hash aggregate, no sort).

    Spark columns are statically typed, so the (type_id, bytes) key
    discipline is enforced by the schema itself; heterogeneous-typed fields
    must be kept as distinct columns, not stringified (dedupe fixture F2).
    """
    if match_fields and ignore_fields:
        raise ValueError("match_fields and ignore_fields are mutually exclusive")
    if ignore_fields:
        keys = [c for c in df.columns if c not in set(ignore_fields)]
    else:
        keys = match_fields or df.columns
    if order_by is None:
        return df.dropDuplicates(keys)
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(F.col(order_by).asc())
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
