"""Skew handling for hot keys (the corpus's Zipf-skewed ``source`` column).

Vector is single-process and has no skew concept; at 10^12 rows a
groupBy/join on ``source`` puts 55% of all rows in one reducer.  Two
idiomatic Spark remedies, both config-driven (north_rule: "salted-key
handling for source-skewed partitions, AQE-assisted shuffle tuning"):

1. AQE skew-join splitting (on by default in session.get_spark) — handles
   skewed JOIN partitions at runtime, zero code.
2. Two-phase salted aggregation (this module) — for skewed GROUP BY:
   aggregate on (key, salt) first (fans the hot key over N reducers), then
   re-aggregate on key.  Associative aggs only (count/sum/min/max) — which
   is exactly the per-sink aggregate shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# second-phase combiner per supported first-phase aggregate
_COMBINERS = {
    "count": F.sum,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def with_salt(df: DataFrame, buckets: int, source_col: str, col_name: str = "_salt") -> DataFrame:
    """Add a uniform salt in [0, buckets) derived from ``source_col``.

    The salt only routes rows to reducers, but it must be (a) uniform over
    the hot key's rows and (b) stable across re-runs (idempotent writes
    need stable partitioning) — hence ``pmod(xxhash64(source_col),
    buckets)``.  ``source_col`` must be high-cardinality per hot key (e.g.
    ``doc_id``); salting on the skewed key itself would put every row of a
    hot key in ONE bucket and be a no-op, so the source column is an
    explicit required parameter.
    """
    return df.withColumn(col_name, F.pmod(F.xxhash64(F.col(source_col)), F.lit(buckets)))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, str]],
    buckets: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) -> groupBy(keys).

    ``aggs`` maps output column -> (first-phase aggregate expression,
    combiner name); combiner is one of ``count | sum | min | max`` — the
    associative aggregates whose two-phase split is exact.  Anything else
    (avg, countDistinct, ...) raises: avg must be decomposed by the caller
    into sum+count and countDistinct is not salting-decomposable at all.
    Example::

        salted_agg(df, ["source"],
                   {"n_rows": (F.count(F.lit(1)), "count"),
                    "sum_tok": (F.sum("n_tok"), "sum")},
                   salt_source="doc_id")
    """
    for name, (_expr, comb) in aggs.items():
        if comb not in _COMBINERS:
            raise ValueError(
                f"salted_agg: unsupported combiner {comb!r} for {name!r}; "
                f"supported: {sorted(_COMBINERS)} (decompose avg into "
                "sum+count; countDistinct cannot be salted)"
            )
    salt_col = F.pmod(
        F.xxhash64(F.col(salt_source) if salt_source else F.monotonically_increasing_id()),
        F.lit(buckets),
    )
    phase1 = (
        df.withColumn("_salt", salt_col)
        .groupBy(*keys, "_salt")
        .agg(*[expr.alias(name) for name, (expr, _c) in aggs.items()])
    )
    combiners = [
        _COMBINERS[comb](name).alias(name) for name, (_expr, comb) in aggs.items()
    ]
    return phase1.groupBy(*keys).agg(*combiners)


def hot_keys(
    df: DataFrame,
    key: str,
    top_n: int = 5,
    min_share: float = 0.2,
    sample_fraction: float = 0.01,
    sample_threshold: int = 1_000_000,
    seed: int = 42,
) -> list:
    """Detect hot key values: any of the top-N values holding more than
    ``min_share`` of rows (drive the salting decision from data, not
    guesses).

    Above ``sample_threshold`` rows the share is estimated on a seeded
    ``sample_fraction`` Bernoulli sample — at 10^12 rows an exact
    groupBy-count is itself the skewed shuffle we're trying to avoid, and a
    1% sample estimates a >=20% share with sampling error ~sqrt(p(1-p)/n)
    << min_share.  Below the threshold the count is exact.  Both paths are
    one aggregate + a top_n-row collect."""
    total = df.count()
    if total == 0:
        return []
    scan = df
    if total > sample_threshold:
        scan = df.sample(fraction=sample_fraction, seed=seed)
        total = scan.count()
        if total == 0:
            return []
    top = scan.groupBy(key).count().orderBy(F.col("count").desc()).limit(top_n).collect()
    return [r[key] for r in top if r["count"] / total >= min_share]
