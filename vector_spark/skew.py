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


def with_salt(df: DataFrame, buckets: int, col_name: str = "_salt") -> DataFrame:
    """Add a uniform salt in [0, buckets).  Deterministic per row content is
    NOT required — salt only routes rows to reducers; use rand-free
    ``pmod(xxhash64(doc_id), buckets)`` so re-runs are reproducible
    (idempotent writes need stable partitioning)."""
    return df.withColumn(col_name, F.pmod(F.xxhash64(*df.columns[:1]), F.lit(buckets)))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    buckets: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) -> groupBy(keys).

    ``aggs`` maps output column -> FIRST-phase aggregate expression; the
    second phase re-combines with the matching associative combiner
    (count -> sum, sum -> sum, min -> min, max -> max), inferred from the
    expression name.  Example::

        salted_agg(df, ["source"], {"n_rows": F.count(F.lit(1)),
                                    "sum_tok": F.sum("n_tok")})
    """
    salt_col = F.pmod(
        F.xxhash64(F.col(salt_source) if salt_source else F.monotonically_increasing_id()),
        F.lit(buckets),
    )
    phase1 = (
        df.withColumn("_salt", salt_col)
        .groupBy(*keys, "_salt")
        .agg(*[expr.alias(name) for name, expr in aggs.items()])
    )
    combiners = []
    for name, expr in aggs.items():
        sql = expr._jc.toString().lower()
        if sql.startswith("count("):
            combiners.append(F.sum(name).alias(name))
        elif sql.startswith("min("):
            combiners.append(F.min(name).alias(name))
        elif sql.startswith("max("):
            combiners.append(F.max(name).alias(name))
        else:  # sum and sum-like
            combiners.append(F.sum(name).alias(name))
    return phase1.groupBy(*keys).agg(*combiners)


def hot_keys(df: DataFrame, key: str, top_n: int = 5, min_share: float = 0.2) -> list:
    """Detect hot key values: any of the top-N values holding more than
    ``min_share`` of sampled rows (drive the salting decision from data,
    not guesses).  Uses a 1% sample at scale — exact count here since the
    fixture corpus is small."""
    total = df.count()
    if total == 0:
        return []
    top = df.groupBy(key).count().orderBy(F.col("count").desc()).limit(top_n).collect()
    return [r[key] for r in top if r["count"] / total >= min_share]
