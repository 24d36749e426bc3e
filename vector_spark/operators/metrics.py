"""Metric-side transforms: aggregate, log_to_metric, metric_to_log,
tag_cardinality_limit.

The metrics data model follows the reference's Metric = series
(name+namespace+tags) ⟂ data (ts, kind, value)
(lib/vector-core/src/event/metric/mod.rs:56-66, series.rs:12-19,
data.rs:12-21): a metrics DataFrame with columns
``(name, namespace, tags map<string,string>, ts, kind, value)`` where kind ∈
{'incremental','absolute'} (metric/mod.rs:491-497).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def aggregate_metrics(
    df: DataFrame,
    interval_secs: int = 10,
    ts_col: str = "ts",
    series_cols: tuple[str, ...] = ("name", "namespace"),
    tags_col: str | None = "tags",
    kind_col: str = "kind",
    value_col: str = "value",
) -> DataFrame:
    """``aggregate`` transform (reference src/transforms/aggregate.rs:59-148).

    Per flush interval and metric series: Incremental values are summed
    (``data.update``, aggregate.rs:88-96), Absolute is last-write-wins
    (aggregate.rs:97-104).  Vector flushes on a processing-time timer
    (interval_ms, default 10s); the batch rendering uses event-time tumbling
    windows — same final state for fixtures that assert post-flush totals
    (SURVEY.md §2.6).

    One hash aggregate; map-side partial aggregation is automatic.  Window
    start computed as explicit epoch math so the oracle can reproduce it.
    """
    win_start = F.to_timestamp(
        F.from_unixtime((F.unix_timestamp(F.col(ts_col)) / interval_secs).cast("bigint") * interval_secs)
    )
    keys = [F.col(c) for c in series_cols]
    if tags_col:
        keys.append(F.col(tags_col))
    grouped = df.withColumn("window_start", win_start).groupBy("window_start", *keys)
    return grouped.agg(
        F.sum(F.when(F.col(kind_col) == "incremental", F.col(value_col))).alias("sum_incremental"),
        F.max_by(
            F.when(F.col(kind_col) == "absolute", F.col(value_col)), F.col(ts_col)
        ).alias("last_absolute"),
        F.count(F.lit(1)).alias("n_samples"),
    )


def aggregate_metric_values(
    df: DataFrame,
    interval_secs: int = 10,
    ts_col: str = "ts",
    series_cols: tuple[str, ...] = ("name", "namespace"),
    tags_col: str | None = "tags",
    kind_col: str = "kind",
    value_type_col: str = "value_type",
    value_col: str = "value",
    value_str_col: str = "value_str",
    buckets: tuple[float, ...] = (),
    quantiles: tuple[float, ...] = (),
) -> DataFrame:
    """Full MetricValue aggregation — the non-scalar variants of the
    reference's value enum (lib/vector-core/src/event/metric/value.rs:15-80):

    - ``Counter``/``Gauge``: sum-incremental / last-absolute (as in
      :func:`aggregate_metrics`);
    - ``Set{BTreeSet<String>}``: the merged distinct-string set per flush
      (value.rs:27-31) -> ``sort_array(collect_set(value_str))`` + its size;
    - ``Distribution{samples}``: merging concatenates samples
      (value.rs:35-44); the flushed statistic renders count/sum/min/max/avg
      and, when ``quantiles`` given, exact percentiles (F.percentile —
      AggregatedSummary shape, value.rs:60-68);
    - ``AggregatedHistogram{buckets, count, sum}`` (value.rs:46-57): when
      ``buckets`` given, cumulative per-bound counts over the samples.

    ONE hash aggregate for every variant (conditional aggregates share the
    pass; map-side partial aggregation applies to all but percentile, which
    Spark computes with a sort-based partial).  Rows carry their variant in
    ``value_type``; irrelevant outputs are NULL for other variants.
    """
    win_start = F.to_timestamp(
        F.from_unixtime(
            (F.unix_timestamp(F.col(ts_col)) / interval_secs).cast("bigint") * interval_secs
        )
    )
    keys = [F.col(c) for c in series_cols] + [F.col(value_type_col)]
    if tags_col:
        keys.append(F.col(tags_col))
    v = F.col(value_col)
    vt = F.col(value_type_col)
    dist = vt.isin("distribution", "histogram", "summary")
    aggs = [
        F.sum(F.when((F.col(kind_col) == "incremental") & (vt == "counter"), v)).alias(
            "sum_incremental"
        ),
        F.max_by(F.when((F.col(kind_col) == "absolute") & (vt == "gauge"), v), F.col(ts_col)).alias(
            "last_absolute"
        ),
        F.sort_array(F.collect_set(F.when(vt == "set", F.col(value_str_col)))).alias("set_values"),
        F.count(F.when(dist, v)).alias("dist_count"),
        F.sum(F.when(dist, v)).alias("dist_sum"),
        F.min(F.when(dist, v)).alias("dist_min"),
        F.max(F.when(dist, v)).alias("dist_max"),
    ]
    for b in buckets:
        aggs.append(
            F.sum(F.when(dist & (v <= F.lit(float(b))), F.lit(1)).otherwise(F.lit(0))).alias(
                f"bucket_le_{str(b).replace('.', '_')}"
            )
        )
    for q in quantiles:
        aggs.append(
            F.percentile(F.when(dist, v), F.lit(float(q))).alias(
                f"q{str(q).replace('0.', '').ljust(2, '0')}"
            )
        )
    grouped = df.withColumn("window_start", win_start).groupBy("window_start", *keys)
    out = grouped.agg(*aggs)
    return out.withColumn("set_size", F.size("set_values"))


def ddsketch_aggregate(
    df: DataFrame,
    series_cols: list[str],
    value_col: str = "value",
    alpha: float = 0.02,
    quantiles: tuple[float, ...] = (0.5, 0.95),
) -> DataFrame:
    """``Sketch{AgentDDSketch}`` metric value (reference
    lib/vector-core/src/event/metric/value.rs:77-80 and
    lib/vector-core/src/metrics/ddsketch.rs): relative-accuracy quantile
    sketch, per the public DDSketch construction (Masson/Lee/Rim, VLDB'19).

    gamma = (1+alpha)/(1-alpha); a positive sample lands in bucket
    ``i = ceil(log_gamma(v))`` and is estimated back as
    ``2*gamma^i/(gamma+1)`` (the bucket's geometric midpoint) — relative
    error <= alpha by construction.  Non-positive samples go to the zero
    store, as in the agent sketch.

    Distributed plan: ONE hash aggregate to bucket counts (map-side
    combinable — the sketch IS its bucket histogram, which is why the
    reference ships sketches between nodes), a window cumsum per series
    (tiny: <=|buckets| rows per series), one final aggregate for the
    quantile lookup.  The log-ratio is rounded to 9 decimals before ceil
    so bucket edges are engine-portable (JVM vs C double log differ by
    <1 ulp).
    """
    import math

    gamma = (1.0 + alpha) / (1.0 - alpha)
    lg = math.log(gamma)
    v = F.col(value_col).try_cast("double")
    # zero store = bucket LONG_MIN-ish sentinel, ordered before any real one
    ZERO = -(1 << 62)
    bucket = F.when(
        v > 0, F.ceil(F.round(F.log(v) / F.lit(lg), 9)).cast("long")
    ).otherwise(F.lit(ZERO))
    counts = (
        df.withColumn("_b", bucket)
        .groupBy(*series_cols, "_b")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(*series_cols).orderBy("_b")
    wall = Window.partitionBy(*series_cols)
    cum = counts.withColumn("_cum", F.sum("_n").over(w)).withColumn(
        "_total", F.sum("_n").over(wall)
    )
    est = F.when(F.col("_b") == ZERO, F.lit(0.0)).otherwise(
        F.lit(2.0) * F.pow(F.lit(gamma), F.col("_b")) / F.lit(gamma + 1.0)
    )
    aggs = [
        F.max("_total").alias("n_samples"),
        F.sum(F.when(F.col("_b") == ZERO, F.col("_n")).otherwise(F.lit(0))).alias(
            "zero_count"
        ),
        F.count(F.lit(1)).alias("n_buckets"),
    ]
    for q in quantiles:
        # rank of the q-quantile sample; the first bucket whose cumulative
        # count reaches it holds the estimate
        qpos = F.greatest(F.ceil(F.lit(float(q)) * F.col("_total")), F.lit(1))
        aggs.append(
            F.round(
                F.min(F.when(F.col("_cum") >= qpos, est)), 6
            ).alias(f"q{str(q).replace('0.', '').ljust(2, '0')}_est")
        )
    return cum.groupBy(*series_cols).agg(*aggs)


def log_to_metric(
    df: DataFrame,
    name: str | Column,
    metric_type: str = "counter",
    field: str | None = None,
    namespace: str | Column = "",
    tags: dict[str, Column] | None = None,
    ts_col: str = "ts",
    increment_by_value: bool = False,
) -> DataFrame:
    """``log_to_metric`` (reference src/transforms/log_to_metric.rs:251-380).

    Derives one metric row per log: counter (+1, or +field when
    ``increment_by_value``), gauge/histogram/summary/distribution (field as
    double), set (field as string, log_to_metric.rs:37-118).  Output rows
    carry ``value_type`` and ``value_str`` so every MetricValue variant
    flows into :func:`aggregate_metric_values`.  Template-render failures
    (NULL name/tag inputs) drop that metric row (log_to_metric.rs:360-377).
    """
    name_c = F.lit(name) if isinstance(name, str) else name
    ns_c = F.lit(namespace) if isinstance(namespace, str) else namespace
    value_str = F.lit(None).cast("string")
    if metric_type == "counter" and not increment_by_value:
        value = F.lit(1.0)
    elif field is None:
        raise ValueError(f"metric_type {metric_type!r} requires a field")
    elif metric_type == "set":
        value = F.lit(None).cast("double")
        value_str = F.col(field).cast("string")
    else:
        # try_cast: a non-numeric field is a render failure -> NULL ->
        # dropped by the filter below (never an ANSI error).
        value = F.col(field).try_cast("double")
    kind = F.lit("absolute" if metric_type == "gauge" else "incremental")
    tag_pairs = []
    for k, v in (tags or {}).items():
        tag_pairs += [F.lit(k), v.cast("string")]
    tags_c = F.create_map(*tag_pairs) if tag_pairs else F.create_map().cast("map<string,string>")
    out = df.select(
        name_c.alias("name"),
        ns_c.alias("namespace"),
        tags_c.alias("tags"),
        F.col(ts_col).alias("ts"),
        kind.alias("kind"),
        F.lit(metric_type).alias("value_type"),
        value.alias("value"),
        value_str.alias("value_str"),
    )
    # render failure => drop the metric (log_to_metric.rs:360-377)
    cond = out["name"].isNotNull() & (
        out["value"].isNotNull() | out["value_str"].isNotNull()
    )
    return out.filter(cond)


def metric_to_log(df: DataFrame, host_tag: str = "host") -> DataFrame:
    """``metric_to_log`` (reference src/transforms/metric_to_log.rs:30-70):
    serialize each metric into a JSON-shaped log event, hoisting the host
    tag to a top-level field (metric_to_log.rs:278)."""
    return df.select(
        F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("message"),
        F.col("ts").alias("timestamp"),
        F.try_element_at(F.col("tags"), F.lit(host_tag)).alias("host"),
        F.lit("metric_to_log").alias("source_type"),
    )


class _PyBloom:
    """Minimal deterministic Bloom filter (the tag_value_set.rs
    probabilistic-mode membership sketch): m bits, k md5-derived hashes.
    Bounded memory regardless of value sizes — the property the
    reference's mode exists for."""

    def __init__(self, bits: bytearray, m: int, k: int):
        self.bits, self.m, self.k = bits, m, k

    @classmethod
    def build(cls, values: list[str], fpp: float) -> "_PyBloom":
        import math

        n = max(len(values), 1)
        m = max(8, int(-n * math.log(max(fpp, 1e-12)) / (math.log(2) ** 2)))
        k = max(1, round(m / n * math.log(2)))
        b = cls(bytearray((m + 7) // 8), m, k)
        for v in values:
            for pos in b._positions(v):
                b.bits[pos >> 3] |= 1 << (pos & 7)
        return b

    def _positions(self, v: str):
        import hashlib

        # one SHAKE-256 stream yields k independent 8-byte positions —
        # avoids the double-hashing degenerate case (step ≡ 0 mod m)
        h = hashlib.shake_256(v.encode()).digest(8 * self.k)
        return [
            int.from_bytes(h[8 * i : 8 * i + 8], "big") % self.m for i in range(self.k)
        ]

    def might_contain(self, v: str) -> bool:
        return all(self.bits[p >> 3] & (1 << (p & 7)) for p in self._positions(v))


def tag_cardinality_limit(
    df: DataFrame,
    tag_cols: list[str],
    value_limit: int = 500,
    action: str = "drop_tag",
    mode: str = "exact",
    fpp: float = 0.001,
) -> DataFrame:
    """``tag_cardinality_limit``
    (reference src/transforms/tag_cardinality_limit/, default limit 500 at
    config.rs:84-86; actions drop_tag | drop_event at config.rs:71-77).

    Vector admits the first N distinct values per tag key in arrival order;
    batch has no arrival order, so the deterministic variant admits the N
    smallest values per key (documented delta).  Implemented as a
    distributed TopK — ``distinct().orderBy(c).limit(N)``: Spark plans
    ``limit`` after ``sort`` as TakeOrderedAndProject (per-partition local
    top-N, then a tiny merge of ≤ N rows per partition on the driver-side
    single reducer), so pre-limit tag cardinality — exactly what this
    operator exists to bound, and huge at scale — never funnels through one
    global sort.  The admitted set (≤ N rows) is broadcast back.

    ``mode='probabilistic'`` renders the reference's Bloom variant
    (tag_value_set.rs:34-58: fixed-memory membership with a false-positive
    rate): admission is tested through a Spark BloomFilter sketch built
    over the admitted values (``df.stat.bloomFilter``) instead of the
    exact hash set — an FP admits an over-limit value, the same error
    direction as the reference.  Membership runs as an Arrow-batched
    pandas UDF over the broadcast sketch (Spark does not expose
    might_contain as a public Column function).
    """
    from pyspark.sql.functions import broadcast

    out = df
    for c in tag_cols:
        admitted = (
            df.select(c)
            .distinct()
            .orderBy(F.col(c).asc_nulls_last())
            .limit(value_limit)
            .select(F.col(c).alias("_adm"))
        )
        if mode == "probabilistic":
            values = [str(r["_adm"]) for r in admitted.collect() if r["_adm"] is not None]
            bloom = _PyBloom.build(values, fpp)
            bc = df.sparkSession.sparkContext.broadcast(bloom)
            from pyspark.sql.functions import pandas_udf

            @pandas_udf("boolean")
            def _might_contain(s):
                b = bc.value
                return s.map(lambda v: v is not None and b.might_contain(str(v)))

            hit = _might_contain(out[c].cast("string"))
            if action == "drop_event":
                out = out.filter(hit)
            else:
                out = out.withColumn(c, F.when(hit, F.col(c)))
            continue
        out = out.join(broadcast(admitted), out[c] == F.col("_adm"), "left")
        if action == "drop_event":
            out = out.filter(F.col("_adm").isNotNull()).drop("_adm")
        else:  # drop_tag: null out the over-limit tag value
            out = out.withColumn(c, F.when(F.col("_adm").isNotNull(), F.col(c))).drop("_adm")
    return out
