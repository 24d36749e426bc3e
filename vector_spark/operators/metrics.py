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
from pyspark.sql.window import Window


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
    ``increment_by_value``), gauge/histogram/distribution (field as double),
    set (field as string).  Template-render failures (NULL name/tag inputs)
    drop that metric row (log_to_metric.rs:360-377) -> filtered out.
    """
    name_c = F.lit(name) if isinstance(name, str) else name
    ns_c = F.lit(namespace) if isinstance(namespace, str) else namespace
    if metric_type == "counter" and not increment_by_value:
        value = F.lit(1.0)
    elif field is None:
        raise ValueError(f"metric_type {metric_type!r} requires a field")
    else:
        value = F.col(field).cast("double")
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
        value.alias("value"),
    )
    # render failure => drop the metric (log_to_metric.rs:360-377)
    cond = out["name"].isNotNull() & out["value"].isNotNull()
    return out.filter(cond)


def metric_to_log(df: DataFrame, host_tag: str = "host") -> DataFrame:
    """``metric_to_log`` (reference src/transforms/metric_to_log.rs:30-70):
    serialize each metric into a JSON-shaped log event, hoisting the host
    tag to a top-level field (metric_to_log.rs:278)."""
    return df.select(
        F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("message"),
        F.col("ts").alias("timestamp"),
        F.element_at(F.col("tags"), host_tag).alias("host"),
        F.lit("metric_to_log").alias("source_type"),
    )


def tag_cardinality_limit(
    df: DataFrame,
    tag_cols: list[str],
    value_limit: int = 500,
    action: str = "drop_tag",
) -> DataFrame:
    """``tag_cardinality_limit``
    (reference src/transforms/tag_cardinality_limit/, default limit 500 at
    config.rs:84-86; actions drop_tag | drop_event at config.rs:71-77).

    Vector admits the first N distinct values per tag key in arrival order;
    batch has no arrival order, so the deterministic variant admits the N
    smallest values per key (documented delta).  Implemented as a dense_rank
    over distinct values — one shuffle per tag column on the tiny distinct
    set, then broadcast back.
    """
    out = df
    for c in tag_cols:
        distinct = df.select(c).distinct()
        w = Window.orderBy(F.col(c).asc_nulls_last())
        admitted = distinct.withColumn("_rk", F.dense_rank().over(w)).filter(
            F.col("_rk") <= value_limit
        ).select(F.col(c).alias("_adm"))
        from pyspark.sql.functions import broadcast

        out = out.join(broadcast(admitted), out[c] == F.col("_adm"), "left")
        if action == "drop_event":
            out = out.filter(F.col("_adm").isNotNull()).drop("_adm")
        else:  # drop_tag: null out the over-limit tag value
            out = out.withColumn(c, F.when(F.col("_adm").isNotNull(), F.col(c))).drop("_adm")
    return out
