"""``reduce`` — group-by transaction collapse with per-field merge strategies.

Reference: src/transforms/reduce/mod.rs (group key = ``group_by`` tuple via
Discriminant, lib/vector-core/src/event/discriminant.rs:19-33; defaults:
first value for strings, first + ``<field>_end`` for timestamps, sum for
numerics, reduce/mod.rs:82-88).  Strategy enum at
reduce/merge_strategy.rs:14-52: Discard, Retain, Sum, Max, Min, Array,
Concat, ConcatNewline, ConcatRaw, ShortestArray, LongestArray, FlatUnique.

Batch rendering: one hash aggregate.  "first"/"last" are event-order
concepts; the rebuild pins them to EVENT-TIME order via min_by/max_by on an
explicit ``order_col`` (deterministic, shuffle-free beyond the one groupBy).
``ends_when`` sessionization: running count of end-markers per key in
event-time order assigns a session id; then the same aggregate per
(key, session) — reference flush-on-condition (reduce/mod.rs:229-296).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _strategy_expr(strategy: str, c: str, order_col: str) -> Column:
    col = F.col(c)
    if strategy == "discard":  # keep first (merge_strategy.rs: Discard keeps initial)
        return F.min_by(col, F.col(order_col))
    if strategy == "retain":  # keep last
        return F.max_by(col, F.col(order_col))
    if strategy == "sum":
        return F.sum(col)
    if strategy == "max":
        return F.max(col)
    if strategy == "min":
        return F.min(col)
    if strategy == "array":
        return F.sort_array(F.collect_list(F.struct(F.col(order_col).alias("o"), col.alias("v")))).getField("v")
    if strategy == "concat":
        return F.array_join(
            F.sort_array(F.collect_list(F.struct(F.col(order_col).alias("o"), col.alias("v")))).getField("v"), " "
        )
    if strategy == "concat_newline":
        return F.array_join(
            F.sort_array(F.collect_list(F.struct(F.col(order_col).alias("o"), col.alias("v")))).getField("v"), "\n"
        )
    if strategy == "concat_raw":  # ConcatMerger with no joiner (merge_strategy.rs:582)
        return F.array_join(
            F.sort_array(F.collect_list(F.struct(F.col(order_col).alias("o"), col.alias("v")))).getField("v"), ""
        )
    if strategy == "shortest_array":
        return F.min_by(col, F.size(col))
    if strategy == "longest_array":
        return F.max_by(col, F.size(col))
    if strategy == "flat_unique":
        return F.array_distinct(F.flatten(F.collect_list(col)))
    raise ValueError(f"unknown merge strategy {strategy!r} (merge_strategy.rs:14-52)")


def reduce_events(
    df: DataFrame,
    group_by: list[str],
    merge_strategies: dict[str, str] | None = None,
    order_col: str = "ts",
    ends_when: Column | None = None,
    starts_when: Column | None = None,
    ts_col: str | None = None,
    max_events: int | None = None,
) -> DataFrame:
    """Collapse each group to one row.

    Default merges (reduce/mod.rs:82-88): string -> first; numeric -> sum;
    timestamp -> first, plus ``<field>_end`` = last.  ``ends_when`` marks a
    group-closing row: groups are split into sessions at each marker
    (marker row INCLUDED in the session it closes, reduce/mod.rs:410-421).
    ``starts_when`` marks a group-OPENING row: the previous session is
    flushed and the marker row begins the new one (reduce/mod.rs:404-409).
    Mutually exclusive, as in the reference (reduce/mod.rs:315-316).
    ``max_events`` flushes every time the open group reaches that many
    rows (reduce/mod.rs:64-67,297-303); composes with the marker
    conditions by sub-chunking each marker session.
    """
    merge_strategies = merge_strategies or {}
    ts_col = ts_col or order_col
    if ends_when is not None and starts_when is not None:
        raise ValueError("only one of ends_when and starts_when can be provided")
    work = df
    keys = list(group_by)

    if ends_when is not None or starts_when is not None:
        w = Window.partitionBy(*keys).orderBy(F.col(order_col).asc())
        if ends_when is not None:
            flag = (ends_when.isNotNull() & ends_when).cast("long")
            # session id = count of end-markers BEFORE this row (exclusive)
            # so the marker row closes its own session.
            frame = w.rowsBetween(Window.unboundedPreceding, -1)
        else:
            flag = (starts_when.isNotNull() & starts_when).cast("long")
            # count INCLUDING this row: a start-marker opens the session it
            # belongs to.
            frame = w.rowsBetween(Window.unboundedPreceding, 0)
        work = work.withColumn(
            "_session", F.coalesce(F.sum(flag).over(frame), F.lit(0))
        )
        keys = keys + ["_session"]

    if max_events is not None:
        # flush when the open group reaches max_events
        # (reduce/mod.rs:64-67,297-303): every run of max_events rows in
        # event-time order closes a session — composes with
        # ends_when/starts_when by sub-chunking each marker session.
        if max_events < 1:
            raise ValueError("max_events must be >= 1")
        wc = Window.partitionBy(*keys).orderBy(F.col(order_col).asc())
        work = work.withColumn(
            "_chunk", F.floor((F.row_number().over(wc) - 1) / max_events)
        )
        keys = keys + ["_chunk"]

    aggs: list[Column] = []
    for c, dtype in work.dtypes:
        if c in keys or c == "_session":
            continue
        if c in merge_strategies:
            aggs.append(_strategy_expr(merge_strategies[c], c, order_col).alias(c))
        elif dtype in ("bigint", "int", "smallint", "tinyint", "double", "float", "decimal"):
            aggs.append(F.sum(F.col(c)).alias(c))
        elif dtype.startswith("timestamp"):
            aggs.append(F.min(F.col(c)).alias(c))
            aggs.append(F.max(F.col(c)).alias(f"{c}_end"))
        else:
            aggs.append(F.min_by(F.col(c), F.col(order_col)).alias(c))
    out = work.groupBy(*keys).agg(*aggs)
    for helper in ("_session", "_chunk"):
        if helper in out.columns:
            out = out.drop(helper)
    return out
