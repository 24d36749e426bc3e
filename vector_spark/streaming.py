"""Structured Streaming rendering of the dataflow (SURVEY.md §2.6).

The north rule fixes the rebuild to batch-over-table, but the reference is
a streaming engine, so the streaming-mode parity surface lives here:

| reference                                   | here                        |
|---------------------------------------------|-----------------------------|
| source pump (EventArray chunks)             | readStream micro-batches    |
| aggregate interval_ms flush (aggregate.rs)  | event-time tumbling window  |
| reduce expire_after_ms stale flush          | watermark-driven state drop |
| route fan-out to sinks (Fanout)             | foreachBatch multi-write    |
| end-to-end acks / checkpointer              | checkpointLocation + exactly-once file sink |

Processing-time flush timers become event-time windows + watermark — batch
fixtures assert identical post-flush state (the delta documented in
SURVEY.md §2.6: no lateness loss in batch, bounded by watermark here).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_spark.operators.route import route_labeled


def stream_from_directory(
    spark: SparkSession, path: str, schema: str, fmt: str = "parquet", **options
) -> DataFrame:
    """File-stream source: new files in ``path`` become micro-batches (the
    streaming analogue of the `file` source's tail+checkpoint loop,
    src/sources/file.rs — offsets tracked in the query checkpoint)."""
    reader = spark.readStream.format(fmt).schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def stream_aggregate(
    df: DataFrame,
    interval_secs: int = 10,
    watermark: str = "30 seconds",
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("name",),
    kind_col: str = "kind",
    value_col: str = "value",
) -> DataFrame:
    """Streaming `aggregate` transform (src/transforms/aggregate.rs:59-148):
    per (window, series) — incremental summed, absolute last-write-wins;
    watermark bounds state (the stale-flush timer analogue)."""
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), f"{interval_secs} seconds").alias("w"), *keys)
        .agg(
            F.sum(
                F.when(F.col(kind_col) == "incremental", F.col(value_col))
            ).alias("sum_incremental"),
            F.max_by(
                F.when(F.col(kind_col) == "absolute", F.col(value_col)), F.col(ts_col)
            ).alias("last_absolute"),
            F.count(F.lit(1)).alias("n_samples"),
        )
        .select(
            F.col("w.start").alias("window_start"), *keys,
            "sum_incremental", "last_absolute", "n_samples",
        )
    )


def stream_route_to_sinks(
    df: DataFrame,
    conditions: dict[str, Column],
    out_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Streaming route fan-out: ONE stream, foreachBatch computes the
    labeled explode once per micro-batch and writes every route partition.

    Exactly-once delivery: foreachBatch alone is at-least-once (a
    micro-batch replayed after a crash between write and checkpoint commit
    would duplicate rows), so each batch is written IDEMPOTENTLY into its
    own ``batch_id=<n>`` directory with overwrite — a replay of batch n
    rewrites the same directory instead of appending.  Readers scan
    ``out_dir`` with partition discovery (``batch_id`` and ``route_key``
    become partition columns)."""
    conds = dict(conditions)

    def _write(batch: DataFrame, batch_id: int) -> None:
        labeled = route_labeled(batch, conds)
        labeled.write.mode("overwrite").partitionBy("route_key").parquet(
            f"{out_dir}/batch_id={batch_id}"
        )

    writer = df.writeStream.foreachBatch(_write).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_dedupe(
    df: DataFrame,
    match_fields: list[str],
    ttl_secs: int = 300,
    out_schema: str | None = None,
):
    """Streaming `dedupe` (reference src/transforms/dedupe.rs:124-285):
    drop events whose ``match_fields`` tuple was already seen, with true
    cross-batch state via ``applyInPandasWithState`` keyed by the tuple.

    The reference bounds memory with a 5000-entry LRU (dedupe.rs:86-90);
    the streaming analogue bounds it with a per-key state TIMEOUT — a key
    idle for ``ttl_secs`` is forgotten and its next occurrence passes
    again, the same re-admission behavior as LRU eviction under a
    time-skewed workload.  Within a micro-batch only the first row of each
    key group is emitted (vectorized head(1), no row iteration).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if out_schema is None:
        out_schema = ", ".join(f"`{c}` {t}" for c, t in df.dtypes)

    def _dedupe(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        seen = state.exists
        state.update((True,))
        state.setTimeoutDuration(ttl_secs * 1000)
        if not seen:
            for pdf in pdfs:
                if len(pdf):
                    yield pdf.head(1)
                    return

    return df.groupBy(*match_fields).applyInPandasWithState(
        _dedupe,
        outputStructType=out_schema,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def stream_reduce(
    df: DataFrame,
    group_by: list[str],
    ends_when_col: str,
    merge_strategies: dict[str, str] | None = None,
    order_col: str = "ts",
    expire_secs: int = 300,
):
    """Streaming `reduce` (reference src/transforms/reduce/mod.rs:229-296):
    merge consecutive events per key into one transaction row; a row whose
    ``ends_when_col`` is true closes the session (marker included, as in
    reduce/mod.rs:410-421); an idle key's open session is flushed by the
    state timeout (``expire_after_ms`` ≙ ``expire_secs``).

    True cross-batch state via ``applyInPandasWithState``: the open
    session's partial merge is the state row; each micro-batch is processed
    VECTORIZED (session ids from a cumsum of end-markers, one pandas
    groupby-agg per batch — no per-row Python).

    Merge strategies (merge_strategy.rs subset that commutes with partial
    merging): ``sum | min | max | discard`` (first) ``| retain`` (last)
    ``| concat`` (space-joined) — defaults mirror the batch operator:
    numeric -> sum, everything else -> first.  Output schema = group keys +
    merged fields + ``n_events``.

    Batch-mode equivalence: operators/reduce.py::reduce_events with
    ``ends_when`` (tested equal on fully-closed sessions).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    merge_strategies = dict(merge_strategies or {})
    value_cols: list[tuple[str, str, str]] = []  # (name, dtype, strategy)
    for c, dtype in df.dtypes:
        if c in group_by or c == ends_when_col:
            continue
        numeric = dtype in ("bigint", "int", "smallint", "tinyint", "double", "float")
        strat = merge_strategies.get(c, "sum" if numeric else "discard")
        value_cols.append((c, dtype, strat))

    out_schema = ", ".join(
        [f"`{c}` {t}" for c, t in df.dtypes if c in group_by]
        + [f"`{c}` {t}" for c, t, _ in value_cols]
        + ["n_events long"]
    )
    # state = the open session's partial merge (strings carried as-is;
    # timestamps as epoch micros to keep the state row plain)
    state_schema = ", ".join(
        [f"`{c}` {'string' if t.startswith('timestamp') else t}" for c, t, _ in value_cols]
        + ["n_events long"]
    )

    def _merge(series: pd.Series, strat: str):
        if strat == "sum":
            return series.sum()
        if strat == "min":
            return series.min()
        if strat == "max":
            return series.max()
        if strat == "retain":
            return series.iloc[-1]
        if strat == "concat":
            return " ".join(series.astype(str))
        return series.iloc[0]  # discard ≙ keep-first

    def _from_state(vals: list) -> list:
        return [
            pd.Timestamp(v) if t.startswith("timestamp") and v is not None else v
            for v, (_, t, _s) in zip(vals[:-1], value_cols)
        ] + [vals[-1]]

    def _reduce(key, pdfs, state: GroupState):
        carried = None
        if state.exists:
            carried = _from_state(list(state.get))
        if state.hasTimedOut:
            # expire_after flush of the open session
            if carried is not None:
                yield pd.DataFrame(
                    [list(key) + carried], columns=list(key_names) + state_cols
                )
            state.remove()
            return
        closed_rows: list[list] = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
            ends = pdf[ends_when_col].fillna(False).astype(bool)
            # session id = count of markers BEFORE the row (marker closes
            # its own session) — same formula as the batch window plan
            sess = ends.cumsum().shift(fill_value=0)
            for sid, seg in pdf.groupby(sess):
                merged = [
                    _merge(seg[c], strat) for c, _, strat in value_cols
                ] + [len(seg)]
                if carried is not None:
                    merged = _combine(carried, merged)
                    carried = None
                if bool(ends[seg.index].iloc[-1]):
                    closed_rows.append(merged)
                else:
                    carried = merged  # only ever the batch's last session
        if carried is not None:
            state.update(tuple(_to_state(carried)))
            state.setTimeoutDuration(expire_secs * 1000)
        else:
            state.remove()
        if closed_rows:
            yield pd.DataFrame(
                [list(key) + r for r in closed_rows],
                columns=list(key_names) + state_cols,
            )

    def _combine(prev: list, nxt: list) -> list:
        out = []
        for i, (c, _, strat) in enumerate(value_cols):
            a, b = prev[i], nxt[i]
            if strat == "sum":
                out.append(a + b)
            elif strat == "min":
                out.append(min(a, b))
            elif strat == "max":
                out.append(max(a, b))
            elif strat == "retain":
                out.append(b)
            elif strat == "concat":
                out.append(f"{a} {b}")
            else:
                out.append(a)
        out.append(prev[-1] + nxt[-1])
        return out

    def _to_state(vals: list) -> list:
        return [
            str(v) if t.startswith("timestamp") else v
            for v, (_, t, _s) in zip(vals[:-1], value_cols)
        ] + [vals[-1]]

    key_names = list(group_by)
    state_cols = [c for c, _, _ in value_cols] + ["n_events"]

    return df.groupBy(*group_by).applyInPandasWithState(
        _reduce,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def stream_throttle(
    df: DataFrame,
    threshold: int,
    window_secs: int,
    ts_col: str = "ts",
    key_field: str = "key",
    out_schema: str | None = None,
):
    """Streaming `throttle` (reference src/transforms/throttle.rs:26-190):
    at most ``threshold`` events per ``window_secs`` per key, enforced with
    true cross-batch state via ``applyInPandasWithState`` — the custom
    stateful-operator surface (GroupState keyed by ``key_field``; state =
    (current_window_start, emitted_count), dropped on timeout like the
    rate limiter's bucket expiry).

    Batch-mode equivalence: operators/core.py::throttle (tested equal on
    the same input).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if out_schema is None:
        out_schema = ", ".join(f"`{c}` {t}" for c, t in df.dtypes)

    def _throttle(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        win_start, count = state.get if state.exists else (-1, 0)
        outs = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            # vectorized: window id per row, running rank within each
            # window, carry-in offset for the window the state left off in
            pdf = pdf.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
            w = (pdf[ts_col].astype("int64") // 1_000_000_000) // window_secs
            rank = w.groupby(w).cumcount()
            offset = (w == win_start) * count  # only the carried-over window
            keep = (rank + offset) < threshold
            outs.append(pdf[keep])
            last_w = int(w.iloc[-1])
            kept_last = int(keep[w == last_w].sum())
            count = kept_last + (count if last_w == win_start else 0)
            win_start = last_w
        state.update((win_start, count))
        state.setTimeoutDuration(window_secs * 2 * 1000)
        if outs:
            yield pd.concat(outs)

    return (
        df.groupBy(key_field)
        .applyInPandasWithState(
            _throttle,
            outputStructType=out_schema,
            stateStructType="win_start long, count long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def stream_iceberg_sink(
    sdf: DataFrame,
    table,
    checkpoint_dir: str,
    query_name: str = "iceberg_sink",
    key_cols: list[str] | None = None,
):
    """Exactly-once streaming append into a jar-free Iceberg table
    (vector_spark.iceberg.IcebergTable) — the batch topology's sink made
    continuous (reference: a Vector sink with end-to-end acks,
    lib/vector-common/src/finalization.rs; Iceberg side: the spec's
    snapshot summary map, which the real Spark streaming sink uses to
    record its epoch id for replay dedup).

    Per micro-batch: (1) if a snapshot already carries this batch id in
    its summary, the batch is a checkpoint replay -> skip (the commit is
    durable in table metadata, so this survives driver restarts);
    (2) otherwise stage the batch under data/b<batch_id> with
    mode=overwrite (clobbering partial output of a failed attempt —
    staged files are invisible until the metadata commit) and commit the
    directory as one fast-append snapshot stamped with the batch id.

    With ``key_cols`` the sink is a CDC/upsert stream: each micro-batch
    commits via ``IcebergTable.upsert`` — new rows plus their keys as an
    equality-delete file at one sequence number, so a later batch's row
    for the same key replaces the earlier batch's (latest-batch-wins
    MERGE semantics) without reading or rewriting any existing data
    file.  The batch-id replay protocol is identical, so the upsert
    stream is exactly-once too.
    Returns the DataStreamWriter (caller picks trigger and starts)."""
    import os as _os

    def _write_batch(bdf: DataFrame, batch_id: int) -> None:
        key = str(batch_id)
        for s in table.snapshots():
            if s.get("summary", {}).get("streaming-batch-id") == key:
                return
        if key_cols:
            if bdf.isEmpty():
                return
            table.upsert(
                bdf.sparkSession, bdf, key_cols,
                subdir=f"b{batch_id:012d}", staging_mode="overwrite",
                summary_extra={"streaming-batch-id": key},
            )
            return
        staging = _os.path.join(table.location, "data", f"b{batch_id:012d}")
        w = bdf.write.mode("overwrite")
        if table.partition_cols:
            w = w.partitionBy(*table.partition_cols)
        w.parquet(staging)
        table.append_parquet_dir(
            staging, summary_extra={"streaming-batch-id": key}
        )

    return (
        sdf.writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
    )


def make_stream_lua_fn(cfg, out_schema: str, state_globals, idle_flush_secs=None):
    """Build the applyInPandasWithState group function for
    :func:`stream_lua` — module-level so the state machine (restore ->
    hooks -> timers -> persist, and the timeout shutdown-flush branch)
    is unit-testable against a mock GroupState without a streaming
    query."""
    import json

    import pandas as pd

    from vector_spark.lua import LuaError
    from vector_spark.operators.lua import (
        _build_runtime,
        _event_to_rowdict,
        _make_event,
        _np_plain,
        _project,
        state_decode,
        state_encode,
    )
    from pyspark.sql.types import StructType

    schema_struct = StructType.fromDDL(out_schema)
    names = [f.name for f in schema_struct.fields]

    def _lua(key, pdfs, state):
        rt, hooks = _build_runtime(cfg)
        pending: list[tuple] = []

        def emit(ev=None):
            pending.append(
                _project(_event_to_rowdict(ev, cfg.version), schema_struct, cfg.version)
            )

        try:
            if state.hasTimedOut:
                if "shutdown" in hooks:
                    # restore state for the flush, then drop it
                    (blob,) = state.get
                    for gname, gval in json.loads(blob).items():
                        rt.globals.set(gname, state_decode(gval))
                    rt.call(hooks["shutdown"], emit)
                state.remove()
                if pending:
                    yield pd.DataFrame(pending, columns=names, dtype=object)
                return

            if state.exists:
                (blob,) = state.get
                for gname, gval in json.loads(blob).items():
                    rt.globals.set(gname, state_decode(gval))
            elif "init" in hooks:
                rt.call(hooks["init"], emit)

            for pdf in pdfs:
                for row in pdf.to_dict("records"):
                    try:
                        rt.call(
                            hooks["process"],
                            _make_event({k: _np_plain(v) for k, v in row.items()}),
                            emit,
                        )
                    except LuaError:
                        pass  # hook error drops the event, like batch
            for t in hooks.get("timers", []):
                rt.call(t, emit)

            # type-tagged persist: integer/float/bool table keys survive
            # the round trip exactly (plain json stringifies them)
            state.update((json.dumps(
                {g: state_encode(rt.globals.get(g)) for g in state_globals}
            ),))
            if idle_flush_secs:
                state.setTimeoutDuration(idle_flush_secs * 1000)
            if pending:
                yield pd.DataFrame(pending, columns=names, dtype=object)
        finally:
            # release any suspended-coroutine threads this group's
            # interpreter spawned (one OS thread each)
            rt.close_coroutines()

    return _lua


def stream_lua(
    df: DataFrame,
    cfg,
    key_fields: list[str],
    out_schema: str,
    state_globals: list[str],
    idle_flush_secs: int | None = None,
):
    """Streaming `lua` (reference src/transforms/lua/v2/mod.rs): the v2
    hooks with TRUE cross-batch state via ``applyInPandasWithState``.

    The reference's lua transform keeps arbitrary state in one global
    runtime; a distributed stream shards that state by ``key_fields``
    (the same delta as every stateful operator here).  ``state_globals``
    names the Lua globals that persist across micro-batches — they are
    extracted after each batch (plain values/tables only; JSON-encoded
    into GroupState) and restored into a fresh interpreter before the
    next, so hook code reads/writes them exactly like the reference's
    persistent runtime globals.

    Timer semantics: each configured timer handler fires once per
    micro-batch per active key AFTER that batch's events — the
    processing-time analogue of the reference's interval timers (a
    micro-batch IS the trigger interval).  ``idle_flush_secs`` arms a
    processing-time state timeout: a key idle that long gets its
    ``hooks.shutdown`` called (with emit) and its state dropped — the
    stream rendering of shutdown-on-stop.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    _lua = make_stream_lua_fn(cfg, out_schema, state_globals, idle_flush_secs)
    return df.groupBy(*key_fields).applyInPandasWithState(
        _lua,
        outputStructType=out_schema,
        stateStructType="g string",
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_flush_secs
            else GroupStateTimeout.NoTimeout
        ),
    )
