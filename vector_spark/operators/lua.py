"""The `lua` transform — real Lua hook sources over Arrow batches.

Reference semantics rebuilt here:

- v2 (src/transforms/lua/v2/mod.rs): ``hooks.init(emit)`` before the
  first event, ``hooks.process(event, emit)`` per event (0..N emits),
  ``hooks.shutdown(emit)`` at end; events are tables shaped
  ``{log = {...}}`` / ``{metric = {...}}`` (vector_core::event::lua);
  a hook is inline Lua evaluating to a function or the name of a global
  defined by ``source``; a runtime error in process drops that event.
- v1 (src/transforms/lua/v1/mod.rs:148-183): the chunk runs once per
  event with the event bound to the global ``event``; reads coerce
  values to strings (mod.rs:260-267 coerce_to_bytes), writes store
  typed string/integer/float/boolean and nil removes (mod.rs:214-254);
  setting ``event = nil`` (or erroring) drops the event.

Spark-first design: ONE interpreter per PARTITION (built inside
``mapInPandas``), hooks compiled once, events converted per Arrow
batch.  Deltas from the reference, by construction of the batch world:
the reference has a single global Lua state per transform — here state
(globals mutated by hooks) is per-partition, like every stateful
operator in this repo; timers (v2/mod.rs TimerConfig) are wall-clock in
the reference — in batch each timer handler fires once per partition at
flush time, before shutdown (the counter-flush idiom the docs use them
for).  Because state is partition-local, Spark parallelizes the Lua
stage across partitions — the reference's mlua runtime is inherently
single-threaded per transform.

The interpreter itself is the repo's from-scratch Lua runtime
(vector_spark/lua/) — AST closure-compiled once per partition
(lua/compiler.py), ~52k events/s/core on the contract hook.  Still the
slow path by design, exactly as Lua is in the reference; everything
expressible as Columns should use remap/VRL instead (functions/vrl.py).
"""

from __future__ import annotations

import datetime as _dt
import math
from dataclasses import dataclass
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from vector_spark.lua import (
    LuaError,
    LuaFunction,
    LuaRuntime,
    LuaTable,
    fmt_number,
    lua_type,
)


@dataclass(frozen=True)
class LuaTransformConfig:
    """Mirror of the reference's LuaConfig (v2/mod.rs:52-95 /
    v1/mod.rs:27-37); all fields are plain strings so the config
    pickles into executors."""

    version: str = "2"
    source: str | None = None
    process: str | None = None      # v2 hooks.process (required for v2)
    init: str | None = None         # v2 hooks.init
    shutdown: str | None = None     # v2 hooks.shutdown
    search_dirs: tuple = ()
    timers: tuple = ()              # ((interval_seconds, handler), ...)

    def __post_init__(self):
        if self.version == "2" and not self.process:
            raise ValueError("lua v2 requires hooks.process")
        if self.version == "1" and not self.source:
            raise ValueError("lua v1 requires source")


# ----------------------------------------------------------------------
# python <-> lua value conversion
# ----------------------------------------------------------------------

def py_to_lua(v):
    """Host value -> Lua value (input side).  Timestamps become
    os.date-style tables, the same shape vector_core::event::lua gives
    Lua scripts."""
    t = type(v)  # exact-type fast path first (the per-field hot loop)
    if t is str or t is int or t is bool:
        return v
    if t is float:
        return None if v != v else v
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, str)):
        return v
    if isinstance(v, float):
        return None if math.isnan(v) else v
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    if isinstance(v, _dt.datetime):
        return LuaTable([
            ("year", v.year), ("month", v.month), ("day", v.day),
            ("hour", v.hour), ("min", v.minute), ("sec", v.second),
            ("nanosec", v.microsecond * 1000), ("isdst", False),
        ])
    if isinstance(v, _dt.date):
        return LuaTable([("year", v.year), ("month", v.month), ("day", v.day)])
    if isinstance(v, dict):
        return LuaTable([(str(k), py_to_lua(x)) for k, x in v.items()])
    if isinstance(v, (list, tuple)):
        return LuaTable([(i, py_to_lua(x)) for i, x in enumerate(v, 1)])
    # numpy scalars / arrays / pandas timestamps
    item = getattr(v, "item", None)
    if item is not None and not hasattr(v, "__len__"):
        try:
            return py_to_lua(item())
        except Exception:
            pass
    if hasattr(v, "tolist"):
        return py_to_lua(v.tolist())
    if hasattr(v, "to_pydatetime"):
        return py_to_lua(v.to_pydatetime())
    return str(v)


def _key_str(k):
    """Event field keys must be strings — same rule as the reference's
    event userdata (its test asserts 'error converting Lua boolean to
    String' for ``event.log[false] = ...``)."""
    if isinstance(k, str):
        return k
    if isinstance(k, int) and not isinstance(k, bool):
        return k  # array part — kept as position
    raise LuaError(f"error converting Lua {lua_type(k)} to String")


def lua_to_py(v):
    """Lua value -> plain python (emit side).  Tables with exactly keys
    1..n become lists; otherwise dicts with string keys (non-string,
    non-positional keys raise, mirroring the reference's conversion
    errors).  Function values are dropped like v1's invalid-type rule."""
    t = type(v)
    if t is str or t is int or t is float or t is bool or v is None:
        return v
    if isinstance(v, (bool, int, float, str)):
        return v
    if isinstance(v, LuaTable):
        keys = v.lua_keys()
        n = v.length()
        if keys and len(keys) == n and all(
                isinstance(k, int) and not isinstance(k, bool) and 1 <= k <= n
                for k in keys):
            return [lua_to_py(v.get(i)) for i in range(1, n + 1)]
        out = {}
        for k in keys:
            ks = _key_str(k)
            val = v.get(k)
            if isinstance(val, LuaFunction) or callable(val):
                continue  # v1/mod.rs:240-248: invalid type -> field dropped
            out[str(ks)] = lua_to_py(val)
        return out
    if isinstance(v, LuaFunction) or callable(v):
        return None
    return str(v)


def state_encode(v):
    """Lua value -> JSON-able with type-tagged table keys.

    The stream_lua cross-batch state persist cannot go through
    lua_to_py/json: a table with non-sequential integer keys would
    round-trip with STRING keys (t[42] -> t['42']), silently corrupting
    state.  This codec tags every table entry's key so integer, float,
    boolean and string keys all survive exactly.  Function values are
    dropped (not serializable), matching the v1 invalid-type rule."""
    if isinstance(v, LuaTable):
        items = []
        for k in v.lua_keys():
            val = v.get(k)
            if isinstance(val, LuaFunction) or callable(val):
                continue
            items.append([state_encode(k), state_encode(val)])
        return {"t": "tbl", "v": items}
    if isinstance(v, bool):
        return {"t": "b", "v": v}
    if isinstance(v, int):
        return {"t": "i", "v": v}
    if isinstance(v, float):
        return {"t": "f", "v": v}
    if isinstance(v, str):
        return {"t": "s", "v": v}
    if v is None or isinstance(v, LuaFunction) or callable(v):
        return {"t": "nil"}
    return {"t": "s", "v": str(v)}


def state_decode(d):
    """Inverse of :func:`state_encode`.

    Backward compatible with checkpoints written before the type-tagged
    format (plain ``lua_to_py`` JSON values): anything that is not a
    tagged dict decodes through :func:`py_to_lua`, so a resumed stream
    restores legacy state instead of crashing its worker."""
    tagged = (isinstance(d, dict) and set(d) <= {"t", "v"}
              and d.get("t") in ("tbl", "b", "i", "f", "s", "nil"))
    if not tagged:
        return py_to_lua(d)
    t = d["t"]
    if t == "tbl":
        return LuaTable([(state_decode(k), state_decode(val))
                         for k, val in d["v"]])
    if t == "nil":
        return None
    return d["v"]


def _table_to_datetime(t) -> _dt.datetime | None:
    if isinstance(t, LuaTable) and t.get("year") is not None:
        return _dt.datetime(
            int(t.get("year")), int(t.get("month") or 1), int(t.get("day") or 1),
            int(t.get("hour") or 0), int(t.get("min") or 0), int(t.get("sec") or 0),
            int(t.get("nanosec") or 0) // 1000)
    return None


def _coerce(v, dtype):
    """Schema-driven coercion of an emitted python value to the declared
    Spark type (the lua stage has no static types; the declared sink
    schema is the contract)."""
    if v is None:
        return None
    if isinstance(dtype, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        if isinstance(v, bool):
            return int(v)
        if isinstance(v, (int, float)):
            return int(v)
        if isinstance(v, str):
            try:
                return int(float(v)) if "." in v else int(v)
            except ValueError:
                return None
        return None
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        if isinstance(v, bool):
            return float(v)
        if isinstance(v, (int, float)):
            return float(v)
        if isinstance(v, str):
            try:
                return float(v)
            except ValueError:
                return None
        return None
    if isinstance(dtype, T.StringType):
        return _coerce_str(v)
    if isinstance(dtype, T.BooleanType):
        return v if isinstance(v, bool) else None
    if isinstance(dtype, T.TimestampType):
        if isinstance(v, _dt.datetime):
            return v
        if isinstance(v, dict):
            return _table_to_datetime_dict(v)
        if isinstance(v, (int, float)):
            return _dt.datetime.fromtimestamp(float(v), _dt.timezone.utc).replace(tzinfo=None)
        return None
    if isinstance(dtype, T.ArrayType):
        if isinstance(v, list):
            return [_coerce(x, dtype.elementType) for x in v]
        return None
    if isinstance(dtype, T.MapType):
        if isinstance(v, dict):
            return {k: _coerce(x, dtype.valueType) for k, x in v.items()}
        return None
    if isinstance(dtype, T.StructType):
        if isinstance(v, dict):
            return tuple(_coerce(v.get(f.name), f.dataType) for f in dtype.fields)
        return None
    return v


def _table_to_datetime_dict(d: dict) -> _dt.datetime | None:
    if "year" not in d:
        return None
    return _dt.datetime(
        int(d["year"]), int(d.get("month") or 1), int(d.get("day") or 1),
        int(d.get("hour") or 0), int(d.get("min") or 0), int(d.get("sec") or 0),
        int(d.get("nanosec") or 0) // 1000)


def _coerce_str(v) -> str | None:
    """The v1 read coercion (Value::coerce_to_bytes): numbers render
    decimal, booleans ``true``/``false``, nested values as JSON."""
    if v is None:
        return None
    if isinstance(v, str):
        return v
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return fmt_number(v)
    if isinstance(v, _dt.datetime):
        return v.isoformat() + "Z"
    if isinstance(v, (dict, list)):
        import json

        return json.dumps(v, separators=(",", ":"), default=str)
    return str(v)


# ----------------------------------------------------------------------
# v1 event userdata
# ----------------------------------------------------------------------

class V1Event:
    """The v1 transform's event userdata (v1/mod.rs:214-299): reads
    return the field coerced to a string; writes accept
    string/integer/float/boolean, nil removes, any other type drops the
    field; pairs iterates (key, coerced string)."""

    __slots__ = ("fields",)

    def __init__(self, fields: dict):
        self.fields = dict(fields)

    def lua_index(self, key):
        if not isinstance(key, str):
            raise LuaError(f"error converting Lua {lua_type(key)} to String")
        v = self.fields.get(key)
        return None if v is None else _coerce_str(v)

    def lua_newindex(self, key, value):
        if not isinstance(key, str):
            raise LuaError(f"error converting Lua {lua_type(key)} to String")
        if value is None:
            self.fields.pop(key, None)
        elif isinstance(value, (str, int, float, bool)):
            self.fields[key] = value
        elif isinstance(value, LuaTable):
            self.fields.pop(key, None)  # invalid type: field dropped
        else:
            self.fields.pop(key, None)

    def lua_pairs(self):
        return [(k, _coerce_str(v)) for k, v in self.fields.items()]

    def lua_len(self):
        return len(self.fields)


# ----------------------------------------------------------------------
# the transform
# ----------------------------------------------------------------------

def _build_runtime(cfg: LuaTransformConfig):
    rt = LuaRuntime(search_dirs=cfg.search_dirs)
    hooks: dict = {}
    if cfg.version == "1":
        # the chunk is the per-event program, compiled once (v1/mod.rs:137)
        hooks["chunk"] = rt.compile(cfg.source, "source")
        return rt, hooks
    if cfg.source:
        rt.run(cfg.source, chunkname="source")
    hooks["process"] = rt.eval_hook(cfg.process, "hooks.process")
    if cfg.init:
        hooks["init"] = rt.eval_hook(cfg.init, "hooks.init")
    if cfg.shutdown:
        hooks["shutdown"] = rt.eval_hook(cfg.shutdown, "hooks.shutdown")
    hooks["timers"] = [rt.eval_hook(h, "timer") for _secs, h in cfg.timers]
    return rt, hooks


def _make_event(row: dict) -> LuaTable:
    """Wrap an input row as a v2 event table.  A row that already has an
    event shape (a ``log`` or ``metric`` struct column) passes through;
    a flat row becomes ``{log = row}``."""
    if "log" in row or "metric" in row:
        ev = LuaTable()
        if row.get("log") is not None:
            ev.set("log", py_to_lua(_plain(row["log"])))
        if row.get("metric") is not None:
            ev.set("metric", py_to_lua(_plain(row["metric"])))
        return ev
    return LuaTable([("log", py_to_lua(row))])


def _plain(v):
    """pyspark Row / numpy -> plain dict/list for py_to_lua."""
    if hasattr(v, "asDict"):
        return {k: _plain(x) for k, x in v.asDict().items()}
    if isinstance(v, dict):
        return {k: _plain(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_plain(x) for x in v]
    return v


def _event_to_rowdict(ev, version: str) -> dict:
    """Emitted event -> plain nested dict with 'log'/'metric' keys (v2)
    or the flat field dict (v1)."""
    if version == "1":
        return dict(ev.fields) if isinstance(ev, V1Event) else lua_to_py(ev)
    if not isinstance(ev, LuaTable):
        raise LuaError(f"emitted event must be a table, got {lua_type(ev)}")
    out = {}
    log = ev.get("log")
    metric = ev.get("metric")
    if log is not None:
        out["log"] = lua_to_py(log)
    if metric is not None:
        out["metric"] = lua_to_py(metric)
    return out


def _project(evdict: dict, schema: T.StructType, version: str):
    """Emitted event dict -> output row tuple per the declared schema.
    Schemas with a ``log``/``metric`` struct field keep the event shape;
    flat schemas pull fields from the log part (metric part if no log)."""
    names = {f.name for f in schema.fields}
    if names & {"log", "metric"} and version != "1":
        return tuple(_coerce(evdict.get(f.name), f.dataType) for f in schema.fields)
    flat = evdict if version == "1" else (
        evdict.get("log") if evdict.get("log") is not None else evdict.get("metric") or {})
    return tuple(_coerce(flat.get(f.name), f.dataType) for f in schema.fields)


def run_lua_events(
    cfg: LuaTransformConfig,
    rows: list[dict],
    strict: bool = False,
) -> list[dict]:
    """Driver-side single-state run over plain dict rows; returns emitted
    event dicts (v2: {'log': ...}/{'metric': ...}; v1: flat).  This is
    the unit-test surface (≅ transform.process_single in the reference's
    tests) and the schema-inference path.  ``strict`` re-raises hook
    errors instead of dropping the event."""
    rt, hooks = _build_runtime(cfg)
    out: list[dict] = []

    try:
        if cfg.version == "1":
            for row in rows:
                ev = V1Event(row)
                rt.globals.set("event", ev)
                try:
                    hooks["chunk"]()
                except LuaError:
                    if strict:
                        raise
                    continue  # script error: event dropped (v1/mod.rs:174-180)
                res = rt.globals.get("event")
                if res is None:
                    continue  # event = nil drops the event
                out.append(_event_to_rowdict(res, "1"))
            return out

        def emit(ev=None):
            out.append(_event_to_rowdict(ev, cfg.version))

        inited = False
        for row in rows:
            if not inited:
                if "init" in hooks:
                    rt.call(hooks["init"], emit)
                inited = True
            try:
                rt.call(hooks["process"], _make_event(row), emit)
            except LuaError:
                if strict:
                    raise
                continue
        if rows:
            for t in hooks["timers"]:
                rt.call(t, emit)
            if "shutdown" in hooks:
                rt.call(hooks["shutdown"], emit)
        return out
    finally:
        rt.close_coroutines()


def _infer_schema(events: list[dict]) -> T.StructType:
    """Merge-infer a StructType from emitted event dicts (first-seen key
    order; int->long, float->double, None-only -> string)."""

    def typ(values):
        vals = [v for v in values if v is not None]
        if not vals:
            return T.StringType()
        v = vals[0]
        if isinstance(v, bool):
            return T.BooleanType()
        if isinstance(v, int):
            # any float among the samples promotes the column
            if any(isinstance(x, float) for x in vals):
                return T.DoubleType()
            return T.LongType()
        if isinstance(v, float):
            return T.DoubleType()
        if isinstance(v, str):
            return T.StringType()
        if isinstance(v, _dt.datetime):
            return T.TimestampType()
        if isinstance(v, dict):
            return struct(vals)
        if isinstance(v, list):
            elems = [e for x in vals for e in x]
            return T.ArrayType(typ(elems) if elems else T.StringType())
        return T.StringType()

    def struct(dicts):
        keys: list[str] = []
        for d in dicts:
            for k in d:
                if k not in keys:
                    keys.append(k)
        return T.StructType([
            T.StructField(k, typ([d.get(k) for d in dicts if k in d]), True)
            for k in keys
        ])

    if not events:
        raise ValueError(
            "lua transform emitted no events from the sample; pass an "
            "explicit schema=")
    return struct(events)


def lua_transform(
    df: DataFrame,
    cfg: LuaTransformConfig,
    schema: T.StructType | str | None = None,
    sample_rows: int = 100,
    num_partitions: int | None = None,
    error_channel: bool = False,
) -> DataFrame:
    """Run the lua transform over ``df``.

    ``error_channel=True`` appends a nullable ``_lua_error`` column: a
    hook error, instead of silently dropping the event (the reference
    emits a rate-limited LuaScriptError log and drops, v1/mod.rs:174-180
    / v2/mod.rs:39-41), emits ONE row carrying the input fields that
    match the schema plus the error text — the same dropped-port idiom
    as remap_grok, so a topology can route failures to a sink.

    ``schema`` declares the output (DDL string or StructType).  With
    ``schema=None`` the hooks run driver-side over up to ``sample_rows``
    input rows to infer it — convenient for configs/tests; declare it
    for production topologies (the sample costs one extra job and a
    fresh Lua state sees the sample first).

    ``num_partitions``: the interpreter is CPU-bound Python, so its
    parallelism is exactly the input partition count — a single small
    parquet file would otherwise serialize the whole stage onto one
    task.  Set it (usually ``spark.sparkContext.defaultParallelism``)
    to round-robin repartition before the Lua stage; the narrow
    pre-Lua exchange is far cheaper than an idle cluster.  None keeps
    the input partitioning (right when upstream already fanned out).
    """
    if schema is None:
        sample = [r.asDict(recursive=True) for r in df.limit(sample_rows).collect()]
        emitted = run_lua_events(cfg, sample)
        version = cfg.version
        if version == "1":
            schema = _infer_schema(emitted)
        else:
            # flat log-shaped output unless metrics were emitted
            flats = [e.get("log") if e.get("log") is not None else e for e in emitted]
            if any(e.get("metric") is not None for e in emitted):
                schema = _infer_schema(emitted)
            else:
                schema = _infer_schema([f for f in flats if isinstance(f, dict)])
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    out_schema = schema
    if error_channel:
        out_schema = T.StructType(
            list(out_schema.fields)
            + [T.StructField("_lua_error", T.StringType(), True)])
    version = cfg.version
    names = [f.name for f in out_schema.fields]
    if num_partitions:
        df = df.repartition(num_partitions)

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rt, hooks = _build_runtime(cfg)
        pending: list[tuple] = []

        def failed(row, err):
            if error_channel:
                # input fields matching the schema pass through; the
                # error text rides the _lua_error column
                pending.append(tuple(
                    _coerce(row.get(f.name), f.dataType)
                    for f in out_schema.fields[:-1]
                ) + (str(err),))

        if version == "1":
            def handle(row):
                ev = V1Event(row)
                rt.globals.set("event", ev)
                try:
                    hooks["chunk"]()
                except LuaError as e:
                    failed(row, e)
                    return
                res = rt.globals.get("event")
                if res is not None:
                    pending.append(_project(_event_to_rowdict(res, "1"), out_schema, "1"))
        else:
            def emit(ev=None):
                pending.append(_project(_event_to_rowdict(ev, version), out_schema, version))

            state = {"inited": False}

            def handle(row):
                if not state["inited"]:
                    if "init" in hooks:
                        rt.call(hooks["init"], emit)
                    state["inited"] = True
                try:
                    rt.call(hooks["process"], _make_event(row), emit)
                except LuaError as e:
                    failed(row, e)  # drop (v2/mod.rs:39-41) or error row

        try:
            saw_rows = False
            for pdf in batches:
                for row in pdf.to_dict("records"):
                    saw_rows = True
                    handle({k: _np_plain(v) for k, v in row.items()})
                if pending:
                    yield pd.DataFrame(pending, columns=names, dtype=object)
                    pending = []
            if version != "1" and saw_rows:
                for t in hooks.get("timers", []):
                    rt.call(t, emit)
                if "shutdown" in hooks:
                    rt.call(hooks["shutdown"], emit)
            if pending:
                yield pd.DataFrame(pending, columns=names, dtype=object)
        finally:
            # release suspended-coroutine threads before the worker is
            # reused for the next partition (ADVICE r4: abandoned
            # coroutines each pinned one OS thread for the executor's
            # lifetime)
            rt.close_coroutines()

    return df.mapInPandas(_run, schema=out_schema)


def _np_plain(v):
    """numpy/pandas scalar -> plain python for the event builder."""
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    item = getattr(v, "item", None)
    if item is not None and not isinstance(v, (str, bytes)) and not hasattr(v, "__len__"):
        try:
            v = item()
        except Exception:
            pass
    if hasattr(v, "tolist"):
        v = v.tolist()
    if isinstance(v, float) and math.isnan(v):
        return None
    return v
