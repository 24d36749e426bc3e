"""The `lua` transform over Spark: mapInPandas execution, schema
inference, topology/TOML front-door wiring, and the reference's lua
behavior corpus (tests/behavior/transforms/lua_v1.toml + lua_v2.toml)
run through the `vector test` harness via configs/lua_tests.toml.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from vector_spark.config import load_config
from vector_spark.config_tests import run_config_tests
from vector_spark.operators.lua import LuaTransformConfig, lua_transform
from vector_spark.topology import build_topology


def test_lua_transform_extract(spark):
    df = spark.createDataFrame(
        [("Hello, my name is Bob.",), ("Hello, my name is Alice.",),
         ("no match",)], "message string")
    cfg = LuaTransformConfig(version="2", process="""function (event, emit)
        local _, _, name = string.find(event.log.message, "Hello, my name is (%a+).")
        if name ~= nil then
          event.log.name = name
          emit(event)
        end
    end""")
    out = lua_transform(df, cfg, schema="message string, name string")
    rows = sorted(tuple(r) for r in out.collect())
    assert rows == [("Hello, my name is Alice.", "Alice"),
                    ("Hello, my name is Bob.", "Bob")]


def test_lua_transform_schema_inference(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "n long, s string")
    cfg = LuaTransformConfig(
        version="2",
        process="function (event, emit) event.log.twice = event.log.n * 2 emit(event) end")
    out = lua_transform(df, cfg)  # no schema: driver-side sample infers
    assert set(out.columns) == {"n", "s", "twice"}
    assert dict(out.select("n", "twice").collect()[0].asDict())["twice"] in (2, 4)
    assert out.count() == 2


def test_lua_transform_fanout_and_drop(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "v long")
    cfg = LuaTransformConfig(version="2", process="""function (event, emit)
        if event.log.v % 2 == 0 then
          emit(event)
          emit(event)
        end
    end""")
    out = lua_transform(df, cfg, schema="v long")
    assert out.count() == 10  # 5 even values, emitted twice each


def test_lua_transform_partition_state(spark):
    # per-partition counter flush (the single global state of the
    # reference becomes one state per partition — coalesce(1) makes the
    # batch deterministic)
    df = spark.createDataFrame([(i,) for i in range(7)], "v long").coalesce(1)
    cfg = LuaTransformConfig(
        version="2",
        source=("count = 0\n"
                "function p(event, emit) count = count + 1 end\n"
                "function f(emit) emit({metric = {name = 'n', "
                "counter = {value = count}}}) end"),
        process="p", shutdown="f")
    out = lua_transform(
        df, cfg,
        schema="metric struct<name:string, counter:struct<value:double>>")
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["metric"]["counter"]["value"] == 7.0


def test_lua_transform_metric_mutation(spark):
    mdf = spark.createDataFrame(
        [Row(metric=Row(name="example counter", kind="absolute",
                        counter=Row(value=1.0)))])
    cfg = LuaTransformConfig(version="2", process="""function (event, emit)
        event.metric.counter.value = event.metric.counter.value + 1
        emit(event)
    end""")
    out = lua_transform(mdf, cfg, schema=mdf.schema)
    assert out.collect()[0]["metric"]["counter"]["value"] == 2.0


def test_lua_v1_through_topology(spark):
    df = spark.createDataFrame([("x",)], "a string")
    topo = build_topology(spark, {
        "sources": {"src": {"kind": "memory", "df": df}},
        "transforms": {
            "swap": {
                "kind": "lua",  # unversioned -> v1, like the reference
                "inputs": ["src"],
                "source": 'event["a"], event["b"] = nil, event["a"]',
                "schema": "a string, b string",
            },
        },
    })
    row = topo.outputs["swap"].collect()[0]
    assert row["a"] is None and row["b"] == "x"


def test_lua_behavior_corpus_via_config_tests(spark):
    """The reference's lua_v1.toml + lua_v2.toml behavior tests, adapted
    in configs/lua_tests.toml, all pass through the `vector test`
    harness."""
    cfg = load_config("configs/lua_tests.toml")
    results = run_config_tests(spark, cfg)
    failures = {r.name: r.errors for r in results if not r.passed}
    assert not failures, failures
    assert {r.name for r in results} == {
        "lua_v2_log", "lua_v2_source", "lua_v2_metric",
        "lua_v2_log_to_metric", "lua_v2_metric_to_log",
        "lua_unversioned", "lua_v1",
    }


def test_lua_requires_process_for_v2():
    with pytest.raises(ValueError):
        LuaTransformConfig(version="2", source="x = 1")


def test_stream_lua_state_across_batches(spark, tmp_path):
    """Streaming lua: named globals persist per key across micro-batches
    (maxFilesPerTrigger=1 forces two batches); timer handlers fire once
    per batch per key and see the accumulated state."""
    from pyspark.sql import functions as F  # noqa: F401

    from vector_spark.streaming import stream_from_directory, stream_lua

    src = tmp_path / "lua_in"
    src.mkdir()
    file_a = [("u1", 10), ("u1", 5), ("u2", 1)]
    file_b = [("u1", 2), ("u2", 3)]
    for name, rows in (("a", file_a), ("b", file_b)):
        spark.createDataFrame(rows, ["user", "v"]).coalesce(1).write.parquet(
            str(src / name))
    stream = stream_from_directory(
        spark, str(src) + "/*", "user string, v long", maxFilesPerTrigger="1")
    cfg = LuaTransformConfig(
        version="2",
        source=("total = 0\n"
                "user = ''\n"
                "function p(event, emit)\n"
                "  total = total + event.log.v\n"
                "  user = event.log.user\n"
                "end\n"
                "function tick(emit)\n"
                "  emit({log = {user = user, running_total = total}})\n"
                "end"),
        process="p",
        timers=((1, "tick"),))
    out = stream_lua(
        stream, cfg, key_fields=["user"],
        out_schema="user string, running_total long",
        state_globals=["total", "user"])
    q = (out.writeStream.format("memory").queryName("lua_stream_out")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {(r["user"], r["running_total"])
           for r in spark.sql("SELECT * FROM lua_stream_out").collect()}
    # batch 1 (file a): u1 total 15, u2 total 1
    # batch 2 (file b): u1 total 15+2=17 (state carried), u2 total 1+3=4
    assert {("u1", 15), ("u2", 1), ("u1", 17), ("u2", 4)} <= got
    assert ("u1", 2) not in got  # state NOT reset between batches


def test_lua_error_channel_dropped_port(spark):
    """error_channel=True: a hook error emits one _lua_error row instead
    of a silent drop; through the topology it becomes a `name.dropped`
    port, the remap_grok idiom."""
    df = spark.createDataFrame(
        [("ok", 1), (None, 2), ("ok", 3)], "s string, v long")
    topo = build_topology(spark, {
        "sources": {"src": {"kind": "memory", "df": df}},
        "transforms": {
            "up": {
                "kind": "lua", "inputs": ["src"], "error_channel": True,
                "schema": "s string, v long",
                "hooks": {"process": (
                    "function (event, emit)\n"
                    "  event.log.s = string.upper(event.log.s)\n"  # errors on nil
                    "  emit(event)\n"
                    "end")},
            },
        },
    })
    good = topo.outputs["up"].orderBy("v").collect()
    assert [r["v"] for r in good] == [1, 3]
    assert all(r["s"] == "OK" for r in good)
    dropped = topo.outputs["up.dropped"].collect()
    assert len(dropped) == 1 and dropped[0]["v"] == 2
    assert "string expected" in dropped[0]["_lua_error"] \
        or "nil" in dropped[0]["_lua_error"]


def test_stream_lua_timeout_flush_branch(spark):
    """The idle-timeout branch (shutdown-flush + state drop) unit-tested
    against a mock GroupState — the streaming-query path for timeouts
    needs wall-clock idle time, so the state machine is driven directly."""
    import json

    import pandas as pd

    from vector_spark.streaming import make_stream_lua_fn

    cfg = LuaTransformConfig(
        version="2",
        source=("n = 0\n"
                "function p(event, emit) n = n + 1 end\n"
                "function bye(emit) emit({log = {final_n = n}}) end"),
        process="p", shutdown="bye")
    fn = make_stream_lua_fn(cfg, "final_n long", ["n"], idle_flush_secs=60)

    class MockState:
        def __init__(self, blob=None, timed_out=False):
            self.blob = blob
            self.hasTimedOut = timed_out
            self.removed = False
            self.timeout_ms = None

        @property
        def exists(self):
            return self.blob is not None

        @property
        def get(self):
            return (self.blob,)

        def update(self, t):
            self.blob = t[0]

        def remove(self):
            self.removed = True

        def setTimeoutDuration(self, ms):
            self.timeout_ms = ms

    # batch 1: 3 events accumulate; state persisted; timeout armed
    st = MockState()
    out = list(fn(("k",), [pd.DataFrame({"v": [1, 2, 3]})], st))
    assert out == []  # process emits nothing
    # type-tagged persist format (ADVICE r4: plain json stringified
    # integer table keys)
    assert json.loads(st.blob) == {"n": {"t": "i", "v": 3}}
    assert st.timeout_ms == 60_000 and not st.removed

    # idle timeout: shutdown flushes the restored count, state dropped
    st2 = MockState(blob=st.blob, timed_out=True)
    frames = list(fn(("k",), iter(()), st2))
    assert st2.removed
    assert len(frames) == 1
    assert frames[0].iloc[0]["final_n"] == 3


def test_stream_lua_int_keyed_state_roundtrip(spark):
    """A Lua table with non-sequential INTEGER keys must survive the
    cross-batch state persist exactly (ADVICE r4 medium: the old
    json path restored t[42] as t['42'])."""
    import pandas as pd

    from vector_spark.streaming import make_stream_lua_fn

    cfg = LuaTransformConfig(
        version="2",
        source=(
            "seen = {}\n"
            "function p(event, emit)\n"
            "  seen[event.log.v] = (seen[event.log.v] or 0) + 1\n"
            "end\n"
            "function bye(emit)\n"
            "  emit({log = {c42 = seen[42] or -1, c7 = seen[7] or -1}})\n"
            "end"),
        process="p", shutdown="bye")
    fn = make_stream_lua_fn(cfg, "c42 long, c7 long", ["seen"],
                            idle_flush_secs=60)

    class MockState:
        def __init__(self, blob=None, timed_out=False):
            self.blob = blob
            self.hasTimedOut = timed_out
            self.removed = False

        @property
        def exists(self):
            return self.blob is not None

        @property
        def get(self):
            return (self.blob,)

        def update(self, t):
            self.blob = t[0]

        def remove(self):
            self.removed = True

        def setTimeoutDuration(self, ms):
            pass

    st = MockState()
    list(fn(("k",), [pd.DataFrame({"v": [42, 42, 7]})], st))
    # batch 2 restores state and counts one more 42
    st2 = MockState(blob=st.blob)
    list(fn(("k",), [pd.DataFrame({"v": [42]})], st2))
    # timeout flush reads the restored int-keyed table
    st3 = MockState(blob=st2.blob, timed_out=True)
    frames = list(fn(("k",), iter(()), st3))
    assert frames[0].iloc[0]["c42"] == 3
    assert frames[0].iloc[0]["c7"] == 1
