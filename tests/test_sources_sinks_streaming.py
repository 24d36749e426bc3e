"""Sources/codecs, sinks/encoders, and Structured Streaming parity tests."""

from __future__ import annotations

import json

from pyspark.sql import functions as F


def test_read_lines_and_syslog_decode(spark, tmp_path):
    from vector_spark.sources import decode_syslog, read_lines

    p = tmp_path / "syslog.log"
    p.write_text(
        "<165>1 2020-10-02T23:22:12Z host1 app1 1234 ID47 something happened\n"
        "garbage line\n"
    )
    df = decode_syslog(read_lines(spark, str(p)))
    rows = {r["message"]: r for r in df.collect()}
    ok = rows["<165>1 2020-10-02T23:22:12Z host1 app1 1234 ID47 something happened"]
    assert ok["syslog_priority"] == 165
    assert ok["syslog_facility"] == 20 and ok["syslog_severity"] == 5
    assert ok["syslog_hostname"] == "host1" and ok["syslog_message"] == "something happened"
    assert ok["_decode_error"] is None
    assert rows["garbage line"]["_decode_error"] == "invalid syslog"


def test_character_delimited_framing(spark, tmp_path):
    from vector_spark.sources import read_character_delimited

    p = tmp_path / "frames.dat"
    p.write_text("one\x00two\x00three")
    df = read_character_delimited(spark, str(p), "\x00")
    assert sorted(r["message"] for r in df.collect()) == ["one", "three", "two"]


def test_gelf_decode(spark, tmp_path):
    from vector_spark.sources import decode_gelf, read_lines

    p = tmp_path / "gelf.log"
    p.write_text(
        json.dumps({"version": "1.1", "host": "h", "short_message": "hi"}) + "\n"
        + json.dumps({"version": "1.1", "short_message": "orphan"}) + "\n"
    )
    df = decode_gelf(read_lines(spark, str(p)))
    rows = sorted(df.collect(), key=lambda r: r["short_message"])
    assert rows[0]["_decode_error"] is None and rows[0]["level"] == 1
    assert "missing host" in rows[1]["_decode_error"]


def test_encoders(spark):
    from vector_spark.sinks import (
        encode_csv_rows,
        encode_json_rows,
        encode_logfmt_rows,
        encode_text_rows,
    )

    df = spark.createDataFrame([("hello, world", 5)], ["message", "n"])
    assert json.loads(encode_json_rows(df).first()["value"]) == {"message": "hello, world", "n": 5}
    assert encode_text_rows(df).first()["value"] == "hello, world"
    assert encode_logfmt_rows(df).first()["value"] == "message=hello, world n=5"
    assert encode_csv_rows(df).first()["value"] == '"hello, world",5'


def test_file_sink_roundtrip(spark, tmp_path):
    from vector_spark.sinks import write_file_sink

    df = spark.createDataFrame([("a", 1), ("b", 2)], ["k", "v"])
    out = tmp_path / "sink"
    write_file_sink(df, str(out), encoding="json")
    back = [json.loads(r["value"]) for r in spark.read.text(str(out)).collect()]
    assert sorted(back, key=lambda d: d["k"]) == [{"k": "a", "v": 1}, {"k": "b", "v": 2}]


def test_streaming_aggregate_matches_batch(spark, tmp_path):
    """Streaming tumbling-window aggregate (availableNow) must equal the
    batch group-by on the same data — the §2.6 flush-state equivalence."""
    from vector_spark.streaming import stream_aggregate, stream_from_directory

    src = tmp_path / "metrics_in"
    rows = [
        ("c", "incremental", 1.0, "2024-01-01 00:00:01"),
        ("c", "incremental", 2.0, "2024-01-01 00:00:03"),
        ("g", "absolute", 5.0, "2024-01-01 00:00:02"),
        ("g", "absolute", 7.0, "2024-01-01 00:00:04"),
    ]
    df = spark.createDataFrame(rows, ["name", "kind", "value", "ts_s"]).select(
        "name", "kind", "value", F.to_timestamp("ts_s").alias("ts")
    )
    df.write.parquet(str(src))
    stream = stream_from_directory(
        spark, str(src), "name string, kind string, value double, ts timestamp"
    )
    agg = stream_aggregate(stream, interval_secs=10)
    q = (
        agg.writeStream.format("memory")
        .queryName("agg_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["name"]: r for r in spark.sql("SELECT * FROM agg_out").collect()}
    assert got["c"]["sum_incremental"] == 3.0
    assert got["g"]["last_absolute"] == 7.0


def test_streaming_route_fanout(spark, tmp_path):
    from vector_spark.streaming import stream_from_directory, stream_route_to_sinks

    src = tmp_path / "logs_in"
    spark.createDataFrame(
        [("e1", "ERROR"), ("w1", "WARN"), ("i1", "INFO")], ["id", "level"]
    ).write.parquet(str(src))
    stream = stream_from_directory(spark, str(src), "id string, level string")
    q = stream_route_to_sinks(
        stream,
        {"errors": F.col("level") == "ERROR", "warnings": F.col("level") == "WARN"},
        str(tmp_path / "routed"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "routed"))
    got = {r["route_key"]: r["id"] for r in out.collect()}
    assert got == {"errors": "e1", "warnings": "w1", "_unmatched": "i1"}


def test_templated_file_sink(spark, tmp_path):
    from vector_spark.sinks import write_templated_file_sink

    df = spark.createDataFrame(
        [("app", "e1", "2024-03-05 10:00:00"), ("web", "e2", "2024-03-06 11:00:00")],
        ["svc", "id", "ts_s"],
    ).select("svc", "id", F.to_timestamp("ts_s").alias("ts"))
    out = tmp_path / "templated"
    write_templated_file_sink(
        df.drop("ts").withColumn("day", F.lit("d")), str(out),
        "svc={{ svc }}", encoding="json",
    )
    import os
    dirs = sorted(d for d in os.listdir(out) if d.startswith("_path="))
    assert dirs == ["_path=svc%3Dapp", "_path=svc%3Dweb"]


def test_stream_throttle_state(spark, tmp_path):
    """applyInPandasWithState throttle: at most N per key-window across the
    stream, equal to the batch throttle on the same input."""
    from vector_spark.operators import throttle as batch_throttle
    from vector_spark.streaming import stream_from_directory, stream_throttle

    src = tmp_path / "th_in"
    rows = [("u1", f"2024-01-01 00:00:0{i}") for i in range(5)] + [
        ("u2", "2024-01-01 00:00:01"),
        ("u1", "2024-01-01 01:00:01"),
    ]
    df = spark.createDataFrame(rows, ["key", "ts_s"]).select(
        "key", F.to_timestamp("ts_s").alias("ts")
    )
    df.write.parquet(str(src))
    stream = stream_from_directory(spark, str(src), "key string, ts timestamp")
    out = stream_throttle(stream, threshold=2, window_secs=3600, key_field="key")
    q = (
        out.writeStream.format("memory").queryName("th_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM th_out").collect()
    batch = batch_throttle(df, threshold=2, window_secs=3600, ts_col="ts", key_field="key").collect()
    assert len(got) == len(batch) == 4  # u1: 2 + 1 (next window); u2: 1
    per_key = {}
    for r in got:
        per_key.setdefault(r["key"], 0)
        per_key[r["key"]] += 1
    assert per_key == {"u1": 3, "u2": 1}


def test_stream_dedupe_state(spark, tmp_path):
    """applyInPandasWithState dedupe: one row per key tuple across the
    stream, equal to the batch dedupe on the same input."""
    from vector_spark.streaming import stream_dedupe, stream_from_directory

    src = tmp_path / "dedupe_in"
    rows = [(i, f"u{i % 3}", "login" if i % 2 == 0 else "click") for i in range(12)]
    spark.createDataFrame(rows, ["event_id", "user", "etype"]).write.parquet(str(src))
    stream = stream_from_directory(
        spark, str(src), "event_id long, user string, etype string"
    )
    out = stream_dedupe(stream, ["user", "etype"])
    q = (
        out.writeStream.format("memory")
        .queryName("dedupe_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT user, etype FROM dedupe_out").collect()
    keys = {(r["user"], r["etype"]) for r in got}
    assert len(got) == len(keys) == 6  # 3 users x 2 types, one row each


def test_stream_reduce_state(spark, tmp_path):
    """applyInPandasWithState reduce: sessions close on ends_when markers,
    partial merges carry across micro-batches (maxFilesPerTrigger=1), and
    closed sessions equal the batch reduce_events on the same input."""
    from vector_spark.operators.reduce import reduce_events
    from vector_spark.streaming import stream_from_directory, stream_reduce

    src = tmp_path / "red_in"
    src.mkdir()
    # two files -> two micro-batches; u1's first session SPANS the batch
    # boundary (open after file A, closed by the marker in file B)
    file_a = [
        ("u1", "2024-01-01 00:00:01", 10, "a", False),
        ("u1", "2024-01-01 00:00:02", 5, "b", False),
        ("u2", "2024-01-01 00:00:03", 1, "x", True),
    ]
    file_b = [
        ("u1", "2024-01-01 00:00:04", 2, "c", True),
        ("u1", "2024-01-01 00:00:05", 7, "d", True),
        ("u2", "2024-01-01 00:00:06", 3, "y", True),
    ]
    schema = ["user", "ts_s", "value", "msg", "is_end"]
    for name, rows in (("a", file_a), ("b", file_b)):
        spark.createDataFrame(rows, schema).select(
            "user", F.to_timestamp("ts_s").alias("ts"), "value", "msg", "is_end"
        ).coalesce(1).write.parquet(str(src / name))
    stream = stream_from_directory(
        spark,
        str(src) + "/*",
        "user string, ts timestamp, value long, msg string, is_end boolean",
        maxFilesPerTrigger="1",
    )
    out = stream_reduce(
        stream,
        group_by=["user"],
        ends_when_col="is_end",
        merge_strategies={"msg": "concat"},
        order_col="ts",
    )
    q = (
        out.writeStream.format("memory").queryName("red_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        (r["user"], r["msg"]): (r["value"], r["n_events"])
        for r in spark.sql("SELECT * FROM red_out").collect()
    }
    # all sessions end with a marker -> streaming == batch sessionization
    batch_df = spark.read.parquet(str(src / "a"), str(src / "b"))
    batch = reduce_events(
        batch_df.drop("is_end").join(batch_df.select("user", "ts", "is_end"), ["user", "ts"]),
        group_by=["user"],
        merge_strategies={"msg": "concat", "is_end": "retain"},
        order_col="ts",
        ends_when=F.col("is_end"),
    )
    expect = {
        (r["user"], r["msg"]): r["value"] for r in batch.collect()
    }
    assert got == {
        ("u1", "a b c"): (17, 3),
        ("u1", "d"): (7, 1),
        ("u2", "x"): (1, 1),
        ("u2", "y"): (3, 1),
    }
    assert {k: v for k, (v, _) in got.items()} == expect


def test_frame_octet_counting(spark):
    """RFC 6587 octet-counting framing: '<LEN> <MSG>' repeated; malformed
    prefix surfaces _decode_error and stops that payload's scan."""
    from vector_spark.sources import frame_octet_counting

    good = "5 hello6 world!11 <13>syslog!"
    bad = "5 hello3 abXtrailing"
    df = spark.createDataFrame(
        [("conn1", good), ("conn2", bad)], ["conn", "payload"]
    )
    out = frame_octet_counting(df).collect()
    by_conn = {}
    for r in out:
        by_conn.setdefault(r["conn"], []).append(r)
    msgs = [(r["frame_idx"], r["message"]) for r in sorted(by_conn["conn1"], key=lambda r: r["frame_idx"])]
    assert msgs == [(0, "hello"), (1, "world!"), (2, "<13>syslog!")]
    assert all(r["_decode_error"] is None for r in by_conn["conn1"])
    c2 = sorted(by_conn["conn2"], key=lambda r: r["frame_idx"])
    assert (c2[0]["message"], c2[0]["_decode_error"]) == ("hello", None)
    # LEN=3 frames 'abX'; the remaining 'trailing' has no LEN prefix
    assert c2[1]["message"] == "abX"
    assert c2[2]["_decode_error"] is not None and c2[2]["message"] is None


def test_frame_length_delimited(spark):
    from vector_spark.sources import frame_length_delimited

    def enc(*msgs):
        return b"".join(len(m).to_bytes(4, "big") + m for m in msgs)

    df = spark.createDataFrame(
        [("a", bytearray(enc(b"one", b"two22"))), ("b", bytearray(enc(b"x")[:-1]))],
        "conn string, payload binary",
    )
    out = frame_length_delimited(df).collect()
    a = sorted([r for r in out if r["conn"] == "a"], key=lambda r: r["frame_idx"])
    assert [bytes(r["message"]) for r in a] == [b"one", b"two22"]
    b = [r for r in out if r["conn"] == "b"]
    assert len(b) == 1 and b[0]["_decode_error"] is not None


def test_encode_avro_gated(spark):
    """avro encoder seam: works when the spark-avro module jar is present,
    otherwise raises the documented gating error (zstd-codec pattern)."""
    from vector_spark.sinks import encode_avro_rows

    df = spark.createDataFrame([(1, "a")], ["id", "s"])
    try:
        out = encode_avro_rows(df).collect()
        assert len(out) == 1 and isinstance(bytes(out[0]["value"]), bytes)
    except RuntimeError as e:
        assert "spark-avro" in str(e)


def test_encode_protobuf_gated(spark, tmp_path):
    """protobuf encoder seam: raises the documented gating error without
    the spark-protobuf module jar (or encodes if one is present)."""
    from vector_spark.sinks import encode_protobuf_rows

    df = spark.createDataFrame([(1, "a")], ["id", "s"])
    desc = tmp_path / "dummy.desc"
    desc.write_bytes(b"")
    try:
        encode_protobuf_rows(df, str(desc), "Msg").collect()
    except RuntimeError as e:
        assert "spark-protobuf" in str(e)


def test_native_proto_roundtrip(spark):
    """encode_native_rows -> decode_native_rows is identity over typed
    fields (jar-free EventWrapper codec, event.proto + the protobuf wire
    spec); malformed buffers land on _decode_error."""
    from vector_spark.functions.native_proto import (
        decode_native_rows,
        encode_native_rows,
    )

    df = spark.createDataFrame(
        [("a", 1, 1.5, True), ("b", -7, -0.25, False), (None, 0, 0.0, True)],
        "s string, i long, d double, b boolean",
    )
    enc = encode_native_rows(df)
    dec = decode_native_rows(
        enc, {"s": "string", "i": "long", "d": "double", "b": "boolean"}
    )
    got = {
        (r["s"], r["i"], r["d"], r["b"], r["_decode_error"]) for r in dec.collect()
    }
    assert got == {
        ("a", 1, 1.5, True, None), ("b", -7, -0.25, False, None),
        (None, 0, 0.0, True, None),
    }

    bad = spark.createDataFrame([(b"\xff\xff\xff",), (b"garbage!",)], "value binary")
    errs = decode_native_rows(bad, {"s": "string"}).collect()
    assert all(r["_decode_error"] is not None and r["s"] is None for r in errs)


def test_native_proto_stream_via_length_delimited_framing(spark):
    """Vector's native TCP/file stream = 4-byte-length frames of
    EventWrapper bytes; frame_length_delimited + decode_native_rows
    decode it end-to-end."""
    from vector_spark.functions.native_proto import (
        decode_native_rows,
        encode_event_wrapper,
    )
    from vector_spark.sources import frame_length_delimited

    events = [{"msg": "one", "n": 1}, {"msg": "two", "n": 2}, {"msg": "three", "n": 3}]
    stream = b"".join(
        len(b := encode_event_wrapper(e)).to_bytes(4, "big") + b for e in events
    )
    df = spark.createDataFrame([("conn1", stream)], "conn string, payload binary")
    frames = frame_length_delimited(df)
    dec = decode_native_rows(frames, {"msg": "string", "n": "long"}, src="message")
    got = sorted((r["msg"], r["n"]) for r in dec.collect())
    assert got == [("one", 1), ("three", 3), ("two", 2)]


def test_native_json_roundtrip(spark):
    """encode_native_json_rows -> decode_native_json_rows is identity over
    typed fields (the {"log": {...}} serde envelope,
    encoding/format/native_json.rs + decoding/format/native_json.rs);
    malformed JSON and non-log variants land on _decode_error."""
    from vector_spark.functions.native_json import (
        decode_native_json_rows,
        encode_native_json_rows,
    )

    df = spark.createDataFrame(
        [("a", 1, 1.5, True), ("b", -7, -0.25, False), (None, 0, 0.0, True)],
        "s string, i long, d double, b boolean",
    )
    enc = encode_native_json_rows(df)
    assert enc.columns == ["value"]
    assert '"log"' in enc.first()["value"]
    dec = decode_native_json_rows(
        enc, {"s": "string", "i": "long", "d": "double", "b": "boolean"}
    )
    got = {
        (r["s"], r["i"], r["d"], r["b"], r["_decode_error"]) for r in dec.collect()
    }
    assert got == {
        ("a", 1, 1.5, True, None), ("b", -7, -0.25, False, None),
        (None, 0, 0.0, True, None),
    }

    bad = spark.createDataFrame(
        [("not json",), ('{"log": 42}',), ('{"metric": {"i": 1}}',)],
        "value string",
    )
    errs = {r["_decode_error"] for r in decode_native_json_rows(bad, {"i": "long"}).collect()}
    assert errs == {"native_json: malformed", "native_json: not a log event"}
    assert all(
        r["i"] is None for r in decode_native_json_rows(bad, {"i": "long"}).collect()
    )


def test_native_json_plan_is_jvm_only(spark):
    """Both directions must stay in whole-stage codegen — no Python
    worker (mapInPandas/BatchEvalPython) in the decode plan."""
    from vector_spark.functions.native_json import (
        decode_native_json_rows,
        encode_native_json_rows,
    )

    df = spark.createDataFrame([("a", 1)], "s string, i long")
    dec = decode_native_json_rows(
        encode_native_json_rows(df), {"s": "string", "i": "long"}
    )
    plan = dec._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "InPandas" not in plan and "ArrowEval" not in plan
