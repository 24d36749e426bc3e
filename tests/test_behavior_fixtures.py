"""Behavior fixtures F1-F8 — the reference's `vector test` TOML corpus
(tests/behavior/transforms/*.toml, run by src/unit_test.rs:62-90)
re-expressed as pytest over deterministic DataFrames (FIXTURES.md).
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from vector_spark.operators import (
    dedupe,
    filter_events,
    reduce_events,
    route,
    sample,
    throttle,
)
from vector_spark.operators.route import UNMATCHED


# --- F1: route (tests/behavior/transforms/route.toml:1-79) -----------------


def test_route_copy_to_every_match(spark):
    df = spark.createDataFrame(
        [("test swimlane 1",), ("test swimlane 2",), ("other",)], ["message"]
    )
    r = route(
        df,
        {
            "first": F.col("message") == "test swimlane 1",
            "second": F.col("message") == "test swimlane 2",
            "third": F.lit(True),  # is_log — always true for logs
        },
    )
    firsts = [x["message"] for x in r["first"].collect()]
    thirds = [x["message"] for x in r["third"].collect()]
    assert firsts == ["test swimlane 1"]
    # copy-to-every-match: the swimlane-1 event ALSO reaches `third`
    assert sorted(thirds) == ["other", "test swimlane 1", "test swimlane 2"]
    # no_outputs_from: `second` must not see the swimlane-1 event
    assert [x["message"] for x in r["second"].collect()] == ["test swimlane 2"]
    # everything matched `third`, so _unmatched is empty
    assert r[UNMATCHED].count() == 0
    # labeled plan agrees with the filter branches
    lab = r.union_labeled().groupBy("route_key").count().collect()
    assert {x["route_key"]: x["count"] for x in lab} == {"first": 1, "second": 1, "third": 3}


def test_route_unmatched_and_null_conditions(spark):
    df = spark.createDataFrame([("a", 1), (None, 2), ("b", 3)], ["k", "v"])
    r = route(df, {"is_a": F.col("k") == "a"})
    # NULL predicate (k is NULL) does NOT match and lands in _unmatched
    assert sorted(x["v"] for x in r[UNMATCHED].collect()) == [2, 3]
    with pytest.raises(ValueError):
        route(df, {UNMATCHED: F.lit(True)})


# --- F2: dedupe (tests/behavior/transforms/dedupe.toml) --------------------


def test_dedupe_match_fields(spark):
    df = spark.createDataFrame(
        [(1, 10, 100, 1), (1, 20, 200, 2), (2, 10, 300, 3)], ["a", "b", "c", "seq"]
    )
    out = dedupe(df, match_fields=["a"], order_by="seq").collect()
    # second row with same `a` dropped even though `b` differs
    assert sorted((r["a"], r["b"]) for r in out) == [(1, 10), (2, 10)]


def test_dedupe_type_sensitivity(spark):
    # reference keys on (type_id, bytes): int 1 != string "1"
    # (src/transforms/dedupe.rs:195-213); Spark schemas are static, so the
    # discipline is: heterogeneous types stay in separate columns and BOTH
    # participate in the key.
    df = spark.createDataFrame(
        [(1, None, 1), (None, "1", 2)], ["x_int", "x_str", "seq"]
    )
    out = dedupe(df, match_fields=["x_int", "x_str"], order_by="seq")
    assert out.count() == 2  # not collapsed


def test_dedupe_ignore_fields(spark):
    df = spark.createDataFrame([(1, 5, 1), (1, 6, 2)], ["k", "noise", "seq"])
    assert dedupe(df, ignore_fields=["noise", "seq"], order_by="seq").count() == 1


# --- F3: reduce (tests/behavior/transforms/reduce.toml:1-100) --------------


def _ts(s):
    return datetime.fromisoformat(s)


def test_reduce_defaults(spark):
    df = spark.createDataFrame(
        [
            ("m1", "r1", "h1", 1, _ts("2024-01-01T00:00:00")),
            ("m2", "r1", "h2", 2, _ts("2024-01-01T00:00:10")),
            ("m3", "r2", "h3", 5, _ts("2024-01-01T00:00:20")),
        ],
        ["message", "request_id", "host", "counter", "ts"],
    )
    out = {
        r["request_id"]: r
        for r in reduce_events(df, group_by=["request_id"], order_col="ts").collect()
    }
    # defaults (reduce/mod.rs:82-88): first string, summed numeric,
    # first timestamp + <field>_end
    assert out["r1"]["message"] == "m1"
    assert out["r1"]["host"] == "h1"
    assert out["r1"]["counter"] == 3
    assert out["r1"]["ts"] == _ts("2024-01-01T00:00:00")
    assert out["r1"]["ts_end"] == _ts("2024-01-01T00:00:10")
    assert out["r2"]["counter"] == 5


def test_reduce_merge_strategies(spark):
    df = spark.createDataFrame(
        [
            ("g", "a", 3, _ts("2024-01-01T00:00:00")),
            ("g", "b", 1, _ts("2024-01-01T00:00:01")),
            ("g", "c", 2, _ts("2024-01-01T00:00:02")),
        ],
        ["k", "s", "n", "ts"],
    )
    out = reduce_events(
        df,
        group_by=["k"],
        merge_strategies={"s": "concat", "n": "max"},
        order_col="ts",
    ).first()
    assert out["s"] == "a b c"  # event-time concat order
    assert out["n"] == 3
    out2 = reduce_events(
        df, group_by=["k"], merge_strategies={"s": "array", "n": "min"}, order_col="ts"
    ).first()
    assert out2["s"] == ["a", "b", "c"]
    assert out2["n"] == 1
    out3 = reduce_events(
        df, group_by=["k"], merge_strategies={"s": "retain", "n": "discard"}, order_col="ts"
    ).first()
    assert out3["s"] == "c" and out3["n"] == 3


def test_reduce_flat_unique(spark):
    df = spark.createDataFrame(
        [("g", ["a", "b"], _ts("2024-01-01T00:00:00")), ("g", ["b", "c"], _ts("2024-01-01T00:00:01"))],
        ["k", "tags", "ts"],
    )
    out = reduce_events(
        df, group_by=["k"], merge_strategies={"tags": "flat_unique"}, order_col="ts"
    ).first()
    assert sorted(out["tags"]) == ["a", "b", "c"]


def test_reduce_ends_when_sessionization(spark):
    # ends_when closes the transaction INCLUDING the marker row
    # (reduce/mod.rs:268-276)
    rows = [
        ("r1", 1, False, _ts("2024-01-01T00:00:00")),
        ("r1", 2, True, _ts("2024-01-01T00:00:01")),   # closes session 0
        ("r1", 4, False, _ts("2024-01-01T00:00:02")),
        ("r1", 8, True, _ts("2024-01-01T00:00:03")),   # closes session 1
        ("r2", 99, False, _ts("2024-01-01T00:00:04")),
    ]
    df = spark.createDataFrame(rows, ["request_id", "counter", "end_marker", "ts"])
    out = reduce_events(
        df,
        group_by=["request_id"],
        merge_strategies={"end_marker": "retain"},
        order_col="ts",
        ends_when=F.col("end_marker"),
    )
    got = sorted((r["request_id"], r["counter"]) for r in out.collect())
    assert got == [("r1", 3), ("r1", 12), ("r2", 99)]


# --- F4: filter (tests/behavior/transforms/filter.toml) --------------------


def test_filter_coalesce_fallback(spark):
    df = spark.createDataFrame(
        [("keep", None), ("drop", None), ("x", "keep")],
        ["message", "tag_message"],
    )
    cond = F.coalesce(F.col("tag_message"), F.col("message")) == "keep"
    out = sorted(r["message"] for r in filter_events(df, cond).collect())
    assert out == ["keep", "x"]


def test_filter_null_condition_drops(spark):
    df = spark.createDataFrame([(None,), ("a",)], ["v"])
    # NULL predicate = no match (conditions are tri-state in SQL)
    assert filter_events(df, F.col("v") == "a").count() == 1


# --- F5: remap parse + error channel (remap.toml, remap_with_drop.toml) ----


def test_grok_cue_example(spark):
    # parse_grok.cue:37-49 canonical example
    from vector_spark.functions.grok import grok_parse

    df = spark.createDataFrame(
        [("2020-10-02T23:22:12.223222Z info Hello world",), ("nope",)], ["message"]
    )
    out = grok_parse(
        df,
        "message",
        "%{TIMESTAMP_ISO8601:timestamp} %{LOGLEVEL:level} %{GREEDYDATA:msg}",
    ).collect()
    ok = [r for r in out if r["message"] != "nope"][0]
    assert ok["timestamp"] == "2020-10-02T23:22:12.223222Z"
    assert ok["level"] == "info"
    assert ok["msg"] == "Hello world"
    bad = [r for r in out if r["message"] == "nope"][0]
    assert bad["level"] is None


def test_remap_dropped_port(spark):
    # drop_on_error + reroute_dropped: failed rows land in `dropped` with
    # metadata annotation (src/transforms/remap.rs:496-498,554-640)
    from vector_spark.functions.grok import grok_matched

    df = spark.createDataFrame([("2020-01-01T00:00:00Z info ok",), ("garbage",)], ["message"])
    pat = "%{TIMESTAMP_ISO8601:timestamp} %{LOGLEVEL:level} %{GREEDYDATA:msg}"
    ok_df = df.filter(grok_matched("message", pat))
    dropped = df.filter(~grok_matched("message", pat)).select(
        "*",
        F.lit("parse failed").alias("dropped_reason"),
        F.lit("remap_parse").alias("dropped_component_id"),
    )
    assert ok_df.count() == 1
    d = dropped.first()
    assert d["message"] == "garbage" and d["dropped_reason"] == "parse failed"


def test_unnest_explode(spark):
    # unnest.cue:33-50: one event with messages[2] -> 2 events
    df = spark.createDataFrame([("h1", ["m1", "m2"])], ["hostname", "messages"])
    out = df.select("hostname", F.explode("messages").alias("message")).collect()
    assert [(r["hostname"], r["message"]) for r in out] == [("h1", "m1"), ("h1", "m2")]


# --- F6: enrichment (src/enrichment_tables/file.rs, lib/enrichment) --------


def test_enrich_get_semantics(spark):
    from vector_spark.enrichment import enrich_get

    events = spark.createDataFrame([("a",), ("b",), ("miss",)], ["k"])
    table = spark.createDataFrame(
        [("a", "r1"), ("b", "r2"), ("b", "r3")], ["key", "val"]
    )
    out = {r["k"]: r for r in enrich_get(events, table, on={"k": "key"}).collect()}
    assert out["a"]["val"] == "r1" and out["a"]["_enrich_error"] is None
    # >1 match: deterministic winner + 'multiple rows' error
    assert out["b"]["val"] == "r2" and out["b"]["_enrich_error"] == "multiple rows"
    # 0 matches: NULL + 'no rows' error (lib/enrichment/src/lib.rs:44-52)
    assert out["miss"]["val"] is None and out["miss"]["_enrich_error"] == "no rows"


def test_enrich_case_insensitive_and_dates(spark):
    from vector_spark.enrichment import enrich_find

    events = spark.createDataFrame(
        [("APP", "2024-03-01"), ("app", "2025-01-01")], ["src", "d"]
    ).select("src", F.to_date("d").alias("d"))
    table = spark.createDataFrame(
        [("app", "2024-01-01", "2024-12-31", "hit")], ["key", "lo", "hi", "val"]
    ).select("key", F.to_date("lo").alias("lo"), F.to_date("hi").alias("hi"), "val")
    out = enrich_find(
        events, table, on={"src": "key"}, case_sensitive=False,
        date_range=("d", "lo", "hi"), select=["val"],
    ).collect()
    got = {(r["src"]): r["val"] for r in out}
    assert got["APP"] == "hit"     # case-insensitive + in range
    assert got["app"] is None      # out of date range


# --- F7: aggregate / log_to_metric (src/transforms/aggregate.rs:150-560) ---


def test_aggregate_incremental_and_absolute(spark):
    from vector_spark.operators.metrics import aggregate_metrics

    rows = [
        ("counter_a", "", {}, _ts("2024-01-01T00:00:01"), "incremental", 1.0),
        ("counter_a", "", {}, _ts("2024-01-01T00:00:02"), "incremental", 2.0),
        ("gauge_b", "", {}, _ts("2024-01-01T00:00:03"), "absolute", 5.0),
        ("gauge_b", "", {}, _ts("2024-01-01T00:00:04"), "absolute", 7.0),
    ]
    df = spark.createDataFrame(
        rows, "name string, namespace string, tags map<string,string>, ts timestamp, kind string, value double"
    )
    out = {r["name"]: r for r in aggregate_metrics(df, interval_secs=10).collect()}
    assert out["counter_a"]["sum_incremental"] == 3.0   # summed (data.update)
    assert out["gauge_b"]["last_absolute"] == 7.0       # last-write-wins


def test_log_to_metric_render_failure_drops(spark):
    from vector_spark.operators.metrics import log_to_metric

    df = spark.createDataFrame(
        [("a", 1.0, _ts("2024-01-01T00:00:00")), (None, 2.0, _ts("2024-01-01T00:00:01"))],
        ["et", "value", "ts"],
    )
    m = log_to_metric(
        df, name=F.col("et"), metric_type="counter", tags={"t": F.col("et")}, ts_col="ts"
    )
    assert m.count() == 1  # NULL-rendered name drops that metric row


def test_tag_cardinality_limit(spark):
    from vector_spark.operators.metrics import tag_cardinality_limit

    df = spark.createDataFrame([(f"v{i:02d}", i) for i in range(10)], ["tag", "n"])
    kept = tag_cardinality_limit(df, ["tag"], value_limit=3, action="drop_tag")
    non_null = kept.filter(F.col("tag").isNotNull()).count()
    assert non_null == 3 and kept.count() == 10
    dropped = tag_cardinality_limit(df, ["tag"], value_limit=3, action="drop_event")
    assert dropped.count() == 3


# --- F8: sample / throttle (src/transforms/sample.rs:112-155) --------------


def test_sample_bucket_semantics(spark):
    from vector_spark.hashing import portable_bucket

    df = spark.createDataFrame([(f"k{i}", i) for i in range(200)], ["key", "v"])
    out = sample(df, rate=10, key_field="key")
    rows = out.collect()
    assert 0 < len(rows) < 200
    assert all(r["sample_rate"] == "10" for r in rows)  # sample.rs:139-152
    # survivors are EXACTLY bucket-0 keys — whole groups survive together
    expected = df.filter(portable_bucket("key", 10) == 0).count()
    assert len(rows) == expected


def test_sample_counter_mode_every_nth_in_order(spark):
    # counter mode (sample.rs:133-137) over an explicit total order:
    # every rate-th row of the sorted stream, starting with the first
    df = spark.createDataFrame(
        [(f"k{i:03d}", i) for i in range(20)], ["key", "v"]
    ).repartition(4)
    out = sample(df, rate=5, order_by=["key"]).collect()
    assert sorted(r["key"] for r in out) == ["k000", "k005", "k010", "k015"]
    assert all(r["sample_rate"] == "5" for r in out)
    assert "rank" not in out[0].asDict()


def test_sample_exclude_bypass(spark):
    df = spark.createDataFrame([("a", True), ("b", False)], ["key", "vip"])
    out = sample(df, rate=1000000, key_field="key", exclude=F.col("vip"))
    assert any(r["key"] == "a" for r in out.collect())  # exclude rows always kept


def test_throttle_threshold_per_window(spark):
    rows = [("u1", _ts(f"2024-01-01T00:00:0{i}")) for i in range(5)] + [
        ("u1", _ts("2024-01-01T01:00:01")),
        ("u2", _ts("2024-01-01T00:00:01")),
    ]
    df = spark.createDataFrame(rows, ["user", "ts"])
    out = throttle(df, threshold=2, window_secs=3600, ts_col="ts", key_field="user")
    per = out.groupBy("user", (F.unix_timestamp("ts") / 3600).cast("bigint").alias("w")).count().collect()
    assert all(r["count"] <= 2 for r in per)
    assert out.count() == 2 + 1 + 1  # u1 window0 capped at 2; u1 window1: 1; u2: 1


# --- UDF surface (lua analogue) + static enrich ----------------------------


def test_map_events_pandas_multi_emit(spark):
    import pandas as pd

    from vector_spark.operators.custom import map_events_pandas

    df = spark.createDataFrame([("a", 2), ("b", 0), ("c", 1)], ["k", "n"])

    def repeat_rows(pdf: pd.DataFrame) -> pd.DataFrame:
        # emit each row n times (0..N emission like lua process hooks)
        return pdf.loc[pdf.index.repeat(pdf["n"])].reset_index(drop=True)

    out = map_events_pandas(df, repeat_rows, "k string, n int")
    got = sorted(r["k"] for r in out.collect())
    assert got == ["a", "a", "c"]


def test_apply_grouped_pandas(spark):
    import pandas as pd

    from vector_spark.operators.custom import apply_grouped_pandas

    df = spark.createDataFrame(
        [("u1", 3.0), ("u1", 5.0), ("u2", 7.0)], ["user", "v"]
    )

    def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"user": [pdf["user"].iloc[0]], "total": [pdf["v"].sum()]})

    out = {r["user"]: r["total"] for r in apply_grouped_pandas(
        df, ["user"], summarize, "user string, total double"
    ).collect()}
    assert out == {"u1": 8.0, "u2": 7.0}


def test_enrich_static(spark):
    from vector_spark.enrichment import enrich_static

    df = spark.createDataFrame([(1,)], ["v"])
    out = enrich_static(df, {"region": "us-east-1", "az": "use1-az4"}).first()
    assert out["region"] == "us-east-1" and out["az"] == "use1-az4"


def test_metric_to_log_roundtrip(spark):
    import json as _json

    from vector_spark.operators.metrics import log_to_metric, metric_to_log

    df = spark.createDataFrame(
        [("error", 2.0, _ts("2024-01-01T00:00:00"), "h9")],
        ["event_type", "value", "ts", "host"],
    )
    m = log_to_metric(
        df, name="events_total", metric_type="counter",
        tags={"host": F.col("host"), "et": F.col("event_type")}, ts_col="ts",
    )
    logs = metric_to_log(m).first()
    assert logs["host"] == "h9"  # host tag hoisted (metric_to_log.rs:278)
    payload = _json.loads(logs["message"])
    assert payload["name"] == "events_total" and payload["kind"] == "incremental"


def test_ddsketch_accuracy_and_zero_store(spark):
    """DDSketch (metrics.py::ddsketch_aggregate): quantile estimates are
    within the alpha relative-accuracy bound by construction, and
    non-positive samples land in the zero store."""
    from vector_spark.operators.metrics import ddsketch_aggregate

    vals = [float(i) for i in range(1, 1001)] + [0.0, -3.0]
    df = spark.createDataFrame([("s", v) for v in vals], ["series", "value"])
    out = ddsketch_aggregate(
        df, ["series"], "value", alpha=0.01, quantiles=(0.5, 0.95)
    ).collect()[0]
    assert out["n_samples"] == 1002
    assert out["zero_count"] == 2
    # true quantiles over the sorted sample (positive part dominates)
    import math

    svals = sorted(vals)
    for q, est in ((0.5, out["q50_est"]), (0.95, out["q95_est"])):
        true = svals[max(math.ceil(q * len(svals)), 1) - 1]
        assert abs(est - true) / true <= 0.01 + 1e-9, (q, est, true)


def test_reduce_max_events_flush(spark):
    """reduce max_events (reduce/mod.rs:64-67): the open group flushes
    every max_events rows in event-time order."""
    from vector_spark.operators.reduce import reduce_events

    rows = [("k", f"2024-01-01 00:00:0{i}", 1, f"m{i}") for i in range(7)]
    df = spark.createDataFrame(rows, ["key", "ts_s", "n", "msg"]).select(
        "key", F.to_timestamp("ts_s").alias("ts"), "n", "msg"
    )
    out = reduce_events(
        df, ["key"], merge_strategies={"msg": "concat"}, order_col="ts",
        max_events=3,
    ).orderBy("ts").collect()
    assert [(r["n"], r["msg"]) for r in out] == [
        (3, "m0 m1 m2"), (3, "m3 m4 m5"), (1, "m6"),
    ]
