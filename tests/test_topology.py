"""Topology runner tests — config compile checks (cycles, unknown inputs)
mirroring src/config/compiler.rs + graph.rs, and an end-to-end mini
topology with route ports and a dropped port.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_spark.topology import TopologyError, build_topology, compile_topology, run_topology


def test_compile_unknown_input():
    cfg = {
        "sources": {"s": {"kind": "parquet", "path": "/x"}},
        "transforms": {"t": {"kind": "filter", "inputs": ["nope"], "condition": "true"}},
        "sinks": {},
    }
    with pytest.raises(TopologyError, match="unknown input"):
        compile_topology(cfg)


def test_compile_cycle():
    cfg = {
        "sources": {},
        "transforms": {
            "a": {"kind": "filter", "inputs": ["b"], "condition": "true"},
            "b": {"kind": "filter", "inputs": ["a"], "condition": "true"},
        },
        "sinks": {},
    }
    with pytest.raises(TopologyError, match="cycle"):
        compile_topology(cfg)


def test_compile_duplicate_names():
    cfg = {
        "sources": {"x": {"kind": "parquet", "path": "/x"}},
        "transforms": {"x": {"kind": "filter", "inputs": ["x"], "condition": "true"}},
        "sinks": {},
    }
    with pytest.raises(TopologyError, match="duplicate"):
        compile_topology(cfg)


def test_end_to_end_topology(spark, tmp_path):
    df = spark.createDataFrame(
        [
            ("2020-10-02T23:22:12Z error disk full", 1),
            ("2020-10-02T23:22:13Z info all good", 2),
            ("not a log line", 3),
        ],
        ["message", "id"],
    )
    cfg = {
        "sources": {"logs": {"kind": "memory", "df": df}},
        "transforms": {
            "parse": {
                "kind": "remap_grok",
                "inputs": ["logs"],
                "pattern": "%{TIMESTAMP_ISO8601:ts} %{LOGLEVEL:level} %{GREEDYDATA:msg}",
                "drop_on_error": True,
            },
            "split": {
                "kind": "route",
                "inputs": ["parse"],
                "routes": {"errors": "level = 'error'", "infos": "level = 'info'"},
            },
        },
        "sinks": {
            "err_sink": {"kind": "memory", "inputs": ["split.errors"]},
            "info_sink": {"kind": "memory", "inputs": ["split.infos"]},
            "dropped_sink": {"kind": "memory", "inputs": ["parse.dropped"]},
            "files": {
                "kind": "parquet",
                "inputs": ["split"],
                "path": str(tmp_path / "routed"),
                "partition_by": ["route_key"],
            },
        },
    }
    res = run_topology(spark, cfg, verify_counts=True)
    assert [r["id"] for r in res["err_sink"].collect()] == [1]
    assert [r["id"] for r in res["info_sink"].collect()] == [2]
    d = res["dropped_sink"].collect()
    assert [r["id"] for r in d] == [3] and d[0]["dropped_component_id"] == "parse"
    assert res["files"] == 2  # labeled union written partitioned by route
    written = spark.read.parquet(str(tmp_path / "routed"))
    assert sorted(r["route_key"] for r in written.select("route_key").collect()) == ["errors", "infos"]


def test_multi_input_union(spark):
    a = spark.createDataFrame([(1,)], ["v"])
    b = spark.createDataFrame([(2,)], ["v"])
    cfg = {
        "sources": {"a": {"kind": "memory", "df": a}, "b": {"kind": "memory", "df": b}},
        "transforms": {
            "both": {"kind": "filter", "inputs": ["a", "b"], "condition": "v > 0"}
        },
        "sinks": {"out": {"kind": "blackhole", "inputs": ["both"]}},
    }
    assert run_topology(spark, cfg)["out"] == 2


def test_salted_agg_matches_plain(spark):
    from vector_spark.skew import hot_keys, salted_agg

    df = spark.createDataFrame(
        [("app", i % 7) for i in range(500)] + [("web", i % 3) for i in range(50)],
        ["source", "n"],
    )
    plain = {
        (r["source"]): (r["n_rows"], r["sum_n"])
        for r in df.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("n").alias("sum_n"))
        .collect()
    }
    salted = {
        (r["source"]): (r["n_rows"], r["sum_n"])
        for r in salted_agg(
            df,
            ["source"],
            {"n_rows": (F.count(F.lit(1)), "count"), "sum_n": (F.sum("n"), "sum")},
            buckets=8,
            salt_source="n",
        ).collect()
    }
    assert plain == salted
    assert hot_keys(df, "source") == ["app"]


def test_topology_dot():
    from vector_spark.topology import topology_dot

    cfg = {
        "sources": {"s": {"kind": "parquet", "path": "/x"}},
        "transforms": {"r": {"kind": "route", "inputs": ["s"], "routes": {}}},
        "sinks": {"k": {"kind": "blackhole", "inputs": ["r.errors"]}},
    }
    dot = topology_dot(cfg)
    assert '"s" -> "r"' in dot and '"r" -> "k" [label="errors"]' in dot
    assert '"k" [shape=doubleoctagon]' in dot


def test_render_template(spark):
    from vector_spark.template import render_template

    df = spark.createDataFrame(
        [("app", "2024-03-05 10:20:30", None)],
        "svc string, ts_s string, missing string",
    ).select("svc", F.to_timestamp("ts_s").alias("ts"), "missing")
    # file-sink path template: {{ svc }}/%F/%H (template.rs strftime + field)
    col = render_template("logs/{{ svc }}/%F/hour=%H", ts_col="ts")
    assert df.select(col.alias("p")).first()["p"] == "logs/app/2024-03-05/hour=10"
    # NULL field -> NULL render (render failure drops the metric)
    col2 = render_template("x-{{ missing }}")
    assert df.select(col2.alias("p")).first()["p"] is None


def test_parse_groks_first_match_wins(spark):
    from vector_spark.functions.grok import groks_columns

    df = spark.createDataFrame(
        [("<165>1 2020-10-02T23:22:12Z h app 1 ID x",),
         ("2020-10-02T23:22:12Z info hello",),
         ("garbage",)],
        ["message"],
    )
    cols = groks_columns(
        "message",
        [
            "%{TIMESTAMP_ISO8601:timestamp} %{LOGLEVEL:level} %{GREEDYDATA:msg}",
            r"<%{NONNEGINT:priority:int}>%{GREEDYDATA:msg}",
        ],
    )
    rows = {r["message"][:7]: r for r in df.select("message", *cols).collect()}
    assert rows["2020-10"]["level"] == "info" and rows["2020-10"]["msg"] == "hello"
    # first pattern did NOT match the syslog line; second did
    assert rows["<165>1 "]["priority"] == 165 and rows["<165>1 "]["level"] is None
    assert rows["garbage"]["msg"] is None and rows["garbage"]["priority"] is None


def test_hot_keys_sampled_agrees_with_exact(spark):
    """The sampled path (forced via a tiny sample_threshold) must find the
    same hot keys as the exact path on the Zipf-skewed tokenlog corpus."""
    from vector_spark.pipeline import load_corpus
    from vector_spark.skew import hot_keys

    df = load_corpus(spark, 0.001)
    exact = hot_keys(df, "source", sample_threshold=10**12)
    sampled = hot_keys(
        df, "source", sample_threshold=100, sample_fraction=0.1, seed=7
    )
    assert exact and sampled == exact


def test_run_pipeline_per_route_mode_and_crash_resume(spark, tmp_path):
    """per_route mode: independent sink writes, per-sink manifest rows
    appended durably as each sink commits — a resumed run skips every
    already-committed sink even if a later sink's write never happened."""
    import os

    from pyspark.sql import functions as F

    from vector_spark.pipeline import run_pipeline

    out = str(tmp_path / "per_route")
    r1 = run_pipeline(spark, 0.001, out_dir=out, run_id="P", mode="per_route")
    assert r1["routed_rows"] > 0 and r1["skipped_sinks"] == []

    # the manifest already holds one committed row per sink (appended as
    # each sink landed, not batched at the end)
    man = spark.read.parquet(os.path.join(out, "_manifest"))
    sinks = {r["sink"] for r in man.filter(F.col("committed")).collect()}
    assert len(sinks) >= 2

    # simulate a crash AFTER the sinks committed but before run end by
    # simply re-running: every sink must be skipped
    r2 = run_pipeline(spark, 0.001, out_dir=out, run_id="P", mode="per_route")
    assert set(r2["skipped_sinks"]) == sinks

    # per_route sinks agree with the partitioned flagship's routed total
    r3 = run_pipeline(spark, 0.001, out_dir=str(tmp_path / "part"), run_id="Q")
    assert r1["routed_rows"] == r3["routed_rows"]


def test_tap_topology_samples_component_outputs(spark):
    """vector-tap analogue: glob-matched component outputs yield JSON
    event samples, including route ports."""
    import json

    from vector_spark.topology import tap_topology, top_topology

    df = spark.createDataFrame(
        [("a", "ERROR", 3), ("b", "INFO", 1), ("c", "ERROR", 2)],
        "id string, level string, n int",
    )
    cfg = {
        "sources": {"in": {"kind": "memory", "df": df}},
        "transforms": {
            "router": {
                "kind": "route",
                "inputs": ["in"],
                "routes": {"errors": "level = 'ERROR'"},
            },
        },
        "sinks": {"out": {"kind": "blackhole", "inputs": ["router.errors"]}},
    }
    taps = tap_topology(spark, cfg, patterns=["router.*"], limit=10)
    # route ports are real outputs: the explicit route AND _unmatched
    assert set(taps) == {"router.errors", "router._unmatched"}
    rows = [json.loads(s) for s in taps["router.errors"]]
    assert {r["id"] for r in rows} == {"a", "c"}
    counts = top_topology(spark, cfg)
    assert counts["router.errors"] == 2 and counts["in"] == 3


def test_glob_inputs_expand(spark):
    """Wildcard inputs (reference expand_globs): `router.*` fans every
    route port into the downstream component; a no-match pattern errors."""
    import pytest as _pytest

    from vector_spark.topology import TopologyError, run_topology

    df = spark.createDataFrame(
        [("a", "ERROR"), ("b", "WARN"), ("c", "INFO")], "id string, level string"
    )
    cfg = {
        "sources": {"in": {"kind": "memory", "df": df}},
        "transforms": {
            "router": {
                "kind": "route",
                "inputs": ["in"],
                "routes": {"errors": "level = 'ERROR'",
                           "warnings": "level = 'WARN'"},
            },
        },
        "sinks": {"all_routed": {"kind": "blackhole", "inputs": ["router.*"]}},
    }
    # router.* -> errors + warnings + _unmatched = all 3 rows
    assert run_topology(spark, cfg)["all_routed"] == 3
    bad = {**cfg, "sinks": {"s": {"kind": "blackhole", "inputs": ["nope_*"]}}}
    with _pytest.raises(TopologyError, match="matches no outputs"):
        run_topology(spark, bad)


# --- file + exec sources (src/sources/file.rs, src/sources/exec/) -----

def test_file_source_plain_and_decoded(spark, tmp_path):
    log = tmp_path / "app.log"
    log.write_text("line one\nline two\n")
    topo = build_topology(spark, {
        "sources": {"f": {"kind": "file", "include": str(log)}},
        "transforms": {}, "sinks": {},
    })
    rows = topo.outputs["f"].orderBy("message").collect()
    assert [r["message"] for r in rows] == ["line one", "line two"]
    assert all(r["file"].endswith("app.log") for r in rows)


def test_file_source_multiline_stacktrace(spark, tmp_path):
    # the reference file source's multiline aggregation: continuation
    # lines (leading whitespace) merge into the starting line
    log = tmp_path / "trace.log"
    log.write_text(
        "ERROR boom\n  at foo()\n  at bar()\nINFO ok\nERROR again\n  at baz()\n")
    topo = build_topology(spark, {
        "sources": {"f": {
            "kind": "file", "include": str(log),
            "multiline": {
                "start_pattern": "^[^\\s]",
                "condition_pattern": "^\\s",
                "mode": "continue_through",
            },
        }},
        "transforms": {}, "sinks": {},
    })
    msgs = sorted(r["message"] for r in topo.outputs["f"].collect())
    assert msgs == [
        "ERROR again\n  at baz()",
        "ERROR boom\n  at foo()\n  at bar()",
        "INFO ok",
    ]


def test_file_source_glob_and_syslog_codec(spark, tmp_path):
    (tmp_path / "a.log").write_text(
        "<34>1 2024-03-01T00:00:00Z host app 1 - - hello syslog\n")
    topo = build_topology(spark, {
        "sources": {"f": {
            "kind": "file",
            "include": str(tmp_path / "*.log"),
            "decoding": {"codec": "syslog"},
        }},
        "transforms": {}, "sinks": {},
    })
    row = topo.outputs["f"].collect()[0]
    assert row["syslog_appname"] == "app"
    assert "hello syslog" in row["syslog_message"]
    assert row["syslog_facility"] == 4 and row["syslog_severity"] == 2


def test_exec_source(spark):
    topo = build_topology(spark, {
        "sources": {"e": {
            "kind": "exec",
            "command": ["python3", "-c",
                        "import sys; print('out1'); print('out2'); "
                        "print('err1', file=sys.stderr)"],
        }},
        "transforms": {}, "sinks": {},
    })
    rows = topo.outputs["e"].collect()
    bystream = {}
    for r in rows:
        bystream.setdefault(r["data_stream"], []).append(r["message"])
    assert bystream["stdout"] == ["out1", "out2"]
    assert bystream["stderr"] == ["err1"]
    assert all(r["pid"] > 0 for r in rows)


def test_exec_source_no_stderr(spark):
    topo = build_topology(spark, {
        "sources": {"e": {
            "kind": "exec", "include_stderr": False,
            "command": ["python3", "-c",
                        "import sys; print('x'); print('e', file=sys.stderr)"],
        }},
        "transforms": {}, "sinks": {},
    })
    assert [r["message"] for r in topo.outputs["e"].collect()] == ["x"]


def test_file_sink_templated_through_topology(spark, tmp_path):
    from vector_spark.topology import run_topology

    df = spark.createDataFrame(
        [("a", "m1"), ("b", "m2"), ("a", "m3")], "svc string, message string")
    out = tmp_path / "sink_out"
    run_topology(spark, {
        "sources": {"src": {"kind": "memory", "df": df}},
        "transforms": {},
        "sinks": {"files": {
            "kind": "file", "inputs": ["src"],
            "path": str(out), "template": "svc-{{ svc }}",
            "encoding": "text",
        }},
    })
    import glob
    dirs = sorted(p.split("=")[-1] for p in glob.glob(str(out / "_path=*")))
    assert dirs == ["svc-a", "svc-b"]
    txt = sorted(
        line for f in glob.glob(str(out / "_path=svc-a" / "part-*"))
        for line in open(f).read().splitlines())
    assert txt == ["m1", "m3"]


def test_top_one_pass_matches_per_component_counts(spark, tmp_path):
    """The observation-based one-pass `vector top` reports exactly the
    same per-component row counts as the one-count-job-per-component
    diagnostic, including route ports off the executed path."""
    from vector_spark.topology import top_topology

    df = spark.createDataFrame(
        [("a", 1.0), ("b", 250.0), ("a", 500.0), ("c", 90.0)],
        "k string, v double")
    cfg = {
        "sources": {"events": {"kind": "memory", "df": df}},
        "transforms": {
            "big": {"kind": "filter", "inputs": ["events"], "condition": "v > 100"},
            "router": {"kind": "route", "inputs": ["big"],
                       "routes": {"a_side": "k = 'a'", "b_side": "k = 'b'"}},
        },
        "sinks": {
            "out": {"kind": "memory", "inputs": ["router.a_side"]},
            "out2": {"kind": "memory", "inputs": ["router.b_side"]},
        },
    }
    fast = top_topology(spark, cfg, one_pass=True)
    slow = top_topology(spark, cfg, one_pass=False)
    assert fast == slow
    assert fast["events"] == 4 and fast["big"] == 2
    assert fast["router.a_side"] == 1 and fast["router.b_side"] == 1
    assert fast["router._unmatched"] == 0
