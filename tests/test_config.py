"""TOML config front door (vector_spark/config.py): env-var interpolation
semantics (reference src/config/vars.rs:19-71), type→kind mapping, and the
flagship pipeline driven end-to-end from configs/flagship.toml."""

from __future__ import annotations

import csv
import os

import pytest

from vector_spark.config import (
    build_topology_from_toml,
    interpolate_env,
    load_config_text,
)
from vector_spark.topology import TopologyError

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_interpolation_forms():
    env = {"A": "alpha", "EMPTY": "", "B.dot_name": "bee"}
    assert interpolate_env("x${A}y", env)[0] == "xalphay"
    assert interpolate_env("x$A y", env)[0] == "xalpha y"
    assert interpolate_env("${B.dot_name}", env)[0] == "bee"
    # :- default on unset OR empty; - default only on unset
    assert interpolate_env("${EMPTY:-dflt}", env)[0] == "dflt"
    assert interpolate_env("${EMPTY-dflt}", env)[0] == ""
    assert interpolate_env("${MISSING:-dflt}", env)[0] == "dflt"
    assert interpolate_env("${MISSING-dflt}", env)[0] == "dflt"
    # $$ escapes
    assert interpolate_env("cost: $$5", env)[0] == "cost: $5"
    # unset without default -> "" plus a warning
    out, warns = interpolate_env("<${MISSING}>", env)
    assert out == "<>" and len(warns) == 1


def test_interpolation_required_raises():
    with pytest.raises(TopologyError):
        interpolate_env("${MISSING:?need it}", {})
    with pytest.raises(TopologyError):
        interpolate_env("${EMPTY:?need it}", {"EMPTY": ""})
    # '?' (without ':') accepts empty
    assert interpolate_env("${EMPTY?err}", {"EMPTY": ""})[0] == ""


def test_type_maps_to_kind():
    cfg = load_config_text(
        """
[sources.in]
type = "parquet"
path = "/tmp/x"

[sinks.out]
type = "memory"
inputs = ["in"]
""",
        env={},
    )
    assert cfg["sources"]["in"]["kind"] == "parquet"
    assert "type" not in cfg["sources"]["in"]
    assert cfg["sinks"]["out"]["kind"] == "memory"


def test_flagship_toml_matches_python_flagship(spark):
    """configs/flagship.toml through the TOML front door == the directly
    built parse->enrich->route->aggregate flagship, row for row."""
    from vector_spark import datagen
    from vector_spark import pipeline as P
    from vector_spark.topology import run_topology
    from vector_spark.config import load_config

    corpus = datagen.ensure_corpus(0.001)
    enrich_csv = os.path.join(datagen.DATA_ROOT, "enrich_test.csv")
    with open(enrich_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["key", "region", "tier", "from_date", "to_date"])
        w.writerows(datagen.ENRICH_ROWS)
    cfg = load_config(
        os.path.join(REPO, "configs", "flagship.toml"),
        env={"VECTOR_SPARK_CORPUS": corpus, "VECTOR_SPARK_ENRICH": enrich_csv},
    )
    got = run_topology(spark, cfg)["out"].collect()
    want = P.sink_aggregates(
        P.route_stage(P.parsed_enriched(spark, P.load_corpus(spark, 0.001)))
    ).collect()
    key = lambda r: (r["route_key"], r["source"])  # noqa: E731
    got_m = {key(r): (r["n_rows"], int(r["sum_tok"])) for r in got}
    want_m = {key(r): (r["n_rows"], int(r["sum_tok"])) for r in want}
    assert got_m == want_m


def test_flagship_toml_requires_env(spark):
    with pytest.raises(TopologyError):
        build_topology_from_toml(
            spark, os.path.join(REPO, "configs", "flagship.toml"), env={}
        )


# --- secrets (reference src/config/secret.rs + src/secrets/) ----------

def test_secret_test_backend():
    from vector_spark.config import load_config_text

    cfg = load_config_text("""
[secret.b1]
type = "test"
replacement = "hunter2"

[sinks.out]
type = "parquet"
inputs = ["x"]
path = "/data"
token = "SECRET[b1.api_key]"
""", env={})
    assert cfg["sinks"]["out"]["token"] == "hunter2"
    # dots allowed inside the key, like the reference's collector regex
    cfg2 = load_config_text("""
[secret.b1]
type = "test"
replacement = "v"

[sinks.out]
type = "parquet"
inputs = ["x"]
path = "/data"
token = "SECRET[b1.secret.name]"
""", env={})
    assert cfg2["sinks"]["out"]["token"] == "v"


def test_secret_exec_backend(tmp_path):
    import json
    import stat

    from vector_spark.config import load_config_text

    script = tmp_path / "backend.py"
    script.write_text(
        "import json, sys\n"
        "q = json.load(sys.stdin)\n"
        "assert q['version'] == '1.0'\n"
        "print(json.dumps({k: {'value': 'v_' + k, 'error': None}"
        " for k in q['secrets']}))\n")
    cfg = load_config_text(f"""
[secret.ex]
type = "exec"
command = ["python3", "{script}"]

[sinks.out]
type = "parquet"
inputs = ["x"]
path = "/data"
user = "SECRET[ex.user]"
pass = "SECRET[ex.pass]"
""", env={})
    assert cfg["sinks"]["out"]["user"] == "v_user"
    assert cfg["sinks"]["out"]["pass"] == "v_pass"


def test_secret_exec_backend_error(tmp_path):
    from vector_spark.config import load_config_text

    script = tmp_path / "backend.py"
    script.write_text(
        "import json, sys\n"
        "q = json.load(sys.stdin)\n"
        "print(json.dumps({k: {'value': None, 'error': 'denied'}"
        " for k in q['secrets']}))\n")
    with pytest.raises(TopologyError, match="was not retrieved: denied"):
        load_config_text(f"""
[secret.ex]
type = "exec"
command = ["python3", "{script}"]

[sinks.out]
type = "parquet"
inputs = ["x"]
path = "/data"
token = "SECRET[ex.k]"
""", env={})


def test_secret_missing_backend():
    from vector_spark.config import load_config_text

    with pytest.raises(TopologyError, match='Backend "nope" is required'):
        load_config_text('[sinks.o]\ntype = "parquet"\ninputs = []\n'
                         'path = "SECRET[nope.k]"\n', env={})


def test_secret_after_env_interpolation():
    # placeholders are collected AFTER env interpolation, so an env var
    # can name the secret key (loading/secret.rs prepare() order)
    from vector_spark.config import load_config_text

    cfg = load_config_text("""
[secret.b]
type = "test"
replacement = "r"

[sinks.o]
type = "parquet"
inputs = []
path = "SECRET[b.${KEY_NAME}]"
""", env={"KEY_NAME": "mykey"})
    assert cfg["sinks"]["o"]["path"] == "r"


def test_file_lua_pipeline_toml(spark, tmp_path):
    """configs/file_lua_pipeline.toml: the round-4b components composed —
    file source -> lua parse hook -> route -> templated file sink +
    parquet sink — driven entirely through the TOML front door."""
    import glob
    import json

    from vector_spark.config import load_config
    from vector_spark.topology import run_topology

    log = tmp_path / "app.log"
    log.write_text(
        "INFO [api] took=12ms fine\n"
        "ERROR [api] took=250ms upstream timeout\n"
        "WARN [worker] took=180ms slow batch\n"
        "not a log line\n")
    out = tmp_path / "out"
    cfg = load_config(
        os.path.join(REPO, "configs", "file_lua_pipeline.toml"),
        env={"APP_LOG_GLOB": str(log), "OUT_DIR": str(out)})
    run_topology(spark, cfg)

    allrows = spark.read.parquet(str(out / "all"))
    assert allrows.count() == 3  # the non-matching line was not emitted
    assert {r["service"] for r in allrows.collect()} == {"api", "worker"}

    slow_files = glob.glob(str(out / "slow" / "_path=svc-*" / "part-*"))
    slow = [json.loads(line) for f in slow_files for line in open(f)]
    assert sorted(r["ms"] for r in slow) == [180, 250]
    assert {r["level"] for r in slow} == {"ERROR", "WARN"}


def test_reference_syslog_regex_logs2metric_topology(spark, tmp_path):
    """The reference regression topology (regression/cases/
    syslog_regex_logs2metric_ddmetrics/vector/vector.toml) ported through
    the TOML front door: syslog decode -> remap parse_regex! (VRL idiom,
    byte-identical source string) -> log_to_metric [[metrics]] gauge with
    {{ field }} tag templates -> metric rows, asserted against a plain-
    Python oracle over the same capture (VERDICT r4 Next #8)."""
    from vector_spark.config import load_config
    from vector_spark.topology import build_topology, run_topology

    # deterministic syslog capture: RFC5424 lines; hosts alternate between
    # regex-matching (lower.tld) and non-matching (UPPER9) forms
    lines = []
    expected = []   # (value, hostname, facility, severity)
    n_abort = 0
    for i in range(120):
        pri = (i * 7) % 192
        if i % 4 == 3:
            host = f"NODE{i}"          # parse_regex! aborts -> dropped
            n_abort += 1
        else:
            host = ["alpha.example", "beta.test", "gamma.io"][i % 3]
            expected.append(
                (float(1000 + i), host.split(".")[0], pri // 8, pri % 8))
        lines.append(
            f"<{pri}>1 2024-03-0{i % 9 + 1}T10:00:{i % 60:02d}Z {host} "
            f"app{i % 5} {1000 + i} MSG{i} event number {i}")
    cap = tmp_path / "capture.log"
    cap.write_text("\n".join(lines) + "\n")
    out_dir = str(tmp_path / "metrics_out")

    cfg = load_config(
        "configs/syslog_regex_logs2metric.toml",
        env={"SYSLOG_CAPTURE": str(cap), "METRICS_OUT": out_dir})
    run_topology(spark, cfg)

    got = spark.read.parquet(out_dir).collect()
    assert all(r["name"] == "procid" for r in got)            # gauge name = field
    assert all(r["value_type"] == "gauge" and r["kind"] == "absolute"
               for r in got)
    got_set = {(r["value"], r["tags"]["hostname"],
                int(r["tags"]["facility"]), int(r["tags"]["severity"]))
               for r in got}
    assert got_set == set(expected)
    assert len(got) == len(expected)

    # the abort port carries exactly the non-matching hosts
    topo = build_topology(spark, cfg)
    assert topo.outputs["remap.dropped"].count() == n_abort


def test_reference_splunk_hec_route_s3_topology(spark, tmp_path):
    """The reference's splunk_hec_route_s3 regression topology
    (regression/cases/splunk_hec_route_s3/vector/vector.toml) through
    the front door: HEC JSON capture -> route on the byte-identical VRL
    conditions (.attrs.c2cContainerType == "service") -> two aws_s3
    sinks with the byte-identical templated key_prefix ({{ field }} +
    strftime), newline-delimited json encode, except_fields drop."""
    import json as _json

    from vector_spark.config import load_config
    from vector_spark.topology import run_topology

    lines = []
    n_service = n_sidecar = 0
    for i in range(60):
        ctype = "service" if i % 3 == 0 else "sidecar"
        if ctype == "service":
            n_service += 1
        else:
            n_sidecar += 1
        lines.append(_json.dumps({
            "time": 1704067200 + i * 3600,     # 2024-01-01T00:00Z + i hours
            "attrs": {
                "c2cContainerType": ctype,
                "aws_account": f"acct{i % 2}",
                "systemid": "sys1",
                "c2cService": f"svc{i % 4}",
                "c2cPartition": "p0",
                "c2cStage": "prod",
            },
            "event": f"payload {i}",
        }))
    cap = tmp_path / "hec.jsonl"
    cap.write_text("\n".join(lines) + "\n")
    sidecar_out = str(tmp_path / "s3_sidecar")
    service_out = str(tmp_path / "s3_service")

    cfg = load_config(
        "configs/splunk_hec_route_s3.toml",
        env={"HEC_CAPTURE": str(cap), "S3_SIDECAR_OUT": sidecar_out,
             "S3_SERVICE_OUT": service_out})
    run_topology(spark, cfg)

    def _read_lines(base):
        out = []
        for root, _dirs, files in __import__("os").walk(base):
            for f in files:
                if f.startswith(("_", ".")) or not f.endswith(".txt"):
                    continue
                p = __import__("os").path.join(root, f)
                out.extend((p, l) for l in open(p).read().splitlines() if l)
        return out

    service_rows = _read_lines(service_out)
    sidecar_rows = _read_lines(sidecar_out)
    assert len(service_rows) == n_service
    assert len(sidecar_rows) == n_sidecar
    # key_prefix rendered into the directory: fields + strftime pieces
    p0 = service_rows[0][0]
    assert "v1/source_type/app/system_id/sys1/service/svc" in p0.replace("%2F", "/")
    assert "/year/2024/month/01/" in p0.replace("%2F", "/")
    assert "v1/source_type/sidecar/aws_account_id/acct" in sidecar_rows[0][0].replace("%2F", "/")
    # except_fields: timestamp dropped from the encoded event
    ev = _json.loads(service_rows[0][1])
    assert "timestamp" not in ev
    assert ev["attrs"]["c2cContainerType"] == "service"
    # every routed event landed on the right side of the VRL condition
    assert all(_json.loads(l)["attrs"]["c2cContainerType"] == "service"
               for _, l in service_rows)
    assert all(_json.loads(l)["attrs"]["c2cContainerType"] != "service"
               for _, l in sidecar_rows)


def test_vrl_condition_translation_edge_cases(spark):
    """The VRL->SQL condition rewrite is quote-aware: '==', '&&', '||'
    and '.word' INSIDE double-quoted literals survive; mixed named and
    unnamed regex groups extract the right captures; NULL source fields
    abort to the dropped port instead of vanishing (round-5 review)."""
    from vector_spark.topology import build_topology

    df = spark.createDataFrame(
        [("error .timeout reached", 1), ("x && y", 2), ("other", 3), (None, 4)],
        "msg string, v long")
    topo = build_topology(spark, {
        "sources": {"src": {"kind": "memory", "df": df}},
        "transforms": {
            "r": {
                "kind": "route", "inputs": ["src"],
                "route": {
                    "lit_dot": '.msg == "error .timeout reached"',
                    "lit_amp": '.msg == "x && y"',
                },
            },
        },
    })
    assert [r["v"] for r in topo.outputs["r.lit_dot"].collect()] == [1]
    assert [r["v"] for r in topo.outputs["r.lit_amp"].collect()] == [2]
    # boolean operators OUTSIDE literals translate
    topo2 = build_topology(spark, {
        "sources": {"src": {"kind": "memory", "df": df}},
        "transforms": {
            "r": {"kind": "route", "inputs": ["src"],
                  "route": {"both": '.v == 1 || .v == 3'}},
        },
    })
    assert sorted(r["v"] for r in topo2.outputs["r.both"].collect()) == [1, 3]


def test_remap_parse_regex_mixed_groups_and_null(spark):
    from vector_spark.topology import build_topology

    df = spark.createDataFrame(
        [("ab-prod-42",), ("cd-dev-7",), ("nope",), (None,)], "host string")
    topo = build_topology(spark, {
        "sources": {"src": {"kind": "memory", "df": df}},
        "transforms": {
            "remap": {
                "kind": "remap", "inputs": ["src"],
                # a plain (...) group BEFORE the named groups: indices
                # must not shift
                "source": r". |= parse_regex!(.host, r'^(ab|cd)-(?P<env>\w+)-(?P<id>\d+)')",
            },
        },
    })
    rows = {r["host"]: (r["env"], r["id"])
            for r in topo.outputs["remap"].collect()}
    assert rows == {"ab-prod-42": ("prod", "42"), "cd-dev-7": ("dev", "7")}
    dropped = topo.outputs["remap.dropped"].collect()
    # 'nope' (no match) AND the NULL host both land on the dropped port
    assert len(dropped) == 2


def test_reference_datadog_agent_remap_topology(spark, tmp_path):
    """The reference's datadog_agent_remap_blackhole regression topology
    through the front door with its remap VRL program BYTE-IDENTICAL:
    sequential assignment, if/else-if/else branch-exclusive fields,
    object literal, and the error-capturing fallible concat — compiled
    to pure Column expressions, asserted against a plain-Python
    oracle."""
    import json as _json

    from vector_spark.config import load_config
    from vector_spark.topology import build_topology, run_topology

    rows = [
        {"status": "warning", "message": "m1", "ddsource": "agent", "service": "s1"},
        {"status": "notice", "message": "m2", "ddsource": "agent", "service": "s1"},
        {"status": "info", "message": "m3", "ddsource": "agent", "service": "s2"},
        {"status": "warning", "ddsource": "agent", "service": "s2"},  # no message
    ]
    cap = tmp_path / "agent.jsonl"
    cap.write_text("\n".join(_json.dumps(r) for r in rows) + "\n")

    cfg = load_config(
        "configs/datadog_agent_remap_blackhole.toml",
        env={"AGENT_CAPTURE": str(cap)})
    res = run_topology(spark, cfg)
    assert res["blackhole"] == 4  # blackhole counts every event

    got = {r["message"]: r
           for r in build_topology(spark, cfg).outputs["remap"].collect()}
    m1, m2, m3, m4 = got["m1"], got["m2"], got["m3"], got[None]
    assert all(r["hostname"] == "vector" for r in got.values())
    # branch-exclusive field assignment
    assert (m1["thing"], m1["thung"], m1["nong"]) == ("VECTOR", None, None)
    assert (m2["thing"], m2["thung"], m2["nong"]) == (None, "vector", None)
    assert (m3["thing"], m3["thung"], m3["nong"]) == (None, None, "VECTOR")
    # object literal + sequential scope + infallible path
    assert m1["matches"].asDict() == {"name": "m1", "num": "2"}
    assert m1["origin"] == "vector/m1/2" and m1["err"] is None
    assert m2["origin"] == "vector/m2/2"
    # fallible concat: missing message -> NULL origin + error captured
    assert m4["origin"] is None
    assert m4["err"] is not None and "expected string" in m4["err"]
