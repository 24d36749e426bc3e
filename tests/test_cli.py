"""The vector CLI twin (jobs/vector_cli.py): validate / graph / list /
top / tap subcommands against a real TOML config (reference src/cli.rs
SubCommand surface; `test` is covered by test_config_tests.py and
configs/*_tests.toml).
"""

from __future__ import annotations

import json
import os
import sys

import pytest

JOBS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "jobs")
sys.path.insert(0, JOBS)

import vector_cli  # noqa: E402


@pytest.fixture()
def config_file(tmp_path, spark):
    src = tmp_path / "events"
    spark.createDataFrame(
        [("a", 1.0), ("b", 250.0), ("a", 500.0)], "k string, v double"
    ).write.mode("overwrite").parquet(str(src))
    cfg = tmp_path / "vector.toml"
    cfg.write_text(f"""
[sources.events]
type = "parquet"
path = "{src}"

[transforms.big]
type = "filter"
inputs = ["events"]
condition = "v > 100"

[transforms.router]
type = "route"
inputs = ["big"]
[transforms.router.routes]
a_side = "k = 'a'"

[sinks.out]
type = "memory"
inputs = ["router.a_side"]
""")
    return str(cfg)


def test_validate_ok(config_file, capsys):
    assert vector_cli.main(["validate", config_file]) == 0
    out = capsys.readouterr().out
    assert "Validated" in out and "Health checks" in out


def test_validate_no_environment(config_file, capsys):
    assert vector_cli.main(["validate", "--no-environment", config_file]) == 0
    assert "Health checks" not in capsys.readouterr().out


def test_validate_bad_config(tmp_path, capsys):
    bad = tmp_path / "bad.toml"
    bad.write_text("""
[transforms.t]
type = "filter"
inputs = ["nope"]
condition = "1 = 1"
""")
    assert vector_cli.main(["validate", "--no-environment", str(bad)]) == vector_cli.EX_CONFIG
    assert "unknown input" in capsys.readouterr().out


def test_graph(config_file, capsys):
    assert vector_cli.main(["graph", config_file]) == 0
    dot = capsys.readouterr().out
    assert "digraph topology" in dot
    assert '"router" -> "out" [label="a_side"]' in dot


def test_list_json(capsys):
    assert vector_cli.main(["list", "--format", "json"]) == 0
    reg = json.loads(capsys.readouterr().out)
    assert "lua" in reg["transforms"] and "route" in reg["transforms"]
    assert "parquet" in reg["sources"] and "blackhole" in reg["sinks"]


def test_top(config_file, capsys):
    assert vector_cli.main(["top", config_file]) == 0
    out = capsys.readouterr().out
    rows = {line.split()[0]: line.split()[1] for line in out.splitlines()[1:] if line}
    assert rows["events"] == "3"
    assert rows["big"] == "2"
    assert rows["router.a_side"] == "1"


def test_tap(config_file, capsys):
    assert vector_cli.main(["tap", "--limit", "2", "router.*", config_file]) == 0
    events = [json.loads(line) for line in capsys.readouterr().out.splitlines()]
    assert events, "tap produced no samples"
    assert all(e["component"].startswith("router.") for e in events)
    matched = [e for e in events if e["component"] == "router.a_side"]
    assert matched and matched[0]["event"]["k"] == "a"
