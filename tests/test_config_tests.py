"""`vector test` harness (vector_spark/config_tests.py): reference
unit-test semantics — per-condition at-least-one-event checks, empty-output
errors, no_outputs_from silence, subgraph pruning — plus the shipped
behavior config through the TOML front door."""

from __future__ import annotations

import os

from vector_spark.config import load_config
from vector_spark.config_tests import run_config_tests

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BASE = {
    "transforms": {
        "router": {
            "kind": "route",
            "inputs": ["__x__"],
            "routes": {"errors": "level = 'ERROR'"},
        },
        "unrelated": {
            # references a source that exists only in production configs —
            # the harness must PRUNE it, not fail the build
            "kind": "filter",
            "inputs": ["some_prod_source"],
            "condition": "1=1",
        },
    },
}


def _t(name, **kw):
    return {
        "name": name,
        "inputs": [
            {"insert_at": "router",
             "log_fields": {"level": "ERROR", "status": 500}},
            {"insert_at": "router",
             "log_fields": {"level": "INFO", "status": 200}},
        ],
        **kw,
    }


def test_condition_needs_one_matching_event(spark):
    cfg = {**BASE, "tests": [_t(
        "ok",
        outputs=[{"extract_from": "router.errors",
                  "conditions": [{"type": "sql", "source": "status = 500"}]}],
    )]}
    (r,) = run_config_tests(spark, cfg)
    assert r.passed, r.errors


def test_failing_condition_reports_error(spark):
    cfg = {**BASE, "tests": [_t(
        "bad",
        outputs=[{"extract_from": "router.errors",
                  "conditions": [{"type": "sql", "source": "status = 999"}]}],
    )]}
    (r,) = run_config_tests(spark, cfg)
    assert not r.passed and "condition[0]" in r.errors[0]


def test_empty_output_is_an_error(spark):
    cfg = {**BASE, "tests": [{
        "name": "silent",
        "inputs": [{"insert_at": "router",
                    "log_fields": {"level": "INFO", "status": 200}}],
        "outputs": [{"extract_from": "router.errors", "conditions": []}],
    }]}
    (r,) = run_config_tests(spark, cfg)
    assert not r.passed and "no events received" in r.errors[0]


def test_no_outputs_from(spark):
    cfg = {**BASE, "tests": [
        _t("quiet", no_outputs_from=["router.errors"]),  # ERROR event -> fails
        {"name": "truly-quiet",
         "inputs": [{"insert_at": "router",
                     "log_fields": {"level": "INFO", "status": 200}}],
         "no_outputs_from": ["router.errors"]},
    ]}
    fail, ok = run_config_tests(spark, cfg)
    assert not fail.passed and "expected no outputs" in fail.errors[0]
    assert ok.passed, ok.errors


def test_requires_outputs_or_silence(spark):
    cfg = {**BASE, "tests": [{"name": "empty", "inputs": []}]}
    (r,) = run_config_tests(spark, cfg)
    assert not r.passed and "at least one of" in r.errors[0]


def test_shipped_behavior_config_passes(spark):
    """configs/route_tests.toml end-to-end: TOML front door -> grok parse
    -> route -> [[tests]] with sql AND datadog_search conditions."""
    cfg = load_config(os.path.join(REPO, "configs", "route_tests.toml"), env={})
    results = run_config_tests(spark, cfg)
    assert len(results) == 2
    for r in results:
        assert r.passed, (r.name, r.errors)
