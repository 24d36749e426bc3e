"""``vector test`` analogue: execute config-embedded ``[[tests]]`` blocks
(reference src/config/unit_test/mod.rs + unit_test_components.rs, the
harness behind the 3538-LoC tests/behavior corpus — SURVEY §3.2/§5).

A test block (TOML shape mirrors the reference's field names)::

    [[tests]]
    name = "errors route"
    no_outputs_from = ["router.warnings"]          # optional

    [[tests.inputs]]
    insert_at = "parse"                            # component under test
    [tests.inputs.log_fields]                      # flat event fields
    message = "..."

    [[tests.outputs]]
    extract_from = "router.errors"
    [[tests.outputs.conditions]]
    type = "sql"                                   # or "datadog_search"
    source = "level = 'ERROR'"

Semantics replayed from unit_test_components.rs:194-253:

- each input's ``insert_at`` component has its ``inputs`` replaced by a
  memory source of the injected events (mod.rs:229-243's template-source
  substitution);
- the topology is PRUNED to components forward-reachable from the
  injected targets (the reference hydrates only the needed subgraph);
- a check (one ``[[tests.outputs]]``) fails if the extracted component
  emitted nothing ("no events received", :210) — otherwise EACH condition
  must be satisfied by AT LEAST ONE received event (:216-231: per-event
  errors are cleared on the first passing event);
- ``no_outputs_from`` components must emit zero events (:255-269);
- a test with neither outputs nor no_outputs_from is invalid (mod.rs:263).

Conditions are SQL boolean expressions (≅ VRL conditions) or
datadog_search queries through :mod:`vector_spark.conditions` — the same
two condition dialects the transforms use.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Row, SparkSession
from pyspark.sql import functions as F

from vector_spark.topology import TopologyError, build_topology


def _dict_to_row(d: dict) -> Row:
    """Recursively convert nested dicts to Rows so createDataFrame infers
    struct (not map) columns for event-shaped test inputs."""
    return Row(**{
        k: _dict_to_row(v) if isinstance(v, dict) else v for k, v in d.items()
    })


@dataclass
class ConfigTestResult:
    name: str
    errors: list[str] = field(default_factory=list)

    @property
    def passed(self) -> bool:
        return not self.errors


def _condition_col(cond: dict, df):
    typ = cond.get("type", "sql")
    src = cond["source"]
    if typ in ("sql", "vrl"):  # VRL boolean conditions map to SQL exprs
        return F.expr(src)
    if typ == "datadog_search":
        from vector_spark.conditions import compile_datadog_search

        # schema-aware facet compilation; no tags column in test events
        return compile_datadog_search(src, df, tags_col=None)
    raise TopologyError(f"unknown condition type {typ!r}")


def _condition_col_typed(cond: dict, df):
    """Conditions that need no source: ``is_metric``/``is_log``
    (reference conditions/is_metric.rs, is_log.rs) — an event is a
    metric iff its ``metric`` part is set."""
    typ = cond.get("type", "sql")
    if typ == "is_metric":
        if "metric" not in df.columns:
            return F.lit(False)
        return F.col("metric").isNotNull()
    if typ == "is_log":
        if "metric" not in df.columns:
            return F.lit(True)
        return F.col("metric").isNull()
    return _condition_col(cond, df)


def _prune_reachable(transforms: dict, roots: set[str]) -> dict:
    """Keep only transforms forward-reachable from the injected roots
    (inputs referencing ``root`` or a kept transform, ports included)."""
    kept: set[str] = set()
    changed = True
    while changed:
        changed = False
        for name, spec in transforms.items():
            if name in kept:
                continue
            feeds = {r.split(".", 1)[0] for r in spec.get("inputs", [])}
            if feeds & (roots | kept):
                kept.add(name)
                changed = True
    return {n: s for n, s in transforms.items() if n in kept}


def run_config_tests(
    spark: SparkSession, config: dict
) -> list[ConfigTestResult]:
    results = []
    transforms = config.get("transforms", {})
    for t in config.get("tests", []):
        res = ConfigTestResult(t.get("name", "<unnamed>"))
        results.append(res)
        outputs = t.get("outputs", [])
        silent = t.get("no_outputs_from", [])
        if not outputs and not silent:
            res.errors.append(
                "unit test must contain at least one of `outputs` or "
                "`no_outputs_from`."
            )
            continue
        by_target: dict[str, list[dict]] = {}
        for inp in t.get("inputs", []):
            by_target.setdefault(inp["insert_at"], []).append(inp)
        unknown = [n for n in by_target if n not in transforms]
        if unknown or not by_target:
            res.errors.append(f"invalid insert_at targets: {sorted(unknown)}")
            continue
        cfg = {
            "sources": {},
            "transforms": {
                k: dict(v)
                for k, v in _prune_reachable(
                    transforms, set(by_target)
                ).items()
            },
            "sinks": {},
        }
        for target in by_target:
            cfg["transforms"][target] = dict(transforms[target])
        for target, inps in by_target.items():
            if any("metric" in i for i in inps):
                # metric-typed inputs ([tests.input.metric], reference
                # unit_test/mod.rs input events) become event-shaped rows
                # with a `metric` struct column
                rows = [Row(metric=_dict_to_row(i["metric"])) for i in inps]
            else:
                rows = [dict(i.get("log_fields", {})) for i in inps]
            src_name = f"__test_input_{target}"
            cfg["sources"][src_name] = {
                "kind": "memory",
                "df": spark.createDataFrame(rows),
            }
            cfg["transforms"][target]["inputs"] = [src_name]
        try:
            topo = build_topology(spark, cfg)
        except (TopologyError, KeyError) as e:
            res.errors.append(f"topology build failed: {e}")
            continue
        for i, out in enumerate(outputs):
            ref = out["extract_from"]
            if ref not in topo.outputs:
                res.errors.append(f"check[{i}]: unknown extract_from {ref!r}")
                continue
            df = topo.outputs[ref].cache()
            try:
                if df.count() == 0:
                    res.errors.append(
                        f"check[{i}] for {ref!r} failed: no events received."
                    )
                    continue
                for j, cond in enumerate(out.get("conditions", [])):
                    if df.filter(_condition_col_typed(cond, df)).count() == 0:
                        res.errors.append(
                            f"check[{i}] condition[{j}] for {ref!r} failed: "
                            f"no event satisfied {cond['source']!r}"
                        )
            finally:
                df.unpersist()
        for ref in silent:
            if ref not in topo.outputs:
                res.errors.append(f"unknown no_outputs_from {ref!r}")
                continue
            n = topo.outputs[ref].count()
            if n:
                res.errors.append(
                    f"expected no outputs from {ref!r}, received {n}"
                )
    return results
