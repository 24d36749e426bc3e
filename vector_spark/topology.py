"""Config-driven topology runner — the rebuild of Vector's
config -> compile -> build -> run lifecycle (SURVEY.md §3.1).

A topology is a dict (≅ Vector's TOML after parsing)::

    {
      "sources":    {name: {"kind": "parquet", "path": ...}},
      "transforms": {name: {"kind": "filter"|"route"|"remap_grok"|...,
                             "inputs": [upstream, ...], ...}},
      "sinks":      {name: {"kind": "parquet"|"console"|"blackhole"|"memory",
                             "inputs": [upstream], ...}},
    }

Compile phase mirrors src/config/compiler.rs:8-80 + src/config/graph.rs:
- name/shape validation, unknown-input check
- cycle check (DFS from sinks, graph.rs:210-247)
- route outputs addressed as "transform.route_name" (multi-output ports,
  exactly Vector's `route.<name>` syntax)

Build phase: each component becomes a DataFrame (sources) or a
DataFrame->DataFrame stage; Catalyst sees the WHOLE topology as one plan
per sink, so cross-stage optimization (pushdown through the fan-out) is
free — the Spark-native analogue of Vector's per-component Tokio tasks.

There is deliberately no optimizer here (Vector has none; Catalyst is
ours) and no buffering/backpressure (shuffle + AQE).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_spark.enrichment import enrich_find
from vector_spark.functions.grok import grok_columns, grok_matched
from vector_spark.operators import dedupe, filter_events, reduce_events, route, sample, throttle


class TopologyError(ValueError):
    pass


# the component registry `vector list` reports (src/list.rs); each name
# is a branch of the builders below
KNOWN_SOURCES = ("parquet", "memory", "file", "exec")
KNOWN_TRANSFORMS = (
    "filter", "route", "sample", "dedupe", "throttle", "reduce",
    "remap_grok", "remap_select", "enrich", "aggregate", "lua",
    "log_to_metric",
)
KNOWN_SINKS = ("parquet", "file", "blackhole", "console", "memory")


@dataclass
class Topology:
    config: dict
    outputs: dict[str, DataFrame] = field(default_factory=dict)  # component(.port) -> DF


_VRL_PATH = re.compile(r"(^|[^\w\d'\"])\.([A-Za-z_][\w]*(?:\.[A-Za-z_]\w*)*)")
# double-quoted string literal with escapes — kept verbatim during the
# VRL->SQL rewrite so '==' / '&&' / '.word' INSIDE literals survive
_DQ_LITERAL = re.compile(r'"(?:[^"\\]|\\.)*"')


def _expr(e) -> Column:
    """Conditions in configs are SQL strings (≅ VRL boolean conditions),
    VRL path comparisons, or prepared Columns.

    The VRL dialect the reference's regression configs use —
    ``.attrs.c2cContainerType == "service"`` — translates structurally:
    leading-dot paths become column references (dots are struct access
    in Spark SQL too), ``==``/``&&``/``||`` become SQL ``=``/AND/OR.
    The rewrite is quote-aware: double-quoted literal CONTENT passes
    through untouched.  A condition with no leading-dot path outside a
    literal passes through as SQL unchanged."""
    if not isinstance(e, str):
        return e
    parts = _DQ_LITERAL.split(e)          # code segments
    lits = _DQ_LITERAL.findall(e)         # literal segments, in order
    if any(_VRL_PATH.search(p) for p in parts):
        parts = [
            _VRL_PATH.sub(r"\1\2", p).replace("==", "=")
            .replace("&&", " AND ").replace("||", " OR ")
            for p in parts
        ]
        out = [parts[0]]
        for lit, code in zip(lits, parts[1:]):
            out += [lit, code]
        e = "".join(out)
    return F.expr(e)


def _known_outputs(config: dict) -> list[str]:
    """Every addressable output id: sources, transforms, and declared
    multi-output ports (route's ``name.route``/``name._unmatched``,
    remap_grok's ``name.dropped``)."""
    out = list(config.get("sources", {}))
    for name, spec in config.get("transforms", {}).items():
        out.append(name)
        if spec.get("kind") == "route":
            out += [f"{name}.{r}"
                    for r in (spec.get("routes") or spec.get("route") or {})]
            out.append(f"{name}._unmatched")
        if spec.get("kind") == "remap_grok" and spec.get("drop_on_error"):
            out.append(f"{name}.dropped")
        if spec.get("kind") == "lua" and spec.get("error_channel"):
            out.append(f"{name}.dropped")
    return out


def expand_glob_inputs(config: dict) -> dict:
    """Wildcard input expansion (``inputs = ["app_*"]`` — reference
    ``expand_globs``, src/config/compiler.rs:127 + graph.rs input
    resolution): each glob pattern expands to every matching component
    output id EXCEPT the component's own outputs (no self-loops, same
    exclusion as the reference).  A pattern matching nothing is an error.
    Non-glob inputs pass through untouched.  Returns a new config dict;
    idempotent."""
    import fnmatch

    known = _known_outputs(config)
    cfg = dict(config)
    for section in ("transforms", "sinks"):
        if section not in cfg:
            continue
        newsec = {}
        for name, spec in cfg[section].items():
            refs = spec.get("inputs", [])
            if not any("*" in r or "?" in r or "[" in r for r in refs):
                newsec[name] = spec
                continue
            expanded: list[str] = []
            for r in refs:
                if "*" in r or "?" in r or "[" in r:
                    hits = [
                        k for k in known
                        if fnmatch.fnmatchcase(k, r)
                        and k != name and not k.startswith(name + ".")
                    ]
                    if not hits:
                        raise TopologyError(
                            f"{name}: input pattern {r!r} matches no outputs"
                        )
                    expanded += hits
                else:
                    expanded.append(r)
            newsec[name] = {**spec, "inputs": expanded}
        cfg[section] = newsec
    return cfg


def compile_topology(config: dict) -> list[str]:
    """Validate + topo-sort; returns build order of transform names.

    Glob inputs are expanded first (``expand_glob_inputs``).  Raises
    TopologyError on unknown inputs, cycles, or sinks with fan-in
    (≅ graph.typecheck + check_for_cycles, src/config/graph.rs:185-247).
    """
    config = expand_glob_inputs(config)
    sources = config.get("sources", {})
    transforms = config.get("transforms", {})
    sinks = config.get("sinks", {})
    names = set(sources) | set(transforms) | set(sinks)
    if len(names) != len(sources) + len(transforms) + len(sinks):
        raise TopologyError("duplicate component names")

    def base(ref: str) -> str:
        return ref.split(".", 1)[0]

    for name, spec in {**transforms, **sinks}.items():
        for ref in spec.get("inputs", []):
            if base(ref) not in (set(sources) | set(transforms)):
                raise TopologyError(f"{name}: unknown input {ref!r}")

    # Kahn toposort over transforms (sources have no inputs; sinks are leaves)
    order: list[str] = []
    seen: set[str] = set(sources)
    pending = dict(transforms)
    while pending:
        ready = [
            n for n, s in pending.items()
            if all(base(r) in seen for r in s.get("inputs", []))
        ]
        if not ready:
            raise TopologyError(f"cycle detected among {sorted(pending)}")
        for n in sorted(ready):
            order.append(n)
            seen.add(n)
            del pending[n]
    return order


def _file_source(spark: SparkSession, name: str, spec: dict) -> DataFrame:
    """`file` source (reference src/sources/file.rs): line events from
    ``include`` globs, each carrying the producing ``file`` path (the
    reference's file field); optional ``multiline`` aggregation
    (src/line_agg.rs modes via :mod:`vector_spark.multiline`) and a
    ``decoding.codec`` of syslog/gelf/json.

    Batch semantics: the newline framing is the text reader itself.
    With ``multiline``, per-file line ORDER is load-bearing, so files
    are read whole (``wholetext``) and split — bounded by file size,
    the same unit the reference's per-file line aggregator buffers.
    Tail-and-checkpoint behavior is the pipeline manifest's job."""
    include = spec["include"]
    paths = [include] if isinstance(include, str) else list(include)
    ml = spec.get("multiline")
    if ml:
        from vector_spark.multiline import line_agg

        whole = spark.read.text(paths, wholetext=True).select(
            F.input_file_name().alias("file"),
            F.posexplode(F.split(F.col("value"), "\n")).alias("line_no", "line"),
        ).filter(F.col("line") != "")
        df = line_agg(
            whole,
            start_pattern=ml["start_pattern"],
            condition_pattern=ml["condition_pattern"],
            mode=ml["mode"],
            key_cols=["file"],
        )
    else:
        df = spark.read.text(paths).select(
            F.col("value").alias("message"),
            F.input_file_name().alias("file"),
        )
    codec = (spec.get("decoding") or {}).get("codec")
    if codec == "syslog":
        from vector_spark.sources import decode_syslog

        df = decode_syslog(df)
    elif codec == "gelf":
        from vector_spark.sources import decode_gelf

        df = decode_gelf(df)
    elif codec == "json":
        from vector_spark.sources import decode_json_field

        df = decode_json_field(df, spec["decoding"]["schema"])
    elif codec not in (None, "bytes"):
        raise TopologyError(f"{name}: unknown decoding codec {codec!r}")
    return df


def _exec_source(spark: SparkSession, name: str, spec: dict) -> DataFrame:
    """`exec` source (reference src/sources/exec/mod.rs, scheduled mode):
    run ``command`` once driver-side and emit one event per output line
    with the reference's metadata fields (data_stream stdout/stderr,
    command, pid).  ``include_stderr`` mirrors the reference option."""
    import subprocess

    cmd = spec["command"]
    proc = subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    try:
        out_b, err_b = proc.communicate(timeout=float(spec.get("timeout", 60)))
    except subprocess.TimeoutExpired:
        proc.kill()
        raise TopologyError(f"{name}: exec command timed out")
    cmd_str = cmd if isinstance(cmd, str) else " ".join(cmd)
    rows = [
        (line, "stdout", cmd_str, proc.pid)
        for line in out_b.decode("utf-8", "replace").splitlines()
    ]
    if spec.get("include_stderr", True):
        rows += [
            (line, "stderr", cmd_str, proc.pid)
            for line in err_b.decode("utf-8", "replace").splitlines()
        ]
    return spark.createDataFrame(
        rows, "message string, data_stream string, command string, pid long")


def _syslog_source(spark: SparkSession, name: str, spec: dict) -> DataFrame:
    """``syslog`` source (reference src/sources/syslog.rs): a TCP/UDP
    listener decoding RFC3164/5424 frames into events with the
    reference's field names (host, appname, procid, facility, severity,
    timestamp, message).  Batch twin: the captured stream is read from
    ``include`` files (newline framing ≙ the listener's octet framing);
    the listener options (``address``/``mode``/``max_length``) are
    accepted so a reference-shaped config loads unchanged, but are inert
    in batch — there is no socket to bind."""
    include = spec.get("include")
    if include is None:
        raise TopologyError(
            f"{name}: the batch syslog source needs `include` file globs "
            "(the captured stream; address/mode are listener-only options)")
    paths = [include] if isinstance(include, str) else list(include)
    from vector_spark.sources import decode_syslog

    df = decode_syslog(
        spark.read.text(paths).select(F.col("value").alias("message")))
    # reference field names (src/sources/syslog.rs enrich_syslog_event):
    # hostname -> host, appname/procid/msgid verbatim, facility+severity
    # keywords; the raw line stays in `message` like the reference's
    # message body
    return df.select(
        F.col("syslog_message").alias("message"),
        F.col("syslog_hostname").alias("host"),
        F.col("syslog_appname").alias("appname"),
        F.col("syslog_procid").alias("procid"),
        F.col("syslog_msgid").alias("msgid"),
        F.col("syslog_facility").alias("facility"),
        F.col("syslog_severity").alias("severity"),
        F.col("syslog_timestamp").alias("timestamp"),
        F.col("_decode_error"),
    )


def _splunk_hec_source(spark: SparkSession, name: str, spec: dict) -> DataFrame:
    """``splunk_hec`` source (reference src/sources/splunk_hec/mod.rs):
    an HTTP listener accepting HEC JSON event POSTs.  Batch twin: the
    captured request bodies are read as JSON lines from ``include`` with
    a declared ``schema`` for the event payload (a batch engine needs
    types up front); the listener options (``address``/``token``) are
    accepted so a reference-shaped config loads unchanged, but are inert.
    An epoch-seconds ``time`` field becomes ``timestamp`` like the
    reference's event enrichment."""
    include = spec.get("include")
    if include is None:
        raise TopologyError(
            f"{name}: the batch splunk_hec source needs `include` file "
            "globs (the captured HEC bodies; address/token are "
            "listener-only options)")
    if "schema" not in spec:
        raise TopologyError(f"{name}: the batch splunk_hec source needs a "
                            "declared `schema` for the event JSON")
    paths = [include] if isinstance(include, str) else list(include)
    from vector_spark.sources import decode_json_field

    # the raw body parses into the event and is then dropped — keeping
    # it as "message" would collide with a declared `message` field
    df = decode_json_field(
        spark.read.text(paths).select(F.col("value").alias("_raw")),
        spec["schema"], src="_raw").drop("_raw")
    if "time" in df.columns:
        df = df.withColumn(
            "timestamp", F.col("time").cast("double").cast("timestamp"))
    return df


_VRL_PARSE_REGEX = re.compile(
    r"\s*\.\s*\|=\s*parse_regex(!?)\(\s*\.([A-Za-z_][\w.]*)\s*,\s*"
    r"r'(.*)'\s*\)\s*", re.S)


def _remap_parse_regex(name: str, df: DataFrame, spec: dict, out: dict) -> DataFrame:
    """``remap`` transform, two compiled VRL subsets: the ``. |=
    parse_regex!(.field, r'...')`` merge idiom
    (regression/cases/syslog_regex_logs2metric_ddmetrics) and the
    statement-program subset — assignments, if/else chains, object
    literals, error-capturing fallible assignment —
    (regression/cases/datadog_agent_remap_*), both compiled to pure
    Column expressions (vrl_program.py).  Named captures merge into the
    event as new columns; the ``!`` (abort) form drops non-matching
    events to ``name.dropped`` like the reference's drop_on_abort
    default.  Anything outside both subsets raises — the
    general-purpose hook path is the ``lua`` kind."""
    src = spec["source"]
    m = _VRL_PARSE_REGEX.fullmatch(src)
    if not m:
        from vector_spark.vrl_program import VrlCompileError, compile_vrl_program

        try:
            return compile_vrl_program(df, src)
        except VrlCompileError as e:
            raise TopologyError(
                f"{name}: unsupported remap source (the front door compiles "
                "the parse_regex! idiom and the VRL statement subset; use "
                f"kind=lua for general hooks): {e}") from e
    abort, field, pattern = m.group(1) == "!", m.group(2), m.group(3)
    # assign each NAMED group its true capturing-group index: plain (...)
    # groups also count, so a pattern mixing named and unnamed groups
    # must not shift the extraction indices
    fields: list[tuple[str, int]] = []
    gidx = 0
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "\\":
            i += 2
            continue
        if c == "[":  # character class: '(' inside is literal
            j = i + 1
            if j < len(pattern) and pattern[j] == "^":
                j += 1
            if j < len(pattern) and pattern[j] == "]":
                j += 1
            while j < len(pattern) and pattern[j] != "]":
                j += 2 if pattern[j] == "\\" else 1
            i = j + 1
            continue
        if c == "(":
            gm = re.match(r"\(\?P<(\w+)>", pattern[i:])
            if gm:
                gidx += 1
                fields.append((gm.group(1), gidx))
                i += gm.end()
                continue
            if not pattern.startswith("(?", i):
                gidx += 1  # plain capturing group
            i += 1
            continue
        i += 1
    java_pattern = re.sub(r"\(\?P<(\w+)>", "(", pattern)  # Java regex has no ?P
    cols = [
        F.regexp_extract(F.col(field), java_pattern, idx).alias(f)
        for f, idx in fields
    ]
    matched = F.col(field).rlike(java_pattern)
    if abort:
        # NULL field: rlike is NULL, which the reference's abort treats
        # as a failed parse — route to .dropped, never silently vanish
        kept = F.coalesce(matched, F.lit(False))
        out[f"{name}.dropped"] = df.filter(~kept).select(
            "*",
            F.lit("parse_regex abort").alias("dropped_reason"),
            F.lit(name).alias("dropped_component_id"),
        )
        return df.filter(kept).select("*", *cols)
    # non-abort form: unmatched events keep flowing with empty captures
    return df.select("*", *cols)


class _ObservingOutputs(dict):
    """Topology outputs dict that wraps every component output with a
    named Observation counting its rows — the Spark-native `vector top`:
    metrics ride the REAL query execution instead of extra count jobs
    (one observation per plan node; a single action per sink evaluates
    the whole upstream chain and fills every observation on its path)."""

    def __init__(self, observations: dict):
        super().__init__()
        self._observations = observations

    def __setitem__(self, key, df):
        import uuid

        from pyspark.sql import Observation

        ob = Observation(f"top_{key}_{uuid.uuid4().hex[:8]}")
        self._observations[key] = ob
        super().__setitem__(key, df.observe(ob, F.count(F.lit(1)).alias("rows")))


def build_topology(
    spark: SparkSession, config: dict, observe: dict | None = None
) -> Topology:
    """Build every component; returns the Topology with all outputs bound.

    ``observe``: pass a dict to receive one ``pyspark.sql.Observation``
    per component output, attached inside the built plans (see
    :func:`top_topology`)."""
    config = expand_glob_inputs(config)
    order = compile_topology(config)
    topo = Topology(config)
    if observe is not None:
        topo.outputs = _ObservingOutputs(observe)
    out = topo.outputs

    for name, spec in config.get("sources", {}).items():
        kind = spec["kind"]
        if kind == "parquet":
            out[name] = spark.read.parquet(spec["path"])
        elif kind == "memory":
            out[name] = spec["df"]
        elif kind == "file":
            out[name] = _file_source(spark, name, spec)
        elif kind == "exec":
            out[name] = _exec_source(spark, name, spec)
        elif kind == "syslog":
            out[name] = _syslog_source(spark, name, spec)
        elif kind in ("splunk_hec", "datadog_agent"):
            # both are HTTP JSON-event listeners in the reference
            # (src/sources/splunk_hec, src/sources/datadog_agent); the
            # batch twin is identical: captured JSON bodies + declared
            # schema, listener options inert
            out[name] = _splunk_hec_source(spark, name, spec)
        else:
            raise TopologyError(f"{name}: unknown source kind {kind!r}")

    def inp(spec) -> DataFrame:
        refs = spec.get("inputs", [])
        dfs = [out[r] for r in refs]
        if not dfs:
            raise TopologyError("component requires inputs")
        merged = dfs[0]
        for d in dfs[1:]:
            merged = merged.unionByName(d, allowMissingColumns=True)
        return merged

    for name in order:
        spec = config["transforms"][name]
        kind = spec["kind"]
        df = inp(spec)
        if kind == "filter":
            out[name] = filter_events(df, _expr(spec["condition"]))
        elif kind == "route":
            # the reference's TOML spells the table [transforms.X.route]
            # (singular); repo-authored configs use "routes" — accept both
            routes_spec = spec.get("routes") or spec["route"]
            r = route(df, {k: _expr(v) for k, v in routes_spec.items()})
            for rname, rdf in r.routes.items():
                out[f"{name}.{rname}"] = rdf
            out[name] = r.labeled  # bare name = labeled union (for metrics)
        elif kind == "sample":
            out[name] = sample(df, rate=spec["rate"], key_field=spec.get("key_field"))
        elif kind == "dedupe":
            out[name] = dedupe(
                df, match_fields=spec.get("fields"), ignore_fields=spec.get("ignore"),
                order_by=spec.get("order_by"),
            )
        elif kind == "throttle":
            out[name] = throttle(
                df, threshold=spec["threshold"], window_secs=spec["window_secs"],
                ts_col=spec.get("ts_col", "ts"), key_field=spec.get("key_field"),
            )
        elif kind == "reduce":
            out[name] = reduce_events(
                df, group_by=spec["group_by"],
                merge_strategies=spec.get("merge_strategies"),
                order_col=spec.get("order_col", "ts"),
                ends_when=_expr(spec["ends_when"]) if "ends_when" in spec else None,
            )
        elif kind == "remap_grok":
            pattern = spec["pattern"]
            if pattern.startswith("canned:"):
                from vector_spark.functions.grok import CANNED

                pattern = CANNED[pattern.removeprefix("canned:")]
                spec = {**spec, "pattern": pattern}
            cols = grok_columns(spec.get("field", "message"), spec["pattern"])
            parsed = df.select("*", *cols)
            if spec.get("drop_on_error"):
                parsed = parsed.filter(grok_matched(spec.get("field", "message"), spec["pattern"]))
                dropped = df.filter(~grok_matched(spec.get("field", "message"), spec["pattern"]))
                out[f"{name}.dropped"] = dropped.select(
                    "*",
                    F.lit("grok parse failed").alias("dropped_reason"),
                    F.lit(name).alias("dropped_component_id"),
                )
            out[name] = parsed
        elif kind == "remap":
            out[name] = _remap_parse_regex(name, df, spec, out)
        elif kind == "remap_select":
            out[name] = df.selectExpr(*spec["exprs"])
        elif kind == "enrich":
            table = spec["table"]
            if isinstance(table, str):
                # config front door: enrichment table as a CSV file path
                # (reference src/enrichment_tables/file.rs reads CSV with a
                # declared schema); spec["types"] casts columns, e.g.
                # {"from_date": "date"} — everything else stays string.
                table = spark.read.csv(table, header=True)
                for col, typ in (spec.get("types") or {}).items():
                    table = table.withColumn(col, F.col(col).cast(typ))
            dr = spec.get("date_range")
            out[name] = enrich_find(
                df, table, on=spec["on"],
                case_sensitive=spec.get("case_sensitive", True),
                date_range=tuple(dr) if dr else None, select=spec.get("select"),
            )
        elif kind == "aggregate":
            # generic hash aggregate (≅ the reference's aggregate +
            # log_to_metric counter flush, expressed declaratively):
            # group_by columns + {alias: SQL aggregate expr}.  Map-side
            # partial aggregation keeps the exchange at |groups| rows.
            aggs = [
                F.expr(e).alias(a) for a, e in spec["aggs"].items()
            ]
            agged = df.groupBy(*spec.get("group_by", [])).agg(*aggs)
            if spec.get("order_by"):
                agged = agged.orderBy(*spec["order_by"])
            out[name] = agged
        elif kind == "lua":
            from vector_spark.operators.lua import LuaTransformConfig, lua_transform

            hooks = spec.get("hooks", {}) or {}
            # unversioned configs are v1, like the reference's deprecated
            # default (src/transforms/lua/mod.rs version enum)
            version = str(spec.get("version") or ("2" if (hooks.get("process") or spec.get("process")) else "1"))
            cfg = LuaTransformConfig(
                version=version,
                source=spec.get("source"),
                process=hooks.get("process") or spec.get("process"),
                init=hooks.get("init") or spec.get("init"),
                shutdown=hooks.get("shutdown") or spec.get("shutdown"),
                search_dirs=tuple(spec.get("search_dirs", ())),
                timers=tuple(
                    (t["interval_seconds"], t["handler"])
                    for t in spec.get("timers", ())
                ),
            )
            if spec.get("error_channel"):
                full = lua_transform(
                    df, cfg, schema=spec.get("schema"), error_channel=True)
                out[f"{name}.dropped"] = full.filter(
                    F.col("_lua_error").isNotNull())
                out[name] = full.filter(
                    F.col("_lua_error").isNull()).drop("_lua_error")
            else:
                out[name] = lua_transform(df, cfg, schema=spec.get("schema"))
        elif kind == "log_to_metric":
            from vector_spark.operators.metrics import log_to_metric

            if "metrics" in spec:
                # reference config shape (src/transforms/log_to_metric.rs
                # MetricConfig): a [[transforms.X.metrics]] LIST, each with
                # type/field/optional name (defaults to the field) and
                # {{ field }} tag templates; one event fans out to one
                # metric row per list entry (union)
                from vector_spark.template import render_template

                ts_col = spec.get("ts_col", "ts")
                parts = []
                for mc in spec["metrics"]:
                    parts.append(log_to_metric(
                        df,
                        name=mc.get("name", mc.get("field", "count")),
                        metric_type=mc.get("type", mc.get("metric_type", "counter")),
                        field=mc.get("field"),
                        namespace=mc.get("namespace", ""),
                        tags={k: render_template(v, ts_col=ts_col)
                              for k, v in (mc.get("tags") or {}).items()},
                        ts_col=ts_col,
                        increment_by_value=mc.get("increment_by_value", False),
                    ))
                merged = parts[0]
                for p in parts[1:]:
                    merged = merged.unionByName(p)
                out[name] = merged
            else:
                out[name] = log_to_metric(
                    df, name=spec["name"], metric_type=spec.get("metric_type", "counter"),
                    field=spec.get("field"),
                    tags={k: _expr(v) for k, v in spec.get("tags", {}).items()},
                    ts_col=spec.get("ts_col", "ts"),
                    increment_by_value=spec.get("increment_by_value", False),
                )
        else:
            raise TopologyError(f"{name}: unknown transform kind {kind!r}")

    return topo


def run_topology(
    spark: SparkSession, config: dict, verify_counts: bool = False
) -> dict[str, object]:
    """Build then execute every sink; returns {sink: rows_written | DataFrame}.

    ``verify_counts=True`` re-reads each parquet sink and returns its row
    count — a parity check for tests, OFF by default because it doubles
    sink I/O (the production runner's lineage comes from the pipeline
    manifest instead)."""
    topo = build_topology(spark, config)
    results: dict[str, object] = {}
    # topo.config carries the glob-expanded input refs
    for name, spec in topo.config.get("sinks", {}).items():
        refs = spec.get("inputs", [])
        df = topo.outputs[refs[0]]
        for r in refs[1:]:
            df = df.unionByName(topo.outputs[r], allowMissingColumns=True)
        kind = spec["kind"]
        if kind == "parquet":
            writer = df.write.mode(spec.get("mode", "overwrite"))
            if spec.get("partition_by"):
                writer = writer.partitionBy(*spec["partition_by"])
            writer.parquet(spec["path"])
            results[name] = (
                spark.read.parquet(spec["path"]).count() if verify_counts else None
            )
        elif kind == "aws_s3":
            # src/sinks/aws_s3: batch twin = the templated file sink over a
            # local/DFS ``path`` (the cluster's object store mount) — the
            # reference's key_prefix template ({{ field }} + strftime)
            # becomes the partition directory, newline_delimited framing is
            # the line writer, encoding.codec/except_fields apply before
            # encode; bucket/region/endpoint/auth load unchanged and are
            # inert (no S3 endpoint in batch scope).
            from vector_spark.sinks import write_file_sink
            from vector_spark.template import render_template

            enc = spec.get("encoding", {})
            if isinstance(enc, str):
                enc = {"codec": enc}
            # render the key template BEFORE except_fields: the prefix's
            # strftime specifiers read the timestamp the encoder drops
            keyed = df.withColumn("_path", render_template(
                spec.get("key_prefix", ""),
                ts_col=spec.get("ts_col", "timestamp")))
            keyed = keyed.drop(*enc.get("except_fields", []))
            write_file_sink(
                keyed, spec["path"], encoding=enc.get("codec", "json"),
                partition_by=["_path"], mode=spec.get("mode", "overwrite"))
            results[name] = None
        elif kind == "file":
            # src/sinks/file/mod.rs: encoded lines; a {{ field }}/strftime
            # path template becomes partitioned output directories
            from vector_spark.sinks import write_file_sink, write_templated_file_sink

            if spec.get("template"):
                write_templated_file_sink(
                    df, spec["path"], spec["template"],
                    ts_col=spec.get("ts_col"),
                    encoding=spec.get("encoding", "json"),
                    mode=spec.get("mode", "overwrite"))
            else:
                write_file_sink(
                    df, spec["path"], encoding=spec.get("encoding", "json"),
                    partition_by=spec.get("partition_by"),
                    mode=spec.get("mode", "overwrite"),
                    target_file_rows=spec.get("target_file_rows"))
            results[name] = None
        elif kind == "blackhole":
            results[name] = df.count()
        elif kind == "console":
            df.show(spec.get("n", 20), truncate=False)
            results[name] = None
        elif kind == "memory":
            results[name] = df
        else:
            raise TopologyError(f"{name}: unknown sink kind {kind!r}")
    return results


def topology_dot(config: dict) -> str:
    """DOT rendering of the topology (≅ `vector graph`, src/graph.rs):
    sources as boxes, transforms as ellipses, sinks as doubleoctagons;
    route ports become labeled edges."""
    lines = ["digraph topology {", "  rankdir=LR;"]
    for name in config.get("sources", {}):
        lines.append(f'  "{name}" [shape=box];')
    for name in config.get("transforms", {}):
        lines.append(f'  "{name}" [shape=ellipse];')
    for name in config.get("sinks", {}):
        lines.append(f'  "{name}" [shape=doubleoctagon];')
    for name, spec in {**config.get("transforms", {}), **config.get("sinks", {})}.items():
        for ref in spec.get("inputs", []):
            base, _, port = ref.partition(".")
            label = f' [label="{port}"]' if port else ""
            lines.append(f'  "{base}" -> "{name}"{label};')
    lines.append("}")
    return "\n".join(lines)


def tap_topology(
    spark: SparkSession,
    config: dict,
    patterns: list[str] | None = None,
    limit: int = 5,
) -> dict[str, list[str]]:
    """``vector tap`` analogue (src/tap/cmd.rs, src/api/schema/events):
    sample up to ``limit`` events from each component OUTPUT matched by
    the glob ``patterns`` (tap's component-pattern syntax; None = every
    output, route ports address as ``transform.port``), rendered as JSON
    strings — the same notification shape tap streams to the console.

    Batch semantics: the reference taps a RUNNING topology's fanouts;
    here each tap is a bounded ``take`` on the lazily-built DataFrame for
    that output, so Catalyst prunes the plan to the sampled component
    (no sink is executed).  Spark UI remains the live-metrics surface."""
    import fnmatch

    topo = build_topology(spark, config)
    names = [
        n for n in topo.outputs
        if patterns is None or any(fnmatch.fnmatch(n, p) for p in patterns)
    ]
    return {n: list(topo.outputs[n].toJSON().take(limit)) for n in names}


def top_topology(
    spark: SparkSession, config: dict, one_pass: bool = True
) -> dict[str, int]:
    """``vector top`` analogue (src/top/): per-component output row
    counts for a batch run of the topology.

    ``one_pass=True`` (default) attaches a row-count Observation to
    every component inside the built plans and drives each TERMINAL
    output once — every component on an executed path reports from the
    single real execution (the Spark rendering of top's live metrics:
    counters on the running dataflow, not extra jobs).  Components on no
    executed path fall back to an individual count.  ``one_pass=False``
    is the old diagnostic (one count job per component)."""
    if not one_pass:
        topo = build_topology(spark, config)
        return {n: topo.outputs[n].count() for n in topo.outputs}

    observations: dict = {}
    topo = build_topology(spark, config, observe=observations)
    cfg = topo.config

    # terminals: union of every sink's inputs; with no sinks, every
    # output no component consumes (ports of a consumed transform count
    # as consumed only if referenced)
    consumed: set[str] = set()
    for spec in {**cfg.get("transforms", {}), **cfg.get("sinks", {})}.values():
        consumed.update(spec.get("inputs", []))
    sink_inputs = [
        r for spec in cfg.get("sinks", {}).values() for r in spec.get("inputs", [])
    ]
    terminals = sink_inputs or [n for n in topo.outputs if n not in consumed]

    # upstream closure over exact output refs = outputs whose observed
    # node sits on an executed path.  NOTE: a route PORT's plan contains
    # the port's own observation plus its component's INPUT observations
    # — not the bare route output's, nor sibling ports' — so the closure
    # walks refs exactly as written, never adding a bare component name
    # that wasn't itself referenced.
    transforms = cfg.get("transforms", {})
    reached: set[str] = set()
    frontier = list(terminals)
    while frontier:
        ref = frontier.pop()
        if ref in reached:
            continue
        reached.add(ref)
        frontier += transforms.get(ref.split(".", 1)[0], {}).get("inputs", [])

    for t in dict.fromkeys(terminals):  # drive each terminal once
        topo.outputs[t].count()

    counts: dict[str, int] = {}
    for name in topo.outputs:
        if name in reached:
            row = _observation_get(observations[name], timeout=30.0)
            if row is not None:
                counts[name] = int(row["rows"])
                continue
        counts[name] = topo.outputs[name].count()
    return counts


def _observation_get(ob, timeout: float):
    """Observation.get with a timeout guard: blocks only until the
    metric arrives or ``timeout`` elapses (None on timeout — callers
    fall back to a direct count rather than hanging on an observation
    whose node turned out not to be on any executed path)."""
    import threading

    result: list = []

    def _wait():
        try:
            result.append(ob.get)
        except Exception:
            pass

    t = threading.Thread(target=_wait, daemon=True)
    t.start()
    t.join(timeout)
    return result[0] if result else None
