"""TOML config front door — the rebuild of Vector's file-based config
lifecycle (reference src/config/builder.rs, src/config/loading/mod.rs):
a user's first touch is a ``vector.toml`` with ``[sources.*]`` /
``[transforms.*]`` / ``[sinks.*]`` tables, env-var interpolation, and
component ``type`` keys.  This module parses that shape (stdlib
``tomllib``) into the plain topology dict that
:func:`vector_spark.topology.build_topology` consumes.

Interpolation replays src/config/vars.rs:19-71 semantics (shell-style):

- ``$VAR`` / ``${VAR}``          — value, or "" + warning when unset
- ``${VAR-default}``             — default when UNSET
- ``${VAR:-default}``            — default when unset OR EMPTY
- ``${VAR?err}`` / ``${VAR:?err}`` — raise when unset (resp. unset/empty)
- ``$$``                         — literal ``$``

Names are ``[A-Za-z0-9_.]+`` (the reference allows ``.`` for
Java-properties-style vars).  Interpolation runs over the RAW text before
TOML parsing, exactly like the reference (vars can appear anywhere,
including inside keys).

Key mapping: the reference spells the component kind ``type``; the
topology dict spells it ``kind``.  ``type`` is renamed on load (``kind``
also accepted).  Everything else passes through untouched — the
topology builder owns per-kind validation.
"""

from __future__ import annotations

import os
import re
import tomllib

from pyspark.sql import SparkSession

from vector_spark.topology import Topology, TopologyError, build_topology

_VAR_RE = re.compile(
    r"""
    \$\$|
    \$([A-Za-z0-9_.]+)|
    \$\{([A-Za-z0-9_.]+)(?:(:?-|:?\?)([^}]*))?\}
    """,
    re.VERBOSE,
)


def interpolate_env(
    text: str, env: dict[str, str] | None = None
) -> tuple[str, list[str]]:
    """Interpolate env vars into raw config text; returns (text, warnings).
    Raises :class:`TopologyError` on a failed ``?``/``:?`` requirement."""
    vars_ = os.environ if env is None else env
    warnings: list[str] = []
    errors: list[str] = []

    def repl(m: re.Match) -> str:
        if m.group(0) == "$$":
            return "$"
        name = m.group(1) or m.group(2)
        flags = m.group(3) or ""
        arg = m.group(4) or ""
        val = vars_.get(name)
        if flags == ":-":
            return val if val else arg
        if flags == "-":
            return val if val is not None else arg
        if flags == ":?":
            if val:
                return val
            errors.append(f"non-empty env var required in config: {name} ({arg})")
            return ""
        if flags == "?":
            if val is not None:
                return val
            errors.append(f"env var required in config: {name} ({arg})")
            return ""
        if val is None:
            warnings.append(f"unknown env var in config: {name}")
            return ""
        return val

    out = _VAR_RE.sub(repl, text)
    if errors:
        raise TopologyError("; ".join(errors))
    return out, warnings


def _map_kinds(section: dict) -> dict:
    out = {}
    for name, spec in section.items():
        spec = dict(spec)
        if "type" in spec and "kind" not in spec:
            spec["kind"] = spec.pop("type")
        out[name] = spec
    return out


def load_config_text(
    text: str, env: dict[str, str] | None = None
) -> dict:
    """Raw TOML text → topology dict (interpolate, parse, map kinds)."""
    interpolated, _warnings = interpolate_env(text, env)
    raw = tomllib.loads(interpolated)
    cfg: dict = {}
    for section in ("sources", "transforms", "sinks"):
        if section in raw:
            cfg[section] = _map_kinds(raw[section])
    # pass through any non-component top-level tables (e.g. [api])
    for k, v in raw.items():
        if k not in ("sources", "transforms", "sinks"):
            cfg[k] = v
    return cfg


def load_config(path: str, env: dict[str, str] | None = None) -> dict:
    with open(path, "rb") as f:
        text = f.read().decode("utf-8")
    return load_config_text(text, env)


def build_topology_from_toml(
    spark: SparkSession, path: str, env: dict[str, str] | None = None
) -> Topology:
    """Vector-style front door: TOML file → compiled, built topology."""
    return build_topology(spark, load_config(path, env))
