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


# "SECRET[backend.secret_name]" (dots allowed inside the key) — the same
# collector regex as src/config/loading/secret.rs:29-30
_SECRET_RE = re.compile(r"SECRET\[(\w+)\.([\w.]+)\]")


def _retrieve_secrets(backend_name: str, spec: dict, keys: set[str]) -> dict[str, str]:
    """One backend's retrieve() (reference src/secrets/):

    - ``type = "test"``: every key resolves to ``replacement``
      (src/secrets/test.rs)
    - ``type = "exec"``: run ``command``, write the v1.0 JSON query on
      stdin, read a ``{key: {value, error}}`` JSON response on stdout
      (src/secrets/exec.rs protocol)
    """
    typ = spec.get("type")
    if typ == "test":
        return {k: spec.get("replacement", "") for k in keys}
    if typ == "exec":
        import json
        import subprocess

        query = json.dumps({"version": "1.0", "secrets": sorted(keys)})
        try:
            proc = subprocess.run(
                spec["command"], input=query.encode(), capture_output=True,
                timeout=float(spec.get("timeout", 5)), check=True)
        except Exception as e:
            raise TopologyError(
                f"Error while retrieving secret from backend "
                f"\"{backend_name}\": {e}.") from None
        resp = json.loads(proc.stdout.decode())
        out: dict[str, str] = {}
        for k in keys:
            entry = resp.get(k)
            if entry is None:
                raise TopologyError(
                    f"secret for key '{k}' was not retrieved")
            if entry.get("error"):
                raise TopologyError(
                    f"secret for key '{k}' was not retrieved: {entry['error']}")
            if not entry.get("value"):
                raise TopologyError(f"secret for key '{k}' was empty")
            out[k] = entry["value"]
        return out
    raise TopologyError(
        f"unknown secret backend type {typ!r} for \"{backend_name}\"")


def interpolate_secrets(text: str) -> str:
    """Replace ``SECRET[backend.key]`` placeholders using the config's
    own ``[secret.<backend>]`` tables (reference src/config/secret.rs +
    loading/secret.rs: placeholders are collected AFTER env-var
    interpolation, resolved per backend, then substituted into the raw
    text).  No placeholders → the text passes through untouched."""
    if "SECRET[" not in text:
        return text
    wanted: dict[str, set[str]] = {}
    for backend, key in _SECRET_RE.findall(text):
        wanted.setdefault(backend, set()).add(key)
    if not wanted:
        return text
    backends = tomllib.loads(text).get("secret", {})
    resolved: dict[tuple[str, str], str] = {}
    for backend, keys in wanted.items():
        if backend not in backends:
            raise TopologyError(
                f"Backend \"{backend}\" is required for secret retrieval "
                f"but was not found in config.")
        for k, v in _retrieve_secrets(backend, backends[backend], keys).items():
            resolved[(backend, k)] = v
    return _SECRET_RE.sub(lambda m: resolved[(m.group(1), m.group(2))], text)


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
    """Raw TOML text → topology dict (interpolate env vars, resolve
    secrets, parse, map kinds)."""
    interpolated, _warnings = interpolate_env(text, env)
    interpolated = interpolate_secrets(interpolated)
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
