"""The vector CLI surface, rebuilt over the TOML front door
(reference src/cli.rs SubCommand enum: Validate, Graph, List, Top, Tap,
Test).

    python jobs/vector_cli.py validate [--no-environment] config.toml
    python jobs/vector_cli.py graph config.toml
    python jobs/vector_cli.py list [--format json]
    python jobs/vector_cli.py top config.toml
    python jobs/vector_cli.py tap [--limit N] [pattern ...] config.toml
    python jobs/vector_cli.py test config.toml

Exit codes follow the reference: 0 success, 78 (EX_CONFIG) for invalid
configs from `validate`, 1 for failed tests.  Batch semantics for
`top`/`tap` are documented on vector_spark.topology.top_topology /
tap_topology (a bounded run of the topology, not a live attach — the
Spark UI is the live surface).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EX_CONFIG = 78


def _spark():
    from vector_spark.session import get_spark

    spark = get_spark("vector_cli", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def cmd_validate(args) -> int:
    """≅ `vector validate` (src/validate.rs): load + compile the config;
    without --no-environment also build every component against Spark
    (the reference's environment checks build sources/sinks for real)."""
    from vector_spark.config import load_config
    from vector_spark.topology import TopologyError, build_topology, compile_topology

    try:
        cfg = load_config(args.config)
    except Exception as e:  # parse/interpolation errors
        print(f"x Failed to load {args.config!r}: {e}")
        return EX_CONFIG
    print(f"√ Loaded {args.config!r}")
    try:
        order = compile_topology(cfg)
    except TopologyError as e:
        print(f"x Component errors: {e}")
        return EX_CONFIG
    print(f"√ Component configuration ({len(order)} transforms)")
    if not args.no_environment:
        try:
            build_topology(_spark(), cfg)
        except Exception as e:
            print(f"x Health check failed: {e}")
            return EX_CONFIG
        print("√ Health checks (every component built)")
    print("Validated")
    return 0


def _load_or_exit(path: str):
    from vector_spark.config import load_config

    try:
        return load_config(path)
    except Exception as e:
        print(f"x Failed to load {path!r}: {e}", file=sys.stderr)
        raise SystemExit(EX_CONFIG) from None


def cmd_graph(args) -> int:
    """≅ `vector graph` (src/graph.rs): DOT on stdout."""
    from vector_spark.topology import topology_dot

    print(topology_dot(_load_or_exit(args.config)))
    return 0


def cmd_list(args) -> int:
    """≅ `vector list` (src/list.rs): available component kinds."""
    from vector_spark.topology import KNOWN_SINKS, KNOWN_SOURCES, KNOWN_TRANSFORMS

    if args.format == "json":
        print(json.dumps({
            "sources": sorted(KNOWN_SOURCES),
            "transforms": sorted(KNOWN_TRANSFORMS),
            "sinks": sorted(KNOWN_SINKS),
        }))
        return 0
    print("Sources:")
    for s in sorted(KNOWN_SOURCES):
        print(f"- {s}")
    print("\nTransforms:")
    for t in sorted(KNOWN_TRANSFORMS):
        print(f"- {t}")
    print("\nSinks:")
    for s in sorted(KNOWN_SINKS):
        print(f"- {s}")
    return 0


def cmd_top(args) -> int:
    """≅ `vector top` (src/top/): per-component row counts for one batch
    run of the topology."""
    from vector_spark.topology import top_topology

    counts = top_topology(_spark(), _load_or_exit(args.config))
    width = max(len(n) for n in counts)
    print(f"{'COMPONENT':<{width}}  ROWS")
    for name, n in counts.items():
        print(f"{name:<{width}}  {n}")
    return 0


def cmd_tap(args) -> int:
    """≅ `vector tap` (src/tap/cmd.rs): sample events from component
    outputs matching the glob patterns, as JSON lines."""
    from vector_spark.topology import tap_topology

    samples = tap_topology(
        _spark(), _load_or_exit(args.config),
        patterns=args.patterns or None, limit=args.limit)
    for name, events in samples.items():
        for e in events:
            print(json.dumps({"component": name, "event": json.loads(e)}))
    return 0


def cmd_test(args) -> int:
    """≅ `vector test`: delegates to the unit-test harness."""
    sys.argv = ["vector_test", args.config]
    from vector_test import main  # jobs/vector_test.py

    return main()


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="vector_cli")
    sub = p.add_subparsers(dest="cmd", required=True)

    v = sub.add_parser("validate")
    v.add_argument("--no-environment", action="store_true")
    v.add_argument("config")
    v.set_defaults(fn=cmd_validate)

    g = sub.add_parser("graph")
    g.add_argument("config")
    g.set_defaults(fn=cmd_graph)

    ls = sub.add_parser("list")
    ls.add_argument("--format", choices=("text", "json"), default="text")
    ls.set_defaults(fn=cmd_list)

    t = sub.add_parser("top")
    t.add_argument("config")
    t.set_defaults(fn=cmd_top)

    ta = sub.add_parser("tap")
    ta.add_argument("--limit", type=int, default=5)
    ta.add_argument("patterns", nargs="*")
    ta.add_argument("config")
    ta.set_defaults(fn=cmd_tap)

    te = sub.add_parser("test")
    te.add_argument("config")
    te.set_defaults(fn=cmd_test)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
