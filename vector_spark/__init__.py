"""vector_spark — a PySpark-native rebuild of the Vector observability
pipeline (reference: zvlb/vector 0.30.0 at /root/reference, read-only).

Vector is a dataflow engine: sources -> transforms -> sinks, with the VRL
expression language for per-event computation (reference
docs/ARCHITECTURE.md:11-14).  This package re-expresses the same
capabilities Spark-first:

- events are DataFrame rows (reference lib/vector-core/src/event/log_event.rs),
- transforms are declarative DataFrame stages (reference src/transforms/),
- VRL scalar functions are pyspark.sql.functions compositions
  (reference website/cue/reference/remap/functions/*.cue),
- enrichment tables are broadcast hash joins
  (reference src/enrichment_tables/file.rs),
- the topology runner is a config -> DAG -> fan-out-writes orchestrator
  (reference src/config/compiler.rs:8-80, src/topology/builder.rs:75-131).

Nothing in here is a translation of the reference's Rust: the physical
execution strategy is Catalyst/Tungsten's, declared via the DataFrame API.
"""

__version__ = "0.1.0"

import os as _os

# glibc malloc tuning for the numpy kernels (decontam/repetition/dupspans):
# by default every >32MB numpy temporary is a fresh mmap whose pages fault
# on first touch — on this host that dominates kernel wall time (measured
# 145s -> 7s steady-state per 4.8M-token batch once large allocations stay
# in a reused brk arena).  Set BEFORE the PySpark worker daemon forks so
# workers inherit it; setdefault so a deployment can override.
_os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "1073741824")
_os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "-1")

from vector_spark.session import get_spark  # noqa: F401
