"""Arbitrary-UDF operators — the `lua` transform / full-VRL escape hatch.

Reference: the `lua` transform (src/transforms/lua/v2/mod.rs:28-74) gives
users hooks (init/process/shutdown) that may emit 0..N events and keep
state; `remap` compiles arbitrary VRL.  99% of that surface maps to Column
expressions (functions/vrl.py); what remains is "run my code over events",
which in Spark is the Arrow-vectorized pandas path — NEVER row-at-a-time
Python:

- map_events_pandas   : stateless 1->N over Arrow batches (``mapInPandas``)
  — the `lua` process-hook / multi-event remap analogue
- apply_grouped_pandas: per-key grouped processing (``applyInPandas``) —
  the stateful-per-key analogue (lua state keyed by group; batch flush)

Scale notes: batch size is bounded by
spark.sql.execution.arrow.maxRecordsPerBatch (the EventArray
CHUNK_SIZE=1000 analogue, src/source_sender/mod.rs:25); grouped apply
shuffles on the key — pre-aggregate or salt hot keys first (skew.py).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame


def map_events_pandas(
    df: DataFrame,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema,
) -> DataFrame:
    """Run ``fn`` over Arrow batches; ``fn`` may return more or fewer rows
    than it receives (0..N emission, lua/v2/mod.rs hook contract)."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = fn(pdf)
            if out is not None and len(out):
                yield out

    return df.mapInPandas(_run, schema=schema)


def apply_grouped_pandas(
    df: DataFrame,
    group_by: list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema,
) -> DataFrame:
    """Run ``fn`` once per key group (whole group as one pandas frame) —
    arbitrary stateful per-key logic with batch-final flush semantics
    (what lua timer_handlers + state amount to in a batch world)."""
    return df.groupBy(*group_by).applyInPandas(lambda pdf: fn(pdf), schema=schema)
