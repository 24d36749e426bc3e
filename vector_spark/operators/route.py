"""``route`` — conditional fan-out with copy-to-every-match semantics.

Reference: src/transforms/route.rs:35-53 — each event is checked against ALL
named conditions and a COPY goes to every matching output (not first-match);
events matching nothing go to the reserved ``_unmatched`` output
(route.rs:17).  This is the easiest semantics to get wrong in SQL (a
``when/otherwise`` chain is first-match) — see SURVEY.md §7.

Spark-first design: ONE shared upstream DataFrame; each route is an
independent ``filter`` over it.  At scale the upstream should be persisted
(or, when written straight to sinks, read once per route with scan reuse /
cached) — the topology runner handles persistence; this operator just
declares the branch plans so Catalyst can push each route's predicate into
the shared scan.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

UNMATCHED = "_unmatched"


@dataclass
class RouteResult:
    routes: dict[str, DataFrame] = field(default_factory=dict)

    def __getitem__(self, name: str) -> DataFrame:
        return self.routes[name]

    def names(self) -> list[str]:
        return list(self.routes)

    def union_labeled(self, label_col: str = "route_key") -> DataFrame:
        """All routed copies in one DataFrame with a route label — handy for
        per-sink aggregate parity checks (a row matching k routes appears k
        times, exactly Vector's copy semantics)."""
        out = None
        for name, df in self.routes.items():
            l = df.withColumn(label_col, F.lit(name))
            out = l if out is None else out.unionByName(l)
        return out


def route(df: DataFrame, conditions: dict[str, Column], with_unmatched: bool = True) -> RouteResult:
    """Evaluate every condition; copy rows to each matching branch.

    ``_unmatched`` = NOT(any condition) — including rows where every
    condition is NULL (null-safe, a NULL predicate does not match).
    """
    res = RouteResult()
    any_cond = None
    for name, cond in conditions.items():
        if name == UNMATCHED:
            raise ValueError(f"route name {UNMATCHED!r} is reserved (route.rs:17)")
        safe = cond.isNotNull() & cond
        res.routes[name] = df.filter(safe)
        any_cond = safe if any_cond is None else (any_cond | safe)
    if with_unmatched:
        res.routes[UNMATCHED] = df.filter(~F.coalesce(any_cond, F.lit(False)))
    return res
