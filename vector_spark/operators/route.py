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
    labeled: DataFrame | None = None  # one-pass explode plan, set by route()

    def __getitem__(self, name: str) -> DataFrame:
        return self.routes[name]

    def names(self) -> list[str]:
        return list(self.routes)

    def union_labeled(self, label_col: str = "route_key") -> DataFrame:
        """All routed copies in one DataFrame with a route label — handy for
        per-sink aggregate parity checks (a row matching k routes appears k
        times, exactly Vector's copy semantics).

        Scale note: when the result was built by :func:`route` this is the
        ONE-PASS explode plan (see :func:`route_labeled`) — upstream parse/
        join work is computed once, not once per route.
        """
        if self.labeled is not None:
            if label_col != "route_key":
                return self.labeled.withColumnRenamed("route_key", label_col)
            return self.labeled
        out = None
        for name, df in self.routes.items():
            l = df.withColumn(label_col, F.lit(name))
            out = l if out is None else out.unionByName(l)
        return out


def route_labeled(
    df: DataFrame,
    conditions: dict[str, Column],
    with_unmatched: bool = True,
    label_col: str = "route_key",
) -> DataFrame:
    """ONE-PASS route fan-out: each row is scanned once, the array of
    matching route names is built inline, and ``explode`` emits one copy per
    match (route.rs:42-49 copy semantics).  A row matching nothing becomes a
    single ``_unmatched`` copy (route.rs:17).

    This is the plan that survives 100x scale-up: N filter branches each
    rescan (or re-read the persisted cache of) the upstream, while this is
    one narrow-dependency pass — no shuffle, no cache, output is
    ``sum(matches per row)`` rows.
    """
    entries = [
        F.when(cond.isNotNull() & cond, F.lit(name)) for name, cond in conditions.items()
    ]
    arr = F.array_compact(F.array(*entries))
    if with_unmatched:
        arr = F.when(F.size(arr) > 0, arr).otherwise(F.array(F.lit(UNMATCHED)))
    return df.withColumn(label_col, F.explode(arr))


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
    res.labeled = route_labeled(df, conditions, with_unmatched)
    return res
