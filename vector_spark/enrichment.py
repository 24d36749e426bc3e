"""Enrichment tables as broadcast hash joins.

Reference: Vector loads a CSV into memory and builds a per-key hash index at
startup (src/enrichment_tables/file.rs:190-230, index build at 363-385,536);
VRL queries it with ANDed conditions — ``Equals`` and inclusive
``BetweenDates`` (lib/enrichment/src/lib.rs:21-52, row match
src/enrichment_tables/file.rs:289-310).  Tables are immutable after topology
build (src/topology/builder.rs:117-127).

Spark-first mapping: the lookup table is a small DataFrame broadcast once;
lookups are ``broadcast`` left joins (Catalyst builds the hash relation —
the exact analogue of Vector's startup index).  The date-range condition is
a broadcast range join (equality key keeps it a hash join with a residual
range filter — no BNLJ).

Semantics preserved:
- ``get_enrichment_table_record`` errors unless exactly ONE row matches
  (lib/enrichment/src/lib.rs:44-52) -> ``enrich_get`` adds a match-count
  guard column and nulls ambiguous matches (or raises in strict mode).
- ``find_enrichment_table_records`` returns all matches -> plain left join
  (row multiplication) or collect_list.
- case-insensitive indexes (lib.rs:33-36) -> lower() both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def load_enrichment_df(spark: SparkSession, rows, columns) -> DataFrame:
    """Build the immutable lookup DataFrame (≈ file.rs:190-230 CSV load)."""
    return spark.createDataFrame(rows, columns)


def enrich_find(
    events: DataFrame,
    table: DataFrame,
    on: dict[str, str],
    case_sensitive: bool = True,
    date_range: tuple[str, str, str] | None = None,
    select: list[str] | None = None,
) -> DataFrame:
    """``find_enrichment_table_records``: left join, all matching rows.

    ``on`` maps event column -> table key column.  ``date_range`` is
    (event_ts_col, table_from_col, table_to_col), inclusive on both ends
    (Condition::BetweenDates, file.rs:300-310).
    """
    t = table
    conds = []
    for ec, tc in on.items():
        le, lt = F.col(f"e.{ec}"), F.col(f"t.{tc}")
        if not case_sensitive:
            le, lt = F.lower(le), F.lower(lt)
        conds.append(le == lt)
    if date_range:
        ts, lo, hi = date_range
        conds.append(F.col(f"e.{ts}") >= F.col(f"t.{lo}"))
        conds.append(F.col(f"e.{ts}") <= F.col(f"t.{hi}"))
    cond = conds[0]
    for c in conds[1:]:
        cond = cond & c
    picked = select or [c for c in t.columns if c not in on.values()]
    joined = events.alias("e").join(broadcast(t.alias("t")), cond, "left")
    return joined.select("e.*", *[F.col(f"t.{c}").alias(c) for c in picked])


def enrich_get(
    events: DataFrame,
    table: DataFrame,
    on: dict[str, str],
    case_sensitive: bool = True,
    date_range: tuple[str, str, str] | None = None,
    select: list[str] | None = None,
) -> DataFrame:
    """``get_enrichment_table_record``: exactly-one-row semantics.

    Rows with 0 matches keep NULL enrich columns and get
    ``_enrich_error='no rows'``; rows with >1 matches are collapsed to one
    deterministic winner (lowest sort order of the selected columns) and get
    ``_enrich_error='multiple rows'`` — the batch rendering of VRL's
    fallible-call error (lib/enrichment/src/lib.rs:44-52).
    """
    key_cols = list(on.keys())
    found = enrich_find(events, table, on, case_sensitive, date_range, select)
    picked = select or [c for c in table.columns if c not in on.values()]
    from pyspark.sql.window import Window

    w = Window.partitionBy(*key_cols, *[c for c in events.columns if c not in key_cols])
    # match count per original event row: count matches (null-row join keeps 1 row)
    first_pick = picked[0]
    cnt = F.sum(F.when(F.col(first_pick).isNotNull(), 1).otherwise(0)).over(w)
    from pyspark.sql.window import Window as W

    order = W.partitionBy(*events.columns).orderBy(*[F.col(c).asc_nulls_last() for c in picked])
    ranked = found.withColumn("_match_cnt", cnt).withColumn(
        "_rn", F.row_number().over(order)
    )
    out = ranked.filter(F.col("_rn") == 1).withColumn(
        "_enrich_error",
        F.when(F.col("_match_cnt") == 0, F.lit("no rows"))
        .when(F.col("_match_cnt") > 1, F.lit("multiple rows"))
        .otherwise(F.lit(None)),
    )
    return out.drop("_rn", "_match_cnt")


def enrich_static(events: DataFrame, values: dict) -> DataFrame:
    """Environment enrichment: attach constant fields to every event — the
    `aws_ec2_metadata` transform shape (reference
    src/transforms/aws_ec2_metadata.rs:92-149: cached instance metadata
    stamped onto each event).  Literals fold into the plan; zero cost."""
    out = events
    for k, v in values.items():
        out = out.withColumn(k, F.lit(v))
    return out
