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

    Constraint (documented): when ``date_range`` is used, ranges for the
    same key must not overlap — overlapping ranges would multiply event
    rows instead of erroring (the reference's date-indexed lookup shares
    the practical constraint; checking it is one tiny aggregate over the
    broadcast table, done here eagerly at plan-build time for fail-fast).
    """
    if date_range:
        _ts, lo, hi = date_range
        # symmetric interval-overlap test over DISTINCT (key, lo, hi) rows:
        # x overlaps y iff x.lo <= y.hi AND y.lo <= x.hi; exclude the row
        # identity itself (struct equality) so equal-start ranges — e.g.
        # [1,10] and [1,5] — are caught too.  Duplicate identical ranges
        # collapse in the groupBy below and surface as 'multiple rows'.
        ranges = table.select(*on.values(), lo, hi).distinct()
        ov = (
            ranges.alias("x")
            .join(
                ranges.alias("y"),
                [F.col(f"x.{k}") == F.col(f"y.{k}") for k in on.values()]
                + [
                    F.col(f"x.{lo}") <= F.col(f"y.{hi}"),
                    F.col(f"y.{lo}") <= F.col(f"x.{hi}"),
                    F.struct(F.col(f"x.{lo}"), F.col(f"x.{hi}"))
                    != F.struct(F.col(f"y.{lo}"), F.col(f"y.{hi}")),
                ],
            )
            .count()
        )
        if ov:
            raise ValueError(
                "enrich_get: overlapping date ranges per key in lookup table"
            )
    picked = select or [c for c in table.columns if c not in on.values()]
    # Collapse the (small, broadcast) lookup table to ONE row per key with a
    # deterministic winner + the match count, THEN left-join — the event
    # side is touched by exactly one broadcast hash join, no window over
    # event columns (which at 10^12 rows would be a full shuffle+sort).
    key_cols = list(on.values())
    tkeys = [
        (F.lower(F.col(c)) if not case_sensitive else F.col(c)).alias(c) for c in key_cols
    ]
    range_cols = [date_range[1], date_range[2]] if date_range else []
    collapsed = (
        table.select(*tkeys, *range_cols, F.struct(*[F.col(c) for c in picked]).alias("_p"))
        .groupBy(*key_cols, *range_cols)
        .agg(F.min("_p").alias("_p"), F.count(F.lit(1)).alias("_match_cnt"))
        .select(*key_cols, *range_cols, "_p.*", "_match_cnt")
    )
    found = enrich_find(
        events, collapsed, on, case_sensitive, date_range, picked + ["_match_cnt"]
    )
    out = found.withColumn(
        "_enrich_error",
        F.when(F.col("_match_cnt").isNull(), F.lit("no rows"))
        .when(F.col("_match_cnt") > 1, F.lit("multiple rows"))
        .otherwise(F.lit(None)),
    )
    return out.drop("_match_cnt")


def load_geoip_mmdb(spark: SparkSession, path: str, locale: str = "en") -> DataFrame:
    """MaxMind mmdb -> range DataFrame (reference
    src/enrichment_tables/geoip.rs:10-47: City / ISP / ASN databases).

    The ``maxminddb`` wheel is absent, so the file is read by the
    jar-free spec implementation in :mod:`vector_spark.functions.mmdb`
    (public MaxMind DB format).  Field flattening mirrors
    geoip.rs:156-201: City databases yield country_code / city_name /
    latitude / longitude / timezone; ISP/ASN databases yield isp /
    organization / autonomous_system_number /
    autonomous_system_organization.  Rows are (ip_start, ip_end,
    fields...) with inclusive u32 bounds — the flattened prefix trie
    :func:`geoip_enrich` consumes.  The trie decode happens once on the
    driver (mmdb files are MBs); the table then broadcasts."""
    from vector_spark.functions.mmdb import read_mmdb

    _, nets = read_mmdb(path)

    def g(d: dict, *ks):
        for k in ks:
            d = d.get(k) if isinstance(d, dict) else None
            if d is None:
                return None
        return d

    rows = [
        (
            start,
            end,
            g(d, "country", "iso_code"),
            g(d, "city", "names", locale),
            float(g(d, "location", "latitude")) if g(d, "location", "latitude") is not None else None,
            float(g(d, "location", "longitude")) if g(d, "location", "longitude") is not None else None,
            g(d, "location", "time_zone"),
            g(d, "isp"),
            g(d, "organization"),
            g(d, "autonomous_system_number"),
            g(d, "autonomous_system_organization"),
        )
        for start, end, d in nets
    ]
    return spark.createDataFrame(
        rows,
        "ip_start long, ip_end long, country_code string, city_name string,"
        " latitude double, longitude double, timezone string, isp string,"
        " organization string, autonomous_system_number long,"
        " autonomous_system_organization string",
    )


def geoip_enrich(
    events: DataFrame,
    geo: DataFrame,
    ip_col: str,
    select: list[str] | None = None,
    bucket_bits: int = 16,
) -> DataFrame:
    """geoip enrichment as a BUCKETED broadcast range join.

    A naive ip-BETWEEN-range join has no equi key, so Catalyst plans a
    BroadcastNestedLoopJoin — every row scans every range, O(|events| x
    |ranges|).  Instead each geo range is exploded to the /``bucket_bits``
    prefix buckets it spans and the join becomes EQUI on the bucket with a
    residual BETWEEN — a broadcast HASH join (mmdb tries are prefix-dense,
    so ranges rarely span many /16 buckets; the explode factor stays
    small).  This is the 100 TB plan: one narrow pass, no shuffle.
    """
    from vector_spark.functions.vrl import ip_aton

    shift = 32 - bucket_bits
    picked = select or [c for c in geo.columns if c not in ("ip_start", "ip_end")]
    geo_b = geo.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.shiftright(F.col("ip_start"), shift),
                F.shiftright(F.col("ip_end"), shift),
            )
        ),
    )
    ipn = ip_aton(F.col(f"e.{ip_col}"))
    joined = events.alias("e").join(
        broadcast(geo_b.alias("g")),
        (F.shiftright(ipn, shift) == F.col("g._bkt"))
        & (ipn >= F.col("g.ip_start"))
        & (ipn <= F.col("g.ip_end")),
        "left",
    )
    return joined.select("e.*", *[F.col(f"g.{c}").alias(c) for c in picked])


def enrich_static(events: DataFrame, values: dict) -> DataFrame:
    """Environment enrichment: attach constant fields to every event — the
    `aws_ec2_metadata` transform shape (reference
    src/transforms/aws_ec2_metadata.rs:92-149: cached instance metadata
    stamped onto each event).  Literals fold into the plan; zero cost."""
    out = events
    for k, v in values.items():
        out = out.withColumn(k, F.lit(v))
    return out
