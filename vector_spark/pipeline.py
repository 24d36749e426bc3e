"""The flagship topology: scan -> parse -> enrich -> route -> per-sink
aggregates, the batch rebuild of the reference's canonical regression case
(syslog -> remap(parse_regex) -> log_to_metric -> metrics sink,
regression/cases/syslog_regex_logs2metric_ddmetrics/vector/vector.toml:19-35)
combined with route fan-out (splunk_hec_route_s3 case).

Stages (north_rule):
  1. parse   — vectorized grok over ``message`` (JVM regexp, codegen)
  2. enrich  — broadcast hash join on the lookup table (enrich_tables.file)
  3. route   — copy-to-every-match fan-out + _unmatched (route.rs:35-53)
  4. sinks   — per-route parquet tables, each with per-sink hash aggregates
               count/sum by (source, route_key) ≈ log_to_metric + aggregate
  5. manifest — per-partition lineage + throughput metrics (≈ end-to-end
               acks + file checkpointer, lib/vector-common/src/finalization.rs,
               lib/file-source/src/checkpointer.rs)

Scale design: the parsed/enriched DataFrame is computed ONCE and persisted
before the fan-out so N route filters share one parse+join pass; routes are
written with partition-level parallelism; AQE handles skewed ``source``
values on the aggregate shuffle (salting helper in ops/skew.py for the
extreme case).  Every predicate is a Column expression -> full pushdown into
the parquet scan when routes are computed without the persist barrier.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from vector_spark import datagen
from vector_spark.enrichment import enrich_find, load_enrichment_df
from vector_spark.functions.grok import CANNED, grok_parts
from vector_spark.operators.route import RouteResult, route

ROUTE_CONDS = {
    "errors": lambda: F.col("level").isin("ERROR", "FATAL"),
    "warnings": lambda: F.col("level") == "WARN",
    "app_gold": lambda: (F.col("source") == "app") & (F.col("tier") == "gold"),
}


def load_corpus(spark: SparkSession, sf: float) -> DataFrame:
    return spark.read.parquet(datagen.ensure_corpus(sf))


def parse_stage(df: DataFrame) -> DataFrame:
    """Grok-parse ``message`` into typed columns; parse failures keep NULLs
    plus ``_parse_error`` (remap dropped-port annotation,
    src/transforms/remap.rs:496-498)."""
    parts, g = grok_parts("message", CANNED["tokenlog"])
    cols = []
    for i, (name, typ) in enumerate(zip(g.fields, g.types)):
        # F.get: NULL on the size-1 non-match array in both ANSI modes
        # (getItem throws under ANSI-on sessions, e.g. default Spark 4).
        c = F.get(parts, F.lit(i + 1))
        if typ == "int":
            c = c.try_cast("long")
        elif typ == "float":
            c = c.try_cast("double")
        cols.append(c.alias(name))
    # matched ⇔ the one-pass split produced K+1 parts (see grok_parts)
    return df.select(
        "*",
        *cols,
        F.when(F.size(parts) == 1, F.lit("grok parse failed")).alias("_parse_error"),
    )


def enrich_stage(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Broadcast-join the source lookup table with inclusive date-range
    condition (Condition::Equals AND BetweenDates,
    src/enrichment_tables/file.rs:289-310)."""
    lookup = load_enrichment_df(
        spark, datagen.ENRICH_ROWS, ["key", "region", "tier", "from_date", "to_date"]
    ).select(
        "key",
        "region",
        "tier",
        F.to_date("from_date").alias("from_date"),
        F.to_date("to_date").alias("to_date"),
    )
    return enrich_find(
        df,
        lookup,
        on={"source": "key"},
        date_range=("event_date", "from_date", "to_date"),
        select=["region", "tier"],
    )


def route_stage(df: DataFrame) -> RouteResult:
    return route(df, {name: cond() for name, cond in ROUTE_CONDS.items()})


def parsed_enriched(spark: SparkSession, df: DataFrame) -> DataFrame:
    parsed = parse_stage(df).withColumn("event_date", F.to_date("ts"))
    return enrich_stage(spark, parsed).drop("event_date")


def sink_aggregates(routed: RouteResult | DataFrame) -> DataFrame:
    """Per-sink hash aggregates: count + token sum by (source, route_key)
    (≈ log_to_metric counters flushed by aggregate,
    src/transforms/log_to_metric.rs + aggregate.rs).

    Accepts either a RouteResult (uses its one-pass labeled plan) or an
    already-labeled DataFrame.  One hash aggregate; map-side partial
    aggregation keeps the shuffle at |routes|x|sources| rows."""
    labeled = routed if isinstance(routed, DataFrame) else routed.union_labeled("route_key")
    return (
        labeled.groupBy("route_key", "source")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("n_tok").alias("sum_tok"),
        )
        .orderBy("route_key", "source")
    )


def _list_partition_files(spark: SparkSession, base: str, subdir: str) -> tuple[int, int]:
    """(n_files, n_bytes) for one sink partition directory via the Hadoop
    FileSystem API — the same abstraction Spark's committers use, so it
    works on object storage (s3a/gs/abfs) where driver-side glob/getsize
    do not.  Metadata-only: no file content is read."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(base, subdir)
    fs = p.getFileSystem(conf)
    if not fs.exists(p):
        return 0, 0
    n_files = n_bytes = 0
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if st.isFile() and not name.startswith(("_", ".")):
            n_files += 1
            n_bytes += st.getLen()
    return n_files, n_bytes


def run_pipeline(
    spark: SparkSession,
    sf: float,
    out_dir: str | None = None,
    run_id: str | None = None,
    mode: str = "partitioned",
    aggregate_from_written: bool = False,
    source_format: str = "parquet",
    sink_format: str = "parquet",
) -> dict:
    """Execute the full topology; write per-route sinks + metrics + manifest.

    ``mode='partitioned'`` (default, the scale path): ONE pass — the labeled
    explode plan is written with ``partitionBy(route_key)``, so parse+enrich
    run exactly once and each route lands in its own sink directory (the
    batch rendering of Vector's Fanout + per-sink partitioned batcher,
    lib/vector-core/src/fanout.rs + stream/partitioned_batcher.rs).

    ``mode='per_route'``: independent write per route over a persisted
    upstream — for topologies where sinks need different schemas/formats.

    Resumability (north_rule): the manifest table records, per (run_id,
    sink), rows/wall-ms and a committed flag; a re-run with the same run_id
    skips sinks already committed — the batch rendering of Vector's
    checkpointer + end-to-end acks (lib/file-source/src/checkpointer.rs,
    lib/vector-common/src/finalization.rs).

    ``aggregate_from_written=True`` computes the per-sink aggregates from
    the WRITTEN data read back so parity checks catch write-path bugs; the
    default computes them from the routed plan (per-route row counts still
    come from the written parquet — a metadata-only footer count — so the
    manifest always reflects durable state without re-reading sink data).
    """
    out_dir = out_dir or os.path.join("/tmp/vector_spark_out", f"sf{sf:g}")
    run_id = run_id or f"run-{int(time.time())}"
    manifest_path = os.path.join(out_dir, "_manifest")
    done: set[str] = set()
    # Hadoop-FS existence check (not os.path.exists): on object storage the
    # driver-local check returns False and silently disables resume.
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    mpath = jvm.org.apache.hadoop.fs.Path(manifest_path)
    if mpath.getFileSystem(hconf).exists(mpath):
        try:
            prior = spark.read.parquet(manifest_path)
            done = {
                r["sink"]
                for r in prior.filter(
                    (F.col("run_id") == run_id) & F.col("committed")
                ).select("sink").collect()
            }
        except Exception:
            done = set()

    if source_format == "iceberg":
        # batch-over-Iceberg (north_rule): planned file scan of the corpus
        # table — partition/stat pruning happens in the metadata layer.
        from vector_spark.iceberg import ensure_iceberg_corpus

        src = ensure_iceberg_corpus(spark, sf).scan(spark)
    else:
        src = load_corpus(spark, sf)
    enriched = parsed_enriched(spark, src)
    routed = route_stage(enriched)

    _MANIFEST_COLS = [
        "run_id", "sink", "path", "rows", "n_files", "bytes", "wall_ms", "committed",
    ]

    def _commit_manifest(rows: list) -> None:
        # durable append the moment the corresponding data write succeeds —
        # batching until the end of the run would lose earlier sinks' rows
        # on a mid-run crash and force the resume to rewrite them
        if rows:
            spark.createDataFrame(rows, _MANIFEST_COLS).coalesce(1).write.mode(
                "append"
            ).parquet(manifest_path)

    t_total = time.time()
    total_rows = 0
    if mode == "partitioned":
        sinks_path = os.path.join(out_dir, "sinks")
        if "sinks" not in done:
            t0 = time.time()
            routed.labeled.write.mode("overwrite").partitionBy("route_key").parquet(
                sinks_path
            )
            wall_ms = int((time.time() - t0) * 1000)
            # per-partition lineage: rows + bytes + file count per route
            # partition from the WRITTEN sink (checkpointer + finalization
            # parity: the manifest reflects durable state).  count() over
            # parquet is metadata-only (row-group footers); file stats come
            # from a Hadoop FS listing — no sink data is re-read.
            written = spark.read.parquet(sinks_path)
            per_route = {
                r["route_key"]: r["n"]
                for r in written.groupBy("route_key").count().withColumnRenamed(
                    "count", "n"
                ).collect()
            }
            batch = []
            for name, n in sorted(per_route.items()):
                n_files, nbytes = _list_partition_files(
                    spark, sinks_path, f"route_key={name}"
                )
                total_rows += n
                batch.append(
                    (run_id, name, sinks_path, n, n_files, nbytes, wall_ms, True)
                )
            # commit marker for the single-pass write (resume key) — one
            # append with its per-route lineage, durable before the
            # aggregate/metric writes run
            batch.append(
                (run_id, "sinks", sinks_path, total_rows, 0, 0, wall_ms, True)
            )
            _commit_manifest(batch)
        iceberg_sinks: dict[str, int] = {}
        if sink_format == "iceberg":
            # per-route Iceberg sink tables over the files already written
            # (add_files registration — no data rewrite, resume-idempotent)
            from vector_spark.iceberg import register_sink_tables

            iceberg_sinks = register_sink_tables(
                spark,
                sinks_path,
                os.path.join(out_dir, "iceberg_sinks"),
                routed.labeled.schema,
            )
        if aggregate_from_written:
            aggs = sink_aggregates(spark.read.parquet(sinks_path))
        else:
            aggs = sink_aggregates(routed)
    else:
        persisted = enriched.persist(StorageLevel.MEMORY_AND_DISK)
        routed = route_stage(persisted)
        for name, rdf in routed.routes.items():
            if name in done:
                continue
            t0 = time.time()
            path = os.path.join(out_dir, f"sink_{name}")
            rdf.write.mode("overwrite").parquet(path)
            n = spark.read.parquet(path).count()
            total_rows += n
            _commit_manifest(
                [(run_id, name, path, n, 0, 0, int((time.time() - t0) * 1000), True)]
            )
        aggs = sink_aggregates(routed)
    aggs.write.mode("overwrite").parquet(os.path.join(out_dir, "sink_metrics"))
    wall = time.time() - t_total
    if mode != "partitioned":
        persisted.unpersist()
    result = {
        "run_id": run_id,
        "out_dir": out_dir,
        "routed_rows": total_rows,
        "wall_sec": wall,
        "rows_per_sec": total_rows / wall if wall > 0 else 0.0,
        "skipped_sinks": sorted(done),
    }
    if mode == "partitioned" and sink_format == "iceberg":
        result["iceberg_sinks"] = iceberg_sinks
    return result
