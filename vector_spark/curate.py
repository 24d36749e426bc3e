"""Composed, resumable corpus-curation runner.

`run_pipeline` (pipeline.py) is the log-side flagship; this is the
training-data twin: a staged curation recipe over the documents table —

  1. exact_dedup — keep the lowest-id doc per identical text
     (dedup.dedup_exact, 120-bit content key)
  2. line_strip  — remove cross-document boilerplate lines
     (curation.strip_common_lines)
  3. quality     — keep the top ``keep_frac`` of each source by quality
     score of the CLEANED text (curation-style percent_rank selection)
  4. audit       — per-source in/out docs, surviving chars, selected-set
     checksum

Stage order matters and mirrors production practice: exact dedup first
(cheapest, biggest shrink), boilerplate removal before quality scoring
(banners distort length/punctuation features), percentile selection last
(relative quality is only meaningful on the cleaned survivors).

`curate_audit` composes the chain lazily (one DataFrame, no writes) —
that is the oracle-gated contract surface; `run_curation` executes it
stage-by-stage with per-stage parquet artifacts and a manifest table
(run_id, stage, rows, wall_ms, committed), so a re-run with the same
run_id skips committed stages — the same checkpointer/acks rendering as
run_pipeline (lib/file-source/src/checkpointer.rs,
lib/vector-common/src/finalization.rs).

Scale notes: every stage is one of the already-audited plans (hash-agg
dedup, heavy-hitter broadcast anti-join, per-source window); the runner
adds only parquet barriers between them.  Artifacts store doc ids +
cleaned text, never token arrays.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from vector_spark import textstats as T
from vector_spark.curation import _lines, common_lines
from vector_spark.dedup import dedup_exact
from vector_spark.hashing import portable_bucket, portable_bucket_sql, portable_hash64

_CKSUM_MOD = 1_000_000


def _cleaned_docs(
    docs: DataFrame, min_docs: int, id_col: str, text_col: str
) -> DataFrame:
    """strip_common_lines, but returning the cleaned TEXT (the pipeline
    needs it for rescoring) instead of the audit hash."""
    lines = _lines(docs, id_col, text_col)
    common = common_lines(docs, min_docs, id_col, text_col).select("line_h")
    kept = lines.join(
        F.broadcast(common),
        portable_hash64(F.col("line")) == F.col("line_h"),
        "left_anti",
    )
    clean = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean_text")
    )
    return (
        docs.select(id_col)
        .join(clean, id_col, "left")
        .select(id_col, F.coalesce("clean_text", F.lit("")).alias(text_col))
    )


def curate_chain(
    docs: DataFrame,
    min_docs: int = 2,
    keep_frac: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """The curated survivor set: (id, source, cleaned text, q) after
    exact-dedup -> line-strip -> per-source quality percentile."""
    sources = docs.select(id_col, source_col)
    d1 = dedup_exact(docs, text_col=text_col, id_col=id_col, normalize=False)
    d2 = _cleaned_docs(d1, min_docs, id_col, text_col)
    scored = d2.join(sources, id_col).select(
        id_col, source_col, text_col, T.quality_score(text_col).alias("q")
    )
    w = Window.partitionBy(source_col).orderBy(F.desc("q"), F.col(id_col))
    return (
        scored.withColumn("pr", F.percent_rank().over(w))
        .filter(F.col("pr") <= keep_frac)
        .drop("pr")
    )


def curate_audit(
    docs: DataFrame,
    min_docs: int = 2,
    keep_frac: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source audit of the full chain: docs in, docs out, surviving
    chars, selected-set checksum.  Lazy single-plan composition — the
    oracle-gated contract surface for the whole recipe."""
    kept = curate_chain(docs, min_docs, keep_frac, id_col, text_col, source_col)
    outs = kept.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_out"),
        F.sum(F.length(text_col)).cast("long").alias("chars_out"),
        F.sum(portable_bucket(F.col(id_col), _CKSUM_MOD))
        .cast("long")
        .alias("sel_sum"),
    )
    ins = docs.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_in"))
    return (
        ins.join(outs, source_col, "left")
        .select(
            source_col,
            "n_in",
            F.coalesce("n_out", F.lit(0)).cast("long").alias("n_out"),
            F.coalesce("chars_out", F.lit(0)).cast("long").alias("chars_out"),
            F.coalesce("sel_sum", F.lit(0)).cast("long").alias("sel_sum"),
        )
        .orderBy(source_col)
    )


def sql_curate_audit(
    min_docs: int = 2, keep_frac: float = 0.5, table: str = "documents"
) -> str:
    """DuckDB twin of :func:`curate_audit` over ``table``
    (doc_id, text, source) — pass a bare table name or an UNALIASED
    parenthesized subquery; aliases are added here."""
    q = T.sql_quality_score("d2.text")
    return f"""
WITH src AS (SELECT doc_id, text, source FROM {table} AS _s),
keepers AS (
  SELECT MIN(doc_id) AS doc_id FROM src GROUP BY text
),
d1 AS (
  SELECT t.doc_id, t.text, t.source FROM src t
  JOIN keepers USING (doc_id)
),
ls AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10))) AS line,
         unnest(generate_series(1, len(string_split(text, chr(10))))) AS pos
  FROM d1
),
common AS (
  SELECT line FROM ls WHERE len(line) > 0
  GROUP BY line HAVING COUNT(DISTINCT doc_id) >= {min_docs}
),
kept_lines AS (SELECT * FROM ls WHERE line NOT IN (SELECT line FROM common)),
clean AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS txt
  FROM kept_lines GROUP BY doc_id
),
d2 AS (
  SELECT d1.doc_id, d1.source, COALESCE(clean.txt, '') AS text
  FROM d1 LEFT JOIN clean USING (doc_id)
),
ranked AS (
  SELECT d2.doc_id, d2.source, d2.text, {q} AS q,
         percent_rank() OVER (
           PARTITION BY d2.source ORDER BY {q} DESC, d2.doc_id
         ) AS pr
  FROM d2
),
kept AS (SELECT * FROM ranked WHERE pr <= {keep_frac}),
outs AS (
  SELECT source, COUNT(*)::BIGINT AS n_out,
         SUM(len(text))::BIGINT AS chars_out,
         SUM({portable_bucket_sql("doc_id", _CKSUM_MOD)})::BIGINT AS sel_sum
  FROM kept GROUP BY source
),
ins AS (SELECT source, COUNT(*)::BIGINT AS n_in FROM src GROUP BY source)
SELECT ins.source, ins.n_in,
       COALESCE(outs.n_out, 0)::BIGINT AS n_out,
       COALESCE(outs.chars_out, 0)::BIGINT AS chars_out,
       COALESCE(outs.sel_sum, 0)::BIGINT AS sel_sum
FROM ins LEFT JOIN outs USING (source)
ORDER BY ins.source
"""


# ---------------------------------------------------------------------------
# staged runner with manifest resume


def _fs_exists(spark: SparkSession, path: str) -> bool:
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(hconf).exists(p)


def run_curation(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    run_id: str,
    min_docs: int = 2,
    keep_frac: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> dict:
    """Execute the chain stage-by-stage with per-stage parquet artifacts
    and a resume manifest.  Returns {stage: rows, 'skipped': [...]}."""
    manifest_path = os.path.join(out_dir, "_manifest")
    done: set[str] = set()
    if _fs_exists(spark, manifest_path):
        try:
            prior = spark.read.parquet(manifest_path)
            done = {
                r["stage"]
                for r in prior.filter(
                    (F.col("run_id") == run_id) & F.col("committed")
                )
                .select("stage")
                .collect()
            }
        except Exception:
            done = set()

    counts: dict[str, int] = {}
    skipped: list[str] = []

    def _stage(name: str, build) -> DataFrame:
        path = os.path.join(out_dir, name)
        if name in done:
            skipped.append(name)
            out = spark.read.parquet(path)
            counts[name] = out.count()  # metadata-only footer count
            return out
        t0 = time.time()
        build().write.mode("overwrite").parquet(path)
        out = spark.read.parquet(path)
        n = out.count()
        counts[name] = n
        # durably commit THIS stage's manifest row before the next stage
        # starts, so a crash in stage k+1 still resumes past stage k
        from vector_spark.sharding import _append_manifest_row

        _append_manifest_row(
            spark,
            manifest_path,
            (run_id, name, path, n, int((time.time() - t0) * 1000), True),
        )
        return out

    sources = docs.select(id_col, source_col)
    d1 = _stage(
        "exact_dedup",
        lambda: dedup_exact(docs, text_col=text_col, id_col=id_col, normalize=False),
    )
    d2 = _stage(
        "line_strip", lambda: _cleaned_docs(d1, min_docs, id_col, text_col)
    )

    def _quality() -> DataFrame:
        scored = d2.join(sources, id_col).select(
            id_col, source_col, text_col, T.quality_score(text_col).alias("q")
        )
        w = Window.partitionBy(source_col).orderBy(F.desc("q"), F.col(id_col))
        return (
            scored.withColumn("pr", F.percent_rank().over(w))
            .filter(F.col("pr") <= keep_frac)
            .drop("pr")
        )

    kept = _stage("quality", _quality)
    _stage(
        "audit",
        lambda: kept.groupBy(source_col).agg(
            F.count(F.lit(1)).alias("n_out"),
            F.sum(F.length(text_col)).cast("long").alias("chars_out"),
        ),
    )

    return {"counts": counts, "skipped": skipped}
