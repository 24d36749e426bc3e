"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship parse->enrich->route->aggregate
pipeline at sf0.001.  ``queries()``/``oracle_sql()`` expose each implemented
operator from SURVEY.md §2 with a DuckDB-checkable oracle.

Portability rules used throughout (so Spark and DuckDB hash-match):
- single pinned hash: first 15 hex chars of md5 as bigint
  (vector_spark.hashing) — Spark ``conv(substr(md5(x),1,15),16,10)`` ≡
  DuckDB ``('0x'||substr(md5(x),1,15))::bigint``;
- token arrays compared as ``array_join(tokens, ',')`` strings;
- timestamps emitted as formatted UTC strings;
- float aggregates rounded.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_spark import datagen
from vector_spark.functions.grok import CANNED, grok_sql_exprs
from vector_spark.hashing import portable_bucket, portable_bucket_sql
from vector_spark import pipeline as P
from vector_spark.operators import (
    dedupe,
    filter_events,
    reduce_events,
    route,
    sample,
    throttle,
)

CORPUS_SF = 0.01  # driver correctness scale


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.load_corpus(spark, datagen.sf_from_dir(sf_dir))


def _corpus_sql_path() -> str:
    return datagen.ensure_corpus(CORPUS_SF)


def _enrich_values_sql() -> str:
    rows = ", ".join(
        f"('{k}','{r}','{t}',DATE '{f}',DATE '{d}')" for k, r, t, f, d in datagen.ENRICH_ROWS
    )
    return f"(VALUES {rows}) AS l(key, region, tier, from_date, to_date)"


# ---------------------------------------------------------------------------
# flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full pipeline per-sink aggregates at sf0.001."""
    src = P.load_corpus(spark, 0.001)
    enriched = P.parsed_enriched(spark, src)
    return P.sink_aggregates(P.route_stage(enriched))


def _q_pipeline_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    enriched = P.parsed_enriched(spark, _corpus(spark, sf_dir))
    aggs = P.sink_aggregates(P.route_stage(enriched))
    return aggs.select(
        "route_key", "source", "n_rows", F.col("sum_tok").cast("bigint").alias("sum_tok")
    )


def _sql_pipeline_aggregates() -> str:
    path = _corpus_sql_path()
    grok = ",\n       ".join(grok_sql_exprs("message", CANNED["tokenlog"]))
    return f"""
WITH src AS (
  SELECT *,
       {grok}
  FROM read_parquet('{path}')
), enr AS (
  SELECT s.*, l.region, l.tier
  FROM src s LEFT JOIN {_enrich_values_sql()}
    ON s.source = l.key
   AND CAST(substr(s.message, 1, 10) AS DATE) BETWEEN l.from_date AND l.to_date
), routed AS (
  SELECT 'errors' AS route_key, source, n_tok FROM enr WHERE level IN ('ERROR','FATAL')
  UNION ALL
  SELECT 'warnings', source, n_tok FROM enr WHERE level = 'WARN'
  UNION ALL
  SELECT 'app_gold', source, n_tok FROM enr WHERE source = 'app' AND tier = 'gold'
  UNION ALL
  SELECT '_unmatched', source, n_tok FROM enr
  WHERE NOT (COALESCE(level IN ('ERROR','FATAL'), FALSE)
          OR COALESCE(level = 'WARN', FALSE)
          OR COALESCE(source = 'app' AND tier = 'gold', FALSE))
)
SELECT route_key, source, COUNT(*) AS n_rows, CAST(SUM(n_tok) AS BIGINT) AS sum_tok
FROM routed GROUP BY route_key, source ORDER BY route_key, source
"""


# ---------------------------------------------------------------------------
# parse (grok)


def _q_parse_grok(spark: SparkSession, sf_dir: str) -> DataFrame:
    parsed = P.parse_stage(_corpus(spark, sf_dir))
    return parsed.select(
        "doc_id",
        F.col("timestamp").alias("parsed_ts"),
        "level",
        "service",
        "user_id",
        "status",
        "bytes",
        "msg",
    )


def _sql_parse_grok() -> str:
    path = _corpus_sql_path()
    exprs = grok_sql_exprs("message", CANNED["tokenlog"])
    exprs[0] = exprs[0].replace("AS timestamp", "AS parsed_ts")
    body = ",\n       ".join(exprs)
    return f"SELECT doc_id,\n       {body}\nFROM read_parquet('{path}')"


# ---------------------------------------------------------------------------
# route fan-out: token-array equality per routed row (the north-rule gate)


def _routed_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    enriched = P.parsed_enriched(spark, _corpus(spark, sf_dir))
    routed = P.route_stage(enriched)
    return routed.union_labeled("route_key").select(
        "route_key",
        "doc_id",
        "source",
        "n_tok",
        F.array_join(F.col("tokens"), ",").alias("tokens_csv"),
    )


def _sql_routed_tokens() -> str:
    path = _corpus_sql_path()
    grok = ",\n       ".join(grok_sql_exprs("message", CANNED["tokenlog"]))
    return f"""
WITH src AS (
  SELECT *,
       {grok}
  FROM read_parquet('{path}')
), enr AS (
  SELECT s.*, l.tier
  FROM src s LEFT JOIN {_enrich_values_sql()}
    ON s.source = l.key
   AND CAST(substr(s.message, 1, 10) AS DATE) BETWEEN l.from_date AND l.to_date
)
SELECT route_key, doc_id, source, n_tok, array_to_string(tokens, ',') AS tokens_csv
FROM (
  SELECT 'errors' AS route_key, * FROM enr WHERE level IN ('ERROR','FATAL')
  UNION ALL SELECT 'warnings', * FROM enr WHERE level = 'WARN'
  UNION ALL SELECT 'app_gold', * FROM enr WHERE source = 'app' AND tier = 'gold'
  UNION ALL SELECT '_unmatched', * FROM enr
  WHERE NOT (COALESCE(level IN ('ERROR','FATAL'), FALSE)
          OR COALESCE(level = 'WARN', FALSE)
          OR COALESCE(source = 'app' AND tier = 'gold', FALSE))
)
"""


# ---------------------------------------------------------------------------
# filter / sample / dedupe / throttle / reduce over driver tables


def _q_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return filter_events(
        ev, (F.col("event_type") == "error") & (F.col("value") > 100)
    ).select("event_id", "user_id", "event_type", F.round("value", 2).alias("value"))


_SQL_FILTER = """
SELECT event_id, user_id, event_type, ROUND(value, 2) AS value
FROM events WHERE event_type = 'error' AND value > 100
"""


def _q_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    logs = _corpus(spark, sf_dir)
    return sample(logs, rate=10, key_field="doc_id").select(
        "doc_id", "source", "n_tok", "sample_rate"
    )


def _sql_sample() -> str:
    path = _corpus_sql_path()
    return f"""
SELECT doc_id, source, n_tok, '10' AS sample_rate
FROM read_parquet('{path}')
WHERE {portable_bucket_sql("doc_id", 10)} = 0
"""


def _q_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    d = dedupe(ev, match_fields=["user_id", "event_type"], order_by="event_id")
    return d.select("event_id", "user_id", "event_type")


_SQL_DEDUPE = """
SELECT event_id, user_id, event_type FROM (
  SELECT event_id, user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS rn
  FROM events
) WHERE rn = 1
"""


def _q_throttle(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    t = throttle(
        ev, threshold=2, window_secs=3600, ts_col="ts", key_field="user_id",
        tiebreaker="event_id",
    )
    return t.select("event_id", "user_id", "event_type")


_SQL_THROTTLE = """
SELECT event_id, user_id, event_type FROM (
  SELECT event_id, user_id, event_type,
         ROW_NUMBER() OVER (
           PARTITION BY CAST(FLOOR(epoch(ts) / 3600) AS BIGINT), user_id
           ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn <= 2
"""


def _q_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "event_type", "value", "ts"
    )
    r = reduce_events(
        ev,
        group_by=["user_id"],
        merge_strategies={"event_type": "discard", "value": "sum"},
        order_col="ts",
    )
    return r.select(
        "user_id",
        F.col("event_type").alias("first_event_type"),
        F.round("value", 2).alias("sum_value"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_first"),
        F.date_format("ts_end", "yyyy-MM-dd HH:mm:ss").alias("ts_last"),
    )


_SQL_REDUCE = """
SELECT user_id,
       arg_min(event_type, ts) AS first_event_type,
       ROUND(SUM(value), 2) AS sum_value,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS ts_first,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS ts_last
FROM events GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# aggregate (tumbling window) + log_to_metric


def _q_aggregate_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """log_to_metric + aggregate_metrics end-to-end: two counter configs
    (event count; value-incremented) -> one metrics frame -> the aggregate
    operator grouped by (window, series incl. tags) -> pivot the two series
    back to columns.  The count/sum numbers the oracle checks are the
    operator's ``sum_incremental`` outputs, not a re-derived groupBy."""
    from vector_spark.operators.metrics import aggregate_metrics, log_to_metric

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    tags = {"event_type": F.col("event_type")}
    m_count = log_to_metric(ev, name="event_count", metric_type="counter", tags=tags, ts_col="ts")
    m_value = log_to_metric(
        ev, name="event_value", metric_type="counter", field="value",
        increment_by_value=True, tags=tags, ts_col="ts",
    )
    agg = aggregate_metrics(
        m_count.unionByName(m_value), interval_secs=86400, tags_col="tags"
    )
    name = F.col("name")
    return (
        agg.select(
            F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            F.col("tags")["event_type"].alias("event_type"),
            name,
            "sum_incremental",
        )
        .groupBy("window_start", "event_type")
        .agg(
            F.sum(F.when(name == "event_count", F.col("sum_incremental")))
            .cast("bigint")
            .alias("n"),
            F.round(
                F.sum(F.when(name == "event_value", F.col("sum_incremental"))), 2
            ).alias("sum_value"),
        )
        .orderBy("window_start", "event_type")
    )


_SQL_AGGREGATE_WINDOW = """
SELECT strftime(to_timestamp(CAST(FLOOR(epoch(ts) / 86400) AS BIGINT) * 86400),
                '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n,
       ROUND(SUM(value), 2) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# enrichment lookup


def _q_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    enriched = P.enrich_stage(
        spark,
        _corpus(spark, sf_dir).withColumn(
            "event_date", F.to_date(F.substring("message", 1, 10))
        ),
    )
    return (
        enriched.groupBy("source", "region", "tier")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("source", "region", "tier")
    )


def _sql_enrich() -> str:
    path = _corpus_sql_path()
    return f"""
SELECT s.source, l.region, l.tier, COUNT(*) AS n
FROM read_parquet('{path}') s LEFT JOIN {_enrich_values_sql()}
  ON s.source = l.key
 AND CAST(substr(s.message, 1, 10) AS DATE) BETWEEN l.from_date AND l.to_date
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# reduce sessionization (ends_when) — reference reduce/mod.rs:229-296


def _q_reduce_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "event_type", "value", "ts", "event_id"
    )
    r = reduce_events(
        ev,
        group_by=["user_id"],
        merge_strategies={"event_type": "discard", "value": "sum", "event_id": "min"},
        order_col="ts",
        ends_when=F.col("event_type") == "logout",
    )
    return r.select(
        "user_id",
        F.col("event_id").alias("first_event_id"),
        F.col("event_type").alias("first_event_type"),
        F.round("value", 2).alias("sum_value"),
    )


_SQL_REDUCE_SESSIONS = """
WITH flagged AS (
  SELECT user_id, event_type, value, ts, event_id,
         COALESCE(SUM(CASE WHEN event_type = 'logout' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS sess
  FROM events
)
SELECT user_id,
       MIN(event_id) AS first_event_id,
       arg_min(event_type, ts) AS first_event_type,
       ROUND(SUM(value), 2) AS sum_value
FROM flagged GROUP BY user_id, sess
"""


# ---------------------------------------------------------------------------
# tag_cardinality_limit — reference src/transforms/tag_cardinality_limit/


def _q_tag_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_spark.operators.metrics import tag_cardinality_limit

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id", "user_id")
    limited = tag_cardinality_limit(ev, ["user_id"], value_limit=50, action="drop_tag")
    return limited.select("event_id", F.col("user_id").cast("string").alias("user_id"))


_SQL_TAG_CARDINALITY = """
WITH admitted AS (
  SELECT user_id AS adm FROM (
    SELECT DISTINCT user_id FROM events
  ) QUALIFY dense_rank() OVER (ORDER BY user_id ASC NULLS LAST) <= 50
)
SELECT e.event_id,
       CASE WHEN a.adm IS NOT NULL THEN CAST(e.user_id AS VARCHAR) END AS user_id
FROM events e LEFT JOIN admitted a ON e.user_id = a.adm
"""


# ---------------------------------------------------------------------------
# training-data ops: text analysis / dedup / similarity (documents, embeddings)


def _q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus filter: keep docs with quality >= 0.7 and >= 20 BPE
    tokens; emit per-source survivor stats (filter + textstats compose)."""
    from vector_spark import textstats as T

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = d.select(
        "source",
        T.quality_score("text").alias("q"),
        T.token_count_bpe("text").alias("n_bpe"),
    )
    kept = scored.filter((F.col("q") >= 0.7) & (F.col("n_bpe") >= 20))
    return (
        kept.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"), F.round(F.avg("q"), 6).alias("avg_q"))
        .orderBy("source")
    )


def _sql_quality_filter() -> str:
    from vector_spark import textstats as T

    q = T.sql_quality_score("text")
    return f"""
WITH scored AS (
  SELECT source, {q} AS q, {T.sql_token_count_bpe("text")} AS n_bpe
  FROM documents
)
SELECT source, COUNT(*) AS n_kept, ROUND(AVG(q), 6) AS avg_q
FROM scored WHERE q >= 0.7 AND n_bpe >= 20
GROUP BY source ORDER BY source
"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_spark import textstats as T

    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        T.token_count_ws("text").alias("n_ws"),
        T.token_count_bpe("text").alias("n_bpe"),
        F.round(T.quality_score("text"), 6).alias("quality"),
        T.fingerprint("text").alias("fp"),
    )


def _sql_text_stats() -> str:
    from vector_spark import textstats as T

    return f"""
SELECT doc_id,
       len({T.sql_words("text")}) AS n_ws,
       {T.sql_token_count_bpe("text")} AS n_bpe,
       ROUND({T.sql_quality_score("text")}, 6) AS quality,
       {T.sql_fingerprint("text")} AS fp
FROM documents
"""


def _q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_spark import textstats as T

    return _docs(spark, sf_dir).select(
        "doc_id", "lang", T.lang_id("text").alias("lang_pred")
    )


def _sql_lang_id() -> str:
    from vector_spark import textstats as T

    return f"SELECT doc_id, lang, {T.sql_lang_id('text')} AS lang_pred FROM documents"


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_spark.dedup import dedup_exact

    return dedup_exact(_docs(spark, sf_dir)).select("doc_id", "lang", "source", "n_chars")


def _sql_dedup_exact() -> str:
    from vector_spark.dedup import sql_dedup_exact

    return (
        "SELECT doc_id, lang, source, n_chars FROM ("
        + sql_dedup_exact("documents")
        + ")"
    )


def _q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_spark.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_docs(spark, sf_dir))


def _sql_minhash_pairs() -> str:
    from vector_spark.dedup import sql_minhash_lsh_pairs

    return sql_minhash_lsh_pairs("documents")


def _q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_spark.dedup import simhash

    return _docs(spark, sf_dir).select("doc_id", simhash("text").alias("sh16"))


def _sql_simhash() -> str:
    from vector_spark.dedup import sql_simhash

    return f"SELECT doc_id, {sql_simhash('text')} AS sh16 FROM documents"


def _q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_spark.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.1)


def _sql_ngram_jaccard() -> str:
    from vector_spark.dedup import sql_ngram_jaccard_pairs

    return sql_ngram_jaccard_pairs("documents", threshold=0.1)


_COS_DOT = (
    "list_reduce(list_transform(range(1, 65), i -> "
    "CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (x, y) -> x + y)"
)


def _sql_cosine(a: str, b: str) -> str:
    dot = _COS_DOT.format(a=a, b=b)
    na = "sqrt(" + _COS_DOT.format(a=a, b=a) + ")"
    nb = "sqrt(" + _COS_DOT.format(a=b, b=b) + ")"
    return f"({dot}) / ({na} * {nb})"


def _q_embedding_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_spark.dedup import embedding_dup_pairs

    return embedding_dup_pairs(_embs(spark, sf_dir), threshold=0.5)


def _sql_embedding_dup() -> str:
    cs = _sql_cosine("a.embedding", "b.embedding")
    return f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b, ROUND({cs}, 6) AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {cs} >= 0.5
"""


def _q_embedding_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_spark.similarity import embedding_dup_pairs_lsh

    return embedding_dup_pairs_lsh(_embs(spark, sf_dir), threshold=0.5, n_planes=4, dim=64)


def _sql_embedding_dup_lsh() -> str:
    from vector_spark.similarity import hyperplanes, sql_lsh_bucket

    planes = hyperplanes(64, 4)
    bkt = sql_lsh_bucket("embedding", planes)
    cs = _sql_cosine("a.embedding", "b.embedding")
    return f"""
WITH bucketed AS (SELECT vec_id, embedding, {bkt} AS _b FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, ROUND({cs}, 6) AS cos
FROM bucketed a JOIN bucketed b ON a._b = b._b AND a.vec_id < b.vec_id
WHERE {cs} >= 0.5
"""


def _q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_spark.similarity import topk_cosine

    embs = _embs(spark, sf_dir)
    queries_df = embs.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return topk_cosine(embs, queries_df, k=5)


def _sql_ann_topk() -> str:
    cs = _sql_cosine("c.embedding", "q.embedding")
    return f"""
SELECT query_id, vec_id, cos FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS vec_id, ROUND({cs}, 6) AS cos,
         ROW_NUMBER() OVER (PARTITION BY q.vec_id
                            ORDER BY ROUND({cs}, 6) DESC, c.vec_id ASC) AS rk
  FROM embeddings c JOIN embeddings q ON q.vec_id < 3
) WHERE rk <= 5
"""


def _q_ann_topk_numpy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production ANN baseline (one numpy GEMM per Arrow batch,
    similarity.topk_cosine_numpy) checked against the SAME oracle as the
    HOF-expression twin `ann_topk` — measured ~45x faster at corpus
    scale."""
    from vector_spark.similarity import topk_cosine_numpy

    embs = _embs(spark, sf_dir)
    qvecs = {
        r["vec_id"]: list(r["embedding"])
        for r in embs.filter(F.col("vec_id") < 3).collect()
    }
    return topk_cosine_numpy(embs, qvecs, k=5)


def _q_ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from vector_spark.similarity import topk_cosine_lsh

    embs = _embs(spark, sf_dir)
    queries_df = embs.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return topk_cosine_lsh(embs, queries_df, k=5, n_planes=4, dim=64)


def _sql_ann_topk_lsh() -> str:
    from vector_spark.similarity import hyperplanes, sql_lsh_bucket

    planes = hyperplanes(64, 4)
    bkt = sql_lsh_bucket("embedding", planes)
    cs = _sql_cosine("c.embedding", "q.embedding")
    return f"""
WITH bucketed AS (SELECT vec_id, embedding, {bkt} AS _b FROM embeddings)
SELECT query_id, vec_id, cos FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS vec_id, ROUND({cs}, 6) AS cos,
         ROW_NUMBER() OVER (PARTITION BY q.vec_id
                            ORDER BY ROUND({cs}, 6) DESC, c.vec_id ASC) AS rk
  FROM bucketed c JOIN bucketed q ON q.vec_id < 3 AND c._b = q._b
) WHERE rk <= 5
"""


def _q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing (rows-only check: payloads live only in Spark).

    Deterministic: synth media + content-hash-seeded fake decode."""
    from vector_spark.multimodal import extract_features, synth_media

    feats = extract_features(synth_media(spark, 64), dim=8, fake=True)
    return feats.select("media_id", "kind", "n_bytes", "content_sha")


# ---------------------------------------------------------------------------
# contract


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pipeline_sink_aggregates": _q_pipeline_aggregates,
        "routed_tokens": _routed_tokens,
        "parse_grok": _q_parse_grok,
        "filter": _q_filter,
        "sample_hash": _q_sample,
        "dedupe": _q_dedupe,
        "throttle": _q_throttle,
        "reduce": _q_reduce,
        "aggregate_window": _q_aggregate_window,
        "enrich_lookup": _q_enrich,
        "text_stats": _q_text_stats,
        "lang_id": _q_lang_id,
        "dedup_exact": _q_dedup_exact,
        "minhash_lsh_pairs": _q_minhash_pairs,
        "simhash": _q_simhash,
        "ngram_jaccard": _q_ngram_jaccard,
        "embedding_dup": _q_embedding_dup,
        "embedding_dup_lsh": _q_embedding_dup_lsh,
        "ann_topk": _q_ann_topk,
        "ann_topk_numpy": _q_ann_topk_numpy,
        "ann_topk_lsh": _q_ann_topk_lsh,
        "media_features": _q_media_features,
        "reduce_sessions": _q_reduce_sessions,
        "tag_cardinality_limit": _q_tag_cardinality,
        "quality_filter": _q_quality_filter,
    }


def oracle_sql() -> dict[str, str]:
    datagen.ensure_corpus(CORPUS_SF)
    return {
        "pipeline_sink_aggregates": _sql_pipeline_aggregates(),
        "routed_tokens": _sql_routed_tokens(),
        "parse_grok": _sql_parse_grok(),
        "filter": _SQL_FILTER,
        "sample_hash": _sql_sample(),
        "dedupe": _SQL_DEDUPE,
        "throttle": _SQL_THROTTLE,
        "reduce": _SQL_REDUCE,
        "aggregate_window": _SQL_AGGREGATE_WINDOW,
        "enrich_lookup": _sql_enrich(),
        "text_stats": _sql_text_stats(),
        "lang_id": _sql_lang_id(),
        "dedup_exact": _sql_dedup_exact(),
        "minhash_lsh_pairs": _sql_minhash_pairs(),
        "simhash": _sql_simhash(),
        "ngram_jaccard": _sql_ngram_jaccard(),
        "embedding_dup": _sql_embedding_dup(),
        "embedding_dup_lsh": _sql_embedding_dup_lsh(),
        "ann_topk": _sql_ann_topk(),
        "ann_topk_numpy": _sql_ann_topk(),
        "ann_topk_lsh": _sql_ann_topk_lsh(),
        # media_features: payloads exist only in Spark -> rows-only check
        "reduce_sessions": _SQL_REDUCE_SESSIONS,
        "tag_cardinality_limit": _SQL_TAG_CARDINALITY,
        "quality_filter": _sql_quality_filter(),
    }
