"""Corpus-wide duplicate-span detection over token sequences.

Substring-level dedup in the spirit of Lee et al., "Deduplicating
Training Data Makes Language Models Better" (ACL 2022, public): find
maximal spans of tokens that are repeated elsewhere in the corpus, at
k-gram granularity — a span is flagged iff every k-token window in it
occurs >= ``min_count`` times corpus-wide.  Distinct from both
`dedup.py` (whole/near-document identity) and `decontam.py` (membership
against a small external set): this is corpus *self*-similarity at
sub-document granularity, the op that catches boilerplate headers,
license blocks, and templated spam that document-level dedup misses.

The reference repo is a log pipeline and has no such operator;
LLM-data-pipeline extension alongside SURVEY.md §2.

Scale design (10^12-sequence corpus):

- The exact suffix-array construction of the paper is a dedicated-machine
  batch job; the distributed approximation is ONE hash-partitioned pass
  over the gram stream (default ``plan='window'``): every (id, pos,
  gram_hash) occurrence shuffles once on the 64-bit gram hash and a
  ``COUNT(*) OVER (PARTITION BY gram_hash)`` filter keeps the duplicated
  positions.  The exchange carries ~O(total tokens) 12-byte rows —
  inherent to the problem (every position must meet its twins somewhere)
  and embarrassingly hash-parallel.  ``plan='join'`` (count-aggregate +
  dup-set join; gram stream computed twice) trades a second pass for AQE
  skew-join handling when a degenerate gram (padding runs) would
  overload one window partition; ``max_count`` drops such corpus
  "stop-grams" on either plan.
- Everything after the join is per-doc: a window over (doc, pos) merges
  overlapping windows into maximal spans (gaps-and-islands), so state
  never exceeds one doc's gram list per task.
- The production gram stream comes from a zero-copy Arrow rolling-hash
  kernel (``fast=True``) — no O(n_tok x k) gram-string materialization;
  the md5-of-joined-string twin is the oracle-reproducible form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vector_spark.decontam import _gram_strings
from vector_spark.hashing import portable_hash64


def _rolling_hash_positions(flat, lens, n):
    """Like decontam._rolling_hashes but also returns each gram's 1-based
    start position within its row: (hashes, row_index, pos)."""
    import numpy as np

    from vector_spark.decontam import _ROLL_B, _U64

    L0 = len(flat) - n + 1
    if L0 <= 0:
        e = np.empty(0, np.int64)
        return np.empty(0, np.uint64), e, e.copy()
    flat = flat.astype(np.uint64, copy=False)
    acc = np.zeros(L0, np.uint64)
    b = 1
    for j in range(n - 1, -1, -1):
        acc += flat[j : j + L0] * np.uint64(b)
        b = (b * _ROLL_B) & _U64
    rowidx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    valid = rowidx[:L0] == rowidx[n - 1 : n - 1 + L0]
    vpos = np.nonzero(valid)[0]
    rows_of = rowidx[vpos]
    starts = np.zeros(len(lens), np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    return acc[valid], rows_of, vpos - starts[rows_of] + 1


def gram_positions(
    df: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    tok_col: str = "tokens",
    fast: bool = False,
) -> DataFrame:
    """(id, pos, gram_hash) — one row per k-gram occurrence, ``pos`` the
    1-based start token.  ``fast=True`` streams 64-bit rolling hashes out
    of an Arrow kernel (production); the default builds the
    oracle-reproducible md5-of-joined-string hash."""
    if not fast:
        return df.select(
            id_col, F.posexplode(_gram_strings(tok_col, k)).alias("_i", "_g")
        ).select(
            id_col,
            (F.col("_i") + 1).cast("long").alias("pos"),
            portable_hash64(F.col("_g")).alias("gram_hash"),
        )

    def kernel(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        from vector_spark.arena import warm_numpy_arena

        warm_numpy_arena()
        out_schema = pa.schema(
            [(id_col, pa.string()), ("pos", pa.int64()), ("gram_hash", pa.int64())]
        )
        for batch in batches:
            if batch.num_rows == 0:
                continue
            toks = batch.column(tok_col)
            lens = pc.fill_null(pc.list_value_length(toks), 0).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            flat = toks.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
            if not len(flat):
                continue
            h, rows_of, pos = _rolling_hash_positions(flat, lens, k)
            if not len(h):
                continue
            yield pa.RecordBatch.from_arrays(
                [
                    pc.take(batch.column(id_col), pa.array(rows_of)),
                    pa.array(pos),
                    pa.array(h.view(np.int64)),  # reinterpret, keeps 64 bits
                ],
                schema=out_schema,
            )

    return df.select(id_col, tok_col).mapInArrow(
        kernel, schema=f"{id_col} string, pos long, gram_hash long"
    )


def dup_spans(
    df: DataFrame,
    k: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    tok_col: str = "tokens",
    fast: bool = False,
    max_count: int | None = None,
    plan: str = "window",
    num_partitions: int | None = None,
) -> DataFrame:
    """(id, span_start, span_end) — maximal duplicated spans (1-based,
    inclusive).  A k-gram is "duplicated" when it occurs >= ``min_count``
    times corpus-wide (within-doc repeats count); overlapping/adjacent
    duplicated windows merge into one span.  ``max_count`` optionally
    excludes grams more frequent than it (corpus stop-grams).

    ``plan='window'`` (default) filters occurrences with one
    ``COUNT(*) OVER (PARTITION BY gram_hash)`` pass: ONE gram-stream
    materialization + ONE shuffle, no join (measured 7x the join plan at
    sf0.1: 35s vs 241s).  Caveat: a window partition cannot be split, so
    a pathologically frequent gram lands on one task; ``plan='join'``
    (count-aggregate + dup-set join, gram stream computed twice) keeps
    AQE skew-join handling for corpora with degenerate padding runs —
    or exclude those via ``max_count`` and stay on the window plan.

    ``num_partitions`` pins the gram-hash exchange width (a
    REPARTITION_BY_NUM shuffle, which AQE never coalesces and the window
    reuses — no extra exchange).  The window sort buffers one gram
    partition per task, so this is the per-task memory knob: size it so
    total_grams/num_partitions rows (~60 B each) fit comfortably in one
    task's share of executor memory.  Default leaves the session's
    shuffle parallelism in charge."""
    grams = gram_positions(df, k, id_col, tok_col, fast)
    if num_partitions is not None:
        grams = grams.repartition(num_partitions, "gram_hash")
    if plan == "window":
        wc = Window.partitionBy("gram_hash")
        c = F.count(F.lit(1)).over(wc)
        pred = c >= min_count
        if max_count is not None:
            pred = pred & (c <= max_count)
        hits = grams.withColumn("_keep", pred).filter("_keep").select(id_col, "pos")
    elif plan == "join":
        counts = grams.groupBy("gram_hash").agg(F.count(F.lit(1)).alias("_cnt"))
        pred = F.col("_cnt") >= min_count
        if max_count is not None:
            pred = pred & (F.col("_cnt") <= max_count)
        hits = grams.join(
            counts.filter(pred).select("gram_hash"), "gram_hash"
        ).select(id_col, "pos")
    else:
        raise ValueError(f"dup_spans: unknown plan {plan!r}")

    w = Window.partitionBy(id_col).orderBy("pos")
    prev_end = F.max(F.col("pos") + k - 1).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    brk = F.when(
        prev_end.isNull() | (F.col("pos") > prev_end + 1), F.lit(1)
    ).otherwise(F.lit(0))
    islands = hits.withColumn(
        "_island", F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return islands.groupBy(id_col, "_island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + k - 1).cast("long").alias("span_end"),
    ).drop("_island")


def dup_span_stats(
    df: DataFrame,
    k: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    tok_col: str = "tokens",
    fast: bool = False,
    max_count: int | None = None,
    plan: str = "window",
    num_partitions: int | None = None,
) -> DataFrame:
    """One row per doc WITH duplicated content: (id, n_tok, n_spans,
    dup_tokens, dup_ratio) — the drop/trim list.  ``dup_ratio`` =
    dup_tokens / n_tok rounded to 6 places."""
    spans = dup_spans(
        df, k, min_count, id_col, tok_col, fast, max_count, plan, num_partitions
    )
    per_doc = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum(F.col("span_end") - F.col("span_start") + 1)
        .cast("long")
        .alias("dup_tokens"),
    )
    sizes = df.select(id_col, F.size(tok_col).cast("long").alias("n_tok"))
    return per_doc.join(sizes, id_col).select(
        id_col,
        "n_tok",
        "n_spans",
        "dup_tokens",
        F.round(F.col("dup_tokens") / F.col("n_tok"), 6).alias("dup_ratio"),
    )


def strip_dup_spans(
    df: DataFrame,
    k: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    tok_col: str = "tokens",
    fast: bool = False,
    max_count: int | None = None,
    plan: str = "window",
    num_partitions: int | None = None,
) -> DataFrame:
    """Remove every token inside a duplicated span: one row per input doc
    with (id, tokens, n_removed) — ``tokens`` is the cleaned array (empty,
    never NULL, when a doc was entirely duplicated), ``n_removed`` the
    token count stripped.  Removes ALL copies (deterministic; no
    keep-first tie-break, which would need a global occurrence order).

    Plan: the span list joins back LEFT (docs without spans pass through
    with an empty span array) and a positional HOF filter drops covered
    tokens — per-doc work, O(n_tok x n_spans) with n_spans small; no
    extra shuffle beyond :func:`dup_spans`."""
    spans = (
        dup_spans(
            df, k, min_count, id_col, tok_col, fast, max_count, plan, num_partitions
        )
        .groupBy(id_col)
        .agg(
            F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
        )
    )
    joined = df.select(id_col, tok_col).join(spans, id_col, "left")
    sp = F.coalesce(F.col("_spans"), F.array().cast(
        "array<struct<span_start:long,span_end:long>>"
    ))
    cleaned = F.filter(
        F.col(tok_col),
        lambda x, i: ~F.exists(
            sp, lambda s: (i + 1 >= s["span_start"]) & (i + 1 <= s["span_end"])
        ),
    )
    return joined.select(
        id_col,
        cleaned.alias(tok_col),
        (F.size(tok_col) - F.size(cleaned)).cast("long").alias("n_removed"),
    )


def sql_strip_dup_spans(
    corpus_sql: str,
    k: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    tok_col: str = "tokens",
    max_count: int | None = None,
) -> str:
    """DuckDB oracle for :func:`strip_dup_spans`: positions anti-join the
    duplicated-position set, then re-aggregate in position order."""
    extra = f"AND c <= {max_count}" if max_count is not None else ""
    return f"""
WITH corpus AS (
  SELECT * FROM {corpus_sql}
), g0 AS (
  SELECT {id_col}, {tok_col} AS t,
         unnest(range(1, len({tok_col}) - {k} + 2)) AS pos
  FROM corpus WHERE len({tok_col}) >= {k}
), g AS (
  SELECT {id_col}, pos, list_slice(t, pos, pos + {k} - 1) AS gram
  FROM g0
), hit AS (
  SELECT {id_col}, pos FROM (
    SELECT {id_col}, pos, COUNT(*) OVER (PARTITION BY gram) AS c FROM g
  ) WHERE c >= {min_count} {extra}
), covered AS (  -- every token position inside any duplicated window
  SELECT DISTINCT {id_col}, pos + off AS tpos
  FROM hit, (SELECT unnest(range(0, {k})) AS off)
), toks AS (
  SELECT {id_col}, unnest({tok_col}) AS tok,
         unnest(range(1, len({tok_col}) + 1)) AS tpos
  FROM corpus
), kept AS (
  SELECT t.{id_col}, t.tok, t.tpos
  FROM toks t ANTI JOIN covered c USING ({id_col}, tpos)
)
SELECT c.{id_col},
       COALESCE(k.toks, []) AS {tok_col},
       CAST(len(c.{tok_col}) - COALESCE(k.n, 0) AS BIGINT) AS n_removed
FROM corpus c
LEFT JOIN (
  SELECT {id_col}, list(tok ORDER BY tpos) AS toks, COUNT(*) AS n
  FROM kept GROUP BY {id_col}
) k USING ({id_col})
"""


def sql_dup_span_stats(
    corpus_sql: str,
    k: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    tok_col: str = "tokens",
    max_count: int | None = None,
) -> str:
    """DuckDB oracle: exact gram identity via grouping on the raw token
    SUBLIST (no hash, no string build — ground truth and ~4x faster than
    string grams: measured 86s vs 380s at sf0.01), occurrence counts via
    one window pass, same gaps-and-islands merge."""
    extra = f"AND c <= {max_count}" if max_count is not None else ""
    return f"""
WITH corpus AS (
  SELECT * FROM {corpus_sql}
), g0 AS (
  SELECT {id_col}, {tok_col} AS t,
         unnest(range(1, len({tok_col}) - {k} + 2)) AS pos
  FROM corpus WHERE len({tok_col}) >= {k}
), g AS (
  SELECT {id_col}, pos, list_slice(t, pos, pos + {k} - 1) AS gram
  FROM g0
), hit AS (
  SELECT {id_col}, pos FROM (
    SELECT {id_col}, pos, COUNT(*) OVER (PARTITION BY gram) AS c FROM g
  ) WHERE c >= {min_count} {extra}
), isl AS (
  SELECT {id_col}, pos,
         CASE WHEN pos > COALESCE(MAX(pos + {k} - 1) OVER (
                  PARTITION BY {id_col} ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
              THEN 1 ELSE 0 END AS brk
  FROM hit
), isl2 AS (
  SELECT {id_col}, pos,
         SUM(brk) OVER (PARTITION BY {id_col} ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM isl
), spans AS (
  SELECT {id_col}, island, MIN(pos) AS s, MAX(pos) + {k} - 1 AS e
  FROM isl2 GROUP BY {id_col}, island
), stats AS (
  SELECT {id_col}, CAST(COUNT(*) AS BIGINT) AS n_spans,
         CAST(SUM(e - s + 1) AS BIGINT) AS dup_tokens
  FROM spans GROUP BY {id_col}
)
SELECT s.{id_col},
       CAST(len(c.{tok_col}) AS BIGINT) AS n_tok,
       s.n_spans,
       s.dup_tokens,
       ROUND(CAST(s.dup_tokens AS DOUBLE) / len(c.{tok_col}), 6) AS dup_ratio
FROM stats s JOIN corpus c USING ({id_col})
"""
