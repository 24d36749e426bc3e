"""Benchmark decontamination: flag training docs whose token n-grams
overlap a benchmark/eval set.

Standard practice before pre-training (the n-gram membership test used by
public LLM reports — e.g. GPT-3 appendix C / PaLM / Llama use 8-13-gram
overlap): every doc is scored by how many of its token n-grams appear in
the benchmark set; docs above a threshold are dropped.  Distinct from the
dedup family (`dedup.py`): this is a semi-join against a *reference* set,
not corpus self-similarity.  The reference repo is a log pipeline and has
no such operator; LLM-data-pipeline extension alongside SURVEY.md §2.

Scale design:

- The benchmark n-gram set is small (|eval suites| ≪ corpus): it
  **broadcasts**, so the corpus-side exploded n-grams are filtered
  map-side by a broadcast hash semi-join — the only exchange carries the
  per-doc HIT counts (rows ≤ |matched grams|, almost always ≈ 0% of the
  corpus), never the O(tokens) gram stream.
- Per-doc gram totals come from a narrow `size()` projection, no explode.
- Gram identity is the pinned portable hash (md5 of the comma-joined
  gram) so the oracle reproduces the exact set in DuckDB; a production
  twin would swap in codegen `xxhash64` (same plan shape, no oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_spark.hashing import portable_hash64, portable_hash64_sql


def _gram_strings(tok_col: str, n: int) -> Column:
    """array<string> of the comma-joined token ``n``-grams (empty when the
    doc is shorter than ``n``; guards Spark's descending-sequence trap)."""
    size = F.size(tok_col)
    return F.when(
        size >= n,
        F.transform(
            F.sequence(F.lit(1), size - n + 1),
            lambda i: F.array_join(F.slice(F.col(tok_col), i, n), ","),
        ),
    ).otherwise(F.array().cast("array<string>"))


def token_ngram_hashes(
    df: DataFrame, n: int = 8, id_col: str = "doc_id", tok_col: str = "tokens"
) -> DataFrame:
    """(id, gram_hash) — one row per token n-gram occurrence (the
    oracle-reproducible md5-of-joined-string form)."""
    return df.select(
        id_col, F.explode(_gram_strings(tok_col, n)).alias("_g")
    ).select(id_col, portable_hash64(F.col("_g")).alias("gram_hash"))


_ROLL_B = 0x100000001B3  # FNV-64 prime; any odd 64-bit multiplier works
_U64 = (1 << 64) - 1


def _rolling_hashes(flat, lens, n):
    """uint64 polynomial hashes of every in-row n-gram over the
    concatenated token stream ``flat`` (rows of lengths ``lens``).
    Returns (hashes_of_valid_positions, row_index_of_valid_positions) —
    fully vectorized; wraparound uint64 arithmetic."""
    import numpy as np

    L0 = len(flat) - n + 1
    if L0 <= 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    flat = flat.astype(np.uint64, copy=False)
    acc = np.zeros(L0, np.uint64)
    b = 1
    for j in range(n - 1, -1, -1):  # acc = sum tok[p+j] * B^(n-1-j)
        acc += flat[j : j + L0] * np.uint64(b)
        b = (b * _ROLL_B) & _U64  # Python-int modular step: no scalar-overflow warning
    rowidx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    valid = rowidx[:L0] == rowidx[n - 1 : n - 1 + L0]
    return acc[valid], rowidx[:L0][valid]


def _decontaminate_broadcast(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int,
    id_col: str,
    tok_col: str,
) -> DataFrame:
    """Production path: the benchmark gram set (small by definition)
    broadcasts into an Arrow-batched numpy scorer — no gram explode, no
    join, no shuffle; output is (id, n_grams, hits) for hit docs only.
    Gram identity is a 64-bit polynomial rolling hash (collision odds
    ~1e-19 per pair); the md5 twin shares the same hit semantics.

    Uses ``mapInArrow``, not ``mapInPandas``: the Arrow ListArray hands
    the scorer its flat token-values buffer and offsets zero-copy, so
    there is NO per-row Python conversion.  (Measured: the per-row
    ``np.asarray``+``concatenate`` idiom costs ~340 µs/row — 204 s for
    600 k docs single-core — vs one vectorized ``astype`` over the flat
    buffer here.)"""
    import numpy as np

    rows = benchmark.select(tok_col).collect()
    hs = []
    for r in rows:
        t = np.asarray(r[tok_col] or [], dtype=np.uint64)
        h, _ = _rolling_hashes(t, np.array([len(t)]), n)
        hs.append(h)
    bench_arr = np.unique(np.concatenate(hs)) if hs else np.empty(0, np.uint64)
    bc = corpus.sparkSession.sparkContext.broadcast(bench_arr)

    def score(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        from vector_spark.arena import warm_numpy_arena

        warm_numpy_arena()
        bench = bc.value
        out_schema = pa.schema(
            [(id_col, pa.string()), ("n_grams", pa.int64()), ("hits", pa.int64())]
        )
        for batch in batches:
            if batch.num_rows == 0:
                continue
            toks = batch.column(tok_col)
            # zero-copy flat values + per-row lengths from the list offsets
            lens = pc.fill_null(pc.list_value_length(toks), 0).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            flat = toks.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
            if not len(flat):
                continue
            h, rows_of = _rolling_hashes(flat, lens, n)
            # membership via Arrow's hash is_in kernel — measured 3.9x
            # faster than searchsorted binary probes on this host (0.17s
            # vs 0.67s per 4.7M probes against a 110k set), and both beat
            # np.isin's per-batch sort of the concatenation
            if len(bench):
                member = (
                    pc.is_in(pa.array(h), value_set=pa.array(bench))
                    .to_numpy(zero_copy_only=False)
                )
            else:
                member = np.zeros(len(h), bool)
            hits = np.bincount(rows_of[member], minlength=batch.num_rows)
            keep = np.nonzero(hits > 0)[0]
            if not len(keep):
                continue
            yield pa.RecordBatch.from_arrays(
                [
                    pc.take(batch.column(id_col), pa.array(keep)),
                    pa.array(np.maximum(lens - n + 1, 0)[keep]),
                    pa.array(hits[keep]),
                ],
                schema=out_schema,
            )

    out = corpus.select(id_col, tok_col).mapInArrow(
        score, schema=f"{id_col} string, n_grams long, hits long"
    )
    return out.select(
        id_col,
        "n_grams",
        "hits",
        F.round(F.col("hits") / F.col("n_grams"), 6).alias("frac"),
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    tok_col: str = "tokens",
    fast: bool = False,
) -> DataFrame:
    """Per-doc contamination score against ``benchmark``'s n-gram set.

    Returns (id, n_grams, hits, frac) for docs with at least one hit —
    the drop-list.  ``frac`` = hits / n_grams, rounded to 6 places.
    ``fast=True`` switches to the broadcast numpy scorer (production
    path); the default md5 form is the oracle twin.
    """
    if fast:
        return _decontaminate_broadcast(corpus, benchmark, n, id_col, tok_col)
    bench_set = (
        token_ngram_hashes(benchmark, n, id_col, tok_col)
        .select("gram_hash")
        .distinct()
    )
    grams = token_ngram_hashes(corpus, n, id_col, tok_col)
    hits = (
        grams.join(F.broadcast(bench_set), "gram_hash")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("hits"))
    )
    totals = corpus.select(
        id_col,
        F.greatest(F.size(tok_col) - n + 1, F.lit(0)).cast("long").alias("n_grams"),
    )
    return (
        hits.join(totals, id_col)
        .select(
            id_col,
            "n_grams",
            "hits",
            F.round(F.col("hits") / F.col("n_grams"), 6).alias("frac"),
        )
    )


def sql_decontaminate(
    corpus_sql: str,
    benchmark_sql: str,
    n: int = 8,
    id_col: str = "doc_id",
    tok_col: str = "tokens",
) -> str:
    """DuckDB oracle: same n-gram membership test via list slicing."""
    gh = portable_hash64_sql("g")
    return f"""
WITH corpus AS (
  SELECT * FROM {corpus_sql}
), bench AS (
  SELECT * FROM {benchmark_sql}
), cg0 AS (
  -- range() is not lateral-joinable in DuckDB; unnest it in the SELECT list
  SELECT {id_col}, {tok_col} AS t,
         unnest(range(1, len({tok_col}) - {n} + 2)) AS i
  FROM corpus WHERE len({tok_col}) >= {n}
), cg AS (
  SELECT {id_col}, array_to_string(list_slice(t, i, i + {n} - 1), ',') AS g
  FROM cg0
), bg0 AS (
  SELECT {tok_col} AS t, unnest(range(1, len({tok_col}) - {n} + 2)) AS i
  FROM bench WHERE len({tok_col}) >= {n}
), bg AS (
  SELECT DISTINCT {gh} AS gram_hash FROM (
    SELECT array_to_string(list_slice(t, i, i + {n} - 1), ',') AS g FROM bg0
  )
), hits AS (
  SELECT cg.{id_col}, CAST(COUNT(*) AS BIGINT) AS hits
  FROM cg JOIN bg ON {gh} = bg.gram_hash
  GROUP BY cg.{id_col}
)
SELECT h.{id_col},
       CAST(GREATEST(len(c.{tok_col}) - {n} + 1, 0) AS BIGINT) AS n_grams,
       h.hits,
       ROUND(CAST(h.hits AS DOUBLE) / GREATEST(len(c.{tok_col}) - {n} + 1, 0), 6) AS frac
FROM hits h JOIN corpus c ON h.{id_col} = c.{id_col}
"""


def sql_decontaminate_exact(
    corpus_sql: str,
    benchmark_sql: str,
    n: int = 8,
    id_col: str = "doc_id",
    tok_col: str = "tokens",
) -> str:
    """Oracle twin of the PRODUCTION rolling-hash scorer
    (``decontaminate(fast=True)``): membership is tested on the EXACT
    comma-joined gram strings — no hash function at all — so the oracle
    is strictly stronger than the md5 variant (a rolling-hash collision
    on the Spark side would surface as a hits mismatch here).  It is
    also ~an order of magnitude cheaper than md5-ing every gram, which
    kept the old contract query 18x slower than its peers at driver
    scale (VERDICT r3 Next #8)."""
    return f"""
WITH corpus AS (
  SELECT * FROM {corpus_sql}
), bench AS (
  SELECT * FROM {benchmark_sql}
), cg0 AS (
  SELECT {id_col}, {tok_col} AS t,
         unnest(range(1, len({tok_col}) - {n} + 2)) AS i
  FROM corpus WHERE len({tok_col}) >= {n}
), cg AS (
  SELECT {id_col}, array_to_string(list_slice(t, i, i + {n} - 1), ',') AS g
  FROM cg0
), bg0 AS (
  SELECT {tok_col} AS t, unnest(range(1, len({tok_col}) - {n} + 2)) AS i
  FROM bench WHERE len({tok_col}) >= {n}
), bg AS (
  SELECT DISTINCT array_to_string(list_slice(t, i, i + {n} - 1), ',') AS g
  FROM bg0
), hits AS (
  SELECT cg.{id_col}, CAST(COUNT(*) AS BIGINT) AS hits
  FROM cg JOIN bg USING (g)
  GROUP BY cg.{id_col}
)
SELECT h.{id_col},
       CAST(GREATEST(len(c.{tok_col}) - {n} + 1, 0) AS BIGINT) AS n_grams,
       h.hits,
       ROUND(CAST(h.hits AS DOUBLE) / GREATEST(len(c.{tok_col}) - {n} + 1, 0), 6) AS frac
FROM hits h JOIN corpus c ON h.{id_col} = c.{id_col}
"""
