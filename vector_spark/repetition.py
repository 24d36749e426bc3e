"""Gopher-style repetition signals over token sequences.

Per-document n-gram repetition statistics used as pre-training quality
filters (the "repetition" family of Rao et al.'s Gopher paper, adapted
from characters/words to token ids — this corpus IS pre-tokenized, per
the input contract):

- ``dup_unigram_frac``: fraction of token occurrences that are repeats
  of a token already seen in the doc (= 1 - distinct/total).
- ``top_bigram_frac``: fraction of bigram occurrences taken by the
  single most frequent bigram.
- ``dup_5gram_frac``: fraction of 5-gram occurrences whose 5-gram
  appears more than once in the doc.

The reference repo is a log pipeline with no such operator; this is an
LLM-data-pipeline extension alongside SURVEY.md §2 (same family as
``textstats.py`` / ``decontam.py``).

Scale design: all statistics are PER-DOCUMENT, so the production path is
a single ``mapInArrow`` pass — the Arrow ListArray hands the kernel its
flat token buffer + offsets ZERO-COPY (no per-row Python conversion; see
``decontam.py`` for the measured 340 µs/row cost of the per-row idiom),
and every n-gram count comes out of one hash-grouping pass per n (Arrow
``dictionary_encode`` over the row-mixed gram hash — no numpy sort; see
``_per_row_gram_counts``).
No explode, no join, no shuffle; output is one row per doc.  Gram
identity within a doc is the 64-bit polynomial rolling hash of
``decontam._rolling_hashes`` (n=1 reduces to the token value itself, so
unigram stats are exact; for n>1 an in-doc collision needs two of ~10^3
grams to meet in 2^64 — odds ~1e-13, and deterministic given the data).

Fraction arithmetic happens OUTSIDE the kernel in Spark SQL (and the
DuckDB oracle) so both engines share one ROUND semantics; the kernel
emits exact integer counts only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_spark.decontam import _rolling_hashes

_NS = (1, 2, 5)  # unigram / bigram / 5-gram, per the Gopher signal set


def _per_row_gram_counts(flat, lens, n, n_rows, need=("distinct", "top", "dup")):
    """(total, distinct, top, dup) int64 arrays of length ``n_rows``:
    per row, the total n-gram occurrences, distinct n-grams, the count of
    the most frequent n-gram, and the summed occurrences of n-grams that
    occur more than once.

    Grouping by (row, gram) is HASH-based — the row index is mixed into
    the gram hash and the combined key grouped with Arrow's
    ``dictionary_encode`` hash kernel — not a ``lexsort``: concurrent
    numpy sorts over the full gram stream collapse ~10x on SMT hosts
    (same finding as vocab.py / lm.py, measured in BENCH.md).  A cross-row
    key collision needs two of the batch's ~10^6 grams to meet in 2^64
    (odds ~1e-7 per batch, deterministic given the data; the DuckDB
    oracle recomputes from exact grams, so any collision surfaces as a
    mismatch).  ``need`` skips the statistics the caller discards."""
    import numpy as np
    import pyarrow as pa

    h, rows_of = _rolling_hashes(flat, lens, n)
    total = np.bincount(rows_of, minlength=n_rows)
    z = np.zeros(n_rows, np.int64)
    if not len(h):
        return total, z.copy(), z.copy(), z.copy()
    key = h + rows_of.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    enc = pa.array(key).dictionary_encode()
    codes = enc.indices.to_numpy().astype(np.int64, copy=False)
    n_grp = len(enc.dictionary)
    rows_grp = np.zeros(n_grp, np.int64)
    rows_grp[codes] = rows_of  # every member of a group shares one row
    distinct = (
        np.bincount(rows_grp, minlength=n_rows) if "distinct" in need else z
    )
    if "top" in need or "dup" in need:
        counts = np.bincount(codes)
    top = z
    if "top" in need:
        top = np.zeros(n_rows, np.int64)
        np.maximum.at(top, rows_grp, counts)
    dup = z
    if "dup" in need:
        dup = np.bincount(
            rows_grp, weights=counts * (counts > 1), minlength=n_rows
        ).astype(np.int64)
    return total, distinct, top, dup


def repetition_signals(
    df: DataFrame, id_col: str = "doc_id", tok_col: str = "tokens"
) -> DataFrame:
    """One row per doc: (id, n_tok, dup_unigram_frac, top_bigram_frac,
    dup_5gram_frac); a fraction is NULL when the doc is too short to have
    any n-gram of that order (ANSI-safe — no division by zero reaches the
    engine)."""

    def kernel(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        from vector_spark.arena import warm_numpy_arena

        warm_numpy_arena()
        out_schema = pa.schema(
            [(id_col, pa.string()), ("n_tok", pa.int64())]
            + [(f"_t{n}", pa.int64()) for n in _NS]
            + [("_d1", pa.int64()), ("_top2", pa.int64()), ("_dup5", pa.int64())]
        )
        for batch in batches:
            if batch.num_rows == 0:
                continue
            toks = batch.column(tok_col)
            lens = pc.fill_null(pc.list_value_length(toks), 0).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            flat = toks.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
            r = batch.num_rows
            t1, d1, _, _ = _per_row_gram_counts(flat, lens, 1, r, need=("distinct",))
            t2, _, top2, _ = _per_row_gram_counts(flat, lens, 2, r, need=("top",))
            t5, _, _, dup5 = _per_row_gram_counts(flat, lens, 5, r, need=("dup",))
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(id_col),
                    pa.array(lens),
                    pa.array(t1),
                    pa.array(t2),
                    pa.array(t5),
                    pa.array(d1),
                    pa.array(top2),
                    pa.array(dup5),
                ],
                schema=out_schema,
            )

    counts = df.select(id_col, tok_col).mapInArrow(
        kernel,
        schema=(
            f"{id_col} string, n_tok long, _t1 long, _t2 long, _t5 long,"
            " _d1 long, _top2 long, _dup5 long"
        ),
    )

    def frac(num, den):
        return F.when(
            F.col(den) > 0, F.round(num.cast("double") / F.col(den), 6)
        )

    return counts.select(
        id_col,
        "n_tok",
        frac(F.col("_t1") - F.col("_d1"), "_t1").alias("dup_unigram_frac"),
        frac(F.col("_top2"), "_t2").alias("top_bigram_frac"),
        frac(F.col("_dup5"), "_t5").alias("dup_5gram_frac"),
    )


def sql_repetition_signals(
    corpus_sql: str, id_col: str = "doc_id", tok_col: str = "tokens"
) -> str:
    """DuckDB oracle: identical statistics from exact (not hashed) grams
    via list_slice — any in-doc hash collision in the Spark kernel would
    surface here as a mismatch."""

    def gram_cte(n: int, tag: str) -> str:
        if n == 1:
            return (
                f"g{tag} AS (SELECT {id_col}, CAST(unnest({tok_col}) AS VARCHAR)"
                f" AS g FROM corpus)"
            )
        return f"""g{tag}0 AS (
  SELECT {id_col}, {tok_col} AS t,
         unnest(range(1, len({tok_col}) - {n} + 2)) AS i
  FROM corpus WHERE len({tok_col}) >= {n}
), g{tag} AS (
  SELECT {id_col}, array_to_string(list_slice(t, i, i + {n} - 1), ',') AS g
  FROM g{tag}0
)"""

    return f"""
WITH corpus AS (
  SELECT * FROM {corpus_sql}
), {gram_cte(1, '1')}, {gram_cte(2, '2')}, {gram_cte(5, '5')},
s1 AS (SELECT {id_col}, g, COUNT(*) AS c FROM g1 GROUP BY 1, 2),
s2 AS (SELECT {id_col}, g, COUNT(*) AS c FROM g2 GROUP BY 1, 2),
s5 AS (SELECT {id_col}, g, COUNT(*) AS c FROM g5 GROUP BY 1, 2),
a1 AS (SELECT {id_col}, CAST(SUM(c) AS BIGINT) AS t1, COUNT(*) AS d1
       FROM s1 GROUP BY 1),
a2 AS (SELECT {id_col}, CAST(SUM(c) AS BIGINT) AS t2, CAST(MAX(c) AS BIGINT) AS top2
       FROM s2 GROUP BY 1),
a5 AS (SELECT {id_col}, CAST(SUM(c) AS BIGINT) AS t5,
       CAST(COALESCE(SUM(CASE WHEN c > 1 THEN c END), 0) AS BIGINT) AS dup5
       FROM s5 GROUP BY 1)
SELECT c.{id_col},
       CAST(len(c.{tok_col}) AS BIGINT) AS n_tok,
       CASE WHEN a1.t1 > 0
            THEN ROUND(CAST(a1.t1 - a1.d1 AS DOUBLE) / a1.t1, 6) END
         AS dup_unigram_frac,
       CASE WHEN a2.t2 > 0
            THEN ROUND(CAST(a2.top2 AS DOUBLE) / a2.t2, 6) END
         AS top_bigram_frac,
       CASE WHEN a5.t5 > 0
            THEN ROUND(CAST(a5.dup5 AS DOUBLE) / a5.t5, 6) END
         AS dup_5gram_frac
FROM corpus c
LEFT JOIN a1 ON c.{id_col} = a1.{id_col}
LEFT JOIN a2 ON c.{id_col} = a2.{id_col}
LEFT JOIN a5 ON c.{id_col} = a5.{id_col}
"""
