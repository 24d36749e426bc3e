"""BM25 top-k retrieval over the pre-tokenized corpus.

A training-data curation primitive: rank documents against a small set
of query token ids (Robertson/Okapi BM25, the Lucene-default variant
``idf = ln(1 + (N - df + 0.5)/(df + 0.5))``).  Used for targeted corpus
audits ("which documents score highest for these probe tokens") and as
the retrieval half of contamination triage next to
``decontam.decontaminate``.

Plan (all whole-stage codegen — no UDF, no HOF lambda in the hot path):

1. one tiny stats aggregate over the corpus: ``N`` (docs), ``avgdl``
   (mean ``n_tok``), and per-term document frequencies via
   ``array_contains`` — a single reduce to ONE row regardless of corpus
   size, broadcast back with a cross join;
2. candidate prefilter ``arrays_overlap(tokens, terms)`` so only docs
   containing at least one query term reach scoring (uniform-vocab
   corpora keep this at |Q|·N/|V| docs);
3. per-term tf as ``n_tok - size(array_remove(tokens, t))`` — JVM
   codegen array kernels, NOT ``filter(tokens, x -> x = t)`` which is an
   interpreted higher-order lambda per element;
4. global top-k = ``orderBy(score desc, doc_id).limit(k)`` →
   TakeOrderedAndProject (per-partition heaps then a k-row merge — no
   full sort, no single-reducer shuffle).

At 10^12 docs the only data-bearing exchanges are the 1-row stats
reduce and the k-row top-k merge; scoring is a narrow map over the
prefiltered candidates.

The ``sql_bm25_topk`` twin emits the SAME expression tree for DuckDB
(left-fold term sum, identical literal placement) so the two engines
agree bit-for-bit on IEEE doubles; the contract layer rounds to 6
decimals anyway.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F


def _fmt(x: float) -> str:
    """Exact float literal shared by both engines."""
    return repr(float(x))


def bm25_topk(
    df: DataFrame,
    terms: list[int],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    doc_col: str = "doc_id",
    tok_col: str = "tokens",
    n_col: str = "n_tok",
) -> DataFrame:
    """Top-``k`` documents by BM25 score for query token ids ``terms``.

    Returns (doc_id, score) ordered by score desc, doc_id asc (explicit
    deterministic tiebreak).  Documents containing none of the terms are
    pruned before scoring and can never appear in the result (their
    score would be 0).
    """
    if not terms:
        raise ValueError("bm25_topk: empty term set")
    tok, dl = F.col(tok_col), F.col(n_col).cast("double")

    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(n_col).alias("avgdl"),
    ] + [
        F.sum(F.array_contains(tok, t).cast("long")).alias(f"df_{i}")
        for i, t in enumerate(terms)
    ]
    stats = df.agg(*aggs)

    cand = df.filter(
        F.arrays_overlap(tok, F.array(*[F.lit(t) for t in terms]))
    ).select(doc_col, tok_col, n_col)

    scored = cand.crossJoin(F.broadcast(stats))
    k1p1, one_minus_b, blit, k1lit = (
        F.lit(k1 + 1.0), F.lit(1.0 - b), F.lit(b), F.lit(k1),
    )
    per_term = []
    for i, t in enumerate(terms):
        tf = (F.col(n_col) - F.size(F.array_remove(tok, t))).cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col(f"df_{i}") + F.lit(0.5))
            / (F.col(f"df_{i}") + F.lit(0.5))
        )
        per_term.append(
            idf * ((tf * k1p1) / (tf + k1lit * (one_minus_b + blit * (dl / F.col("avgdl")))))
        )
    score = reduce(lambda a, c: a + c, per_term)
    return (
        scored.select(F.col(doc_col).alias("doc_id"), score.alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def sql_bm25_topk(
    corpus_sql: str,
    terms: list[int],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB twin of :func:`bm25_topk` over ``corpus_sql``
    (a relation with doc_id, tokens, n_tok) — the same expression tree,
    so float results match the Spark plan exactly."""
    dfs = ",\n         ".join(
        f"count(*) FILTER (WHERE list_contains(tokens, {t}))::BIGINT AS df_{i}"
        for i, t in enumerate(terms)
    )
    k1p1, omb = _fmt(k1 + 1.0), _fmt(1.0 - b)
    blit, k1lit = _fmt(b), _fmt(k1)
    parts = []
    for i, t in enumerate(terms):
        tf = f"(c.n_tok - len(list_filter(c.tokens, x -> x <> {t})))::DOUBLE"
        idf = f"ln(1.0 + (s.n_docs - s.df_{i} + 0.5) / (s.df_{i} + 0.5))"
        parts.append(
            f"{idf} * (({tf} * {k1p1}) / ({tf} + {k1lit} * "
            f"({omb} + {blit} * (CAST(c.n_tok AS DOUBLE) / s.avgdl))))"
        )
    score = " + ".join(f"({p})" for p in parts)
    term_list = "[" + ", ".join(str(t) for t in terms) + "]"
    return f"""
WITH stats AS (
  SELECT count(*)::BIGINT AS n_docs,
         avg(n_tok) AS avgdl,
         {dfs}
  FROM {corpus_sql}
)
SELECT c.doc_id, {score} AS score
FROM {corpus_sql} c CROSS JOIN stats s
WHERE list_has_any(c.tokens, {term_list})
ORDER BY score DESC, c.doc_id ASC
LIMIT {k}
"""
