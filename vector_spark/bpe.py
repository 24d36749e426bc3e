"""Exact BPE merge application + training over pre-tokenized sequences.

`vocab.py::token_pair_stats` is one iteration of the public BPE
algorithm's COUNT step (Sennrich et al. 2016, "count all adjacent symbol
pairs, merge the most frequent").  This module adds the other half:

- :func:`apply_merges` — apply a learned, priority-ordered merge list to
  the whole corpus exactly (leftmost-greedy within each document, the
  standard BPE encode order).  The retokenization pass every vocabulary
  migration runs.
- :func:`train_bpe` — the iterative trainer: each round re-counts pairs
  *with the merges-so-far applied on the fly inside the count kernel*, so
  a round is ONE corpus scan + an O(distinct pairs) exchange + a 1-row
  TakeOrdered — no intermediate corpus is ever materialized and no
  lineage chain grows (each round re-reads the immutable source).

The reference repo is a log pipeline with no tokenizer surface; this is
an LLM-data-pipeline extension in the same family as `vocab.py` /
`packing.py`.  Its closest reference idiom is the iterative-reduce shape
of `transforms/reduce` (merge state folded over a stream) — here folded
over merge rounds instead of events.

Scale design (10^12-token corpus): `apply_merges` is a zero-copy Arrow
kernel over the flat token buffer — per merge one vectorized
candidate-mask + overlap-parity pass (overlapping candidates only occur
for self-pairs a==b, resolved leftmost-first by keeping even offsets
within runs), O(M·n) work, no join, no shuffle, document boundaries
respected via the row-index mask.  Training at this scale runs the same
kernel on a deterministic hash-sample of the corpus (pair ranks converge
long before 1% of 10^12 tokens); each round's exchange carries only
per-batch distinct-pair partials.  A merge can never create a new
occurrence of ITSELF (its output id is fresh), so one left-to-right pass
per merge is exact — the property that makes the vectorized pass correct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _apply_merges_np(flat, rowidx, merges):
    """Apply priority-ordered merges [(a, b, new_id), ...] to a flat token
    buffer with per-position row indices.  Returns (flat, rowidx) after
    all merges; leftmost-greedy per document, exact."""
    import numpy as np

    for a, b, c in merges:
        if len(flat) < 2:
            break
        cand = (flat[:-1] == a) & (flat[1:] == b) & (rowidx[:-1] == rowidx[1:])
        idx = np.flatnonzero(cand)
        if not len(idx):
            continue
        # overlapping candidates (only possible when a == b, e.g. [a,a,a])
        # resolve leftmost-first: keep even offsets within each run of
        # consecutive candidate positions
        run_start = np.empty(len(idx), dtype=bool)
        run_start[0] = True
        run_start[1:] = idx[1:] != idx[:-1] + 1
        run_first = idx[run_start][np.cumsum(run_start) - 1]
        kidx = idx[((idx - run_first) % 2) == 0]
        flat[kidx] = c
        keep_mask = np.ones(len(flat), dtype=bool)
        keep_mask[kidx + 1] = False
        flat = flat[keep_mask]
        rowidx = rowidx[keep_mask]
    return flat, rowidx


def apply_merges(
    df: DataFrame,
    merges: list[tuple[int, int, int]],
    id_col: str = "doc_id",
    tok_col: str = "tokens",
) -> DataFrame:
    """Exact BPE encode: apply ``merges`` — a priority-ordered list of
    (left, right, new_id) — to every document, leftmost-greedy, never
    across document boundaries.  Returns (id_col, tok_col as array<long>,
    n_tok) with ``n_tok`` the post-merge length.  One narrow corpus pass:
    the merge list ships in the task closure (M is vocabulary-sized, i.e.
    tiny), the kernel is pure numpy over the zero-copy flat buffer."""
    from vector_spark.vocab import _flat_tokens

    merges_t = [(int(a), int(b), int(c)) for a, b, c in merges]

    def kernel(batches):
        import numpy as np
        import pyarrow as pa

        from vector_spark.arena import warm_numpy_arena

        warm_numpy_arena()
        schema = pa.schema(
            [
                (id_col, pa.string()),
                (tok_col, pa.list_(pa.int64())),
                ("n_tok", pa.int64()),
            ]
        )
        for batch in batches:
            if batch.num_rows == 0:
                continue
            flat, rowidx = _flat_tokens(batch, tok_col)
            flat, rowidx = _apply_merges_np(flat.copy(), rowidx, merges_t)
            lens = np.bincount(rowidx, minlength=batch.num_rows).astype(np.int64)
            offsets = np.zeros(batch.num_rows + 1, dtype=np.int32)
            np.cumsum(lens, out=offsets[1:])
            toks = pa.ListArray.from_arrays(
                pa.array(offsets), pa.array(flat, type=pa.int64())
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column(id_col).cast(pa.string()), toks, pa.array(lens)],
                schema=schema,
            )

    return df.select(id_col, tok_col).mapInArrow(
        kernel, schema=f"{id_col} string, {tok_col} array<long>, n_tok long"
    )


def train_bpe(
    df: DataFrame,
    n_merges: int,
    new_id_start: int,
    tok_col: str = "tokens",
    min_count: int = 2,
) -> list[tuple[int, int, int]]:
    """Learn ``n_merges`` BPE merges from the corpus.  Round i counts all
    adjacent pairs WITH merges 0..i-1 applied on the fly (inside the same
    Arrow kernel as :func:`apply_merges`), then takes the most frequent
    pair — ties broken (t1, t2) asc so training is deterministic under
    any partitioning.  Stops early when the best pair's count falls below
    ``min_count``.  Returns [(left, right, new_id), ...] in priority
    order; merge i mints ``new_id_start + i``.

    Each round: one corpus scan, an exchange of O(distinct pairs/batch)
    partial counts, and a 1-row TakeOrdered to the driver.  For 10^12
    tokens, pass a hash-sampled ``df`` — ranks converge on a fraction of
    the stream."""
    merges: list[tuple[int, int, int]] = []
    for i in range(n_merges):
        # pairs touching the pre-token boundary sentinel (byte_tokenize_gpt2)
        # are never merge candidates — merges must not cross pieces
        best = _pair_counts_after(df, merges, tok_col).filter(
            (F.col("t1") >= 0) & (F.col("t2") >= 0)
        ).orderBy(
            F.desc("n_occ"), F.asc("t1"), F.asc("t2")
        ).limit(1).collect()
        if not best or int(best[0]["n_occ"]) < min_count:
            break
        merges.append(
            (int(best[0]["t1"]), int(best[0]["t2"]), new_id_start + i)
        )
    return merges


def _pair_counts_after(
    df: DataFrame, merges: list[tuple[int, int, int]], tok_col: str
) -> DataFrame:
    """(t1, t2, n_occ) over the corpus with ``merges`` applied on the fly
    — the trainer's count step; same per-batch np.unique pre-aggregation
    as `vocab.token_pair_stats(fast=True)`."""
    from vector_spark.vocab import _flat_tokens

    merges_t = [(int(a), int(b), int(c)) for a, b, c in merges]

    def kernel(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        from vector_spark.arena import warm_numpy_arena

        warm_numpy_arena()
        schema = pa.schema(
            [("t1", pa.int64()), ("t2", pa.int64()), ("_occ", pa.int64())]
        )
        for batch in batches:
            if batch.num_rows == 0:
                continue
            flat, rowidx = _flat_tokens(batch, tok_col)
            flat, rowidx = _apply_merges_np(flat.copy(), rowidx, merges_t)
            if len(flat) < 2:
                continue
            same = rowidx[:-1] == rowidx[1:]
            t1, t2 = flat[:-1][same], flat[1:][same]
            if not len(t1):
                continue
            key = (t1 << np.int64(32)) | (t2 & np.int64(0xFFFFFFFF))
            # hash-counted (pc.value_counts), not np.unique — concurrent
            # numpy sorts collapse ~10x on SMT hosts (see lm.py)
            vc = pc.value_counts(pa.array(key))
            ku = vc.field("values").to_numpy()
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ku >> np.int64(32)),
                    pa.array((ku << np.int64(32)) >> np.int64(32)),
                    vc.field("counts").cast(pa.int64()),
                ],
                schema=schema,
            )

    partials = df.select(tok_col).mapInArrow(
        kernel, schema="t1 long, t2 long, _occ long"
    )
    return partials.groupBy("t1", "t2").agg(
        F.sum("_occ").cast("long").alias("n_occ")
    )


def byte_tokenize(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "tokens",
) -> DataFrame:
    """Raw text → UTF-8 byte ids (0..255): the GPT-2-style byte-level
    entry point that feeds :func:`apply_merges` / :func:`train_bpe`, so
    the tokenizer story runs end-to-end from a raw ``documents`` table —
    text → bytes → learned merges → ids — with no Python in the plan.

    Implementation is pure codegen: ``encode(text,'UTF-8') → hex →
    regexp_extract_all('..') → conv(·,16,10)``.  Every byte becomes one
    int; empty/NULL text becomes an empty array.  DuckDB twin:
    :func:`sql_byte_tokenize` (bit-identical on any UTF-8 input — both
    engines hex the same byte stream)."""
    hexs = F.hex(F.encode(F.coalesce(F.col(text_col), F.lit("")), "UTF-8"))
    pairs = F.regexp_extract_all(hexs, F.lit("(..)"), 1)
    toks = F.transform(pairs, lambda x: F.conv(x, 16, 10).cast("int"))
    return df.withColumn(out_col, toks)


def sql_byte_tokenize(text_expr: str) -> str:
    """DuckDB rendering of :func:`byte_tokenize` for oracle SQL (an
    expression yielding ``array<int>`` of UTF-8 bytes)."""
    return (
        f"list_transform(regexp_extract_all(hex(encode(COALESCE({text_expr}, ''))), "
        f"'..'), x -> ('0x' || x)::INT)"
    )


# The public GPT-2 pre-tokenization split (OpenAI gpt-2 encoder.py /
# tiktoken's r50k pattern): contractions, space-glued letter runs, digit
# runs, punctuation runs, then whitespace (a run keeps its last space for
# the following token via the lookahead).  Java regex supports \p{L}/\p{N}
# and lookahead, so the split is PURE CODEGEN on the Spark side — no
# Python, no Arrow batch.
GPT2_PRETOKEN_PATTERN = (
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"
    r"|\s+(?!\S)|\s+"
)

PIECE_BOUNDARY = -1  # sentinel token between pre-token pieces


def gpt2_pretokenize(
    df: DataFrame, text_col: str = "text", out_col: str = "pieces"
) -> DataFrame:
    """Split text into GPT-2 pre-tokens (``array<string>``).  The pattern
    tiles the input — every character lands in exactly one piece — so
    ``concat(pieces) == text`` (pinned by the roundtrip oracle)."""
    pieces = F.regexp_extract_all(
        F.coalesce(F.col(text_col), F.lit("")),
        F.lit("(" + GPT2_PRETOKEN_PATTERN + ")"),
        1,
    )
    return df.withColumn(out_col, pieces)


def _piece_bytes(piece) -> Column:
    hexs = F.hex(F.encode(piece, "UTF-8"))
    return F.transform(
        F.regexp_extract_all(hexs, F.lit("(..)"), 1),
        lambda x: F.conv(x, 16, 10).cast("int"),
    )


def byte_tokenize_gpt2(
    df: DataFrame, text_col: str = "text", out_col: str = "tokens"
) -> DataFrame:
    """Raw text → GPT-2 pre-split → UTF-8 byte ids with a ``-1`` boundary
    sentinel after each piece.  BPE merge pairs are non-negative ids, so a
    pair spanning two pieces always contains the sentinel and can never
    merge — exactly the canonical recipe's "merges don't cross pre-token
    boundaries" rule, with no change to the merge kernel.  Strip
    boundaries with :func:`strip_piece_boundaries` before packing/export."""
    pieces = F.regexp_extract_all(
        F.coalesce(F.col(text_col), F.lit("")),
        F.lit("(" + GPT2_PRETOKEN_PATTERN + ")"),
        1,
    )
    toks = F.flatten(
        F.transform(
            pieces,
            lambda p: F.concat(
                _piece_bytes(p), F.array(F.lit(PIECE_BOUNDARY).cast("int"))
            ),
        )
    )
    return df.withColumn(out_col, toks)


def strip_piece_boundaries(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(c, lambda t: t != F.lit(PIECE_BOUNDARY))


def expand_merges(merges: list[tuple[int, int, int]]) -> dict[int, list[int]]:
    """Driver-side expansion of a priority-ordered merge list into
    id → byte-sequence (merges may reference earlier merge outputs; the
    priority order guarantees the referenced id is already defined)."""
    exp: dict[int, list[int]] = {}

    def bytes_of(t: int) -> list[int]:
        if t < 256:
            return [t]
        if t in exp:
            return exp[t]
        raise ValueError(f"merge references undefined id {t}")

    for a, b, c in merges:
        exp[int(c)] = bytes_of(int(a)) + bytes_of(int(b))
    return exp


def byte_detokenize(
    df: DataFrame,
    merges: list[tuple[int, int, int]] | None = None,
    tok_col: str = "tokens",
    out_col: str = "text",
) -> DataFrame:
    """ids → text: the exact inverse of :func:`byte_tokenize` composed
    with :func:`apply_merges`.  Merge ids expand to their byte sequences
    through a driver-built literal map (the merge vocabulary is tiny);
    bytes reassemble via ``id → 2-hex-chars → array_join → unhex →
    decode('UTF-8')`` — all codegen, zero shuffle, zero Python.  The op
    every training-data pipeline needs to render packed token streams
    back to inspectable text."""
    base = lambda x: F.lpad(F.conv(x.cast("string"), 10, 16), 2, "0")  # noqa: E731
    if merges:
        exp = expand_merges(merges)
        hex_map = F.create_map(
            *[
                F.lit(v)
                for t, bs in sorted(exp.items())
                for v in (t, "".join(f"{b:02x}" for b in bs))
            ]
        )
        to_hex = lambda x: F.coalesce(hex_map[x], base(x))  # noqa: E731
    else:
        to_hex = base
    hexs = F.array_join(F.transform(F.col(tok_col), to_hex), "")
    return df.withColumn(out_col, F.decode(F.unhex(hexs), "UTF-8"))


def sql_apply_merges(
    src_sql: str, merges: list[tuple[int, int, int]]
) -> str:
    """DuckDB oracle for :func:`apply_merges` — the merge chain unrolled
    as one CTE block per merge (positions → candidates → run parity →
    rebuild), tokens rendered as CSV (routed_tokens convention).
    ``src_sql`` must yield (doc_id, tokens)."""
    ctes = [f"s0 AS (SELECT doc_id, tokens AS t FROM {src_sql})"]
    k = 0
    for a, b, c in merges:
        p, prev = k + 1, f"s{k}"
        ctes.append(
            f"""p{p} AS (
  SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i FROM {prev}
), cand{p} AS (
  SELECT doc_id, i FROM p{p}
  WHERE i < len(t) AND t[i] = {int(a)} AND t[i + 1] = {int(b)}
), run{p} AS (
  SELECT doc_id, i,
         i - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS grp
  FROM cand{p}
), keep{p} AS (
  SELECT doc_id, i FROM (
    SELECT doc_id, i,
           ROW_NUMBER() OVER (PARTITION BY doc_id, grp ORDER BY i) AS rn
    FROM run{p}
  ) WHERE rn % 2 = 1
), s{p} AS (
  SELECT p.doc_id,
         list(CASE WHEN k1.i IS NOT NULL THEN {int(c)} ELSE p.t[p.i] END
              ORDER BY p.i) AS t
  FROM p{p} p
  LEFT JOIN keep{p} k1 ON k1.doc_id = p.doc_id AND k1.i = p.i
  LEFT JOIN keep{p} k2 ON k2.doc_id = p.doc_id AND k2.i = p.i - 1
  WHERE k2.i IS NULL
  GROUP BY p.doc_id
)"""
        )
        k = p
    chain = ",\n".join(ctes)
    return f"""
WITH {chain}
SELECT b.doc_id,
       COALESCE(array_to_string(f.t, ','), '') AS tokens_csv,
       CAST(COALESCE(len(f.t), 0) AS BIGINT) AS n_tok
FROM s0 b LEFT JOIN s{k} f USING (doc_id)
"""


def tokenizer_fertility(
    df: DataFrame,
    merges: list[tuple[int, int, int]],
    text_col: str = "text",
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source tokenizer-efficiency report — the standard evaluation a
    tokenizer change ships with (fertility and compression; cf. the
    SentencePiece/BLOOM tokenizer analyses): one row per source with

    - n_docs, n_bytes, n_chars, n_words, n_tok (exact integer sums)
    - bytes_per_tok, chars_per_tok (compression), tok_per_word (fertility)
      rounded to 6dp

    Runs the real byte-level tokenizer (byte_tokenize → apply_merges) over
    the corpus; everything else is codegen column math + ONE map-side-
    combined aggregate on source — the only exchange carries |sources|
    partials.  At 10^12 docs this is a single narrow corpus pass."""
    from vector_spark.textstats import words

    base = df.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.col(source_col).alias("source"),
        F.col(text_col).alias("text"),
    )
    enc = apply_merges(byte_tokenize(base).select("doc_id", "tokens"), merges)
    per_doc = base.join(enc.select("doc_id", "n_tok"), "doc_id").select(
        "source",
        F.octet_length("text").cast("long").alias("_b"),
        F.length("text").cast("long").alias("_c"),
        F.size(words(F.col("text"))).cast("long").alias("_w"),
        F.col("n_tok").cast("long").alias("_t"),
    )
    g = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_b").cast("long").alias("n_bytes"),
        F.sum("_c").cast("long").alias("n_chars"),
        F.sum("_w").cast("long").alias("n_words"),
        F.sum("_t").cast("long").alias("n_tok"),
    )
    one = F.greatest(F.col("n_tok"), F.lit(1)).cast("double")
    return g.select(
        "source", "n_docs", "n_bytes", "n_chars", "n_words", "n_tok",
        F.round(F.col("n_bytes") / one, 6).alias("bytes_per_tok"),
        F.round(F.col("n_chars") / one, 6).alias("chars_per_tok"),
        F.round(
            F.col("n_tok")
            / F.greatest(F.col("n_words"), F.lit(1)).cast("double"),
            6,
        ).alias("tok_per_word"),
    )


def sql_tokenizer_fertility(
    docs_sql: str, merges: list[tuple[int, int, int]]
) -> str:
    """DuckDB twin of :func:`tokenizer_fertility`; ``docs_sql`` must yield
    (doc_id, text, source)."""
    from vector_spark.textstats import sql_words

    tok_src = (
        f"(SELECT CAST(doc_id AS VARCHAR) AS doc_id, "
        f"{sql_byte_tokenize('text')} AS tokens FROM ({docs_sql}))"
    )
    enc = sql_apply_merges(tok_src, merges)
    return f"""
WITH enc AS ({enc}),
per_doc AS (
  SELECT d.source,
         strlen(d.text)::BIGINT AS _b,
         length(d.text)::BIGINT AS _c,
         len({sql_words("d.text")})::BIGINT AS _w,
         e.n_tok::BIGINT AS _t
  FROM ({docs_sql}) d JOIN enc e ON CAST(d.doc_id AS VARCHAR) = e.doc_id
)
SELECT source,
       COUNT(*)::BIGINT AS n_docs,
       SUM(_b)::BIGINT AS n_bytes,
       SUM(_c)::BIGINT AS n_chars,
       SUM(_w)::BIGINT AS n_words,
       SUM(_t)::BIGINT AS n_tok,
       ROUND(SUM(_b) / CAST(GREATEST(SUM(_t), 1) AS DOUBLE), 6) AS bytes_per_tok,
       ROUND(SUM(_c) / CAST(GREATEST(SUM(_t), 1) AS DOUBLE), 6) AS chars_per_tok,
       ROUND(SUM(_t) / CAST(GREATEST(SUM(_w), 1) AS DOUBLE), 6) AS tok_per_word
FROM per_doc GROUP BY source
"""
