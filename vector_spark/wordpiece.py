"""WordPiece encoding — greedy longest-match-first subword tokenization
(Wu et al. 2016 / Devlin et al. 2018, the BERT tokenizer; public
algorithm).  Completes the tokenizer family next to byte-level BPE
(bpe.py): BPE applies a priority-ordered MERGE list, WordPiece applies a
VOCABULARY with greedy longest-prefix matching and '##' continuation
pieces, per word:

    pos = 0
    while pos < len(word):
        take the LONGEST piece p such that
            (pos == 0 ? p : '##' + p-suffix form) is in the vocabulary
            and word[pos : pos+len(p)] matches it
        if none matches -> the WHOLE word becomes [UNK]  (BERT semantics)
    words longer than ``max_word_len`` chars -> [UNK] directly

Scale design (100 TB corpus): the vocabulary is vocabulary-sized by
construction, so it ships in the task closure (broadcast); the encode is
ONE narrow corpus pass in an Arrow kernel — no join, no shuffle, output
one row per doc.  Greedy longest-match is inherently sequential within a
word (each match decides the next start), so the per-word loop runs in
Python over the batch — O(chars x max_piece_len) dict probes per doc,
the algorithm's intrinsic cost (HuggingFace's fast tokenizers do the
same walk in Rust).  Words are whitespace tokens (textstats.words
convention), matching the DuckDB oracle's split exactly.
"""

from __future__ import annotations

from typing import Iterable

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (kept for parity with siblings)
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

UNK_ID = 0


def _encode_word(word: str, vocab: dict[str, int], max_l: int, max_word_len: int):
    """ids for one word, or None if the word UNKs (BERT all-or-nothing)."""
    n = len(word)
    if n > max_word_len:
        return None
    ids: list[int] = []
    pos = 0
    while pos < n:
        match_id = None
        top = min(max_l, n - pos)
        for l in range(top, 0, -1):
            piece = word[pos : pos + l]
            if pos > 0:
                piece = "##" + piece
            hit = vocab.get(piece)
            if hit is not None:
                match_id = hit
                pos += l
                break
        if match_id is None:
            return None
        ids.append(match_id)
    return ids


def wordpiece_encode(
    df: DataFrame,
    vocab: Iterable[tuple[str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
    max_word_len: int = 100,
) -> DataFrame:
    """One row per doc: (id, ids array<int>, n_tok, n_unk) — the WordPiece
    encode of the whitespace words of ``text``, concatenated in word
    order; ``n_unk`` counts words that collapsed to [UNK] (id 0).

    ``vocab``: (piece, id) pairs — continuation pieces carry the '##'
    prefix, ids are the caller's (id 0 is reserved for [UNK]).  The vocab
    arrives as data, like a released tokenizer's vocab.txt."""
    vd = {p: int(i) for p, i in vocab}
    if any(i == UNK_ID for i in vd.values()):
        raise ValueError("vocab ids must not use the reserved UNK id 0")
    max_l = max((len(p) - 2 if p.startswith("##") else len(p)) for p in vd)
    mwl = int(max_word_len)

    out_schema = StructType(
        [
            StructField("doc_id", StringType()),
            StructField("ids", ArrayType(IntegerType())),
            StructField("n_tok", LongType()),
            StructField("n_unk", LongType()),
        ]
    )

    def kernel(batches):
        import re

        ws = re.compile(r"\s+")
        for batch in batches:
            doc_ids = batch.column(0).to_pylist()
            texts = batch.column(1).to_pylist()
            out_ids, out_n, out_u = [], [], []
            for t in texts:
                ids: list[int] = []
                n_unk = 0
                for w in ws.split((t or "").strip()):
                    if not w:
                        continue
                    enc = _encode_word(w, vd, max_l, mwl)
                    if enc is None:
                        ids.append(UNK_ID)
                        n_unk += 1
                    else:
                        ids.extend(enc)
                out_ids.append(ids)
                out_n.append(len(ids))
                out_u.append(n_unk)
            yield pa.record_batch(
                [
                    pa.array(doc_ids, pa.string()),
                    pa.array(out_ids, pa.list_(pa.int32())),
                    pa.array(out_n, pa.int64()),
                    pa.array(out_u, pa.int64()),
                ],
                names=["doc_id", "ids", "n_tok", "n_unk"],
            )

    src = df.select(
        F.col(id_col).cast("string").alias("doc_id"), F.col(text_col).alias("text")
    )
    return src.mapInArrow(kernel, out_schema)


def sql_wordpiece_encode(
    docs_sql: str,
    vocab: Iterable[tuple[str, int]],
    max_word_len: int = 100,
) -> str:
    """DuckDB twin of :func:`wordpiece_encode` — the greedy walk replayed
    as a recursive CTE over (doc, word) rows; the vocabulary is unrolled
    into literal longest-first CASE chains (it is a Python literal at
    oracle-build time, so no lateral join / scalar-subquery machinery).
    ``docs_sql`` must yield (doc_id, text).  Output: (doc_id, ids_csv,
    n_tok, n_unk) with ids comma-joined (routed_tokens convention)."""
    from vector_spark.textstats import sql_words

    vd = {p: int(i) for p, i in vocab}
    firsts = sorted(
        ((p, i) for p, i in vd.items() if not p.startswith("##")),
        key=lambda x: (-len(x[0]), x[0]),
    )
    conts = sorted(
        ((p[2:], i) for p, i in vd.items() if p.startswith("##")),
        key=lambda x: (-len(x[0]), x[0]),
    )

    def esc(s: str) -> str:
        return s.replace("'", "''")

    def chain(pairs, what):  # what: 'id' or 'len'
        branches = " ".join(
            f"WHEN substr(word, pos, {len(p)}) = '{esc(p)}' THEN "
            + (str(i) if what == "id" else str(len(p)))
            for p, i in pairs
        )
        return f"CASE {branches} ELSE NULL END"

    return f"""
WITH RECURSIVE
docs AS ({docs_sql}),
w AS (
  SELECT doc_id, widx, word
  FROM (
    SELECT CAST(doc_id AS VARCHAR) AS doc_id,
           generate_subscripts({sql_words("text")}, 1) AS widx,
           unnest({sql_words("text")}) AS word
    FROM docs
  )
),
r AS (
  SELECT doc_id, widx, word, 1 AS pos,
         CAST([] AS INT[]) AS ids,
         length(word) > {int(max_word_len)} AS failed
  FROM w
  UNION ALL
  SELECT doc_id, widx, word,
         pos + COALESCE(_l, 1) AS pos,
         CASE WHEN _i IS NULL THEN ids ELSE list_append(ids, _i) END AS ids,
         _i IS NULL AS failed
  FROM (
    SELECT r.*,
           CASE WHEN pos = 1 THEN {chain(firsts, 'id')}
                ELSE {chain(conts, 'id')} END AS _i,
           CASE WHEN pos = 1 THEN {chain(firsts, 'len')}
                ELSE {chain(conts, 'len')} END AS _l
    FROM r
  ) WHERE pos <= length(word) AND NOT failed
),
terminal AS (
  SELECT doc_id, widx,
         CASE WHEN failed THEN [{UNK_ID}] ELSE ids END AS ids,
         failed
  FROM r
  WHERE failed OR pos > length(word)
),
per_doc AS (
  SELECT doc_id,
         flatten(list(ids ORDER BY widx)) AS ids,
         SUM(CASE WHEN failed THEN 1 ELSE 0 END)::BIGINT AS n_unk
  FROM terminal GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(array_to_string(p.ids, ','), '') AS ids_csv,
       COALESCE(len(p.ids), 0)::BIGINT AS n_tok,
       COALESCE(p.n_unk, 0)::BIGINT AS n_unk
FROM (SELECT CAST(doc_id AS VARCHAR) AS doc_id FROM docs) d
LEFT JOIN per_doc p USING (doc_id)
"""
