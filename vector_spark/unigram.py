"""Unigram-LM subword encoding — Viterbi segmentation under a piece
log-probability table (Kudo 2018, the SentencePiece unigram model;
public algorithm).  Third member of the tokenizer family: BPE applies a
merge list (bpe.py), WordPiece greedy-matches a vocabulary
(wordpiece.py), unigram picks the GLOBALLY best segmentation per word:

    seg(word) = argmax_{segmentation} sum_i logp(piece_i)

solved by the standard forward DP over prefix lengths:

    dp[0] = 0
    dp[k] = max over piece p ending at k of dp[k - |p|] + logp(p)

Determinism: logps arrive integer-quantized (micro-nats, the lm.py
convention) so DP sums are exact integer arithmetic in both engines; the
argmax tiebreak is explicit — longest piece wins ties (same-length ties
are impossible: one substring, one logp).  A word with any unreachable
position (no piece covers it) becomes [UNK] whole (wordpiece.py's
all-or-nothing convention; SentencePiece's byte fallback is just "add
the 256 byte pieces to the table").

Scale design (100 TB corpus): the piece table is vocabulary-sized and
ships in the task closure; the encode is ONE narrow Arrow-kernel corpus
pass — no join, no shuffle; per word the DP costs O(len x max_piece_len)
dict probes (the algorithm's intrinsic cost, what SentencePiece's C++
lattice does).
"""

from __future__ import annotations

from typing import Iterable

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

UNK_ID = 0
_NEG = -(10**15)  # unreachable-prefix sentinel (far below any real sum)


def _viterbi_word(word: str, table: dict[str, tuple[int, int]], max_l: int):
    """(ids, score) for one word, or None if unsegmentable.
    ``table``: piece -> (id, logp_micro)."""
    n = len(word)
    dp = [_NEG] * (n + 1)
    bp = [0] * (n + 1)
    dp[0] = 0
    for k in range(1, n + 1):
        best, best_l = _NEG, 0
        for l in range(min(max_l, k), 0, -1):  # longest first -> wins ties
            prev = dp[k - l]
            if prev == _NEG:
                continue
            hit = table.get(word[k - l : k])
            if hit is None:
                continue
            s = prev + hit[1]
            if s > best:  # strict: first (longest) l keeps ties
                best, best_l = s, l
        dp[k], bp[k] = best, best_l
    if dp[n] == _NEG:
        return None
    ids: list[int] = []
    k = n
    while k > 0:
        l = bp[k]
        ids.append(table[word[k - l : k]][0])
        k -= l
    ids.reverse()
    return ids, dp[n]


def unigram_encode(
    df: DataFrame,
    pieces: Iterable[tuple[str, int, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per doc: (id, ids array<int>, n_tok, n_unk, score_micro) —
    the Viterbi-optimal unigram segmentation of each whitespace word,
    concatenated in word order; ``score_micro`` sums the chosen pieces'
    integer-micro-nat logps (UNK words contribute 0 and count in
    ``n_unk``).

    ``pieces``: (piece, id, logp_micro) rows — a SentencePiece-style
    model shipped as data; id 0 is reserved for [UNK]."""
    table = {p: (int(i), int(lp)) for p, i, lp in pieces}
    if any(i == UNK_ID for i, _ in table.values()):
        raise ValueError("piece ids must not use the reserved UNK id 0")
    if any(lp >= 0 for _, lp in table.values()):
        raise ValueError("logp_micro must be negative (log-probabilities)")
    max_l = max(len(p) for p in table)

    out_schema = StructType(
        [
            StructField("doc_id", StringType()),
            StructField("ids", ArrayType(IntegerType())),
            StructField("n_tok", LongType()),
            StructField("n_unk", LongType()),
            StructField("score_micro", LongType()),
        ]
    )

    def kernel(batches):
        import re

        ws = re.compile(r"\s+")
        for batch in batches:
            doc_ids = batch.column(0).to_pylist()
            texts = batch.column(1).to_pylist()
            out_ids, out_n, out_u, out_s = [], [], [], []
            for t in texts:
                ids: list[int] = []
                n_unk = 0
                score = 0
                for w in ws.split((t or "").strip()):
                    if not w:
                        continue
                    r = _viterbi_word(w, table, max_l)
                    if r is None:
                        ids.append(UNK_ID)
                        n_unk += 1
                    else:
                        ids.extend(r[0])
                        score += r[1]
                out_ids.append(ids)
                out_n.append(len(ids))
                out_u.append(n_unk)
                out_s.append(score)
            yield pa.record_batch(
                [
                    pa.array(doc_ids, pa.string()),
                    pa.array(out_ids, pa.list_(pa.int32())),
                    pa.array(out_n, pa.int64()),
                    pa.array(out_u, pa.int64()),
                    pa.array(out_s, pa.int64()),
                ],
                names=["doc_id", "ids", "n_tok", "n_unk", "score_micro"],
            )

    src = df.select(
        F.col(id_col).cast("string").alias("doc_id"), F.col(text_col).alias("text")
    )
    return src.mapInArrow(kernel, out_schema)


def sql_unigram_encode(
    docs_sql: str, pieces: Iterable[tuple[str, int, int]]
) -> str:
    """DuckDB twin of :func:`unigram_encode`: the forward DP replayed as a
    recursive CTE carrying the dp/backpointer lists, then a second
    recursive CTE backtracking the optimal path.  The DP runs once per
    DISTINCT word (same trick as the kernel's memo — a Zipfian corpus has
    far fewer distinct words than word occurrences) and joins back to the
    word stream.  The piece table is unrolled into literal CASE chains
    per length (it is a Python literal at oracle-build time).
    ``docs_sql`` must yield (doc_id, text).  Output: (doc_id, ids_csv,
    n_tok, n_unk, score_micro)."""
    from vector_spark.textstats import sql_words

    table = {p: (int(i), int(lp)) for p, i, lp in pieces}
    max_l = max(len(p) for p in table)

    def esc(s: str) -> str:
        return s.replace("'", "''")

    def lp_of(l: int) -> str:
        """logp_micro of the length-l piece ending at NEW prefix k+1 (the
        step below computes prefix k+1 while the row still carries the
        OLD k — DuckDB would resolve a same-SELECT `k+1 AS k` alias
        against the column, so the +1 is written out everywhere)."""
        branches = " ".join(
            f"WHEN substr(word, k - {l} + 2, {l}) = '{esc(p)}' THEN {lp}"
            for p, (_, lp) in sorted(table.items())
            if len(p) == l
        )
        return f"CASE {branches} ELSE NULL END" if branches else "NULL"

    def id_of_len(l: int) -> str:
        """piece id for the length-l piece ending at position pos."""
        branches = " ".join(
            f"WHEN substr(word, pos - {l} + 1, {l}) = '{esc(p)}' THEN {pid}"
            for p, (pid, _) in sorted(table.items())
            if len(p) == l
        )
        return f"CASE {branches} ELSE NULL END" if branches else "NULL"

    # candidate score for the piece of length l ending at NEW prefix k+1:
    # dp[(k+1)-l+1] = dp[k-l+2] (1-based list; dp[i] = best for first i-1
    # chars) + logp of the substring occupying positions k-l+2 .. k+1
    cands = []
    for l in range(1, max_l + 1):
        cands.append(
            f"CASE WHEN k + 1 >= {l} AND dp[k - {l} + 2] > {_NEG}"
            f" THEN dp[k - {l} + 2] + ({lp_of(l)}) ELSE NULL END"
        )
    cand_cols = ", ".join(
        f"{c} AS _s{l}" for l, c in zip(range(1, max_l + 1), cands)
    )
    best = "GREATEST(" + ", ".join(
        f"COALESCE(_s{l}, {_NEG})" for l in range(1, max_l + 1)
    ) + ")"
    # longest piece wins ties -> check l = max..1
    bp_case = "CASE " + " ".join(
        f"WHEN _best > {_NEG} AND COALESCE(_s{l}, {_NEG}) = _best THEN {l}"
        for l in range(max_l, 0, -1)
    ) + " ELSE 0 END"

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
uw AS (SELECT DISTINCT word FROM w),
fwd AS (
  SELECT word, 0 AS k,
         [CAST(0 AS BIGINT)] AS dp, [0] AS bp
  FROM uw
  UNION ALL
  SELECT word, k + 1 AS k,
         list_append(dp, CASE WHEN _best > {_NEG} THEN _best
                              ELSE CAST({_NEG} AS BIGINT) END) AS dp,
         list_append(bp, {bp_case}) AS bp
  FROM (
    SELECT *, {best} AS _best
    FROM (
      SELECT word, k, dp, bp, {cand_cols}
      FROM fwd WHERE k < length(word)
    )
  )
),
done AS (
  SELECT word, dp, bp,
         dp[length(word) + 1] <= {_NEG} AS failed,
         CASE WHEN dp[length(word) + 1] <= {_NEG} THEN 0
              ELSE dp[length(word) + 1] END AS wscore
  FROM fwd WHERE k = length(word)
),
back AS (
  SELECT word, bp, length(word) AS pos,
         CAST([] AS INT[]) AS rids
  FROM done WHERE NOT failed
  UNION ALL
  SELECT word, bp,
         pos - bp[pos + 1] AS pos,
         list_append(rids, _pid) AS rids
  FROM (
    SELECT b.*,
           CASE bp[pos + 1]
             {" ".join(f"WHEN {l} THEN ({id_of_len(l)})" for l in range(1, max_l + 1))}
           END AS _pid
    FROM back b WHERE pos > 0
  )
),
segs AS (
  SELECT word, list_reverse(rids) AS ids
  FROM back WHERE pos = 0
),
words_out AS (
  SELECT w.doc_id, w.widx,
         CASE WHEN d.failed THEN [{UNK_ID}] ELSE s.ids END AS ids,
         d.failed, d.wscore
  FROM w JOIN done d USING (word) LEFT JOIN segs s USING (word)
),
per_doc AS (
  SELECT doc_id,
         flatten(list(ids ORDER BY widx)) AS ids,
         SUM(CASE WHEN failed THEN 1 ELSE 0 END)::BIGINT AS n_unk,
         SUM(wscore)::BIGINT AS score_micro
  FROM words_out GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(array_to_string(p.ids, ','), '') AS ids_csv,
       COALESCE(len(p.ids), 0)::BIGINT AS n_tok,
       COALESCE(p.n_unk, 0)::BIGINT AS n_unk,
       COALESCE(p.score_micro, 0)::BIGINT AS score_micro
FROM (SELECT CAST(doc_id AS VARCHAR) AS doc_id FROM docs) d
LEFT JOIN per_doc p USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Unigram-LM training (Kudo 2018 §3.2, simplified deterministic EM) — the
# trainer that produces the (piece, id, logp_micro) table unigram_encode
# consumes, so the SentencePiece story runs train AND apply end-to-end.
#
# Shape: everything corpus-scale is a DataFrame aggregate; the EM inner
# loop runs over the DISTINCT-WORD census (Zipf: |distinct words| <<
# |word occurrences|), weighted by corpus frequency.  Per EM round:
#   E-step  mapInArrow over census partitions: per word, lattice
#           forward-backward under the current (broadcast) piece logps,
#           expected piece counts quantized to integer micro-units PER
#           WORD (same inputs -> same floats -> same integers, so the
#           cross-partition integer SUM is partitioning-invariant);
#           each partition emits its local (piece_id, count) partials.
#   M-step  one hash aggregate over those partials (rows <= |vocab| x
#           |partitions|), then logp_micro = floor(ln(c/total)*1e6) on
#           the driver over the vocab-sized table.
#   prune   keep the top ``vocab_size`` pieces by expected count
#           (count DESC, piece ASC — explicit tiebreak), single chars
#           always kept (the no-UNK floor, Kudo's "character coverage").
#
# Like train_bpe / kmeans_refine, the trainer is iterative and therefore
# pytest-gated (planted-structure recovery + partitioning invariance +
# feeds-the-encoder); the CONSUMER unigram_encode is the oracle-gated
# surface.


def word_census(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(word, cnt) — corpus frequency of each distinct whitespace word
    (map-side-combined hash aggregate; the Zipf-collapsed table every
    tokenizer trainer iterates over)."""
    from vector_spark.textstats import words

    return (
        df.select(F.explode(words(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def seed_pieces(
    census: DataFrame, max_len: int = 4, min_count: int = 2, seed_size: int = 1000
) -> list[str]:
    """Candidate pieces: every substring of length 2..max_len whose
    corpus occurrence count clears ``min_count``, top ``seed_size`` by
    (count DESC, piece ASC), plus EVERY single char (coverage floor).
    Census explode is codegen (sequence x substr), the count a map-side-
    combined aggregate; the result is vocabulary-sized by construction."""
    w = F.col("word")
    subs = []
    for l in range(2, max_len + 1):
        subs.append(
            census.filter(F.length(w) >= l)
            .select(
                F.explode(F.sequence(F.lit(1), F.length(w) - (l - 1))).alias("_i"),
                w.alias("_w"),
                F.col("cnt"),
            )
            .select(
                F.col("_w").substr(F.col("_i"), F.lit(l)).alias("piece"),
                F.col("cnt"),
            )
        )
    multi = subs[0]
    for s in subs[1:]:
        multi = multi.unionAll(s)
    top = (
        multi.groupBy("piece")
        .agg(F.sum("cnt").cast("long").alias("c"))
        .filter(F.col("c") >= min_count)
        .orderBy(F.col("c").desc(), F.col("piece").asc())
        .limit(seed_size)
    )
    chars = (
        census.select(
            F.explode(F.sequence(F.lit(1), F.length(w))).alias("_i"),
            w.alias("_w"),
        )
        .select(F.col("_w").substr(F.col("_i"), F.lit(1)).alias("piece"))
        .distinct()
    )
    pieces = sorted(
        {r.piece for r in top.collect()} | {r.piece for r in chars.collect()}
    )
    return pieces


def _expected_counts_word(word, wfreq, table, max_l):
    """E-step for one word: expected piece counts under the lattice
    forward-backward, scaled by the word's corpus frequency.  Pure
    function of (word, logps) — partitioning cannot change it."""
    import math

    n = len(word)
    NEG = float("-inf")
    alpha = [NEG] * (n + 1)
    alpha[0] = 0.0
    for k in range(1, n + 1):
        acc = NEG
        for l in range(1, min(max_l, k) + 1):
            lp = table.get(word[k - l : k])
            if lp is None or alpha[k - l] == NEG:
                continue
            v = alpha[k - l] + lp
            acc = v if acc == NEG else (max(acc, v) + math.log1p(math.exp(-abs(acc - v))))
        alpha[k] = acc
    if alpha[n] == NEG:
        return {}
    beta = [NEG] * (n + 1)
    beta[n] = 0.0
    for k in range(n - 1, -1, -1):
        acc = NEG
        for l in range(1, min(max_l, n - k) + 1):
            lp = table.get(word[k : k + l])
            if lp is None or beta[k + l] == NEG:
                continue
            v = beta[k + l] + lp
            acc = v if acc == NEG else (max(acc, v) + math.log1p(math.exp(-abs(acc - v))))
        beta[k] = acc
    out: dict[str, int] = {}
    z = alpha[n]
    for k in range(n):
        if alpha[k] == NEG:
            continue
        for l in range(1, min(max_l, n - k) + 1):
            p = word[k : k + l]
            lp = table.get(p)
            if lp is None or beta[k + l] == NEG:
                continue
            c = math.exp(alpha[k] + lp + beta[k + l] - z) * wfreq
            # integer micro-units per (word, piece): deterministic, so the
            # cross-partition SUM is exact integer arithmetic
            ci = int(math.floor(c * 1e6))
            if ci > 0:
                out[p] = out.get(p, 0) + ci
    return out


def train_unigram(
    df: DataFrame,
    vocab_size: int = 64,
    max_len: int = 4,
    n_iter: int = 3,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> list[tuple[str, int, int]]:
    """EM-train a unigram piece table on the corpus; returns (piece, id,
    logp_micro) rows ready for :func:`unigram_encode` (ids assigned by
    final logp DESC, piece ASC; single chars always survive pruning)."""
    import math

    spark = df.sparkSession
    census = word_census(df, text_col, id_col).persist()
    try:
        pieces = seed_pieces(census, max_len, min_count)
        # init: logp from raw substring frequency (uniform-ish is fine too;
        # EM sharpens it) — computed driver-side over the vocab-sized list
        logp = {p: math.log(1.0 / len(pieces)) for p in pieces}

        from pyspark.sql.types import (
            LongType as _L,
            StringType as _S,
            StructField as _F,
            StructType as _T,
        )

        part_schema = _T([_F("piece", _S()), _F("c_micro", _L())])

        for _ in range(n_iter):
            table = dict(logp)
            max_l = max(len(p) for p in table)

            def estep(batches, _table=table, _max_l=max_l):
                acc: dict[str, int] = {}
                for batch in batches:
                    ws_ = batch.column(0).to_pylist()
                    cs_ = batch.column(1).to_pylist()
                    for w_, c_ in zip(ws_, cs_):
                        for p, ci in _expected_counts_word(
                            w_, c_, _table, _max_l
                        ).items():
                            acc[p] = acc.get(p, 0) + ci
                if acc:
                    ks = sorted(acc)
                    yield pa.record_batch(
                        [
                            pa.array(ks, pa.string()),
                            pa.array([acc[k] for k in ks], pa.int64()),
                        ],
                        names=["piece", "c_micro"],
                    )

            partials = census.mapInArrow(estep, part_schema)
            counts = {
                r.piece: r.c_micro
                for r in partials.groupBy("piece")
                .agg(F.sum("c_micro").cast("long").alias("c_micro"))
                .collect()
            }
            # prune: top vocab_size by expected count, chars always kept
            chars = {p for p in logp if len(p) == 1}
            ranked = sorted(
                ((c, p) for p, c in counts.items() if len(p) > 1),
                key=lambda x: (-x[0], x[1]),
            )
            keep = chars | {p for _, p in ranked[: max(0, vocab_size - len(chars))]}
            total = sum(counts.get(p, 0) for p in keep)
            if total <= 0:
                break
            # add-one on the micro-scale so pruned-to-zero chars stay finite
            logp = {
                p: math.log((counts.get(p, 0) + 1) / (total + len(keep)))
                for p in sorted(keep)
            }
    finally:
        census.unpersist()

    final = sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))
    return [
        (p, i + 1, min(-1, int(math.floor(lp * 1e6))))
        for i, (p, lp) in enumerate(final)
    ]
