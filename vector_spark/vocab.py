"""Corpus-wide token vocabulary statistics over tokenized sequences.

The two scans every tokenizer/training-data pipeline runs before (re)
training a BPE vocabulary or auditing a corpus mix:

- :func:`vocab_stats` — per-token frequency + document frequency, top-N.
  (The unigram census: vocabulary coverage, OOV-rate inputs, stopword-ish
  token identification.)
- :func:`token_pair_stats` — adjacent-token-pair frequency, top-N.  (The
  BPE merge-candidate scan: one iteration of the public BPE algorithm,
  Sennrich et al. 2016, is "count all adjacent symbol pairs, merge the
  most frequent" — at corpus scale this count IS the expensive step.)

The reference repo is a log pipeline with no tokenizer surface; this is
an LLM-data-pipeline extension alongside SURVEY.md §2 (same family as
packing/dup-span/decontamination).

Scale design (10^12-sequence corpus): both ops are
explode → partial-aggregate → exchange-on-key → final-aggregate → TakeOrdered.
The explode is per-row codegen (``posexplode`` of a zip of two shifted
slices for pairs — no UDF, no gram-string materialization); map-side
partial aggregation collapses each task's stream to its distinct keys, so
the exchange carries O(distinct tokens | distinct pairs) rows per task,
not O(total tokens); the global top-N is Spark's TakeOrderedAndProject
(per-partition heap, driver merges N rows — no full sort shuffle).
Ordering is total (count desc, then key asc) so results are deterministic
under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _flat_tokens(batch, tok_col):
    """(flat int64 token stream, per-row boundary mask) for one Arrow batch:
    ``same_row[i]`` is True when flat[i] and flat[i+1] come from one doc."""
    import numpy as np
    import pyarrow.compute as pc

    toks = batch.column(tok_col)
    lens = pc.fill_null(pc.list_value_length(toks), 0).to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    flat = toks.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    rowidx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    return flat, rowidx


def vocab_stats(
    df: DataFrame,
    top_n: int = 100,
    id_col: str = "doc_id",
    tok_col: str = "tokens",
    fast: bool = True,
) -> DataFrame:
    """Top-``top_n`` tokens by corpus frequency: (token, n_occ, n_docs).
    ``n_docs`` counts documents containing the token at least once.

    ``fast=True`` (default, production): a zero-copy Arrow kernel
    pre-aggregates each batch with ``np.unique`` over (doc, token) pairs,
    emitting (token, occ_partial, docs_partial) — the exchange carries
    O(distinct tokens per batch) rows instead of O(total tokens).  A doc's
    tokens live in one row (hence one batch), so per-batch doc-distinct
    partials sum exactly.  ``fast=False`` is the pure-DataFrame twin
    (explode + two-level aggregate) — same result, kept as the
    plan-readable reference."""
    if not fast:
        occ = df.select(id_col, F.explode(tok_col).alias("token"))
        per_doc = occ.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("_c"))
        return (
            per_doc.groupBy("token")
            .agg(
                F.sum("_c").cast("long").alias("n_occ"),
                F.count(F.lit(1)).cast("long").alias("n_docs"),
            )
            .orderBy(F.desc("n_occ"), F.asc("token"))
            .limit(top_n)
            .select(F.col("token").cast("long").alias("token"), "n_occ", "n_docs")
        )

    def kernel(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        from vector_spark.arena import warm_numpy_arena

        warm_numpy_arena()
        schema = pa.schema(
            [("token", pa.int64()), ("_occ", pa.int64()), ("_docs", pa.int64())]
        )
        for batch in batches:
            if batch.num_rows == 0:
                continue
            flat, rowidx = _flat_tokens(batch, tok_col)
            if not len(flat):
                continue
            # hash-grouped (pc.value_counts), not np.unique: concurrent
            # numpy sorts over the full token stream collapse ~10x on SMT
            # hosts (see lm.py) — only the DISTINCT sets (vocab-sized) are
            # ever sorted, to align the occurrence and doc-count halves
            vc = pc.value_counts(pa.array(flat))
            toks_u = vc.field("values").to_numpy()
            occ = vc.field("counts").to_numpy()
            o = np.argsort(toks_u)
            toks_u, occ = toks_u[o], occ[o]
            # distinct (doc, token) pairs -> docs-per-token partial; the
            # (row << 32 | token) pack is a bijection for int32 tokens
            key = (rowidx << np.int64(32)) | (flat & np.int64(0xFFFFFFFF))
            pairs_u = pc.value_counts(pa.array(key)).field("values").to_numpy()
            dvc = pc.value_counts(pa.array(pairs_u & np.int64(0xFFFFFFFF)))
            # re-sign the masked low half (arithmetic shift) so its sort
            # order matches the signed toks_u order for negative tokens
            docs_tok = (dvc.field("values").to_numpy() << np.int64(32)) >> np.int64(32)
            docs = dvc.field("counts").to_numpy()
            d = np.argsort(docs_tok)
            # both argsorts now order the SAME distinct token set
            docs = docs[d]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(toks_u),
                    pa.array(occ.astype(np.int64)),
                    pa.array(docs.astype(np.int64)),
                ],
                schema=schema,
            )

    partials = df.select(tok_col).mapInArrow(
        kernel, schema="token long, _occ long, _docs long"
    )
    return (
        partials.groupBy("token")
        .agg(
            F.sum("_occ").cast("long").alias("n_occ"),
            F.sum("_docs").cast("long").alias("n_docs"),
        )
        .orderBy(F.desc("n_occ"), F.asc("token"))
        .limit(top_n)
    )


def sql_vocab_stats(src_sql: str, top_n: int = 100) -> str:
    """DuckDB oracle for :func:`vocab_stats`."""
    return f"""
WITH occ AS (
  SELECT doc_id, unnest(tokens) AS token FROM {src_sql}
), per_doc AS (
  SELECT doc_id, token, COUNT(*) AS c FROM occ GROUP BY doc_id, token
)
SELECT CAST(token AS BIGINT) AS token,
       CAST(SUM(c) AS BIGINT) AS n_occ,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM per_doc GROUP BY token
ORDER BY n_occ DESC, token ASC LIMIT {top_n}
"""


def _pair_partials(df: DataFrame, tok_col: str) -> DataFrame:
    """Per-batch partial counts of adjacent token pairs as a PACKED
    (t1 << 32 | t2, _occ) stream — the map-side-combine stage shared by
    :func:`token_pair_stats` and :func:`pair_pmi`.  Pairs never cross doc
    boundaries; the pack is a bijection for int32 tokens; counting uses
    the hash-based Arrow kernel, not np.unique (concurrent numpy sorts
    collapse ~10x on SMT hosts, see lm.py), and the exchange carries the
    packed key — half the bytes, unpacked only after the final reduce."""

    def kernel(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        from vector_spark.arena import warm_numpy_arena

        warm_numpy_arena()
        schema = pa.schema([("k", pa.int64()), ("_occ", pa.int64())])
        for batch in batches:
            if batch.num_rows == 0:
                continue
            flat, rowidx = _flat_tokens(batch, tok_col)
            if len(flat) < 2:
                continue
            same = rowidx[:-1] == rowidx[1:]
            t1, t2 = flat[:-1][same], flat[1:][same]
            if not len(t1):
                continue
            key = (t1 << np.int64(32)) | (t2 & np.int64(0xFFFFFFFF))
            vc = pc.value_counts(pa.array(key))
            yield pa.RecordBatch.from_arrays(
                [vc.field("values"), vc.field("counts").cast(pa.int64())],
                schema=schema,
            )

    return df.select(tok_col).mapInArrow(kernel, schema="k long, _occ long")


def token_pair_stats(
    df: DataFrame,
    top_n: int = 100,
    tok_col: str = "tokens",
    fast: bool = True,
) -> DataFrame:
    """Top-``top_n`` adjacent token pairs by corpus frequency:
    (t1, t2, n_occ) — the BPE merge-candidate ranking.  Pairs never cross
    document boundaries; a doc of n tokens contributes n-1 pairs.

    ``fast=True`` (default, production): a zero-copy Arrow kernel counts
    each batch's pairs with one ``np.unique`` over the packed
    (t1 << 32 | t2) key — no pair-struct materialization — emitting
    O(distinct pairs per batch) partials (measured ~25x the HOF twin at
    sf0.01, 15.4M pairs: 2.1s vs 58s warm; the synthetic corpus is
    near-uniform so partials barely collapse — worst case for the
    exchange, which real Zipfian text collapses massively).
    ``fast=False`` is the pure-DataFrame twin (zip-shifted-slices +
    explode; HOF lambdas are interpreted, hence the gap) — same result,
    kept as the plan-readable reference."""
    if not fast:
        toks = F.col(tok_col)
        pairs = F.zip_with(
            F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("t1"), b.alias("t2")),
        )
        return (
            df.select(F.explode(pairs).alias("p"))
            .groupBy(
                F.col("p.t1").cast("long").alias("t1"),
                F.col("p.t2").cast("long").alias("t2"),
            )
            .agg(F.count(F.lit(1)).cast("long").alias("n_occ"))
            .orderBy(F.desc("n_occ"), F.asc("t1"), F.asc("t2"))
            .limit(top_n)
        )

    def final_kernel(batches):
        # Per-partition final aggregate + local top-N.  After the hash
        # exchange on k every key is COMPLETE within one partition, so a
        # partition-local top-N under the global total order (count desc,
        # t1 asc, t2 asc) provably contains every global top-N member —
        # the driver-side merge sees <= top_n x partitions rows instead of
        # the JVM hash-aggregating O(distinct pairs) rows (near-uniform
        # corpora: ~|pairs| keys, where the hash map exceeds memory and
        # Spark falls back to sort-based aggregation — the measured
        # bottleneck at sf0.1, ~150M distinct keys).
        import numpy as np
        import pyarrow as pa

        from vector_spark.arena import warm_numpy_arena

        warm_numpy_arena()
        out_schema = pa.schema([("k", pa.int64()), ("n_occ", pa.int64())])
        chunks = [b for b in batches if b.num_rows]
        if not chunks:
            return
        tbl = pa.Table.from_batches(chunks)
        agg = tbl.group_by("k", use_threads=False).aggregate([("_occ", "sum")])
        k = agg.column("k").to_numpy(zero_copy_only=False)
        cnt = agg.column("_occ_sum").to_numpy(zero_copy_only=False)
        n = len(k)
        if n > top_n:
            # O(n) selection, no sort (see lm.py's concurrent-sort note):
            # keep cnt > thresh outright, then fill the remainder from the
            # cnt == thresh ties by smallest (t1, t2) — the packed key
            # XOR'd at both halves' sign bits compares unsigned in exactly
            # signed-lexicographic (t1, t2) order
            thresh = np.partition(cnt, n - top_n)[n - top_n]
            above = np.flatnonzero(cnt > thresh)
            ties = np.flatnonzero(cnt == thresh)
            need = top_n - len(above)
            if 0 < need < len(ties):
                kx = k[ties].astype(np.uint64) ^ np.uint64(0x8000000080000000)
                ties = ties[np.argpartition(kx, need - 1)[:need]]
            elif need <= 0:
                ties = ties[:0]
            sel = np.concatenate([above, ties])
            k, cnt = k[sel], cnt[sel]
        yield pa.RecordBatch.from_arrays(
            [pa.array(k), pa.array(cnt.astype(np.int64))], schema=out_schema
        )

    merged = _pair_partials(df, tok_col).repartition(F.col("k")).mapInArrow(
        final_kernel, schema="k long, n_occ long"
    )
    t1 = F.shiftright("k", 32)
    t2 = F.shiftright(F.shiftleft("k", 32), 32)  # sign-extend the low half
    return (
        merged.orderBy(F.desc("n_occ"), F.asc(t1), F.asc(t2))
        .limit(top_n)
        .select(t1.alias("t1"), t2.alias("t2"), "n_occ")
    )


def token_pair_stats_approx(
    df: DataFrame,
    top_n: int = 100,
    k_sketch: int = 4096,
    tok_col: str = "tokens",
) -> DataFrame:
    """Bounded-memory heavy-hitter pair scan: (t1, t2, cnt_lb, err_ub).

    The exact scan's exchange carries O(distinct pairs) partial rows — on
    a near-uniform corpus that is ~|pairs| (the documented worst case, no
    map-side collapse).  This twin runs a Misra-Gries summary (public
    algorithm, Misra & Gries 1982; merge rule per Agarwal et al., "Mergeable
    Summaries", PODS 2012) of ``k_sketch`` counters per partition, so the
    exchange carries at most ``k_sketch x partitions`` rows REGARDLESS of
    the corpus — the 10^12-token answer when the pair distribution has
    heavy hitters worth finding.

    Guarantees (self-certifying output): for every reported pair,
    ``cnt_lb <= true count <= cnt_lb + err_ub``; any pair NOT reported has
    true count ``<= err_ub``.  ``err_ub`` is the summed per-partition
    decrement total — computed, not assumed, so callers can check whether
    the ranking gap exceeds the error before trusting the order.  On a
    uniform corpus err_ub is large and says so; on Zipfian text the head
    is certified cheaply.

    Raw pair keys buffer up to a fixed cap (64MB — memory stays bounded
    per task) and each flush is ONE dictionary-encode group-sum + an O(n)
    np.partition threshold decrement — no sorts (see lm.py's
    concurrent-sort note), and no per-batch pre-count: on near-unique
    pair streams ``pc.value_counts`` barely collapses, so counting before
    the merge was a second full hash pass for nothing (merging raw keys
    with weight-1 rows halves the hash work; the MG merge rule is valid
    for any flush granularity, and coarser flushes only TIGHTEN err_ub —
    fewer decrements)."""

    def kernel(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        from vector_spark.arena import warm_numpy_arena

        warm_numpy_arena()
        schema = pa.schema(
            [("k", pa.int64()), ("cnt", pa.int64()), ("err", pa.int64())]
        )
        st_keys = np.empty(0, dtype=np.int64)
        st_cnts = np.empty(0, dtype=np.int64)
        err = 0
        saw = False
        buf: list = []
        buf_n = 0
        cap = 8 << 20  # 8M buffered pair keys = 64MB per task, fixed

        def merge(st_keys, st_cnts, err):
            raw = buf[0] if len(buf) == 1 else np.concatenate(buf)
            # ONE fused hash pass over the raw keys (pc.value_counts beats
            # dictionary_encode + bincount ~20% here, and the old weighted
            # bincount was a ~25x slower float64 scalar loop at 15M bins);
            # the <=k state counters then merge via binary search against
            # the grouped keys — O(n log k), no second hash pass
            vc = pc.value_counts(pa.array(raw))
            uk = vc.field("values").to_numpy(zero_copy_only=False)
            cnts = vc.field("counts").to_numpy(zero_copy_only=False).copy()
            if len(st_keys):
                order = np.argsort(st_keys, kind="stable")  # <=k: tiny sort
                sk, sc = st_keys[order], st_cnts[order]
                pos = np.clip(np.searchsorted(sk, uk), 0, len(sk) - 1)
                hit = sk[pos] == uk
                cnts[hit] += sc[pos[hit]]
                carried = np.zeros(len(sk), dtype=bool)
                carried[pos[hit]] = True
                uk = np.concatenate([uk, sk[~carried]])
                cnts = np.concatenate([cnts, sc[~carried]])
            if len(uk) > k_sketch:
                # subtract the (k+1)-th largest from everyone, keep > 0:
                # at most k counters survive; O(n) selection, no sort
                thresh = np.partition(cnts, len(cnts) - k_sketch - 1)[
                    len(cnts) - k_sketch - 1
                ]
                err += int(thresh)
                keep = cnts > thresh
                return uk[keep], cnts[keep] - thresh, err
            return uk, cnts, err

        for batch in batches:
            if batch.num_rows == 0:
                continue
            flat, rowidx = _flat_tokens(batch, tok_col)
            if len(flat) < 2:
                continue
            same = rowidx[:-1] == rowidx[1:]
            t1, t2 = flat[:-1][same], flat[1:][same]
            if not len(t1):
                continue
            saw = True
            buf.append((t1 << np.int64(32)) | (t2 & np.int64(0xFFFFFFFF)))
            buf_n += len(t1)
            if buf_n >= cap:
                st_keys, st_cnts, err = merge(st_keys, st_cnts, err)
                buf, buf_n = [], 0
        if not saw:
            return
        if buf:
            st_keys, st_cnts, err = merge(st_keys, st_cnts, err)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(np.append(st_keys, 0).astype(np.int64)),
                pa.array(np.append(st_cnts, 0).astype(np.int64)),
                pa.array(
                    np.append(np.zeros(len(st_keys), np.int64), err)
                ),
            ],
            schema=schema,
        )

    partials = df.select(tok_col).mapInArrow(
        kernel, schema="k long, cnt long, err long"
    )
    total_err = partials.agg(F.sum("err").cast("long").alias("err_ub"))
    t1 = F.shiftright("k", 32)
    t2 = F.shiftright(F.shiftleft("k", 32), 32)
    top = (
        partials.filter(F.col("cnt") > 0)
        .groupBy("k")
        .agg(F.sum("cnt").cast("long").alias("cnt_lb"))
        .orderBy(F.desc("cnt_lb"), F.asc(t1), F.asc(t2))
        .limit(top_n)
    )
    return top.crossJoin(F.broadcast(total_err)).select(
        t1.alias("t1"), t2.alias("t2"), "cnt_lb", "err_ub"
    )


def token_rank_table(df: DataFrame, tok_col: str = "tokens") -> DataFrame:
    """Full vocabulary census with a deterministic frequency rank:
    (token, n_occ, rank) where rank 0 is the most frequent token, ties
    broken by token asc.

    Scale design: the census is explode → hash-aggregate (map-side
    combined, exchange O(distinct tokens per task)); the rank reuses
    :func:`vector_spark.sharding.global_row_number` — a range exchange of
    the VOCAB-sized table plus per-partition windows, no single-reducer
    global sort.  Vocabularies are bounded (10^5–10^7) even for 10^12
    token corpora, so every post-census structure is tiny relative to the
    corpus scan."""
    from vector_spark.sharding import global_row_number

    census = (
        df.select(F.explode(tok_col).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occ"))
        .select(F.col("token").cast("long").alias("token"), "n_occ")
    )
    return global_row_number(census, [F.desc("n_occ"), F.asc("token")])


def remap_tokens(
    df: DataFrame,
    keep: int,
    oov_id: int | None = None,
    id_col: str = "doc_id",
    tok_col: str = "tokens",
    fast: bool = True,
    rank_table: DataFrame | None = None,
) -> DataFrame:
    """Vocabulary compaction: remap every token id to its corpus frequency
    rank, keeping the ``keep`` most frequent tokens (new ids 0..keep-1,
    densest-first — the embedding-table truncation step of a tokenizer
    pipeline) and collapsing the tail to ``oov_id`` (default ``keep``).
    Returns (id_col, tok_col remapped as array<long>, n_oov) with
    per-position order preserved; docs keep their length exactly.

    The closest reference idiom is `tag_cardinality_limit`
    (src/transforms/tag_cardinality_limit/mod.rs) — keep the head of a
    value distribution, collapse the tail to a sentinel — applied to the
    token stream instead of tag values.

    ``fast=True`` (production): the kept (token → rank) mapping — ``keep``
    rows, a user-bounded constant — is collected and broadcast as two
    sorted numpy arrays; a zero-copy Arrow kernel remaps each batch's flat
    token buffer with one ``np.searchsorted`` and rebuilds the list column
    from the original offsets.  No join, no shuffle, no per-token exchange:
    the corpus is touched by exactly one narrow pass.  ``fast=False`` is
    the plan-readable twin (posexplode → broadcast LEFT join → ordered
    re-aggregate; exchange O(tokens) on doc_id) and the shape the oracle
    SQL mirrors."""
    if oov_id is None:
        oov_id = keep
    ranked = rank_table if rank_table is not None else token_rank_table(df, tok_col)
    keep_map = ranked.filter(F.col("rank") < keep).select(
        "token", F.col("rank").alias("new_id")
    )

    if not fast:
        pos = df.select(id_col, F.posexplode(tok_col).alias("pos", "token"))
        mapped = pos.join(F.broadcast(keep_map), "token", "left").select(
            id_col,
            "pos",
            F.coalesce(F.col("new_id"), F.lit(oov_id)).cast("long").alias("nid"),
            F.col("new_id").isNull().cast("int").alias("is_oov"),
        )
        agg = mapped.groupBy(id_col).agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "nid"))),
                lambda s: s["nid"],
            ).alias("_toks"),
            F.sum("is_oov").cast("long").alias("_oov"),
        )
        return (
            df.select(id_col)
            .join(agg, id_col, "left")
            .select(
                id_col,
                F.coalesce("_toks", F.array().cast("array<long>")).alias(tok_col),
                F.coalesce("_oov", F.lit(0)).cast("long").alias("n_oov"),
            )
        )

    rows = keep_map.collect()
    import numpy as np

    old = np.array([r["token"] for r in rows], dtype=np.int64)
    new = np.array([r["new_id"] for r in rows], dtype=np.int64)
    order = np.argsort(old)
    old, new = old[order], new[order]
    bc = df.sparkSession.sparkContext.broadcast((old, new))

    def kernel(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        from vector_spark.arena import warm_numpy_arena

        warm_numpy_arena()
        old_s, new_s = bc.value
        schema = pa.schema(
            [
                (id_col, pa.string()),
                (tok_col, pa.list_(pa.int64())),
                ("n_oov", pa.int64()),
            ]
        )
        for batch in batches:
            if batch.num_rows == 0:
                continue
            flat, rowidx = _flat_tokens(batch, tok_col)
            lens = pc.fill_null(
                pc.list_value_length(batch.column(tok_col)), 0
            ).to_numpy(zero_copy_only=False).astype(np.int64)
            if len(old_s) and len(flat):
                idx = np.searchsorted(old_s, flat)
                idx_c = np.minimum(idx, len(old_s) - 1)
                hit = (idx < len(old_s)) & (old_s[idx_c] == flat)
                new_flat = np.where(hit, new_s[idx_c], np.int64(oov_id))
            else:
                hit = np.zeros(len(flat), dtype=bool)
                new_flat = np.full(len(flat), oov_id, dtype=np.int64)
            n_oov = np.bincount(
                rowidx[~hit], minlength=batch.num_rows
            ).astype(np.int64)
            offsets = np.zeros(batch.num_rows + 1, dtype=np.int32)
            np.cumsum(lens, out=offsets[1:])
            toks = pa.ListArray.from_arrays(
                pa.array(offsets), pa.array(new_flat, type=pa.int64())
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column(id_col).cast(pa.string()), toks, pa.array(n_oov)],
                schema=schema,
            )

    return df.select(id_col, tok_col).mapInArrow(
        kernel, schema=f"{id_col} string, {tok_col} array<long>, n_oov long"
    )


def sql_remap_tokens(src_sql: str, keep: int, oov_id: int | None = None) -> str:
    """DuckDB oracle for :func:`remap_tokens` — tokens rendered as CSV
    (the routed_tokens convention) so arrays hash portably."""
    if oov_id is None:
        oov_id = keep
    return f"""
WITH census AS (
  SELECT token, COUNT(*) AS n
  FROM (SELECT unnest(tokens) AS token FROM {src_sql}) GROUP BY token
), keepmap AS (
  SELECT token, rnk AS new_id FROM (
    SELECT token, ROW_NUMBER() OVER (ORDER BY n DESC, token ASC) - 1 AS rnk
    FROM census
  ) WHERE rnk < {keep}
), pos AS (
  SELECT doc_id, i, t[i] AS token
  FROM (SELECT doc_id, tokens AS t, unnest(range(1, len(tokens) + 1)) AS i
        FROM {src_sql})
), mapped AS (
  SELECT doc_id, i,
         COALESCE(k.new_id, {oov_id}) AS nid,
         CASE WHEN k.new_id IS NULL THEN 1 ELSE 0 END AS is_oov
  FROM pos LEFT JOIN keepmap k USING (token)
), agg AS (
  SELECT doc_id,
         string_agg(CAST(nid AS VARCHAR), ',' ORDER BY i) AS toks,
         SUM(is_oov) AS n_oov
  FROM mapped GROUP BY doc_id
)
SELECT s.doc_id,
       COALESCE(a.toks, '') AS tokens_csv,
       CAST(COALESCE(a.n_oov, 0) AS BIGINT) AS n_oov
FROM {src_sql} s LEFT JOIN agg a USING (doc_id)
"""


def sql_token_pair_stats(src_sql: str, top_n: int = 100) -> str:
    """DuckDB oracle for :func:`token_pair_stats`."""
    return f"""
WITH docs AS (
  SELECT tokens AS t FROM {src_sql} WHERE len(tokens) >= 2
), pos AS (
  SELECT t, unnest(range(1, len(t))) AS i FROM docs
)
SELECT CAST(t[i] AS BIGINT) AS t1,
       CAST(t[i + 1] AS BIGINT) AS t2,
       CAST(COUNT(*) AS BIGINT) AS n_occ
FROM pos GROUP BY t1, t2
ORDER BY n_occ DESC, t1 ASC, t2 ASC LIMIT {top_n}
"""


def pair_pmi(
    df: DataFrame,
    top_n: int = 100,
    min_count: int = 5,
    tok_col: str = "tokens",
) -> DataFrame:
    """Top-``top_n`` adjacent token pairs by pointwise mutual information —
    the collocation / phrase-mining scan (Church & Hanks 1990, public):
    PMI(a,b) = ln( (c_ab / N_pairs) / ((c_a / N_tok) * (c_b / N_tok)) ),
    reported as integer micro-nats (floor-quantized before ranking, the
    repo's standing float-gate idiom) with a ``min_count`` occurrence
    floor (raw PMI promotes hapax pairs; the floor is the standard fix).

    Scale design: the pair census reuses :func:`_pair_partials`
    (map-side-combined packed keys) and — like :func:`token_pair_stats` —
    finishes in a partition-local Arrow group-sum after one hash exchange
    on the packed key, where the ``min_count`` filter ALSO applies
    per-partition (exact: every key is complete in its partition), so only
    survivors (few, by construction) reach the JVM side.  The unigram
    census is vocab-sized and broadcasts onto the survivors twice; corpus
    totals ride along as a broadcast 1-row frame.  Returns
    (t1, t2, c_ab, pmi_micro)."""

    def finalize(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        from vector_spark.arena import warm_numpy_arena

        warm_numpy_arena()
        out_schema = pa.schema([("k", pa.int64()), ("c_ab", pa.int64())])
        chunks = [b for b in batches if b.num_rows]
        if not chunks:
            return
        tbl = pa.Table.from_batches(chunks)
        agg = tbl.group_by("k", use_threads=False).aggregate([("_occ", "sum")])
        keep = pc.greater_equal(agg.column("_occ_sum"), min_count)
        agg = agg.filter(keep)
        yield pa.RecordBatch.from_arrays(
            [
                agg.column("k").combine_chunks(),
                agg.column("_occ_sum").cast(pa.int64()).combine_chunks(),
            ],
            schema=out_schema,
        )

    survivors = _pair_partials(df, tok_col).repartition(F.col("k")).mapInArrow(
        finalize, schema="k long, c_ab long"
    )
    census = (
        df.select(F.explode(tok_col).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .select(F.col("tok").cast("long").alias("tok"), "c")
    )
    totals = df.select(
        F.sum(F.size(tok_col)).cast("double").alias("n_tok"),
        F.sum(F.greatest(F.size(tok_col) - 1, F.lit(0))).cast("double").alias("n_pairs"),
    )
    t1 = F.shiftright("k", 32)
    t2 = F.shiftright(F.shiftleft("k", 32), 32)  # sign-extend the low half
    unpacked = survivors.select(t1.alias("t1"), t2.alias("t2"), "c_ab")
    ca = census.select(F.col("tok").alias("t1"), F.col("c").alias("c_a"))
    cb = census.select(F.col("tok").alias("t2"), F.col("c").alias("c_b"))
    pmi = F.floor(
        F.log(
            (F.col("c_ab") / F.col("n_pairs"))
            / ((F.col("c_a") / F.col("n_tok")) * (F.col("c_b") / F.col("n_tok")))
        )
        * F.lit(1e6)
    ).cast("long")
    return (
        unpacked.join(F.broadcast(ca), "t1")
        .join(F.broadcast(cb), "t2")
        .crossJoin(F.broadcast(totals))
        .select("t1", "t2", "c_ab", pmi.alias("pmi_micro"))
        .orderBy(F.desc("pmi_micro"), F.asc("t1"), F.asc("t2"))
        .limit(top_n)
    )


def sql_pair_pmi(src_sql: str, top_n: int = 100, min_count: int = 5) -> str:
    """DuckDB oracle for :func:`pair_pmi`."""
    return f"""
WITH docs AS (
  SELECT tokens AS t FROM {src_sql} WHERE len(tokens) >= 2
), pos AS (
  SELECT t, unnest(range(1, len(t))) AS i FROM docs
), pairs AS (
  SELECT CAST(t[i] AS BIGINT) AS t1, CAST(t[i + 1] AS BIGINT) AS t2,
         CAST(COUNT(*) AS BIGINT) AS c_ab
  FROM pos GROUP BY t1, t2 HAVING COUNT(*) >= {min_count}
), census AS (
  SELECT CAST(tok AS BIGINT) AS tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT unnest(tokens) AS tok FROM {src_sql}) GROUP BY tok
), tot AS (
  SELECT CAST(SUM(len(tokens)) AS DOUBLE) AS n_tok,
         CAST(SUM(GREATEST(len(tokens) - 1, 0)) AS DOUBLE) AS n_pairs
  FROM {src_sql}
)
SELECT p.t1, p.t2, p.c_ab,
       FLOOR(
         ln((p.c_ab / tot.n_pairs) / ((ca.c / tot.n_tok) * (cb.c / tot.n_tok)))
         * 1e6
       )::BIGINT AS pmi_micro
FROM pairs p
JOIN census ca ON ca.tok = p.t1
JOIN census cb ON cb.tok = p.t2, tot
ORDER BY pmi_micro DESC, p.t1 ASC, p.t2 ASC LIMIT {top_n}
"""
