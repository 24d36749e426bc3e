"""Similarity search over an embedding column (`array<float>`).

Two tiers (SURVEY.md training-data extension):

- brute-force cosine top-k — the exact baseline: broadcast the query
  vectors, one narrow pass computing cosine via zip_with/aggregate (JVM
  higher-order functions, no UDF), then a per-query top-k window.  At
  10^12 rows this is a full scan but embarrassingly parallel; the shuffle
  is only |queries| x k rows.
- LSH-bucketed ANN — random-hyperplane signatures (sign of dot with R
  seeded hyperplanes) bucket the corpus; candidates are scored only within
  the query's bucket.  Deterministic: hyperplanes come from a seeded
  numpy PCG64 and are inlined as plan literals, so the DuckDB oracle can
  reproduce bucket assignment exactly.  This is the 100 TB path: the scan
  prunes to matching buckets (partition the table by bucket for partition
  pruning).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from vector_spark.dedup import cosine

LSH_SEED = 1234


def hyperplanes(dim: int, n_planes: int, seed: int = LSH_SEED) -> list[list[float]]:
    """Deterministic random hyperplanes (rounded so SQL literals are exact)."""
    rng = np.random.default_rng(seed)
    return [[round(float(v), 6) for v in row] for row in rng.standard_normal((n_planes, dim))]


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Signature bucket id: bit j = 1 iff dot(vec, plane_j) > 0."""
    bits = []
    for j, p in enumerate(planes):
        lit = F.array(*[F.lit(v) for v in p])
        dot = F.aggregate(
            F.zip_with(vec, lit, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot > 0, F.lit(2 ** j)).otherwise(F.lit(0)).cast("long"))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def sql_lsh_bucket(vec_expr: str, planes: list[list[float]]) -> str:
    terms = []
    for j, p in enumerate(planes):
        lit = "[" + ", ".join(f"{v!r}" for v in p) + "]"
        dot = (
            f"list_sum(list_transform(range(1, {len(p)} + 1), "
            f"i -> CAST({vec_expr}[i] AS DOUBLE) * ({lit}::DOUBLE[])[i]))"
        )
        terms.append(f"CASE WHEN {dot} > 0 THEN {2 ** j} ELSE 0 END")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def topk_cosine(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    qid_col: str = "query_id",
) -> DataFrame:
    """Exact brute-force top-k: for each query vector, the k most cosine-
    similar corpus rows.  ``queries`` has (qid_col, vec_col); it is
    broadcast (small by construction)."""
    c = corpus.alias("c")
    q = F.broadcast(queries).alias("q")
    scored = c.join(q, F.lit(True)).select(
        F.col(f"q.{qid_col}").alias(qid_col),
        F.col(f"c.{id_col}").alias(id_col),
        F.round(cosine(F.col(f"c.{vec_col}"), F.col(f"q.{vec_col}")), 6).alias("cos"),
    )
    w = Window.partitionBy(qid_col).orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return scored.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") <= k).drop("_rk")


def topk_cosine_numpy(
    corpus: DataFrame,
    query_vectors: dict[int, list[float]],
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    qid_col: str = "query_id",
) -> DataFrame:
    """Production brute-force top-k: numpy matmul per Arrow batch.

    The HOF-expression cosine (:func:`topk_cosine`) evaluates lambdas per
    element (interpreted, ~45x slower measured); this path broadcasts the
    query matrix to every task and does ONE `batch x queries` GEMM per
    Arrow batch inside ``mapInPandas``, emitting only each batch's local
    top-k — the final exchange carries |tasks| x |queries| x k rows into a
    tiny global top-k window.  This is the 100 TB ANN baseline.
    """
    import numpy as np
    import pandas as pd

    qids = sorted(query_vectors)
    qmat = np.asarray([query_vectors[q] for q in qids], dtype=np.float64)
    qnorm = np.linalg.norm(qmat, axis=1)

    def _run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            cnorm = np.linalg.norm(mat, axis=1)
            # round BEFORE ranking and break ties by ascending id, so the
            # batch-local top-k agrees with the global (cos desc, id asc)
            # window — otherwise a row tied at the k-boundary could be
            # dropped locally while the exact/oracle ranking keeps it
            sims = np.round((mat @ qmat.T) / np.outer(cnorm, qnorm), 6)  # one GEMM
            ids = pdf[id_col].to_numpy()
            out = []
            for j, qid in enumerate(qids):
                col = sims[:, j]
                top = np.lexsort((ids, -col))[:k]
                out.append(
                    pd.DataFrame(
                        {
                            qid_col: qid,
                            id_col: ids[top],
                            "cos": col[top],
                        }
                    )
                )
            yield pd.concat(out)

    partial = corpus.select(id_col, vec_col).mapInPandas(
        _run, schema=f"{qid_col} long, {id_col} long, cos double"
    )
    w = Window.partitionBy(qid_col).orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return partial.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") <= k).drop("_rk")


def centroids(dim: int, n_cells: int, seed: int = LSH_SEED + 1) -> list[list[float]]:
    """Deterministic IVF coarse centroids (seeded Gaussian, rounded so SQL
    literals are exact).  A trained k-means codebook drops in unchanged —
    the assignment/probe plumbing below is the scale mechanism; centroid
    quality only affects recall."""
    rng = np.random.default_rng(seed)
    return [[round(float(v), 6) for v in row] for row in rng.standard_normal((n_cells, dim))]


def _dots(vec: Column, cents: list[list[float]]) -> Column:
    return F.array(
        *[
            F.round(
                F.aggregate(
                    F.zip_with(
                        vec, F.array(*[F.lit(v) for v in c]),
                        lambda x, y: x.cast("double") * y,
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ),
                6,
            )
            for c in cents
        ]
    )


def ivf_cell(vec: Column, cents: list[list[float]]) -> Column:
    """IVF cell id: index of the max-dot-product centroid (1-based;
    deterministic first-max tie-break, same in the DuckDB oracle)."""
    d = _dots(vec, cents)
    return F.array_position(d, F.array_max(d))


def sql_ivf_cell(vec_expr: str, cents: list[list[float]]) -> str:
    terms = ", ".join(
        "ROUND(list_sum(list_transform(range(1, %d + 1), "
        "i -> CAST(%s[i] AS DOUBLE) * (%s::DOUBLE[])[i])), 6)"
        % (len(c), vec_expr, "[" + ", ".join(repr(v) for v in c) + "]")
        for c in cents
    )
    return f"list_indexof([{terms}], list_max([{terms}]))"


def ivf_cells(vec: Column, cents: list[list[float]], nprobe: int) -> Column:
    """Multi-probe cell list: the ``nprobe`` nearest coarse centroids
    (1-based ids, best first; dot desc, cell-id asc ties — same total
    order as the DuckDB twin).  ``nprobe=1`` reduces to
    :func:`ivf_cell`'s choice."""
    d = _dots(vec, cents)
    ranked = F.array_sort(
        F.array(
            *[
                F.struct(
                    (-F.get(d, i)).alias("nd"), F.lit(i + 1).alias("cell")
                )
                for i in range(len(cents))
            ]
        )
    )
    return F.transform(
        F.slice(ranked, 1, nprobe), lambda s: s["cell"].cast("long")
    )


def sql_ivf_cells(vec_expr: str, cents: list[list[float]], nprobe: int) -> str:
    """DuckDB twin of :func:`ivf_cells` (list of nprobe 1-based cells,
    best first)."""
    pairs = ", ".join(
        "{'nd': -%s, 'cell': %d}"
        % (
            "ROUND(list_sum(list_transform(range(1, %d + 1), "
            "i -> CAST(%s[i] AS DOUBLE) * (%s::DOUBLE[])[i])), 6)"
            % (len(c), vec_expr, "[" + ", ".join(repr(v) for v in c) + "]"),
            ci + 1,
        )
        for ci, c in enumerate(cents)
    )
    return (
        f"list_transform(list_sort([{pairs}])[1:{nprobe}], s -> CAST(s.cell AS BIGINT))"
    )


def topk_cosine_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 8,
    dim: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    qid_col: str = "query_id",
) -> DataFrame:
    """IVF ANN: corpus rows are bucketed by nearest coarse centroid; each
    query scans ONLY its own cell (nprobe=1; production raises nprobe by
    unioning the top-p cells).  With the corpus table partitioned by cell
    this is a pruned scan — the standard inverted-file layout, same
    topology as FAISS IVF-Flat.  Recall < 1 by design at nprobe=1."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    cents = centroids(dim, n_cells)
    c = corpus.withColumn("_cell", ivf_cell(F.col(vec_col), cents)).alias("c")
    q = F.broadcast(queries.withColumn("_cell", ivf_cell(F.col(vec_col), cents))).alias("q")
    scored = c.join(q, F.col("c._cell") == F.col("q._cell")).select(
        F.col(f"q.{qid_col}").alias(qid_col),
        F.col(f"c.{id_col}").alias(id_col),
        F.round(cosine(F.col(f"c.{vec_col}"), F.col(f"q.{vec_col}")), 6).alias("cos"),
    )
    w = Window.partitionBy(qid_col).orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return scored.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") <= k).drop("_rk")


def embedding_dup_pairs_lsh(
    df: DataFrame,
    threshold: float = 0.5,
    n_planes: int = 4,
    dim: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Near-dup pairs restricted to equal LSH buckets — the 100 TB path for
    embedding dedup: the self-join key is the bucket id (2^n_planes
    buckets), so pair count drops from O(n^2) to O(sum bucket^2) and the
    shuffle is on small bucket keys.  High-cosine pairs land in the same
    bucket with prob (1 - theta/pi)^n_planes; raise tables/probes for
    recall, as in topk_cosine_lsh."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes)
    b = df.select(id_col, vec_col).withColumn("_b", lsh_bucket(F.col(vec_col), planes))
    a2, b2 = b.alias("a"), b.alias("b")
    joined = a2.join(
        b2,
        (F.col("a._b") == F.col("b._b")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    )
    cs = cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
    return joined.select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        F.round(cs, 6).alias("cos"),
    ).filter(F.col("cos") >= threshold)


def embedding_dup_pairs_lsh_gemm(
    df: DataFrame,
    threshold: float = 0.5,
    n_planes: int = 4,
    dim: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    chunk: int = 4096,
) -> DataFrame:
    """Production twin of :func:`embedding_dup_pairs_lsh`: identical bucket
    topology (one shuffle on the 2^n_planes bucket key) but the in-bucket
    all-pairs scoring is a BLAS GEMM per bucket chunk inside
    ``applyInPandas`` instead of interpreted per-pair HOF lambdas — the one
    remaining interpreted hot spot from the round-2 audit.  Rows are chunked
    so task memory stays O(chunk x bucket) even for degenerate buckets; the
    cosine is computed in the exact ``dot / outer(norms)`` form the oracle
    rounds, so the two twins share one DuckDB oracle.
    """
    import pandas as pd

    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes)
    b = df.select(id_col, vec_col).withColumn("_b", lsh_bucket(F.col(vec_col), planes))

    def _pairs(pdf: "pd.DataFrame") -> "pd.DataFrame":
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        mat = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)[order]
        nrm = np.linalg.norm(mat, axis=1)
        n = len(ids)
        cols = np.arange(n)
        out = []
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            sims = np.round((mat[s:e] @ mat.T) / np.outer(nrm[s:e], nrm), 6)
            rows_idx = np.arange(s, e)
            # ids ascending => column index > row index <=> id_b > id_a
            mask = (sims >= threshold) & (cols[None, :] > rows_idx[:, None])
            ii, jj = np.nonzero(mask)
            out.append(
                pd.DataFrame(
                    {"id_a": ids[rows_idx[ii]], "id_b": ids[jj], "cos": sims[ii, jj]}
                )
            )
        if not out:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos": []})
        return pd.concat(out)

    return b.groupBy("_b").applyInPandas(_pairs, schema="id_a long, id_b long, cos double")


def _bucket_queries(qrows, vec_col: str, qid_col: str):
    """Collected query rows (tiny by construction) -> bucket -> (qids, qmat,
    qnorms), with qids ascending for deterministic emission order."""
    by_bucket: dict[int, list] = {}
    for r in qrows:
        by_bucket.setdefault(r["_b"], []).append((r[qid_col], list(r[vec_col])))
    out = {}
    for bkt, rows in by_bucket.items():
        rows.sort(key=lambda t: t[0])
        qids = np.asarray([t[0] for t in rows], dtype=np.int64)
        qmat = np.asarray([t[1] for t in rows], dtype=np.float64)
        out[bkt] = (qids, qmat, np.linalg.norm(qmat, axis=1))
    return out


def _topk_bucketed_gemm(
    corpus_b: DataFrame,
    bucket_queries: dict,
    k: int,
    vec_col: str,
    id_col: str,
    qid_col: str,
) -> DataFrame:
    """Score corpus rows against the queries of their own bucket with one
    GEMM per (Arrow batch x bucket) group; emit batch-local top-k, merge in
    a tiny global window.  The ``isin`` filter prunes the scan to buckets
    that actually hold a query — with the corpus table partitioned by bucket
    this is partition pruning, the IVF/LSH scale mechanism.  No corpus
    shuffle at all: the only exchange is |batches| x |queries| x k rows."""
    import pandas as pd

    pruned = corpus_b.filter(
        F.col("_b").isin([int(b) for b in bucket_queries])
    ).select(id_col, vec_col, "_b")

    def _run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            out = []
            for bkt, sub in pdf.groupby("_b"):
                qids, qmat, qnorm = bucket_queries[bkt]
                mat = np.asarray(sub[vec_col].tolist(), dtype=np.float64)
                cnorm = np.linalg.norm(mat, axis=1)
                # round BEFORE ranking, tie-break by ascending id — matches
                # the global (cos desc, id asc) window and the oracle
                sims = np.round((mat @ qmat.T) / np.outer(cnorm, qnorm), 6)
                ids = sub[id_col].to_numpy()
                for j, qid in enumerate(qids):
                    col = sims[:, j]
                    top = np.lexsort((ids, -col))[:k]
                    out.append(
                        pd.DataFrame({qid_col: qid, id_col: ids[top], "cos": col[top]})
                    )
            if out:
                yield pd.concat(out)

    partial = pruned.mapInPandas(_run, schema=f"{qid_col} long, {id_col} long, cos double")
    w = Window.partitionBy(qid_col).orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return partial.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") <= k).drop("_rk")


def topk_cosine_lsh_gemm(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    dim: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    qid_col: str = "query_id",
) -> DataFrame:
    """Production twin of :func:`topk_cosine_lsh` — same single-probe bucket
    pruning, but in-bucket scoring is GEMM via mapInPandas.  Query buckets
    are computed with the SAME Spark expression as the corpus side (then
    collected — queries are small by construction) so assignment is
    bit-identical between the twins."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes)
    qrows = queries.withColumn("_b", lsh_bucket(F.col(vec_col), planes)).collect()
    corpus_b = corpus.withColumn("_b", lsh_bucket(F.col(vec_col), planes))
    return _topk_bucketed_gemm(
        corpus_b, _bucket_queries(qrows, vec_col, qid_col), k, vec_col, id_col, qid_col
    )


def topk_cosine_ivf_gemm(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 8,
    dim: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    qid_col: str = "query_id",
) -> DataFrame:
    """Production twin of :func:`topk_cosine_ivf` (nprobe=1): cell-pruned
    scan + per-cell GEMM scoring.  Same oracle as the HOF twin."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    cents = centroids(dim, n_cells)
    qrows = (
        queries.withColumn("_b", ivf_cell(F.col(vec_col), cents)).collect()
    )
    corpus_b = corpus.withColumn("_b", ivf_cell(F.col(vec_col), cents))
    return _topk_bucketed_gemm(
        corpus_b, _bucket_queries(qrows, vec_col, qid_col), k, vec_col, id_col, qid_col
    )


def topk_cosine_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    dim: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    qid_col: str = "query_id",
) -> DataFrame:
    """ANN variant: score only corpus rows sharing the query's LSH bucket.

    Recall < 1 by design (single probe); production raises n_tables /
    multi-probes.  The join key is the bucket id — with the corpus table
    partitioned by bucket this becomes a pruned scan instead of a full one.
    """
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes)
    c = corpus.withColumn("_b", lsh_bucket(F.col(vec_col), planes)).alias("c")
    q = F.broadcast(queries.withColumn("_b", lsh_bucket(F.col(vec_col), planes))).alias("q")
    scored = c.join(q, F.col("c._b") == F.col("q._b")).select(
        F.col(f"q.{qid_col}").alias(qid_col),
        F.col(f"c.{id_col}").alias(id_col),
        F.round(cosine(F.col(f"c.{vec_col}"), F.col(f"q.{vec_col}")), 6).alias("cos"),
    )
    w = Window.partitionBy(qid_col).orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return scored.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") <= k).drop("_rk")


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.3,
    n_cells: int = 8,
    dim: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    chunk: int = 4096,
    cents: list[list[float]] | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public):
    cluster embeddings into cells, then within each cell greedily keep the
    lowest-id member of every semantic-duplicate neighborhood.  Returns one
    row per input: (id, cell, is_dup, kept_by) — ``is_dup`` true iff some
    SAME-CELL row with a smaller id has cosine >= ``threshold``;
    ``kept_by`` is the smallest such id (NULL for keepers).  Downstream
    drops ``is_dup`` rows; keep-first-by-id makes the decision
    deterministic and order-independent.

    The third embedding-dedup scale path alongside the exact pair join
    (`dedup.embedding_dup_pairs`) and the LSH buckets
    (`embedding_dup_pairs_lsh*`): cluster-pruned comparison — O(sum
    cell^2) pairs, one shuffle on the cell id, per-cell BLAS GEMM scoring
    chunked so task memory stays O(chunk x cell).  Cell assignment uses
    the seeded deterministic centroids (`centroids()`); a trained k-means
    codebook drops in unchanged (the paper's setting — centroid quality
    affects recall, not the mechanism).
    """
    import pandas as pd

    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    if cents is None:
        cents = centroids(dim, n_cells)
    b = df.select(id_col, vec_col).withColumn("cell", ivf_cell(F.col(vec_col), cents))

    def _mark(pdf: "pd.DataFrame") -> "pd.DataFrame":
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        mat = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)[order]
        nrm = np.linalg.norm(mat, axis=1)
        cell = int(pdf["cell"].iloc[0])
        n = len(ids)
        cols = np.arange(n)
        kept_by = np.full(n, -1, dtype=np.int64)
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            sims = np.round((mat[s:e] @ mat.T) / np.outer(nrm[s:e], nrm), 6)
            rows_idx = np.arange(s, e)
            # ids ascending => column j qualifies iff j < global row index
            mask = (sims >= threshold) & (cols[None, :] < rows_idx[:, None])
            has = mask.any(axis=1)
            first = mask.argmax(axis=1)  # smallest qualifying column = min id
            kept_by[rows_idx[has]] = ids[first[has]]
        return pd.DataFrame(
            {
                id_col: ids,
                "cell": np.full(n, cell, dtype=np.int64),
                "is_dup": kept_by >= 0,
                "kept_by": pd.array(
                    [int(k) if k >= 0 else None for k in kept_by], dtype="Int64"
                ),
            }
        )

    return b.groupBy("cell").applyInPandas(
        _mark, schema=f"{id_col} long, cell long, is_dup boolean, kept_by long"
    )


def sql_semantic_dedup(
    table: str, threshold: float = 0.3, n_cells: int = 8, dim: int = 64
) -> str:
    """DuckDB oracle for :func:`semantic_dedup` — same seeded centroids,
    same rounded-cosine filter, keep-first-by-id via MIN over qualifying
    earlier same-cell neighbors."""
    cell = sql_ivf_cell("embedding", centroids(dim, n_cells))
    dot = (
        "list_sum(list_transform(range(1, {n} + 1), "
        "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )
    cs = (
        f"(({dot.format(a='a.embedding', b='b.embedding', n=dim)}) / "
        f"(sqrt({dot.format(a='a.embedding', b='a.embedding', n=dim)}) * "
        f"sqrt({dot.format(a='b.embedding', b='b.embedding', n=dim)})))"
    )
    return f"""
WITH e AS (
  SELECT vec_id, embedding, CAST({cell} AS BIGINT) AS cell FROM {table}
), d AS (
  SELECT b.vec_id AS vec_id, MIN(a.vec_id) AS kept_by
  FROM e a JOIN e b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE ROUND({cs}, 6) >= {threshold}
  GROUP BY b.vec_id
)
SELECT e.vec_id, e.cell, d.vec_id IS NOT NULL AS is_dup,
       COALESCE(d.kept_by, -1)::BIGINT AS kept_by
FROM e LEFT JOIN d USING (vec_id)
"""


def kmeans_refine(
    df: DataFrame,
    init: list[list[float]],
    iters: int = 5,
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Distributed spherical k-means (Lloyd's) refinement of a centroid
    codebook — the training step SemDeDup assumes (Abbas et al. 2023 use
    faiss k-means; this is the Spark-native equivalent).  Deterministic
    given ``init`` (ties break to the lowest cell index, matching
    :func:`ivf_cell`); returns the refined codebook, rounded to 6 places
    so it can be inlined as plan/SQL literals like :func:`centroids`.

    Scale design: each iteration is ONE pass — a zero-copy Arrow kernel
    GEMM-assigns every batch to its argmax-cosine cell and emits the
    k x dim per-cell (sum, count) PARTIALS (k rows per batch, not per
    vector); Spark reduces them with a posexplode + (cell, dim) hash
    aggregate whose exchange is k*dim tiny rows; the driver only ever
    touches the k x dim codebook.  No per-vector shuffle, no cached
    intermediate, O(k*dim) driver state — the standard scalable Lloyd's
    layout (same shape as MLlib's, rebuilt here so the codebook stays a
    deterministic plan literal).
    """
    import numpy as np  # noqa: F811 (module-level alias is fine too)

    k = len(init)
    dim = len(init[0])
    cents = np.asarray(init, dtype=np.float64)
    spark_f = F

    for _ in range(iters):
        c = cents  # bind the current codebook into the kernel closure

        def kernel(batches, _c=c):
            import numpy as np
            import pyarrow as pa

            from vector_spark.arena import warm_numpy_arena

            warm_numpy_arena()
            schema = pa.schema(
                [("cell", pa.int64()), ("vsum", pa.list_(pa.float64())), ("n", pa.int64())]
            )
            for batch in batches:
                if batch.num_rows == 0:
                    continue
                col = batch.column(0)
                flat = col.flatten().to_numpy(zero_copy_only=False)
                if len(flat) == batch.num_rows * _c.shape[1]:
                    mat = flat.reshape(batch.num_rows, -1).astype(np.float64)
                else:  # ragged/null rows: fall back to the safe path
                    mat = np.asarray(col.to_pylist(), dtype=np.float64)
                nrm = np.linalg.norm(mat, axis=1)
                nrm[nrm == 0] = 1.0
                # argmax cosine == argmax dot of the normalized rows
                cell = np.argmax((mat / nrm[:, None]) @ _c.T, axis=1)
                sums = np.zeros((len(_c), mat.shape[1]))
                np.add.at(sums, cell, mat)
                counts = np.bincount(cell, minlength=len(_c)).astype(np.int64)
                nz = np.nonzero(counts)[0]
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(nz.astype(np.int64)),
                        pa.array(list(sums[nz])),
                        pa.array(counts[nz]),
                    ],
                    schema=schema,
                )

        partials = df.select(vec_col).mapInArrow(
            kernel, schema="cell long, vsum array<double>, n long"
        )
        reduced = (
            partials.select("cell", "n", spark_f.posexplode("vsum").alias("d", "v"))
            .groupBy("cell", "d")
            .agg(spark_f.sum("v").alias("s"), spark_f.sum("n").alias("cnt"))
            .collect()
        )
        sums = np.zeros((k, dim))
        counts = np.zeros(k, dtype=np.int64)
        for r in reduced:
            sums[r["cell"], r["d"]] = r["s"]
            counts[r["cell"]] = r["cnt"]  # identical across a cell's d rows
        new = cents.copy()  # empty cells keep their previous centroid
        nzc = counts > 0
        means = sums[nzc] / counts[nzc, None]
        mn = np.linalg.norm(means, axis=1)
        mn[mn == 0] = 1.0
        new[nzc] = means / mn[:, None]  # spherical: re-normalize
        cents = new
    return [[round(float(v), 6) for v in row] for row in cents]


def init_maximin(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Deterministic farthest-point (Gonzalez maximin) codebook init for
    :func:`kmeans_refine`: seed with the lowest-id vector, then k-1 times
    add the vector minimizing its max cosine to the chosen set (ties break
    to the lowest id).  k-1 narrow passes, each reduced by a 1-row
    TakeOrdered — no shuffle of the corpus.  Avoids the empty/merged-cell
    local optima random Gaussian seeding falls into."""
    def _unit(vec) -> list[float]:
        a = np.asarray(list(vec), dtype=np.float64)
        n = float(np.linalg.norm(a)) or 1.0
        return [round(float(v), 6) for v in a / n]

    first = df.select(id_col, vec_col).orderBy(id_col).first()
    chosen = [_unit(first[vec_col])]
    for _ in range(k - 1):
        d = _dots(F.col(vec_col), chosen)  # chosen rows are unit directions
        norm = F.sqrt(
            F.aggregate(
                F.transform(F.col(vec_col), lambda x: x.cast("double") * x),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )
        score = F.round(F.array_max(d) / norm, 6)  # max cosine to chosen set
        nxt = (
            df.select(id_col, vec_col, score.alias("_s"))
            .orderBy(F.asc("_s"), F.asc(id_col))
            .first()
        )
        chosen.append(_unit(nxt[vec_col]))
    return chosen
