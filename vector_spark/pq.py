"""Product-quantization (PQ) embedding compression + ADC top-k search.

The memory side of the 100 TB similarity story: `similarity.py` prunes
the SCAN (LSH buckets, IVF cells); PQ compresses the VECTORS themselves
— dim float32 (256 B at dim=64) down to ``m`` uint8 codes (8 B at m=8) —
so a 10^12-row embedding corpus fits executor memory for in-partition
re-ranking.  Public algorithm: Jégou, Douze, Schmid, "Product
Quantization for Nearest Neighbor Search", TPAMI 2011 (the FAISS
IVFADC building block; `similarity.topk_cosine_ivf` supplies the IVF
coarse stage this composes with).

Mechanics: split each vector into ``m`` contiguous subvectors; quantize
each against its own ``k``-entry codebook (nearest centroid by L2);
a query is answered with an Asymmetric Distance Computation (ADC) —
per subspace a k-entry lookup table of query-to-centroid distances,
a corpus row's approximate distance is the sum of its codes' table
entries.  One table gather per row, no per-row float math.

Determinism contract (the repo-wide idiom): codebooks are seeded
Gaussians rounded to 6 dp so SQL literals are exact; per-subspace
distances are ROUND(·, 6)-ed before the argmin (tie → lowest centroid
index); ADC tables are computed ONCE driver-side and quantized to
integer micro-units, so every downstream sum/rank is integer — order
independent and hash-stable across engines.

Scale design: encoding is one narrow Arrow kernel pass (vectorized
per-centroid distance accumulation, no join, no shuffle); search
broadcasts the integer tables in the task closure, each batch emits its
local top-k (integer scores, id-asc ties — safe to prune locally), and
the final exchange carries |tasks|·|queries|·k rows into a tiny window.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

PQ_SEED = 1234 + 7
_MICRO = 1_000_000


def pq_codebooks(
    dim: int, m: int, k: int, seed: int = PQ_SEED
) -> list[list[list[float]]]:
    """``m`` codebooks of ``k`` centroids over ``dim // m`` coords each
    (seeded Gaussian, rounded so SQL literals are exact).  A trained
    per-subspace k-means codebook (see `similarity.kmeans_refine`) drops
    in unchanged — codebook quality affects recall, not the plumbing."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    rng = np.random.default_rng(seed)
    sub = dim // m
    return [
        [[round(float(v), 6) for v in row] for row in rng.standard_normal((k, sub))]
        for _ in range(m)
    ]


def _encode_np(X: "np.ndarray", books) -> "np.ndarray":
    """(n, m) int codes; per-subspace distances accumulated sequentially
    per coordinate (the SQL fold order) and rounded to 6 dp before the
    argmin, ties to the lowest centroid index (np.argmin first-min)."""
    n = len(X)
    m, k, sub = len(books), len(books[0]), len(books[0][0])
    codes = np.empty((n, m), dtype=np.int64)
    for mi in range(m):
        seg = X[:, mi * sub : (mi + 1) * sub].astype(np.float64)
        d = np.empty((n, k), dtype=np.float64)
        for ci, cent in enumerate(books[mi]):
            acc = np.zeros(n, dtype=np.float64)
            for j, cj in enumerate(cent):
                diff = seg[:, j] - cj
                acc = acc + diff * diff
            d[:, ci] = acc
        codes[:, mi] = np.argmin(np.round(d, 6), axis=1)
    return codes


def pq_encode(
    df: DataFrame,
    books,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id_col, codes array<long> of length m): each vector quantized to
    its per-subspace nearest-centroid indices.  One narrow kernel pass."""

    def kernel(batches):
        import pyarrow as pa

        from vector_spark.arena import warm_numpy_arena

        warm_numpy_arena()
        m = len(books)
        schema = pa.schema([(id_col, pa.int64()), ("codes", pa.list_(pa.int64()))])
        for batch in batches:
            if batch.num_rows == 0:
                continue
            X = (
                batch.column(vec_col)
                .flatten()
                .to_numpy(zero_copy_only=False)
                .astype(np.float64)
                .reshape(batch.num_rows, -1)
            )  # zero-copy flat buffer, no per-row Python lists
            codes = _encode_np(X, books)
            offsets = np.arange(0, (batch.num_rows + 1) * m, m, dtype=np.int32)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(id_col).cast(pa.int64()),
                    pa.ListArray.from_arrays(
                        pa.array(offsets), pa.array(codes.ravel())
                    ),
                ],
                schema=schema,
            )

    return df.select(id_col, vec_col).mapInArrow(
        kernel, schema=f"{id_col} long, codes array<long>"
    )


def pq_lut_int(qvec, books) -> list[list[int]]:
    """[m][k] ADC table for one query, in integer micro-units:
    floor(1e6 · ||q_sub − c||²) with the same sequential fold as
    :func:`_encode_np`.  Computed once driver-side; every engine consumes
    the same integers."""
    m, sub = len(books), len(books[0][0])
    out = []
    for mi in range(m):
        seg = [float(v) for v in qvec[mi * sub : (mi + 1) * sub]]
        row = []
        for cent in books[mi]:
            acc = 0.0
            for j, cj in enumerate(cent):
                diff = seg[j] - cj
                acc = acc + diff * diff
            row.append(int(np.floor(acc * _MICRO)))
        out.append(row)
    return out


def pq_topk(
    corpus: DataFrame,
    query_vectors: dict[int, list[float]],
    books,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    qid_col: str = "query_id",
) -> DataFrame:
    """ADC top-k: (qid_col, id_col, dist_micro) — the k corpus rows with
    the smallest summed table distances per query (ties id asc).  Codes
    are computed on the fly (compose with a persisted `pq_encode` output
    in a deployment); scores are integers end-to-end."""
    qids = sorted(query_vectors)
    luts = {q: np.asarray(pq_lut_int(query_vectors[q], books), dtype=np.int64)
            for q in qids}

    def kernel(batches):
        import pyarrow as pa

        from vector_spark.arena import warm_numpy_arena

        warm_numpy_arena()
        m = len(books)
        schema = pa.schema(
            [(qid_col, pa.int64()), (id_col, pa.int64()), ("dist_micro", pa.int64())]
        )
        cols = np.arange(m)
        for batch in batches:
            if batch.num_rows == 0:
                continue
            X = (
                batch.column(vec_col)
                .flatten()
                .to_numpy(zero_copy_only=False)
                .astype(np.float64)
                .reshape(batch.num_rows, -1)
            )  # zero-copy flat buffer, no per-row Python lists
            codes = _encode_np(X, books)
            ids = batch.column(id_col).cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            for q in qids:
                dist = luts[q][cols, codes].sum(axis=1)  # integer gather+sum
                top = np.lexsort((ids, dist))[:k]  # batch-local top-k
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(np.full(len(top), q, dtype=np.int64)),
                        pa.array(ids[top]),
                        pa.array(dist[top]),
                    ],
                    schema=schema,
                )

    partial = corpus.select(id_col, vec_col).mapInArrow(
        kernel, schema=f"{qid_col} long, {id_col} long, dist_micro long"
    )
    w = Window.partitionBy(qid_col).orderBy(
        F.col("dist_micro").asc(), F.col(id_col).asc()
    )
    return (
        partial.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def pq_topk_ivf(
    corpus: DataFrame,
    query_vectors: dict[int, list[float]],
    books,
    cents: list[list[float]],
    k: int = 5,
    nprobe: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    qid_col: str = "query_id",
) -> DataFrame:
    """IVFADC (Jégou et al. 2011 §V): the IVF coarse quantizer prunes the
    scan to each query's ``nprobe`` nearest cells (`similarity.ivf_cells`,
    codegen — the filter reaches the scan), then PQ codes + the integer
    ADC table rank only in-probe rows.  At 10^12 vectors this is the full
    FAISS composition: cells bound the scan, 8-byte codes bound the
    memory, the table gather bounds the math; ``nprobe`` is the standard
    recall/scan-cost dial.  Same determinism contract as
    :func:`pq_topk`."""
    from vector_spark.similarity import ivf_cells

    spark = corpus.sparkSession
    qids = sorted(query_vectors)
    # assign query probe cells with the SAME engine + expression as the
    # corpus rows, so assignment can never disagree with the scan filter
    qdf = spark.createDataFrame(
        [(q, [float(v) for v in query_vectors[q]]) for q in qids],
        f"{qid_col} long, {vec_col} array<float>",
    )
    qcells = {
        int(r[qid_col]): np.asarray(r["_cells"], dtype=np.int64)
        for r in qdf.withColumn(
            "_cells", ivf_cells(F.col(vec_col), cents, nprobe)
        ).collect()
    }
    luts = {q: np.asarray(pq_lut_int(query_vectors[q], books), dtype=np.int64)
            for q in qids}
    from vector_spark.similarity import ivf_cell

    probe_union = sorted({int(c) for cs in qcells.values() for c in cs})
    pruned = corpus.withColumn("_cell", ivf_cell(F.col(vec_col), cents)).filter(
        F.col("_cell").isin(*probe_union)
    )

    def kernel(batches):
        import pyarrow as pa

        from vector_spark.arena import warm_numpy_arena

        warm_numpy_arena()
        m = len(books)
        schema = pa.schema(
            [(qid_col, pa.int64()), (id_col, pa.int64()), ("dist_micro", pa.int64())]
        )
        cols = np.arange(m)
        for batch in batches:
            if batch.num_rows == 0:
                continue
            X = (
                batch.column(vec_col)
                .flatten()
                .to_numpy(zero_copy_only=False)
                .astype(np.float64)
                .reshape(batch.num_rows, -1)
            )  # zero-copy flat buffer, no per-row Python lists
            codes = _encode_np(X, books)
            ids = batch.column(id_col).cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            cells = batch.column("_cell").to_numpy(zero_copy_only=False)
            for q in qids:
                sel = np.isin(cells, qcells[q])
                if not sel.any():
                    continue
                dist = luts[q][cols, codes[sel]].sum(axis=1)
                sids = ids[sel]
                top = np.lexsort((sids, dist))[:k]
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(np.full(len(top), q, dtype=np.int64)),
                        pa.array(sids[top]),
                        pa.array(dist[top]),
                    ],
                    schema=schema,
                )

    partial = pruned.select(id_col, vec_col, "_cell").mapInArrow(
        kernel, schema=f"{qid_col} long, {id_col} long, dist_micro long"
    )
    w = Window.partitionBy(qid_col).orderBy(
        F.col("dist_micro").asc(), F.col(id_col).asc()
    )
    return (
        partial.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def sql_pq_topk_ivf(
    src_sql: str,
    query_luts: dict[int, list[list[int]]],
    books,
    cents: list[list[float]],
    query_src_sql: str,
    k: int = 5,
    nprobe: int = 1,
    id_col: str = "vec_id",
) -> str:
    """DuckDB oracle for :func:`pq_topk_ivf`: cells from the literal
    `sql_ivf_cell`/`sql_ivf_cells` expressions on BOTH sides (corpus rows
    and the query rows in ``query_src_sql``, which must yield
    (vec_id, embedding)), codes + integer ADC identical to
    :func:`sql_pq_topk`, ranking restricted to each query's nprobe
    cells."""
    from vector_spark.similarity import sql_ivf_cell, sql_ivf_cells

    cell_expr = sql_ivf_cell("embedding", cents)
    probe_expr = sql_ivf_cells("embedding", cents, nprobe)
    codes = sql_pq_codes(src_sql, books, id_col)
    lut_rows = ", ".join(
        f"({q}, {mi}, {ci}, {val})"
        for q in sorted(query_luts)
        for mi, row in enumerate(query_luts[q])
        for ci, val in enumerate(row)
    )
    return f"""
WITH cells AS (
  SELECT {id_col}, {cell_expr} AS cell FROM {src_sql}
), qcell AS (
  SELECT query_id, unnest(probes) AS cell FROM (
    SELECT {id_col} AS query_id, {probe_expr} AS probes FROM {query_src_sql}
  )
), codes AS ({codes}),
lut(query_id, m, code, d) AS (VALUES {lut_rows}),
dist AS (
  SELECT l.query_id, c.{id_col},
         CAST(SUM(l.d) AS BIGINT) AS dist_micro
  FROM codes c
  JOIN cells ce ON ce.{id_col} = c.{id_col}
  JOIN qcell qc ON qc.cell = ce.cell
  JOIN lut l ON l.query_id = qc.query_id AND l.m = c.m AND l.code = c.code
  GROUP BY l.query_id, c.{id_col}
)
SELECT query_id, {id_col}, dist_micro FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY dist_micro ASC, {id_col} ASC) AS rk
  FROM dist
) WHERE rk <= {k}
"""


def _sql_sub_dist(vec_expr: str, mi: int, sub: int, cent) -> str:
    """Rounded L2² of subvector mi against one centroid — the literal
    fold the kernel mirrors."""
    terms = " + ".join(
        f"((CAST({vec_expr}[{mi * sub + j + 1}] AS DOUBLE) - {cj!r}) * "
        f"(CAST({vec_expr}[{mi * sub + j + 1}] AS DOUBLE) - {cj!r}))"
        for j, cj in enumerate(cent)
    )
    return f"ROUND({terms}, 6)"


def sql_pq_codes(src_sql: str, books, id_col: str = "vec_id") -> str:
    """DuckDB CTE body: (id, m, code) — per-subspace argmin with the
    (distance, centroid-index) tie order."""
    sub = len(books[0][0])
    arms = []
    for mi, book in enumerate(books):
        dists = ", ".join(
            f"({ci}, {_sql_sub_dist('embedding', mi, sub, cent)})"
            for ci, cent in enumerate(book)
        )
        arms.append(
            f"SELECT {id_col}, {mi} AS m, "
            f"(SELECT ci FROM (VALUES {dists}) AS t(ci, d) ORDER BY d, ci LIMIT 1)"
            f" AS code FROM {src_sql}"
        )
    return " UNION ALL ".join(arms)


def sql_pq_encode(src_sql: str, books, id_col: str = "vec_id") -> str:
    """DuckDB oracle for :func:`pq_encode` (codes rendered CSV)."""
    codes = sql_pq_codes(src_sql, books, id_col)
    return f"""
WITH codes AS ({codes})
SELECT {id_col},
       string_agg(CAST(code AS VARCHAR), ',' ORDER BY m) AS codes_csv
FROM codes GROUP BY {id_col}
"""


def sql_pq_topk(
    src_sql: str,
    query_luts: dict[int, list[list[int]]],
    books,
    k: int = 5,
    id_col: str = "vec_id",
) -> str:
    """DuckDB oracle for :func:`pq_topk`: same codes CTE, the SAME integer
    ADC tables (passed in, embedded as literals), integer sum + window."""
    codes = sql_pq_codes(src_sql, books, id_col)
    lut_rows = ", ".join(
        f"({q}, {mi}, {ci}, {val})"
        for q in sorted(query_luts)
        for mi, row in enumerate(query_luts[q])
        for ci, val in enumerate(row)
    )
    return f"""
WITH codes AS ({codes}),
lut(query_id, m, code, d) AS (VALUES {lut_rows}),
dist AS (
  SELECT l.query_id, c.{id_col},
         CAST(SUM(l.d) AS BIGINT) AS dist_micro
  FROM codes c JOIN lut l ON l.m = c.m AND l.code = c.code
  GROUP BY l.query_id, c.{id_col}
)
SELECT query_id, {id_col}, dist_micro FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY dist_micro ASC, {id_col} ASC) AS rk
  FROM dist
) WHERE rk <= {k}
"""
