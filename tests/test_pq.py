"""Unit semantics for product-quantization compression + ADC search
(vector_spark/pq.py).  The oracle gates (`pq_encode`, `pq_topk`) cover
the sf0.01 embeddings; these pin the algorithm against hand-built
codebooks and a pure-Python ADC reference.
"""

from __future__ import annotations

import random

import numpy as np

from vector_spark.pq import (
    pq_codebooks,
    pq_encode,
    pq_lut_int,
    pq_topk,
)


def _emb_rows(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_encode_exact_centroids(spark):
    # 2 subspaces x 2 dims, 3 centroids each; vectors placed ON centroids
    books = [
        [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]],
        [[2.0, 2.0], [-1.0, 0.0], [0.5, 0.5]],
    ]
    df = _emb_rows(
        spark,
        [
            (1, [1.0, 0.0, -1.0, 0.0]),   # sub0 -> c1, sub1 -> c1
            (2, [0.0, 1.0, 2.0, 2.0]),    # sub0 -> c2, sub1 -> c0
            (3, [0.0, 0.0, 0.5, 0.5]),    # sub0 -> c0, sub1 -> c2
        ],
    )
    got = {r["vec_id"]: list(r["codes"]) for r in pq_encode(df, books).collect()}
    assert got == {1: [1, 1], 2: [2, 0], 3: [0, 2]}


def test_encode_tie_breaks_to_lowest_index(spark):
    books = [[[1.0], [1.0], [3.0]]]  # c0 == c1: equidistant, pick 0
    df = _emb_rows(spark, [(1, [1.0])])
    assert list(pq_encode(df, books).collect()[0]["codes"]) == [0]


def _ref_topk(rows, qv, books, k):
    m, sub = len(books), len(books[0][0])
    out = []
    lut = pq_lut_int(qv, books)
    for vid, vec in rows:
        dist = 0
        for mi in range(m):
            seg = np.asarray(vec[mi * sub : (mi + 1) * sub], dtype=np.float64)
            d = [
                round(float(sum((seg[j] - c[j]) ** 2 for j in range(sub))), 6)
                for c in books[mi]
            ]
            code = min(range(len(d)), key=lambda ci: (d[ci], ci))
            dist += lut[mi][code]
        out.append((vid, dist))
    out.sort(key=lambda t: (t[1], t[0]))
    return out[:k]


def test_topk_matches_python_reference_fuzz(spark):
    rng = random.Random(17)
    dim, m, k_cb = 8, 4, 5
    books = pq_codebooks(dim, m, k_cb)
    rows = [
        (i, [round(rng.uniform(-2, 2), 3) for _ in range(dim)]) for i in range(150)
    ]
    qv = {0: rows[0][1], 1: rows[7][1]}
    df = _emb_rows(spark, rows).repartition(6)
    got = {
        (r["query_id"], r["vec_id"]): r["dist_micro"]
        for r in pq_topk(df, qv, books, k=7).collect()
    }
    want = {
        (q, vid): d for q, v in qv.items() for vid, d in _ref_topk(rows, v, books, 7)
    }
    assert got == want and len(got) == 14


def test_topk_ivf_matches_cell_restricted_reference(spark):
    from pyspark.sql import functions as F

    from vector_spark.pq import pq_topk_ivf
    from vector_spark.similarity import centroids, ivf_cell

    rng = random.Random(23)
    dim, m, k_cb = 8, 4, 5
    books = pq_codebooks(dim, m, k_cb)
    cents = centroids(dim, 4)
    rows = [
        (i, [round(rng.uniform(-2, 2), 3) for _ in range(dim)]) for i in range(200)
    ]
    qv = {0: rows[0][1], 3: rows[3][1]}
    df = _emb_rows(spark, rows).repartition(5)
    # cells from Spark's own assignment expression (the engine under test)
    cells = {
        r["vec_id"]: r["_c"]
        for r in df.withColumn("_c", ivf_cell(F.col("embedding"), cents)).collect()
    }
    got = {
        (r["query_id"], r["vec_id"]): r["dist_micro"]
        for r in pq_topk_ivf(df, qv, books, cents, k=6).collect()
    }
    want = {}
    for q, v in qv.items():
        in_cell = [(vid, vec) for vid, vec in rows if cells[vid] == cells[q]]
        for vid, d in _ref_topk(in_cell, v, books, 6):
            want[(q, vid)] = d
    assert got == want and len(got) > 0


def test_topk_ivf_multiprobe_covers_two_cells(spark):
    from pyspark.sql import functions as F

    from vector_spark.pq import pq_topk_ivf
    from vector_spark.similarity import centroids, ivf_cell, ivf_cells

    rng = random.Random(29)
    dim, m, k_cb = 8, 4, 5
    books = pq_codebooks(dim, m, k_cb)
    cents = centroids(dim, 4)
    rows = [
        (i, [round(rng.uniform(-2, 2), 3) for _ in range(dim)]) for i in range(200)
    ]
    qv = {0: rows[0][1], 3: rows[3][1]}
    df = _emb_rows(spark, rows).repartition(5)
    cells = {
        r["vec_id"]: r["_c"]
        for r in df.withColumn("_c", ivf_cell(F.col("embedding"), cents)).collect()
    }
    qdf = spark.createDataFrame(
        [(q, v) for q, v in qv.items()], "query_id long, embedding array<float>"
    )
    probes = {
        r["query_id"]: list(r["_p"])
        for r in qdf.withColumn(
            "_p", ivf_cells(F.col("embedding"), cents, 2)
        ).collect()
    }
    # nprobe=1 head of the probe list agrees with ivf_cell
    assert all(p[0] == cells[q] for q, p in probes.items())
    got = {
        (r["query_id"], r["vec_id"]): r["dist_micro"]
        for r in pq_topk_ivf(df, qv, books, cents, k=6, nprobe=2).collect()
    }
    want = {}
    for q, v in qv.items():
        in_probe = [(vid, vec) for vid, vec in rows if cells[vid] in probes[q]]
        for vid, d in _ref_topk(in_probe, v, books, 6):
            want[(q, vid)] = d
    assert got == want and len(got) > 0
    # multi-probe candidate pool strictly contains the single-probe pool
    single = {
        (r["query_id"], r["vec_id"])
        for r in pq_topk_ivf(df, qv, books, cents, k=200, nprobe=1).collect()
    }
    multi = {
        (r["query_id"], r["vec_id"])
        for r in pq_topk_ivf(df, qv, books, cents, k=200, nprobe=2).collect()
    }
    assert single < multi


def test_topk_self_query_ranks_itself_first(spark):
    books = pq_codebooks(8, 4, 8)
    rng = random.Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(50)]
    df = _emb_rows(spark, rows)
    out = pq_topk(df, {5: rows[5][1]}, books, k=1).collect()
    # the query IS corpus row 5: zero asymmetric self-distance gap means
    # its own codes minimize the table sum (ties id-asc keep it first
    # only if no other row shares all codes with a lower id — use dist)
    assert out[0]["dist_micro"] <= min(
        d for _, d in _ref_topk(rows, rows[5][1], books, 50)
    )
