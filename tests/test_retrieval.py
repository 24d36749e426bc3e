"""BM25 top-k retrieval (vector_spark/retrieval.py): brute-force Python
reference on a tiny fixture, determinism of the tiebreak, and the
no-Python-worker plan assertion."""

from __future__ import annotations

import math

from vector_spark.retrieval import bm25_topk

DOCS = [
    ("d1", [1, 2, 2, 3]),
    ("d2", [2, 4, 4, 4, 5]),
    ("d3", [1, 1, 1, 1]),
    ("d4", [6, 7]),
    ("d5", [2, 1, 2, 1, 2, 9]),
]


def _ref_scores(terms, k1=1.2, b=0.75):
    n = len(DOCS)
    avgdl = sum(len(t) for _, t in DOCS) / n
    out = {}
    for doc_id, toks in DOCS:
        s = 0.0
        for t in terms:
            df = sum(1 for _, tt in DOCS if t in tt)
            tf = float(toks.count(t))
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s += idf * ((tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * (len(toks) / avgdl))))
        if any(t in toks for t in terms):
            out[doc_id] = s
    return out


def test_bm25_matches_reference(spark):
    df = spark.createDataFrame(
        [(d, t, len(t)) for d, t in DOCS], "doc_id string, tokens array<int>, n_tok int"
    )
    got = bm25_topk(df, [1, 2], k=3).collect()
    ref = _ref_scores([1, 2])
    want = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert [(r["doc_id"]) for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert abs(r["score"] - s) < 1e-12
    # d4 contains neither term: pruned, never scored
    assert "d4" not in {r["doc_id"] for r in got}


def test_bm25_plan_jvm_only(spark):
    df = spark.createDataFrame(
        [(d, t, len(t)) for d, t in DOCS], "doc_id string, tokens array<int>, n_tok int"
    )
    plan = bm25_topk(df, [1, 2], k=2)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "InPandas" not in plan
    # global top-k must be the per-partition heap operator, not a full sort
    assert "TakeOrderedAndProject" in plan
