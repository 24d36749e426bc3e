"""Unit semantics for benchmark decontamination (vector_spark/decontam.py).

The oracle-parity gate cross-checks the full pipeline against DuckDB at
sf0.01; these pin the n-gram counting semantics on tiny inputs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_spark.decontam import decontaminate, token_ngram_hashes


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, tokens array<int>")


def test_ngram_count_and_short_doc_guard(spark):
    df = _docs(spark, [("a", [1, 2, 3, 4]), ("b", [1, 2]), ("c", [])])
    out = token_ngram_hashes(df, n=3).groupBy("doc_id").count().collect()
    # len 4 -> 2 trigrams; len<3 -> none (and no descending-sequence blowup)
    assert {r["doc_id"]: r["count"] for r in out} == {"a": 2}


def test_hit_counting_with_multiplicity(spark):
    corpus = _docs(spark, [
        ("x", [1, 2, 3, 9, 1, 2, 3, 8]),  # trigram (1,2,3) occurs twice
        ("y", [7, 7, 7, 7]),
    ])
    bench = _docs(spark, [("q", [1, 2, 3])])
    out = {r["doc_id"]: r for r in decontaminate(corpus, bench, n=3).collect()}
    assert set(out) == {"x"}  # y has no overlap -> not in the drop list
    assert out["x"]["hits"] == 2 and out["x"]["n_grams"] == 6
    assert abs(out["x"]["frac"] - round(2 / 6, 6)) < 1e-9


def test_full_containment_scores_one(spark):
    doc = list(range(20))
    corpus = _docs(spark, [("x", doc)])
    bench = _docs(spark, [("q", doc)])
    r = decontaminate(corpus, bench, n=8).collect()[0]
    assert r["hits"] == r["n_grams"] == 13 and r["frac"] == 1.0


def test_fast_twin_matches_oracle_path(spark):
    corpus = _docs(spark, [
        ("x", [1, 2, 3, 9, 1, 2, 3, 8]),
        ("y", [7, 7, 7, 7]),
        ("z", list(range(30))),
    ])
    bench = _docs(spark, [("q", [1, 2, 3]), ("r", list(range(5, 15)))])
    slow = sorted(map(tuple, decontaminate(corpus, bench, n=3).collect()))
    fast = sorted(map(tuple, decontaminate(corpus, bench, n=3, fast=True).collect()))
    assert slow == fast


def test_benchmark_excerpt_flags_source_doc(spark):
    # excerpt of doc 'a' flags 'a' but not a disjoint doc
    corpus = _docs(spark, [("a", list(range(100, 140))), ("b", list(range(500, 540)))])
    bench = corpus.filter(F.col("doc_id") == "a").select(
        "doc_id", F.slice("tokens", 5, 16).alias("tokens")
    )
    out = {r["doc_id"] for r in decontaminate(corpus, bench, n=8).collect()}
    assert out == {"a"}
