"""Unit semantics for Gopher-style repetition signals
(vector_spark/repetition.py).  The oracle-parity gate cross-checks the
full pipeline against DuckDB at sf0.01; these pin the counting rules on
tiny inputs with hand-computed expectations.
"""

from __future__ import annotations

from vector_spark.repetition import repetition_signals


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, tokens array<int>")


def _one(df, doc_id):
    return {r["doc_id"]: r for r in df.collect()}[doc_id]


def test_dup_unigram_fraction(spark):
    # 6 tokens, 4 distinct -> (6-4)/6
    out = _one(repetition_signals(_docs(spark, [("a", [1, 1, 2, 3, 4, 1])])), "a")
    assert out["n_tok"] == 6
    assert abs(out["dup_unigram_frac"] - round(2 / 6, 6)) < 1e-9


def test_top_bigram_fraction(spark):
    # bigrams of [1,2,1,2,1]: (1,2)x2, (2,1)x2 -> top 2 of 4
    out = _one(repetition_signals(_docs(spark, [("a", [1, 2, 1, 2, 1])])), "a")
    assert abs(out["top_bigram_frac"] - 0.5) < 1e-9


def test_dup_5gram_fraction_and_short_doc_nulls(spark):
    # [1,2,3,4,5,1,2,3,4,5,1,2,3,4,5]: 11 5-grams; (1..5) occurs 3x,
    # each of the 4 rotations occurs 2x -> all 11 are dup occurrences
    df = _docs(spark, [("a", [1, 2, 3, 4, 5] * 3), ("b", [1, 2, 3]), ("c", [])])
    rows = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert rows["a"]["dup_5gram_frac"] == 1.0
    # doc b: too short for 5-grams, has bigrams/unigrams
    assert rows["b"]["dup_5gram_frac"] is None
    assert rows["b"]["dup_unigram_frac"] == 0.0
    # doc c: empty -> every signal null, row still present
    assert rows["c"]["n_tok"] == 0
    assert rows["c"]["dup_unigram_frac"] is None
    assert rows["c"]["top_bigram_frac"] is None


def test_all_unique_scores_zero(spark):
    out = _one(repetition_signals(_docs(spark, [("a", list(range(40)))])), "a")
    assert out["dup_unigram_frac"] == 0.0
    assert out["top_bigram_frac"] == round(1 / 39, 6)
    assert out["dup_5gram_frac"] == 0.0
