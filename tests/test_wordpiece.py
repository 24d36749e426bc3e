"""WordPiece greedy longest-match encode (vector_spark/wordpiece.py) —
BERT tokenizer semantics pinned case by case."""

from __future__ import annotations

from vector_spark.wordpiece import wordpiece_encode

VOCAB = [
    ("un", 1), ("##aff", 2), ("##able", 3), ("##a", 4), ("##ff", 5),
    ("aff", 6), ("able", 7), ("u", 8), ("##n", 9), ("x", 10),
]


def _enc(spark, texts):
    df = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)], "doc_id string, text string"
    )
    return {
        r.doc_id: r for r in wordpiece_encode(df, VOCAB, max_word_len=12).collect()
    }


def test_greedy_longest_and_continuation(spark):
    out = _enc(spark, ["unaffable"])
    # un + ##aff + ##able, never u + ##n + ...
    assert out["0"].ids == [1, 2, 3]
    assert out["0"].n_unk == 0


def test_first_vs_continuation_forms_differ(spark):
    # "affable" starts with the FIRST-position piece "aff", then "##able";
    # "able" alone uses the first-position "able"
    out = _enc(spark, ["affable able"])
    assert out["0"].ids == [6, 3, 7]


def test_unk_is_all_or_nothing(spark):
    # "unz": 'un' matches but 'z' has no continuation -> whole word UNK
    out = _enc(spark, ["unz able"])
    assert out["0"].ids == [0, 7]
    assert out["0"].n_unk == 1


def test_too_long_word_unks(spark):
    out = _enc(spark, ["x" * 13 + " x"])
    assert out["0"].ids == [0, 10]
    assert out["0"].n_unk == 1


def test_empty_and_whitespace_text(spark):
    out = _enc(spark, ["", "   "])
    assert out["0"].ids == [] and out["0"].n_tok == 0
    assert out["1"].ids == [] and out["1"].n_unk == 0


def test_reserved_unk_id_rejected(spark):
    import pytest

    df = spark.createDataFrame([("1", "x")], "doc_id string, text string")
    with pytest.raises(ValueError):
        wordpiece_encode(df, [("x", 0)])
