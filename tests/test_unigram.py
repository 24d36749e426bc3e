"""Unigram-LM Viterbi encode (vector_spark/unigram.py) — SentencePiece
segmentation semantics pinned case by case (global optimum, not greedy)."""

from __future__ import annotations

import pytest

from vector_spark.unigram import unigram_encode

M = -1_000_000  # 1 nat in micro-nats

PIECES = [
    # "abc" can be a+bc (-5) or ab+c (-3) or abc (-4) or a+b+c (-6)
    ("a", 1, 2 * M), ("b", 2, 2 * M), ("c", 3, 2 * M),
    ("ab", 4, 1 * M), ("bc", 5, 3 * M), ("abc", 6, 4 * M),
    ("x", 7, 1 * M),
]


def _enc(spark, texts):
    df = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)], "doc_id string, text string"
    )
    return {r.doc_id: r for r in unigram_encode(df, PIECES).collect()}


def test_global_optimum_beats_greedy(spark):
    # greedy longest-first would take "abc" (-4M); optimal is ab+c (-3M)
    out = _enc(spark, ["abc"])
    assert out["0"].ids == [4, 3]
    assert out["0"].score_micro == 3 * M


def test_single_pieces_when_no_better_split(spark):
    out = _enc(spark, ["ba"])  # only b+a possible
    assert out["0"].ids == [2, 1]
    assert out["0"].score_micro == 4 * M


def test_unreachable_word_unks_whole(spark):
    out = _enc(spark, ["azc x"])  # 'z' has no piece
    assert out["0"].ids == [0, 7]
    assert out["0"].n_unk == 1
    assert out["0"].score_micro == 1 * M  # only 'x' scores


def test_longest_piece_wins_score_ties(spark):
    # pieces where "ab" (-4M) exactly ties a+b (-2M + -2M): the longer
    # piece must win the tie (the documented tiebreak)
    pieces = [("a", 1, 2 * M), ("b", 2, 2 * M), ("ab", 3, 4 * M)]
    df = spark.createDataFrame([("0", "ab")], "doc_id string, text string")
    out = {r.doc_id: r for r in unigram_encode(df, pieces).collect()}
    assert out["0"].ids == [3]
    assert out["0"].score_micro == 4 * M


def test_empty_text(spark):
    out = _enc(spark, [""])
    assert out["0"].ids == [] and out["0"].n_tok == 0 and out["0"].score_micro == 0


def test_validation(spark):
    df = None
    with pytest.raises(ValueError):
        unigram_encode(df, [("x", 0, -1)])
    with pytest.raises(ValueError):
        unigram_encode(df, [("x", 1, 5)])
