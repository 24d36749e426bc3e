"""Unigram-LM EM trainer (unigram.train_unigram) — iterative, so
pytest-gated (train_bpe / kmeans_refine precedent): planted-unit
recovery, partitioning invariance, and the trained table must drop
straight into the oracle-gated encoder."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_spark.unigram import train_unigram, unigram_encode, word_census


def _corpus(spark, n=40):
    # planted multi-char units: "ab" and "xyz" dominate; filler chars vary
    rows = []
    for i in range(n):
        rows.append((i, "ab abab xyz abxyz " + "cd"[i % 2]))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_trainer_recovers_planted_units(spark):
    docs = _corpus(spark)
    pieces = train_unigram(docs, vocab_size=12, max_len=3, n_iter=3)
    by_piece = {p: lp for p, _, lp in pieces}
    assert "ab" in by_piece
    assert "xyz" in by_piece or ("xy" in by_piece and "yz" in by_piece)
    # planted unit must be more probable than any single filler char
    assert by_piece["ab"] > by_piece["c"]
    # contract shape: ids unique, positive; logps negative
    ids = [i for _, i, _ in pieces]
    assert len(set(ids)) == len(ids) and min(ids) >= 1
    assert all(lp < 0 for _, _, lp in pieces)


def test_trainer_partitioning_invariant(spark):
    docs = _corpus(spark)
    p1 = train_unigram(docs, vocab_size=12, max_len=3, n_iter=2)
    p2 = train_unigram(docs.repartition(7), vocab_size=12, max_len=3, n_iter=2)
    assert p1 == p2


def test_trained_table_feeds_encoder(spark):
    docs = _corpus(spark)
    pieces = train_unigram(docs, vocab_size=12, max_len=3, n_iter=2)
    out = unigram_encode(docs, pieces)
    rows = out.collect()
    assert all(r.n_unk == 0 for r in rows)  # char coverage -> no UNK
    assert all(r.n_tok > 0 for r in rows)
    # "ab" should be encoded as ONE piece by the trained model
    one = spark.createDataFrame([("0", "ab")], "doc_id string, text string")
    enc = unigram_encode(one, pieces).collect()[0]
    assert enc.n_tok == 1


def test_word_census(spark):
    docs = spark.createDataFrame(
        [(0, "a b a"), (1, "b a")], "doc_id long, text string"
    )
    got = {r.word: r.cnt for r in word_census(docs).collect()}
    assert got == {"a": 3, "b": 2}
