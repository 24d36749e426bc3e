"""Unit semantics for corpus vocabulary statistics (vector_spark/vocab.py).

The oracle-parity gate covers the sf0.01 corpus; these pin tiny-input
semantics: pair windows never cross docs, within-doc repeats count,
deterministic tie ordering, doc-frequency vs occurrence counts.
"""

from __future__ import annotations

from vector_spark.vocab import token_pair_stats, vocab_stats


def _rows(spark, data):
    return spark.createDataFrame(data, "doc_id string, tokens array<int>")


def test_pair_counts_and_ordering(spark):
    df = _rows(spark, [("a", [1, 2, 1, 2]), ("b", [2, 1, 2])])
    got = [tuple(r) for r in token_pair_stats(df, 10).collect()]
    # (1,2): a@1, a@3, b@2 = 3; (2,1): a@2, b@1 = 2
    assert got == [(1, 2, 3), (2, 1, 2)]


def test_pairs_do_not_cross_docs(spark):
    df = _rows(spark, [("a", [1, 9]), ("b", [9, 1])])
    got = {(r["t1"], r["t2"]): r["n_occ"] for r in token_pair_stats(df, 10).collect()}
    assert got == {(1, 9): 1, (9, 1): 1}  # no (9,9) from the doc boundary


def test_pair_short_docs_contribute_nothing(spark):
    df = _rows(spark, [("a", []), ("b", [7]), ("c", [7, 7])])
    got = [tuple(r) for r in token_pair_stats(df, 10).collect()]
    assert got == [(7, 7, 1)]


def test_pair_tie_break_is_key_order(spark):
    df = _rows(spark, [("a", [3, 4]), ("b", [1, 2])])
    got = [tuple(r) for r in token_pair_stats(df, 10).collect()]
    assert got == [(1, 2, 1), (3, 4, 1)]


def test_vocab_occ_vs_doc_frequency(spark):
    df = _rows(spark, [("a", [5, 5, 5]), ("b", [5, 6]), ("c", [6])])
    got = [tuple(r) for r in vocab_stats(df, 10).collect()]
    assert got == [(5, 4, 2), (6, 2, 2)]


def test_vocab_top_n_limit(spark):
    df = _rows(spark, [("a", [1, 1, 2, 2, 3])])
    got = [tuple(r) for r in vocab_stats(df, 2).collect()]
    assert got == [(1, 2, 1), (2, 2, 1)]


def test_remap_semantics(spark):
    from vector_spark.vocab import remap_tokens

    # freq: 5 x4, 6 x2, 9 x1 -> ranks 5->0, 6->1, 9->2; keep=2 => 9 is OOV(=2)
    df = _rows(spark, [("a", [5, 5, 5]), ("b", [5, 6]), ("c", [6, 9]), ("d", [])])
    got = {
        r["doc_id"]: (list(r["tokens"]), r["n_oov"])
        for r in remap_tokens(df, keep=2).collect()
    }
    assert got == {
        "a": ([0, 0, 0], 0),
        "b": ([0, 1], 0),
        "c": ([1, 2], 1),
        "d": ([], 0),
    }


def test_remap_oov_id_and_keep_zero(spark):
    from vector_spark.vocab import remap_tokens

    df = _rows(spark, [("a", [1, 2, 3])])
    got = remap_tokens(df, keep=0, oov_id=-1).collect()[0]
    assert list(got["tokens"]) == [-1, -1, -1] and got["n_oov"] == 3


def test_remap_fast_and_join_twins_agree(spark):
    import random

    from vector_spark.vocab import remap_tokens

    rng = random.Random(11)
    rows = [
        (f"d{i}", [rng.randrange(0, 25) for _ in range(rng.randrange(0, 40))])
        for i in range(80)
    ]
    df = _rows(spark, rows)
    fast = {
        r["doc_id"]: (list(r["tokens"]), r["n_oov"])
        for r in remap_tokens(df, keep=10, fast=True).collect()
    }
    slow = {
        r["doc_id"]: (list(r["tokens"]), r["n_oov"])
        for r in remap_tokens(df, keep=10, fast=False).collect()
    }
    assert fast == slow and len(fast) == 80


def test_pair_stats_approx_certifies_planted_head(spark):
    import random

    from vector_spark.vocab import token_pair_stats, token_pair_stats_approx

    rng = random.Random(31)
    rows = []
    # heavy pairs: (7,8) and (8,7) dominate; a wide uniform tail behind
    for i in range(40):
        rows.append((f"h{i}", [7, 8] * 30))
    for i in range(300):
        rows.append(
            (f"n{i}", [rng.randrange(100, 4000) for _ in range(40)])
        )
    df = _rows(spark, rows).repartition(4)
    exact = {
        (r["t1"], r["t2"]): r["n_occ"]
        for r in token_pair_stats(df, 10_000).collect()
    }
    got = token_pair_stats_approx(df, top_n=5, k_sketch=512).collect()
    err = got[0]["err_ub"]
    # every reported pair's bound brackets the exact count
    for r in got:
        true = exact[(r["t1"], r["t2"])]
        assert r["cnt_lb"] <= true <= r["cnt_lb"] + err
    # the two planted heavy pairs are found, in the exact order, and the
    # gap to the tail exceeds the certificate so the head is trustworthy
    assert [(r["t1"], r["t2"]) for r in got[:2]] == [(7, 8), (8, 7)]
    assert got[1]["cnt_lb"] - err > max(
        c for p, c in exact.items() if p not in {(7, 8), (8, 7)}
    )


def test_pair_stats_approx_exact_when_under_sketch_size(spark):
    from vector_spark.vocab import token_pair_stats, token_pair_stats_approx

    df = _rows(spark, [("a", [1, 2, 1, 2]), ("b", [2, 1, 2]), ("c", [5, 5, 5])])
    exact = [tuple(r) for r in token_pair_stats(df, 10).collect()]
    got = token_pair_stats_approx(df, top_n=10, k_sketch=64).collect()
    assert got[0]["err_ub"] == 0  # never spilled: counts are exact
    assert [(r["t1"], r["t2"], r["cnt_lb"]) for r in got] == exact


def test_fast_and_hof_twins_agree(spark):
    # incl. negative + INT_MAX tokens (the packed-key bijection edge)
    df = _rows(
        spark,
        [
            ("a", [1, 2, 1, 2]),
            ("b", [2, 1, 2]),
            ("c", []),
            ("d", [7]),
            ("e", [-3, -3, 2147483647, -3]),
        ],
    )
    for fn in (token_pair_stats, vocab_stats):
        fast = sorted(map(tuple, fn(df, 100, fast=True).collect()))
        slow = sorted(map(tuple, fn(df, 100, fast=False).collect()))
        assert fast == slow, fn.__name__


def test_pair_pmi_ranks_exclusive_collocations_first(spark):
    """A pair whose members only ever occur together maximizes PMI; the
    min_count floor drops rare pairs entirely."""
    import math

    from vector_spark.vocab import pair_pmi

    # (10,11) occur ONLY as a pair, 3 times; (1,2) also 3 times but 1 and 2
    # are common elsewhere; (5,6) occurs once -> under the floor
    df = _rows(
        spark,
        [
            ("a", [10, 11, 1, 2, 1, 1]),
            ("b", [10, 11, 1, 2, 2, 2]),
            ("c", [10, 11, 1, 2, 5, 6]),
        ],
    )
    got = [tuple(r) for r in pair_pmi(df, 10, min_count=3).collect()]
    pairs = [(t1, t2) for t1, t2, _, _ in got]
    assert (10, 11) in pairs and (1, 2) in pairs
    assert (5, 6) not in pairs  # min_count floor
    assert pairs[0] == (10, 11)  # exclusive pair wins
    # replay the quantized PMI for the winner: c_ab=3, c_a=c_b=3,
    # n_tok=18, n_pairs=15
    want = math.floor(math.log((3 / 15) / ((3 / 18) * (3 / 18))) * 1e6)
    assert got[0][2] == 3 and got[0][3] == want
