"""Unit semantics for BPE merge application + training (vector_spark/bpe.py).

The oracle-parity gate (`bpe_encode`) covers the sf0.01 corpus; these pin
tiny-input semantics against a pure-Python leftmost-greedy reference:
overlap runs (a==b self-pairs), chained merges, doc boundaries, empties,
and deterministic training.
"""

from __future__ import annotations

import random

from vector_spark.bpe import apply_merges, train_bpe


def _rows(spark, data):
    return spark.createDataFrame(data, "doc_id string, tokens array<int>")


def _ref_apply(tokens, merges):
    toks = list(tokens)
    for a, b, c in merges:
        out, i = [], 0
        while i < len(toks):
            if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                out.append(c)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks


def test_apply_basic_and_chained(spark):
    # (0,1)->7 then (7,2)->9: the second merge consumes the first's output
    df = _rows(spark, [("a", [0, 1, 2, 0, 1]), ("b", [0, 0, 1, 1])])
    got = {r["doc_id"]: list(r["tokens"]) for r in
           apply_merges(df, [(0, 1, 7), (7, 2, 9)]).collect()}
    assert got == {"a": [9, 7], "b": [0, 7, 1]}


def test_apply_self_pair_runs_leftmost_greedy(spark):
    df = _rows(spark, [("a", [5, 5, 5]), ("b", [5, 5, 5, 5]), ("c", [5, 5, 5, 5, 5])])
    got = {r["doc_id"]: list(r["tokens"]) for r in
           apply_merges(df, [(5, 5, 9)]).collect()}
    assert got == {"a": [9, 5], "b": [9, 9], "c": [9, 9, 5]}


def test_apply_empty_and_single(spark):
    df = _rows(spark, [("a", []), ("b", [3])])
    got = {r["doc_id"]: (list(r["tokens"]), r["n_tok"]) for r in
           apply_merges(df, [(3, 3, 9)]).collect()}
    assert got == {"a": ([], 0), "b": ([3], 1)}


def test_apply_matches_python_reference_fuzz(spark):
    rng = random.Random(13)
    rows = [
        (f"d{i}", [rng.randrange(0, 5) for _ in range(rng.randrange(0, 30))])
        for i in range(120)
    ]
    merges = [(0, 1, 5), (2, 2, 6), (5, 6, 7), (3, 3, 8), (8, 8, 9)]
    df = _rows(spark, rows)
    got = {r["doc_id"]: list(r["tokens"]) for r in
           apply_merges(df, merges).collect()}
    want = {d: _ref_apply(t, merges) for d, t in rows}
    assert got == want


def test_train_learns_planted_pair_and_is_deterministic(spark):
    # (1,2) dominates; merge 0 mints 100, then (100,3) dominates round 2
    rows = [("d%d" % i, [1, 2, 3, 1, 2, 3, 4]) for i in range(20)]
    df = _rows(spark, rows)
    merges = train_bpe(df, 2, new_id_start=100)
    assert merges == [(1, 2, 100), (100, 3, 101)]
    assert train_bpe(df.repartition(7), 2, new_id_start=100) == merges


def test_train_min_count_stops_early(spark):
    df = _rows(spark, [("a", [1, 2])])
    assert train_bpe(df, 5, new_id_start=10, min_count=2) == []


# ---------------------------------------------------------------------------
# byte-level tokenize (raw text -> UTF-8 byte ids)


def test_byte_tokenize_matches_python_utf8(spark):
    from vector_spark.bpe import byte_tokenize

    texts = ["hello world", "", "héllo — ünïcode ✓", "tab\tnew\nline", None]
    df = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)], "doc_id string, text string"
    )
    got = {r["doc_id"]: list(r["tokens"]) for r in byte_tokenize(df).collect()}
    for i, t in enumerate(texts):
        assert got[str(i)] == list((t or "").encode("utf-8"))


def test_byte_tokenize_feeds_apply_merges(spark):
    from vector_spark.bpe import apply_merges, byte_tokenize

    df = spark.createDataFrame(
        [("a", "tab table tabl")], "doc_id string, text string"
    )
    toks = byte_tokenize(df).select("doc_id", "tokens")
    merges = [(116, 97, 256), (256, 98, 257), (257, 108, 258)]
    got = list(apply_merges(toks, merges).collect()[0]["tokens"])
    want = _ref_apply(list("tab table tabl".encode()), merges)
    assert got == want
    # 'tab' collapsed to one id, 'tabl' to one id
    assert 257 in got and 258 in got


def test_byte_detokenize_roundtrip_unicode(spark):
    from vector_spark.bpe import byte_detokenize, byte_tokenize

    texts = ["hello", "héllo — ünïcode ✓", "", "tab\tnew\nline"]
    df = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)], "doc_id string, text string"
    )
    out = byte_detokenize(
        byte_tokenize(df).select("doc_id", "tokens"), out_col="rt"
    ).collect()
    got = {r["doc_id"]: r["rt"] for r in out}
    for i, t in enumerate(texts):
        assert got[str(i)] == t


def test_byte_detokenize_expands_merges(spark):
    from vector_spark.bpe import apply_merges, byte_detokenize, byte_tokenize, expand_merges

    merges = [(116, 97, 256), (256, 98, 257), (257, 108, 258)]
    assert expand_merges(merges)[258] == [116, 97, 98, 108]
    df = spark.createDataFrame(
        [("a", "tabl tab ta t")], "doc_id string, text string"
    )
    toks = apply_merges(byte_tokenize(df).select("doc_id", "tokens"), merges)
    assert 258 in list(toks.collect()[0]["tokens"])  # merge actually fired
    rt = byte_detokenize(toks, merges=merges, out_col="rt").collect()[0]["rt"]
    assert rt == "tabl tab ta t"


# --- GPT-2 pre-tokenization (public OpenAI gpt-2 encoder.py pattern) ---

# Hand-checked against the canonical pattern's behavior (contractions,
# space-glued words/digits/punct runs, the trailing-whitespace lookahead).
_GPT2_GOLDENS = {
    "Hello world": ["Hello", " world"],
    "I've  got 123 apples!": ["I", "'ve", " ", " got", " 123", " apples", "!"],
    "it's   done...": ["it", "'s", "  ", " done", "..."],
    "  leading and trailing  ": [" ", " leading", " and", " trailing", "  "],
    "tab\tsep\nnewline": ["tab", "\t", "sep", "\n", "newline"],
    "CamelCase99mix": ["CamelCase", "99", "mix"],
    "naïve café €5": ["naïve", " café", " €", "5"],
    "don't DON'T": ["don", "'t", " DON", "'", "T"],
    "a,b;c": ["a", ",", "b", ";", "c"],
    "": [],
}


def test_gpt2_pretokenize_goldens(spark):
    from vector_spark.bpe import gpt2_pretokenize

    cases = list(_GPT2_GOLDENS)
    df = spark.createDataFrame(
        [(str(i), c) for i, c in enumerate(cases)], "doc_id string, text string"
    )
    got = {r["doc_id"]: list(r["pieces"]) for r in gpt2_pretokenize(df).collect()}
    for i, c in enumerate(cases):
        assert got[str(i)] == _GPT2_GOLDENS[c], (c, got[str(i)])


def test_gpt2_pieces_tile_the_text(spark):
    """The pattern must tile: concat(pieces) == text for arbitrary input."""
    from vector_spark.bpe import gpt2_pretokenize

    texts = list(_GPT2_GOLDENS) + ["x" * 300, " \t\n mixed 12a!?§ü end "]
    df = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)], "doc_id string, text string"
    )
    got = {r["doc_id"]: "".join(r["pieces"]) for r in gpt2_pretokenize(df).collect()}
    for i, t in enumerate(texts):
        assert got[str(i)] == t


def test_gpt2_boundary_sentinel_blocks_cross_piece_merges(spark):
    """'ta' merge must fire inside a piece but never across the ' t'|'a'
    boundary of two adjacent pieces."""
    from vector_spark.bpe import (
        apply_merges,
        byte_tokenize_gpt2,
        strip_piece_boundaries,
    )

    # pieces: ["boat", " azure"] — 't'(116) ends piece 1, 'a'(97) starts
    # the byte run of piece 2 (after its space) -> no (116,97) adjacency;
    # "tap" has an in-piece (116,97).
    df = spark.createDataFrame(
        [("x", "boat azure"), ("y", "tap")], "doc_id string, text string"
    )
    merges = [(116, 97, 256)]
    out = apply_merges(
        byte_tokenize_gpt2(df).select("doc_id", "tokens"), merges
    )
    toks = {
        r["doc_id"]: list(r["tokens"]) for r in
        out.select("doc_id", strip_piece_boundaries("tokens").alias("tokens")).collect()
    }
    assert 256 not in toks["x"]          # boundary blocked the merge
    assert toks["y"][0] == 256           # in-piece merge fired


def test_gpt2_roundtrip_with_merges(spark):
    from vector_spark.bpe import (
        apply_merges,
        byte_detokenize,
        byte_tokenize_gpt2,
        strip_piece_boundaries,
    )

    texts = ["tab table tabl", "I've  got 123 tabs!", "naïve café €5", ""]
    df = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)], "doc_id string, text string"
    )
    merges = [(116, 97, 256), (256, 98, 257), (257, 108, 258)]
    merged = apply_merges(byte_tokenize_gpt2(df).select("doc_id", "tokens"), merges)
    stripped = merged.select("doc_id", strip_piece_boundaries("tokens").alias("tokens"))
    got = {
        r["doc_id"]: r["rt"]
        for r in byte_detokenize(stripped, merges=merges, out_col="rt").collect()
    }
    for i, t in enumerate(texts):
        assert got[str(i)] == t


def test_train_bpe_never_learns_boundary_pair(spark):
    """Training over a pre-split sentinel stream must skip pairs touching
    the -1 boundary even when they are the most frequent."""
    from vector_spark.bpe import byte_tokenize_gpt2, train_bpe

    # every piece ends with sentinel -> (last_byte, -1) pairs dominate
    df = spark.createDataFrame(
        [(str(i), "go go go go") for i in range(3)], "doc_id string, text string"
    )
    toks = byte_tokenize_gpt2(df).select("doc_id", "tokens")
    merges = train_bpe(toks, n_merges=2, new_id_start=256)
    for a, b, _c in merges:
        assert a >= 0 and b >= 0, merges
