"""Unit semantics for training-sequence packing (vector_spark/packing.py).

The oracle-parity gate covers the sf0.01 corpus; these pin the edge
semantics on tiny inputs: fragment order, EOS insertion, multi-sequence
span, short tail sequence, and empty-doc drop.
"""

from __future__ import annotations

from vector_spark.packing import pack_sequences


def _rows(spark, data):
    return spark.createDataFrame(data, "doc_id string, tokens array<int>")


def test_pack_basic_order_and_tail(spark):
    df = _rows(spark, [("a", [1, 2, 3]), ("b", [4, 5, 6, 7, 8]), ("c", [9, 10])])
    out = pack_sequences(df, 4).orderBy("seq_id").collect()
    assert [r["tokens"] for r in out] == [[1, 2, 3, 4], [5, 6, 7, 8], [9, 10]]
    assert [r["n_docs"] for r in out] == [2, 1, 1]
    assert [r["n_tok"] for r in out] == [4, 4, 2]


def test_pack_eos_separator(spark):
    df = _rows(spark, [("a", [1, 2, 3]), ("b", [4, 5, 6, 7, 8]), ("c", [9, 10])])
    out = pack_sequences(df, 4, eos=99).orderBy("seq_id").collect()
    flat = [t for r in out for t in r["tokens"]]
    assert flat == [1, 2, 3, 99, 4, 5, 6, 7, 8, 99, 9, 10, 99]
    assert all(r["n_tok"] == len(r["tokens"]) for r in out)


def test_pack_doc_spans_three_sequences(spark):
    df = _rows(spark, [("a", list(range(11)))])
    out = pack_sequences(df, 4).orderBy("seq_id").collect()
    assert [r["tokens"] for r in out] == [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9, 10]]
    assert [r["n_docs"] for r in out] == [1, 1, 1]


def test_pack_boundaries_are_within_sequence_doc_offsets(spark):
    df = _rows(spark, [("a", [1, 2, 3]), ("b", [4, 5, 6, 7, 8]), ("c", [9, 10])])
    out = pack_sequences(df, 4).orderBy("seq_id").collect()
    # seq 0 = a[0:3] + b[0:1]  -> docs start at 0 and 3
    # seq 1 = b[1:5]           -> one doc fragment starting at 0
    # seq 2 = c[0:2]           -> one doc fragment starting at 0
    assert [r["boundaries"] for r in out] == [[0, 3], [0], [0]]
    assert all(len(r["boundaries"]) == r["n_docs"] for r in out)


def test_pack_boundaries_with_eos(spark):
    df = _rows(spark, [("a", [1, 2, 3]), ("b", [4, 5])])
    out = pack_sequences(df, 4, eos=99).orderBy("seq_id").collect()
    # with eos: a -> [1,2,3,99], b -> [4,5,99]; seq0=[1,2,3,99], seq1=[4,5,99]
    assert [r["boundaries"] for r in out] == [[0], [0]]


def test_pack_empty_docs_dropped(spark):
    df = _rows(spark, [("a", []), ("b", [1, 2]), ("c", [])])
    out = pack_sequences(df, 4).collect()
    assert len(out) == 1 and out[0]["tokens"] == [1, 2]


def test_pack_order_is_doc_id_lexicographic(spark):
    # rows arrive out of order; packing order follows doc_id
    df = _rows(spark, [("z", [7, 8]), ("a", [1, 2]), ("m", [5, 6])])
    out = pack_sequences(df, 6).collect()
    assert len(out) == 1 and out[0]["tokens"] == [1, 2, 5, 6, 7, 8]


# ---------------------------------------------------------------------------
# chunk_windows (per-doc sliding windows)

from vector_spark.packing import chunk_windows  # noqa: E402


def _chunks(spark, data, **kw):
    out = chunk_windows(_rows(spark, data), **kw).orderBy("doc_id", "chunk_id")
    return [(r["doc_id"], r["chunk_id"], r["tokens"], r["n_tok"]) for r in out.collect()]


def test_chunk_disjoint_default_stride(spark):
    got = _chunks(spark, [("a", [1, 2, 3, 4, 5])], win=2)
    assert got == [("a", 0, [1, 2], 2), ("a", 1, [3, 4], 2), ("a", 2, [5], 1)]


def test_chunk_overlapping_stride(spark):
    got = _chunks(spark, [("a", [1, 2, 3, 4, 5])], win=3, stride=2)
    assert got == [("a", 0, [1, 2, 3], 3), ("a", 1, [3, 4, 5], 3), ("a", 2, [5], 1)]


def test_chunk_min_len_drops_ragged_tail(spark):
    got = _chunks(spark, [("a", [1, 2, 3, 4, 5])], win=3, stride=2, min_len=3)
    assert got == [("a", 0, [1, 2, 3], 3), ("a", 1, [3, 4, 5], 3)]


def test_chunk_short_and_empty_docs(spark):
    got = _chunks(spark, [("a", []), ("b", [9])], win=4)
    assert got == [("b", 0, [9], 1)]


def test_chunk_never_crosses_doc_boundary(spark):
    got = _chunks(spark, [("a", [1, 2, 3]), ("b", [4, 5, 6])], win=2)
    per_doc = {}
    for d, _, c, _ in got:
        per_doc.setdefault(d, []).extend(c)
    assert per_doc == {"a": [1, 2, 3], "b": [4, 5, 6]}


def test_run_export_stages_and_resume(spark, tmp_path):
    """Composed shuffle->pack->shard export: token stream preserved in
    shuffled order, shards balanced, committed stages resume as no-ops."""
    from pyspark.sql import functions as F

    from vector_spark.export import run_export
    from vector_spark.packing import pack_sequences
    from vector_spark.sharding import shuffle_assign

    rows = [
        (f"d{i:03d}", list(range(i * 7, i * 7 + (i % 5) + 1)))
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    out = str(tmp_path / "exp")
    res = run_export(spark, docs, out, run_id="E1", seq_len=16, n_shards=3, seed=9)
    assert res["skipped"] == []

    # the written sequences equal a one-shot pack over the shuffled order
    shuffled = shuffle_assign(docs, 3, seed=9).select("doc_id", "tokens", "pos")
    want = {
        (r["seq_id"], tuple(r["tokens"]))
        for r in pack_sequences(shuffled, 16, id_col="pos", eos=0).collect()
    }
    got_df = spark.read.parquet(res["path"])
    got = {(r["seq_id"], tuple(r["tokens"])) for r in got_df.collect()}
    assert got == want
    # token conservation: every doc's tokens + one EOS each
    n_want = sum(len(t) for _, t in rows) + 60
    assert got_df.select(F.sum(F.size("tokens"))).first()[0] == n_want
    # shards cover seq_id % 3
    assert {
        (r["shard"], r["seq_id"] % 3) for r in got_df.select("shard", "seq_id").collect()
    } == {(s, s) for s in range(3)}

    # full resume: everything skips
    res2 = run_export(spark, docs, out, run_id="E1", seq_len=16, n_shards=3, seed=9)
    assert sorted(res2["skipped"]) == ["pack", "shards", "shuffle"]
    assert res2["counts"] == res["counts"]


def test_run_export_crash_resumes_past_committed_stage(spark, tmp_path, monkeypatch):
    """A crash in stage k+1 must not lose stage k's manifest row: each
    stage appends its row durably BEFORE the next stage starts, so a rerun
    after a mid-run crash skips the already-committed shuffle."""
    import pytest

    import vector_spark.export as X

    rows = [(f"d{i:02d}", list(range(i, i + 3))) for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    out = str(tmp_path / "exp_crash")

    real_pack = X.pack_sequences

    def _boom(*a, **k):
        raise RuntimeError("injected crash in pack stage")

    monkeypatch.setattr(X, "pack_sequences", _boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        X.run_export(spark, docs, out, run_id="C1", seq_len=8, n_shards=2, seed=3)
    monkeypatch.setattr(X, "pack_sequences", real_pack)

    res = X.run_export(spark, docs, out, run_id="C1", seq_len=8, n_shards=2, seed=3)
    assert res["skipped"] == ["shuffle"]  # shuffle durable; pack+shards re-ran
    assert res["counts"]["shards"] == res["counts"]["pack"]


def test_pack_bins_no_split_and_pad(spark):
    from vector_spark.packing import pack_bins

    df = _rows(spark, [("a", [1, 2, 3]), ("b", [4, 5]), ("c", [6])])
    out = {r["seq_id"]: r for r in pack_bins(df, 5).collect()}
    # a(3)+b(2) fill bin 0 exactly; c starts bin 1
    assert out[0]["tokens"] == [1, 2, 3, 4, 5] and out[0]["n_pad"] == 0
    assert out[0]["n_docs"] == 2 and out[0]["boundaries"] == [0, 3]
    assert out[1]["tokens"] == [6] and out[1]["n_pad"] == 4


def test_pack_bins_truncates_long_doc_alone(spark):
    from vector_spark.packing import pack_bins

    df = _rows(spark, [("a", [1, 2]), ("b", list(range(10, 19))), ("c", [3])])
    out = {r["seq_id"]: r for r in pack_bins(df, 4).collect()}
    # b (9 tokens) > L: truncated to 4, alone in its bin; no doc is split
    bins = {tuple(r["tokens"]) for r in out.values()}
    assert (10, 11, 12, 13) in bins
    assert all(r["n_tok"] <= 4 for r in out.values())
    assert sum(r["n_docs"] for r in out.values()) == 3


def test_pack_bins_block_boundaries_deterministic(spark):
    from vector_spark.packing import pack_bins

    df = _rows(spark, [(f"d{i}", [i]) for i in range(4)])
    # block=2: bins never cross blocks even though all 4 fit in one bin
    out = sorted(
        (r["seq_id"], tuple(r["tokens"])) for r in pack_bins(df, 10, block=2).collect()
    )
    assert out == [(0, (0, 1)), (2, (2, 3))]
    # partitioning-invariant: same result from a different input layout
    out2 = sorted(
        (r["seq_id"], tuple(r["tokens"]))
        for r in pack_bins(df.repartition(7), 10, block=2).collect()
    )
    assert out2 == out


def test_pack_bins_eos_and_empty_doc(spark):
    from vector_spark.packing import pack_bins

    df = _rows(spark, [("a", [1]), ("b", []), ("c", [2])])
    out = {r["seq_id"]: r for r in pack_bins(df, 4, eos=0).collect()}
    # empty doc contributes its EOS; per-doc EOS appended before the fill:
    # a+eos(2) + b->eos(1) fit bin 0; c+eos(2) would overflow -> bin 1
    assert out[0]["tokens"] == [1, 0, 0] and out[0]["n_docs"] == 2
    assert out[1]["tokens"] == [2, 0]


# ---------------------------------------------------------------------------
# fill-in-the-middle transform


def test_fim_reconstructs_original(spark):
    """Every transformed doc must be losslessly decodable back to the
    original: tokens = prefix + middle + suffix read out of the PSM
    layout [PRE] prefix [SUF] suffix [MID] middle."""
    from vector_spark.packing import fim_transform

    rows = [
        (f"d{i}", list(range(1000 + i * 10, 1000 + i * 10 + 1 + (i % 7))))
        for i in range(60)
    ]
    df = _rows(spark, rows)
    out = fim_transform(df, rate_ppm=1_000_000, pre=90, suf=91, mid=92).collect()
    orig = dict(rows)
    assert all(r["is_fim"] for r in out)
    for r in out:
        t = list(r["tokens"])
        assert r["n_tok"] == len(t) == len(orig[r["doc_id"]]) + 3
        assert t[0] == 90
        i_suf, i_mid = t.index(91), t.index(92)
        prefix, suffix, middle = t[1:i_suf], t[i_suf + 1 : i_mid], t[i_mid + 1 :]
        assert prefix + middle + suffix == orig[r["doc_id"]]


def test_fim_selection_rate_and_passthrough(spark):
    from vector_spark.packing import fim_transform

    rows = [(f"d{i}", [1, 2, 3, 4, 5]) for i in range(200)]
    df = _rows(spark, rows)
    out = fim_transform(df, rate_ppm=500_000).collect()
    n_fim = sum(1 for r in out if r["is_fim"])
    assert 60 <= n_fim <= 140  # ~50% hash-selected
    for r in out:
        if not r["is_fim"]:
            assert list(r["tokens"]) == [1, 2, 3, 4, 5] and r["n_tok"] == 5


def test_fim_deterministic_and_seed_sensitive(spark):
    from vector_spark.packing import fim_transform

    rows = [(f"d{i}", list(range(20))) for i in range(50)]
    df = _rows(spark, rows)
    a = {r["doc_id"]: list(r["tokens"]) for r in fim_transform(df, seed=1).collect()}
    b = {r["doc_id"]: list(r["tokens"]) for r in fim_transform(df, seed=1).collect()}
    c = {r["doc_id"]: list(r["tokens"]) for r in fim_transform(df, seed=2).collect()}
    assert a == b
    assert a != c  # different seed -> different cut points/selection


def test_length_histogram_buckets_and_totals(spark):
    from vector_spark.packing import length_histogram

    df = spark.createDataFrame(
        [("a", "s1", 10), ("b", "s1", 64), ("c", "s1", 127), ("d", "s2", 5000)],
        "doc_id string, source string, n_tok int",
    )
    got = [tuple(r) for r in length_histogram(df).collect()]
    assert got == [
        ("s1", 0, 1, 10),     # 10 < 64
        ("s1", 64, 2, 191),   # 64 and 127 both land in [64, 128)
        ("s2", 4096, 1, 5000),
    ]
