"""Unit semantics for domain-mixture sampling (vector_spark/mixture.py).

The oracle-parity gate cross-checks the full rate+selection math against
DuckDB at sf0.01; these pin the edge semantics on tiny inputs.
"""

from __future__ import annotations

from vector_spark.mixture import mixture_rates, mixture_sample, normalized_weights


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, source string, n_tok int")


def test_rates_saturate_for_underfilled_sources(spark):
    rows = [(f"a{i}", "big", 100) for i in range(100)] + [("r1", "rare", 10)]
    df = _docs(spark, rows)
    # rare gets 50% of a 2000-token budget = 1000 tokens but has only 10:
    # saturates at keep-everything; big samples down to ~1000/10000
    rates = mixture_rates(df, {"big": 0.5, "rare": 0.5}, 2000)
    assert rates["rare"] == 1_000_000
    assert rates["big"] == 100_000


def test_temperature_weights_limits_and_ordering(spark):
    from vector_spark.mixture import temperature_weights_from_avail

    avail = {"big": 900, "mid": 90, "tiny": 10}
    # alpha=1: natural proportions
    w1 = temperature_weights_from_avail(avail, 1.0)
    assert abs(w1["big"] - 0.9) < 1e-12 and abs(w1["tiny"] - 0.01) < 1e-12
    # alpha=0: uniform
    w0 = temperature_weights_from_avail(avail, 0.0)
    assert all(abs(v - 1 / 3) < 1e-12 for v in w0.values())
    # 0<alpha<1: tail upsampled relative to natural, order preserved
    wh = temperature_weights_from_avail(avail, 0.5)
    assert wh["tiny"] > w1["tiny"] and wh["big"] < w1["big"]
    assert wh["big"] > wh["mid"] > wh["tiny"]
    assert abs(sum(wh.values()) - 1.0) < 1e-12


def test_temperature_weights_from_corpus(spark):
    from vector_spark.mixture import temperature_weights

    df = spark.createDataFrame(
        [("a", "web", 800), ("b", "web", 100), ("c", "code", 100)],
        "doc_id string, source string, n_tok int",
    )
    w = temperature_weights(df, 0.5)
    assert set(w) == {"web", "code"}
    assert abs(w["web"] / w["code"] - 3.0) < 1e-9  # sqrt(900/100)


def test_sample_deterministic_and_rate_bounded(spark):
    rows = [(f"d{i}", "s", 10) for i in range(2000)]
    df = _docs(spark, rows)
    a = sorted(r["doc_id"] for r in mixture_sample(df, {"s": 1.0}, 10_000).collect())
    b = sorted(r["doc_id"] for r in mixture_sample(df, {"s": 1.0}, 10_000).collect())
    assert a == b  # order-independent determinism
    # rate = 10k/20k = 0.5; hash-uniform selection lands near half
    assert 800 <= len(a) <= 1200


def test_unweighted_source_dropped(spark):
    df = _docs(spark, [("a", "keep", 5), ("b", "drop", 5)])
    out = mixture_sample(df, {"keep": 1.0}, 1_000_000).collect()
    assert {r["source"] for r in out} == {"keep"}


def test_normalized_weights():
    assert normalized_weights({"a": 2.0, "b": 6.0}) == {"a": 0.25, "b": 0.75}


# --- stratified train/val/test splitting ----------------------------------


def _split_docs(spark, n=3000):
    rows = [(f"d{i:05d}", "web" if i % 3 else "code", 10 + i % 50) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id string, source string, n_tok int")


def test_split_thresholds_normalize_and_close():
    from vector_spark.mixture import split_thresholds

    cuts = split_thresholds({"train": 49, "val": 0.5, "test": 0.5})
    assert cuts == [("test", 10_000), ("train", 990_000), ("val", 1_000_000)]


def test_split_covers_everything_and_is_deterministic(spark):
    from vector_spark.mixture import stratified_split

    df = _split_docs(spark)
    out1 = {r["doc_id"]: r["split"] for r in stratified_split(
        df, {"train": 0.9, "val": 0.1}).collect()}
    out2 = {r["doc_id"]: r["split"] for r in stratified_split(
        df, {"train": 0.9, "val": 0.1}).collect()}
    assert out1 == out2 and len(out1) == 3000
    assert set(out1.values()) == {"train", "val"}
    # roughly proportional (hash-threshold: ~1/sqrt(n) error)
    n_val = sum(1 for v in out1.values() if v == "val")
    assert 200 < n_val < 400


def test_split_exact_hits_boundaries_per_stratum(spark):
    from pyspark.sql import functions as F

    from vector_spark.mixture import stratified_split

    df = _split_docs(spark)
    out = stratified_split(df, {"train": 0.9, "val": 0.1}, exact=True)
    counts = {
        (r["source"], r["split"]): r["c"]
        for r in out.groupBy("source", "split").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    # web stratum: 2000 docs -> exactly 1800/200; code: 1000 -> 900/100
    assert counts[("web", "train")] == 1800 and counts[("web", "val")] == 200
    assert counts[("code", "train")] == 900 and counts[("code", "val")] == 100


def test_split_summary_matches_duckdb(spark, tmp_path):
    import duckdb

    from vector_spark.mixture import split_summary, sql_split_summary

    df = _split_docs(spark, 2000)
    p = str(tmp_path / "split.parquet")
    df.write.mode("overwrite").parquet(p)
    fr = {"train": 0.98, "val": 0.01, "test": 0.01}
    want = {
        (r["source"], r["split"]): (r["n_docs"], r["n_tokens"], r["sel_sum"])
        for r in split_summary(df, fr).collect()
    }
    sql = sql_split_summary(f"(SELECT * FROM read_parquet('{p}/*.parquet'))", fr)
    got = {(r[0], r[1]): (r[2], r[3], r[4]) for r in duckdb.sql(sql).fetchall()}
    assert got == want


# ---------------------------------------------------------------------------
# upsampling (repeat factor > 1)


def test_upsample_repeat_counts_and_epochs(spark):
    from vector_spark.mixture import mixture_repeat_rates, mixture_upsample

    rows = [(f"a{i}", "big", 100) for i in range(100)] + [
        (f"r{i}", "rare", 10) for i in range(10)
    ]
    df = _docs(spark, rows)
    # rare: 50% of 4000 tokens = 2000 wanted / 100 available -> rate 20x
    rates = mixture_repeat_rates(df, {"big": 0.5, "rare": 0.5}, 4000)
    assert rates["rare"] == 20_000_000
    assert rates["big"] == 200_000
    rep = mixture_upsample(df, {"big": 0.5, "rare": 0.5}, 4000).collect()
    by_doc: dict[str, list[int]] = {}
    for r in rep:
        by_doc.setdefault(r["doc_id"], []).append(int(r["epoch"]))
    # integer rate: EVERY rare doc appears exactly 20 times, epochs dense
    for i in range(10):
        eps = sorted(by_doc[f"r{i}"])
        assert eps == list(range(20))
    # fractional rate < 1: big docs appear 0 or 1 times, ~20% of them
    n_big = sum(1 for d in by_doc if d.startswith("a"))
    assert all(by_doc[d] == [0] for d in by_doc if d.startswith("a"))
    assert 5 <= n_big <= 40  # 100 docs at 20% keep (hash-deterministic)


def test_upsample_fractional_epoch_is_hash_subset(spark):
    from vector_spark.hashing import portable_bucket_py
    from vector_spark.mixture import mixture_upsample

    rows = [(f"d{i}", "s", 10) for i in range(50)]
    df = _docs(spark, rows)
    # one source, budget 1.5x available -> rate 1.5: every doc once,
    # hash-selected half twice
    rep = mixture_upsample(df, {"s": 1.0}, 750).collect()
    copies = {}
    for r in rep:
        copies[r["doc_id"]] = copies.get(r["doc_id"], 0) + 1
    for i in range(50):
        d = f"d{i}"
        want = 2 if portable_bucket_py(d, 1_000_000) < 500_000 else 1
        assert copies[d] == want


def test_upsample_zero_weight_source_dropped(spark):
    from vector_spark.mixture import mixture_upsample

    df = _docs(spark, [("x", "keep", 10), ("y", "drop", 10)])
    got = mixture_upsample(df, {"keep": 1.0}, 1000).collect()
    assert {r["doc_id"] for r in got} == {"x"}
