"""Unit tests for vector_spark.lm (corpus-trained bigram NLL scoring)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, tokens array<int>")


def test_bigram_model_counts_and_smoothing(spark):
    from vector_spark.lm import bigram_model

    import math

    df = _corpus(spark, [("a", [1, 2, 1, 2]), ("b", [1, 2])])
    model = {(r["prev"], r["cur"]): r["nll_micro"] for r in bigram_model(df).collect()}
    # bigrams: a -> (1,2),(2,1),(1,2); b -> (1,2).  c2(1,2)=3, c2(2,1)=1
    # c1(1)=3, c1(2)=1; V=2
    assert model[(1, 2)] == math.floor(-math.log((3 + 1) / (3 + 2)) * 1e6)
    assert model[(2, 1)] == math.floor(-math.log((1 + 1) / (1 + 2)) * 1e6)


def test_lm_score_flags_atypical_docs(spark):
    from vector_spark.lm import lm_score

    common = [1, 2, 3, 4]
    rows = [(f"c{i}", common) for i in range(10)] + [("odd", [9, 8, 7, 6])]
    out = {r["doc_id"]: r for r in lm_score(_corpus(spark, rows)).collect()}
    # the repeated doc's bigrams dominate the corpus => low NLL;
    # the singleton doc's bigrams are rare => high NLL
    assert out["odd"]["nll_avg"] > out["c0"]["nll_avg"]
    assert out["c0"]["n_bigrams"] == 3
    # all repeated docs score identically (pure function of content)
    assert len({out[f"c{i}"]["nll_sum"] for i in range(10)}) == 1


def test_lm_score_skips_sub_bigram_docs(spark):
    from vector_spark.lm import lm_score

    rows = [("a", [1, 2, 3]), ("single", [5]), ("empty", [])]
    out = lm_score(_corpus(spark, rows)).collect()
    assert {r["doc_id"] for r in out} == {"a"}


def test_lm_score_with_external_model(spark):
    from vector_spark.lm import bigram_model, lm_score

    ref = _corpus(spark, [(f"r{i}", [1, 2, 3]) for i in range(5)])
    model = bigram_model(ref)
    tgt = _corpus(spark, [("t", [1, 2, 3]), ("u", [3, 2, 1])])
    out = {r["doc_id"]: r for r in lm_score(tgt, model=model).collect()}
    assert out["t"]["n_bigrams"] == 2
    # 'u' has no bigram seen by the reference model => dropped entirely
    assert "u" not in out


def test_lm_score_fast_matches_join_path(spark):
    """fast=True is the production twin: bit-identical to the join plan."""
    import random

    from vector_spark.lm import lm_score

    rng = random.Random(7)
    rows = [
        (f"d{i}", [rng.randrange(0, 40) for _ in range(rng.randrange(0, 30))])
        for i in range(60)
    ]
    src = _corpus(spark, rows)
    slow = {r["doc_id"]: tuple(r)[1:] for r in lm_score(src).collect()}
    fast = {
        r["doc_id"]: tuple(r)[1:]
        for r in lm_score(src, fast=True, num_partitions=5).collect()
    }
    assert slow == fast and len(slow) > 0


def test_lm_score_fast_rejects_external_model(spark):
    import pytest

    from vector_spark.lm import bigram_model, lm_score

    src = _corpus(spark, [("a", [1, 2, 3])])
    with pytest.raises(ValueError):
        lm_score(src, model=bigram_model(src), fast=True)


def test_lm_score_fast_fallback_matches_join_path(spark):
    """Corpora outside the single-int64 bit budget (here: a negative
    token id) take the two-column fallback plan — still bit-identical."""
    import random

    from vector_spark.lm import lm_score

    rng = random.Random(11)
    rows = [
        (
            f"d{i}",
            [rng.randrange(-5, 40) for _ in range(rng.randrange(2, 30))],
        )
        for i in range(40)
    ]
    src = _corpus(spark, rows)
    slow = {r["doc_id"]: tuple(r)[1:] for r in lm_score(src).collect()}
    fast = {
        r["doc_id"]: tuple(r)[1:]
        for r in lm_score(src, fast=True, num_partitions=5).collect()
    }
    assert slow == fast and len(slow) > 0


def test_lm_score_fast_packed_and_fallback_agree(spark):
    """The packed plan and the forced two-column plan produce identical
    rows on the same in-budget corpus."""
    import random

    from pyspark.sql import functions as F

    from vector_spark import lm

    rng = random.Random(13)
    rows = [
        (f"d{i}", [rng.randrange(0, 64) for _ in range(rng.randrange(2, 25))])
        for i in range(50)
    ]
    src = _corpus(spark, rows)
    packed = {r["doc_id"]: tuple(r)[1:] for r in lm.lm_score(src, fast=True).collect()}

    from vector_spark.sharding import global_row_number

    idx = global_row_number(src.select("doc_id"), [F.col("doc_id")]).withColumnRenamed(
        "rank", "_lm_didx"
    )
    joined = src.join(F.broadcast(idx), "doc_id")
    vocab = int(
        src.select(F.explode("tokens").alias("t"))
        .agg(F.count_distinct("t"))
        .collect()[0][0]
    )
    partials = lm._twocol_partials(joined, "tokens", vocab=vocab, n_parts=5)
    scored = partials.groupBy("_lm_didx").agg(
        F.sum("n_bigrams").cast("long").alias("n_bigrams"),
        F.sum("nll_sum").cast("long").alias("nll_sum"),
    )
    avg = F.floor(F.col("nll_sum") / F.col("n_bigrams").cast("double")).cast("long")
    twocol = {
        r["doc_id"]: tuple(r)[1:]
        for r in scored.join(F.broadcast(idx), "_lm_didx")
        .select("doc_id", "n_bigrams", "nll_sum", avg.alias("nll_avg"))
        .collect()
    }
    assert packed == twocol and len(packed) > 0


def test_perplexity_buckets_balanced_and_ordered(spark):
    from vector_spark.lm import perplexity_buckets

    # two sources; within 'a', docs repeating one bigram score as more
    # fluent (lower nll) than docs of unique bigrams
    rows = (
        [(f"a{i}", [1, 2] * 6, "a") for i in range(6)]
        + [(f"u{i}", list(range(10 + i * 12, 22 + i * 12)), "a") for i in range(6)]
        + [(f"b{i}", [5, 6] * 4, "b") for i in range(4)]
    )
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>, source string")
    out = perplexity_buckets(df, n_buckets=3).collect()
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    # equal-population buckets per source (12 docs -> 4/4/4; 4 -> 2/1/1)
    a_counts = [0, 0, 0]
    for r in by_src["a"]:
        a_counts[int(r["bucket"])] += 1
    assert a_counts == [4, 4, 4]
    # the repeated-bigram (fluent) docs all rank ahead of the unique ones
    for r in by_src["a"]:
        if r["doc_id"].startswith("a"):
            assert r["bucket"] == 0 or (
                r["bucket"] == 1 and a_counts[0] == 4
            )
    fluent_buckets = {r["bucket"] for r in by_src["a"] if r["doc_id"].startswith("a")}
    unique_buckets = {r["bucket"] for r in by_src["a"] if r["doc_id"].startswith("u")}
    assert max(fluent_buckets) <= min(unique_buckets)
    # fast path produces identical buckets
    fast = {(r["doc_id"], r["bucket"]) for r in perplexity_buckets(df, n_buckets=3, fast=True).collect()}
    slow = {(r["doc_id"], r["bucket"]) for r in out}
    assert fast == slow


def test_perplexity_buckets_sampled_matches_exact_modulo_ties(spark):
    """The histogram-threshold twin reproduces the exact rank formulation
    wherever nll_avg is unique within its source; docs tying on nll_avg
    share the FIRST rank's bucket (value thresholds cannot split a tie).
    Also: no rank window in the optimized plan."""
    from collections import defaultdict

    from vector_spark.lm import perplexity_buckets, perplexity_buckets_sampled

    rows = (
        [(f"a{i}", [1, 2] * 6, "a") for i in range(6)]
        + [(f"u{i}", list(range(10 + i * 12, 22 + i * 12)), "a") for i in range(6)]
        + [(f"b{i}", [5, 6] * 4, "b") for i in range(4)]
    )
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>, source string")
    sampled_df = perplexity_buckets_sampled(df, n_buckets=3)
    plan = sampled_df._jdf.queryExecution().optimizedPlan().toString()
    assert "row_number" not in plan and "percent_rank" not in plan
    exact = {r["doc_id"]: r for r in perplexity_buckets(df, n_buckets=3).collect()}
    sampled = {r["doc_id"]: r for r in sampled_df.collect()}
    assert set(exact) == set(sampled)
    groups = defaultdict(list)
    for d, r in exact.items():
        groups[(r["source"], r["nll_avg"])].append(d)
    for (src, _nll), docs_in_group in groups.items():
        want = min(exact[d]["bucket"] for d in docs_in_group)  # first-rank rule
        for d in docs_in_group:
            assert sampled[d]["bucket"] == want, (d, sampled[d], want)
