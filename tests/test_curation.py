"""Unit tests for vector_spark.curation (line dedup / DSIR / percentile /
divergence) on tiny hand-checkable fixtures."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_strip_common_lines_removes_boilerplate(spark):
    from vector_spark.curation import strip_common_lines

    docs = spark.createDataFrame(
        [
            ("a", "BANNER\nunique alpha\nFOOTER"),
            ("b", "BANNER\nunique beta\nFOOTER"),
            ("c", "BANNER\nunique gamma"),
            ("d", "all mine\n\nalso mine"),
        ],
        "doc_id string, text string",
    )
    out = {r["doc_id"]: r for r in strip_common_lines(docs, min_docs=2).collect()}
    assert out["a"]["n_lines"] == 3 and out["a"]["n_removed"] == 2
    assert out["a"]["clean_h"] == _h("unique alpha")
    assert out["c"]["n_removed"] == 1
    assert out["c"]["clean_h"] == _h("unique gamma")
    # empty lines are never counted as common and survive in place
    assert out["d"]["n_removed"] == 0
    assert out["d"]["clean_h"] == _h("all mine\n\nalso mine")


def test_strip_common_lines_fully_boilerplate_doc_survives_empty(spark):
    from vector_spark.curation import strip_common_lines

    docs = spark.createDataFrame(
        [("a", "SAME"), ("b", "SAME"), ("c", "other")],
        "doc_id string, text string",
    )
    out = {r["doc_id"]: r for r in strip_common_lines(docs, min_docs=2).collect()}
    assert out["a"]["n_removed"] == 1 and out["a"]["n_chars_clean"] == 0
    assert out["a"]["clean_h"] == _h("")
    assert out["c"]["n_removed"] == 0


def test_dsir_topk_prefers_target_like_docs(spark):
    from vector_spark.curation import dsir_topk

    rows = []
    # target slice: docs full of "alpha beta"; distractors: "zulu yankee"
    for i in range(6):
        rows.append((i, "en", ("alpha beta " * 20).strip()))
    for i in range(6, 12):
        rows.append((i, "de", ("zulu yankee " * 20).strip()))
    # one unlabeled doc that *looks* like the target must outrank the
    # distractors (the whole point of importance weighting)
    rows.append((100, "de", ("alpha beta " * 20).strip()))
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    top = dsir_topk(docs, F.col("lang") == "en", k=7, n_buckets=64).collect()
    top_ids = [r["doc_id"] for r in top]
    assert 100 in top_ids  # target-like doc selected
    assert not any(i in top_ids for i in range(6, 12))  # distractors excluded
    # weights are integer micro-nats: sums divide exactly across reruns
    assert all(isinstance(r["w_sum"], int) for r in top)


def test_quality_percentile_keeps_top_fraction_per_source(spark):
    from vector_spark.curation import quality_percentile

    # 10 docs per source with strictly increasing scores 0.0 .. 0.9
    rows = [
        (s * 100 + i, f"s{s}", float(i) / 10.0) for s in range(2) for i in range(10)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, score double")
    out = {
        r["source"]: r
        for r in quality_percentile(
            docs, F.col("score"), keep_frac=0.25
        ).collect()
    }
    # percent_rank <= 0.25 over 10 rows keeps ranks 1..3 (pr 0, 1/9, 2/9)
    for s in range(2):
        r = out[f"s{s}"]
        assert r["n_kept"] == 3
        kept_ids = [s * 100 + 9, s * 100 + 8, s * 100 + 7]  # highest scores
        assert r["sel_sum"] == sum(_h(str(i)) % 1_000_000 for i in kept_ids)
        assert r["min_q"] == 0.7


def test_source_divergence_zero_for_identical_distributions(spark):
    from vector_spark.curation import source_divergence

    same = [1, 1, 2, 3]
    corpus = spark.createDataFrame(
        [("a", same), ("b", same)], "source string, tokens array<int>"
    )
    out = {r["source"]: r for r in source_divergence(corpus).collect()}
    # p_s == p_corpus for every token => every term ln(1) = 0 exactly
    assert out["a"]["kl_nano"] == 0 and out["b"]["kl_nano"] == 0
    assert out["a"]["n_tokens"] == 4 and out["a"]["vocab_size"] == 3


def test_source_divergence_flags_skewed_source(spark):
    from vector_spark.curation import source_divergence

    corpus = spark.createDataFrame(
        [("bal", list(range(16))), ("skew", [0] * 16)],
        "source string, tokens array<int>",
    )
    out = {r["source"]: r for r in source_divergence(corpus).collect()}
    assert out["skew"]["kl_nano"] > out["bal"]["kl_nano"]
    assert out["skew"]["kl_nano"] > 0


def test_weighted_sample_exact_race_replayable_in_python(spark):
    """The integer bottom-k race must be a pure function of (id, seed):
    recompute every doc's min-of-replicas key in plain Python and check the
    selection (and its keys) match bit-for-bit."""
    from vector_spark.curation import weighted_sample

    docs = spark.createDataFrame(
        [(f"d{i:02d}", 1 + 37 * i) for i in range(40)],
        "doc_id string, n_tok int",
    )
    got = [tuple(r) for r in weighted_sample(docs, 10, seed=5).collect()]

    def key(doc_id, n_tok, coarse=64, cap=32, seed=5):
        w_eff = min(cap, max(1, (n_tok + coarse - 1) // coarse))
        return w_eff, min(_h(f"{doc_id}#{seed}#{j}") for j in range(w_eff))

    manual = sorted(
        ((d, *key(d, w)) for d, w in ((f"d{i:02d}", 1 + 37 * i) for i in range(40))),
        key=lambda t: (t[2], t[0]),
    )[:10]
    assert got == [(d, w, k) for d, w, k in manual]


def test_weighted_sample_heavier_docs_win_more(spark):
    """Across many seeds, a doc with 10x the weight should win the k=1 race
    roughly 10x as often (coarse=1 so w_eff is the true weight)."""
    from vector_spark.curation import weighted_sample

    docs = spark.createDataFrame(
        [("heavy", 20), ("light", 2)] + [(f"bg{i}", 2) for i in range(8)],
        "doc_id string, n_tok int",
    )
    wins = {"heavy": 0, "light": 0}
    for seed in range(60):
        top = weighted_sample(docs, 1, seed=seed, coarse=1, cap=64).collect()[0]
        wins[top["doc_id"]] = wins.get(top["doc_id"], 0) + 1
    # heavy holds 20/36 of the total weight -> expect ~33 wins of 60; a
    # light doc holds 2/36 -> ~3.3.  Wide tolerances keep this seed-stable.
    assert wins["heavy"] >= 20
    assert wins["heavy"] > 4 * wins["light"]


def test_quality_percentile_sampled_threshold_semantics(spark):
    """Histogram-cutoff twin: tie-free sources keep exactly
    ceil(keep_frac*n) docs; cutoff ties are ALL kept (CCNet threshold
    semantics); no rank window function appears in the plan."""
    from vector_spark.curation import quality_percentile_sampled

    rows = (
        # source s0: 10 distinct scores 0.0..0.9 -> k=ceil(2.5)=3
        [(i, "s0", float(i) / 10.0) for i in range(10)]
        # source s1: scores [9,5,5,5,1] -> k=ceil(1.25)=2, cutoff=0.5,
        # ties at the cutoff all kept -> 4
        + [(100, "s1", 0.9), (101, "s1", 0.5), (102, "s1", 0.5),
           (103, "s1", 0.5), (104, "s1", 0.1)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, source string, score double")
    out_df = quality_percentile_sampled(docs, F.col("score"), keep_frac=0.25)
    plan = out_df._jdf.queryExecution().optimizedPlan().toString()
    assert "percent_rank" not in plan and "row_number" not in plan
    out = {r["source"]: r for r in out_df.collect()}
    assert out["s0"]["n_kept"] == 3
    assert out["s0"]["min_q_micro"] == 700_000
    assert out["s1"]["n_kept"] == 4
    assert out["s1"]["min_q_micro"] == 500_000


def test_quality_percentile_sampled_real_sampling_is_deterministic(spark):
    """sample_mod > 1 derives the cutoff from a hash-sample; the selection
    must be deterministic and a superset-of-nothing sanity: every kept doc
    scores >= the sampled cutoff."""
    from vector_spark.curation import quality_percentile_sampled

    rows = [(i, f"s{i % 2}", float((i * 37) % 100) / 100.0) for i in range(400)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, score double")
    a = quality_percentile_sampled(
        docs, F.col("score"), keep_frac=0.25, sample_mod=4
    ).collect()
    b = quality_percentile_sampled(
        docs, F.col("score"), keep_frac=0.25, sample_mod=4
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    for r in a:
        # sampled cutoff keeps roughly keep_frac of the source (within the
        # tolerance a 1/4 sample of 200 docs allows)
        assert 20 <= r["n_kept"] <= 90
