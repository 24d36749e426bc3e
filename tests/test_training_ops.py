"""Unit tests for the training-data operators (dedup / similarity /
multimodal / textstats) beyond the DuckDB oracle gate.

Model: the reference's behavior-fixture pattern (tests/behavior/transforms)
— deterministic synthetic inputs, assertions on semantic invariants.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en", "a"),
        (2, "the quick brown fox jumps over the lazy dog", "en", "b"),  # exact dup of 1
        (3, "The quick  brown fox jumps over the lazy dog ", "en", "c"),  # ws/case dup
        (4, "the quick brown fox jumps over the sleepy dog", "en", "d"),  # near dup
        (5, "der schnelle braune fuchs und der faule hund ist nicht da", "de", "e"),
        (6, "completely different text about spark query engines", "en", "f"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])


def test_dedup_exact_normalized(docs):
    from vector_spark.dedup import dedup_exact

    kept = sorted(r["doc_id"] for r in dedup_exact(docs).collect())
    # 1,2,3 collapse (normalization folds case + whitespace); lowest id wins
    assert kept == [1, 4, 5, 6]

    kept_raw = sorted(r["doc_id"] for r in dedup_exact(docs, normalize=False).collect())
    assert kept_raw == [1, 3, 4, 5, 6]  # only the byte-identical pair collapses


def test_minhash_finds_near_dup(docs):
    from vector_spark.dedup import minhash_lsh_pairs

    pairs = {
        (r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(docs, num_hashes=8, bands=4).collect()
    }
    assert (1, 2) in pairs  # identical docs always collide
    assert (1, 4) in pairs  # 1-word-different doc shares most shingles
    assert all(6 not in p or p == (6, 6) for p in pairs)  # unrelated doc stays out


def test_simhash_near_dup_property(docs):
    from vector_spark.dedup import simhash

    out = {r["doc_id"]: r["sh"] for r in docs.select("doc_id", simhash("text").alias("sh")).collect()}
    assert out[1] == out[2] == out[3]  # token sets identical after lower/ws fold

    def ham(a, b):
        return bin(a ^ b).count("1")

    assert ham(out[1], out[4]) <= 6          # near dup: small hamming distance
    assert ham(out[1], out[6]) > ham(out[1], out[4])  # unrelated is farther


def test_ngram_jaccard_ordering(docs):
    from vector_spark.dedup import ngram_jaccard_pairs

    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.0).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert pairs[(1, 4)] > pairs[(1, 6)]


def test_lsh_candidates_feed_jaccard(docs):
    from vector_spark.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    cand = minhash_lsh_pairs(docs, num_hashes=8, bands=4)
    verified = ngram_jaccard_pairs(docs, threshold=0.5, candidates=cand)
    got = {(r["id_a"], r["id_b"]) for r in verified.collect()}
    assert (1, 2) in got and (1, 4) in got


def test_topk_cosine_self_is_nearest(spark):
    from vector_spark.similarity import topk_cosine

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = embs.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = topk_cosine(embs, q, k=3).orderBy(F.col("cos").desc()).collect()
    assert top[0]["vec_id"] == 0 and abs(top[0]["cos"] - 1.0) < 1e-6
    assert len(top) == 3
    assert top[0]["cos"] >= top[1]["cos"] >= top[2]["cos"]


def test_lsh_topk_subset_of_exact_scores(spark):
    from vector_spark.similarity import topk_cosine, topk_cosine_lsh

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = embs.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {r["vec_id"]: r["cos"] for r in topk_cosine(embs, q, k=50).collect()}
    approx = topk_cosine_lsh(embs, q, k=5, n_planes=4, dim=64).collect()
    assert approx, "query must at least find itself in its own bucket"
    for r in approx:  # every ANN score must equal the exact cosine
        if r["vec_id"] in exact:
            assert abs(r["cos"] - exact[r["vec_id"]]) < 1e-6


def test_multimodal_plumbing(spark):
    from vector_spark.multimodal import extract_features, media_stats, synth_media

    media = synth_media(spark, 48)
    feats = extract_features(media, dim=8, fake=True)
    rows = feats.collect()
    assert len(rows) == 48
    assert all(len(r["features"]) == 8 for r in rows)
    # deterministic: same content -> same sha + features on a re-run
    again = {r["media_id"]: (r["content_sha"], r["features"]) for r in extract_features(
        synth_media(spark, 48), dim=8, fake=True
    ).collect()}
    for r in rows:
        sha, fv = again[r["media_id"]]
        assert sha == r["content_sha"] and fv == r["features"]
    stats = {r["kind"]: r["n"] for r in media_stats(media).collect()}
    assert sum(stats.values()) == 48 and set(stats) == {"image", "audio", "video"}


def test_decode_stub_raises():
    from vector_spark.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG", fake=False)


def test_textstats_basics(spark):
    from vector_spark import textstats as T

    df = spark.createDataFrame(
        [(1, "the cat and the dog, in the house!"), (2, "zzz qqq")],
        ["id", "text"],
    )
    out = {r["id"]: r for r in df.select(
        "id",
        T.token_count_ws("text").alias("ws"),
        T.token_count_bpe("text").alias("bpe"),
        T.lang_id("text").alias("lang"),
        T.fingerprint("text").alias("fp"),
    ).collect()}
    assert out[1]["ws"] == 8
    assert out[1]["bpe"] == 10  # 8 words + ',' + '!'
    assert out[1]["lang"] == "en"
    assert out[2]["lang"] == "und"
    assert isinstance(out[1]["fp"], int)


def test_grok_pandas_path_matches_jvm(spark):
    from vector_spark.functions.grok import CANNED, grok_parse, grok_parse_pandas
    from vector_spark import datagen

    df = spark.read.parquet(datagen.ensure_corpus(0.001)).select("doc_id", "message").limit(500)
    pat = CANNED["tokenlog"]
    jvm = {r["doc_id"]: (r["level"], r["user_id"], r["msg"]) for r in grok_parse(df, "message", pat).collect()}
    pd_ = {r["doc_id"]: (r["level"], r["user_id"], r["msg"]) for r in grok_parse_pandas(df, "message", pat).collect()}
    assert jvm == pd_


def test_topk_numpy_matches_hof(spark):
    from pyspark.sql import functions as F
    from vector_spark.similarity import topk_cosine, topk_cosine_numpy

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qrows = embs.filter(F.col("vec_id") < 2).collect()
    qvecs = {r["vec_id"]: list(r["embedding"]) for r in qrows}
    q = embs.filter(F.col("vec_id") < 2).select(F.col("vec_id").alias("query_id"), "embedding")
    hof = {(r["query_id"], r["vec_id"]): r["cos"] for r in topk_cosine(embs, q, k=5).collect()}
    npk = {(r["query_id"], r["vec_id"]): r["cos"] for r in topk_cosine_numpy(embs, qvecs, k=5).collect()}
    assert set(hof) == set(npk)
    for key in hof:
        assert abs(hof[key] - npk[key]) < 1e-5


def test_dedup_components_label_propagation(spark):
    """Connected components over dup pairs: chains collapse to one group
    labeled by the min id; disjoint pairs stay separate."""
    from vector_spark.dedup import dedup_components

    pairs = spark.createDataFrame(
        [(3, 5), (5, 9), (9, 11), (20, 21), (40, 2)], ["id_a", "id_b"]
    )
    got = {
        r["doc_id"]: r["component"] for r in dedup_components(pairs).collect()
    }
    assert got == {3: 3, 5: 3, 9: 3, 11: 3, 20: 20, 21: 20, 40: 2, 2: 2}


def test_dedup_components_star_matches_propagation(spark):
    """Large-star/small-star CC (Kiveris et al.) must produce exactly the
    min-label-propagation labeling on mixed chain + clique + singleton-pair
    topologies."""
    from vector_spark.dedup import dedup_components, dedup_components_star

    pairs = spark.createDataFrame(
        [(3, 5), (5, 9), (9, 11), (20, 21), (40, 2),
         (50, 51), (51, 52), (50, 52), (60, 61)],
        ["id_a", "id_b"],
    )
    prop = {r["doc_id"]: r["component"] for r in dedup_components(pairs).collect()}
    star = {r["doc_id"]: r["component"] for r in dedup_components_star(pairs).collect()}
    assert star == prop


def test_dedup_components_star_chain_logn_rounds(spark):
    """The pathological case propagation cannot do: a 256-node chain
    converges in O(log n) star rounds (propagation needs O(n) = 255).
    Kiveris et al. bound the alternation by O(log^2 n) with the practical
    rate ~log n; assert a generous 2*log2(n) + 4."""
    import math

    from vector_spark.dedup import dedup_components_star

    n = 256
    pairs = spark.createDataFrame(
        [(f"d{i:04d}", f"d{i + 1:04d}") for i in range(n - 1)], ["id_a", "id_b"]
    )
    labels, rounds = dedup_components_star(pairs, return_rounds=True)
    got = {r["doc_id"]: r["component"] for r in labels.collect()}
    assert got == {f"d{i:04d}": "d0000" for i in range(n)}
    assert rounds <= 2 * int(math.log2(n)) + 4, rounds


def test_dedup_select_keeps_best_quality(spark):
    """Quality-aware canonical selection: each component keeps its highest-
    score member (tie -> min id); docs in no pair are singleton keepers."""
    from pyspark.sql import functions as F

    from vector_spark.dedup import dedup_select

    docs = spark.createDataFrame(
        [("a", 0.1), ("b", 0.9), ("c", 0.9), ("d", 0.5), ("e", 0.2), ("z", 0.0)],
        ["doc_id", "q"],
    )
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "e")], ["id_a", "id_b"]
    )
    out = {
        r["doc_id"]: (r["component"], r["is_kept"])
        for r in dedup_select(docs, pairs, F.col("q")).collect()
    }
    # {a,b,c}: b and c tie at 0.9 -> min id b wins; {d,e}: d wins; z singleton
    assert out == {
        "a": ("a", False),
        "b": ("a", True),
        "c": ("a", False),
        "d": ("d", True),
        "e": ("d", False),
        "z": ("z", True),
    }


def test_dedup_soft_weights_downweights_clusters(spark):
    """Soft dedup keeps every doc; cluster members carry 1e6 div |cluster|
    micro-weight, singletons carry full weight."""
    from vector_spark.dedup import dedup_soft_weights

    docs = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",), ("e",), ("z",)], ["doc_id"]
    )
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "e")], ["id_a", "id_b"]
    )
    out = {
        r["doc_id"]: (r["component"], r["comp_size"], r["weight_micro"])
        for r in dedup_soft_weights(docs, pairs).collect()
    }
    assert out == {
        "a": ("a", 3, 333333),
        "b": ("a", 3, 333333),
        "c": ("a", 3, 333333),
        "d": ("d", 2, 500000),
        "e": ("d", 2, 500000),
        "z": ("z", 1, 1000000),
    }


def test_gemm_twins_match_hof_twins(spark):
    """The per-bucket GEMM production twins must agree exactly (after
    round-6) with their interpreted-HOF counterparts on the fixture corpus —
    same buckets, same candidates, same scores, same tie-breaks."""
    from vector_spark.similarity import (
        embedding_dup_pairs_lsh,
        embedding_dup_pairs_lsh_gemm,
        topk_cosine_ivf,
        topk_cosine_ivf_gemm,
        topk_cosine_lsh,
        topk_cosine_lsh_gemm,
    )

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = embs.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    # sf0.001 embeddings are near-orthogonal, so use a low threshold to get a
    # non-trivial pair set (8k pairs); chunk=7 forces the chunked-GEMM path
    hof_pairs = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in embedding_dup_pairs_lsh(embs, threshold=-0.5, n_planes=4, dim=64).collect()
    }
    gemm_pairs = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in embedding_dup_pairs_lsh_gemm(
            embs, threshold=-0.5, n_planes=4, dim=64, chunk=7
        ).collect()
    }
    assert hof_pairs == gemm_pairs and len(hof_pairs) > 0

    for hof_fn, gemm_fn, kw in (
        (topk_cosine_lsh, topk_cosine_lsh_gemm, {"n_planes": 4}),
        (topk_cosine_ivf, topk_cosine_ivf_gemm, {"n_cells": 8}),
    ):
        hof = {
            (r["query_id"], r["vec_id"]): r["cos"]
            for r in hof_fn(embs, q, k=5, dim=64, **kw).collect()
        }
        gemm = {
            (r["query_id"], r["vec_id"]): r["cos"]
            for r in gemm_fn(embs, q, k=5, dim=64, **kw).collect()
        }
        assert hof == gemm and len(hof) > 0


def test_quality_classifier_linear_model(spark):
    """classifier.py: naive-Bayes log-odds training + broadcast-join scoring.
    Deterministic fixture: 'good' docs share quality words, 'bad' docs share
    spam words; held-out docs with the same vocabulary must separate."""
    from vector_spark import classifier as C

    rows = [
        (1, "the quick brown fox reads fine prose daily", 1),
        (2, "fine prose and thoughtful analysis of the fox", 1),
        (3, "buy cheap pills now cheap pills free free", 0),
        (4, "free cheap offer now buy now buy now", 0),
        (5, "thoughtful analysis reads fine", 1),
        (6, "cheap free pills offer", 0),
    ]
    labeled = spark.createDataFrame(rows, "doc_id long, text string, label int")
    w = C.train_toy_model(labeled, min_df=2)
    wrows = w.collect()
    assert len(wrows) > 0
    # every feature hash distinct; weights bounded by log-odds construction
    assert len({r["feature_hash"] for r in wrows}) == len(wrows)

    test_docs = spark.createDataFrame(
        [
            (10, "fine thoughtful prose analysis"),
            (11, "cheap cheap free pills"),
            (12, ""),  # empty -> n_words 0, prob sigmoid(0)=0.5
            (13, "zzz unseen vocabulary only"),  # no hits -> 0.5
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in C.score(test_docs, w).collect()}
    assert got[10]["prob"] > 0.7
    assert got[11]["prob"] < 0.3
    assert got[12]["n_words"] == 0 and abs(got[12]["prob"] - 0.5) < 1e-9
    assert abs(got[13]["prob"] - 0.5) < 1e-9

    # scoring twice is deterministic (hash + round pinned)
    again = {r["doc_id"]: r["prob"] for r in C.score(test_docs, w).collect()}
    assert again == {k: v["prob"] for k, v in got.items()}


def test_incremental_near_dup_matches_self_join(spark):
    """incremental_near_dup (new-vs-corpus probe) must agree with the
    self-join LSH on the cross-split pairs: a new doc is matched iff
    minhash_lsh_pairs over the union emits a pair straddling the split,
    and its fast (xxhash64) and oracle (md5) paths agree on WHO matches."""
    from vector_spark.dedup import incremental_near_dup, minhash_lsh_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    new = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)

    inc = {r["doc_id"]: r for r in incremental_near_dup(new, corpus).collect()}
    pairs = minhash_lsh_pairs(docs).collect()
    straddle = {}
    for r in pairs:
        for a, b in ((r["id_a"], r["id_b"]), (r["id_b"], r["id_a"])):
            if a % 5 == 0 and b % 5 != 0:
                straddle.setdefault(a, set()).add(b)
    assert set(inc) == set(straddle)
    for d, matches in straddle.items():
        assert inc[d]["n_corpus_matches"] == len(matches)
        assert inc[d]["first_match"] == min(matches)

    fast = {r["doc_id"] for r in incremental_near_dup(new, corpus, fast=True).collect()}
    # xxhash64 vs md5 minhash: same banding topology, different hash family
    # -> candidate sets may differ on borderline docs, but both must catch
    # the seeded near-identical dups (which collide under ANY hash family)
    assert fast & set(inc)


def test_semantic_dedup_keep_first_by_id(spark):
    from vector_spark.similarity import semantic_dedup

    # two exact-duplicate groups + one singleton; dim-64 one-hot-ish rows
    def vec(i, scale=1.0):
        v = [0.0] * 64
        v[i] = scale
        return v

    rows = [
        (10, vec(0)), (11, vec(0, 2.0)), (12, vec(0, 0.5)),  # same direction
        (20, vec(1)), (21, vec(1, 3.0)),
        (30, vec(2)),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in semantic_dedup(df, threshold=0.99, dim=64).collect()}
    assert len(out) == 6  # one row per input
    # group keepers: lowest id of each neighborhood
    assert not out[10]["is_dup"] and out[10]["kept_by"] is None
    assert out[11]["is_dup"] and out[11]["kept_by"] == 10
    assert out[12]["is_dup"] and out[12]["kept_by"] == 10
    assert not out[20]["is_dup"]
    assert out[21]["is_dup"] and out[21]["kept_by"] == 20
    assert not out[30]["is_dup"]
    # same-direction rows share a cell (identical cosine to every centroid)
    assert out[10]["cell"] == out[11]["cell"] == out[12]["cell"]


def test_kmeans_refine_recovers_planted_clusters(spark):
    import numpy as np

    from vector_spark.similarity import kmeans_refine, semantic_dedup

    # three tight planted clusters in dim 8, far apart
    rng = np.random.default_rng(7)
    true = np.eye(3, 8)  # unit axis directions
    rows = []
    vid = 0
    for c in range(3):
        for _ in range(40):
            v = true[c] + 0.05 * rng.standard_normal(8)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>").repartition(4)

    from vector_spark.similarity import init_maximin

    init = init_maximin(df, 3)
    trained = kmeans_refine(df, init, iters=6)
    tm = np.asarray(trained)
    # every planted direction has a near-identical trained centroid
    sims = (true / np.linalg.norm(true, axis=1)[:, None]) @ tm.T
    assert (sims.max(axis=1) > 0.98).all()
    # deterministic under a different partitioning (sums reduce exactly
    # per (cell, dim); rounding to 6 absorbs the float reduce order)
    again = kmeans_refine(df.repartition(7), init, iters=6)
    assert np.allclose(tm, np.asarray(again), atol=2e-6)
    # the trained codebook drops into semantic_dedup: clusters now map
    # 1:1 to cells, so each planted cluster keeps exactly one doc
    out = semantic_dedup(df, threshold=0.9, dim=8, cents=trained).collect()
    keepers = [r["vec_id"] for r in out if not r["is_dup"]]
    assert len(keepers) == 3
