"""Model-based multiclass language ID (classifier.train_lid_model /
lang_id_model): the fastText-shaped char-trigram NB-rate model.

Reference behavior stood in for: VRL has no LID, but the curation
pipelines Vector feeds (CCNet/fastText lid.176 lineage) argmax a linear
model over hashed char n-grams — this gates that mechanism end-to-end.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_spark.classifier import lang_id_model, train_lid_model

PHRASES = {
    "en": "the quick brown fox jumps over the lazy dog and runs away with them",
    "de": "der schnelle braune fuchs springt über den faulen hund im grünen wald",
    "fr": "le renard brun rapide saute par dessus le chien paresseux du village",
}


def _corpus(spark, n=60):
    rows = []
    langs = sorted(PHRASES)
    for i in range(n):
        lg = langs[i % len(langs)]
        # shared filler + the language phrase: the model must key on the
        # phrase trigrams, not the shared mass
        rows.append((i, f"alpha beta gamma delta {PHRASES[lg]} omega", lg))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_lid_recovers_planted_languages(spark):
    docs = _corpus(spark)
    model = train_lid_model(docs, label_col="lang")
    pred = lang_id_model(docs.select("doc_id", "text"), model)
    joined = pred.join(docs.select("doc_id", "lang"), "doc_id")
    n_right = joined.filter(F.col("lang_pred") == F.col("lang")).count()
    assert n_right == 60


def test_lid_partitioning_invariant(spark):
    docs = _corpus(spark)
    m1 = sorted(
        tuple(r) for r in train_lid_model(docs, label_col="lang").collect()
    )
    m2 = sorted(
        tuple(r)
        for r in train_lid_model(docs.repartition(7), label_col="lang").collect()
    )
    assert m1 == m2


def test_lid_unmatched_doc_predicts_und(spark):
    docs = _corpus(spark)
    model = train_lid_model(docs, label_col="lang")
    probe = spark.createDataFrame(
        [(999, "zzqqxx"), (1000, "x")],  # no trigram in model; len<3
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in lang_id_model(probe, model).collect()}
    assert out[999].lang_pred == "und" and out[999].score_micro == 0
    assert out[1000].lang_pred == "und" and out[1000].n_hits == 0


def test_lid_shared_grams_weigh_nothing(spark):
    """A gram occurring at the same rate in every class must get |w| far
    below a class-exclusive gram's — the NB-rate construction's point."""
    docs = _corpus(spark)
    model = train_lid_model(docs, label_col="lang")
    from vector_spark.hashing import portable_hash64

    probe = spark.createDataFrame([("alp",), ("fuc",)], "g string").select(
        portable_hash64(F.col("g")).alias("feature_hash"),
        F.col("g").alias("g"),
    )
    rows = model.join(probe, "feature_hash").collect()
    shared = [abs(r.w_micro) for r in rows if r.g == "alp"]
    excl = [r.w_micro for r in rows if r.g == "fuc" and r.lang == "de"]
    assert shared and excl
    assert max(shared) < 300_000  # ~|ln 1.35|: rate-balanced gram
    assert excl[0] > 1_000_000  # class-exclusive gram: strongly positive
