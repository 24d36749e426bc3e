"""Model-based quality scoring: a fastText/logistic-style LINEAR text
classifier applied at corpus scale.

The C4/GPT-3-lineage curation step the heuristic `textstats.quality_score`
cannot stand in for: score each document with a trained linear model over
hashed bag-of-words features — score = sigmoid(bias + mean(weight[h(w)]))
— and filter on the probability.  The MODEL here is just a (feature_hash,
weight) table; training happens offline (fastText, sklearn, anything) and
the weights arrive as data, which is exactly how production pipelines ship
classifier updates without redeploying the engine.

Scale design (100 TB corpus, O(10^5..10^6)-row model):

- The model is a **broadcast hash join**, not a UDF closure: explode words
  -> hash -> LEFT broadcast-join the weight table -> per-doc partial-sum.
  Everything is whole-stage codegen; the only exchange carries one partial
  (sum, count) pair per doc (map-side partial aggregation collapses each
  doc's grams inside its scan task), so the shuffle is O(docs) rows of a
  few bytes — not O(tokens).
- Missing vocabulary costs nothing: LEFT join + coalesce(weight, 0).
- The same shape extends to n-gram features by swapping the explode for
  the gram generator in `decontam.py`.

`train_toy_model` builds a deterministic document-frequency-derived weight
table from a labeled frame — naive-Bayes log-odds, NOT a gradient trainer
(no optimizer in this container), but a real if crude linear model with
the exact shape a fastText export has; the whole train+score path is
oracle-reproducible in DuckDB, so the contract gate checks model weights
AND scores end-to-end on real text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_spark.hashing import portable_hash64, portable_hash64_sql
from vector_spark.textstats import sql_words, words


def hashed_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, feature_hash) — one row per word occurrence, hashed with the
    pinned portable hash (so Spark and the DuckDB oracle agree bit-for-bit).
    Lower-cased, whitespace words: the fastText default pre-tokenizer."""
    return df.select(
        id_col,
        F.explode(words(F.lower(F.col(text_col)))).alias("_w"),
    ).select(id_col, portable_hash64(F.col("_w")).alias("feature_hash"))


def score(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bias: float = 0.0,
) -> DataFrame:
    """One row per input doc: (id, n_words, prob) with
    prob = sigmoid(bias + sum(w)/n_words); docs with no words score
    sigmoid(bias).  ``weights``: (feature_hash long, weight double) —
    broadcast (a linear model is small by construction)."""
    feats = hashed_features(df, text_col, id_col)
    joined = feats.join(F.broadcast(weights), "feature_hash", "left")
    per_doc = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum(F.coalesce(F.col("weight"), F.lit(0.0))).alias("_wsum"),
    )
    # one row per doc id assumed (corpus contract); no distinct -> no shuffle
    base = df.select(id_col)
    z = F.lit(bias) + F.coalesce(
        F.col("_wsum") / F.col("n_words"), F.lit(0.0)
    )
    return (
        base.join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_words"), F.lit(0)).cast("long").alias("n_words"),
            F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6).alias("prob"),
        )
    )


def train_toy_model(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    id_col: str = "doc_id",
    min_df: int = 2,
) -> DataFrame:
    """Deterministic stand-in trainer: weight(w) = log((pos_df+1)/(neg_df+1))
    — the naive-Bayes log-odds of each word's document frequency in
    positive vs negative docs (a real, if crude, linear model; public
    textbook construction).  Words seen in < ``min_df`` docs are dropped
    (regularization by truncation, like fastText's minCount).  Output:
    (feature_hash, weight), distinct per feature."""
    per_doc_words = labeled.select(
        id_col,
        F.col(label_col).alias("_y"),
        F.explode(F.array_distinct(words(F.lower(F.col(text_col))))).alias("_w"),
    )
    dfreq = per_doc_words.groupBy("_w").agg(
        F.count(F.lit(1)).cast("long").alias("_df"),
        F.sum(F.when(F.col("_y") == 1, 1).otherwise(0)).cast("long").alias("_pos"),
    )
    kept = dfreq.filter(F.col("_df") >= min_df)
    w = F.log(
        (F.col("_pos") + 1).cast("double")
        / (F.col("_df") - F.col("_pos") + 1).cast("double")
    )
    return kept.select(
        portable_hash64(F.col("_w")).alias("feature_hash"),
        F.round(w, 6).alias("weight"),
    )


# ---------------------------------------------------------------------------
# DuckDB oracle twins


def sql_train_toy_model(
    labeled_sql: str,
    text_col: str = "text",
    label_col: str = "label",
    id_col: str = "doc_id",
    min_df: int = 2,
) -> str:
    h = portable_hash64_sql("_w")
    return f"""
SELECT {h} AS feature_hash,
       ROUND(LN(CAST(_pos + 1 AS DOUBLE) / CAST(_df - _pos + 1 AS DOUBLE)), 6) AS weight
FROM (
  SELECT _w, COUNT(*) AS _df, SUM(CASE WHEN _y = 1 THEN 1 ELSE 0 END) AS _pos
  FROM (
    SELECT DISTINCT {id_col}, {label_col} AS _y,
           unnest({sql_words(f"lower({text_col})")}) AS _w
    FROM ({labeled_sql})
  ) GROUP BY _w
) WHERE _df >= {min_df}
"""


def sql_score(
    corpus_sql: str,
    weights_sql: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    bias: float = 0.0,
) -> str:
    h = portable_hash64_sql("_w")
    return f"""
WITH corpus AS ({corpus_sql}),
w AS ({weights_sql}),
feats AS (
  SELECT {id_col}, {h} AS feature_hash
  FROM (
    SELECT {id_col}, unnest({sql_words(f"lower({text_col})")}) AS _w
    FROM corpus
  )
),
per_doc AS (
  SELECT f.{id_col}, COUNT(*) AS n_words,
         SUM(COALESCE(w.weight, 0.0)) AS _wsum
  FROM feats f LEFT JOIN w USING (feature_hash)
  GROUP BY f.{id_col}
)
SELECT c.{id_col},
       CAST(COALESCE(p.n_words, 0) AS BIGINT) AS n_words,
       ROUND(1.0 / (1.0 + EXP(-({bias} + COALESCE(p._wsum / p.n_words, 0.0)))), 6) AS prob
FROM (SELECT {id_col} FROM corpus) c
LEFT JOIN per_doc p USING ({id_col})
"""
