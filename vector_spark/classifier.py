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


# ---------------------------------------------------------------------------
# Multiclass model-based language ID (fastText LID shape)
#
# Closes the "model-based LID" fidelity gap: VRL's parse_user_agent got a
# real pattern-table rebuild in round 3, but language identification was
# still the stopword/script heuristic (textstats.lang_id / lang_id_script).
# fastText's lid.176 model (Joulin et al. 2016, public) is a LINEAR model
# over hashed character n-grams with a per-class argmax — exactly the
# binary classifier above generalized to K classes, so it reuses the same
# scale design: the model is a broadcast (feature_hash, lang, weight)
# table, scoring is explode -> broadcast hash join -> per-(doc,class)
# integer sum -> argmax.  No UDF anywhere; the exchange carries
# O(docs x classes) rows, never O(chars).
#
# Determinism: weights are one-vs-rest document-frequency log-odds
# quantized to integer micro-nats (floor(ln(.)*1e6), the lm.py precedent),
# so per-doc class scores are integer sums — order-independent and
# bit-identical between Spark and the DuckDB oracle; the argmax tiebreak
# is explicit (score DESC, lang ASC).


def char_ngram_stream(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, _g) — one row per character n-gram OCCURRENCE of the lowercased
    text (fastText's feature stream).  Pure codegen: explode a position
    sequence and substr — no HOF lambda, no UDF.  Docs shorter than ``n``
    contribute no rows (filtered before the sequence so `sequence(1, 0)`
    never produces its descending [1, 0] surprise)."""
    t = F.lower(F.col(text_col))
    return (
        df.filter(F.length(t) >= n)
        .select(
            id_col,
            t.alias("_t"),
            F.explode(F.sequence(F.lit(1), F.length(t) - (n - 1))).alias("_i"),
        )
        .select(id_col, F.col("_t").substr(F.col("_i"), F.lit(n)).alias("_g"))
    )


def train_lid_model(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    id_col: str = "doc_id",
    n: int = 3,
    min_df: int = 2,
) -> DataFrame:
    """(feature_hash, lang, w_micro) — per-class one-vs-rest multinomial
    naive-Bayes RATE log-odds of each char n-gram's occurrence count,
    integer-quantized:

        p_c    = (occ_fc + 1) / (tot_c + V)          # rate of f inside c
        p_rest = (occ_f - occ_fc + 1) / (tot - tot_c + V)
        w_micro = floor( ln(p_c / p_rest) * 1e6 )

    where occ_fc = occurrences of gram f in class-c docs, tot_c = total
    gram occurrences in class c, V = distinct grams (the add-one
    smoothing denominator).  RATES, not raw document counts, so a gram
    shared proportionally by every class weighs ~0 regardless of class
    imbalance — the majority class gets no free win on common grams, and
    the discriminative grams carry the argmax (the textbook multinomial
    NB construction fastText's linear LID approximates).  Grams with
    fewer than ``min_df`` total occurrences are dropped (fastText
    minCount).  The model is small by construction (hashed n-gram
    vocabulary x K classes) and ships as data, like a fastText export."""
    grams = char_ngram_stream(labeled, text_col, id_col, n).join(
        labeled.select(id_col, F.col(label_col).alias("_y")), id_col
    )
    per_class = grams.groupBy("_g", "_y").agg(
        F.count(F.lit(1)).cast("long").alias("_occ")
    )
    per_gram = per_class.groupBy("_g").agg(
        F.sum("_occ").cast("long").alias("_occf")
    )
    per_cls_tot = per_class.groupBy("_y").agg(
        F.sum("_occ").cast("long").alias("_totc")
    )
    glob = per_class.agg(
        F.sum("_occ").cast("long").alias("_tot"),
        F.count_distinct("_g").cast("long").alias("_v"),
    )
    p_c = (F.col("_occ") + 1).cast("double") / (
        F.col("_totc") + F.col("_v")
    ).cast("double")
    p_rest = (F.col("_occf") - F.col("_occ") + 1).cast("double") / (
        F.col("_tot") - F.col("_totc") + F.col("_v")
    ).cast("double")
    w = F.floor(F.log(p_c / p_rest) * F.lit(1e6)).cast("long")
    return (
        per_class.join(per_gram, "_g")
        .join(F.broadcast(per_cls_tot), "_y")
        .crossJoin(F.broadcast(glob))
        .filter(F.col("_occf") >= min_df)
        .select(
            portable_hash64(F.col("_g")).alias("feature_hash"),
            F.col("_y").alias("lang"),
            w.alias("w_micro"),
        )
    )


def lang_id_model(
    df: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """One row per doc: (id, lang_pred, score_micro, n_hits).

    score(doc, c) = sum of w_micro over every n-gram OCCURRENCE matched in
    class c's weight rows (absent features contribute 0, the binary
    scorer's convention); every model class is scored for every doc (a
    broadcast doc x classes frame, so a class with no matched feature
    competes at 0 rather than silently dropping out).  lang_pred is the
    argmax with the explicit (score DESC, lang ASC) tiebreak; docs with no
    matched feature in ANY class predict 'und'."""
    feats = char_ngram_stream(df, text_col, id_col, n).select(
        id_col, portable_hash64(F.col("_g")).alias("feature_hash")
    )
    hits = feats.join(F.broadcast(model), "feature_hash").groupBy(id_col, "lang").agg(
        F.sum("w_micro").cast("long").alias("_s"),
        F.count(F.lit(1)).cast("long").alias("_n"),
    )
    langs = model.select("lang").distinct()
    scored = (
        df.select(id_col)
        .crossJoin(F.broadcast(langs))
        .join(hits, [id_col, "lang"], "left")
        .select(
            id_col,
            "lang",
            F.coalesce(F.col("_s"), F.lit(0)).cast("long").alias("score_micro"),
            F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_hits"),
        )
    )
    from pyspark.sql import Window

    win = Window.partitionBy(id_col).orderBy(
        F.col("score_micro").desc(), F.col("lang").asc()
    )
    tot = Window.partitionBy(id_col)
    return (
        scored.withColumn("_rn", F.row_number().over(win))
        .withColumn("_tot", F.sum("n_hits").over(tot))
        .filter(F.col("_rn") == 1)
        .select(
            id_col,
            F.when(F.col("_tot") > 0, F.col("lang"))
            .otherwise(F.lit("und"))
            .alias("lang_pred"),
            "score_micro",
            "n_hits",
        )
    )


def sql_char_ngram_stream(
    source_sql: str, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> str:
    """DuckDB twin of :func:`char_ngram_stream` (occurrence stream)."""
    t = f"lower({text_col})"
    return f"""
SELECT {id_col}, substr(_t, _i, {n}) AS _g
FROM (
  SELECT {id_col}, {t} AS _t,
         unnest(range(1, length({t}) - {n - 1} + 1)) AS _i
  FROM ({source_sql}) WHERE length({t}) >= {n}
)
"""


def sql_train_lid_model(
    labeled_sql: str,
    text_col: str = "text",
    label_col: str = "lang",
    id_col: str = "doc_id",
    n: int = 3,
    min_df: int = 2,
) -> str:
    h = portable_hash64_sql("_g")
    grams = sql_char_ngram_stream(
        f"SELECT {id_col}, {text_col} FROM ({labeled_sql})", text_col, id_col, n
    )
    return f"""
SELECT {h} AS feature_hash, _y AS lang,
       CAST(FLOOR(LN(
         (CAST(_occ + 1 AS DOUBLE) / CAST(_totc + _v AS DOUBLE))
         / (CAST(_occf - _occ + 1 AS DOUBLE) / CAST(_tot - _totc + _v AS DOUBLE))
       ) * 1e6) AS BIGINT) AS w_micro
FROM (
  SELECT _g, _y, COUNT(*)::BIGINT AS _occ,
         SUM(COUNT(*)) OVER (PARTITION BY _g)::BIGINT AS _occf,
         SUM(COUNT(*)) OVER (PARTITION BY _y)::BIGINT AS _totc,
         SUM(COUNT(*)) OVER ()::BIGINT AS _tot,
         COUNT(DISTINCT _g) OVER ()::BIGINT AS _v
  FROM (
    SELECT g.{id_col}, l.{label_col} AS _y, g._g
    FROM ({grams}) g JOIN ({labeled_sql}) l USING ({id_col})
  ) GROUP BY _g, _y
) WHERE _occf >= {min_df}
"""


def sql_lang_id_model(
    corpus_sql: str,
    model_sql: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> str:
    h = portable_hash64_sql("_g")
    grams = sql_char_ngram_stream("SELECT * FROM corpus", text_col, id_col, n)
    return f"""
WITH corpus AS ({corpus_sql}),
model AS ({model_sql}),
feats AS (SELECT {id_col}, {h} AS feature_hash FROM ({grams})),
hits AS (
  SELECT f.{id_col}, m.lang,
         SUM(m.w_micro)::BIGINT AS _s, COUNT(*)::BIGINT AS _n
  FROM feats f JOIN model m USING (feature_hash)
  GROUP BY f.{id_col}, m.lang
),
scored AS (
  SELECT c.{id_col}, l.lang,
         COALESCE(h._s, 0)::BIGINT AS score_micro,
         COALESCE(h._n, 0)::BIGINT AS n_hits
  FROM (SELECT {id_col} FROM corpus) c
  CROSS JOIN (SELECT DISTINCT lang FROM model) l
  LEFT JOIN hits h ON h.{id_col} = c.{id_col} AND h.lang = l.lang
)
SELECT {id_col},
       CASE WHEN _tot > 0 THEN lang ELSE 'und' END AS lang_pred,
       score_micro, n_hits
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY {id_col} ORDER BY score_micro DESC, lang ASC) AS _rn,
         SUM(n_hits) OVER (PARTITION BY {id_col}) AS _tot
  FROM scored
) WHERE _rn = 1
"""
