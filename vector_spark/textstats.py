"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

These extend the reference's log-pipeline operator set toward corpus
curation (the engine's target workload is pre-tokenized training data, per
BASELINE.json).  Everything is built-in `pyspark.sql.functions` — JVM-side,
whole-stage codegen, no Python in the hot path — and each operator has a
DuckDB-expressible twin for the oracle gate.

Design at 100 TB: all operators are narrow (per-row projections); no
shuffle is introduced.  Regex/token counting runs inside codegen; the
stopword tables are literal arrays (broadcast as part of the plan, the
degenerate case of an enrichment table).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_spark.hashing import portable_hash64, portable_hash64_sql

# Tiny per-language stopword lists for the n-gram/stopword heuristic
# language-ID (the classic ratio method; lists are deliberately small and
# deterministic).  Keys are ISO 639-1.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"],
    "fr": ["le", "la", "les", "et", "est", "pas", "un", "une", "pour", "dans"],
    "es": ["el", "la", "los", "y", "es", "no", "un", "una", "para", "en"],
}

# BPE-ish tokenization: word pieces, numbers, or single non-space symbols —
# the standard GPT-2-style pre-tokenizer shape, minus unicode categories.
BPE_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def words(col: Column | str) -> Column:
    """Whitespace tokens with empties removed (leading/trailing space safe)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_remove(F.split(F.trim(c), r"\s+"), "")


def token_count_ws(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(words(col))


def token_count_bpe(col: Column | str) -> Column:
    """BPE-ish token count: matches of the GPT-2-style pre-tokenizer regex."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_REGEX), F.lit(0)))


def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    """Fraction of whitespace tokens that are stopwords of ``lang``."""
    w = words(col)
    sw = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
    hits = F.size(F.filter(w, lambda t: F.array_contains(sw, F.lower(t))))
    return hits / F.greatest(F.size(w), F.lit(1))


def lang_id(col: Column | str) -> Column:
    """Heuristic language ID: argmax of per-language stopword hit counts;
    'und' (undetermined) when no list scores > 0.

    One pass over the token array per language; ties break by language key
    order (deterministic).
    """
    w = words(col)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lg in sorted(STOPWORDS):
        sw = F.array(*[F.lit(s) for s in STOPWORDS[lg]])
        score = F.size(F.filter(w, lambda t: F.array_contains(sw, F.lower(t))))
        better = score > best_score
        best_lang = F.when(better, F.lit(lg)).otherwise(best_lang)
        best_score = F.when(better, score).otherwise(best_score)
    return best_lang


def quality_score(col: Column | str) -> Column:
    """Composite quality score in [0,1]: mean of
    - length score      : min(n_chars/500, 1)
    - word-length score : 1 if mean word length in [3,10] else 0
    - punct score       : 1 - min(punct_ratio*5, 1)
    - stopword score    : min(stopword_ratio*5, 1)

    A C4/Gopher-style rule mix; every term is a plain SQL expression so the
    oracle reproduces it bit-for-bit (all math in double).
    """
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c).cast("double")
    w = words(col)
    n_words = F.greatest(F.size(w), F.lit(1)).cast("double")
    mean_wlen = n_chars / n_words
    punct = F.size(F.regexp_extract_all(c, F.lit(r"[^\w\s]"), F.lit(0))).cast("double")
    punct_ratio = punct / F.greatest(n_chars, F.lit(1.0))
    len_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    wlen_score = F.when((mean_wlen >= 3.0) & (mean_wlen <= 10.0), F.lit(1.0)).otherwise(F.lit(0.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio * 5.0, F.lit(1.0))
    sw_score = F.least(stopword_ratio(col) * 5.0, F.lit(1.0))
    return (len_score + wlen_score + punct_score + sw_score) / 4.0


def fingerprint(col: Column | str) -> Column:
    """Deterministic 60-bit document fingerprint over whitespace-normalized,
    lowercased text — the batch stand-in for a streaming rolling hash; equal
    fingerprints <=> equal normalized text (mod collisions)."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))
    return portable_hash64(norm)


# --- DuckDB oracle twins (same algorithms as ANSI-ish SQL) ----------------


def sql_words(expr: str) -> str:
    return f"list_filter(string_split_regex(trim({expr}), '\\s+'), x -> x <> '')"


def sql_token_count_bpe(expr: str) -> str:
    return f"len(regexp_extract_all({expr}, '{BPE_REGEX}'))"


def sql_stopword_hits(expr: str, lang: str) -> str:
    lst = ", ".join(f"'{s}'" for s in STOPWORDS[lang])
    return (
        f"len(list_filter({sql_words(expr)}, x -> list_contains([{lst}], lower(x))))"
    )


def sql_lang_id(expr: str) -> str:
    # mirror lang_id(): later languages win only on strictly greater score
    langs = sorted(STOPWORDS)
    best = "'und'"
    best_score = "0"
    for lg in langs:
        s = sql_stopword_hits(expr, lg)
        best = f"CASE WHEN {s} > {best_score} THEN '{lg}' ELSE {best} END"
        best_score = f"CASE WHEN {s} > {best_score} THEN {s} ELSE {best_score} END"
    return best


def sql_quality_score(expr: str) -> str:
    w = sql_words(expr)
    return f"""(
  LEAST(CAST(length({expr}) AS DOUBLE) / 500.0, 1.0)
  + CASE WHEN CAST(length({expr}) AS DOUBLE) / GREATEST(len({w}), 1) BETWEEN 3.0 AND 10.0
         THEN 1.0 ELSE 0.0 END
  + 1.0 - LEAST(CAST(len(regexp_extract_all({expr}, '[^\\w\\s]')) AS DOUBLE)
                / GREATEST(CAST(length({expr}) AS DOUBLE), 1.0) * 5.0, 1.0)
  + LEAST(CAST({sql_stopword_hits(expr, "en")} AS DOUBLE) / GREATEST(len({w}), 1) * 5.0, 1.0)
) / 4.0"""


def sql_fingerprint(expr: str) -> str:
    norm = f"lower(regexp_replace(trim({expr}), '\\s+', ' ', 'g'))"
    return portable_hash64_sql(norm)
