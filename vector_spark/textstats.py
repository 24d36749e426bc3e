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


# Unicode script blocks (public Unicode ranges) for script-first language
# ID.  Patterns are plain character-class ranges built from literal
# codepoints, so the SAME pattern string is valid in Java regex (Spark)
# and RE2 (DuckDB).
_SCRIPT_RANGES: dict[str, list[tuple[int, int]]] = {
    "han": [(0x4E00, 0x9FFF)],
    "kana": [(0x3040, 0x309F), (0x30A0, 0x30FF)],
    "hangul": [(0xAC00, 0xD7AF)],
    "cyrillic": [(0x0400, 0x04FF)],
    "arabic": [(0x0600, 0x06FF)],
    "devanagari": [(0x0900, 0x097F)],
    "greek": [(0x0370, 0x03FF)],
    "hebrew": [(0x0590, 0x05FF)],
    "thai": [(0x0E00, 0x0E7F)],
    "latin": [(0x41, 0x5A), (0x61, 0x7A)],
}

# priority-ordered (first match wins) mapping from dominant script to
# language; CJK is special-cased: kana presence >= 10% of han separates
# Japanese from Chinese
_SCRIPT_LANGS = [
    ("hangul", "ko"),
    ("cyrillic", "ru"),
    ("arabic", "ar"),
    ("devanagari", "hi"),
    ("greek", "el"),
    ("hebrew", "he"),
    ("thai", "th"),
]


def _script_class(name: str) -> str:
    return "[" + "".join(f"{chr(a)}-{chr(b)}" for a, b in _SCRIPT_RANGES[name]) + "]"


def script_count(col: Column | str, script: str) -> Column:
    """Number of characters of ``script`` in the text (explicit Unicode
    block ranges)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(_script_class(script)), F.lit(0)))


def lang_id_script(col: Column | str) -> Column:
    """Script-first language ID: when a non-Latin script dominates
    (count*4 >= Latin count), classify by the script — 'ja' when kana is
    >= 10% of the CJK mass, 'zh' for the Han remainder, then
    ko/ru/ar/hi/el/he/th by first-match priority; otherwise fall back to
    the stopword-argmax :func:`lang_id` (which covers the Latin-script
    languages).  Every term is a plain regexp count, so the DuckDB twin
    reproduces it bit-for-bit."""
    n = {s: script_count(col, s) for s in _SCRIPT_RANGES}
    cjk = n["han"] + n["kana"]
    nl_max = F.greatest(cjk, *[n[s] for s, _ in _SCRIPT_LANGS])
    expr = F.when((nl_max == 0) | (nl_max * 4 < n["latin"]), lang_id(col)).when(
        (cjk == nl_max) & (n["kana"] * 10 >= n["han"]), F.lit("ja")
    ).when(cjk == nl_max, F.lit("zh"))
    for s, lg in _SCRIPT_LANGS:
        expr = expr.when(n[s] == nl_max, F.lit(lg))
    return expr.otherwise(F.lit("und"))  # unreachable: nl_max is one of them


def sql_script_count(expr: str, script: str) -> str:
    return f"len(regexp_extract_all({expr}, '{_script_class(script)}'))"


def sql_lang_id_script(expr: str) -> str:
    """DuckDB twin of :func:`lang_id_script` (same CASE chain)."""
    n = {s: sql_script_count(expr, s) for s in _SCRIPT_RANGES}
    cjk = f"({n['han']} + {n['kana']})"
    nl_max = "GREATEST(" + ", ".join([cjk] + [n[s] for s, _ in _SCRIPT_LANGS]) + ")"
    branches = [
        f"WHEN {nl_max} = 0 OR {nl_max} * 4 < {n['latin']} THEN {sql_lang_id(expr)}",
        f"WHEN {cjk} = {nl_max} AND {n['kana']} * 10 >= {n['han']} THEN 'ja'",
        f"WHEN {cjk} = {nl_max} THEN 'zh'",
    ]
    branches += [f"WHEN {n[s]} = {nl_max} THEN '{lg}'" for s, lg in _SCRIPT_LANGS]
    return "CASE " + " ".join(branches) + " ELSE 'und' END"


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


# ---------------------------------------------------------------------------
# Gopher quality-rule battery (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", Table A1 — public).
#
# quality_score() above is a C4-ish composite; this is the full named rule
# set modern curation stacks apply verbatim (Gopher rules, reused by
# RefinedWeb/Dolma/FineWeb), each rule a separate boolean so downstream
# audits can attribute drops.  The repetition-fraction rules from the same
# table live in repetition.py (they need the token stream); these are the
# document-shape rules over raw text.  Everything is per-row codegen
# (regexp_count / array ops) — no shuffle, no UDF; the one HOF filter
# (alpha-word fraction) has no RE2-safe regex alternative (DuckDB has no
# lookbehind) and is the lang_id-precedent cheap pass.

GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

_BULLET_RE = r"(?m)^\s*[-*•]"
_ELLIPSIS_RE = r"(?m)(\.\.\.|…)$"


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_wlen: float = 3.0,
    max_mean_wlen: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """One row per doc: (id, n_words, r_words, r_wlen, r_symbol, r_bullet,
    r_ellipsis, r_alpha, r_stop, keep) — each Gopher rule as its own
    boolean, keep = AND of all.

    Rules (defaults = the paper's):
    - r_words    : word count in [min_words, max_words]
    - r_wlen     : mean word length in [min_mean_wlen, max_mean_wlen]
    - r_symbol   : (count('#') + count('...') + count('…')) / words <= 0.1
    - r_bullet   : fraction of lines starting with a bullet <= 0.9
    - r_ellipsis : fraction of lines ending with an ellipsis <= 0.3
    - r_alpha    : fraction of words containing an alphabetic char >= 0.8
    - r_stop     : at least 2 of {the, be, to, of, and, that, have, with}
    """
    t = F.col(text_col)
    w = words(t)
    n_words = F.size(w).cast("long")
    nw = F.greatest(n_words, F.lit(1)).cast("double")
    mean_wlen = F.length(F.array_join(w, "")).cast("double") / nw
    symbols = (
        F.regexp_count(t, F.lit(r"#"))
        + F.regexp_count(t, F.lit(r"\.\.\."))
        + F.regexp_count(t, F.lit("…"))
    ).cast("double")
    n_lines = (F.regexp_count(t, F.lit(r"\n")) + 1).cast("double")
    bullet_frac = F.regexp_count(t, F.lit(_BULLET_RE)).cast("double") / n_lines
    ell_frac = F.regexp_count(t, F.lit(_ELLIPSIS_RE)).cast("double") / n_lines
    wl = words(F.lower(t))
    alpha_frac = (
        F.size(F.filter(w, lambda x: x.rlike("[A-Za-z]"))).cast("double") / nw
    )
    stop_hits = sum(
        F.array_contains(wl, s).cast("int") for s in GOPHER_STOPWORDS
    )
    return df.select(
        id_col,
        n_words.alias("n_words"),
        ((n_words >= min_words) & (n_words <= max_words)).alias("r_words"),
        ((mean_wlen >= min_mean_wlen) & (mean_wlen <= max_mean_wlen)).alias(
            "r_wlen"
        ),
        (symbols / nw <= max_symbol_ratio).alias("r_symbol"),
        (bullet_frac <= max_bullet_ratio).alias("r_bullet"),
        (ell_frac <= max_ellipsis_ratio).alias("r_ellipsis"),
        (alpha_frac >= min_alpha_frac).alias("r_alpha"),
        (stop_hits >= min_stop_hits).alias("r_stop"),
    ).withColumn(
        "keep",
        F.col("r_words")
        & F.col("r_wlen")
        & F.col("r_symbol")
        & F.col("r_bullet")
        & F.col("r_ellipsis")
        & F.col("r_alpha")
        & F.col("r_stop"),
    )


def sql_gopher_rules(
    source_sql: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_wlen: float = 3.0,
    max_mean_wlen: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> str:
    """DuckDB twin of :func:`gopher_rules` (same expressions, RE2 regexes
    written in the Java∩RE2 subset so both engines run the LITERAL same
    patterns — the pii.py convention)."""
    t = text_col
    w = sql_words(t)
    rc = lambda pat: f"len(regexp_extract_all({t}, '{pat}'))"  # noqa: E731
    # RE2 pattern literals: DuckDB single-quoted strings are RAW (no
    # backslash escapes), so the SQL text carries each regex verbatim with
    # SINGLE backslashes (bound here because f-string expressions may not
    # contain backslashes)
    p_dots = "\\.\\.\\."
    p_nl = "\\n"
    p_bullet = _BULLET_RE
    p_ell = _ELLIPSIS_RE
    stop = " + ".join(
        f"CASE WHEN list_contains({sql_words(f'lower({t})')}, '{s}') THEN 1 ELSE 0 END"
        for s in GOPHER_STOPWORDS
    )
    return f"""
SELECT {id_col}, n_words,
       (n_words >= {min_words} AND n_words <= {max_words}) AS r_words,
       (mean_wlen >= {min_mean_wlen} AND mean_wlen <= {max_mean_wlen}) AS r_wlen,
       (symbols / nw <= {max_symbol_ratio}) AS r_symbol,
       (bullets / n_lines <= {max_bullet_ratio}) AS r_bullet,
       (ells / n_lines <= {max_ellipsis_ratio}) AS r_ellipsis,
       (alpha / nw >= {min_alpha_frac}) AS r_alpha,
       (stop_hits >= {min_stop_hits}) AS r_stop,
       ((n_words >= {min_words} AND n_words <= {max_words})
        AND (mean_wlen >= {min_mean_wlen} AND mean_wlen <= {max_mean_wlen})
        AND (symbols / nw <= {max_symbol_ratio})
        AND (bullets / n_lines <= {max_bullet_ratio})
        AND (ells / n_lines <= {max_ellipsis_ratio})
        AND (alpha / nw >= {min_alpha_frac})
        AND (stop_hits >= {min_stop_hits})) AS keep
FROM (
  SELECT {id_col},
         CAST(len({w}) AS BIGINT) AS n_words,
         CAST(GREATEST(len({w}), 1) AS DOUBLE) AS nw,
         CAST(length(array_to_string({w}, '')) AS DOUBLE)
           / CAST(GREATEST(len({w}), 1) AS DOUBLE) AS mean_wlen,
         CAST({rc('#')} + {rc(p_dots)} + {rc('…')} AS DOUBLE) AS symbols,
         CAST({rc(p_nl)} + 1 AS DOUBLE) AS n_lines,
         CAST({rc(p_bullet)} AS DOUBLE) AS bullets,
         CAST({rc(p_ell)} AS DOUBLE) AS ells,
         CAST(len(list_filter({w}, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) AS alpha,
         ({stop}) AS stop_hits
  FROM ({source_sql})
)
"""
