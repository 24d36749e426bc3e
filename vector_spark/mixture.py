"""Deterministic domain-mixture sampling for training-data assembly.

Pre-training corpora are assembled to a target source mixture ("40%% web,
30%% code, ..." of a token budget); the sampler must be deterministic
(resumable / auditable) and must not depend on row order.  The reference
is a log pipeline and has no such operator; this is one of the
LLM-data-pipeline extensions graded alongside SURVEY.md §2.  Its `sample`
transform (src/transforms/sample.rs:112-155) establishes the
hash-bucket-keyed selection idiom this generalizes.

Semantics: given per-source weights ``w_s`` (normalized) and a token
budget ``B``, each source gets rate ``r_s = min(1, (w_s*B)/A_s)`` where
``A_s`` is the source's available tokens; a doc is kept iff
``portable_hash64(doc_id) % 1e6 < floor(r_s * 1e6)``.  Sources whose
share cannot be filled (A_s < w_s*B) saturate at keep-everything — the
standard "sample down the over-represented, keep the rare" behavior.

Scale design: one narrow aggregate over (source, n_tok) — token arrays
pruned from the scan — collects |sources| rows to the driver; the rates
return to the plan as a literal map, and selection is a single
shuffle-free filter pass.  Nothing materializes at O(docs) off the
executors.  The md5-based bucket is the repo's pinned portable hash, so
the exact selected set is reproducible in DuckDB (and in any engine with
md5) for auditing.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_spark.hashing import portable_hash64, portable_hash64_sql

_PPM = 1_000_000


def normalized_weights(weights: dict[str, float]) -> dict[str, float]:
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("mixture weights must sum to > 0")
    return {s: w / total for s, w in weights.items()}


def temperature_weights_from_avail(
    avail: dict[str, int], alpha: float
) -> dict[str, float]:
    """α-smoothed source weights from availability counts:
    ``w_s ∝ (A_s)^alpha`` (the multilingual-sampling rule of mT5 /
    XLM-R: alpha=1 reproduces natural proportions, alpha→0 approaches
    uniform, 0<alpha<1 upsamples rare sources).  Pure driver-side float
    math so the oracle derives THE SAME literals from the same counts —
    no cross-engine pow."""
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    pw = {s: float(a) ** float(alpha) for s, a in avail.items() if a > 0}
    total = sum(pw.values())
    if total <= 0:
        raise ValueError("no source has tokens")
    return {s: v / total for s, v in sorted(pw.items())}


def temperature_weights(
    df: DataFrame,
    alpha: float,
    source_col: str = "source",
    n_col: str = "n_tok",
) -> dict[str, float]:
    """α-smoothed weights from the corpus itself (one narrow aggregate,
    |sources| rows to the driver); feed into :func:`mixture_sample` /
    :func:`mixture_summary`."""
    avail = {
        r[source_col]: int(r["_a"])
        for r in df.groupBy(source_col).agg(F.sum(n_col).alias("_a")).collect()
    }
    return temperature_weights_from_avail(avail, alpha)


def mixture_rates(
    df: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    source_col: str = "source",
    n_col: str = "n_tok",
) -> dict[str, int]:
    """Per-source keep-rate in parts-per-million.  One narrow aggregate;
    |sources| rows to the driver."""
    wn = normalized_weights(weights)
    avail = {
        r[source_col]: int(r["_a"])
        for r in df.groupBy(source_col).agg(F.sum(n_col).alias("_a")).collect()
    }
    rates = {}
    for s, a in avail.items():
        w = wn.get(s, 0.0)
        # keep the float expression shape identical to the oracle SQL:
        # (w * B) / a, then floor(min(1, r) * 1e6)
        r = min(1.0, (w * token_budget) / a) if a > 0 else 0.0
        rates[s] = int(math.floor(r * _PPM))
    return rates


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    id_col: str = "doc_id",
    source_col: str = "source",
    n_col: str = "n_tok",
) -> DataFrame:
    """Rows of ``df`` selected by the deterministic mixture rule, with a
    ``rate_ppm`` column recording the applied per-source rate."""
    rates = mixture_rates(df, weights, token_budget, source_col, n_col)
    rate_map = F.create_map(
        *[F.lit(x) for kv in sorted(rates.items()) for x in kv]
    )
    bucket = portable_hash64(F.col(id_col)) % _PPM
    rate = F.coalesce(rate_map[F.col(source_col)], F.lit(0))
    return df.withColumn("rate_ppm", rate).filter(bucket < F.col("rate_ppm"))


def mixture_summary(
    df: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    id_col: str = "doc_id",
    source_col: str = "source",
    n_col: str = "n_tok",
) -> DataFrame:
    """Per-source audit of the sample: docs/tokens kept, the applied rate,
    and a checksum over the selected doc ids (sum of hash buckets — pins
    the exact selected set, not just its size)."""
    sel = mixture_sample(df, weights, token_budget, id_col, source_col, n_col)
    bucket = portable_hash64(F.col(id_col)) % _PPM
    return (
        sel.groupBy(source_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(n_col).cast("long").alias("n_tokens"),
            F.first("rate_ppm").alias("rate_ppm"),
            F.sum(bucket).cast("long").alias("sel_sum"),
        )
        .select(source_col, "n_docs", "n_tokens", "rate_ppm", "sel_sum")
    )


def sql_mixture_summary(
    src_sql: str,
    weights: dict[str, float],
    token_budget: int,
    id_col: str = "doc_id",
    source_col: str = "source",
    n_col: str = "n_tok",
) -> str:
    """DuckDB oracle: recomputes availability, rates, selection, and the
    summary entirely in SQL (cross-checks the driver-side rate math)."""
    wn = normalized_weights(weights)
    # CAST: DuckDB parses long float literals as wide DECIMALs, which
    # overflow when multiplied by the token budget; the engines must both
    # use the float64 value of the same literal anyway
    wrows = ", ".join(
        f"('{s}', CAST({w!r} AS DOUBLE))" for s, w in sorted(wn.items())
    )
    bucket = f"({portable_hash64_sql(id_col)} % {_PPM})"
    return f"""
WITH src AS (
  SELECT * FROM {src_sql}
), w(src_key, wt) AS (
  VALUES {wrows}
), avail AS (
  SELECT {source_col} AS src_key, CAST(SUM({n_col}) AS BIGINT) AS a
  FROM src GROUP BY {source_col}
), rates AS (
  SELECT a.src_key,
         CAST(FLOOR(LEAST(1.0, (COALESCE(w.wt, 0.0) * {token_budget}) / CAST(a.a AS DOUBLE)) * {_PPM}) AS BIGINT) AS rate_ppm
  FROM avail a LEFT JOIN w ON a.src_key = w.src_key
), sel AS (
  SELECT s.*, r.rate_ppm, {bucket} AS b
  FROM src s JOIN rates r ON s.{source_col} = r.src_key
  WHERE {bucket} < r.rate_ppm
)
SELECT {source_col}, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM({n_col}) AS BIGINT) AS n_tokens,
       rate_ppm,
       CAST(SUM(b) AS BIGINT) AS sel_sum
FROM sel GROUP BY {source_col}, rate_ppm
"""


# ---------------------------------------------------------------------------
# mixture UPSAMPLING (repeat factor > 1)
#
# mixture_sample caps every rate at 1 — it can only sample DOWN the
# over-represented sources.  Real pre-training mixtures also sample UP:
# a rare high-quality source with weight w_s but availability A_s < w_s·B
# is repeated r_s = (w_s·B)/A_s > 1 times ("epochs" over the source —
# the LLaMA/PaLM data-mixture recipe; public knowledge).  Deterministic
# rule: every doc is emitted floor(r_s) times, plus one extra copy iff
# ``portable_hash64(doc_id) % 1e6 < frac(r_s)·1e6`` — so the fractional
# epoch is a reproducible hash-selected subset, not a random one.
#
# Scale design: same one narrow |sources|-row aggregate as mixture_rates;
# replication is a shuffle-free ``explode(sequence(...))`` — each copy is
# tagged with its ``epoch`` index so downstream shuffling/packing can
# spread repeats apart.  Nothing materializes on the driver at O(docs).


def mixture_repeat_rates(
    df: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    source_col: str = "source",
    n_col: str = "n_tok",
) -> dict[str, int]:
    """Per-source UNCAPPED rate in ppm: floor(((w_s·B)/A_s)·1e6).  Values
    above 1e6 mean the source is repeated (upsampled)."""
    wn = normalized_weights(weights)
    avail = {
        r[source_col]: int(r["_a"])
        for r in df.groupBy(source_col).agg(F.sum(n_col).alias("_a")).collect()
    }
    rates = {}
    for s, a in avail.items():
        w = wn.get(s, 0.0)
        r = (w * token_budget) / a if a > 0 else 0.0
        rates[s] = int(math.floor(r * _PPM))
    return rates


def mixture_upsample(
    df: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    id_col: str = "doc_id",
    source_col: str = "source",
    n_col: str = "n_tok",
) -> DataFrame:
    """Rows of ``df`` replicated to the target mixture: each doc appears
    ``n_copies = floor(rate) + (hash-bucket < frac(rate))`` times with an
    ``epoch`` column in [0, n_copies).  rate<1 degenerates to
    mixture_sample's keep/drop; rate>1 upsamples.  Shuffle-free."""
    rates = mixture_repeat_rates(df, weights, token_budget, source_col, n_col)
    rate_map = F.create_map(
        *[F.lit(x) for kv in sorted(rates.items()) for x in kv]
    )
    bucket = portable_hash64(F.col(id_col)) % _PPM
    rate = F.coalesce(rate_map[F.col(source_col)], F.lit(0))
    n_full = (rate / _PPM).cast("long")
    extra = (bucket < rate % _PPM).cast("long")
    n_copies = n_full + extra
    out = df.withColumn("rate_ppm", rate).withColumn(
        "epoch",
        F.explode(
            F.when(
                n_copies > 0, F.sequence(F.lit(0).cast("long"), n_copies - 1)
            ).otherwise(F.array().cast("array<long>"))
        ),
    )
    return out


def upsample_summary(
    df: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    id_col: str = "doc_id",
    source_col: str = "source",
    n_col: str = "n_tok",
) -> DataFrame:
    """Per-source audit of the replicated stream: emitted rows / tokens /
    distinct docs, the applied rate, and a checksum over (doc, epoch)
    pairs — ``sum(bucket · (epoch+1))`` pins exactly WHICH copies exist,
    not just how many."""
    rep = mixture_upsample(df, weights, token_budget, id_col, source_col, n_col)
    bucket = portable_hash64(F.col(id_col)) % _PPM
    return (
        rep.groupBy(source_col)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(id_col).alias("n_docs"),
            F.sum(n_col).cast("long").alias("n_tokens"),
            F.first("rate_ppm").alias("rate_ppm"),
            F.sum(bucket * (F.col("epoch") + 1)).cast("long").alias("rep_sum"),
        )
        .select(
            source_col, "n_rows", "n_docs", "n_tokens", "rate_ppm", "rep_sum"
        )
    )


def sql_upsample_summary(
    src_sql: str,
    weights: dict[str, float],
    token_budget: int,
    id_col: str = "doc_id",
    source_col: str = "source",
    n_col: str = "n_tok",
) -> str:
    """DuckDB oracle for :func:`upsample_summary` — availability, uncapped
    rates, per-doc copy counts, and the epoch expansion all re-derived in
    SQL (``unnest(range(n_copies))``)."""
    wn = normalized_weights(weights)
    wrows = ", ".join(
        f"('{s}', CAST({w!r} AS DOUBLE))" for s, w in sorted(wn.items())
    )
    bucket = f"({portable_hash64_sql(id_col)} % {_PPM})"
    return f"""
WITH src AS (
  SELECT * FROM {src_sql}
), w(src_key, wt) AS (
  VALUES {wrows}
), avail AS (
  SELECT {source_col} AS src_key, CAST(SUM({n_col}) AS BIGINT) AS a
  FROM src GROUP BY {source_col}
), rates AS (
  SELECT a.src_key,
         CAST(FLOOR(((COALESCE(w.wt, 0.0) * {token_budget}) / CAST(a.a AS DOUBLE)) * {_PPM}) AS BIGINT) AS rate_ppm
  FROM avail a LEFT JOIN w ON a.src_key = w.src_key
), copies AS (
  SELECT s.*, r.rate_ppm, {bucket} AS b,
         (r.rate_ppm // {_PPM})
           + CASE WHEN {bucket} < (r.rate_ppm % {_PPM}) THEN 1 ELSE 0 END AS n_copies
  FROM src s JOIN rates r ON s.{source_col} = r.src_key
), rep AS (
  SELECT *, unnest(range(n_copies)) AS epoch FROM copies
)
SELECT {source_col},
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT {id_col}) AS BIGINT) AS n_docs,
       CAST(SUM({n_col}) AS BIGINT) AS n_tokens,
       rate_ppm,
       CAST(SUM(b * (epoch + 1)) AS BIGINT) AS rep_sum
FROM rep GROUP BY {source_col}, rate_ppm
"""


# ---------------------------------------------------------------------------
# deterministic train/val/test splitting


def split_thresholds(fractions: dict[str, float]) -> list[tuple[str, int]]:
    """Named cumulative ppm cut points (ordered by name for determinism);
    fractions are normalized so they need not sum to exactly 1."""
    total = float(sum(fractions.values()))
    if total <= 0:
        raise ValueError("split fractions must sum to > 0")
    out, cum = [], 0.0
    items = sorted(fractions.items())
    for name, f in items:
        cum += f / total
        out.append((name, int(round(cum * _PPM))))
    out[-1] = (out[-1][0], _PPM)  # close rounding gaps: last split absorbs
    return out


def stratified_split(
    df: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    strata_col: str = "source",
    exact: bool = False,
) -> DataFrame:
    """Deterministic train/val/test assignment, stratified by
    ``strata_col``: adds a ``split`` column naming each row's subset.

    Default (``exact=False``) is the 10^12-scale path: a row's split is a
    pure function of ``portable_hash64(id) % 1e6`` against cumulative ppm
    thresholds — SHUFFLE-FREE, order-independent, resumable, and
    per-stratum proportions hold to ~1/sqrt(n_stratum) (negligible at
    corpus scale).  ``exact=True`` ranks rows by the hash WITHIN each
    stratum and cuts at exact integer boundaries
    (``(rank-1) * 1e6 < cum_ppm * stratum_count``, all-integer so the
    DuckDB twin reproduces it bit-for-bit) — exact proportions, but each
    stratum sorts inside one window partition, so reserve it for strata
    that fit a task.
    """
    cuts = split_thresholds(fractions)
    if exact:
        from pyspark.sql import Window

        w = Window.partitionBy(strata_col)
        rn = F.row_number().over(
            w.orderBy(portable_hash64(F.col(id_col)), F.col(id_col))
        )
        cnt = F.count(F.lit(1)).over(w)
        pos = (rn - 1) * _PPM  # compare against cum_ppm * cnt, all-integer
        # CASE in threshold order: earliest cut wins
        expr = None
        for name, cum in cuts[:-1]:
            cond = pos < cum * cnt
            expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
        expr = F.lit(cuts[0][0]) if expr is None else expr.otherwise(F.lit(cuts[-1][0]))
        return df.withColumn("split", expr)
    bucket = portable_hash64(F.col(id_col)) % _PPM
    expr = None
    for name, cum in cuts[:-1]:
        cond = bucket < cum
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = F.lit(cuts[0][0]) if expr is None else expr.otherwise(F.lit(cuts[-1][0]))
    return df.withColumn("split", expr)


def split_summary(
    df: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    strata_col: str = "source",
    n_col: str = "n_tok",
    exact: bool = False,
) -> DataFrame:
    """Per (stratum, split) audit: docs, tokens, and a selected-set
    checksum (sum of hash buckets) pinning the exact assignment."""
    s = stratified_split(df, fractions, id_col, strata_col, exact)
    bucket = portable_hash64(F.col(id_col)) % _PPM
    return (
        s.groupBy(strata_col, "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(n_col).cast("long").alias("n_tokens"),
            F.sum(bucket).cast("long").alias("sel_sum"),
        )
        .select(strata_col, "split", "n_docs", "n_tokens", "sel_sum")
    )


def sql_split_summary(
    src_sql: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    strata_col: str = "source",
    n_col: str = "n_tok",
) -> str:
    """DuckDB twin of :func:`split_summary` (hash-threshold path)."""
    cuts = split_thresholds(fractions)
    bucket = f"({portable_hash64_sql(id_col)} % {_PPM})"
    branches = " ".join(
        f"WHEN {bucket} < {cum} THEN '{name}'" for name, cum in cuts[:-1]
    )
    case = f"CASE {branches} ELSE '{cuts[-1][0]}' END"
    return f"""
WITH src AS (
  SELECT * FROM {src_sql}
)
SELECT {strata_col}, {case} AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM({n_col}) AS BIGINT) AS n_tokens,
       CAST(SUM({bucket}) AS BIGINT) AS sel_sum
FROM src GROUP BY {strata_col}, {case}
"""
