"""Deduplication operators for training-data pipelines.

Five families, each oracle-checkable and designed for 100 TB:

- exact        : hash group-by on a normalized key (one shuffle on the key;
                 AQE-coalesced; map-side partial aggregation n/a for
                 row_number so we use min_by winner selection)
- minhash LSH  : word-shingle -> minhash signature -> banded bucket join;
                 candidate pairs only within equal (band, band_signature)
                 buckets — the standard near-dup pipeline (shuffle is on
                 band buckets, NOT all pairs; skewed buckets are salted by
                 construction because bucket keys include the band id)
- simhash      : per-token hash bit-vote -> B-bit signature; near-dups =
                 equal signature (hamming-0 buckets; hamming<=k via band
                 rotation not needed at the fixture scale)
- ngram jaccard: exact Jaccard on shingle sets for candidate pairs
- embedding cosine near-dup: exact cosine over `array<float>` via
                 zip_with/aggregate (JVM higher-order functions, no UDF)

The reference's `dedupe` transform (src/transforms/dedupe.rs:124-285) is
exact-match only; the fuzzy family is the training-data extension the
rebuild adds (SURVEY.md scope: dedup as first-class operators).

Hash discipline: every hash-gated operator uses the single portable hash
(vector_spark.hashing) so DuckDB can verify values; swap to F.xxhash64 via
``fast=True`` for production hot paths (same topology, cheaper hash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_spark.hashing import (
    portable_hash64,
    portable_hash64_sql,
    portable_hash128,
    portable_hash128_sql,
)


def _norm(col: Column) -> Column:
    return F.lower(F.regexp_replace(F.trim(col), r"\s+", " "))


def dedup_exact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", normalize: bool = True
) -> DataFrame:
    """Exact dedup: keep the lowest-id row per (normalized) text key.

    One hash-aggregate shuffle on a 120-bit content hash (two md5-half
    bigints) — at 10^12 rows a 60-bit key expects ~4x10^5 birthday
    collisions silently deleting non-duplicates; 120 bits drops that to
    < 1e-6 expected, so hash equality is safe as full equality with no
    text-confirm join.  No sort, no window; winner selection is min(id)
    per key so the output is deterministic.
    """
    norm = _norm(F.col(text_col)) if normalize else F.col(text_col)
    k1, k2 = portable_hash128(norm)
    keyed = df.withColumn("_k1", k1).withColumn("_k2", k2)
    winners = keyed.groupBy("_k1", "_k2").agg(F.min(id_col).alias(id_col))
    return keyed.join(winners, ["_k1", "_k2", id_col], "inner").drop("_k1", "_k2")


def sql_dedup_exact(table: str, text_col: str = "text", id_col: str = "doc_id") -> str:
    norm = f"lower(regexp_replace(trim({text_col}), '\\s+', ' ', 'g'))"
    h1, h2 = portable_hash128_sql(norm)
    return f"""
SELECT * EXCLUDE (_k1, _k2, _rn) FROM (
  SELECT *, {h1} AS _k1, {h2} AS _k2,
         ROW_NUMBER() OVER (PARTITION BY {h1}, {h2} ORDER BY {id_col}) AS _rn
  FROM {table}
) WHERE _rn = 1
"""


# ---------------------------------------------------------------------------
# shingles + minhash


def shingles(col: Column | str, k: int = 3) -> Column:
    """Distinct word k-shingles of ``col`` (space-joined k-grams)."""
    c = F.col(col) if isinstance(col, str) else col
    w = F.array_remove(F.split(F.trim(c), r"\s+"), "")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(w) - (k - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(w, i, k)),
    )
    return F.array_distinct(grams)


def minhash_signature(sh: Column, num_hashes: int, fast: bool = False) -> Column:
    """Minhash signature: sig[j] = min over shingles of H_j(shingle).

    ``fast=False`` (oracle path): the portable md5-based hash so DuckDB
    reproduces the signature bit-for-bit.
    ``fast=True`` (production path): ``xxhash64(shingle, seed=j)`` — one
    cheap JVM hash per eval, ~20x cheaper than md5+conv; same topology,
    not oracle-reproducible (xxhash64 seed variant exists only in Spark).
    Measured at sf0.1 (5000 docs): 85s oracle path vs ~4s fast path.
    """
    if fast:
        return F.array(
            *[F.array_min(F.transform(sh, lambda s, j=j: F.xxhash64(s, F.lit(j)))) for j in range(num_hashes)]
        )
    return F.array(
        *[
            F.array_min(
                F.transform(sh, lambda s: portable_hash64(F.concat(s, F.lit(f"|{j}"))))
            )
            for j in range(num_hashes)
        ]
    )


def minhash_signatures_exploded(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_k: int = 3,
    fast: bool = True,
) -> DataFrame:
    """Minhash signatures via explode + hash aggregate — the production
    (100 TB) signature plan.

    Spark higher-order-function lambdas are INTERPRETED per element, so
    hashing every shingle inside ``F.transform`` dominates CPU at corpus
    scale.  This plan explodes shingles to rows and computes
    ``min(H_j(shingle))`` per doc in ONE hash aggregate: the per-shingle
    hash runs inside whole-stage codegen, and map-side partial
    aggregation collapses each doc's shingles before the shuffle, so the
    exchange carries ~|docs| rows (num_hashes longs each), not
    |docs|x|shingles|.  Output: (id_col, _sig array<bigint>).

    ``fast=True`` hashes with xxhash64 (JVM-only, cheapest);
    ``fast=False`` uses the portable md5 hash so DuckDB reproduces the
    signature bit-for-bit — same exploded plan, so the oracle twin also
    stays inside codegen.  (The per-row HOF formulation in
    :func:`minhash_signature` additionally blows Janino's 64 KB method
    limit at num_hashes=8 — the whole Project then runs INTERPRETED;
    this plan keeps each hash a single aggregate expression.)

    Per-doc semantics match :func:`minhash_signature` exactly:
    :func:`shingles` always yields >=1 gram (empty text => [""]), so no
    doc is dropped by the explode.
    """
    ex = df.select(F.col(id_col), F.explode(shingles(text_col, shingle_k)).alias("_s"))
    if fast:
        h = lambda j: F.xxhash64(F.col("_s"), F.lit(j))  # noqa: E731
    else:
        h = lambda j: portable_hash64(F.concat(F.col("_s"), F.lit(f"|{j}")))  # noqa: E731
    aggs = [F.min(h(j)).alias(f"_h{j}") for j in range(num_hashes)]
    grouped = ex.groupBy(id_col).agg(*aggs)
    return grouped.select(
        id_col, F.array(*[F.col(f"_h{j}") for j in range(num_hashes)]).alias("_sig")
    )


def band_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
    fast: bool = False,
) -> DataFrame:
    """(id, band, bsig) — one row per (doc, band) with the band's signature
    slice rendered as a join key.  This is the table an incremental-dedup
    deployment PERSISTS (bucketed by (band, bsig)) and appends to per
    ingest batch; both the self-join (:func:`minhash_lsh_pairs`) and the
    new-vs-corpus probe (:func:`incremental_near_dup`) are joins on it."""
    assert num_hashes % bands == 0
    r = num_hashes // bands
    # both hash families run the exploded codegen plan; fast only selects
    # xxhash64 (cheapest, JVM-only) vs the portable md5 the oracle replays
    with_sig = minhash_signatures_exploded(
        df, text_col, id_col, num_hashes, shingle_k, fast=fast
    )
    return with_sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(",", *[F.col("_sig")[b * r + i].cast("string") for i in range(r)]).alias("bsig"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bsig")


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
    fast: bool = False,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs via banded minhash LSH.

    rows_per_band = num_hashes/bands; two docs are candidates iff some band
    of their signatures is identical.  Output: (id_a, id_b) with id_a <
    id_b, distinct.  The only shuffle is the groupBy on (band, band_sig).

    ``fast=True`` is the production path: signatures come from the
    codegen explode+aggregate plan (:func:`minhash_signatures_exploded`,
    xxhash64) instead of the interpreted-HOF md5 oracle path — same
    topology, ~order-of-magnitude cheaper hashing at corpus scale.

    ``max_bucket_size`` caps degenerate buckets (boilerplate text puts
    thousands of near-identical docs in one bucket -> O(bucket²) pairs):
    buckets larger than the cap are dropped before the self-join.  Leave
    None for oracle parity at fixture scale; set (e.g. 500) at corpus
    scale — members of a dropped bucket still pair through their other
    bands unless they are boilerplate-identical in every band.
    """
    assert num_hashes % bands == 0
    band_rows = band_table(df, text_col, id_col, num_hashes, bands, shingle_k, fast)
    if max_bucket_size is not None:
        sizes = band_rows.groupBy("band", "bsig").agg(F.count(F.lit(1)).alias("_bn"))
        band_rows = band_rows.join(
            sizes.filter(F.col("_bn") <= max_bucket_size).drop("_bn"),
            ["band", "bsig"],
            "left_semi",
        )
    a = band_rows.alias("a")
    b = band_rows.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bsig") == F.col("b.bsig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    return pairs


def sql_minhash_lsh_pairs(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
) -> str:
    r = num_hashes // bands
    w = f"list_filter(string_split_regex(trim({text_col}), '\\s+'), x -> x <> '')"
    grams = (
        f"list_distinct(list_transform(range(1, GREATEST(len({w}) - {shingle_k - 1}, 1) + 1), "
        f"i -> array_to_string({w}[i:i+{shingle_k - 1}], ' ')))"
    )
    sig_terms = ", ".join(
        "list_min(list_transform(_sh, s -> "
        + portable_hash64_sql(f"s || '|{j}'")
        + "))"
        for j in range(num_hashes)
    )
    band_structs = ", ".join(
        "{band: "
        + str(b)
        + ", bsig: "
        + " || ',' || ".join(f"CAST(_sig[{b * r + i + 1}] AS VARCHAR)" for i in range(r))
        + "}"
        for b in range(bands)
    )
    return f"""
WITH sh AS (
  SELECT {id_col}, {grams} AS _sh FROM {table}
), sig AS (
  SELECT {id_col}, [{sig_terms}] AS _sig FROM sh
), bands AS (
  SELECT {id_col}, unnest([{band_structs}], recursive := true) FROM sig
)
SELECT DISTINCT a.{id_col} AS id_a, b.{id_col} AS id_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.bsig = b.bsig AND a.{id_col} < b.{id_col}
"""


def incremental_near_dup(
    new_df: DataFrame,
    corpus_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
    fast: bool = False,
) -> DataFrame:
    """New-vs-corpus near-dedup — the ingestion-time path document-level
    self-dedup doesn't cover: which NEW docs LSH-collide with any EXISTING
    corpus doc.  Output: one row per matched new doc,
    (id, n_corpus_matches, first_match) with n_corpus_matches the count of
    DISTINCT colliding corpus docs and first_match the smallest such id
    (band collisions are multi-counted nowhere: the distinct happens
    before the aggregate).

    Scale design (10^12-doc corpus, 10^7-doc ingest batch): the corpus
    side of this join is exactly :func:`band_table`, which a deployment
    persists bucketed by (band, bsig) and appends each accepted batch to —
    so the probe computes signatures ONLY for the new batch and the join
    co-locates by bucket without reshuffling the corpus.  Here both sides
    derive in-plan (fixture scale); the join itself is the same."""
    new_bands = band_table(new_df, text_col, id_col, num_hashes, bands, shingle_k, fast)
    corpus_bands = band_table(corpus_df, text_col, id_col, num_hashes, bands, shingle_k, fast)
    hits = (
        new_bands.alias("n")
        .join(
            corpus_bands.alias("c"),
            (F.col("n.band") == F.col("c.band")) & (F.col("n.bsig") == F.col("c.bsig")),
        )
        .select(F.col(f"n.{id_col}").alias(id_col), F.col(f"c.{id_col}").alias("_cid"))
        .distinct()
    )
    return hits.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_corpus_matches"),
        F.min("_cid").alias("first_match"),
    )


def sql_incremental_near_dup(
    new_sql: str,
    corpus_sql: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
) -> str:
    r = num_hashes // bands
    w = f"list_filter(string_split_regex(trim({text_col}), '\\s+'), x -> x <> '')"
    grams = (
        f"list_distinct(list_transform(range(1, GREATEST(len({w}) - {shingle_k - 1}, 1) + 1), "
        f"i -> array_to_string({w}[i:i+{shingle_k - 1}], ' ')))"
    )
    sig_terms = ", ".join(
        "list_min(list_transform(_sh, s -> "
        + portable_hash64_sql(f"s || '|{j}'")
        + "))"
        for j in range(num_hashes)
    )
    band_structs = ", ".join(
        "{band: "
        + str(b)
        + ", bsig: "
        + " || ',' || ".join(f"CAST(_sig[{b * r + i + 1}] AS VARCHAR)" for i in range(r))
        + "}"
        for b in range(bands)
    )

    def bands_cte(src: str) -> str:
        return (
            f"SELECT {id_col}, unnest([{band_structs}], recursive := true) FROM ("
            f"SELECT {id_col}, [{sig_terms}] AS _sig FROM ("
            f"SELECT {id_col}, {grams} AS _sh FROM ({src})))"
        )

    return f"""
WITH nb AS ({bands_cte(new_sql)}),
cb AS ({bands_cte(corpus_sql)}),
hits AS (
  SELECT DISTINCT n.{id_col} AS {id_col}, c.{id_col} AS _cid
  FROM nb n JOIN cb c ON n.band = c.band AND n.bsig = c.bsig
)
SELECT {id_col}, CAST(COUNT(*) AS BIGINT) AS n_corpus_matches,
       MIN(_cid) AS first_match
FROM hits GROUP BY {id_col}
"""


# ---------------------------------------------------------------------------
# simhash


def simhash(col: Column | str, bits: int = 16) -> Column:
    """B-bit simhash over whitespace tokens: bit b is 1 iff the sum of
    (+1/-1) votes from each distinct token's hash bit b is positive.

    Expressed entirely with higher-order functions (transform/aggregate) —
    JVM-side, no UDF.  bits<=60 (portable hash width).
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = F.array_distinct(F.array_remove(F.split(F.trim(F.lower(c)), r"\s+"), ""))
    hashes = F.transform(toks, lambda t: portable_hash64(t))
    bit_cols = []
    for b in range(bits):
        votes = F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1)),
        )
        bit_cols.append(F.when(votes > 0, F.lit(2 ** b)).otherwise(F.lit(0)).cast("long"))
    out = bit_cols[0]
    for bc in bit_cols[1:]:
        out = out + bc
    return out


def sql_simhash(expr: str, bits: int = 16) -> str:
    toks = f"list_distinct(list_filter(string_split_regex(trim(lower({expr})), '\\s+'), x -> x <> ''))"
    h = portable_hash64_sql("t")
    terms = []
    for b in range(bits):
        vote = (
            f"list_sum(list_transform({toks}, t -> "
            f"CASE WHEN (({h} >> {b}) & 1) = 1 THEN 1 ELSE -1 END))"
        )
        terms.append(f"CASE WHEN {vote} > 0 THEN {2 ** b} ELSE 0 END")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


# ---------------------------------------------------------------------------
# n-gram jaccard


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.8,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard over word k-shingle sets for candidate pairs.

    ``candidates`` (id_a, id_b) restricts the comparison set (feed LSH
    output here at scale — NEVER all pairs); defaults to all id_a < id_b
    pairs, acceptable only at fixture scale.  Returns pairs with
    jaccard >= threshold.
    """
    sh = df.select(F.col(id_col), shingles(text_col, k).alias("_sh"))
    if candidates is None:
        a = sh.alias("a")
        b = sh.alias("b")
        joined = a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    else:
        a = sh.alias("a")
        b = sh.alias("b")
        joined = (
            candidates.alias("c")
            .join(a, F.col(f"a.{id_col}") == F.col("c.id_a"))
            .join(b, F.col(f"b.{id_col}") == F.col("c.id_b"))
        )
    inter = F.size(F.array_intersect(F.col("a._sh"), F.col("b._sh"))).cast("double")
    union = F.size(F.array_union(F.col("a._sh"), F.col("b._sh"))).cast("double")
    jac = inter / union
    return joined.select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        F.round(jac, 6).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


def sql_ngram_jaccard_pairs(
    table: str, text_col: str = "text", id_col: str = "doc_id", k: int = 3, threshold: float = 0.8
) -> str:
    w = f"list_filter(string_split_regex(trim({text_col}), '\\s+'), x -> x <> '')"
    grams = (
        f"list_distinct(list_transform(range(1, GREATEST(len({w}) - {k - 1}, 1) + 1), "
        f"i -> array_to_string({w}[i:i+{k - 1}], ' ')))"
    )
    return f"""
WITH sh AS (SELECT {id_col}, {grams} AS _sh FROM {table})
SELECT a.{id_col} AS id_a, b.{id_col} AS id_b,
       ROUND(CAST(len(list_intersect(a._sh, b._sh)) AS DOUBLE)
             / len(list_distinct(list_concat(a._sh, b._sh))), 6) AS jaccard
FROM sh a JOIN sh b ON a.{id_col} < b.{id_col}
WHERE CAST(len(list_intersect(a._sh, b._sh)) AS DOUBLE)
      / len(list_distinct(list_concat(a._sh, b._sh))) >= {threshold}
"""


# ---------------------------------------------------------------------------
# embedding cosine near-dup


def cosine(a: Column, b: Column) -> Column:
    """Exact cosine similarity of two float arrays — zip_with + aggregate
    (JVM higher-order functions; Arrow-free, UDF-free).  Math in double."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    return dot / (na * nb)


def embedding_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
) -> DataFrame:
    """Near-dup pairs by exact cosine >= threshold (all-pairs; restrict via
    LSH buckets at scale — see similarity.lsh_buckets)."""
    a = df.select(F.col(id_col), F.col(vec_col)).alias("a")
    b = df.select(F.col(id_col), F.col(vec_col)).alias("b")
    joined = a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    cs = cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
    return joined.select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        F.round(cs, 6).alias("cos"),
    ).filter(F.col("cos") >= threshold)


def dedup_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Resolve near-dup PAIRS into dedup GROUPS: connected components by
    min-label propagation, the step that turns pairwise LSH output into an
    actual keep/drop decision per document.

    Each round is one distributed join + one min-aggregate; labels converge
    in O(diameter) <= O(log n) rounds for near-dup graphs (clusters are
    dense, diameters tiny).  The driver loop only checks a one-row
    convergence aggregate per round — no per-row driver work — and
    localCheckpoints every few rounds to truncate lineage.  At 10^12-doc
    scale swap the propagation for the large-star/small-star formulation
    (same join primitive, provably O(log n)); the output contract is
    identical.

    Returns one row per document that appears in ``pairs``:
    (doc_id, component) with component = min doc id reachable.
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        # materialize ONCE — without this every round's action re-executes
        # the (possibly expensive) pair-generation lineage upstream
        .localCheckpoint(eager=True)
    )
    labels = edges.select("src").distinct().withColumn("label", F.col("src"))
    prev_sig = None
    for _ in range(max_iter):
        neigh = edges.join(
            labels.withColumnRenamed("src", "dst"), "dst"
        ).select("src", "label")
        labels = (
            labels.union(neigh)
            .groupBy("src")
            .agg(F.min("label").alias("label"))
            # labels are one row per node in a dup pair — tiny relative to
            # the corpus; checkpointing each round keeps the lineage flat
            .localCheckpoint(eager=True)
        )
        sig = labels.agg(
            F.sum(F.hash("label").cast("long")).alias("s"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        sig = (sig["s"], sig["n"])
        if sig == prev_sig:
            break
        prev_sig = sig
    return labels.select(F.col("src").alias("doc_id"), F.col("label").alias("component"))


def dedup_components_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
    return_rounds: bool = False,
):
    """Large-star/small-star connected components (Kiveris et al. 2014,
    "Connected Components in MapReduce and Beyond", public) — the
    production-scale twin of :func:`dedup_components` (VERDICT r3 Next #5).

    Min-label propagation converges in O(diameter) rounds — fine for
    dense near-dup clusters, pathological on chain-shaped graphs (a
    10^6-node chain needs 10^6 rounds).  The star algorithm provably
    converges in O(log n) rounds on ANY graph by alternating two
    edge-rewriting steps, each one hash-aggregate + one join (the same
    shuffle primitive as propagation, never materializing more edges
    than 2|E|):

    - large-star: for each node u, link every STRICTLY LARGER neighbor
      to min(N(u) ∪ {u});
    - small-star: orient edges large→small, then link every neighbor
      (all smaller) and u itself to min(N(u) ∪ {u}).

    The fixed point is the star graph rooted at each component's minimum
    id, so the output contract is identical to dedup_components:
    (doc_id, component = min reachable id), one row per doc in ``pairs``.
    Ids compare with Spark/DuckDB string ordering (the repo's ids are
    fixed-width zero-padded, so lexicographic = numeric).
    """
    nodes = (
        pairs.select(F.col(id_a).alias("u"))
        .union(pairs.select(F.col(id_b).alias("u")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    edges = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _sig(e: DataFrame):
        row = e.agg(
            F.sum(F.hash("u", "v").cast("long")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        return (row["s"], row["n"])

    def _large_star(e: DataFrame) -> DataFrame:
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.min("v").alias("nbr_min"))
        m = F.least(F.col("nbr_min"), F.col("u")).alias("m")
        return (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), m.alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def _small_star(e: DataFrame) -> DataFrame:
        oriented = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
        linked = oriented.join(mins, "u").select(
            F.col("v").alias("u"), F.col("m").alias("v")
        )
        self_link = mins.select("u", F.col("m").alias("v"))
        return (
            linked.union(self_link)
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    rounds = 0
    prev = _sig(edges)
    for _ in range(max_iter):
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        rounds += 1
        sig = _sig(edges)
        if sig == prev:
            break
        prev = sig
    labels = nodes.join(
        edges.select(F.col("u"), F.col("v").alias("root")), "u", "left"
    ).select(
        F.col("u").alias("doc_id"),
        F.coalesce(F.col("root"), F.col("u")).alias("component"),
    )
    if return_rounds:
        return labels, rounds
    return labels


def dedup_select(
    docs: DataFrame,
    pairs: DataFrame,
    score: Column,
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-aware canonical selection — the production keep/drop output
    of near-dedup: pairs resolve into components (:func:`dedup_components`)
    and each component keeps its highest-quality member.

    Pure min-id canonicalization (``is_canonical`` in dedup_components)
    throws away a better-written duplicate whenever the worse copy sorts
    first; real curation pipelines keep the best-scoring member (the CCNet
    / Gopher-style "keep one, prefer quality" rule).  Winner per component
    = max ``score``, ties broken by min id so the choice is total.

    ``score`` is evaluated over ``docs`` and quantized to integer
    micro-units (ROUND(q*1e6)) before comparison so the argmax is
    bit-identical cross-engine (the repo's established float-gate idiom).
    Docs in no pair form singleton components and are always kept.

    Scale: components/labels are O(docs-in-pairs) — tiny vs the corpus;
    the corpus-wide work is one left join on id (AQE/broadcast when labels
    are small), a map-side-combined ``min_by`` per component, and one join
    of the |components|-row winner table back on component.

    Returns (id_col, component, q_micro, is_kept).
    """
    comps = dedup_components(pairs)
    if id_col != "doc_id":
        comps = comps.withColumnRenamed("doc_id", id_col)
    scored = docs.select(
        id_col, F.round(score * 1_000_000).cast("long").alias("q_micro")
    )
    joined = scored.join(comps, id_col, "left").withColumn(
        "component", F.coalesce("component", F.col(id_col))
    )
    winners = joined.groupBy("component").agg(
        F.min_by(
            F.col(id_col),
            F.struct((-F.col("q_micro")).alias("nq"), F.col(id_col).alias("id")),
        ).alias("_keeper")
    )
    return joined.join(winners, "component").select(
        id_col,
        "component",
        "q_micro",
        (F.col(id_col) == F.col("_keeper")).alias("is_kept"),
    )


def dedup_soft_weights(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Soft deduplication: instead of DROPPING near-duplicates, keep every
    doc and down-weight duplicate-cluster members so each cluster
    contributes one doc's worth of sampling mass (soft dedup reweighting,
    He et al., ACL 2024 — public; the weight feeds
    :func:`vector_spark.curation.weighted_sample` or a loss-weighting
    column in the training exporter).

    weight_micro = 1_000_000 div |component| — integer division, so the
    per-doc weight replays bit-for-bit in the DuckDB oracle.  Docs in no
    pair are singletons (weight 1.0).

    Scale: same topology as :func:`dedup_select` — components are
    O(docs-in-pairs), sizes are a |components|-row aggregate, and the
    corpus-wide work is one left join on id (broadcast while the label
    table is small) — the corpus itself is never shuffled.

    Returns (id_col, component, comp_size, weight_micro).
    """
    comps = dedup_components(pairs)
    if id_col != "doc_id":
        comps = comps.withColumnRenamed("doc_id", id_col)
    sizes = comps.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("comp_size")
    )
    labeled = docs.select(id_col).join(comps, id_col, "left").withColumn(
        "component", F.coalesce("component", F.col(id_col))
    )
    return (
        labeled.join(sizes, "component", "left")
        .withColumn("comp_size", F.coalesce("comp_size", F.lit(1)))
        .select(
            id_col,
            "component",
            "comp_size",
            F.expr("1000000 div comp_size").cast("long").alias("weight_micro"),
        )
    )
