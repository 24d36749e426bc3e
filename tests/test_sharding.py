"""Unit tests for vector_spark.sharding (global row_number + snake-balanced
shard planning)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def test_global_row_number_matches_single_window(spark):
    from vector_spark.sharding import global_row_number

    rows = [(f"d{i:03d}", (i * 37) % 101) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id string, n long").repartition(7)
    got = {
        r["doc_id"]: r["rank"]
        for r in global_row_number(
            df, [F.col("n").desc(), F.col("doc_id").asc()]
        ).collect()
    }
    expected_order = sorted(rows, key=lambda t: (-t[1], t[0]))
    for rank, (doc_id, _) in enumerate(expected_order):
        assert got[doc_id] == rank


def test_shard_assign_deterministic_and_partitioning_invariant(spark):
    from vector_spark.sharding import shard_assign

    rows = [(f"d{i:03d}", random.Random(i).randint(1, 500)) for i in range(150)]
    df1 = spark.createDataFrame(rows, "doc_id string, n_tok long").repartition(3)
    df2 = spark.createDataFrame(rows, "doc_id string, n_tok long").repartition(11)
    a1 = {(r["doc_id"], r["shard"]) for r in shard_assign(df1, 4).collect()}
    a2 = {(r["doc_id"], r["shard"]) for r in shard_assign(df2, 4).collect()}
    assert a1 == a2


def test_snake_balance_bound(spark):
    from vector_spark.sharding import shard_stats

    rng = random.Random(7)
    rows = [(f"d{i:04d}", rng.randint(1, 1000)) for i in range(400)]
    out = shard_stats(
        spark.createDataFrame(rows, "doc_id string, n_tok long"), n_shards=8
    ).collect()
    totals = [r["n_tokens"] for r in out]
    assert len(out) == 8
    assert sum(r["n_docs"] for r in out) == 400
    # folded round-robin over a desc-sorted sequence: the spread between
    # any two shard totals is bounded by the largest single doc
    assert max(totals) - min(totals) <= max(n for _, n in rows)


def test_snake_shard_fold_pattern(spark):
    from vector_spark.sharding import snake_shard

    df = spark.range(12).select(F.col("id").alias("rank"))
    got = [
        r["s"]
        for r in df.select(snake_shard(F.col("rank"), 3).alias("s"))
        .orderBy("rank")
        .collect()
    ]
    assert got == [0, 1, 2, 2, 1, 0, 0, 1, 2, 2, 1, 0]
