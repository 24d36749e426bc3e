"""Duplicate-span detection (vector_spark/dupspans.py): hand-computed
span fixtures, island-merge edge cases, fast (rolling-hash Arrow kernel)
vs oracle-twin parity, and the DuckDB oracle itself."""

from __future__ import annotations

import duckdb
import pytest

from vector_spark.dupspans import (
    dup_span_stats,
    dup_spans,
    sql_dup_span_stats,
    sql_strip_dup_spans,
    strip_dup_spans,
)

# k=3, min_count=2 fixture:
# A/B share the 5-token run [1,2,3,4,5]; C repeats [30,31,32] within
# itself around a gap; D is too short to have any 3-gram; E holds two
# adjacent dup runs that must MERGE into one span, F holds the same two
# runs separated so they stay two spans.
DOCS = [
    ("A", [1, 2, 3, 4, 5, 9, 9, 9]),
    ("B", [7, 1, 2, 3, 4, 5, 8, 20, 21]),
    ("C", [30, 31, 32, 40, 30, 31, 32]),
    ("D", [50, 51]),
    ("E", [60, 61, 62, 70, 71, 72]),
    ("F", [60, 61, 62, 99, 70, 71, 72]),
]

EXPECT = {
    # id: (n_tok, n_spans, dup_tokens)
    "A": (8, 1, 5),
    "B": (9, 1, 5),
    "C": (7, 2, 6),
    "E": (6, 1, 6),
    "F": (7, 2, 6),
}


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id string, tokens array<int>")


def _stats(df, **kw):
    rows = dup_span_stats(df, k=3, min_count=2, **kw).collect()
    return {r["doc_id"]: (r["n_tok"], r["n_spans"], r["dup_tokens"]) for r in rows}


def test_span_stats_handcomputed(docs_df):
    assert _stats(docs_df) == EXPECT


def test_fast_kernel_matches_oracle_twin(docs_df):
    assert _stats(docs_df, fast=True) == _stats(docs_df, fast=False)


def test_join_plan_matches_window_plan(docs_df):
    assert _stats(docs_df, plan="join") == _stats(docs_df, plan="window")
    # every dup gram in the fixture occurs exactly twice
    assert _stats(docs_df, plan="join", max_count=2) == EXPECT
    assert _stats(docs_df, plan="join", max_count=1) == {}


def test_spans_exact_bounds(docs_df):
    spans = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in dup_spans(docs_df, k=3, min_count=2).collect()
    }
    assert spans == {
        ("A", 1, 5),
        ("B", 2, 6),
        ("C", 1, 3),
        ("C", 5, 7),
        ("E", 1, 6),  # adjacent windows merged
        ("F", 1, 3),
        ("F", 5, 7),
    }


def test_max_count_excludes_stop_grams(spark):
    # gram (1,2,3) appears in 4 docs; max_count=3 drops it entirely
    df = spark.createDataFrame(
        [(f"d{i}", [1, 2, 3, 100 + i]) for i in range(4)],
        "doc_id string, tokens array<int>",
    )
    assert _stats(df) != {}
    assert _stats(df, max_count=3) == {}


def test_min_count_three(docs_df):
    # no 3-gram occurs 3x except C's within-doc pair (only 2x) -> empty
    assert dup_span_stats(docs_df, k=3, min_count=3).count() == 0


STRIPPED = {
    "A": ([9, 9, 9], 5),
    "B": ([7, 8, 20, 21], 5),
    "C": ([40], 6),
    "D": ([50, 51], 0),
    "E": ([], 6),
    "F": ([99], 6),
}


def test_strip_dup_spans_handcomputed(docs_df):
    got = {
        r["doc_id"]: (list(r["tokens"]), r["n_removed"])
        for r in strip_dup_spans(docs_df, k=3, min_count=2).collect()
    }
    assert got == STRIPPED


def test_strip_fast_matches_slow(docs_df):
    slow = strip_dup_spans(docs_df, k=3, min_count=2, fast=False).collect()
    fast = strip_dup_spans(docs_df, k=3, min_count=2, fast=True).collect()
    key = lambda rows: {r["doc_id"]: (list(r["tokens"]), r["n_removed"]) for r in rows}
    assert key(slow) == key(fast)


def test_strip_duckdb_oracle_agrees(spark, docs_df, tmp_path):
    p = str(tmp_path / "docs2.parquet")
    docs_df.write.mode("overwrite").parquet(p)
    sql = sql_strip_dup_spans(
        f"(SELECT doc_id, tokens FROM read_parquet('{p}/*.parquet'))",
        k=3, min_count=2,
    )
    got = {r[0]: (list(r[1]), r[2]) for r in duckdb.sql(sql).fetchall()}
    assert got == STRIPPED


def test_duckdb_oracle_agrees(spark, docs_df, tmp_path):
    p = str(tmp_path / "docs.parquet")
    docs_df.write.mode("overwrite").parquet(p)
    sql = sql_dup_span_stats(f"(SELECT doc_id, tokens FROM read_parquet('{p}/*.parquet'))",
                             k=3, min_count=2)
    got = {
        r[0]: (r[1], r[2], r[3], r[4])
        for r in duckdb.sql(sql).fetchall()
    }
    want = {
        r["doc_id"]: (r["n_tok"], r["n_spans"], r["dup_tokens"], r["dup_ratio"])
        for r in dup_span_stats(docs_df, k=3, min_count=2, fast=True).collect()
    }
    assert got == want
