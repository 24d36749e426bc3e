"""Tests for the staged curation runner (curate.py): chain semantics and
manifest resume."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F


def _docs(spark):
    rows = [
        # two exact duplicates (stage 1 keeps d01)
        ("d01", "s0", "BANNER\nbody one\nFOOTER"),
        ("d02", "s0", "BANNER\nbody one\nFOOTER"),
        # boilerplate around unique bodies (stage 2 strips BANNER/FOOTER)
        ("d03", "s0", "BANNER\nbody two two two\nFOOTER"),
        ("d04", "s1", "BANNER\nbody three three\nFOOTER"),
        ("d05", "s1", "BANNER\nbody four\nFOOTER"),
        ("d06", "s1", "BANNER\nbody five is the longest body of them all\nFOOTER"),
    ]
    return spark.createDataFrame(rows, "doc_id string, source string, text string")


def test_curate_chain_stages_compose(spark):
    from vector_spark.curate import curate_chain

    kept = {r["doc_id"]: r for r in curate_chain(_docs(spark), keep_frac=1.0).collect()}
    assert "d02" not in kept  # exact dup removed
    assert kept["d03"]["text"] == "body two two two"  # boilerplate stripped
    assert set(kept) == {"d01", "d03", "d04", "d05", "d06"}


def test_curate_audit_counts(spark):
    from vector_spark.curate import curate_audit

    out = {r["source"]: r for r in curate_audit(_docs(spark), keep_frac=1.0).collect()}
    assert out["s0"]["n_in"] == 3 and out["s0"]["n_out"] == 2
    assert out["s1"]["n_in"] == 3 and out["s1"]["n_out"] == 3
    assert out["s0"]["chars_out"] == len("body one") + len("body two two two")


def test_run_curation_resume_skips_committed_stages(spark, tmp_path):
    from vector_spark.curate import run_curation

    out_dir = str(tmp_path / "curate_out")
    r1 = run_curation(spark, _docs(spark), out_dir, run_id="R")
    assert r1["skipped"] == []
    assert r1["counts"]["exact_dedup"] == 5
    assert r1["counts"]["quality"] <= 5
    r2 = run_curation(spark, _docs(spark), out_dir, run_id="R")
    assert set(r2["skipped"]) == {"exact_dedup", "line_strip", "quality", "audit"}
    assert r2["counts"] == r1["counts"]
    # a NEW run_id re-executes
    shutil.rmtree(out_dir + "/exact_dedup", ignore_errors=False)
    r3 = run_curation(spark, _docs(spark), out_dir, run_id="S")
    assert r3["skipped"] == []


def test_run_curation_crash_resumes_past_committed_stage(spark, tmp_path, monkeypatch):
    """Stage rows are appended durably as each stage commits: a crash in
    line_strip must leave exact_dedup committed so the rerun skips it."""
    import pytest

    import vector_spark.curate as C

    out_dir = str(tmp_path / "curate_crash")
    real = C._cleaned_docs

    def _boom(*a, **k):
        raise RuntimeError("injected crash in line_strip stage")

    monkeypatch.setattr(C, "_cleaned_docs", _boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        C.run_curation(spark, _docs(spark), out_dir, run_id="C")
    monkeypatch.setattr(C, "_cleaned_docs", real)

    r = C.run_curation(spark, _docs(spark), out_dir, run_id="C")
    assert r["skipped"] == ["exact_dedup"]
