"""Unit semantics for domain-mixture sampling (vector_spark/mixture.py).

The oracle-parity gate cross-checks the full rate+selection math against
DuckDB at sf0.01; these pin the edge semantics on tiny inputs.
"""

from __future__ import annotations

from vector_spark.mixture import mixture_rates, mixture_sample, normalized_weights


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, source string, n_tok int")


def test_rates_saturate_for_underfilled_sources(spark):
    rows = [(f"a{i}", "big", 100) for i in range(100)] + [("r1", "rare", 10)]
    df = _docs(spark, rows)
    # rare gets 50% of a 2000-token budget = 1000 tokens but has only 10:
    # saturates at keep-everything; big samples down to ~1000/10000
    rates = mixture_rates(df, {"big": 0.5, "rare": 0.5}, 2000)
    assert rates["rare"] == 1_000_000
    assert rates["big"] == 100_000


def test_sample_deterministic_and_rate_bounded(spark):
    rows = [(f"d{i}", "s", 10) for i in range(2000)]
    df = _docs(spark, rows)
    a = sorted(r["doc_id"] for r in mixture_sample(df, {"s": 1.0}, 10_000).collect())
    b = sorted(r["doc_id"] for r in mixture_sample(df, {"s": 1.0}, 10_000).collect())
    assert a == b  # order-independent determinism
    # rate = 10k/20k = 0.5; hash-uniform selection lands near half
    assert 800 <= len(a) <= 1200


def test_unweighted_source_dropped(spark):
    df = _docs(spark, [("a", "keep", 5), ("b", "drop", 5)])
    out = mixture_sample(df, {"keep": 1.0}, 1_000_000).collect()
    assert {r["source"] for r in out} == {"keep"}


def test_normalized_weights():
    assert normalized_weights({"a": 2.0, "b": 6.0}) == {"a": 0.25, "b": 0.75}
