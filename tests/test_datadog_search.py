"""datadog_search condition compiler — pass/fail pairs adapted from the
reference's own check corpus (src/conditions/datadog_search.rs
get_checks(): each query has a passing and a failing event).

Static-schema adaptation: the LogEvent becomes a row with columns
(message string, tags array<string>, host string, a string, b string,
v double); facets (@a, @v) address columns, bare names address tags."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_spark.conditions import compile_datadog_search

SCHEMA = "message string, tags array<string>, host string, a string, b string, v double"


def _match(spark, query, row: dict) -> bool:
    full = {"message": None, "tags": None, "host": None, "a": None, "b": None, "v": None}
    full.update(row)
    df = spark.createDataFrame(
        [tuple(full[k] for k in ("message", "tags", "host", "a", "b", "v"))],
        SCHEMA,
    )
    return df.filter(compile_datadog_search(query, df)).count() == 1


# (query, passing event, failing event) — from get_checks()
CHECKS = [
    # tag exists / negations
    ("_exists_:a", {"tags": ["a:foo"]}, {"tags": ["b:foo"]}),
    ("NOT _exists_:a", {"tags": ["b:foo"]}, {"tags": ["a:foo"]}),
    ("-_exists_:a", {"tags": ["b:foo"]}, {"tags": ["a:foo"]}),
    # facet exists
    ("_exists_:@b", {"b": "foo"}, {"a": "foo"}),
    ("NOT _exists_:@b", {"a": "foo"}, {"b": "foo"}),
    # missing
    ("_missing_:a", {}, {"tags": ["a:foo"]}),
    ("NOT _missing_:a", {"tags": ["a:foo"]}, {}),
    ("_missing_:@b", {"a": "foo"}, {"b": "foo"}),
    # keyword over the default field (word-boundary substring)
    ("bla", {"message": "bla"}, {}),
    ("foo", {"message": '{"key": "foo"}'}, {}),
    ("bar", {"message": '{"nested": {"value": ["foo", "bar"]}}'}, {}),
    ("NOT bla", {"message": "nothing"}, {"message": "bla"}),
    ("-bla", {"message": "nothing"}, {"message": "bla"}),
    ('"bla"', {"message": "bla"}, {}),
    ('NOT "bla"', {}, {"message": "bla"}),
    # tag match
    ("a:bla", {"tags": ["a:bla"]}, {"tags": ["a:foo"]}),
    ("NOT a:bla", {"tags": ["a:foo"]}, {"tags": ["a:bla"]}),
    ('a:"bla"', {"tags": ["a:bla"]}, {"tags": ["a:foo"]}),
    # reserved field match (host is a column)
    ("host:foo", {"host": "foo"}, {"host": "bar"}),
    ("NOT host:foo", {"host": "bar"}, {"host": "foo"}),
    # facet match
    ("@a:bla", {"a": "bla"}, {"a": "foo"}),
    ("NOT @a:bla", {"a": "foo"}, {"a": "bla"}),
    ('@a:"bla"', {"a": "bla"}, {"a": "foo"}),
    # wildcards on the default field
    ("*bla", {"message": "xbla"}, {"message": "blax"}),
    ("NOT *bla", {"message": "blax"}, {"message": "xbla"}),
    ("bla*", {"message": "blax"}, {"message": "xbla"}),
    ("*b*la*", {"message": "xxbxlax"}, {"message": "xxanotherxx"}),
    # wildcards on tags
    ("a:*bla", {"tags": ["a:xxbla"]}, {"tags": ["a:blaxx"]}),
    ("b:bla*", {"tags": ["b:blaxx"]}, {"tags": ["b:xxbla"]}),
    # wildcards on facets (anchored)
    ("@a:*bla", {"a": "xxbla"}, {"a": "blaxx"}),
    ("@a:bla*", {"a": "blaxx"}, {"a": "xxbla"}),
    # numeric facet comparisons (v is a double column)
    ("@v:>100", {"v": 200.0}, {"v": 50.0}),
    ("@v:>=100", {"v": 100.0}, {"v": 99.0}),
    ("@v:<100", {"v": 50.0}, {"v": 100.0}),
    ("@v:<=100", {"v": 100.0}, {"v": 101.0}),
    # numeric facet range (inclusive)
    ("@v:[100 TO 200]", {"v": 150.0}, {"v": 250.0}),
    ("@v:[100 TO 200]", {"v": 100.0}, {"v": 99.9}),
    # string facet comparison (lexicographic)
    ("@a:>m", {"a": "z"}, {"a": "a"}),
    # tag value comparison (string, after "key:")
    ("a:>m", {"tags": ["a:z"]}, {"tags": ["a:b"]}),
    # boolean combinations
    ("host:foo AND @a:bla", {"host": "foo", "a": "bla"}, {"host": "foo", "a": "x"}),
    ("host:foo OR @a:bla", {"host": "bar", "a": "bla"}, {"host": "bar", "a": "x"}),
    ("host:foo @a:bla", {"host": "foo", "a": "bla"}, {"host": "bar", "a": "bla"}),
    (
        "(host:foo OR host:bar) AND NOT @a:bla",
        {"host": "bar", "a": "x"},
        {"host": "bar", "a": "bla"},
    ),
    # NOT over missing fields is true (reference matcher returns false for
    # absent fields; negation flips it)
    ("NOT host:foo", {}, {"host": "foo"}),
    # grouped values: field distributes over the group, OR semantics
    ("host:(foo OR bar)", {"host": "bar"}, {"host": "baz"}),
    ("host:(foo bar)", {"host": "foo"}, {"host": "baz"}),
    ("@a:(bla blub)", {"a": "blub"}, {"a": "x"}),
    ("a:(bla OR blub)", {"tags": ["a:blub"]}, {"tags": ["a:x"]}),
    ('@a:("with space" OR bla)', {"a": "with space"}, {"a": "x"}),
    ("NOT host:(foo OR bar)", {"host": "baz"}, {"host": "foo"}),
    ("host:(f* OR bar)", {"host": "fxx"}, {"host": "baz"}),
    # quoted field names (attributes with spaces/specials)
    ('"@a":bla', {"a": "bla"}, {"a": "foo"}),
    ('"a":bla', {"tags": ["a:bla"]}, {"tags": ["a:foo"]}),
    ('"host":foo', {"host": "foo"}, {"host": "bar"}),
    ('NOT "host":foo', {"host": "bar"}, {"host": "foo"}),
    ('"host":(foo OR bar)', {"host": "bar"}, {"host": "baz"}),
]


@pytest.mark.parametrize("query,ok,bad", CHECKS, ids=[c[0] for c in CHECKS])
def test_check(spark, query, ok, bad):
    assert _match(spark, query, ok), f"{query!r} should match {ok}"
    assert not _match(spark, query, bad), f"{query!r} should not match {bad}"
