"""Golden tests for the VRL type/path/secret/debug family
(functions/types.py) against the reference cue-doc examples
(website/cue/reference/remap/functions/is_*.cue, exists.cue,
get_secret.cue, set_secret.cue, remove_secret.cue,
tag_types_externally.cue)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from vector_spark.functions import types as VT


@pytest.fixture(scope="module")
def frame(spark):
    df = spark.createDataFrame(
        [
            (1, "hello", 1.5, True, ["a", "b"], {"k": "v"}, None),
            (2, "", 2.0, False, [], {}, "x"),
        ],
        "id long, s string, f double, b boolean, arr array<string>, "
        "m map<string,string>, maybe string",
    )
    return df.withColumn("nested", F.struct(F.col("s").alias("inner")))


def _one(df, col):
    return df.orderBy("id").select(col.alias("v")).collect()[0]["v"]


def _vals(df, col):
    return [r["v"] for r in df.orderBy("id").select(col.alias("v")).collect()]


def test_is_type_family(frame):
    assert _one(frame, VT.is_string(frame, "s")) is True
    assert _one(frame, VT.is_string(frame, "id")) is False
    assert _one(frame, VT.is_integer(frame, "id")) is True
    assert _one(frame, VT.is_float(frame, "f")) is True
    assert _one(frame, VT.is_boolean(frame, "b")) is True
    assert _one(frame, VT.is_array(frame, "arr")) is True
    assert _one(frame, VT.is_object(frame, "m")) is True
    assert _one(frame, VT.is_object(frame, "nested")) is True
    assert _one(frame, VT.is_regex(frame, "s")) is False
    # a NULL value is not "a string" even on a string column (VRL: null)
    assert _vals(frame, VT.is_string(frame, "maybe")) == [False, True]
    assert _one(frame, VT.is_string(frame, "no_such_col")) is False


def test_is_null_empty_nullish(frame):
    assert _vals(frame, VT.is_null("maybe")) == [True, False]
    # is_empty.cue: [] -> true, "a string" -> false
    assert _vals(frame, VT.is_empty(frame, "arr")) == [False, True]
    assert _vals(frame, VT.is_empty(frame, "s")) == [False, True]
    assert _vals(frame, VT.is_empty(frame, "m")) == [False, True]
    # is_nullish.cue: "", "-", "\n  \n" -> true
    df = frame.sparkSession.createDataFrame(
        [(1, ""), (2, "-"), (3, "\n  \n"), (4, "x"), (5, None)],
        "id long, v string",
    )
    assert _vals(df, VT.is_nullish("v")) == [True, True, True, False, True]


def test_is_json(frame):
    spark = frame.sparkSession
    df = spark.createDataFrame(
        [
            (1, "{}"),
            (2, "{"),
            (3, '{"a":1}'),
            (4, "[1,2]"),
            (5, "null"),
            (6, "true"),
            (7, "42"),
            (8, "not json"),
        ],
        "id long, v string",
    )
    # is_json.cue: "{}" -> true, "{" -> false
    assert _vals(df, VT.is_json("v")) == [
        True, False, True, True, True, True, True, False,
    ]
    assert _vals(df, VT.is_json("v", "object")) == [
        True, False, True, False, False, False, False, False,
    ]
    assert _vals(df, VT.is_json("v", "array")) == [
        False, False, False, True, False, False, False, False,
    ]


def test_exists_get_set_del(frame):
    assert _one(frame, VT.exists(frame, "s")) is True
    assert _one(frame, VT.exists(frame, "nope")) is False
    assert _one(frame, VT.exists(frame, "nested.inner")) is True
    assert _one(frame, VT.exists(frame, "nested.nope")) is False
    # map segment resolves at runtime
    assert _vals(frame, VT.exists(frame, "m.k")) == [True, False]
    # present-but-null exists (VRL semantics)
    assert _vals(frame, VT.exists(frame, "maybe")) == [True, True]

    assert _vals(frame, VT.get_path(frame, "nested.inner")) == ["hello", ""]
    assert _one(frame, VT.get_path(frame, "nope")) is None

    df2 = VT.set_path(frame, "nested.extra", F.lit(7))
    assert _one(df2, VT.get_path(df2, "nested.extra")) == 7
    df3 = VT.del_path(df2, "nested.extra")
    assert "extra" not in df3.schema["nested"].dataType.fieldNames()
    assert "s" not in VT.del_path(frame, "s").columns


def test_secrets_roundtrip(frame):
    df = frame.withColumn(
        "_secrets", F.create_map().cast("map<string,string>")
    )
    df = df.withColumn(
        "_secrets", VT.set_secret("_secrets", "datadog_api_key", "abc122")
    )
    # get_secret.cue / set_secret.cue
    assert _one(df, VT.get_secret("_secrets", "datadog_api_key")) == "abc122"
    # upsert overwrites
    df = df.withColumn(
        "_secrets", VT.set_secret("_secrets", "datadog_api_key", "zzz")
    )
    assert _one(df, VT.get_secret("_secrets", "datadog_api_key")) == "zzz"
    # remove_secret.cue
    df = df.withColumn(
        "_secrets", VT.remove_secret("_secrets", "datadog_api_key")
    )
    assert _one(df, VT.get_secret("_secrets", "datadog_api_key")) is None
    # set on a NULL map starts from empty
    df4 = frame.withColumn("_secrets", F.lit(None).cast("map<string,string>"))
    df4 = df4.withColumn("_secrets", VT.set_secret("_secrets", "k", "v"))
    assert _one(df4, VT.get_secret("_secrets", "k")) == "v"


def test_tag_types_externally(frame):
    # tag_types_externally.cue: 123 -> {"integer": 123}
    assert json.loads(_one(frame, VT.tag_types_externally(frame, "id"))) == {
        "integer": 1
    }
    assert json.loads(_one(frame, VT.tag_types_externally(frame, "s"))) == {
        "string": "hello"
    }
    got = json.loads(_one(frame, VT.tag_types_externally(frame, "arr")))
    assert got == {"array": [{"string": "a"}, {"string": "b"}]}
    got = json.loads(_one(frame, VT.tag_types_externally(frame, "nested")))
    assert got == {"object": {"inner": {"string": "hello"}}}


def test_coercion_fail_variants(frame):
    assert _one(frame, VT.int_(frame, "id")) == 1
    assert _one(frame, VT.string_(frame, "s")) == "hello"
    with pytest.raises(TypeError):
        VT.int_(frame, "s")
    with pytest.raises(TypeError):
        VT.timestamp_(frame, "id")


def test_for_each_and_debug(frame):
    got = _one(frame, VT.for_each("arr", lambda x: F.upper(x)))
    assert got == ["A", "B"]
    VT.vrl_assert(frame, F.col("id") > 0)
    with pytest.raises(AssertionError):
        VT.vrl_assert(frame, F.col("id") > 1, "id too small")
    VT.vrl_assert_eq(frame, F.col("s"), F.col("s"))
    assert VT.vrl_log(frame, "hello") is frame


def test_is_json_agrees_with_python_json(spark):
    """is_json must agree with Python's json.loads on a diverse corpus of
    valid and invalid candidates (one Spark job, not per-example)."""
    import json as pyjson

    cands = [
        "{}", "[]", '""', '"x"', "0", "-1.5", "1e9", "null", "true", "false",
        '{"a": [1, 2, {"b": null}]}', "[1,2,3]", '  {"a":1}  ',
        "{", "}", "[1,", '{"a":}', "nul", "True", "NaN", "0x10", "1.2.3",
        "", "-", "hello world", '{"a" "b"}', "[1 2]", '"unterminated',
    ]
    rows = [(i, c) for i, c in enumerate(cands)]
    df = spark.sparkSession.createDataFrame(rows, "i long, v string") if hasattr(spark, "sparkSession") else spark.createDataFrame(rows, "i long, v string")
    from vector_spark.functions.types import is_json

    got = {
        r["i"]: r["j"]
        for r in df.select("i", is_json("v").alias("j")).collect()
    }
    def _strict(_):
        # json.loads accepts non-standard NaN/Infinity; RFC 8259 (and the
        # reference's serde_json) rejects them — make the oracle strict
        raise ValueError("non-standard constant")

    for i, c in rows:
        try:
            pyjson.loads(c, parse_constant=_strict)
            want = True
        except Exception:
            want = False
        assert got[i] == want, (c, got[i], want)
