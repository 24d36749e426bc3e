"""Jar-free Avro datum codec (vector_spark/functions/avro.py): spec-pinned
byte fixtures, zigzag edges, nullable unions, malformed-input errors, and
the Spark encode->decode roundtrip."""

from __future__ import annotations

import pytest

from vector_spark.functions.avro import (
    _zigzag,
    decode_datum,
    decode_avro_rows,
    encode_avro_rows,
    encode_datum,
)

SCHEMA = {
    "name": "event",
    "type": "record",
    "fields": [
        {"name": "a", "type": "string"},
        {"name": "b", "type": "long"},
        {"name": "c", "type": ["null", "double"]},
        {"name": "d", "type": "boolean"},
    ],
}


def test_spec_pinned_bytes():
    # Avro spec examples: zigzag(0)=00, zigzag(-1)=01, zigzag(1)=02,
    # zigzag(-2)=03, zigzag(64)=80 01
    assert _zigzag(0) == b"\x00"
    assert _zigzag(-1) == b"\x01"
    assert _zigzag(1) == b"\x02"
    assert _zigzag(-2) == b"\x03"
    assert _zigzag(64) == b"\x80\x01"
    # "foo" -> len 3 (zigzag 06) + bytes; union null -> 00; true -> 01
    datum = encode_datum({"a": "foo", "b": 1, "c": None, "d": True}, SCHEMA)
    assert datum == b"\x06foo\x02\x00\x01"
    # c present -> union branch 1 (02) + little-endian double
    import struct

    datum2 = encode_datum({"a": "", "b": -2, "c": 2.5, "d": False}, SCHEMA)
    assert datum2 == b"\x00\x03\x02" + struct.pack("<d", 2.5) + b"\x00"


def test_datum_roundtrip_values():
    for rec in [
        {"a": "héllo", "b": 0, "c": None, "d": False},
        {"a": "", "b": -(1 << 62), "c": -0.125, "d": True},
        {"a": "x" * 300, "b": (1 << 62), "c": 1e308, "d": False},
    ]:
        assert decode_datum(encode_datum(rec, SCHEMA), SCHEMA) == rec


def test_malformed_inputs_raise():
    good = encode_datum({"a": "foo", "b": 1, "c": None, "d": True}, SCHEMA)
    with pytest.raises(ValueError):
        decode_datum(good + b"\x00", SCHEMA)  # trailing bytes
    with pytest.raises(ValueError):
        decode_datum(good[:-1], SCHEMA)  # truncated
    with pytest.raises(ValueError):
        decode_datum(b"\x07" + good, SCHEMA)  # negative string length
    with pytest.raises(ValueError):
        encode_datum({"a": None, "b": 1, "c": None, "d": True}, SCHEMA)  # null non-nullable


def test_unsupported_schema_rejected():
    with pytest.raises(ValueError):
        encode_datum({"x": 1}, {"fields": [{"name": "x", "type": ["null", "long", "string"]}]})
    with pytest.raises(ValueError):
        encode_datum({"x": 1}, {"fields": [{"name": "x", "type": "record"}]})


def test_spark_roundtrip(spark):
    df = spark.createDataFrame(
        [("e1", 7, 0.5, True), ("e2", -3, None, False)],
        "a string, b long, c double, d boolean",
    )
    enc = encode_avro_rows(df, SCHEMA)
    dec = decode_avro_rows(enc, SCHEMA)
    rows = {r["a"]: (r["b"], r["c"], r["d"], r["_decode_error"]) for r in dec.collect()}
    assert rows == {"e1": (7, 0.5, True, None), "e2": (-3, None, False, None)}


def test_spark_decode_error_channel(spark):
    bad = spark.createDataFrame([(b"\x06fo",)], "value binary")  # truncated
    out = decode_avro_rows(bad, SCHEMA).collect()[0]
    assert out["_decode_error"] is not None and out["a"] is None
