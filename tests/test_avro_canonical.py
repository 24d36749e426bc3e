"""Real-artifact cross-validation for the jar-free Avro OCF codec
(functions/avro_ocf.py): the CANONICAL Apache Avro Java library
(avro-1.12.1.jar, bundled with pyspark and driven over py4j) writes a
genuine Object Container File that our spec-implemented reader must
decode, and our writer's output must round-trip through the canonical
Java DataFileReader.  This closes the round-3 "spec codecs never ran
against a file produced by the canonical tools" gap (network fetch of a
vendored artifact stays DNS-refused; the canonical LIBRARY is available
locally inside the Spark JVM)."""

from __future__ import annotations

import json

import pytest

from vector_spark.functions.avro_ocf import read_ocf, write_ocf

SCHEMA = {
    "type": "record",
    "name": "Event",
    "fields": [
        {"name": "name", "type": "string"},
        {"name": "n", "type": "long"},
        {"name": "tag", "type": ["null", "string"]},
        {"name": "xs", "type": {"type": "array", "items": "int"}},
        {"name": "m", "type": {"type": "map", "values": "long"}},
        {"name": "fx", "type": {"type": "fixed", "name": "F4", "size": 4}},
    ],
}

RECORDS = [
    {"name": "alpha", "n": 7, "tag": "t0", "xs": [1, 2, 3],
     "m": {"a": 1, "b": 2}, "fx": b"abcd"},
    {"name": "beta", "n": -3, "tag": None, "xs": [],
     "m": {}, "fx": b"wxyz"},
    {"name": "γ-unicode", "n": 1 << 40, "tag": "t2", "xs": [-1, 0],
     "m": {"k": -9}, "fx": b"0123"},
]


def _canonical_write(spark, path: str, codec: str) -> None:
    jvm = spark._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(json.dumps(SCHEMA))
    fx_schema = schema.getField("fx").schema()
    writer = jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    dfw = jvm.org.apache.avro.file.DataFileWriter(writer)
    if codec == "deflate":
        dfw.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    dfw.create(schema, jvm.java.io.File(path))
    for r in RECORDS:
        rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
        rec.put("name", r["name"])
        rec.put("n", r["n"])
        rec.put("tag", r["tag"])
        xs = jvm.java.util.ArrayList()
        for x in r["xs"]:
            xs.add(x)
        rec.put("xs", xs)
        m = jvm.java.util.HashMap()
        for k, v in r["m"].items():
            m.put(k, v)
        rec.put("m", m)
        rec.put(
            "fx",
            jvm.org.apache.avro.generic.GenericData.Fixed(
                fx_schema, bytearray(r["fx"])
            ),
        )
        dfw.append(rec)
    dfw.close()


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_jarfree_reader_reads_canonical_artifact(spark, tmp_path, codec):
    path = str(tmp_path / f"canonical_{codec}.avro")
    _canonical_write(spark, path, codec)
    schema, _meta, rows = read_ocf(path)
    assert schema["name"] == "Event"
    # rows equality is the codec gate too: a mishandled deflate block
    # cannot decode to these records (read_ocf consumes avro.codec
    # internally and strips avro.* from the returned metadata)
    assert rows == RECORDS


def test_canonical_reader_reads_jarfree_artifact(spark, tmp_path):
    path = str(tmp_path / "ours.avro")
    write_ocf(path, SCHEMA, RECORDS, codec="deflate")
    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    got = []
    while reader.hasNext():
        # GenericData.Record.toString() is the record as JSON
        got.append(json.loads(reader.next().toString()))
    reader.close()
    for g, want in zip(got, RECORDS):
        assert g["name"] == want["name"]
        assert g["n"] == want["n"]
        assert g["tag"] == want["tag"]
        assert g["xs"] == want["xs"]
        assert g["m"] == want["m"]
        # avro-1.12 GenericData renders fixed as a JSON array of byte ints
        assert g["fx"] == list(want["fx"])
    assert len(got) == len(RECORDS)
