"""Jar-free Apache Avro binary datum codec.

Vector's avro sink serializer (lib/codecs/src/encoding/format/avro.rs:
`AvroSerializer` encodes each event as ONE Avro datum against a
user-supplied record schema).  `spark-avro` would provide this as
`to_avro`/`from_avro`, but the module jar is absent in this environment
(refusal recorded in BENCH.md), so — like the native protobuf wire codec
(`native_proto.py`) and the MaxMind reader (`mmdb.py`) — the PUBLIC Avro
1.11 binary-encoding spec is implemented directly:

- int/long: zigzag + base-128 varint
- string/bytes: long(len) then bytes
- float/double: IEEE little-endian
- boolean: one byte; null: zero bytes
- union: long(branch index) then the branch datum (nullable fields are
  the idiomatic ["null", T] two-branch union)
- record: field datums in schema order, no tags, no framing

Schemas here are the flat-record subset Vector's serializer targets:
``{"name": ..., "type": "record", "fields": [{"name", "type"}]}`` where a
field type is a primitive name or ["null", primitive].
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame

_PRIMS = {"string", "bytes", "int", "long", "float", "double", "boolean", "null"}


def _zigzag(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = z = 0
    while True:
        if pos >= len(buf):
            raise ValueError("avro: truncated varint")
        b = buf[pos]
        pos += 1
        z |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (z >> 1) ^ -(z & 1), pos


def _norm_field(ftype) -> tuple[str, bool]:
    """-> (primitive, nullable); accepts "T" or ["null","T"] / ["T","null"]."""
    if isinstance(ftype, list):
        branches = [t for t in ftype if t != "null"]
        if len(branches) != 1 or len(ftype) != 2 or "null" not in ftype:
            raise ValueError(f"avro: only [null, T] unions supported, got {ftype}")
        return branches[0], True
    if ftype not in _PRIMS:
        raise ValueError(f"avro: unsupported field type {ftype!r}")
    return ftype, False


def _encode_prim(v, t: str) -> bytes:
    if t in ("int", "long"):
        return _zigzag(int(v))
    if t == "string":
        b = str(v).encode("utf-8")
        return _zigzag(len(b)) + b
    if t == "bytes":
        return _zigzag(len(v)) + bytes(v)
    if t == "double":
        return struct.pack("<d", float(v))
    if t == "float":
        return struct.pack("<f", float(v))
    if t == "boolean":
        return b"\x01" if v else b"\x00"
    if t == "null":
        return b""
    raise ValueError(f"avro: unsupported type {t!r}")


def encode_datum(record: dict, schema: dict) -> bytes:
    """One Avro binary datum for ``record`` against the record ``schema``
    (avro.rs:75-116: serialize an event to a datum of the configured
    schema; null-union index order is ["null", T] → 0 for null)."""
    out = bytearray()
    for f in schema["fields"]:
        t, nullable = _norm_field(f["type"])
        v = record.get(f["name"])
        if nullable:
            if v is None:
                out += _zigzag(0)
                continue
            out += _zigzag(1)
        elif v is None:
            raise ValueError(f"avro: null in non-nullable field {f['name']}")
        out += _encode_prim(v, t)
    return bytes(out)


def decode_datum(buf: bytes, schema: dict) -> dict:
    """Inverse of :func:`encode_datum`; raises ValueError on malformed
    input (the `_decode_error` channel upstream)."""
    out = {}
    pos = 0
    for f in schema["fields"]:
        t, nullable = _norm_field(f["type"])
        if nullable:
            idx, pos = _read_long(buf, pos)
            if idx == 0:
                out[f["name"]] = None
                continue
            if idx != 1:
                raise ValueError(f"avro: bad union index {idx}")
        if t in ("int", "long"):
            v, pos = _read_long(buf, pos)
        elif t in ("string", "bytes"):
            n, pos = _read_long(buf, pos)
            if n < 0 or pos + n > len(buf):
                raise ValueError("avro: bad length")
            raw = buf[pos : pos + n]
            pos += n
            v = raw.decode("utf-8") if t == "string" else bytes(raw)
        elif t == "double":
            if pos + 8 > len(buf):
                raise ValueError("avro: truncated double")
            v = struct.unpack("<d", buf[pos : pos + 8])[0]
            pos += 8
        elif t == "float":
            if pos + 4 > len(buf):
                raise ValueError("avro: truncated float")
            v = struct.unpack("<f", buf[pos : pos + 4])[0]
            pos += 4
        elif t == "boolean":
            if pos >= len(buf):
                raise ValueError("avro: truncated boolean")
            v = buf[pos] == 1
            pos += 1
        elif t == "null":
            v = None
        out[f["name"]] = v
    if pos != len(buf):
        raise ValueError(f"avro: {len(buf) - pos} trailing bytes")
    return out


def encode_avro_rows(df: DataFrame, schema: dict) -> DataFrame:
    """Each row -> one `value:binary` Avro datum (the un-gated counterpart
    of sinks.encode_avro_rows; same mapInPandas shape as the native codec)."""
    import pandas as pd

    cols = [f["name"] for f in schema["fields"]]

    def _pynorm(v):
        if v is None or (isinstance(v, float) and v != v):
            return None
        return v.item() if hasattr(v, "item") else v

    def _run(batches):
        for pdf in batches:
            vals = [
                encode_datum({c: _pynorm(v) for c, v in zip(cols, row)}, schema)
                for row in zip(*(pdf[c].tolist() for c in cols))
            ]
            yield pd.DataFrame({"value": vals})

    return df.select(*cols).mapInPandas(_run, "value binary")


_SPARK_TYPES = {
    "string": "string",
    "bytes": "binary",
    "int": "long",
    "long": "long",
    "float": "double",
    "double": "double",
    "boolean": "boolean",
}


def decode_avro_rows(df: DataFrame, schema: dict, src: str = "value") -> DataFrame:
    """Decode an Avro-datum binary column back into typed columns; a
    malformed buffer yields a NULL row with `_decode_error` set."""
    import pandas as pd

    names = [f["name"] for f in schema["fields"]]
    types = {f["name"]: _norm_field(f["type"])[0] for f in schema["fields"]}

    def _run(batches):
        for pdf in batches:
            rows = []
            for buf in pdf[src].tolist():
                try:
                    d = decode_datum(buf, schema)
                    rows.append([d.get(n) for n in names] + [None])
                except (ValueError, UnicodeDecodeError) as e:
                    rows.append([None] * len(names) + [str(e)])
            yield pd.DataFrame(rows, columns=names + ["_decode_error"])

    out_schema = ", ".join(
        [f"{n} {_SPARK_TYPES[types[n]]}" for n in names] + ["_decode_error string"]
    )
    return df.mapInPandas(_run, out_schema)
