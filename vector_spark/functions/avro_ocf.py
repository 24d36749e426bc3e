"""Generic jar-free Avro codec + Object Container File (OCF) support.

The flat-record codec in ``avro.py`` covers Vector's event-sink schema
subset; Iceberg's manifest and manifest-list files need the rest of the
PUBLIC Avro 1.11 spec: nested records, arrays, maps-as-array-of-record
pairs, ``fixed``, and the OCF container framing.  Implemented here from
the spec (https://avro.apache.org/docs/1.11.1/specification/), sharing
the varint/zigzag primitives with ``avro.py``:

- complex datum encoding: record = field datums in order; array/map =
  blocks of (count, items...) terminated by count 0; union = varint
  branch index + branch datum; fixed = raw bytes.
- OCF: magic ``Obj\\x01``, file-metadata map (``avro.schema`` JSON +
  ``avro.codec``), 16-byte sync marker, then blocks of
  (record_count, byte_size, data, sync).  Codec ``null`` and
  ``deflate`` (raw zlib) both supported.

Schemas are plain JSON-style dicts/lists/strings, exactly as parsed from
an ``avro.schema`` header.  Named-type references are resolved against
previously seen definitions (Iceberg manifests reuse e.g. ``r2``).
"""

from __future__ import annotations

import json
import struct
import zlib
from hashlib import md5

from vector_spark.functions.avro import _read_long, _zigzag

MAGIC = b"Obj\x01"

_PRIMS = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}


def _resolve(schema, named: dict):
    """Normalise a schema node: look up named-type references, register
    new named definitions (record/fixed/enum) for later reuse."""
    if isinstance(schema, str):
        if schema in _PRIMS:
            return schema
        if schema in named:
            return named[schema]
        raise ValueError(f"avro: unknown type reference {schema!r}")
    if isinstance(schema, dict) and schema.get("name"):
        named[schema["name"]] = schema
    return schema


def _register_all(schema, named: dict) -> None:
    """Pre-register every named type in a schema tree, so by-name
    references resolve even when the defining occurrence sits in a union
    branch the data never takes (e.g. a NULL lower_bounds before a
    populated upper_bounds in an Iceberg manifest)."""
    if isinstance(schema, list):
        for b in schema:
            _register_all(b, named)
    elif isinstance(schema, dict):
        if schema.get("name"):
            named.setdefault(schema["name"], schema)
        for f in schema.get("fields", []):
            _register_all(f["type"], named)
        if "items" in schema:
            _register_all(schema["items"], named)
        if "values" in schema:
            _register_all(schema["values"], named)


def encode(datum, schema, named: dict | None = None) -> bytes:
    """One Avro binary datum for ``datum`` against ``schema``."""
    named = named if named is not None else {}
    schema = _resolve(schema, named)
    if isinstance(schema, list):  # union
        for i, branch in enumerate(schema):
            b = _resolve(branch, named)
            if _matches(datum, b):
                return _zigzag(i) + encode(datum, b, named)
        raise ValueError(f"avro: no union branch for {type(datum).__name__}")
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return b""
    if t == "boolean":
        return b"\x01" if datum else b"\x00"
    if t in ("int", "long"):
        return _zigzag(int(datum))
    if t == "float":
        return struct.pack("<f", float(datum))
    if t == "double":
        return struct.pack("<d", float(datum))
    if t == "bytes":
        b = bytes(datum)
        return _zigzag(len(b)) + b
    if t == "string":
        b = str(datum).encode("utf-8")
        return _zigzag(len(b)) + b
    if t == "fixed":
        b = bytes(datum)
        if len(b) != schema["size"]:
            raise ValueError(f"avro: fixed size {len(b)} != {schema['size']}")
        return b
    if t == "record":
        out = bytearray()
        for f in schema["fields"]:
            if f["name"] not in datum and "default" in f:
                v = f["default"]
            else:
                v = datum.get(f["name"])
            out += encode(v, f["type"], named)
        return bytes(out)
    if t == "array":
        out = bytearray()
        items = list(datum or [])
        if items:
            out += _zigzag(len(items))
            for it in items:
                out += encode(it, schema["items"], named)
        out += _zigzag(0)
        return bytes(out)
    if t == "map":
        out = bytearray()
        entries = list((datum or {}).items())
        if entries:
            out += _zigzag(len(entries))
            for k, v in entries:
                kb = str(k).encode("utf-8")
                out += _zigzag(len(kb)) + kb
                out += encode(v, schema["values"], named)
        out += _zigzag(0)
        return bytes(out)
    raise ValueError(f"avro: unsupported schema {schema!r}")


def _matches(datum, schema) -> bool:
    t = schema if isinstance(schema, str) else schema.get("type")
    if t == "null":
        return datum is None
    return datum is not None


def decode(buf: bytes, pos: int, schema, named: dict | None = None):
    """-> (value, new_pos); inverse of :func:`encode`."""
    named = named if named is not None else {}
    schema = _resolve(schema, named)
    if isinstance(schema, list):  # union
        idx, pos = _read_long(buf, pos)
        if not 0 <= idx < len(schema):
            raise ValueError(f"avro: bad union index {idx}")
        return decode(buf, pos, schema[idx], named)
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return None, pos
    if t == "boolean":
        return buf[pos] == 1, pos + 1
    if t in ("int", "long"):
        return _read_long(buf, pos)
    if t == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if t == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t in ("bytes", "string"):
        n, pos = _read_long(buf, pos)
        if n < 0 or pos + n > len(buf):
            raise ValueError("avro: bad length")
        raw = bytes(buf[pos : pos + n])
        return (raw.decode("utf-8") if t == "string" else raw), pos + n
    if t == "fixed":
        n = schema["size"]
        return bytes(buf[pos : pos + n]), pos + n
    if t == "record":
        out = {}
        for f in schema["fields"]:
            out[f["name"]], pos = decode(buf, pos, f["type"], named)
        return out, pos
    if t == "array":
        out = []
        while True:
            n, pos = _read_long(buf, pos)
            if n == 0:
                break
            if n < 0:  # block with byte-size prefix
                n = -n
                _, pos = _read_long(buf, pos)
            for _ in range(n):
                v, pos = decode(buf, pos, schema["items"], named)
                out.append(v)
        return out, pos
    if t == "map":
        out = {}
        while True:
            n, pos = _read_long(buf, pos)
            if n == 0:
                break
            if n < 0:
                n = -n
                _, pos = _read_long(buf, pos)
            for _ in range(n):
                klen, pos = _read_long(buf, pos)
                k = bytes(buf[pos : pos + klen]).decode("utf-8")
                pos += klen
                out[k], pos = decode(buf, pos, schema["values"], named)
        return out, pos
    raise ValueError(f"avro: unsupported schema {schema!r}")


_META_SCHEMA = {"type": "map", "values": "bytes"}


def write_ocf(path: str, schema, records, metadata: dict | None = None, codec: str = "null") -> int:
    """Write an Avro Object Container File; returns its byte length.

    The sync marker is derived deterministically from the schema + path so
    repeated builds of the same table are byte-identical (reproducible
    commits; nothing in the OCF spec requires randomness, only uniqueness
    within the file)."""
    schema_json = json.dumps(schema)
    sync = md5((schema_json + "|" + path).encode()).digest()
    meta = {"avro.schema": schema_json.encode(), "avro.codec": codec.encode()}
    for k, v in (metadata or {}).items():
        meta[k] = v if isinstance(v, bytes) else str(v).encode()
    body = bytearray()
    named: dict = {}
    _register_all(schema, named)
    n = 0
    for rec in records:
        body += encode(rec, schema, named)
        n += 1
    out = bytearray(MAGIC)
    out += encode(meta, _META_SCHEMA)
    out += sync
    if n:
        data = bytes(body)
        if codec == "deflate":
            data = zlib.compress(data)[2:-4]  # raw deflate per spec
        out += _zigzag(n) + _zigzag(len(data)) + data + sync
    with open(path, "wb") as f:
        f.write(out)
    return len(out)


def read_ocf(path: str) -> tuple[dict, dict, list]:
    """-> (schema, metadata, records)."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:4] != MAGIC:
        raise ValueError("avro: bad OCF magic")
    meta, pos = decode(buf, 4, _META_SCHEMA)
    sync = buf[pos : pos + 16]
    pos += 16
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    records = []
    named: dict = {}
    _register_all(schema, named)
    while pos < len(buf):
        n, pos = _read_long(buf, pos)
        size, pos = _read_long(buf, pos)
        block = buf[pos : pos + size]
        pos += size
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"avro: unsupported codec {codec}")
        bpos = 0
        for _ in range(n):
            rec, bpos = decode(block, bpos, schema, named)
            records.append(rec)
        if buf[pos : pos + 16] != sync:
            raise ValueError("avro: sync marker mismatch")
        pos += 16
    return schema, {k: v for k, v in meta.items() if not k.startswith("avro.")}, records
