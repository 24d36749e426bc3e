"""Vector's `native` protobuf wire codec — encode AND decode, jar-free.

The reference serializes events as protobuf `EventWrapper` messages
(lib/vector-core/proto/event.proto; codec glue in
lib/codecs/src/{encoding,decoding}/format/native.rs).  The spark-protobuf
module jar is absent in this sandbox, so this module implements the codec
directly on the public protobuf wire format (varint / 64-bit / length-
delimited groups — the documented encoding, not a copy of any generated
code), covering the log-event subset:

    EventWrapper { Log log = 1 }
    Log          { map<string, Value> fields = 1 }
    Value        { bytes raw_bytes = 1; int64 integer = 4; double float = 5;
                   bool boolean = 6; ValueNull null = 9 }

Both directions run as Arrow-batched ``mapInPandas`` (zip over plain
lists, no per-row pandas); malformed buffers surface on the
``_decode_error`` channel instead of failing the task.  Composed with
``sources.frame_length_delimited`` this decodes Vector's native TCP/file
stream end-to-end.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame

# wire types (protobuf encoding spec)
_VARINT, _I64, _LEN = 0, 1, 2

# Value oneof field numbers (event.proto `message Value`)
_V_BYTES, _V_INT, _V_FLOAT, _V_BOOL, _V_NULL = 1, 4, 5, 6, 9


# --- wire-format primitives -------------------------------------------------


def _varint(n: int) -> bytes:
    """Unsigned LEB128; int64 negatives are encoded as their 64-bit two's
    complement (10 bytes), per the spec."""
    n &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = n = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def _tag(field_no: int, wire: int) -> bytes:
    return _varint(field_no << 3 | wire)


def _len_field(field_no: int, payload: bytes) -> bytes:
    return _tag(field_no, _LEN) + _varint(len(payload)) + payload


def _fields(buf: bytes):
    """Iterate (field_no, wire_type, value) over one message's wire bytes.
    LEN fields yield bytes; VARINT yields int; I64 yields raw 8 bytes."""
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        field_no, wire = key >> 3, key & 0x7
        if wire == _VARINT:
            v, pos = _read_varint(buf, pos)
        elif wire == _I64:
            v, pos = buf[pos : pos + 8], pos + 8
            if len(v) != 8:
                raise ValueError("truncated i64")
        elif wire == _LEN:
            n, pos = _read_varint(buf, pos)
            v, pos = buf[pos : pos + n], pos + n
            if len(v) != n:
                raise ValueError("truncated length-delimited field")
        elif wire == 5:  # i32
            v, pos = buf[pos : pos + 4], pos + 4
            if len(v) != 4:
                raise ValueError("truncated i32")
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field_no, wire, v


# --- event.proto encode -----------------------------------------------------


def _encode_value(v) -> bytes:
    """One `Value` message for a Python scalar (the native encoder's type
    mapping, encoding/format/native.rs -> proto Value oneof)."""
    if v is None:
        return _tag(_V_NULL, _VARINT) + _varint(0)
    if isinstance(v, bool):
        return _tag(_V_BOOL, _VARINT) + _varint(1 if v else 0)
    if isinstance(v, int):
        return _tag(_V_INT, _VARINT) + _varint(v)
    if isinstance(v, float):
        return _tag(_V_FLOAT, _I64) + struct.pack("<d", v)
    if isinstance(v, bytes):
        return _len_field(_V_BYTES, v)
    return _len_field(_V_BYTES, str(v).encode("utf-8"))


def encode_event_wrapper(fields: dict) -> bytes:
    """EventWrapper{log: Log{fields: {k: Value}}} for one event."""
    body = b"".join(
        # map<string, Value> entry: key = field 1 (string), value = field 2
        _len_field(1, _len_field(1, k.encode("utf-8")) + _len_field(2, _encode_value(v)))
        for k, v in fields.items()
    )
    return _len_field(1, body)  # EventWrapper.log = 1


# --- event.proto decode -----------------------------------------------------


def _decode_value(buf: bytes):
    for fno, wire, v in _fields(buf):
        if fno == _V_BYTES and wire == _LEN:
            return v
        if fno == _V_INT and wire == _VARINT:
            return v - (1 << 64) if v >> 63 else v  # two's complement int64
        if fno == _V_FLOAT and wire == _I64:
            return struct.unpack("<d", v)[0]
        if fno == _V_BOOL and wire == _VARINT:
            return bool(v)
        if fno == _V_NULL:
            return None
    return None


def decode_event_wrapper(buf: bytes) -> dict:
    """One EventWrapper's log fields as {name: python scalar}.  Raises
    ValueError on malformed wire bytes or a non-log event."""
    log = None
    for fno, wire, v in _fields(bytes(buf)):
        if fno == 1 and wire == _LEN:
            log = v
            break
        raise ValueError(f"not a log EventWrapper (field {fno})")
    if log is None:
        raise ValueError("empty EventWrapper")
    out = {}
    for fno, wire, entry in _fields(log):
        if fno != 1 or wire != _LEN:
            continue  # Log.value/metadata — not used by the map encoder
        key = val = None
        for efno, ewire, ev in _fields(entry):
            if efno == 1 and ewire == _LEN:
                key = ev.decode("utf-8")
            elif efno == 2 and ewire == _LEN:
                val = _decode_value(ev)
        if key is not None:
            out[key] = val
    return out


# --- DataFrame surface ------------------------------------------------------


def encode_native_rows(df: DataFrame, fields: list[str] | None = None) -> DataFrame:
    """Encode each row's selected fields as one native-codec `value:binary`
    column (the jar-free counterpart of sinks.encode_protobuf_rows)."""
    import pandas as pd

    cols = fields or df.columns

    def _pynorm(v):
        # numpy scalars (int64/float64/bool_) -> Python scalars, so the
        # type dispatch in _encode_value sees int/float/bool
        return v.item() if hasattr(v, "item") else v

    def _run(batches):
        for pdf in batches:
            vals = [
                encode_event_wrapper({c: _pynorm(v) for c, v in zip(cols, row)})
                for row in zip(*(pdf[c].tolist() for c in cols))
            ]
            yield pd.DataFrame({"value": vals})

    return df.select(*cols).mapInPandas(_run, "value binary")


def decode_native_rows(df: DataFrame, schema: dict[str, str], src: str = "value") -> DataFrame:
    """Decode a native-codec binary column back into typed columns.

    ``schema`` maps output column -> Spark type (string/long/double/
    boolean/binary); absent fields decode to NULL; malformed buffers yield
    a NULL row with ``_decode_error`` set (decoding/format/native.rs
    invalid-frame drop path)."""
    import pandas as pd

    names = list(schema)

    def _conv(v, t):
        if v is None:
            return None
        if t == "string":
            return v.decode("utf-8", "replace") if isinstance(v, bytes) else str(v)
        if t == "binary":
            return v if isinstance(v, bytes) else str(v).encode()
        if t in ("long", "int", "bigint"):
            return int(v)
        if t == "double":
            return float(v)
        if t == "boolean":
            return bool(v)
        return v

    def _run(batches):
        for pdf in batches:
            rows = []
            for buf in pdf[src].tolist():
                try:
                    d = decode_event_wrapper(buf)
                    rows.append([_conv(d.get(n), schema[n]) for n in names] + [None])
                except (ValueError, UnicodeDecodeError) as e:
                    rows.append([None] * len(names) + [str(e)])
            yield pd.DataFrame(rows, columns=names + ["_decode_error"])

    out_schema = ", ".join(
        [f"`{n}` {t}" for n, t in schema.items()] + ["_decode_error string"]
    )
    return df.mapInPandas(_run, out_schema)
