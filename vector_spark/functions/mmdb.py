"""Jar-free MaxMind-DB (mmdb) file codec: reader + fixture writer.

The ``maxminddb`` wheel is absent in this environment, so — like the
native protobuf wire codec (`native_proto.py`) — the loader implements
the PUBLIC MaxMind DB file format spec (maxmind.github.io/MaxMind-DB)
directly:

- binary search tree of ``node_count`` nodes, two ``record_size``-bit
  records each (24/28/32 supported);
- a record value ``< node_count`` points at a child node, ``==`` means
  "no data", ``>`` resolves to ``value - node_count - 16`` into the data
  section (which starts after the 16-zero-byte separator);
- data section types: pointer(1, 4 width classes), utf-8(2), double(3),
  bytes(4), uint16/32(5/6), map(7), int32(8), uint64/128(9/10),
  array(11), bool(14), float(15); extended-type and 29/30/31 size
  escapes;
- metadata map after the ``\\xab\\xcd\\xefMaxMind.com`` marker.

IPv4-in-IPv6 trees are handled per the spec: v4 networks sit under the
``::/96`` zero prefix, so the reader descends 96 left records first.

The writer emits record_size-24 trees (v4 or v6-embedded v4) without
pointers — enough to build deterministic fixtures that any compliant
reader (including this one) can load; the reader handles the full
format.  Reference parity: src/enrichment_tables/geoip.rs consumes these
files via the maxminddb crate; `enrichment.load_geoip_mmdb` flattens the
same City/ISP field paths (geoip.rs:156-201).
"""

from __future__ import annotations

import struct

METADATA_MARKER = b"\xab\xcd\xefMaxMind.com"
_SEP = b"\x00" * 16


# ---------------------------------------------------------------------------
# data-section decoder


def decode_data(buf: bytes, off: int):
    """Decode one value at ``off`` within section ``buf`` (offsets and
    pointers are section-relative, per the spec).  Returns (value, next)."""
    ctrl = buf[off]
    off += 1
    typ = ctrl >> 5
    if typ == 1:  # pointer: 001SSVVV
        ss = (ctrl >> 3) & 0x3
        vvv = ctrl & 0x7
        if ss == 0:
            target = (vvv << 8) | buf[off]
            off += 1
        elif ss == 1:
            target = ((vvv << 16) | int.from_bytes(buf[off : off + 2], "big")) + 2048
            off += 2
        elif ss == 2:
            target = (
                (vvv << 24) | int.from_bytes(buf[off : off + 3], "big")
            ) + 526336
            off += 3
        else:
            target = int.from_bytes(buf[off : off + 4], "big")
            off += 4
        value, _ = decode_data(buf, target)
        return value, off
    if typ == 0:  # extended type
        typ = 7 + buf[off]
        off += 1
    size = ctrl & 0x1F
    if size == 29:
        size = 29 + buf[off]
        off += 1
    elif size == 30:
        size = 285 + int.from_bytes(buf[off : off + 2], "big")
        off += 2
    elif size == 31:
        size = 65821 + int.from_bytes(buf[off : off + 3], "big")
        off += 3
    if typ == 2:
        return buf[off : off + size].decode("utf-8"), off + size
    if typ == 3:
        return struct.unpack(">d", buf[off : off + 8])[0], off + 8
    if typ == 4:
        return bytes(buf[off : off + size]), off + size
    if typ in (5, 6, 9, 10):
        return int.from_bytes(buf[off : off + size], "big"), off + size
    if typ == 7:
        m = {}
        for _ in range(size):
            k, off = decode_data(buf, off)
            v, off = decode_data(buf, off)
            m[k] = v
        return m, off
    if typ == 8:
        return int.from_bytes(buf[off : off + size], "big", signed=True), off + size
    if typ == 11:
        arr = []
        for _ in range(size):
            v, off = decode_data(buf, off)
            arr.append(v)
        return arr, off
    if typ == 14:
        return size != 0, off
    if typ == 15:
        return struct.unpack(">f", buf[off : off + 4])[0], off + 4
    raise ValueError(f"mmdb: unsupported data type {typ}")


# ---------------------------------------------------------------------------
# reader


def _record(tree: bytes, record_size: int, node: int, bit: int) -> int:
    if record_size == 24:
        base = node * 6 + bit * 3
        return int.from_bytes(tree[base : base + 3], "big")
    if record_size == 28:
        base = node * 7
        mid = tree[base + 3]
        if bit == 0:
            return ((mid >> 4) << 24) | int.from_bytes(tree[base : base + 3], "big")
        return ((mid & 0xF) << 24) | int.from_bytes(tree[base + 4 : base + 7], "big")
    if record_size == 32:
        base = node * 8 + bit * 4
        return int.from_bytes(tree[base : base + 4], "big")
    raise ValueError(f"mmdb: unsupported record_size {record_size}")


def read_mmdb(path: str):
    """-> (metadata dict, [(ip_start, ip_end, data dict)]) with inclusive
    u32 bounds — the flattened prefix trie the range join consumes."""
    with open(path, "rb") as f:
        buf = f.read()
    mstart = buf.rfind(METADATA_MARKER)
    if mstart < 0:
        raise ValueError("mmdb: metadata marker not found")
    meta, _ = decode_data(buf[mstart + len(METADATA_MARKER) :], 0)
    node_count = meta["node_count"]
    record_size = meta["record_size"]
    tree = buf[: node_count * record_size // 4]
    data_start = len(tree) + len(_SEP)
    data = buf[data_start:mstart]

    root = 0
    if meta.get("ip_version") == 6:  # v4 space sits under ::/96
        for _ in range(96):
            root = _record(tree, record_size, root, 0)
            if root >= node_count:
                return meta, []  # no v4 subtree

    out = []
    cache: dict[int, object] = {}

    def walk(node: int, prefix: int, depth: int) -> None:
        for bit in (0, 1):
            r = _record(tree, record_size, node, bit)
            p = (prefix << 1) | bit
            if r < node_count:
                walk(r, p, depth + 1)
            elif r > node_count:
                off = r - node_count - 16
                if off not in cache:
                    cache[off] = decode_data(data, off)[0]
                start = p << (32 - depth - 1)
                out.append((start, start + (1 << (32 - depth - 1)) - 1, cache[off]))

    walk(root, 0, 0)
    return meta, out


# ---------------------------------------------------------------------------
# fixture writer (record_size 24, no pointers)


def _encode_value(v) -> bytes:
    def ctrl(typ: int, size: int) -> bytes:
        assert size < 29, "fixture writer keeps sizes < 29"
        if typ < 8:
            return bytes([(typ << 5) | size])
        return bytes([size, typ - 7])

    if isinstance(v, bool):
        return ctrl(14, int(v))
    if isinstance(v, str):
        b = v.encode("utf-8")
        return ctrl(2, len(b)) + b
    if isinstance(v, float):
        return ctrl(3, 8) + struct.pack(">d", v)
    if isinstance(v, int):
        if v < 0:
            return ctrl(8, 4) + v.to_bytes(4, "big", signed=True)
        n = max(1, (v.bit_length() + 7) // 8)
        typ = 5 if n <= 2 else (6 if n <= 4 else 9)
        return ctrl(typ, n) + v.to_bytes(n, "big")
    if isinstance(v, dict):
        b = ctrl(7, len(v))
        for k, val in v.items():
            b += _encode_value(str(k)) + _encode_value(val)
        return b
    if isinstance(v, (list, tuple)):
        b = ctrl(11, len(v))
        for val in v:
            b += _encode_value(val)
        return b
    raise TypeError(f"mmdb writer: unsupported type {type(v)}")


def range_to_cidrs(start: int, end: int) -> list[tuple[int, int]]:
    """Greedy decomposition of an inclusive u32 range into (network,
    prefix_len) blocks — the inverse of the trie flattening."""
    out = []
    while start <= end:
        max_size = 32 if start == 0 else (start & -start).bit_length() - 1
        while max_size > 0 and start + (1 << max_size) - 1 > end:
            max_size -= 1
        out.append((start, 32 - max_size))
        start += 1 << max_size
    return out


def write_mmdb(
    path: str,
    entries: list[tuple[tuple[int, int], dict]],
    database_type: str = "GeoLite2-City",
    ip_version: int = 4,
) -> str:
    """Write ((network_u32, prefix_len), data) entries as a spec-valid
    record_size-24 mmdb.  Deterministic (fixed build_epoch), so fixture
    files are byte-reproducible."""
    # data section: one encoding per distinct payload
    blobs: dict[bytes, int] = {}
    data = b""
    offsets = []
    for _, d in entries:
        b = _encode_value(d)
        if b not in blobs:
            blobs[b] = len(data)
            data += b
        offsets.append(blobs[b])

    # trie: children are ('n', idx) | ('d', data_offset) | None
    nodes: list[list] = [[None, None]]
    for ((net, plen), _), doff in zip(entries, offsets):
        if not 1 <= plen <= 32:
            raise ValueError(f"mmdb writer: bad prefix length {plen}")
        node = 0
        for d in range(plen):
            bit = (net >> (31 - d)) & 1
            if d == plen - 1:
                if nodes[node][bit] is not None:
                    raise ValueError("mmdb writer: overlapping networks")
                nodes[node][bit] = ("d", doff)
            else:
                child = nodes[node][bit]
                if child is None:
                    nodes.append([None, None])
                    child = ("n", len(nodes) - 1)
                    nodes[node][bit] = child
                elif child[0] != "n":
                    raise ValueError("mmdb writer: overlapping networks")
                node = child[1]

    if ip_version == 6:  # chain 96 zero-bit nodes above the v4 trie
        shift = 96
        renumbered = [[("n", i + 1) if i < shift - 1 else ("n", shift), None]
                      for i in range(shift)]
        for left, right in nodes:
            fix = lambda c: ("n", c[1] + shift) if c and c[0] == "n" else c
            renumbered.append([fix(left), fix(right)])
        nodes = renumbered

    node_count = len(nodes)
    tree = b""
    for left, right in nodes:
        for child in (left, right):
            if child is None:
                val = node_count
            elif child[0] == "n":
                val = child[1]
            else:
                val = node_count + 16 + child[1]
            tree += val.to_bytes(3, "big")

    meta = {
        "binary_format_major_version": 2,
        "binary_format_minor_version": 0,
        "node_count": node_count,
        "record_size": 24,
        "ip_version": ip_version,
        "database_type": database_type,
        "languages": ["en"],
        "build_epoch": 0,
        "description": {"en": "vector_spark fixture"},
    }
    with open(path, "wb") as f:
        f.write(tree + _SEP + data + METADATA_MARKER + _encode_value(meta))
    return path
