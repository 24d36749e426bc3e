"""MaxMind-DB codec tests (vector_spark/functions/mmdb.py): fixture
writer -> reader roundtrips, hand-packed 28-bit records, pointer decode,
IPv4-in-IPv6 embedding, and the loader feeding geoip_enrich end-to-end.
"""

from __future__ import annotations

import struct

from vector_spark.functions.mmdb import (
    METADATA_MARKER,
    decode_data,
    range_to_cidrs,
    read_mmdb,
    write_mmdb,
)

CITY = {
    "country": {"iso_code": "GB"},
    "city": {"names": {"en": "Boxford"}},
    "location": {"latitude": 51.75, "longitude": -1.25, "time_zone": "Europe/London"},
}


def test_roundtrip_v4(tmp_path):
    p = str(tmp_path / "t.mmdb")
    entries = [((0x01000000, 8), CITY), ((0x0A000000, 16), {"country": {"iso_code": "US"}})]
    write_mmdb(p, entries)
    meta, nets = read_mmdb(p)
    assert meta["record_size"] == 24 and meta["ip_version"] == 4
    got = sorted(nets)
    assert got[0] == (0x01000000, 0x01FFFFFF, CITY)
    assert got[1][0] == 0x0A000000 and got[1][1] == 0x0A00FFFF


def test_roundtrip_v6_embedded_v4(tmp_path):
    p = str(tmp_path / "t6.mmdb")
    write_mmdb(p, [((0xC0A80000, 16), {"x": 1})], ip_version=6)
    meta, nets = read_mmdb(p)
    assert meta["ip_version"] == 6
    assert nets == [(0xC0A80000, 0xC0A8FFFF, {"x": 1})]


def test_value_types_roundtrip(tmp_path):
    p = str(tmp_path / "v.mmdb")
    d = {"s": "héllo", "u16": 7, "u32": 1 << 20, "u64": 1 << 40,
         "d": 2.5, "neg": -3, "b": True, "arr": ["a", 1]}
    write_mmdb(p, [((0x01000000, 8), d)])
    _, nets = read_mmdb(p)
    assert nets[0][2] == d


def test_pointer_decode():
    # hand-built data section: "hi" at 0, then a map {'a': pointer->0}
    s = b"\x42hi"  # type 2 (string), size 2
    # map size 1, key 'a', then pointer 001SSVVV ss=0 vvv=0 -> 0x20, target 0
    m = b"\xe1" + b"\x41a" + b"\x20\x00"
    buf = s + m
    val, _ = decode_data(buf, len(s))
    assert val == {"a": "hi"}


def test_extended_size_29_and_float():
    # string of length 40: size escape 29 (+11); float via extended type? float=15>7
    body = b"x" * 40
    buf = bytes([(2 << 5) | 29, 40 - 29]) + body
    val, off = decode_data(buf, 0)
    assert val == "x" * 40 and off == len(buf)
    fbuf = bytes([4, 15 - 7]) + struct.pack(">f", 1.5)  # extended type 15
    fval, _ = decode_data(fbuf, 0)
    assert fval == 1.5


def test_28bit_records_handpacked():
    # one-node tree, record_size 28: left -> data at offset 0, right -> empty
    node_count = 1
    left = node_count + 16 + 0  # 17
    right = node_count  # 1
    # middle byte: high nibble = left bits 27..24, low nibble = right bits 27..24
    tree = left.to_bytes(3, "big") + bytes([0x00]) + right.to_bytes(3, "big")
    data = b"\x41z"  # "z"
    meta = {"node_count": 1, "record_size": 28, "ip_version": 4,
            "binary_format_major_version": 2, "binary_format_minor_version": 0,
            "database_type": "t", "languages": ["en"], "build_epoch": 0,
            "description": {}}
    from vector_spark.functions.mmdb import _encode_value
    buf = tree + b"\x00" * 16 + data + METADATA_MARKER + _encode_value(meta)
    import tempfile, os
    with tempfile.NamedTemporaryFile(delete=False, suffix=".mmdb") as f:
        f.write(buf)
        p = f.name
    try:
        _, nets = read_mmdb(p)
    finally:
        os.unlink(p)
    # left record from root at depth 1 covers 0.0.0.0/1
    assert nets == [(0, 0x7FFFFFFF, "z")]


def test_range_to_cidrs_partitions_exactly():
    start, end = 1 << 24, (51 << 24) - 1
    blocks = range_to_cidrs(start, end)
    total = sum(1 << (32 - plen) for _, plen in blocks)
    assert total == end - start + 1
    assert blocks[0][0] == start
    # blocks are contiguous and sorted
    cur = start
    for net, plen in blocks:
        assert net == cur
        cur += 1 << (32 - plen)
    assert cur == end + 1


def test_loader_feeds_geoip_enrich(spark, tmp_path):
    from vector_spark.enrichment import geoip_enrich, load_geoip_mmdb

    p = str(tmp_path / "geo.mmdb")
    write_mmdb(p, [((0x01000000, 8), CITY)])
    geo = load_geoip_mmdb(spark, p)
    row = geo.collect()[0]
    assert (row["country_code"], row["city_name"]) == ("GB", "Boxford")
    assert row["latitude"] == 51.75 and row["timezone"] == "Europe/London"
    ev = spark.createDataFrame([("1.2.3.4",), ("9.9.9.9",)], "ip string")
    out = {r["ip"]: r["country_code"] for r in geoip_enrich(
        ev, geo.select("ip_start", "ip_end", "country_code"), "ip").collect()}
    assert out == {"1.2.3.4": "GB", "9.9.9.9": None}
