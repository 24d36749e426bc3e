"""Codec / crypto / IP-family golden tests — values from the reference's
executable cue-doc examples (decode_gzip.cue, decode_zlib.cue,
encode_zlib.cue, hmac.cue, sha3.cue, ip_pton.cue, ip_ntop.cue,
ip_subnet.cue, ip_to_ipv6.cue, ipv6_to_ipv4.cue) plus reduce
starts_when/ConcatRaw unit checks."""

from __future__ import annotations

import base64

import pytest
from pyspark.sql import functions as F

from vector_spark.functions import codecs as C
from vector_spark.functions import vrl


def _one(spark, value, col):
    df = spark.createDataFrame([(value,)], ["m"])
    return df.select(col.alias("out")).collect()[0]["out"]


def test_decode_gzip(spark):
    raw = base64.b64decode(
        "H4sIAHEAymMAA6vML1XISCxLVSguTU5OLS5OK83JqVRISU3OT0lNUchNBQD7BGDaIAAAAA=="
    )
    df = spark.createDataFrame([(bytearray(raw),)], "m binary")
    got = df.select(C.decode_gzip("m").cast("string").alias("o")).collect()[0]["o"]
    assert got == "you have successfully decoded me"


def test_gzip_roundtrip(spark):
    assert (
        _one(spark, "please encode me", C.decode_gzip(C.encode_gzip("m")).cast("string"))
        == "please encode me"
    )


def test_decode_zlib(spark):
    raw = base64.b64decode(
        "eJwNy4ENwCAIBMCNXIlQ/KqplUSgCdvXAS41qPMHshCB2R1zJlWIVlR6UURX2+wx2YcuK3kAb9C1wd6dn7Fa+QH9gRxr"
    )
    df = spark.createDataFrame([(bytearray(raw),)], "m binary")
    got = df.select(C.decode_zlib("m").cast("string").alias("o")).collect()[0]["o"]
    assert got == "you_have_successfully_decoded_me.congratulations.you_are_breathtaking."


def test_encode_zlib_golden(spark):
    # encode_zlib.cue: base64 of zlib("please encode me")
    got = _one(spark, "please encode me", F.base64(C.encode_zlib("m")))
    assert got == "eJwryElNLE5VSM1Lzk9JVchNBQA0RQX7"


def test_hmac_base64_and_hex(spark):
    # hmac.cue examples 1-2
    got = _one(spark, "Hello there", F.base64(C.hmac("m", "super-secret-key")))
    assert got == "eLGE8YMviv85NPXgISRUZxstBNSU47JQdcXkUWcClmI="
    got = _one(
        spark, "Hello there",
        F.lower(F.hex(C.hmac("m", "super-secret-key", "SHA-224"))),
    )
    assert got == "42fccbc2b7d22a143b92f265a8046187558a94d11ddbb30622207e90"


def test_sha3(spark):
    # sha3.cue example
    assert (
        _one(spark, "foo", C.sha3("m", "SHA3-224"))
        == "f4f6779e153c391bbd29c95e72b0708e39d9166c7cea51d1f10ef58a"
    )


def test_encrypt_decrypt_roundtrip(spark):
    enc = C.encrypt("m", "AES-128-GCM", "16_byte_keyxxxxx", "1234567890ab")
    dec = C.decrypt(enc, "AES-128-GCM", "16_byte_keyxxxxx").cast("string")
    assert _one(spark, "super secret message", dec) == "super secret message"
    with pytest.raises(ValueError):
        C.encrypt("m", "AES-256-CFB", "k", "iv")


def test_percent_roundtrip(spark):
    got = _one(spark, "foo bar?", C.decode_percent(C.encode_percent("m")))
    assert got == "foo bar?"


def test_decode_mime_q(spark):
    # decode_mime_q.cue style: base64 and q encoded words
    assert _one(spark, "=?utf-8?b?SGVsbG8sIFdvcmxkIQ==?=", C.decode_mime_q("m")) == (
        "Hello, World!"
    )


def test_zstd_roundtrip(spark):
    # encode_zstd/decode_zstd.cue: standard RFC 8878 frames via pyarrow's
    # bundled codec; decode streams so size-less frames also work
    payload = b"zstd payload \x00\xff " * 64
    df = spark.createDataFrame([(bytearray(payload),)], "m binary")
    enc = df.select(C.encode_zstd("m").alias("c"))
    assert bytes(enc.first()["c"])[:4] == b"\x28\xb5\x2f\xfd"  # zstd magic
    out = enc.select(C.decode_zstd("c").alias("d")).first()["d"]
    assert bytes(out) == payload
    # malformed input surfaces as an error (VRL decode_zstd fallibility)
    bad = spark.createDataFrame([(bytearray(b"not a frame"),)], "m binary")
    with pytest.raises(Exception):
        bad.select(C.decode_zstd("m").alias("d")).collect()


# --- IP family --------------------------------------------------------------


def test_ip_pton_ntop(spark):
    # ip_pton.cue: base64(pton("192.168.0.1")) == "wKgAAQ=="
    assert _one(spark, "192.168.0.1", F.base64(vrl.ip_pton("m"))) == "wKgAAQ=="
    raw = base64.b64decode("wKgAAQ==")
    df = spark.createDataFrame([(bytearray(raw),)], "m binary")
    assert df.select(vrl.ip_ntop("m").alias("o")).collect()[0]["o"] == "192.168.0.1"


def test_ip_subnet(spark):
    # ip_subnet.cue examples
    assert _one(spark, "192.168.10.32", vrl.ip_subnet("m", "255.255.255.0")) == "192.168.10.0"
    assert _one(spark, "2404:6800:4003:c02::64", vrl.ip_subnet("m", "/32")) == "2404:6800::"


def test_ip_to_ipv6_and_back(spark):
    assert _one(spark, "192.168.10.32", vrl.ip_to_ipv6("m")) == "::ffff:192.168.10.32"
    assert _one(spark, "::ffff:192.168.0.1", vrl.ipv6_to_ipv4("m")) == "192.168.0.1"
    assert _one(spark, "2404:6800::1", vrl.ipv6_to_ipv4("m")) is None  # fallible


def test_is_ipv6(spark):
    assert _one(spark, "2404:6800:4003:c02::64", vrl.is_ipv6("m")) is True
    assert _one(spark, "192.168.0.1", vrl.is_ipv6("m")) is False


# --- reduce starts_when + concat_raw ----------------------------------------


def test_reduce_starts_when_sessions(spark):
    from vector_spark.operators import reduce_events

    rows = [
        ("u1", 1, "a"), ("u1", 2, "START"), ("u1", 3, "b"),
        ("u1", 4, "START"), ("u1", 5, "c"),
    ]
    df = spark.createDataFrame(rows, ["k", "o", "v"])
    out = reduce_events(
        df, ["k"], {"v": "concat_raw", "o": "min"},
        order_col="o", starts_when=F.col("v") == "START",
    )
    got = sorted((r["o"], r["v"]) for r in out.collect())
    # pre-start session [a], then [START b], then [START c] — the marker
    # row opens its session (reduce/mod.rs:404-409)
    assert got == [(1, "a"), (2, "STARTb"), (4, "STARTc")]


def test_reduce_starts_and_ends_mutually_exclusive(spark):
    from vector_spark.operators import reduce_events

    df = spark.createDataFrame([("u", 1, "x")], ["k", "o", "v"])
    with pytest.raises(ValueError):
        reduce_events(
            df, ["k"], order_col="o",
            ends_when=F.col("v") == "x", starts_when=F.col("v") == "x",
        )


# --- late-round VRL stragglers ----------------------------------------------


def test_find(spark):
    # find.cue examples
    assert _one(spark, "foobar", vrl.find("m", "foo")) == 0
    assert _one(spark, "foobar", vrl.find("m", "b.r", regex=True)) == 3
    assert _one(spark, "foobar", vrl.find("m", "baz")) == -1
    assert _one(spark, "foobarfoobarfoo", vrl.find("m", "bar", from_=4)) == 9


def test_match_family(spark):
    assert _one(spark, "foobar", vrl.match("m", "b.r")) is True
    assert _one(spark, "foobar", vrl.match_any("m", ["zzz", "fo+"])) is True
    assert _one(spark, "foobar", vrl.match_any("m", ["zzz", "qq"])) is False
    df = spark.createDataFrame([(["foobar", "bazqux"],)], "m array<string>")
    assert df.select(vrl.match_array("m", "foo").alias("o")).collect()[0]["o"] is True
    assert df.select(vrl.match_array("m", "foo", all_=True).alias("o")).collect()[0]["o"] is False


def test_format_int(spark):
    df = spark.createDataFrame([(42,), (-42,)], "m long")
    got = [r["o"] for r in df.select(vrl.format_int("m", 16).alias("o")).collect()]
    assert got == ["2a", "-2a"]


def test_to_syslog_facility(spark):
    df = spark.createDataFrame([(4,), (23,), (0,)], "m int")
    got = [r["o"] for r in df.select(vrl.to_syslog_facility("m").alias("o")).collect()]
    assert got == ["auth", "local7", "kern"]


def test_encode_key_value(spark):
    df = spark.createDataFrame([("x", 3)], ["a", "b"])
    got = df.select(
        vrl.encode_key_value({"ka": F.col("a"), "kb": F.col("b")}, field_delimiter="!", kv_delimiter=":").alias("o")
    ).collect()[0]["o"]
    assert got == "ka:x!kb:3"


def test_get_env_var_and_hostname(spark):
    import os, socket
    os.environ["VS_TEST_VAR"] = "hello"
    assert _one(spark, "x", vrl.get_env_var("VS_TEST_VAR")) == "hello"
    assert _one(spark, "x", vrl.get_hostname()) == socket.gethostname()
