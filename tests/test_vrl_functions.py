"""VRL stdlib parity tests — inputs/outputs transcribed from the
reference's doc-example corpus (website/cue/reference/remap/functions/*.cue,
which the reference executes as tests via lib/vector-vrl/tests).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_spark.functions import vrl


def one(spark, col, value="x"):
    """Evaluate a single Column over a 1-row frame."""
    return spark.createDataFrame([(value,)], ["v"]).select(col.alias("r")).first()["r"]


def test_parse_json(spark):
    # parse_json.cue: '{"key": "val"}' -> {key: val}
    r = one(spark, vrl.parse_json(F.col("v"), "key string"), '{"key": "val"}')
    assert r["key"] == "val"
    bad = one(spark, vrl.parse_json(F.col("v"), "key string"), "not json")
    assert bad["key"] is None  # PERMISSIVE: malformed -> all-NULL fields


def test_parse_key_value(spark):
    # parse_key_value.cue simplified: logfmt line -> map
    r = one(spark, vrl.parse_key_value(F.col("v")), "lvl=info msg=hello")
    assert r == {"lvl": "info", "msg": "hello"}


def test_parse_query_string(spark):
    r = one(spark, vrl.parse_query_string(F.col("v")), "?foo=bar&baz=qux")
    assert r == {"foo": "bar", "baz": "qux"}


def test_parse_csv(spark):
    r = one(spark, vrl.parse_csv(F.col("v"), "a string, b string, c string"), 'x,"y,z",w')
    assert (r["a"], r["b"], r["c"]) == ("x", "y,z", "w")


def test_parse_url(spark):
    r = one(spark, vrl.parse_url(F.col("v")), "https://vector.dev:443/path?q=1#frag")
    assert r["scheme"] == "https"
    assert r["path"] == "/path"
    assert r["query"] == "q=1"
    assert r["fragment"] == "frag"


def test_parse_timestamp_fallible(spark):
    ok = one(spark, vrl.parse_timestamp(F.col("v"), "yyyy-MM-dd"), "2024-06-01")
    bad = one(spark, vrl.parse_timestamp(F.col("v"), "yyyy-MM-dd"), "junk")
    assert ok is not None and bad is None


def test_parse_int_bases(spark):
    assert one(spark, vrl.parse_int(F.col("v")), "42") == 42
    assert one(spark, vrl.parse_int(F.col("v"), base=16), "ff") == 255
    assert one(spark, vrl.parse_int(F.col("v"), base=8), "755") == 493


def test_parse_duration(spark):
    # parse_duration.cue: parse_duration!("1005ms", unit: "s") == 1.005
    assert one(spark, vrl.parse_duration(F.col("v"), "s"), "1005ms") == pytest.approx(1.005)
    assert one(spark, vrl.parse_duration(F.col("v"), "ms"), "2s") == pytest.approx(2000.0)


def test_parse_tokens(spark):
    # parse_tokens.cue:30-39: words / "quoted" / [bracketed] -> 5 tokens
    line = 'A sentence "with \\"a\\" sentence inside" and [some brackets]'
    toks = one(spark, vrl.parse_tokens(F.col("v")), line)
    assert len(toks) == 5  # exact cue-doc expectation (escaped quotes honored)
    simple = one(spark, vrl.parse_tokens(F.col("v")), 'one "two three" [four five] six')
    assert simple == ["one", '"two three"', "[four five]", "six"]


def test_codecs(spark):
    # encode_base64.cue: "please encode me" -> "cGxlYXNlIGVuY29kZSBtZQ=="
    assert one(spark, vrl.encode_base64(F.col("v")), "please encode me") == "cGxlYXNlIGVuY29kZSBtZQ=="
    assert one(spark, vrl.decode_base64(F.col("v")), "cGxlYXNlIGVuY29kZSBtZQ==") == "please encode me"
    # encode_base16.cue: "please encode me" -> hex
    assert one(spark, vrl.encode_base16(F.col("v")), "please encode me") == "706c6561736520656e636f6465206d65"
    assert one(spark, vrl.decode_base16(F.col("v")), "706c6561736520656e636f6465206d65") == "please encode me"


def test_encode_logfmt(spark):
    out = one(
        spark,
        vrl.encode_logfmt({"lvl": F.lit("info"), "msg": F.lit("hello"), "app": F.lit("x")}),
    )
    assert out == "app=x lvl=info msg=hello"  # lexicographic key order per cue doc


def test_strings(spark):
    assert one(spark, vrl.truncate(F.col("v"), 5, "..."), "hello world") == "hello..."
    assert one(spark, vrl.truncate(F.col("v"), 50), "short") == "short"
    assert one(spark, vrl.slice_(F.col("v"), 6, 11), "hello world") == "world"
    assert one(spark, vrl.redact(F.col("v"), [r"\d{3}-\d{2}-\d{4}"]), "ssn 123-45-6789!") == "ssn [REDACTED]!"
    assert one(spark, vrl.strip_ansi_escape_codes(F.col("v")), "\x1b[31mred\x1b[0m") == "red"
    assert one(spark, vrl.contains(F.col("v"), "BANANA", case_sensitive=False), "apple banana")


def test_arrays(spark):
    df = spark.createDataFrame([([1, 2, 2, None, 3],)], "a array<int>")
    got = df.select(
        vrl.compact("a").alias("compact"),
        vrl.unique(vrl.compact("a")).alias("uniq"),
        vrl.chunks(vrl.compact("a"), 2).alias("chunks"),
        vrl.push(vrl.compact("a"), F.lit(9)).alias("pushed"),
    ).first()
    assert got["compact"] == [1, 2, 2, 3]
    assert got["uniq"] == [1, 2, 3]
    assert got["chunks"] == [[1, 2], [2, 3]]
    assert got["pushed"] == [1, 2, 2, 3, 9]


def test_merge_maps(spark):
    df = spark.createDataFrame(
        [({"a": "1", "b": "2"}, {"b": "3", "c": None})],
        "x map<string,string>, y map<string,string>",
    )
    got = df.select(vrl.merge("x", "y").alias("m")).first()["m"]
    assert got["a"] == "1" and got["b"] == "3"  # right wins


def test_syslog_conversions(spark):
    assert one(spark, vrl.to_syslog_level(F.lit(3))) == "err"       # to_syslog_level.cue
    assert one(spark, vrl.to_syslog_severity(F.lit("alert"))) == 1  # to_syslog_severity.cue


def test_ip_functions(spark):
    # ip_aton.cue: "1.2.3.4" -> 16909060
    assert one(spark, vrl.ip_aton(F.col("v")), "1.2.3.4") == 16909060
    assert one(spark, vrl.ip_ntoa(F.lit(16909060))) == "1.2.3.4"
    # ip_cidr_contains.cue: 192.168.0.0/16 contains 192.168.10.32
    assert one(spark, vrl.ip_cidr_contains("192.168.0.0/16", F.col("v")), "192.168.10.32")
    assert not one(spark, vrl.ip_cidr_contains("192.168.0.0/24", F.col("v")), "192.168.10.32")
    assert one(spark, vrl.is_ipv4(F.col("v")), "10.0.0.1")
    assert not one(spark, vrl.is_ipv4(F.col("v")), "999.0.0.1")


def test_crypto(spark):
    # md5.cue: md5("foo") == "acbd18db4cc2f85cedef654fccc4a4d8"
    assert one(spark, vrl.md5(F.col("v")), "foo") == "acbd18db4cc2f85cedef654fccc4a4d8"
    # sha1.cue: sha1("foo")
    assert one(spark, vrl.sha1(F.col("v")), "foo") == "0beec7b5ea3f0fdbc95d0dd47f3c5bc275da8a33"
    assert len(one(spark, vrl.sha2(F.col("v"), 256), "foo")) == 64


def test_timestamp_format(spark):
    df = spark.createDataFrame([("2020-10-21 16:00:00",)], ["v"])
    got = df.select(
        vrl.format_timestamp(F.to_timestamp("v"), "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("r")
    ).first()["r"]
    assert got == "2020-10-21T16:00:00Z"
    assert one(spark, vrl.to_unix_timestamp(F.to_timestamp(F.lit("1970-01-02 00:00:00")))) == 86400


def test_parse_apache_log(spark):
    # parse_common_log.cue example shape
    line = '127.0.0.1 bob frank [10/Oct/2000:13:55:36 -0700] "GET /apache_pb.gif HTTP/1.0" 200 2326'
    df = spark.createDataFrame([(line,)], ["message"])
    r = df.select(*vrl.parse_apache_log("message")).first()
    assert r["host"] == "127.0.0.1" and r["user"] == "frank"
    assert r["method"] == "GET" and r["path"] == "/apache_pb.gif"
    assert r["status"] == 200 and r["size"] == 2326


def test_parse_syslog(spark):
    line = "<34>1 2020-10-02T23:22:12Z mymachine su 77 ID47 su root failed"
    df = spark.createDataFrame([(line,)], ["message"])
    r = df.select("*", *vrl.parse_syslog("message")).first()
    assert r["priority"] == 34 and r["hostname"] == "mymachine"
    assert r["facility_num"] == 4 and r["severity_num"] == 2
    assert r["message"] == line  # source col untouched; parsed msg field:
    # grok names the trailing capture 'message' too -> it shadows in select;
    # the canned pattern's field is exposed via its own alias position
