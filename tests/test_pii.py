"""Unit semantics for PII redaction (vector_spark/pii.py), pinned to the
reference's redact.cue examples plus the named-class extensions.  The
oracle-parity gate (`pii_scrub`) cross-checks counts + scrubbed text
against DuckDB at sf0.01 with the literal same regexes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_spark.pii import hit_count, pii_scrub, redact, redact_array


def _df(spark, rows, schema="s string"):
    return spark.createDataFrame(rows, schema)


def test_redact_cue_regex_example(spark):
    # redact.cue: redact("my id is 123456", filters: [r'\d+'])
    out = _df(spark, [("my id is 123456",)]).select(
        redact("s", [r"\d+"]).alias("r")
    ).collect()[0]["r"]
    assert out == "my id is [REDACTED]"


def test_redact_cue_ssn_example(spark):
    # redact.cue: "123-12-1234" with us_social_security_number -> [REDACTED]
    out = _df(spark, [("123-12-1234",)]).select(
        redact("s", ["us_social_security_number"]).alias("r")
    ).collect()[0]["r"]
    assert out == "[REDACTED]"


def test_named_classes_and_counts(spark):
    text = "from 10.1.2.3 by bob@corp.io card 4111-1111-1111-1234 +1 555 123 4567"
    df = _df(spark, [(text,)])
    r = df.select(
        hit_count("s", "ipv4").alias("ip"),
        hit_count("s", "email").alias("em"),
        hit_count("s", "credit_card").alias("cc"),
        hit_count("s", "phone").alias("ph"),
        hit_count("s", "us_social_security_number").alias("ssn"),
        redact("s", ["ipv4", "email", "credit_card", "phone"]).alias("r"),
    ).collect()[0]
    assert (r["ip"], r["em"], r["cc"], r["ph"], r["ssn"]) == (1, 1, 1, 1, 0)
    assert "10.1.2.3" not in r["r"] and "bob@corp.io" not in r["r"]
    assert "4111" not in r["r"] and "4567" not in r["r"]
    assert r["r"].count("[REDACTED]") == 4


def test_ssn_does_not_match_inside_card(spark):
    r = _df(spark, [("4111-1111-1111-1234",)]).select(
        hit_count("s", "us_social_security_number").alias("n")
    ).collect()[0]["n"]
    assert r == 0


def test_redact_array_preserves_nulls(spark):
    df = _df(spark, [(["a 1-2 b", None, "x 999-99-9999 y"],)], "s array<string>")
    out = df.select(
        redact_array("s", ["us_social_security_number"]).alias("r")
    ).collect()[0]["r"]
    assert out == ["a 1-2 b", None, "x [REDACTED] y"]


def test_pii_scrub_shape(spark):
    df = spark.createDataFrame(
        [(1, "mail a@b.co"), (2, "clean")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert rows[1]["email_hits"] == 1 and rows[2]["email_hits"] == 0
    assert rows[1]["scrubbed"] == "mail [REDACTED]"
    assert set(rows[1].asDict()) == {
        "doc_id", "ssn_hits", "email_hits", "ipv4_hits",
        "credit_card_hits", "phone_hits", "scrubbed",
    }
