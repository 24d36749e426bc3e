"""Property-based tests (hypothesis) for portability-critical kernels.

The reference uses proptest/quickcheck in its lib crates (SURVEY.md §5);
here the highest-leverage properties are the cross-engine contracts:
the pinned portable hash must agree between Spark and DuckDB for ANY
string (every hash-gated operator depends on it), and codec/IP round-trips
must hold for arbitrary inputs.  Examples are batched into one DataFrame
per hypothesis case so each case costs one Spark job.
"""

from __future__ import annotations

import duckdb
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from vector_spark.hashing import portable_hash64, portable_hash64_sql

# printable unicode minus surrogates; DuckDB VARCHAR and Spark string both
# handle these
TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), min_codepoint=1),
    min_size=0,
    max_size=80,
)


@settings(max_examples=5, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=40, unique=True))
def test_portable_hash_matches_duckdb(spark, strings):
    df = spark.createDataFrame([(s,) for s in strings], ["v"])
    got = {
        r["v"]: r["h"]
        for r in df.select("v", portable_hash64("v").alias("h")).collect()
    }
    con = duckdb.connect()
    expr = portable_hash64_sql("v")
    want = {
        s: con.execute(f"SELECT {expr} AS h FROM (SELECT ? AS v)", [s]).fetchone()[0]
        for s in strings
    }
    assert got == want


@settings(max_examples=5, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=40))
def test_base64_roundtrip(spark, strings):
    from vector_spark.functions import vrl

    df = spark.createDataFrame([(s,) for s in strings], ["v"])
    out = df.select(
        "v", vrl.decode_base64(vrl.encode_base64(F.col("v"))).alias("rt")
    ).collect()
    for r in out:
        assert r["rt"] == r["v"]


@settings(max_examples=5, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**32 - 1), min_size=1, max_size=50))
def test_ip_aton_ntoa_roundtrip(spark, ips):
    from vector_spark.functions import vrl

    df = spark.createDataFrame([(i,) for i in ips], ["n"])
    out = df.select("n", vrl.ip_aton(vrl.ip_ntoa(F.col("n"))).alias("rt")).collect()
    for r in out:
        assert r["rt"] == r["n"]


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["INFO", "WARN", "ERROR", "DEBUG", "FATAL"]),
            st.integers(min_value=0, max_value=9999),
            st.text(alphabet="abcdefgh ", min_size=0, max_size=30),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_grok_parses_any_well_formed_line(spark, rows):
    """Any line built from the pattern's own grammar must parse back to its
    parts (generator-inverse property for the tokenlog pattern)."""
    from vector_spark.functions.grok import CANNED, grok_parse

    lines = [
        (f"2024-01-01T00:00:00Z {lvl} [svc] user={uid} status=200 bytes=1 msg={msg}",
         lvl, uid, msg)
        for lvl, uid, msg in rows
    ]
    df = spark.createDataFrame([(l[0],) for l in lines], ["message"])
    got = {
        r["message"]: (r["level"], r["user_id"], r["msg"])
        for r in grok_parse(df, "message", CANNED["tokenlog"]).collect()
    }
    for line, lvl, uid, msg in lines:
        assert got[line] == (lvl, uid, msg)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)),
            max_size=60,
        ),
        min_size=1,
        max_size=10,
    )
)
def test_gpt2_pretokenize_tiles_any_unicode(spark, texts):
    """Property: the GPT-2 pre-split TILES arbitrary unicode —
    concat(pieces) == text, and the sentinel byte stream strips back to
    the exact UTF-8 bytes."""
    from pyspark.sql import functions as F

    from vector_spark.bpe import (
        byte_tokenize_gpt2,
        gpt2_pretokenize,
        strip_piece_boundaries,
    )

    df = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)], "doc_id string, text string"
    )
    joined = {
        r["doc_id"]: "".join(r["pieces"])
        for r in gpt2_pretokenize(df).collect()
    }
    toks = {
        r["doc_id"]: list(r["t"])
        for r in byte_tokenize_gpt2(df).select(
            "doc_id", strip_piece_boundaries("tokens").alias("t")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert joined[str(i)] == t
        assert toks[str(i)] == list(t.encode("utf-8"))


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_star_cc_equals_propagation_on_random_graphs(spark, edges):
    """Property: large-star/small-star and min-label propagation agree on
    arbitrary random graphs (self-loops and duplicate edges included)."""
    from vector_spark.dedup import dedup_components, dedup_components_star

    pairs = spark.createDataFrame(
        [(f"n{a:02d}", f"n{b:02d}") for a, b in edges], ["id_a", "id_b"]
    )
    prop = {r["doc_id"]: r["component"] for r in dedup_components(pairs).collect()}
    star = {r["doc_id"]: r["component"] for r in dedup_components_star(pairs).collect()}
    assert star == prop
