"""Gopher quality-rule battery (textstats.gopher_rules): each rule from
Rae et al. 2021 Table A1 must fire on a purpose-built document and pass on
clean prose."""

from __future__ import annotations

from vector_spark.textstats import gopher_rules

CLEAN = (
    "the shape of the table and the index that we have built with care "
    "will be kept here for the next audit of the whole corpus"
)

CASES = [
    # (doc_id, text, failing rule or None)
    (0, CLEAN, None),
    (1, "too short to keep with the and of", "r_words"),
    (2, "aa bb cc dd ee ff gg hh ii jj kk " * 2 + "the of and that", "r_wlen"),
    (3, "the # a # of # and # b # c # d # e # f # g # h # i # that", "r_symbol"),
    (4, "- the one\n- of two\n- and three\n- that four\n- have five\n"
        "- with six\n- be seven\n- to eight\n- nine\n- ten\n- more", "r_bullet"),
    (5, "the first thought trails off...\nthe second also does...\n"
        "and the third one too...\nof that have with be to here", "r_ellipsis"),
    (6, "the 12 34 56 78 90 11 22 33 44 55 66 77 88 99 10 20 30 of and that",
        "r_alpha"),
    (7, "word salad lacking common glue terms here just nouns verbs "
        "tables chairs windows doors floors walls ceilings rooms", "r_stop"),
]


def test_each_rule_fires_exactly_where_planted(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in CASES], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in gopher_rules(df, min_words=12).collect()}
    rule_cols = [
        "r_words", "r_wlen", "r_symbol", "r_bullet",
        "r_ellipsis", "r_alpha", "r_stop",
    ]
    for i, _, expect_fail in CASES:
        r = rows[i]
        failed = [c for c in rule_cols if not getattr(r, c)]
        if expect_fail is None:
            assert failed == [] and r.keep, (i, failed)
        else:
            assert expect_fail in failed, (i, expect_fail, failed)
            assert not r.keep


def test_defaults_are_the_papers(spark):
    # paper defaults: 50..100k words — CLEAN (26 words) fails r_words only
    df = spark.createDataFrame([(0, CLEAN)], "doc_id long, text string")
    r = gopher_rules(df).collect()[0]
    assert not r.r_words and r.r_wlen and r.r_stop and not r.keep
