"""Multiline aggregation golden tests — fixtures lifted verbatim from the
reference's own line aggregator tests (src/line_agg.rs tests:
mode_continue_through_1, mode_continue_past_1, mode_halt_before_1,
mode_halt_with_1, use_case_java_exception)."""

from __future__ import annotations

from vector_spark.multiline import line_agg


def _run(spark, lines, start, cond, mode):
    df = spark.createDataFrame(
        [(i, line) for i, line in enumerate(lines)], ["line_no", "line"]
    )
    out = line_agg(df, start, cond, mode)
    rows = sorted(out.collect(), key=lambda r: r["first_line_no"])
    return [(r["message"], r["last_line_no"]) for r in rows]


def test_continue_through(spark):
    lines = [
        "some usual line",
        "some other usual line",
        "first part",
        " second part",
        " last part",
        "another normal message",
        "finishing message",
        " last part of the incomplete finishing message",
    ]
    expected = [
        ("some usual line", 0),
        ("some other usual line", 1),
        ("first part\n second part\n last part", 4),
        ("another normal message", 5),
        ("finishing message\n last part of the incomplete finishing message", 7),
    ]
    assert _run(spark, lines, r"^[^\s]", r"^[\s]+", "continue_through") == expected


def test_continue_past(spark):
    lines = [
        "some usual line",
        "some other usual line",
        "first part \\",
        "second part \\",
        "last part",
        "another normal message",
        "finishing message \\",
        "last part of the incomplete finishing message \\",
    ]
    expected = [
        ("some usual line", 0),
        ("some other usual line", 1),
        ("first part \\\nsecond part \\\nlast part", 4),
        ("another normal message", 5),
        ("finishing message \\\nlast part of the incomplete finishing message \\", 7),
    ]
    assert _run(spark, lines, r"\\$", r"\\$", "continue_past") == expected


def test_halt_before(spark):
    lines = [
        "INFO some usual line",
        "INFO some other usual line",
        "INFO first part",
        "second part",
        "last part",
        "ERROR another normal message",
        "ERROR finishing message",
        "last part of the incomplete finishing message",
    ]
    expected = [
        ("INFO some usual line", 0),
        ("INFO some other usual line", 1),
        ("INFO first part\nsecond part\nlast part", 4),
        ("ERROR another normal message", 5),
        ("ERROR finishing message\nlast part of the incomplete finishing message", 7),
    ]
    assert _run(spark, lines, r"", r"^(INFO|ERROR) ", "halt_before") == expected


def test_halt_with(spark):
    lines = [
        "some usual line;",
        "some other usual line;",
        "first part",
        "second part",
        "last part;",
        "another normal message;",
        "finishing message",
        "last part of the incomplete finishing message",
    ]
    expected = [
        ("some usual line;", 0),
        ("some other usual line;", 1),
        ("first part\nsecond part\nlast part;", 4),
        ("another normal message;", 5),
        ("finishing message\nlast part of the incomplete finishing message", 7),
    ]
    assert _run(spark, lines, r"[^;]$", r";$", "halt_with") == expected


def test_java_exception(spark):
    lines = [
        "java.lang.Exception",
        "    at com.foo.bar(bar.java:123)",
        "    at com.foo.baz(baz.java:456)",
    ]
    expected = [
        (
            "java.lang.Exception\n    at com.foo.bar(bar.java:123)\n"
            "    at com.foo.baz(baz.java:456)",
            2,
        )
    ]
    assert _run(spark, lines, r"^[^\s]", r"^[\s]+at", "continue_through") == expected


def test_per_key_independence(spark):
    """Buffers are per source key (line_agg keyed by file)."""
    rows = [
        ("a", 0, "E err"),
        ("a", 1, " trace1"),
        ("b", 0, "E other"),
        ("a", 2, "E next"),
        ("b", 1, " traceB"),
    ]
    df = spark.createDataFrame(rows, ["f", "line_no", "line"])
    out = line_agg(
        df, r"^[^\s]", r"^[\s]+", "continue_through", key_cols=["f"]
    )
    got = {(r["f"], r["message"]) for r in out.collect()}
    assert got == {
        ("a", "E err\n trace1"),
        ("a", "E next"),
        ("b", "E other\n traceB"),
    }
