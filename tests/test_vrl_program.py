"""The VRL statement-program compiler (vector_spark/vrl_program.py):
the remap subset the reference's datadog_agent_remap_* regression
configs use, compiled to pure Column expressions."""

from __future__ import annotations

import pytest

from vector_spark.vrl_program import VrlCompileError, compile_vrl_program

REFERENCE_PROGRAM = '''
.hostname = "vector"

if .status == "warning" {
  .thing = upcase(.hostname)
} else if .status == "notice" {
  .thung = downcase(.hostname)
} else {
  .nong = upcase(.hostname)
}

.matches = { "name": .message, "num": "2" }
.origin, .err = .hostname + "/" + .matches.name + "/" + .matches.num
'''


def test_reference_program_semantics(spark):
    df = spark.createDataFrame(
        [("warning", "hello"), ("notice", "world"), ("info", "x"),
         ("warning", None)],
        "status string, message string")
    out = {(r["status"], r["message"]): r
           for r in compile_vrl_program(df, REFERENCE_PROGRAM).collect()}
    r1 = out[("warning", "hello")]
    assert (r1["hostname"], r1["thing"], r1["thung"], r1["nong"]) == (
        "vector", "VECTOR", None, None)
    assert r1["matches"].asDict() == {"name": "hello", "num": "2"}
    assert r1["origin"] == "vector/hello/2" and r1["err"] is None
    r2 = out[("notice", "world")]
    assert (r2["thing"], r2["thung"], r2["nong"]) == (None, "vector", None)
    r3 = out[("info", "x")]
    assert (r3["thing"], r3["thung"], r3["nong"]) == (None, None, "VECTOR")
    # fallible concat with a null operand: origin NULL, err captured
    r4 = out[("warning", None)]
    assert r4["origin"] is None and "expected string" in r4["err"]


def test_sequential_scope(spark):
    # concat over KNOWN strings (literal -> upcase chain) is infallible,
    # like real VRL's type inference; over unknown-typed source fields
    # it stays fallible (test_compile_errors)
    df = spark.createDataFrame([("a",)], "x string")
    out = compile_vrl_program(
        df, '.y = "a"\n.z = upcase(.y) + "!"').collect()[0]
    assert out["y"] == "a" and out["z"] == "A!"


def test_reassignment_updates_in_place(spark):
    df = spark.createDataFrame([("a",)], "x string")
    out = compile_vrl_program(df, '.x = "b"\n.y = .x')
    assert out.columns == ["x", "y"]
    row = out.collect()[0]
    assert row["x"] == "b" and row["y"] == "b"


def test_if_condition_null_takes_else(spark):
    df = spark.createDataFrame([(None,), ("warning",)], "status string")
    prog = 'if .status == "warning" { .k = "W" } else { .k = "E" }'
    got = {r["status"]: r["k"]
           for r in compile_vrl_program(df, prog).collect()}
    assert got == {None: "E", "warning": "W"}


def test_compile_errors(spark):
    df = spark.createDataFrame([("a",)], "x string")
    with pytest.raises(VrlCompileError, match="unknown field"):
        compile_vrl_program(df, ".y = .nope")
    with pytest.raises(VrlCompileError, match="unsupported function"):
        compile_vrl_program(df, ".y = sha999(.x)")
    with pytest.raises(VrlCompileError, match="error-capturing"):
        # fallible expr without the , .err target is a compile error
        compile_vrl_program(df, ".y = .x + .x")


def test_comparison_and_not_equal(spark):
    df = spark.createDataFrame([("a",), ("b",)], "x string")
    prog = 'if .x != "a" { .m = "other" } else { .m = "isa" }'
    got = {r["x"]: r["m"] for r in compile_vrl_program(df, prog).collect()}
    assert got == {"a": "isa", "b": "other"}
