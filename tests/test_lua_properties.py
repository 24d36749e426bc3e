"""Property tests for the Lua runtime: the closure-compiled evaluator
against Python ground truth on randomly generated programs and data.
"""

from __future__ import annotations

import json
import math

from hypothesis import given, settings, strategies as st

from vector_spark.lua import LuaRuntime, fmt_number
from vector_spark.operators.lua import lua_to_py, py_to_lua

INTS = st.integers(min_value=-(2**62), max_value=2**62)
SMALL_INTS = st.integers(min_value=-1000, max_value=1000)
FLOATS = st.floats(allow_nan=False, allow_infinity=False,
                   min_value=-1e12, max_value=1e12)
# text without quotes/backslashes/brackets so it embeds in Lua literals
LUA_SAFE = st.text(
    alphabet=st.characters(blacklist_characters="'\"\\[]\n\r",
                           min_codepoint=32, max_codepoint=0x2FF),
    max_size=30)


def run1(src):
    return LuaRuntime().run(src)[0]


@settings(max_examples=60, deadline=None)
@given(SMALL_INTS, SMALL_INTS)
def test_integer_arithmetic_matches_python(a, b):
    rt = LuaRuntime()
    assert rt.run(f"return ({a}) + ({b})") == [a + b]
    assert rt.run(f"return ({a}) - ({b})") == [a - b]
    assert rt.run(f"return ({a}) * ({b})") == [a * b]
    if b != 0:
        # Lua // and % are floor-based, same as Python's int ops
        assert rt.run(f"return ({a}) // ({b})") == [a // b]
        assert rt.run(f"return ({a}) % ({b})") == [a % b]


@settings(max_examples=40, deadline=None)
@given(INTS, INTS)
def test_bitwise_matches_python_int64(a, b):
    def w(v):
        v &= (1 << 64) - 1
        return v - (1 << 64) if v & (1 << 63) else v

    rt = LuaRuntime()
    assert rt.run(f"return ({a}) & ({b})") == [w(a & b)]
    assert rt.run(f"return ({a}) | ({b})") == [w(a | b)]
    assert rt.run(f"return ({a}) ~ ({b})") == [w(a ^ b)]
    assert rt.run(f"return ~({a})") == [w(~a)]


@settings(max_examples=40, deadline=None)
@given(FLOATS, FLOATS)
def test_float_arithmetic_matches_python(a, b):
    got = run1(f"return ({a!r}) + ({b!r})")
    assert got == a + b or math.isclose(got, a + b, rel_tol=1e-15)
    got = run1(f"return ({a!r}) * ({b!r})")
    assert got == a * b or math.isclose(got, a * b, rel_tol=1e-15)


@settings(max_examples=50, deadline=None)
@given(LUA_SAFE, LUA_SAFE, LUA_SAFE)
def test_gsub_literal_equals_str_replace(s, old, new):
    # literal (magic-free) patterns must behave exactly like str.replace
    magic = set("^$*+?.([%-")
    if not old or (magic & set(old)) or (magic & set(new)) or "%" in new:
        return
    rt = LuaRuntime()
    res, cnt = rt.run(f"return string.gsub('{s}', '{old}', '{new}')")
    assert res == s.replace(old, new)
    assert cnt == s.count(old)


@settings(max_examples=50, deadline=None)
@given(LUA_SAFE)
def test_string_functions_match_python(s):
    rt = LuaRuntime()
    assert rt.run(f"return string.upper('{s}')") == [s.upper()]
    assert rt.run(f"return string.lower('{s}')") == [s.lower()]
    assert rt.run(f"return string.reverse('{s}')") == [s[::-1]]
    assert rt.run(f"return #('{s}')") == [len(s)]
    assert rt.run(f"return ('{s}'):rep(3)") == [s * 3]


@settings(max_examples=40, deadline=None)
@given(st.lists(SMALL_INTS, min_size=1, max_size=20))
def test_table_sort_and_concat_match_python(xs):
    rt = LuaRuntime()
    lit = "{" + ",".join(map(str, xs)) + "}"
    got = rt.run(f"local t = {lit} table.sort(t) return table.concat(t, ',')")
    assert got == [",".join(map(str, sorted(xs)))]
    got = rt.run(f"local t = {lit} return #t")
    assert got == [len(xs)]


@settings(max_examples=40, deadline=None)
@given(st.recursive(
    # no None INSIDE containers: a nil element is a hole in a Lua
    # sequence ([None, False] -> {2: false}) — real semantics, but not a
    # roundtrip; nil-valued dict entries are separately normalized below
    st.one_of(st.booleans(), SMALL_INTS, FLOATS, st.text(max_size=12)),
    lambda inner: st.one_of(
        st.lists(inner, max_size=4),
        st.dictionaries(st.text(min_size=1, max_size=8),
                        st.one_of(st.none(), inner), max_size=4)),
    max_leaves=12))
def test_event_conversion_roundtrip(v):
    # py -> lua -> py is identity for JSON-shaped values, modulo the
    # genuine Lua table semantics: NaN maps to nil on ingest, nil-valued
    # entries do not exist (t[k] = nil removes — the reference's
    # nil-removes-field rule), and an empty table has no list/dict
    # identity ({} == [] in Lua)
    def norm(x):
        if isinstance(x, list):
            x = [norm(e) for e in x if e is not None]
        elif isinstance(x, dict):
            x = {k: norm(e) for k, e in x.items() if e is not None}
        if isinstance(x, (list, dict)) and not x:
            return []
        return x

    back = norm(lua_to_py(py_to_lua(v)))
    v = norm(v)
    assert back == v or json.dumps(back, sort_keys=True, default=str) == \
        json.dumps(v, sort_keys=True, default=str)


@settings(max_examples=30, deadline=None)
@given(SMALL_INTS, st.integers(min_value=1, max_value=9))
def test_closure_counter_semantics(start, step):
    # closures share upvalues; n calls advance by n*step
    rt = LuaRuntime()
    got = rt.run(f"""
        local n = {start}
        local function inc() n = n + {step} return n end
        inc() inc()
        return inc()
    """)
    assert got == [start + 3 * step]


@settings(max_examples=30, deadline=None)
@given(FLOATS)
def test_tostring_number_is_lua_shaped(x):
    # %.14g with a trailing .0 marker for integral floats
    s = run1(f"return tostring({x!r})")
    assert s == fmt_number(x)
    # and tonumber round-trips it
    assert math.isclose(run1(f"return tonumber('{s}')"), x, rel_tol=1e-13)
