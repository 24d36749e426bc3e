"""Operator-precedence and lexical edge cases for the Lua runtime,
pinned against the Lua 5.4 manual's grammar (§3.4.8 operator
priorities; §3.1 lexical conventions)."""

from __future__ import annotations

import pytest

from vector_spark.lua import LuaError, LuaRuntime


def run(src):
    return LuaRuntime().run(src)


@pytest.mark.parametrize("src,want", [
    ("return -2^2", [-4.0]),                 # ^ binds above unary minus
    ("return 2^3^2", [512.0]),               # ^ right-associative
    ("return not 1 == 2", [False]),          # (not 1) == 2
    ("return not (1 == 2)", [True]),
    ("return 1 < 2 == true", [True]),        # comparison below ==? no: same tier, left
    ("return 1 + 2 * 3 - 4 / 2", [5.0]),
    ("return (1 + 2) * 3 % 5", [4]),
    ("return 10 - 2 - 3", [5]),              # left-associative
    ("return -(-5)", [5]),
    ("return 'a'..'b'..'c'", ["abc"]),       # .. right-associative
    ("return 1 .. 2 + 3", ["15"]),           # + above ..
    ("return 3 & 2 | 1", [3]),               # & above |
    ("return 1 | 2 ~ 3", [1]),               # binary ~ between | and &
    ("return 1 << 2 + 1", [8]),              # arith above shifts
    ("return 0x10 + 0X0f", [31]),
    ("return 1e2, 1E-2, .5, 5.", [100.0, 0.01, 0.5, 5.0]),
    ("local t={1,2} return #t + 1", [3]),    # unary # above +
    ("return ((('x'))):upper()", ["X"]),
    ("local s = 'hi' return s:sub(1,1):upper() .. s:sub(2)", ["Hi"]),
    ("local a = {b = {c = function(self, x) return x + 1 end}} return a.b:c(41)", [42]),
    ("return [==[a 'b' \"c\" ]]]==]", ['a \'b\' "c" ]]']),
    ("local s=0 for i=0,1,0.25 do s=s+1 end return s", [5]),
])
def test_precedence_and_lexical(src, want):
    assert run(src) == want


def test_no_comparison_chains():
    # 1 < 2 < 3 is (1<2) < 3 = boolean < number -> error, like real Lua
    with pytest.raises(LuaError, match="compare"):
        run("return 1 < 2 < 3")
    with pytest.raises(LuaError, match="compare"):
        run("return 'a' < 1")
