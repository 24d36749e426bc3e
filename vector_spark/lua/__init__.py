"""A from-scratch Lua 5.4-subset runtime in pure Python.

Backs the `lua` transform (reference: src/transforms/lua/v1/mod.rs and
v2/mod.rs embed mlua): hook sources written in real Lua run inside
Arrow-batched ``mapInPandas`` workers, one interpreter per partition —
which also means Spark parallelizes the Lua stage across partitions,
something the reference's single mlua runtime per transform cannot do.

Supported: full expression/statement grammar minus goto, closures with
shared upvalues, multiple returns, metatables (__index __newindex __call
__tostring __eq __len __concat), integer/float subtypes with 64-bit
wrap, Lua patterns (find/match/gmatch/gsub incl. %b/%f/backrefs/position
captures), string.format, base/string/table/math/os libraries, pcall,
coroutines (incl. ``coroutine.close``; release via
``Interpreter.close_coroutines()`` at partition teardown), and
``require`` from configured ``search_dirs``.

DOCUMENTED DIVERGENCE from PUC-Lua/mlua: strings are sequences of
Unicode CODE POINTS, not bytes — ``#'héllo'`` is 5 here where mlua
returns 6, and ``string.sub/byte/len`` index characters.  Spark hands
event fields to hooks as decoded text, so character semantics are the
useful default for log processing; byte-arithmetic scripts ported from
the reference must be adjusted (``utf8.len/offset/codes`` expose
byte-aware views).  ``string.pack/unpack`` are omitted for the same
reason (byte-buffer semantics; unused by the reference's lua corpus).
"""

from __future__ import annotations

from .interp import (
    Interpreter,
    LuaError,
    LuaFunction,
    LuaTable,
    fmt_number,
    is_truthy,
    lua_tonumber,
    lua_tostring,
    lua_type,
)
from .lexer import LuaSyntaxError

__all__ = [
    "Interpreter",
    "LuaError",
    "LuaFunction",
    "LuaRuntime",
    "LuaSyntaxError",
    "LuaTable",
    "fmt_number",
    "is_truthy",
    "lua_tonumber",
    "lua_tostring",
    "lua_type",
]


class LuaRuntime(Interpreter):
    """Interpreter facade with the hook-resolution rule the reference's
    v2 transform applies (lua/v2/mod.rs:263-286): a hook is either inline
    Lua source that evaluates to a function, or the name of a global
    function defined by the `source` program."""

    def eval_hook(self, text: str, what: str):
        src = text.strip()
        if not src:
            raise LuaError(f"empty Lua code in \"{what}\"")
        # name form: a bare identifier referring to a global
        if src.isidentifier():
            fn = self.globals.get(src)
            if fn is None:
                raise LuaError(f"Lua function {src!r} for \"{what}\" is not defined")
            return fn
        res = self.run(f"return ({src})", chunkname=what)
        fn = res[0] if res else None
        if not (isinstance(fn, LuaFunction) or callable(fn)):
            raise LuaError(f"Lua code in \"{what}\" does not evaluate to a function")
        return fn
