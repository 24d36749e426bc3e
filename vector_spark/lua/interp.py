"""Core runtime (values, calls, metamethods) + stdlib for the
Lua-subset runtime; execution is closure-compiled in compiler.py.

Semantics follow the public Lua 5.4 reference manual: integer/float
subtypes (`/` and `^` always float, `//`/`%` floor semantics, 64-bit
integer wrap-around), short-circuit and/or, multiple return values and
their truncation rules, metatables (__index __newindex __call __tostring
__eq __len __concat), closures with shared upvalues, pcall error
handling, and the base/string/table/math/os libraries the reference's
lua transform exposes through mlua (src/transforms/lua/v1/mod.rs:114 —
``StdLib::ALL_SAFE``).

Host interop: any Python object with ``lua_index``/``lua_newindex``
(and optionally ``lua_pairs``/``lua_len``) participates in indexing —
the v1 transform's event userdata (lua/v1/mod.rs:214-299) is modeled
that way in operators/lua.py.
"""

from __future__ import annotations

import bisect as _bisect
import math
import time as _time

from . import patterns
from .lexer import LuaSyntaxError  # re-export for callers  # noqa: F401
from .lparser import parse

_INT_MASK = (1 << 64) - 1
_INT_SIGN = 1 << 63


def _wrap_int(v: int) -> int:
    v &= _INT_MASK
    return v - (1 << 64) if v & _INT_SIGN else v


class LuaError(Exception):
    """A Lua runtime error; ``value`` is the Lua error value (usually a
    string already carrying the ``chunk:line:`` prefix, like mlua)."""

    def __init__(self, value):
        super().__init__(lua_tostring(value))
        self.value = value


class _Break(Exception):
    pass


class _Return(Exception):
    def __init__(self, values):
        self.values = values


_TRUE_KEY = ("\0bool", True)
_FALSE_KEY = ("\0bool", False)


def _wrap_key(k):
    """Normalize a table key: integral floats -> int; booleans get
    sentinel keys so Python's True==1 doesn't collide Lua-distinct keys."""
    if isinstance(k, bool):
        return _TRUE_KEY if k else _FALSE_KEY
    if isinstance(k, float):
        if k != k:
            raise LuaError("table index is NaN")
        if k.is_integer():
            return int(k)
    if k is None:
        raise LuaError("table index is nil")
    return k


def _unwrap_key(k):
    if k == _TRUE_KEY:
        return True
    if k == _FALSE_KEY:
        return False
    return k


class LuaTable:
    __slots__ = ("hash", "metatable")

    def __init__(self, pairs=None):
        self.hash: dict = {}
        self.metatable: LuaTable | None = None
        if pairs:
            for k, v in pairs:
                self.set(k, v)

    def get(self, k):
        tk = type(k)
        if tk is str or tk is int:  # the hot path; bool is not `is int`
            return self.hash.get(k)
        try:
            return self.hash.get(_wrap_key(k))
        except LuaError:
            return None  # reading t[nil]/t[nan] is nil, not an error

    def set(self, k, v):
        tk = type(k)
        if tk is str or tk is int:
            if v is None:
                self.hash.pop(k, None)
            else:
                self.hash[k] = v
            return
        wk = _wrap_key(k)
        if v is None:
            self.hash.pop(wk, None)
        else:
            self.hash[wk] = v

    def length(self) -> int:
        n = 0
        h = self.hash
        while (n + 1) in h:
            n += 1
        return n

    def lua_keys(self):
        return [_unwrap_key(k) for k in self.hash]

    def __repr__(self):  # pragma: no cover - debug aid
        return f"table: 0x{id(self):012x}"


class LuaFunction:
    """A Lua closure: ``body`` is the closure-COMPILED block
    (compiler.py), paired at creation with the defining _Env."""

    __slots__ = ("params", "is_vararg", "body", "env", "name", "interp")

    def __init__(self, params, is_vararg, body, env, name, interp):
        self.params = params
        self.is_vararg = is_vararg
        self.body = body
        self.env = env
        self.name = name
        self.interp = interp

    def __repr__(self):  # pragma: no cover - debug aid
        return f"function: 0x{id(self):012x}"


class _Env:
    """Lexical scope: a dict chain.  Locals live in ``vars``; closures
    hold the defining _Env so upvalue mutation is shared."""

    __slots__ = ("vars", "parent")

    def __init__(self, parent=None):
        self.vars: dict = {}
        self.parent = parent

    def lookup(self, name):
        e = self
        while e is not None:
            if name in e.vars:
                return e
            e = e.parent
        return None


# -- value helpers ------------------------------------------------------

def lua_type(v) -> str:
    if v is None:
        return "nil"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, (int, float)):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, LuaTable):
        return "table"
    if isinstance(v, LuaFunction) or callable(v):
        return "function"
    return "userdata"


def fmt_number(v) -> str:
    if isinstance(v, int) and not isinstance(v, bool):
        return str(v)
    if v != v:
        return "nan"
    if v == math.inf:
        return "inf"
    if v == -math.inf:
        return "-inf"
    s = "%.14g" % v
    # Lua prints floats with a decimal marker ("3.0", not "3")
    if not any(c in s for c in ".eEn"):
        s += ".0"
    return s


def lua_tostring(v) -> str:
    if v is None:
        return "nil"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return fmt_number(v)
    if isinstance(v, str):
        return v
    if isinstance(v, LuaTable):
        if v.metatable is not None:
            mm = v.metatable.get("__tostring")
            if mm is not None:
                raise _NeedsMetacall(mm, v)
            mm = v.metatable.get("__name")
            if isinstance(mm, str):
                return f"{mm}: 0x{id(v):012x}"
        return f"table: 0x{id(v):012x}"
    if isinstance(v, LuaFunction) or callable(v):
        return f"function: 0x{id(v):012x}"
    return f"userdata: 0x{id(v):012x}"


class _NeedsMetacall(Exception):
    """Internal: lua_tostring hit a __tostring metamethod; the interp
    catches this and performs the call (keeps lua_tostring usable from
    pure-Python contexts)."""

    def __init__(self, fn, obj):
        self.fn = fn
        self.obj = obj


def lua_tonumber(v, base=None):
    if base is not None:
        if not isinstance(v, str):
            return None
        try:
            return _wrap_int(int(v.strip(), int(base)))
        except ValueError:
            return None
    if isinstance(v, bool):
        return None
    if isinstance(v, (int, float)):
        return v
    if isinstance(v, str):
        s = v.strip()
        try:
            if s[:2].lower() in ("0x", "-0") and "x" in s[:3].lower():
                return _wrap_int(int(s, 16))
            return int(s, 10)
        except ValueError:
            try:
                return float(s)
            except ValueError:
                return None
    return None


def _arith_num(v, op: str, line_info):
    n = lua_tonumber(v) if not isinstance(v, bool) else None
    if n is None:
        raise LuaError(
            f"{line_info}attempt to perform arithmetic ({op}) on a "
            f"{lua_type(v)} value")
    return n


def _toint(v, what: str, line_info):
    if isinstance(v, bool):
        raise LuaError(f"{line_info}attempt to perform bitwise operation on a boolean value")
    if isinstance(v, int):
        return v
    if isinstance(v, float) and v.is_integer():
        return int(v)
    if isinstance(v, str):
        n = lua_tonumber(v)
        if isinstance(n, int) or (isinstance(n, float) and n.is_integer()):
            return int(n)
    raise LuaError(f"{line_info}number has no integer representation" if
                   isinstance(v, (int, float)) else
                   f"{line_info}attempt to perform bitwise operation on a {lua_type(v)} value")


def lua_eq(a, b) -> bool:
    if a is None or b is None:
        return a is b
    if isinstance(a, bool) or isinstance(b, bool):
        return a is b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return a == b
    if isinstance(a, str) and isinstance(b, str):
        return a == b
    return a is b


def is_truthy(v) -> bool:
    return v is not None and v is not False


class Interpreter:
    """One Lua state: globals + module cache + chunk name."""

    def __init__(self, search_dirs=(), chunkname: str = "source"):
        self.globals = LuaTable()
        self.chunkname = chunkname
        self.search_dirs = list(search_dirs)
        self.modules: dict[str, object] = {}
        self.current_line = 0
        self.string_lib: LuaTable | None = None
        install_stdlib(self)

    # -- public API ----------------------------------------------------
    def compile(self, src: str, chunkname: str | None = None):
        """Parse + closure-compile a chunk (compiler.py); returns
        ``run(env=None) -> list`` of the chunk's return values."""
        from .compiler import Compiler

        block = parse(src, chunkname or self.chunkname)
        return Compiler(self).chunk(block)

    def run(self, src: str, chunkname: str | None = None, env: _Env | None = None):
        """Execute a chunk; returns its return values as a list."""
        return self.compile(src, chunkname)(env)

    def call(self, f, *args):
        """Call a Lua value from Python; returns list of results."""
        try:
            return self.call_value(f, list(args), self.current_line)
        except RecursionError:
            raise LuaError("stack overflow") from None

    def tostring(self, v) -> str:
        try:
            return lua_tostring(v)
        except _NeedsMetacall as m:
            res = self.call_value(m.fn, [m.obj], self.current_line)
            out = res[0] if res else None
            if not isinstance(out, str):
                raise LuaError("'__tostring' must return a string")
            return out

    def _pos(self, line) -> str:
        return f"{self.chunkname}:{line}: "

    # -- statements ------------------------------------------------------
    def getindex(self, obj, key, line):
        for _ in range(100):  # __index chain bound, like Lua's loop limit
            if isinstance(obj, LuaTable):
                v = obj.get(key)
                if v is not None or obj.metatable is None:
                    return v
                mm = obj.metatable.get("__index")
                if mm is None:
                    return None
                if isinstance(mm, LuaTable):
                    obj = mm
                    continue
                res = self.call_value(mm, [obj, key], line)
                return res[0] if res else None
            if isinstance(obj, str):
                return self.string_lib.get(key) if self.string_lib else None
            if hasattr(obj, "lua_index"):
                return obj.lua_index(key)
            raise LuaError(
                self._pos(line) + f"attempt to index a {lua_type(obj)} value")
        raise LuaError(self._pos(line) + "'__index' chain too long; possible loop")

    def setindex(self, obj, key, value, line):
        if isinstance(obj, LuaTable):
            if obj.metatable is not None and obj.get(key) is None:
                mm = obj.metatable.get("__newindex")
                if mm is not None:
                    if isinstance(mm, LuaTable):
                        return self.setindex(mm, key, value, line)
                    self.call_value(mm, [obj, key, value], line)
                    return
            try:
                obj.set(key, value)
            except LuaError as err:
                raise LuaError(self._pos(line) + str(err.value)) from None
            return
        if hasattr(obj, "lua_newindex"):
            obj.lua_newindex(key, value)
            return
        raise LuaError(self._pos(line) + f"attempt to index a {lua_type(obj)} value")

    # -- calls --------------------------------------------------------------
    def call_value(self, f, args: list, line) -> list:
        self.current_line = line
        if isinstance(f, LuaFunction):
            scope = _Env(f.env)
            vars_ = scope.vars
            params = f.params
            na = len(args)
            for i, p in enumerate(params):
                vars_[p] = args[i] if i < na else None
            if f.is_vararg:
                vars_["..."] = args[len(params):]
            try:
                f.body(scope)  # the closure-compiled body (compiler.py)
            except _Return as r:
                return r.values
            return []
        if isinstance(f, LuaTable):
            if f.metatable is not None:
                mm = f.metatable.get("__call")
                if mm is not None:
                    return self.call_value(mm, [f] + args, line)
            raise LuaError(self._pos(line) + "attempt to call a table value")
        if callable(f):
            res = f(*args)
            # convention: a builtin returning a tuple yields that many
            # values (empty tuple = zero values, like print); a bare
            # None is ONE nil (like a failed tonumber/find)
            if isinstance(res, tuple):
                return list(res)
            return [res]
        raise LuaError(self._pos(line) + f"attempt to call a {lua_type(f)} value")

    # -- operators ------------------------------------------------------------
    def _concat(self, a, b, pos):
        def s(v):
            if isinstance(v, str):
                return v
            if isinstance(v, (int, float)) and not isinstance(v, bool):
                return fmt_number(v)
            return None

        sa, sb = s(a), s(b)
        if sa is not None and sb is not None:
            return sa + sb
        for v in (a, b):
            if isinstance(v, LuaTable) and v.metatable is not None:
                mm = v.metatable.get("__concat")
                if mm is not None:
                    res = self.call_value(mm, [a, b], self.current_line)
                    return res[0] if res else None
        bad = a if sa is None else b
        raise LuaError(pos + f"attempt to concatenate a {lua_type(bad)} value")

    def _eq(self, a, b, line):
        if lua_eq(a, b):
            return True
        if isinstance(a, LuaTable) and isinstance(b, LuaTable):
            for t in (a, b):
                if t.metatable is not None:
                    mm = t.metatable.get("__eq")
                    if mm is not None:
                        res = self.call_value(mm, [a, b], line)
                        return is_truthy(res[0] if res else None)
        return False

    def _compare(self, op, a, b, pos):
        num = (isinstance(a, (int, float)) and not isinstance(a, bool)
               and isinstance(b, (int, float)) and not isinstance(b, bool))
        if num or (isinstance(a, str) and isinstance(b, str)):
            if op == "<":
                return a < b
            if op == "<=":
                return a <= b
            if op == ">":
                return a > b
            return a >= b
        raise LuaError(pos + f"attempt to compare {lua_type(a)} with {lua_type(b)}")

# ======================================================================
# standard library
# ======================================================================

def install_stdlib(interp: Interpreter):
    g = interp.globals

    # ---- base --------------------------------------------------------
    def _print(*args):
        import sys

        sys.stderr.write("\t".join(interp.tostring(a) for a in args) + "\n")
        return ()

    def _error(msg=None, level=1):
        if isinstance(msg, str) and level and level > 0:
            msg = f"{interp.chunkname}:{interp.current_line}: {msg}"
        raise LuaError(msg)

    def _assert(v=None, msg=None, *rest):
        if not is_truthy(v):
            _error(msg if msg is not None else "assertion failed!", 0
                   if msg is not None else 1)
        return (v, msg, *rest)

    def _pcall(f=None, *args):
        try:
            return (True, *interp.call_value(f, list(args), interp.current_line))
        except LuaError as e:
            return (False, e.value)
        except (_Break, _Return):
            raise
        except RecursionError:
            return (False, "stack overflow")
        except Exception as e:  # host errors surface as messages, like mlua
            return (False, f"{type(e).__name__}: {e}")

    def _xpcall(f=None, handler=None, *args):
        res = _pcall(f, *args)
        if res[0] is False:
            h = interp.call_value(handler, [res[1]], interp.current_line)
            return (False, *h)
        return res

    def _next(t=None, key=None):
        if not isinstance(t, LuaTable):
            if hasattr(t, "lua_pairs"):
                items = t.lua_pairs()
            else:
                raise LuaError("bad argument #1 to 'next' (table expected)")
        else:
            items = list(t.hash.items())
        if key is None:
            if not items:
                return None
            k, v = items[0]
            return (_unwrap_key(k), v)
        wk = _wrap_key(key)
        for i, (k, _v) in enumerate(items):
            if k == wk:
                if i + 1 < len(items):
                    nk, nv = items[i + 1]
                    return (_unwrap_key(nk), nv)
                return None
        raise LuaError("invalid key to 'next'")

    def _pairs(t=None):
        if isinstance(t, LuaTable) or hasattr(t, "lua_pairs"):
            # stateful closure iterator: O(1) per step on the snapshot
            if isinstance(t, LuaTable):
                items = list(t.hash.items())
                snapshot = [(_unwrap_key(k), v) for k, v in items]
            else:
                snapshot = list(t.lua_pairs())
            it = iter(snapshot)

            def _iter(_s=None, _c=None):
                for k, v in it:
                    # deleted-during-iteration keys are skipped (next() rule)
                    if isinstance(t, LuaTable) and _wrap_key(k) not in t.hash:
                        continue
                    return (k, v)
                return None

            return (_iter, t, None)
        raise LuaError(f"bad argument #1 to 'pairs' (table expected, got {lua_type(t)})")

    def _ipairs(t=None):
        def _iter(tt, i):
            i = int(i) + 1
            v = interp.getindex(tt, i, interp.current_line)
            if v is None:
                return None
            return (i, v)

        return (_iter, t, 0)

    def _select(n=None, *args):
        if n == "#":
            return len(args)
        n = int(n)
        if n < 0:
            n = len(args) + n + 1
        if n < 1:
            raise LuaError("bad argument #1 to 'select' (index out of range)")
        return tuple(args[n - 1:])

    def _rawget(t=None, k=None):
        if not isinstance(t, LuaTable):
            raise LuaError("bad argument #1 to 'rawget' (table expected)")
        return t.get(k)

    def _rawset(t=None, k=None, v=None):
        if not isinstance(t, LuaTable):
            raise LuaError("bad argument #1 to 'rawset' (table expected)")
        t.set(k, v)
        return t

    def _rawequal(a=None, b=None):
        return lua_eq(a, b)

    def _rawlen(v=None):
        if isinstance(v, str):
            return len(v)
        if isinstance(v, LuaTable):
            return v.length()
        raise LuaError("table or string expected")

    def _setmetatable(t=None, mt=None):
        if not isinstance(t, LuaTable):
            raise LuaError("bad argument #1 to 'setmetatable' (table expected)")
        if mt is not None and not isinstance(mt, LuaTable):
            raise LuaError("bad argument #2 to 'setmetatable' (nil or table expected)")
        t.metatable = mt
        return t

    def _getmetatable(t=None):
        if isinstance(t, LuaTable) and t.metatable is not None:
            mt = t.metatable.get("__metatable")
            return mt if mt is not None else t.metatable
        return None

    def _require(name=None):
        if not isinstance(name, str):
            raise LuaError("bad argument #1 to 'require' (string expected)")
        if name in interp.modules:
            return interp.modules[name]
        import os

        rel = name.replace(".", os.sep) + ".lua"
        for d in interp.search_dirs:
            path = os.path.join(str(d), rel)
            if os.path.exists(path):
                with open(path, encoding="utf-8") as fh:
                    src = fh.read()
                res = interp.run(src, chunkname=name)
                mod = res[0] if res else True
                interp.modules[name] = mod
                return mod
        raise LuaError(f"module '{name}' not found")

    def _unpack(t=None, i=None, j=None):
        if not isinstance(t, LuaTable):
            raise LuaError("bad argument #1 to 'unpack' (table expected)")
        i = 1 if i is None else int(i)
        j = t.length() if j is None else int(j)
        return tuple(t.get(k) for k in range(i, j + 1))

    def _load(chunk=None, chunkname=None, _mode=None, _env=None):
        """load(string [, chunkname]) -> function | (nil, errmsg).
        Text chunks only (this runtime has no binary chunks); the
        optional env parameter is not supported (no _ENV)."""
        if not isinstance(chunk, str):
            return (None, "bad argument #1 to 'load' (string expected)")
        name = chunkname if isinstance(chunkname, str) else "=(load)"
        try:
            fn = interp.compile(chunk, name)
        except LuaSyntaxError as e:
            return (None, str(e))

        def chunk_fn(*_args):
            return tuple(fn())

        return chunk_fn

    base = {
        "print": _print, "type": lambda v=None: lua_type(v),
        "load": _load,
        "tostring": lambda v=None: interp.tostring(v),
        "tonumber": lua_tonumber,
        "pairs": _pairs, "ipairs": _ipairs, "next": _next,
        "select": _select, "error": _error, "assert": _assert,
        "pcall": _pcall, "xpcall": _xpcall,
        "rawget": _rawget, "rawset": _rawset, "rawequal": _rawequal,
        "rawlen": _rawlen, "setmetatable": _setmetatable,
        "getmetatable": _getmetatable, "require": _require,
        "unpack": _unpack, "_VERSION": "Lua 5.4",
    }
    for k, v in base.items():
        g.set(k, v)
    g.set("_G", g)

    # ---- string --------------------------------------------------------
    def _s_arg(v, fname):
        if isinstance(v, str):
            return v
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            return fmt_number(v)
        raise LuaError(f"bad argument #1 to '{fname}' (string expected, got {lua_type(v)})")

    def _str_sub(s=None, i=1, j=-1):
        s = _s_arg(s, "sub")
        n = len(s)
        i, j = int(i), int(j)
        if i < 0:
            i = max(n + i + 1, 1)
        elif i == 0:
            i = 1
        if j < 0:
            j = n + j + 1
        elif j > n:
            j = n
        if i > j:
            return ""
        return s[i - 1:j]

    def _str_byte(s=None, i=1, j=None):
        s = _s_arg(s, "byte")
        j = i if j is None else j
        part = _str_sub(s, i, j)
        return tuple(ord(c) for c in part)

    def _str_char(*args):
        return "".join(chr(int(a)) for a in args)

    def _str_rep(s=None, n=0, sep=None):
        s = _s_arg(s, "rep")
        n = int(n)
        if n <= 0:
            return ""
        if sep:
            return (_s_arg(sep, "rep")).join([s] * n)
        return s * n

    def _str_format(fmt=None, *args):
        fmt = _s_arg(fmt, "format")
        out = []
        ai = 0
        i = 0
        while i < len(fmt):
            c = fmt[i]
            if c != "%":
                out.append(c)
                i += 1
                continue
            j = i + 1
            while j < len(fmt) and fmt[j] in "-+ #0":
                j += 1
            while j < len(fmt) and fmt[j].isdigit():
                j += 1
            if j < len(fmt) and fmt[j] == ".":
                j += 1
                while j < len(fmt) and fmt[j].isdigit():
                    j += 1
            if j >= len(fmt):
                raise LuaError("invalid conversion to 'format'")
            conv = fmt[j]
            spec = fmt[i:j + 1]
            if conv == "%":
                out.append("%")
                i = j + 1
                continue
            arg = args[ai] if ai < len(args) else None
            ai += 1
            if conv in "di":
                n = lua_tonumber(arg)
                if n is None or (isinstance(n, float) and not n.is_integer()):
                    raise LuaError(f"bad argument #{ai} to 'format'")
                out.append((spec[:-1] + "d") % int(n))
            elif conv == "u":
                out.append((spec[:-1] + "d") % (int(lua_tonumber(arg)) & _INT_MASK))
            elif conv in "xXo":
                out.append(spec % (int(lua_tonumber(arg)) & _INT_MASK))
            elif conv == "c":
                out.append(chr(int(lua_tonumber(arg))))
            elif conv in "eEfgG":
                out.append(spec % float(lua_tonumber(arg)))
            elif conv == "s":
                out.append(spec % interp.tostring(arg))
            elif conv == "q":
                s = interp.tostring(arg)
                q = s.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n") \
                    .replace("\r", "\\r").replace("\0", "\\0")
                out.append(f'"{q}"')
            elif conv == "a" or conv == "A":
                out.append(float(lua_tonumber(arg)).hex())
            else:
                raise LuaError(f"invalid conversion '%{conv}' to 'format'")
            i = j + 1
        return "".join(out)

    def _wrap_pat(fn):
        def inner(*args):
            try:
                return fn(*args)
            except patterns.LuaPatternError as e:
                raise LuaError(str(e)) from None

        return inner

    @_wrap_pat
    def _str_find(s=None, pat=None, init=None, plain=None):
        r = patterns.str_find(_s_arg(s, "find"), _s_arg(pat, "find"),
                              init, is_truthy(plain))
        return r if r is not None else None

    @_wrap_pat
    def _str_match(s=None, pat=None, init=None):
        return patterns.str_match(_s_arg(s, "match"), _s_arg(pat, "match"), init)

    @_wrap_pat
    def _str_gmatch(s=None, pat=None):
        gen = patterns.gmatch_iter(_s_arg(s, "gmatch"), _s_arg(pat, "gmatch"))

        def _iter(*_a):
            for caps in gen:
                return caps if len(caps) > 1 else caps[0]
            return None

        return _iter

    @_wrap_pat
    def _str_gsub(s=None, pat=None, repl=None, n=None):
        s = _s_arg(s, "gsub")
        pat = _s_arg(pat, "gsub")
        if isinstance(repl, LuaTable):
            rf = repl.get
        elif isinstance(repl, LuaFunction) or callable(repl):
            def rf(*caps):
                res = interp.call_value(repl, list(caps), interp.current_line)
                return res[0] if res else None
        elif isinstance(repl, (int, float)) and not isinstance(repl, bool):
            rf = fmt_number(repl)
        elif isinstance(repl, str):
            rf = repl
        else:
            raise LuaError("bad argument #3 to 'gsub' (string/function/table expected)")
        res, cnt = patterns.gsub(s, pat, rf, int(n) if n is not None else None)
        return (res, cnt)

    string_lib = LuaTable([
        ("len", lambda s=None: len(_s_arg(s, "len"))),
        ("sub", _str_sub),
        ("upper", lambda s=None: _s_arg(s, "upper").upper()),
        ("lower", lambda s=None: _s_arg(s, "lower").lower()),
        ("rep", _str_rep),
        ("reverse", lambda s=None: _s_arg(s, "reverse")[::-1]),
        ("byte", _str_byte),
        ("char", _str_char),
        ("format", _str_format),
        ("find", _str_find),
        ("match", _str_match),
        ("gmatch", _str_gmatch),
        ("gsub", _str_gsub),
    ])
    g.set("string", string_lib)
    interp.string_lib = string_lib

    # ---- table -----------------------------------------------------------
    def _t_arg(v, fname):
        if not isinstance(v, LuaTable):
            raise LuaError(f"bad argument #1 to '{fname}' (table expected, got {lua_type(v)})")
        return v

    def _table_insert(t=None, a=None, b=None):
        t = _t_arg(t, "insert")
        n = t.length()
        if b is None:
            t.set(n + 1, a)
            return ()
        pos = int(a)
        if pos < 1 or pos > n + 1:
            raise LuaError("bad argument #2 to 'insert' (position out of bounds)")
        for k in range(n, pos - 1, -1):
            t.set(k + 1, t.get(k))
        t.set(pos, b)
        return ()

    def _table_remove(t=None, pos=None):
        t = _t_arg(t, "remove")
        n = t.length()
        if n == 0 and pos is None:
            return None
        pos = n if pos is None else int(pos)
        v = t.get(pos)
        for k in range(pos, n):
            t.set(k, t.get(k + 1))
        if n > 0:
            t.set(n, None)
        return v

    def _table_concat(t=None, sep="", i=1, j=None):
        t = _t_arg(t, "concat")
        sep = "" if sep is None else _s_arg(sep, "concat")
        j = t.length() if j is None else int(j)
        parts = []
        for k in range(int(i), j + 1):
            v = t.get(k)
            if isinstance(v, str):
                parts.append(v)
            elif isinstance(v, (int, float)) and not isinstance(v, bool):
                parts.append(fmt_number(v))
            else:
                raise LuaError(f"invalid value (at index {k}) in table for 'concat'")
        return sep.join(parts)

    def _table_sort(t=None, comp=None):
        t = _t_arg(t, "sort")
        n = t.length()
        arr = [t.get(k) for k in range(1, n + 1)]
        if comp is None:
            import functools

            def cmp(a, b):
                lt = interp._compare("<", a, b, "")
                if lt:
                    return -1
                return 1 if interp._compare("<", b, a, "") else 0

            arr.sort(key=functools.cmp_to_key(cmp))
        else:
            import functools

            def cmp2(a, b):
                r = interp.call_value(comp, [a, b], interp.current_line)
                if is_truthy(r[0] if r else None):
                    return -1
                r = interp.call_value(comp, [b, a], interp.current_line)
                return 1 if is_truthy(r[0] if r else None) else 0

            arr.sort(key=functools.cmp_to_key(cmp2))
        for k, v in enumerate(arr, 1):
            t.set(k, v)
        return ()

    def _table_pack(*args):
        t = LuaTable()
        for i, v in enumerate(args, 1):
            t.set(i, v)
        t.set("n", len(args))
        return t

    def _table_move(a1=None, f=None, e=None, t=None, a2=None):
        """table.move (Lua 5.4 §6.6): move a1[f..e] to a2[t..]; returns
        a2.  Handles the overlapping same-table case like memmove."""
        a1 = _t_arg(a1, "move")
        a2 = a1 if a2 is None else _t_arg(a2, "move")
        f, e, t = int(f), int(e), int(t)
        if e >= f:
            if t > f and a2 is a1:
                # overlapping forward move: copy back-to-front
                for i in range(e - f, -1, -1):
                    a2.set(t + i, a1.get(f + i))
            else:
                for i in range(0, e - f + 1):
                    a2.set(t + i, a1.get(f + i))
        return a2

    g.set("table", LuaTable([
        ("insert", _table_insert), ("remove", _table_remove),
        ("concat", _table_concat), ("sort", _table_sort),
        ("unpack", _unpack), ("pack", _table_pack),
        ("move", _table_move),
    ]))

    # ---- math ------------------------------------------------------------
    import random as _random

    rng = _random.Random(0x5eed)  # deterministic unless reseeded

    def _m_num(v, fname):
        n = lua_tonumber(v) if not isinstance(v, bool) else None
        if n is None:
            raise LuaError(f"bad argument #1 to '{fname}' (number expected, got {lua_type(v)})")
        return n

    def _math_floor(x=None):
        return int(math.floor(_m_num(x, "floor")))

    def _math_ceil(x=None):
        return int(math.ceil(_m_num(x, "ceil")))

    def _math_random(m=None, n=None):
        if m is None:
            return rng.random()
        m = int(m)
        if n is None:
            return rng.randint(1, m)
        return rng.randint(m, int(n))

    def _math_tointeger(x=None):
        if isinstance(x, bool):
            return None
        if isinstance(x, int):
            return x
        if isinstance(x, float) and x.is_integer():
            return int(x)
        if isinstance(x, str):
            n = lua_tonumber(x)
            if isinstance(n, int):
                return n
            if isinstance(n, float) and n.is_integer():
                return int(n)
        return None

    def _math_type(x=None):
        if isinstance(x, bool):
            return None
        if isinstance(x, int):
            return "integer"
        if isinstance(x, float):
            return "float"
        return None

    def _math_modf(x=None):
        x = float(_m_num(x, "modf"))
        frac, whole = math.modf(x)
        return (whole, frac)

    g.set("math", LuaTable([
        ("floor", _math_floor), ("ceil", _math_ceil),
        ("abs", lambda x=None: abs(_m_num(x, "abs"))),
        ("sqrt", lambda x=None: math.sqrt(float(_m_num(x, "sqrt")))),
        ("exp", lambda x=None: math.exp(float(_m_num(x, "exp")))),
        ("log", lambda x=None, b=None: math.log(float(_m_num(x, "log")))
            if b is None else math.log(float(_m_num(x, "log")), float(b))),
        ("sin", lambda x=None: math.sin(float(_m_num(x, "sin")))),
        ("cos", lambda x=None: math.cos(float(_m_num(x, "cos")))),
        ("tan", lambda x=None: math.tan(float(_m_num(x, "tan")))),
        ("max", lambda *a: max(_m_num(x, "max") for x in a)),
        ("min", lambda *a: min(_m_num(x, "min") for x in a)),
        ("fmod", lambda x=None, y=None: math.fmod(float(_m_num(x, "fmod")),
                                                  float(_m_num(y, "fmod")))),
        ("modf", _math_modf),
        ("random", _math_random),
        ("randomseed", lambda s=None: (rng.seed(int(s) if s is not None else 0), ())[1]),
        ("tointeger", _math_tointeger),
        ("type", _math_type),
        ("huge", math.inf),
        ("pi", math.pi),
        ("maxinteger", (1 << 63) - 1),
        ("mininteger", -(1 << 63)),
    ]))

    # ---- os ------------------------------------------------------------
    def _os_time(t=None):
        if t is None:
            return int(_time.time())
        if not isinstance(t, LuaTable):
            raise LuaError("bad argument #1 to 'time' (table expected)")
        import calendar
        import datetime as _dt

        def fld(name, default):
            v = t.get(name)
            return int(v) if v is not None else default

        # interpreted as UTC (deterministic across executors; the hosts
        # this runs on are TZ=UTC, where Lua's local-time mktime agrees)
        dt = _dt.datetime(
            fld("year", 1970), fld("month", 1), fld("day", 1),
            fld("hour", 12), fld("min", 0), fld("sec", 0))
        return int(calendar.timegm(dt.timetuple()))

    def _os_date(fmt=None, t=None):
        import datetime as _dt

        fmt = fmt if isinstance(fmt, str) else "%c"
        when = int(t) if t is not None else int(_time.time())
        utc = fmt.startswith("!")
        if utc:
            fmt = fmt[1:]
        dt = (_dt.datetime.fromtimestamp(when, _dt.timezone.utc).replace(tzinfo=None)
              if utc else _dt.datetime.fromtimestamp(when))
        if fmt.startswith("*t"):
            return LuaTable([
                ("year", dt.year), ("month", dt.month), ("day", dt.day),
                ("hour", dt.hour), ("min", dt.minute), ("sec", dt.second),
                ("wday", dt.isoweekday() % 7 + 1),
                ("yday", dt.timetuple().tm_yday), ("isdst", False),
            ])
        return dt.strftime(fmt)

    g.set("os", LuaTable([
        ("time", _os_time),
        ("date", _os_date),
        ("clock", lambda: _time.process_time()),
        ("getenv", lambda _n=None: None),  # sandboxed: no env access
    ]))

    # ---- utf8 ------------------------------------------------------------
    # (Lua 5.4 §6.5; note: this runtime's strings are Python str, i.e.
    # already decoded — byte positions in the utf8 lib are interpreted
    # over the UTF-8 encoding of the string, like real Lua)
    def _utf8_char(*args):
        return "".join(chr(int(a)) for a in args)

    def _utf8_codepoint(s=None, i=1, j=None):
        s = _s_arg(s, "codepoint")
        b = s.encode("utf-8")
        i = int(i)
        j = i if j is None else int(j)
        if i < 0:
            i = len(b) + i + 1
        if j < 0:
            j = len(b) + j + 1
        # map byte range back to characters
        out = []
        pos = 1
        for ch in s:
            w = len(ch.encode("utf-8"))
            if pos > j:
                break
            if pos >= i:
                if pos + w - 1 > j and pos < i:
                    raise LuaError("initial position is a continuation byte")
                out.append(ord(ch))
            pos += w
        return tuple(out)

    def _utf8_len(s=None, i=1, j=-1):
        s = _s_arg(s, "len")
        b = s.encode("utf-8")
        i, j = int(i), int(j)
        if i < 0:
            i = len(b) + i + 1
        if j < 0:
            j = len(b) + j + 1
        n = 0
        pos = 1
        for ch in s:
            w = len(ch.encode("utf-8"))
            if pos >= i and pos + w - 1 <= j:
                n += 1
            pos += w
        return n

    def _utf8_offset(s=None, n=None, i=None):
        s = _s_arg(s, "offset")
        n = int(n)
        # byte offset (1-based) where the n-th character starts
        offs = [1]
        for ch in s:
            offs.append(offs[-1] + len(ch.encode("utf-8")))
        if n >= 0:
            idx = (int(i) if i is not None else 1) - 1  # simplify: from start
            k = idx + n - 1 if n > 0 else idx
            return offs[k] if 0 <= k < len(offs) else None
        k = len(offs) - 1 + n
        return offs[k] if 0 <= k < len(offs) else None

    def _utf8_codes(s=None):
        """utf8.codes (Lua 5.4 §6.5): iterator over (byte_position,
        codepoint) pairs — the manual's canonical
        ``for p, c in utf8.codes(s)`` idiom."""
        s = _s_arg(s, "codes")
        # precompute (1-based byte offset, codepoint) per character
        pairs = []
        pos = 1
        for ch in s:
            pairs.append((pos, ord(ch)))
            pos += len(ch.encode("utf-8"))

        positions = [p for p, _ in pairs]

        def _iter(_s=None, ctrl=None):
            # stateless iterator protocol: ctrl is the previous byte
            # position (0 on the first call)
            prev = int(ctrl) if ctrl is not None else 0
            i = _bisect.bisect_right(positions, prev)
            return pairs[i] if i < len(positions) else None

        return (_iter, s, 0)

    g.set("utf8", LuaTable([
        ("char", _utf8_char),
        ("codepoint", _utf8_codepoint),
        ("codes", _utf8_codes),
        ("len", _utf8_len),
        ("offset", _utf8_offset),
        ("charpattern", "[\x00-\x7F\xC2-\xFD][\x80-\xBF]*"),
    ]))

    # ---- coroutine -------------------------------------------------------
    # (Lua 5.4 §2.6/§6.2; mlua's StdLib::ALL_SAFE includes coroutine.)
    # Each coroutine runs on its own daemon thread with a strict
    # resume/yield handshake — exactly one side runs at any moment, so
    # the interpreter state needs no locking.  A suspended coroutine's
    # thread blocks on _to_co.get(); to reclaim it, coroutine.close (Lua
    # 5.4 §6.2) and interp.close_coroutines() deliver a kill sentinel
    # that raises _CoroutineKilled inside the coroutine, unwinding its
    # stack (running any pending error paths) and letting the thread
    # exit — so abandoned coroutines no longer leak one OS thread each
    # in long-lived executors.
    import queue as _queue
    import threading as _threading
    import weakref as _weakref

    _KILL = object()  # sentinel delivered on close

    class _CoroutineKilled(BaseException):
        pass

    class _Coroutine:
        __slots__ = ("fn", "status", "_to_co", "_from_co", "_thread",
                     "__weakref__")

        def __init__(self, fn):
            self.fn = fn
            self.status = "suspended"
            self._to_co = _queue.Queue(1)
            self._from_co = _queue.Queue(1)
            self._thread = None

        def __repr__(self):  # pragma: no cover - debug aid
            return f"thread: 0x{id(self):012x}"

    _co_stack = _threading.local()  # per-OS-thread stack of running coroutines
    # weak registry of every coroutine this interpreter created: a live
    # thread pins its coroutine (it is the _co_body argument), and once
    # the thread exits the weakref lets the object be collected
    interp._live_coroutines = []

    def _co_current():
        return getattr(_co_stack, "stack", None) or []

    def _co_body(co):
        # the body runs on the coroutine's OWN thread: its thread-local
        # stack is exactly [co] (a nested coroutine gets its own thread)
        _co_stack.stack = [co]
        args = co._to_co.get()
        if args is _KILL:
            co.status = "dead"
            return
        try:
            res = interp.call_value(co.fn, list(args), interp.current_line)
            co._from_co.put(("return", res))
        except _CoroutineKilled:
            co.status = "dead"
            try:  # unblock a resumer, should one be waiting
                co._from_co.put_nowait(("error", "coroutine closed"))
            except _queue.Full:
                pass
        except LuaError as e:
            co._from_co.put(("error", e.value))
        except BaseException as e:  # host errors surface as messages
            co._from_co.put(("error", f"{type(e).__name__}: {e}"))

    def _co_create(fn=None):
        if not (isinstance(fn, LuaFunction) or callable(fn)):
            raise LuaError("bad argument #1 to 'create' (function expected)")
        co = _Coroutine(fn)
        interp._live_coroutines.append(_weakref.ref(co))
        return co

    def _co_resume(co=None, *args):
        if not isinstance(co, _Coroutine):
            raise LuaError("bad argument #1 to 'resume' (coroutine expected)")
        if co.status == "dead":
            return (False, "cannot resume dead coroutine")
        if co.status == "running":
            return (False, "cannot resume non-suspended coroutine")
        caller = _co_current()
        if caller:
            caller[-1].status = "normal"
        co.status = "running"
        if co._thread is None:
            co._thread = _threading.Thread(
                target=_co_body, args=(co,), daemon=True)
            co._thread.start()
        co._to_co.put(args)
        kind, vals = co._from_co.get()
        if caller:
            caller[-1].status = "running"
        if kind == "yield":
            co.status = "suspended"
            return (True, *vals)
        co.status = "dead"
        if kind == "return":
            return (True, *vals)
        return (False, vals)

    def _co_yield(*args):
        stack = _co_current()
        if not stack:
            raise LuaError("attempt to yield from outside a coroutine")
        co = stack[-1]
        co._from_co.put(("yield", list(args)))
        got = co._to_co.get()
        if got is _KILL:
            raise _CoroutineKilled()
        return tuple(got)

    def _co_status(co=None):
        if not isinstance(co, _Coroutine):
            raise LuaError("bad argument #1 to 'status' (coroutine expected)")
        return co.status

    def _co_wrap(fn=None):
        co = _co_create(fn)

        def wrapped(*args):
            res = _co_resume(co, *args)
            if res[0] is False:
                raise LuaError(res[1])
            return tuple(res[1:])

        return wrapped

    def _co_close(co=None):
        """coroutine.close (Lua 5.4 §6.2): close a dead or suspended
        coroutine, releasing its thread; errors on running/normal."""
        if not isinstance(co, _Coroutine):
            raise LuaError("bad argument #1 to 'close' (coroutine expected)")
        if co.status == "dead":
            return True
        if co.status != "suspended":
            raise LuaError(
                f"cannot close a {co.status} coroutine")
        co.status = "dead"
        if co._thread is not None and co._thread.is_alive():
            co._to_co.put(_KILL)
            co._thread.join(timeout=5.0)
        co._thread = None
        return True

    def _close_all_coroutines():
        """Release every suspended coroutine's thread (interpreter
        teardown hook — called by the lua transform when a partition's
        interpreter is done)."""
        for ref in interp._live_coroutines:
            co = ref()
            if co is not None and co.status == "suspended":
                _co_close(co)
        interp._live_coroutines = []

    interp.close_coroutines = _close_all_coroutines

    def _co_isyieldable():
        return bool(_co_current())

    def _co_running():
        stack = _co_current()
        if stack:
            return (stack[-1], False)
        return (None, True)

    g.set("coroutine", LuaTable([
        ("create", _co_create),
        ("resume", _co_resume),
        ("yield", _co_yield),
        ("status", _co_status),
        ("wrap", _co_wrap),
        ("close", _co_close),
        ("isyieldable", _co_isyieldable),
        ("running", _co_running),
    ]))
