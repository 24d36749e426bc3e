"""Closure compiler for the Lua-subset runtime.

The first-cut evaluator walked the AST per node (tag dispatch on every
visit).  This pass compiles each AST node ONCE into a Python closure —
statements become ``fn(env) -> None``, expressions ``fn(env) -> value``
— so the per-event hot loop runs straight-line closure calls with the
common int/float arithmetic fast-pathed inline.  Function bodies are
compiled at compile time; creating a closure at runtime just pairs the
precompiled body with its defining environment.

Same semantics as interp.py documents (Lua 5.4 reference manual);
measured ~2-3x on the lua transform's per-event hook.
"""

from __future__ import annotations

import math

from .interp import (
    LuaError,
    LuaFunction,
    LuaTable,
    _arith_num,
    _Break,
    _Env,
    _Return,
    _toint,
    _wrap_int,
    is_truthy,
    lua_type,
)

# ---------------------------------------------------------------------
# value-level arithmetic (slow paths; compiler inlines int/int + float
# fast paths around these)
# ---------------------------------------------------------------------


def v_add(a, b, pos):
    x, y = _arith_num(a, "add", pos), _arith_num(b, "add", pos)
    r = x + y
    return _wrap_int(r) if isinstance(x, int) and isinstance(y, int) else r


def v_sub(a, b, pos):
    x, y = _arith_num(a, "sub", pos), _arith_num(b, "sub", pos)
    r = x - y
    return _wrap_int(r) if isinstance(x, int) and isinstance(y, int) else r


def v_mul(a, b, pos):
    x, y = _arith_num(a, "mul", pos), _arith_num(b, "mul", pos)
    r = x * y
    return _wrap_int(r) if isinstance(x, int) and isinstance(y, int) else r


def v_div(a, b, pos):
    x, y = _arith_num(a, "div", pos), _arith_num(b, "div", pos)
    x, y = float(x), float(y)
    if y == 0.0:
        if x == 0.0:
            return math.nan
        return math.copysign(math.inf, x) * math.copysign(1.0, y)
    return x / y


def v_idiv(a, b, pos):
    x, y = _arith_num(a, "idiv", pos), _arith_num(b, "idiv", pos)
    if isinstance(x, int) and isinstance(y, int):
        if y == 0:
            raise LuaError(pos + "attempt to perform 'n//0'")
        return _wrap_int(x // y)
    x, y = float(x), float(y)
    if y == 0.0:
        return math.copysign(math.inf, x) * math.copysign(1.0, y) \
            if x != 0.0 else math.nan
    return float(math.floor(x / y))


def v_mod(a, b, pos):
    x, y = _arith_num(a, "mod", pos), _arith_num(b, "mod", pos)
    if isinstance(x, int) and isinstance(y, int):
        if y == 0:
            raise LuaError(pos + "attempt to perform 'n%%0'")
        return _wrap_int(x - (x // y) * y)
    x, y = float(x), float(y)
    if y == 0.0 or math.isinf(y):
        return math.fmod(x, y) if y != 0.0 else math.nan
    r = math.fmod(x, y)
    if r != 0.0 and (r < 0.0) != (y < 0.0):
        r += y
    return r


def v_pow(a, b, pos):
    x, y = _arith_num(a, "pow", pos), _arith_num(b, "pow", pos)
    try:
        return float(x) ** float(y)
    except OverflowError:
        return math.inf


def v_unm(v, pos):
    n = _arith_num(v, "unm", pos)
    return _wrap_int(-n) if isinstance(n, int) else -n


def v_shl(x, y):
    if y < 0:
        return v_shr(x, -y)
    return _wrap_int(x << y) if y < 64 else 0


def v_shr(x, y):
    if y < 0:
        return v_shl(x, -y)
    return (x & ((1 << 64) - 1)) >> y if y < 64 else 0


class Compiler:
    """Compiles blocks/expressions into closures bound to one
    Interpreter (for globals, metamethod dispatch, error positions)."""

    def __init__(self, interp):
        self.I = interp

    def pos(self, line) -> str:
        return f"{self.I.chunkname}:{line}: "

    # -- chunks ----------------------------------------------------------
    def chunk(self, block):
        body = self.block(block)

        def run(env=None):
            try:
                body(env if env is not None else _Env())
            except _Return as r:
                return r.values
            except RecursionError:
                raise LuaError("stack overflow") from None
            return []

        return run

    # -- statements ----------------------------------------------------
    def block(self, stmts):
        fns = [self.stmt(s) for s in stmts]
        if not fns:
            return lambda env: None
        if len(fns) == 1:
            return fns[0]

        def run(env, fns=tuple(fns)):
            for f in fns:
                f(env)

        return run

    def stmt(self, st):
        I = self.I
        tag = st[0]
        if tag == "callstat":
            f = self.multi(st[1])
            return lambda env: f(env) and None
        if tag == "local":
            _, names, exprs = st
            vf = self.exprlist(exprs)
            if len(names) == 1:
                n = names[0]

                def run1(env):
                    vals = vf(env)
                    env.vars[n] = vals[0] if vals else None

                return run1

            def runN(env, names=tuple(names)):
                vals = vf(env)
                nv = len(vals)
                for i, n in enumerate(names):
                    env.vars[n] = vals[i] if i < nv else None

            return runN
        if tag == "assign":
            _, targets, exprs, line = st
            vf = self.exprlist(exprs)
            setters = [self.target(t, line) for t in targets]
            if len(setters) == 1:
                s0 = setters[0]

                def run1(env):
                    vals = vf(env)
                    s0(env, vals[0] if vals else None)

                return run1

            def runN(env, setters=tuple(setters)):
                vals = vf(env)
                nv = len(vals)
                for i, s in enumerate(setters):
                    s(env, vals[i] if i < nv else None)

            return runN
        if tag == "if":
            _, arms, else_block = st
            carms = [(self.expr(c), self.block(b)) for c, b in arms]
            celse = self.block(else_block) if else_block is not None else None

            def run(env, carms=tuple(carms), celse=celse):
                for cf, bf in carms:
                    v = cf(env)
                    if v is not None and v is not False:
                        bf(_Env(env))
                        return
                if celse is not None:
                    celse(_Env(env))

            return run
        if tag == "while":
            _, cond, body = st
            cf = self.expr(cond)
            bf = self.block(body)

            def run(env):
                while True:
                    v = cf(env)
                    if v is None or v is False:
                        return
                    try:
                        bf(_Env(env))
                    except _Break:
                        return

            return run
        if tag == "repeat":
            _, body, cond = st
            bf = self.block(body)
            cf = self.expr(cond)

            def run(env):
                while True:
                    scope = _Env(env)
                    try:
                        bf(scope)
                    except _Break:
                        return
                    v = cf(scope)  # until-cond sees body locals
                    if v is not None and v is not False:
                        return

            return run
        if tag == "fornum":
            return self._fornum(st)
        if tag == "forin":
            return self._forin(st)
        if tag == "do":
            bf = self.block(st[1])
            return lambda env: bf(_Env(env))
        if tag == "return":
            _, exprs, _line = st
            vf = self.exprlist(exprs)

            def run(env):
                raise _Return(vf(env))

            return run
        if tag == "break":
            def run(env):
                raise _Break()

            return run
        if tag == "localfunc":
            _, name, funcexpr = st
            ff = self.expr(funcexpr)

            def run(env):
                env.vars[name] = None  # visible to its own body
                env.vars[name] = ff(env)

            return run
        raise LuaError(f"unknown statement {tag}")  # pragma: no cover

    def target(self, t, line):
        """Compile an assignment target to fn(env, value)."""
        I = self.I
        if t[0] == "name":
            n = t[1]
            g = I.globals

            def set_name(env, v, n=n, g=g):
                e = env.lookup(n)
                if e is not None:
                    e.vars[n] = v
                else:
                    g.set(n, v)

            return set_name
        _, objx, keyx, tline = t
        of = self.expr(objx)
        kf = self.expr(keyx)

        def set_index(env, v):
            I.setindex(of(env), kf(env), v, tline)

        return set_index

    def _fornum(self, st):
        I = self.I
        _, name, e1, e2, e3, body, line = st
        pos = self.pos(line)
        f1, f2 = self.expr(e1), self.expr(e2)
        f3 = self.expr(e3) if e3 is not None else None
        bf = self.block(body)

        def run(env):
            start = _arith_num(f1(env), "for", pos)
            stop = _arith_num(f2(env), "for", pos)
            step = _arith_num(f3(env), "for", pos) if f3 is not None else 1
            if step == 0:
                raise LuaError(pos + "'for' step is zero")
            if isinstance(start, float) or isinstance(stop, float) \
                    or isinstance(step, float):
                start, stop, step = float(start), float(stop), float(step)
            i = start
            while (step > 0 and i <= stop) or (step < 0 and i >= stop):
                scope = _Env(env)
                scope.vars[name] = i
                try:
                    bf(scope)
                except _Break:
                    return
                i += step

        return run

    def _forin(self, st):
        I = self.I
        _, names, exprs, body, line = st
        vf = self.exprlist(exprs)
        bf = self.block(body)
        names = tuple(names)

        def run(env):
            vals = vf(env)
            f = vals[0] if vals else None
            s = vals[1] if len(vals) > 1 else None
            ctrl = vals[2] if len(vals) > 2 else None
            call = I.call_value
            while True:
                res = call(f, [s, ctrl], line)
                if not res or res[0] is None:
                    return
                ctrl = res[0]
                scope = _Env(env)
                nv = len(res)
                for i, n in enumerate(names):
                    scope.vars[n] = res[i] if i < nv else None
                try:
                    bf(scope)
                except _Break:
                    return

        return run

    # -- expressions ------------------------------------------------------
    def exprlist(self, exprs):
        """fn(env) -> list with Lua's tail-expansion rule."""
        if not exprs:
            return lambda env: []
        if len(exprs) == 1:
            return self.multi(exprs[0])
        heads = [self.expr(e) for e in exprs[:-1]]
        tail = self.multi(exprs[-1])

        def run(env, heads=tuple(heads), tail=tail):
            vals = [h(env) for h in heads]
            vals.extend(tail(env))
            return vals

        return run

    def multi(self, e):
        """fn(env) -> list (calls/varargs expand; everything else is 1)."""
        I = self.I
        tag = e[0]
        if tag == "call":
            ff = self.expr(e[1])
            af = self.exprlist(e[2])
            line = e[3]
            call = I.call_value
            return lambda env: call(ff(env), af(env), line)
        if tag == "method":
            of = self.expr(e[1])
            name = e[2]
            af = self.exprlist(e[3])
            line = e[4]
            call = I.call_value
            getindex = I.getindex

            def run(env):
                obj = of(env)
                f = getindex(obj, name, line)
                return call(f, [obj] + af(env), line)

            return run
        if tag == "vararg":
            def run(env):
                scope = env.lookup("...")
                return list(scope.vars["..."]) if scope else []

            return run
        sf = self.expr(e)
        return lambda env: [sf(env)]

    def expr(self, e):
        I = self.I
        tag = e[0]
        if tag == "num" or tag == "str":
            v = e[1]
            return lambda env: v
        if tag == "name":
            n = e[1]
            g = I.globals
            ghash = g.hash

            def run(env, n=n, ghash=ghash):
                scope = env
                while scope is not None:
                    if n in scope.vars:
                        return scope.vars[n]
                    scope = scope.parent
                return ghash.get(n)

            return run
        if tag == "nil":
            return lambda env: None
        if tag == "true":
            return lambda env: True
        if tag == "false":
            return lambda env: False
        if tag == "index":
            of = self.expr(e[1])
            line = e[3]
            getindex = I.getindex
            if e[2][0] == "str":  # constant key: a.b / a["b"]
                key = e[2][1]

                def run_const(env):
                    obj = of(env)
                    # inline the plain-table hit (the hot path)
                    if type(obj) is LuaTable:
                        v = obj.hash.get(key)
                        if v is not None or obj.metatable is None:
                            return v
                    return getindex(obj, key, line)

                return run_const
            kf = self.expr(e[2])

            def run(env):
                return getindex(of(env), kf(env), line)

            return run
        if tag == "binop":
            return self.binop(e)
        if tag == "and":
            lf = self.expr(e[1])
            rf = self.expr(e[2])

            def run(env):
                v = lf(env)
                return rf(env) if (v is not None and v is not False) else v

            return run
        if tag == "or":
            lf = self.expr(e[1])
            rf = self.expr(e[2])

            def run(env):
                v = lf(env)
                return v if (v is not None and v is not False) else rf(env)

            return run
        if tag == "unop":
            return self.unop(e)
        if tag in ("call", "method", "vararg"):
            mf = self.multi(e)

            def run(env):
                res = mf(env)
                return res[0] if res else None

            return run
        if tag == "paren":
            return self.expr(e[1])
        if tag == "func":
            _, params, is_vararg, body, name = e
            body_fn = self.block(body)  # compiled ONCE, here
            params = tuple(params)

            def run(env):
                return LuaFunction(params, is_vararg, body_fn, env, name, I)

            return run
        if tag == "table":
            return self.table(e)
        raise LuaError(f"unknown expression {tag}")  # pragma: no cover

    def table(self, e):
        _, fields, line = e
        pos = self.pos(line)
        pairs = []   # (kf, vf)
        items = []   # vf for array part, except a trailing multi
        tail = None  # trailing multi fn
        for i, f in enumerate(fields):
            if f[0] == "pair":
                pairs.append((self.expr(f[1]), self.expr(f[2])))
            elif f is fields[-1]:
                tail = self.multi(f[1])
            else:
                items.append(self.expr(f[1]))
        pairs = tuple(pairs)
        items = tuple(items)

        def run(env):
            t = LuaTable()
            arr = 1
            for vf in items:
                t.set(arr, vf(env))
                arr += 1
            if tail is not None:
                for v in tail(env):
                    t.set(arr, v)
                    arr += 1
            for kf, vf in pairs:
                k = kf(env)
                if k is None:
                    raise LuaError(pos + "table index is nil")
                t.set(k, vf(env))
            return t

        return run

    def binop(self, e):
        I = self.I
        _, op, le, re_, line = e
        pos = self.pos(line)
        lf = self.expr(le)
        rf = self.expr(re_)

        if op == "+":
            def run(env):
                a = lf(env)
                b = rf(env)
                ta, tb = type(a), type(b)
                if ta is int and tb is int:
                    r = a + b
                    return r if -9223372036854775808 <= r <= 9223372036854775807 \
                        else _wrap_int(r)
                if ta is float and tb is float:
                    return a + b
                if (ta is float and tb is int) or (ta is int and tb is float):
                    return a + b
                return v_add(a, b, pos)

            return run
        if op == "-":
            def run(env):
                a = lf(env)
                b = rf(env)
                ta, tb = type(a), type(b)
                if ta is int and tb is int:
                    r = a - b
                    return r if -9223372036854775808 <= r <= 9223372036854775807 \
                        else _wrap_int(r)
                if ta is float or tb is float:
                    if (ta is float or ta is int) and (tb is float or tb is int):
                        return a - b
                return v_sub(a, b, pos)

            return run
        if op == "*":
            def run(env):
                a = lf(env)
                b = rf(env)
                ta, tb = type(a), type(b)
                if ta is int and tb is int:
                    r = a * b
                    return r if -9223372036854775808 <= r <= 9223372036854775807 \
                        else _wrap_int(r)
                if ta is float or tb is float:
                    if (ta is float or ta is int) and (tb is float or tb is int):
                        return a * b
                return v_mul(a, b, pos)

            return run
        if op == "/":
            return lambda env: v_div(lf(env), rf(env), pos)
        if op == "//":
            return lambda env: v_idiv(lf(env), rf(env), pos)
        if op == "%":
            def run(env):
                a = lf(env)
                b = rf(env)
                if type(a) is int and type(b) is int and b > 0:
                    return a % b
                return v_mod(a, b, pos)

            return run
        if op == "^":
            return lambda env: v_pow(lf(env), rf(env), pos)
        if op == "..":
            concat = I._concat

            def run(env):
                a = lf(env)
                b = rf(env)
                if type(a) is str and type(b) is str:
                    return a + b
                return concat(a, b, pos)

            return run
        if op == "==":
            eq = I._eq
            return lambda env: eq(lf(env), rf(env), line)
        if op == "~=":
            eq = I._eq
            return lambda env: not eq(lf(env), rf(env), line)
        if op in ("<", "<=", ">", ">="):
            cmpf = I._compare

            def run(env, op=op):
                a = lf(env)
                b = rf(env)
                ta, tb = type(a), type(b)
                if (ta is int or ta is float) and (tb is int or tb is float):
                    if op == "<":
                        return a < b
                    if op == "<=":
                        return a <= b
                    if op == ">":
                        return a > b
                    return a >= b
                return cmpf(op, a, b, pos)

            return run
        # bitwise
        if op == "&":
            return lambda env: _wrap_int(
                _toint(lf(env), op, pos) & _toint(rf(env), op, pos))
        if op == "|":
            return lambda env: _wrap_int(
                _toint(lf(env), op, pos) | _toint(rf(env), op, pos))
        if op == "~":
            return lambda env: _wrap_int(
                _toint(lf(env), op, pos) ^ _toint(rf(env), op, pos))
        if op == "<<":
            return lambda env: v_shl(
                _toint(lf(env), op, pos), _toint(rf(env), op, pos))
        if op == ">>":
            return lambda env: v_shr(
                _toint(lf(env), op, pos), _toint(rf(env), op, pos))
        raise LuaError(pos + f"unknown operator {op}")  # pragma: no cover

    def unop(self, e):
        I = self.I
        _, op, ex, line = e
        pos = self.pos(line)
        vf = self.expr(ex)
        if op == "not":
            def run(env):
                v = vf(env)
                return v is None or v is False

            return run
        if op == "-":
            def run(env):
                v = vf(env)
                t = type(v)
                if t is int:
                    return _wrap_int(-v)
                if t is float:
                    return -v
                return v_unm(v, pos)

            return run
        if op == "#":
            call = I.call_value

            def run(env):
                v = vf(env)
                if type(v) is str:
                    return len(v)
                if type(v) is LuaTable:
                    if v.metatable is not None:
                        mm = v.metatable.get("__len")
                        if mm is not None:
                            res = call(mm, [v], line)
                            return res[0] if res else None
                    return v.length()
                if isinstance(v, str):
                    return len(v)
                if hasattr(v, "lua_len"):
                    return v.lua_len()
                raise LuaError(
                    pos + f"attempt to get length of a {lua_type(v)} value")

            return run
        if op == "~":
            return lambda env: _wrap_int(~_toint(vf(env), "bnot", pos))
        raise LuaError(pos + f"unknown operator {op}")  # pragma: no cover
