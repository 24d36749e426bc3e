"""A VRL *program* compiler for the remap statement subset the
reference's regression configs use (reference: the `remap` transform,
src/transforms/remap.rs, runs full VRL; this module compiles the
statement forms found in regression/cases/*/vector/vector.toml —
datadog_agent_remap_* most prominently — to Spark Column expressions,
so the whole program stays inside whole-stage codegen with zero
per-row Python).

Supported statements::

    .path = expr                      # assignment (sequential scope)
    .target, .err = expr              # error-capturing assignment
    if expr { ... } else if expr { ... } else { ... }

Supported expressions: string/number/bool literals, field paths
(``.a.b`` — nested reads resolve through struct columns), string
concatenation with ``+``, equality comparisons ``==``/``!=``, object
literals ``{ "k": expr, ... }`` (compile to structs), and the
single-argument VRL functions upcase/downcase/string/length/strlen.

Semantics kept from VRL:

* statements execute sequentially — later expressions see earlier
  assignments (``.hostname = "vector"; upcase(.hostname)`` is
  ``"VECTOR"``);
* an ``if`` branch's assignments apply only to rows matching the
  branch condition; fields assigned in SOME branch read NULL for rows
  that took another branch which did not assign them;
* ``.target, .err = a + b``: string concat is fallible when an operand
  is null/absent — on failure ``target`` is NULL and ``err`` carries
  an error string, on success ``err`` is NULL (VRL's error-assignment
  contract).

Anything outside the subset raises ``VrlCompileError`` at compile time
(mirroring VRL's compile-time rejection), never silently misruns.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class VrlCompileError(ValueError):
    pass


# ---------------------------------------------------------------------------
# tokenizer

_TOKEN = re.compile(
    r"""
    (?P<ws>\s+|\#[^\n]*)
  | (?P<str>"(?:[^"\\]|\\.)*")
  | (?P<num>\d+(?:\.\d+)?)
  | (?P<path>\.[A-Za-z_][\w]*(?:\.[A-Za-z_]\w*)*)
  | (?P<ident>[A-Za-z_]\w*)
  | (?P<op>==|!=|[=+,{}():])
    """,
    re.X,
)


def _tokenize(src: str) -> list[tuple[str, str]]:
    out = []
    pos = 0
    while pos < len(src):
        m = _TOKEN.match(src, pos)
        if m is None:
            raise VrlCompileError(f"unexpected character {src[pos]!r} at {pos}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        out.append((kind, m.group()))
    out.append(("eof", ""))
    return out


# ---------------------------------------------------------------------------
# AST

@dataclass
class Lit:
    value: object


@dataclass
class Path:
    parts: tuple


@dataclass
class Concat:
    items: list  # 2+ operands of '+'


@dataclass
class Cmp:
    op: str
    left: object
    right: object


@dataclass
class Call:
    fn: str
    arg: object


@dataclass
class Obj:
    fields: list  # (name, expr)


@dataclass
class Assign:
    target: tuple          # path parts
    err_target: tuple | None
    expr: object


@dataclass
class If:
    branches: list         # (cond_expr, [stmt]); cond None = else


class _Parser:
    def __init__(self, tokens):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, val):
        k, v = self.next()
        if v != val:
            raise VrlCompileError(f"expected {val!r}, got {v!r}")

    def program(self):
        stmts = []
        while self.peek()[0] != "eof":
            stmts.append(self.statement())
        return stmts

    def statement(self):
        k, v = self.peek()
        if k == "ident" and v == "if":
            return self.if_stmt()
        if k != "path":
            raise VrlCompileError(f"expected statement, got {v!r}")
        target = tuple(self.next()[1][1:].split("."))
        err_target = None
        if self.peek()[1] == ",":
            self.next()
            k2, v2 = self.next()
            if k2 != "path":
                raise VrlCompileError("second assignment target must be a path")
            err_target = tuple(v2[1:].split("."))
        self.expect("=")
        return Assign(target, err_target, self.expr())

    def if_stmt(self):
        branches = []
        self.next()  # 'if'
        branches.append((self.expr(), self.block()))
        while self.peek()[1] == "else":
            self.next()
            if self.peek()[1] == "if":
                self.next()
                branches.append((self.expr(), self.block()))
            else:
                branches.append((None, self.block()))
                break
        return If(branches)

    def block(self):
        self.expect("{")
        stmts = []
        while self.peek()[1] != "}":
            stmts.append(self.statement())
        self.expect("}")
        return stmts

    # expr := add (('=='|'!=') add)?
    def expr(self):
        left = self.add()
        if self.peek()[1] in ("==", "!="):
            op = self.next()[1]
            return Cmp(op, left, self.add())
        return left

    def add(self):
        items = [self.primary()]
        while self.peek()[1] == "+":
            self.next()
            items.append(self.primary())
        return items[0] if len(items) == 1 else Concat(items)

    def primary(self):
        k, v = self.next()
        if k == "str":
            return Lit(v[1:-1].replace('\\"', '"').replace("\\\\", "\\"))
        if k == "num":
            return Lit(float(v) if "." in v else int(v))
        if k == "path":
            return Path(tuple(v[1:].split(".")))
        if k == "ident":
            if v in ("true", "false"):
                return Lit(v == "true")
            if v == "null":
                return Lit(None)
            if self.peek()[1] == "(":
                self.next()
                arg = self.expr()
                self.expect(")")
                return Call(v, arg)
            raise VrlCompileError(f"unknown identifier {v!r}")
        if v == "{":
            fields = []
            while True:
                ks, kv = self.next()
                if ks != "str":
                    raise VrlCompileError("object keys must be string literals")
                self.expect(":")
                fields.append((kv[1:-1], self.expr()))
                nk, nv = self.next()
                if nv == "}":
                    break
                if nv != ",":
                    raise VrlCompileError(f"expected , or }} in object, got {nv!r}")
            return Obj(fields)
        if v == "(":
            e = self.expr()
            self.expect(")")
            return e
        raise VrlCompileError(f"unexpected token {v!r}")


# ---------------------------------------------------------------------------
# compiler: AST -> Column environment

_FUNCS = {
    "upcase": F.upper,
    "downcase": F.lower,
    "string": lambda c: c.cast("string"),
    "length": F.length,
    "strlen": F.length,
}


class _Env:
    """Sequential field scope: dotted paths -> Columns."""

    def __init__(self, df: DataFrame):
        self.cols: dict[tuple, Column] = {
            (name,): F.col(f"`{name}`") for name in df.columns
        }
        self.order: list[tuple] = [(name,) for name in df.columns]
        self.known_strings: set[tuple] = set()

    def get(self, parts: tuple) -> Column:
        if parts in self.cols:
            return self.cols[parts]
        # nested read through a struct column assigned or present
        for cut in range(len(parts) - 1, 0, -1):
            head, rest = parts[:cut], parts[cut:]
            if head in self.cols:
                c = self.cols[head]
                for p in rest:
                    c = c.getField(p)
                return c
        raise VrlCompileError(f"unknown field .{'.'.join(parts)}")

    def set(self, parts: tuple, col: Column) -> None:
        if len(parts) != 1:
            raise VrlCompileError(
                f"nested assignment target .{'.'.join(parts)} not supported")
        if parts not in self.cols:
            self.order.append(parts)
        self.cols[parts] = col


def _is_known_string(e, env: "_Env") -> bool:
    """Conservative VRL-style type inference: True when the expression
    is statically a non-null string (string literal, upcase/downcase/
    string() of a known string, concat of known strings, or a field
    previously ASSIGNED such an expression) — exactly the cases real
    VRL treats string concatenation over as infallible."""
    if isinstance(e, Lit):
        return isinstance(e.value, str)
    if isinstance(e, Path):
        return e.parts in env.known_strings
    if isinstance(e, Call):
        return e.fn in ("upcase", "downcase", "string") and _is_known_string(e.arg, env)
    if isinstance(e, Concat):
        return all(_is_known_string(x, env) for x in e.items)
    return False


def _compile_expr(e, env: _Env) -> tuple[Column, Column | None]:
    """-> (value, fallible_error) — error is None for infallible exprs."""
    if isinstance(e, Lit):
        return F.lit(e.value), None
    if isinstance(e, Path):
        return env.get(e.parts), None
    if isinstance(e, Call):
        fn = _FUNCS.get(e.fn)
        if fn is None:
            raise VrlCompileError(f"unsupported function {e.fn!r}")
        v, err = _compile_expr(e.arg, env)
        return fn(v), err
    if isinstance(e, Cmp):
        lv, _ = _compile_expr(e.left, env)
        rv, _ = _compile_expr(e.right, env)
        c = lv.eqNullSafe(rv)
        return (c if e.op == "==" else ~c), None
    if isinstance(e, Obj):
        cols = []
        for name, sub in e.fields:
            v, _ = _compile_expr(sub, env)
            cols.append(v.alias(name))
        return F.struct(*cols), None
    if isinstance(e, Concat):
        vals = [_compile_expr(x, env)[0].cast("string") for x in e.items]
        if _is_known_string(e, env):  # statically all-string: infallible
            return F.concat(*vals), None
        any_null = None
        for v in vals:
            n = v.isNull()
            any_null = n if any_null is None else (any_null | n)
        value = F.when(~any_null, F.concat(*vals))
        err = F.when(any_null, F.lit(
            'function call error for "+" at operand: expected string, got null'))
        return value, err
    raise VrlCompileError(f"unsupported expression {e!r}")


def _exec_block(stmts, env: _Env, guard: Column | None) -> None:
    for s in stmts:
        if isinstance(s, Assign):
            value, err = _compile_expr(s.expr, env)
            if s.err_target is not None:
                err = err if err is not None else F.lit(None).cast("string")
                # on failure the target reads NULL, err carries the message
                value = F.when(err.isNull(), value)
            elif err is not None:
                raise VrlCompileError(
                    "fallible expression needs an error-capturing assignment "
                    "(.target, .err = ...)")
            if guard is not None:
                prev = (env.cols.get(s.target)
                        if s.target in env.cols else F.lit(None))
                value = F.when(guard, value).otherwise(prev)
            env.set(s.target, value)
            if (guard is None and s.err_target is None
                    and _is_known_string(s.expr, env)):
                env.known_strings.add(s.target)
            else:
                env.known_strings.discard(s.target)
            if s.err_target is not None:
                if guard is not None:
                    prev = (env.cols.get(s.err_target)
                            if s.err_target in env.cols else F.lit(None))
                    err = F.when(guard, err).otherwise(prev)
                env.set(s.err_target, err)
        elif isinstance(s, If):
            taken = None  # rows already claimed by an earlier branch
            for cond_expr, block in s.branches:
                if cond_expr is None:
                    branch_guard = (~taken if taken is not None
                                    else F.lit(True))
                else:
                    c, _ = _compile_expr(cond_expr, env)
                    c = F.coalesce(c, F.lit(False))
                    branch_guard = c if taken is None else (c & ~taken)
                    taken = c if taken is None else (taken | c)
                g = branch_guard if guard is None else (guard & branch_guard)
                _exec_block(block, env, g)
        else:  # pragma: no cover - parser produces only Assign/If
            raise VrlCompileError(f"unsupported statement {s!r}")


def compile_vrl_program(df: DataFrame, source: str) -> DataFrame:
    """Compile + apply a VRL remap program over ``df``; returns the frame
    with every assigned field as a column (original columns updated in
    place, new fields appended in first-assignment order)."""
    stmts = _Parser(_tokenize(source)).program()
    env = _Env(df)
    _exec_block(stmts, env, None)
    return df.select(*[
        env.cols[p].alias(".".join(p)) for p in env.order
    ])
