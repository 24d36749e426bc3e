"""Recursive-descent parser for the Lua-subset runtime.

Grammar follows the public Lua 5.4 reference manual (§9, "The Complete
Syntax of Lua"), minus `goto`/labels.  Produces a tuple-based AST the
evaluator (interp.py) walks.

AST shapes (statements)::

    ("local", [names], [exprs])
    ("assign", [targets], [exprs], line)      targets: ("name",n) | ("index",obj,key,line)
    ("callstat", callexpr)
    ("do", block)
    ("while", cond, block)
    ("repeat", block, cond)
    ("if", [(cond, block), ...], else_block|None)
    ("fornum", name, start, stop, step|None, block, line)
    ("forin", [names], [exprs], block, line)
    ("return", [exprs], line)
    ("break", line)

Expressions::

    ("nil",) ("true",) ("false",) ("num", v) ("str", v) ("vararg", line)
    ("func", [params], is_vararg, block, name)
    ("name", n) ("index", obj, key, line)
    ("call", f, [args], line) ("method", obj, name, [args], line)
    ("table", [("item", e) | ("pair", k, v)], line)
    ("binop", op, l, r, line) ("unop", op, e, line)
    ("and", l, r) ("or", l, r) ("paren", e)
"""

from __future__ import annotations

from .lexer import LuaSyntaxError, Token, tokenize

# binary operator precedence: (left, right); right < left => right-assoc
_BINPRI = {
    "or": (1, 1), "and": (2, 2),
    "<": (3, 3), ">": (3, 3), "<=": (3, 3), ">=": (3, 3), "~=": (3, 3), "==": (3, 3),
    "|": (4, 4), "~": (5, 5), "&": (6, 6), "<<": (7, 7), ">>": (7, 7),
    "..": (9, 8),  # right associative
    "+": (10, 10), "-": (10, 10),
    "*": (11, 11), "/": (11, 11), "//": (11, 11), "%": (11, 11),
    "^": (14, 13),  # right associative, binds above unary
}
_UNARY_PRI = 12


class Parser:
    def __init__(self, src: str, chunkname: str = "chunk"):
        self.chunk = chunkname
        self.toks: list[Token] = tokenize(src, chunkname)
        self.pos = 0

    # -- token helpers -------------------------------------------------
    @property
    def tok(self) -> Token:
        return self.toks[self.pos]

    def next(self) -> Token:
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def err(self, msg: str):
        raise LuaSyntaxError(self.chunk, self.tok.line, msg)

    def check(self, type_: str, value=None) -> bool:
        t = self.tok
        return t.type == type_ and (value is None or t.value == value)

    def accept(self, type_: str, value=None) -> Token | None:
        if self.check(type_, value):
            return self.next()
        return None

    def expect(self, type_: str, value=None) -> Token:
        if not self.check(type_, value):
            want = value if value is not None else type_
            got = self.tok.value if self.tok.type != "EOF" else "<eof>"
            self.err(f"'{want}' expected near '{got}'")
        return self.next()

    # -- entry points ---------------------------------------------------
    def parse_chunk(self):
        block = self.parse_block()
        if not self.check("EOF"):
            self.err(f"unexpected symbol near '{self.tok.value}'")
        return block

    _BLOCK_END = {"end", "else", "elseif", "until"}

    def parse_block(self):
        stmts = []
        while True:
            t = self.tok
            if t.type == "EOF" or (t.type == "KEYWORD" and t.value in self._BLOCK_END):
                return stmts
            if t.type == "KEYWORD" and t.value == "return":
                line = self.next().line
                exprs = []
                if not (self.tok.type == "EOF"
                        or (self.tok.type == "KEYWORD" and self.tok.value in self._BLOCK_END)
                        or self.check("OP", ";")):
                    exprs = self.parse_exprlist()
                self.accept("OP", ";")
                stmts.append(("return", exprs, line))
                return stmts
            st = self.parse_statement()
            if st is not None:
                stmts.append(st)

    # -- statements -----------------------------------------------------
    def parse_statement(self):
        t = self.tok
        if t.type == "OP" and t.value == ";":
            self.next()
            return None
        if t.type == "KEYWORD":
            kw = t.value
            if kw == "local":
                return self.parse_local()
            if kw == "if":
                return self.parse_if()
            if kw == "while":
                self.next()
                cond = self.parse_expr()
                self.expect("KEYWORD", "do")
                body = self.parse_block()
                self.expect("KEYWORD", "end")
                return ("while", cond, body)
            if kw == "repeat":
                self.next()
                body = self.parse_block()
                self.expect("KEYWORD", "until")
                cond = self.parse_expr()
                return ("repeat", body, cond)
            if kw == "for":
                return self.parse_for()
            if kw == "do":
                self.next()
                body = self.parse_block()
                self.expect("KEYWORD", "end")
                return ("do", body)
            if kw == "function":
                return self.parse_function_stat()
            if kw == "break":
                line = self.next().line
                return ("break", line)
            if kw == "goto":
                self.err("goto is not supported by this runtime")
        return self.parse_exprstat()

    def parse_local(self):
        self.next()  # 'local'
        if self.accept("KEYWORD", "function"):
            name = self.expect("NAME").value
            func = self.parse_funcbody(name)
            return ("localfunc", name, func)
        names = [self.expect("NAME").value]
        # Lua 5.4 attribs (<const>/<close>) are parsed and ignored
        self._skip_attrib()
        while self.accept("OP", ","):
            names.append(self.expect("NAME").value)
            self._skip_attrib()
        exprs = []
        if self.accept("OP", "="):
            exprs = self.parse_exprlist()
        return ("local", names, exprs)

    def _skip_attrib(self):
        if self.check("OP", "<"):
            self.next()
            self.expect("NAME")
            self.expect("OP", ">")

    def parse_if(self):
        self.next()  # 'if'
        arms = []
        cond = self.parse_expr()
        self.expect("KEYWORD", "then")
        arms.append((cond, self.parse_block()))
        else_block = None
        while True:
            if self.accept("KEYWORD", "elseif"):
                c = self.parse_expr()
                self.expect("KEYWORD", "then")
                arms.append((c, self.parse_block()))
                continue
            if self.accept("KEYWORD", "else"):
                else_block = self.parse_block()
            self.expect("KEYWORD", "end")
            return ("if", arms, else_block)

    def parse_for(self):
        line = self.next().line  # 'for'
        first = self.expect("NAME").value
        if self.accept("OP", "="):
            start = self.parse_expr()
            self.expect("OP", ",")
            stop = self.parse_expr()
            step = None
            if self.accept("OP", ","):
                step = self.parse_expr()
            self.expect("KEYWORD", "do")
            body = self.parse_block()
            self.expect("KEYWORD", "end")
            return ("fornum", first, start, stop, step, body, line)
        names = [first]
        while self.accept("OP", ","):
            names.append(self.expect("NAME").value)
        self.expect("KEYWORD", "in")
        exprs = self.parse_exprlist()
        self.expect("KEYWORD", "do")
        body = self.parse_block()
        self.expect("KEYWORD", "end")
        return ("forin", names, exprs, body, line)

    def parse_function_stat(self):
        line = self.next().line  # 'function'
        # funcname: Name {'.' Name} [':' Name]
        target = ("name", self.expect("NAME").value)
        pretty = [target[1]]
        is_method = False
        while self.accept("OP", "."):
            key = self.expect("NAME").value
            pretty.append(key)
            target = ("index", target, ("str", key), line)
        if self.accept("OP", ":"):
            key = self.expect("NAME").value
            pretty.append(key)
            target = ("index", target, ("str", key), line)
            is_method = True
        func = self.parse_funcbody(".".join(pretty), is_method=is_method)
        return ("assign", [target], [func], line)

    def parse_funcbody(self, name: str, is_method: bool = False):
        line = self.expect("OP", "(").line
        params = ["self"] if is_method else []
        is_vararg = False
        if not self.check("OP", ")"):
            while True:
                if self.accept("OP", "..."):
                    is_vararg = True
                    break
                params.append(self.expect("NAME").value)
                if not self.accept("OP", ","):
                    break
        self.expect("OP", ")")
        body = self.parse_block()
        self.expect("KEYWORD", "end")
        return ("func", params, is_vararg, body, name or f"<anonymous:{line}>")

    def parse_exprstat(self):
        line = self.tok.line
        e = self.parse_suffixedexp()
        if self.check("OP", "=") or self.check("OP", ","):
            targets = [e]
            while self.accept("OP", ","):
                targets.append(self.parse_suffixedexp())
            self.expect("OP", "=")
            exprs = self.parse_exprlist()
            for tgt in targets:
                if tgt[0] not in ("name", "index"):
                    self.err("syntax error near '='")
            return ("assign", targets, exprs, line)
        if e[0] not in ("call", "method"):
            self.err("syntax error: expression is not a statement")
        return ("callstat", e)

    # -- expressions ----------------------------------------------------
    def parse_exprlist(self):
        exprs = [self.parse_expr()]
        while self.accept("OP", ","):
            exprs.append(self.parse_expr())
        return exprs

    def parse_expr(self, limit: int = 0):
        t = self.tok
        if t.type == "KEYWORD" and t.value == "not":
            line = self.next().line
            e = self.parse_expr(_UNARY_PRI)
            left = ("unop", "not", e, line)
        elif t.type == "OP" and t.value in ("-", "#", "~"):
            line = self.next().line
            e = self.parse_expr(_UNARY_PRI)
            left = ("unop", t.value, e, line)
        else:
            left = self.parse_simpleexp()
        while True:
            t = self.tok
            op = None
            if t.type == "OP" and t.value in _BINPRI:
                op = t.value
            elif t.type == "KEYWORD" and t.value in ("and", "or"):
                op = t.value
            if op is None:
                return left
            lpri, rpri = _BINPRI[op]
            if lpri <= limit:
                return left
            line = self.next().line
            right = self.parse_expr(rpri)
            if op == "and":
                left = ("and", left, right)
            elif op == "or":
                left = ("or", left, right)
            else:
                left = ("binop", op, left, right, line)

    def parse_simpleexp(self):
        t = self.tok
        if t.type == "NUMBER":
            self.next()
            return ("num", t.value)
        if t.type == "STRING":
            self.next()
            return ("str", t.value)
        if t.type == "KEYWORD":
            if t.value == "nil":
                self.next()
                return ("nil",)
            if t.value == "true":
                self.next()
                return ("true",)
            if t.value == "false":
                self.next()
                return ("false",)
            if t.value == "function":
                self.next()
                return self.parse_funcbody("")
        if t.type == "OP":
            if t.value == "...":
                self.next()
                return ("vararg", t.line)
            if t.value == "{":
                return self.parse_table()
        return self.parse_suffixedexp()

    def parse_primaryexp(self):
        t = self.tok
        if t.type == "NAME":
            self.next()
            return ("name", t.value)
        if t.type == "OP" and t.value == "(":
            self.next()
            e = self.parse_expr()
            self.expect("OP", ")")
            return ("paren", e)
        self.err(f"unexpected symbol near '{t.value if t.type != 'EOF' else '<eof>'}'")

    def parse_suffixedexp(self):
        e = self.parse_primaryexp()
        while True:
            t = self.tok
            if t.type == "OP" and t.value == ".":
                self.next()
                key = self.expect("NAME").value
                e = ("index", e, ("str", key), t.line)
            elif t.type == "OP" and t.value == "[":
                self.next()
                k = self.parse_expr()
                self.expect("OP", "]")
                e = ("index", e, k, t.line)
            elif t.type == "OP" and t.value == ":":
                self.next()
                name = self.expect("NAME").value
                args = self.parse_callargs()
                e = ("method", e, name, args, t.line)
            elif (t.type == "OP" and t.value in ("(", "{")) or t.type == "STRING":
                args = self.parse_callargs()
                e = ("call", e, args, t.line)
            else:
                return e

    def parse_callargs(self):
        t = self.tok
        if t.type == "STRING":
            self.next()
            return [("str", t.value)]
        if t.type == "OP" and t.value == "{":
            return [self.parse_table()]
        self.expect("OP", "(")
        args = []
        if not self.check("OP", ")"):
            args = self.parse_exprlist()
        self.expect("OP", ")")
        return args

    def parse_table(self):
        line = self.expect("OP", "{").line
        fields = []
        while not self.check("OP", "}"):
            t = self.tok
            if t.type == "OP" and t.value == "[":
                self.next()
                k = self.parse_expr()
                self.expect("OP", "]")
                self.expect("OP", "=")
                fields.append(("pair", k, self.parse_expr()))
            elif t.type == "NAME" and self.toks[self.pos + 1].type == "OP" \
                    and self.toks[self.pos + 1].value == "=":
                self.next()
                self.next()
                fields.append(("pair", ("str", t.value), self.parse_expr()))
            else:
                fields.append(("item", self.parse_expr()))
            if not (self.accept("OP", ",") or self.accept("OP", ";")):
                break
        self.expect("OP", "}")
        return ("table", fields, line)


def parse(src: str, chunkname: str = "chunk"):
    """Parse Lua source into a block AST."""
    return Parser(src, chunkname).parse_chunk()
