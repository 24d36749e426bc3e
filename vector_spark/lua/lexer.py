"""Lua 5.4 lexer for the embedded `lua` transform runtime.

The reference embeds a real Lua VM (mlua, src/transforms/lua/v2/mod.rs);
this package is a from-scratch Lua-subset implementation in Python so the
`lua` transform can run genuine Lua hook sources inside Arrow-batched
``mapInPandas`` workers without native dependencies.  Syntax follows the
public Lua 5.4 reference manual (lexical conventions, §3.1).
"""

from __future__ import annotations

KEYWORDS = {
    "and", "break", "do", "else", "elseif", "end", "false", "for",
    "function", "goto", "if", "in", "local", "nil", "not", "or",
    "repeat", "return", "then", "true", "until", "while",
}

# multi-char operators, longest first
_OPS3 = ("...",)
_OPS2 = ("==", "~=", "<=", ">=", "//", "..", "::", "<<", ">>")
_OPS1 = "+-*/%^#&~|<>=(){}[];:,."

_ESCAPES = {
    "a": "\a", "b": "\b", "f": "\f", "n": "\n", "r": "\r",
    "t": "\t", "v": "\v", "\\": "\\", '"': '"', "'": "'", "\n": "\n",
}


class LuaSyntaxError(Exception):
    """Raised on lexical or grammatical errors.  The message format keeps
    mlua's recognizable ``syntax error:`` prefix so callers matching the
    reference's error text (lua/v2/mod.rs tests) see the same shape."""

    def __init__(self, chunk: str, line: int, msg: str):
        super().__init__(f"syntax error: [{chunk}]:{line}: {msg}")
        self.chunk = chunk
        self.line = line


class Token:
    __slots__ = ("type", "value", "line")

    def __init__(self, type_: str, value, line: int):
        self.type = type_   # NAME KEYWORD NUMBER STRING OP EOF
        self.value = value
        self.line = line

    def __repr__(self):  # pragma: no cover - debug aid
        return f"Token({self.type},{self.value!r},l{self.line})"


def _long_bracket_level(src: str, i: int) -> int:
    """At src[i] == '[', return the level of a long bracket ``[=*[`` or -1."""
    j = i + 1
    while j < len(src) and src[j] == "=":
        j += 1
    if j < len(src) and src[j] == "[":
        return j - i - 1
    return -1


def tokenize(src: str, chunkname: str = "chunk") -> list[Token]:
    toks: list[Token] = []
    i, n, line = 0, len(src), 1
    # a leading shebang is skipped like lua(1) does
    if src.startswith("#"):
        while i < n and src[i] != "\n":
            i += 1

    def err(msg, at_line=None):
        raise LuaSyntaxError(chunkname, at_line or line, msg)

    while i < n:
        c = src[i]
        if c == "\n":
            line += 1
            i += 1
            continue
        if c in " \t\r\v\f":
            i += 1
            continue
        if c == "-" and src.startswith("--", i):
            i += 2
            if i < n and src[i] == "[":
                lvl = _long_bracket_level(src, i)
                if lvl >= 0:
                    close = "]" + "=" * lvl + "]"
                    end = src.find(close, i)
                    if end < 0:
                        err("unfinished long comment")
                    line += src.count("\n", i, end)
                    i = end + len(close)
                    continue
            while i < n and src[i] != "\n":
                i += 1
            continue
        start_line = line
        if c.isalpha() or c == "_":
            j = i
            while j < n and (src[j].isalnum() or src[j] == "_"):
                j += 1
            word = src[i:j]
            toks.append(Token("KEYWORD" if word in KEYWORDS else "NAME", word, line))
            i = j
            continue
        if c.isdigit() or (c == "." and i + 1 < n and src[i + 1].isdigit()):
            j = i
            is_float = False
            if src.startswith(("0x", "0X"), i):
                j = i + 2
                while j < n and (src[j] in "0123456789abcdefABCDEF"):
                    j += 1
                # hex floats (0x1p4) are esoteric; treat trailing p/. as error
                if j < n and src[j] in ".pP":
                    err("unsupported hexadecimal float")
                toks.append(Token("NUMBER", int(src[i:j], 16), line))
                i = j
                continue
            while j < n and src[j].isdigit():
                j += 1
            if j < n and src[j] == ".":
                is_float = True
                j += 1
                while j < n and src[j].isdigit():
                    j += 1
            if j < n and src[j] in "eE":
                is_float = True
                j += 1
                if j < n and src[j] in "+-":
                    j += 1
                if j >= n or not src[j].isdigit():
                    err("malformed number")
                while j < n and src[j].isdigit():
                    j += 1
            text = src[i:j]
            toks.append(Token("NUMBER", float(text) if is_float else int(text), line))
            i = j
            continue
        if c in "'\"":
            quote = c
            i += 1
            buf: list[str] = []
            while True:
                if i >= n:
                    err("unfinished string", start_line)
                ch = src[i]
                if ch == quote:
                    i += 1
                    break
                if ch == "\n":
                    err("unfinished string", start_line)
                if ch == "\\":
                    i += 1
                    if i >= n:
                        err("unfinished string", start_line)
                    e = src[i]
                    if e in _ESCAPES:
                        buf.append(_ESCAPES[e])
                        if e == "\n":
                            line += 1
                        i += 1
                    elif e == "x":
                        # exactly two hex digits (Lua 5.4 §3.1); a bad
                        # digit must stay a LuaSyntaxError, not leak a
                        # host ValueError past hook compilation
                        try:
                            buf.append(chr(int(src[i + 1:i + 3], 16)))
                        except ValueError:
                            err("hexadecimal digit expected")
                        i += 3
                    elif e.isdigit():
                        j = i
                        while j < i + 3 and j < n and src[j].isdigit():
                            j += 1
                        code = int(src[i:j])
                        if code > 255:
                            err("decimal escape too large")
                        buf.append(chr(code))
                        i = j
                    elif e == "z":
                        i += 1
                        while i < n and src[i] in " \t\r\n":
                            if src[i] == "\n":
                                line += 1
                            i += 1
                    elif e == "u":
                        if i + 1 >= n or src[i + 1] != "{":
                            err("missing '{' in \\u{xxxx}")
                        j = src.find("}", i)
                        if j < 0:
                            err("missing '}' in \\u{xxxx}")
                        try:
                            code = int(src[i + 2:j], 16)
                        except ValueError:
                            err("hexadecimal digit expected")
                        if code > 0x7FFFFFFF:
                            err("UTF-8 value too large")
                        buf.append(chr(code) if code <= 0x10FFFF else "�")
                        i = j + 1
                    else:
                        err(f"invalid escape sequence '\\{e}'")
                else:
                    buf.append(ch)
                    i += 1
            toks.append(Token("STRING", "".join(buf), start_line))
            continue
        if c == "[":
            lvl = _long_bracket_level(src, i)
            if lvl >= 0:
                open_len = lvl + 2
                close = "]" + "=" * lvl + "]"
                body_start = i + open_len
                # a newline immediately after the opening bracket is skipped
                if body_start < n and src[body_start] == "\n":
                    body_start += 1
                    line += 1
                end = src.find(close, body_start)
                if end < 0:
                    err("unfinished long string", start_line)
                body = src[body_start:end]
                line += body.count("\n")
                toks.append(Token("STRING", body, start_line))
                i = end + len(close)
                continue
        matched = False
        for op in _OPS3 + _OPS2:
            if src.startswith(op, i):
                toks.append(Token("OP", op, line))
                i += len(op)
                matched = True
                break
        if matched:
            continue
        if c in _OPS1:
            toks.append(Token("OP", c, line))
            i += 1
            continue
        err(f"unexpected symbol near '{c}'")
    toks.append(Token("EOF", None, line))
    return toks
