"""Lua pattern matching (string.find/match/gmatch/gsub).

A from-scratch backtracking matcher implementing the pattern language of
the public Lua 5.4 reference manual §6.4.1: character classes (%a %c %d
%g %l %p %s %u %w %x and complements), sets ``[...]``/``[^...]`` with
ranges, quantifiers ``* + - ?``, anchors ``^``/``$``, captures incl.
position captures ``()``, back-references ``%1``-``%9``, balanced match
``%bxy`` and frontier ``%f[set]``.

Strings here are Python ``str`` (the transform's event values are UTF-8
text columns); indices in the public API are 1-based like Lua's.
"""

from __future__ import annotations

MAXCAPS = 32
_POS_CAP = -2  # position capture marker
_OPEN_CAP = -1


class LuaPatternError(ValueError):
    pass


def _class_match(ch: str, cl: str) -> bool:
    low = cl.lower()
    if low == "a":
        res = ch.isalpha()
    elif low == "c":
        res = ord(ch) < 32 or ord(ch) == 127
    elif low == "d":
        res = "0" <= ch <= "9"
    elif low == "g":
        res = ch.isprintable() and ch != " "
    elif low == "l":
        res = ch.islower()
    elif low == "p":
        res = ch.isprintable() and not ch.isalnum() and ch != " "
    elif low == "s":
        res = ch in " \t\n\r\f\v"
    elif low == "u":
        res = ch.isupper()
    elif low == "w":
        res = ch.isalnum()
    elif low == "x":
        res = ch in "0123456789abcdefABCDEF"
    else:
        return ch == cl  # escaped literal (%%, %., %( ...)
    if cl.isupper():
        return not res
    return res


class _Matcher:
    __slots__ = ("s", "p", "caps")

    def __init__(self, s: str, p: str):
        self.s = s
        self.p = p
        self.caps: list[list[int]] = []  # [start, len] ; len<0 = open/pos

    # -- pattern item navigation ----------------------------------------
    def class_end(self, pi: int) -> int:
        """Index just past the single pattern item starting at pi."""
        p = self.p
        c = p[pi]
        pi += 1
        if c == "%":
            if pi >= len(p):
                raise LuaPatternError("malformed pattern (ends with '%')")
            return pi + 1
        if c == "[":
            if pi < len(p) and p[pi] == "^":
                pi += 1
            # a ']' as first set char is a literal
            first = True
            while True:
                if pi >= len(p):
                    raise LuaPatternError("malformed pattern (missing ']')")
                ch = p[pi]
                pi += 1
                if ch == "%":
                    if pi >= len(p):
                        raise LuaPatternError("malformed pattern (ends with '%')")
                    pi += 1
                elif ch == "]" and not first:
                    return pi
                first = False
        return pi

    def single_match(self, si: int, pi: int, ep: int) -> bool:
        if si >= len(self.s):
            return False
        ch = self.s[si]
        c = self.p[pi]
        if c == ".":
            return True
        if c == "%":
            return _class_match(ch, self.p[pi + 1])
        if c == "[":
            return self.match_set(ch, pi, ep - 1)
        return c == ch

    def match_set(self, ch: str, pi: int, pe: int) -> bool:
        """Set between p[pi]=='[' and p[pe]==']'."""
        p = self.p
        pi += 1
        negate = False
        if p[pi] == "^":
            negate = True
            pi += 1
        res = False
        while pi < pe:
            if p[pi] == "%":
                if _class_match(ch, p[pi + 1]):
                    res = True
                pi += 2
            elif pi + 2 < pe and p[pi + 1] == "-":
                if p[pi] <= ch <= p[pi + 2]:
                    res = True
                pi += 3
            else:
                if p[pi] == ch:
                    res = True
                pi += 1
        return res != negate

    # -- the matcher ------------------------------------------------------
    def match(self, si: int, pi: int) -> int:
        """Try to match pattern from pi at string index si; returns end
        index or -1."""
        s, p = self.s, self.p
        while True:
            if pi >= len(p):
                return si
            c = p[pi]
            if c == "(":
                if pi + 1 < len(p) and p[pi + 1] == ")":  # position capture
                    self.caps.append([si, _POS_CAP])
                    r = self.match(si, pi + 2)
                    if r < 0:
                        self.caps.pop()
                    return r
                self.caps.append([si, _OPEN_CAP])
                r = self.match(si, pi + 1)
                if r < 0:
                    self.caps.pop()
                return r
            if c == ")":
                idx = self._last_open()
                self.caps[idx][1] = si - self.caps[idx][0]
                r = self.match(si, pi + 1)
                if r < 0:
                    self.caps[idx][1] = _OPEN_CAP
                return r
            if c == "$" and pi + 1 == len(p):
                return si if si == len(s) else -1
            if c == "%":
                nxt = p[pi + 1] if pi + 1 < len(p) else ""
                if nxt == "b":
                    if pi + 3 >= len(p):
                        raise LuaPatternError("missing arguments to '%b'")
                    o, cl = p[pi + 2], p[pi + 3]
                    if si >= len(s) or s[si] != o:
                        return -1
                    bal = 1
                    j = si + 1
                    while j < len(s):
                        if s[j] == cl:
                            bal -= 1
                            if bal == 0:
                                # tail call onto rest of pattern
                                r = self.match(j + 1, pi + 4)
                                if r >= 0:
                                    return r
                                break
                        elif s[j] == o:
                            bal += 1
                        j += 1
                    return -1
                if nxt == "f":
                    if pi + 2 >= len(p) or p[pi + 2] != "[":
                        raise LuaPatternError("missing '[' after '%f' in pattern")
                    ep = self.class_end(pi + 2)
                    prev = s[si - 1] if si > 0 else "\0"
                    cur = s[si] if si < len(s) else "\0"
                    if (not self.match_set(prev, pi + 2, ep - 1)
                            and self.match_set(cur, pi + 2, ep - 1)):
                        pi = ep
                        continue
                    return -1
                if nxt.isdigit():  # back-reference
                    idx = int(nxt) - 1
                    # %0 is not a valid back-reference (PUC-Lua:
                    # "invalid capture index %0"); without the idx < 0
                    # check it would silently alias the LAST capture
                    if idx < 0 or idx >= len(self.caps) or self.caps[idx][1] < 0:
                        raise LuaPatternError(f"invalid capture index %{nxt}")
                    st, ln = self.caps[idx]
                    cap = s[st:st + ln]
                    if s.startswith(cap, si):
                        si += len(cap)
                        pi += 2
                        continue
                    return -1
            ep = self.class_end(pi)
            quant = p[ep] if ep < len(p) else ""
            if quant == "?":
                if self.single_match(si, pi, ep):
                    r = self.match(si + 1, ep + 1)
                    if r >= 0:
                        return r
                pi = ep + 1
                continue
            if quant == "+":
                if not self.single_match(si, pi, ep):
                    return -1
                si += 1
                quant = "*"  # fall through to max-expand
            if quant == "*":
                count = 0
                while self.single_match(si + count, pi, ep):
                    count += 1
                while count >= 0:
                    r = self.match(si + count, ep + 1)
                    if r >= 0:
                        return r
                    count -= 1
                return -1
            if quant == "-":
                while True:
                    r = self.match(si, ep + 1)
                    if r >= 0:
                        return r
                    if self.single_match(si, pi, ep):
                        si += 1
                    else:
                        return -1
            # single item, exactly once
            if not self.single_match(si, pi, ep):
                return -1
            si += 1
            pi = ep

    def _last_open(self) -> int:
        for i in range(len(self.caps) - 1, -1, -1):
            if self.caps[i][1] == _OPEN_CAP:
                return i
        raise LuaPatternError("invalid pattern capture")

    def captures(self, mstart: int, mend: int):
        """Capture values after a successful match; whole match if none."""
        if not self.caps:
            return [self.s[mstart:mend]]
        out = []
        for st, ln in self.caps:
            if ln == _POS_CAP:
                out.append(st + 1)  # 1-based position
            elif ln < 0:
                raise LuaPatternError("unfinished capture")
            else:
                out.append(self.s[st:st + ln])
        return out


def _norm_init(init, slen: int) -> int:
    """Lua init index (1-based, may be negative) -> 0-based offset."""
    if init is None:
        return 0
    init = int(init)
    if init < 0:
        init = max(slen + init, 0)
    elif init > 0:
        init -= 1
    return init


def _run(s: str, pat: str, init0: int):
    """Find leftmost match at/after init0.  Returns (start0, end0, matcher)
    or None."""
    anchored = pat.startswith("^")
    p0 = 1 if anchored else 0
    si = init0
    while True:
        m = _Matcher(s, pat)
        e = m.match(si, p0)
        if e >= 0:
            return si, e, m
        if anchored or si >= len(s):
            return None
        si += 1


def str_find(s: str, pat: str, init=None, plain=False):
    """Lua string.find: returns (start, end, caps...) 1-based, or None."""
    init0 = _norm_init(init, len(s))
    if init0 > len(s):
        return None
    if plain:
        idx = s.find(pat, init0)
        if idx < 0:
            return None
        return (idx + 1, idx + len(pat))
    r = _run(s, pat, init0)
    if r is None:
        return None
    st, en, m = r
    caps = m.captures(st, en) if m.caps else []
    return (st + 1, en, *caps)


def str_match(s: str, pat: str, init=None):
    init0 = _norm_init(init, len(s))
    if init0 > len(s):
        return None
    r = _run(s, pat, init0)
    if r is None:
        return None
    st, en, m = r
    caps = m.captures(st, en)
    return tuple(caps) if len(caps) > 1 else caps[0]


def gmatch_iter(s: str, pat: str):
    """Python generator over capture tuples (whole match if no captures)."""
    si = 0
    while si <= len(s):
        r = _run(s, pat, si)
        if r is None:
            return
        st, en, m = r
        yield tuple(m.captures(st, en))
        si = en + 1 if en == st else en  # never loop on empty match


#  ')' and ']' are included so patterns real Lua REJECTS (a bare ')' is
# "invalid pattern capture") cannot slip through the literal fast path
_MAGIC = set("^$*+?.([%-)]")


def gsub(s: str, pat: str, repl, n=None):
    """Lua string.gsub.  ``repl`` is a str (with %0-%9), a mapping
    (table.get), or a callable receiving the captures.  Returns
    (result, count)."""
    # literal pattern + literal replacement: pure str ops (the common
    # "strip/count a fixed token" idiom costs no backtracking)
    if (n is None and isinstance(repl, str) and "%" not in repl
            and not (_MAGIC & set(pat)) and pat):
        cnt = s.count(pat)
        return (s.replace(pat, repl), cnt) if cnt else (s, 0)
    out: list[str] = []
    si = 0
    count = 0
    anchored = pat.startswith("^")
    while (n is None or count < n) and si <= len(s):
        r = _run(s, pat, si)
        if r is None:
            break
        st, en, m = r
        if st > si:
            # _run scans forward itself; everything before the match is kept
            out.append(s[si:st])
        caps = m.captures(st, en)
        whole = s[st:en]
        if isinstance(repl, str):
            buf = []
            i = 0
            while i < len(repl):
                ch = repl[i]
                if ch == "%" and i + 1 < len(repl):
                    d = repl[i + 1]
                    if d == "%":
                        buf.append("%")
                    elif d == "0":
                        buf.append(whole)
                    elif d.isdigit():
                        idx = int(d) - 1
                        if idx >= len(caps):
                            raise LuaPatternError(f"invalid capture index %{d}")
                        buf.append(_cap_str(caps[idx]))
                    else:
                        raise LuaPatternError("invalid use of '%' in replacement string")
                    i += 2
                else:
                    buf.append(ch)
                    i += 1
            out.append("".join(buf))
            count += 1
        else:
            if callable(repl):
                val = repl(*caps)
            else:  # table-like: look up first capture
                val = repl.get(caps[0]) if hasattr(repl, "get") else None
            if isinstance(val, tuple):
                val = val[0] if val else None
            if val is None or val is False:
                out.append(whole)
            elif isinstance(val, (str, int, float)):
                out.append(_cap_str(val))
            else:
                raise LuaPatternError("invalid replacement value")
            count += 1
        if en > st:
            si = en
        else:  # empty match: copy one char and advance
            if st < len(s):
                out.append(s[st])
            si = st + 1
        if anchored:
            break
    out.append(s[si:])
    return "".join(out), count


def _cap_str(v) -> str:
    if isinstance(v, bool):
        raise LuaPatternError("invalid replacement value")
    if isinstance(v, float):
        from .interp import fmt_number  # late import, avoids cycle

        return fmt_number(v)
    return str(v)
