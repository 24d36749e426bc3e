"""Datadog log-search query syntax -> Spark Column compiler.

The reference's third first-class condition type
(src/conditions/datadog_search.rs; grammar from the public Datadog log
search syntax, matcher semantics from the Filter<LogEvent> impl at
datadog_search.rs:63-260):

- bare keyword            word-boundary match on the default field
- "quoted phrase"         same, phrase form
- field:value             facet/reserved: string equality;
                          tag: tags array contains "field:value"
- field:val*              wildcard (anchored for facets, word-boundary for
                          default, prefix for tags)
- @facet:>N  :>=  :<  :<= numeric when the column is numeric, else
                          lexicographic string compare (datadog_search.rs
                          compare(), 157-260)
- @facet:[a TO b]         inclusive range
- _exists_:f / _missing_:f  presence (facet: non-null column; tag: any
                          tag equal to f or prefixed "f:")
- NOT x / -x, x AND y, x OR y, parentheses; space = implicit AND

Compiled ONCE on the driver into a boolean Column tree (codegen, no UDF).
NULL discipline: the reference's matcher returns false for absent fields,
so every leaf is coalesced to FALSE — `NOT foo:bar` is then true on rows
where `foo` is NULL, exactly matching Filter semantics (a raw Spark
`~(col = lit)` would yield NULL and silently drop).

Static-schema mapping: facets (@a.b) and reserved fields resolve to
columns via a caller-supplied resolver (default: `F.col` on the dotted
path); tags is an `array<string>` column of "key:value" entries; the
default field for bare keywords is `message`.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NUMERIC_TYPES = {"tinyint", "smallint", "int", "bigint", "float", "double", "decimal"}

# the reference's reserved (non-tag) attribute names (vrl datadog_filter
# Field::Reserved; bare `key:value` terms on any other name address tags)
RESERVED_FIELDS = {
    "host", "hostname", "source", "status", "service", "trace_id",
    "message", "timestamp", "tags",
}


def _word_regex(term: str) -> str:
    """Word-boundary search regex (vrl datadog_filter word_regex shape):
    `*` -> `.*`; boundaries applied unless the respective end is a
    wildcard."""
    parts = [re.escape(p) for p in term.split("*")]
    body = ".*".join(parts)
    lead = "" if term.startswith("*") else r"\b"
    trail = "" if term.endswith("*") else r"\b"
    return f"{lead}{body}{trail}"


def _wildcard_regex(term: str) -> str:
    """Anchored full-value wildcard regex (vrl wildcard_regex shape)."""
    parts = [re.escape(p) for p in term.split("*")]
    return "^" + ".*".join(parts) + "$"


# --- tokenizer --------------------------------------------------------------

_TOKEN = re.compile(
    r"""
    \s+
  | (?P<lparen>\() | (?P<rparen>\))
  | (?P<quoted>"(?:\\.|[^"\\])*")
  | (?P<lbrack>\[) | (?P<rbrack>\])
  | (?P<op>AND\b|OR\b|NOT\b|TO\b)
  | (?P<colon>:)
  | (?P<cmp>>=|<=|>|<)
  | (?P<minus>-(?=[\w@_*"(]))
  | (?P<word>[^\s():\[\]"]+)
""",
    re.VERBOSE,
)


def _tokenize(q: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(q):
        m = _TOKEN.match(q, i)
        if not m:
            raise ValueError(f"datadog_search: cannot tokenize at {q[i:]!r}")
        i = m.end()
        for kind in ("lparen", "rparen", "quoted", "lbrack", "rbrack", "op",
                     "colon", "cmp", "minus", "word"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                break
    out.append(("eof", ""))
    return out


# --- compiler ---------------------------------------------------------------


@dataclass
class DatadogSearchCompiler:
    """Compiles query strings against a fixed schema mapping."""

    default_field: str = "message"
    tags_col: str | None = "tags"
    dtypes: dict[str, str] = dc_field(default_factory=dict)
    resolver: object = None  # Callable[[str], Column]

    @classmethod
    def for_df(cls, df: DataFrame, default_field: str = "message",
               tags_col: str | None = "tags") -> "DatadogSearchCompiler":
        dtypes = dict(df.dtypes)
        return cls(
            default_field=default_field,
            tags_col=tags_col if tags_col in dtypes else None,
            dtypes=dtypes,
        )

    # -- field helpers

    def _col(self, name: str) -> Column:
        if self.resolver is not None:
            return self.resolver(name)  # type: ignore[operator]
        return F.col(name)

    def _is_reserved_or_facet(self, name: str) -> bool:
        """A name addresses a column iff it's a facet (@...) or one of the
        reference's reserved attributes; any other bare name is a tag key
        (datadog_search.rs Field match arms)."""
        return name in RESERVED_FIELDS

    def _numeric(self, name: str) -> bool:
        t = self.dtypes.get(name, "")
        return t.split("(")[0] in _NUMERIC_TYPES

    def _tag_any(self, pred) -> Column:
        if self.tags_col is None:
            return F.lit(False)
        return F.coalesce(F.exists(F.col(self.tags_col), pred), F.lit(False))

    # -- leaves (each coalesced to FALSE)

    def _leaf_keyword(self, term: str) -> Column:
        c = self._col(self.default_field).cast("string")
        return F.coalesce(c.rlike(_word_regex(term)), F.lit(False))

    def _leaf_exists(self, name: str) -> Column:
        if name.startswith("@") or self._is_reserved_or_facet(name):
            return F.coalesce(self._col(name.lstrip("@")).isNotNull(), F.lit(False))
        prefix = name + ":"
        return self._tag_any(
            lambda v: (v == F.lit(name)) | v.startswith(F.lit(prefix))
        )

    def _leaf_field_value(self, name: str, value: str, quoted: bool) -> Column:
        has_wild = ("*" in value) and not quoted
        if name.startswith("@") or self._is_reserved_or_facet(name):
            c = self._col(name.lstrip("@")).cast("string")
            if has_wild:
                return F.coalesce(c.rlike(_wildcard_regex(value)), F.lit(False))
            return F.coalesce(c == F.lit(value), F.lit(False))
        # tag: compare by "key:value" element
        if has_wild:
            rx = _wildcard_regex(f"{name}:{value}")
            return self._tag_any(lambda v: v.rlike(rx))
        kv = f"{name}:{value}"
        return self._tag_any(lambda v: v == F.lit(kv))

    def _facet_num_or_str(self, name: str) -> tuple[Column, bool]:
        base = self._col(name.lstrip("@"))
        return base, self._numeric(name.lstrip("@"))

    def _leaf_compare(self, name: str, op: str, value: str) -> Column:
        if not (name.startswith("@") or self._is_reserved_or_facet(name)):
            # tag compare: extract the value after "key:" and compare as
            # string (datadog_search.rs compare(), Field::Tag arm)
            pre = name + ":"
            rhs = F.lit(value)

            def tag_cmp(v):
                lhs = F.substring(v, len(pre) + 1, 1_000_000)
                c = {
                    ">": lhs > rhs, ">=": lhs >= rhs,
                    "<": lhs < rhs, "<=": lhs <= rhs,
                }[op]
                return v.startswith(F.lit(pre)) & c

            return self._tag_any(tag_cmp)
        c, is_num = self._facet_num_or_str(name)
        try:
            num = float(value)
            rhs_num = True
        except ValueError:
            rhs_num = False
        if is_num and rhs_num:
            lhs, rhs = c.cast("double"), F.lit(num)
        else:
            lhs, rhs = c.cast("string"), F.lit(value)
        cmpc = {
            ">": lhs > rhs, ">=": lhs >= rhs, "<": lhs < rhs, "<=": lhs <= rhs
        }[op]
        return F.coalesce(cmpc, F.lit(False))

    def _leaf_range(self, name: str, lo: str, hi: str) -> Column:
        c, is_num = self._facet_num_or_str(name)
        lo_num = hi_num = None
        try:
            lo_num, hi_num = float(lo), float(hi)
        except ValueError:
            pass
        if is_num and lo_num is not None:
            lhs = c.cast("double")
            rng = (lhs >= F.lit(lo_num)) & (lhs <= F.lit(hi_num))
        else:
            lhs = c.cast("string")
            rng = (lhs >= F.lit(lo)) & (lhs <= F.lit(hi))
        return F.coalesce(rng, F.lit(False))

    # -- recursive-descent parser

    def compile(self, query: str) -> Column:
        toks = _tokenize(query)
        self._toks, self._pos = toks, 0
        col = self._or_expr()
        if self._peek()[0] != "eof":
            raise ValueError(f"datadog_search: trailing input at {self._peek()[1]!r}")
        return col

    def _peek(self):
        return self._toks[self._pos]

    def _next(self):
        t = self._toks[self._pos]
        self._pos += 1
        return t

    def _or_expr(self) -> Column:
        left = self._and_expr()
        while self._peek() == ("op", "OR"):
            self._next()
            left = left | self._and_expr()
        return left

    def _and_expr(self) -> Column:
        left = self._unary()
        while True:
            kind, val = self._peek()
            if kind == "op" and val == "AND":
                self._next()
                left = left & self._unary()
            elif kind in ("word", "quoted", "lparen", "minus") or (
                kind == "op" and val == "NOT"
            ):
                left = left & self._unary()  # implicit AND
            else:
                return left

    def _unary(self) -> Column:
        kind, val = self._peek()
        if kind == "minus" or (kind == "op" and val == "NOT"):
            self._next()
            return ~self._unary()
        return self._primary()

    def _primary(self) -> Column:
        kind, val = self._next()
        if kind == "lparen":
            inner = self._or_expr()
            if self._next()[0] != "rparen":
                raise ValueError("datadog_search: unbalanced parenthesis")
            return inner
        if kind == "quoted":
            phrase = val[1:-1].replace('\\"', '"')
            # quoted FIELD name ("a b":value — attributes with spaces/
            # specials; datadog_search.rs quoted-attribute arm)
            if self._peek()[0] == "colon":
                self._next()
                return self._field_rest(phrase)
            return self._leaf_keyword(phrase)
        if kind != "word":
            raise ValueError(f"datadog_search: unexpected token {val!r}")
        name = val
        if self._peek()[0] != "colon":
            return self._leaf_keyword(name)
        self._next()  # consume ':'
        return self._field_rest(name)

    def _field_rest(self, name: str) -> Column:
        """Everything after ``name:`` — exists/missing, compare, range,
        grouped values, or a single (quoted) value."""
        if name == "_exists_":
            return self._leaf_exists(self._next()[1])
        if name == "_missing_":
            return ~self._leaf_exists(self._next()[1])
        kind2, val2 = self._peek()
        if kind2 == "cmp":
            self._next()
            return self._leaf_compare(name, val2, self._next()[1])
        if kind2 == "lbrack":
            self._next()
            lo = self._next()[1].strip('"')
            if self._next() != ("op", "TO"):
                raise ValueError("datadog_search: expected TO in range")
            hi = self._next()[1].strip('"')
            if self._next()[0] != "rbrack":
                raise ValueError("datadog_search: unbalanced range bracket")
            return self._leaf_range(name, lo, hi)
        if kind2 == "lparen":
            self._next()
            return self._grouped_values(name)
        if kind2 == "quoted":
            self._next()
            return self._leaf_field_value(name, val2[1:-1].replace('\\"', '"'), True)
        if kind2 == "word":
            self._next()
            return self._leaf_field_value(name, val2, False)
        raise ValueError(f"datadog_search: expected value after {name!r}:")

    def _grouped_values(self, name: str) -> Column:
        """Grouped values ``field:(a OR b)`` — the field distributes over
        every term, OR semantics (explicit OR and implicit separator are the
        same; datadog_search.rs grouped-term arm)."""
        terms: list[Column] = []
        while True:
            kind, val = self._next()
            if kind == "rparen":
                break
            if kind == "op" and val == "OR":
                continue
            if kind == "quoted":
                terms.append(
                    self._leaf_field_value(name, val[1:-1].replace('\\"', '"'), True)
                )
            elif kind == "word":
                terms.append(self._leaf_field_value(name, val, False))
            elif kind == "eof":
                raise ValueError("datadog_search: unbalanced value group")
            else:
                raise ValueError(
                    f"datadog_search: unexpected {val!r} in value group"
                )
        if not terms:
            raise ValueError("datadog_search: empty value group")
        out = terms[0]
        for t in terms[1:]:
            out = out | t
        return out


def compile_datadog_search(
    query: str, df: DataFrame, default_field: str = "message",
    tags_col: str | None = "tags",
) -> Column:
    """One-shot helper: compile ``query`` against ``df``'s schema."""
    return DatadogSearchCompiler.for_df(df, default_field, tags_col).compile(query)
