"""VRL type-reflection, path, secret, and debug functions under a static
schema.

VRL values are dynamically typed per event; Spark DataFrames are statically
typed per column.  The reference's type/introspection family
(website/cue/reference/remap/functions/is_*.cue, exists.cue, del.cue,
get.cue, set.cue, remove.cue) therefore splits into two halves here:

- the *type* of a field is known at plan time from ``df.schema`` — the
  ``is_*`` builders inspect the dtype and fold the answer into the plan
  (a literal AND'd with a null check, since a VRL null is not "a string");
- the *presence/null-ness* of a value stays a runtime Column expression.

Secrets (get_secret.cue, set_secret.cue, remove_secret.cue) are Vector's
event-scoped metadata strings (lib/vector-core event metadata); the
rebuild models them as a ``map<string,string>`` column so they flow
through shuffles with the event and never touch the driver.

Debug functions (assert.cue, assert_eq.cue, log.cue) are eager driver-side
checks — the closest Spark analogue to VRL's abort-the-program semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _dtype(df: DataFrame, col: str) -> T.DataType | None:
    try:
        return df.schema[col].dataType
    except KeyError:
        return None


# ---------------------------------------------------------------------------
# is_* type checks (is_string.cue, is_integer.cue, is_float.cue,
# is_boolean.cue, is_array.cue, is_object.cue, is_timestamp.cue,
# is_null.cue, is_regex.cue).  VRL: true iff the value IS of that type —
# a null field is none of them, so each check is (dtype matches) AND
# (value not null), the first term folded at plan time.

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FLOATING = (T.FloatType, T.DoubleType)


def _typed_check(df: DataFrame, col: str, klasses: tuple) -> Column:
    dt = _dtype(df, col)
    if dt is None or not isinstance(dt, klasses):
        return F.lit(False)
    return _c(col).isNotNull()


def is_string(df: DataFrame, col: str) -> Column:
    """is_string (is_string.cue)."""
    return _typed_check(df, col, (T.StringType,))


def is_integer(df: DataFrame, col: str) -> Column:
    """is_integer (is_integer.cue)."""
    return _typed_check(df, col, _INTEGRAL)


def is_float(df: DataFrame, col: str) -> Column:
    """is_float (is_float.cue) — Spark float/double."""
    return _typed_check(df, col, _FLOATING)


def is_boolean(df: DataFrame, col: str) -> Column:
    """is_boolean (is_boolean.cue)."""
    return _typed_check(df, col, (T.BooleanType,))


def is_array(df: DataFrame, col: str) -> Column:
    """is_array (is_array.cue)."""
    return _typed_check(df, col, (T.ArrayType,))


def is_object(df: DataFrame, col: str) -> Column:
    """is_object (is_object.cue) — struct or map columns."""
    return _typed_check(df, col, (T.StructType, T.MapType))


def is_timestamp(df: DataFrame, col: str) -> Column:
    """is_timestamp (is_timestamp.cue)."""
    return _typed_check(df, col, (T.TimestampType, T.TimestampNTZType, T.DateType))


def is_regex(df: DataFrame, col: str) -> Column:
    """is_regex (is_regex.cue): regex is a VRL *program* value, never an
    event value — no Spark column can hold one, so this is always false
    (matching VRL on any serialized event)."""
    return F.lit(False)


def is_null(col: Column | str) -> Column:
    """is_null (is_null.cue) — runtime check, type-independent."""
    return _c(col).isNull()


def is_empty(df: DataFrame, col: str) -> Column:
    """is_empty (is_empty.cue): empty string / array / map — dispatch on
    the plan-time dtype (cardinality for collections, length for text)."""
    dt = _dtype(df, col)
    c = _c(col)
    if isinstance(dt, (T.ArrayType, T.MapType)):
        return F.coalesce(F.size(c) == 0, F.lit(False))
    return F.coalesce(F.length(c.cast("string")) == 0, F.lit(False))


def is_nullish(col: Column | str) -> Column:
    """is_nullish (is_nullish.cue): null, "", "-", or whitespace-only
    (the cue examples: "", "-", "\\n  \\n" are all nullish)."""
    c = _c(col).cast("string")
    # F.trim strips only 0x20 — \s covers the cue's "\n  \n" example
    return c.isNull() | c.rlike(r"^\s*$") | (c == "-")


def is_json(col: Column | str, variant: str | None = None) -> Column:
    """is_json (is_json.cue): the string parses as JSON; with ``variant``
    in {object, array, string, number, bool, null}, additionally of that
    kind.  Validity via the JVM JSON parser (``get_json_object`` yields
    NULL on malformed input); the scalar literals "null"/"true"/"false"
    and bare numbers are valid JSON the path engine also accepts."""
    c = F.trim(_c(col).cast("string"))
    valid = F.get_json_object(c, "$").isNotNull() | c.rlike(
        r"^(null|true|false|-?\d+(\.\d+)?([eE][+-]?\d+)?)$"
    )
    if variant is None:
        return F.coalesce(valid, F.lit(False))
    heads = {
        "object": r"^\{", "array": r"^\[", "string": r'^"',
        "number": r"^-?\d", "bool": r"^(true|false)$", "null": r"^null$",
    }
    return F.coalesce(valid & c.rlike(heads[variant]), F.lit(False))


# ---------------------------------------------------------------------------
# Path functions (exists.cue, get.cue, set.cue, del.cue, remove.cue).
# VRL paths address a dynamic event; here the root segment resolves
# against the static schema at plan time and nested segments against
# struct fields / map keys.


def exists(df: DataFrame, path: str) -> Column:
    """exists (exists.cue): the field is present.  Top-level and struct
    segments are schema membership (plan-time); a map segment is a
    runtime ``map_contains_key``.  A present-but-null field exists."""
    parts = path.split(".")
    dt = _dtype(df, parts[0])
    if dt is None:
        return F.lit(False)
    cur: Column = F.col(parts[0])
    for seg in parts[1:]:
        if isinstance(dt, T.StructType):
            names = {f.name: f.dataType for f in dt.fields}
            if seg not in names:
                return F.lit(False)
            cur, dt = cur.getField(seg), names[seg]
        elif isinstance(dt, T.MapType):
            return F.coalesce(F.map_contains_key(cur, F.lit(seg)), F.lit(False))
        else:
            return F.lit(False)
    return F.lit(True)


def get_path(df: DataFrame, path: str) -> Column:
    """get (get.cue): fetch by path; missing segments yield NULL (VRL's
    fallible-get with `?? null`)."""
    parts = path.split(".")
    dt = _dtype(df, parts[0])
    if dt is None:
        return F.lit(None)
    cur = F.col(parts[0])
    for seg in parts[1:]:
        # dtype-directed access so missing segments are NULL in both ANSI
        # modes: struct fields resolve at plan time, map keys through
        # try_element_at (element_at/getItem throw on absent keys under
        # ANSI sessions).
        if isinstance(dt, T.StructType):
            names = {f.name: f.dataType for f in dt.fields}
            if seg not in names:
                return F.lit(None)
            cur, dt = cur.getField(seg), names[seg]
        elif isinstance(dt, T.MapType):
            cur, dt = F.try_element_at(cur, F.lit(seg)), dt.valueType
        else:
            return F.lit(None)
    return cur


def set_path(df: DataFrame, path: str, value: Column) -> DataFrame:
    """set (set.cue): write a (possibly nested) field; intermediate
    structs are extended with ``Column.withField``."""
    parts = path.split(".")
    if len(parts) == 1:
        return df.withColumn(parts[0], value)
    root = F.col(parts[0])
    return df.withColumn(parts[0], root.withField(".".join(parts[1:]), value))


def del_path(df: DataFrame, path: str) -> DataFrame:
    """del / remove (del.cue, remove.cue): drop a top-level column or a
    nested struct field (``dropFields``)."""
    parts = path.split(".")
    if len(parts) == 1:
        return df.drop(parts[0])
    return df.withColumn(
        parts[0], F.col(parts[0]).dropFields(".".join(parts[1:]))
    )


remove = del_path


# ---------------------------------------------------------------------------
# Secrets (get_secret.cue, set_secret.cue, remove_secret.cue) over a
# map<string,string> secrets column.


def get_secret(secrets: Column | str, name: str) -> Column:
    """get_secret: NULL when absent (VRL: fallible) — try_element_at so an
    absent key is NULL under ANSI sessions too."""
    return F.try_element_at(_c(secrets), F.lit(name))


def set_secret(secrets: Column | str, name: str, value: Column | str) -> Column:
    """set_secret: upsert; a NULL/absent secrets map is treated as empty."""
    v = F.lit(value) if isinstance(value, str) else value
    base = F.coalesce(
        _c(secrets), F.create_map().cast("map<string,string>")
    )
    # map_concat rejects duplicate keys under strict policy — drop first
    cleaned = F.map_filter(base, lambda k, _: k != F.lit(name))
    return F.map_concat(cleaned, F.create_map(F.lit(name), v))


def remove_secret(secrets: Column | str, name: str) -> Column:
    """remove_secret: drop the key if present."""
    return F.map_filter(_c(secrets), lambda k, _: k != F.lit(name))


# ---------------------------------------------------------------------------
# tag_types_externally (tag_types_externally.cue): wrap every value in a
# single-key object named for its type — Datadog's externally-tagged
# representation.  Plan-time recursion over the schema; output is a JSON
# string (the tagging only matters at serialization time).

_TAGS = [
    ((T.StringType,), "string"),
    (_INTEGRAL, "integer"),
    (_FLOATING, "float"),
    ((T.BooleanType,), "boolean"),
    ((T.TimestampType, T.TimestampNTZType), "timestamp"),
]


def _tag(col: Column, dt: T.DataType) -> Column:
    for klasses, tag in _TAGS:
        if isinstance(dt, klasses):
            return F.struct(col.alias(tag))
    if isinstance(dt, T.ArrayType):
        return F.struct(
            F.transform(col, lambda x: _tag(x, dt.elementType)).alias("array")
        )
    if isinstance(dt, T.StructType):
        inner = F.struct(
            *[_tag(col.getField(f.name), f.dataType).alias(f.name) for f in dt.fields]
        )
        return F.struct(inner.alias("object"))
    return F.struct(col.cast("string").alias("string"))


def tag_types_externally(df: DataFrame, col: str) -> Column:
    """tag_types_externally -> JSON string with externally-tagged values
    (cue example: 123 -> {"integer": 123})."""
    return F.to_json(_tag(_c(col), _dtype(df, col)))


# ---------------------------------------------------------------------------
# Coercion fail-variants (int.cue, float.cue, bool.cue, string.cue,
# array.cue, object.cue, timestamp.cue): VRL `int!(.x)` aborts unless the
# value is an integer.  Statically typed, the check moves to plan time:
# wrong dtype raises when the expression is BUILT, matching VRL's
# compile-time type error rather than its runtime abort.


def _coerce(df: DataFrame, col: str, klasses: tuple, name: str) -> Column:
    dt = _dtype(df, col)
    if dt is None or not isinstance(dt, klasses):
        raise TypeError(f"{name}: column {col!r} has dtype {dt}, not {name}")
    return _c(col)


def int_(df: DataFrame, col: str) -> Column:
    return _coerce(df, col, _INTEGRAL, "integer")


def float_(df: DataFrame, col: str) -> Column:
    return _coerce(df, col, _FLOATING, "float")


def bool_(df: DataFrame, col: str) -> Column:
    return _coerce(df, col, (T.BooleanType,), "boolean")


def string_(df: DataFrame, col: str) -> Column:
    return _coerce(df, col, (T.StringType,), "string")


def array_(df: DataFrame, col: str) -> Column:
    return _coerce(df, col, (T.ArrayType,), "array")


def object_(df: DataFrame, col: str) -> Column:
    return _coerce(df, col, (T.StructType, T.MapType), "object")


def timestamp_(df: DataFrame, col: str) -> Column:
    return _coerce(df, col, (T.TimestampType, T.TimestampNTZType), "timestamp")


def to_regex(pattern: Column | str) -> Column:
    """to_regex (to_regex.cue): VRL builds a runtime regex from a string;
    Spark's regexp functions take the pattern string directly, so this is
    the identity on the pattern column (documented for parity; the cue doc
    itself discourages use)."""
    return _c(pattern)


# ---------------------------------------------------------------------------
# Iteration (for_each.cue, map_keys.cue, map_values.cue): closures over
# collections == Spark higher-order functions.


def for_each(col: Column | str, fn) -> Column:
    """for_each over an array (for_each.cue) ≡ ``F.transform`` — VRL's
    side-effecting loop has no lazy analogue, but every documented use is
    an accumulate/transform, which HOFs express."""
    return F.transform(_c(col), fn)


# ---------------------------------------------------------------------------
# Debug (assert.cue, assert_eq.cue, log.cue) — eager driver checks.


def vrl_assert(df: DataFrame, cond: Column, message: str = "assertion failed") -> DataFrame:
    """assert (assert.cue): abort if any row violates ``cond``.  Eager
    (runs a count) — use in tests/dev like VRL's assert, not in the hot
    path."""
    n = df.filter(~F.coalesce(cond, F.lit(False))).count()
    if n:
        raise AssertionError(f"{message}: {n} rows violate the condition")
    return df


def vrl_assert_eq(df: DataFrame, left: Column, right: Column, message: str = "assert_eq failed") -> DataFrame:
    """assert_eq (assert_eq.cue): null-safe equality on every row."""
    return vrl_assert(df, left.eqNullSafe(right), message)


def vrl_log(df: DataFrame, message: str, level: str = "info") -> DataFrame:
    """log (log.cue): driver-side print; returns the frame unchanged so it
    chains inside a pipeline definition."""
    print(f"[{level.upper()}] {message}")
    return df
