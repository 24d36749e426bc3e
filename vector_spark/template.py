"""Event-templated strings — the reference's `Template` engine
(src/template.rs:21,142-161): ``"{{ field }}"`` substitutions plus strftime
specifiers, rendered per event.  Used by sink paths (file sink
src/sinks/file/mod.rs:46-89), log_to_metric names/tags, and throttle/route
key fields.

Spark rendering: compile the template ONCE on the driver into a `concat`
Column — stays in codegen.  strftime specifiers render from a timestamp
column via `date_format` (Java pattern translation below covers the
specifiers the reference's sinks use).  A NULL field ⇒ NULL rendered value
(template render failure — callers drop or reroute, matching
log_to_metric.rs:360-377).

For sink paths specifically, prefer ``partitionBy(cols)``: a path template
IS a partition spec in batch land (see sinks.py) — this module is for the
general per-event string case.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_FIELD = re.compile(r"\{\{\s*([\w.\[\]]+)\s*\}\}")

# strftime -> java.text date pattern (the subset Vector's docs/sinks use)
_STRFTIME = {
    "%Y": "yyyy", "%m": "MM", "%d": "dd", "%H": "HH", "%M": "mm", "%S": "ss",
    "%F": "yyyy-MM-dd", "%T": "HH:mm:ss", "%y": "yy", "%j": "DDD", "%e": "d",
    "%b": "MMM", "%B": "MMMM", "%a": "EEE", "%A": "EEEE", "%%": "'%'",
}


def _strftime_to_java(fmt: str) -> str:
    out = []
    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            spec = fmt[i : i + 2]
            if spec not in _STRFTIME:
                raise ValueError(f"unsupported strftime specifier {spec!r}")
            out.append(_STRFTIME[spec])
            i += 2
        else:
            # literal text must be quoted in java date patterns
            j = i
            while j < len(fmt) and fmt[j] != "%":
                j += 1
            lit = fmt[i:j].replace("'", "''")
            out.append(f"'{lit}'" if re.search(r"[A-Za-z]", lit) else lit)
            i = j
    return "".join(out)


def render_template(template: str, ts_col: str | None = None) -> Column:
    """Compile ``template`` to a Column.

    ``{{ field }}`` -> the field's value (dots become struct access);
    ``%``-specifiers -> `date_format(ts_col, ...)` (requires ``ts_col``).
    Everything else is literal.
    """
    pieces: list[Column] = []
    pos = 0
    for m in _FIELD.finditer(template):
        if m.start() > pos:
            pieces.extend(_literal_or_time(template[pos : m.start()], ts_col))
        pieces.append(F.col(m.group(1)).cast("string"))
        pos = m.end()
    if pos < len(template):
        pieces.extend(_literal_or_time(template[pos:], ts_col))
    if not pieces:
        return F.lit("")
    out = pieces[0]
    for p in pieces[1:]:
        out = F.concat(out, p)
    return out


def _literal_or_time(text: str, ts_col: str | None) -> list[Column]:
    if "%" not in text:
        return [F.lit(text)]
    if ts_col is None:
        raise ValueError(f"template piece {text!r} has strftime specifiers but no ts_col")
    return [F.date_format(F.col(ts_col), _strftime_to_java(text))]
