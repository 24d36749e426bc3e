"""Multiline aggregation — the batch rendering of the reference's line
aggregator (src/line_agg.rs:24-69: modes ContinueThrough / ContinuePast /
HaltBefore / HaltWith; automaton at line_agg.rs:289-355).

Reference semantics (exact):
- per source key, lines stream in order; a buffer is either open or closed;
- closed + line matching ``start_pattern`` -> buffer opens with that line;
  closed + non-matching line -> the line is emitted alone;
- open + line: the (mode, condition_pattern match) pair decides
  Continue (join), EndInclude (join and close), or EndExclude (close and
  REPROCESS the line as if the buffer were empty — line_agg.rs:170-180:
  the stashed line re-enters ``handle_line``);
- aggregation joins lines with "\n" (line_agg.rs merge).

Spark-first rendering: the one-bit buffer automaton has a closed form.
Classify every line by how it forces the post-line state:

  RESET_OPEN   state := open     RESET_CLOSED state := closed
  IDENTITY     state unchanged   TOGGLE       state := !state

(per mode, a pure function of the line's start/condition matches — table
in ``_classify``).  Then the state BEFORE line i is

  state_at_last_reset  XOR  parity(toggles since that reset)

— two running window aggregates (last value ignoring nulls + running sum),
no sequential scan, no UDF: the whole operator is three window functions
over (key ORDER BY line_no) plus one hash aggregate.  The shuffle is one
exchange on the source key — the same per-key sequentiality the reference
has, but every key processed in parallel and every step in codegen.

The timeout-based partial flush (line_agg.rs timeouts) is a liveness
mechanism for tailing; batch inputs are complete so the drain path (flush
everything at end of stream) is the semantic rendered here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MODES = ("continue_through", "continue_past", "halt_before", "halt_with")


def _classify(mode: str, s, c):
    """Post-line state action as (reset_val nullable, toggle bool) columns.

    Derived from the reference's decision table (line_agg.rs:301-320) plus
    EndExclude reprocessing:

    mode              RESET_OPEN   RESET_CLOSED   IDENTITY   TOGGLE
    continue_through  s            !s & !c        !s & c     —
    continue_past     c & s        !c & !s        c & !s     !c & s
    halt_before       s            !s & c         !s & !c    —
    halt_with         !c & s       c & !s         !c & !s    c & s
    """
    T, Fa = F.lit(True), F.lit(False)
    if mode == "continue_through":
        open_, closed, toggle = s, ~s & ~c, Fa
    elif mode == "continue_past":
        open_, closed, toggle = c & s, ~c & ~s, ~c & s
    elif mode == "halt_before":
        open_, closed, toggle = s, ~s & c, Fa
    elif mode == "halt_with":
        open_, closed, toggle = ~c & s, c & ~s, c & s
    else:
        raise ValueError(f"unknown multiline mode {mode!r}; one of {MODES}")
    reset = F.when(open_, F.lit(1)).when(closed, F.lit(0))
    return reset, toggle


def line_agg(
    df: DataFrame,
    start_pattern: str,
    condition_pattern: str,
    mode: str,
    key_cols: list[str] | None = None,
    line_col: str = "line",
    line_no_col: str = "line_no",
    out_col: str = "message",
) -> DataFrame:
    """Aggregate consecutive lines into multiline messages.

    Input: one row per line with a per-key ordering column (``line_no`` —
    the file reader provides byte offset or line index).  Output: one row
    per aggregated message: key cols, ``out_col`` ("\\n"-joined lines),
    ``first_line_no``, ``last_line_no``, ``n_lines``.

    Equivalent configs to the reference's file source: legacy
    ``multiline.marker`` = (start=marker, condition=marker, halt_before)
    (line_agg.rs Config::for_legacy).
    """
    keys = key_cols or []
    s = F.col(line_col).rlike(start_pattern)
    c = F.col(line_col).rlike(condition_pattern)
    reset, toggle = _classify(mode, s, c)

    w_prev = (
        Window.partitionBy(*keys).orderBy(line_no_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(*keys).orderBy(line_no_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )

    ann = df.withColumn("_reset", reset).withColumn(
        "_tog", toggle.cast("int")
    ).withColumn("_rt", F.sum("_tog").over(w_run))
    # state and running-toggle-count AS OF the previous line's reset
    ann = ann.withColumn(
        "_last_reset_state", F.last("_reset", ignorenulls=True).over(w_prev)
    ).withColumn(
        "_rt_at_reset",
        F.last(F.when(F.col("_reset").isNotNull(), F.col("_rt")), ignorenulls=True).over(
            w_prev
        ),
    ).withColumn("_rt_prev", F.col("_rt") - F.col("_tog"))
    # open_before = state_at_last_reset XOR parity(toggles since reset);
    # before any reset the initial state is closed (0)
    base = F.coalesce(F.col("_last_reset_state"), F.lit(0))
    since = F.col("_rt_prev") - F.coalesce(F.col("_rt_at_reset"), F.lit(0))
    open_before = (base + since) % 2 == 1

    if mode == "continue_through":
        join = open_before & c
    elif mode == "halt_before":
        join = open_before & ~c
    else:  # continue_past / halt_with: an open buffer always absorbs the line
        join = open_before
    ann = ann.withColumn("_boundary", (~join).cast("int")).withColumn(
        "_grp", F.sum("_boundary").over(w_run)
    )
    entries = F.sort_array(
        F.collect_list(F.struct(F.col(line_no_col).alias("n"), F.col(line_col).alias("l")))
    )
    agg = (
        ann.groupBy(*keys, "_grp")
        .agg(
            entries.alias("_e"),
            F.min(line_no_col).alias("first_line_no"),
            F.max(line_no_col).alias("last_line_no"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .withColumn(out_col, F.array_join(F.transform("_e", lambda e: e["l"]), "\n"))
        .drop("_e", "_grp")
    )
    return agg.select(*keys, out_col, "first_line_no", "last_line_no", "n_lines")


def sql_line_agg_halt_before_marker(
    table: str,
    marker_regex: str,
    key_cols: list[str] | None = None,
    line_col: str = "line",
    line_no_col: str = "line_no",
    out_col: str = "message",
) -> str:
    """DuckDB oracle for the legacy marker config (start = condition =
    marker, halt_before — Config::for_legacy): every marker line starts a
    group; leading non-marker lines are singletons.  Closed form: group id
    = running count of marker matches, with pre-marker lines singletons."""
    keys = key_cols or []
    ksel = "".join(f"{k}, " for k in keys)
    kpart = ("PARTITION BY " + ", ".join(keys)) if keys else ""
    re_lit = marker_regex.replace("'", "''")
    return f"""
WITH flagged AS (
  SELECT {ksel}{line_no_col}, {line_col},
         CASE WHEN regexp_matches({line_col}, '{re_lit}') THEN 1 ELSE 0 END AS is_m
  FROM {table}
), grp AS (
  SELECT *,
         SUM(is_m) OVER ({kpart} ORDER BY {line_no_col}
                         ROWS UNBOUNDED PRECEDING) AS m_cnt,
         CASE WHEN SUM(is_m) OVER ({kpart} ORDER BY {line_no_col}
                                   ROWS UNBOUNDED PRECEDING) = 0
              THEN -{line_no_col} ELSE
              SUM(is_m) OVER ({kpart} ORDER BY {line_no_col}
                              ROWS UNBOUNDED PRECEDING) END AS g
  FROM flagged
)
SELECT {ksel}
       string_agg({line_col}, chr(10) ORDER BY {line_no_col}) AS {out_col},
       MIN({line_no_col}) AS first_line_no,
       MAX({line_no_col}) AS last_line_no,
       COUNT(*) AS n_lines
FROM grp GROUP BY {ksel}g
"""
