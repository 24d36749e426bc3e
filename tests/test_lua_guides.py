"""The reference's three advanced Lua guides ported onto the
from-scratch runtime (website/content/en/guides/advanced/):

- parsing-csv-logs-with-lua.md — a loadable Lua CSV module (the guide
  downloads lua-csv; network is unavailable here, so an equivalent
  module WRITTEN IN LUA is vendored inline — same ``openstring(...)
  :lines()()`` surface, exercising closures, methods, and patterns)
- custom-aggregations-with-lua.md — init/process/timers/shutdown
  counter with shared globals
- merge-multiline-logs-with-lua.md — stateful cross-event merging with
  the safe_merge bound

The guides' published snippets carry two doc bugs that real Lua also
rejects or mis-runs (``return metric = {...}`` is a syntax error; the
init sets ``count`` but handlers read ``counter``; the merge hook calls
an undefined ``merge()``) — the ports use the obviously-intended
corrected forms and note each fix.
"""

from __future__ import annotations

import pytest

from vector_spark.operators.lua import LuaTransformConfig, run_lua_events

# An equivalent of lua-csv's surface, in Lua: quoted fields (spanning
# newlines, like real CSV records), embedded commas, ""-escapes.
CSV_LUA = r"""
local M = {}

-- parse one record starting at pos; quoted fields may span newlines
-- (exactly why the merge guide's field-count check works on a partial
-- record: an unterminated quote swallows the rest)
local function parse_record(s, pos)
  local fields = {}
  local n = #s
  if pos > n then
    return nil, pos
  end
  while true do
    local c = s:sub(pos, pos)
    local value
    if c == '"' then
      value = ""
      pos = pos + 1
      while true do
        local q = s:find('"', pos, true)
        if q == nil then
          value = value .. s:sub(pos)
          pos = n + 1
          break
        end
        value = value .. s:sub(pos, q - 1)
        if s:sub(q + 1, q + 1) == '"' then
          value = value .. '"'
          pos = q + 2
        else
          pos = q + 1
          break
        end
      end
    else
      local stop = s:find('[,\r\n]', pos)
      if stop == nil then
        value = s:sub(pos)
        pos = n + 1
      else
        value = s:sub(pos, stop - 1)
        pos = stop
      end
    end
    table.insert(fields, value)
    if pos > n then
      return fields, pos
    end
    local ch = s:sub(pos, pos)
    if ch == ',' then
      pos = pos + 1
      if pos > n then
        table.insert(fields, "")
        return fields, pos
      end
    else -- \r or \n: end of record
      if ch == '\r' and s:sub(pos + 1, pos + 1) == '\n' then
        pos = pos + 2
      else
        pos = pos + 1
      end
      return fields, pos
    end
  end
end

function M.openstring(s)
  local obj = {s = s}
  function obj.lines(self)
    local pos = 1
    return function()
      local fields
      fields, pos = parse_record(self.s, pos)
      return fields
    end
  end
  return obj
end

return M
"""

# PostgreSQL csvlog column names from the guide
PG_COLUMNS = [
    "log_time", "user_name", "database_name", "process_id",
    "connection_from", "session_id", "session_line_num", "command_tag",
    "session_start_time", "virtual_transaction_id", "transaction_id",
    "error_severity", "sql_state_code", "message", "detail", "hint",
    "internal_query", "internal_query_pos", "context", "query",
    "query_pos", "location", "application_name",
]


@pytest.fixture()
def csv_dir(tmp_path):
    (tmp_path / "csv.lua").write_text(CSV_LUA)
    return str(tmp_path)


def test_parsing_csv_logs_guide(csv_dir):
    """parsing-csv-logs-with-lua.md 'Getting Together': require("csv"),
    column_names in source, ipairs loop in the process hook."""
    names = ", ".join(f'"{c}"' for c in PG_COLUMNS)
    cfg = LuaTransformConfig(
        version="2",
        source=(
            'csv = require("csv") -- load external module for parsing CSV\n'
            "column_names = { " + names + " }\n"),
        process="""function (event, emit)
            fields = csv.openstring(event.log.message):lines()() -- parse the `message` field
            event.log.message = nil -- drop the `message` field

            for column, value in ipairs(fields) do -- iterate over CSV columns
              column_name = column_names[column] -- get column name
              event.log[column_name] = value -- set the corresponding field in the event
            end

            emit(event) -- emit the transformed event
        end""",
        search_dirs=(csv_dir,))
    line = (
        '2020-04-09 12:48:49.661 UTC,,,1,,localhost.1,1,,'
        '2020-04-09 12:48:49 UTC,,0,LOG,00000,'
        '"ending log output to stderr",,'
        '"Future log output will go to log destination ""csvlog"".",,,,,,,""')
    out = run_lua_events(cfg, [{"message": line}], strict=True)
    assert len(out) == 1
    log = out[0]["log"]
    assert log["log_time"] == "2020-04-09 12:48:49.661 UTC"
    assert log["process_id"] == "1"
    assert log["error_severity"] == "LOG"
    assert log["sql_state_code"] == "00000"
    assert log["message"] == "ending log output to stderr"
    # ""-escape inside a quoted field
    assert log["hint"] == 'Future log output will go to log destination "csvlog".'
    assert log["application_name"] == ""


def test_custom_aggregations_guide():
    """custom-aggregations-with-lua.md 'Keep All Code Together': named
    hooks + timer + shutdown over one shared runtime.  Doc-bug fixes:
    `return metric = {...}` -> `return { metric = {...} }` (the original
    is a Lua syntax error) and the init/handler `count`/`counter`
    naming unified."""
    cfg = LuaTransformConfig(
        version="2",
        source="""
            function init()
              count = 0
            end

            function process()
              count = count + 1
            end

            function timer_handler(emit)
              emit(make_counter(count))
              count = 0
            end

            function shutdown(emit)
              emit(make_counter(count))
            end

            function make_counter(value)
              return {
                metric = {
                  name = "event_counter",
                  kind = "incremental",
                  timestamp = os.date("!*t"),
                  counter = {
                    value = value
                  }
                }
              }
            end
        """,
        init="init", process="process", shutdown="shutdown",
        timers=((5, "timer_handler"),))
    out = run_lua_events(cfg, [{"m": i} for i in range(7)], strict=True)
    # batch flush order: timer (emits 7, resets), then shutdown (emits 0)
    assert [e["metric"]["counter"]["value"] for e in out] == [7, 0]
    assert all(e["metric"]["name"] == "event_counter" for e in out)
    assert out[0]["metric"]["timestamp"]["year"] >= 2020


def test_custom_aggregations_guide_first_implementation():
    """The guide's 'First Implementation' inline-hook form, incl. the
    paren-less ``emit { metric = ... }`` call-with-table syntax."""
    cfg = LuaTransformConfig(
        version="2",
        init="""function (emit)
            count = 0 -- initialize state by setting a global variable
        end""",
        process="""function (event, emit)
            count = count + 1 -- increment the counter and exit
        end""",
        shutdown="""function (emit)
            emit {
              metric = {
                name = "event_counter",
                kind = "incremental",
                counter = {
                  value = count
                }
              }
            }
        end""")
    out = run_lua_events(cfg, [{}, {}, {}], strict=True)
    assert out == [{"metric": {"name": "event_counter", "kind": "incremental",
                               "counter": {"value": 3}}}]


def test_merge_multiline_logs_guide(csv_dir):
    """merge-multiline-logs-with-lua.md with the safety check: global
    merged_event accumulates split CSV lines until all 23 columns are
    present; safe_merge bounds the buffer.  Doc-bug fix: the published
    hook's first line calls an undefined ``merge(event)`` — the prose
    and diagram describe reading the global, which is what runs here."""
    cfg = LuaTransformConfig(
        version="2",
        source=(
            'csv = require("csv")\n'
            "expected_columns = 23\n"
            'line_separator = "\\r\\n"\n'
            """
            function safe_merge(merged_event, event)
              if #merged_event.log.message + #event.log.message > 4096 then
                return nil
              else
                merged_event.log.message = merged_event.log.message ..
                                           line_separator .. event.log.message
                return merged_event
              end
            end
            """),
        process="""function (event, emit)
            if merged_event == nil then
              merged_event = event
            else
              merged_event = safe_merge(merged_event, event)
              if not merged_event then
                return
              end
            end

            fields = csv.openstring(merged_event.log.message):lines()()
            if #fields < expected_columns then
              return -- not all fields are present in the merged event yet
            end

            merged_event.log.csv_fields = fields
            emit(merged_event)
            merged_event = nil
        end""",
        search_dirs=(csv_dir,))
    # one csvlog record split mid-quoted-field across two lines
    part1 = ('2020-04-09 12:48:49.661 UTC,,,1,,localhost.1,1,,'
             '2020-04-09 12:48:49 UTC,,0,LOG,00000,"ending log output')
    part2 = (' to stderr",,,,,,,,,""')
    out = run_lua_events(
        cfg, [{"message": part1}, {"message": part2}], strict=True)
    assert len(out) == 1
    fields = out[0]["log"]["csv_fields"]
    assert len(fields) == 23
    assert fields[13] == "ending log output\r\n to stderr"
    assert out[0]["log"]["message"] == part1 + "\r\n" + part2

    # a second record flows through the now-empty state
    out2 = run_lua_events(
        cfg, [{"message": part1}, {"message": part2},
              {"message": part1}, {"message": part2}], strict=True)
    assert len(out2) == 2
