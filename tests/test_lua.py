"""The Lua-subset runtime (vector_spark/lua/): language semantics +
the reference lua transform's test corpus ported driver-side.

Golden sources come from src/transforms/lua/v2/mod.rs `mod tests`
(lua_add_field .. lua_multiple_events) and tests/behavior/transforms/
lua_v1.toml / lua_v2.toml — the Lua snippets are the reference's own
test fixtures, executed here by OUR interpreter with the same expected
outcomes.
"""

from __future__ import annotations

import os

import pytest

from vector_spark.lua import (
    LuaError,
    LuaRuntime,
    LuaSyntaxError,
    LuaTable,
)
from vector_spark.operators.lua import (
    LuaTransformConfig,
    lua_to_py,
    py_to_lua,
    run_lua_events,
)


@pytest.fixture()
def rt():
    return LuaRuntime()


def run(src, rt=None):
    return (rt or LuaRuntime()).run(src)


# ---------------------------------------------------------------------
# language core
# ---------------------------------------------------------------------

class TestLanguage:
    def test_arithmetic_subtypes(self):
        # Lua 5.4: / and ^ are float; // floor; ints wrap at 64 bits
        assert run("return 1+2") == [3]
        assert run("return 3/2") == [1.5]
        assert run("return 7//2, -7//2, 7%3, -7%3") == [3, -4, 1, 2]
        assert run("return 2^10") == [1024.0]
        assert run("return math.maxinteger + 1") == [-(1 << 63)]
        assert run("return 10 // 0.0") == [float("inf")]
        with pytest.raises(LuaError, match="n//0"):
            run("return 10 // 0")

    def test_number_formatting(self):
        assert run("return tostring(3)") == ["3"]
        assert run("return tostring(3.0)") == ["3.0"]
        assert run("return tostring(3.14159)") == ["3.14159"]
        assert run("return 'n=' .. 42 .. '/' .. 2.5") == ["n=42/2.5"]

    def test_string_number_coercion(self):
        assert run("return '10' + 5") == [15]
        assert run("return tonumber('0x1F'), tonumber('x')") == [31, None]
        with pytest.raises(LuaError, match="attempt to perform arithmetic"):
            run("return {} + 1")

    def test_comparisons_and_equality(self):
        assert run("return 1 < 2, 'a' < 'b', 1 == 1.0, '1' == 1") == [
            True, True, True, False]
        with pytest.raises(LuaError, match="attempt to compare"):
            run("return 1 < 'a'")

    def test_short_circuit(self):
        assert run("return nil and error('never'), false or 'dflt'") == [None, "dflt"]
        assert run("local x = nil return x or 5") == [5]

    def test_multiple_returns_and_truncation(self):
        assert run("local function f() return 1,2,3 end return f()") == [1, 2, 3]
        assert run("local function f() return 1,2,3 end return (f())") == [1]
        assert run("local function f() return 1,2 end local a,b,c = f() return c") == [None]
        assert run("local function f() return 2,3 end return 1, f()") == [1, 2, 3]
        # non-tail call truncates to one value
        assert run("local function f() return 2,3 end return f(), 9") == [2, 9]

    def test_closures_share_upvalues(self):
        assert run(
            """
            local function mk()
              local n = 0
              local function inc() n = n + 1 end
              local function get() return n end
              return inc, get
            end
            local inc, get = mk()
            inc() inc() inc()
            return get()
            """
        ) == [3]

    def test_control_flow(self):
        assert run("local s=0 for i=1,10,2 do s=s+i end return s") == [25]
        assert run("local s=0 for i=10,1,-3 do s=s+i end return s") == [22]
        assert run("local i=0 while i<5 do i=i+1 end return i") == [5]
        assert run("local i=0 repeat i=i+1 until i>=3 return i") == [3]
        assert run(
            "local s=0 for i=1,100 do if i>3 then break end s=s+i end return s"
        ) == [6]

    def test_tables(self):
        assert run("local t={10,20,30} return #t, t[2]") == [3, 20]
        assert run("local t={a=1, b=2} t.c = t.a + t.b return t.c") == [3]
        assert run("local t={} t[true]='T' t[1]='one' return t[true], t[1]") == ["T", "one"]
        assert run("local t={'a','b'} table.insert(t, 'c') return table.concat(t)") == ["abc"]
        assert run("local t={'a','b','c'} table.insert(t, 1, 'z') return t[1], #t") == ["z", 4]
        assert run("local t={3,1,2} table.sort(t) return t[1], t[3]") == [1, 3]
        assert run("local t={1,2,3} return table.remove(t), #t") == [3, 2]

    def test_generic_for(self):
        assert run(
            """
            local t = {x=1, y=2, z=3}
            local sum = 0
            for k, v in pairs(t) do sum = sum + v end
            return sum
            """
        ) == [6]
        assert run(
            """
            local t = {5, 6, 7}
            local s = ''
            for i, v in ipairs(t) do s = s .. i .. ':' .. v .. ' ' end
            return s
            """
        ) == ["1:5 2:6 3:7 "]

    def test_varargs_and_select(self):
        assert run("local function f(...) return select('#', ...) end return f(1,nil,3)") == [3]
        assert run("local function f(...) return select(2, ...) end return f('a','b','c')") == ["b", "c"]

    def test_metatables(self):
        assert run(
            """
            local base = {greet = function(self) return 'hi ' .. self.name end}
            local obj = setmetatable({name = 'bob'}, {__index = base})
            return obj:greet()
            """
        ) == ["hi bob"]
        assert run(
            """
            local t = setmetatable({}, {__call = function(self, x) return x * 2 end})
            return t(21)
            """
        ) == [42]
        assert run(
            """
            local mt = {__tostring = function(t) return 'custom!' end}
            return tostring(setmetatable({}, mt))
            """
        ) == ["custom!"]

    def test_pcall_error(self):
        ok, err = run("return pcall(function() error('boom') end)")
        assert ok is False and "boom" in err
        # error values needn't be strings
        ok, err = run("return pcall(function() error({code = 42}) end)")
        assert ok is False and isinstance(err, LuaTable) and err.get("code") == 42
        assert run("return pcall(function() return 7 end)") == [True, 7]

    def test_syntax_error_format(self):
        with pytest.raises(LuaSyntaxError, match="syntax error:"):
            run("1234 = sadf <>&*!#@")
        with pytest.raises(LuaSyntaxError):
            run("if true then")
        with pytest.raises(LuaSyntaxError, match="goto"):
            run("goto done ::done::")

    def test_stack_overflow_is_lua_error(self):
        ok, err = run("local function f() return f() + 1 end return pcall(f)")
        assert ok is False and "stack overflow" in str(err)

    def test_string_methods_on_values(self):
        assert run("return ('abc'):upper(), ('ABC'):lower(), ('ab'):rep(3)") == [
            "ABC", "abc", "ababab"]
        assert run("return ('hello'):len(), ('hello'):sub(2, 4)") == [5, "ell"]
        assert run("return ('hello'):byte(1), string.char(104, 105)") == [104, "hi"]

    def test_string_format(self):
        assert run(
            "return string.format('%d|%5.2f|%s|%x|%q', 42, 3.14159, 'hi', 255, 'a\"b')"
        ) == ['42| 3.14|hi|ff|"a\\"b"']

    def test_bitwise(self):
        assert run("return 6 & 3, 6 | 3, 6 ~ 3, ~0, 1 << 4, 256 >> 4") == [
            2, 7, 5, -1, 16, 16]

    def test_os_date_time(self):
        assert run(
            "local t = os.date('!*t', 0) return t.year, t.month, t.day, t.hour, t.isdst"
        ) == [1970, 1, 1, 0, False]
        assert run("return os.time({year=1970, month=1, day=2, hour=0})") == [86400]
        assert run("return os.date('!%Y-%m-%d', 86400)") == ["1970-01-02"]

    def test_require_from_search_dirs(self, tmp_path):
        (tmp_path / "mymod.lua").write_text(
            "local M = {}\nfunction M.double(x) return x * 2 end\nreturn M\n")
        rt = LuaRuntime(search_dirs=[str(tmp_path)])
        assert rt.run("local m = require('mymod') return m.double(21)") == [42]
        # cached: second require returns the same module table
        assert rt.run(
            "return require('mymod') == require('mymod')") == [True]
        with pytest.raises(LuaError, match="not found"):
            rt.run("require('nope')")

    def test_long_strings_and_comments(self):
        assert run("--[[ block\ncomment ]] return [[long\nstring]]") == ["long\nstring"]
        assert run("return [==[ with ]] inside ]==]") == [" with ]] inside "]


# ---------------------------------------------------------------------
# lua patterns (string.find/match/gmatch/gsub)
# ---------------------------------------------------------------------

class TestPatterns:
    def test_find_with_captures(self):
        # the reference's lua_read_field fixture (v2/mod.rs tests)
        assert run(
            "return string.find('Hello, my name is Bob.', 'Hello, my name is (%a+).')"
        ) == [1, 22, "Bob"]

    def test_classes_and_sets(self):
        assert run("return string.match('abc123', '%a+'), string.match('abc123', '%d+')") == ["abc", "123"]
        assert run("return string.match('x42y', '[0-9]+')") == ["42"]
        assert run("return string.match('x42y', '[^0-9]+')") == ["x"]
        assert run("return string.match('A_b', '%u'), string.match('A_b', '%l')") == ["A", "b"]

    def test_quantifiers(self):
        assert run("return string.match('aaa', 'a*'), string.match('bbb', 'a*b')") == ["aaa", "b"]
        assert run("return string.match('<<x>>', '<(.-)>'), string.match('<<x>>', '<(.*)>')") == ["<x", "<x>"]
        assert run("return string.match('color colour', 'colou?r')") == ["color"]

    def test_anchors(self):
        assert run("return string.match('hello', '^h'), string.match('hello', 'o$')") == ["h", "o"]
        assert run("return string.find('xhello', '^h')") == [None]

    def test_balanced_and_frontier(self):
        assert run("return string.match('fn(a(b)c) rest', '%b()')") == ["(a(b)c)"]
        assert run(
            "return string.gsub('THE (quick) brOwn FOx', '%f[%a]%u+%f[%A]', 'X')"
        ) == ["X (quick) brOwn FOx", 1]

    def test_backref_and_position(self):
        assert run("return string.match('abcabc', '(abc)%1')") == ["abc"]
        assert run("return string.match('hello', 'l()l')") == [4]

    def test_gsub_forms(self):
        assert run("return string.gsub('hello world', 'o', '0')") == ["hell0 w0rld", 2]
        assert run("return string.gsub('hello world', 'o', '0', 1)") == ["hell0 world", 1]
        assert run("return string.gsub('abc', '%w', function(c) return c:upper() end)") == ["ABC", 3]
        assert run(
            "return string.gsub('$name is in $city', '%$(%w+)', {name='bob', city='NYC'})"
        ) == ["bob is in NYC", 2]
        assert run("return string.gsub('ab', 'x?', '-')") == ["-a-b-", 3]
        assert run("return string.gsub('hi', '(h)(i)', '%2%1')") == ["ih", 1]

    def test_gmatch(self):
        assert run(
            """
            local t = {}
            for k, v in string.gmatch('a=1, b=2', '(%w+)=(%w+)') do t[k] = v end
            return t.a, t.b
            """
        ) == ["1", "2"]

    def test_plain_find(self):
        assert run("return string.find('a+b', '+', 1, true)") == [2, 2]
        assert run("return string.find('a.b%c', '%c', 1, true)") == [4, 5]

    def test_trim_idiom(self):
        assert run("return string.match('  trim  ', '^%s*(.-)%s*$')") == ["trim"]


# ---------------------------------------------------------------------
# the reference transform test corpus, driver-side
# (src/transforms/lua/v2/mod.rs `mod tests` + behavior toml)
# ---------------------------------------------------------------------

def v2(process, rows, **kw):
    return run_lua_events(
        LuaTransformConfig(version="2", process=process, **kw), rows)


class TestV2Corpus:
    def test_lua_add_field(self):
        out = v2(
            'function (event, emit)\n'
            '  event["log"]["hello"] = "goodbye"\n'
            '  emit(event)\nend',
            [{"message": "program me"}])
        assert out == [{"log": {"message": "program me", "hello": "goodbye"}}]

    def test_lua_read_field(self):
        out = v2(
            'function (event, emit)\n'
            '  _, _, name = string.find(event.log.message, "Hello, my name is (%a+).")\n'
            '  event.log.name = name\n'
            '  emit(event)\nend',
            [{"message": "Hello, my name is Bob."}])
        assert out[0]["log"]["name"] == "Bob"

    def test_lua_remove_field(self):
        out = v2('function (event, emit) event.log.name = nil emit(event) end',
                 [{"name": "Bob"}])
        assert out == [{"log": {}}]

    def test_lua_drop_event(self):
        assert v2("function (event, emit) end", [{"x": 1}]) == []

    def test_lua_duplicate_event(self):
        out = v2("function (event, emit) emit(event) emit(event) end",
                 [{"host": "127.0.0.1"}])
        assert len(out) == 2
        assert all(e["log"]["host"] == "127.0.0.1" for e in out)

    def test_lua_read_empty_field(self):
        out = v2(
            'function (event, emit)\n'
            '  if event["log"]["non-existant"] == nil then\n'
            '    event["log"]["result"] = "empty"\n'
            '  else\n'
            '    event["log"]["result"] = "found"\n'
            '  end\n'
            '  emit(event)\nend', [{}])
        assert out[0]["log"]["result"] == "empty"

    def test_value_types(self):
        # integer stays int, float stays float, boolean bool (the
        # reference asserts Value::Integer(3) / Value::from(3.14159))
        out = v2('function (event, emit) event.log.number = 3 emit(event) end', [{}])
        assert out[0]["log"]["number"] == 3 and isinstance(out[0]["log"]["number"], int)
        out = v2('function (event, emit) event.log.number = 3.14159 emit(event) end', [{}])
        assert out[0]["log"]["number"] == 3.14159
        out = v2('function (event, emit) event.log.bool = true emit(event) end', [{}])
        assert out[0]["log"]["bool"] is True

    def test_non_coercible_value_removes_field(self):
        out = v2('function (event, emit) event.log.junk = nil emit(event) end', [{}])
        assert "junk" not in out[0]["log"]
        # function-typed values are dropped at conversion (v1/mod.rs:240-248)
        out = v2('function (event, emit) event.log.f = function() end emit(event) end', [{}])
        assert "f" not in out[0]["log"]

    def test_non_string_key_write_errors(self):
        with pytest.raises(LuaError, match="error converting Lua boolean to String"):
            run_lua_events(
                LuaTransformConfig(
                    version="2",
                    process='function (event, emit) event["log"][false] = "hello" emit(event) end'),
                [{}], strict=True)

    def test_non_string_key_read_is_nil(self):
        out = v2('function (event, emit) event.log.result = event.log[false] emit(event) end', [{}])
        assert "result" not in out[0]["log"]

    def test_script_error_drops_event(self):
        with pytest.raises(LuaError, match="this is an error"):
            run_lua_events(
                LuaTransformConfig(version="2",
                                   process='function (event, emit) error("this is an error") end'),
                [{}], strict=True)
        assert v2('function (event, emit) error("x") end', [{}]) == []

    def test_syntax_error(self):
        with pytest.raises(LuaSyntaxError, match="syntax error:"):
            run_lua_events(
                LuaTransformConfig(version="2",
                                   process='function (event, emit)\n 1234 = sadf <>&*!#@\nend'),
                [{}])

    def test_lua_load_file(self, tmp_path):
        (tmp_path / "script2.lua").write_text(
            'local M = {}\n'
            'local function modify(event2)\n'
            '  event2["log"]["new field"] = "new value"\n'
            'end\n'
            'M.modify = modify\n'
            'return M\n')
        out = run_lua_events(
            LuaTransformConfig(
                version="2",
                process=(
                    'function (event, emit)\n'
                    '  local script2 = require("script2")\n'
                    '  script2.modify(event)\n'
                    '  emit(event)\nend'),
                search_dirs=(str(tmp_path),)),
            [{}])
        assert out[0]["log"]["new field"] == "new value"

    def test_lua_pairs(self):
        out = v2(
            'function (event, emit)\n'
            '  for k,v in pairs(event.log) do\n'
            '    event.log[k] = k .. v\n'
            '  end\n'
            '  emit(event)\nend',
            [{"name": "Bob", "friend": "Alice"}])
        assert out[0]["log"] == {"name": "nameBob", "friend": "friendAlice"}

    def test_lua_metric(self):
        out = v2(
            'function (event, emit)\n'
            '  event.metric.counter.value = event.metric.counter.value + 1\n'
            '  emit(event)\nend',
            [{"metric": {"name": "example counter", "kind": "absolute",
                         "counter": {"value": 1.0}}}])
        assert out[0]["metric"]["counter"]["value"] == 2.0
        assert out[0]["metric"]["name"] == "example counter"

    def test_lua_multiple_events(self):
        out = v2(
            'function (event, emit) event.log.hello = "goodbye" emit(event) end',
            [{"message": f"program me {i}"} for i in range(10)])
        assert len(out) == 10
        assert all(e["log"]["hello"] == "goodbye" for e in out)

    # behavior toml (tests/behavior/transforms/lua_v2.toml)
    def test_behavior_rename(self):
        out = v2(
            'function (event, emit)\n'
            '  event.log.a, event.log.b = nil, event.log.a\n'
            '  emit(event)\nend',
            [{"a": "example value"}])
        assert out[0]["log"] == {"b": "example value"}

    def test_behavior_source_named_hook(self):
        out = run_lua_events(
            LuaTransformConfig(
                version="2",
                source=('function hook_process (event, emit)\n'
                        '  event.log.inserted_field = "inserted value"\n'
                        '  emit(event)\nend'),
                process="hook_process"),
            [{"some_field": "some value"}])
        assert out[0]["log"] == {
            "some_field": "some value", "inserted_field": "inserted value"}

    def test_behavior_log_to_metric(self):
        out = v2(
            'function (event, emit)\n'
            '  event.log = nil\n'
            '  event.metric = { name = "example metric", counter = { value = 1.0 } }\n'
            '  emit(event)\nend',
            [{"a": "example value"}])
        assert "log" not in out[0]
        assert out[0]["metric"] == {"name": "example metric", "counter": {"value": 1.0}}

    def test_behavior_metric_to_log(self):
        out = v2(
            'function (event, emit)\n'
            '  event.metric = nil\n'
            '  event.log = { field = "example value" }\n'
            '  emit(event)\nend',
            [{"metric": {"name": "example metric", "kind": "absolute",
                         "counter": {"value": 1.0}}}])
        assert out[0] == {"log": {"field": "example value"}}

    def test_init_shutdown_counter(self):
        # the docs' counter pattern (v2/mod.rs config example)
        out = run_lua_events(
            LuaTransformConfig(
                version="2",
                source=(
                    'count = 0\n'
                    'function process_ev(event, emit) count = count + 1 end\n'
                    'function flush(emit)\n'
                    '  emit({metric = {name = "event_counter", kind = "incremental",\n'
                    '                  counter = {value = count}}})\n'
                    '  count = 0\nend'),
                process="process_ev", shutdown="flush"),
            [{"m": i} for i in range(5)])
        assert len(out) == 1
        assert out[0]["metric"]["counter"]["value"] == 5

    def test_timer_fires_at_flush(self):
        out = run_lua_events(
            LuaTransformConfig(
                version="2",
                source=('n = 0\n'
                        'function p(event, emit) n = n + 1 end\n'
                        'function tick(emit) emit({log = {n = n}}) end'),
                process="p",
                timers=((1, "tick"),)),
            [{}, {}, {}])
        assert out == [{"log": {"n": 3}}]

    def test_hook_name_undefined(self):
        with pytest.raises(LuaError, match="not defined"):
            run_lua_events(
                LuaTransformConfig(version="2", process="nope"), [{}])


class TestV1Corpus:
    def test_behavior_rename(self):
        # tests/behavior/transforms/lua_v1.toml (both versions)
        out = run_lua_events(
            LuaTransformConfig(version="1",
                               source='event["a"], event["b"] = nil, event["a"]'),
            [{"a": "example value"}])
        assert out == [{"b": "example value"}]

    def test_read_coerces_to_string(self):
        # v1/mod.rs:260-267: Index returns coerce_to_bytes
        out = run_lua_events(
            LuaTransformConfig(version="1", source='event["s"] = event["n"] .. "!"'),
            [{"n": 42}])
        assert out[0]["s"] == "42!"

    def test_event_nil_drops(self):
        assert run_lua_events(
            LuaTransformConfig(version="1", source="event = nil"), [{"a": 1}]) == []

    def test_script_error_drops(self):
        assert run_lua_events(
            LuaTransformConfig(version="1", source='error("nope")'), [{"a": 1}]) == []

    def test_typed_writes(self):
        out = run_lua_events(
            LuaTransformConfig(
                version="1",
                source='event["i"] = 3 event["f"] = 2.5 event["b"] = true'),
            [{}])
        assert out[0] == {"i": 3, "f": 2.5, "b": True}

    def test_pairs_over_event(self):
        out = run_lua_events(
            LuaTransformConfig(
                version="1",
                source=('keys = ""\n'
                        'for k, v in pairs(event) do keys = keys .. k .. "=" .. v .. ";" end\n'
                        'event["all"] = keys')),
            [{"a": 1, "b": "x"}])
        assert out[0]["all"] == "a=1;b=x;"


class TestConversions:
    def test_py_to_lua_roundtrip(self):
        v = py_to_lua({"a": [1, 2.5, "x"], "b": {"c": True}})
        back = lua_to_py(v)
        assert back == {"a": [1, 2.5, "x"], "b": {"c": True}}

    def test_datetime_becomes_date_table(self):
        import datetime

        t = py_to_lua(datetime.datetime(2024, 3, 1, 12, 30, 45))
        assert t.get("year") == 2024 and t.get("hour") == 12

    def test_empty_process_rejected(self):
        with pytest.raises(ValueError, match="hooks.process"):
            LuaTransformConfig(version="2")
        with pytest.raises(ValueError, match="source"):
            LuaTransformConfig(version="1")


EXPECTED_REF_TESTS = os.path.exists("/root/reference/src/transforms/lua/v2/mod.rs")


def test_reference_corpus_is_covered():
    """Every #[tokio::test] in the reference's v2 test module has a
    counterpart above (guard against silently losing parity if the
    corpus grows)."""
    if not EXPECTED_REF_TESTS:
        pytest.skip("reference not present")
    import re

    src = open("/root/reference/src/transforms/lua/v2/mod.rs").read()
    names = re.findall(r"async fn (\w+)\(", src)
    ported = {
        "lua_add_field", "lua_read_field", "lua_remove_field",
        "lua_drop_event", "lua_duplicate_event", "lua_read_empty_field",
        "lua_integer_value", "lua_numeric_value", "lua_boolean_value",
        "lua_non_coercible_value", "lua_non_string_key_write",
        "lua_non_string_key_read", "lua_script_error", "lua_syntax_error",
        "lua_load_file", "lua_pairs", "lua_metric", "lua_multiple_events",
    }
    assert set(n for n in names if n.startswith("lua_")) <= ported


class TestCoroutines:
    """coroutine library (Lua §2.6/§6.2; part of mlua's ALL_SAFE set the
    reference loads, v1/mod.rs:114)."""

    def test_generator_pattern(self):
        assert run(
            """
            local g = coroutine.wrap(function()
              for i = 1, 4 do coroutine.yield(i * i) end
            end)
            local s = 0
            for _ = 1, 4 do s = s + g() end
            return s
            """
        ) == [30]

    def test_values_both_ways_and_status(self):
        assert run(
            """
            local co = coroutine.create(function(a, b)
              local c = coroutine.yield(a + b)
              return c * 2
            end)
            local ok1, v1 = coroutine.resume(co, 3, 4)
            local st = coroutine.status(co)
            local ok2, v2 = coroutine.resume(co, 10)
            return ok1, v1, st, ok2, v2, coroutine.status(co)
            """
        ) == [True, 7, "suspended", True, 20, "dead"]

    def test_dead_resume(self):
        assert run(
            """
            local co = coroutine.create(function() end)
            coroutine.resume(co)
            return coroutine.resume(co)
            """
        ) == [False, "cannot resume dead coroutine"]

    def test_error_propagates_as_failed_resume(self):
        ok, err = run(
            """
            local co = coroutine.create(function() error('inner') end)
            return coroutine.resume(co)
            """
        )
        assert ok is False and "inner" in err

    def test_generic_for_over_wrap(self):
        assert run(
            """
            local function range(n)
              return coroutine.wrap(function()
                for i = 1, n do coroutine.yield(i) end
              end)
            end
            local s = 0
            for i in range(5) do s = s + i end
            return s
            """
        ) == [15]

    def test_nested_coroutines(self):
        assert run(
            """
            local inner = coroutine.create(function()
              coroutine.yield('deep')
              return 'done'
            end)
            local outer = coroutine.create(function()
              local _, v = coroutine.resume(inner)
              coroutine.yield(v)
              return 'outer-done'
            end)
            local _, a = coroutine.resume(outer)
            local _, b = coroutine.resume(outer)
            return a, b
            """
        ) == ["deep", "outer-done"]

    def test_yield_outside_coroutine_errors(self):
        assert run("return coroutine.isyieldable()") == [False]
        ok, err = run("return pcall(coroutine.yield)")
        assert ok is False and "outside a coroutine" in err


class TestUtf8:
    def test_utf8_basics(self):
        assert run("return utf8.char(72, 105, 233)") == ["Hié"]
        assert run("return utf8.len('héllo')") == [5]
        assert run("return utf8.codepoint('héllo', 1, 3)") == [104, 233]
        assert run("return utf8.offset('héllo', 3)") == [4]


def test_load_builtin():
    assert run("local f = load('return 1 + 1') return f()") == [2]
    f, err = run("return load('syntax ??? error')")
    assert f is None and "syntax error" in err
    # loaded chunks see globals
    assert run("n = 5 local f = load('return n * 2') return f()") == [10]


# ---------------------------------------------------------------------
# round-5 additions: utf8.codes, table.move, coroutine.close + thread
# release, pattern/lexer error shapes (ADVICE r4), state codec
# ---------------------------------------------------------------------

class TestUtf8Codes:
    def test_manual_iteration_idiom(self):
        # the Lua 5.4 manual's canonical loop (§6.5 utf8.codes)
        assert run(
            """
            local out = {}
            for p, c in utf8.codes("héllo") do
              out[#out+1] = p .. ":" .. c
            end
            return table.concat(out, ",")
            """
        ) == ["1:104,2:233,4:108,5:108,6:111"]

    def test_empty_and_ascii(self):
        assert run(
            "local n = 0 for p, c in utf8.codes('') do n = n + 1 end return n"
        ) == [0]
        assert run(
            """
            local ps, cs = {}, {}
            for p, c in utf8.codes("ab") do ps[#ps+1]=p cs[#cs+1]=c end
            return ps[1], ps[2], cs[1], cs[2]
            """
        ) == [1, 2, 97, 98]


class TestTableMove:
    def test_move_to_other_table(self):
        assert run(
            "local a={1,2,3} local b={} table.move(a,1,3,1,b)"
            " return table.concat(b,',')"
        ) == ["1,2,3"]

    def test_overlapping_forward_move(self):
        # memmove semantics: t={1,2,3,4,5}; move(t,1,3,2) -> {1,1,2,3,5}
        assert run(
            "local t={1,2,3,4,5} table.move(t,1,3,2)"
            " return table.concat(t,',')"
        ) == ["1,1,2,3,5"]

    def test_returns_destination(self):
        assert run(
            "local a={7} local b=table.move(a,1,1,1,{}) return b[1]"
        ) == [7]

    def test_empty_range(self):
        assert run(
            "local t={1,2} table.move(t,2,1,1) return table.concat(t,',')"
        ) == ["1,2"]


class TestCoroutineClose:
    def test_close_suspended(self):
        assert run(
            """
            local co = coroutine.create(function()
              coroutine.yield(1)
              return 2
            end)
            local ok, v = coroutine.resume(co)
            local closed = coroutine.close(co)
            return ok, v, closed, coroutine.status(co)
            """
        ) == [True, 1, True, "dead"]

    def test_close_dead_is_true(self):
        assert run(
            """
            local co = coroutine.create(function() return 1 end)
            coroutine.resume(co)
            return coroutine.close(co)
            """
        ) == [True]

    def test_close_running_errors(self):
        ok, err = run(
            """
            return pcall(function()
              local co
              co = coroutine.create(function() coroutine.close(co) end)
              local ok, e = coroutine.resume(co)
              if not ok then error(e) end
            end)
            """
        )
        assert ok is False and "cannot close a running coroutine" in err

    def test_abandoned_coroutines_release_threads(self):
        # ADVICE r4 (medium): 50 abandoned suspended coroutines used to
        # leak 50 daemon threads; close_coroutines() must reclaim them
        import threading
        import time

        # delta-based: the full suite runs with Spark/py4j background
        # threads alive, so absolute counts are meaningless
        before = threading.active_count()
        it = LuaRuntime()
        it.run(
            """
            for i = 1, 50 do
              local co = coroutine.create(function() coroutine.yield(i) end)
              coroutine.resume(co)
            end
            """
        )
        assert threading.active_count() >= before + 50
        it.close_coroutines()
        deadline = time.time() + 5
        while threading.active_count() > before + 2 and time.time() < deadline:
            time.sleep(0.05)
        assert threading.active_count() <= before + 2

    def test_closed_coroutine_cannot_resume(self):
        assert run(
            """
            local co = coroutine.create(function() coroutine.yield() end)
            coroutine.resume(co)
            coroutine.close(co)
            local ok, e = coroutine.resume(co)
            return ok, e
            """
        ) == [False, "cannot resume dead coroutine"]


class TestPatternErrorShapes:
    def test_percent_zero_backref_rejected(self):
        # PUC-Lua: "invalid capture index %0" — must not alias the last
        # capture (ADVICE r4)
        ok, err = run("return pcall(string.match, 'aa', '(a)%0')")
        assert ok is False and "invalid capture index" in str(err)

    def test_bare_close_paren_rejected_in_gsub(self):
        # real Lua rejects pattern ')' as "invalid pattern capture"; the
        # literal fast path must not accept it (ADVICE r4)
        ok, err = run("return pcall(string.gsub, 'a)b', ')', 'x')")
        assert ok is False and "invalid pattern capture" in str(err)

    def test_literal_close_bracket_still_works(self):
        assert run("return (string.gsub('a]b', ']', 'x'))") == ["axb"]


class TestLexerEscapeErrors:
    def test_invalid_hex_escape_is_syntax_error(self):
        # used to leak a host ValueError (ADVICE r4)
        from vector_spark.lua import LuaSyntaxError

        with pytest.raises(LuaSyntaxError, match="hexadecimal digit expected"):
            run(r"return '\xzz'")

    def test_decimal_escape_too_large(self):
        from vector_spark.lua import LuaSyntaxError

        with pytest.raises(LuaSyntaxError, match="decimal escape too large"):
            run(r"return '\300'")

    def test_unicode_escape_bad_digit(self):
        from vector_spark.lua import LuaSyntaxError

        with pytest.raises(LuaSyntaxError, match="hexadecimal digit expected"):
            run(r"return '\u{zz}'")

    def test_valid_escapes_still_work(self):
        assert run(r"return '\x41\65\u{48}'") == ["AAH"]


class TestStateCodec:
    def test_integer_keys_survive_roundtrip(self):
        # ADVICE r4 (medium): plain json stringified non-sequential
        # integer table keys (t[42] -> t['42'])
        import json

        from vector_spark.lua import LuaTable
        from vector_spark.operators.lua import state_decode, state_encode

        it = LuaRuntime()
        (t,) = it.run("local t = {} t[42] = 'a' t[7] = 'b' return t")
        restored = state_decode(json.loads(json.dumps(state_encode(t))))
        assert isinstance(restored, LuaTable)
        assert restored.get(42) == "a"
        assert restored.get(7) == "b"
        assert restored.get("42") is None

    def test_mixed_key_types(self):
        import json

        from vector_spark.operators.lua import state_decode, state_encode

        it = LuaRuntime()
        (t,) = it.run(
            "local t = {} t[1]='one' t['1']='str-one' t[2.5]='f'"
            " t[true]='b' return t"
        )
        r = state_decode(json.loads(json.dumps(state_encode(t))))
        assert r.get(1) == "one"
        assert r.get("1") == "str-one"
        assert r.get(2.5) == "f"
        assert r.get(True) == "b"

    def test_nested_tables_and_scalars(self):
        import json

        from vector_spark.operators.lua import state_decode, state_encode

        it = LuaRuntime()
        (t,) = it.run(
            "return {count = 3, inner = {[10] = 'x'}, pi = 3.5, flag = false}"
        )
        r = state_decode(json.loads(json.dumps(state_encode(t))))
        assert r.get("count") == 3
        assert isinstance(r.get("count"), int)
        assert r.get("pi") == 3.5
        assert r.get("flag") is False
        assert r.get("inner").get(10) == "x"

    def test_function_values_dropped(self):
        import json

        from vector_spark.operators.lua import state_decode, state_encode

        it = LuaRuntime()
        (t,) = it.run("return {f = function() end, keep = 1}")
        r = state_decode(json.loads(json.dumps(state_encode(t))))
        assert r.get("keep") == 1
        assert r.get("f") is None


class TestStateCodecLegacyCompat:
    def test_legacy_plain_values_restore(self):
        """Checkpoints written before the tagged format stored plain
        lua_to_py JSON; state_decode must restore them, not crash."""
        from vector_spark.operators.lua import state_decode

        assert state_decode(5) == 5
        assert state_decode("x") == "x"
        assert state_decode(None) is None
        t = state_decode({"a": 1, "b": [1, 2]})
        assert t.get("a") == 1
        assert t.get("b").get(1) == 1 and t.get("b").get(2) == 2
