"""VRL standard library re-expressed as Spark Column builders.

Vector's per-event expression language (VRL) has 156 stdlib functions
(reference: website/cue/reference/remap/functions/*.cue — the in-repo doc
corpus, each with executable examples; SURVEY.md §2.3 maps every category).
This module implements the load-bearing subset as thin, documented wrappers
over built-in `pyspark.sql.functions` so every call stays JVM-side inside
whole-stage codegen — the rebuild's rule is: VRL program ≙ Column
expression tree, compiled once on the driver, vectorized by Tungsten.

Error-handling parity: VRL fallible calls (`f!()`, `?? default`) map to
Spark's null-on-failure semantics (`to_timestamp`, `from_json`, casts all
yield NULL on bad input); callers needing the remap `dropped` port build an
explicit `_error` column (see pipeline.parse_stage).

Functions needing per-row Python are deliberately NOT here; grok lives in
functions/grok.py (compiled to one JVM regex pass).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DataType

from vector_spark.hashing import portable_hash64


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# ---------------------------------------------------------------------------
# Parse (parse_json.cue, parse_key_value.cue, parse_csv.cue, parse_url.cue,
# parse_timestamp.cue, parse_int.cue, parse_duration.cue, parse_regex.cue,
# parse_tokens.cue, parse_query_string.cue)


def parse_json(col: Column | str, schema: DataType | str) -> Column:
    """parse_json: JSON string -> typed value (VRL: fallible).  Schema is
    explicit — Spark is statically typed.  Malformed input yields a struct
    with all-NULL fields (Spark PERMISSIVE mode); gate on a non-nullable
    field or pair with ``F.isnull(F.get_json_object(...))`` when the error
    must be routed (remap ``dropped`` port)."""
    return F.from_json(_c(col), schema)


def parse_key_value(
    col: Column | str, field_delim: str = " ", kv_delim: str = "="
) -> Column:
    """parse_key_value / parse_logfmt: 'k=v k2=v2' -> map<string,string>."""
    return F.str_to_map(_c(col), F.lit(field_delim), F.lit(kv_delim))


parse_logfmt = parse_key_value


def parse_query_string(col: Column | str) -> Column:
    """parse_query_string: 'a=1&b=2' -> map (no URL-decoding of values)."""
    return F.str_to_map(F.regexp_replace(_c(col), r"^\?", ""), F.lit("&"), F.lit("="))


def parse_csv(col: Column | str, schema: str, sep: str = ",") -> Column:
    """parse_csv: one CSV line -> struct (RFC-4180 quoting honored)."""
    return F.from_csv(_c(col), F.lit(schema), {"sep": sep})


def parse_url(col: Column | str) -> Column:
    """parse_url: struct(scheme, host, port, path, query, fragment).

    Built on parse_url()-style SQL; all parts NULL-safe."""
    c = _c(col)
    return F.struct(
        F.parse_url(c, F.lit("PROTOCOL")).alias("scheme"),
        F.parse_url(c, F.lit("HOST")).alias("host"),
        F.parse_url(c, F.lit("QUERY")).alias("query"),
        F.parse_url(c, F.lit("PATH")).alias("path"),
        F.parse_url(c, F.lit("REF")).alias("fragment"),
    )


def parse_timestamp(col: Column | str, fmt: str) -> Column:
    """parse_timestamp: string -> timestamp with explicit format; NULL on
    mismatch (VRL fallible -> try_to_timestamp, never an ANSI error)."""
    return F.try_to_timestamp(_c(col), F.lit(fmt))


def parse_int(col: Column | str, base: int = 10) -> Column:
    """parse_int: string -> int; supports non-10 bases via conv().
    NULL on unparseable input (VRL fallible) in both ANSI modes."""
    if base == 10:
        return _c(col).try_cast("long")
    return F.conv(_c(col), base, 10).try_cast("long")


def parse_duration(col: Column | str, unit: str = "s") -> Column:
    """parse_duration: '1010ms' / '2s' / '3m' / '1h' -> float in ``unit``
    (reference parse_duration.cue; VRL parses to float seconds).  Regex
    split of number + suffix, one pass."""
    c = _c(col)
    num = F.regexp_extract(c, r"^([0-9.]+)\s*([a-zµ]+)$", 1).try_cast("double")
    suf = F.regexp_extract(c, r"^([0-9.]+)\s*([a-zµ]+)$", 2)
    to_secs = (
        F.when(suf == "ns", num / 1e9)
        .when(suf.isin("us", "µs"), num / 1e6)
        .when(suf == "ms", num / 1e3)
        .when(suf == "s", num)
        .when(suf == "m", num * 60)
        .when(suf == "h", num * 3600)
        .when(suf == "d", num * 86400)
    )
    unit_div = {"ns": 1e-9, "us": 1e-6, "ms": 1e-3, "s": 1.0, "m": 60.0, "h": 3600.0, "d": 86400.0}[unit]
    return to_secs / F.lit(unit_div)


def parse_regex(col: Column | str, pattern: str, fields: list[str]) -> Column:
    """parse_regex: named-capture extraction -> struct.  ``pattern`` uses
    numbered groups in ``fields`` order (Spark regexp_extract is index
    based; VRL named groups compile to the same)."""
    c = _c(col)
    return F.struct(
        *[F.regexp_extract(c, pattern, i + 1).alias(f) for i, f in enumerate(fields)]
    )


def parse_regex_all(col: Column | str, pattern: str, group: int = 1) -> Column:
    """parse_regex_all: every match of one group -> array<string>."""
    return F.regexp_extract_all(_c(col), F.lit(pattern), F.lit(group))


# parse_tokens.cue:3-41 — words / "quoted strings" (backslash escapes
# honored) / [bracketed] as tokens
_TOKENS_RE = r'"(?:\\.|[^"\\])*"|\[[^\]]*\]|\S+'


def parse_tokens(col: Column | str) -> Column:
    """parse_tokens: split into words, "quoted" and [bracketed] tokens
    (reference parse_tokens.cue example: apache log line -> tokens)."""
    return F.regexp_extract_all(_c(col), F.lit(_TOKENS_RE), F.lit(0))


# ---------------------------------------------------------------------------
# Codec (encode_base64.cue, decode_base64.cue, encode_base16.cue,
# encode_json.cue, encode_logfmt.cue)


def encode_base64(col: Column | str) -> Column:
    return F.base64(_c(col).cast("binary"))


def decode_base64(col: Column | str) -> Column:
    # try_to_binary: NULL on malformed input in both ANSI modes (unbase64
    # throws on invalid base64 under ANSI sessions).
    return F.try_to_binary(_c(col), F.lit("base64")).cast("string")


def encode_base16(col: Column | str) -> Column:
    return F.lower(F.hex(_c(col).cast("binary")))


def decode_base16(col: Column | str) -> Column:
    return F.try_to_binary(_c(col), F.lit("hex")).cast("string")


def encode_json(col: Column | str) -> Column:
    """encode_json: any struct/map/array -> canonical JSON string."""
    return F.to_json(_c(col))


def encode_logfmt(pairs: dict[str, Column]) -> Column:
    """encode_logfmt: ordered k=v pairs joined by spaces (keys sorted, as
    encode_logfmt.cue specifies lexicographic key order)."""
    parts = [
        F.concat(F.lit(f"{k}="), pairs[k].cast("string")) for k in sorted(pairs)
    ]
    return F.concat_ws(" ", *parts)


# ---------------------------------------------------------------------------
# String (upcase.cue, downcase.cue, contains.cue, starts_with.cue, slice.cue,
# replace.cue, split.cue, truncate.cue, redact.cue, strip_whitespace.cue,
# strip_ansi_escape_codes.cue)

upcase = lambda c: F.upper(_c(c))  # noqa: E731
downcase = lambda c: F.lower(_c(c))  # noqa: E731
strip_whitespace = lambda c: F.trim(_c(c))  # noqa: E731


def contains(col: Column | str, substr: str, case_sensitive: bool = True) -> Column:
    c = _c(col)
    if not case_sensitive:
        return F.contains(F.lower(c), F.lit(substr.lower()))
    return F.contains(c, F.lit(substr))


def starts_with(col: Column | str, prefix: str) -> Column:
    return F.startswith(_c(col), F.lit(prefix))


def ends_with(col: Column | str, suffix: str) -> Column:
    return F.endswith(_c(col), F.lit(suffix))


def slice_(col: Column | str, start: int, end: int | None = None) -> Column:
    """slice: 0-based [start, end) like VRL; Spark substring is 1-based."""
    length = (end - start) if end is not None else 2_000_000_000
    return F.substring(_c(col), start + 1, length)


def replace(col: Column | str, pattern: str, with_: str) -> Column:
    return F.regexp_replace(_c(col), pattern, with_)


def split(col: Column | str, pattern: str, limit: int = -1) -> Column:
    return F.split(_c(col), pattern, limit)


def truncate(col: Column | str, limit: int, suffix: str = "") -> Column:
    c = _c(col)
    cut = F.substring(c, 1, limit)
    return F.when(F.length(c) > limit, F.concat(cut, F.lit(suffix))).otherwise(c)


def redact(col: Column | str, patterns: list[str], redactor: str = "[REDACTED]") -> Column:
    """redact: replace each regex match with the redactor string."""
    c = _c(col)
    for p in patterns:
        c = F.regexp_replace(c, p, redactor)
    return c


def strip_ansi_escape_codes(col: Column | str) -> Column:
    return F.regexp_replace(_c(col), r"\x1b\[[0-9;]*[A-Za-z]", "")


# ---------------------------------------------------------------------------
# Enumerate / Array / Object (compact.cue, flatten.cue, includes.cue,
# length.cue, unique.cue, merge.cue, unnest.cue, append.cue, push.cue,
# chunks.cue, map_keys.cue, map_values.cue)

compact = lambda c: F.array_compact(_c(c))  # noqa: E731
# filter (filter.cue): closure over array/map elements ≡ Spark HOF
filter_ = lambda c, fn: F.filter(_c(c), fn)  # noqa: E731
flatten = lambda c: F.flatten(_c(c))  # noqa: E731
unique = lambda c: F.array_distinct(_c(c))  # noqa: E731
length = lambda c: F.size(_c(c))  # noqa: E731
strlen = lambda c: F.length(_c(c))  # noqa: E731


def includes(col: Column | str, value) -> Column:
    return F.array_contains(_c(col), value)


def append(col: Column | str, items: list) -> Column:
    return F.concat(_c(col), F.array(*[F.lit(i) for i in items]))


def push(col: Column | str, item) -> Column:
    return F.array_append(_c(col), item)


def chunks(col: Column | str, chunk_size: int) -> Column:
    """chunks: array -> array of arrays of at most chunk_size items.

    Empty input -> empty output: n_chunks is clamped to >= 1 (so the
    sequence bound never goes negative/descending) and empty slices are
    filtered — preserves the element type without a cast."""
    c = _c(col)
    n_chunks = F.greatest(F.ceil(F.size(c) / F.lit(chunk_size)).cast("int"), F.lit(1))
    return F.filter(
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.slice(c, i * chunk_size + 1, chunk_size),
        ),
        lambda a: F.size(a) > 0,
    )


def merge(a: Column | str, b: Column | str) -> Column:
    """merge (objects): right-hand keys win — map_concat with dedup via
    map_zip_with is heavier; for struct columns use withField at the
    DataFrame level."""
    return F.map_zip_with(
        _c(a), _c(b), lambda k, v1, v2: F.coalesce(v2, v1)
    )


map_keys = lambda c: F.map_keys(_c(c))  # noqa: E731
map_values = lambda c: F.map_values(_c(c))  # noqa: E731


# unnest ≡ explode (unnest.cue:3-30: "also referred to as explode")
unnest = lambda c: F.explode(_c(c))  # noqa: E731


def find(col: Column | str, pattern: str, from_: int = 0, regex: bool = False) -> Column:
    """find (find.cue): 0-based index of the first occurrence of a
    substring or regex at/after ``from_``; -1 when absent.
    (``find("foobar","foo") == 0``; ``find("foobar", r'b.r') == 3``;
    ``find("foobarfoobarfoo","bar",4) == 9``)."""
    c = _c(col)
    tail = F.substring(c, from_ + 1, 2_000_000_000)
    if regex:
        # index within tail = len(tail) - len(tail with prefix-up-to-match removed)
        stripped = F.regexp_replace(tail, f"^(.*?)(?:{pattern}).*$", "$1")
        hit = tail.rlike(pattern)
        idx = F.when(hit, F.length(stripped)).otherwise(F.lit(-1 - from_))
    else:
        idx = F.instr(tail, pattern) - 1
    return F.when(idx >= 0, idx + from_).otherwise(F.lit(-1))


def match(col: Column | str, pattern: str) -> Column:
    """match (match.cue): regex search -> bool."""
    return _c(col).rlike(pattern)


def match_any(col: Column | str, patterns: list[str]) -> Column:
    """match_any (match_any.cue): ANY of the patterns matches — compiled
    to one alternation regex (single scan)."""
    return _c(col).rlike("|".join(f"(?:{p})" for p in patterns))


def match_array(col: Column | str, pattern: str, all_: bool = False) -> Column:
    """match_array (match_array.cue): some/every array element matches."""
    c = _c(col)
    if all_:
        return F.forall(c, lambda e: e.rlike(pattern))
    return F.exists(c, lambda e: e.rlike(pattern))


def join_(col: Column | str, separator: str = "") -> Column:
    """join (join.cue): array -> string with separator."""
    return F.array_join(_c(col), separator)


# ---------------------------------------------------------------------------
# Coerce / Convert / Number (to_int.cue, to_float.cue, to_bool.cue,
# to_string.cue, to_unix_timestamp.cue, to_syslog_level.cue,
# to_syslog_severity.cue, abs.cue, ceil.cue, floor.cue, round.cue, mod.cue,
# format_number.cue)

# try_cast throughout: VRL's to_*! are fallible calls whose error arm is
# NULL in this rebuild; plain cast would throw under ANSI-on sessions
# (default in Spark 4) on the first dirty row.
to_int = lambda c: _c(c).try_cast("long")  # noqa: E731
to_float = lambda c: _c(c).try_cast("double")  # noqa: E731
to_bool = lambda c: _c(c).try_cast("boolean")  # noqa: E731
to_string = lambda c: _c(c).cast("string")  # noqa: E731
to_timestamp = lambda c: _c(c).try_cast("timestamp")  # noqa: E731
to_unix_timestamp = lambda c: F.unix_timestamp(_c(c))  # noqa: E731

abs_ = lambda c: F.abs(_c(c))  # noqa: E731
ceil_ = lambda c: F.ceil(_c(c))  # noqa: E731
floor_ = lambda c: F.floor(_c(c))  # noqa: E731
round_ = lambda c, n=0: F.round(_c(c), n)  # noqa: E731
mod = lambda c, m: F.pmod(_c(c), F.lit(m))  # noqa: E731
format_number = lambda c, d=2: F.format_number(_c(c), d)  # noqa: E731

# RFC 5424 severity keyword <-> number (to_syslog_level.cue,
# to_syslog_severity.cue)
_SYSLOG_LEVELS = ["emerg", "alert", "crit", "err", "warning", "notice", "info", "debug"]


def format_int(col: Column | str, base: int = 10) -> Column:
    """format_int (format_int.cue): int -> string in ``base``
    (``format_int!(42,16) == '2a'``; negatives keep their sign)."""
    c = _c(col).cast("long")
    mag = F.lower(F.conv(F.abs(c).cast("string"), 10, base))
    return F.when(c < 0, F.concat(F.lit("-"), mag)).otherwise(mag)


def encode_key_value(
    pairs: dict[str, Column], field_delimiter: str = " ", kv_delimiter: str = "="
) -> Column:
    """encode_key_value (encode_key_value.cue): generalized logfmt with
    custom delimiters; keys in lexicographic order (deterministic batch
    rendering, same delta as encode_logfmt)."""
    parts = [
        F.concat(F.lit(f"{k}{kv_delimiter}"), pairs[k].cast("string"))
        for k in sorted(pairs)
    ]
    return F.concat_ws(field_delimiter, *parts)


# RFC 5424 facility keywords 0-23 (to_syslog_facility.cue)
_SYSLOG_FACILITIES = [
    "kern", "user", "mail", "daemon", "auth", "syslog", "lpr", "news",
    "uucp", "cron", "authpriv", "ftp", "ntp", "security", "console",
    "solaris-cron", "local0", "local1", "local2", "local3", "local4",
    "local5", "local6", "local7",
]


def to_syslog_facility(code: Column | str) -> Column:
    """to_syslog_facility (to_syslog_facility.cue): facility code ->
    keyword (``to_syslog_facility!(4) == 'auth'``)."""
    m = F.create_map(
        *[x for i, kw in enumerate(_SYSLOG_FACILITIES) for x in (F.lit(i), F.lit(kw))]
    )
    return F.try_element_at(m, _c(code).try_cast("int"))


def get_env_var(name: str) -> Column:
    """get_env_var (get_env_var.cue): resolved ON THE DRIVER at plan-build
    time and folded in as a literal (executors may have different envs —
    the reference reads the single vector process's env, which maps to the
    driver)."""
    import os

    return F.lit(os.environ.get(name))


def get_hostname() -> Column:
    """get_hostname (get_hostname.cue): driver hostname as a literal."""
    import socket

    return F.lit(socket.gethostname())


def to_syslog_level(sev: Column | str) -> Column:
    m = F.create_map(*[x for i, lv in enumerate(_SYSLOG_LEVELS) for x in (F.lit(i), F.lit(lv))])
    return F.try_element_at(m, _c(sev).try_cast("int"))


def to_syslog_severity(level: Column | str) -> Column:
    m = F.create_map(*[x for i, lv in enumerate(_SYSLOG_LEVELS) for x in (F.lit(lv), F.lit(i))])
    return F.try_element_at(m, F.lower(_c(level)))


# ---------------------------------------------------------------------------
# IP (ip_aton.cue, ip_ntoa.cue, ip_cidr_contains.cue, is_ipv4.cue)


def ip_aton(col: Column | str) -> Column:
    """ip_aton: dotted-quad IPv4 -> uint32 as bigint (pure bit math,
    codegen-friendly)."""
    p = F.split(_c(col), r"\.")
    # F.get + try_cast: malformed addresses (short split / non-numeric
    # octet) yield NULL instead of throwing under ANSI-on sessions.
    return (
        F.get(p, F.lit(0)).try_cast("long") * 16777216
        + F.get(p, F.lit(1)).try_cast("long") * 65536
        + F.get(p, F.lit(2)).try_cast("long") * 256
        + F.get(p, F.lit(3)).try_cast("long")
    )


def ip_ntoa(col: Column | str) -> Column:
    c = _c(col).cast("long")
    return F.concat_ws(
        ".",
        (F.shiftright(c, 24).bitwiseAND(F.lit(255))).cast("string"),
        (F.shiftright(c, 16).bitwiseAND(F.lit(255))).cast("string"),
        (F.shiftright(c, 8).bitwiseAND(F.lit(255))).cast("string"),
        (c.bitwiseAND(F.lit(255))).cast("string"),
    )


def ip_cidr_contains(cidr: str, col: Column | str) -> Column:
    """ip_cidr_contains: static CIDR literal vs an IPv4 column."""
    net, bits = cidr.split("/")
    bits = int(bits)
    mask = (0xFFFFFFFF << (32 - bits)) & 0xFFFFFFFF
    net_i = 0
    for part in net.split("."):
        net_i = net_i * 256 + int(part)
    return ip_aton(col).bitwiseAND(F.lit(mask)) == F.lit(net_i & mask)


def is_ipv4(col: Column | str) -> Column:
    # try_cast inside the lambda: Spark's & evaluates BOTH sides, so the
    # forall runs on non-matching rows too ('hello' -> ['hello']) and a
    # plain cast would throw under ANSI.
    return _c(col).rlike(r"^(\d{1,3}\.){3}\d{1,3}$") & F.forall(
        F.split(_c(col), r"\."), lambda o: o.try_cast("int") <= 255
    )


def _ip_udf(fn, ret: str = "string"):
    """Arrow-batched ipaddress-module helper for the v6-capable IP
    functions (no JVM surface for inet math; errors -> NULL, the VRL
    fallible-call convention)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(ret)
    def udf(s):
        def safe(v):
            if v is None:
                return None
            try:
                return fn(v)
            except (ValueError, OSError):
                return None

        return s.map(safe)

    return udf


def ip_pton(col: Column | str) -> Column:
    """ip_pton (ip_pton.cue): IPv4/IPv6 text -> packed bytes (4 or 16)."""
    import ipaddress

    return _ip_udf(lambda v: ipaddress.ip_address(v).packed, "binary")(_c(col))


def ip_ntop(col: Column | str) -> Column:
    """ip_ntop (ip_ntop.cue): packed 4/16 bytes -> canonical text."""
    import ipaddress

    return _ip_udf(lambda v: str(ipaddress.ip_address(bytes(v))))(_c(col).cast("binary"))


def ip_subnet(col: Column | str, mask: str) -> Column:
    """ip_subnet (ip_subnet.cue): network address under a dotted netmask
    ("255.255.255.0") or prefix ("/32"); works for IPv4 and IPv6."""
    import ipaddress

    def sub(v):
        if mask.startswith("/"):
            net = ipaddress.ip_network(f"{v}{mask}", strict=False)
        else:
            net = ipaddress.ip_network((v, mask), strict=False)
        return str(net.network_address)

    return _ip_udf(sub)(_c(col))


def ip_to_ipv6(col: Column | str) -> Column:
    """ip_to_ipv6 (ip_to_ipv6.cue): IPv4 -> "::ffff:a.b.c.d"; IPv6 input
    passes through.  Pure Column (no UDF): string concat + validity gate."""
    c = _c(col)
    return F.when(is_ipv4(c), F.concat(F.lit("::ffff:"), c)).otherwise(c)


def ipv6_to_ipv4(col: Column | str) -> Column:
    """ipv6_to_ipv4 (ipv6_to_ipv4.cue): IPv4-mapped IPv6 -> dotted quad;
    plain IPv4 passes through; non-mapped IPv6 -> NULL (fallible)."""
    import ipaddress

    def conv(v):
        ip = ipaddress.ip_address(v)
        if ip.version == 4:
            return str(ip)
        mapped = ip.ipv4_mapped
        if mapped is None:
            raise ValueError("not an IPv4-mapped address")
        return str(mapped)

    return _ip_udf(conv)(_c(col))


def is_ipv6(col: Column | str) -> Column:
    """is_ipv6 (is_ipv6.cue): full-fidelity check via the inet parser."""
    import ipaddress

    def check(v):
        try:
            return ipaddress.ip_address(v).version == 6
        except ValueError:
            return False

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def udf(s):
        return s.map(lambda v: False if v is None else check(v))

    return udf(_c(col))


# ---------------------------------------------------------------------------
# Cryptography (md5.cue, sha1.cue, sha2.cue, seahash.cue)

md5 = lambda c: F.md5(_c(c).cast("binary"))  # noqa: E731
sha1 = lambda c: F.sha1(_c(c).cast("binary"))  # noqa: E731
sha2 = lambda c, bits=256: F.sha2(_c(c).cast("binary"), bits)  # noqa: E731
# seahash stand-in: the ONE pinned rebuild hash (SURVEY.md §2.3 note)
seahash = portable_hash64


# ---------------------------------------------------------------------------
# Timestamp (format_timestamp.cue, now.cue)


def format_timestamp(col: Column | str, fmt: str) -> Column:
    return F.date_format(_c(col), fmt)


def now() -> Column:
    return F.current_timestamp()


# ---------------------------------------------------------------------------
# Canned log-format parsers (parse_syslog.cue, parse_apache_log.cue,
# parse_common_log.cue) — grok canned patterns + derived fields


def parse_syslog(col: Column | str):
    """parse_syslog: RFC-5424-ish line -> list of aliased Columns
    (priority/version/timestamp/hostname/appname/procid/msgid/message +
    derived facility/severity).  Usage: ``df.select("*", *parse_syslog("m"))``"""
    from vector_spark.functions.grok import CANNED, grok_columns

    # facility/severity reference the sibling 'priority' alias — resolved
    # via Spark's lateral column aliases (one select, no subquery)
    cols = grok_columns(col, CANNED["syslog_5424ish"])
    return cols + [
        (F.col("priority") / 8).cast("int").alias("facility_num"),
        (F.col("priority") % 8).cast("int").alias("severity_num"),
    ]


def parse_apache_log(col: Column | str):
    """parse_apache_log (common format): host/identity/user/timestamp/
    method/path/protocol/status/size."""
    from vector_spark.functions.grok import CANNED, grok_columns

    return grok_columns(col, CANNED["apache_common"])


parse_common_log = parse_apache_log
