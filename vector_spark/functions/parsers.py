"""Canned log-format parsers — the VRL parse_* family beyond grok.

Each format is ONE spec (regex + typed fields, a :class:`CompiledGrok`)
rendered two ways: the Spark one-pass Column plan (functions/grok.py
`regex_columns`, single regexp_replace scan, whole-stage codegen) and the
DuckDB oracle SQL (`regex_sql_exprs`) — so every parser is hash-checkable.

Reference behavior (formats + examples) from the per-function doc corpus
website/cue/reference/remap/functions/parse_*.cue; the cue examples are
golden-tested in tests/test_parsers.py.

Semantics shared with the reference:
- a non-matching line yields all-NULL fields (VRL fallible-call error);
- '-' placeholder fields become NULL ("Missing information ... indicated
  by `-`. These fields are omitted in the result", parse_nginx_log.cue);
- typed fields (int/float) cast with null-on-failure.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from vector_spark.functions.grok import (
    CompiledGrok,
    regex_columns,
    regex_parts,
    regex_sql_exprs,
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _null_dash(c: Column) -> Column:
    return F.nullif(c, F.lit("-"))


# ---------------------------------------------------------------------------
# nginx (parse_nginx_log.cue: combined + error formats)

NGINX_COMBINED = CompiledGrok(
    regex=(
        r'^(\S+) - (\S+) \[([^\]]+)\] "(\S+) (\S+) (\S+)" (\d+) (\d+)'
        r' "([^"]*)" "([^"]*)"(?: "([^"]*)")?$'
    ),
    fields=(
        "client", "user", "timestamp", "method", "path", "protocol",
        "status", "size", "referer", "agent", "compression",
    ),
    types=("string",) * 6 + ("int", "int") + ("string",) * 3,
)

NGINX_ERROR = CompiledGrok(
    regex=(
        r"^(\d{4}/\d{2}/\d{2} \d{2}:\d{2}:\d{2}) \[(\w+)\] (\d+)#(\d+):"
        r" \*(\d+) (.*?)(?:, client: (\S+), server: (\S*), request: \"([^\"]*)\""
        r"(?:, host: \"([^\"]*)\")?)?$"
    ),
    fields=(
        "timestamp", "severity", "pid", "tid", "cid", "message",
        "client", "server", "request", "host",
    ),
    types=("string", "string", "int", "int", "int") + ("string",) * 5,
)


def parse_nginx_log(col: Column | str, format: str = "combined") -> list[Column]:
    """parse_nginx_log (parse_nginx_log.cue): combined access lines or
    error lines -> typed fields; '-' fields -> NULL."""
    g = {"combined": NGINX_COMBINED, "error": NGINX_ERROR}[format]
    out = regex_columns(_c(col), g)
    # '-' omissions (combined: user/referer/agent may be '-')
    return [
        _null_dash(c).alias(n) if t == "string" else c
        for c, (n, t) in zip(out, zip(g.fields, g.types))
    ]


def sql_parse_nginx_log(expr: str, format: str = "combined", prefix: str = "") -> list[str]:
    g = {"combined": NGINX_COMBINED, "error": NGINX_ERROR}[format]
    out = []
    for e, t in zip(regex_sql_exprs(expr, g, prefix), g.types):
        if t == "string":
            body, alias = e.rsplit(" AS ", 1)
            e = f"NULLIF({body}, '-') AS {alias}"
        out.append(e)
    return out


# ---------------------------------------------------------------------------
# glog / klog (parse_glog.cue, parse_klog.cue) — same line shape:
#   <L><date> <time> <thread-id> <file>:<line>] <message>
# glog example carries YYYYMMDD, klog carries MMDD (year assumed)

_GLOG_RE = (
    r"^([IWEF])(\d{4}|\d{8}) (\d{2}:\d{2}:\d{2}\.\d+)\s+(\d+) ([^ :]+):(\d+)\] (.*)$"
)

GLOG = CompiledGrok(
    regex=_GLOG_RE,
    fields=("level_char", "date_digits", "time", "id", "file", "line", "message"),
    types=("string", "string", "string", "int", "string", "int", "string"),
)

_GLOG_LEVELS = {"I": "info", "W": "warning", "E": "error", "F": "fatal"}


def _glog_level(c: Column) -> Column:
    m = F.create_map(*[x for k, v in _GLOG_LEVELS.items() for x in (F.lit(k), F.lit(v))])
    return m[c]


def parse_glog(col: Column | str, default_year: int = 2024) -> list[Column]:
    """parse_glog / parse_klog (parse_glog.cue example
    ``I20210131 14:48:54.411655 15520 main.c++:9] Hello world!`` ->
    level=info, timestamp, id, file, line, message).

    The 4-digit MMDD form (klog) has no year; ``default_year`` supplies it
    (the reference uses wall-clock "current year" — nondeterministic in
    batch, so it is an explicit parameter here).
    """
    out = regex_columns(_c(col), GLOG)
    d = dict(zip(GLOG.fields, out))
    date8 = F.when(
        F.length(d["date_digits"]) == 8, d["date_digits"]
    ).otherwise(F.concat(F.lit(str(default_year)), d["date_digits"]))
    ts = F.try_to_timestamp(
        F.concat(date8, F.lit(" "), d["time"]), F.lit("yyyyMMdd HH:mm:ss.SSSSSS")
    )
    return [
        _glog_level(d["level_char"]).alias("level"),
        ts.alias("timestamp"),
        d["id"],
        d["file"],
        d["line"],
        d["message"],
    ]


parse_klog = parse_glog  # klog is the MMDD variant of the same shape (parse_klog.cue)


def sql_parse_glog(expr: str, default_year: int = 2024, prefix: str = "") -> list[str]:
    raw = regex_sql_exprs(expr, GLOG, "g_")
    by_name = {e.rsplit(" AS ", 1)[1]: e.rsplit(" AS ", 1)[0] for e in raw}
    lvl = (
        f"CASE {by_name['g_level_char']} WHEN 'I' THEN 'info' WHEN 'W' THEN 'warning' "
        "WHEN 'E' THEN 'error' WHEN 'F' THEN 'fatal' END"
    )
    date8 = (
        f"CASE WHEN length({by_name['g_date_digits']}) = 8 THEN {by_name['g_date_digits']} "
        f"ELSE '{default_year}' || {by_name['g_date_digits']} END"
    )
    ts = f"strptime({date8} || ' ' || {by_name['g_time']}, '%Y%m%d %H:%M:%S.%f')"
    return [
        f"{lvl} AS {prefix}level",
        f"strftime({ts}, '%Y-%m-%d %H:%M:%S.%f') AS {prefix}ts_s",
        f"{by_name['g_id']} AS {prefix}id",
        f"{by_name['g_file']} AS {prefix}file",
        f"{by_name['g_line']} AS {prefix}line",
        f"{by_name['g_message']} AS {prefix}message",
    ]


# ---------------------------------------------------------------------------
# linux authorization (parse_linux_authorization.cue) — RFC-3164 syslog:
#   Mar 23 01:49:58 localhost sshd[1111]: message

LINUX_AUTH = CompiledGrok(
    regex=(
        r"^((?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec) +\d{1,2}"
        r" \d{2}:\d{2}:\d{2}) (\S+) ([^\[\s:]+)(?:\[(\d+)\])?: (.*)$"
    ),
    fields=("stamp", "hostname", "appname", "procid", "message"),
    types=("string", "string", "string", "int", "string"),
)


def parse_linux_authorization(col: Column | str, year: int = 2024) -> list[Column]:
    """parse_linux_authorization (parse_linux_authorization.cue): RFC-3164
    auth.log lines.  The year is absent from the stamp; the reference
    resolves it against wall-clock "now" (Dec messages seen in Jan take the
    previous year) — nondeterministic in batch, so ``year`` is an explicit
    parameter and the Dec/Jan rule is the caller's choice.
    """
    out = regex_columns(_c(col), LINUX_AUTH)
    d = dict(zip(LINUX_AUTH.fields, out))
    ts = F.try_to_timestamp(
        F.concat(F.lit(str(year)), F.lit(" "), F.regexp_replace(d["stamp"], r" +", " ")),
        F.lit("yyyy MMM d HH:mm:ss"),
    )
    return [
        ts.alias("timestamp"),
        d["hostname"],
        d["appname"],
        d["procid"],
        d["message"],
    ]


def sql_parse_linux_authorization(expr: str, year: int = 2024, prefix: str = "") -> list[str]:
    raw = regex_sql_exprs(expr, LINUX_AUTH, "a_")
    by_name = {e.rsplit(" AS ", 1)[1]: e.rsplit(" AS ", 1)[0] for e in raw}
    stamp = f"regexp_replace({by_name['a_stamp']}, ' +', ' ', 'g')"
    ts = f"strptime('{year} ' || {stamp}, '%Y %b %-d %H:%M:%S')"
    return [
        f"strftime({ts}, '%Y-%m-%d %H:%M:%S') AS {prefix}ts_s",
        f"{by_name['a_hostname']} AS {prefix}hostname",
        f"{by_name['a_appname']} AS {prefix}appname",
        f"{by_name['a_procid']} AS {prefix}procid",
        f"{by_name['a_message']} AS {prefix}message",
    ]


# ---------------------------------------------------------------------------
# AWS VPC flow logs (parse_aws_vpc_flow_log.cue) — space-separated tokens,
# '-' = NULL, per-field types from the v2-v5 field catalog

VPC_FLOW_DEFAULT_FORMAT = (
    "version account_id interface_id srcaddr dstaddr srcport dstport protocol "
    "packets bytes start end action log_status"
)

_VPC_INT_FIELDS = {
    "version", "account_id", "srcport", "dstport", "protocol", "packets",
    "bytes", "start", "end", "tcp_flags", "traffic_path",
}


def parse_aws_vpc_flow_log(col: Column | str, format: str | None = None) -> list[Column]:
    """parse_aws_vpc_flow_log (parse_aws_vpc_flow_log.cue): positional
    space-separated record; '-' -> NULL; known numeric fields cast to
    bigint.  ``format`` is the space-separated field list (default = the
    v2 base format, as in the cue example)."""
    names = (format or VPC_FLOW_DEFAULT_FORMAT).split()
    parts = F.split(_c(col), r" ")
    out = []
    for i, name in enumerate(names):
        # F.get + try_cast: short records / non-numeric garbage yield NULL
        # instead of throwing under ANSI-on sessions.
        c = _null_dash(F.get(parts, F.lit(i)))
        if name in _VPC_INT_FIELDS:
            c = c.try_cast("bigint")
        out.append(c.alias(name))
    return out


def sql_parse_aws_vpc_flow_log(expr: str, format: str | None = None, prefix: str = "") -> list[str]:
    names = (format or VPC_FLOW_DEFAULT_FORMAT).split()
    out = []
    for i, name in enumerate(names):
        base = f"NULLIF(string_split({expr}, ' ')[{i + 1}], '-')"
        if name in _VPC_INT_FIELDS:
            base = f"TRY_CAST({base} AS BIGINT)"
        out.append(f"{base} AS {prefix}{name}")
    return out


# ---------------------------------------------------------------------------
# AWS ALB access logs (parse_aws_alb_log.cue) — 29 fields, quoted strings

# ALB fields in column order; the two *_bytes ints sit before the quoted
# request triple in the line
_ALB_FIELDS = [
    ("type", "string"), ("timestamp", "string"), ("elb", "string"),
    ("client_host", "string"), ("target_host", "string"),
    ("request_processing_time", "float"), ("target_processing_time", "float"),
    ("response_processing_time", "float"), ("elb_status_code", "string"),
    ("target_status_code", "string"), ("received_bytes", "int"),
    ("sent_bytes", "int"), ("request_method", "string"),
    ("request_url", "string"), ("request_protocol", "string"),
    ("user_agent", "string"), ("ssl_cipher", "string"),
    ("ssl_protocol", "string"), ("target_group_arn", "string"),
    ("trace_id", "string"), ("domain_name", "string"),
    ("chosen_cert_arn", "string"), ("matched_rule_priority", "string"),
    ("request_creation_time", "string"), ("actions_executed", "string"),
    ("redirect_url", "string"), ("error_reason", "string"),
    ("target_port_list", "list"), ("target_status_code_list", "list"),
    ("classification", "string"), ("classification_reason", "string"),
]

_ALB_RE = (
    r"^(\S+) (\S+) (\S+) (\S+) (\S+) ([\d.-]+) ([\d.-]+) ([\d.-]+) (\S+) (\S+)"
    r' (\d+) (\d+) "(\S+) (\S+) ([^"]*)" "([^"]*)" (\S+) (\S+) (\S+) "([^"]*)"'
    r' "([^"]*)" "([^"]*)" (\S+) (\S+) "([^"]*)" "([^"]*)" "([^"]*)"'
    r' "([^"]*)" "([^"]*)" "([^"]*)" "([^"]*)"$'
)

ALB = CompiledGrok(
    regex=_ALB_RE,
    fields=tuple(n for n, _t in _ALB_FIELDS),
    types=tuple("string" if t == "list" else t for _n, t in _ALB_FIELDS),
)


def parse_aws_alb_log(col: Column | str) -> list[Column]:
    """parse_aws_alb_log (parse_aws_alb_log.cue): the 31-field ALB access
    line in ONE regex pass; '-' -> NULL; *_processing_time float (-1 on
    '-' per AWS docs is kept as NULL here, matching the cue example where
    '-' fields return null); the two space-separated quoted list fields
    split to arrays ('-' -> empty array, as the cue example shows)."""
    out = regex_columns(_c(col), ALB)
    res = []
    for c, (name, typ) in zip(out, _ALB_FIELDS):
        if typ == "list":
            base = F.nullif(c, F.lit("-"))
            res.append(
                F.coalesce(F.split(base, r" "), F.array().cast("array<string>")).alias(name)
            )
        elif typ == "string":
            res.append(_null_dash(c).alias(name))
        else:
            res.append(c)
    return res


# ---------------------------------------------------------------------------
# CEF (parse_cef.cue) — pipe-delimited header + key=value extension

_CEF_HEADER = CompiledGrok(
    regex=(
        r"^(?:.*?)CEF:(\d+)\|((?:\\\||[^|])*)\|((?:\\\||[^|])*)\|((?:\\\||[^|])*)"
        r"\|((?:\\\||[^|])*)\|((?:\\\||[^|])*)\|((?:\\\||[^|])*)\|(.*)$"
    ),
    fields=(
        "cefVersion", "deviceVendor", "deviceProduct", "deviceVersion",
        "deviceEventClassId", "name", "severity", "extension",
    ),
    types=("string",) * 8,
)

# value = run of chars that stops before the next ` key=`; lookahead keeps
# spaces inside values ("Suspected credentials theft" style)
_CEF_KV = r"([\w.]+)=((?:[^\s]|\s(?!\S+=))*)"


def parse_cef(col: Column | str, translate_custom_fields: bool = False) -> list[Column]:
    """parse_cef (parse_cef.cue): header fields + extension map.

    "Ignores everything up to CEF header" -> leading `(?:.*?)CEF:`;
    escaped pipes in header values honored; extension returned as
    ``map<string,string>``.  ``translate_custom_fields`` rewrites
    ``cs1Label=ExtraData cs1=None`` pairs to ``ExtraData -> None`` and
    drops the Label entries (cue example 3).
    """
    c = _c(col)
    head = regex_columns(c, _CEF_HEADER)
    d = dict(zip(_CEF_HEADER.fields, head))
    ext_src = d["extension"]
    keys = F.regexp_extract_all(ext_src, F.lit(_CEF_KV), F.lit(1))
    vals = F.regexp_extract_all(ext_src, F.lit(_CEF_KV), F.lit(2))
    ext = F.map_from_arrays(keys, vals)
    if translate_custom_fields:
        no_label = F.map_filter(ext, lambda k, v: ~k.endswith("Label"))
        new_keys = F.transform(
            F.map_keys(no_label),
            lambda k: F.coalesce(ext[F.concat(k, F.lit("Label"))], k),
        )
        ext = F.map_from_arrays(new_keys, F.map_values(no_label))
    unescape = lambda x: F.regexp_replace(x, r"\\\|", "|")  # noqa: E731
    return [
        d["cefVersion"].alias("cefVersion"),
        unescape(d["deviceVendor"]).alias("deviceVendor"),
        unescape(d["deviceProduct"]).alias("deviceProduct"),
        unescape(d["deviceVersion"]).alias("deviceVersion"),
        unescape(d["deviceEventClassId"]).alias("deviceEventClassId"),
        unescape(d["name"]).alias("name"),
        d["severity"].alias("severity"),
        ext.alias("extension"),
    ]


# ---------------------------------------------------------------------------
# user agent (parse_user_agent.cue, fast mode) — explicitly "best effort"

_UA_BROWSERS = [
    ("Edge", r"Edg(?:e|A|iOS)?/([\d.]+)"),
    # woothee reports every Opera flavour as family "Opera", version from
    # "Version/x" when present (Presto-era UAs) else the Opera/x token —
    # the uap pass (enriched mode) is what distinguishes "Opera Mini"
    ("Opera", r"Opera.*Version/([\d.]+)"),
    ("Opera", r"Opera Mini/([\d.]+)"),
    ("Opera", r"Opera[/ ]([\d.]+)"),
    ("Firefox", r"Firefox/([\d.]+)"),
    ("Chrome", r"Chrome/([\d.]+)"),
    ("Safari", r"Version/([\d.]+).*Safari"),
    ("Internet Explorer", r"MSIE ([\d.]+)"),
]

# Woothee-style fast OS table: family is the marketing name and the version
# keeps its source token ("NT 5.1"), matching the reference's fast/reliable
# output shape (parse_user_agent.cue reliable example: os family
# "Windows XP", version "NT 5.1").  Earlier entries win.
_UA_OS = [
    ("Windows 10", r"Windows (NT 10\.0)"),
    ("Windows 8.1", r"Windows (NT 6\.3)"),
    ("Windows 8", r"Windows (NT 6\.2)"),
    ("Windows 7", r"Windows (NT 6\.1)"),
    ("Windows Vista", r"Windows (NT 6\.0)"),
    ("Windows XP", r"Windows (NT 5\.[12])"),
    ("Windows 2000", r"Windows (NT 5\.0)"),
    ("Windows", r"Windows (NT [\d.]+)"),
    ("iOS", r"iPhone OS ([\d_]+)"),
    ("Android", r"Android ([\d.]+)"),
    ("Mac OS X", r"Mac OS X ([\d_.]+)"),
    ("Linux", r"(Linux)"),
]

# uap-project-style ordered tables (the PUBLIC ua-parser model: an ordered
# regex list, first match wins, capture groups 1..3 -> major/minor/patch,
# "$1" in a replacement slot substitutes group 1).  A representative subset
# written for this rebuild — not a copy of the uap-core file.
_UAP_BROWSERS = [
    (r"Opera Mini/(\d+)\.(\d+)(?:\.(\d+))?", "Opera Mini"),
    (r"Opera.*Version/(\d+)\.(\d+)(?:\.(\d+))?", "Opera"),
    (r"Opera[/ ](\d+)\.(\d+)(?:\.(\d+))?", "Opera"),
    (r"Edg(?:e|A|iOS)?/(\d+)\.(\d+)(?:\.(\d+))?", "Edge"),
    (r"Firefox/(\d+)\.(\d+)(?:\.(\d+))?", "Firefox"),
    (r"Chrom(?:e|ium)/(\d+)\.(\d+)(?:\.(\d+))?", "Chrome"),
    (r"Version/(\d+)\.(\d+)(?:\.(\d+))?.*Safari/", "Safari"),
    (r"MSIE (\d+)\.(\d+)", "Internet Explorer"),
    (r"Trident/.*rv[: ](\d+)\.(\d+)", "Internet Explorer"),
]

_UAP_OS = [
    # (pattern, family) — groups 1..4 -> major/minor/patch/patch_minor
    (r"CPU (?:iPhone )?OS (\d+)_(\d+)(?:_(\d+))?", "iOS"),
    (r"iPhone OS (\d+)_(\d+)(?:_(\d+))?", "iOS"),
    (r"Android (\d+)(?:\.(\d+))?(?:\.(\d+))?", "Android"),
    (r"Mac OS X (\d+)[_.](\d+)(?:[_.](\d+))?(?:[_.](\d+))?", "Mac OS X"),
    (r"Windows NT (\d+)\.(\d+)", "Windows"),
    (r"Linux|X11", "Linux"),
]

_UAP_DEVICES = [
    # (pattern, family, brand, model) — "$1" substitutes capture group 1
    (r"iPhone", "iPhone", "Apple", "iPhone"),
    (r"iPad", "iPad", "Apple", "iPad"),
    (r"; ?([^;)/]+) Build[/ ]", "$1", None, "$1"),
]


def _ua_fast_parts(c: Column):
    """(browser_family, browser_version, os_family, os_version, category)
    of the woothee-style fast pass."""

    def first_match(table):
        fam = F.lit(None).cast("string")
        ver = F.lit(None).cast("string")
        for name, pat in reversed(table):
            hit = c.rlike(pat)
            fam = F.when(hit, F.lit(name)).otherwise(fam)
            v = F.nullif(F.regexp_extract(c, pat, 1), F.lit(""))
            ver = F.when(hit, v).otherwise(ver)
        return fam, ver

    b_fam, b_ver = first_match(_UA_BROWSERS)
    o_fam, o_ver = first_match(_UA_OS)
    o_ver = F.when(o_fam == "Linux", F.lit(None).cast("string")).otherwise(o_ver)
    device = (
        F.when(c.rlike(r"iPhone|Android.*Mobile|Opera Mini|Mobile Safari"), F.lit("smartphone"))
        .when(c.rlike(r"iPad|Android(?!.*Mobile)"), F.lit("tablet"))
        .otherwise(F.lit("pc"))
    )
    return b_fam, b_ver, o_fam, o_ver, device


def _uap_slot(c: Column, pat: str, spec, group: int | None = None) -> Column:
    """One replacement slot of a uap-style table entry: a literal, a "$N"
    capture substitution, or (spec=None, group=N) the N-th version group."""
    if spec is None and group is None:
        return F.lit(None).cast("string")
    if spec is None:
        return F.nullif(F.regexp_extract(c, pat, group), F.lit(""))
    if isinstance(spec, str) and spec.startswith("$"):
        return F.nullif(F.regexp_extract(c, pat, int(spec[1:])), F.lit(""))
    return F.lit(spec)


def parse_user_agent(col: Column | str, mode: str = "fast") -> Column:
    """parse_user_agent (parse_user_agent.cue: "loosely defined format so
    this parser only provides best effort guarantee").

    ``mode='fast'``: woothee-style token heuristics ->
    struct(browser{family,version}, device{category}, os{family,version}).

    ``mode='reliable'``: same schema; fields the fast pass left NULL are
    filled from the uap-style ordered pattern pass (the reference runs
    woothee then uap for missing fields).

    ``mode='enriched'``: full schema — browser{family,major,minor,patch,
    version}, device{brand,category,family,model}, os{family,major,minor,
    patch,patch_minor,version} — combining both passes (uap supplies the
    structured version parts, the fast pass the woothee fields).

    All modes are single-pass codegen when-chains over the string column —
    no UDF, no shuffle; Catalyst's common-subexpression elimination shares
    the per-pattern rlike across slots."""
    c = _c(col)
    if mode not in ("fast", "reliable", "enriched"):
        raise ValueError(f"parse_user_agent: unknown mode {mode!r}")
    b_fam, b_ver, o_fam, o_ver, device = _ua_fast_parts(c)
    if mode == "fast":
        return F.struct(
            F.struct(b_fam.alias("family"), b_ver.alias("version")).alias("browser"),
            F.struct(device.alias("category")).alias("device"),
            F.struct(o_fam.alias("family"), o_ver.alias("version")).alias("os"),
        )

    # uap pass: family + version groups per table
    def uap_versions(table, n_groups):
        import re as _re

        fam = F.lit(None).cast("string")
        groups = [F.lit(None).cast("string") for _ in range(n_groups)]
        for entry in reversed(table):
            pat, famspec = entry[0], entry[1]
            # regexp_extract THROWS on a group index beyond the pattern's
            # group count (both ANSI modes) — cap per pattern.
            pat_groups = _re.compile(pat).groups
            hit = c.rlike(pat)
            if isinstance(famspec, str) and famspec.startswith("$"):
                f_col = F.nullif(F.regexp_extract(c, pat, int(famspec[1:])), F.lit(""))
            else:
                f_col = F.lit(famspec)
            fam = F.when(hit, f_col).otherwise(fam)
            for i in range(n_groups):
                v = (
                    F.nullif(F.regexp_extract(c, pat, i + 1), F.lit(""))
                    if i < pat_groups
                    else F.lit(None).cast("string")
                )
                groups[i] = F.when(hit, v).otherwise(groups[i])
        return fam, groups

    ub_fam, (ub_maj, ub_min, ub_pat) = uap_versions(_UAP_BROWSERS, 3)
    uo_fam, (uo_maj, uo_min, uo_pat, uo_pm) = uap_versions(_UAP_OS, 4)
    ub_joined = F.nullif(F.concat_ws(".", ub_maj, ub_min, ub_pat), F.lit(""))
    uo_joined = F.nullif(F.concat_ws(".", uo_maj, uo_min, uo_pat), F.lit(""))

    if mode == "reliable":
        return F.struct(
            F.struct(
                F.coalesce(b_fam, ub_fam).alias("family"),
                F.coalesce(b_ver, ub_joined).alias("version"),
            ).alias("browser"),
            F.struct(device.alias("category")).alias("device"),
            F.struct(
                F.coalesce(o_fam, uo_fam).alias("family"),
                F.coalesce(o_ver, uo_joined).alias("version"),
            ).alias("os"),
        )

    # enriched: device identity from the uap-style device table
    d_fam = F.lit(None).cast("string")
    d_brand = F.lit(None).cast("string")
    d_model = F.lit(None).cast("string")
    for pat, famspec, brandspec, modelspec in reversed(_UAP_DEVICES):
        hit = c.rlike(pat)
        d_fam = F.when(hit, _uap_slot(c, pat, famspec)).otherwise(d_fam)
        d_brand = F.when(hit, _uap_slot(c, pat, brandspec)).otherwise(d_brand)
        d_model = F.when(hit, _uap_slot(c, pat, modelspec)).otherwise(d_model)

    return F.struct(
        F.struct(
            F.coalesce(ub_fam, b_fam).alias("family"),
            ub_maj.alias("major"),
            ub_min.alias("minor"),
            ub_pat.alias("patch"),
            F.coalesce(b_ver, ub_joined).alias("version"),
        ).alias("browser"),
        F.struct(
            d_brand.alias("brand"),
            device.alias("category"),
            d_fam.alias("family"),
            d_model.alias("model"),
        ).alias("device"),
        F.struct(
            F.coalesce(uo_fam, o_fam).alias("family"),
            uo_maj.alias("major"),
            uo_min.alias("minor"),
            uo_pat.alias("patch"),
            uo_pm.alias("patch_minor"),
            F.coalesce(uo_joined, o_ver).alias("version"),
        ).alias("os"),
    )


# ---------------------------------------------------------------------------
# ruby hash (parse_ruby_hash.cue) — string rewrite to JSON + from_json

def parse_ruby_hash(col: Column | str, schema: str) -> Column:
    """parse_ruby_hash (parse_ruby_hash.cue): ``{ "k" => v, ... }`` with
    `nil` -> typed struct.  Batch rendering: rewrite `=>` to `:` and bare
    `nil` to `null`, then `from_json` with the caller's schema (Spark is
    statically typed).  Assumes `=>`/`nil` do not appear inside string
    values (the reference grammar allows them; flag such payloads to the
    pandas escape hatch)."""
    c = _c(col)
    as_json = F.regexp_replace(
        F.regexp_replace(c, r"\s*=>\s*", ": "), r"\bnil\b", "null"
    )
    return F.from_json(as_json, schema)


# ---------------------------------------------------------------------------
# xml (parse_xml.cue) — Spark 4 native from_xml

def parse_xml(col: Column | str, schema: str, text_key: str = "value") -> Column:
    """parse_xml (parse_xml.cue): XML -> typed struct via Spark's native
    ``from_xml`` (JVM, no UDF).  Attribute keys use the reference's "@"
    prefix and expanded text nodes use ``text_key`` (cue defaults).
    Schema explicit — the reference infers dynamically; Spark is statically
    typed (same delta as parse_json); the root element maps to the struct
    itself rather than a single-key wrapper object."""
    return F.from_xml(
        _c(col), schema, {"attributePrefix": "@", "valueTag": text_key}
    )


# ---------------------------------------------------------------------------
# AWS CloudWatch Logs subscription message
# (parse_aws_cloudwatch_log_subscription_message.cue) — fixed JSON envelope

CLOUDWATCH_SCHEMA = (
    "owner string, messageType string, logGroup string, logStream string, "
    "subscriptionFilters array<string>, "
    "logEvents array<struct<id string, timestamp bigint, message string>>"
)


def parse_aws_cloudwatch_log_subscription_message(col: Column | str) -> Column:
    """JSON envelope -> typed struct with the reference's snake_case field
    names (parse_aws_cloudwatch_log_subscription_message.cue example);
    log_events timestamps are epoch-millis (convert downstream with
    to_timestamp(x / 1000))."""
    p = F.from_json(_c(col), CLOUDWATCH_SCHEMA)
    return F.struct(
        p["owner"].alias("owner"),
        p["messageType"].alias("message_type"),
        p["logGroup"].alias("log_group"),
        p["logStream"].alias("log_stream"),
        p["subscriptionFilters"].alias("subscription_filters"),
        p["logEvents"].alias("log_events"),
    )
