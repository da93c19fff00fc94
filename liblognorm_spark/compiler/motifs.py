"""Leaf motif parsers: exact-semantics walkers + regex fragments.

Each motif has up to three artifacts:

* ``parse_<motif>(text, offs, params) -> (consumed, value) | None`` — the
  exact-semantics walker, mirroring the reference parser byte for byte
  (reference file:line cited per function).  Used on the slow path
  (diagnostics / non-regexable rules / validation fallback).
* a regex *fragment* (``fragment(params) -> str | None``) — an anchored
  piece of the per-rule compiled pattern.  ``None`` means the motif cannot
  be expressed as a finite regex (json, cef, ...) and forces the rule onto
  the walker path.
* a *post* function mapping the captured text to the output JSON value
  (format coercions etc.).  Raising :class:`Reject` signals a
  value-dependent mismatch (e.g. ``maxval``) that the regex could not
  check; the matcher then falls back to the exact walker for that row.

All character classes are ASCII (C locale), hence explicit classes instead
of ``\\d``/``\\s``/``\\w`` which are unicode-aware on Python str.
"""

from __future__ import annotations

import json as _json
import os
import re
from datetime import datetime, timezone

SPACE = " \t\n\v\f\r"  # C isspace()
SPACE_SET = frozenset(SPACE)
DIGITS = frozenset("0123456789")
XDIGITS = frozenset("0123456789abcdefABCDEF")
ALPHA = frozenset("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")

RE_SPACE = r"[ \t\n\v\f\r]"
RE_NOT_SPACE = r"[^ \t\n\v\f\r]"
RE_DIGIT = "[0-9]"


class Reject(Exception):
    """Value-dependent mismatch discovered during post-processing."""


# ---------------------------------------------------------------- helpers


def _parse_int_greedy(text: str, i: int, n: int) -> tuple[int, int]:
    """hParseInt: greedy digit run, returns (value, new_i)."""
    v = 0
    while i < n and text[i] in DIGITS:
        v = v * 10 + ord(text[i]) - 48
        i += 1
    return v, i


def _days_from_civil(y: int, m: int, d: int) -> int:
    y -= m <= 2
    era = (y if y >= 0 else y - 399) // 400
    yoe = y - era * 400
    doy = (153 * (m + (-3 if m > 2 else 9)) + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return era * 146097 + doe - 719468


def civil_to_epoch(y, mo, d, h, mi, s, off_h=0, off_m=0, off_mode="+") -> int:
    """syslogTime2time_t equivalent (reference src/parser.c:252-304)."""
    epoch = _days_from_civil(y, mo, d) * 86400 + h * 3600 + mi * 60 + s
    off = off_h * 3600 + off_m * 60
    # '+03:00' means local = UTC+3 -> epoch = naive - offset
    return epoch - off if off_mode == "+" else epoch + off


# ---------------------------------------------------------------- motifs
# Each entry in MOTIFS: name -> dict(parse=fn, fragment=fn|None, post=fn|None)
# parse(text, offs, params) -> (consumed, value) | None
# value is computed per the *default* format; format coercion happens in
# the shared `coerce` step so regex fast path and walker agree.


def parse_never(text, offs, params):
    """Always fails: the tail of a dead-end stub rule (a rule whose parser
    config failed after its literal prefix was inserted — see
    loader._process_rule).  The prefix still earns parsedTo credit; this
    node guarantees the stub can never produce a match."""
    return None


def parse_literal(text, offs, params):
    """src/parser.c:1430-1450.  All-or-nothing here; per-char parsedTo
    credit on mismatch (the reference's per-char literal PDAG nodes) is
    applied by the walker via runtime.walker._literal_partial_credit."""
    lit = params["text"]
    n = len(text)
    j = 0
    llen = len(lit)
    while j < llen and offs + j < n and lit[j] == text[offs + j]:
        j += 1
    if j == llen:
        return (j, text[offs : offs + j])
    return None


def parse_whitespace(text, offs, params):
    """src/parser.c:1157-1178."""
    n = len(text)
    if offs >= n or text[offs] not in SPACE_SET:
        return None
    i = offs + 1
    while i < n and text[i] in SPACE_SET:
        i += 1
    return (i - offs, text[offs:i])


def parse_word(text, offs, params):
    """src/parser.c:1186-1211: 1+ chars up to next SP (0x20) or EOS."""
    n = len(text)
    i = offs
    while i < n and text[i] != " ":
        i += 1
    if i == offs:
        return None
    return (i - offs, text[offs:i])


def parse_alpha(text, offs, params):
    """src/parser.c:1299-1325."""
    n = len(text)
    i = offs
    while i < n and text[i] in ALPHA:
        i += 1
    if i == offs:
        return None
    return (i - offs, text[offs:i])


def parse_number(text, offs, params):
    """src/parser.c:784-827; maxval rejects larger values."""
    n = len(text)
    i = offs
    val = 0
    while i < n and text[i] in DIGITS:
        val = val * 10 + ord(text[i]) - 48
        i += 1
    maxval = int(params.get("maxval", 0))
    if maxval > 0 and val > maxval:
        return None
    if i == offs:
        return None
    return (i - offs, text[offs:i])


def parse_float(text, offs, params):
    """src/parser.c:883-941: [-]digits[.digits]; a lone '-' or '.' matches."""
    n = len(text)
    i = offs
    if i < n and text[i] == "-":
        i += 1
    seen_point = False
    while i < n:
        c = text[i]
        if c == ".":
            if seen_point:
                break
            seen_point = True
        elif c not in DIGITS:
            break
        i += 1
    if i == offs:
        return None
    return (i - offs, text[offs:i])


def parse_hexnumber(text, offs, params):
    """src/parser.c:994-1038: 0x + hexdigits, MUST be followed by isspace
    (end-of-string does NOT terminate)."""
    n = len(text)
    if offs + 2 > n or text[offs] != "0" or text[offs + 1] != "x":
        return None
    i = offs + 2
    val = 0
    while i < n and text[i] in XDIGITS:
        val = val * 16 + int(text[i], 16)
        i += 1
    if i >= n or text[i] not in SPACE_SET:
        return None
    maxval = int(params.get("maxval", 0))
    if maxval > 0 and val > maxval:
        return None
    return (i - offs, text[offs:i])


def parse_kernel_timestamp(text, offs, params):
    """src/parser.c:1098-1145: [#####.######] with 5-12 integer digits."""
    m = _KERNEL_RE.match(text, offs)
    if not m:
        return None
    return (m.end() - offs, m.group(0))


_KERNEL_RE = re.compile(r"\[[0-9]{5,12}\.[0-9]{6}\]")


def parse_rest(text, offs, params):
    """src/parser.c:1579-1593: always succeeds, even empty."""
    return (len(text) - offs, text[offs:])


def parse_string_to(text, offs, params):
    """src/parser.c:1222-1265: 1+ chars up to next occurrence of extradata
    (search starts at offs+1); terminator not consumed."""
    to_find = params.get("extradata", "")
    if not to_find:
        return None
    idx = text.find(to_find, offs + 1)
    if idx < 0:
        return None
    return (idx - offs, text[offs:idx])


def parse_char_to(text, offs, params):
    """src/parser.c:1342-1374: 1+ chars up to any char of extradata set;
    terminator must exist before EOS."""
    term = params.get("extradata", "")
    n = len(text)
    i = offs
    ts = frozenset(term)
    while i < n and text[i] not in ts:
        i += 1
    if i == offs or i == n:
        return None
    return (i - offs, text[offs:i])


def parse_char_sep(text, offs, params):
    """src/parser.c:1518-1546: 0+ chars up to any char of set or EOS;
    always succeeds."""
    term = frozenset(params.get("extradata", ""))
    n = len(text)
    i = offs
    while i < n and text[i] not in term:
        i += 1
    return (i - offs, text[offs:i])


def parse_op_quoted_string(text, offs, params):
    """src/parser.c:1602-1644: if quoted -> quotes stripped; else word."""
    n = len(text)
    i = offs
    if i >= n:
        return None
    if text[i] != '"':
        while i < n and text[i] != " ":
            i += 1
        if i == offs:
            return None
        return (i - offs, text[offs:i])
    i += 1
    while i < n and text[i] != '"':
        i += 1
    if i >= n:
        return None
    return (i + 1 - offs, text[offs + 1 : i])


def parse_quoted_string(text, offs, params):
    """src/parser.c:1654-1686: "..." — value KEEPS the quotes."""
    n = len(text)
    i = offs
    if i + 2 > n or text[i] != '"':
        return None
    i += 1
    while i < n and text[i] != '"':
        i += 1
    if i >= n:
        return None
    return (i + 1 - offs, text[offs : i + 1])


_ISO_RE = re.compile(r"[0-9]{4}-(?:0[1-9]|1[0-2])-(?:0[1-9]|[12][0-9]|3[01])")


def parse_date_iso(text, offs, params):
    """src/parser.c:1694-1741: exactly YYYY-MM-DD."""
    m = _ISO_RE.match(text, offs)
    if not m or m.end() - offs != 10:
        return None
    return (10, m.group(0))


_T24_RE = re.compile(r"(?:[01][0-9]|2[0-3]):[0-5][0-9]:[0-5][0-9]")
_T12_RE = re.compile(r"(?:0[0-9]|1[0-2]):[0-5][0-9]:[0-5][0-9]")
_DUR_RE = re.compile(r"[0-9]{1,2}:[0-5][0-9]:[0-5][0-9]")


def parse_time_24hr(text, offs, params):
    """src/parser.c:1943-1980."""
    m = _T24_RE.match(text, offs)
    return (8, m.group(0)) if m else None


def parse_time_12hr(text, offs, params):
    """src/parser.c:1988-2024."""
    m = _T12_RE.match(text, offs)
    return (8, m.group(0)) if m else None


def parse_duration(text, offs, params):
    """src/parser.c:1899-1936: H{1,2}:MM:SS."""
    m = _DUR_RE.match(text, offs)
    return (m.end() - offs, m.group(0)) if m else None


def _chk_ipv4_byte(text, i, n):
    """src/parser.c:2033-2057: 1-3 digits, value <= 255."""
    if i >= n or text[i] not in DIGITS:
        return None
    val = ord(text[i]) - 48
    i += 1
    if i < n and text[i] in DIGITS:
        val = val * 10 + ord(text[i]) - 48
        i += 1
        if i < n and text[i] in DIGITS:
            val = val * 10 + ord(text[i]) - 48
            i += 1
    if val > 255:
        return None
    return i


def parse_ipv4(text, offs, params):
    """src/parser.c:2062-2096."""
    n = len(text)
    if offs + 7 > n:
        return None
    i = offs
    for k in range(4):
        i = _chk_ipv4_byte(text, i, n)
        if i is None:
            return None
        if k < 3:
            if i >= n or text[i] != ".":
                return None
            i += 1
    return (i - offs, text[offs:i])


def parse_ipv6(text, offs, params):
    """src/parser.c:2106-2203: RFC4291 2.2 incl. '::' and embedded IPv4;
    must be followed by whitespace or EOS; pure IPv4 rejected."""
    n = len(text)
    i = offs
    if i + 2 > n:
        return None
    c = text
    if not (c[i] in XDIGITS or (c[i] == ":" and c[i + 1] == ":")):
        return None
    n_blocks = 0
    had_abbrev = False
    has_ipv4 = False
    begin_block = i
    ok_end = False
    for _ in range(9):
        begin_block = i
        if i == n:
            return None
        j = 0
        while j < 4 and i + j < n and c[i + j] in XDIGITS:
            j += 1
        i += j
        n_blocks += 1
        if i == n:
            ok_end = True
            break
        if c[i] in SPACE_SET:
            ok_end = True
            break
        if c[i] == ".":
            has_ipv4 = True
            break
        if c[i] != ":":
            return None
        i += 1
        if i == n:
            ok_end = True
            break
        if had_abbrev:
            if c[i] == ":":
                return None
        else:
            if c[i] == ":":
                had_abbrev = True
                i += 1
                if i == n:
                    ok_end = True
                    break
    if has_ipv4:
        n_blocks -= 1
        if begin_block == offs:
            return None
        i = begin_block
        r4 = parse_ipv4(text, i, params)
        if r4 is None:
            return None
        i += r4[0]
    if n_blocks > 8:
        return None
    if had_abbrev and n_blocks >= 8:
        return None
    if c[i - 1] == ":" and c[i - 2] != ":":
        return None
    return (i - offs, text[offs:i])


_MAC48_RE = re.compile(
    r"[0-9a-fA-F]{2}(?P<_macd>[:-])(?:[0-9a-fA-F]{2}(?P=_macd)){4}[0-9a-fA-F]{2}"
)


def parse_mac48(text, offs, params):
    """src/parser.c:2709-2754: 6 hex pairs, uniform ':' or '-' delimiter."""
    m = _MAC48_RE.match(text, offs)
    return (17, m.group(0)) if m else None


# ---- dates ----

_MONTHS = {
    "jan": 1, "feb": 2, "mar": 3, "apr": 4, "may": 5, "jun": 6,
    "jul": 7, "aug": 8, "sep": 9, "oct": 10, "nov": 11, "dec": 12,
}


def parse_date_rfc3164(text, offs, params):
    """src/parser.c:493-730 incl. quirks: case-insensitive month,
    1-digit day w/ extra SP, year-in-hour-position skipped, optional
    trailing ':', seconds <= 60."""
    n = len(text)
    i = offs
    if i + 3 > n:
        return None
    mon = _MONTHS.get(text[i : i + 3].lower())
    if mon is None:
        return None
    i += 3
    if i >= n or text[i] != " ":
        return None
    i += 1
    if i < n and text[i] == " ":  # 1-digit day
        i += 1
    day, i = _parse_int_greedy(text, i, n)
    if day < 1 or day > 31:
        return None
    if i >= n or text[i] != " ":
        return None
    i += 1
    hour, i = _parse_int_greedy(text, i, n)
    if 1970 < hour < 2100:  # year in hour position: skip it
        if i >= n or text[i] != " ":
            return None
        i += 1
        hour, i = _parse_int_greedy(text, i, n)
    if hour > 23:
        return None
    if i >= n or text[i] != ":":
        return None
    i += 1
    minute, i = _parse_int_greedy(text, i, n)
    if minute > 59:
        return None
    if i >= n or text[i] != ":":
        return None
    i += 1
    second, i = _parse_int_greedy(text, i, n)
    if second > 60:
        return None
    if i < n and text[i] == ":":  # eat invalid-but-frequent trailing ':'
        i += 1
    consumed = i - offs
    fmt = params.get("format", "string")
    if fmt == "string":
        return (consumed, text[offs : offs + consumed])
    year = datetime.now(timezone.utc).year  # current year, src/parser.c:711-715
    ts = civil_to_epoch(year, mon, day, hour, minute, second)
    if fmt == "timestamp-unix-ms":
        ts *= 1000
    return (consumed, ts)


def parse_date_rfc5424(text, offs, params):
    """src/parser.c:312-441: lenient RFC3339 subset; mandatory TZ; must be
    followed by SP or EOS."""
    n = len(text)
    i = offs
    year, i = _parse_int_greedy(text, i, n)
    if i >= n or text[i] != "-":
        return None
    i += 1
    month, i = _parse_int_greedy(text, i, n)
    if month < 1 or month > 12:
        return None
    if i >= n or text[i] != "-":
        return None
    i += 1
    day, i = _parse_int_greedy(text, i, n)
    if day < 1 or day > 31:
        return None
    if i >= n or text[i] != "T":
        return None
    i += 1
    hour, i = _parse_int_greedy(text, i, n)
    if hour > 23:
        return None
    if i >= n or text[i] != ":":
        return None
    i += 1
    minute, i = _parse_int_greedy(text, i, n)
    if minute > 59:
        return None
    if i >= n or text[i] != ":":
        return None
    i += 1
    second, i = _parse_int_greedy(text, i, n)
    if second > 60:
        return None
    secfrac, secfrac_prec = 0, 0
    if i < n and text[i] == ".":
        i += 1
        start = i
        secfrac, i = _parse_int_greedy(text, i, n)
        secfrac_prec = i - start
    if i >= n:
        return None
    off_h = off_m = 0
    off_mode = "+"
    if text[i] == "Z":
        i += 1
    elif text[i] in "+-":
        off_mode = text[i]
        i += 1
        off_h, i = _parse_int_greedy(text, i, n)
        if off_h > 23:
            return None
        if i >= n or text[i] != ":":
            return None
        i += 1
        off_m, i = _parse_int_greedy(text, i, n)
        if off_m > 59:
            return None
    else:
        return None
    if i < n and text[i] != " ":
        return None
    consumed = i - offs
    fmt = params.get("format", "string")
    if fmt == "string":
        return (consumed, text[offs : offs + consumed])
    ts = civil_to_epoch(year, month, day, hour, minute, second, off_h, off_m, off_mode)
    if fmt == "timestamp-unix-ms":
        ts *= 1000
        if secfrac_prec == 1:
            secfrac *= 100
        elif secfrac_prec == 2:
            secfrac *= 10
        elif secfrac_prec > 3:
            secfrac //= 10 ** (secfrac_prec - 3)
        ts += secfrac
    return (consumed, ts)


# ---- structured motifs (emit dict/list/parsed-JSON values) ----


def parse_json(text, offs, params):
    """src/parser.c:2340-2378: must start with '{' (or ']' — json-c quirk);
    trailing whitespace belongs to the JSON (json-c tokener semantics)."""
    n = len(text)
    if offs >= n or text[offs] not in "{]":
        return None
    try:
        val, end = _json.JSONDecoder().raw_decode(text, offs)
    except ValueError:
        return None
    while end < n and text[end] in SPACE_SET:  # json-c eats trailing WS
        end += 1
    return (end - offs, val)


def parse_cee_syslog(text, offs, params):
    """src/parser.c:2522-2568: '@cee:' + WS* + one JSON object to EOS."""
    n = len(text)
    if n < offs + 7 or text[offs : offs + 5] != "@cee:":
        return None
    i = offs + 5
    while i < n and text[i] in SPACE_SET:
        i += 1
    if i >= n or text[i] != "{":
        return None
    try:
        val, end = _json.JSONDecoder().raw_decode(text, i)
    except ValueError:
        return None
    while end < n and text[end] in SPACE_SET:
        end += 1
    if end != n:
        return None
    return (n - offs, val)


_IPT_NAME = frozenset("ABCDEFGHIJKLMNOPQRSTUVWXYZ")


def _parse_iptables_nv(text, i, n, out):
    """src/parser.c:2221-2269."""
    i_name = i
    while i < n and text[i] in _IPT_NAME:
        i += 1
    if i == i_name or (i < n and text[i] != "=" and text[i] != " "):
        return None
    name = text[i_name:i]
    val = None
    if i < n and text[i] != " ":
        i += 1  # skip '='
        i_val = i
        while i < n and text[i] not in SPACE_SET:
            i += 1
        val = text[i_val:i]
    if out is not None:
        out[name] = val
    return i


def parse_v2_iptables(text, offs, params):
    """src/parser.c:2287-2326: >=2 NAME[=value] pairs to EOS."""
    n = len(text)
    i = offs
    nfields = 0
    while i < n:
        probe = _parse_iptables_nv(text, i, n, None)
        if probe is None:
            return None
        i = probe
        nfields += 1
        if i < n and text[i] == " ":
            i += 1
    if nfields < 2:
        return None
    out: dict = {}
    i = offs
    while i < n:
        nxt = _parse_iptables_nv(text, i, n, out)
        if nxt is None:  # cannot happen: stage one validated
            break
        i = nxt
        while i < n and text[i] in SPACE_SET:
            i += 1
    return (n - offs, out)


from functools import lru_cache


@lru_cache(maxsize=64)
def _nv_regexes(sep: str, ass: str):
    """Compiled pair-scanners for parseNameValue (src/parser.c:2404-2511).

    The escaped-separator parity rule ("continue while separator is
    preceded by an odd number of backslashes") is exactly the pair-scan
    ``\\\\[\\s\\S]|[^\\\\<sep>]``; a lone trailing backslash at EOS is
    consumed like the C loop does."""
    if ass:
        name_re = re.compile(rf"(?:(?!{re.escape(ass)})[\s\S])+")
    else:
        name_re = re.compile(r"[0-9A-Za-z._-]+")
    sep_cls = re.escape(sep) if sep else " \\t\\n\\v\\f\\r"
    bare_re = re.compile(rf"(?:\\[\s\S]|[^\\{sep_cls}])*+(?:\\(?![\s\S]))?")
    dq_re = re.compile(r'"((?:\\[\s\S]|[^"\\])*+)"')
    sq_re = re.compile(r"'((?:\\[\s\S]|[^'\\])*+)'")
    return name_re, bare_re, dq_re, sq_re


def _parse_name_value(text, i, n, out, sep, ass):
    """src/parser.c:2404-2511 (parseNameValue) incl. escaped-quote parity."""
    name_re, bare_re, dq_re, sq_re = _nv_regexes(sep, ass)
    mn = name_re.match(text, i)
    if mn is None:
        return None
    i = mn.end()
    if i >= n or text[i] != (ass if ass else "="):
        return None
    name = mn.group(0)
    i += 1  # skip assignator
    c = text[i] if i < n else ""
    if c == '"':
        mv = dq_re.match(text, i)
        if mv is None:
            return None
        val = mv.group(1)
        i = mv.end()
    elif c == "'":
        mv = sq_re.match(text, i)
        if mv is None:
            return None
        val = mv.group(1)
        i = mv.end()
    else:
        mv = bare_re.match(text, i)
        val = mv.group(0)
        i = mv.end()
    if out is not None:
        out[name] = val
    return i


def parse_name_value_list(text, offs, params):
    """src/parser.c:2589-2637: k=v pairs; custom separator/assignator."""
    n = len(text)
    sep = params.get("separator") or params.get("extradata") or ""
    if len(sep) > 1:
        sep = sep[0]
    ass = params.get("assignator") or ""
    if len(ass) > 1:
        ass = ass[0]
    out: dict = {}
    i = offs
    while i < n:
        nxt = _parse_name_value(text, i, n, out, sep, ass)
        if nxt is None:
            break
        i = nxt
        if i < n and not ((text[i] in SPACE_SET) if not sep else (text[i] == sep)):
            break
        while i < n and ((text[i] in SPACE_SET) if not sep else (text[i] == sep)):
            i += 1
    return (i - offs, out)


def parse_checkpoint_lea(text, offs, params):
    """src/parser.c:3069-3142: 'name: value;' pairs; optional terminator."""
    n = len(text)
    term = params.get("terminator")
    i = offs
    found = 0
    out: dict = {}
    while i < n:
        while i < n and text[i] == " ":
            i += 1
        if i == n:
            if found == 0:
                return None
            break
        found += 1
        if term is not None and text[i] == term:
            break
        i_name = i
        while i < n and text[i] != ":":
            i += 1
        if i + 1 >= n or text[i] != ":":
            return None
        name = text[i_name:i]
        i += 1
        while i < n and text[i] == " ":
            i += 1
        i_val = i
        while i < n and text[i] != ";":
            i += 1
        if i >= n or text[i] != ";":
            return None
        out[name] = text[i_val:i]
        i += 1
    return (i - offs, out)


def parse_cisco_interface_spec(text, offs, params):
    """src/parser.c:1756-1890: [interface:]ip/port [(ip2/port2)][[ ](user)]."""
    n = len(text)
    i = offs
    if i >= n or text[i] == ":" or text[i] in SPACE_SET:
        return None
    out: dict = {}
    r4 = parse_ipv4(text, i, params)
    if r4 is not None:
        ip = r4[1]
        i += r4[0]
    else:
        idx_if = i
        while i < n:
            if text[i] in SPACE_SET:
                return None
            if text[i] == ":":
                break
            i += 1
        if i == n:
            return None
        out["interface"] = text[idx_if:i]
        i += 1  # skip colon
        r4b = parse_ipv4(text, i, params)
        if r4b is None:
            return None
        ip = r4b[1]
        i += r4b[0]
    if i >= n or text[i] != "/":
        return None
    i += 1
    rnum = parse_number(text, i, {})
    if rnum is None:
        return None
    port = rnum[1]
    i += rnum[0]
    out["ip"] = ip
    out["port"] = port
    # optional " (ip2/port2)"
    if i + 5 < n and text[i] == " " and text[i + 1] == "(":
        t = i + 2
        r42 = parse_ipv4(text, t, params)
        if r42 is not None:
            t2 = t + r42[0]
            if t2 < n and text[t2] == "/":
                t2 += 1
                rp2 = parse_number(text, t2, {})
                if rp2 is not None:
                    t3 = t2 + rp2[0]
                    if t3 < n and text[t3] == ")":
                        out["ip2"] = r42[1]
                        out["port2"] = rp2[1]
                        i = t3 + 1
    # optional "(user)" or " (user)"
    if (i + 2 < n and text[i] == "(" and text[i + 1] not in SPACE_SET) or (
        i + 3 < n and text[i] == " " and text[i + 1] == "(" and text[i + 2] not in SPACE_SET
    ):
        idx_user = i + (2 if text[i] == " " else 1)
        t = idx_user
        while t < n and text[t] not in SPACE_SET and text[t] != ")":
            t += 1
        if t < n and text[t] == ")":
            out["user"] = text[idx_user:t]
            i = t + 1
    return (i - offs, out)


def _cef_get_hdr_field(text, i, n):
    """src/parser.c:2910-2968 (cefGetHdrField)."""
    start = i
    while i < n and text[i] != "|":
        if text[i] == "\\":
            i += 1
            if i >= n or text[i] not in "\\|":
                return None
        i += 1
    if i >= n or text[i] != "|":
        return None
    raw = text[start:i]
    out = []
    j = 0
    while j < len(raw):
        if raw[j] == "\\":
            j += 1
        out.append(raw[j])
        j += 1
    return (i + 1, "".join(out))


def _cef_parse_ext_value(text, i, n):
    """src/parser.c:2760-2808 (cefParseExtensionValue): find end of current
    value via last-word-before-next-'=' lookahead."""
    i_last_word = 0
    had_sp = False
    in_escape = False
    while i < n:
        c = text[i]
        if in_escape:
            if c not in "=\\rn/":
                return None
            in_escape = False
        else:
            if c == "=":
                break
            elif c == "\\":
                in_escape = True
            elif c == " ":
                had_sp = True
            else:
                if had_sp:
                    i_last_word = i
                    had_sp = False
        i += 1
    if i < n:
        return i if i_last_word == 0 else i_last_word - 1
    return i


def parse_cef(text, offs, params):
    """src/parser.c:2974-3060: CEF:0 header + extensions; consumes all."""
    n = len(text)
    i = offs
    if n < i + 17 or text[i : i + 6] != "CEF:0|":
        return None
    i += 6
    hdr = []
    for _ in range(6):
        r = _cef_get_hdr_field(text, i, n)
        if r is None:
            return None
        i, val = r
        hdr.append(val)
    v1 = bool(params.get("_v1_engine"))
    if v1:
        # v1 engine (rulebase without version=2): after the terminal '|'
        # the v1 parser skips exactly ONE char (v1_parser.c '++i; /* skip
        # over terminal |*/' — the pipes were already consumed by
        # cefGetHdrField, so this eats the single separator space), and its
        # extension loop has no pre-space-skip: entering with only spaces
        # left dies at the name guard.  Hence field_cef_v1.sh's 'single
        # trailing space - valid' but 'multiple trailing spaces - invalid',
        # where v2 (parser.c:3002) skips ALL spaces before the loop and
        # accepts both.
        if i < n:
            i += 1
    else:
        while i < n and text[i] == " ":
            i += 1
    ext: dict = {}
    while i < n:
        while i < n and text[i] == " ":
            i += 1
        i_name = i
        while i < n and text[i] != "=":
            if not (text[i].isalnum() and ord(text[i]) < 128 or text[i] in "_."):
                return None
            i += 1
        if i >= n or text[i] != "=":
            return None
        if v1 and i + 1 >= n:
            return None  # v1 name guard is 'i+1 >= strLen': '=' at EOS fails
        name = text[i_name:i]
        i += 1
        i_val = i
        vend = _cef_parse_ext_value(text, i, n)
        if vend is None:
            return None
        raw = text[i_val:vend]
        i = vend + 1
        # unescape
        out = []
        j = 0
        while j < len(raw):
            if raw[j] == "\\" and j + 1 < len(raw):
                nxt = raw[j + 1]
                out.append({"=": "=", "n": "\n", "r": "\r", "\\": "\\", "/": "/"}.get(nxt, ""))
                j += 2
            else:
                out.append(raw[j])
                j += 1
        ext[name] = "".join(out)
    value = {
        "DeviceVendor": hdr[0],
        "DeviceProduct": hdr[1],
        "DeviceVersion": hdr[2],
        "SignatureID": hdr[3],
        "Name": hdr[4],
        "Severity": hdr[5],
        "Extensions": ext,
    }
    return (n - offs, value)


def _string_perm_set(params):
    perm = params.get("matching.permitted")
    if perm is None:
        return None  # all permitted
    chars: set[str] = set()
    if isinstance(perm, str):
        chars.update(perm)
    elif isinstance(perm, list):
        for elem in perm:
            if not isinstance(elem, dict):
                continue
            for k, v in elem.items():
                if k.lower() == "chars":
                    chars.update(str(v))
                elif k.lower() == "class":
                    cv = str(v).lower()
                    if cv == "digit":
                        chars.update("0123456789")
                    elif cv == "hexdigit":
                        chars.update("0123456789aAbBcCdDeEfF")
                    elif cv == "alpha":
                        chars.update(ALPHA)
                    elif cv == "alnum":
                        chars.update("0123456789")
                        chars.update(ALPHA)
    return frozenset(chars)


def parse_string(text, offs, params):
    """Generic string parser, src/parser.c:3455-3570."""
    n = len(text)
    i = offs
    if i == n:
        return None
    quote_mode = str(params.get("quoting.mode", "auto")).lower()
    esc_md = str(params.get("quoting.escape.mode", "both")).lower()
    if quote_mode == "none":
        esc_md = "none"
    qbegin = params.get("quoting.char.begin", '"')
    qend = params.get("quoting.char.end", '"')
    matching = str(params.get("matching.mode", "strict")).lower()
    strip_quotes = True
    perm = _string_perm_set(params)

    have_quotes = had_end_quote = had_escape = False
    if quote_mode == "auto" and text[i] == qbegin:
        have_quotes = True
        i += 1
    elif quote_mode == "required":
        if text[i] == qbegin:
            have_quotes = True
            i += 1
        else:
            return None
    while i < n:
        if have_quotes and text[i] == qend:
            if esc_md in ("double", "both"):
                if i + 1 < n and text[i + 1] == qend:
                    had_escape = True
                    i += 1
                else:
                    had_end_quote = True
                    break
            else:
                had_end_quote = True
                break
        if text[i] == "\\" and i + 1 < n and esc_md in ("backslash", "both"):
            had_escape = True
            i += 1
        if not have_quotes and text[i] == " ":
            break
        if perm is not None and text[i] not in perm:
            break
        i += 1
    if have_quotes and not had_end_quote:
        return None
    if i == offs:
        return None
    if (i - offs < 1) or matching != "lazy":
        trm = i + 1 if have_quotes else i
        if trm != n and (trm > n or text[trm] != " "):
            return None
    consumed = i - offs
    if had_end_quote:
        consumed += 1
    if have_quotes and strip_quotes:
        raw = text[offs + 1 : offs + consumed - 1]
    else:
        raw = text[offs : offs + consumed]
    if had_escape:
        out = []
        j = 0
        while j < len(raw):
            if (
                j + 1 < len(raw)
                and raw[j] == qend
                and raw[j + 1] == qend
                and esc_md in ("double", "both")
            ) or (raw[j] == "\\" and esc_md in ("backslash", "both")):
                j += 1  # drop escape char
                if j >= len(raw):
                    break
            out.append(raw[j])
            j += 1
        raw = "".join(out)
    return (consumed, raw)


# ------------------------------------------------------------ registry

def configure_regex(params: dict, allowed: bool) -> str | None:
    """Load-time validation for the v1-compat ``regex`` motif
    (src/v1_parser.c:1316-1420 regex_parser_data_constructor).

    extradata is colon-split (patterns escape ':' as \\x3a, exactly like
    the reference's pcons args): pattern[:consume_group[:return_group]].
    consume defaults to 0, return defaults to consume; empty or non-numeric
    group args are load errors, as is an uncompilable pattern or using the
    motif without the allowRegex option (LN_CTXOPT_ALLOW_REGEX,
    liblognorm.h:142).  On success stores the compiled pattern + group
    numbers into params and returns None; else returns the error string."""
    if not allowed:
        return "regex support is not enabled (pass option allowRegex)"
    ed = params.get("extradata_raw") or params.get("extradata") or ""
    args = ed.split(":")
    pattern = args[0]
    if not pattern:
        return "regex: pattern missing"
    consume_s = args[1] if len(args) > 1 else "0"
    return_s = args[2] if len(args) > 2 else consume_s
    if not consume_s or not consume_s.isdigit():
        return "regex: couldn't parse consume-group number"
    if not return_s or not return_s.isdigit():
        return "regex: couldn't parse return-group number"
    try:
        rx = re.compile(pattern)
    except re.error as e:
        return f"regex: couldn't compile pattern: {e}"
    params["_rx"] = rx
    params["consume_group"] = int(consume_s)
    params["return_group"] = int(return_s)
    return None


def parse_regex(text, offs, params):
    """v1 ``regex`` motif, src/v1_parser.c:1275-1313 PARSER(Regex).

    Reference quirks reproduced faithfully: the parser ALWAYS succeeds
    (r = 0 unconditionally); it consumes the consume-group's span only when
    that group participated AND starts exactly at offs, else consumes 0;
    the value is the return group's text when return != consume, otherwise
    the consumed substring.  (PCRE vs Python `re` dialect differences are
    out of scope — the reference's own tests use the common subset.)"""
    rx = params["_rx"]
    cg = params["consume_group"]
    rg = params["return_group"]
    consumed = 0
    value = ""
    m = rx.search(text, offs)
    if m is not None and cg <= rx.groups:
        start, end = m.span(cg)
        if start == offs:
            consumed = end - start
            if rg != cg:
                value = m.group(rg) if rg <= rx.groups and m.group(rg) is not None else ""
            else:
                value = text[offs:offs + consumed]
    return (consumed, value)


def configure_tokenized(params: dict, rulebase) -> str | None:
    """Load-time config for the v1-compat ``tokenized`` motif
    (src/v1_parser.c tokenized_parser_data_constructor): extradata is
    'separator:field-descriptor' split on the FIRST raw colon (separator is
    then unescaped; the descriptor keeps its colons — that is how
    `tokenized:, :tokenized:#:number` nests).  The descriptor is itself a
    field definition, configured recursively (so regex inside tokenized
    still requires allowRegex, and tokenized nests arbitrarily)."""
    from liblognorm_spark.rulebase.loader import PNode, parse_template, unescape

    raw = params.get("extradata_raw") or params.get("extradata") or ""
    idx = raw.find(":")
    if idx < 0:
        return "tokenized: field-type not provided"
    tok = unescape(raw[:idx])
    descr = raw[idx + 1:]
    if not tok:
        return "tokenized: token-separator not provided"
    if not descr:
        return "tokenized: field-type not provided"
    try:
        params["_subnode"] = _build_subnode(descr, rulebase)
    except Exception as e:
        return f"tokenized: {e}"
    params["_tok"] = tok
    return None


def parse_tokenized(text, offs, params):
    """v1 ``tokenized`` motif, src/v1_parser.c:892-960 PARSER(Tokenized):
    parse one sub-field, then loop 'separator + sub-field'; the value is
    the array of token values (arrays nest for tokenized-in-tokenized).
    A failure on the FIRST token fails the parser; a failure after a
    consumed separator un-consumes that separator and stops (the
    reference's `remaining_len += es_strlen(tok_str); break`)."""
    from liblognorm_spark.runtime.walker import WalkState, try_parser

    node = params["_subnode"]
    tok = params["_tok"]
    state = WalkState(text=text, strlen=len(text), types={})
    matches: list = []
    pos = offs
    n = len(text)
    while pos < n:
        ok, consumed, value = try_parser(state, node, pos)
        # a 0-consumed no-value success (recursive's unparsed branch) would
        # loop forever on the same offset; treat it as a token miss
        if ok and value is NO_VALUE and consumed == 0:
            ok = False
        if not ok:
            if matches:
                pos -= len(tok)  # un-consume the separator before the failure
                break
            return None
        matches.append(value)
        pos += consumed
        if text.startswith(tok, pos):
            pos += len(tok)
        else:
            break
    if not matches:
        return None
    return (pos - offs, matches)


def _build_subnode(descr: str, rulebase):
    """Parse a v1 sub-field descriptor into one PNode and configure it
    recursively (shared by tokenized/interpret/suffixed)."""
    from liblognorm_spark.rulebase.loader import PNode, parse_template

    subseq = parse_template(f"%token:{descr}%")
    if len(subseq) != 1 or not isinstance(subseq[0], PNode):
        raise ValueError("couldn't resolve sub-field descriptor")
    if subseq[0].ptype not in PARSERS:
        raise ValueError(f"unknown field-type '{subseq[0].ptype}'")
    rulebase._configure_seq(subseq)
    return subseq[0]


INTERPRET_TYPES = {"int", "base10int", "base16int", "float", "bool"}


def configure_interpret(params: dict, rulebase) -> str | None:
    """v1 ``interpret`` motif config (src/v1_parser.c
    interpret_parser_data_constructor): extradata = 'type:field-descriptor';
    type in int|base10int|base16int|float|bool."""
    raw = params.get("extradata_raw") or params.get("extradata") or ""
    idx = raw.find(":")
    if idx < 0:
        return "interpret: field-type not provided"
    type_str, descr = raw[:idx], raw[idx + 1:]
    if type_str not in INTERPRET_TYPES:
        return f"interpret: unknown interpret-type '{type_str}'"
    if not descr:
        return "interpret: field-type not provided"
    try:
        params["_subnode"] = _build_subnode(descr, rulebase)
    except Exception as e:
        return f"interpret: {e}"
    params["_itype"] = type_str
    return None


def _strtol(s: str, base: int) -> int:
    """C strtol: longest valid leading prefix, 0 if none; base 16 accepts
    an optional 0x/0X prefix (only when hex digits follow — on bare "0x"
    strtol's subject sequence is just the "0")."""
    i, n = 0, len(s)
    if i < n and s[i] in "+-":
        i += 1
    digits = "0123456789abcdef"[:base]
    if (
        base == 16
        and i + 2 < n
        and s[i] == "0"
        and s[i + 1] in "xX"
        and s[i + 2].lower() in digits
    ):
        i += 2
    j = i
    while j < n and s[j].lower() in digits:
        j += 1
    if j == i:
        return 0
    return int(s[i:j], base) * (-1 if s.startswith("-") else 1)


_STRTOD_RE = re.compile(r"[+-]?(?:\d+(?:\.\d*)?|\.\d+)(?:[eE][+-]?\d+)?")


def _strtod(s: str) -> float:
    m = _STRTOD_RE.match(s)
    return float(m.group(0)) if m else 0.0


def parse_interpret(text, offs, params):
    """v1 ``interpret`` motif, src/v1_parser.c:1474-1505 PARSER(Interpret):
    parse the sub-field, reinterpret its string value (strtol/strtod/bool
    semantics — json-c's coercions); a sub-field miss is the usual v1
    success-with-0-consumed quirk."""
    from liblognorm_spark.runtime.walker import WalkState, try_parser

    state = WalkState(text=text, strlen=len(text), types={})
    ok, consumed, value = try_parser(state, params["_subnode"], offs)
    if not ok:
        # v1 quirk: r=0 with *parsed=0 and *value untouched (NULL) — the
        # engine consumes nothing and attaches NO field
        return (0, NO_VALUE)
    s = value if isinstance(value, str) else str(value)
    it = params["_itype"]
    if it in ("int", "base10int"):
        out = _strtol(s, 10)
    elif it == "base16int":
        out = _strtol(s, 16)
    elif it == "float":
        out = _strtod(s)
    else:  # bool: false/no (any case) -> false, everything else -> true
        out = s.lower() not in ("false", "no")
    return (consumed, out)


def configure_suffixed(params: dict, rulebase, named: bool) -> str | None:
    """v1 ``suffixed``/``named_suffixed`` motif config (src/v1_parser.c
    _suffixed_parser_data_constructor): extradata =
    [valueName:suffixName:]tokenizer:suffixList:field-descriptor; tokenizer
    and suffix list are unescaped AFTER the raw colon split (\\x3a hides a
    colon), and the tokenizer chars split the suffix list strtok-style."""
    raw = params.get("extradata_raw") or params.get("extradata") or ""
    parts = raw.split(":")
    need = 5 if named else 3
    if len(parts) < need:
        return "suffixed: too few arguments"
    if named:
        vname, sname = parts[0], parts[1]
        parts = parts[2:]
    else:
        vname, sname = "value", "suffix"
    from liblognorm_spark.rulebase.loader import unescape

    tok = unescape(parts[0])
    sufs_raw = unescape(parts[1])
    descr = ":".join(parts[2:])
    if not vname or not sname:
        return "suffixed: value/suffix field name empty"
    if not tok:
        return "suffixed: tokenizer not provided"
    sufs = [t for t in re.split("[" + re.escape(tok) + "]", sufs_raw) if t]
    if not sufs:
        return "suffixed: suffix list empty"
    if not descr:
        return "suffixed: field-type not provided"
    try:
        params["_subnode"] = _build_subnode(descr, rulebase)
    except Exception as e:
        return f"suffixed: {e}"
    params["_vname"], params["_sname"], params["_sufs"] = vname, sname, sufs
    return None


def parse_suffixed(text, offs, params):
    """v1 ``suffixed`` motif, src/v1_parser.c PARSER(Suffixed): parse the
    sub-field, then the FIRST suffix (in list order) that prefixes the
    remaining text is consumed; value = {valueName: v, suffixName: s}.
    No suffix match / sub-field miss -> the v1 success-with-0 quirk."""
    from liblognorm_spark.runtime.walker import WalkState, try_parser

    state = WalkState(text=text, strlen=len(text), types={})
    ok, consumed, value = try_parser(state, params["_subnode"], offs)
    if not ok:
        # v1 quirk: r=0, *parsed=0, *value NULL -> nothing attached
        return (0, NO_VALUE)
    end = offs + consumed
    for suf in params["_sufs"]:
        if text.startswith(suf, end):
            return (consumed + len(suf), {params["_vname"]: value, params["_sname"]: suf})
    return (0, NO_VALUE)


# ------------------------------------------------------------ v1 recursive / descent

NO_VALUE = object()
"""Sentinel: parser SUCCESS whose value must not be attached as a field.
The v1 recursive parser's unparsed branch returns r=0 with *value == NULL
and *parsed == 0 (src/v1_parser.c:906-910) — the engine then adds no field
and continues the rule at the same offset."""


def configure_recursive(params: dict, rulebase) -> str | None:
    """v1 ``recursive`` field config (src/v1_parser.c:985-988): ONE pcons
    arg — the whole extradata, colons included (pcons_args with
    expected_argc=1 never splits, v1_parser.c:136-147) — names the
    remaining/tail field, default 'tail'.  The sub-context is the rulebase
    itself (identity ctx constructor, v1_parser.c:967-971) and is LIVE:
    rules added after this one are visible at parse time."""
    raw = params.get("extradata_raw")
    params["_remaining"] = "tail" if raw is None else raw
    params["_sub_rb"] = rulebase
    return None


def configure_descent(params: dict, rulebase) -> str | None:
    """v1 ``descent`` field config (src/v1_parser.c:990-1011): extradata =
    2 pcons args 'rulebase-file[:remaining-field]'; arg 0 is unescaped
    (pcons_unescape_arg), arg 1 defaults to 'tail' when ABSENT but stays
    empty when present-and-empty (trailing colon), which disables tail
    stripping — exercised by field_descent_with_invalid_ruledef.sh's
    'empty tail-field given' case.  The child rulebase loads at rule-load
    time; any failure is a config error that drops the rule."""
    from liblognorm_spark.rulebase.loader import unescape

    raw = params.get("extradata_raw")
    if raw is None:
        return "descent: rulebase not provided"
    idx = raw.find(":")
    rb_file = unescape(raw if idx < 0 else raw[:idx])
    params["_remaining"] = "tail" if idx < 0 else raw[idx + 1 :]
    if not rb_file:
        return "descent: rulebase not provided"
    base_dir = getattr(rulebase, "_state", {}).get("base_dir")
    path = rb_file if os.path.isabs(rb_file) else os.path.join(base_dir or ".", rb_file)
    try:
        child = type(rulebase).from_file(path, opts=rulebase.opts)
    except OSError as e:
        return f"descent: couldn't load rulebase '{rb_file}': {e}"
    params["_sub_rb"] = child
    return None


def _ordered_rules(rb):
    """Priority-ordered rule list for a sub-normalize, cached per rule
    count (the recursive ctx is live — later-added rules must appear)."""
    cache = getattr(rb, "_ordered_rules_cache", None)
    if cache is not None and cache[0] == len(rb.rules):
        return cache[1]
    from liblognorm_spark.compiler.compiler import order_rules

    ordered = [rb.rules[i] for i in order_rules(rb.rules)]
    rb._ordered_rules_cache = (len(rb.rules), ordered)
    return ordered


# active (parser-instance, remaining-length) frames: re-entering the SAME
# recursive parser with the SAME remaining length can never progress (a
# rule that STARTS with %f:recursive% normalizes its own full input) — the
# reference C simply recurses until the stack blows; we fail the branch.
# Thread-local so concurrent normalize calls cannot corrupt each other's
# guard (each would otherwise see the other's frames and discard them).
import threading as _threading

_RECURSION_TLS = _threading.local()


def _active_recursions() -> set:
    s = getattr(_RECURSION_TLS, "active", None)
    if s is None:
        s = _RECURSION_TLS.active = set()
    return s


def parse_recursive(text, offs, params):
    """v1 recursive/descent parse (src/v1_parser.c:892-918
    PARSER(Recursive)): ln_normalize the remaining text with the
    sub-context.  A sub-result carrying unparsed-data -> SUCCESS consuming
    0 chars with no value.  Otherwise, if the remaining-field is present,
    its string length is subtracted from the consumed span and the field
    deleted from the value (non-string tails count 0 chars, mirroring
    json_object_get_string_len's 0-for-non-string).

    Divergence from the reference (documented): zero-progress
    self-recursion and Python-stack exhaustion degrade to the unparsed
    branch instead of crashing the process the way the C's unbounded
    recursion would."""
    from liblognorm_spark.runtime.walker import normalize_message

    rb = params["_sub_rb"]
    rem = text[offs:]
    active = _active_recursions()
    key = (id(params), len(rem))
    if key in active:
        return (0, NO_VALUE)
    active.add(key)
    try:
        rule, event, _pto = normalize_message(
            _ordered_rules(rb), rem, rb.types, rb.annotations,
            v1_engine=getattr(rb, "version", 1) == 1,
        )
    except RecursionError:
        return (0, NO_VALUE)
    finally:
        active.discard(key)
    if rule is None:
        return (0, NO_VALUE)
    remaining = params["_remaining"]
    if remaining and remaining in event:
        tail = event.pop(remaining)
        tail_len = len(tail) if isinstance(tail, str) else 0
        return (len(rem) - tail_len, event)
    return (len(rem), event)


PARSERS = {
    "literal": parse_literal,
    "never": parse_never,
    "recursive": parse_recursive,
    "descent": parse_recursive,
    "regex": parse_regex,
    "tokenized": parse_tokenized,
    "interpret": parse_interpret,
    "suffixed": parse_suffixed,
    "named_suffixed": parse_suffixed,
    "whitespace": parse_whitespace,
    "word": parse_word,
    "alpha": parse_alpha,
    "number": parse_number,
    "float": parse_float,
    "hexnumber": parse_hexnumber,
    "kernel-timestamp": parse_kernel_timestamp,
    "rest": parse_rest,
    "string-to": parse_string_to,
    "char-to": parse_char_to,
    "char-sep": parse_char_sep,
    "op-quoted-string": parse_op_quoted_string,
    "quoted-string": parse_quoted_string,
    "date-iso": parse_date_iso,
    "time-24hr": parse_time_24hr,
    "time-12hr": parse_time_12hr,
    "duration": parse_duration,
    "ipv4": parse_ipv4,
    "ipv6": parse_ipv6,
    "mac48": parse_mac48,
    "date-rfc3164": parse_date_rfc3164,
    "date-rfc5424": parse_date_rfc5424,
    "json": parse_json,
    "cee-syslog": parse_cee_syslog,
    "v2-iptables": parse_v2_iptables,
    "name-value-list": parse_name_value_list,
    "checkpoint-lea": parse_checkpoint_lea,
    "cisco-interface-spec": parse_cisco_interface_spec,
    "cef": parse_cef,
    "string": parse_string,
}


def coerce_value(motif: str, raw, params):
    """Apply format coercions shared by walker & regex paths.

    number/hexnumber format:number -> int64 (src/parser.c:817-823, 1030-1034);
    float format:number -> double (src/parser.c:929-935).
    Date unix formats are already coerced inside their walkers."""
    fmt = params.get("format")
    if fmt == "number":
        if motif == "number":
            return int(raw) if raw else 0
        if motif == "hexnumber":
            return int(raw, 16)
        if motif == "float":
            try:
                return float(raw)
            except ValueError:
                # the float motif admits lone '-' / '.' / '-.' (C quirk);
                # the reference accumulates digits into a double and gets
                # (-)0.0 for those shapes (parser.c:893-930) — float(raw)
                # fails on exactly those degenerate inputs
                return -0.0 if raw.startswith("-") else 0.0
    return raw
