"""Structured line decoders: CSV, logfmt, scanf, Prometheus, InfluxDB,
nginx/apache, Envoy, Redis.

The reference enumerates these as planned-but-absent decoder plugins
(src/program.rs:31-45: ``// TODO: CSV { header, separator }, logfmt,
scanf, Prometheus, InfluxDB, Nginx, Nginx:combined, Apache, Envoy,
Redis``).  This module implements them against the same decoder
contract as the built-ins (sources/lines.py): a compile-once callable
``bytes -> list[str] | dict[str, str]`` raising ``DecodeError`` for
undecodable lines (Q11: dropped silently, reported when verbose).

All are registered by name (registry.py), so they work in programs
(``csv(";") | map {...} | select ...``), in the local runner, and in the
distributed log pipeline (pipelines/logs.py) unchanged.
"""

from __future__ import annotations

import re

from .lines import DecodeError

# ---------------------------------------------------------------------------
# CSV — reference sketch: CSV { header, separator } (src/program.rs:31-34)
# ---------------------------------------------------------------------------


class CsvDecoder:
    """RFC-4180-ish CSV line decoder.

    ``separator``: single-character field delimiter (default ``,``).
    ``header``: optional comma-separated column names; with a header the
    entry is a Dict (named fields for the mapper), without it a Tuple
    (positional fields).  Double-quoted fields may contain the
    separator and doubled quotes (``""`` → ``"``).
    """

    def __init__(self, separator: str = ",", header: str | None = None):
        if len(separator) != 1:
            raise ValueError("CSV separator must be a single character")
        self.sep = separator
        self.header = (
            [h.strip() for h in header.split(",")] if header else None
        )
        # one field: quoted (with "" escapes) or bare up to the separator
        self._field = re.compile(
            r'"((?:[^"]|"")*)"|([^' + re.escape(separator) + r"]*)"
        )

    def _split(self, text: str) -> list[str]:
        out = []
        i, n = 0, len(text)
        while True:
            m = self._field.match(text, i)
            if m.group(1) is not None:
                out.append(m.group(1).replace('""', '"'))
            else:
                out.append(m.group(2))
            i = m.end()
            if i >= n:
                break
            if text[i] != self.sep:
                raise DecodeError(f"CSV: malformed field at offset {i}")
            i += 1
            if i == n:  # trailing separator → empty last field
                out.append("")
                break
        return out

    def __call__(self, line: bytes) -> list[str] | dict[str, str]:
        try:
            text = line.decode("utf-8")
        except UnicodeDecodeError as e:
            raise DecodeError(f"CSV: invalid UTF-8: {e}") from e
        fields = self._split(text.rstrip("\r\n"))
        if self.header is None:
            return fields
        if len(fields) != len(self.header):
            raise DecodeError(
                f"CSV: expected {len(self.header)} fields, got {len(fields)}"
            )
        return dict(zip(self.header, fields))


# ---------------------------------------------------------------------------
# logfmt — key=value pairs, double-quoted values with backslash escapes
# ---------------------------------------------------------------------------

_LOGFMT_PAIR = re.compile(
    r'([A-Za-z0-9_.\-/@#$%^&*+]+)(?:=("(?:[^"\\]|\\.)*"|\S*))?'
)
_LOGFMT_UNESC = re.compile(r"\\(.)")


class LogfmtDecoder:
    """Heroku-style logfmt: ``key=value key2="quoted \\" value" flag``.

    Bare keys (no ``=``) and empty values decode to ``""``; quoted
    values honor backslash escapes.  A line with no pairs is an error.
    """

    def __call__(self, line: bytes) -> dict[str, str]:
        try:
            text = line.decode("utf-8")
        except UnicodeDecodeError as e:
            raise DecodeError(f"logfmt: invalid UTF-8: {e}") from e
        out: dict[str, str] = {}
        for m in _LOGFMT_PAIR.finditer(text):
            key, val = m.group(1), m.group(2)
            if val is None:
                val = ""
            elif val.startswith('"'):
                val = _LOGFMT_UNESC.sub(r"\1", val[1:-1])
            out[key] = val
        if not out:
            raise DecodeError("logfmt: no key=value pairs found")
        return out


# ---------------------------------------------------------------------------
# Prometheus text exposition format
# ---------------------------------------------------------------------------

_PROM_LINE = re.compile(
    r"^\s*([A-Za-z_:][A-Za-z0-9_:]*)\s*"  # metric name
    r"(?:\{(.*)\})?\s*"  # label block
    r"(\S+)"  # value
    r"(?:\s+(-?\d+))?\s*$"  # optional timestamp (ms)
)
_PROM_LABEL = re.compile(r'([A-Za-z_][A-Za-z0-9_]*)="((?:[^"\\]|\\.)*)"\s*(?:,|$)')
_PROM_UNESC = {"\\\\": "\\", '\\"': '"', "\\n": "\n"}


class PrometheusDecoder:
    """Prometheus text exposition line → Dict entry.

    ``metric{label="v",...} value [timestamp-ms]`` decodes to
    ``{"__name__": metric, <labels...>, "value": v, "timestamp": ms?}``;
    comment (``# HELP/TYPE``) and blank lines are errors → dropped (Q11),
    which is exactly how a line-oriented pq program skips them.
    """

    def __call__(self, line: bytes) -> dict[str, str]:
        try:
            text = line.decode("utf-8")
        except UnicodeDecodeError as e:
            raise DecodeError(f"prometheus: invalid UTF-8: {e}") from e
        stripped = text.strip()
        if not stripped or stripped.startswith("#"):
            raise DecodeError("prometheus: comment or blank line")
        m = _PROM_LINE.match(text)
        if m is None:
            raise DecodeError("prometheus: malformed exposition line")
        name, labels, value, ts = m.groups()
        out = {"__name__": name}
        if labels:
            pos = 0
            while pos < len(labels):
                lm = _PROM_LABEL.match(labels, pos)
                if lm is None:
                    raise DecodeError("prometheus: malformed label block")
                v = lm.group(2)
                for esc, plain in _PROM_UNESC.items():
                    v = v.replace(esc, plain)
                out[lm.group(1)] = v
                pos = lm.end()
        out["value"] = value
        if ts is not None:
            out["timestamp"] = ts
        return out


# ---------------------------------------------------------------------------
# InfluxDB line protocol
# ---------------------------------------------------------------------------

_INFLUX_ESC = re.compile(r"\\([,= ])")


def _influx_split(text: str, sep: str) -> list[str]:
    """Split on unescaped, unquoted ``sep``.  Escape sequences are
    PRESERVED (unescaping happens once, after all nested splits) and
    double-quoted spans are opaque, so ``msg="a,b"`` survives the field
    split and ``tag\\,1=a\\=b`` survives both the tag and kv splits."""
    out, cur, armed, quoted = [], [], False, False
    for c in text:
        if armed:
            cur.append("\\" + c)
            armed = False
        elif c == "\\":
            armed = True
        elif c == '"':
            quoted = not quoted
            cur.append(c)
        elif c == sep and not quoted:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(c)
    if armed:
        cur.append("\\")
    out.append("".join(cur))
    return out


class InfluxDbDecoder:
    """InfluxDB line protocol → Dict entry.

    ``measurement[,tag=v...] field=value[,...] [timestamp-ns]`` decodes
    to ``{"__measurement__": m, <tags...>, <fields...>,
    "timestamp": ms?}``.  Field values keep their literal text minus
    type decoration: integer ``i`` suffix stripped, string quotes
    removed, booleans normalized to ``true``/``false``.  The nanosecond
    timestamp is converted to the engine's milliseconds.
    """

    def __call__(self, line: bytes) -> dict[str, str]:
        try:
            text = line.decode("utf-8").rstrip("\r\n")
        except UnicodeDecodeError as e:
            raise DecodeError(f"influxdb: invalid UTF-8: {e}") from e
        if not text or text.startswith("#"):
            raise DecodeError("influxdb: comment or blank line")
        # split into (measurement+tags) (fields) (timestamp?) on
        # unescaped, unquoted spaces
        parts, cur, armed, quoted = [], [], False, False
        for c in text:
            if armed:
                cur.append("\\" + c)
                armed = False
            elif c == "\\":
                armed = True
            elif c == '"':
                quoted = not quoted
                cur.append(c)
            elif c == " " and not quoted and len(parts) < 2:
                parts.append("".join(cur))
                cur = []
            else:
                cur.append(c)
        parts.append("".join(cur))
        if len(parts) < 2:
            raise DecodeError("influxdb: missing field set")

        head = _influx_split(parts[0], ",")
        out = {"__measurement__": _INFLUX_ESC.sub(r"\1", head[0])}
        if not out["__measurement__"]:
            raise DecodeError("influxdb: empty measurement")
        for tag in head[1:]:
            kv = _influx_split(tag, "=")
            if len(kv) != 2:
                raise DecodeError(f"influxdb: malformed tag {tag!r}")
            out[_INFLUX_ESC.sub(r"\1", kv[0])] = _INFLUX_ESC.sub(r"\1", kv[1])

        for field in _influx_split(parts[1], ","):
            kv = _influx_split(field, "=")
            if len(kv) != 2:
                raise DecodeError(f"influxdb: malformed field {field!r}")
            key, val = _INFLUX_ESC.sub(r"\1", kv[0]), kv[1]
            if val.startswith('"') and val.endswith('"') and len(val) >= 2:
                val = val[1:-1].replace('\\"', '"')
            elif val.endswith(("i", "u")) and val[:-1].lstrip("+-").isdigit():
                val = val[:-1]
            elif val in ("t", "T", "true", "True", "TRUE"):
                val = "true"
            elif val in ("f", "F", "false", "False", "FALSE"):
                val = "false"
            out[key] = val

        if len(parts) == 3 and parts[2]:
            ts = parts[2]
            if not ts.lstrip("+-").isdigit():
                raise DecodeError(f"influxdb: malformed timestamp {ts!r}")
            out["timestamp"] = str(int(ts) // 1_000_000)  # ns → ms
        return out


# ---------------------------------------------------------------------------
# nginx / apache combined access log format
# ---------------------------------------------------------------------------

_COMBINED = re.compile(
    rb"^(\S+) (\S+) (\S+) \[([^\]]+)\] "
    rb'"(\S+) (\S+) (\S+)" (\d{3}) (\d+|-)'
    rb'(?: "([^"]*)" "([^"]*)")?'
)
_COMBINED_KEYS = (
    "remote_addr", "remote_user_ident", "remote_user", "time_local",
    "method", "path", "protocol", "status", "body_bytes_sent",
    "http_referer", "http_user_agent",
)


class CombinedLogDecoder:
    """nginx/apache access log (Common + Combined Log Format) → Dict.

    ``1.2.3.4 - frank [10/Oct/2000:13:55:36 -0700] "GET /x HTTP/1.0"
    200 2326 "ref" "ua"`` — the referer/user-agent pair is optional
    (Common Log Format lines parse too).  ``-`` placeholders for
    ``remote_user`` and ``body_bytes_sent`` pass through as-is; the
    ``time_local`` value parses under the engine's nginx timestamp
    guess (model.try_parse_time_ms).
    """

    def __call__(self, line: bytes) -> dict[str, str]:
        m = _COMBINED.match(line)
        if m is None:
            raise DecodeError("access log: line does not match combined format")
        out = {}
        for key, val in zip(_COMBINED_KEYS, m.groups()):
            if val is None:
                continue  # common-format line without referer/UA
            out[key] = val.decode("utf-8", errors="replace")
        return out


# ---------------------------------------------------------------------------
# scanf — pattern-directed positional decoder (reference src/program.rs:37)
# ---------------------------------------------------------------------------

_SCANF_CONV = {
    "d": r"[-+]?\d+",
    "u": r"\d+",
    "x": r"(?:0[xX])?[0-9a-fA-F]+",
    "f": r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?|[-+]?(?:[Ii]nf(?:inity)?|[Nn]a[Nn])",
    "e": None,  # alias of f, filled below
    "g": None,
    "s": r"\S+",
    "c": r".",
}
_SCANF_CONV["e"] = _SCANF_CONV["g"] = _SCANF_CONV["f"]


class ScanfDecoder:
    """``scanf``-style positional decoder → Tuple entry.

    ``scanf("%s %d %f")`` compiles the pattern once into an anchored
    regex: ``%d``/``%u`` integers, ``%x`` hex, ``%f``/``%e``/``%g``
    floats, ``%s`` a non-whitespace token, ``%c`` any single char,
    ``%%`` a literal percent; pattern whitespace matches any whitespace
    run.  Each conversion becomes one positional field (all values stay
    strings — the mapper owns typing, like every other decoder).
    Non-matching lines raise DecodeError (Q11: dropped).
    """

    def __init__(self, pattern: str):
        parts, nconv, i, n = [], 0, 0, len(pattern)
        while i < n:
            c = pattern[i]
            if c == "%":
                if i + 1 >= n:
                    raise ValueError("scanf: dangling % at end of pattern")
                conv = pattern[i + 1]
                if conv == "%":
                    parts.append(re.escape("%"))
                elif conv in _SCANF_CONV:
                    parts.append(f"({_SCANF_CONV[conv]})")
                    nconv += 1
                else:
                    raise ValueError(f"scanf: unsupported conversion %{conv}")
                i += 2
            elif c.isspace():
                parts.append(r"\s+")
                while i < n and pattern[i].isspace():
                    i += 1
            else:
                parts.append(re.escape(c))
                i += 1
        if nconv == 0:
            raise ValueError("scanf: pattern has no conversions")
        self._re = re.compile("".join(parts))

    def __call__(self, line: bytes) -> list[str]:
        try:
            text = line.decode("utf-8").rstrip("\r\n")
        except UnicodeDecodeError as e:
            raise DecodeError(f"scanf: invalid UTF-8: {e}") from e
        m = self._re.match(text)
        if m is None:
            raise DecodeError("scanf: line does not match pattern")
        return list(m.groups())


# ---------------------------------------------------------------------------
# Envoy access log (default format) — reference src/program.rs:43
# ---------------------------------------------------------------------------

_ENVOY = re.compile(
    rb"^\[([^\]]+)\] "
    rb'"(\S+) (\S+) ([^"]+)" '
    rb"(\d{3}|0) (\S+) (\d+) (\d+) (\d+) (\d+|-)"
    rb'(?: "([^"]*)" "([^"]*)" "([^"]*)" "([^"]*)" "([^"]*)")?'
)
_ENVOY_KEYS = (
    "start_time", "method", "path", "protocol", "response_code",
    "response_flags", "bytes_received", "bytes_sent", "duration",
    "upstream_service_time", "x_forwarded_for", "user_agent",
    "request_id", "authority", "upstream_host",
)


class EnvoyLogDecoder:
    """Envoy's default HTTP access-log format → Dict entry.

    ``[2016-04-15T20:17:00.310Z] "POST /api/v1/locations HTTP/2" 204 -
    154 0 226 100 "10.0.35.28" "nsq2http" "cc21d9b0-…" "locations"
    "tcp://10.0.2.1:80"`` — the five trailing quoted header fields are
    optional as a block (shortened formats parse too).  ``start_time``
    is RFC3339 and parses under the engine's timestamp guess.
    """

    def __call__(self, line: bytes) -> dict[str, str]:
        m = _ENVOY.match(line)
        if m is None:
            raise DecodeError("envoy: line does not match access log format")
        out = {}
        for key, val in zip(_ENVOY_KEYS, m.groups()):
            if val is None:
                continue
            out[key] = val.decode("utf-8", errors="replace")
        return out


# ---------------------------------------------------------------------------
# Redis server log — reference src/program.rs:44
# ---------------------------------------------------------------------------

_REDIS = re.compile(
    rb"^(\d+):([XCSMA]) (\d{1,2} \w{3} \d{4} \d{2}:\d{2}:\d{2}\.\d{3}) ([-.*#]) (.*)$"
)
_REDIS_LEVELS = {".": "debug", "-": "verbose", "*": "notice", "#": "warning"}
_REDIS_ROLES = {
    "X": "sentinel", "C": "child", "S": "replica", "M": "master", "A": "client",
}


class RedisLogDecoder:
    """Redis server log line → Dict entry.

    ``1:M 01 Jan 2021 00:00:00.123 * Background saving started`` decodes
    to pid / role / time_local / level / message, with the role and
    level sigils expanded to words (``M``→master, ``*``→notice, …) so
    they are usable as pq labels directly.
    """

    def __call__(self, line: bytes) -> dict[str, str]:
        m = _REDIS.match(line)
        if m is None:
            raise DecodeError("redis: line does not match server log format")
        pid, role, ts, level, msg = m.groups()
        return {
            "pid": pid.decode(),
            "role": _REDIS_ROLES[role.decode()],
            "time_local": ts.decode(),
            "level": _REDIS_LEVELS[level.decode()],
            "message": msg.decode("utf-8", errors="replace"),
        }
