"""Core data model: timestamps, labels, series signatures, value formatting.

This module is pure Python/numpy — no Ray. It pins down the semantics the
whole engine shares with the reference (iximiuz/pq):

- timestamps are int64 Unix *milliseconds* (reference: src/model/timestamp.rs:6)
- sample values are float64 (reference: src/model/mod.rs:9)
- a time series is identified by its canonical labelset signature: the
  sorted (name, value) pairs concatenated as ``name \\xFF value`` per pair
  (reference: src/model/labels.rs:51-57).  Grouping, ordering and join
  matching all key on this byte signature so our outputs sort identically
  to the reference's BTreeMap iteration order.
- sample values serialize to strings exactly like Rust's ``f64::to_string``
  (reference: src/format/promapi.rs:67) — shortest round-trip digits,
  never scientific notation, integral floats without a trailing ``.0``.
"""

from __future__ import annotations

import math
import re
from datetime import datetime, timezone
from decimal import Decimal
from hashlib import md5

NAME_LABEL = "__name__"
LINE_METRIC = "__line__"

# Fixed epoch used by the deterministic fixture generator (2021-01-01T00:00:00Z,
# the constant the reference's own time tests use: src/utils/time.rs:98).
EPOCH0_MS = 1_609_459_200_000

# --------------------------------------------------------------------------
# Series signatures
# --------------------------------------------------------------------------


def signature(labels: dict[str, str]) -> bytes:
    """Canonical byte signature of a labelset.

    Mirrors the reference's ``Labels::to_vec`` (src/model/labels.rs:51-57):
    sort the (name, value) pairs, then concatenate ``name + 0xFF + value``
    for each pair (no separator *between* pairs).  ``__name__`` is included
    when present.  Sorting the raw byte signature reproduces the BTreeMap
    iteration order the reference relies on for deterministic output.
    """
    out = bytearray()
    for name in sorted(labels):
        out += name.encode("utf-8")
        out += b"\xff"
        out += labels[name].encode("utf-8")
    return bytes(out)


def stable_hash64(s: str) -> int:
    """Deterministic 64-bit hash of a string (first 8 bytes of md5).

    Stable across processes, Python versions and machines — used for
    fixture timestamps and for hash-partitioning series across the
    cluster.  NOT a cryptographic identity; collisions on series ids are
    avoided by grouping on the full signature, hashing only for placement.
    """
    return int.from_bytes(md5(s.encode("utf-8")).digest()[:8], "big")


def labels_with(labels: dict[str, str], names: set[str]) -> dict[str, str]:
    """Keep only ``names``; always drops __name__ (labels.rs:27-31)."""
    return {k: v for k, v in labels.items() if k != NAME_LABEL and k in names}


def labels_without(labels: dict[str, str], names: set[str]) -> dict[str, str]:
    """Drop ``names``; always drops __name__ (labels.rs:33-37)."""
    return {k: v for k, v in labels.items() if k != NAME_LABEL and k not in names}


# --------------------------------------------------------------------------
# Rust-parity float formatting
# --------------------------------------------------------------------------


def rust_f64_str(v: float) -> str:
    """Format a float exactly like Rust's ``f64`` ``Display``.

    Rust prints the shortest decimal string that round-trips, always in
    positional (non-scientific) notation, with no trailing ``.0`` for
    integral values; ``inf``/``-inf``/``NaN`` spelled exactly so.  The
    reference serializes every sample value through this
    (src/format/promapi.rs:67,99,119).
    """
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "inf" if v > 0 else "-inf"
    # repr() is Python's shortest round-trip form; re-expand any exponent
    # into positional notation via Decimal (exact — Decimal(str) keeps digits).
    s = format(Decimal(repr(v)), "f")
    if "." in s:
        s = s.rstrip("0").rstrip(".")
    if s in ("", "-"):
        s = s + "0"
    return s


# --------------------------------------------------------------------------
# Durations (Go-style, strictly descending units; reference
# src/utils/parse/duration.rs:9-132)
# --------------------------------------------------------------------------

_DUR_UNITS = [
    ("ms", 1),
    ("s", 1000),
    ("m", 60_000),
    ("h", 3_600_000),
    ("d", 86_400_000),
    ("w", 604_800_000),
    ("y", 31_536_000_000),
]
_DUR_ORDER = {u: i for i, (u, _) in enumerate(_DUR_UNITS)}
_DUR_MS = dict(_DUR_UNITS)
_DUR_RE = re.compile(r"(\d+)(ms|s|m|h|d|w|y)")


class DurationParseError(ValueError):
    pass


def parse_duration_ms(text: str) -> int:
    """Parse ``1h30m15s5ms`` → milliseconds.

    Units must appear in strictly descending order, each at most once, and
    the total must be > 0 — the same rules the reference enforces
    (src/utils/parse/duration.rs:9-132).
    """
    pos = 0
    total = 0
    last_order = len(_DUR_UNITS)  # descending: each unit smaller than the last
    for m in _DUR_RE.finditer(text):
        if m.start() != pos:
            raise DurationParseError(f"invalid duration literal {text!r}")
        unit = m.group(2)
        order = _DUR_ORDER[unit]
        if order >= last_order:
            raise DurationParseError(
                f"duration units must be in descending order in {text!r}"
            )
        last_order = order
        total += int(m.group(1)) * _DUR_MS[unit]
        pos = m.end()
    if pos != len(text) or pos == 0:
        raise DurationParseError(f"invalid duration literal {text!r}")
    if total <= 0:
        raise DurationParseError("duration must be positive")
    return total


# --------------------------------------------------------------------------
# Timestamp parsing (reference src/utils/time.rs)
# --------------------------------------------------------------------------

# chrono strftime specifiers map 1:1 onto C strptime for the subset pq's
# docs/tests use. ``%.f`` (chrono's optional dot-fraction) needs special
# handling; we translate to a regex-assisted parse.


def parse_time_ms(text: str, fmt: str) -> int:
    """Parse with an explicit chrono-style format → Unix ms.

    Formats without ``%z`` are interpreted as UTC (the reference parses
    them as naive datetimes and takes ``timestamp_millis`` which assumes
    UTC; src/utils/time.rs:38-48).
    """
    dt = datetime.strptime(text, fmt)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1000)


_ISO_FRAC = re.compile(
    r"^(\d{4})-(\d{2})-(\d{2})[T ](\d{2}):(\d{2}):(\d{2})(\.\d+)?"
    r"(?:\s*(Z|[+-]\d{2}:?\d{2}))?$"
)
_RFC2822 = "%a, %d %b %Y %H:%M:%S %z"
_NGINX = "%d/%b/%Y:%H:%M:%S %z"


def try_parse_time_ms(text: str) -> int | None:
    """Best-effort multi-format timestamp guess → Unix ms, else None.

    Mirrors the reference's guess chain (src/utils/time.rs:50-88):
    RFC3339, RFC2822, nginx ``%d/%b/%Y:%H:%M:%S %z``, ISO-like with
    optional fraction / offset, then bare Unix seconds (10 digits) or
    milliseconds (13 digits).
    """
    text = text.strip()
    m = _ISO_FRAC.match(text)
    if m:
        y, mo, d, h, mi, s = (int(m.group(i)) for i in range(1, 7))
        frac = m.group(7)
        us = int(round(float(frac) * 1e6)) if frac else 0
        tz = timezone.utc
        off = m.group(8)
        if off and off != "Z":
            off = off.replace(":", "")
            sign = 1 if off[0] == "+" else -1
            from datetime import timedelta

            tz = timezone(sign * timedelta(hours=int(off[1:3]), minutes=int(off[3:5])))
        dt = datetime(y, mo, d, h, mi, s, us, tzinfo=tz)
        return int(dt.timestamp() * 1000)
    for fmt in (_RFC2822, _NGINX):
        try:
            dt = datetime.strptime(text, fmt)
            return int(dt.timestamp() * 1000)
        except ValueError:
            pass
    # RFC2822 with 1-digit day ("Fri, 1 Jan 2021 ...") — strptime handles
    # both widths for %d on most libcs, but be explicit:
    try:
        dt = datetime.strptime(re.sub(r",\s+", ", ", text), _RFC2822)
        return int(dt.timestamp() * 1000)
    except ValueError:
        pass
    if text.isdigit():
        if len(text) == 10:
            return int(text) * 1000
        if len(text) == 13:
            return int(text)
        return None
    return None


def parse_number(text: str) -> float | None:
    """Parse a sample value like Rust ``str::parse::<f64>`` — accepts
    ``inf``/``-inf``/``NaN``/scientific; rejects empty/whitespace-laden
    input (reference: Auto/Number field mapping, strategy.rs:31-44)."""
    t = text.strip()
    if t != text or not t:
        return None
    # Rust accepts "inf", "infinity", "nan" (case-insensitive), and
    # ordinary decimal/scientific literals; it rejects hex and underscores.
    if re.fullmatch(r"[+-]?(inf(inity)?|nan)", t, re.IGNORECASE):
        return float(re.sub(r"(?i)infinity", "inf", t))
    if not re.fullmatch(r"[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?", t):
        return None
    try:
        return float(t)
    except ValueError:
        return None


def splitmix64(x) -> "np.ndarray":
    """Vectorized SplitMix64 finalizer — the standard public-domain
    avalanche.  THE one copy: bucket assignments everywhere (joins,
    windowed ops) derive from it, so modules must share it."""
    import numpy as np

    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def round_half_away(x, nd: int = 6):
    """SQL ROUND semantics (half away from zero), vectorized.  numpy and
    pandas round half-to-even, and the two rules disagree exactly on the
    dyadic-rational decimal ties (….5625, ….8125 …) that rational
    arithmetic over small integers produces — which flips the driver's
    exact value-hash against a DuckDB oracle."""
    import numpy as np

    f = 10.0 ** nd
    return np.copysign(np.floor(np.abs(x) * f + 0.5) / f, x)
