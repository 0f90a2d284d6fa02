"""Line decoders: byte lines → entries (tuples / dicts of strings).

The batch counterparts of the reference's DecodingStrategy
(src/parse/decoding/{regex,json}.rs):

- regex: first match anywhere in the line; capture group 0 is skipped
  iff the pattern has other groups; a non-matching line is an error —
  the runner drops it silently (src/runner.rs:139-144, Q11);
- json: flat arrays → tuples, flat objects → dicts; nested values are
  silently skipped; bool/null/number values are stringified (numbers in
  Rust's shortest form: integers bare, floats shortest-roundtrip).

Entries carry a 1-based ``line_no`` — it feeds pq's synthetic
``__line__`` metric (src/query/sample.rs:90).

These are plain callables usable directly or inside
``Dataset.map_batches`` (compile-once state → actor-pool class).
"""

from __future__ import annotations

import json
import re

from ..model import rust_f64_str


class DecodeError(ValueError):
    pass


def _stringify_json_value(v) -> str | None:
    if isinstance(v, bool):
        return "true" if v else "false"
    if v is None:
        return "null"
    if isinstance(v, (int,)):
        return str(v)
    if isinstance(v, float):
        return rust_f64_str(v)
    if isinstance(v, str):
        return v
    return None  # nested: silently skipped


class RegexLineDecoder:
    """Compile-once regex decoder (actor state when used in a pool)."""

    def __init__(self, pattern: str):
        self.re = re.compile(pattern.encode("utf-8"), re.DOTALL)
        self.skip_full = self.re.groups > 0

    def __call__(self, line: bytes) -> list[str]:
        m = self.re.search(line)
        if m is None:
            raise DecodeError("no match found")
        if self.skip_full:
            groups = m.groups()
        else:
            groups = (m.group(0),)
        out = []
        for g in groups:
            if g is None:
                raise DecodeError("unmatched capture group")
            out.append(g.decode("utf-8"))
        return out


class JsonLineDecoder:
    def __call__(self, line: bytes) -> list[str] | dict[str, str]:
        try:
            v = json.loads(line)
        except Exception as e:
            raise DecodeError(f"JSON decoding failed: {e}") from e
        if isinstance(v, list):
            out = []
            for item in v:
                s = _stringify_json_value(item)
                if s is not None:
                    out.append(s)
            return out
        if isinstance(v, dict):
            outd = {}
            for k, item in v.items():
                s = _stringify_json_value(item)
                if s is not None:
                    outd[k] = s
            return outd
        raise DecodeError("JSON decoder supports only flat arrays and objects")
