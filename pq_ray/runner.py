"""Program runner: execute a full pq program over a stream of lines.

The batch counterpart of the reference's Runner (src/runner.rs):
decode → map (with the --since/--until range gate) → select → format.
Item-level errors (undecodable / unmappable lines) are silently dropped
(Q11).  ``interval`` defaults to the smallest range duration in the
query, else 1000 ms; ``lookback`` defaults to ``interval``
(src/query/evaluator.rs:34-44).

This is the *local* execution path (used by the CLI and the
conformance suite — pq itself is a single-process stdin tool).  The
distributed path reuses the same evaluator over samples produced by
Ray Data stages (pq_ray.pipelines.pq_queries).
"""

from __future__ import annotations

import json as _json

from .format.promapi import format_stream
from .model import rust_f64_str
from .query.ast import (
    JsonDecoder,
    NamedDecoder,
    Program,
    RegexDecoder,
    find_smallest_range_ms,
)
from .query.engine import DEFAULT_INTERVAL_MS, EvalContext, evaluate
from .query.parser import parse_program
from .query.records import MapError, Record, map_entry, records_to_samples
from .sources.lines import DecodeError, JsonLineDecoder, RegexLineDecoder


def run_program(
    program: str | Program,
    lines: list[bytes] | list[str],
    *,
    interval_ms: int | None = None,
    lookback_ms: int | None = None,
    since_ms: int | None = None,
    until_ms: int | None = None,
    verbose: bool = False,
    interactive: bool = False,
    extensions: bool = False,
    error_sink=None,
) -> list[str]:
    """Run a pq program over lines; returns the output lines.

    ``verbose`` mirrors the reference runner's ``-v``: item-level decode
    and map errors are reported (src/runner.rs:139-156 ``eprintln!``)
    instead of silently dropped, and empty ticks print ``<no data>``.
    Errors go to ``error_sink`` (a list-like with ``append``) or stderr.
    """
    ast = (
        parse_program(program, extensions=extensions)
        if isinstance(program, str)
        else program
    )

    def report(err: Exception) -> None:
        if not verbose:
            return
        if error_sink is not None:
            error_sink.append(str(err))
        else:
            import sys

            print(err, file=sys.stderr)

    from .registry import get_decoder

    if isinstance(ast.decoder, RegexDecoder):
        decode = get_decoder("regex")(ast.decoder.regex)
    elif isinstance(ast.decoder, NamedDecoder):
        decode = get_decoder(ast.decoder.name)(*ast.decoder.args)
    else:
        assert isinstance(ast.decoder, JsonDecoder)
        decode = get_decoder("json")()

    entries: list[tuple[int, list | dict]] = []
    for i, line in enumerate(lines, start=1):
        raw = line.encode("utf-8") if isinstance(line, str) else line
        try:
            entries.append((i, decode(raw)))
        except DecodeError as e:
            report(e)  # Q11: dropped; verbose reports like the reference
            continue

    if ast.mapper is None:
        return _format_entries(entries, ast.formatter, verbose)

    records: list[Record] = []
    for line_no, entry in entries:
        try:
            rec = map_entry(ast.mapper, line_no, entry)
        except MapError as e:
            report(e)  # Q11
            continue
        ts = rec.ts
        if since_ms is not None and (ts if ts is not None else 2**62) < since_ms:
            continue  # skip records before the range
        if until_ms is not None and (ts if ts is not None else -(2**62)) > until_ms:
            break  # reference terminates the stream here (mapper.rs:50-54)
        records.append(rec)

    if ast.query is None:
        return _format_records(records, ast.formatter, verbose)

    interval = interval_ms or find_smallest_range_ms(ast.query) or DEFAULT_INTERVAL_MS
    lookback = lookback_ms or interval
    samples, label_cols = records_to_samples(records)
    ctx = EvalContext(
        samples=samples,
        label_cols=label_cols,
        interval=interval,
        lookback=lookback,
        start_at=since_ms,
        extensions=extensions,
    )
    stream = evaluate(ast.query, ctx)
    if ast.formatter == "to_promapi":
        return format_stream(stream)
    if ast.formatter == "to_json":
        # reference JSONFormatter delegates query values to PromAPI,
        # except bare scalars (src/format/json.rs:88-94)
        from .query.engine import ScalarStream

        if isinstance(stream, ScalarStream):
            return [rust_f64_str(stream.value)]
        return format_stream(stream)
    # custom formatters registered by name take precedence over the
    # built-in human formatter (registry parity with Formatter trait)
    from .registry import get_formatter

    custom = get_formatter(ast.formatter)
    if custom is not None and ast.formatter not in (None, "human"):
        return custom(stream, verbose=verbose)
    from .format.human import format_stream_human

    return format_stream_human(stream, verbose=verbose, interactive=interactive)


def _format_entries(entries, formatter, verbose: bool = False) -> list[str]:
    from .format.human import format_entry_human

    out = []
    for line_no, e in entries:
        if formatter == "to_json":
            if isinstance(e, dict):
                out.append(
                    _json.dumps(
                        {k: e[k] for k in sorted(e)}, separators=(",", ":"),
                        ensure_ascii=False,
                    )
                )
            else:
                out.append(_json.dumps(e, separators=(",", ":"), ensure_ascii=False))
        else:
            out.append(format_entry_human(line_no, e, verbose))
    return out


def _format_records(records, formatter, verbose: bool = False) -> list[str]:
    """Record JSON shape mirrors the reference's RecordRepr
    (src/format/json.rs:25-32): {"timestamp": ms?, "labels": {...},
    "values": {...}} with BTreeMap (sorted) keys; timestamp omitted when
    absent, values as JSON numbers (serde and Python agree on f64)."""
    out = []
    for r in records:
        if formatter == "to_json":
            obj: dict = {}
            if r.ts is not None:
                obj["timestamp"] = r.ts
            obj["labels"] = {k: r.labels[k] for k in sorted(r.labels)}
            obj["values"] = {k: r.values[k] for k in sorted(r.values)}
            out.append(_json.dumps(obj, separators=(",", ":"), ensure_ascii=False))
        else:
            from .format.human import format_record_human

            out.append(format_record_human(r, verbose))
    return out
