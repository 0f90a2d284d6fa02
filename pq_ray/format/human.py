"""Human-readable formatter — line-parity with the reference's
non-interactive mode (src/format/humanreadable.rs:16-201).

Quirks mirrored faithfully:
- timestamps print as ``%Y-%m-%dT%H:%M:%S%.3f`` computed from ts/1000
  seconds, so the millisecond part is ALWAYS ``.000``
  (src/model/timestamp.rs:33-36 truncates before formatting);
- instant vector line: ``<ts>\\t<name>{k=v, ...}\\t\\t\\t<value>``;
- range vector: the header line then one ``\\t<val> @ <ts>`` per sample,
  oldest-first (reference iterates ``.rev()`` over newest-first);
- empty tick: empty output unless verbose (then ``<ts> <no data>``);
- records/entries join fields with tabs, dicts sorted as ``k=v``.
"""

from __future__ import annotations

from datetime import datetime, timezone

from ..model import rust_f64_str
from ..query.engine import ScalarStream, VectorStream, labels_of_row


def ts_millis(ts_ms: int) -> str:
    dt = datetime.fromtimestamp(ts_ms // 1000, tz=timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%S") + ".000"


def _dict(d: dict, sep: str) -> str:
    return sep.join(f"{k}={d[k]}" for k in sorted(d))


class InteractiveModeError(RuntimeError):
    """Typed stand-in for the reference's ``unimplemented!`` when the
    interactive screen mode meets a non-instant-vector result
    (src/format/humanreadable.rs:185-192)."""


def _format_instant_interactive(tick: int, g, label_cols) -> str:
    """ANSI screen mode — parity with the reference's 'quick and dirty
    draft' (src/format/humanreadable.rs:102-131): clear screen + home,
    tick header, then one line per sample with ``label: 'value'`` cells
    joined by double tabs.  Quirks kept: a literal "\\n" line after each
    metric name, the indent prefix is sticky once a named sample is
    seen, and __name__ is NOT stripped from the label cells."""
    esc = chr(27)
    dt = datetime.fromtimestamp(tick // 1000, tz=timezone.utc)
    lines = [f"{esc}[2J{esc}[1;1H", dt.strftime("%Y-%m-%d %H:%M:%S"), "-"]
    prefix = ""
    for _, row in g.sort_values("ord", kind="stable").iterrows():
        labels = labels_of_row(row, list(label_cols), include_name=True)
        name = labels.get("__name__")
        if name is not None:
            lines.append(name)
            lines.append("\n")
            prefix = "\t"
        cells = [f"{prefix}{k}: '{labels[k]}'" for k in sorted(labels)]
        cells.append(f"\t\t\t{rust_f64_str(row['value'])}")
        lines.append("\t\t".join(cells))
    return "\n".join(lines)


def format_stream_human(
    stream, verbose: bool = False, interactive: bool = False
) -> list[str]:
    """Query-value stream → output lines (one list entry per tick; an
    entry may contain embedded newlines like the reference's writer)."""
    if interactive:
        if isinstance(stream, ScalarStream) or stream.kind != "instant":
            raise InteractiveModeError(
                "interactive mode is not supported for this type of result"
            )
        out = []
        df = stream.df
        groups = {t: g for t, g in df.groupby("tick", sort=False)} if len(df) else {}
        for t in stream.ticks:
            g = groups.get(t)
            if g is None:
                g = df.iloc[0:0]
            out.append(_format_instant_interactive(int(t), g, stream.label_cols))
        return out
    if isinstance(stream, ScalarStream):
        return [rust_f64_str(stream.value)]

    out: list[str] = []
    df = stream.df
    groups = {t: g for t, g in df.groupby("tick", sort=False)} if len(df) else {}
    for t in stream.ticks:
        g = groups.get(t)
        if g is None or g.empty:
            if verbose:
                out.append(f"{ts_millis(int(t))} <no data>")
            else:
                out.append("")
            continue
        lines = []
        if stream.kind == "instant":
            for _, row in g.sort_values("ord", kind="stable").iterrows():
                labels = labels_of_row(row, stream.label_cols, include_name=True)
                name = labels.pop("__name__", None)
                parts = [f"{ts_millis(int(t))}\t"]
                if name is not None:
                    parts.append(name)
                if labels or name is not None:
                    parts.append("{" + _dict(labels, ", ") + "}\t\t\t")
                parts.append(rust_f64_str(row["value"]))
                lines.append("".join(parts))
        else:  # range vector
            # pure push order (seq): the reference stores range samples
            # newest-pushed-first and the formatter reverses again
            # (vector.rs:233-236 + humanreadable.rs:148), so out-of-order
            # timestamps print in ARRIVAL order, not ts order
            g = g.sort_values(["sig", "seq"], kind="stable")
            for _, series in g.groupby("sig", sort=False):
                first = series.iloc[0]
                labels = labels_of_row(first, stream.label_cols, include_name=True)
                name = labels.pop("__name__", None)
                parts = [f"{ts_millis(int(t))}\t"]
                if name is not None:
                    parts.append(name)
                if labels or name is not None:
                    parts.append("{" + _dict(labels, ", ") + "}\t\t\t")
                lines.append("".join(parts))
                for _, row in series.iterrows():
                    lines.append(
                        f"\t{rust_f64_str(row['value'])} @ {ts_millis(int(row['ts']))}"
                    )
        out.append("\n".join(lines))
    return out


def format_record_human(record, verbose: bool = False) -> str:
    parts = []
    if record.ts is not None:
        parts.append(ts_millis(record.ts))
    if record.labels:
        parts.append(_dict(record.labels, "\t"))
    if record.values:
        parts.append(
            _dict({k: rust_f64_str(v) for k, v in record.values.items()}, "\t")
        )
    line = "\t".join(parts)
    return f"{record.line_no}: {line}" if verbose else line


def format_entry_human(line_no: int, entry, verbose: bool = False) -> str:
    if isinstance(entry, dict):
        body = _dict(entry, "\t")
    else:
        body = "\t".join(entry)
    return f"{line_no}: {body}" if verbose else body
