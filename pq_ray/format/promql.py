"""PromQL/exposition formatter — the reference's planned ``PromQL``
formatter (src/program.rs:97-98 ``// TODO: PromQL``), which never
shipped; semantics defined here.

Each sample prints as one Prometheus text-exposition line::

    name{label="value",...} <value> <timestamp-ms>

- instant vectors: one line per series per tick, tick as the timestamp;
  empty ticks print nothing (exposition has no empty-vector marker —
  the PromAPI formatter is the one with ``{"result":[]}`` parity);
- range vectors: one line per underlying sample with the sample's own
  timestamp;
- scalars: a bare value line (no name, no timestamp).

Aggregated streams have no ``__name__`` (SURVEY.md Q5); those lines
print as a bare label block ``{l="v"} value ts`` — valid PromQL
selector syntax, though not scrapeable exposition.  Values use the same
Rust-``f64::to_string`` shortest form as the PromAPI formatter, so
``pq_ray``'s own ``prometheus`` decoder round-trips named output
(tests/test_structured_decoders.py).

Label values escape ``\\``, ``"`` and newline per the exposition spec.
"""

from __future__ import annotations

from ..model import rust_f64_str
from ..query.engine import ScalarStream, labels_of_row


def _esc(v: str) -> str:
    return str(v).replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")


def _series_head(row, label_cols) -> str:
    d = labels_of_row(row, label_cols, include_name=True)
    name = d.pop("__name__", "")
    if not d:
        return name or "{}"
    block = ",".join(f'{k}="{_esc(d[k])}"' for k in sorted(d))
    return f"{name}{{{block}}}"


def format_stream_promql(stream) -> list[str]:
    if isinstance(stream, ScalarStream):
        return [rust_f64_str(stream.value)]

    out: list[str] = []
    df = stream.df
    label_cols = stream.label_cols
    groups = {t: g for t, g in df.groupby("tick", sort=False)} if len(df) else {}
    if stream.kind == "instant":
        for t in stream.ticks:
            g = groups.get(t)
            if g is None:
                continue
            for _, row in g.sort_values("ord", kind="stable").iterrows():
                out.append(
                    f"{_series_head(row, label_cols)} "
                    f"{rust_f64_str(row['value'])} {int(t)}"
                )
        return out

    # range vector: per tick, series by signature, samples in arrival
    # order with their own timestamps (promapi.py ordering parity)
    for t in stream.ticks:
        g = groups.get(t)
        if g is None:
            continue
        g = g.sort_values(["sig", "seq"], kind="stable")
        for _, series in g.groupby("sig", sort=False):
            head = _series_head(series.iloc[0], label_cols)
            for _, row in series.iterrows():
                out.append(
                    f"{head} {rust_f64_str(row['value'])} {int(row['ts'])}"
                )
    return out
