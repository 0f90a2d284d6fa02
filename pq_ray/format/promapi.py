"""PromAPI formatter — byte-exact vs the reference (src/format/promapi.rs).

Per tick:
- instant vector → {"resultType":"vector","result":[{metric, value:
  [sec.millis, "val"]}]}; empty ticks emit {"result":[]} lines;
- range vector → {"resultType":"matrix", ...} with per-series values
  OLDEST-first (the reference stores them newest-first and re-reverses
  at format time, promapi.rs:96-99);
- scalar → {"resultType":"scalar","result":[0.0,"v"]} — timestamp is
  always 0.0 (promapi.rs:114-121).

Numbers: the timestamp is ms/1000 serialized as a JSON float (serde and
Python agree on shortest-roundtrip float formatting); the sample value
is a *string* in Rust ``f64::to_string`` form (model.rust_f64_str).
Metric labels serialize sorted by key (serde BTreeMap).
"""

from __future__ import annotations

import json

from ..model import rust_f64_str
from ..query.engine import ScalarStream, VectorStream, labels_of_row


def _dump(obj) -> str:
    return json.dumps(obj, separators=(",", ":"), ensure_ascii=False)


def _metric(row, label_cols) -> dict:
    d = labels_of_row(row, label_cols, include_name=True)
    return {k: d[k] for k in sorted(d)}


def format_stream(stream) -> list[str]:
    if isinstance(stream, ScalarStream):
        return [
            _dump(
                {
                    "resultType": "scalar",
                    "result": [0.0, rust_f64_str(stream.value)],
                }
            )
        ]

    out: list[str] = []
    df = stream.df
    label_cols = stream.label_cols
    if stream.kind == "instant":
        groups = {t: g for t, g in df.groupby("tick", sort=False)} if len(df) else {}
        for t in stream.ticks:
            items = []
            g = groups.get(t)
            if g is not None:
                g = g.sort_values("ord", kind="stable")
                for _, row in g.iterrows():
                    items.append(
                        {
                            "metric": _metric(row, label_cols),
                            "value": [t / 1000.0, rust_f64_str(row["value"])],
                        }
                    )
            out.append(_dump({"resultType": "vector", "result": items}))
        return out

    # range vector (matrix): per tick, series ordered by sig; values
    # oldest-first within a series
    groups = {t: g for t, g in df.groupby("tick", sort=False)} if len(df) else {}
    for t in stream.ticks:
        items = []
        g = groups.get(t)
        if g is not None:
            # pure push order (seq): the reference stores range samples
            # newest-pushed-first and the formatter reverses again
            # (vector.rs:233-236 + humanreadable.rs:148), so out-of-order
            # timestamps print in ARRIVAL order, not ts order
            g = g.sort_values(["sig", "seq"], kind="stable")
            for sig, series in g.groupby("sig", sort=False):
                first = series.iloc[0]
                values = [
                    [row["ts"] / 1000.0, rust_f64_str(row["value"])]
                    for _, row in series.iterrows()
                ]
                items.append({"metric": _metric(first, label_cols), "values": values})
        out.append(_dump({"resultType": "matrix", "result": items}))
    return out
