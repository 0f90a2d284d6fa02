"""Mapper: entries → records → samples table.

Reproduces the reference's MappingStrategy (src/parse/mapping/strategy.rs):
per mapper field — Const → label; Auto → f64-or-label; Number → f64 else
error (line dropped); String → label; Timestamp → parse ms with explicit
chrono format or the multi-format guess.  Exactly one timestamp field is
allowed (validated at parse time).

Records without a timestamp survive mapping but produce no samples
(src/query/sample.rs:88-103, Q11); each value field of a timestamped
record becomes one sample named by the field, plus the synthetic
``__line__`` metric whose value is the line number.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from ..model import parse_number, parse_time_ms, try_parse_time_ms
from .ast import MapperField

# chrono → strptime: the subset of specifiers pq's docs/tests use map 1:1.
_CHRONO_PASSTHROUGH = True


class MapError(ValueError):
    pass


@dataclass
class Record:
    line_no: int
    ts: int | None
    labels: dict[str, str]
    values: dict[str, float]


def map_entry(
    fields: tuple[MapperField, ...], line_no: int, entry: list[str] | dict[str, str]
) -> Record:
    ts = None
    labels: dict[str, str] = {}
    values: dict[str, float] = {}
    for f in fields:
        if f.typ == "const":
            labels[f.end_name] = f.const_value
            continue
        if isinstance(f.loc, int):
            if not isinstance(entry, list):
                raise MapError("dict entry cannot be mapped with positional fields")
            if f.loc >= len(entry):
                raise MapError("tuple entry index out of range")
            datum = entry[f.loc]
        else:
            if not isinstance(entry, dict):
                raise MapError("tuple entry cannot be mapped with named fields")
            if f.loc not in entry:
                raise MapError("dict entry field not found")
            datum = entry[f.loc]

        if f.typ == "auto":
            n = parse_number(datum)
            if n is not None:
                values[f.end_name] = n
            else:
                labels[f.end_name] = datum
        elif f.typ == "num":
            n = parse_number(datum)
            if n is None:
                raise MapError("could not parse numeric field")
            values[f.end_name] = n
        elif f.typ == "str":
            labels[f.end_name] = datum
        elif f.typ == "ts":
            if f.ts_format is not None:
                try:
                    ts = parse_time_ms(datum, f.ts_format)
                except ValueError as e:
                    raise MapError(f"couldn't parse timestamp: {e}") from e
            else:
                ts = try_parse_time_ms(datum)
                if ts is None:
                    raise MapError("couldn't guess time format")
    return Record(line_no, ts, labels, values)


def records_to_samples(records: list[Record]) -> tuple[pd.DataFrame, list[str]]:
    """Explode records into the samples table consumed by the evaluator.

    Columns: ts:int64, seq:int64 (arrival order), name:str (metric =
    value-field name), value:f64, one object column per label.  The
    synthetic ``__line__`` sample is appended per timestamped record.
    """
    label_cols: list[str] = []
    seen = set()
    for r in records:
        for k in r.labels:
            if k not in seen:
                seen.add(k)
                label_cols.append(k)
    label_cols.sort()

    rows_ts: list[int] = []
    rows_seq: list[int] = []
    rows_name: list[str] = []
    rows_value: list[float] = []
    rows_labels: list[dict] = []
    seq = 0
    for r in records:
        if r.ts is None:
            continue
        vals = dict(r.values)
        vals["__line__"] = float(r.line_no)
        for name, value in vals.items():
            rows_ts.append(r.ts)
            rows_seq.append(seq)
            rows_name.append(name)
            rows_value.append(value)
            rows_labels.append(r.labels)
            seq += 1
    df = pd.DataFrame(
        {
            "ts": np.array(rows_ts, dtype=np.int64),
            "seq": np.array(rows_seq, dtype=np.int64),
            "name": rows_name,
            "value": np.array(rows_value, dtype=np.float64),
        }
    )
    for c in label_cols:
        df[f"l_{c}"] = [lab.get(c) for lab in rows_labels]
    return df, label_cols
