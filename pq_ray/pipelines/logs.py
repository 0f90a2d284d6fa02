"""Distributed pq over log files — the reference's primary UX at Ray scale.

``run_log_query`` is the cluster-sized counterpart of ``pq '<prog>' <
file`` (reference src/main.rs + runner.rs): a directory (or list) of log
files is parsed in parallel — one Ray task per file, the registry
decoder + mapper per line — into the engine's samples schema, and the
program's query runs on ``evaluate_distributed`` (selector filtering,
window explode and per-(series, tick) reduction as Ray stages; only the
post-rollup stream reaches the driver, where the program's formatter
renders it).

Arrival-order semantics: the reference consumes ONE ordered stdin
stream; here the stream is the concatenation of the input files in
sorted order, so ``seq = file_idx << 40 | line_no`` reproduces that
order exactly (ties and out-of-order timestamps behave like the
reference fed the same concatenation).

Two passes over the logs (both embarrassingly parallel, no driver
materialization of lines):
  1. schema pass: per-file distinct label keys + whether any record
     mapped (tiny per-file summaries to the driver);
  2. sample pass: per-file decode+map → Arrow samples blocks with the
     unioned label-column schema.

``--until`` termination: the reference stops READING the stream at the
first record past the bound (src/query/mapper.rs:50-54).  A parallel
reader has no single stream to stop; each FILE stops at its first
exceeding record — identical behavior when the concatenated stream is
globally ts-ordered (the usual log case), a documented approximation
otherwise.  Q11 parity: undecodable/unmappable lines drop silently
(reported per-file when ``verbose``).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..query.ast import JsonDecoder, Program, RegexDecoder
from ..query.engine import DEFAULT_INTERVAL_MS
from ..query.parser import parse_program
from ..query.records import MapError, map_entry
from ..sources.lines import DecodeError


def _list_files(paths) -> list[str]:
    if isinstance(paths, str):
        if os.path.isdir(paths):
            return sorted(
                os.path.join(paths, f) for f in os.listdir(paths)
                if not f.startswith(".")
            )
        return [paths]
    return sorted(paths)


def _make_decoder(ast: Program):
    from ..registry import get_decoder

    if isinstance(ast.decoder, RegexDecoder):
        return get_decoder("regex")(ast.decoder.regex)
    assert isinstance(ast.decoder, JsonDecoder)
    return get_decoder("json")()


def _file_records(path: str, ast: Program, since_ms, until_ms):
    """Decode+map one file's lines → (records, n_dropped).  Stops at the
    first record past --until (per-file termination, see module doc)."""
    decode = _make_decoder(ast)
    records = []
    dropped = 0
    with open(path, "rb") as f:
        for line_no, raw in enumerate(f.read().splitlines(), start=1):
            try:
                entry = decode(raw)
            except DecodeError:
                dropped += 1
                continue
            if ast.mapper is None:
                continue
            try:
                rec = map_entry(ast.mapper, line_no, entry)
            except MapError:
                dropped += 1
                continue
            ts = rec.ts
            if since_ms is not None and (ts if ts is not None else 2**62) < since_ms:
                continue
            if until_ms is not None and (ts if ts is not None else -(2**62)) > until_ms:
                break
            records.append(rec)
    return records, dropped


def run_log_query(
    paths,
    program: str | Program,
    *,
    interval_ms: int | None = None,
    lookback_ms: int | None = None,
    since_ms: int | None = None,
    until_ms: int | None = None,
    num_buckets: int = 16,
    extensions: bool = False,
    formatter: bool = True,
):
    """Run a pq program over log files with Ray; returns the formatted
    output lines (query programs) or the samples DataFrame when
    ``formatter=False``."""
    from ..query.ast import find_smallest_range_ms
    from ..query.distributed import DistributedContext, evaluate_distributed

    ast = parse_program(program) if isinstance(program, str) else program
    if ast.query is None:
        raise ValueError(
            "run_log_query needs a | select <query> stage; use pq_ray.runner "
            "for plain decode/map programs"
        )
    files = _list_files(paths)
    if not files:
        raise ValueError(f"no input files in {paths!r}")

    files_ds = rd.from_items(
        [{"path": p, "file_idx": i} for i, p in enumerate(files)]
    )

    # pass 1: per-file label-key summaries (tiny) → unioned label schema
    def schema_pass(batch: pd.DataFrame) -> pd.DataFrame:
        keys: set[str] = set()
        for p in batch["path"]:
            records, _ = _file_records(p, ast, since_ms, until_ms)
            for r in records:
                keys.update(r.labels)
        return pd.DataFrame({"label_key": sorted(keys) or [""]})

    keys = (
        files_ds.map_batches(schema_pass, batch_size=1, batch_format="pandas")
        .to_pandas()["label_key"]
        .tolist()
    )
    label_cols = sorted({k for k in keys if k})

    # pass 2: per-file samples blocks in the unioned schema
    def sample_pass(batch: pd.DataFrame) -> pa.Table:
        out = []
        for p, fidx in zip(batch["path"], batch["file_idx"]):
            records, _ = _file_records(p, ast, since_ms, until_ms)
            ts_l, seq_l, name_l, val_l, lab_l = [], [], [], [], []
            seq = 0
            for r in records:
                if r.ts is None:
                    continue
                vals = dict(r.values)
                vals["__line__"] = float(r.line_no)
                for name, value in vals.items():
                    ts_l.append(r.ts)
                    seq_l.append((int(fidx) << 40) | seq)
                    name_l.append(name)
                    val_l.append(value)
                    lab_l.append(r.labels)
                    seq += 1
            cols = {
                "ts": pa.array(np.array(ts_l, dtype=np.int64)),
                "seq": pa.array(np.array(seq_l, dtype=np.int64)),
                "name": pa.array(name_l, type=pa.string()),
                "value": pa.array(np.array(val_l, dtype=np.float64)),
            }
            for c in label_cols:
                cols[f"l_{c}"] = pa.array(
                    [lab.get(c) for lab in lab_l], type=pa.string()
                )
            out.append(pa.table(cols))
        return pa.concat_tables(out)

    # materialize once: the evaluator consumes the samples Dataset more
    # than once (summary pass + window explode) — without this every
    # consumption would re-parse the log files
    samples = files_ds.map_batches(
        sample_pass, batch_size=1, batch_format="pandas"
    ).materialize()

    interval = interval_ms or find_smallest_range_ms(ast.query) or DEFAULT_INTERVAL_MS
    lookback = lookback_ms or interval
    ctx = DistributedContext(
        samples, label_cols, interval, lookback,
        start_at=since_ms, num_buckets=num_buckets, extensions=extensions,
    )
    stream = evaluate_distributed(ast.query, ctx)
    if not formatter:
        return stream
    if ast.formatter in ("to_promapi", "to_json"):
        from ..format.promapi import format_stream

        return format_stream(stream)
    from ..registry import get_formatter

    custom = get_formatter(ast.formatter)
    if custom is not None and ast.formatter not in (None, "human"):
        return custom(stream, verbose=False)
    from ..format.human import format_stream_human

    return format_stream_human(stream)


# ---------------------------------------------------------------------------
# driver-gated query: the log path end-to-end with a SQL oracle
# ---------------------------------------------------------------------------


def _render_event_logs(sf_dir: str, log_dir: str, shards: int = 4) -> None:
    """Deterministically render the events table as sharded log files
    (``<epoch_ms> <event_type> <value>`` lines, ordered by (ts,
    event_id) across shards) — the reference's input shape."""
    import duckdb

    os.makedirs(log_dir, exist_ok=True)
    rows = duckdb.sql(
        f"""select epoch_ms(ts) as ts_ms, event_type, value, event_id
            from read_parquet('{sf_dir}/events.parquet')
            order by ts_ms, event_id"""
    ).fetchall()
    n = len(rows)
    per = (n + shards - 1) // shards
    for s in range(shards):
        part = rows[s * per : (s + 1) * per]
        path = os.path.join(log_dir, f"events-{s:02d}.log")
        with open(path + ".tmp", "w") as f:
            for ts_ms, et, v, _eid in part:
                f.write(f"{ts_ms} {et} {v!r}\n")
        os.replace(path + ".tmp", path)


_LOG_PROGRAM = (
    r"/(\d+) (\w+) ([\d.e+-]+)/ | map {.0:ts, .1 as event_type, .2:num as v} "
    r"| select sum(v) by (event_type) | to_json"
)


def q_logs_sum_by_event_1s(sf_dir: str) -> pd.DataFrame:
    """The full log path, driver-gated: events rendered as sharded log
    files → parallel decode+map → distributed tick-grid evaluation of
    ``sum(v) by (event_type)`` at interval=lookback=1s.  The oracle
    expresses the same instant-vector semantics in SQL (latest sample
    per series per tick by arrival order = (ts, event_id))."""
    import hashlib

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    log_dir = f"/tmp/pq_ray_logs_{tag}"
    _render_event_logs(sf_dir, log_dir)
    stream = run_log_query(log_dir, _LOG_PROGRAM, formatter=False)
    df = stream.df[["tick", "l_event_type", "value"]].rename(
        columns={"l_event_type": "event_type", "value": "sum_v"}
    )
    df = df.copy()
    df["sum_v"] = df["sum_v"].round(6)
    return df.sort_values(["tick", "event_type"]).reset_index(drop=True)


QUERIES = {"logs_sum_by_event_1s": q_logs_sum_by_event_1s}

ORACLES = {
    "logs_sum_by_event_1s": """
        WITH s AS (
            SELECT epoch_ms(ts) AS ts_ms, event_type, value, event_id
            FROM events
        ),
        params AS (SELECT MIN(ts_ms) + 1000 - 1 AS first FROM s),
        ticked AS (
            SELECT s.*, p.first + ((s.ts_ms - p.first + 999) // 1000) * 1000 AS tick
            FROM s, params p
        ),
        instant AS (
            SELECT tick, event_type,
                   arg_max(value, ts_ms * 100000 + event_id) AS iv
            FROM ticked GROUP BY tick, event_type
        )
        SELECT tick, event_type, ROUND(SUM(iv), 6) AS sum_v
        FROM instant GROUP BY tick, event_type ORDER BY tick, event_type
    """,
}
