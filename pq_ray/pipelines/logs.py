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

Ingestion (round 3 — single pass, split-friendly): the reference
streams stdin line-by-line in one pass (src/input/reader.rs:25-38);
the distributed counterpart keeps the one-pass property per unit of
parallelism — files cut into byte-range SPLITS (``split_bytes``,
default 64 MiB) with the standard line-boundary contract — a split owns every line that STARTS inside
its range; the reader skips a leading partial line and extends past
the range end to finish its last owned line, reading only its bounded
range (never the whole file).  ONE parse pass per split emits the
local samples block AND a tiny metadata summary (label keys, line /
sample counts) together; the driver prefix-sums the counts per file
and a cheap fixup task rewrites each block's ``seq`` / ``__line__``
offsets and projects it onto the unioned label schema — no re-parse,
nothing corpus-sized on the driver.

``--until`` termination: the reference stops READING the stream at the
first record past the bound (src/query/mapper.rs:50-54).  A parallel
reader has no single stream to stop; each SPLIT stops at its first
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
import ray
import ray.data as rd

from ..query.ast import JsonDecoder, NamedDecoder, Program, RegexDecoder
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
    if isinstance(ast.decoder, NamedDecoder):
        return get_decoder(ast.decoder.name)(*ast.decoder.args)
    assert isinstance(ast.decoder, JsonDecoder)
    return get_decoder("json")()


_DEFAULT_SPLIT_BYTES = 64 * 1024 * 1024
_READ_CHUNK = 1 << 20


def _file_splits(files: list[str], split_bytes: int):
    """(file_idx, path, start, end) byte ranges, >=1 per file."""
    out = []
    for i, p in enumerate(files):
        size = os.path.getsize(p)
        nsp = max(1, (size + split_bytes - 1) // split_bytes)
        for s in range(nsp):
            out.append((i, p, s * split_bytes, min((s + 1) * split_bytes, size)))
    return out


def _read_split_lines(path: str, start: int, end: int) -> list[bytes]:
    """Lines owned by [start, end): a split owns a line iff the line
    STARTS inside the range.  Reads only its bounded range (+ the tail
    of its last line in chunks) — never the whole file."""
    with open(path, "rb") as f:
        if start > 0:
            f.seek(start - 1)
            buf = f.read(end - start + 1)
            if buf[:1] != b"\n":
                # the line straddling `start` belongs to the previous split
                nl = buf.find(b"\n")
                if nl < 0:
                    return []
                buf = buf[nl + 1 :]
            else:
                buf = buf[1:]
        else:
            f.seek(0)
            buf = f.read(end - start)
        # finish the last owned line (it may straddle `end`)
        if buf and not buf.endswith(b"\n"):
            while True:
                chunk = f.read(_READ_CHUNK)
                if not chunk:
                    break
                nl = chunk.find(b"\n")
                if nl >= 0:
                    buf += chunk[: nl + 1]
                    break
                buf += chunk
    return buf.splitlines()


@ray.remote(num_returns=2)
def _parse_split(
    path: str, start: int, end: int, ast: Program, since_ms, until_ms
):
    """ONE pass over a split: decode+map its owned lines → local samples
    block (line numbers / seq are split-LOCAL, fixed up later) + tiny
    metadata (label keys, line/sample counts)."""
    lines = _read_split_lines(path, start, end)
    decode = _make_decoder(ast)
    records = []
    dropped = 0
    for local_no, raw in enumerate(lines, start=1):
        try:
            entry = decode(raw)
        except DecodeError:
            dropped += 1
            continue
        if ast.mapper is None:
            continue
        try:
            rec = map_entry(ast.mapper, local_no, entry)
        except MapError:
            dropped += 1
            continue
        ts = rec.ts
        if since_ms is not None and (ts if ts is not None else 2**62) < since_ms:
            continue
        if until_ms is not None and (ts if ts is not None else -(2**62)) > until_ms:
            break
        records.append(rec)

    keys: set[str] = set()
    ts_l, seq_l, name_l, val_l, line_l, lab_l = [], [], [], [], [], []
    seq = 0
    for r in records:
        keys.update(r.labels)
        if r.ts is None:
            continue
        vals = dict(r.values)
        vals["__line__"] = float(r.line_no)
        for name, value in vals.items():
            ts_l.append(r.ts)
            seq_l.append(seq)
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
    for c in sorted(keys):
        cols[f"l_{c}"] = pa.array([lab.get(c) for lab in lab_l], type=pa.string())
    meta = {
        "n_lines": len(lines),
        "n_samples": seq,
        "label_keys": sorted(keys),
        "dropped": dropped,
    }
    return pa.table(cols), meta


@ray.remote
def _fixup_split(
    t: pa.Table, file_idx: int, line_off: int, seq_off: int, label_cols: list[str]
) -> pa.Table:
    """Rewrite a split block's local offsets to file-global ones and
    project it onto the unioned label schema (metadata-cheap, no
    re-parse): seq = file_idx<<40 | (seq_off + local), ``__line__``
    sample values shift by the split's first line number."""
    seq = t["seq"].combine_chunks().to_numpy(zero_copy_only=False)
    seq = (np.int64(file_idx) << np.int64(40)) | (seq + np.int64(seq_off))
    val = t["value"].combine_chunks().to_numpy(zero_copy_only=False).copy()
    if line_off:
        name = t["name"].combine_chunks().to_numpy(zero_copy_only=False)
        val[name == "__line__"] += float(line_off)
    cols = {
        "ts": t["ts"],
        "seq": pa.array(seq),
        "name": t["name"],
        "value": pa.array(val),
    }
    null_col = pa.array([None] * t.num_rows, type=pa.string())
    for c in label_cols:
        lc = f"l_{c}"
        cols[lc] = t[lc] if lc in t.schema.names else null_col
    return pa.table(cols)


def run_log_query(
    paths,
    program: str | Program,
    *,
    interval_ms: int | None = None,
    lookback_ms: int | None = None,
    since_ms: int | None = None,
    until_ms: int | None = None,
    num_buckets: int | None = None,
    extensions: bool = False,
    formatter: bool = True,
    split_bytes: int = _DEFAULT_SPLIT_BYTES,
    verbose: bool = False,
    error_sink=None,
):
    """Run a pq program over log files with Ray; returns the formatted
    output lines (query programs) or the samples DataFrame when
    ``formatter=False``."""
    from ..query.ast import find_smallest_range_ms
    from ..query.distributed import DistributedContext, evaluate_distributed

    ast = (
        parse_program(program, extensions=extensions)
        if isinstance(program, str)
        else program
    )
    if ast.query is None:
        raise ValueError(
            "run_log_query needs a | select <query> stage; use pq_ray.runner "
            "for plain decode/map programs"
        )
    files = _list_files(paths)
    if not files:
        raise ValueError(f"no input files in {paths!r}")

    # ONE parse pass over byte-range splits: each task returns its local
    # samples block (stays in the object store) + a tiny metadata summary
    splits = _file_splits(files, split_bytes)
    parsed = [
        _parse_split.remote(p, start, end, ast, since_ms, until_ms)
        for (_fi, p, start, end) in splits
    ]
    metas = ray.get([m for (_t, m) in parsed])
    label_cols = sorted({k for m in metas for k in m["label_keys"]})

    if verbose:
        # the local runner's -v reports each dropped line (runner.py
        # report()); distributed splits aggregate per file instead —
        # same signal, wire-cheap
        per_file: dict[int, int] = {}
        for (fi, _p, _s, _e), meta in zip(splits, metas):
            per_file[fi] = per_file.get(fi, 0) + meta["dropped"]
        for fi, n in sorted(per_file.items()):
            if n:
                msg = f"{files[fi]}: {n} line(s) dropped (decode/map errors)"
                if error_sink is not None:
                    error_sink.append(msg)
                else:
                    import sys as _sys

                    print(msg, file=_sys.stderr)

    # per-file prefix sums of line/sample counts (splits are emitted in
    # file order) → each block's offsets; fixup tasks rewrite seq /
    # __line__ and project onto the unioned label schema — no re-parse
    line_seen: dict[int, int] = {}
    seq_seen: dict[int, int] = {}
    fixed = []
    for (fi, _p, _s, _e), (t_ref, _m), meta in zip(splits, parsed, metas):
        lo = line_seen.get(fi, 0)
        so = seq_seen.get(fi, 0)
        line_seen[fi] = lo + meta["n_lines"]
        seq_seen[fi] = so + meta["n_samples"]
        fixed.append(_fixup_split.remote(t_ref, fi, lo, so, label_cols))

    # from_arrow_refs blocks are already materialized — the evaluator's
    # multiple consumptions (summary pass + window explode) re-read the
    # same objects, never re-parse the log files
    samples = rd.from_arrow_refs(fixed)

    interval = interval_ms or find_smallest_range_ms(ast.query) or DEFAULT_INTERVAL_MS
    lookback = lookback_ms or interval
    if num_buckets is None:
        # adaptive (stages/sizing.py): the exchange carries per-(series,
        # window) partials of the decoded sample stream — size it to the
        # total input bytes (64 MB of raw logs per bucket floor-8)
        from ..stages.sizing import suggest_buckets

        total_bytes = 0
        for p in ([paths] if isinstance(paths, (str, os.PathLike)) else paths):
            try:
                total_bytes += os.path.getsize(p)
            except OSError:
                pass
        num_buckets = suggest_buckets(total_bytes, rows_per_bucket=64 << 20)
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


def _render_event_logs_logfmt(sf_dir: str, log_dir: str, shards: int = 4) -> None:
    """Render the events table as sharded logfmt log files
    (``ts=<epoch_ms> event=<type> v=<value>``), same ordering contract
    as ``_render_event_logs``."""
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
                f.write(f"ts={ts_ms} event={et} v={v!r}\n")
        os.replace(path + ".tmp", path)


_LOGFMT_PROGRAM = (
    "logfmt | map {.ts:ts, .event as event_type, .v:num as v} "
    "| select sum(v) by (event_type) | to_json"
)


def q_logs_logfmt_sum_1s(sf_dir: str) -> pd.DataFrame:
    """Same tick-grid query as ``logs_sum_by_event_1s`` but over LOGFMT
    log files through the registry's ``logfmt`` decoder
    (sources/structured.py) — proves the named-decoder surface rides
    the distributed split/parse/fixup path unchanged.  Oracle: identical
    instant-vector SQL (the rendered stream is the same events data)."""
    import hashlib

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    log_dir = f"/tmp/pq_ray_logfmt_{tag}"
    _render_event_logs_logfmt(sf_dir, log_dir)
    stream = run_log_query(log_dir, _LOGFMT_PROGRAM, formatter=False)
    df = stream.df[["tick", "l_event_type", "value"]].rename(
        columns={"l_event_type": "event_type", "value": "sum_v"}
    )
    df = df.copy()
    df["sum_v"] = df["sum_v"].round(6)
    return df.sort_values(["tick", "event_type"]).reset_index(drop=True)


QUERIES = {
    "logs_sum_by_event_1s": q_logs_sum_by_event_1s,
    "logs_logfmt_sum_1s": q_logs_logfmt_sum_1s,
}

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

ORACLES["logs_logfmt_sum_1s"] = ORACLES["logs_sum_by_event_1s"]
