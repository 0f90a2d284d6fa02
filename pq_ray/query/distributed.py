"""Distributed evaluation of arbitrary pq queries over a Ray Dataset.

``evaluate_distributed`` runs the same PromQL-subset semantics as the
local batch evaluator (engine.py), but the per-sample heavy lifting —
matcher filtering, tick-window assignment, per-(series, tick) reduction
— executes as Ray Data stages over Arrow batches with the parallel hash
exchange.  Only the *post-rollup* stream (one row per series per tick,
bounded by |series| x |ticks|) reaches the driver, where the existing
combinators (aggregations, binary ops, formatters) finish the query.
That split is the scale contract: raw samples never leave the cluster;
what crosses to the driver is the same "instant vector stream" the
reference materializes per tick anyway.

Selector leaves are fused with enclosing ``*_over_time`` calls: the
window reduction computes the mergeable partial struct (sum, count,
min, max, first/last by (ts, seq)) per (series, tick), so e.g.
``sum_over_time(m[5m])`` never materializes the range vector.  A *raw*
top-level range selector (matrix output) is the one shape that is
collected sample-level — it is an output format, not a transform.

Parity notes vs the local engine (tested in
tests/test_distributed_query.py):
- instant value = latest by (ts, seq); last_over_time = oldest by
  (ts, seq) (Q7) — seq rides through the pipeline, so arrival-order
  tie-breaks match exactly;
- sums/avgs combine partials, so float addition order may differ from
  the local single-pass fold by ~1 ulp (exact for integer-valued data);
- the tick grid (Q1-Q4) uses the selector's matched min/max ts computed
  with Dataset.min/max on the filtered stream.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..model import signature
from ..stages.exchange import hash_exchange
from .ast import FunctionCall, VectorSelector
from .engine import (
    EvalContext,
    L,
    QueryError,
    ScalarStream,
    VectorStream,
    _empty_vector,
    _rank_within_tick,
    evaluate as evaluate_local,
)
from .engine import OVER_TIME_FNS


def _sig_hash(sig: bytes) -> np.uint64:
    return np.uint64(int.from_bytes(hashlib.md5(sig).digest()[:8], "big"))


class DistributedContext:
    """Like EvalContext, but samples are a Ray Dataset.

    ``label_cols`` are real columns named ``l_<label>`` plus ``name``,
    ``ts`` (int64 ms), ``seq`` (int64 arrival order), ``value``
    (float64) — the same schema the local engine uses, distributed.
    The distinct labelset cardinality must be small (it is the series
    count — the same assumption the reference's in-memory BTreeMap
    makes).
    """

    def __init__(self, samples_ds, label_cols, interval, lookback, start_at=None,
                 num_buckets: int = 16, extensions: bool = False):
        self.ds = samples_ds
        self.label_cols = list(label_cols)
        self.interval = interval
        self.lookback = lookback
        self.start_at = start_at
        self.num_buckets = num_buckets
        self.extensions = extensions


def _matcher_mask(t: pa.Table, matchers) -> np.ndarray:
    n = t.num_rows
    mask = np.ones(n, dtype=bool)
    for m in matchers:
        col = "name" if m.label == "__name__" else L(m.label)
        if col not in t.schema.names:
            mask[:] = False
            break
        vals = t[col].combine_chunks()
        valid = ~vals.is_null().to_numpy(zero_copy_only=False)
        if m.op == "=":
            mm = (
                pa.compute.equal(vals, m.value)
                .fill_null(False)
                .to_numpy(zero_copy_only=False)
            )
        elif m.op == "!=":
            mm = (
                pa.compute.not_equal(vals, m.value)
                .fill_null(False)
                .to_numpy(zero_copy_only=False)
            )
        else:
            rx = m.compiled()
            pys = vals.to_pylist()
            mm = np.fromiter(
                (v is not None and rx.search(v) is not None for v in pys),
                dtype=bool,
                count=n,
            )
            if m.op == "!~":
                mm = ~mm
        mask &= mm & valid
    return mask


def _selector_partials(sel: VectorSelector, ctx: DistributedContext):
    """Filter + window-explode + per-(series, tick) partial reduce in Ray.

    Returns (ticks, pandas points df with columns tick, sig, labels…,
    partial agg columns) or None when nothing matched.
    """
    interval = ctx.interval
    d = sel.range_ms if sel.range_ms is not None else ctx.lookback
    matchers = sel.all_matchers()
    label_cols = ctx.label_cols

    offset_ms = getattr(sel, "offset_ms", 0)

    def filter_batch(t: pa.Table) -> pa.Table:
        mask = _matcher_mask(t, matchers)
        t = t.filter(pa.array(mask))
        if offset_ms and t.num_rows:
            # offset extension: shift sample ts forward so downstream
            # windowing reads the (T-d-offset, T-offset] window (same
            # rule as the local engine, engine.py eval_selector)
            i = t.schema.get_field_index("ts")
            t = t.set_column(i, "ts", pc.add(t.column("ts"), offset_ms))
        return t

    filtered = ctx.ds.map_batches(filter_batch, batch_format="pyarrow")

    # ONE summary pass over the filtered stream: per-block (distinct
    # labelsets, min/max ts) — the driver collects |blocks| x |series|
    # rows + 2 scalars per block, never samples; the only other pass is
    # the explode itself (2 executions of the filter total, down from 4)
    cols = ["name"] + [L(c) for c in label_cols if L(c) in ctx.ds.schema().names]

    def summary_batch(t: pa.Table) -> pa.Table:
        keep = [c for c in cols if c in t.schema.names]
        dist = t.select(keep).group_by(keep).aggregate([])
        n = dist.num_rows
        if t.num_rows:
            ts = t["ts"].combine_chunks().to_numpy(zero_copy_only=False)
            lo, hi = int(ts.min()), int(ts.max())
        else:
            lo, hi = np.iinfo(np.int64).max, np.iinfo(np.int64).min
        return dist.append_column(
            "_ts_min", pa.array(np.full(n, lo, dtype=np.int64))
        ).append_column("_ts_max", pa.array(np.full(n, hi, dtype=np.int64)))

    summary = filtered.map_batches(summary_batch, batch_format="pyarrow").to_pandas()
    if summary.empty:
        return None
    t_min = int(summary["_ts_min"].min())
    t_max = int(summary["_ts_max"].max())
    distinct = (
        summary.drop(columns=["_ts_min", "_ts_max"])
        .drop_duplicates()
        .reset_index(drop=True)
    )
    t0 = ctx.start_at if ctx.start_at is not None else t_min
    first = t0 + min(d, interval) - 1
    last_ts = t_max
    k_max = (last_ts + d - 1 - first) // interval
    if k_max < 0:
        return None
    ticks = first + interval * np.arange(k_max + 1, dtype=np.int64)

    def row_sig(row) -> bytes:
        dd = {}
        for c in cols:
            v = row.get(c)
            if v is None or (isinstance(v, float) and np.isnan(v)):
                continue
            dd["__name__" if c == "name" else c[2:]] = v
        return signature(dd)

    distinct["sig"] = [row_sig(r) for _, r in distinct.iterrows()]
    distinct["sid"] = [np.uint64(_sig_hash(s)) for s in distinct["sig"]]
    sig_map = distinct.set_index("sid")

    sid_lut = {
        tuple(None if (isinstance(v, float) and np.isnan(v)) else v
              for v in row): np.uint64(sid)
        for sid, row in zip(distinct["sid"], distinct[cols].itertuples(index=False))
    }

    def _empty_partials() -> pa.Table:
        return pa.table(
            {
                "sid": pa.array([], type=pa.uint64()),
                "tick": pa.array([], type=pa.int64()),
                "sum": pa.array([], type=pa.float64()),
                "count": pa.array([], type=pa.int64()),
                "min": pa.array([], type=pa.float64()),
                "max": pa.array([], type=pa.float64()),
                "first_key": pa.array([], type=pa.int64()),
                "first_v": pa.array([], type=pa.float64()),
                "last_key": pa.array([], type=pa.int64()),
                "last_v": pa.array([], type=pa.float64()),
                "bucket": pa.array([], type=pa.int32()),
            }
        )

    def _batch_sids(t: pa.Table, n: int) -> np.ndarray:
        """Vectorized series-id per row: pack per-column dictionary codes
        into one int64 key, then look up sid once per UNIQUE key (a
        handful per batch), never per row."""
        packed = np.zeros(n, dtype=np.int64)
        dicts = []
        for c in cols:
            enc = t[c].combine_chunks().dictionary_encode()
            dvals = enc.dictionary.to_pylist()
            idx = enc.indices.fill_null(len(dvals)).to_numpy(zero_copy_only=False)
            packed = packed * (len(dvals) + 1) + idx.astype(np.int64)
            dicts.append(dvals + [None])
        uniq, inverse = np.unique(packed, return_inverse=True)
        # decode each unique packed key back to its label tuple
        lut = np.empty(len(uniq), dtype=np.uint64)
        for i, u in enumerate(uniq):
            key = []
            rem = int(u)
            for dvals in reversed(dicts):
                key.append(dvals[rem % len(dvals)])
                rem //= len(dvals)
            lut[i] = sid_lut[tuple(reversed(key))]
        return lut[inverse]

    def explode_partial(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return _empty_partials()
        sid = _batch_sids(t, n)
        ts = t["ts"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        seq = t["seq"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        val = t["value"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)

        k_lo = np.maximum(np.ceil((ts - first) / interval).astype(np.int64), 0)
        k_hi = np.minimum((ts + d - 1 - first) // interval, k_max)
        reps = np.maximum(k_hi - k_lo + 1, 0)
        keep = reps > 0
        sid, ts, seq, val, k_lo, reps = (
            sid[keep], ts[keep], seq[keep], val[keep], k_lo[keep], reps[keep]
        )
        total = int(reps.sum())
        if total == 0:
            # non-empty batch whose samples are all invisible on the tick
            # grid (range < interval or start_at past the batch) — mirror
            # eval_selector's total==0 branch with a typed empty
            return _empty_partials()
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(reps)[:-1])), reps
        )
        tick = first + (np.repeat(k_lo, reps) + within) * interval
        sid_r = np.repeat(sid, reps)
        seq_r = np.repeat(seq, reps)
        val_r = np.repeat(val, reps)

        # partial-reduce within the batch, keyed (sid, tick); the arrival
        # key is seq ALONE — the reference's deque is pure push order
        # (vector.rs:203-236), so first/last tie-breaks ride on arrival
        # order even for out-of-order timestamps
        order = np.lexsort((seq_r, tick, sid_r))
        s_sid, s_tick = sid_r[order], tick[order]
        s_seq, s_val = seq_r[order], val_r[order]
        boundary = (
            np.nonzero((s_sid[1:] != s_sid[:-1]) | (s_tick[1:] != s_tick[:-1]))[0] + 1
        )
        starts = np.concatenate(([0], boundary))
        counts = np.diff(np.concatenate((starts, [len(s_val)])))
        ends = starts + counts - 1
        # min/max match the reference's fold(+-inf, f64::min/max): NaN
        # values are skipped, an all-NaN window yields +-inf
        mn = np.fmin.reduceat(s_val, starts)
        mn[np.isnan(mn)] = np.inf
        mx = np.fmax.reduceat(s_val, starts)
        mx[np.isnan(mx)] = -np.inf
        h = s_sid[starts] ^ (
            s_tick[starts].astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        )
        bucket = ((h >> np.uint64(17)) % np.uint64(ctx.num_buckets)).astype(np.int32)
        return pa.table(
            {
                "sid": pa.array(s_sid[starts], type=pa.uint64()),
                "tick": pa.array(s_tick[starts], type=pa.int64()),
                "sum": pa.array(np.add.reduceat(s_val, starts)),
                "count": pa.array(counts.astype(np.int64)),
                "min": pa.array(mn),
                "max": pa.array(mx),
                "first_key": pa.array(s_seq[starts], type=pa.int64()),
                "first_v": pa.array(s_val[starts]),
                "last_key": pa.array(s_seq[ends], type=pa.int64()),
                "last_v": pa.array(s_val[ends]),
                "bucket": pa.array(bucket),
            }
        )

    numeric = ["sid", "tick", "sum", "count", "min", "max",
               "first_key", "first_v", "last_key", "last_v"]

    def reduce_fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({c: t[c].slice(0, 0) for c in numeric})
        c = {k: t[k].combine_chunks().to_numpy(zero_copy_only=False) for k in numeric}
        order = np.lexsort((c["first_key"], c["tick"], c["sid"]))
        sid, tick = c["sid"][order], c["tick"][order]
        boundary = np.nonzero((sid[1:] != sid[:-1]) | (tick[1:] != tick[:-1]))[0] + 1
        starts = np.concatenate(([0], boundary))
        counts = np.diff(np.concatenate((starts, [len(sid)])))
        ends = starts + counts - 1
        out = {
            "sid": sid[starts],
            "tick": tick[starts],
            "sum": np.add.reduceat(c["sum"][order], starts),
            "count": np.add.reduceat(c["count"][order], starts).astype(np.int64),
            "min": np.minimum.reduceat(c["min"][order], starts),
            "max": np.maximum.reduceat(c["max"][order], starts),
            "first_key": c["first_key"][order][starts],
            "first_v": c["first_v"][order][starts],
        }
        order2 = np.lexsort((c["last_key"], c["tick"], c["sid"]))
        out["last_key"] = c["last_key"][order2][ends]
        out["last_v"] = c["last_v"][order2][ends]
        tbl = {k: pa.array(v) for k, v in out.items()}
        tbl["sid"] = pa.array(out["sid"], type=pa.uint64())
        return pa.table(tbl)

    pts = hash_exchange(
        filtered.map_batches(explode_partial, batch_format="pyarrow"),
        "bucket",
        ctx.num_buckets,
        reduce_fn,
    ).to_pandas()
    if pts.empty:
        return ticks, pd.DataFrame(), sig_map, cols
    pts = pts.merge(
        sig_map.reset_index()[["sid", "sig", *cols]], on="sid", sort=False
    )
    return ticks, pts, sig_map, cols


def _selector_stream(sel: VectorSelector, ctx: DistributedContext, kernel: str | None):
    """kernel=None → instant vector; else the *_over_time kernel name."""
    res = _selector_partials(sel, ctx)
    kind = "instant"
    if res is None:
        return _empty_vector(kind, ctx.label_cols)
    ticks, pts, sig_map, cols = res
    if pts.empty:
        return VectorStream(
            "instant",
            ticks,
            pd.DataFrame(columns=["tick", "value", "name",
                                  *[L(c) for c in ctx.label_cols], "sig", "ord"]),
            ctx.label_cols,
        )

    df = pts.copy()
    if kernel is None:  # instant vector: latest sample by (ts, seq)
        df["value"] = df["last_v"]
        keep_name = True
    elif kernel == "sum_over_time":
        df["value"] = df["sum"]
        keep_name = False
    elif kernel == "count_over_time":
        df["value"] = df["count"].astype(np.float64)
        keep_name = False
    elif kernel == "avg_over_time":
        df["value"] = df["sum"] / df["count"]
        keep_name = False
    elif kernel == "min_over_time":
        df["value"] = df["min"]
        keep_name = False
    elif kernel == "max_over_time":
        df["value"] = df["max"]
        keep_name = False
    elif kernel in ("last_over_time", "first_over_time"):
        df["value"] = df["first_v"]  # Q7: chronologically oldest
        keep_name = False
    elif kernel in ("rate", "increase", "delta"):
        diff = df["last_v"] - df["first_v"]
        df["value"] = diff / (sel.range_ms / 1000.0) if kernel == "rate" else diff
        keep_name = False
    else:
        raise QueryError(f"unsupported distributed kernel {kernel}")

    if not keep_name:
        # *_over_time drops __name__ — recompute sigs without it
        def strip_name(sig_row):
            dd = {}
            for c in cols:
                v = sig_row.get(c)
                if c == "name" or v is None or (isinstance(v, float) and np.isnan(v)):
                    continue
                dd[c[2:]] = v
            return signature(dd)

        df["name"] = None
        df["sig"] = [strip_name(r) for _, r in df[cols].iterrows()]

    df = df.sort_values(["tick", "sig"], kind="stable")
    df = _rank_within_tick(df)
    out_cols = ["tick", "value", "name",
                *[L(c) for c in ctx.label_cols if L(c) in df.columns], "sig", "ord"]
    return VectorStream("instant", ticks, df[out_cols],
                        [c for c in ctx.label_cols if L(c) in df.columns])


def evaluate_distributed(node, ctx: DistributedContext):
    """Evaluate an AST where selector/over-time leaves run in Ray and the
    per-tick combinators run locally on the post-rollup stream."""
    if isinstance(node, VectorSelector):
        if node.range_ms is not None:
            raise QueryError(
                "a raw top-level range selector materializes every sample — "
                "collect via the local engine instead"
            )
        return _selector_stream(node, ctx, None)
    if isinstance(node, FunctionCall) and node.name in OVER_TIME_FNS:
        (arg,) = node.args
        if not isinstance(arg, VectorSelector) or arg.range_ms is None:
            raise QueryError(f"{node.name} expects a range selector argument")
        return _selector_stream(arg, ctx, node.name)

    # non-leaf nodes: recurse, then reuse the local combinators by
    # dispatching through the local evaluate with pre-computed children
    from . import engine as eng
    from .ast import Aggregate, Binary, NumberLiteral, Parentheses, Subquery, Unary

    if isinstance(node, Subquery):
        raise QueryError(
            "subqueries are a local-engine extension: the inner expression "
            "re-evaluates on a step grid, which the distributed partial "
            "schema does not cover"
        )

    if isinstance(node, NumberLiteral):
        return ScalarStream(node.value)
    if isinstance(node, Parentheses):
        return evaluate_distributed(node.expr, ctx)
    if isinstance(node, Unary):
        return eng.eval_unary(node.op, evaluate_distributed(node.expr, ctx))
    if isinstance(node, Binary):
        return eng.eval_binary(
            node,
            evaluate_distributed(node.lhs, ctx),
            evaluate_distributed(node.rhs, ctx),
            ctx.extensions,
        )
    if isinstance(node, Aggregate):
        return eng.eval_aggregate(
            node, evaluate_distributed(node.expr, ctx), ctx.extensions
        )
    if isinstance(node, FunctionCall):
        from .engine import EXT_OVER_TIME_FNS, EXTENSION_FNS

        if ctx.extensions and node.name in EXT_OVER_TIME_FNS:
            raise QueryError(
                f"{node.name} is a local-engine extension: its per-window "
                "kernel is not covered by the distributed mergeable-partial "
                "schema (tsops.py implements the distributed forms)"
            )
        if ctx.extensions and node.name in EXTENSION_FNS:
            args = [
                a if isinstance(a, (float, str)) else evaluate_distributed(a, ctx)
                for a in node.args
            ]
            return eng.eval_function(node, args, None, True)
        raise QueryError(f"function {node.name!r} is not implemented")
    raise QueryError(f"cannot evaluate node {node!r}")
