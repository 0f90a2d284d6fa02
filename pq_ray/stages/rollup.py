"""Rollup kernels: tumbling-window partial aggregates over a samples stream.

The Ray-Data re-expression of pq's ``*_over_time`` family
(src/query/function.rs:41-72): instead of a per-tick streaming buffer
(src/query/vector.rs:141-202) we compute, per ``(series, window)``, the
mergeable partial-aggregate struct::

    {sum, count, min, max, (first_ts, first_v), (last_ts, last_v)}

which finalizes every reference kernel — sum/count/min/max/avg_over_time
directly, ``last_over_time`` as the value at min ts (the reference's
newest-first ``.last()`` quirk, SURVEY.md Q7), and the PromQL-style
``rate``/``delta``/``increase`` family from (first, last) — and
*re-aggregates exactly* across retention tiers (1m partials → 1h → 1d),
which is what makes the continuous-aggregate cascade possible without
re-reading raw data.

Physical plan per rollup (two stages, ONE shuffle), Arrow end-to-end:
  1. ``map_batches``: assign windows + partial-aggregate *within the
     batch* (numpy lexsort+reduceat over zero-copy Arrow columns) →
     shrinks the stream by ~rows/(series x windows-per-batch) before
     any data moves; labels attach positionally (one ``take``), not by
     merge.
  2. the parallel hash exchange on ``(series_id, window_ts)`` — note
     the window in the key: a hot series' windows spread across buckets,
     the explicit skew-splitting the north rule asks for — with the same
     numpy combine inside each bucket's reduce.

Windows here are *floor-aligned*: ``window_ts = floor((ts - offset)/W)*W
+ offset`` labels the inclusive window start, ``[start, start+W)``.  The
pq conformance engine (pq_ray.query) uses its own tick grid
(``(T - d, T]`` ending at ``t0 + k*interval - 1``); the cascade tiers use
the SQL-friendly floor grid and both are exercised by tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# Partial-aggregate columns (the mergeable struct).
AGG_COLS = ["sum", "count", "min", "max", "first_ts", "first_v", "last_ts", "last_v"]
DEFAULT_LABEL_COLS = ["name", "source", "shard"]


def window_floor(ts: np.ndarray, interval_ms: int, offset_ms: int = 0) -> np.ndarray:
    """Inclusive window-start label for each sample timestamp."""
    return ((ts - offset_ms) // interval_ms) * interval_ms + offset_ms


def np_partial_agg(
    sid: np.ndarray, window: np.ndarray, ts: np.ndarray, val: np.ndarray,
    return_take: bool = False,
):
    """Vectorized partial aggregation: one output row per (sid, window).

    numpy lexsort + reduceat — ~3x faster than a pandas groupby and
    allocation-free of Python objects; tie-break on (ts, value).  This
    is the hot kernel of the decode->rollup path (runs per batch, fused
    into the decode actor).

    ``return_take=True`` additionally returns, per output row, the index
    of one input row of that group — the positional label attach for the
    Arrow-native rollup (labels are a function of series_id, so any
    group member's labels serve).
    """
    order = np.lexsort((val, ts, window, sid))
    s_sid = sid[order]
    s_w = window[order]
    s_ts = ts[order]
    s_v = val[order]
    boundary = np.nonzero((s_sid[1:] != s_sid[:-1]) | (s_w[1:] != s_w[:-1]))[0] + 1
    starts = np.concatenate(([0], boundary))
    n = len(s_v)
    counts = np.diff(np.concatenate((starts, [n])))
    out = {
        "series_id": s_sid[starts],
        "window_ts": s_w[starts],
        "sum": np.add.reduceat(s_v, starts),
        "count": counts.astype(np.int64),
        "min": np.minimum.reduceat(s_v, starts),
        "max": np.maximum.reduceat(s_v, starts),
        "first_ts": s_ts[starts],
        "first_v": s_v[starts],
        "last_ts": s_ts[starts + counts - 1],
        "last_v": s_v[starts + counts - 1],
    }
    if return_take:
        return out, order[starts]
    return out


def np_combine_partials(cols: dict[str, np.ndarray], return_take: bool = False):
    """Vectorized merge of partial rows sharing (series_id, window_ts) —
    the combine side of the shuffle (tie-break on
    (first_ts, first_v)/(last_ts, last_v)).
    ``return_take=True`` also returns one input-row index per group for
    positional label attach."""
    sid = cols["series_id"]
    w = cols["window_ts"]
    order = np.lexsort((cols["first_v"], cols["first_ts"], w, sid))
    boundary = (
        np.nonzero(
            (sid[order][1:] != sid[order][:-1]) | (w[order][1:] != w[order][:-1])
        )[0]
        + 1
    )
    starts = np.concatenate(([0], boundary))
    n = len(sid)
    counts = np.diff(np.concatenate((starts, [n])))
    out = {
        "series_id": sid[order][starts],
        "window_ts": w[order][starts],
        "sum": np.add.reduceat(cols["sum"][order], starts),
        "count": np.add.reduceat(cols["count"][order], starts).astype(np.int64),
        "min": np.minimum.reduceat(cols["min"][order], starts),
        "max": np.maximum.reduceat(cols["max"][order], starts),
        "first_ts": cols["first_ts"][order][starts],
        "first_v": cols["first_v"][order][starts],
    }
    order2 = np.lexsort((cols["last_v"], cols["last_ts"], w, sid))
    ends = starts + counts - 1
    out["last_ts"] = cols["last_ts"][order2][ends]
    out["last_v"] = cols["last_v"][order2][ends]
    if return_take:
        return out, order[starts]
    return out


def _np_bucket(sid: np.ndarray, window: np.ndarray, num_buckets: int) -> np.ndarray:
    h = sid.astype(np.uint64) ^ (
        window.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    )
    return ((h >> np.uint64(17)) % np.uint64(num_buckets)).astype(np.int32)



def _labeled_table(
    out: dict[str, np.ndarray], take: np.ndarray, src: pa.Table,
    label_cols: list[str], bucket: np.ndarray | None = None,
) -> pa.Table:
    """Assemble the labeled points table Arrow-natively: numeric columns
    from the combine dict, label columns via one positional ``take``
    from the source batch (labels are a function of series_id)."""
    tbl: dict[str, object] = {
        "series_id": pa.array(out["series_id"], type=pa.uint64()),
        "window_ts": pa.array(out["window_ts"]),
    }
    idx = pa.array(take)
    for c in label_cols:
        tbl[c] = src[c].combine_chunks().take(idx)
    for c in AGG_COLS:
        tbl[c] = pa.array(out[c])
    if bucket is not None:
        tbl["bucket"] = pa.array(bucket)
    return pa.table(tbl)


def _labeled_reduce_fn(label_cols: list[str] | None):
    """Per-bucket Arrow reduce for the labeled exchange: numeric combine
    via np_combine_partials + positional label re-attach (labels are a
    function of series_id, taken from any group member) — no pandas
    round-trip (VERDICT r3 #6)."""
    lcols = DEFAULT_LABEL_COLS if label_cols is None else label_cols
    out_cols = ["series_id", "window_ts", *lcols, *AGG_COLS]
    numeric = ["series_id", "window_ts", *AGG_COLS]

    def reduce_fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            drop = [c for c in t.schema.names if c == "bucket"]
            return (t.drop_columns(drop) if drop else t).select(
                [c for c in out_cols if c in t.schema.names]
            )
        cols = {
            c: t[c].combine_chunks().to_numpy(zero_copy_only=False)
            for c in numeric
        }
        out, take = np_combine_partials(cols, return_take=True)
        return _labeled_table(out, take, t, lcols)

    return reduce_fn


def rollup(
    ds,
    interval_ms: int,
    *,
    offset_ms: int = 0,
    label_cols: list[str] | None = None,
    num_buckets: int = 64,
    batch_size: int | None = None,
):
    """samples Dataset → rollup points Dataset at ``interval_ms``.

    One all-to-all exchange (the parallel hash exchange — Ray Data's
    sort-groupby carries a flat multi-second critical path, measured in
    BASELINE.md); everything else is embarrassingly parallel map_batches.
    Blocks stay Arrow end-to-end — the former pandas partial/combine
    round-trip cost arrow→pandas→arrow twice per exchange (VERDICT r3
    #6); labels attach positionally, never via a merge.
    ``num_buckets`` bounds peak per-task memory: each bucket must fit a
    worker heap (~rows/buckets).
    """
    from .exchange import hash_exchange

    lcols = DEFAULT_LABEL_COLS if label_cols is None else label_cols

    def partial_arrow(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "series_id": pa.array([], type=pa.uint64()),
                    "window_ts": pa.array([], type=pa.int64()),
                    **{
                        c: pa.array(
                            [],
                            type=t.schema.field(c).type
                            if c in t.schema.names else pa.string(),
                        )
                        for c in lcols
                    },
                    **{
                        c: pa.array(
                            [], type=pa.int64() if c in
                            ("count", "first_ts", "last_ts") else pa.float64()
                        )
                        for c in AGG_COLS
                    },
                    "bucket": pa.array([], type=pa.int32()),
                }
            )
        sid = t["series_id"].combine_chunks().to_numpy(zero_copy_only=False)
        ts = t["ts"].combine_chunks().to_numpy(zero_copy_only=False)
        val = t["value"].combine_chunks().to_numpy(zero_copy_only=False)
        window = window_floor(ts, interval_ms, offset_ms)
        out, take = np_partial_agg(
            sid.astype(np.uint64), window, ts, val.astype(np.float64),
            return_take=True,
        )
        bucket = _np_bucket(out["series_id"], out["window_ts"], num_buckets)
        return _labeled_table(out, take, t, lcols, bucket)

    bucketed = ds.map_batches(
        partial_arrow, batch_format="pyarrow", batch_size=batch_size
    )
    # the labeled reduce doubles as the tree-gather combine: partial
    # merges are associative, so combining combined rows is exact
    return hash_exchange(
        bucketed, "bucket", num_buckets, _labeled_reduce_fn(lcols),
        combine_fn=_labeled_reduce_fn(lcols),
    )


def cascade(
    points_ds,
    coarser_interval_ms: int,
    *,
    offset_ms: int = 0,
    label_cols: list[str] | None = None,
    num_buckets: int = 64,
):
    """Re-aggregate a finer tier's points into a coarser tier.

    Exact: partials are mergeable, so 1h-from-1m equals 1h-from-raw
    bit-for-bit (tested in tests/test_cascade.py).  Reads only the finer
    tier's (already small) points — never raw samples.  Same Arrow hash
    exchange as rollup(), Arrow blocks end-to-end.
    """
    from .exchange import hash_exchange

    lcols = DEFAULT_LABEL_COLS if label_cols is None else label_cols

    def rewindow(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        sid = t["series_id"].combine_chunks().to_numpy(zero_copy_only=False)
        w = window_floor(
            t["window_ts"].combine_chunks().to_numpy(zero_copy_only=False),
            coarser_interval_ms, offset_ms,
        )
        i = t.schema.get_field_index("window_ts")
        t = t.set_column(i, "window_ts", pa.array(w))
        bucket = pa.array(_np_bucket(sid, w, num_buckets))
        if "bucket" in t.schema.names:
            t = t.set_column(t.schema.get_field_index("bucket"), "bucket", bucket)
        else:
            t = t.append_column("bucket", bucket)
        return t

    rewindowed = points_ds.map_batches(rewindow, batch_format="pyarrow")
    return hash_exchange(
        rewindowed, "bucket", num_buckets, _labeled_reduce_fn(lcols),
        combine_fn=_labeled_reduce_fn(lcols),
    )


def finalize(df: pd.DataFrame, interval_ms: int) -> pd.DataFrame:
    """Add the derived per-window outputs a user queries:

    avg  = sum/count                 (avg_over_time)
    last = first_v                   (pq's last_over_time — the
                                      chronologically OLDEST sample in the
                                      window; reference stores range
                                      samples newest-first and takes
                                      ``.last()``: src/query/function.rs:56,
                                      src/query/vector.rs:233-236 — Q7)
    rate = (last_v - first_v) / window_seconds   (PromQL-style; the
                                      reference parses but never implements
                                      rate — README.md:194 — so this is
                                      validated against our own oracle only)
    """
    out = df.copy()
    out["avg"] = out["sum"] / out["count"]
    out["last"] = out["first_v"]
    out["rate"] = (out["last_v"] - out["first_v"]) / (interval_ms / 1000.0)
    return out


def rollup_numeric(
    samples_ds,
    interval_ms: int,
    *,
    offset_ms: int = 0,
    num_buckets: int = 16,
    key: str = "series_window",
    post_reduce=None,
):
    """Arrow-native rollup: samples Dataset (ts, value, series_id [+ any
    other columns, ignored]) → numeric points Dataset, via batch partial
    aggregation and the parallel hash exchange.

    The generic/labeled ``rollup()`` remains for small pipelines; this
    path keeps blocks Arrow end-to-end (pandas blocks slow the exchange
    >2x — see pipelines/cascade.py) and is what the events/pq-grid
    queries use.  Labels are re-attached by the caller from a small
    series_id → label map (broadcast-small-side, never shuffled).

    ``key``: ``"series_window"`` (default) spreads a hot series' windows
    across buckets (skew splitting); ``"series"`` co-locates ALL of a
    series' windows in one bucket so a ``post_reduce`` can run whole-
    series logic (e.g. gap-fill) inside the SAME exchange.
    ``post_reduce``: optional callable (dict of combined numpy columns,
    sorted by (series_id, window_ts)) → pa.Table, fused into the reduce.
    """
    import pyarrow as pa

    from .exchange import hash_exchange

    def partial(t: pa.Table) -> pa.Table:
        sid = t["series_id"].combine_chunks().to_numpy(zero_copy_only=False)
        ts = t["ts"].combine_chunks().to_numpy(zero_copy_only=False)
        val = t["value"].combine_chunks().to_numpy(zero_copy_only=False)
        window = window_floor(ts, interval_ms, offset_ms)
        out = np_partial_agg(sid.astype(np.uint64), window, ts, val.astype(np.float64))
        if key == "series_window":
            h = out["series_id"] ^ (
                out["window_ts"].astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            )
        else:
            h = out["series_id"] * np.uint64(0x9E3779B97F4A7C15)
        bucket = ((h >> np.uint64(17)) % np.uint64(num_buckets)).astype(np.int32)
        cols = {k: pa.array(v) for k, v in out.items()}
        cols["series_id"] = pa.array(out["series_id"], type=pa.uint64())
        cols["bucket"] = pa.array(bucket)
        return pa.table(cols)

    numeric_cols = ["series_id", "window_ts", *AGG_COLS]

    def _combine(t: pa.Table) -> dict[str, np.ndarray]:
        int_cols = {"window_ts", "count", "first_ts", "last_ts"}
        if t.num_rows:
            cols = {
                c: t[c].combine_chunks().to_numpy(zero_copy_only=False)
                for c in numeric_cols
            }
            return np_combine_partials(cols)
        return {
            c: np.zeros(
                0,
                dtype=np.uint64
                if c == "series_id"
                else np.int64 if c in int_cols else np.float64,
            )
            for c in numeric_cols
        }

    def _to_table(out: dict[str, np.ndarray]) -> pa.Table:
        import pyarrow as pa2

        tbl = {c: pa2.array(out[c]) for c in numeric_cols}
        tbl["series_id"] = pa2.array(out["series_id"], type=pa2.uint64())
        return pa2.table(tbl)

    # the tree-gather combine is the reduce MINUS the finalize: partial
    # merges stay re-combinable, post_reduce runs once at the final level
    def combine_fn(t: pa.Table) -> pa.Table:
        return _to_table(_combine(t))

    def reduce_fn(t: pa.Table) -> pa.Table:
        out = _combine(t)
        if post_reduce is not None:
            return post_reduce(out)
        return _to_table(out)

    bucketed = samples_ds.map_batches(partial, batch_format="pyarrow")
    return hash_exchange(
        bucketed, "bucket", num_buckets, reduce_fn, combine_fn=combine_fn
    )
