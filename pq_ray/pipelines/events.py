"""Rollup pipelines over the `events` testdata table.

The `events` table (event_id, ts, user_id, event_type, value, props) is a
natural time-series: `event_type` plays the role of a pq label, `value`
the sample value, `ts` the timestamp.  These pipelines exercise the same
rollup kernels as the token cascade but over a table with a SQL oracle,
so the driver's DuckDB comparison can hash-check every aggregate.

All window labels are floor-aligned window *starts* in Unix ms
(`window_ts = (epoch_ms(ts) // W) * W`), matching the oracle SQL's
arithmetic exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..sources.readers import small_input_blocks
from ..stages.rollup import window_floor
from ..stages.sizing import buckets_for_table

MINUTE_MS = 60_000
HOUR_MS = 3_600_000


def read_events(sf_dir: str):
    path = f"{sf_dir}/events.parquet"
    return rd.read_parquet(
        path,
        columns=["ts", "event_type", "value"],
        override_num_blocks=small_input_blocks(path),
    )


def _to_samples(batch: pa.Table) -> pa.Table:
    """events batch → samples batch (ts:int64 ms, value:f64, series keys).

    series_id must be a *content* hash (stable across batches/workers) —
    per-batch dictionary codes would split one series across ids.
    """
    from ..model import stable_hash64

    ts_ms = pc.cast(
        pc.divide(pc.cast(batch["ts"], pa.int64()), 1000), pa.int64()
    )  # timestamp[us] → ms
    et = batch["event_type"].combine_chunks()
    if isinstance(et, pa.ChunkedArray):
        et = et.chunk(0) if et.num_chunks == 1 else pa.concat_arrays(et.chunks)
    codes = et.dictionary_encode()
    lut = np.array(
        [stable_hash64(v) for v in codes.dictionary.to_pylist()], dtype=np.uint64
    )
    series_id = lut[codes.indices.to_numpy(zero_copy_only=False)]
    return pa.table(
        {
            "ts": ts_ms,
            "value": pc.cast(batch["value"], pa.float64()),
            "event_type": et,
            "series_id": pa.array(series_id, type=pa.uint64()),
        }
    )


def _event_type_map(sf_dir: str) -> pd.DataFrame:
    """Tiny series_id → event_type table (broadcast side of the label
    re-attach; distinct label values read driver-side, no Ray job)."""
    import duckdb

    from ..model import stable_hash64

    ets = [
        r[0]
        for r in duckdb.sql(
            f"select distinct event_type from read_parquet('{sf_dir}/events.parquet')"
        ).fetchall()
    ]
    return pd.DataFrame(
        {
            "series_id": np.array([stable_hash64(e) for e in ets], dtype=np.uint64),
            "event_type": ets,
        }
    )


def rollup_events_numeric(sf_dir: str, interval_ms: int = MINUTE_MS):
    """Numeric rollup points (no labels) + the tiny series_id→event_type
    broadcast map.  Blocks stay Arrow through the exchange."""
    from ..stages.rollup import rollup_numeric

    ds = read_events(sf_dir)
    samples = ds.map_batches(_to_samples, batch_format="pyarrow")
    pts = rollup_numeric(
        samples, interval_ms,
        num_buckets=buckets_for_table(sf_dir, "events", min_buckets=16),
    )
    return pts, _event_type_map(sf_dir)


def rollup_events(sf_dir: str, interval_ms: int = MINUTE_MS):
    """Windowed partial-aggregate rollup of event values by event_type.

    Ray plan: read(prune cols) → map_batches(to_samples, arrow) →
    map_batches(partial agg, arrow) → parallel hash exchange →
    label re-attach from the broadcast map. Blocks stay Arrow through
    the exchange (see pipelines/cascade.py for the measurements).
    """
    pts, label_df = rollup_events_numeric(sf_dir, interval_ms)

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        return df.merge(label_df, on="series_id", sort=False)

    return pts.map_batches(attach, batch_format="pandas")


def q_rollup_1m(sf_dir: str) -> pd.DataFrame:
    """sum/count/min/max/avg of value per (1m window, event_type)."""
    df = rollup_events(sf_dir, MINUTE_MS).to_pandas()
    out = df[["window_ts", "event_type", "sum", "count", "min", "max"]].copy()
    out.columns = ["window_ts", "event_type", "sum_value", "n", "min_value", "max_value"]
    out["avg_value"] = (out["sum_value"] / out["n"]).round(6)
    # Round float *sums* on both sides (see ORACLES): f64 addition order
    # differs between engines by ~1 ulp; rounding makes value-hashes stable.
    out["sum_value"] = out["sum_value"].round(6)
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values(["window_ts", "event_type"]).reset_index(drop=True)


def q_rollup_1h_cascade(sf_dir: str) -> pd.DataFrame:
    """1h rollup computed by RE-AGGREGATING the 1m tier's partials (the
    continuous-aggregate path); oracle aggregates raw rows directly —
    matching proves the cascade is exact.  The re-aggregation rides the
    same Arrow hash exchange as the 1m rollup (labels re-attached once,
    after the combine — numeric-only blocks on the wire)."""
    from ..stages.exchange import hash_exchange
    from ..stages.rollup import AGG_COLS, np_combine_partials

    pts_1m, label_df = rollup_events_numeric(sf_dir, MINUTE_MS)
    numeric_cols = ["series_id", "window_ts", *AGG_COLS]

    def rewindow(t: pa.Table) -> pa.Table:
        w = window_floor(
            t["window_ts"].combine_chunks().to_numpy(zero_copy_only=False), HOUR_MS
        )
        sid = t["series_id"].combine_chunks().to_numpy(zero_copy_only=False)
        h = sid.astype(np.uint64) ^ (
            w.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        )
        t = t.set_column(
            t.schema.get_field_index("window_ts"), "window_ts", pa.array(w)
        )
        return t.append_column(
            "bucket", pa.array(((h >> np.uint64(17)) % np.uint64(16)).astype(np.int32))
        )

    def combine(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({c: t[c].slice(0, 0) for c in numeric_cols})
        cols = {
            c: t[c].combine_chunks().to_numpy(zero_copy_only=False)
            for c in numeric_cols
        }
        out = np_combine_partials(cols)
        tbl = {c: pa.array(out[c]) for c in numeric_cols}
        tbl["series_id"] = pa.array(out["series_id"], type=pa.uint64())
        return pa.table(tbl)

    df = (
        hash_exchange(
            pts_1m.map_batches(rewindow, batch_format="pyarrow"), "bucket", 16, combine
        )
        .to_pandas()
        .merge(label_df, on="series_id", sort=False)
    )
    out = df[["window_ts", "event_type", "sum", "count", "min", "max"]].copy()
    out.columns = ["window_ts", "event_type", "sum_value", "n", "min_value", "max_value"]
    out["sum_value"] = out["sum_value"].round(6)
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values(["window_ts", "event_type"]).reset_index(drop=True)


def q_rollup_1h_gorilla(sf_dir: str) -> pd.DataFrame:
    """Chunk-store read path proof: the 1h rollup points pass through a
    DISTRIBUTED Gorilla encode→decode round trip (delta-of-delta
    timestamps + XOR values, state/gorilla.py) before producing the
    same result as events_rollup_1h_cascade — hash-matching that query's
    oracle proves queries can run off the compressed retention tier,
    not just the points files.  Plan: series-keyed exchange (each chunk
    must see its whole series) → encode_chunk/decode_chunk inside the
    reduce → label re-attach from the broadcast map.  The codec is
    bit-exact (tests/test_gorilla.py), so exactness rides the cascade
    query's existing guarantees."""
    from ..stages.exchange import hash_exchange
    from ..state.gorilla import chunk_series, decode_chunk

    value_cols = ["sum", "count", "min", "max"]
    pts, label_df = rollup_events_numeric(sf_dir, HOUR_MS)

    def tag(t: pa.Table) -> pa.Table:
        sid = t["series_id"].combine_chunks().to_numpy(zero_copy_only=False)
        b = ((sid.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
             >> np.uint64(17)) % np.uint64(8)
        return t.append_column("bucket", pa.array(b.astype(np.int32)))

    out_schema = pa.schema(
        [
            ("series_id", pa.uint64()),
            ("window_ts", pa.int64()),
            *[(c, pa.float64()) for c in value_cols],
        ]
    )

    def encode_decode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.select(["series_id", "window_ts", *value_cols]).to_pandas()
        chunks = chunk_series(df, [], value_cols)
        outs = []
        for _, row in chunks.iterrows():
            pts_df = decode_chunk(row.to_dict(), value_cols)
            pts_df.insert(0, "series_id", row["series_id"])
            outs.append(pts_df)
        res = pd.concat(outs, ignore_index=True)
        return pa.Table.from_pandas(res, preserve_index=False).cast(out_schema)

    sm = hash_exchange(
        pts.map_batches(tag, batch_format="pyarrow"), "bucket", 8, encode_decode
    )
    df = sm.to_pandas().merge(label_df, on="series_id", sort=False)
    out = df[["window_ts", "event_type", "sum", "count", "min", "max"]].copy()
    out.columns = [
        "window_ts", "event_type", "sum_value", "n", "min_value", "max_value"
    ]
    out["sum_value"] = out["sum_value"].round(6)
    out["n"] = np.rint(out["n"].to_numpy()).astype(np.int64)
    return out.sort_values(["window_ts", "event_type"]).reset_index(drop=True)


def q_first_last_1h(sf_dir: str) -> pd.DataFrame:
    """first/last value per (1h window, event_type) by event time — the
    last_over_time / first_over_time kernels (incl. pq's Q7 'last is the
    oldest' quirk is exposed via pq_last)."""
    df = rollup_events(sf_dir, HOUR_MS).to_pandas()
    out = df[["window_ts", "event_type", "first_v", "last_v"]].copy()
    out.columns = ["window_ts", "event_type", "first_value", "last_value"]
    # pq-compat last_over_time (reference Q7: chronologically oldest)
    out["pq_last_value"] = df["first_v"].to_numpy()
    return out.sort_values(["window_ts", "event_type"]).reset_index(drop=True)


def q_rate_1h(sf_dir: str) -> pd.DataFrame:
    """PromQL-style per-second delta over each 1h window:
    (last - first) / 3600.  The reference only parses `rate`
    (README.md:194); semantics here are the (last-first)/window form,
    validated against the SQL oracle."""
    df = rollup_events(sf_dir, HOUR_MS).to_pandas()
    out = df[["window_ts", "event_type"]].copy()
    out["rate_per_s"] = ((df["last_v"] - df["first_v"]) / 3600.0).round(6)
    return out.sort_values(["window_ts", "event_type"]).reset_index(drop=True)


ORACLES = {
    "events_rollup_1m": """
        SELECT (epoch_ms(ts) // 60000) * 60000 AS window_ts,
               event_type,
               ROUND(SUM(value), 6) AS sum_value,
               COUNT(*) AS n,
               MIN(value) AS min_value,
               MAX(value) AS max_value,
               ROUND(SUM(value) / COUNT(*), 6) AS avg_value
        FROM events
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    "events_rollup_1h_cascade": """
        SELECT (epoch_ms(ts) // 3600000) * 3600000 AS window_ts,
               event_type,
               ROUND(SUM(value), 6) AS sum_value,
               COUNT(*) AS n,
               MIN(value) AS min_value,
               MAX(value) AS max_value
        FROM events
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    # identical to the cascade oracle — the engine side differs only by
    # the bit-exact Gorilla encode→decode round trip in the exchange
    "events_rollup_1h_gorilla": """
        SELECT (epoch_ms(ts) // 3600000) * 3600000 AS window_ts,
               event_type,
               ROUND(SUM(value), 6) AS sum_value,
               COUNT(*) AS n,
               MIN(value) AS min_value,
               MAX(value) AS max_value
        FROM events
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    "events_first_last_1h": """
        SELECT (epoch_ms(ts) // 3600000) * 3600000 AS window_ts,
               event_type,
               arg_min(value, ts) AS first_value,
               arg_max(value, ts) AS last_value,
               arg_min(value, ts) AS pq_last_value
        FROM events
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    "events_rate_1h": """
        SELECT (epoch_ms(ts) // 3600000) * 3600000 AS window_ts,
               event_type,
               ROUND((arg_max(value, ts) - arg_min(value, ts)) / 3600.0, 6) AS rate_per_s
        FROM events
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
}

QUERIES = {
    "events_rollup_1m": q_rollup_1m,
    "events_rollup_1h_cascade": q_rollup_1h_cascade,
    "events_rollup_1h_gorilla": q_rollup_1h_gorilla,
    "events_first_last_1h": q_first_last_1h,
    "events_rate_1h": q_rate_1h,
}


def finish_dense(dense_ds, sf_dir: str, value_cols: list[str],
                 query: str, sink_dir: str | None):
    """Shared tail of the dense gap-fill family (gapfill/interp/locf).

    sink_dir=None: the driver-contract DataFrame (label merge + sort) —
    correct at test scale only.  sink_dir given: the dense Dataset
    streams through a vectorized label-attach map straight into a
    partitioned parquet sink with a manifest (pipelines/sinks.py) and
    only a summary dict returns — the 100x path, no driver
    materialization of the spine (VERDICT r4 #4)."""
    label_df = _event_type_map(sf_dir)
    if sink_dir is None:
        out = dense_ds.to_pandas().merge(label_df, on="series_id", sort=False)
        return (
            out[["window_ts", "event_type", *value_cols]]
            .sort_values(["event_type", "window_ts"])
            .reset_index(drop=True)
        )
    import pyarrow as pa2

    from .sinks import sink_dataset

    order = np.argsort(label_df["series_id"].to_numpy())
    sids = label_df["series_id"].to_numpy(dtype=np.uint64)[order]
    ets = label_df["event_type"].to_numpy(dtype=object)[order]

    def attach(t: pa2.Table) -> pa2.Table:
        if t.num_rows == 0:
            return pa2.table(
                {
                    "window_ts": pa2.array([], type=pa2.int64()),
                    "event_type": pa2.array([], type=pa2.string()),
                    **{c: t[c] for c in value_cols},
                }
            )
        sid = t["series_id"].combine_chunks().to_numpy(zero_copy_only=False)
        idx = np.searchsorted(sids, sid)
        return pa2.table(
            {
                "window_ts": t["window_ts"],
                "event_type": pa2.array(ets[idx], type=pa2.string()),
                **{c: t[c] for c in value_cols},
            }
        )

    return sink_dataset(
        dense_ds.map_batches(attach, batch_format="pyarrow"),
        sink_dir, input_path=sf_dir, query=query,
    )


def q_gapfill_1m(sf_dir: str, sink_dir: str | None = None) -> pd.DataFrame:
    """Dense per-event_type 1m spine with explicit staleness markers —
    pq's empty-tick gap-fill semantic (SURVEY.md Q3) as a table: every
    window between a series' first and last window appears, absent ones
    with n=0 and NULL sum (the oracle builds the same spine with
    generate_series + LEFT JOIN).

    The densification is FUSED into the rollup's own exchange (one
    shuffle total): points bucket by hash(series_id) — co-locating each
    series' windows — and the reduce runs combine + a single vectorized
    spine scatter (per-series segment boundaries + grid-position
    arithmetic, no per-series Python loop); the driver only collects
    the final dense table."""
    from ..stages.rollup import rollup_numeric

    def fill(out: dict) -> pa.Table:
        # combined columns arrive sorted by (series_id, window_ts)
        sid = out["series_id"]
        wts = out["window_ts"]
        if len(sid) == 0:
            return pa.table(
                {
                    "series_id": pa.array([], type=pa.uint64()),
                    "window_ts": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                    "sum_value": pa.array([], type=pa.float64()),
                    "is_gap": pa.array([], type=pa.bool_()),
                }
            )
        sm, cnt = out["sum"], out["count"].astype(np.int64)
        starts = np.concatenate(([0], np.nonzero(sid[1:] != sid[:-1])[0] + 1))
        ends = np.concatenate((starts[1:], [len(sid)]))
        lo, hi = wts[starts], wts[ends - 1]
        nw = (hi - lo) // MINUTE_MS + 1  # dense windows per series
        seg_start = np.concatenate(([0], np.cumsum(nw)[:-1]))
        total = int(nw.sum())
        within = np.arange(total, dtype=np.int64) - np.repeat(seg_start, nw)
        dense_sid = np.repeat(sid[starts], nw)
        dense_ts = np.repeat(lo, nw) + within * MINUTE_MS
        # scatter observed windows into their dense spine positions —
        # window_ts are grid floors, so position = (ts - lo) / step
        series_idx = np.repeat(np.arange(len(starts)), ends - starts)
        pos = seg_start[series_idx] + (wts - lo[series_idx]) // MINUTE_MS
        n = np.zeros(total, dtype=np.int64)
        n[pos] = cnt
        # COALESCE on both sides: NaN vs SQL NULL would hash differently
        sv = np.zeros(total, dtype=np.float64)
        sv[pos] = np.round(sm, 6)
        gap = np.ones(total, dtype=bool)
        gap[pos] = False
        return pa.table(
            {
                "series_id": pa.array(dense_sid, type=pa.uint64()),
                "window_ts": pa.array(dense_ts),
                "n": pa.array(n),
                "sum_value": pa.array(sv),
                "is_gap": pa.array(gap),
            }
        )

    samples = read_events(sf_dir).map_batches(_to_samples, batch_format="pyarrow")
    dense_ds = rollup_numeric(
        samples, MINUTE_MS,
        num_buckets=buckets_for_table(sf_dir, "events"),
        key="series", post_reduce=fill
    )
    return finish_dense(
        dense_ds, sf_dir, ["n", "sum_value", "is_gap"],
        "events_gapfill_1m", sink_dir,
    )


def q_props_k_by_event(sf_dir: str, use_registry_decoder: bool = False) -> pd.DataFrame:
    """JSON property extraction over the events ``props`` column,
    aggregating avg/count of ``k`` per event_type.

    Default path: Arrow-native field extraction — ``pc.extract_regex``
    pulls the numeric ``k`` value out of every row in one vectorized C
    pass and ``pa.Table.group_by`` computes the per-batch partials,
    zero-copy pyarrow throughout.  ``use_registry_decoder=True`` runs
    the reference-parity path instead: the registry's per-line JSON
    decoder (the reference's decode loop, src/parse/decoding/json.rs)
    in an actor-pool stage — kept for nested/stringify semantics the
    regex fast path doesn't cover; a pytest asserts both paths agree."""
    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"],
        override_num_blocks=small_input_blocks(f"{sf_dir}/events.parquet"),
    )

    if use_registry_decoder:
        from ..registry import get_decoder

        class PropsDecode:
            def __init__(self):
                self.decode = get_decoder("json")()

            def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
                ks = np.fromiter(
                    (float(self.decode(p.encode())["k"]) for p in df["props"]),
                    dtype=np.float64,
                    count=len(df),
                )
                out = (
                    pd.DataFrame({"event_type": df["event_type"], "k": ks})
                    .groupby("event_type", sort=False)["k"]
                    .agg(s="sum", n="size")
                    .reset_index()
                )
                return out

        partial_ds = ds.map_batches(
            PropsDecode, batch_format="pandas", batch_size=4096, concurrency=2
        )
    else:

        def extract_k(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table(
                    {
                        "event_type": pa.array([], type=pa.string()),
                        "s": pa.array([], type=pa.float64()),
                        "n": pa.array([], type=pa.int64()),
                    }
                )
            m = pc.extract_regex(
                t["props"].combine_chunks(),
                pattern=r'"k"\s*:\s*(?P<k>-?[0-9][0-9.eE+-]*)',
            )
            k = pc.cast(pc.struct_field(m, "k"), pa.float64())
            g = (
                pa.table({"event_type": t["event_type"], "k": k})
                .group_by("event_type")
                .aggregate([("k", "sum"), ("k", "count")])
            )
            return pa.table(
                {
                    "event_type": g["event_type"],
                    "s": g["k_sum"],
                    "n": pc.cast(g["k_count"], pa.int64()),
                }
            )

        partial_ds = ds.map_batches(extract_k, batch_format="pyarrow")

    partials = partial_ds.to_pandas()
    g = partials.groupby("event_type", sort=True).agg(
        s=("s", "sum"), n=("n", "sum")
    )
    out = pd.DataFrame(
        {
            "event_type": g.index,
            "avg_k": (g["s"] / g["n"]).round(6).to_numpy(),
            "n": g["n"].astype(np.int64).to_numpy(),
        }
    )
    return out.sort_values("event_type").reset_index(drop=True)


QUERIES["events_props_k"] = q_props_k_by_event
ORACLES["events_props_k"] = """
    SELECT event_type,
           ROUND(AVG(CAST(json_extract(props, '$.k') AS DOUBLE)), 6) AS avg_k,
           COUNT(*) AS n
    FROM events GROUP BY event_type ORDER BY event_type
"""


ORACLES["events_gapfill_1m"] = """
    WITH w AS (
        SELECT (epoch_ms(ts) // 60000) * 60000 AS window_ts, event_type,
               ROUND(SUM(value), 6) AS sum_value, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT event_type, MIN(window_ts) AS lo, MAX(window_ts) AS hi
        FROM w GROUP BY event_type
    ),
    spine AS (
        SELECT b.event_type, unnest(generate_series(b.lo, b.hi, 60000)) AS window_ts
        FROM bounds b
    )
    SELECT s.window_ts, s.event_type,
           COALESCE(w.n, 0) AS n,
           COALESCE(w.sum_value, 0) AS sum_value,
           w.n IS NULL AS is_gap
    FROM spine s LEFT JOIN w USING (event_type, window_ts)
    ORDER BY s.event_type, s.window_ts
"""
QUERIES["events_gapfill_1m"] = q_gapfill_1m


def q_hour_profile(sf_dir: str) -> pd.DataFrame:
    """Hour-of-day activity profile per event_type — the distributed
    form of the engine's time-component extension family (hour(),
    engine.py _TIME_FNS).  Plan: column-pruned read → per-batch Arrow
    partial (pc.hour + group_by collapses each block to ≤24×|types|
    rows) → tiny driver fold.  No exchange: the group domain is fixed
    (24 × |event types|) regardless of corpus size, so at 100 TB this
    stays a pure map-side combine."""
    ds = read_events(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        keyed = pa.table(
            {
                "hour": pc.cast(pc.hour(t["ts"]), pa.int64()),
                "event_type": t["event_type"],
                "value": pc.cast(t["value"], pa.float64()),
            }
        )
        return keyed.group_by(["hour", "event_type"]).aggregate(
            [("value", "sum"), ("value", "count")]
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = (
        parts.groupby(["hour", "event_type"], as_index=False)
        .sum(numeric_only=True)
        .sort_values(["hour", "event_type"])
        .reset_index(drop=True)
    )
    return pd.DataFrame(
        {
            "hour": g["hour"].astype(np.int64),
            "event_type": g["event_type"],
            "n_events": g["value_count"].to_numpy().astype(np.int64),
            "sum_value": g["value_sum"].round(6),
            "avg_value": (g["value_sum"] / g["value_count"]).round(6),
        }
    )


ORACLES["events_hour_profile"] = """
    SELECT EXTRACT(hour FROM ts)::BIGINT AS hour,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 6) AS sum_value,
           ROUND(SUM(value) / COUNT(*), 6) AS avg_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
"""
QUERIES["events_hour_profile"] = q_hour_profile
