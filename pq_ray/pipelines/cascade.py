"""The flagship pipeline: token corpus → raw→1m→1h→1d rollup cascade.

Physical plan — ONE shuffle for all fine tiers, everything fused:

    read_parquet(corpus)                 column-pruned, 1 block per file
      → map_batches(decode+bucket)       ONE fused map op: tokens →
                                         per-(series, 1s-window) narrow
                                         partials (sort-free doc-aligned
                                         kernel, no per-sample arrays) +
                                         the exchange bucket key
      → split tasks (blocks grouped, narrow pre-combine inside) — the
        tree combine that collapses duplicate (series, window) rows
        before anything hits the wire
      → fused gathers: combine in the narrow domain → widen → cascade
        1s→1m→1h by re-aggregating the mergeable partial struct (exact —
        tested against direct-from-raw) → attach labels (broadcast
        series_id→labels table) → write one parquet file per tier per
        bucket (hive layout tier_ms=T/part-<bucket>.parquet)
    + phase 2: the coarsest tier (1d) from the top fine tier's small
      keep tables (a second, tiny exchange — avoids coarse-window skew)
    + Gorilla chunks per (series, tier) fed from the gathers' returned
      keep tables (no parquet read-back); gap sidecars per tier.

Why fused: every separate Ray Data op costs a per-block executor
round-trip and every separate job seconds of fixed cost; the fused plan
pays ONE shuffle whose key is reused by every fine tier, and the
per-bucket work is bounded (a bucket = series x coarse-window slices).
The tier-by-tier path (incremental retention reruns) remains available
via ``pq_ray.stages.rollup.cascade``.

Checkpointing: each tier's dir gets a ``_MANIFEST.json`` (corpus
fingerprint, per-file row counts, wall time).  Fine-tier manifests
publish right after phase 1, so a rerun skips completed work at two
granularities: all-complete → no-op; fine-complete → rebuild only the
coarse tier/chunks/gaps from disk without re-decoding
(tests/test_cascade_pipeline.py, byte-identical).
"""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from ..stages.decode import DecodeToPartials, series_code_lut, series_label_table
from ..stages.gapfill import global_gaps_table
from ..stages.rollup import (
    AGG_COLS,
    DEFAULT_LABEL_COLS,
    np_combine_partials,
    window_floor,
)
from ..state import manifest as mf
from ..state.gorilla import chunk_series

DEFAULT_TIERS = [1000, 60_000, 3_600_000, 86_400_000]

NUMERIC_COLS = ["series_id", "window_ts", *AGG_COLS]
_PHI = np.uint64(0x9E3779B97F4A7C15)


def tier_dir(out_dir: str, tier_ms: int) -> str:
    return os.path.join(out_dir, "points", f"tier_ms={tier_ms}")


def chunks_dir(out_dir: str, tier_ms: int) -> str:
    return os.path.join(out_dir, "chunks", f"tier_ms={tier_ms}")


def _narrow_bucket_fn(span: int, num_buckets: int):
    """Bucket assignment for the narrow exchange schema: same
    (series, span-window) partitioning, computed from (code, widx)."""
    import pyarrow as pa

    from ..model import EPOCH0_MS

    span_s = span // 1000
    # Bucket on the ABSOLUTE span-window (EPOCH0 offset added back), so
    # the key agrees with the reduce's window_floor even for spans that
    # don't divide EPOCH0; widx alone would straddle one coarse window
    # across two buckets in that case.
    epoch0_s = EPOCH0_MS // 1000
    assert EPOCH0_MS % 1000 == 0

    def add_bucket(t: pa.Table) -> pa.Table:
        code = t["code"].combine_chunks().to_numpy(zero_copy_only=False)
        widx = t["widx"].combine_chunks().to_numpy(zero_copy_only=False)
        span_w = (epoch0_s + widx.astype(np.uint64)) // np.uint64(span_s)
        h = (code.astype(np.uint64) + np.uint64(1)) * _PHI ^ (span_w * _PHI)
        bucket = ((h >> np.uint64(17)) % np.uint64(num_buckets)).astype(np.int32)
        return t.append_column("bucket", pa.array(bucket))

    return add_bucket


def _cascade_bucket_fn(span: int, num_buckets: int):
    """Arrow-in/Arrow-out bucket assignment.

    Staying ``batch_format="pyarrow"`` here matters: blocks entering the
    shuffle serialize zero-copy; a pandas block at this point makes the
    exchange pickle DataFrames and costs >2x the whole pipeline
    (measured: 17s → 7s on the 31M-sample bench when this op switched
    from pandas to arrow)."""
    import pyarrow as pa

    def add_bucket(t: pa.Table) -> pa.Table:
        sid = t["series_id"].combine_chunks().to_numpy(zero_copy_only=False)
        w = t["window_ts"].combine_chunks().to_numpy(zero_copy_only=False)
        h = sid.astype(np.uint64) ^ ((w // span).astype(np.uint64) * _PHI)
        bucket = ((h >> np.uint64(17)) % np.uint64(num_buckets)).astype(np.int32)
        return t.append_column("bucket", pa.array(bucket))

    return add_bucket


def _cascade_group_fn(tiers: list[int]):
    def cascade_bucket(df: pd.DataFrame) -> pd.DataFrame:
        cols = {c: df[c].to_numpy() for c in NUMERIC_COLS}
        outs = []
        prev = np_combine_partials(cols)
        out0 = pd.DataFrame(prev)
        out0["tier_ms"] = tiers[0]
        outs.append(out0)
        for tier in tiers[1:]:
            cur = dict(prev)
            cur["window_ts"] = window_floor(cur["window_ts"], tier)
            prev = np_combine_partials(cur)
            o = pd.DataFrame(prev)
            o["tier_ms"] = tier
            outs.append(o)
        return pd.concat(outs, ignore_index=True)

    return cascade_bucket


def widen_narrow_partials(t: "pa.Table") -> dict:
    """Inverse of DecodeToPartials._narrow_table: reconstruct the wide
    f64/i64 partial columns from the compact wire schema."""
    from ..fixtures import STEP_MS
    from ..model import EPOCH0_MS

    code = t["code"].combine_chunks().to_numpy(zero_copy_only=False)
    widx = t["widx"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
    window = EPOCH0_MS + widx * 1000
    fkey = t["fkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
    lkey = t["lkey"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
    mask = (1 << 17) - 1
    lut = series_code_lut()
    return {
        "series_id": lut[code],
        "window_ts": window,
        "sum": t["sum"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64),
        "count": t["count"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64),
        "min": t["min"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64),
        "max": t["max"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64),
        "first_ts": window + (fkey >> 17) * STEP_MS,
        "first_v": (fkey & mask).astype(np.float64),
        "last_ts": window + (lkey >> 17) * STEP_MS,
        "last_v": (lkey & mask).astype(np.float64),
    }


def narrow_precombine(t: "pa.Table") -> "pa.Table":
    """Collapse duplicate (code, widx) narrow rows — the split-task tree
    pre-combine.  At window saturation the decode stream carries many
    partial rows per distinct (series, window) (≈17x at 3M docs over a
    1-day span); combining inside the split task shrinks the wire volume
    by that factor for one extra packed-key argsort of the grouped
    blocks.  Falls back to the input unchanged if the narrow dtype
    bounds would overflow (count >= 2^16 or sum >= 2^32)."""
    import pyarrow as pa

    if t.num_rows == 0:
        return t
    cols = {
        c: t[c].combine_chunks().to_numpy(zero_copy_only=False)
        for c in ("code", "widx", "sum", "count", "min", "max", "fkey", "lkey")
    }
    bucket = t["bucket"].combine_chunks().to_numpy(zero_copy_only=False)
    key = (
        (cols["code"].astype(np.uint64) << np.uint64(55))
        | (cols["widx"].astype(np.uint64) << np.uint64(29))
        | cols["fkey"].astype(np.uint64)
    )
    order = np.argsort(key)
    skey = key[order]
    g = skey >> np.uint64(29)
    boundary = np.nonzero(g[1:] != g[:-1])[0] + 1
    starts = np.concatenate(([0], boundary))
    if len(starts) == len(key):  # nothing to combine
        return t
    s64 = np.add.reduceat(cols["sum"][order].astype(np.int64), starts)
    c64 = np.add.reduceat(cols["count"][order].astype(np.int64), starts)
    if c64.max() >= (1 << 16) or s64.max() >= (1 << 32):
        return t
    gk = g[starts]
    return pa.table(
        {
            "code": pa.array((gk >> np.uint64(26)).astype(np.uint8)),
            "widx": pa.array((gk & np.uint64((1 << 26) - 1)).astype(np.uint32)),
            "sum": pa.array(s64.astype(np.uint32)),
            "count": pa.array(c64.astype(np.uint16)),
            "min": pa.array(np.minimum.reduceat(cols["min"][order], starts)),
            "max": pa.array(np.maximum.reduceat(cols["max"][order], starts)),
            "fkey": pa.array((skey[starts] & np.uint64((1 << 29) - 1)).astype(np.uint32)),
            "lkey": pa.array(np.maximum.reduceat(cols["lkey"][order], starts)),
            "bucket": pa.array(bucket[order][starts]),
        }
    )


def wide_precombine(t: "pa.Table") -> "pa.Table":
    """Associative tree-gather combine for the WIDE exchange schema:
    collapse duplicate (series_id, window_ts) partial rows.  Exact —
    np_combine_partials merges the mergeable struct — and re-combinable,
    so intermediate gather levels can apply it repeatedly."""
    import pyarrow as pa

    if t.num_rows == 0:
        return t.select([c for c in NUMERIC_COLS if c in t.schema.names])
    cols = {
        c: t[c].combine_chunks().to_numpy(zero_copy_only=False)
        for c in NUMERIC_COLS
    }
    out = np_combine_partials(cols)
    tbl = {c: pa.array(out[c]) for c in NUMERIC_COLS}
    tbl["series_id"] = pa.array(out["series_id"], type=pa.uint64())
    return pa.table(tbl)


def _cascade_reduce_fn(tiers: list[int], narrow: bool = False, first_rewindow: bool = False):
    """Arrow-in/Arrow-out per-bucket reduce for the hash exchange:
    combine 1s partials, then derive every coarser tier in-memory."""
    import pyarrow as pa

    def reduce_fn(t: pa.Table) -> pa.Table:
        if narrow and t.num_rows > 0:
            # combine in the narrow domain FIRST (one packed-key argsort)
            # so the widen + wide lexsort run on the ~rows/duplication
            # combined stream, not the full bucket
            if "bucket" not in t.schema.names:
                t = t.append_column(
                    "bucket", pa.array(np.zeros(t.num_rows, dtype=np.int32))
                )
            t = narrow_precombine(t)
            cols = widen_narrow_partials(t)
            t = pa.table({c: pa.array(v) for c, v in cols.items()})
        if t.num_rows == 0:
            f64, i64 = pa.float64(), pa.int64()
            return pa.table(
                {
                    "series_id": pa.array([], type=pa.uint64()),
                    "window_ts": pa.array([], type=i64),
                    "sum": pa.array([], type=f64),
                    "count": pa.array([], type=i64),
                    "min": pa.array([], type=f64),
                    "max": pa.array([], type=f64),
                    "first_ts": pa.array([], type=i64),
                    "first_v": pa.array([], type=f64),
                    "last_ts": pa.array([], type=i64),
                    "last_v": pa.array([], type=f64),
                    "tier_ms": pa.array([], type=i64),
                }
            )
        cols = {
            c: t[c].combine_chunks().to_numpy(zero_copy_only=False)
            for c in NUMERIC_COLS
        }
        if first_rewindow:
            cols = dict(cols)
            cols["window_ts"] = window_floor(cols["window_ts"], tiers[0])
        outs = []
        prev = np_combine_partials(cols)
        for i, tier in enumerate(tiers):
            if i > 0:
                cur = dict(prev)
                cur["window_ts"] = window_floor(cur["window_ts"], tier)
                prev = np_combine_partials(cur)
            outs.append(
                pa.table(
                    {
                        **{c: pa.array(prev[c]) for c in NUMERIC_COLS},
                        "tier_ms": pa.array(
                            np.full(len(prev["series_id"]), tier, dtype=np.int64)
                        ),
                    }
                )
            )
        return pa.concat_tables(outs)

    return reduce_fn


def _combine_attach_write_impl(
    reduce_fn, points_root: str, bucket_idx: int, label_df, keep_tiers, raw_tier, *parts
):
    """Fused gather: combine the bucket, attach labels, write one parquet
    file per tier, return (stats dict, small numeric table of
    ``keep_tiers`` rows) — the write overlaps the other buckets' reduces
    and no post-exchange Dataset job ever runs.  Files land in the same
    hive layout (``tier_ms=T/part-<bucket>.parquet``) as write_parquet's
    partition_cols, so manifests/resume are unchanged."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    nonempty = [p for p in parts if p.num_rows]
    block = pa.concat_tables(nonempty) if nonempty else parts[0].slice(0, 0)
    out = reduce_fn(block)  # numeric cols + tier_ms
    df = out.to_pandas().merge(label_df, on="series_id", sort=False)
    rows: dict = {}
    raw_samples = 0
    for tms, g in df.groupby("tier_ms", sort=False):
        tdir = os.path.join(points_root, f"tier_ms={int(tms)}")
        os.makedirs(tdir, exist_ok=True)
        pq.write_table(
            pa.Table.from_pandas(g.drop(columns=["tier_ms"]), preserve_index=False),
            os.path.join(tdir, f"part-{bucket_idx:05d}.parquet"),
        )
        rows[int(tms)] = len(g)
        if int(tms) == raw_tier:
            raw_samples = int(g["count"].sum())
    keep_tiers = [t for t in keep_tiers]
    if keep_tiers and out.num_rows:
        keep = out.filter(
            pc.is_in(out["tier_ms"], value_set=pa.array(keep_tiers, type=pa.int64()))
        )
    else:
        keep = out.slice(0, 0)
    return {"rows": rows, "raw_samples": raw_samples}, keep


_combine_attach_write = ray.remote(num_returns=2)(_combine_attach_write_impl)


def run_cascade(
    corpus_path: str,
    out_dir: str,
    tiers: list[int] | None = None,
    *,
    num_buckets: int | None = None,
    decode_batch_size: int = 8192,
    decode_concurrency: int | tuple | None = None,
    chunk_min_tier_ms: int = 60_000,
    write_gaps: bool = True,
    precombine_rows: int | None = None,
    narrow_exchange: bool = True,
    blocks_per_split: int | None = None,
) -> dict:
    """Run (or resume) the fused cascade. Returns per-tier stats."""
    import duckdb
    import ray

    tiers = sorted(tiers or DEFAULT_TIERS)
    for a, b in zip(tiers, tiers[1:]):
        assert b % a == 0, f"tiers must nest: {b} % {a} != 0"
    os.makedirs(out_dir, exist_ok=True)

    if num_buckets is None:
        # scale-adaptive: CPU-matched floor (unchanged at bench scale),
        # growing ~1 bucket per 24M estimated raw samples from parquet
        # footer metadata + a sampled mean n_tok (stages/sizing.py)
        from ..stages.sizing import cascade_buckets

        num_buckets = cascade_buckets(corpus_path)

    # decode_concurrency=None (default) → task pool with per-worker
    # cached decoder state; an integer opts into an actor pool (only
    # worthwhile when the decoder holds heavyweight state).
    stats: dict = {"tier_rows": {}, "skipped": [], "raw_samples": 0}
    corpus_fp = mf.dir_fingerprint(corpus_path)
    # per-file inventory: the append diff source for incremental refresh
    # (pipelines/refresh.py) — {basename: size} of the corpus files this
    # build consumed
    input_files = mf.input_inventory(corpus_path)

    if all(mf.is_complete(tier_dir(out_dir, t), corpus_fp) for t in tiers):
        for t in tiers:
            m = mf.load(tier_dir(out_dir, t))
            stats["tier_rows"][str(t)] = m["rows_out"]
            stats["skipped"].append(t)
            if t == tiers[0]:
                stats["raw_samples"] = m.get("raw_samples", 0)
        return stats

    # mid-cascade resume: fine-tier manifests publish right after phase 1,
    # so a run that died before the coarse tier / chunk / gap jobs resumes
    # WITHOUT re-decoding the corpus — the coarse tier rebuilds from the
    # written top-fine tier (continuous-aggregate property).
    _fine = tiers if len(tiers) == 1 else tiers[:-1]
    fine_resume = len(tiers) > 1 and all(
        mf.is_complete(tier_dir(out_dir, t), corpus_fp) for t in _fine
    )

    points_root = os.path.join(out_dir, "points")
    import shutil

    if fine_resume:
        shutil.rmtree(tier_dir(out_dir, tiers[-1]), ignore_errors=True)
    else:
        shutil.rmtree(points_root, ignore_errors=True)

    t0 = time.perf_counter()
    from ..stages.decode import decode_partials_task

    # One read block per corpus file: avoids the SplitBlocks stage, which
    # blocks read→decode operator fusion (fusion halves the decode phase:
    # 10.7s → 5.0s at 32 CPUs on the 155M-sample bench).
    n_files = len(
        [f for f in os.listdir(corpus_path) if f.endswith(".parquet")]
    )
    read_kwargs = {"override_num_blocks": n_files} if n_files else {}

    use_narrow = narrow_exchange and tiers[0] == 1000 and not decode_concurrency
    # Two-phase exchange: phase 1 buckets on (series, second-coarsest
    # window) — with single-day data a coarsest-window key would collapse
    # to (series) alone and skew on the hot source; phase 2 derives the
    # coarsest tier(s) from phase 1's already-tiny output.
    fine_tiers = tiers if len(tiers) == 1 else tiers[:-1]
    coarse_tiers = [] if len(tiers) == 1 else tiers[-1:]
    bucket_span = fine_tiers[-1]
    bucket_fn = (
        _narrow_bucket_fn(bucket_span, num_buckets)
        if use_narrow
        else _cascade_bucket_fn(bucket_span, num_buckets)
    )

    if decode_concurrency:
        partials = rd.read_parquet(corpus_path, **read_kwargs).map_batches(
            DecodeToPartials,
            fn_constructor_kwargs={"interval_ms": tiers[0]},
            batch_format="pyarrow",
            batch_size=decode_batch_size,
            concurrency=decode_concurrency,
        )
        bucketed = partials.map_batches(bucket_fn, batch_format="pyarrow")
    else:
        raw_tier = tiers[0]

        # decode + bucket in ONE map op: a separate bucket map_batches
        # costs a full block round-trip through the executor per block
        # (measured: 19.8s -> 12.9s phase-1 at 16 cores when fused)
        def decode_tokens_to_partials(batch):
            return bucket_fn(
                decode_partials_task(batch, interval_ms=raw_tier, narrow=use_narrow)
            )

        bucketed = rd.read_parquet(corpus_path, **read_kwargs).map_batches(
            decode_tokens_to_partials,
            batch_format="pyarrow",
            batch_size=decode_batch_size,
        )
    label_df = series_label_table()

    from ..stages.exchange import hash_exchange

    # Tree pre-combine now lives INSIDE the split tasks
    # (exchange.pre_reduce + narrow_precombine): the earlier map_batches
    # variant re-batched the stream and stalled the streaming executor
    # (measured 14s -> 68s at 1M docs); the split-task variant groups
    # blocks as they arrive with no re-batching.  ``precombine_rows`` is
    # kept for API compatibility and ignored.
    del precombine_rows

    if blocks_per_split is None:
        env_bps = os.environ.get("PQ_RAY_BLOCKS_PER_SPLIT")
        if env_bps is not None:
            blocks_per_split = int(env_bps)
        else:
            # adaptive: group so the split stage still has ~2 waves of
            # tasks per core; more grouping = more pre-combine dedup and
            # fewer shuffle objects (the 4-core leg groups harder, which
            # is exactly the leg that needs less wire traffic)
            import ray as _ray

            cpus = int(_ray.cluster_resources().get("CPU", 32))
            blocks_per_split = int(min(64, max(8, n_files // max(cpus * 2, 1))))
    from ..stages.exchange import split_stream

    chunk_tiers = [t for t in tiers if t >= chunk_min_tier_ms]
    # rows the downstream jobs need back from the gathers: the top fine
    # tier feeds phase 2, chunked fine tiers feed the Gorilla job
    keep_tiers = sorted(
        {t for t in fine_tiers if t in chunk_tiers} | {bucket_span}
    )
    label_ref = ray.put(label_df)
    if fine_resume:
        import pyarrow as pa

        stats["resumed"] = "fine_tiers"
        keep_parts = []
        for t in keep_tiers:
            ds_t = rd.read_parquet(tier_dir(out_dir, t))

            def to_keep(tb: pa.Table, _t=t) -> pa.Table:
                cols = {c: tb[c] for c in NUMERIC_COLS}
                cols["tier_ms"] = pa.array(
                    np.full(tb.num_rows, _t, dtype=np.int64)
                )
                return pa.table(cols)

            keep_parts.append(ds_t.map_batches(to_keep, batch_format="pyarrow"))
        keep_ds = keep_parts[0]
        for p in keep_parts[1:]:
            keep_ds = keep_ds.union(p)
        keep_ds = keep_ds.materialize()
        keep_refs = [
            br for b in keep_ds.iter_internal_ref_bundles() for br in b.block_refs
        ]
        m0 = mf.load(tier_dir(out_dir, tiers[0]))
        raw_samples = int(m0.get("raw_samples", 0))
        bucket_stats = m0.get("exchange_buckets", {})
        stats["skipped"].extend(fine_tiers)
    else:
        split_refs = split_stream(
            bucketed,
            "bucket",
            num_buckets,
            blocks_per_split=blocks_per_split,
            pre_reduce=narrow_precombine if use_narrow else None,
        )
        reduce_fn = _cascade_reduce_fn(fine_tiers, narrow=use_narrow)
        # tree gather (VERDICT r4 #1): past GATHER_FANIN split parts per
        # bucket, intermediate combine tasks collapse duplicate keys
        # (narrow_precombine in the narrow domain, wide_precombine
        # otherwise) so the final fused gather never concatenates the
        # whole raw bucket in one task
        from ..stages.exchange import GATHER_FANIN, tree_combine_parts

        tree_combine = narrow_precombine if use_narrow else wide_precombine
        gathered = []
        for i in range(num_buckets):
            parts = [split_refs[j][i] for j in range(len(split_refs))]
            if len(parts) > GATHER_FANIN:
                parts = tree_combine_parts(parts, tree_combine)
            gathered.append(
                _combine_attach_write.remote(
                    reduce_fn, points_root, i, label_ref, keep_tiers,
                    tiers[0], *parts,
                )
            )
        stat_refs = [g[0] for g in gathered]
        keep_refs = [g[1] for g in gathered]
        bucket_stat_rows = ray.get(stat_refs)  # barrier: all tiers written
        # per-partition metrics: output rows per exchange bucket — skew
        # observability for the manifest (north rule: per-partition
        # lineage + row counts per stage)
        b_rows = [sum(s["rows"].values()) for s in bucket_stat_rows]
        bucket_stats = {
            "num_buckets": num_buckets,
            "rows_min": int(min(b_rows)),
            "rows_max": int(max(b_rows)),
            "rows_mean": round(sum(b_rows) / max(len(b_rows), 1), 1),
            "skew_max_over_mean": round(
                max(b_rows) / max(sum(b_rows) / max(len(b_rows), 1), 1e-9), 3
            ),
        }
        raw_samples = int(sum(s["raw_samples"] for s in bucket_stat_rows))
        # publish fine-tier manifests NOW: the cascade is resumable from
        # this point on (coarse tier / chunks / gaps rebuild from disk)
        for t in fine_tiers:
            tdir = tier_dir(out_dir, t)
            os.makedirs(tdir, exist_ok=True)
            extra: dict = {
                "exchange_buckets": bucket_stats,
                "input_files": input_files,
                "exchange_mode": "narrow" if use_narrow else "wide",
                "tiers": tiers,
            }
            if t == tiers[0]:
                extra["raw_samples"] = raw_samples
            mf.publish(
                tdir,
                tier_ms=t,
                input_path=corpus_path,
                input_fingerprint=corpus_fp,
                rows_in=raw_samples,
                wall_sec=time.perf_counter() - t0,
                extra=extra,
            )
    phases = {"decode_exchange_write": round(time.perf_counter() - t0, 2)}

    if coarse_tiers:
        import pyarrow as pa

        def only_top_fine(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return t.filter(pc.equal(t["tier_ms"], bucket_span)).drop_columns(
                ["tier_ms"]
            )

        coarse_in = rd.from_arrow_refs(keep_refs).map_batches(
            only_top_fine, batch_format="pyarrow"
        )
        nb2 = max(8, num_buckets // 8)
        coarse_splits = split_stream(
            coarse_in.map_batches(
                _cascade_bucket_fn(coarse_tiers[-1], nb2), batch_format="pyarrow"
            ),
            "bucket",
            nb2,
        )
        coarse_reduce = _cascade_reduce_fn(coarse_tiers, first_rewindow=True)
        coarse_keep = [t for t in coarse_tiers if t in chunk_tiers]
        coarse_gathered = [
            _combine_attach_write.remote(
                coarse_reduce, points_root, i, label_ref, coarse_keep, -1,
                *[coarse_splits[j][i] for j in range(len(coarse_splits))],
            )
            for i in range(nb2)
        ]
        ray.get([g[0] for g in coarse_gathered])
        coarse_keep_refs = [g[1] for g in coarse_gathered]
    else:
        coarse_keep_refs = []
    phases["coarse_tiers"] = round(time.perf_counter() - t0 - sum(phases.values()), 2)
    wall = time.perf_counter() - t0
    stats["raw_samples"] = raw_samples
    phases["metrics_count"] = round(time.perf_counter() - t0 - sum(phases.values()), 2)

    # Gorilla chunks: ONE job for every chunked tier, fed from the small
    # keep-tier tables the gathers returned (already in the object
    # store) — no parquet read-back, no per-tier read jobs; labels
    # re-attach inside the encode step from the broadcast label table.
    chunk_rows: dict[int, int] = {}
    if chunk_tiers:
        chunks_root = os.path.join(out_dir, "chunks")
        shutil.rmtree(chunks_root, ignore_errors=True)

        import pyarrow as pa
        import pyarrow.compute as pc

        tier_arr = pa.array(chunk_tiers, type=pa.int64())

        def keep_chunk_tiers(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(t["tier_ms"], value_set=tier_arr))

        tp = rd.from_arrow_refs(list(keep_refs) + list(coarse_keep_refs)).map_batches(
            keep_chunk_tiers, batch_format="pyarrow"
        )

        chunk_buckets = max(8, num_buckets // 4)

        def add_b(tb):
            import pyarrow as pa

            sid = tb["series_id"].combine_chunks().to_numpy(zero_copy_only=False)
            tms = tb["tier_ms"].combine_chunks().to_numpy(zero_copy_only=False)
            h = sid.astype(np.uint64) ^ (tms.astype(np.uint64) * _PHI)
            b = ((h >> np.uint64(7)) % np.uint64(chunk_buckets)).astype(np.int32)
            return tb.append_column("bucket", pa.array(b))

        def encode_chunk_bucket(tb):
            import pyarrow as pa

            from ..state.gorilla import VALUE_COLS

            # fixed output schema: pandas infers per-bucket dtypes
            # (a uint64×int64 merge upcasts series_id to float64 on
            # some buckets), and Ray's executor warns on RefBundle
            # schema drift — cast every bucket to this one schema
            chunk_schema = pa.schema(
                [
                    ("series_id", pa.uint64()),
                    ("name", pa.string()),
                    ("source", pa.string()),
                    ("shard", pa.int32()),
                    ("t0", pa.int64()),
                    ("n", pa.int64()),
                    ("ts_dod", pa.binary()),
                    *[(f"g_{c}", pa.binary()) for c in VALUE_COLS],
                    ("tier_ms", pa.int64()),
                ]
            )
            if tb.num_rows == 0:
                return chunk_schema.empty_table()
            df = tb.to_pandas().merge(label_df, on="series_id", sort=False)
            outs = []
            for tms, g in df.groupby("tier_ms", sort=False):
                enc = chunk_series(g.drop(columns=["bucket"]), DEFAULT_LABEL_COLS)
                enc["tier_ms"] = tms
                outs.append(enc)
            out = pa.Table.from_pandas(
                pd.concat(outs, ignore_index=True), preserve_index=False
            )
            return out.select(chunk_schema.names).cast(chunk_schema)

        from ..stages.exchange import hash_exchange

        chunks_ds = hash_exchange(
            tp.map_batches(add_b, batch_format="pyarrow"),
            "bucket",
            chunk_buckets,
            encode_chunk_bucket,
        )
        chunks_ds.write_parquet(chunks_root, partition_cols=["tier_ms"])
        for t in chunk_tiers:
            chunk_rows[t] = sum(mf.file_row_counts(chunks_dir(out_dir, t)).values())

    phases["gorilla_chunks"] = round(time.perf_counter() - t0 - sum(phases.values()), 2)
    # gap sidecars + manifests
    gaps_dir = os.path.join(out_dir, "gaps")
    os.makedirs(gaps_dir, exist_ok=True)
    for t in tiers:
        tdir = tier_dir(out_dir, t)
        extra: dict = {}
        if t in chunk_rows:
            extra["chunk_rows"] = chunk_rows[t]
        if write_gaps:
            present = (
                duckdb.sql(
                    f"select distinct window_ts from read_parquet('{tdir}/*.parquet')"
                )
                .df()["window_ts"]
                .to_numpy()
            )
            gaps = global_gaps_table(present, t)
            import pyarrow as pa
            import pyarrow.parquet as pq

            gp = os.path.join(gaps_dir, f"tier={t}.parquet")
            pq.write_table(
                pa.Table.from_pandas(gaps, preserve_index=False), gp + ".tmp"
            )
            os.replace(gp + ".tmp", gp)
            extra["gap_windows"] = len(gaps)
        if t == tiers[0]:
            extra["raw_samples"] = raw_samples
        extra["exchange_buckets"] = bucket_stats
        extra["input_files"] = input_files
        extra["exchange_mode"] = "narrow" if use_narrow else "wide"
        extra["tiers"] = tiers
        m = mf.publish(
            tdir,
            tier_ms=t,
            input_path=corpus_path,
            input_fingerprint=corpus_fp,
            rows_in=raw_samples,
            wall_sec=wall,
            extra=extra,
        )
        stats["tier_rows"][str(t)] = m["rows_out"]

    phases["gaps_manifests"] = round(time.perf_counter() - t0 - sum(phases.values()), 2)
    stats["phases"] = phases
    return stats
