"""Scale-adaptive exchange sizing (VERDICT r4 #1).

Bucket counts used to be hard-coded per pipeline (8/16/64): correct at
sf0.1, but nothing grew them with input size, and each bucket is reduced
by one gather task — at 100x the per-bucket reduce would be the first
OOM.  This module derives ``num_buckets`` from cheap parquet *metadata*
estimates (footer row counts; a few sampled row groups for list-column
expansion — never a full scan), so the same pipeline code sizes itself
at sf0.01 and at the 10^12-row corpus of the north rule.

The companion change is the two-level tree gather in
``stages/exchange.py`` (``combine_fn``/``gather_fanin``): when a bucket
has many split parts, intermediate combine tasks collapse duplicate keys
level by level so the final reduce never concatenates the whole raw
bucket in one task.

Sizing rule: ``num_buckets = clamp(ceil(est_reduce_rows /
rows_per_bucket), floor, MAX_BUCKETS)`` where ``est_reduce_rows`` is the
pre-combine row estimate entering the exchange.  At the test scales
(sf0.01/0.1: 10k-100k events, 155M bench samples) this reproduces the
previously hard-coded 8/16/64 exactly, so goldens and bench
characteristics are unchanged; growth starts roughly two orders of
magnitude above sf0.1.
"""

from __future__ import annotations

import functools
import math
import os

# A gather task owns one bucket: its input is the bucket's pre-combined
# partial rows.  ~2M wide partial rows ~= 160 MB arrow — comfortable for
# a worker heap with concurrent buckets in flight.
ROWS_PER_BUCKET = 2_000_000
MIN_BUCKETS = 8
MAX_BUCKETS = 4096


def suggest_buckets(
    est_rows: float | int | None,
    *,
    rows_per_bucket: int = ROWS_PER_BUCKET,
    min_buckets: int = MIN_BUCKETS,
    max_buckets: int = MAX_BUCKETS,
) -> int:
    """Bucket count for an exchange whose reduce side sees ``est_rows``.

    Unknown/zero estimates fall back to ``min_buckets`` (the historical
    hard-coded value at test scale)."""
    if not est_rows or est_rows <= 0:
        return min_buckets
    return int(
        min(max_buckets, max(min_buckets, math.ceil(est_rows / rows_per_bucket)))
    )


@functools.lru_cache(maxsize=512)
def parquet_rows(path: str) -> int:
    """Row count of a parquet file/directory from footer metadata only.

    ``pyarrow.dataset.count_rows`` answers pure-count queries from
    row-group statistics without scanning data pages, so this is O(#files)
    metadata reads — safe to call per query (and memoized anyway)."""
    import pyarrow.dataset as pads

    try:
        return int(pads.dataset(path, format="parquet").count_rows())
    except (OSError, ValueError):
        return 0


@functools.lru_cache(maxsize=512)
def sampled_mean(path: str, col: str, *, sample_row_groups: int = 2) -> float:
    """Mean of a numeric column estimated from the first few row groups
    of the first file — the expansion-factor probe for token corpora
    (mean ``n_tok`` x footer row count ~= decoded sample count) without
    scanning the column at scale."""
    import pyarrow.parquet as papq

    try:
        if os.path.isdir(path):
            files = sorted(
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith(".parquet")
            )
            if not files:
                return 0.0
            path = files[0]
        pf = papq.ParquetFile(path)
        n = min(sample_row_groups, pf.metadata.num_row_groups)
        if n == 0:
            return 0.0
        t = pf.read_row_groups(list(range(n)), columns=[col])
        if t.num_rows == 0:
            return 0.0
        import pyarrow.compute as pc

        return float(pc.mean(t[col]).as_py() or 0.0)
    except (OSError, ValueError, KeyError):
        return 0.0


def buckets_for_table(
    sf_dir: str,
    table: str,
    *,
    expansion: float = 1.0,
    rows_per_bucket: int = ROWS_PER_BUCKET,
    min_buckets: int = MIN_BUCKETS,
) -> int:
    """Adaptive bucket count for an exchange fed by ``sf_dir/table.parquet``
    (row estimate from the parquet footer x ``expansion`` for stages that
    explode rows before the exchange)."""
    rows = parquet_rows(os.path.join(sf_dir, f"{table}.parquet"))
    return suggest_buckets(
        rows * expansion,
        rows_per_bucket=rows_per_bucket,
        min_buckets=min_buckets,
    )


def estimate_corpus_samples(corpus_path: str, *, len_col: str = "n_tok") -> int:
    """Decoded-sample estimate for a pre-tokenized corpus: footer row
    count x sampled mean tokens-per-doc."""
    rows = parquet_rows(corpus_path)
    if rows == 0:
        return 0
    mean_len = sampled_mean(corpus_path, len_col)
    return int(rows * (mean_len if mean_len > 0 else 1.0))


def cascade_buckets(
    corpus_path: str,
    *,
    samples_per_bucket: int = 96_000_000,
    max_buckets: int = MAX_BUCKETS,
) -> int:
    """Bucket count for the flagship cascade exchange.

    Floor: ``max(32, 2 x cluster CPUs)`` — the CPU-matched value the
    bench always used; growth: one bucket per ~96M raw samples.  The
    threshold is a measured trade, not a guess: bucket counts above the
    CPU floor cost real wall time (39 vs 32 buckets = +11% on the
    16-core 927M-sample leg — more shuffle objects, smaller gathers),
    while the memory bound they protect binds much later — the
    split-task narrow pre-combine collapses ~17x at window saturation,
    so at 96M samples/bucket a gather concatenates ~5.6M combined
    narrow rows (~125 MB), comfortable for a worker heap.  Growth
    therefore starts only past ~6B samples at 32 CPUs, exactly where
    the per-bucket reduce would otherwise outgrow the heap."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 32)) if ray.is_initialized() else 32
    floor = max(32, 2 * cpus)
    est = estimate_corpus_samples(corpus_path)
    return int(
        min(max_buckets, max(floor, math.ceil(est / samples_per_bucket)))
    )


@functools.lru_cache(maxsize=512)
def parquet_col_range(path: str, col: str) -> tuple[int, int]:
    """(min, max) of a column from parquet row-group statistics only —
    no data pages touched.  Returns (0, -1) when stats are unavailable."""
    import pyarrow.parquet as papq

    lo, hi = None, None
    try:
        files = (
            sorted(
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith(".parquet")
            )
            if os.path.isdir(path)
            else [path]
        )
        for f in files:
            md = papq.ParquetFile(f).metadata
            ci = {md.schema.column(i).name: i for i in range(md.num_columns)}
            if col not in ci:
                return (0, -1)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci[col]).statistics
                if st is None or not st.has_min_max:
                    return (0, -1)
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
    except (OSError, ValueError, KeyError):
        return (0, -1)
    if lo is None:
        return (0, -1)
    return (int(lo), int(hi))


def parquet_equidepth_bounds(path: str, col: str, num_ranges: int):
    """Equi-DEPTH interior range boundaries for ``col`` from row-group
    statistics only (no data pages): cuts the value space so each range
    holds ~equal ROWS even when values are sparse or clustered, at
    row-group granularity.  Returns an ascending int64 array of at most
    ``num_ranges - 1`` boundaries (range i = values in
    (bounds[i-1], bounds[i]]), or None when stats are unavailable.

    Row groups are assumed mostly value-disjoint (the common
    sorted-write layout); overlapping groups only degrade balance,
    never correctness — any monotone boundary set partitions the value
    space completely."""
    import numpy as np
    import pyarrow.parquet as papq

    groups: list[tuple[int, int, int]] = []  # (min, max, rows)
    try:
        files = (
            sorted(
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith(".parquet")
            )
            if os.path.isdir(path)
            else [path]
        )
        for f in files:
            md = papq.ParquetFile(f).metadata
            ci = {md.schema.column(i).name: i for i in range(md.num_columns)}
            if col not in ci:
                return None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci[col]).statistics
                if st is None or not st.has_min_max:
                    return None
                groups.append(
                    (int(st.min), int(st.max), md.row_group(rg).num_rows)
                )
    except (OSError, ValueError, KeyError):
        return None
    if not groups or num_ranges <= 1:
        return np.array([], dtype=np.int64) if groups else None
    groups.sort()
    total = sum(g[2] for g in groups)
    target = total / num_ranges
    bounds: list[int] = []
    acc = 0.0
    next_cut = target
    for mn, mx, rows in groups:
        acc += rows
        while acc >= next_cut and len(bounds) < num_ranges - 1:
            bounds.append(mx)
            next_cut += target
    out = np.unique(np.asarray(bounds, dtype=np.int64))
    return out
