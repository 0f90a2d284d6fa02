"""Explicit hash exchange: the one place we drop to raw Ray tasks.

Ray Data's ``groupby(...).map_groups(...)`` routes through the sort-based
shuffle operator, which on this workload has a multi-second critical
path that does not shrink with CPUs (measured: ~5-7s for 7.7M partial
rows regardless of 8 vs 32 CPUs; the hash-shuffle strategy's aggregator
actors cost even more to start).  The cascade's exchange is a plain
hash partition — no ordering requirement — so we implement the textbook
two-phase shuffle with raw tasks, as sanctioned for cases the Dataset
API can't express efficiently:

  phase 1 (split):   one task per input block → ``num_buckets`` arrow
                     sub-tables (zero-copy ``take``)
  phase 2 (gather):  one task per bucket → concat its sub-tables and
                     apply the per-bucket reduce function

Both phases are embarrassingly parallel; the only synchronization is
the object-store handoff.  The result returns to the Dataset world via
``ray.data.from_arrow_refs`` so downstream stages (label attach,
partitioned write) stay in Ray Data.

Partitioning assumption (documented per the build rules): the reduce
function sees ALL rows of a bucket at once, so a bucket must fit a
worker's heap — callers size ``num_buckets`` accordingly (cascade
buckets are bounded by |series| x |coarsest windows| partial rows),
with ``stages.sizing`` deriving counts from parquet metadata at scale.
When a bucket accumulates many split parts AND the caller provides an
associative ``combine_fn``, the gather grows a tree: intermediate
combine tasks collapse duplicate keys ``gather_fanin`` parts at a time,
so the final reduce concatenates at most ``gather_fanin`` already-
combined tables instead of the whole raw bucket (VERDICT r4 #1).

Which exchanges have a tree combine (and which intentionally don't):
every mergeable-partial reduce (rollup/cascade, the distributed query
selector partials and instant grids), set-union dedups (exact distinct,
new-users, retention), register-max (HLL), count-sums (top-users,
vocab/df), and dedup_exact's (hash -> min doc, count) merge.  Staying
single-level BY DESIGN: sequence-dependent kernels (changes/resets/
quantile_over_time/holt_winters — need the complete chronological
group), joins and pair generators (need complete co-partitioned
groups), the regression exchange (Chan merge order is part of its
bit-exact oracle contract), dedup_keep/curation (emit per-doc rows, so
group completeness is the output), and the quantile/sessions exchanges
(whole-group statistics over raw values).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


@ray.remote
def _split(bucket_col: str, num_buckets: int, pre_reduce, *blocks):
    # Blocks should be Arrow (keep upstream ops batch_format="pyarrow" —
    # pandas blocks cost a conversion here and pickle slowly upstream).
    # Several input blocks may be grouped into one split task
    # (``blocks_per_split``): fewer, larger shuffle objects and shorter
    # gather argument lists — the sub-block concat is zero-copy.
    blocks = [
        b if isinstance(b, pa.Table) else pa.Table.from_pandas(b, preserve_index=False)
        for b in blocks
    ]
    # Ray may pass empty blocks through upstream map UDFs untouched, so
    # an empty block can arrive without the bucket column — emit empty
    # slices (reduce_fn owns the typed-empty case).
    usable = [
        b for b in blocks if b.num_rows > 0 and bucket_col in b.schema.names
    ]
    if not usable:
        empty = blocks[0].slice(0, 0)
        if num_buckets == 1:  # num_returns=1: Ray keeps a tuple intact
            return empty
        return tuple(empty for _ in range(num_buckets))
    block = usable[0] if len(usable) == 1 else pa.concat_tables(usable)
    if pre_reduce is not None:
        # tree pre-combine: collapse duplicate keys across the grouped
        # blocks BEFORE anything hits the wire — the split-task variant
        # avoids the Dataset re-batching stall of a map_batches combine
        block = pre_reduce(block)
    buckets = block[bucket_col].combine_chunks().to_numpy(zero_copy_only=False)
    order = np.argsort(buckets, kind="stable")
    sorted_b = buckets[order]
    bounds = np.searchsorted(sorted_b, np.arange(num_buckets + 1))
    taken = block.take(pa.array(order))
    if num_buckets == 1:  # num_returns=1: Ray keeps a tuple intact
        return taken.slice(bounds[0], bounds[1] - bounds[0])
    return tuple(
        taken.slice(bounds[i], bounds[i + 1] - bounds[i])
        for i in range(num_buckets)
    )


@ray.remote
def _gather(reduce_fn: Callable[[pa.Table], pa.Table], *parts: pa.Table) -> pa.Table:
    nonempty = [p for p in parts if p.num_rows]
    # reduce_fn is also responsible for the empty case (it must emit a
    # correctly-typed empty table so all gather outputs share a schema)
    block = pa.concat_tables(nonempty) if nonempty else parts[0].slice(0, 0)
    return reduce_fn(block)


@ray.remote
def _block_rows(t) -> int:
    return t.num_rows if hasattr(t, "num_rows") else len(t)


def bucket_row_counts(out_refs) -> list[int]:
    """Per-bucket output row counts (tiny metadata tasks over the gather
    results) — the per-partition metrics recorded in tier manifests."""
    return ray.get([_block_rows.remote(r) for r in out_refs])


# Default tree-gather fan-in: a final reduce concatenates at most this
# many part tables.  48 parts x ~worker-block size stays well inside a
# worker heap while keeping the tree one level deep until ~2300 splits.
GATHER_FANIN = 48


def tree_combine_parts(parts: list, combine_fn, fanin: int = GATHER_FANIN) -> list:
    """Collapse a bucket's part list level-by-level with an associative
    ``combine_fn`` (arrow table -> arrow table, duplicate-key-collapsing)
    until at most ``fanin`` parts remain.  Each intermediate task concats
    ``fanin`` parts and combines them, so no single task ever sees the
    whole raw bucket.  Returns the (possibly original) part-ref list for
    the caller's final gather."""
    fanin = max(2, fanin)  # fanin < 2 would never shrink the list
    while len(parts) > fanin:
        parts = [
            _gather.remote(combine_fn, *parts[k : k + fanin])
            for k in range(0, len(parts), fanin)
        ]
    return parts


def hash_exchange(
    ds,
    bucket_col: str,
    num_buckets: int,
    reduce_fn: Callable[[pa.Table], pa.Table],
    return_refs: bool = False,
    blocks_per_split: int = 1,
    pre_reduce: Callable[[pa.Table], pa.Table] | None = None,
    combine_fn: Callable[[pa.Table], pa.Table] | None = None,
    gather_fanin: int | None = None,
):
    """ds (with an int bucket column) → Dataset of per-bucket reduce outputs.

    ``reduce_fn``: arrow table (one complete bucket, bucket column
    included) → arrow table.

    ``combine_fn``: optional ASSOCIATIVE partial combine (same signature
    as reduce_fn, but must emit re-combinable rows — typically the
    reduce minus its finalize step).  When given and a bucket has more
    than ``gather_fanin`` split parts, the gather runs as a tree:
    intermediate combine tasks collapse duplicate keys so the final
    reduce never concatenates the whole raw bucket in one task — the
    100x memory-safety path (VERDICT r4 #1).  Without it the gather
    stays single-level (a tree without key collapse saves no memory).

    Split tasks launch as upstream blocks stream out of the Dataset
    executor (``iter_internal_ref_bundles``), so the map side of the
    exchange overlaps the producing stages; only the gather side has the
    inherent all-splits barrier.

    ``blocks_per_split`` groups several upstream blocks into one split
    task: the shuffle moves ``#blocks/g x num_buckets`` objects instead
    of ``#blocks x num_buckets``, and each gather's argument list shrinks
    by g — the per-object scheduler/object-store overhead is the serial
    residue of the exchange at high block counts.
    """
    split_refs = split_stream(
        ds, bucket_col, num_buckets,
        blocks_per_split=blocks_per_split, pre_reduce=pre_reduce,
    )
    if not split_refs:  # empty upstream: no blocks at all
        out_ds = rd.from_arrow_refs([])
        return (out_ds, []) if return_refs else out_ds
    # module-level GATHER_FANIN is read at call time so tests (and scale
    # tuning) can adjust it without threading a parameter everywhere
    fanin = GATHER_FANIN if gather_fanin is None else gather_fanin
    out_refs = []
    for i in range(num_buckets):
        parts = [split_refs[j][i] for j in range(len(split_refs))]
        if combine_fn is not None:
            parts = tree_combine_parts(parts, combine_fn, fanin)
        out_refs.append(_gather.remote(reduce_fn, *parts))
    out_ds = rd.from_arrow_refs(out_refs)
    if return_refs:
        return out_ds, out_refs
    return out_ds


def split_stream(
    ds,
    bucket_col: str,
    num_buckets: int,
    *,
    blocks_per_split: int = 1,
    pre_reduce: Callable[[pa.Table], pa.Table] | None = None,
) -> list:
    """The map side of the exchange on its own: stream the Dataset's
    blocks into split tasks and return the per-split lists of bucket
    refs, so a caller can compose a CUSTOM gather (e.g. the cascade's
    combine+attach+write fused gather)."""
    split_refs: list = []
    pending: list = []

    def flush():
        if not pending:
            return
        r = _split.options(num_returns=num_buckets).remote(
            bucket_col, num_buckets, pre_reduce, *pending
        )
        split_refs.append([r] if num_buckets == 1 else r)
        pending.clear()

    for bundle in ds.iter_internal_ref_bundles():
        for block_ref in bundle.block_refs:
            pending.append(block_ref)
            if len(pending) >= blocks_per_split:
                flush()
    flush()
    return split_refs
