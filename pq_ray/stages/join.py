"""First-class relational joins, Ray-Data-first.

Two operators, each in the role it keeps at 100 TB:

- ``broadcast_join``: the SMALL side is ``ray.put`` into the object
  store ONCE and every map task joins its batch against the local copy
  (zero re-shipping per batch — workers fetch the shared object from
  their node's store).  Correct for dimension tables (nation, region,
  label maps); wrong for fact-fact joins, where the broadcast would
  exceed worker heaps.
- ``shuffle_join``: both sides are hash-partitioned on the join key
  through the same explicit split/gather exchange the cascade uses
  (stages/exchange.py), and each bucket joins its two complete slices
  with Arrow's hash join.  This is the fact-fact path: wire volume is
  |left|+|right| rows, each side moved exactly once.

The reference engine has no relational join at all (its only join is
the per-tick vector match, src/query/value.rs:69) — this is part of the
engine's training-data surface, where enrichment joins (doc ↔ source
metadata, event ↔ user dimension) are routine.

Partitioning assumption (documented per the build rules): a
shuffle-join bucket must fit a worker's heap — callers size
``num_buckets`` so that (|left|+|right|) / num_buckets rows fit, and
skewed keys should be pre-salted or routed to the broadcast path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .exchange import split_stream


from ..model import splitmix64 as _splitmix64  # shared single copy


def _key_buckets(col: pa.ChunkedArray, num_buckets: int) -> np.ndarray:
    """Bucket of each key value: avalanche-hash then mod.  Integer keys
    hash vectorized; string keys go through dictionary codes + a small
    per-distinct hash LUT (same trick as tsops._series_ids)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_integer(arr.type):
        k = arr.to_numpy(zero_copy_only=False).astype(np.uint64)
        return (_splitmix64(k) % np.uint64(num_buckets)).astype(np.int32)
    from ..model import stable_hash64

    codes = arr.dictionary_encode()
    lut = np.array(
        [stable_hash64(v) if v is not None else 0 for v in codes.dictionary.to_pylist()],
        dtype=np.uint64,
    )
    h = lut[codes.indices.to_numpy(zero_copy_only=False)]
    return (h % np.uint64(num_buckets)).astype(np.int32)


def broadcast_join(
    ds,
    right: pa.Table,
    keys: str | list[str],
    right_keys: str | list[str] | None = None,
    join_type: str = "inner",
):
    """Join every batch of ``ds`` against a broadcast ``right`` table.

    ``right`` ships to the object store once; each map task joins its
    Arrow batch with Arrow's hash join (pyarrow.Table.join / Acero).
    ``join_type``: Acero's names — "inner", "left outer", "left semi",
    "left anti", ...
    """
    right_ref = ray.put(right)

    def join_batch(batch: pa.Table) -> pa.Table:
        r = ray.get(right_ref)  # node-local fetch after the first task
        return batch.join(r, keys=keys, right_keys=right_keys, join_type=join_type)

    return ds.map_batches(join_batch, batch_format="pyarrow")


@ray.remote
def _join_gather(
    left_key,
    right_key,
    join_type: str,
    n_left: int,
    *parts: pa.Table,
) -> pa.Table:
    def side(parts_slice: tuple, key: str) -> pa.Table | None:
        rows = [p for p in parts_slice if p.num_rows]
        if rows:
            t = pa.concat_tables(rows)
        else:
            # empty fallback: prefer a part that carries the real schema
            # (a split task with usable blocks emits full-schema empty
            # slices; a fully-empty side emits schema-less placeholders)
            t = next(
                (p.slice(0, 0) for p in parts_slice if key in p.schema.names),
                None,
            )
            if t is None:
                return None  # side is globally empty AND schema-less
        if "__bucket" in t.schema.names:
            t = t.drop_columns(["__bucket"])
        return t

    left = side(parts[:n_left], left_key)
    right = side(parts[n_left:], right_key)
    if left is None or right is None:
        # A side is globally empty AND schema-less (Ray's placeholder
        # blocks): we can only synthesize results whose output schema
        # doesn't need the missing side — otherwise fail LOUD rather
        # than return silently-wrong rows (e.g. a full outer missing
        # the null-extended columns).
        if left is not None and join_type in ("inner", "left semi", "left anti"):
            # anti: all left rows survive (exact, anti output schema is
            # left-only anyway); inner/semi: zero rows
            return left if join_type == "left anti" else left.slice(0, 0)
        if left is None and join_type in ("inner", "left semi", "left anti"):
            # no left data at all → these join types are empty; the
            # schema is unknowable but so is every bucket's, uniformly
            return pa.table({})
        raise ValueError(
            f"shuffle join: a side arrived globally empty without a schema; "
            f"cannot synthesize a {join_type!r} result"
        )
    return left.join(right, keys=left_key, right_keys=right_key, join_type=join_type)


def detect_hot_keys(
    ds,
    key: str,
    num_buckets: int = 16,
    top: int = 3,
    min_share: float = 2.0,
) -> list:
    """ADVISORY hot-key detector for skew salting.

    Each batch reports its local top-``top`` keys by count plus its row
    total (≤ top+1 tiny rows per block on the wire); the driver folds
    and returns keys whose summed count exceeds ``min_share`` × the
    average bucket share (total/num_buckets).  A globally hot key is in
    almost every batch's local top-k, so its fold is near-exact; a key
    the heuristic misses just stays on the normal hash path —
    correctness never depends on detection.
    """

    def partial(t: pa.Table) -> pa.Table:
        counts = t.select([key]).group_by([key]).aggregate([([], "count_all")])
        counts = counts.sort_by([("count_all", "descending")]).slice(0, top)
        # batch total rides on the FIRST reported row only, so the
        # driver's sum over all partial rows is the exact stream total
        br = np.zeros(counts.num_rows, dtype=np.int64)
        if len(br):
            br[0] = t.num_rows
        return counts.append_column("batch_rows", pa.array(br))

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return []
    total = int(parts["batch_rows"].sum())
    folded = parts.groupby(key, as_index=False)["count_all"].sum()
    cut = min_share * total / num_buckets
    hot = folded[folded["count_all"] > cut]
    return hot[key].tolist()


_SALT_OK_TYPES = {"inner", "left outer", "left semi", "left anti"}


def shuffle_join(
    left_ds,
    right_ds,
    left_key: str,
    right_key: str | None = None,
    num_buckets: int = 16,
    join_type: str = "inner",
    hot_keys: list | None = None,
    salt: int = 8,
):
    """Hash-partition both datasets on the join key and join each bucket.

    Equal key values land in the same bucket on both sides (same hash,
    same modulus), so the per-bucket Arrow joins union to the global
    join.  Returns a Dataset of the per-bucket join outputs.

    ``hot_keys`` enables EXPLICIT SKEW SALTING (the north rule's hot-key
    split): each listed key gets its own ``salt`` dedicated buckets —
    left rows of that key spread round-robin across them, right rows of
    that key are REPLICATED into each (classic salted join).  Exact for
    left-anchored join types (inner / left outer / left semi / left
    anti): every left row still meets the complete right slice of its
    key exactly once.  Right-anchored types would duplicate right rows,
    so they are rejected.  Use ``detect_hot_keys`` (or the Misra-Gries
    heavy-hitter sketch, tsops.py) to find candidates; a missed hot key
    only costs balance, never correctness.
    """
    right_key = right_key or left_key
    hot_keys = list(hot_keys or [])
    if hot_keys and join_type not in _SALT_OK_TYPES:
        raise ValueError(
            f"hot_keys salting supports {sorted(_SALT_OK_TYPES)}, not {join_type!r}"
        )
    hot_idx = {k: i for i, k in enumerate(hot_keys)}
    total_buckets = num_buckets + len(hot_keys) * salt

    def _hot_masks(t: pa.Table, key_col: str):
        import pyarrow.compute as pc

        arr = t[key_col]
        return [
            pc.fill_null(pc.equal(arr, k), False).to_numpy(zero_copy_only=False)
            for k in hot_keys
        ]

    def tag_left(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("__bucket", pa.array([], type=pa.int32()))
        b = _key_buckets(t[left_key], num_buckets)
        for k, m in zip(hot_keys, _hot_masks(t, left_key)):
            n = int(m.sum())
            if n:
                h = hot_idx[k]
                b[m] = num_buckets + h * salt + (np.arange(n) % salt)
        return t.append_column("__bucket", pa.array(b))

    def tag_right(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("__bucket", pa.array([], type=pa.int32()))
        b = _key_buckets(t[right_key], num_buckets)
        if not hot_keys:
            return t.append_column("__bucket", pa.array(b))
        masks = _hot_masks(t, right_key)
        any_hot = np.zeros(t.num_rows, dtype=bool)
        for m in masks:
            any_hot |= m
        pieces = [
            t.filter(pa.array(~any_hot)).append_column(
                "__bucket", pa.array(b[~any_hot])
            )
        ]
        for k, m in zip(hot_keys, masks):
            if not m.any():
                continue
            rows = t.filter(pa.array(m))
            h = hot_idx[k]
            for s in range(salt):  # replicate into every salted bucket
                pieces.append(
                    rows.append_column(
                        "__bucket",
                        pa.array(
                            np.full(rows.num_rows, num_buckets + h * salt + s,
                                    dtype=np.int32)
                        ),
                    )
                )
        return pa.concat_tables(pieces)

    lrefs = split_stream(
        left_ds.map_batches(tag_left, batch_format="pyarrow"),
        "__bucket",
        total_buckets,
    )
    rrefs = split_stream(
        right_ds.map_batches(tag_right, batch_format="pyarrow"),
        "__bucket",
        total_buckets,
    )
    if not lrefs and not rrefs:
        return rd.from_arrow_refs([])
    # a SINGLE empty side still runs the gathers: _join_gather's
    # missing-side semantics (anti keeps all left rows, inner/semi go
    # empty, outer types fail loud) apply uniformly across buckets
    out_refs = [
        _join_gather.remote(
            left_key,
            right_key,
            join_type,
            len(lrefs),
            *[lrefs[j][i] for j in range(len(lrefs))],
            *[rrefs[j][i] for j in range(len(rrefs))],
        )
        for i in range(total_buckets)
    ]
    return rd.from_arrow_refs(out_refs)
