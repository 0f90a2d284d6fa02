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


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer — the standard public-domain avalanche."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


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
    lparts = [p for p in parts[:n_left] if p.num_rows]
    rparts = [p for p in parts[n_left:] if p.num_rows]
    left = pa.concat_tables(lparts) if lparts else parts[0].slice(0, 0)
    right = pa.concat_tables(rparts) if rparts else parts[n_left].slice(0, 0)
    left = left.drop_columns(["__bucket"])
    right = right.drop_columns(["__bucket"])
    return left.join(right, keys=left_key, right_keys=right_key, join_type=join_type)


def shuffle_join(
    left_ds,
    right_ds,
    left_key: str,
    right_key: str | None = None,
    num_buckets: int = 16,
    join_type: str = "inner",
):
    """Hash-partition both datasets on the join key and join each bucket.

    Equal key values land in the same bucket on both sides (same hash,
    same modulus), so the per-bucket Arrow joins union to the global
    join.  Returns a Dataset of the per-bucket join outputs.
    """
    right_key = right_key or left_key

    def tag(key_col):
        def add_bucket(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t.append_column("__bucket", pa.array([], type=pa.int32()))
            b = _key_buckets(t[key_col], num_buckets)
            return t.append_column("__bucket", pa.array(b))

        return add_bucket

    lrefs = split_stream(
        left_ds.map_batches(tag(left_key), batch_format="pyarrow"),
        "__bucket",
        num_buckets,
    )
    rrefs = split_stream(
        right_ds.map_batches(tag(right_key), batch_format="pyarrow"),
        "__bucket",
        num_buckets,
    )
    if not lrefs or not rrefs:
        return rd.from_arrow_refs([])
    out_refs = [
        _join_gather.remote(
            left_key,
            right_key,
            join_type,
            len(lrefs),
            *[lrefs[j][i] for j in range(len(lrefs))],
            *[rrefs[j][i] for j in range(len(rrefs))],
        )
        for i in range(num_buckets)
    ]
    return rd.from_arrow_refs(out_refs)
