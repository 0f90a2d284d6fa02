"""Distributed connected components over an edge Dataset.

Min-label propagation expressed as hash exchanges (the same raw-task
shuffle the cascade uses — Ray Data's sort-groupby pays a multi-second
fixed cost per job, and CC needs several tiny jobs per round):

  round r (2 exchanges):
    1. message exchange, keyed hash(node): each bucket holds the label
       rows for its nodes AND the adjacency rows whose src hashes there,
       so ``lab[src]`` resolves locally (vectorized searchsorted) and the
       bucket emits ``(dst, lab[src])`` messages plus the pass-through
       label rows;
    2. min exchange, keyed hash(node): per-node minimum over messages
       and current labels → next round's labels.

  convergence: total label sum is strictly decreasing until fixpoint
  (labels only ever shrink toward the component minimum), so the loop
  stops when the cheap distributed ``sum`` aggregate stops changing.
  Rounds needed = graph diameter (tiny for near-dup clusters).

Partitioning assumption (documented per the build rules): one bucket
holds the labels + adjacency rows of its node-hash slice — bounded by
|edges|/num_buckets, NOT by the corpus size.  Callers attach component
labels back to the full corpus with a broadcast map (the label table is
bounded by the number of edge endpoints, i.e. the duplicate docs only).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .exchange import hash_exchange

_PHI = np.uint64(0x9E3779B97F4A7C15)


def _bucket_i64(v: np.ndarray, num_buckets: int) -> np.ndarray:
    h = v.astype(np.uint64) * _PHI
    return ((h >> np.uint64(17)) % np.uint64(num_buckets)).astype(np.int32)


def _empty_labels() -> pa.Table:
    return pa.table(
        {
            "node": pa.array([], type=pa.int64()),
            "lab": pa.array([], type=pa.int64()),
        }
    )


def connected_components(
    edges_ds, *, num_buckets: int = 8, max_rounds: int = 64
) -> pd.DataFrame:
    """edges Dataset (int64 columns ``a``, ``b``) → pandas (node, label)
    for every node appearing in an edge; label = component minimum."""

    def to_adj(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "src": pa.array([], type=pa.int64()),
                    "dst": pa.array([], type=pa.int64()),
                    "bucket": pa.array([], type=pa.int32()),
                }
            )
        a = t["a"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate((a, b))
        dst = np.concatenate((b, a))
        return pa.table(
            {
                "src": pa.array(src),
                "dst": pa.array(dst),
                "bucket": pa.array(_bucket_i64(src, num_buckets)),
            }
        )

    # adjacency is reused every round — materialize once (bounded by
    # 2x|edges|, the near-dup pair list, not the corpus)
    adj = edges_ds.map_batches(to_adj, batch_format="pyarrow").materialize()
    if adj.count() == 0:
        return pd.DataFrame({"node": pd.Series(dtype=np.int64),
                             "label": pd.Series(dtype=np.int64)})

    def init_labels(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_labels()
        src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        nodes = np.unique(src)
        return pa.table({"node": pa.array(nodes), "lab": pa.array(nodes)})

    def min_reduce(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _empty_labels()
        node = t["node"].combine_chunks().to_numpy(zero_copy_only=False)
        lab = t["lab"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((lab, node))
        n, l = node[order], lab[order]
        starts = np.concatenate(([0], np.nonzero(n[1:] != n[:-1])[0] + 1))
        return pa.table({"node": pa.array(n[starts]), "lab": pa.array(l[starts])})

    # initial labels: distinct nodes per bucket (adjacency is already
    # bucketed by src, so dedupe is local — no extra shuffle)
    labels = hash_exchange(adj, "bucket", num_buckets, init_labels).materialize()

    def msg_reduce(t: pa.Table) -> pa.Table:
        """One bucket = label rows for its nodes + adjacency rows whose
        src is here.  Emits (dst, lab[src]) messages + label rows."""
        if t.num_rows == 0:
            return pa.table(
                {
                    "node": pa.array([], type=pa.int64()),
                    "lab": pa.array([], type=pa.int64()),
                    "bucket": pa.array([], type=pa.int32()),
                }
            )
        node = t["node"].combine_chunks().to_numpy(zero_copy_only=False)
        lab = t["lab"].combine_chunks().to_numpy(zero_copy_only=False)
        dst = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        is_lab = dst == -1
        lnode, llab = node[is_lab], lab[is_lab]
        order = np.argsort(lnode, kind="stable")
        lnode, llab = lnode[order], llab[order]
        src, sdst = node[~is_lab], dst[~is_lab]
        idx = np.searchsorted(lnode, src)
        out_node = np.concatenate((sdst, lnode))
        out_lab = np.concatenate((llab[idx], llab))
        return pa.table(
            {
                "node": pa.array(out_node),
                "lab": pa.array(out_lab),
                "bucket": pa.array(_bucket_i64(out_node, num_buckets)),
            }
        )

    def lab_rows(t: pa.Table) -> pa.Table:
        node = t["node"].combine_chunks().to_numpy(zero_copy_only=False)
        lab = t["lab"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": pa.array(node),
                "lab": pa.array(lab),
                "dst": pa.array(np.full(len(node), -1, dtype=np.int64)),
                "bucket": pa.array(_bucket_i64(node, num_buckets)),
            }
        )

    def adj_rows(t: pa.Table) -> pa.Table:
        src = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        dst = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": pa.array(src),
                "lab": pa.array(np.zeros(len(src), dtype=np.int64)),
                "dst": pa.array(dst),
                "bucket": pa.array(t["bucket"].combine_chunks().to_numpy(
                    zero_copy_only=False)),
            }
        )

    checksum = labels.sum("lab")
    for _ in range(max_rounds):
        mixed = labels.map_batches(lab_rows, batch_format="pyarrow").union(
            adj.map_batches(adj_rows, batch_format="pyarrow")
        )
        msgs = hash_exchange(mixed, "bucket", num_buckets, msg_reduce)
        labels = hash_exchange(msgs, "bucket", num_buckets, min_reduce).materialize()
        new_sum = labels.sum("lab")
        if new_sum == checksum:
            break
        checksum = new_sum

    out = labels.to_pandas()
    return out.rename(columns={"lab": "label"}).sort_values("node").reset_index(
        drop=True
    )
