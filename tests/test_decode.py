"""Decode-stage tests, including the per-row invariant from BASELINE.json's
input_hint: the decode stage must reproduce each row's `tokens` array
exactly (lossless, order-preserving explode)."""

import numpy as np
import pyarrow as pa
import pytest

from pq_ray.fixtures import (
    STEP_MS,
    doc_shard,
    doc_t0_ms,
    generate_tokens_table,
)
from pq_ray.stages.decode import DecodeTokens, decode_dataset


def test_generator_deterministic():
    a = generate_tokens_table(300, seed=42)
    b = generate_tokens_table(300, seed=42)
    assert a.equals(b)
    c = generate_tokens_table(300, seed=7)
    assert not a.equals(c)
    assert a.schema.names == ["doc_id", "tokens", "n_tok", "source"]
    assert a.schema.field("tokens").type == pa.list_(pa.int32())


def test_token_array_equality_invariant():
    """Re-assemble each doc's token array from its emitted samples and
    compare element-wise to the input — the per-row invariant."""
    t = generate_tokens_table(200, seed=42)
    out = DecodeTokens(emit_doc_metric=False, provenance=True)(t)
    df = out.to_pandas()
    tokens_in = {
        d: np.asarray(v, dtype=np.int64)
        for d, v in zip(
            t.column("doc_id").to_pylist(), t.column("tokens").to_pylist()
        )
    }
    for doc_id, g in df.groupby("doc_id"):
        g = g.sort_values("pos")
        got = g["value"].to_numpy().astype(np.int64)
        assert np.array_equal(got, tokens_in[doc_id]), doc_id
        # timestamps follow the fixed rule
        t0 = doc_t0_ms(doc_id)
        assert np.array_equal(
            g["ts"].to_numpy(), t0 + g["pos"].to_numpy().astype(np.int64) * STEP_MS
        )
        assert (g["shard"] == doc_shard(doc_id)).all()


def test_doc_metric_analogue_of_line():
    """One n_tok sample per doc at t_doc — the analogue of pq's synthetic
    __line__ metric (src/query/sample.rs:90)."""
    t = generate_tokens_table(100, seed=42)
    out = DecodeTokens(emit_doc_metric=True)(t).to_pandas()
    doc_rows = out[out["name"] == "n_tok"]
    assert len(doc_rows) == 100
    n_tok = dict(zip(t.column("doc_id").to_pylist(), t.column("n_tok").to_pylist()))
    tok_counts = out[out["name"] == "token"].groupby("source").size()
    assert tok_counts.sum() == sum(n_tok.values())
    assert (doc_rows["value"].to_numpy() == t.column("n_tok").to_numpy()).all()


def test_decode_dataset_distributed(ray_session):
    import ray.data as rd

    t = generate_tokens_table(256, seed=42)
    ds = rd.from_arrow(t).repartition(4)
    samples = decode_dataset(ds, batch_size=64, concurrency=2)
    n = samples.count()
    expected = int(t.column("n_tok").combine_chunks().to_numpy().sum()) + 256
    assert n == expected


def test_decode_retry_determinism():
    """Same batch decoded twice gives identical bytes — lineage-exact
    retries."""
    t = generate_tokens_table(64, seed=42)
    a = DecodeTokens()(t)
    b = DecodeTokens()(t)
    assert a.equals(b)


def test_doc_aligned_kernel_equals_generic():
    """The sort-free doc-aligned partial kernel must equal the generic
    per-sample kernel bit-for-bit (same partial rows, any order)."""
    import pyarrow as pa

    from pq_ray.fixtures import generate_tokens_table
    from pq_ray.stages.decode import DecodeToPartials

    batch = generate_tokens_table(600, seed=11)

    fast = DecodeToPartials(1000, narrow=False)

    class NoFast(DecodeToPartials):
        def _doc_aligned_partials(self, *a, **k):
            return None

    slow = NoFast(1000, narrow=False)
    a = fast(batch).to_pandas().sort_values(["series_id", "window_ts"]).reset_index(drop=True)
    b = slow(batch).to_pandas().sort_values(["series_id", "window_ts"]).reset_index(drop=True)
    assert len(a) == len(b)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f":
            assert np.array_equal(av.view(np.uint64), bv.view(np.uint64)), c
        else:
            assert np.array_equal(av, bv), c
