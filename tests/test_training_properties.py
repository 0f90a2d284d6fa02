"""Property tests for the round-5 curation ops: random small corpora vs
naive pure-Python references (independent of both the Ray plans and the
DuckDB oracles).  Few examples, real pipelines — these exist to catch
boundary shapes (empty docs, single-word docs, all-duplicate corpora)
that a fixed corpus never produces."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as papq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pq_ray.pipelines.training import (
    _KNUTH,
    CHUNK_WORDS,
    SEQ_LEN,
    SPAN_N,
    q_pack_sequences,
    q_shuffle_order,
    q_span_dup_stats,
)

word = st.sampled_from([f"w{i}" for i in range(12)])
doc = st.lists(word, min_size=0, max_size=40).map(" ".join)
corpus = st.lists(doc, min_size=1, max_size=24)


def _write(tmp_path, docs):
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    papq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), type=pa.int64()),
                "text": pa.array(docs),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=corpus)
def test_span_dup_stats_matches_naive(ray_session, tmp_path_factory, docs):
    tmp = tmp_path_factory.mktemp("span")
    out = q_span_dup_stats(_write(tmp, docs)).set_index("doc_id")
    # naive: distinct string grams per doc, df across docs
    grams = [
        {
            " ".join(ws[i: i + SPAN_N])
            for i in range(max(len(ws) - SPAN_N + 1, 0))
        }
        for ws in (t.split(" ") for t in docs)
    ]
    from collections import Counter

    df = Counter(g for gs in grams for g in gs)
    for i, gs in enumerate(grams):
        assert out.loc[i, "n_grams"] == len(gs)
        assert out.loc[i, "n_dup"] == sum(1 for g in gs if df[g] > 1)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=corpus)
def test_pack_sequences_matches_naive(ray_session, tmp_path_factory, docs):
    tmp = tmp_path_factory.mktemp("pack")
    out = (
        q_pack_sequences(_write(tmp, docs))
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    off = 0
    for i, t in enumerate(docs):
        n = len(t.split(" "))
        assert out.loc[i, "n_tok"] == n
        assert out.loc[i, "start_off"] == off
        assert out.loc[i, "seq_first"] == off // SEQ_LEN
        assert out.loc[i, "seq_last"] == (off + n - 1) // SEQ_LEN
        off += n


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=corpus)
def test_shuffle_order_matches_naive(ray_session, tmp_path_factory, docs):
    tmp = tmp_path_factory.mktemp("shuf")
    out = (
        q_shuffle_order(_write(tmp, docs))
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    order = sorted(
        range(len(docs)), key=lambda i: ((i * _KNUTH) % (1 << 32), i)
    )
    expect = {doc_id: r + 1 for r, doc_id in enumerate(order)}
    for i in range(len(docs)):
        assert out.loc[i, "shuffle_rank"] == expect[i]


def test_knuth_key_total_for_any_int64():
    """_knuth_key must be total over int64: negative or huge doc_ids map
    to a key in [0, 2^32) that matches exact bigint arithmetic, so no
    row can route to a negative (dropped) exchange bucket."""
    from pq_ray.pipelines.training import _knuth_key

    ids = np.array(
        [-1, -(2**63), -2654435761, 0, 1, 2**31, 2**33, 2**62, 2**63 - 1],
        dtype=np.int64,
    )
    key = _knuth_key(ids)
    assert key.dtype == np.int64
    assert (key >= 0).all() and (key < 2**32).all()
    for i, k in zip(ids.tolist(), key.tolist()):
        # two's-complement view: numpy's uint64 cast is i mod 2^64, and
        # mod 2^32 nests inside it, so exact bigint (i*K) % 2^32 agrees
        assert k == (i * _KNUTH) % (1 << 32)
