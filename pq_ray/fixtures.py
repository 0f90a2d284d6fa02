"""Deterministic synthetic corpus generator.

Produces the primary input table of the engine — a Parquet table of
pre-tokenized training sequences with exactly the shape pinned by
``BASELINE.json``'s ``input_hint``::

    doc_id : string      f"{source}-{i:08d}", unique
    tokens : list<int32> length n_tok, values in [0, 50257)
    n_tok  : int32       len(tokens); mostly 64-512 with a heavy tail
    source : string      {"web","books","code","wiki"}, web ~10x hotter (skew)

Everything is a pure function of ``(seed, doc index)`` with a fixed chunk
layout, so any scale regenerates bit-identically — tests, benches and the
resume/checkpoint fixtures all rely on that.

The *decode rule* (tokens → timestamped samples) lives in
``pq_ray.stages.decode``; the per-row invariant (the decode stage must
reproduce each row's token array exactly) is tested in
``tests/test_decode.py``.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .model import EPOCH0_MS, stable_hash64

VOCAB = 50_257
SOURCES = ["web", "books", "code", "wiki"]
# web is ~10x hotter than the rest — the skew the rollup shuffle must handle.
SOURCE_WEIGHTS = np.array([10.0, 1.0, 1.0, 1.0])
SOURCE_WEIGHTS /= SOURCE_WEIGHTS.sum()

# Documents are spread over one day of event time, quantized to whole
# seconds (mirrors the second-precision inputs of the reference corpus).
T_SPAN_MS = 86_400_000
STEP_MS = 250  # one sample per token, 4 tokens/second
N_SHARDS = 8

_CHUNK = 8_192  # fixed generation chunk — part of the determinism contract
# (one parquet file per chunk: small enough that reads parallelize across
# tasks instead of funneling through one reader)


def doc_t0_ms(doc_id: str) -> int:
    """Base timestamp of a document: EPOCH0 + (hash(doc_id) % span),
    quantized to whole seconds.  Pure function of doc_id — the decode
    stage recomputes this identically on every retry (deterministic
    lineage)."""
    off = stable_hash64(doc_id) % T_SPAN_MS
    return EPOCH0_MS + (off // 1000) * 1000


def doc_shard(doc_id: str) -> int:
    return stable_hash64(doc_id) % N_SHARDS


def _gen_chunk(seed: int, chunk_idx: int, start: int, n: int) -> pa.Table:
    rng = np.random.default_rng(np.random.SeedSequence([seed, chunk_idx]))
    src_idx = rng.choice(len(SOURCES), size=n, p=SOURCE_WEIGHTS)
    # Length distribution: log-normal bulk in ~64-512, heavy tail capped at 4096.
    n_tok = np.minimum(
        (64 + rng.lognormal(mean=4.0, sigma=1.0, size=n)).astype(np.int64), 4096
    ).astype(np.int32)
    total = int(n_tok.sum())
    flat = rng.integers(0, VOCAB, size=total, dtype=np.int32)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_tok, out=offsets[1:])
    doc_ids = [f"{SOURCES[s]}-{start + i:08d}" for i, s in enumerate(src_idx)]
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, type=pa.string()),
            "tokens": pa.LargeListArray.from_arrays(offsets, flat).cast(
                pa.list_(pa.int32())
            ),
            "n_tok": pa.array(n_tok, type=pa.int32()),
            "source": pa.array([SOURCES[s] for s in src_idx], type=pa.string()),
        }
    )


def generate_tokens_table(n_docs: int, seed: int = 42) -> pa.Table:
    """In-memory table for tests (use write_tokens_corpus for bench scale)."""
    chunks = []
    start = 0
    chunk_idx = 0
    while start < n_docs:
        n = min(_CHUNK, n_docs - start)
        chunks.append(_gen_chunk(seed, chunk_idx, start, n))
        start += n
        chunk_idx += 1
    return pa.concat_tables(chunks)


def write_tokens_corpus(
    out_dir: str,
    n_docs: int,
    seed: int = 42,
    docs_per_file: int = _CHUNK,
) -> list[str]:
    """Write the corpus as a directory of Parquet part files.

    One file per generation chunk — the resumable-output layout: a rerun
    skips files that already exist (size > 0), so corpus generation is
    itself checkpointed.
    """
    os.makedirs(out_dir, exist_ok=True)
    assert docs_per_file % _CHUNK == 0 or docs_per_file == _CHUNK
    paths = []
    start = 0
    chunk_idx = 0
    while start < n_docs:
        n = min(_CHUNK, n_docs - start)
        path = os.path.join(out_dir, f"part-{chunk_idx:05d}.parquet")
        if not (os.path.exists(path) and os.path.getsize(path) > 0):
            tmp = path + ".tmp"
            pq.write_table(_gen_chunk(seed, chunk_idx, start, n), tmp)
            os.replace(tmp, path)  # atomic publish
        paths.append(path)
        start += n
        chunk_idx += 1
    # remove stray part files beyond the expected set (a dir reused with
    # a smaller n_docs would otherwise silently keep the old tail and
    # corrupt every consumer's row counts)
    expected = {os.path.basename(p) for p in paths}
    for name in os.listdir(out_dir):
        if name.endswith(".parquet") and name not in expected:
            os.remove(os.path.join(out_dir, name))
    return paths
