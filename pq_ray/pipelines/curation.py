"""Composed corpus curation: exact-dedup winners → repetition quality
filter → deterministic stratified sample, as ONE pipeline.

This is the end-to-end shape a training-data job runs over 100 TB, and
it composes three already-oracled operators (training.py: dedup_exact,
repetition_filter, stratified_sample) into a single plan that stays
scale-correct:

- every per-doc signal is BATCH-LOCAL: the content hash, the
  repetition keep/drop verdict (token-hash lexsorts) and the Knuth
  sample key are all computed inside the map task, so document TEXT
  never leaves the map side;
- the ONE exchange ships narrow (hash, doc_id, source, keep, key)
  rows keyed by content hash — exactly what exact dedup needs to pick
  the min-doc_id winner per distinct text;
- each bucket filters to clean winners and keeps its per-source top-N
  sample candidates, so the driver folds ≤ N × |sources| × buckets
  rows at any corpus size.

``run_curation`` additionally writes the curated doc list as
source-partitioned Parquet with the same checkpoint manifest the
cascade tiers use (state/manifest.py) — reruns with an unchanged corpus
are byte-identical no-ops, per the north rule's resumable-output
requirement.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..sources.readers import small_input_blocks
from ..stages.exchange import hash_exchange
from .training import (
    NUM_BUCKETS,
    _bucket_of_u64,
    _KNUTH,
    _text_hash128,
    repetition_signals,
)


def _read_docs_src(sf_dir: str):
    path = f"{sf_dir}/documents.parquet"
    return rd.read_parquet(
        path, columns=["doc_id", "text", "source"],
        override_num_blocks=small_input_blocks(path),
    )

N_PER_SOURCE = 10


def _doc_signals(df: pd.DataFrame) -> pd.DataFrame:
    """Per-doc batch-local curation signals (no exchange yet).  The
    content key is the vectorized 128-bit buffer hash (VERDICT r3 #10),
    not per-row md5."""
    h1, h2 = _text_hash128(pa.array(df["text"], type=pa.string()))
    _, _, _, _, rep_keep = repetition_signals(df["text"].to_numpy())
    doc_id = df["doc_id"].to_numpy(dtype=np.int64)
    return pd.DataFrame(
        {
            "h1": h1,
            "h2": h2,
            "doc_id": doc_id,
            "source": df["source"].to_numpy(dtype=object),
            "rep_keep": rep_keep,
            "sample_key": (doc_id * _KNUTH) % (1 << 32),
            "bucket": _bucket_of_u64(h1),
        }
    )


def _bucket_candidates(t: pa.Table) -> pa.Table:
    """Per bucket: min-doc_id winner per content hash → repetition
    filter → per-source top-N sample candidates."""
    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "source": pa.array([], type=pa.string()),
            "sample_key": pa.array([], type=pa.int64()),
        }
    )
    if t.num_rows == 0:
        return empty
    df = t.to_pandas()
    df = df.sort_values(["h1", "h2", "doc_id"], kind="stable")
    winners = df.groupby(["h1", "h2"], sort=False).head(1)
    clean = winners[winners["rep_keep"]]
    if clean.empty:
        return empty
    clean = clean.sort_values(["source", "sample_key", "doc_id"], kind="stable")
    cand = clean.groupby("source", sort=False).head(N_PER_SOURCE)
    return pa.Table.from_pandas(
        cand[["doc_id", "source", "sample_key"]], preserve_index=False
    )


def q_curate_corpus(sf_dir: str) -> pd.DataFrame:
    """Driver query: the curated stratified sample (source, rank, doc)."""
    ds = _read_docs_src(sf_dir)
    cand = hash_exchange(
        ds.map_batches(_doc_signals, batch_format="pandas"),
        "bucket",
        NUM_BUCKETS,
        _bucket_candidates,
    ).to_pandas()
    cand = cand.sort_values(["source", "sample_key", "doc_id"], kind="stable")
    # head() preserves the sort above, so final is already ordered
    final = (
        cand.groupby("source", sort=False).head(N_PER_SOURCE).reset_index(drop=True)
    )
    final["sample_rank"] = final.groupby("source").cumcount().to_numpy() + 1
    return (
        final[["source", "sample_rank", "doc_id"]]
        .sort_values(["source", "sample_rank"])
        .reset_index(drop=True)
    )


def run_curation(sf_dir: str, out_dir: str) -> dict:
    """Write the curated sample as source-partitioned Parquet with a
    checkpoint manifest; an unchanged rerun is a resume no-op."""
    import os
    import time as _time

    import pyarrow.parquet as pq

    from ..state import manifest as mf

    fp = mf.dir_fingerprint(sf_dir)
    if mf.is_complete(out_dir, fp):
        return {"resumed": True, "rows": sum(mf.file_row_counts(out_dir).values())}
    t0 = _time.perf_counter()
    df = q_curate_corpus(sf_dir)
    # recompute (corpus changed or never completed): clear any previous
    # output so stale partitions from a prior corpus can't survive into
    # the new manifest's row counts
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    for src, g in df.groupby("source"):
        part = os.path.join(out_dir, f"source={src}")
        os.makedirs(part, exist_ok=True)
        pq.write_table(
            pa.Table.from_pandas(g.reset_index(drop=True), preserve_index=False),
            os.path.join(part, "part-0.parquet"),
        )
    mf.publish(
        out_dir,
        tier_ms=0,  # not a time tier: curation output
        input_path=sf_dir,
        input_fingerprint=fp,
        rows_in=len(df),
        wall_sec=_time.perf_counter() - t0,
        extra={"n_per_source": N_PER_SOURCE},
    )
    return {"resumed": False, "rows": len(df)}


QUERIES = {"curate_corpus": q_curate_corpus}
ORACLES = {
    "curate_corpus": """
        WITH keepers AS (
            SELECT doc_id, source, text FROM documents
            QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY text)
        ),
        words AS (
            SELECT doc_id,
                   unnest(string_split(text, ' ')) AS w,
                   generate_subscripts(string_split(text, ' '), 1) AS ord,
                   len(string_split(text, ' ')) AS n
            FROM keepers
        ),
        grams AS (
            SELECT doc_id, n, w,
                   lead(w, 1) OVER (PARTITION BY doc_id ORDER BY ord) AS w1,
                   lead(w, 2) OVER (PARTITION BY doc_id ORDER BY ord) AS w2
            FROM words
        ),
        uniq AS (
            SELECT doc_id, ANY_VALUE(n) AS n_tokens,
                   COUNT(DISTINCT w) AS n_unique
            FROM grams GROUP BY doc_id
        ),
        bi AS (
            SELECT doc_id, MAX(c) AS top_bi FROM (
                SELECT doc_id, w || ' ' || w1 AS g, COUNT(*) AS c
                FROM grams WHERE w1 IS NOT NULL GROUP BY doc_id, g
            ) GROUP BY doc_id
        ),
        tri AS (
            SELECT doc_id, MAX(c) AS top_tri FROM (
                SELECT doc_id, w || ' ' || w1 || ' ' || w2 AS g, COUNT(*) AS c
                FROM grams WHERE w2 IS NOT NULL GROUP BY doc_id, g
            ) GROUP BY doc_id
        ),
        clean AS (
            SELECT k.doc_id, k.source
            FROM keepers k
            JOIN uniq u USING (doc_id)
            LEFT JOIN bi b USING (doc_id)
            LEFT JOIN tri t USING (doc_id)
            WHERE 10 * (u.n_tokens - u.n_unique) <= 3 * u.n_tokens
              AND 5 * COALESCE(b.top_bi, 0) <= GREATEST(u.n_tokens - 1, 0)
              AND 50 * COALESCE(t.top_tri, 0) <= 9 * GREATEST(u.n_tokens - 2, 0)
        )
        SELECT source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY (doc_id * 2654435761) % 4294967296, doc_id
               ) AS sample_rank,
               doc_id
        FROM clean
        QUALIFY sample_rank <= 10
        ORDER BY source, sample_rank
    """,
}
