"""The flagship pipeline: token corpus → raw→1m→1h→1d rollup cascade.

Physical plan (all streaming, one shuffle per tier):

    read_parquet(corpus)                      column-pruned read
      → map_batches(DecodeTokens, actors)     tokens → samples explode
      → map_batches(PartialAggBatch)          per-batch partial aggregates
      → groupby(bucket).map_groups(combine)   ONE hash exchange per tier
      → write_parquet(tier_dir)               resumable partitioned output
    each coarser tier reads the previous tier's *points* (never raw data)
    and re-aggregates the mergeable partial struct — the continuous
    aggregate cascade.

Checkpointing: each tier publishes a ``_MANIFEST.json`` (lineage:
input fingerprint + per-file row counts + wall time); a rerun skips
completed tiers whose input fingerprint still matches — mid-job resume.

Scale notes (100 TB thinking):
- the decode fan-out (~150x rows) is bounded by a small decode
  ``batch_size`` so blocks stay near the object-store sweet spot;
- partial aggregation happens *before* the exchange, so the shuffle
  traffic is ~|series × windows-touched-per-batch|, not raw samples;
- the bucket key mixes window_ts into the hash: a hot series (the skewed
  ``web`` source) spreads across buckets instead of pinning one reducer;
- tiers write one directory each with many part files → a failed run
  resumes at tier granularity and output never funnels into one file.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd
import ray.data as rd

from ..stages.gapfill import global_gaps_table
from ..state import manifest as mf
from ..state.gorilla import chunk_series
from ..stages.decode import decode_dataset
from ..stages.rollup import DEFAULT_LABEL_COLS
from ..stages.rollup import cascade as cascade_step
from ..stages.rollup import rollup

DEFAULT_TIERS = [1000, 60_000, 3_600_000, 86_400_000]


def tier_dir(out_dir: str, tier_ms: int) -> str:
    return os.path.join(out_dir, f"tier={tier_ms}")


def _write_chunks(tdir: str, chunks_dir: str, num_buckets: int) -> int:
    """Gorilla-compress a tier's points into per-series chunk structs.

    Bucket by series_id (all of a series' windows together), then
    per-series delta-of-delta + XOR encode inside map_groups.
    """
    pts = rd.read_parquet(tdir)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket"] = (
            df["series_id"].to_numpy(dtype=np.uint64) % np.uint64(num_buckets)
        ).astype(np.int32)
        return df

    def encode_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return chunk_series(df.drop(columns=["bucket"]), DEFAULT_LABEL_COLS)

    chunks = (
        pts.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(encode_bucket, batch_format="pandas")
    )
    chunks.write_parquet(chunks_dir)
    return sum(mf.file_row_counts(chunks_dir).values())


def _write_gaps(tdir: str, gaps_path: str, tier_ms: int) -> int:
    """Global staleness markers (pq's empty-tick emissions, Q3) — the
    distinct-window list post-rollup is tiny, so the setdiff runs on the
    driver via a parquet-metadata-light DuckDB scan."""
    import duckdb
    import pyarrow.parquet as pq

    present = (
        duckdb.sql(
            f"select distinct window_ts from read_parquet('{tdir}/*.parquet')"
        )
        .df()["window_ts"]
        .to_numpy()
    )
    gaps = global_gaps_table(present, tier_ms)
    import pyarrow as pa

    tmp = gaps_path + ".tmp"
    pq.write_table(pa.Table.from_pandas(gaps, preserve_index=False), tmp)
    os.replace(tmp, gaps_path)
    return len(gaps)


def run_cascade(
    corpus_path: str,
    out_dir: str,
    tiers: list[int] | None = None,
    *,
    num_buckets: int = 64,
    decode_batch_size: int = 2048,
    decode_concurrency: int | tuple = 8,
    chunk_min_tier_ms: int = 60_000,
    write_gaps: bool = True,
) -> dict:
    """Run (or resume) the full cascade. Returns per-tier stats."""
    tiers = tiers or DEFAULT_TIERS
    os.makedirs(out_dir, exist_ok=True)

    stats: dict = {"tier_rows": {}, "skipped": [], "raw_samples": 0}
    prev_path = corpus_path
    prev_fp = mf.dir_fingerprint(corpus_path)

    for i, tier_ms in enumerate(tiers):
        tdir = tier_dir(out_dir, tier_ms)
        if mf.is_complete(tdir, prev_fp):
            m = mf.load(tdir)
            stats["tier_rows"][str(tier_ms)] = m["rows_out"]
            if i == 0:
                stats["raw_samples"] = m.get("raw_samples", 0)
            stats["skipped"].append(tier_ms)
            prev_path, prev_fp = tdir, mf.dir_fingerprint(tdir)
            continue

        os.makedirs(tdir, exist_ok=True)
        for name in os.listdir(tdir):  # clear any partial previous attempt
            os.remove(os.path.join(tdir, name))

        t0 = time.perf_counter()
        if i == 0:
            corpus = rd.read_parquet(prev_path)
            samples = decode_dataset(
                corpus,
                batch_size=decode_batch_size,
                concurrency=decode_concurrency,
            )
            pts = rollup(samples, tier_ms, num_buckets=num_buckets)
            rows_in = -1  # raw samples counted below from the tier itself
        else:
            pts = cascade_step(
                rd.read_parquet(prev_path), tier_ms, num_buckets=num_buckets
            )
            rows_in = mf.load(tier_dir(out_dir, tiers[i - 1]))["rows_out"]

        pts.write_parquet(tdir)
        wall = time.perf_counter() - t0

        extra = {}
        if tier_ms >= chunk_min_tier_ms:
            chunks_dir = os.path.join(out_dir, "chunks", f"tier={tier_ms}")
            os.makedirs(chunks_dir, exist_ok=True)
            for name in os.listdir(chunks_dir):
                os.remove(os.path.join(chunks_dir, name))
            extra["chunk_rows"] = _write_chunks(tdir, chunks_dir, num_buckets)
        if write_gaps:
            gaps_dir = os.path.join(out_dir, "gaps")
            os.makedirs(gaps_dir, exist_ok=True)
            extra["gap_windows"] = _write_gaps(
                tdir, os.path.join(gaps_dir, f"tier={tier_ms}.parquet"), tier_ms
            )
        if i == 0:
            # raw samples = sum of per-window counts in the raw tier —
            # exact, no extra pass over the corpus.
            import duckdb

            raw_samples = int(
                duckdb.sql(
                    f"select sum(count) from read_parquet('{tdir}/*.parquet')"
                ).fetchone()[0]
            )
            extra["raw_samples"] = raw_samples
            rows_in = raw_samples
            stats["raw_samples"] = raw_samples

        m = mf.publish(
            tdir,
            tier_ms=tier_ms,
            input_path=prev_path,
            input_fingerprint=prev_fp,
            rows_in=rows_in,
            wall_sec=wall,
            extra=extra,
        )
        stats["tier_rows"][str(tier_ms)] = m["rows_out"]
        prev_path, prev_fp = tdir, mf.dir_fingerprint(tdir)

    return stats
