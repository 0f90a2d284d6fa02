"""Retention policy pruning over a cascade output."""

import duckdb
import pytest

from pq_ray.fixtures import write_tokens_corpus
from pq_ray.pipelines.cascade import run_cascade, tier_dir
from pq_ray.pipelines.retention import apply_retention
from pq_ray.state import manifest as mf


def test_retention_prunes_old_windows(ray_session, tmp_path):
    corpus = str(tmp_path / "corpus")
    out = str(tmp_path / "out")
    write_tokens_corpus(corpus, 600, seed=42)
    run_cascade(corpus, out, tiers=[1000, 60_000], num_buckets=8,
                decode_batch_size=256)

    con = duckdb.connect()
    raw = f"{tier_dir(out, 1000)}/*.parquet"
    lo, hi = con.sql(
        f"select min(window_ts), max(window_ts) from read_parquet('{raw}')"
    ).fetchone()
    # horizon in the middle of the raw tier; keep the 1m tier whole
    now = hi
    keep_raw = (hi - lo) // 2
    report = apply_retention(out, now, {1000: keep_raw, 60_000: None})
    assert report[1000]["rows_dropped"] > 0
    new_lo = con.sql(
        f"select min(window_ts) from read_parquet('{raw}')"
    ).fetchone()[0]
    assert new_lo >= now - keep_raw
    # manifest refreshed and horizon recorded
    m = mf.load(tier_dir(out, 1000))
    assert m["retention_horizon_ms"] == now - keep_raw
    assert m["rows_out"] == con.sql(
        f"select count(*) from read_parquet('{raw}')"
    ).fetchone()[0]
    # untouched tier intact
    assert 60_000 not in report


def test_retention_idempotent(ray_session, tmp_path):
    corpus = str(tmp_path / "corpus")
    out = str(tmp_path / "out")
    write_tokens_corpus(corpus, 300, seed=42)
    run_cascade(corpus, out, tiers=[1000], num_buckets=4, decode_batch_size=256)
    import duckdb

    raw = f"{tier_dir(out, 1000)}/*.parquet"
    lo, hi = duckdb.sql(
        f"select min(window_ts), max(window_ts) from read_parquet('{raw}')"
    ).fetchone()
    now, keep = hi, (hi - lo) // 3
    r1 = apply_retention(out, now, {1000: keep})
    r2 = apply_retention(out, now, {1000: keep})
    assert r2[1000]["rows_dropped"] == 0
    assert r2[1000]["dropped_files"] == 0


def test_compaction_merges_small_files_losslessly(ray_session, tmp_path):
    """compact_tier merges a tier's small files into ~target_rows files:
    identical row multiset before/after (value-hash via DuckDB), fewer
    files, manifest row counts refreshed, and a second pass is a no-op."""
    from pq_ray.pipelines.retention import compact_tier

    corpus = str(tmp_path / "corpus")
    out = str(tmp_path / "out")
    write_tokens_corpus(corpus, 300, seed=42)
    run_cascade(corpus, out, tiers=[1000], num_buckets=8,
                decode_batch_size=128)
    tdir = tier_dir(out, 1000)
    glob = f"{tdir}/*.parquet"

    def snapshot():
        return duckdb.sql(
            f"""select count(*) n, sum(hash(series_id, window_ts,
                       round(sum, 6), count)) h
                from read_parquet('{glob}')"""
        ).fetchone()

    before = snapshot()
    n_before = len([n for n in __import__("os").listdir(tdir)
                    if n.endswith(".parquet")])
    assert n_before > 1  # 8 buckets → several files
    rep = compact_tier(out, 1000, target_rows=10**9)  # one big bin
    assert rep["merged_files"] == n_before
    assert rep["files_after"] == 1
    assert snapshot() == before  # lossless
    m = mf.load(tdir)
    assert m["rows_out"] == before[0] and m["compacted"] is True
    rep2 = compact_tier(out, 1000, target_rows=10**9)
    assert rep2["merged_files"] == 0 and rep2["files_after"] == 1


def test_compaction_rerun_with_new_files_never_loses_data(ray_session, tmp_path):
    """Regression: a second compaction run used to restart the output
    counter at 0, overwrite the prior run's compacted file with a bin
    that INCLUDED it, then delete it as an input — losing the bin."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pq_ray.pipelines.retention import compact_tier

    corpus = str(tmp_path / "corpus")
    out = str(tmp_path / "out")
    write_tokens_corpus(corpus, 200, seed=42)
    run_cascade(corpus, out, tiers=[1000], num_buckets=4,
                decode_batch_size=128)
    tdir = tier_dir(out, 1000)
    glob = f"{tdir}/*.parquet"

    def total():
        return duckdb.sql(
            f"select count(*) from read_parquet('{glob}')"
        ).fetchone()[0]

    n0 = total()
    compact_tier(out, 1000, target_rows=10**9)
    # simulate a later incremental run adding small files
    sample = pq.read_table(
        os.path.join(tdir, sorted(
            n for n in os.listdir(tdir) if n.endswith(".parquet"))[0])
    )
    extra_rows = 0
    for i in range(3):
        piece = sample.slice(i, 1)
        pq.write_table(piece, os.path.join(tdir, f"later-{i}.parquet"))
        extra_rows += piece.num_rows
    assert total() == n0 + extra_rows
    compact_tier(out, 1000, target_rows=10**9)
    assert total() == n0 + extra_rows  # nothing lost
    compact_tier(out, 1000, target_rows=10**9)
    assert total() == n0 + extra_rows
