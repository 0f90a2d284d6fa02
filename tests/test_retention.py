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


def test_compaction_crash_recovery_no_duplicates(ray_session, tmp_path):
    """ADVICE r4 #1: a crash between the compacted file's rename and the
    input removals must NOT double-count rows or bake duplicates into
    the tier on the next compact run — the journal rolls the bin
    forward."""
    import json
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as papq

    from pq_ray.pipelines.retention import (
        COMPACT_JOURNAL,
        compact_tier,
        recover_compaction,
    )

    corpus = str(tmp_path / "corpus")
    out = str(tmp_path / "out")
    write_tokens_corpus(corpus, 400, seed=7)
    run_cascade(corpus, out, tiers=[1000, 60_000], num_buckets=8,
                decode_batch_size=128)
    tdir = tier_dir(out, 1000)
    con = duckdb.connect()
    q = f"select count(*) from read_parquet('{tdir}/*.parquet')"
    rows_before = con.sql(q).fetchone()[0]

    # simulate the crash window: merge two input files into a durable
    # compacted output, write the journal, but "die" before removing
    # the inputs
    parts = sorted(
        n for n in os.listdir(tdir) if n.endswith(".parquet")
    )[:2]
    tables = [papq.read_table(os.path.join(tdir, n)) for n in parts]
    dst = "compacted-99990.parquet"
    with open(os.path.join(tdir, COMPACT_JOURNAL), "w") as f:
        json.dump({"dst": dst, "inputs": parts}, f)
    papq.write_table(
        pa.concat_tables(tables, promote_options="default"),
        os.path.join(tdir, dst),
    )
    # duplicates now on disk: rows counted twice
    assert con.sql(q).fetchone()[0] > rows_before

    # the next compact run recovers FIRST, then compacts — row count is
    # exactly the pre-crash count, and the journal is gone
    rep = compact_tier(out, 1000, target_rows=10**9)
    assert rep["recovered_leftovers"] == len(parts)
    assert not os.path.exists(os.path.join(tdir, COMPACT_JOURNAL))
    assert con.sql(q).fetchone()[0] == rows_before

    # roll-back path: journal without a durable output clears cleanly
    with open(os.path.join(tdir, COMPACT_JOURNAL), "w") as f:
        json.dump({"dst": "compacted-88888.parquet", "inputs": []}, f)
    with open(os.path.join(tdir, "compacted-88888.parquet.tmp"), "w") as f:
        f.write("partial")
    assert recover_compaction(tdir) == 0
    assert not os.path.exists(os.path.join(tdir, COMPACT_JOURNAL))
    assert not os.path.exists(
        os.path.join(tdir, "compacted-88888.parquet.tmp")
    )
    assert con.sql(q).fetchone()[0] == rows_before
