"""End-to-end cascade pipeline: manifests, chunks, gaps, resume."""

import hashlib
import json
import os
import shutil

import numpy as np
import pandas as pd
import pytest

from pq_ray.fixtures import write_tokens_corpus
from pq_ray.pipelines.cascade import chunks_dir, run_cascade, tier_dir
from pq_ray.stages.gapfill import fill_series, global_gap_windows
from pq_ray.state import manifest as mf
from pq_ray.state.gorilla import decode_chunk


def _dir_md5(path: str) -> dict:
    out = {}
    for name in sorted(os.listdir(path)):
        p = os.path.join(path, name)
        if os.path.isfile(p) and name.endswith(".parquet"):
            out[name] = hashlib.md5(open(p, "rb").read()).hexdigest()
    return out


@pytest.fixture(scope="module")
def cascade_run(ray_session, tmp_path_factory):
    base = tmp_path_factory.mktemp("cascade")
    corpus = str(base / "corpus")
    out = str(base / "out")
    write_tokens_corpus(corpus, 800, seed=42)
    stats = run_cascade(
        corpus, out, tiers=[1000, 60_000, 3_600_000], num_buckets=8,
        decode_batch_size=256, decode_concurrency=2,
    )
    return corpus, out, stats


def test_manifests_and_lineage(cascade_run):
    corpus, out, stats = cascade_run
    assert stats["raw_samples"] > 0
    for tier in [1000, 60_000, 3_600_000]:
        m = mf.load(tier_dir(out, tier))
        assert m["completed"]
        assert m["rows_out"] == stats["tier_rows"][str(tier)]
        assert m["rows_out"] == sum(m["files"].values())  # per-file lineage
        assert m["input_fingerprint"] == mf.dir_fingerprint(corpus)
        assert m["input_path"] == corpus  # fused job: every tier from corpus


def test_resume_is_noop_and_byte_identical(cascade_run):
    corpus, out, stats = cascade_run
    before = {t: _dir_md5(tier_dir(out, t)) for t in [1000, 60_000, 3_600_000]}
    stats2 = run_cascade(
        corpus, out, tiers=[1000, 60_000, 3_600_000], num_buckets=8,
        decode_batch_size=256, decode_concurrency=2,
    )
    assert sorted(stats2["skipped"]) == [1000, 60_000, 3_600_000]
    after = {t: _dir_md5(tier_dir(out, t)) for t in [1000, 60_000, 3_600_000]}
    assert before == after


def test_resume_mid_cascade(ray_session, tmp_path):
    """Interrupted run (only some tiers written), then rerun the full
    cascade — the incomplete manifest set forces a recompute, and the
    outputs match an uninterrupted run exactly."""
    corpus = str(tmp_path / "corpus")
    write_tokens_corpus(corpus, 400, seed=42)
    partial_out = str(tmp_path / "partial")
    full_out = str(tmp_path / "full")
    run_cascade(corpus, partial_out, tiers=[1000, 60_000], num_buckets=8,
                decode_batch_size=256, decode_concurrency=2)
    # resume with the full tier list: the completed fine tiers are
    # skipped (their manifests match) and ONLY the missing 1h tier is
    # rebuilt — from the written 1m tier, without re-decoding the corpus
    stats = run_cascade(corpus, partial_out, tiers=[1000, 60_000, 3_600_000],
                        num_buckets=8, decode_batch_size=256, decode_concurrency=2)
    assert stats.get("resumed") == "fine_tiers"
    assert stats["skipped"] == [1000, 60_000]
    run_cascade(corpus, full_out, tiers=[1000, 60_000, 3_600_000], num_buckets=8,
                decode_batch_size=256, decode_concurrency=2)
    # same 1h points either way (sort-insensitive compare)
    import duckdb

    a = duckdb.sql(
        f"select * from read_parquet('{tier_dir(partial_out, 3_600_000)}/*.parquet') order by series_id, window_ts"
    ).df()
    b = duckdb.sql(
        f"select * from read_parquet('{tier_dir(full_out, 3_600_000)}/*.parquet') order by series_id, window_ts"
    ).df()
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))


def test_chunks_roundtrip_points(cascade_run):
    corpus, out, stats = cascade_run
    import duckdb

    tier = 60_000
    pts = duckdb.sql(
        f"select * from read_parquet('{tier_dir(out, tier)}/*.parquet')"
    ).df()
    chunks = duckdb.sql(
        f"select * from read_parquet('{chunks_dir(out, tier)}/*.parquet')"
    ).df()
    assert chunks["n"].sum() == len(pts)
    # decode one chunk and compare against the points
    row = chunks.iloc[0].to_dict()
    dec = decode_chunk(row)
    sid = row["series_id"]
    exp = pts[pts["series_id"] == sid].sort_values("window_ts")
    assert np.array_equal(dec["window_ts"].to_numpy(), exp["window_ts"].to_numpy())
    for c in ["sum", "count", "min", "max", "first_v", "last_v"]:
        assert np.array_equal(
            dec[c].to_numpy().view(np.uint64),
            exp[c].to_numpy(dtype=np.float64).view(np.uint64),
        ), c


def test_gap_sidecars(cascade_run):
    corpus, out, stats = cascade_run
    import duckdb

    for tier in [1000, 60_000]:
        gaps = duckdb.sql(
            f"select * from read_parquet('{out}/gaps/tier={tier}.parquet')"
        ).df()
        present = duckdb.sql(
            f"select distinct window_ts from read_parquet('{tier_dir(out, tier)}/*.parquet')"
        ).df()["window_ts"].to_numpy()
        expected = global_gap_windows(present, tier)
        assert np.array_equal(np.sort(gaps["window_ts"].to_numpy()), expected)
        # markers + present windows = dense spine
        spine = np.arange(present.min(), present.max() + 1, tier)
        assert len(gaps) + len(np.unique(present)) == len(spine)


def test_fill_series_densifies():
    df = pd.DataFrame(
        {
            "series_id": [1, 1, 1],
            "window_ts": [0, 120_000, 180_000],
            "name": ["m"] * 3,
            "sum": [1.0, 2.0, 3.0],
            "count": [1, 1, 1],
            "min": [0.0] * 3,
            "max": [0.0] * 3,
            "first_ts": [0] * 3,
            "first_v": [0.0] * 3,
            "last_ts": [0] * 3,
            "last_v": [0.0] * 3,
        }
    )
    out = fill_series(df, 60_000, ["name"])
    assert len(out) == 4
    gap = out[out["is_gap"]]
    assert list(gap["window_ts"]) == [60_000]
    assert gap["count"].iloc[0] == 0 and np.isnan(gap["sum"].iloc[0])


def test_read_chunks_reconstructs_points(cascade_run):
    """Decoding the chunk store reproduces the tier points bit-exactly —
    the compressed tier is a full substitute for the points files."""
    import duckdb

    from pq_ray.state.gorilla import read_chunks

    corpus, out, stats = cascade_run
    tier = 60_000
    decoded = (
        read_chunks(chunks_dir(out, tier))
        .to_pandas()
        .sort_values(["series_id", "window_ts"])
        .reset_index(drop=True)
    )
    pts = (
        duckdb.sql(
            f"select * from read_parquet('{tier_dir(out, tier)}/*.parquet')"
        )
        .df()
        .sort_values(["series_id", "window_ts"])
        .reset_index(drop=True)
    )
    assert len(decoded) == len(pts)
    assert (decoded["window_ts"].to_numpy() == pts["window_ts"].to_numpy()).all()
    for c in ["sum", "count", "min", "max", "first_v", "last_v"]:
        assert np.array_equal(
            decoded[c].to_numpy(dtype=np.float64).view(np.uint64),
            pts[c].to_numpy(dtype=np.float64).view(np.uint64),
        ), c
    assert (decoded["source"].to_numpy() == pts["source"].to_numpy()).all()


def test_resume_corpus_change_forces_recompute(ray_session, tmp_path):
    """A changed corpus invalidates the fine-tier manifests: the rerun
    must NOT take the mid-cascade resume path."""
    corpus = str(tmp_path / "corpus")
    write_tokens_corpus(corpus, 300, seed=42)
    out = str(tmp_path / "out")
    run_cascade(corpus, out, tiers=[1000, 60_000, 3_600_000], num_buckets=8,
                decode_batch_size=256, decode_concurrency=2)
    # remove the coarse manifest AND change the corpus
    import os
    import shutil

    shutil.rmtree(tier_dir(out, 3_600_000), ignore_errors=True)
    shutil.rmtree(corpus)
    write_tokens_corpus(corpus, 350, seed=7)
    stats = run_cascade(corpus, out, tiers=[1000, 60_000, 3_600_000],
                        num_buckets=8, decode_batch_size=256,
                        decode_concurrency=2)
    assert "resumed" not in stats
    assert stats["skipped"] == []


def test_narrow_equals_wide_exchange(ray_session, tmp_path):
    """The compact 22-byte wire schema must produce byte-identical tier
    points to the wide f64/i64 schema."""
    import duckdb

    corpus = str(tmp_path / "corpus")
    write_tokens_corpus(corpus, 500, seed=13)
    out_n = str(tmp_path / "narrow")
    out_w = str(tmp_path / "wide")
    for out, narrow in ((out_n, True), (out_w, False)):
        run_cascade(corpus, out, tiers=[1000, 60_000, 3_600_000], num_buckets=8,
                    narrow_exchange=narrow)
    for tier in (1000, 60_000, 3_600_000):
        a = duckdb.sql(
            f"select * from read_parquet('{tier_dir(out_n, tier)}/*.parquet') order by series_id, window_ts"
        ).df().reset_index(drop=True)
        b = duckdb.sql(
            f"select * from read_parquet('{tier_dir(out_w, tier)}/*.parquet') order by series_id, window_ts"
        ).df().reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b), tier


def test_non_day_aligned_tier_span(ray_session, tmp_path):
    """A middle tier whose span does not divide EPOCH0 (90 minutes)
    exercises the absolute-window bucket key: tier outputs must equal a
    direct rollup from raw at the same span (no split/duplicated
    windows)."""
    import duckdb

    corpus = str(tmp_path / "corpus")
    write_tokens_corpus(corpus, 300, seed=21)
    out = str(tmp_path / "out")
    span_90m = 5_400_000
    run_cascade(corpus, out, tiers=[1000, span_90m, 3 * span_90m], num_buckets=8)
    pts = duckdb.sql(
        f"select series_id, window_ts, count(*) c from read_parquet('{tier_dir(out, span_90m)}/*.parquet') group by 1,2 having count(*) > 1"
    ).df()
    assert len(pts) == 0  # one row per (series, window): nothing straddled
    # re-aggregation exactness: sum of counts matches the raw tier
    raw = duckdb.sql(
        f"select sum(count) from read_parquet('{tier_dir(out, 1000)}/*.parquet')"
    ).fetchone()[0]
    mid = duckdb.sql(
        f"select sum(count) from read_parquet('{tier_dir(out, span_90m)}/*.parquet')"
    ).fetchone()[0]
    assert raw == mid
