"""Rollup + cascade correctness vs a DuckDB oracle, and tier exactness."""

import duckdb
import numpy as np
import pytest

from pq_ray.fixtures import generate_tokens_table
from pq_ray.stages.decode import DecodeTokens, decode_dataset
from pq_ray.stages.rollup import cascade, finalize, rollup


@pytest.fixture(scope="module")
def corpus():
    return generate_tokens_table(400, seed=42)


@pytest.fixture(scope="module")
def samples_table(corpus):
    return DecodeTokens()(corpus)


def _oracle(samples_table, interval_ms):
    con = duckdb.connect()
    con.register("s", samples_table)
    return con.sql(
        f"""
        with w as (
          select *, (ts // {interval_ms}) * {interval_ms} as window_ts from s
        )
        select series_id, window_ts,
               sum(value) as sum, count(*) as count,
               min(value) as min, max(value) as max,
               min(ts) as first_ts, arg_min(value, ts) as first_v,
               max(ts) as last_ts, arg_max(value, ts) as last_v
        from w group by 1, 2 order by 1, 2
        """
    ).df()


@pytest.mark.parametrize("interval_ms", [1000, 60_000, 3_600_000])
def test_rollup_matches_duckdb(ray_session, corpus, samples_table, interval_ms):
    import ray.data as rd

    pts = rollup(
        decode_dataset(rd.from_arrow(corpus), batch_size=64, concurrency=2),
        interval_ms,
        num_buckets=8,
    )
    got = (
        pts.to_pandas()
        .sort_values(["series_id", "window_ts"])
        .reset_index(drop=True)
    )
    exp = _oracle(samples_table, interval_ms)
    assert len(got) == len(exp)
    assert np.allclose(got["sum"].to_numpy(), exp["sum"].to_numpy())
    for c in ["count", "min", "max", "first_ts", "last_ts"]:
        assert (
            got[c].to_numpy().astype(np.int64) == exp[c].to_numpy().astype(np.int64)
        ).all(), c
    # first_v/last_v: ts values are unique within a series here only when
    # STEP_MS spacing holds; ties are possible across docs in one series —
    # the oracle arg_min/arg_max tie-break is unspecified, so compare only
    # where the oracle window has a unique extreme ts.
    uniq = got["count"].to_numpy() == 1
    assert (got.loc[uniq, "first_v"] == exp.loc[uniq, "first_v"]).all()


def test_cascade_exactness(ray_session, corpus):
    """raw→1m→1h→1d: every tier equals the same rollup computed directly
    from raw samples (the continuous-aggregate re-aggregation guarantee)."""
    import ray.data as rd

    tiers = [60_000, 3_600_000, 86_400_000]
    prev = rollup(
        decode_dataset(rd.from_arrow(corpus), batch_size=64, concurrency=2),
        tiers[0],
        num_buckets=8,
    ).materialize()
    for coarser in tiers[1:]:
        direct = (
            rollup(
                decode_dataset(rd.from_arrow(corpus), batch_size=64, concurrency=2),
                coarser,
                num_buckets=8,
            )
            .to_pandas()
            .sort_values(["series_id", "window_ts"])
            .reset_index(drop=True)
        )
        casc = (
            cascade(prev, coarser, num_buckets=8)
            .to_pandas()
            .sort_values(["series_id", "window_ts"])
            .reset_index(drop=True)
        )
        assert len(direct) == len(casc)
        for c in ["count", "min", "max", "first_ts", "first_v", "last_ts", "last_v"]:
            assert (direct[c].to_numpy() == casc[c].to_numpy()).all(), c
        assert np.allclose(direct["sum"], casc["sum"])
        prev = cascade(prev, coarser, num_buckets=8).materialize()


def test_finalize_kernels(samples_table):
    import pandas as pd

    df = pd.DataFrame(
        {
            "series_id": [1],
            "window_ts": [0],
            "sum": [10.0],
            "count": [4],
            "min": [1.0],
            "max": [4.0],
            "first_ts": [100],
            "first_v": [1.0],
            "last_ts": [400],
            "last_v": [4.0],
        }
    )
    out = finalize(df, 60_000)
    assert out["avg"].iloc[0] == 2.5
    # Q7: pq's last_over_time returns the chronologically OLDEST sample
    assert out["last"].iloc[0] == 1.0
    assert out["rate"].iloc[0] == (4.0 - 1.0) / 60.0
