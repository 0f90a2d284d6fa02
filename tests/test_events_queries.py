"""Events-pipeline queries: oracle parity at sf0.001 for the ops whose
kernels round 3 touched (JSON props extraction, gap-fill), plus
fast-path vs reference-parity-path equality for the props decoder."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(f"create view events as select * from read_parquet('{SF}/events.parquet')")
    return c


def _compare(got, exp):
    gs = got.sort_values(list(got.columns)).reset_index(drop=True)[sorted(got.columns)]
    es = exp.sort_values(list(exp.columns)).reset_index(drop=True)[sorted(exp.columns)]
    assert len(gs) == len(es), (len(gs), len(es))
    for c in gs.columns:
        a, b = gs[c].to_numpy(), es[c].to_numpy()
        if a.dtype.kind == "f":
            assert np.allclose(a, b), c
        else:
            assert (a == b).all(), c


@pytest.mark.parametrize(
    "name", ["events_props_k", "events_gapfill_1m", "events_hour_profile",
             "events_rollup_1h_gorilla"]
)
def test_oracle_parity(ray_session, con, name):
    from pq_ray.pipelines.events import ORACLES, QUERIES

    _compare(QUERIES[name](SF), con.sql(ORACLES[name]).df())


def test_props_k_fast_path_matches_registry_decoder(ray_session):
    """The Arrow-native extract_regex fast path equals the reference's
    per-line JSON decoder path row for row."""
    from pq_ray.pipelines.events import q_props_k_by_event

    fast = q_props_k_by_event(SF)
    parity = q_props_k_by_event(SF, use_registry_decoder=True)
    _compare(fast, parity)


def test_gapfill_sink_streams_without_driver_materialization(
    ray_session, tmp_path
):
    """VERDICT r4 #4: sink_dir streams the dense spine to a partitioned
    parquet sink with a manifest and returns ONLY a summary; the parquet
    content equals the driver-path DataFrame, and a rerun with an
    unchanged input resumes as a no-op."""
    import duckdb

    from pq_ray.pipelines.events import q_gapfill_1m
    from pq_ray.state import manifest as mf

    sf = "/root/testdata/sf0.001"
    sink = str(tmp_path / "gapfill")
    summary = q_gapfill_1m(sf, sink_dir=sink)
    assert isinstance(summary, dict) and not summary["skipped"]
    assert summary["rows"] > 0

    df = q_gapfill_1m(sf)  # driver-contract path
    assert summary["rows"] == len(df)
    c = duckdb.connect()
    got = (
        c.sql(f"select * from read_parquet('{sink}/*.parquet')")
        .df()
        .sort_values(["event_type", "window_ts"])
        .reset_index(drop=True)[df.columns.tolist()]
    )
    pd.testing.assert_frame_equal(got, df, check_dtype=False)
    m = mf.load(sink)
    assert m["completed"] and m["rows_out"] == len(df)

    # resume: unchanged input -> no rewrite
    again = q_gapfill_1m(sf, sink_dir=sink)
    assert again["skipped"] and again["rows"] == len(df)


def test_outer_join_sink(ray_session, tmp_path):
    import duckdb

    from pq_ray.pipelines.relational import q_rel_users_outer_customers

    sf = "/root/testdata/sf0.001"
    sink = str(tmp_path / "outer")
    summary = q_rel_users_outer_customers(sf, sink_dir=sink)
    df = q_rel_users_outer_customers(sf)
    assert summary["rows"] == len(df)
    c = duckdb.connect()
    got = (
        c.sql(f"select * from read_parquet('{sink}/*.parquet')")
        .df()
        .sort_values("key")
        .reset_index(drop=True)[df.columns.tolist()]
    )
    pd.testing.assert_frame_equal(got, df, check_dtype=False)
