"""Distributed pq-semantics queries: oracle parity at sf0.001 AND
cross-check against the local conformance engine (the one that passes
the 21 goldens) — proving the Ray path computes pq's tick semantics."""

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
    "name",
    ["pq_sum_by_event_1m", "pq_max_by_event_1h", "pq_topk3_1h", "pq_count_over_time_5m"],
)
def test_oracle_parity(ray_session, con, name):
    from pq_ray.pipelines.pq_queries import ORACLES, QUERIES

    _compare(QUERIES[name](SF), con.sql(ORACLES[name]).df())


def test_distributed_matches_local_engine(ray_session, con):
    """The Ray-distributed sum-by matches the byte-exact local evaluator
    run over the identical samples — same tick grid, same values."""
    from pq_ray.pipelines.pq_queries import MINUTE, q_pq_sum_by_event_1m
    from pq_ray.query.engine import EvalContext, evaluate
    from pq_ray.query.parser import parse_expr

    events = con.sql(
        "select epoch_ms(ts) as ts_ms, event_type, "
        "cast(user_id % 10 as varchar) as user_mod, value from events order by ts_ms"
    ).df()
    samples = pd.DataFrame(
        {
            "ts": events["ts_ms"].to_numpy(np.int64),
            "seq": np.arange(len(events), dtype=np.int64),
            "name": "value",
            "value": events["value"].to_numpy(np.float64),
            "l_event_type": events["event_type"],
            "l_user_mod": events["user_mod"],
        }
    )
    ctx = EvalContext(
        samples=samples,
        label_cols=["event_type", "user_mod"],
        interval=MINUTE,
        lookback=MINUTE,
    )
    stream = evaluate(parse_expr("sum(value) by (event_type)"), ctx)
    local = stream.df[["tick", "l_event_type", "value"]].rename(
        columns={"l_event_type": "event_type", "value": "sum_value"}
    )
    local["sum_value"] = local["sum_value"].round(6)

    dist = q_pq_sum_by_event_1m(SF)
    _compare(dist, local)
    # and the local engine's empty-tick spine covers every grid tick
    assert len(stream.ticks) >= local["tick"].nunique()


def test_pq_queries_empty_input_yield_empty_frames(ray_session, tmp_path):
    """A selector matching NOTHING emits nothing in the reference's pull
    loop; the distributed tick-grid queries must do the same instead of
    crashing on the missing grid anchor (t0 = min ts of an empty set)."""
    import pyarrow.parquet as pq_

    from pq_ray.pipelines.pq_queries import QUERIES

    src = "/root/testdata/sf0.001/events.parquet"
    d = tmp_path / "sf"
    d.mkdir()
    pq_.write_table(pq_.read_schema(src).empty_table(), d / "events.parquet")
    for name, fn in QUERIES.items():
        out = fn(str(d))
        assert len(out) == 0, name
        assert len(out.columns) >= 2, name  # typed empty, not schema-less


@pytest.mark.parametrize("lb_mult", [2, 3])
def test_distributed_general_lookback_matches_local_engine(
    ray_session, con, lb_mult
):
    """VERDICT r4 #5: lookback > interval — the distributed multi-tick
    explode grid (_exploded_instant_partials) matches the byte-exact
    local evaluator at lookback = 2x and 3x the interval."""
    from pq_ray.pipelines.pq_queries import MINUTE, q_pq_sum_by_event_1m
    from pq_ray.query.engine import EvalContext, evaluate
    from pq_ray.query.parser import parse_expr

    events = con.sql(
        "select epoch_ms(ts) as ts_ms, event_type, "
        "cast(user_id % 10 as varchar) as user_mod, value from events order by ts_ms"
    ).df()
    samples = pd.DataFrame(
        {
            "ts": events["ts_ms"].to_numpy(np.int64),
            "seq": np.arange(len(events), dtype=np.int64),
            "name": "value",
            "value": events["value"].to_numpy(np.float64),
            "l_event_type": events["event_type"],
            "l_user_mod": events["user_mod"],
        }
    )
    ctx = EvalContext(
        samples=samples,
        label_cols=["event_type", "user_mod"],
        interval=MINUTE,
        lookback=lb_mult * MINUTE,
    )
    stream = evaluate(parse_expr("sum(value) by (event_type)"), ctx)
    local = stream.df[["tick", "l_event_type", "value"]].rename(
        columns={"l_event_type": "event_type", "value": "sum_value"}
    )
    local["sum_value"] = local["sum_value"].round(6)

    dist = q_pq_sum_by_event_1m(SF, lookback=lb_mult * MINUTE)
    _compare(dist, local)


def test_lookback2m_query_oracle_parity(ray_session, con):
    """The driver-registered general-lookback row hashes against its
    generate_series + windowed-join oracle."""
    from pq_ray.pipelines.pq_queries import ORACLES, QUERIES

    got = QUERIES["pq_sum_by_event_1m_lb2m"](SF)
    exp = con.sql(ORACLES["pq_sum_by_event_1m_lb2m"]).df()
    _compare(got, exp)
