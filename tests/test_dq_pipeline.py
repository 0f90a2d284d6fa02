"""Driver-facing distributed-query pipelines (pipelines/dq.py): the
exchange-based combinators against their DuckDB oracles at sf0.001."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(f"create view events as select * from read_parquet('{SF}/events.parquet')")
    return c


@pytest.mark.parametrize("name", [
    "dq_agg_div_1h", "dq_subquery_sum_1h",
    "dq_topk2_1h", "dq_unless_avg_1h", "dq_group_share_1h",
    "dq_changes_1h", "dq_median_1h", "dq_histq_1h",
])
def test_dq_oracle_parity(ray_session, con, name):
    from pq_ray.pipelines.dq import ORACLES, QUERIES

    got = QUERIES[name](SF)
    exp = con.sql(ORACLES[name]).df()
    assert len(got) == len(exp) and len(got) > 0
    assert list(got.columns) == list(exp.columns)
    for c in got.columns:
        a, b = got[c].to_numpy(), exp[c].to_numpy()
        if a.dtype.kind == "f":
            assert (a == b.astype(a.dtype)).all(), c  # exact (cents plan)
        else:
            assert (a.astype(str) == b.astype(str)).all(), c


def test_selector_partials_tree_gather_parity(ray_session):
    """The selector-partials reduce is its own associative combine;
    forcing a deep tree gather must not change any oracled result."""
    import duckdb

    import pq_ray.stages.exchange as ex
    from pq_ray.pipelines.dq import ORACLES, QUERIES

    sf = "/root/testdata/sf0.001"
    name = "dq_agg_div_1h"
    old = ex.GATHER_FANIN
    try:
        ex.GATHER_FANIN = 2
        got = QUERIES[name](sf)
    finally:
        ex.GATHER_FANIN = old
    con = duckdb.connect()
    con.sql(
        f"create view events as select * from "
        f"read_parquet('{sf}/events.parquet')"
    )
    exp = con.sql(ORACLES[name]).df()
    g = got.sort_values(list(got.columns)).reset_index(drop=True)[
        sorted(got.columns)
    ]
    x = exp.sort_values(list(exp.columns)).reset_index(drop=True)[
        sorted(exp.columns)
    ]
    assert len(g) == len(x)
    assert g.astype(str).equals(x.astype(str))
