"""Join stages (broadcast / shuffle) and the TPC-H-shaped relational
queries, pinned to DuckDB oracles at sf0.001."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from pq_ray.pipelines import relational as rel
from pq_ray.stages.join import broadcast_join, shuffle_join

SF_DIR = "/root/testdata/sf0.001"


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "nation", "events"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con.sql(sql).df()


def _assert_frames_equal(mine: pd.DataFrame, oracle: pd.DataFrame):
    assert list(sorted(mine.columns)) == list(sorted(oracle.columns))
    mine = mine[sorted(mine.columns)].reset_index(drop=True)
    oracle = oracle[sorted(oracle.columns)].reset_index(drop=True)
    assert len(mine) == len(oracle)
    for c in mine.columns:
        if np.issubdtype(mine[c].dtype, np.number):
            assert np.array_equal(
                mine[c].to_numpy(), oracle[c].to_numpy(), equal_nan=True
            ), c
        else:
            assert (mine[c].astype(str) == oracle[c].astype(str)).all(), c


@pytest.mark.parametrize("name", sorted(rel.QUERIES))
def test_relational_queries_match_oracle(ray_session, name):
    _assert_frames_equal(rel.QUERIES[name](SF_DIR), _oracle(rel.ORACLES[name]))


# ---------------------------------------------------------------------------
# join stage units
# ---------------------------------------------------------------------------


def _left_table(n=1000, seed=7):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "k": pa.array(rng.integers(0, 50, n), type=pa.int64()),
            "v": pa.array(rng.normal(size=n)),
        }
    )


def _right_table():
    return pa.table(
        {
            "rk": pa.array(np.arange(0, 40, dtype=np.int64)),
            "tag": pa.array([f"t{i % 5}" for i in range(40)]),
        }
    )


def test_shuffle_join_equals_broadcast_join(ray_session):
    left, right = _left_table(), _right_table()
    b = (
        broadcast_join(
            rd.from_arrow(left).repartition(4), right, keys="k", right_keys="rk"
        )
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    s = (
        shuffle_join(
            rd.from_arrow(left).repartition(4),
            rd.from_arrow(right).repartition(2),
            "k",
            "rk",
            num_buckets=4,
        )
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    # keys 40..49 have no right match → dropped by inner join
    assert (b["k"] < 40).all()
    assert len(b) == len(s)
    pd.testing.assert_frame_equal(b[["k", "v", "tag"]], s[["k", "v", "tag"]])


def test_broadcast_join_types(ray_session):
    left = pa.table({"k": pa.array([1, 2, 3, 99], type=pa.int64()),
                     "v": pa.array([1.0, 2.0, 3.0, 4.0])})
    right = pa.table({"k": pa.array([1, 2, 3], type=pa.int64()),
                      "tag": pa.array(["a", "b", "c"])})
    ds = rd.from_arrow(left).repartition(2)
    semi = broadcast_join(ds, right.select(["k"]), keys="k", join_type="left semi")
    assert sorted(semi.to_pandas()["k"].tolist()) == [1, 2, 3]
    anti = broadcast_join(ds, right.select(["k"]), keys="k", join_type="left anti")
    assert anti.to_pandas()["k"].tolist() == [99]
    outer = broadcast_join(ds, right, keys="k", join_type="left outer").to_pandas()
    assert len(outer) == 4
    assert outer.loc[outer["k"] == 99, "tag"].isna().all()


def test_shuffle_join_string_keys(ray_session):
    left = pa.table({"s": pa.array(["a", "b", "c", "a", "zz"]),
                     "v": pa.array([1, 2, 3, 4, 5], type=pa.int64())})
    right = pa.table({"s": pa.array(["a", "b", "c"]),
                      "w": pa.array([10, 20, 30], type=pa.int64())})
    out = (
        shuffle_join(
            rd.from_arrow(left).repartition(2),
            rd.from_arrow(right),
            "s",
            num_buckets=3,
        )
        .to_pandas()
        .sort_values(["s", "v"])
        .reset_index(drop=True)
    )
    assert out["s"].tolist() == ["a", "a", "b", "c"]
    assert out["w"].tolist() == [10, 10, 20, 30]


def test_driver_contract_includes_relational():
    import __ray_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    for name in rel.QUERIES:
        assert name in qs and name in os_


def test_driver_order_fully_implemented():
    """In a full environment every _ORDER name must resolve — the
    import-tolerant _modules() would otherwise silently shrink the
    driver surface (ImportError degradation is for broken optional
    deps only)."""
    import __ray_entry__ as e

    qs = e.queries()
    missing = [n for n in e._ORDER if n not in qs]
    assert not missing, f"_ORDER names without an implementation: {missing}"


# ---------------------------------------------------------------------------
# skew salting (explicit hot-key split, per the north rule)
# ---------------------------------------------------------------------------


def _skewed_sides(seed=13, n_left=20_000, hot_share=0.6):
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, 200, n_left).astype(np.int64)
    keys[: int(n_left * hot_share)] = 7  # one dominant key
    rng.shuffle(keys)
    left = pa.table({"k": pa.array(keys), "v": pa.array(rng.normal(size=n_left))})
    right = pa.table(
        {
            "k": pa.array(np.arange(0, 150, dtype=np.int64)),
            "tag": pa.array([f"t{i % 4}" for i in range(150)]),
        }
    )
    return left, right


@pytest.mark.parametrize("join_type", ["inner", "left outer", "left semi", "left anti"])
def test_salted_shuffle_join_matches_unsalted(ray_session, join_type):
    left, right = _skewed_sides()
    lds = rd.from_arrow(left).repartition(8)
    rds = rd.from_arrow(right).repartition(4)
    plain = shuffle_join(lds, rds, "k", "k", num_buckets=8,
                         join_type=join_type).to_pandas()
    salted = shuffle_join(lds, rds, "k", "k", num_buckets=8,
                          join_type=join_type, hot_keys=[7], salt=4).to_pandas()
    sort_cols = [c for c in plain.columns]
    a = plain.sort_values(sort_cols).reset_index(drop=True)
    b = salted.sort_values(sort_cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_salted_join_rejects_right_anchored_types(ray_session):
    left, right = _skewed_sides(n_left=100)
    with pytest.raises(ValueError):
        shuffle_join(rd.from_arrow(left), rd.from_arrow(right), "k",
                     join_type="right outer", hot_keys=[7])


def test_detect_hot_keys_finds_planted_key(ray_session):
    from pq_ray.stages.join import detect_hot_keys

    left, _ = _skewed_sides()
    hot = detect_hot_keys(rd.from_arrow(left).repartition(8), "k", num_buckets=8)
    assert hot == [7]


def test_salting_actually_spreads_the_hot_key(ray_session):
    """The hot key's left rows land in `salt` distinct buckets with a
    balanced split, and every salted bucket sees the full right slice."""
    import pyarrow.compute as pc

    from pq_ray.stages.exchange import split_stream

    left, right = _skewed_sides(n_left=8_000)
    num_buckets, salt = 8, 4

    # replicate the operator's tagging, then inspect bucket histograms
    from pq_ray.stages.join import _key_buckets

    def tag_left(t):
        b = _key_buckets(t["k"], num_buckets)
        m = pc.equal(t["k"], 7).to_numpy(zero_copy_only=False)
        n = int(m.sum())
        if n:
            b[m] = num_buckets + (np.arange(n) % salt)
        return t.append_column("__bucket", pa.array(b))

    lds = rd.from_arrow(left).repartition(8).map_batches(
        tag_left, batch_format="pyarrow"
    )
    df = lds.to_pandas()
    hot = df[df["k"] == 7]
    counts = hot["__bucket"].value_counts()
    assert sorted(counts.index) == list(range(num_buckets, num_buckets + salt))
    assert counts.max() <= int(np.ceil(len(hot) / salt)) + 8  # near-even
    assert not (df[df["k"] != 7]["__bucket"] >= num_buckets).any()


@pytest.mark.parametrize("join_type,expect", [("inner", 0), ("left anti", 1000)])
def test_shuffle_join_tolerates_empty_side(ray_session, join_type, expect):
    """A side that a filter emptied entirely (legitimate: a NOT EXISTS
    probe matching nothing) must not crash the per-bucket gathers."""
    left = _left_table(1000)
    right = _right_table()
    rds = rd.from_arrow(right).map_batches(
        lambda t: t.slice(0, 0), batch_format="pyarrow"
    )
    out = shuffle_join(rd.from_arrow(left), rds, "k", "rk",
                       num_buckets=4, join_type=join_type).to_pandas()
    assert len(out) == expect


def test_empty_schemaless_side_fails_loud_for_outer_types(ray_session):
    """With a globally empty schema-less side, results needing that
    side's columns (outer joins) must raise, not silently change shape."""
    left, right = _skewed_sides(n_left=100)
    rds = rd.from_arrow(right).map_batches(
        lambda t: t.slice(0, 0), batch_format="pyarrow"
    )
    with pytest.raises(Exception):
        shuffle_join(rd.from_arrow(left), rds, "k", "rk",
                     num_buckets=4, join_type="left outer").to_pandas()


def test_salted_join_string_keys(ray_session):
    rng = np.random.default_rng(3)
    keys = rng.choice(["cold1", "cold2", "cold3"], 5000).astype(object)
    keys[:3000] = "hot"
    rng.shuffle(keys)
    left = pa.table({"k": pa.array(list(keys), type=pa.string()),
                     "v": pa.array(rng.normal(size=len(keys)))})
    right = pa.table({"k": pa.array(["hot", "cold1", "cold2"], type=pa.string()),
                      "tag": pa.array(["H", "C1", "C2"])})
    from pq_ray.stages.join import detect_hot_keys

    lds = rd.from_arrow(left).repartition(6)
    hot = detect_hot_keys(lds, "k", num_buckets=4)
    assert hot == ["hot"]
    plain = shuffle_join(lds, rd.from_arrow(right), "k",
                         num_buckets=4).to_pandas()
    salted = shuffle_join(lds, rd.from_arrow(right), "k", num_buckets=4,
                          hot_keys=hot, salt=4).to_pandas()
    a = plain.sort_values(list(plain.columns)).reset_index(drop=True)
    b = salted.sort_values(list(salted.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_users_outer_customers_matches_duckdb_full_outer(ray_session):
    from pq_ray.pipelines.relational import ORACLES, QUERIES

    got = QUERIES["rel_users_outer_customers"](SF_DIR)
    exp = _oracle(ORACLES["rel_users_outer_customers"])
    assert len(got) == len(exp) and len(got) > 0
    for c in got.columns:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c
    # the full-outer really has a NULL-side: customers without events
    assert (~got["has_events"]).any()
