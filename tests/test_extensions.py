"""Extension operators — the reference PARSES these then panics
(src/query/binary.rs, src/query/aggregate.rs ``unimplemented!``); with
``EvalContext(extensions=True)`` we evaluate them with PromQL semantics.
Default stays parity (typed errors, covered in test_quirks)."""

import numpy as np
import pandas as pd
import pytest

from pq_ray.query.engine import EvalContext, QueryError, VectorMatchingError, evaluate
from pq_ray.query.parser import parse_expr


def _ctx(rows, label_cols=("l",), interval=1000, lookback=None, extensions=True):
    df = pd.DataFrame(rows, columns=["ts", "name", "value", *label_cols])
    df["seq"] = np.arange(len(df), dtype=np.int64)
    df["ts"] = df["ts"].astype(np.int64)
    df["value"] = df["value"].astype(np.float64)
    for c in label_cols:
        df[f"l_{c}"] = df.pop(c)
    return EvalContext(
        samples=df,
        label_cols=list(label_cols),
        interval=interval,
        lookback=lookback or interval,
        extensions=extensions,
    )


def _tick_vals(stream, tick):
    g = stream.df[stream.df["tick"] == tick]
    return sorted(g["value"].tolist())


# m and k share the same first-sample ts so their tick grids align
# (each selector anchors its grid at its own first matched sample)
ROWS = [
    (5000, "m", 1.0, "a"),
    (5000, "k", 10.0, "a"),
    (5100, "m", 2.0, "b"),
    (5200, "m", 3.0, "c"),
    (5400, "k", 20.0, "b"),
]


def test_and_keeps_matching_labelsets():
    s = evaluate(parse_expr("m and k"), _ctx(ROWS))
    # m{l=a}, m{l=b} survive (k has l=a, l=b); m{l=c} dropped
    assert _tick_vals(s, 5999) == [1.0, 2.0]
    # names kept from the lhs
    assert set(s.df["name"]) == {"m"}


def test_unless_drops_matching_labelsets():
    s = evaluate(parse_expr("m unless k"), _ctx(ROWS))
    assert _tick_vals(s, 5999) == [3.0]


def test_or_unions():
    s = evaluate(parse_expr("m or k"), _ctx(ROWS))
    # all three m series + no k (l=a, l=b already present in m)
    assert _tick_vals(s, 5999) == [1.0, 2.0, 3.0]
    # k-only labelset appears when m lacks it
    rows2 = ROWS + [(5500, "k", 30.0, "z")]  # same k grid (t0 unchanged)
    s2 = evaluate(parse_expr("m or k"), _ctx(rows2))
    assert _tick_vals(s2, 5999) == [1.0, 2.0, 3.0, 30.0]


def test_logical_requires_extensions():
    with pytest.raises(QueryError):
        evaluate(parse_expr("m and k"), _ctx(ROWS, extensions=False))


def test_group_left_many_to_one():
    rows = [
        (5000, "m", 1.0, "a", "x"),
        (5000, "k", 10.0, "a", None),
        (5100, "m", 2.0, "a", "y"),
    ]
    ctx = _ctx(rows, label_cols=("l", "sub"))
    s = evaluate(parse_expr("m * on(l) group_left k"), ctx)
    assert _tick_vals(s, 5999) == [10.0, 20.0]
    # names dropped (arithmetic)
    assert all(v is None or (isinstance(v, float) and np.isnan(v)) for v in s.df["name"])


def test_group_right_many_to_one():
    rows = [
        (5000, "m", 1.0, "a", "x"),
        (5000, "k", 10.0, "a", None),
        (5100, "m", 2.0, "a", "y"),
    ]
    ctx = _ctx(rows, label_cols=("l", "sub"))
    s = evaluate(parse_expr("k * on(l) group_right m"), ctx)
    assert _tick_vals(s, 5999) == [10.0, 20.0]


def test_group_left_collision_on_one_side():
    rows = [
        (5000, "m", 1.0, "a", "x"),
        (5000, "k", 10.0, "a", "p"),
        (5200, "k", 20.0, "a", "q"),  # two k rows match on(l) → collision
    ]
    ctx = _ctx(rows, label_cols=("l", "sub"))
    with pytest.raises(VectorMatchingError):
        evaluate(parse_expr("m * on(l) group_left k"), ctx)


def test_stddev_stdvar():
    rows = [(5000, "m", 2.0, "a"), (5100, "m", 4.0, "b"), (5200, "m", 6.0, "c")]
    ctx = _ctx(rows)
    var = evaluate(parse_expr("stdvar(m)"), ctx)
    sd = evaluate(parse_expr("stddev(m)"), ctx)
    assert np.isclose(_tick_vals(var, 5999)[0], 8.0 / 3.0)
    assert np.isclose(_tick_vals(sd, 5999)[0], np.sqrt(8.0 / 3.0))


def test_quantile_interpolation():
    rows = [(5000, "m", 1.0, "a"), (5100, "m", 2.0, "b"), (5200, "m", 3.0, "c"),
            (5300, "m", 4.0, "d")]
    ctx = _ctx(rows)
    q = evaluate(parse_expr("quantile(0.5, m)"), ctx)
    assert np.isclose(_tick_vals(q, 5999)[0], 2.5)
    q9 = evaluate(parse_expr("quantile(0.9, m)"), ctx)
    assert np.isclose(_tick_vals(q9, 5999)[0], 3.7)
    # out-of-range phi → +-inf (PromQL)
    qhi = evaluate(parse_expr("quantile(1.5, m)"), ctx)
    assert _tick_vals(qhi, 5999)[0] == np.inf


def test_count_values():
    rows = [(5000, "m", 2.0, "a"), (5100, "m", 2.0, "b"), (5200, "m", 3.0, "c")]
    ctx = _ctx(rows)
    s = evaluate(parse_expr('count_values("v", m)'), ctx)
    g = s.df[s.df["tick"] == 5999]
    got = dict(zip(g["l_v"], g["value"]))
    assert got == {"2": 2.0, "3": 1.0}


def test_aggregate_extensions_gated():
    rows = [(5000, "m", 2.0, "a")]
    for q in ("stddev(m)", "stdvar(m)", "quantile(0.5, m)", 'count_values("v", m)'):
        with pytest.raises(QueryError):
            evaluate(parse_expr(q), _ctx(rows, extensions=False))


def test_distributed_extensions(ray_session):
    import ray.data as rd

    from pq_ray.query.distributed import DistributedContext, evaluate_distributed

    rng = np.random.default_rng(5)
    n = 2000
    df = pd.DataFrame(
        {
            "ts": 1_700_000_000_000 + np.sort(rng.integers(0, 20_000, n)).astype(np.int64),
            "seq": np.arange(n, dtype=np.int64),
            "name": rng.choice(["m", "k"], n),
            "value": rng.integers(0, 50, n).astype(np.float64),
            "l_lab": rng.choice(["a", "b", "c"], n),
        }
    )
    for q in ("m and k", "stddev(m) by (lab)", "quantile(0.9, m)"):
        expr = parse_expr(q)
        local = evaluate(
            expr,
            EvalContext(samples=df, label_cols=["lab"], interval=1000,
                        lookback=1000, extensions=True),
        )
        dist = evaluate_distributed(
            expr,
            DistributedContext(rd.from_pandas(df).repartition(4), ["lab"],
                               1000, 1000, num_buckets=4, extensions=True),
        )
        a = local.df.sort_values(["tick", "sig"]).reset_index(drop=True)
        b = dist.df.sort_values(["tick", "sig"]).reset_index(drop=True)
        assert len(a) == len(b), q
        assert np.allclose(
            a["value"].to_numpy(dtype=float), b["value"].to_numpy(dtype=float)
        ), q


def test_clamp_functions():
    rows = [(5000, "m", -5.0, "a"), (5100, "m", 50.0, "b"), (5200, "m", 500.0, "c")]
    ctx = _ctx(rows)
    c = evaluate(parse_expr("clamp(m, 0, 100)"), ctx)
    assert _tick_vals(c, 5999) == [0.0, 50.0, 100.0]
    cm = evaluate(parse_expr("clamp_max(m, 10)"), ctx)
    assert _tick_vals(cm, 5999) == [-5.0, 10.0, 10.0]
    cn = evaluate(parse_expr("clamp_min(m, 0)"), ctx)
    assert _tick_vals(cn, 5999) == [0.0, 50.0, 500.0]
    # name dropped
    assert all(v is None or (isinstance(v, float) and np.isnan(v))
               for v in c.df["name"])


def test_label_replace():
    rows = [(5000, "m", 1.0, "us-east-1"), (5100, "m", 2.0, "eu-west-2")]
    ctx = _ctx(rows)
    s = evaluate(
        parse_expr('label_replace(m, "region", "$1", "l", "([a-z]+)-.*")'), ctx
    )
    g = s.df[s.df["tick"] == 5999].sort_values("l_l")
    assert list(g["l_region"]) == ["eu", "us"] or list(g["l_region"]) == ["us", "eu"]
    # __name__ kept (labels-only transform)
    assert set(g["name"]) == {"m"}
    # no match → dst unchanged (absent here)
    s2 = evaluate(
        parse_expr('label_replace(m, "region", "$1", "l", "zzz(\\d+)")'), ctx
    )
    g2 = s2.df[s2.df["tick"] == 5999]
    assert g2["l_region"].isna().all() or (g2["l_region"] == None).all()  # noqa: E711


def test_function_extensions_gated():
    rows = [(5000, "m", 1.0, "a")]
    for q in ("clamp(m, 0, 1)", "clamp_max(m, 1)", "clamp_min(m, 0)",
              'label_replace(m, "d", "$1", "l", "(.*)")'):
        with pytest.raises(QueryError):
            evaluate(parse_expr(q), _ctx(rows, extensions=False))
