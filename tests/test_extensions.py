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


# ---------------------------------------------------------------------------
# round-3 extension batch: math / sort / absent / histogram_quantile and the
# windowed PromQL kernels (deriv, predict_linear, holt_winters, changes,
# resets, irate, idelta, stddev/stdvar/quantile/present _over_time).
# None of these names exist in the reference's FunctionName enum
# (src/query/parser/ast.rs:294-331) so they are gated at PARSE time.
# ---------------------------------------------------------------------------

from pq_ray.query.parser import ParseError


def _pe(q):
    return parse_expr(q, extensions=True)


MATH_ROWS = [(5000, "m", -1.5, "a"), (5100, "m", 2.25, "b"), (5200, "m", 9.0, "c")]


def test_new_function_names_gated_at_parse_time():
    # default mode: unknown identifier + '(' fails exactly like any
    # non-function name in the reference grammar
    for q in ("abs(m)", "deriv(m[1s])", "histogram_quantile(0.9, h)",
              "sort(m)", "absent(m)"):
        with pytest.raises(ParseError):
            parse_expr(q)


def test_math_functions():
    ctx = _ctx(MATH_ROWS)
    assert _tick_vals(evaluate(_pe("abs(m)"), ctx), 5999) == [1.5, 2.25, 9.0]
    assert _tick_vals(evaluate(_pe("ceil(m)"), ctx), 5999) == [-1.0, 3.0, 9.0]
    assert _tick_vals(evaluate(_pe("floor(m)"), ctx), 5999) == [-2.0, 2.0, 9.0]
    assert _tick_vals(evaluate(_pe("sgn(m)"), ctx), 5999) == [-1.0, 1.0, 1.0]
    # round: floor(v/t + 0.5)*t — ties away from -inf like Prometheus
    assert _tick_vals(evaluate(_pe("round(m)"), ctx), 5999) == [-1.0, 2.0, 9.0]
    assert _tick_vals(evaluate(_pe("round(m, 0.5)"), ctx), 5999) == [-1.5, 2.5, 9.0]
    sq = _tick_vals(evaluate(_pe("sqrt(m)"), ctx), 5999)
    assert np.isnan(sq[-1]) or np.isnan(sq[0])  # sqrt(-1.5) = NaN
    s = evaluate(_pe("sqrt(m)"), ctx)
    good = s.df[s.df["value"].notna()]["value"].tolist()
    assert sorted(good) == [1.5, 3.0]
    # ln(0) = -inf, math fns drop __name__
    z = evaluate(_pe("ln(m)"), _ctx([(5000, "m", 0.0, "a")]))
    assert z.df["value"].iloc[0] == -np.inf
    assert z.df["name"].isna().all() or (z.df["name"] == None).all()  # noqa: E711


def test_log_family():
    ctx = _ctx([(5000, "m", 8.0, "a"), (5100, "m", 100.0, "b")])
    assert _tick_vals(evaluate(_pe("log2(m)"), ctx), 5999) == [3.0, np.log2(100.0)]
    assert _tick_vals(evaluate(_pe("log10(m)"), ctx), 5999) == [np.log10(8.0), 2.0]
    assert _tick_vals(evaluate(_pe("exp(ln(m))"), ctx), 5999) == pytest.approx([8.0, 100.0])


def test_sort_and_sort_desc_presentation_order():
    ctx = _ctx(MATH_ROWS)
    s = evaluate(_pe("sort(m)"), ctx)
    g = s.df[s.df["tick"] == 5999].sort_values("ord")
    assert list(g["value"]) == [-1.5, 2.25, 9.0]
    assert set(g["name"]) == {"m"}  # sort keeps __name__
    d = evaluate(_pe("sort_desc(m)"), ctx)
    gd = d.df[d.df["tick"] == 5999].sort_values("ord")
    assert list(gd["value"]) == [9.0, 2.25, -1.5]


def test_absent_fills_grid_gaps_with_matcher_labels():
    # samples at 5000 and 7500 → ticks 5999/6999/7999; 6999 is empty
    rows = [(5000, "m", 1.0, "a"), (7500, "m", 2.0, "a")]
    s = evaluate(_pe('absent(m{l="a"})'), _ctx(rows))
    assert s.df["tick"].tolist() == [6999]
    assert s.df["value"].tolist() == [1.0]
    assert s.df["l_l"].tolist() == ["a"]  # equality matcher becomes the label
    # fully-present series → absent is empty
    dense = [(5000, "m", 1.0, "a"), (5900, "m", 1.0, "a")]
    s2 = evaluate(_pe('absent(m{l="a"})'), _ctx(dense))
    assert len(s2.df) == 0
    # selector matching NOTHING has no data-anchored grid (documented
    # divergence from PromQL's query-range grid): empty result
    s3 = evaluate(_pe('absent(nosuch{job="x"})'), _ctx(rows))
    assert len(s3.df) == 0


def test_histogram_quantile():
    # two label groups of cumulative le-buckets at one tick
    rows = [
        (5000, "h", 1.0, "0.1", "x"), (5000, "h", 3.0, "1", "x"),
        (5000, "h", 4.0, "+Inf", "x"),
        (5000, "h", 2.0, "0.1", "y"), (5000, "h", 2.0, "1", "y"),
        (5000, "h", 4.0, "+Inf", "y"),
    ]
    ctx = _ctx(rows, label_cols=("le", "job"))
    s = evaluate(_pe("histogram_quantile(0.5, h)"), ctx)
    g = s.df.sort_values("l_job")
    # x: rank 2 in bucket (0.1, 1]: 0.1 + 0.9 * (2-1)/(3-1) = 0.55
    # y: rank 2 lands in the FIRST bucket with le > 0 → interpolate from 0
    assert list(g["l_job"]) == ["x", "y"]
    assert g["value"].tolist() == pytest.approx([0.55, 0.1])
    # le dropped from the output labelset, __name__ dropped
    assert "l_le" not in s.df.columns or s.df.get("l_le") is None
    assert s.df["name"].isna().all() or (s.df["name"] == None).all()  # noqa: E711
    # phi out of range
    lo = evaluate(_pe("histogram_quantile(-1, h)"), ctx)
    assert (lo.df["value"] == -np.inf).all()
    hi = evaluate(_pe("histogram_quantile(2, h)"), ctx)
    assert (hi.df["value"] == np.inf).all()
    # +Inf bucket target → highest finite upper bound
    top = evaluate(_pe("histogram_quantile(1, h)"), ctx)
    assert top.df["value"].tolist() == pytest.approx([1.0, 1.0])
    # no +Inf bucket → NaN
    rows_noinf = [(5000, "h", 1.0, "0.1", "x"), (5000, "h", 3.0, "1", "x")]
    ni = evaluate(_pe("histogram_quantile(0.5, h)"), _ctx(rows_noinf, label_cols=("le", "job")))
    assert np.isnan(ni.df["value"]).all()


# windowed kernels: samples at 5000(v=1), 5400(v=4), 5800(v=2) in one
# 1s window (tick 5999); hand-computed expectations
WROWS = [(5000, "m", 1.0, "a"), (5400, "m", 4.0, "a"), (5800, "m", 2.0, "a")]


def _wval(q, rows=None):
    s = evaluate(_pe(q), _ctx(rows or WROWS))
    g = s.df[s.df["tick"] == 5999]
    return g["value"].tolist()


def test_deriv_and_predict_linear():
    # x = (0, 0.4, 0.8)s, y = (1, 4, 2): slope = 1.25
    assert _wval("deriv(m[1s])") == pytest.approx([1.25])
    # predict_linear anchors x at the tick (5999ms), predicts at +1s
    assert _wval("predict_linear(m[1s], 1)") == pytest.approx([4.33208333], abs=1e-6)
    # <2 samples → series dropped
    assert _wval("deriv(m[1s])", [(5000, "m", 1.0, "a")]) == []


def test_windowed_moments_and_quantile():
    assert _wval("stdvar_over_time(m[1s])") == pytest.approx([14.0 / 9.0])
    assert _wval("stddev_over_time(m[1s])") == pytest.approx([np.sqrt(14.0 / 9.0)])
    assert _wval("quantile_over_time(0.5, m[1s])") == [2.0]
    assert _wval("present_over_time(m[1s])") == [1.0]


def test_changes_and_resets():
    assert _wval("changes(m[1s])") == [2.0]  # 1→4, 4→2
    assert _wval("resets(m[1s])") == [1.0]  # 4→2
    # NaN→NaN is not a change; NaN↔x is
    rows = [(5000, "m", np.nan, "a"), (5300, "m", np.nan, "a"),
            (5600, "m", 1.0, "a")]
    assert _wval("changes(m[1s])", rows) == [1.0]


def test_irate_and_idelta():
    # last two chronological samples: (5400, 4) → (5800, 2), dt=0.4s
    # irate sees a counter reset (2 < 4) → increase = newest = 2 → 5.0/s
    assert _wval("irate(m[1s])") == pytest.approx([5.0])
    assert _wval("idelta(m[1s])") == [-2.0]
    # monotone counter: plain diff / dt
    up = [(5000, "m", 1.0, "a"), (5500, "m", 3.0, "a")]
    assert _wval("irate(m[1s])", up) == pytest.approx([4.0])
    # <2 samples → dropped
    assert _wval("irate(m[1s])", [(5000, "m", 1.0, "a")]) == []


def test_holt_winters():
    # sf=tf=0.5 over (1, 4, 2): s1=4.5 (hand-rolled Prometheus recurrence)
    assert _wval("holt_winters(m[1s], 0.5, 0.5)") == pytest.approx([4.5])
    assert _wval("holt_winters(m[1s], 0.5, 0.5)", [(5000, "m", 1.0, "a")]) == []


def test_ext_functions_compose_with_aggregates():
    rows = [(5000, "m", -2.0, "a"), (5100, "m", 3.0, "b")]
    s = evaluate(_pe("sum(abs(m))"), _ctx(rows))
    assert _tick_vals(s, 5999) == [5.0]
    s2 = evaluate(_pe("abs(m) > 2.5"), _ctx(rows))
    assert _tick_vals(s2, 5999) == [3.0]


# ---------------------------------------------------------------------------
# subqueries — <expr>[range:step] (EXTENSION; the reference grammar has
# no ':' production in its range selector, src/query/parser/vector.rs)
# ---------------------------------------------------------------------------

# counter sampled every 250ms for 4s
SUBQ_ROWS = [(5000 + i * 250, "m", float(i), "a") for i in range(16)]


def test_subquery_gated_at_parse_time():
    with pytest.raises(ParseError):
        parse_expr("max_over_time(m[1s:500ms])")
    with pytest.raises(ParseError):
        parse_expr("m[1s:500ms]")


def test_subquery_over_selector():
    # inner instant eval at 500ms steps → outer 1s windows; outer grid
    # anchors at the inner grid's first tick (5499): first outer tick
    # 6498 covers inner points 5499 (v=1) and 5999 (v=3)
    s = evaluate(_pe("max_over_time(m[1s:500ms])"), _ctx(SUBQ_ROWS))
    got = s.df[["tick", "value"]].values.tolist()
    assert got[:4] == [[6498, 3.0], [7498, 7.0], [8498, 11.0], [9498, 15.0]]


def test_subquery_over_aggregate():
    s = evaluate(_pe("avg_over_time(sum(m)[2s:1s])"), _ctx(SUBQ_ROWS))
    got = s.df[["tick", "value"]].values.tolist()
    # inner sum(m) at 1s grid = 3,7,11,15; 2s windows average the pairs
    assert got[:4] == [[6998, 3.0], [7998, 5.0], [8998, 9.0], [9998, 13.0]]


def test_subquery_composes_with_new_kernels():
    # deriv over a subquery of an aggregate: slope of the inner points
    s = evaluate(_pe("deriv(sum(m)[2s:1s])"), _ctx(SUBQ_ROWS))
    g = s.df[s.df["tick"] == 7998]
    # points (5999, 3), (6999, 7): slope = 4 per second
    assert g["value"].tolist() == pytest.approx([4.0])


def test_subquery_top_level_is_range_vector():
    s = evaluate(_pe("m[1s:500ms]"), _ctx(SUBQ_ROWS))
    assert s.kind == "range"
    # each outer tick's segment carries the inner step points
    one = s.df[s.df["tick"] == 6498]
    assert one["value"].tolist() == [1.0, 3.0]


def test_subquery_requires_extension_eval():
    from pq_ray.query.ast import Subquery, VectorSelector

    node = Subquery(VectorSelector("m", (), None), 1000, 500)
    with pytest.raises(QueryError):
        evaluate(node, _ctx(SUBQ_ROWS, extensions=False))


# ---------------------------------------------------------------------------
# offset modifier (reference leaves it as a TODO, src/query/parser/expr.rs:33)
# ---------------------------------------------------------------------------

OFFSET_ROWS = [
    (5000, "m", 1.0, "a"),
    (6000, "m", 2.0, "a"),
    (7000, "m", 3.0, "a"),
]


def test_offset_gated_at_parse_time():
    with pytest.raises(ParseError):
        parse_expr("m offset 1s")


def test_offset_instant():
    base = evaluate(_pe("m"), _ctx(OFFSET_ROWS))
    off = evaluate(_pe("m offset 1s"), _ctx(OFFSET_ROWS))
    # the grid anchors at the first shifted sample: every (tick, value)
    # pair moves exactly one interval later
    a = base.df[["tick", "value"]].to_numpy()
    b = off.df[["tick", "value"]].to_numpy()
    assert len(a) == len(b)
    assert (a[:, 0] + 1000 == b[:, 0]).all()
    assert (a[:, 1] == b[:, 1]).all()


def test_offset_range_vector():
    s = evaluate(_pe("sum_over_time(m[2s] offset 1s)"), _ctx(OFFSET_ROWS))
    base = evaluate(_pe("sum_over_time(m[2s])"), _ctx(OFFSET_ROWS))
    a = base.df[["tick", "value"]].to_numpy()
    b = s.df[["tick", "value"]].to_numpy()
    assert (a[:, 0] + 1000 == b[:, 0]).all() and (a[:, 1] == b[:, 1]).all()


def test_offset_negative():
    off = evaluate(_pe("m offset -1s"), _ctx(OFFSET_ROWS))
    base = evaluate(_pe("m"), _ctx(OFFSET_ROWS))
    a = base.df[["tick", "value"]].to_numpy()
    b = off.df[["tick", "value"]].to_numpy()
    assert (a[:, 0] - 1000 == b[:, 0]).all() and (a[:, 1] == b[:, 1]).all()


def test_offset_distributed_parity(ray_session):
    import ray.data as rd

    from pq_ray.query.distributed import DistributedContext, evaluate_distributed

    rng = np.random.default_rng(11)
    n = 1500
    df = pd.DataFrame(
        {
            "ts": 1_700_000_000_000
            + np.sort(rng.integers(0, 15_000, n)).astype(np.int64),
            "seq": np.arange(n, dtype=np.int64),
            "name": rng.choice(["m", "k"], n),
            "value": rng.integers(0, 50, n).astype(np.float64),
            "l_lab": rng.choice(["a", "b"], n),
        }
    )
    for q in ("sum(m offset 2s) by (lab)", "sum_over_time(m[3s] offset 2s)"):
        expr = parse_expr(q, extensions=True)
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
        assert (a["tick"].to_numpy() == b["tick"].to_numpy()).all(), q
        assert np.allclose(
            a["value"].to_numpy(dtype=float), b["value"].to_numpy(dtype=float)
        ), q


# ---------------------------------------------------------------------------
# trig / time-component / timestamp / label_join extensions
# ---------------------------------------------------------------------------


def test_trig_functions():
    rows = [(5000, "m", 0.0, "a"), (5100, "m", np.pi / 2, "b")]
    ctx = _ctx(rows)
    assert _tick_vals(evaluate(_pe("sin(m)"), ctx), 5999) == pytest.approx([0.0, 1.0])
    assert _tick_vals(evaluate(_pe("cos(m)"), ctx), 5999) == pytest.approx(
        [0.0, 1.0], abs=1e-12
    )
    assert _tick_vals(evaluate(_pe("deg(m)"), ctx), 5999) == pytest.approx([0.0, 90.0])
    assert _tick_vals(evaluate(_pe("rad(deg(m))"), ctx), 5999) == pytest.approx(
        [0.0, np.pi / 2]
    )
    # name is dropped like the other math functions
    s = evaluate(_pe("sin(m)"), ctx)
    assert s.df["name"].isna().all()


def test_time_component_functions():
    # 2023-04-01 15:30:00 UTC (a Saturday) = 1680363000 epoch seconds
    rows = [(5000, "m", 1_680_363_000.0, "a")]
    ctx = _ctx(rows)
    expect = {
        "minute": 30.0,
        "hour": 15.0,
        "day_of_week": 6.0,  # PromQL: 0 = Sunday
        "day_of_month": 1.0,
        "day_of_year": 91.0,
        "days_in_month": 30.0,
        "month": 4.0,
        "year": 2023.0,
    }
    for fn, want in expect.items():
        got = _tick_vals(evaluate(_pe(f"{fn}(m)"), ctx), 5999)
        assert got == [want], fn
    # NaN value propagates
    nan_ctx = _ctx([(5000, "m", float("nan"), "a")])
    got = _tick_vals(evaluate(_pe("hour(m)"), nan_ctx), 5999)
    assert len(got) == 1 and np.isnan(got[0])


def test_timestamp_function():
    rows = [(5000, "m", 42.0, "a"), (6250, "m", 43.0, "a")]
    s = evaluate(_pe("timestamp(m)"), _ctx(rows))
    got = s.df[["tick", "value"]].values.tolist()
    assert got[:2] == [[5999, 5.0], [6999, 6.25]]
    # non-selector argument: the sample time is gone -> typed error
    with pytest.raises(QueryError):
        evaluate(_pe("timestamp(sum(m))"), _ctx(rows))


def test_label_join():
    rows = [
        (5000, "m", 1.0, "a", "x"),
        (5100, "m", 2.0, "b", None),
    ]
    ctx = _ctx(rows, label_cols=("l", "sub"))
    s = evaluate(_pe('label_join(m, "joined", "-", "l", "sub")'), ctx)
    g = s.df[s.df["tick"] == 5999].sort_values("value")
    assert g["l_joined"].tolist() == ["a-x", "b-"]
    # __name__ is KEPT (labels-only transform, like label_replace)
    assert set(g["name"]) == {"m"}
    # empty join result removes the label
    s2 = evaluate(_pe('label_join(m, "joined", "", "nope")'), ctx)
    g2 = s2.df[s2.df["tick"] == 5999]
    assert g2["l_joined"].isna().all()


def test_new_families_gated_at_parse_time():
    for q in ("sin(m)", "hour(m)", "timestamp(m)",
              'label_join(m, "d", "-", "l")'):
        with pytest.raises(ParseError):
            parse_expr(q)


def test_atan2_binary_operator():
    rows = [
        (5000, "m", 1.0, "a"),
        (5000, "k", 1.0, "a"),
        (5100, "m", -1.0, "b"),
        (5100, "k", 0.0, "b"),
    ]
    s = evaluate(_pe("m atan2 k"), _ctx(rows))
    got = sorted(s.df[s.df["tick"] == 5999]["value"].tolist())
    assert got == pytest.approx(sorted([np.arctan2(1.0, 1.0), np.arctan2(-1.0, 0.0)]))
    # vector ∘ scalar form
    s2 = evaluate(_pe("m atan2 2"), _ctx(rows))
    assert sorted(s2.df["value"].tolist()) == pytest.approx(
        sorted([np.arctan2(1.0, 2.0), np.arctan2(-1.0, 2.0)])
    )
    # arithmetic kind: __name__ dropped
    assert s.df["name"].isna().all()
    # gated: default grammar leaves 'atan2' unconsumed -> parse error
    with pytest.raises(ParseError):
        parse_expr("m atan2 k")


def test_absent_over_time():
    rows = [
        (5000, "m", 1.0, "a"),
        (9000, "m", 2.0, "a"),  # 3 empty 1s windows in between
    ]
    s = evaluate(_pe('absent_over_time(m{l="a"}[1s])'), _ctx(rows))
    # grid ticks 5999..9999; windows (5999,6999,7999,8999,9999] →
    # samples present at 5999 and 9999 only
    got = s.df[["tick", "value"]].values.tolist()
    assert got == [[6999, 1.0], [7999, 1.0], [8999, 1.0]]
    # labels from the selector's equality matchers
    assert set(s.df["l_l"]) == {"a"}
    # no gaps → empty result
    dense = [(5000 + i * 500, "m", float(i), "a") for i in range(10)]
    s2 = evaluate(_pe("absent_over_time(m[1s])"), _ctx(dense))
    assert len(s2.df) == 0
    with pytest.raises(ParseError):
        parse_expr("absent_over_time(m[1s])")


def test_rate_over_subquery_divides_by_subquery_range():
    # counter rising 1/sec; subquery [4s:1s] over last_over_time inner
    rows = [(5000 + i * 1000, "m", float(i), "a") for i in range(10)]
    s = evaluate(_pe("rate(last_over_time(m[10s])[4s:1s])"), _ctx(rows))
    # within a full 4s window the counter rises 3 → rate must divide by
    # the SUBQUERY range (3/4 = 0.75), not the inner 10s (0.3)
    vals = s.df["value"].to_numpy()
    assert vals.max() == pytest.approx(3.0 / 4.0)
    assert not np.isclose(vals, 0.3).any()


def test_timestamp_ignores_offset():
    rows = [(5000, "m", 1.0, "a")]
    plain = evaluate(_pe("timestamp(m)"), _ctx(rows))
    off = evaluate(_pe("timestamp(m offset 2s)"), _ctx(rows))
    # offset shifts WHICH tick sees the sample, never the sample's time
    assert plain.df["value"].iloc[0] == off.df["value"].iloc[0] == 5.0
    assert off.df["tick"].iloc[0] == plain.df["tick"].iloc[0] + 2000


def test_histogram_quantile_bad_le_is_skipped():
    rows = [
        (5000, "h", 1.0, "abc"),   # unparsable le
        (5100, "h", 2.0, None),    # missing le
    ]
    ctx = _ctx(rows, label_cols=("le",))
    s = evaluate(_pe("histogram_quantile(0.9, h)"), ctx)
    assert len(s.df) == 0  # skipped, not crashed
