"""Unit tests for the reference's semantics quirks Q1-Q12 (SURVEY.md §5)
not already pinned by the 21 golden scenarios."""

import numpy as np
import pandas as pd
import pytest

from pq_ray.query.engine import (
    EvalContext,
    QueryError,
    VectorMatchingError,
    evaluate,
)
from pq_ray.query.parser import parse_expr
from pq_ray.runner import run_program


def _samples(rows, label_cols=("l",)):
    df = pd.DataFrame(rows, columns=["ts", "name", "value", *label_cols])
    df["seq"] = np.arange(len(df), dtype=np.int64)
    df["ts"] = df["ts"].astype(np.int64)
    df["value"] = df["value"].astype(np.float64)
    for c in label_cols:
        df[f"l_{c}"] = df.pop(c)
    return df


def _ctx(rows, label_cols=("l",), interval=1000, lookback=None):
    return EvalContext(
        samples=_samples(rows, label_cols),
        label_cols=list(label_cols),
        interval=interval,
        lookback=lookback or interval,
    )


def _vals(stream):
    return dict(zip(stream.df["tick"], stream.df["value"]))


def test_q1_first_tick_rule():
    # first tick = t0 + min(lookback, interval) - 1
    ctx = _ctx([(5000, "m", 1.0, "a"), (7000, "m", 2.0, "a")])
    s = evaluate(parse_expr("m"), ctx)
    assert s.ticks[0] == 5999
    # lookback smaller than interval shifts the first tick
    ctx = _ctx([(5000, "m", 1.0, "a")], interval=1000, lookback=500)
    s = evaluate(parse_expr("m"), ctx)
    assert s.ticks[0] == 5000 + 500 - 1


def test_q2_half_open_windows():
    # sample at exactly T is included; sample at T - lookback is not
    ctx = _ctx([(5000, "m", 1.0, "a"), (5999, "m", 2.0, "a")])
    s = evaluate(parse_expr("m"), ctx)
    # tick 5999: window (4999, 5999] contains both; latest = 2.0
    assert _vals(s)[5999] == 2.0


def test_q3_q4_gap_and_trailing_ticks():
    # 3s gap: empty ticks in between; last tick is the first >= last sample
    ctx = _ctx([(5000, "m", 1.0, "a"), (9000, "m", 2.0, "a")])
    s = evaluate(parse_expr("m"), ctx)
    assert list(s.ticks) == [5999, 6999, 7999, 8999, 9999]
    v = _vals(s)
    assert v[5999] == 1.0 and v[9999] == 2.0
    assert 6999 not in v and 8999 not in v  # empty gap ticks


def test_q6_comparison_epsilon():
    out = run_program(
        "/(\\d+) (\\w+)/ | map {.0:ts, .1 as l} | select 42.0 != bool 42 | to_promapi",
        [b"1609459200 x"],
    )
    assert out == ['{"resultType":"scalar","result":[0.0,"0"]}']


def test_q7_last_over_time_returns_oldest():
    ctx = _ctx(
        [(5000, "m", 1.0, "a"), (5500, "m", 9.0, "a")], interval=1000
    )
    s = evaluate(parse_expr("last_over_time(m[1s])"), ctx)
    # reference stores newest-first and takes .last() => OLDEST sample
    assert _vals(s)[5999] == 1.0


def test_q8_count_seed_quirk():
    # count() seeds the accumulator with the first value: n=1 -> value1,
    # n=3 -> value1 + 2
    ctx = _ctx(
        [
            (5000, "m", 7.0, "a"),
            (5000, "m", 1.0, "b"),
            (5000, "m", 1.0, "c"),
        ]
    )
    s = evaluate(parse_expr("count(m)"), ctx)
    # fold order = input vector order = by signature: a(7.0) first
    assert _vals(s)[5999] == 7.0 + 2
    s1 = evaluate(parse_expr("count(m{l='a'})".replace("'", '"')), ctx)
    assert _vals(s1)[5999] == 7.0  # singleton counts to its own value


def test_q8_group_seed_quirk():
    ctx = _ctx([(5000, "m", 7.0, "a")])
    s = evaluate(parse_expr("group(m)"), ctx)
    assert _vals(s)[5999] == 7.0  # singleton -> first value, not 1.0
    ctx = _ctx([(5000, "m", 7.0, "a"), (5000, "m", 3.0, "b")])
    s = evaluate(parse_expr("group(m)"), ctx)
    assert _vals(s)[5999] == 1.0


def test_q10_join_collision_errors():
    # duplicate RHS signature under on() -> typed error
    ctx = _ctx(
        [
            (5000, "a", 1.0, "x"),
            (5000, "b", 2.0, "y"),
            (5000, "b", 3.0, "z"),
        ]
    )
    with pytest.raises(VectorMatchingError):
        evaluate(parse_expr("a + on() b"), ctx)


def test_q11_error_lines_dropped():
    out = run_program(
        "/(\\S+) (\\d+)/ | map {.0:ts, .1:num as v} | select v | to_promapi",
        [b"1609459200 5", b"not-a-match", b"1609459201 oops 7", b"1609459202 6"],
    )
    # line 2 fails decode; line 3 matches regex ("oops" isn't \d+... it
    # skips) — stream continues with valid lines
    assert '"5"' in out[0]
    assert any('"6"' in line for line in out)


def test_logical_ops_unimplemented():
    ctx = _ctx([(5000, "m", 1.0, "a")])
    with pytest.raises(QueryError):
        evaluate(parse_expr("m and m"), ctx)
    with pytest.raises(QueryError):
        evaluate(parse_expr("m + group_left m"), ctx)


def test_parse_only_aggregations_error():
    ctx = _ctx([(5000, "m", 1.0, "a")])
    for op in ["quantile(0.5, m)", "stddev(m)", "stdvar(m)"]:
        with pytest.raises(QueryError):
            evaluate(parse_expr(op), ctx)


def test_to_json_record_format():
    out = run_program(
        "/(\\S+) (\\w+) (\\d+)/ | map {.0:ts, .1 as name, .2 as age} | to_json",
        [b"1609459200 bob 42"],
    )
    assert out == [
        '{"timestamp":1609459200000,"labels":{"name":"bob"},"values":{"age":42.0}}'
    ]


def test_extension_over_time_functions():
    # rate/increase/delta/first_over_time — engine extensions (the
    # reference only parses `rate` as "coming soon")
    rows = [
        (5000, "m", 10.0, "a"),
        (5400, "m", 13.0, "a"),
        (5800, "m", 16.0, "a"),
    ]
    ctx = _ctx(rows, interval=1000)
    assert _vals(evaluate(parse_expr("increase(m[1s])"), ctx))[5999] == 6.0
    assert _vals(evaluate(parse_expr("delta(m[1s])"), ctx))[5999] == 6.0
    assert _vals(evaluate(parse_expr("rate(m[1s])"), ctx))[5999] == 6.0 / 1.0
    assert _vals(evaluate(parse_expr("first_over_time(m[1s])"), ctx))[5999] == 10.0
    assert _vals(evaluate(parse_expr("avg_over_time(m[1s])"), ctx))[5999] == 13.0


# ---------------------------------------------------------------------------
# NaN propagation + arrival-order parity (reference: aggregate.rs:30-66,
# function.rs:49-64, vector.rs:203-236 — fixes from round-2 ADVICE)
# ---------------------------------------------------------------------------


def test_nan_instant_vector_not_skipped():
    # latest-pushed sample is NaN → instant value is NaN, not an older
    # non-NaN one (pandas .last() would skip it)
    rows = [(5000, "m", 1.0, "a"), (5500, "m", np.nan, "a")]
    s = evaluate(parse_expr("m"), _ctx(rows))
    assert np.isnan(_vals(s)[5999])


def test_nan_sum_propagates():
    rows = [(5000, "m", 1.0, "a"), (5200, "m", np.nan, "b"), (5400, "m", 2.0, "c")]
    s = evaluate(parse_expr("sum(m)"), _ctx(rows))
    assert np.isnan(_vals(s)[5999])
    s = evaluate(parse_expr("avg(m)"), _ctx(rows))
    assert np.isnan(_vals(s)[5999])


def test_nan_count_seed_quirk():
    # count seeds the accumulator with the FIRST member's value (Q8);
    # NaN first → NaN count
    rows = [(5000, "m", np.nan, "a"), (5200, "m", 2.0, "b")]
    s = evaluate(parse_expr("count(m)"), _ctx(rows))
    assert np.isnan(_vals(s)[5999])


def test_nan_min_max_aggregate_skip():
    # f64::min/max skip NaN (seeded with first value)
    rows = [(5000, "m", np.nan, "a"), (5200, "m", 2.0, "b"), (5400, "m", 7.0, "c")]
    assert _vals(evaluate(parse_expr("min(m)"), _ctx(rows)))[5999] == 2.0
    assert _vals(evaluate(parse_expr("max(m)"), _ctx(rows)))[5999] == 7.0


def test_nan_over_time_kernels():
    rows = [(5000, "m", 1.0, "a"), (5500, "m", np.nan, "a")]
    ctx = _ctx(rows)
    assert np.isnan(_vals(evaluate(parse_expr("sum_over_time(m[1s])"), ctx))[5999])
    assert np.isnan(_vals(evaluate(parse_expr("avg_over_time(m[1s])"), ctx))[5999])
    # min/max fold from +-inf with NaN-skipping f64::min/max
    assert _vals(evaluate(parse_expr("min_over_time(m[1s])"), ctx))[5999] == 1.0
    assert _vals(evaluate(parse_expr("max_over_time(m[1s])"), ctx))[5999] == 1.0
    # all-NaN window → fold seed survives: +inf / -inf
    rows = [(5000, "m", np.nan, "a")]
    ctx = _ctx(rows)
    assert _vals(evaluate(parse_expr("min_over_time(m[1s])"), ctx))[5999] == np.inf
    assert _vals(evaluate(parse_expr("max_over_time(m[1s])"), ctx))[5999] == -np.inf
    # count is positional — NaN still counts
    assert _vals(evaluate(parse_expr("count_over_time(m[1s])"), ctx))[5999] == 1.0


def test_arrival_order_beats_timestamp_order():
    # out-of-order ts within a window: the reference's deque is pure push
    # order — instant picks the latest-PUSHED (ts 5200 here, pushed after
    # 5800), last_over_time picks the first-pushed
    rows = [(5800, "m", 1.0, "a"), (5200, "m", 2.0, "a")]
    ctx = _ctx(rows)
    # t0 = min matched ts (5200) → first tick 6199; window (5199, 6199]
    assert _vals(evaluate(parse_expr("m"), ctx))[6199] == 2.0
    assert _vals(evaluate(parse_expr("last_over_time(m[1s])"), ctx))[6199] == 1.0
