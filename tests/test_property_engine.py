"""Property test: the batch evaluator vs an independent streaming
simulator of the reference's pull-loop semantics.

The simulator below re-implements (from the documented semantics, not
the Rust code) the reference's per-tick streaming algorithm:
buffer matching samples per series in arrival order, cut a tick once a
newer sample arrives or at EOF while the buffer drains, purge below
``next_instant − d``, instant = newest-in-window per series, range =
all-in-window (SURVEY.md §5 Q1-Q4).  Hypothesis then throws random
time-ordered streams and queries at both implementations and demands
identical (tick, series, value) outputs including ordering.
"""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pq_ray.model import signature
from pq_ray.query.engine import EvalContext, evaluate
from pq_ray.query.parser import parse_expr

INTERVAL = 1000


# --------------------------------------------------------------------------
# streaming simulator (independent oracle)
# --------------------------------------------------------------------------


def simulate_selector(samples, d, interval, kind):
    """samples: list of (ts, labels_dict, value) in arrival order,
    already filtered to the selector's matches. Returns a list of
    (tick, [(labels, payload)]) where payload is the instant value or
    the newest-first list of (value, ts) for range vectors — exactly
    the reference's emission sequence."""
    out = []
    buffer = {}  # sig -> (labels, [(value, ts) in push order])
    latest_pushed = None
    next_instant = None
    i = 0
    n = len(samples)

    def cut(instant):
        items = []
        for sig in sorted(buffer):
            labels, series = buffer[sig]
            if kind == "instant":
                chosen = None
                for v, ts in reversed(series):
                    if instant - d < ts <= instant:
                        chosen = v
                        break
                if chosen is not None:
                    items.append((labels, chosen))
            else:
                window = [(v, ts) for v, ts in reversed(series) if instant - d < ts <= instant]
                if window:
                    items.append((labels, window))
        return items

    def purge(keep_since):
        for sig in list(buffer):
            labels, series = buffer[sig]
            series = [(v, ts) for v, ts in series if ts > keep_since]
            if series:
                buffer[sig] = (labels, series)
            else:
                del buffer[sig]

    while True:
        # refill until a sample newer than next_instant is buffered
        while (latest_pushed is None or next_instant is None
               or latest_pushed <= next_instant):
            if i >= n:
                break
            ts, labels, value = samples[i]
            i += 1
            if next_instant is None:
                next_instant = ts + min(d, interval) - 1
            if ts > next_instant - d:
                sig = signature(labels)
                buffer.setdefault(sig, (labels, []))[1].append((value, ts))
                latest_pushed = ts
        if not buffer:
            return out
        out.append((next_instant, cut(next_instant)))
        next_instant += interval
        purge(next_instant - d)
        if not buffer:
            latest_pushed = None


def simulate_aggregate(vec_stream, op, by_labels):
    """Per-tick aggregation with the reference's seed-then-fold
    accumulator (Q8), grouped and ordered by group signature."""
    out = []
    for tick, items in vec_stream:
        groups = {}
        order = []
        for labels, value in items:
            glabels = {k: v for k, v in labels.items() if k in by_labels and k != "__name__"}
            gsig = signature(glabels)
            if gsig not in groups:
                groups[gsig] = (glabels, [value])
                order.append(gsig)
            else:
                groups[gsig][1].append(value)
        result = []
        for gsig in sorted(groups):
            glabels, vals = groups[gsig]
            if op == "sum":
                acc = sum(vals)
            elif op == "min":
                acc = min(vals)
            elif op == "max":
                acc = max(vals)
            elif op == "avg":
                acc = sum(vals) / len(vals)
            elif op == "count":
                acc = vals[0] + (len(vals) - 1)
            else:
                raise AssertionError(op)
            result.append((glabels, acc))
        out.append((tick, result))
    return out


# --------------------------------------------------------------------------
# stream generator
# --------------------------------------------------------------------------

label_values = st.sampled_from(["a", "b", "c"])
deltas = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2500),  # ts increment
        label_values,
        st.integers(min_value=-5, max_value=20),  # value
    ),
    min_size=1,
    max_size=40,
)


def build(stream_spec):
    ts = 1_000_000
    rows = []
    for inc, lab, val in stream_spec:
        ts += inc
        rows.append((ts, lab, float(val)))
    return rows


def make_ctx(rows, lookback=INTERVAL):
    df = pd.DataFrame(
        {
            "ts": np.array([r[0] for r in rows], dtype=np.int64),
            "seq": np.arange(len(rows), dtype=np.int64),
            "name": "m",
            "value": np.array([r[2] for r in rows], dtype=np.float64),
            "l_lab": [r[1] for r in rows],
        }
    )
    return EvalContext(
        samples=df, label_cols=["lab"], interval=INTERVAL, lookback=lookback
    )


def engine_instant(rows, expr):
    ctx = make_ctx(rows)
    s = evaluate(parse_expr(expr), ctx)
    out = []
    groups = {t: g for t, g in s.df.groupby("tick", sort=False)} if len(s.df) else {}
    for t in s.ticks:
        items = []
        g = groups.get(t)
        if g is not None:
            for _, row in g.sort_values("ord").iterrows():
                labels = {}
                if row.get("name") is not None:
                    labels["__name__"] = row["name"]
                if row.get("l_lab") is not None:
                    labels["lab"] = row["l_lab"]
                items.append((labels, row["value"]))
        out.append((int(t), items))
    return out


@given(deltas)
@settings(max_examples=120, deadline=None)
def test_instant_selector_matches_simulator(spec):
    rows = build(spec)
    sim_in = [(ts, {"__name__": "m", "lab": lab}, v) for ts, lab, v in rows]
    expected = simulate_selector(sim_in, INTERVAL, INTERVAL, "instant")
    got = engine_instant(rows, "m")
    exp_ticks = [t for t, _ in expected]
    got_nonempty = got  # engine emits the same tick spine
    assert [t for t, _ in got_nonempty] == exp_ticks
    for (t1, i1), (t2, i2) in zip(expected, got_nonempty):
        assert i1 == i2, (t1, i1, i2)


@given(deltas, st.sampled_from(["sum", "min", "max", "avg", "count"]))
@settings(max_examples=120, deadline=None)
def test_aggregate_matches_simulator(spec, op):
    rows = build(spec)
    sim_in = [(ts, {"__name__": "m", "lab": lab}, v) for ts, lab, v in rows]
    vec = simulate_selector(sim_in, INTERVAL, INTERVAL, "instant")
    expected = simulate_aggregate(vec, op, by_labels=set())
    got = engine_instant(rows, f"{op}(m)")
    assert [t for t, _ in got] == [t for t, _ in expected]
    for (t1, i1), (t2, i2) in zip(expected, got):
        assert len(i1) == len(i2)
        for (l1, v1), (l2, v2) in zip(i1, i2):
            assert l1 == l2
            assert v1 == pytest.approx(v2, rel=1e-12, abs=1e-12)


@given(deltas, st.sampled_from([1000, 3000]))
@settings(max_examples=120, deadline=None)
def test_count_over_time_matches_simulator(spec, range_ms):
    rows = build(spec)
    sim_in = [(ts, {"__name__": "m", "lab": lab}, v) for ts, lab, v in rows]
    vec = simulate_selector(sim_in, range_ms, INTERVAL, "range")
    expected = [
        (t, [({k: v for k, v in l.items() if k != "__name__"}, float(len(w)))
             for l, w in items])
        for t, items in vec
    ]
    got = engine_instant(rows, f"count_over_time(m[{range_ms // 1000}s])")
    assert [t for t, _ in got] == [t for t, _ in expected]
    for (t1, i1), (t2, i2) in zip(expected, got):
        assert i1 == i2, (t1, i1, i2)
