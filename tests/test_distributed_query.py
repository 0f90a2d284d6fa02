"""Distributed evaluator parity: evaluate_distributed (Ray leaves +
local combinators) must equal the local batch evaluator on the same
samples for a battery of query shapes."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from pq_ray.query.distributed import DistributedContext, evaluate_distributed
from pq_ray.query.engine import EvalContext, evaluate
from pq_ray.query.parser import parse_expr

INTERVAL = 1000


@pytest.fixture(scope="module")
def samples_df():
    rng = np.random.default_rng(17)
    n = 4000
    ts = 1_700_000_000_000 + np.sort(rng.integers(0, 30_000, n)).astype(np.int64)
    labs = rng.choice(["a", "b", "c"], n)
    jobs = rng.choice(["x", "y"], n)
    names = rng.choice(["m", "k"], n)
    values = rng.integers(0, 100, n).astype(np.float64)  # ints → exact sums
    return pd.DataFrame(
        {
            "ts": ts,
            "seq": np.arange(n, dtype=np.int64),
            "name": names,
            "value": values,
            "l_lab": labs,
            "l_job": jobs,
        }
    )


QUERIES = [
    "m",
    'm{lab="a"}',
    'm{lab=~"(a|b)", job!="y"}',
    "sum(m) by (lab)",
    "min(m) without (lab)",
    "count(m)",
    "avg(m) by (job)",
    "topk(2, m) by (lab)",
    "sum_over_time(m[3s])",
    "count_over_time(m[2s])",
    "last_over_time(m[3s])",
    "max_over_time(m[5s])",
    "rate(m[4s])",
    "-m + 3",
    "m > 50",
    "m >= bool 50",
    'sum(m) by (lab) + on(lab) min(k) by (lab)',
    "sum_over_time(m[2s]) / count_over_time(m[2s])",
]


@pytest.mark.parametrize("q", QUERIES)
def test_distributed_equals_local(ray_session, samples_df, q):
    expr = parse_expr(q)
    local = evaluate(
        expr,
        EvalContext(
            samples=samples_df,
            label_cols=["job", "lab"],
            interval=INTERVAL,
            lookback=INTERVAL,
        ),
    )
    ds = rd.from_pandas(samples_df).repartition(6)
    dist = evaluate_distributed(
        expr,
        DistributedContext(
            ds, ["job", "lab"], INTERVAL, INTERVAL, num_buckets=8
        ),
    )
    assert np.array_equal(local.ticks, dist.ticks)
    lcols = ["tick", "value", "name", "sig"]
    a = local.df[lcols].sort_values(["tick", "sig", "value"]).reset_index(drop=True)
    b = dist.df[lcols].sort_values(["tick", "sig", "value"]).reset_index(drop=True)
    assert len(a) == len(b), (q, len(a), len(b))
    assert (a["tick"].to_numpy() == b["tick"].to_numpy()).all()
    assert (a["sig"].to_numpy() == b["sig"].to_numpy()).all()
    assert np.allclose(a["value"].to_numpy(), b["value"].to_numpy()), q
    # name column: both None or both equal
    an = a["name"].where(a["name"].notna(), None)
    bn = b["name"].where(b["name"].notna(), None)
    assert list(an) == list(bn)


def test_distributed_empty_tick_grid_guard(ray_session, samples_df):
    # start_at past every sample: explode_partial's keep-filter empties
    # every batch — must return a typed empty, not crash (ADVICE r2)
    expr = parse_expr("sum_over_time(m[2s])")
    ds = rd.from_pandas(samples_df).repartition(4)
    far_future = int(samples_df["ts"].max()) + 10_000
    dist = evaluate_distributed(
        expr,
        DistributedContext(
            ds, ["job", "lab"], INTERVAL, INTERVAL, start_at=far_future,
            num_buckets=4,
        ),
    )
    assert len(dist.df) == 0


def test_distributed_label_collect_bounded(ray_session, samples_df):
    # the distinct-labelset collection must be per-batch deduped: rows
    # reaching the driver are bounded by |blocks| x |series|, not |samples|
    from pq_ray.query import distributed as dmod

    captured = {}
    orig = pd.DataFrame.drop_duplicates

    def spy(self, *a, **k):
        # the first drop_duplicates call in _selector_partials sees the
        # concatenated per-block distincts
        if set(["name", "l_job", "l_lab"]).issubset(self.columns) and "n" not in captured:
            captured["n"] = len(self)
        return orig(self, *a, **k)

    ds = rd.from_pandas(samples_df).repartition(6)
    expr = parse_expr("m")
    import unittest.mock as mock

    with mock.patch.object(pd.DataFrame, "drop_duplicates", spy):
        evaluate_distributed(
            expr,
            DistributedContext(ds, ["job", "lab"], INTERVAL, INTERVAL, num_buckets=4),
        )
    n_series = samples_df.groupby(["name", "l_job", "l_lab"]).ngroups
    n_blocks = 6
    assert captured["n"] <= n_series * n_blocks
    assert captured["n"] < len(samples_df) / 10


@pytest.mark.parametrize("seed", [3, 29, 101])
def test_distributed_equals_local_random_streams(ray_session, seed):
    """Fuzz the distributed evaluator across random sample streams
    (different seeds → different tick grids, label cardinalities, ties
    and missing-label mixes) against the local engine."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(500, 3000))
    ts = 1_700_000_000_000 + np.sort(rng.integers(0, 15_000, n)).astype(np.int64)
    df = pd.DataFrame(
        {
            "ts": ts,
            "seq": np.arange(n, dtype=np.int64),
            "name": rng.choice(["m", "k", "j"], n),
            "value": rng.integers(0, 1000, n).astype(np.float64),
            "l_lab": rng.choice(["a", "b", "c", "d"], n),
            "l_job": rng.choice(["x", "y", None], n),
        }
    )
    for q in ("m", "sum(m) by (lab)", "count_over_time(m[2s])",
              'max(k{job="x"}) by (lab)', "topk(2, j)"):
        expr = parse_expr(q)
        local = evaluate(
            expr,
            EvalContext(samples=df, label_cols=["job", "lab"], interval=1000,
                        lookback=1000),
        )
        dist = evaluate_distributed(
            expr,
            DistributedContext(rd.from_pandas(df).repartition(5),
                               ["job", "lab"], 1000, 1000, num_buckets=4),
        )
        a = local.df.sort_values(["tick", "sig"]).reset_index(drop=True)
        b = dist.df.sort_values(["tick", "sig"]).reset_index(drop=True)
        assert len(a) == len(b), (seed, q, len(a), len(b))
        assert (a["sig"].to_numpy() == b["sig"].to_numpy()).all(), (seed, q)
        assert np.allclose(
            a["value"].to_numpy(dtype=float), b["value"].to_numpy(dtype=float)
        ), (seed, q)


EXT_QUERIES = [
    "abs(-m)",
    "ceil(m / 7)",
    "round(m, 0.5)",
    "sqrt(m)",
    "sort_desc(sum(m) by (lab))",
    "sin(m / 50)",
    "hour(m * 100000)",
    'label_join(sum(m) by (lab), "j", "-", "lab")',
    "sum(m offset 2s) by (lab)",
    "max_over_time(m[3s] offset 2s)",
    "rate(m[4s] offset 1s)",
    # composed: elementwise fns are now a distributed map stage, so the
    # surrounding combinators keep the stream in Ray
    "clamp(m, 10, 40)",
    "clamp_min(m, 20)",
    "sum(clamp(m, 0, 30)) by (lab)",
    "topk(2, abs(m - 50)) by (lab)",
    "clamp_max(sum_over_time(m[3s]), 100) / on(lab, job) count_over_time(m[3s])",
    # label fns as distributed map stages (relabel-then-aggregate)
    'label_replace(m, "grp", "$1!", "lab", "(a|b)")',
    'sum(label_replace(m, "grp", "g-$1", "lab", "(.*)")) by (grp)',
    'label_join(m, "lj", "|", "lab", "job")',
    'count(label_join(m, "lj", "_", "job", "lab")) by (lj)',
    # timestamp: arrival-last sample ts carried through the partials
    "timestamp(m)",
    'max(timestamp(m{lab="a"})) by (job)',
]


@pytest.mark.parametrize("q", EXT_QUERIES)
def test_distributed_instant_extensions_equal_local(ray_session, samples_df, q):
    # instant-vector extension fns run on the post-rollup driver stream,
    # so the distributed evaluator shares the exact local code path
    expr = parse_expr(q, extensions=True)
    local = evaluate(
        expr,
        EvalContext(
            samples=samples_df, label_cols=["job", "lab"],
            interval=INTERVAL, lookback=INTERVAL, extensions=True,
        ),
    )
    ds = rd.from_pandas(samples_df).repartition(6)
    dist = evaluate_distributed(
        expr,
        DistributedContext(
            ds, ["job", "lab"], INTERVAL, INTERVAL, num_buckets=8,
            extensions=True,
        ),
    )
    lcols = ["tick", "value", "sig"]
    a = local.df[lcols].sort_values(["tick", "sig", "value"]).reset_index(drop=True)
    b = dist.df[lcols].sort_values(["tick", "sig", "value"]).reset_index(drop=True)
    assert len(a) == len(b)
    assert np.allclose(a["value"].to_numpy(), b["value"].to_numpy(), equal_nan=True)
    assert (a["sig"].to_numpy() == b["sig"].to_numpy()).all()


@pytest.mark.parametrize("q", [
    # the subquery SAMPLE plan: sequence kernels over the inner step
    # grid (exploded inner points meet their (sig, otick) group in the
    # bucket reduce — no mergeable partial can carry the sequence)
    "changes((m)[4s:2s])",
    "resets((m)[6s:2s])",
    "quantile_over_time(0.5, (m)[4s:2s])",
    "irate((m)[4s:2s])",
    "idelta((m)[6s:3s])",
    "deriv((m)[4s:2s])",
    "predict_linear((m)[4s:2s], 8)",
    "holt_winters((m)[6s:2s], 0.5, 0.3)",
])
def test_distributed_sequence_kernels_over_subquery_equal_local(
    ray_session, samples_df, q
):
    expr = parse_expr(q, extensions=True)
    local = evaluate(
        expr,
        EvalContext(samples=samples_df, label_cols=["job", "lab"],
                    interval=INTERVAL, lookback=INTERVAL, extensions=True),
    )
    dist = evaluate_distributed(
        expr,
        DistributedContext(rd.from_pandas(samples_df).repartition(6),
                           ["job", "lab"], INTERVAL, INTERVAL,
                           num_buckets=8, extensions=True),
    )
    a = local.df.sort_values(["tick", "sig"]).reset_index(drop=True)
    b = dist.df.sort_values(["tick", "sig"]).reset_index(drop=True)
    assert len(a) == len(b) and len(a) > 0, (q, len(a), len(b))
    assert (a["sig"].to_numpy() == b["sig"].to_numpy()).all(), q
    assert np.allclose(a["value"].to_numpy(dtype=float),
                       b["value"].to_numpy(dtype=float), equal_nan=True), q


@pytest.fixture(scope="module")
def aligned_df():
    """m and k share t_min/t_max exactly → identical tick grids, so
    vector-vector matching produces real joint rows (the generic fixture
    yields disjoint grids and trivially-empty joins)."""
    rng = np.random.default_rng(23)
    n = 3000
    ts = 1_700_000_000_000 + np.sort(rng.integers(1, 20_000, n)).astype(np.int64)
    names = rng.choice(["m", "k"], n)
    # pin both ends for both names
    ts[0] = ts[1] = 1_700_000_000_000
    names[0], names[1] = "m", "k"
    ts[-1] = ts[-2] = ts[-1]
    names[-1], names[-2] = "m", "k"
    return pd.DataFrame(
        {
            "ts": ts,
            "seq": np.arange(n, dtype=np.int64),
            "name": names,
            "value": rng.integers(1, 100, n).astype(np.float64),
            "l_lab": rng.choice(["a", "b", "c"], n),
            "l_job": rng.choice(["x", "y"], n),
        }
    )


JOIN_QUERIES = [
    "sum(m) by (lab) + on(lab) min(k) by (lab)",
    "sum(m) by (lab) / on(lab) count(k) by (lab)",
    "sum(m) by (lab) - on(lab) sum(k) by (lab)",
    "sum(m) by (lab) > on(lab) sum(k) by (lab)",
    "sum(m) by (lab) >= bool on(lab) sum(k) by (lab)",
    "sum_over_time(m[3s]) + on(lab, job) sum_over_time(k[3s])",
    "avg(m) by (job) + on(job) max(k) by (job)",
]


def test_distributed_join_many_to_one_raises(ray_session, aligned_df):
    """ignoring(job) on a (lab, job)-grouped left collapses several left
    series onto one right signature: one-to-one matching must raise in
    BOTH engines (the reference panics; we surface VectorMatchingError —
    the distributed engine re-raises it from the exchange gather task
    wrapped in RayTaskError)."""
    from pq_ray.query.engine import VectorMatchingError

    q = "sum(m) by (lab, job) * ignoring(job) sum(k) by (lab)"
    expr = parse_expr(q)
    with pytest.raises(VectorMatchingError, match="many-to-one"):
        evaluate(
            expr,
            EvalContext(samples=aligned_df, label_cols=["job", "lab"],
                        interval=INTERVAL, lookback=INTERVAL),
        )
    with pytest.raises(Exception, match="many-to-one"):
        evaluate_distributed(
            expr,
            DistributedContext(rd.from_pandas(aligned_df).repartition(6),
                               ["job", "lab"], INTERVAL, INTERVAL,
                               num_buckets=8),
        )


@pytest.mark.parametrize("q", JOIN_QUERIES)
def test_distributed_join_equals_local_on_aligned_grids(
    ray_session, aligned_df, q
):
    """The exchange-based one-to-one matching (VERDICT r3 #4) must equal
    the local hash join on grids where matches actually happen."""
    expr = parse_expr(q)
    local = evaluate(
        expr,
        EvalContext(samples=aligned_df, label_cols=["job", "lab"],
                    interval=INTERVAL, lookback=INTERVAL),
    )
    dist = evaluate_distributed(
        expr,
        DistributedContext(rd.from_pandas(aligned_df).repartition(6),
                           ["job", "lab"], INTERVAL, INTERVAL, num_buckets=8),
    )
    assert np.array_equal(local.ticks, dist.ticks)
    a = local.df.sort_values(["tick", "sig"]).reset_index(drop=True)
    b = dist.df.sort_values(["tick", "sig"]).reset_index(drop=True)
    assert len(a) == len(b), (q, len(a), len(b))
    assert len(a) > 0, f"degenerate test: {q} matched nothing"
    assert (a["sig"].to_numpy() == b["sig"].to_numpy()).all(), q
    assert np.allclose(a["value"].to_numpy(dtype=float),
                       b["value"].to_numpy(dtype=float)), q
    # emission order parity (ord is the reference's BTreeMap order)
    ao = local.df.reset_index(drop=True)
    bo = dist.df.reset_index(drop=True)
    assert (ao["ord"].to_numpy() == bo["ord"].to_numpy()).all(), q


def test_distributed_join_collision_raises_through_exchange(
    ray_session, aligned_df
):
    """Q10: duplicate RHS match-signature must raise VectorMatchingError
    from inside the exchange reduce (two k-series collapse onto one lab
    when matching on(lab) without aggregating the rhs)."""
    from pq_ray.query.engine import VectorMatchingError

    expr = parse_expr("sum(m) by (lab) + on(lab) k")
    with pytest.raises(VectorMatchingError):
        evaluate_distributed(
            expr,
            DistributedContext(rd.from_pandas(aligned_df).repartition(4),
                               ["job", "lab"], INTERVAL, INTERVAL,
                               num_buckets=4),
        )


SUBQ_QUERIES = [
    "sum_over_time(sum_over_time(m[2s])[6s:2s])",
    "max_over_time(sum(m) by (lab)[4s:1s])",
    "rate(sum_over_time(m[2s])[6s:2s])",
    "avg_over_time(m[4s:1s])",
]


@pytest.mark.parametrize("q", SUBQ_QUERIES)
def test_distributed_subquery_equals_local(ray_session, samples_df, q):
    """VERDICT r3 #9: <expr>[range:step] consumed by an over-time fn
    lowers to a distributed rewindow of the inner step grid."""
    expr = parse_expr(q, extensions=True)
    local = evaluate(
        expr,
        EvalContext(samples=samples_df, label_cols=["job", "lab"],
                    interval=INTERVAL, lookback=INTERVAL, extensions=True),
    )
    dist = evaluate_distributed(
        expr,
        DistributedContext(rd.from_pandas(samples_df).repartition(6),
                           ["job", "lab"], INTERVAL, INTERVAL,
                           num_buckets=8, extensions=True),
    )
    assert np.array_equal(local.ticks, dist.ticks), q
    a = local.df.sort_values(["tick", "sig"]).reset_index(drop=True)
    b = dist.df.sort_values(["tick", "sig"]).reset_index(drop=True)
    assert len(a) == len(b), (q, len(a), len(b))
    assert len(a) > 0, f"degenerate test: {q}"
    assert (a["sig"].to_numpy() == b["sig"].to_numpy()).all(), q
    assert np.allclose(a["value"].to_numpy(dtype=float),
                       b["value"].to_numpy(dtype=float)), q


@pytest.mark.parametrize(
    "q", ["stddev_over_time(m[4s])", "stdvar_over_time(m[3s])",
          "present_over_time(m[2s])",
          # fit-sum kernels (mergeable sx/sxx/sxy, x anchored at tick)
          "deriv(m[4s])", "predict_linear(m[4s], 10)",
          # sample-stream kernels (full chronological sequence meets its
          # (sid, tick) group in the exchange reduce)
          "changes(m[4s])", "resets(m[3s])",
          "quantile_over_time(0.5, m[4s])", "quantile_over_time(0.9, m[5s])",
          "holt_winters(m[5s], 0.5, 0.3)"]
)
def test_distributed_mergeable_ext_over_time_equals_local(
    ray_session, samples_df, q
):
    """stddev/stdvar/present ride the s2-extended mergeable partial
    (single-pass E[x2]-E[x]2 vs the local two-pass — equal to float
    tolerance, exact on this integer-valued fixture)."""
    expr = parse_expr(q, extensions=True)
    local = evaluate(
        expr,
        EvalContext(samples=samples_df, label_cols=["job", "lab"],
                    interval=INTERVAL, lookback=INTERVAL, extensions=True),
    )
    dist = evaluate_distributed(
        expr,
        DistributedContext(rd.from_pandas(samples_df).repartition(6),
                           ["job", "lab"], INTERVAL, INTERVAL,
                           num_buckets=8, extensions=True),
    )
    a = local.df.sort_values(["tick", "sig"]).reset_index(drop=True)
    b = dist.df.sort_values(["tick", "sig"]).reset_index(drop=True)
    assert len(a) == len(b) and len(a) > 0, q
    assert (a["sig"].to_numpy() == b["sig"].to_numpy()).all(), q
    assert np.allclose(a["value"].to_numpy(dtype=float),
                       b["value"].to_numpy(dtype=float)), q


def test_distributed_combinators_stay_in_ray(ray_session, aligned_df):
    """VERDICT r3 #4 structural check: for an aggregate / join / scalar
    pipeline, NO intermediate stream materializes on the driver — only
    the final result does (to_pandas called exactly once on a points
    Dataset; the selector's tiny label/ts summary pass is exempt)."""
    import unittest.mock as mock

    import ray.data as rdm

    expr = parse_expr("sum(m) by (lab) / on(lab) count(k) by (lab) * 2")
    calls = []
    orig = rdm.Dataset.to_pandas

    def spy(self, *a, **k):
        df = orig(self, *a, **k)
        calls.append(sorted(df.columns.tolist()))
        return df

    with mock.patch.object(rdm.Dataset, "to_pandas", spy):
        evaluate_distributed(
            expr,
            DistributedContext(rd.from_pandas(aligned_df).repartition(4),
                               ["job", "lab"], INTERVAL, INTERVAL,
                               num_buckets=4),
        )
    point_collects = [c for c in calls if "value" in c and "osig" in c]
    summary_collects = [c for c in calls if "_ts_min" in c]
    assert len(point_collects) == 1, calls  # the final result only
    assert len(summary_collects) == 2  # one tiny pass per selector leaf


@pytest.mark.parametrize("q", ["irate(m[4s])", "idelta(m[3s])"])
def test_distributed_irate_idelta_equals_local(ray_session, samples_df, q):
    """irate/idelta ride a mergeable chronological newest-2 partial
    (want_last2) instead of raising; rows with <2 samples or zero dt
    drop exactly like the local kernel."""
    expr = parse_expr(q, extensions=True)
    local = evaluate(
        expr,
        EvalContext(samples=samples_df, label_cols=["job", "lab"],
                    interval=INTERVAL, lookback=INTERVAL, extensions=True),
    )
    dist = evaluate_distributed(
        expr,
        DistributedContext(rd.from_pandas(samples_df).repartition(6),
                           ["job", "lab"], INTERVAL, INTERVAL,
                           num_buckets=8, extensions=True),
    )
    a = local.df.sort_values(["tick", "sig"]).reset_index(drop=True)
    b = dist.df.sort_values(["tick", "sig"]).reset_index(drop=True)
    assert len(a) == len(b) and len(a) > 0, (q, len(a), len(b))
    assert (a["sig"].to_numpy() == b["sig"].to_numpy()).all(), q
    assert np.allclose(a["value"].to_numpy(dtype=float),
                       b["value"].to_numpy(dtype=float), equal_nan=True), q


@pytest.mark.parametrize("seed", [7, 41])
def test_distributed_combinators_fuzz_nan_and_missing_labels(ray_session, seed):
    """Fuzz the exchange-based combinators on streams with NaN values
    and missing (None) labels — the shapes most likely to diverge from
    the local fold semantics (NaN-propagating sums, NaN-skipping
    min/max, absent-label signatures)."""
    rng = np.random.default_rng(seed)
    n = 2500
    ts = 1_700_000_000_000 + np.sort(rng.integers(0, 12_000, n)).astype(np.int64)
    values = rng.integers(0, 50, n).astype(np.float64)
    values[rng.random(n) < 0.03] = np.nan
    df = pd.DataFrame(
        {
            "ts": ts,
            "seq": np.arange(n, dtype=np.int64),
            "name": rng.choice(["m", "k"], n),
            "value": values,
            "l_lab": rng.choice(["a", "b"], n),
            "l_job": rng.choice(["x", None], n),
        }
    )
    for q in (
        "sum(m) by (lab)",
        "min(m) without (job)",
        "max_over_time(m[3s])",
        "count(m) by (job)",
        "sum_over_time(m[2s]) + on(lab, job) sum_over_time(m[2s])",
        "avg(m)",
    ):
        expr = parse_expr(q)
        local = evaluate(
            expr,
            EvalContext(samples=df, label_cols=["job", "lab"], interval=1000,
                        lookback=1000),
        )
        dist = evaluate_distributed(
            expr,
            DistributedContext(rd.from_pandas(df).repartition(5),
                               ["job", "lab"], 1000, 1000, num_buckets=4),
        )
        a = local.df.sort_values(["tick", "sig"]).reset_index(drop=True)
        b = dist.df.sort_values(["tick", "sig"]).reset_index(drop=True)
        assert len(a) == len(b), (seed, q, len(a), len(b))
        assert (a["sig"].to_numpy() == b["sig"].to_numpy()).all(), (seed, q)
        assert np.allclose(a["value"].to_numpy(dtype=float),
                           b["value"].to_numpy(dtype=float),
                           equal_nan=True), (seed, q)


# ---------------------------------------------------------------------------
# round-4: the formerly-local combinator shapes now run in the exchange
# (topk/bottomk, quantile/count_values, logical set ops, grouped matching)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", [13, 57])
def test_distributed_sample_and_fit_kernels_fuzz_nan(ray_session, seed):
    """Fuzz the sample-stream (changes/resets/quantile/holt_winters)
    and fit-sum (deriv/predict_linear) kernels over NaN values and
    missing labels: NaN↔x IS a change, NaN→NaN is not; fit sums and
    holt_winters recurrences propagate NaN identically on both paths."""
    rng = np.random.default_rng(seed)
    n = 2500
    ts = 1_700_000_000_000 + np.sort(rng.integers(0, 12_000, n)).astype(np.int64)
    values = rng.integers(0, 8, n).astype(np.float64)  # small range → ties
    values[rng.random(n) < 0.04] = np.nan
    df = pd.DataFrame(
        {
            "ts": ts,
            "seq": np.arange(n, dtype=np.int64),
            "name": rng.choice(["m", "k"], n),
            "value": values,
            "l_lab": rng.choice(["a", "b"], n),
            "l_job": rng.choice(["x", None], n),
        }
    )
    for q in (
        "changes(m[3s])",
        "resets(m[4s])",
        "quantile_over_time(0.25, m[3s])",
        "holt_winters(m[4s], 0.4, 0.2)",
        "deriv(m[3s])",
        "predict_linear(m[4s], 7)",
        "sum(changes(m[2s])) by (lab)",
    ):
        expr = parse_expr(q, extensions=True)
        local = evaluate(
            expr,
            EvalContext(samples=df, label_cols=["job", "lab"], interval=1000,
                        lookback=1000, extensions=True),
        )
        dist = evaluate_distributed(
            expr,
            DistributedContext(rd.from_pandas(df).repartition(5),
                               ["job", "lab"], 1000, 1000, num_buckets=4,
                               extensions=True),
        )
        a = local.df.sort_values(["tick", "sig"]).reset_index(drop=True)
        b = dist.df.sort_values(["tick", "sig"]).reset_index(drop=True)
        assert len(a) == len(b) and len(a) > 0, (seed, q, len(a), len(b))
        assert (a["sig"].to_numpy() == b["sig"].to_numpy()).all(), (seed, q)
        assert np.allclose(a["value"].to_numpy(dtype=float),
                           b["value"].to_numpy(dtype=float),
                           equal_nan=True), (seed, q)


RANKED_QUERIES = [
    "topk(2, m) by (lab)",
    "topk(1, m)",
    "bottomk(2, m) by (job)",
    "bottomk(3, m)",
    "topk(2, sum(m) by (lab, job)) by (lab)",
]


@pytest.mark.parametrize("q", RANKED_QUERIES)
def test_distributed_topk_equals_local_with_order(ray_session, aligned_df, q):
    """topk/bottomk run as a mergeable pre-trimmed exchange; values,
    signatures AND emission order (Q9 value-then-signature inside
    gsig-sorted groups) must match the local engine."""
    expr = parse_expr(q)
    local = evaluate(
        expr,
        EvalContext(samples=aligned_df, label_cols=["job", "lab"],
                    interval=INTERVAL, lookback=INTERVAL),
    )
    dist = evaluate_distributed(
        expr,
        DistributedContext(rd.from_pandas(aligned_df).repartition(6),
                           ["job", "lab"], INTERVAL, INTERVAL, num_buckets=8),
    )
    a = local.df.reset_index(drop=True)
    b = dist.df.reset_index(drop=True)
    assert len(a) == len(b) and len(a) > 0, (q, len(a), len(b))
    assert (a["tick"].to_numpy() == b["tick"].to_numpy()).all(), q
    assert (a["sig"].to_numpy() == b["sig"].to_numpy()).all(), q
    assert (a["ord"].to_numpy() == b["ord"].to_numpy()).all(), q
    assert np.allclose(a["value"].to_numpy(float), b["value"].to_numpy(float)), q
    an = a["name"].where(a["name"].notna(), None)
    bn = b["name"].where(b["name"].notna(), None)
    assert list(an) == list(bn), q  # topk keeps __name__


EXT_AGG_QUERIES = [
    "quantile(0.9, m) by (lab)",
    "quantile(0.5, m)",
    'count_values("v", sum(m) by (lab, job)) by (lab)',
    'count_values("v", m)',
    "stddev(m) by (job)",
    "stdvar(m)",
]


@pytest.mark.parametrize("q", EXT_AGG_QUERIES)
def test_distributed_ext_aggregates_equal_local(ray_session, aligned_df, q):
    expr = parse_expr(q, extensions=True)
    local = evaluate(
        expr,
        EvalContext(samples=aligned_df, label_cols=["job", "lab"],
                    interval=INTERVAL, lookback=INTERVAL, extensions=True),
    )
    dist = evaluate_distributed(
        expr,
        DistributedContext(rd.from_pandas(aligned_df).repartition(6),
                           ["job", "lab"], INTERVAL, INTERVAL, num_buckets=8,
                           extensions=True),
    )
    a = local.df.reset_index(drop=True)
    b = dist.df.reset_index(drop=True)
    assert len(a) == len(b) and len(a) > 0, (q, len(a), len(b))
    assert (a["sig"].to_numpy() == b["sig"].to_numpy()).all(), q
    assert (a["ord"].to_numpy() == b["ord"].to_numpy()).all(), q
    assert np.allclose(a["value"].to_numpy(float), b["value"].to_numpy(float),
                       equal_nan=True), q


LOGICAL_QUERIES = [
    "m and k",
    "m and on(lab) sum(k) by (lab)",
    "m unless on(lab, job) (k > 90)",
    "m unless on(lab) (sum(k) by (lab) >= 100)",
    "m or k",
    'sum(m) by (lab) or sum(k) by (lab, job)',
    "m > 50 and on(lab, job) k",
    "(m > 50) and (k < 40)",
]


@pytest.mark.parametrize("q", LOGICAL_QUERIES)
def test_distributed_logical_equals_local(ray_session, aligned_df, q):
    """and/unless/or run as a side-tagged union exchange; rows, values,
    signatures and emission order must match the local set semantics."""
    expr = parse_expr(q, extensions=True)
    local = evaluate(
        expr,
        EvalContext(samples=aligned_df, label_cols=["job", "lab"],
                    interval=INTERVAL, lookback=INTERVAL, extensions=True),
    )
    dist = evaluate_distributed(
        expr,
        DistributedContext(rd.from_pandas(aligned_df).repartition(6),
                           ["job", "lab"], INTERVAL, INTERVAL, num_buckets=8,
                           extensions=True),
    )
    a = local.df.reset_index(drop=True)
    b = dist.df.reset_index(drop=True)
    assert len(a) == len(b) and len(a) > 0, (q, len(a), len(b))
    assert (a["tick"].to_numpy() == b["tick"].to_numpy()).all(), q
    assert (a["sig"].to_numpy() == b["sig"].to_numpy()).all(), q
    assert (a["ord"].to_numpy() == b["ord"].to_numpy()).all(), q
    assert np.allclose(a["value"].to_numpy(float), b["value"].to_numpy(float)), q
    an = a["name"].where(a["name"].notna(), None)
    bn = b["name"].where(b["name"].notna(), None)
    assert list(an) == list(bn), q  # logical ops keep lhs names


GROUPED_QUERIES = [
    "sum(m) by (lab, job) + on(lab) group_left sum(k) by (lab)",
    "sum(m) by (lab, job) / on(lab) group_left avg(k) by (lab)",
    "sum(k) by (lab) - on(lab) group_right sum(m) by (lab, job)",
    "sum(m) by (lab, job) > on(lab) group_left avg(k) by (lab)",
    "sum(m) by (lab, job) >= bool on(lab) group_left sum(k) by (lab)",
    # extra label copied from the one side (which lacks it -> many keeps own)
    "sum(m) by (lab, job) * on(lab) group_left(job) sum(k) by (lab)",
]


@pytest.mark.parametrize("q", GROUPED_QUERIES)
def test_distributed_grouped_matching_equals_local(ray_session, aligned_df, q):
    """group_left/group_right run in the same side-tagged exchange with
    the one-side uniqueness check applied per reduce (globally exact:
    a key lands in exactly one bucket)."""
    expr = parse_expr(q, extensions=True)
    local = evaluate(
        expr,
        EvalContext(samples=aligned_df, label_cols=["job", "lab"],
                    interval=INTERVAL, lookback=INTERVAL, extensions=True),
    )
    dist = evaluate_distributed(
        expr,
        DistributedContext(rd.from_pandas(aligned_df).repartition(6),
                           ["job", "lab"], INTERVAL, INTERVAL, num_buckets=8,
                           extensions=True),
    )
    a = local.df.reset_index(drop=True)
    b = dist.df.reset_index(drop=True)
    assert len(a) == len(b) and len(a) > 0, (q, len(a), len(b))
    assert (a["sig"].to_numpy() == b["sig"].to_numpy()).all(), q
    assert (a["ord"].to_numpy() == b["ord"].to_numpy()).all(), q
    assert np.allclose(a["value"].to_numpy(float), b["value"].to_numpy(float)), q


def test_distributed_grouped_one_side_collision_raises(ray_session, aligned_df):
    """The one side must be unique per (tick, match sig) — a raw k
    vector matched on(lab) collides (multiple k series per lab)."""
    from pq_ray.query.engine import VectorMatchingError

    expr = parse_expr("sum(m) by (lab, job) + on(lab) group_left k",
                      extensions=True)
    with pytest.raises(VectorMatchingError, match="one side"):
        evaluate_distributed(
            expr,
            DistributedContext(rd.from_pandas(aligned_df).repartition(4),
                               ["job", "lab"], INTERVAL, INTERVAL,
                               num_buckets=4, extensions=True),
        )


def test_distributed_ranked_and_logical_stay_in_ray(ray_session, aligned_df):
    """Structural: topk -> logical -> grouped pipeline materializes on
    the driver exactly once (the final result)."""
    import unittest.mock as mock

    import ray.data as rdm

    expr = parse_expr(
        "topk(2, m) by (lab) and on(lab, job) k", extensions=True
    )
    calls = []
    orig = rdm.Dataset.to_pandas

    def spy(self, *a, **k):
        df = orig(self, *a, **k)
        calls.append(sorted(df.columns.tolist()))
        return df

    with mock.patch.object(rdm.Dataset, "to_pandas", spy):
        evaluate_distributed(
            expr,
            DistributedContext(rd.from_pandas(aligned_df).repartition(4),
                               ["job", "lab"], INTERVAL, INTERVAL,
                               num_buckets=4, extensions=True),
        )
    point_collects = [c for c in calls if "value" in c and "osig" in c]
    assert len(point_collects) == 1, calls


@pytest.mark.parametrize("q", [
    # deep compositions across the round-4 distributed surfaces:
    # aggregate over sample-kernel over subquery-of-aggregate, label
    # rewrite under ranking, elementwise over histogram output
    "sum(quantile_over_time(0.5, (sum(m) by (lab))[4s:2s])) by (lab)",
    "max(changes((avg(m) by (lab, job))[6s:2s])) by (lab)",
    'topk(1, label_replace(deriv(m[4s]), "g", "$1", "lab", "(.*)")) by (g)',
    "clamp_min(holt_winters(m[5s], 0.5, 0.3), 0) + on(lab, job) abs(m)",
])
def test_distributed_deep_compositions_equal_local(ray_session, samples_df, q):
    expr = parse_expr(q, extensions=True)
    local = evaluate(
        expr,
        EvalContext(samples=samples_df, label_cols=["job", "lab"],
                    interval=INTERVAL, lookback=INTERVAL, extensions=True),
    )
    dist = evaluate_distributed(
        expr,
        DistributedContext(rd.from_pandas(samples_df).repartition(6),
                           ["job", "lab"], INTERVAL, INTERVAL,
                           num_buckets=8, extensions=True),
    )
    a = local.df.sort_values(["tick", "sig"]).reset_index(drop=True)
    b = dist.df.sort_values(["tick", "sig"]).reset_index(drop=True)
    assert len(a) == len(b) and len(a) > 0, (q, len(a), len(b))
    assert (a["sig"].to_numpy() == b["sig"].to_numpy()).all(), q
    assert np.allclose(a["value"].to_numpy(dtype=float),
                       b["value"].to_numpy(dtype=float), equal_nan=True), q


@pytest.mark.parametrize("q", [
    "sort(m)",
    "sort_desc(m)",
    "sort(sum(m) by (lab, job))",
    "sort_desc(m - 50)",
])
def test_distributed_sort_reproduces_emission_order(ray_session, samples_df, q):
    """sort/sort_desc as a distributed osig rewrite: the EMISSION ORDER
    (row sequence) must equal the local engine's stable value sort."""
    expr = parse_expr(q, extensions=True)
    local = evaluate(
        expr,
        EvalContext(samples=samples_df, label_cols=["job", "lab"],
                    interval=INTERVAL, lookback=INTERVAL, extensions=True),
    )
    dist = evaluate_distributed(
        expr,
        DistributedContext(rd.from_pandas(samples_df).repartition(6),
                           ["job", "lab"], INTERVAL, INTERVAL,
                           num_buckets=8, extensions=True),
    )
    a = local.df.reset_index(drop=True)
    b = dist.df.reset_index(drop=True)
    assert len(a) == len(b) and len(a) > 0, q
    # row-sequence equality, not just set equality
    assert (a["tick"].to_numpy() == b["tick"].to_numpy()).all(), q
    assert np.allclose(a["value"].to_numpy(dtype=float),
                       b["value"].to_numpy(dtype=float), equal_nan=True), q
    assert (a["sig"].to_numpy() == b["sig"].to_numpy()).all(), q
    assert (a["ord"].to_numpy() == b["ord"].to_numpy()).all(), q


@pytest.mark.parametrize("q", [
    'absent(m{lab="a"})',
    "absent_over_time(m[2s])",
    'absent_over_time(m{job="x"}[3s])',
    "absent(sum(m) by (lab))",
])
def test_distributed_absent_equals_local(ray_session, q):
    """absent/absent_over_time: present ticks computed in Ray (tick-only
    collect), emission delegated to the local kernel — over a stream
    with real mid-grid gaps."""
    rng = np.random.default_rng(23)
    ts = np.sort(np.concatenate([
        1_700_000_000_000 + rng.integers(0, 5_000, 300),
        1_700_000_020_000 + rng.integers(0, 5_000, 300),
    ])).astype(np.int64)
    n = len(ts)
    df = pd.DataFrame(
        {
            "ts": ts,
            "seq": np.arange(n, dtype=np.int64),
            "name": np.array(["m"] * n),
            "value": rng.integers(0, 9, n).astype(np.float64),
            "l_lab": rng.choice(["a", "b"], n),
            "l_job": rng.choice(["x", "y"], n),
        }
    )
    expr = parse_expr(q, extensions=True)
    local = evaluate(
        expr,
        EvalContext(samples=df, label_cols=["job", "lab"], interval=1000,
                    lookback=1000, extensions=True),
    )
    dist = evaluate_distributed(
        expr,
        DistributedContext(rd.from_pandas(df).repartition(4),
                           ["job", "lab"], 1000, 1000, num_buckets=4,
                           extensions=True),
    )
    a = local.df.sort_values(["tick", "sig"]).reset_index(drop=True)
    b = dist.df.sort_values(["tick", "sig"]).reset_index(drop=True)
    assert len(a) == len(b) and len(a) > 0, (q, len(a), len(b))
    assert (a["tick"].to_numpy() == b["tick"].to_numpy()).all(), q
    assert (a["sig"].to_numpy() == b["sig"].to_numpy()).all(), q
    assert (a["value"].to_numpy() == b["value"].to_numpy()).all(), q


@pytest.mark.parametrize("q", [
    "histogram_quantile(0.9, m)",
    "histogram_quantile(0.5, sum(sum_over_time(m[3s])) by (lab, le))",
])
def test_distributed_histogram_quantile_equals_local(ray_session, q):
    """histogram_quantile as one exchange keyed (tick, sig-without-le):
    cumulative le-buckets meet their group in the reduce."""
    rng = np.random.default_rng(31)
    les = ["0.1", "0.5", "2.5", "+Inf"]
    rows = []
    seq = 0
    for t in range(0, 20_000, 500):
        for lab in ("a", "b"):
            base = 0
            for le in les:
                base += int(rng.integers(0, 20))
                rows.append(
                    (1_700_000_000_000 + t + int(rng.integers(0, 400)),
                     seq, "m", float(base), lab, le)
                )
                seq += 1
    df = pd.DataFrame(
        rows, columns=["ts", "seq", "name", "value", "l_lab", "l_le"]
    )
    expr = parse_expr(q, extensions=True)
    local = evaluate(
        expr,
        EvalContext(samples=df, label_cols=["lab", "le"], interval=1000,
                    lookback=1000, extensions=True),
    )
    dist = evaluate_distributed(
        expr,
        DistributedContext(rd.from_pandas(df).repartition(4),
                           ["lab", "le"], 1000, 1000, num_buckets=4,
                           extensions=True),
    )
    a = local.df.sort_values(["tick", "sig"]).reset_index(drop=True)
    b = dist.df.sort_values(["tick", "sig"]).reset_index(drop=True)
    assert len(a) == len(b) and len(a) > 0, (q, len(a), len(b))
    assert (a["sig"].to_numpy() == b["sig"].to_numpy()).all(), q
    assert np.allclose(a["value"].to_numpy(dtype=float),
                       b["value"].to_numpy(dtype=float), equal_nan=True), q


def test_distributed_elementwise_fn_stays_in_ray(ray_session, aligned_df):
    """Structural: an elementwise extension under an aggregate runs as a
    map stage on the points stream — exactly one driver materialization
    (the final aggregated vector), no point collection for the fn."""
    import unittest.mock as mock

    import ray.data as rdm

    expr = parse_expr("sum(clamp(m, 0, 40)) by (lab)", extensions=True)
    calls = []
    orig = rdm.Dataset.to_pandas

    def spy(self, *a, **k):
        df = orig(self, *a, **k)
        calls.append(sorted(df.columns.tolist()))
        return df

    with mock.patch.object(rdm.Dataset, "to_pandas", spy):
        evaluate_distributed(
            expr,
            DistributedContext(rd.from_pandas(aligned_df).repartition(4),
                               ["job", "lab"], INTERVAL, INTERVAL,
                               num_buckets=4, extensions=True),
        )
    point_collects = [c for c in calls if "value" in c and "osig" in c]
    assert len(point_collects) == 1, calls


def test_distributed_sort_ties_on_signed_zero_keep_emission_order(ray_session):
    """Regression: the osig value key must treat -0.0 == +0.0 like the
    local stable argsort does (ties keep the child's emission order)."""
    ts = np.array([1_700_000_000_100 + i for i in range(6)], dtype=np.int64)
    df = pd.DataFrame(
        {
            "ts": ts,
            "seq": np.arange(6, dtype=np.int64),
            "name": ["m"] * 6,
            "value": [0.0, -0.0, 3.0, 0.0, -1.0, -0.0],
            "l_lab": list("abcdef"),
            "l_job": ["x"] * 6,
        }
    )
    for q in ("sort(m)", "sort_desc(m)"):
        expr = parse_expr(q, extensions=True)
        local = evaluate(
            expr,
            EvalContext(samples=df, label_cols=["job", "lab"], interval=1000,
                        lookback=1000, extensions=True),
        )
        dist = evaluate_distributed(
            expr,
            DistributedContext(rd.from_pandas(df).repartition(3),
                               ["job", "lab"], 1000, 1000, num_buckets=2,
                               extensions=True),
        )
        a = local.df.reset_index(drop=True)
        b = dist.df.reset_index(drop=True)
        assert (a["sig"].to_numpy() == b["sig"].to_numpy()).all(), q
        assert (a["ord"].to_numpy() == b["ord"].to_numpy()).all(), q


def test_distributed_absent_over_empty_selector_equals_local(ray_session, samples_df):
    """Regression: absent/absent_over_time over a selector matching
    NOTHING must return the local engine's empty result, not raise."""
    for q in ("absent_over_time(nomatch[2s])", "absent(nomatch)"):
        expr = parse_expr(q, extensions=True)
        local = evaluate(
            expr,
            EvalContext(samples=samples_df, label_cols=["job", "lab"],
                        interval=INTERVAL, lookback=INTERVAL,
                        extensions=True),
        )
        dist = evaluate_distributed(
            expr,
            DistributedContext(rd.from_pandas(samples_df).repartition(4),
                               ["job", "lab"], INTERVAL, INTERVAL,
                               num_buckets=4, extensions=True),
        )
        assert len(local.df) == 0 and len(dist.df) == 0, q
