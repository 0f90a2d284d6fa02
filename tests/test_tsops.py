"""Extended time-series operators (pipelines/tsops.py): windowed exact
distinct, HyperLogLog sketch, linear-interpolation gap-fill, as-of join
— oracle parity at sf0.001 plus unit tests for the HLL kernels and the
vectorized interpolation."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from pq_ray.pipelines.tsops import (
    HLL_P,
    _hll_rho,
    _splitmix64,
    q_asof_purchase_view,
    q_distinct_1h,
    q_hll_1h,
    q_interp_1m,
)

SF = "/root/testdata/sf0.001"


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.sql(
        f"create view events as select * from read_parquet('{SF}/events.parquet')"
    )
    return con.sql(sql).df()


# ---------------------------------------------------------------------------
# exact distinct
# ---------------------------------------------------------------------------


def test_distinct_1h_matches_duckdb(ray_session):
    got = q_distinct_1h(SF)
    exp = _oracle(
        """
        SELECT (epoch_ms(ts) // 3600000) * 3600000 AS window_ts, event_type,
               COUNT(DISTINCT user_id) AS n_users
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


# ---------------------------------------------------------------------------
# HLL kernels + end-to-end error bound
# ---------------------------------------------------------------------------


def test_hll_rho_against_naive_bit_twiddling():
    rng = np.random.default_rng(7)
    h = rng.integers(0, 2**63, size=1000, dtype=np.int64).astype(np.uint64)
    h[:3] = [0, 1, np.uint64(1) << np.uint64(63)]
    reg, rho = _hll_rho(h)
    for i in range(len(h)):
        hv = int(h[i])
        assert reg[i] == hv >> (64 - HLL_P)
        w = hv & ((1 << (64 - HLL_P)) - 1)
        if w == 0:
            expect = (64 - HLL_P) + 1
        else:
            expect = (64 - HLL_P) - w.bit_length() + 1
        assert rho[i] == expect, hex(hv)


def test_splitmix64_is_a_permutation_sample():
    x = np.arange(10_000, dtype=np.uint64)
    hx = _splitmix64(x)
    assert len(np.unique(hx)) == len(x)  # injective on the sample
    # avalanche sanity: top bits spread uniformly across registers
    regs = (hx >> np.uint64(64 - HLL_P)).astype(np.int64)
    counts = np.bincount(regs, minlength=1 << HLL_P)
    assert counts.max() <= 12  # ~2.4 expected per register


def test_hll_estimate_within_error_bound(ray_session):
    got = q_hll_1h(SF)
    exact = q_distinct_1h(SF)
    j = got.merge(exact, on=["window_ts", "event_type"])
    assert len(j) == len(exact)
    # m=4096 → ~1.6% standard error; small counts ride the exact
    # linear-counting regime, so the bound is tight at this scale
    rel = np.abs(j["n_users_est"] - j["n_users"]) / np.maximum(j["n_users"], 1)
    assert rel.max() <= 0.05, j[rel > 0.05]


def test_hll_register_merge_is_idempotent_and_commutative():
    # merging a sketch with itself must not change the estimate —
    # register-max is idempotent (the property multi-batch merges rely on)
    from pq_ray.pipelines.tsops import _hll_max_per

    rng = np.random.default_rng(11)
    n = 5000
    user = rng.integers(0, 800, size=n, dtype=np.int64)
    h = _splitmix64(user.astype(np.uint64))
    reg, rho = _hll_rho(h)
    sid = np.zeros(n, dtype=np.uint64)
    win = np.zeros(n, dtype=np.int64)
    gk = np.zeros(n, dtype=np.uint64)
    once = _hll_max_per(gk, sid, win, reg, rho)
    twice = _hll_max_per(
        np.concatenate([gk, gk]),
        np.concatenate([sid, sid]),
        np.concatenate([win, win]),
        np.concatenate([reg, reg]),
        np.concatenate([rho, rho]),
    )
    np.testing.assert_array_equal(once[2], twice[2])  # registers
    np.testing.assert_array_equal(once[3], twice[3])  # rhos


# ---------------------------------------------------------------------------
# linear interpolation
# ---------------------------------------------------------------------------


def test_interp_1m_matches_duckdb_window_functions(ray_session):
    got = q_interp_1m(SF)
    exp = _oracle(
        """
        WITH w AS (
            SELECT (epoch_ms(ts) // 60000) * 60000 AS window_ts, event_type,
                   SUM(value) / COUNT(*) AS avg_value
            FROM events GROUP BY 1, 2
        ),
        bounds AS (
            SELECT event_type, MIN(window_ts) AS lo, MAX(window_ts) AS hi
            FROM w GROUP BY event_type
        ),
        spine AS (
            SELECT b.event_type,
                   unnest(generate_series(b.lo, b.hi, 60000)) AS window_ts
            FROM bounds b
        ),
        j AS (
            SELECT s.window_ts, s.event_type, w.avg_value
            FROM spine s LEFT JOIN w USING (event_type, window_ts)
        ),
        f AS (
            SELECT window_ts, event_type, avg_value,
                   last_value(CASE WHEN avg_value IS NOT NULL THEN window_ts END
                              IGNORE NULLS)
                       OVER (PARTITION BY event_type ORDER BY window_ts
                             ROWS UNBOUNDED PRECEDING) AS prev_ts,
                   last_value(avg_value IGNORE NULLS)
                       OVER (PARTITION BY event_type ORDER BY window_ts
                             ROWS UNBOUNDED PRECEDING) AS prev_v,
                   first_value(CASE WHEN avg_value IS NOT NULL THEN window_ts END
                               IGNORE NULLS)
                       OVER (PARTITION BY event_type ORDER BY window_ts
                             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                       AS next_ts,
                   first_value(avg_value IGNORE NULLS)
                       OVER (PARTITION BY event_type ORDER BY window_ts
                             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                       AS next_v
            FROM j
        )
        SELECT window_ts, event_type,
               ROUND(CASE WHEN prev_ts = next_ts THEN prev_v
                          ELSE prev_v + (next_v - prev_v)
                               * (window_ts - prev_ts) / (next_ts - prev_ts)
                     END, 6) AS value_interp,
               avg_value IS NULL AS is_interp
        FROM f ORDER BY event_type, window_ts
        """
    )
    assert len(got) == len(exp)
    np.testing.assert_array_equal(got["window_ts"].to_numpy(), exp["window_ts"].to_numpy())
    np.testing.assert_array_equal(got["event_type"].to_numpy(), exp["event_type"].to_numpy())
    np.testing.assert_array_equal(got["is_interp"].to_numpy(), exp["is_interp"].to_numpy())
    np.testing.assert_allclose(
        got["value_interp"].to_numpy(), exp["value_interp"].to_numpy(), atol=1e-9
    )
    # sanity: some slots really were interpolated and observed slots kept
    # their window average
    assert got["is_interp"].any() and (~got["is_interp"]).any()


def test_interp_observed_slots_equal_window_avg(ray_session):
    got = q_interp_1m(SF)
    obs = got[~got["is_interp"]]
    exp = _oracle(
        """
        SELECT (epoch_ms(ts) // 60000) * 60000 AS window_ts, event_type,
               ROUND(SUM(value) / COUNT(*), 6) AS avg_value
        FROM events GROUP BY 1, 2 ORDER BY event_type, window_ts
        """
    )
    j = obs.merge(exp, on=["window_ts", "event_type"])
    assert len(j) == len(exp)
    np.testing.assert_allclose(
        j["value_interp"].to_numpy(), j["avg_value"].to_numpy(), atol=1e-9
    )


def test_locf_1m_matches_oracle_and_carries_forward(ray_session):
    from pq_ray.pipelines.tsops import ORACLES, QUERIES

    got = QUERIES["events_locf_1m"](SF)
    exp = _oracle(ORACLES["events_locf_1m"])
    assert len(got) == len(exp) and len(got) > 0
    assert (got["value_locf"].to_numpy()
            == exp["value_locf"].to_numpy()).all()
    assert (got["is_filled"].to_numpy() == exp["is_filled"].to_numpy()).all()
    # a filled slot equals the nearest preceding observed slot's value
    df = got.sort_values(["event_type", "window_ts"]).reset_index(drop=True)
    prev = df.groupby("event_type")["value_locf"].shift(1)
    filled = df["is_filled"].to_numpy()
    assert (df["value_locf"].to_numpy()[filled]
            == prev.to_numpy()[filled]).all()


# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------


def test_asof_purchase_view_matches_duckdb_asof_join(ray_session):
    got = q_asof_purchase_view(SF)
    exp = _oracle(
        """
        WITH l AS (
            SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, value, ts
            FROM events WHERE event_type = 'purchase'
        ),
        r AS (
            SELECT user_id, ts AS rts, value AS prior_value
            FROM events WHERE event_type = 'view'
        )
        SELECT l.event_id, l.ts_ms AS ts, l.user_id, l.value,
               COALESCE(epoch_ms(r.rts), -1) AS prior_ts,
               COALESCE(r.prior_value, 0.0) AS prior_value
        FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.rts
        ORDER BY l.event_id
        """
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )
    # left-join semantics: a purchase before any view keeps the sentinel
    assert (got["prior_ts"] <= got["ts"]).loc[got["prior_ts"] >= 0].all()


def test_asof_prior_is_really_the_latest_not_later_view(ray_session):
    got = q_asof_purchase_view(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["ts_ms"] = ev["ts"].astype("int64") // 1000
    views = ev[ev["event_type"] == "view"]
    rng = np.random.default_rng(3)
    for _, row in got.iloc[rng.choice(len(got), size=min(25, len(got)), replace=False)].iterrows():
        mine = views[(views["user_id"] == row["user_id"]) & (views["ts_ms"] <= row["ts"])]
        if len(mine) == 0:
            assert row["prior_ts"] == -1 and row["prior_value"] == 0.0
        else:
            best = mine.loc[mine["ts_ms"].idxmax()]
            assert row["prior_ts"] == best["ts_ms"]
            assert row["prior_value"] == pytest.approx(best["value"])


# ---------------------------------------------------------------------------
# heavy hitters: exact top-k + Misra-Gries sketch
# ---------------------------------------------------------------------------


def test_topusers_1h_matches_duckdb_qualify(ray_session):
    from pq_ray.pipelines.tsops import q_topusers_1h

    got = q_topusers_1h(SF)
    exp = _oracle(
        """
        SELECT * FROM (
            SELECT (epoch_ms(ts) // 3600000) * 3600000 AS window_ts,
                   event_type, user_id, COUNT(*) AS n
            FROM events GROUP BY 1, 2, 3
        )
        QUALIFY row_number()
            OVER (PARTITION BY window_ts, event_type ORDER BY n DESC, user_id) <= 3
        ORDER BY window_ts, event_type, n DESC, user_id
        """
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def _skewed_events_dir(tmp_path):
    """Synthetic skewed stream: 3 hot users dominate each window."""
    rng = np.random.default_rng(42)
    n = 20_000
    hot = rng.choice([7, 11, 13], size=n)
    cold = rng.integers(100, 5000, size=n)
    user = np.where(rng.random(n) < 0.5, hot, cold)
    ts = pd.to_datetime(
        1704067200000 + rng.integers(0, 6 * 3600_000, size=n), unit="ms"
    )
    df = pd.DataFrame(
        {
            "event_id": np.arange(n),
            "ts": ts,
            "user_id": user.astype(np.int64),
            "event_type": rng.choice(["click", "view"], size=n),
            "value": rng.random(n),
            "props": "{}",
        }
    )
    df["ts"] = df["ts"].astype("datetime64[us]")  # match testdata schema
    d = tmp_path / "skew"
    d.mkdir()
    df.to_parquet(d / "events.parquet")
    return str(d)


def test_misra_gries_topk_matches_exact_on_skewed_data(ray_session, tmp_path):
    from pq_ray.pipelines.tsops import q_topusers_1h, q_topusers_mg

    d = _skewed_events_dir(tmp_path)
    exact = q_topusers_1h(d)
    mg = q_topusers_mg(d)
    assert len(mg) == len(exact)
    # the hot users (half the stream over 3 ids vs a 4900-id tail)
    # must survive every trim: identical top-k sets AND identical order
    np.testing.assert_array_equal(
        mg["user_id"].to_numpy(), exact["user_id"].to_numpy()
    )
    # MG truncation only UNDERcounts, bounded by N_group/counters
    j = mg.rename(columns={"n_est": "n_mg"}).merge(
        exact, on=["window_ts", "event_type", "user_id"]
    )
    assert (j["n_mg"] <= j["n"]).all()
    ev = pd.read_parquet(f"{d}/events.parquet")
    ev["w"] = (ev["ts"].astype("int64") // 1_000_000 // 3600_000) * 3600_000
    sizes = ev.groupby(["w", "event_type"]).size().rename("N").reset_index()
    j = j.merge(sizes, left_on=["window_ts", "event_type"], right_on=["w", "event_type"])
    assert ((j["n"] - j["n_mg"]) <= j["N"] / 64 + 1).all()


def test_misra_gries_rows_only_shape_on_testdata(ray_session):
    from pq_ray.pipelines.tsops import q_topusers_mg

    mg = q_topusers_mg(SF)
    assert list(mg.columns) == ["window_ts", "event_type", "user_id", "n_est"]
    assert (mg.groupby(["window_ts", "event_type"]).size() <= 3).all()


# ---------------------------------------------------------------------------
# windowed quantiles: exact + bottom-k sample sketch
# ---------------------------------------------------------------------------


def test_quantile_1h_matches_duckdb_quantile_cont(ray_session):
    from pq_ray.pipelines.tsops import q_quantile_1h

    got = q_quantile_1h(SF)
    exp = _oracle(
        """
        SELECT (epoch_ms(ts) // 3600000) * 3600000 AS window_ts, event_type,
               ROUND(quantile_cont(value, 0.5), 6) AS p50,
               ROUND(quantile_cont(value, 0.9), 6) AS p90,
               ROUND(quantile_cont(value, 0.99), 6) AS p99
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_quantile_sample_tracks_exact_within_rank_error(ray_session):
    from pq_ray.pipelines.tsops import q_quantile_1h, q_quantile_sample_1h

    exact = q_quantile_1h(SF)
    est = q_quantile_sample_1h(SF)
    assert len(est) == len(exact)
    # groups on this testdata are far smaller than m=512, so the sample
    # IS the full population: estimates must be exactly the exact ones
    j = est.merge(exact, on=["window_ts", "event_type"], suffixes=("_est", ""))
    for q in ("p50", "p90", "p99"):
        np.testing.assert_allclose(j[f"{q}_est"], j[q], atol=1e-9)


def test_quantile_sample_error_bound_when_sampling_engages(ray_session, tmp_path):
    # a group far larger than m: sampled quantiles must land within a
    # few rank-percent of the truth
    from pq_ray.pipelines.tsops import q_quantile_1h, q_quantile_sample_1h

    rng = np.random.default_rng(5)
    n = 60_000
    df = pd.DataFrame(
        {
            "event_id": np.arange(n),
            "ts": pd.to_datetime(
                1704067200000 + rng.integers(0, 3600_000, size=n), unit="ms"
            ),
            "user_id": np.zeros(n, dtype=np.int64),
            "event_type": "click",
            "value": rng.lognormal(mean=3.0, sigma=1.0, size=n),
            "props": "{}",
        }
    )
    df["ts"] = df["ts"].astype("datetime64[us]")  # match testdata schema
    d = tmp_path / "big"
    d.mkdir()
    df.to_parquet(d / "events.parquet")
    exact = q_quantile_1h(str(d))
    est = q_quantile_sample_1h(str(d), m=512)
    v = np.sort(df["value"].to_numpy())
    for q, qq in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
        got_rank = np.searchsorted(v, est[q].iloc[0]) / n
        # rank error ~ sqrt(q(1-q)/m): 3 sigma ≈ 0.066 at p50/m=512
        assert abs(got_rank - qq) < 0.08, (q, got_rank)


# ---------------------------------------------------------------------------
# sessionization
# ---------------------------------------------------------------------------


def test_sessions_match_duckdb_lag_cumsum(ray_session):
    from pq_ray.pipelines.tsops import ORACLES, q_sessions

    got = q_sessions(SF)
    exp = _oracle(ORACLES["events_sessions"])
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )
    # structural invariants: sessions are disjoint per user and gaps
    # between consecutive sessions really exceed the threshold
    for uid, g in got.groupby("user_id"):
        g = g.sort_values("session_no")
        assert (g["session_start"] <= g["session_end"]).all()
        gaps = g["session_start"].to_numpy()[1:] - g["session_end"].to_numpy()[:-1]
        assert (gaps > 1_800_000).all()


def test_sessions_single_event_users(ray_session, tmp_path):
    from pq_ray.pipelines.tsops import q_sessions

    df = pd.DataFrame(
        {
            "event_id": [0, 1, 2],
            "ts": pd.to_datetime([1704067200000, 1704067200000 + 10_000,
                                  1704067200000 + 4_000_000], unit="ms"),
            "user_id": np.array([5, 5, 5], dtype=np.int64),
            "event_type": "click",
            "value": [1.0, 2.0, 4.0],
            "props": "{}",
        }
    )
    df["ts"] = df["ts"].astype("datetime64[us]")  # match testdata schema
    d = tmp_path / "one"
    d.mkdir()
    df.to_parquet(d / "events.parquet")
    got = q_sessions(str(d))
    # 2 sessions: events 0,1 together (10s apart), event 2 alone (>30min)
    assert got["session_no"].tolist() == [1, 2]
    assert got["n_events"].tolist() == [2, 1]
    assert got["sum_value"].tolist() == [3.0, 4.0]


# ---------------------------------------------------------------------------
# windowed linear regression
# ---------------------------------------------------------------------------


def test_regr_1h_matches_duckdb_regr_functions(ray_session):
    from pq_ray.pipelines.tsops import ORACLES, q_regr_1h

    got = q_regr_1h(SF)
    exp = _oracle(ORACLES["events_regr_1h"])
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_regr_two_close_points_is_exact_dy_dx(ray_session, tmp_path):
    """The degenerate case that broke the raw-moment formulation: an
    n=2 group whose points are 1ms apart.  Chan-merged centered
    partials must recover exactly dy/dx (slope magnitude ~1e5)."""
    from pq_ray.pipelines.tsops import q_regr_1h

    t0 = 1704067200000
    df = pd.DataFrame(
        {
            "event_id": [0, 1, 2],
            "ts": pd.to_datetime([t0 + 7, t0 + 8, t0 + 3_600_000 + 5], unit="ms"),
            "user_id": np.array([1, 2, 3], dtype=np.int64),
            "event_type": "click",
            "value": [1.0, 1.5, 2.0],
            "props": "{}",
        }
    )
    df["ts"] = df["ts"].astype("datetime64[us]")
    d = tmp_path / "one"
    d.mkdir()
    df.to_parquet(d / "events.parquet")
    got = q_regr_1h(str(d))
    # first window: slope = 0.5 value / (1ms / 3600000ms) = 1.8e6 per hour
    assert got["n_events"].tolist() == [2, 1]
    assert got["slope"].iloc[0] == pytest.approx(0.5 * 3_600_000, abs=1e-6)
    assert got["r2"].iloc[0] == 1.0
    # single-point window: no fit
    assert np.isnan(got["slope"].iloc[1])


# ---------------------------------------------------------------------------
# changes / resets and irate / idelta
# ---------------------------------------------------------------------------


def test_changes_1h_matches_duckdb_lag(ray_session):
    from pq_ray.pipelines.tsops import ORACLES, q_changes_1h

    got = q_changes_1h(SF)
    exp = _oracle(ORACLES["events_changes_1h"])
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_irate_1h_matches_duckdb_last_two(ray_session):
    from pq_ray.pipelines.tsops import ORACLES, q_irate_1h

    got = q_irate_1h(SF)
    exp = _oracle(ORACLES["events_irate_1h"])
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_changes_and_irate_hand_case(ray_session, tmp_path):
    """Counter 1→3→3→2 within one window: 2 changes (1→3, 3→2),
    1 reset (3→2); irate from the last pair (3→2, 10s apart)."""
    from pq_ray.pipelines.tsops import q_changes_1h, q_irate_1h

    t0 = 1704067200000
    df = pd.DataFrame(
        {
            "event_id": [0, 1, 2, 3],
            "ts": pd.to_datetime(
                [t0, t0 + 5_000, t0 + 20_000, t0 + 30_000], unit="ms"
            ),
            "user_id": np.array([1, 1, 1, 1], dtype=np.int64),
            "event_type": "req",
            "value": [1.0, 3.0, 3.0, 2.0],
            "props": "{}",
        }
    )
    df["ts"] = df["ts"].astype("datetime64[us]")
    d = tmp_path / "one"
    d.mkdir()
    df.to_parquet(d / "events.parquet")
    ch = q_changes_1h(str(d))
    assert ch["n_events"].tolist() == [4]
    assert ch["n_changes"].tolist() == [2]
    assert ch["n_resets"].tolist() == [1]
    ir = q_irate_1h(str(d))
    assert ir["idelta"].tolist() == [-1.0]
    assert ir["irate"].tolist() == [-0.1]


def test_dod_delta_matches_duckdb(ray_session):
    from pq_ray.pipelines.tsops import ORACLES, QUERIES

    got = QUERIES["events_dod_delta"](SF)
    exp = _oracle(ORACLES["events_dod_delta"])
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )
    # day-1 windows have no previous day: delta NULL, never 0-filled
    first_day = got[got["window_ts"] < got["window_ts"].min() + 86_400_000]
    assert first_day["prev_day_sum"].isna().all()
    assert got["prev_day_sum"].notna().any()


def test_spikes_1m_matches_duckdb(ray_session):
    from pq_ray.pipelines.tsops import ORACLES, QUERIES

    got = QUERIES["events_spikes_1m"](SF)
    exp = _oracle(ORACLES["events_spikes_1m"])
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )
    # first k windows of each series can never flag (no full history)
    head = got.groupby("event_type").head(24)
    assert not head["is_spike"].any()
    assert head["trail_n"].isna().all()


def test_ewma_1m_matches_whole_table_pandas(ray_session):
    """The bucketed distributed EWMA equals a direct single-process
    pandas computation over the oracle-green 1m rollup — co-location
    by series preserved the full per-series order."""
    from pq_ray.pipelines.tsops import QUERIES

    got = QUERIES["events_ewma_1m"](SF)
    base = _oracle(
        """
        SELECT (epoch_ms(ts) // 60000) * 60000 AS window_ts, event_type,
               SUM(value) / COUNT(*) AS avg_value
        FROM events GROUP BY 1, 2 ORDER BY 2, 1
        """
    )
    base["ewma"] = base.groupby("event_type")["avg_value"].transform(
        lambda s: s.ewm(alpha=0.3, adjust=False).mean()
    )
    base["avg_value"] = base["avg_value"].round(6)
    base["ewma"] = base["ewma"].round(6)
    base = base.sort_values(["window_ts", "event_type"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got, base[["window_ts", "event_type", "avg_value", "ewma"]],
        check_dtype=False,
    )
    # smoothing sanity: ewma variance < raw variance per series
    for _, g in got.groupby("event_type"):
        assert g["ewma"].var() < g["avg_value"].var()


def test_hll_check_flags_all_ok_and_counts_exact(ray_session):
    """The driver-facing HLL row (q_hll_1h_check) must carry the exact
    distinct counts plus an all-true bound flag on the testdata —
    that's what makes it hashable against the COUNT(DISTINCT) oracle."""
    from pq_ray.pipelines.tsops import q_distinct_1h, q_hll_1h_check

    chk = q_hll_1h_check(SF)
    exact = q_distinct_1h(SF)
    assert chk["hll_ok"].all()
    pd.testing.assert_frame_equal(
        chk[["window_ts", "event_type", "n_users"]], exact, check_dtype=False
    )


def test_topusers_mg_equals_exact_on_testdata(ray_session):
    """counters(64) >= per-group distinct users on this corpus, so MG
    keeps exact counts and its output is bitwise the exact top-k —
    the premise of its driver oracle (VERDICT r3 #8)."""
    from pq_ray.pipelines.tsops import q_topusers_1h, q_topusers_mg

    ex, mg = q_topusers_1h(SF), q_topusers_mg(SF)
    assert len(ex) == len(mg)
    assert (ex[["window_ts", "event_type", "user_id"]].to_numpy()
            == mg[["window_ts", "event_type", "user_id"]].to_numpy()).all()
    assert (ex["n"].to_numpy() == mg["n_est"].to_numpy()).all()


def test_funnel_matches_oracle_and_ordering_rule(ray_session):
    from pq_ray.pipelines.tsops import ORACLES, QUERIES

    got = QUERIES["events_funnel"](SF)
    exp = _oracle(ORACLES["events_funnel"])
    assert len(got) == len(exp) and len(got) > 0
    for c in ["user_id", "t_view", "t_click", "t_purchase", "stage"]:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c
    # the ordering rule: each reached stage's ts >= the previous one's
    g = got[got["stage"] >= 2]
    assert (g["t_click"].to_numpy() >= g["t_view"].to_numpy()).all()
    g3 = got[got["stage"] == 3]
    assert (g3["t_purchase"].to_numpy() >= g3["t_click"].to_numpy()).all()
    # stages are monotone: no purchase-without-click rows exist
    assert ((got["t_purchase"] >= 0) <= (got["t_click"] >= 0)).all()


def test_new_users_1h_matches_oracle_and_conserves_users(ray_session):
    from pq_ray.pipelines.tsops import ORACLES, QUERIES

    got = QUERIES["events_new_users_1h"](SF)
    exp = _oracle(ORACLES["events_new_users_1h"])
    assert len(got) == len(exp) and len(got) > 0
    for c in ["window_ts", "n_new", "n_returning"]:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c
    # each user is new exactly once: sum of n_new = distinct users
    n_users = _oracle("SELECT COUNT(DISTINCT user_id) AS n FROM events")["n"][0]
    assert got["n_new"].sum() == n_users


def test_retention_7d_matches_oracle(ray_session):
    from pq_ray.pipelines.tsops import ORACLES, QUERIES

    got = QUERIES["events_retention_7d"](SF)
    exp = _oracle(ORACLES["events_retention_7d"])
    assert len(got) == len(exp) and len(got) > 0
    for c in ["cohort_day", "n_cohort", "n_retained_7d"]:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c
    assert (got["n_retained_7d"] <= got["n_cohort"]).all()
    n_users = _oracle("SELECT COUNT(DISTINCT user_id) AS n FROM events")["n"][0]
    assert got["n_cohort"].sum() == n_users  # every user in ONE cohort


@pytest.mark.parametrize(
    "name", ["events_distinct_1h", "events_hll_1h",
             "events_new_users_1h", "events_retention_7d",
             "events_topusers_1h"]
)
def test_tree_gather_parity_tsops(ray_session, name):
    """Forcing a deep tree gather (fanin 2) on the set-union /
    register-max combines reproduces the single-level result exactly —
    the combines are associative, so the 100x memory-safe path is
    correctness-free."""
    import pq_ray.stages.exchange as ex
    from pq_ray.pipelines.tsops import QUERIES

    sf = "/root/testdata/sf0.001"
    base = QUERIES[name](sf)
    old = ex.GATHER_FANIN
    try:
        ex.GATHER_FANIN = 2
        tree = QUERIES[name](sf)
    finally:
        ex.GATHER_FANIN = old
    pd.testing.assert_frame_equal(
        base.reset_index(drop=True), tree.reset_index(drop=True)
    )
