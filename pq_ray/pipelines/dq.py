"""Driver-facing distributed-query pipelines (VERDICT r3 #4/#9).

These two queries are the hard-signal proof that the pq query engine's
per-tick COMBINATORS — not just its selector/rollup leaves — run in Ray:

- ``dq_agg_div_1h``: ``sum by(event) (sum_over_time(m[1h])) / on(event)
  sum by(event) (count_over_time(m[1h]))`` over the events table lifted
  into the engine's samples schema with a 2-label series space
  (event_type x user_id%16, so the ``by (event)`` aggregate really
  collapses series).  Both aggregates AND the one-to-one ``on(event)``
  match execute as hash exchanges keyed (tick, signature)
  (`query/distributed.py::_dist_aggregate/_dist_binary`); the driver
  only materializes the final per-(tick, event) vector.

- ``dq_subquery_sum_1h``: ``sum_over_time(sum by(event)
  (sum_over_time(m[1m]))[1h:1m])`` — the distributed subquery lowering
  (`_dist_subquery_overtime`): the inner expression evaluates on the 1m
  step grid in Ray, its points re-window into the outer 1h sliding
  frame as mergeable partials through one more exchange, and the outer
  kernel finalizes per bucket.  Inner points never touch the driver.

Both carry DuckDB oracles that reproduce the pq tick-grid rule
(Q1: first = t0 + min(d, interval) - 1, half-open (T-d, T] windows —
SURVEY.md §5) in SQL, like the logs oracles do at 1s.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..query.distributed import DistributedContext, evaluate_distributed
from ..query.parser import parse_expr
from ..stages.sizing import buckets_for_table
from ..sources.readers import small_input_blocks

HOUR_MS = 3_600_000
MINUTE_MS = 60_000


from ..model import round_half_away as _round_half_away


def _events_samples_ds(sf_dir: str):
    """events.parquet → the engine's distributed samples schema:
    ts (int64 ms), seq (arrival key = event_id), name ("m"), value,
    l_event (event_type) and l_u16 (user_id % 16 — a second label so
    the series space is event x device-bucket and ``by (event)``
    aggregates over real groups)."""
    path = f"{sf_dir}/events.parquet"
    ds = rd.read_parquet(
        path,
        columns=["event_id", "ts", "user_id", "event_type", "value"],
        override_num_blocks=small_input_blocks(path),
    )

    def to_samples(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ms = pc.cast(pc.divide(pc.cast(t["ts"], pa.int64()), 1000), pa.int64())
        u16 = (
            t["user_id"].combine_chunks().to_numpy(zero_copy_only=False) % 16
        )
        return pa.table(
            {
                "ts": ms,
                "seq": t["event_id"],
                "name": pa.array(np.full(n, "m", dtype=object), type=pa.string()),
                # exact integer CENTS: the corpus values are 2-decimal,
                # so cents sums are exact int64-in-f64 in ANY addition
                # order — the distributed partial merge and DuckDB's
                # decimal sum then agree bit-for-bit (the raw-float form
                # hash-flipped 52/3600 rows at sf0.1 on 6-digit rounding
                # boundaries)
                "value": pa.array(np.rint(
                    t["value"].combine_chunks().to_numpy(
                        zero_copy_only=False) * 100.0
                )),
                "l_event": t["event_type"],
                "l_u16": pa.array(u16.astype(str), type=pa.string()),
            }
        )

    return ds.map_batches(to_samples, batch_format="pyarrow")


def q_dq_agg_div_1h(sf_dir: str) -> pd.DataFrame:
    expr = parse_expr(
        "sum(sum_over_time(m[1h])) by (event)"
        " / on(event) sum(count_over_time(m[1h])) by (event)"
    )
    ctx = DistributedContext(
        _events_samples_ds(sf_dir), ["event", "u16"],
        HOUR_MS, HOUR_MS, num_buckets=buckets_for_table(sf_dir, "events"),
    )
    vs = evaluate_distributed(expr, ctx)
    out = vs.df[["tick", "l_event", "value"]].rename(
        columns={"l_event": "event_type", "value": "avg_value"}
    ).copy()
    # value = cents_sum / n (one correctly-rounded division of exact
    # integers); /100 then HALF-AWAY rounding to mirror SQL ROUND —
    # numpy's half-even disagrees on dyadic ties like 41.0228125
    out["avg_value"] = _round_half_away(out["avg_value"].to_numpy() / 100.0)
    return out.sort_values(["tick", "event_type"]).reset_index(drop=True)


def q_dq_subquery_sum_1h(sf_dir: str) -> pd.DataFrame:
    expr = parse_expr(
        "sum_over_time(sum(sum_over_time(m[1m])) by (event)[1h:1m])",
        extensions=True,
    )
    ctx = DistributedContext(
        _events_samples_ds(sf_dir), ["event", "u16"],
        MINUTE_MS, MINUTE_MS, num_buckets=buckets_for_table(sf_dir, "events"),
        extensions=True,
    )
    vs = evaluate_distributed(expr, ctx)
    out = vs.df[["tick", "l_event", "value"]].rename(
        columns={"l_event": "event_type", "value": "sum_1h"}
    ).copy()
    out["sum_1h"] = _round_half_away(out["sum_1h"].to_numpy() / 100.0)
    return out.sort_values(["tick", "event_type"]).reset_index(drop=True)


def q_dq_topk2_1h(sf_dir: str) -> pd.DataFrame:
    """Distributed topk proof (round 4): ``topk(2, sum by(event, u16)
    (sum_over_time(m[1h]))) by (event)`` — the per-(tick, event) top-2
    device buckets by hourly sum run as the pre-trimmed topk exchange
    (`_dist_topk`), never on the driver.  Values are exact integer
    cents, so the SQL ROW_NUMBER tie-break (value DESC, u16 ASC — the
    engine's (value, signature) order, since only u16 varies within a
    group) reproduces the selection bit-for-bit."""
    expr = parse_expr(
        "topk(2, sum(sum_over_time(m[1h])) by (event, u16)) by (event)"
    )
    ctx = DistributedContext(
        _events_samples_ds(sf_dir), ["event", "u16"],
        HOUR_MS, HOUR_MS, num_buckets=buckets_for_table(sf_dir, "events"),
    )
    vs = evaluate_distributed(expr, ctx)
    out = vs.df[["tick", "l_event", "l_u16", "value"]].rename(
        columns={"l_event": "event_type", "l_u16": "u16",
                 "value": "top_value"}
    ).copy()
    out["top_value"] = out["top_value"].to_numpy() / 100.0
    return out.sort_values(["tick", "event_type", "u16"]).reset_index(drop=True)


def q_dq_unless_avg_1h(sf_dir: str) -> pd.DataFrame:
    """Distributed logical-op proof (round 4): ``sum_over_time(m[1h])
    unless on(event, u16) (avg_over_time(m[1h]) > 5000)`` — keep the
    (event, device-bucket) cells whose hourly average is <= 50.00.
    The anti-join runs as the side-tagged union exchange
    (`_dist_logical`); both sides share ONE selector partials exchange
    (CSE).  avg = exact-cents sum / count is the identical float64
    division on both sides, so the > comparison splits identically."""
    expr = parse_expr(
        "sum_over_time(m[1h])"
        " unless on(event, u16) (avg_over_time(m[1h]) > 5000)",
        extensions=True,
    )
    ctx = DistributedContext(
        _events_samples_ds(sf_dir), ["event", "u16"],
        HOUR_MS, HOUR_MS, num_buckets=buckets_for_table(sf_dir, "events"),
        extensions=True,
    )
    vs = evaluate_distributed(expr, ctx)
    out = vs.df[["tick", "l_event", "l_u16", "value"]].rename(
        columns={"l_event": "event_type", "l_u16": "u16",
                 "value": "sum_low"}
    ).copy()
    out["sum_low"] = out["sum_low"].to_numpy() / 100.0
    return out.sort_values(["tick", "event_type", "u16"]).reset_index(drop=True)


def q_dq_group_share_1h(sf_dir: str) -> pd.DataFrame:
    """Distributed grouped-matching proof (round 4): ``sum by(event,
    u16) (...) / on(event) group_left sum by(event) (...)`` — each
    device bucket's share of its event's hourly total, a true
    many-to-one match run in the side-tagged exchange
    (`_dist_grouped_binary`) with the one-side uniqueness check applied
    per reduce.  Both operands are exact integer cents; the share is
    ONE float division of the same ints on both sides, then the shared
    SQL-ROUND half-away rounding."""
    expr = parse_expr(
        "sum(sum_over_time(m[1h])) by (event, u16)"
        " / on(event) group_left sum(sum_over_time(m[1h])) by (event)",
        extensions=True,
    )
    ctx = DistributedContext(
        _events_samples_ds(sf_dir), ["event", "u16"],
        HOUR_MS, HOUR_MS, num_buckets=buckets_for_table(sf_dir, "events"),
        extensions=True,
    )
    vs = evaluate_distributed(expr, ctx)
    out = vs.df[["tick", "l_event", "l_u16", "value"]].rename(
        columns={"l_event": "event_type", "l_u16": "u16",
                 "value": "share"}
    ).copy()
    out["share"] = _round_half_away(out["share"].to_numpy())
    return out.sort_values(["tick", "event_type", "u16"]).reset_index(drop=True)


def q_dq_changes_1h(sf_dir: str) -> pd.DataFrame:
    """Distributed sample-stream kernel proof (round 4): ``sum(
    changes(m[1h])) by (event)`` — ``changes`` needs the full
    chronological sample sequence per window, so the selector ships
    exploded samples and the exchange reduce computes the pair-count
    per complete (series, tick) group (`distributed.py::sample_reduce`);
    the per-device counts then aggregate through the (tick, signature)
    exchange.  Counts are exact integers, so the SQL LAG oracle matches
    bit-for-bit (values compared as exact cents on both sides)."""
    expr = parse_expr("sum(changes(m[1h])) by (event)", extensions=True)
    ctx = DistributedContext(
        _events_samples_ds(sf_dir), ["event", "u16"],
        HOUR_MS, HOUR_MS, num_buckets=buckets_for_table(sf_dir, "events"),
        extensions=True,
    )
    vs = evaluate_distributed(expr, ctx)
    out = vs.df[["tick", "l_event", "value"]].rename(
        columns={"l_event": "event_type", "value": "n_changes"}
    ).copy()
    out["n_changes"] = out["n_changes"].to_numpy().astype(np.int64)
    return out.sort_values(["tick", "event_type"]).reset_index(drop=True)


def q_dq_median_1h(sf_dir: str) -> pd.DataFrame:
    """Distributed quantile_over_time proof (round 4): ``sum(
    quantile_over_time(0.5, m[1h])) by (event)`` — another sample-
    stream kernel: each (series, tick) group's full value list meets
    its bucket reduce, PromQL interpolation runs there, and the
    per-device medians aggregate in the combinator exchange.  At φ=0.5
    on exact integer cents the interpolation is a midpoint of two ints
    (exact in f64), sums of half-integers stay exact in any order, and
    DuckDB's quantile_cont computes the same midpoint — bit-identical
    before the shared /100 + ROUND."""
    expr = parse_expr(
        "sum(quantile_over_time(0.5, m[1h])) by (event)", extensions=True
    )
    ctx = DistributedContext(
        _events_samples_ds(sf_dir), ["event", "u16"],
        HOUR_MS, HOUR_MS, num_buckets=buckets_for_table(sf_dir, "events"),
        extensions=True,
    )
    vs = evaluate_distributed(expr, ctx)
    out = vs.df[["tick", "l_event", "value"]].rename(
        columns={"l_event": "event_type", "value": "med_sum"}
    ).copy()
    out["med_sum"] = _round_half_away(out["med_sum"].to_numpy() / 100.0)
    return out.sort_values(["tick", "event_type"]).reset_index(drop=True)


def q_dq_histq_1h(sf_dir: str) -> pd.DataFrame:
    """Distributed histogram_quantile proof (round 4): events lift into
    cumulative le-bucket series (le ∈ {10, 50, 100, +Inf}; each event
    contributes a 0/1 indicator sample to EVERY bucket — zero-count
    buckets must exist as series), then
    ``histogram_quantile(0.9, sum_over_time(m[1h]))`` runs with the
    bucketQuantile interpolation inside the (tick, sig-without-le)
    exchange (`distributed.py::_dist_histogram_quantile`).  Exactness:
    bucket counts are exact integers on both sides, and the oracle
    mirrors Prometheus' interpolation expression
    ``lo + (hi - lo) * (rank - lo_cnt) / (hi_cnt - lo_cnt)`` operator
    for operator, so the doubles are identical before the shared
    ROUND."""
    path = f"{sf_dir}/events.parquet"
    ds = rd.read_parquet(
        path,
        columns=["event_id", "ts", "event_type", "value"],
        override_num_blocks=small_input_blocks(path),
    )
    les = [("10", 10.0), ("50", 50.0), ("100", 100.0), ("+Inf", np.inf)]

    def to_buckets(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ms = pc.cast(
            pc.divide(pc.cast(t["ts"], pa.int64()), 1000), pa.int64()
        ).to_numpy(zero_copy_only=False)
        eid = t["event_id"].combine_chunks().to_numpy(zero_copy_only=False)
        ev = t["event_type"].combine_chunks().to_numpy(zero_copy_only=False)
        v = t["value"].combine_chunks().to_numpy(zero_copy_only=False)
        # every event contributes a sample to EVERY bucket (indicator
        # value) — zero-count buckets must still exist as series, like
        # Prometheus' always-exported cumulative bucket counters; the
        # cumulative count is then sum_over_time of the indicators
        outs = {"ts": [], "seq": [], "value": [], "l_event": [], "l_le": []}
        for i, (le_str, le_val) in enumerate(les):
            ind = (
                (v <= le_val).astype(np.float64)
                if np.isfinite(le_val) else np.ones(n)
            )
            outs["ts"].append(ms)
            outs["seq"].append(eid * 8 + i)
            outs["value"].append(ind)
            outs["l_event"].append(ev)
            outs["l_le"].append(np.full(n, le_str, dtype=object))
        nn = sum(len(a) for a in outs["ts"])
        return pa.table(
            {
                "ts": pa.array(np.concatenate(outs["ts"]), type=pa.int64()),
                "seq": pa.array(np.concatenate(outs["seq"]), type=pa.int64()),
                "name": pa.array(np.full(nn, "m", dtype=object),
                                 type=pa.string()),
                "value": pa.array(np.concatenate(outs["value"])),
                "l_event": pa.array(np.concatenate(outs["l_event"]),
                                    type=pa.string()),
                "l_le": pa.array(np.concatenate(outs["l_le"]),
                                 type=pa.string()),
            }
        )

    expr = parse_expr(
        "histogram_quantile(0.9, sum_over_time(m[1h]))", extensions=True
    )
    ctx = DistributedContext(
        ds.map_batches(to_buckets, batch_format="pyarrow"),
        ["event", "le"], HOUR_MS, HOUR_MS, num_buckets=buckets_for_table(sf_dir, "events"),
        extensions=True,
    )
    vs = evaluate_distributed(expr, ctx)
    out = vs.df[["tick", "l_event", "value"]].rename(
        columns={"l_event": "event_type", "value": "q90"}
    ).copy()
    out["q90"] = _round_half_away(out["q90"].to_numpy())
    return out.sort_values(["tick", "event_type"]).reset_index(drop=True)


QUERIES = {
    "dq_agg_div_1h": q_dq_agg_div_1h,
    "dq_subquery_sum_1h": q_dq_subquery_sum_1h,
    "dq_topk2_1h": q_dq_topk2_1h,
    "dq_unless_avg_1h": q_dq_unless_avg_1h,
    "dq_group_share_1h": q_dq_group_share_1h,
    "dq_changes_1h": q_dq_changes_1h,
    "dq_median_1h": q_dq_median_1h,
    "dq_histq_1h": q_dq_histq_1h,
}

# shared hourly-grid CTE prefix (Q1 tick rule + exact-cents cell sums
# per (tick, event_type, u16)) for the three combinator proofs
_CELLS_1H = """
    WITH s AS (
        SELECT epoch_ms(ts) AS ts_ms, event_type,
               CAST(user_id % 16 AS VARCHAR) AS u16, value
        FROM events
    ),
    p AS (SELECT MIN(ts_ms) + 3600000 - 1 AS first FROM s),
    t AS (
        SELECT s.*,
               p.first + ((s.ts_ms - p.first + 3599999) // 3600000)
                         * 3600000 AS tick
        FROM s, p
    ),
    c AS (
        SELECT tick, event_type, u16,
               SUM(CAST(value AS DECIMAL(12,2)) * 100) AS cents,
               COUNT(*) AS n
        FROM t GROUP BY 1, 2, 3
    )
"""

ORACLES = {
    # Q1 tick rule in SQL: first = min(ts) + min(d, interval) - 1 and a
    # sample at ts lands on tick = first + ceil((ts - first)/W)*W — the
    # same formula the 1s logs oracles use.
    "dq_agg_div_1h": """
        WITH s AS (
            SELECT epoch_ms(ts) AS ts_ms, event_type, value FROM events
        ),
        p AS (SELECT MIN(ts_ms) + 3600000 - 1 AS first FROM s),
        t AS (
            SELECT s.*,
                   p.first + ((s.ts_ms - p.first + 3599999) // 3600000)
                             * 3600000 AS tick
            FROM s, p
        )
        SELECT tick, event_type,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(12,2)) * 100) AS DOUBLE)
                     / COUNT(*) / 100, 6) AS avg_value
        FROM t GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "dq_subquery_sum_1h": """
        WITH s AS (
            SELECT epoch_ms(ts) AS ts_ms, event_type, value FROM events
        ),
        p AS (SELECT MIN(ts_ms) + 60000 - 1 AS ifirst FROM s),
        inner_pts AS (
            SELECT p.ifirst + ((s.ts_ms - p.ifirst + 59999) // 60000)
                              * 60000 AS itick,
                   s.event_type,
                   SUM(CAST(s.value AS DECIMAL(12,2)) * 100) AS v
            FROM s, p GROUP BY 1, 2
        ),
        b AS (SELECT MIN(itick) AS t_lo, MAX(itick) AS t_hi FROM inner_pts),
        -- generate_series only takes constants as a table function, so
        -- build the outer grid from the scalar-list form and unnest
        g AS (
            SELECT b.t_lo + 59999 + 60000 * u.k AS otick
            FROM b, (
                SELECT unnest(generate_series(
                    0,
                    (SELECT CAST((t_hi + 3600000 - 1 - (t_lo + 59999))
                                 // 60000 AS BIGINT) FROM b)
                )) AS k
            ) u
        )
        SELECT g.otick AS tick, i.event_type,
               ROUND(CAST(SUM(i.v) AS DOUBLE) / 100, 6) AS sum_1h
        FROM g JOIN inner_pts i
          ON i.itick > g.otick - 3600000 AND i.itick <= g.otick
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "dq_topk2_1h": _CELLS_1H + """
        , r AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY tick, event_type
                ORDER BY cents DESC, u16 ASC
            ) AS rn
            FROM c
        )
        SELECT tick, event_type, u16,
               CAST(cents AS DOUBLE) / 100 AS top_value
        FROM r WHERE rn <= 2 ORDER BY 1, 2, 3
    """,
    "dq_unless_avg_1h": _CELLS_1H + """
        SELECT tick, event_type, u16,
               CAST(cents AS DOUBLE) / 100 AS sum_low
        FROM c
        WHERE NOT (CAST(cents AS DOUBLE) / n > 5000)
        ORDER BY 1, 2, 3
    """,
    "dq_group_share_1h": _CELLS_1H + """
        , e AS (
            SELECT tick, event_type, SUM(cents) AS tot
            FROM c GROUP BY 1, 2
        )
        SELECT c.tick, c.event_type, c.u16,
               ROUND(CAST(c.cents AS DOUBLE) / CAST(e.tot AS DOUBLE), 6)
                   AS share
        FROM c JOIN e USING (tick, event_type)
        ORDER BY 1, 2, 3
    """,
    # changes: LAG over the engine's chronological order (ts, then the
    # arrival key seq = event_id); value compared as exact cents
    "dq_changes_1h": """
        WITH s AS (
            SELECT epoch_ms(ts) AS ts_ms, event_id, event_type,
                   CAST(user_id % 16 AS VARCHAR) AS u16,
                   CAST(value AS DECIMAL(12,2)) * 100 AS cents
            FROM events
        ),
        p AS (SELECT MIN(ts_ms) + 3600000 - 1 AS first FROM s),
        t AS (
            SELECT s.*,
                   p.first + ((s.ts_ms - p.first + 3599999) // 3600000)
                             * 3600000 AS tick
            FROM s, p
        ),
        d AS (
            SELECT tick, event_type,
                   CASE WHEN LAG(cents) OVER w IS NOT NULL
                             AND cents <> LAG(cents) OVER w
                        THEN 1 ELSE 0 END AS chg
            FROM t
            WINDOW w AS (PARTITION BY tick, event_type, u16
                         ORDER BY ts_ms, event_id)
        )
        SELECT tick, event_type, CAST(SUM(chg) AS BIGINT) AS n_changes
        FROM d GROUP BY 1, 2 ORDER BY 1, 2
    """,
    # Prometheus bucketQuantile mirrored operator-for-operator over
    # exact integer cumulative bucket counts; searchsorted(left) becomes
    # the ordered CASE over d1..d3; the +Inf bucket returns les[-2]=100
    "dq_histq_1h": """
        WITH s AS (
            SELECT epoch_ms(ts) AS ts_ms, event_type,
                   CAST(value AS DECIMAL(12,2)) AS v
            FROM events
        ),
        p AS (SELECT MIN(ts_ms) + 3600000 - 1 AS first FROM s),
        t AS (
            SELECT s.*,
                   p.first + ((s.ts_ms - p.first + 3599999) // 3600000)
                             * 3600000 AS tick
            FROM s, p
        ),
        c AS (
            SELECT tick, event_type,
                   CAST(SUM(CASE WHEN v <= 10 THEN 1 ELSE 0 END)
                        AS DOUBLE) AS d1,
                   CAST(SUM(CASE WHEN v <= 50 THEN 1 ELSE 0 END)
                        AS DOUBLE) AS d2,
                   CAST(SUM(CASE WHEN v <= 100 THEN 1 ELSE 0 END)
                        AS DOUBLE) AS d3,
                   CAST(COUNT(*) AS DOUBLE) AS d4
            FROM t GROUP BY 1, 2
        ),
        q AS (SELECT *, 0.9 * d4 AS rnk FROM c)
        SELECT tick, event_type,
               ROUND(CASE
                   WHEN d1 >= rnk THEN
                        0 + (10 - 0) * (rnk - 0) / (d1 - 0)
                   WHEN d2 >= rnk THEN
                        10 + (50 - 10) * (rnk - d1) / (d2 - d1)
                   WHEN d3 >= rnk THEN
                        50 + (100 - 50) * (rnk - d2) / (d3 - d2)
                   ELSE 100
               END, 6) AS q90
        FROM q ORDER BY 1, 2
    """,
    # φ=0.5 quantile_cont = midpoint of two exact-int cents (exact in
    # f64); SUM of half-integers is order-independent exact
    "dq_median_1h": """
        WITH s AS (
            SELECT epoch_ms(ts) AS ts_ms, event_type,
                   CAST(user_id % 16 AS VARCHAR) AS u16,
                   CAST(CAST(value AS DECIMAL(12,2)) * 100 AS DOUBLE)
                       AS cents
            FROM events
        ),
        p AS (SELECT MIN(ts_ms) + 3600000 - 1 AS first FROM s),
        t AS (
            SELECT s.*,
                   p.first + ((s.ts_ms - p.first + 3599999) // 3600000)
                             * 3600000 AS tick
            FROM s, p
        ),
        m AS (
            SELECT tick, event_type, u16,
                   quantile_cont(cents, 0.5) AS med
            FROM t GROUP BY 1, 2, 3
        )
        SELECT tick, event_type,
               ROUND(SUM(med) / 100, 6) AS med_sum
        FROM m GROUP BY 1, 2 ORDER BY 1, 2
    """,
}
