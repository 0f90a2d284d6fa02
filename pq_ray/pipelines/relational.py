"""Relational queries over the TPC-H-shaped tables: the join + partial
aggregation surface of the engine.

Three oracle-gated queries, each exercising a join operator in the role
it keeps at 100 TB (stages/join.py):

- ``tpch_q1``         pure partial aggregation over the widest fact
  table: per-batch Arrow group_by collapses each block to ≤6 rows
  BEFORE anything leaves the map side, the driver folds ≤ 6×|blocks|
  partial rows.  No exchange at all — the textbook
  combine-before-shuffle plan for low-cardinality group keys.
- ``tpch_rev_by_nation``   fact-fact SHUFFLE join (orders ⋈ customer,
  both sides grow with scale → each moves exactly once through the
  hash exchange) followed by a dimension BROADCAST join (⋈ nation,
  25 rows → ray.put once), then the same partial-agg fold.
- ``tpch_building_orders`` broadcast LEFT SEMI join: the filtered
  customer-key set ships once, each orders batch keeps matching rows
  with Arrow's semi join — the distributed form of
  ``WHERE key IN (subquery)``.

Determinism note: monetary/quantity columns carry exactly 2 decimal
digits, so every aggregate here is computed over INTEGER-scaled values
(cents; 1e-4 / 1e-6 units for the discount/charge products).  Integer
sums are fold-order independent — a float sum's low bits would depend
on Ray's block arrival order, and at sum_charge's ~1e9 magnitude that
nondeterminism crosses any fixed rounding step (observed: the same
query flipping a ROUND(x, 2) digit between runs).  The final division
back to dollars is a single correctly-rounded IEEE op of exact
operands, which equals DuckDB's DECIMAL→DOUBLE cast bit-for-bit while
the integer sums stay below 2^53 (true through sf≈100; beyond that the
partials would widen to int128/decimal, same plan).

The reference engine has no relational joins (its only join is the
per-tick vector match, src/query/value.rs:69); this family is part of
the training-data surface, where enrichment joins are routine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from ..sources.readers import small_input_blocks
from ..stages.join import broadcast_join, shuffle_join
from ..stages.sizing import parquet_rows, suggest_buckets


def _join_buckets(sf_dir: str, *tables: str) -> int:
    """Shuffle-join width sized to the BIGGER side's parquet footer row
    count (stages/sizing.py): 8 at every test scale, growing at 100x so
    a bucket's build side stays worker-heap-sized."""
    return suggest_buckets(
        max(parquet_rows(f"{sf_dir}/{t}.parquet") for t in tables)
    )


def _read(sf_dir: str, table: str, columns: list[str]):
    path = f"{sf_dir}/{table}.parquet"
    return rd.read_parquet(
        path, columns=columns, override_num_blocks=small_input_blocks(path)
    )


def _cents(arr: pa.ChunkedArray) -> np.ndarray:
    """Exact integer cents of a 2-decimal double column."""
    return np.rint(arr.to_numpy(zero_copy_only=False) * 100.0).astype(np.int64)


# ---------------------------------------------------------------------------
# tpch_q1: pricing summary — partial aggregation, no exchange
# ---------------------------------------------------------------------------

_Q1_CUTOFF_US = np.datetime64("1998-09-02T00:00:00", "us")


def q_tpch_q1(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1-shaped pricing summary: group lineitem by
    (returnflag, linestatus) with sum/avg/count aggregates.

    Per-batch Arrow group_by → ≤6 partial rows per block; the driver
    folds the tiny partial stream.  Scale-safe: wire volume is
    6 × |blocks| rows regardless of |lineitem|.
    """
    ds = _read(
        sf_dir,
        "lineitem",
        [
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_shipdate",
        ],
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(_Q1_CUTOFF_US)))
        q100 = _cents(t["l_quantity"])
        p100 = _cents(t["l_extendedprice"])
        d100 = _cents(t["l_discount"])  # discount in percent points
        t100 = _cents(t["l_tax"])
        disc_price_e4 = p100 * (100 - d100)  # 1e-4 dollar units
        charge_e6 = disc_price_e4 * (100 + t100)  # 1e-6 dollar units
        keyed = pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "q100": pa.array(q100),
                "p100": pa.array(p100),
                "dp_e4": pa.array(disc_price_e4),
                "ch_e6": pa.array(charge_e6),
                "d100": pa.array(d100),
            }
        )
        return keyed.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [
                ("q100", "sum"),
                ("p100", "sum"),
                ("dp_e4", "sum"),
                ("ch_e6", "sum"),
                ("d100", "sum"),
                ("q100", "count"),
            ]
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = (
        parts.groupby(["l_returnflag", "l_linestatus"], as_index=False)
        .sum(numeric_only=True)
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )
    n = g["q100_count"].to_numpy().astype(np.int64)
    return pd.DataFrame(
        {
            "l_returnflag": g["l_returnflag"],
            "l_linestatus": g["l_linestatus"],
            "sum_qty": g["q100_sum"].to_numpy() / 100.0,
            "sum_base_price": g["p100_sum"].to_numpy() / 100.0,
            "sum_disc_price": g["dp_e4_sum"].to_numpy() / 1e4,
            "sum_charge": g["ch_e6_sum"].to_numpy() / 1e6,
            "avg_qty": g["q100_sum"].to_numpy() / (100.0 * n),
            "avg_price": g["p100_sum"].to_numpy() / (100.0 * n),
            "avg_disc": g["d100_sum"].to_numpy() / (100.0 * n),
            "count_order": n,
        }
    )


# ---------------------------------------------------------------------------
# tpch_rev_by_nation: shuffle join (fact-fact) + broadcast join (dimension)
# ---------------------------------------------------------------------------


def q_tpch_rev_by_nation(sf_dir: str, num_buckets: int | None = None) -> pd.DataFrame:
    """Order revenue per nation: orders ⋈ customer ⋈ nation.

    orders and customer both scale with SF → shuffle join (each side
    crosses the wire once, co-partitioned on custkey); nation is 25
    rows → broadcast.  The aggregate then folds per batch to ≤25 rows.
    """
    if num_buckets is None:  # size to the bigger shuffle side (footer rows)
        num_buckets = _join_buckets(sf_dir, "orders", "customer")
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    joined = shuffle_join(
        orders, cust, "o_custkey", "c_custkey", num_buckets=num_buckets
    )
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    enriched = broadcast_join(
        joined, nation, keys="c_nationkey", right_keys="n_nationkey"
    )

    def partial(t: pa.Table) -> pa.Table:
        keyed = pa.table(
            {"n_name": t["n_name"], "cents": pa.array(_cents(t["o_totalprice"]))}
        )
        return keyed.group_by(["n_name"]).aggregate(
            [("cents", "sum"), ("cents", "count")]
        )

    parts = enriched.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = (
        parts.groupby("n_name", as_index=False)
        .sum(numeric_only=True)
        .sort_values("n_name")
        .reset_index(drop=True)
    )
    return pd.DataFrame(
        {
            "n_name": g["n_name"],
            "revenue": g["cents_sum"].to_numpy() / 100.0,
            "n_orders": g["cents_count"].to_numpy().astype(np.int64),
        }
    )


# ---------------------------------------------------------------------------
# tpch_building_orders: broadcast semi join (distributed IN-subquery)
# ---------------------------------------------------------------------------


def q_tpch_building_orders(sf_dir: str) -> pd.DataFrame:
    """Orders of BUILDING-segment customers, summarized by priority.

    The filtered customer-key set is broadcast once; each orders batch
    keeps matching rows via Arrow's left-semi join.  At 100 TB the
    filtered key set is the SMALL side by construction (one segment of
    one dimension); if it ever outgrows worker heaps the same query
    routes through shuffle_join(join_type="left semi").
    """
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    keys = cust.filter(pc.equal(cust["c_mktsegment"], "BUILDING")).select(
        ["c_custkey"]
    )
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority", "o_totalprice"])
    sem = broadcast_join(
        orders, keys, keys="o_custkey", right_keys="c_custkey", join_type="left semi"
    )

    def partial(t: pa.Table) -> pa.Table:
        keyed = pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "cents": pa.array(_cents(t["o_totalprice"])),
            }
        )
        return keyed.group_by(["o_orderpriority"]).aggregate(
            [("cents", "sum"), ("cents", "count")]
        )

    parts = sem.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = (
        parts.groupby("o_orderpriority", as_index=False)
        .sum(numeric_only=True)
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    return pd.DataFrame(
        {
            "o_orderpriority": g["o_orderpriority"],
            "total_price": g["cents_sum"].to_numpy() / 100.0,
            "n_orders": g["cents_count"].to_numpy().astype(np.int64),
        }
    )


QUERIES = {
    "tpch_q1": q_tpch_q1,
    "tpch_rev_by_nation": q_tpch_rev_by_nation,
    "tpch_building_orders": q_tpch_building_orders,
}

# The oracles mirror the integer-exact plan: aggregates run over
# DECIMAL casts (exact), and the ×100 numerator trick makes each AVG a
# single correctly-rounded double division on both sides.
ORACLES = {
    "tpch_q1": """
        SELECT l_returnflag,
               l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(4,2)))
                        * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
               CAST(100 * SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                   / (100.0 * COUNT(*)) AS avg_qty,
               CAST(100 * SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                   / (100.0 * COUNT(*)) AS avg_price,
               CAST(100 * SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
                   / (100.0 * COUNT(*)) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "tpch_rev_by_nation": """
        SELECT n_name,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        ORDER BY n_name
    """,
    "tpch_building_orders": """
        SELECT o_orderpriority,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price,
               COUNT(*) AS n_orders
        FROM orders
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
}


# ---------------------------------------------------------------------------
# tpch_quiet_customers: shuffle ANTI join (distributed NOT EXISTS)
# ---------------------------------------------------------------------------


def q_tpch_quiet_customers(sf_dir: str, num_buckets: int | None = None) -> pd.DataFrame:
    """Customers with NO urgent order, counted per nation.

    The NOT EXISTS side (urgent orders) scales with SF, so this is a
    SHUFFLE left-anti join: both customer and the filtered order keys
    cross the wire exactly once, co-partitioned on custkey.  The
    nation name re-attach is a 25-row broadcast, and the final count
    folds per batch to ≤25 rows before the driver sees it.
    """
    if num_buckets is None:
        num_buckets = _join_buckets(sf_dir, "customer", "orders")
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"])

    def urgent_keys(t: pa.Table) -> pa.Table:
        m = pc.equal(t["o_orderpriority"], "1-URGENT")
        # per-batch dedup: the anti probe only needs distinct keys
        return (
            t.filter(m).select(["o_custkey"]).group_by(["o_custkey"]).aggregate([])
        )

    quiet = shuffle_join(
        cust,
        orders.map_batches(urgent_keys, batch_format="pyarrow"),
        "c_custkey",
        "o_custkey",
        num_buckets=num_buckets,
        join_type="left anti",
    )
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    enriched = broadcast_join(
        quiet, nation, keys="c_nationkey", right_keys="n_nationkey"
    )

    def partial(t: pa.Table) -> pa.Table:
        return t.select(["n_name"]).group_by(["n_name"]).aggregate([([], "count_all")])

    parts = enriched.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = (
        parts.groupby("n_name", as_index=False)
        .sum(numeric_only=True)
        .sort_values("n_name")
        .reset_index(drop=True)
    )
    return pd.DataFrame(
        {
            "n_name": g["n_name"],
            "n_customers": g["count_all"].to_numpy().astype(np.int64),
        }
    )


QUERIES["tpch_quiet_customers"] = q_tpch_quiet_customers
ORACLES["tpch_quiet_customers"] = """
    SELECT n_name, COUNT(*) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    WHERE NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
    )
    GROUP BY n_name
    ORDER BY n_name
"""


def q_rel_users_outer_customers(
    sf_dir: str, num_buckets: int | None = None, sink_dir: str | None = None
) -> pd.DataFrame:
    """FULL OUTER shuffle join: per-user event counts ⟗ customers on
    user_id = c_custkey — the join type the TPC-H quartet doesn't
    exercise (customers with no events keep NULL-side event counts;
    either side may be the orphan depending on the key ranges).

    Plan: the events side pre-aggregates to ≤|users| rows per batch
    (combine-before-exchange), then both sides hash-partition once on
    the key and each bucket runs ONE Arrow full-outer join — co-
    partitioned, nothing broadcast, each side crosses the wire once."""
    import ray.data as rd

    from ..sources.readers import small_input_blocks

    if num_buckets is None:
        num_buckets = _join_buckets(sf_dir, "events", "customer")
    path = f"{sf_dir}/events.parquet"
    events = rd.read_parquet(
        path, columns=["user_id"],
        override_num_blocks=small_input_blocks(path),
    )

    def per_user(t: pa.Table) -> pa.Table:
        g = t.group_by(["user_id"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "user_id": pc.cast(g["user_id"], pa.int64()),
                "n_events": pc.cast(g["count_all"], pa.int64()),
            }
        )

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = shuffle_join(
        events.map_batches(per_user, batch_format="pyarrow"),
        cust,
        "user_id",
        "c_custkey",
        num_buckets=num_buckets,
        join_type="full outer",
    )

    # Arrow's full outer COALESCES the key into the left key column, so
    # user_id already carries the customer key on right-only rows.
    # Per-user partials may split across input batches within a bucket:
    # fold counts after the join.  A bucket block holds EVERY row of its
    # users (hash-by-user exchange), so the fold is exact per block —
    # which is what lets the sink path stream without a driver fold.
    def fold(t: pa.Table) -> pa.Table:
        tmp = pa.table({
            "key": pc.cast(t["user_id"], pa.int64()),
            "mktsegment": pc.coalesce(
                t["c_mktsegment"], pa.scalar("<none>", pa.string())
            ),
            "n_events": pc.coalesce(
                pc.cast(t["n_events"], pa.int64()),
                pa.scalar(0, pa.int64()),
            ),
        })
        g = tmp.group_by(["key", "mktsegment"]).aggregate(
            [("n_events", "sum")]
        )
        n = pc.cast(g["n_events_sum"], pa.int64())
        return pa.table({
            "key": g["key"],
            "n_events": n,
            "mktsegment": g["mktsegment"],
            "has_events": pc.greater(n, pa.scalar(0, pa.int64())),
        })

    folded = joined.map_batches(fold, batch_format="pyarrow")
    if sink_dir is not None:
        # 100x path (VERDICT r4 #4): the user-cardinality result streams
        # to a partitioned parquet sink with a manifest; the driver sees
        # only the summary
        from .sinks import sink_dataset

        return sink_dataset(
            folded, sink_dir, input_path=sf_dir,
            query="rel_users_outer_customers",
        )
    return (
        folded.to_pandas().sort_values("key").reset_index(drop=True)
    )


QUERIES["rel_users_outer_customers"] = q_rel_users_outer_customers
ORACLES["rel_users_outer_customers"] = """
    WITH u AS (
        SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY 1
    )
    SELECT COALESCE(u.user_id, c.c_custkey) AS key,
           CAST(COALESCE(u.n_events, 0) AS BIGINT) AS n_events,
           COALESCE(c.c_mktsegment, '<none>') AS mktsegment,
           COALESCE(u.n_events, 0) > 0 AS has_events
    FROM u FULL OUTER JOIN customer c ON u.user_id = c.c_custkey
    ORDER BY key
"""
