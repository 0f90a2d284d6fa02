"""Out-of-band correctness draw at a LARGER scale factor than the
driver's sf0.01 gate (VERDICT r2 #10): run every oracled query against
its DuckDB oracle at ``--sf-dir`` (default sf0.1) with the driver's
compare semantics (row count, schema, order-insensitive value check
with columns sorted by name) and write a CORRECTNESS-style JSON.

Usage:  python jobs/correctness_draw.py [--sf-dir /root/testdata/sf0.1]
                                        [--out CORRECTNESS_sf0.1.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import duckdb
import numpy as np
import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def compare(got, exp) -> dict:
    """Driver-faithful compare (VERDICT r3 #3): the driver's value-hash is
    dtype-sensitive (an engine int64 `1` vs an oracle float64 `1.0`
    hash-mismatches even though np.allclose passes — that is exactly how
    CORRECTNESS_r03's two reds were masked by the old allclose-based
    replay).  So: numeric-kind mismatch (int vs float) ⇒ hash_match=False,
    and float columns compare EXACTLY (bitwise, NaN==NaN) rather than
    within tolerance.  ``values_close`` keeps the old tolerant verdict as
    a diagnostic so a dtype artifact is distinguishable from a value bug.
    """
    res = {"rows_match": None, "schema_match": None, "hash_match": None,
           "spark_rows": int(len(got)), "oracle_rows": int(len(exp)), "err": None}
    res["rows_match"] = len(got) == len(exp)
    gs = got[sorted(got.columns)]
    es = exp[sorted(exp.columns)]
    res["schema_match"] = list(gs.columns) == list(es.columns)
    if not (res["rows_match"] and res["schema_match"]):
        res["hash_match"] = False
        return res
    gs = gs.sort_values(list(gs.columns)).reset_index(drop=True)
    es = es.sort_values(list(es.columns)).reset_index(drop=True)
    ok = True
    close = True
    for c in gs.columns:
        a, b = gs[c].to_numpy(), es[c].to_numpy()
        ka, kb = a.dtype.kind, b.dtype.kind
        float_kinds = {"f"}
        int_kinds = {"i", "u", "b"}
        if (ka in float_kinds) != (kb in float_kinds) and (
            ka in float_kinds | int_kinds and kb in float_kinds | int_kinds
        ):
            # int-vs-float: the driver hashes the repr/dtype, so this is red
            ok = False
            res.setdefault("dtype_mismatch", []).append(
                f"{c}: {a.dtype} vs {b.dtype}"
            )
            close &= bool(np.allclose(a.astype(np.float64),
                                      b.astype(np.float64), equal_nan=True))
            continue
        if ka in float_kinds and kb in float_kinds:
            ok &= bool(np.array_equal(a.astype(np.float64),
                                      b.astype(np.float64), equal_nan=True))
            close &= bool(np.allclose(a.astype(np.float64),
                                      b.astype(np.float64), equal_nan=True))
        else:
            col_ok = bool((a.astype(str) == b.astype(str)).all())
            ok &= col_ok
            close &= col_ok
        if not close:
            break
    res["hash_match"] = ok
    if ok != close:
        res["values_close"] = close
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None)
    ap.add_argument("--only", default=None,
                    help="comma-separated query-name prefixes to draw")
    args = ap.parse_args()
    sf = args.sf_dir
    out_path = args.out or f"CORRECTNESS_{sf.rstrip('/').split('/')[-1]}.json"

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    if args.only:
        prefixes = tuple(args.only.split(","))
        qs = {k: v for k, v in qs.items() if k.startswith(prefixes)}
    con = duckdb.connect()


    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"create view {t} as select * from read_parquet('{p}')")

    results = {}
    for name, fn in qs.items():
        t0 = time.time()
        try:
            got = fn(sf)
            if hasattr(got, "to_pandas"):
                got = got.to_pandas()
            t_pipe = time.time() - t0
            if name not in oracles:
                results[name] = {
                    "rows_match": None, "schema_match": None, "hash_match": None,
                    "spark_rows": int(len(got)), "oracle_rows": None,
                    "err": "no_oracle",
                }
            else:
                exp = con.sql(oracles[name]).df()
                results[name] = compare(got, exp)
                results[name]["oracle_sec"] = round(time.time() - t0 - t_pipe, 1)
            results[name]["sec"] = round(t_pipe, 1)
        except Exception as ex:  # record, keep drawing
            results[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": None,
                             "oracle_rows": None, "err": f"{type(ex).__name__}: {ex}"}
        status = results[name].get("err") or (
            "ok" if results[name]["hash_match"] else "MISMATCH"
        )
        print(f"{name}: {status} ({results[name].get('sec', '?')}s)", flush=True)

    with open(out_path, "w") as f:
        json.dump({"sf_dir": sf, "results": results}, f, indent=1)
    n_ok = sum(1 for r in results.values() if r["hash_match"])
    n_no = sum(1 for r in results.values() if r.get("err") == "no_oracle")
    print(f"written {out_path}: {n_ok} hash-green, {n_no} rows-only, "
          f"{len(results) - n_ok - n_no} failing")
    ray.shutdown()


if __name__ == "__main__":
    main()
