"""Measure incremental refresh vs full rebuild at a chosen scale.

Reproduces the BASELINE.md refresh datapoints: build the cascade over
all-but-N corpus files, append the held-back files, time
``refresh_cascade``, then time a full ``run_cascade`` over the complete
corpus — same session, interleaved, so the comparison shares one host
window.  Asserts tier rows identical between the two paths.

    python jobs/refresh_bench.py --corpus /tmp/pq_ray_bench/corpus_10000000 \
        --scratch /tmp/refresh_bench10 [--holdback 123]

Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--scratch", required=True)
    ap.add_argument("--holdback", type=int, default=None,
                    help="files appended after the initial build "
                         "(default ~10%% of the corpus)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from pq_ray.pipelines.cascade import run_cascade
    from pq_ray.pipelines.refresh import refresh_cascade

    files = sorted(glob.glob(os.path.join(args.corpus, "*.parquet")))
    holdback = args.holdback or max(1, len(files) // 10)
    n_init = len(files) - holdback
    assert n_init >= 1, "corpus too small for the requested holdback"
    corpus = os.path.join(args.scratch, "corpus")
    out = os.path.join(args.scratch, "out")
    shutil.rmtree(args.scratch, ignore_errors=True)
    os.makedirs(corpus)
    for p in files[:n_init]:
        os.symlink(p, os.path.join(corpus, os.path.basename(p)))

    t0 = time.perf_counter()
    s0 = run_cascade(corpus, out)
    t_init = time.perf_counter() - t0

    for p in files[n_init:]:
        os.symlink(p, os.path.join(corpus, os.path.basename(p)))
    t0 = time.perf_counter()
    s1 = refresh_cascade(corpus, out)
    t_ref = time.perf_counter() - t0
    r = s1["refresh"]

    t0 = time.perf_counter()
    s2 = run_cascade(corpus, os.path.join(args.scratch, "ref"))
    t_full = time.perf_counter() - t0
    assert s2["raw_samples"] == s0["raw_samples"] + r["delta_raw_samples"]
    assert s2["tier_rows"] == s1["tier_rows"], (s2["tier_rows"], s1["tier_rows"])

    print(
        json.dumps(
            {
                "corpus_files": len(files),
                "initial_files": n_init,
                "initial_samples": s0["raw_samples"],
                "initial_sec": round(t_init, 2),
                "delta_files": r["new_files"],
                "delta_samples": r["delta_raw_samples"],
                "refresh_sec": round(t_ref, 2),
                "refresh_mode": r["mode"],
                "merge_modes": {
                    k: v.get("mode") for k, v in r["merges"].items()
                },
                "full_rebuild_sec": round(t_full, 2),
                "speedup": round(t_full / max(t_ref, 1e-9), 2),
                "tier_rows": s1["tier_rows"],
            }
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
