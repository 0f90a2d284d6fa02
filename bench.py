"""Benchmark harness.

Headline pipeline: the token-corpus rollup cascade raw→1m→1h→1d — decode
the pre-tokenized Parquet corpus into timestamped samples, roll up to 1s
points, cascade through 1m → 1h → 1d tiers, writing each tier to Parquet.
Metric: rolled-up raw samples/sec across all tiers (BASELINE.json).

Also times the events-table rollup queries over ``$GRAFT_SF_DIR``
(default /root/testdata/sf0.1).

Prints ONE JSON line:
    {"metric": ..., "value": <headline seconds>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, "samples_per_sec": ...}

``--scaling`` runs the headline pipeline in two fresh processes
(num_cpus=8 and num_cpus=32, same input) and reports both throughputs +
scaling efficiency — the sandbox stand-in for the N vs 4N node clusters
of the north rule.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

import numpy as np

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# Bench corpus size: 1M docs ≈ 155M token samples at the default length
# distribution. Override with GRAFT_BENCH_DOCS.
BENCH_DOCS = int(os.environ.get("GRAFT_BENCH_DOCS", "1000000"))
CORPUS_DIR = f"/tmp/pq_ray_bench/corpus_{BENCH_DOCS}"
TIER_DIR = "/tmp/pq_ray_bench/tiers"

TIERS = [1000, 60_000, 3_600_000, 86_400_000]  # raw(1s) → 1m → 1h → 1d


def run_headline() -> dict:
    import ray.data as rd

    from pq_ray.pipelines.cascade import run_cascade

    shutil.rmtree(TIER_DIR, ignore_errors=True)
    t0 = time.perf_counter()
    result = run_cascade(
        corpus_path=CORPUS_DIR,
        out_dir=TIER_DIR,
        tiers=TIERS,
        num_buckets=None,  # scale-adaptive (stages/sizing.cascade_buckets):
        # CPU-matched floor = the old max(32, 2*cpus) at bench scale,
        # growing with estimated corpus samples past ~770M
    )
    elapsed = time.perf_counter() - t0
    return {
        "sec": elapsed,
        "raw_samples": result["raw_samples"],
        "samples_per_sec": result["raw_samples"] / elapsed,
        "tier_rows": result["tier_rows"],
        "phases": result.get("phases", {}),
    }


QUERY_REPS = int(os.environ.get("GRAFT_BENCH_QUERY_REPS", "2"))


def host_canary_gbps() -> float:
    """First-touch memory bandwidth of this VM right now, GB/s.

    The sandbox host intermittently degrades page-fault servicing by
    ~100× (observed: 0.03–0.1 GB/s first-touch vs ~1.5 GB/s quiet —
    BASELINE.md "host-noise burst").  Ray workers first-touch every
    fresh batch, so the whole pipeline inherits the degradation.  This
    number rides along in the bench JSON so a slow draw is attributable:
    ≳1 GB/s = quiet window, ≲0.3 GB/s = burst (expect 2–10× inflation).
    """
    import mmap

    # anonymous mmap + FULL writes: the degradation throttles full-page
    # writes to newly-faulted memory (measured: fault-only touching runs
    # ~10× faster than full writes during a burst, and a numpy realloc
    # can reuse warm arena pages entirely) — so the honest probe writes
    # every byte of a mapping that is guaranteed fresh
    size = 400 * 1024 * 1024
    chunk = b"\x01" * (1 << 20)
    worst = float("inf")
    # the throttle FLAPS on a seconds scale (measured: 1.0 GB/s and
    # 0.04 GB/s probes seconds apart) — take the min of 3 spaced probes
    for _ in range(3):
        m = mmap.mmap(-1, size)
        t0 = time.perf_counter()
        for _ in range(size >> 20):
            m.write(chunk)
        worst = min(worst, size / (1024**3) / (time.perf_counter() - t0))
        m.close()
        time.sleep(0.5)
    return round(worst, 3)


def cpu_canary_sec() -> float:
    """Wall time of a fixed single-thread numpy sort, seconds.

    The memory-bandwidth canary above misses a second noise dimension:
    whole-window CPU slowdown (observed: byte-identical cascade runs at
    4.4 s and 7.8 s with first-touch ≥1.3 GB/s in both windows —
    host CPU steal / frequency, not paging).  A fixed ~0.4 s sort is a
    pure-CPU yardstick: ~0.28 s quiet (measured); materially above that
    = slow window (expect proportional headline inflation).  Recorded
    once per draw so every headline is attributable."""
    n = 16_000_000
    arr = (np.arange(n, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)) & np.uint64(
        (1 << 63) - 1
    )
    np.sort(arr)  # untimed: faults in the work buffer so the timed pass is pure CPU
    t0 = time.perf_counter()
    np.sort(arr)
    return round(time.perf_counter() - t0, 3)


def _time_query(fn) -> float:
    """min-of-N per query (same rationale as the headline's min-of-2:
    the VM's bursty wall-time inflation, see BASELINE.md)."""
    best = float("inf")
    for _ in range(QUERY_REPS):
        t0 = time.perf_counter()
        df = fn(SF_DIR)
        best = min(best, time.perf_counter() - t0)
        assert len(df) > 0
    return round(best, 3)


def run_queries() -> dict:
    from pq_ray.pipelines import curation, dq, events, pq_queries, relational, tsops

    out = {name: _time_query(fn) for name, fn in events.QUERIES.items()}
    out.update({name: _time_query(fn) for name, fn in tsops.QUERIES.items()})
    out.update({name: _time_query(fn) for name, fn in relational.QUERIES.items()})
    out.update({name: _time_query(fn) for name, fn in curation.QUERIES.items()})
    # round 4: distributed query combinators + the exchange-finalized
    # pq tick-grid pair most changed by VERDICT r3 #5
    out.update({name: _time_query(fn) for name, fn in dq.QUERIES.items()})
    out.update({
        name: _time_query(pq_queries.QUERIES[name])
        for name in ("pq_topk3_1h", "pq_count_over_time_5m")
    })
    return out


# Training-data operators timed at $GRAFT_SF_DIR (5000 docs / 2000 vecs
# at sf0.1).  jaccard_pairs is exact all-pairs over a dense-vocab corpus
# (~36M candidate pairs before the J filter at sf0.1) — the quadratic
# cost is inherent to exactness; the approximate members (minhash, LSH)
# are the scale paths and run in a fraction of its time.
_TRAINING_BENCH = [
    "dedup_exact",
    "token_stats",
    "token_bpe",
    "jaccard_pairs",
    "minhash_pairs",
    "simhash",
    "lang_quality",
    "fingerprints",
    "repetition_filter",
    "stratified_sample",
    "ann_topk",
    "ann_ivf",
    "embed_neardup_lsh",
    "dedup_clusters",
    "span_dup_stats",
    "chunk_dedup",
    "pack_sequences",
    "source_report",
    "shuffle_order",
    "mixture_sample",
    "oov_stats",
]


def run_training_queries() -> dict:
    from pq_ray.pipelines import training

    return {
        f"tr_{name}": _time_query(training.QUERIES[name])
        for name in _TRAINING_BENCH
    }


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from pq_ray.fixtures import write_tokens_corpus

    write_tokens_corpus(CORPUS_DIR, BENCH_DOCS, seed=42)
    warm_docs = min(BENCH_DOCS, 100_000)
    warm_corpus = f"/tmp/pq_ray_bench/corpus_{warm_docs}"
    write_tokens_corpus(warm_corpus, warm_docs, seed=42)

    # Warm-up: a small cascade first, so the timed run measures steady
    # state (worker processes + imports + page cache), not cold start.
    from pq_ray.pipelines.cascade import run_cascade

    shutil.rmtree("/tmp/pq_ray_bench/warm", ignore_errors=True)
    run_cascade(warm_corpus, "/tmp/pq_ray_bench/warm", tiers=TIERS, num_buckets=16)
    import ray.data as rd

    rd.read_parquet(CORPUS_DIR).count()

    # min-of-2: the sandbox VM shows bursty 2-3x wall-time inflation at
    # fixed configuration (BASELINE.md); one repeat filters most of it.
    # Every draw's wall time is recorded in the output ("draws") so a
    # headline is interpretable as min-of-N — the adaptive re-draws
    # below make N vary between runs (ADVICE r4).
    cpu_canaries = [cpu_canary_sec()]
    headline = run_headline()
    draws = [round(headline["sec"], 3)]
    if os.environ.get("GRAFT_BENCH_REPS", "2") == "2":
        cpu_canaries.append(cpu_canary_sec())
        second = run_headline()
        draws.append(round(second["sec"], 3))
        if second["sec"] < headline["sec"]:
            headline = second
        # adaptive burst re-draws: if the draw sits clearly above the
        # quiet band (4.7-5.7 s at 1M docs — BASELINE.md), the VM's
        # first-touch throttle likely hit both reps; up to two more
        # attempts recover a quiet number when the flap window allows
        quiet_ceiling = 6.0 * (BENCH_DOCS / 1_000_000)
        while headline["sec"] > quiet_ceiling > 0 and len(draws) < 4:
            cpu_canaries.append(cpu_canary_sec())
            again = run_headline()
            draws.append(round(again["sec"], 3))
            if again["sec"] < headline["sec"]:
                headline = again
    queries = run_queries() if os.environ.get("GRAFT_BENCH_QUERIES", "1") == "1" else {}
    if os.environ.get("GRAFT_BENCH_QUERIES", "1") == "1":
        queries.update(run_training_queries())

    print(
        json.dumps(
            {
                "metric": "rolled-up samples/sec across raw->1m->1h->1d tiers",
                "value": round(headline["sec"], 3),
                "unit": "sec",
                "queries": queries,
                "sf": SF_DIR,
                "num_cpus": NUM_CPUS,
                "bench_docs": BENCH_DOCS,
                "draws": draws,
                "cpu_canary_per_draw": cpu_canaries,
                "raw_samples": headline["raw_samples"],
                "samples_per_sec": round(headline["samples_per_sec"]),
                "tier_rows": headline["tier_rows"],
                "phases": headline["phases"],
                "host_first_touch_gbps": host_canary_gbps(),
            }
        )
    )
    ray.shutdown()


def scaling() -> None:
    """Same job, same input, fresh ray sessions at 8 and 32 CPUs.

    Each run is pinned to that many *physical* cores with taskset —
    ``ray.init(num_cpus=N)`` only limits scheduling slots, while
    pyarrow/numpy thread pools would otherwise use every core and fake
    the small-cluster leg.  This is the sandbox stand-in for N vs 4N
    nodes; see BASELINE.md for why a single VM understates multi-node
    scaling (one shared memory bus serves both legs).
    """

    def run(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_BENCH_QUERIES="0",
            GRAFT_BENCH_REPS="1",  # --scaling already does min-of-N reps
            GRAFT_BENCH_DOCS=os.environ.get("GRAFT_SCALING_DOCS", "6000000"),
        )
        cmd = [sys.executable, os.path.abspath(__file__)]
        if shutil.which("taskset"):
            cmd = ["taskset", "-c", f"0-{ncpu - 1}"] + cmd
        out = subprocess.run(
            cmd,
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # The sandbox VM shows up to 2x run-to-run CPU-steal noise at fixed
    # configuration (see BASELINE.md); interleave the legs and take the
    # best of two so one noisy window doesn't decide the ratio.
    # 4 vs 16 cores at a 6M-doc corpus (927M samples) is the most
    # compute-dominated N-vs-4N pair that fits the time budget; the
    # split-task pre-combine keeps the 4-core leg's object-store
    # traffic bounded at this size (round-1's 3M limit no longer binds).
    lo, hi = int(os.environ.get("GRAFT_SCALING_LO", "4")), int(
        os.environ.get("GRAFT_SCALING_HI", "16")
    )
    runs = {lo: [], hi: []}
    t_start = time.perf_counter()
    for rep in range(4):
        for n in (lo, hi):
            runs[n].append(run(n))
        if time.perf_counter() - t_start > 420:
            break  # stay within the driver's budget
    def median(xs: list[float]) -> float:
        s = sorted(xs)
        m = len(s) // 2
        return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2

    r_lo = min(runs[lo], key=lambda r: r["value"])
    r_hi = min(runs[hi], key=lambda r: r["value"])
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    secs_lo = [r["value"] for r in runs[lo]]
    secs_hi = [r["value"] for r in runs[hi]]
    med_lo, med_hi = median(secs_lo), median(secs_hi)
    eff = (t_lo / t_hi) / (hi / lo)
    # paired-draw efficiencies: each interleaved rep pairs its own legs
    # (the VM's bursty noise hits both legs of a rep similarly, so the
    # pair distribution bounds how much min-of-N pairing flatters)
    pair_effs = [
        round((sl / sh) / (hi / lo), 3) for sl, sh in zip(secs_lo, secs_hi)
    ]
    print(
        json.dumps(
            {
                "sec_lo": t_lo,
                "sec_hi": t_hi,
                "samples_per_sec_lo": r_lo["samples_per_sec"],
                "samples_per_sec_hi": r_hi["samples_per_sec"],
                "scaling_efficiency": round(eff, 3),
                "scaling_efficiency_median": round((med_lo / med_hi) / (hi / lo), 3),
                "pair_efficiencies": pair_effs,
                "median_secs": {str(lo): med_lo, str(hi): med_hi},
                "raw_samples": r_lo["raw_samples"],
                "cores": {"lo": lo, "hi": hi},
                "reps_per_leg": {str(lo): len(runs[lo]), str(hi): len(runs[hi])},
                "all_secs": {str(n): [r["value"] for r in rs] for n, rs in runs.items()},
                # per-run host canaries (GB/s first-touch; ≲0.3 = burst,
                # see BASELINE.md) so each leg's draw is attributable
                "host_first_touch_gbps": {
                    str(n): [r.get("host_first_touch_gbps") for r in rs]
                    for n, rs in runs.items()
                },
                # per-run single-thread CPU canary lists (sec; ~0.28
                # quiet), one entry per draw of that run, so every
                # draw — not just the first — is attributable; catches
                # the steal flavor the first-touch probe misses
                "cpu_canary_sec": {
                    str(n): [r.get("cpu_canary_per_draw") for r in rs]
                    for n, rs in runs.items()
                },
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
