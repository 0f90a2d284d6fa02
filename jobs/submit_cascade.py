"""Entry point for ``ray job submit`` — the production shape of the
cascade per the north rule.

On a real cluster:

    ray job submit --working-dir . -- \
        python jobs/submit_cascade.py --corpus s3://bucket/corpus \
            --out s3://bucket/tiers --buckets 4096

In this sandbox it runs the same code in local mode.  The job is
idempotent: tier manifests make reruns resume (skip finished tiers) and
``--retention-now`` applies the downsample-retention policy after the
cascade.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# resolve pq_ray from the job's working dir (ray job submit ships it)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--tiers", default="1000,60000,3600000,86400000")
    ap.add_argument("--buckets", type=int, default=None,
                    help="exchange bucket count; default self-sizes from "
                         "corpus parquet metadata (stages/sizing.py)")
    ap.add_argument("--retention-now", type=int, default=None,
                    help="apply the retention policy as of this Unix ms")
    ap.add_argument("--refresh", action="store_true",
                    help="incremental continuous-aggregate refresh: decode "
                         "only corpus files appended since the last build "
                         "and merge them into the tiers (falls back to a "
                         "full build/rebuild when the diff is not an "
                         "append; pipelines/refresh.py)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="auto" if "--address" in sys.argv else "local",
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from pq_ray.pipelines.cascade import run_cascade

    tiers = [int(t) for t in args.tiers.split(",")]
    if args.refresh:
        from pq_ray.pipelines.refresh import refresh_cascade

        stats = refresh_cascade(
            args.corpus, args.out, tiers, num_buckets=args.buckets
        )
    else:
        stats = run_cascade(
            args.corpus, args.out, tiers=tiers, num_buckets=args.buckets
        )
    if args.retention_now is not None:
        from pq_ray.pipelines.retention import apply_retention

        stats["retention"] = {
            str(k): v for k, v in apply_retention(args.out, args.retention_now).items()
        }
    print(json.dumps(stats))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
