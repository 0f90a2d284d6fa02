"""pq-compatible CLI: parse and query log streams as time series.

Usage (mirrors the reference's CLI, src/cliopt.rs):

    python -m pq_ray.cli '<program>' [-I/--interval 1s] [-b/--lookback 1s]
                                     [-s/--since TS] [-u/--until TS] < input

Reads lines from stdin, writes formatted results to stdout — a drop-in
for `pq '<program>' < file`.  This is the local single-process path (the
reference is single-threaded by construction); the distributed engine
lives in pq_ray.pipelines.
"""

from __future__ import annotations

import argparse
import sys

from .model import parse_duration_ms, try_parse_time_ms
from .runner import run_program


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="pq_ray", description=__doc__)
    ap.add_argument("program", help="pq program: <decoder> | map {...} | select <query> | <formatter>")
    ap.add_argument("-I", "--interval", default=None)
    ap.add_argument("-b", "--lookback", default=None)
    ap.add_argument("-s", "--since", default=None)
    ap.add_argument("-u", "--until", default=None)
    # reference flags (src/cliopt.rs:26-30): -v item-level error
    # reporting, -i interactive ANSI screen output
    ap.add_argument("-v", "--verbose", action="store_true")
    ap.add_argument("-i", "--interactive", action="store_true")
    # pq_ray extension (not in the reference CLI): evaluate the operators
    # the reference only parses (and/or/unless, group_left/right,
    # quantile/stddev/stdvar/count_values, clamp*, label_replace)
    ap.add_argument("-x", "--extensions", action="store_true")
    # pq_ray extension: run the DISTRIBUTED engine over a log directory
    # / file list instead of stdin (pipelines.logs — byte-range splits,
    # Ray-parallel decode, distributed tick-grid evaluation)
    ap.add_argument(
        "-f", "--files", default=None, metavar="PATH",
        help="log file or directory: use the Ray-distributed engine instead of stdin",
    )
    args = ap.parse_args(argv)

    opts = {"verbose": args.verbose, "interactive": args.interactive,
            "extensions": args.extensions}
    if args.interval:
        opts["interval_ms"] = parse_duration_ms(args.interval)
    if args.lookback:
        opts["lookback_ms"] = parse_duration_ms(args.lookback)
    if args.since:
        ts = try_parse_time_ms(args.since)
        if ts is None:
            print(f"couldn't parse --since {args.since!r}", file=sys.stderr)
            return 2
        opts["since_ms"] = ts
    if args.until:
        ts = try_parse_time_ms(args.until)
        if ts is None:
            print(f"couldn't parse --until {args.until!r}", file=sys.stderr)
            return 2
        opts["until_ms"] = ts

    try:
        if args.files:
            # the CLI is a script entry point, so it owns the Ray session
            import ray

            from .pipelines.logs import run_log_query

            started = False
            if not ray.is_initialized():
                ray.init(
                    address="local", include_dashboard=False,
                    logging_level="ERROR",
                )
                started = True
            dist_opts = {
                k: v
                for k, v in opts.items()
                if k in ("interval_ms", "lookback_ms", "since_ms",
                         "until_ms", "extensions", "verbose")
            }
            try:
                for out in run_log_query(args.files, args.program, **dist_opts):
                    print(out)
            finally:
                if started:  # leave an embedding caller's session alone
                    ray.shutdown()
        else:
            lines = sys.stdin.buffer.read().splitlines()
            for out in run_program(args.program, lines, **opts):
                print(out)
    except (ValueError, RuntimeError) as e:
        # parse errors + typed engine errors (the reference's panics)
        print(f"pq_ray: {e}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
