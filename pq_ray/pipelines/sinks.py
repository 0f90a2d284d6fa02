"""Streaming parquet sinks for dense-output queries (VERDICT r4 #4).

The gap-fill family (``events_gapfill_1m`` / ``events_interp_1m`` /
``events_locf_1m``) and the full-outer join return results whose row
count scales with the data (the dense minute spine; the user-cardinality
join) — at 100x those no longer fit a driver DataFrame.  Each of those
queries therefore takes a ``sink_dir``: when given, the SAME dense
Dataset streams through a label-attach map stage straight into a
partitioned parquet directory (one file per output block, written by the
workers — the driver never materializes the result), a ``_MANIFEST.json``
records lineage + per-file row counts, and only a small summary dict
returns.  A rerun with an unchanged input fingerprint is a no-op
(the manifest IS the checkpoint).  The DataFrame path remains for the
driver correctness contract at test scale.
"""

from __future__ import annotations

import os
import shutil
import time

from ..state import manifest as mf


def sink_dataset(
    ds,
    sink_dir: str,
    *,
    input_path: str,
    query: str,
    resume: bool = True,
) -> dict:
    """Stream ``ds`` to ``sink_dir`` as parquet + manifest; returns
    {rows, files, skipped}.

    ``input_path``: the directory whose parquet files this result is a
    pure function of (fingerprinted for resume).  ``resume=True`` skips
    the write entirely when a complete manifest with the same
    fingerprint and query tag exists — the failed-run resumability the
    north rule asks for, at whole-result granularity (blocks land as
    separate files as they stream, so a PARTIAL failed run re-runs
    without re-reading finished sibling queries)."""
    fp = mf.dir_fingerprint(input_path)
    m = mf.load(sink_dir)
    if (
        resume
        and m is not None
        and m.get("completed")
        and m.get("input_fingerprint") == fp
        and m.get("query") == query
    ):
        return {
            "rows": m["rows_out"],
            "files": len(m["files"]),
            "skipped": True,
            "sink_dir": sink_dir,
        }
    t0 = time.perf_counter()
    shutil.rmtree(sink_dir, ignore_errors=True)
    os.makedirs(sink_dir, exist_ok=True)
    ds.write_parquet(sink_dir)
    m = mf.publish(
        sink_dir,
        tier_ms=0,
        input_path=input_path,
        input_fingerprint=fp,
        rows_in=-1,
        wall_sec=time.perf_counter() - t0,
        extra={"query": query},
    )
    return {
        "rows": m["rows_out"],
        "files": len(m["files"]),
        "skipped": False,
        "sink_dir": sink_dir,
    }
