"""Shared read-planning helpers for parquet sources."""

from __future__ import annotations

import os


def small_input_blocks(path: str, cap: int = 16) -> int | None:
    """Block-count override for TINY single-file inputs, else None.

    Ray's read planner slivers a small single-file input into ~2xCPU
    blocks and the per-task fixed cost then dominates the read (measured
    0.6s -> 0.2s for a 0.6 MB documents table at 32 CPUs).  Real corpora
    — directories of many files, or anything >= 64 MB — return None so
    Ray's default parallelism (and multi-node scaling) is untouched.
    """
    try:
        if os.path.isfile(path) and os.path.getsize(path) < (64 << 20):
            return cap
    except OSError:
        pass
    return None
