"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in pq_ray) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: the token-corpus rollup cascade at tiny scale.

    Generates the deterministic pre-tokenized corpus (the engine's
    primary input per BASELINE.json input_hint), decodes it to samples,
    rolls up to the 1m tier and cascades to 1h — returning the 1h points
    table (stable schema, >0 rows).
    """
    import ray.data as rd

    from pq_ray.fixtures import generate_tokens_table
    from pq_ray.stages.decode import decode_dataset
    from pq_ray.stages.rollup import cascade, rollup

    corpus = generate_tokens_table(500, seed=42)
    samples = decode_dataset(rd.from_arrow(corpus), batch_size=128, concurrency=2)
    pts_1m = rollup(samples, 60_000, num_buckets=8)
    pts_1h = cascade(pts_1m, 3_600_000, num_buckets=8)
    return (
        pts_1h.to_pandas()
        .sort_values(["series_id", "window_ts"])
        .reset_index(drop=True)
    )


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from pq_ray.pipelines import events

    out: dict[str, Callable[[str], Any]] = {}
    out.update(events.QUERIES)
    try:
        from pq_ray.pipelines import tsops

        out.update(tsops.QUERIES)
    except ImportError:
        pass
    try:
        from pq_ray.pipelines import training

        out.update(training.QUERIES)
    except ImportError:
        pass
    try:
        from pq_ray.pipelines import pq_queries

        out.update(pq_queries.QUERIES)
    except ImportError:
        pass
    try:
        from pq_ray.pipelines import multimodal

        out.update(multimodal.QUERIES)
    except ImportError:
        pass
    try:
        from pq_ray.pipelines import logs

        out.update(logs.QUERIES)
    except ImportError:
        pass
    try:
        from pq_ray.pipelines import relational

        out.update(relational.QUERIES)
    except ImportError:
        pass
    try:
        from pq_ray.pipelines import curation

        out.update(curation.QUERIES)
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted for genuinely
    non-SQL-expressible ops — the driver then records a rows-only check)."""
    from pq_ray.pipelines import events

    out: dict[str, str] = {}
    out.update(events.ORACLES)
    try:
        from pq_ray.pipelines import tsops

        out.update(tsops.ORACLES)
    except ImportError:
        pass
    try:
        from pq_ray.pipelines import training

        out.update(training.ORACLES)
    except ImportError:
        pass
    try:
        from pq_ray.pipelines import pq_queries

        out.update(pq_queries.ORACLES)
    except ImportError:
        pass
    try:
        from pq_ray.pipelines import logs

        out.update(logs.ORACLES)
    except ImportError:
        pass
    try:
        from pq_ray.pipelines import relational

        out.update(relational.ORACLES)
    except ImportError:
        pass
    try:
        from pq_ray.pipelines import curation

        out.update(curation.ORACLES)
    except ImportError:
        pass
    return out
