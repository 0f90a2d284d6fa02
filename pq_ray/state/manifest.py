"""Per-tier checkpoint manifests: lineage + row counts + resume.

Every tier of the cascade writes its points to its own directory and
then atomically publishes a ``_MANIFEST.json`` recording:

- the tier's interval and its input fingerprint (what it was computed
  from — the corpus dir or the previous tier's manifest),
- per-output-file row counts (read from Parquet footers — no data scan),
- rows_in / rows_out and wall time (the per-partition metrics stream the
  north rule asks for).

A rerun calls ``is_complete`` first: a tier whose manifest matches its
input fingerprint is skipped entirely — that is mid-job resume at tier
granularity.  Because every stage is a pure function of its input
(decode is deterministic, partials are deterministic), a resumed run
produces byte-identical points (tested in tests/test_resume.py).
"""

from __future__ import annotations

import hashlib
import json
import os
import time

MANIFEST = "_MANIFEST.json"


def dir_fingerprint(path: str) -> str:
    """Cheap content identity of an input directory: sorted
    (name, size, mtime-less) of its parquet files. Sizes change whenever
    content changes (parquet is compressed, collisions irrelevant here)."""
    entries = []
    for name in sorted(os.listdir(path)):
        if name.endswith(".parquet"):
            entries.append((name, os.path.getsize(os.path.join(path, name))))
    return hashlib.md5(json.dumps(entries).encode()).hexdigest()


def input_inventory(path: str) -> dict[str, int]:
    """{parquet basename: size} of an input directory — the per-file
    inventory manifests record so an incremental refresh can diff an
    append from a rewrite (pipelines/refresh.py)."""
    return {
        n: os.path.getsize(os.path.join(path, n))
        for n in sorted(os.listdir(path))
        if n.endswith(".parquet")
    }


def load(tier_dir: str) -> dict | None:
    p = os.path.join(tier_dir, MANIFEST)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def is_complete(tier_dir: str, input_fingerprint: str) -> bool:
    m = load(tier_dir)
    return (
        m is not None
        and m.get("completed")
        and m.get("input_fingerprint") == input_fingerprint
    )


def file_row_counts(tier_dir: str) -> dict[str, int]:
    import pyarrow.parquet as pq

    out = {}
    for root, _dirs, files in os.walk(tier_dir):
        for name in sorted(files):
            if name.endswith(".parquet"):
                path = os.path.join(root, name)
                rel = os.path.relpath(path, tier_dir)
                out[rel] = pq.ParquetFile(path).metadata.num_rows
    return out


def publish(
    tier_dir: str,
    *,
    tier_ms: int,
    input_path: str,
    input_fingerprint: str,
    rows_in: int,
    wall_sec: float,
    extra: dict | None = None,
) -> dict:
    files = file_row_counts(tier_dir)
    manifest = {
        "tier_ms": tier_ms,
        "input_path": input_path,
        "input_fingerprint": input_fingerprint,
        "rows_in": rows_in,
        "rows_out": sum(files.values()),
        "files": files,
        "wall_sec": round(wall_sec, 3),
        "completed": True,
        "published_at": time.time(),
        **(extra or {}),
    }
    tmp = os.path.join(tier_dir, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(tier_dir, MANIFEST))  # atomic publish
    return manifest
