"""Incremental cascade refresh — continuous-aggregate append semantics.

``refresh_cascade(corpus, out_dir)`` brings an existing tier set up to
date after new corpus files are APPENDED, without re-decoding the files
already rolled up (the TimescaleDB continuous-aggregate refresh model;
the reference engine has no incremental path — its pull loop re-reads
the input per query, ``/root/reference/src/runner.rs``).

How it stays exact (the per-point match contract is preserved):

- Tier files hold the MERGEABLE partial struct (sum/count/min/max/
  first/last — ``stages/rollup.py AGG_COLS``), so an append is an
  associative merge, not a recompute.  Sample values are bounded
  integers carried in float64, so the re-associated sums are exact
  (< 2^53) and merge order cannot change a point — the same invariant
  the in-run tree combine already relies on.
- The delta (new files only) runs through the UNCHANGED phase-1 cascade
  into a staging dir; decode is a pure per-row function, so delta
  partials are identical to what a full run would have produced for
  those rows.
- Delta partials are merged into each fine tier with a key-combining
  rewrite (``np_combine_partials`` + positional label attach) of the
  delta files plus only the main files whose parquet-footer
  ``window_ts`` range overlaps the delta's — appends are typically
  time-ordered, so the rewrite touches the boundary windows, not the
  tier.  The rewrite is journaled (tmp-write → journal → rename →
  remove-inputs, same recovery contract as retention compaction) so a
  crash anywhere converges on re-run with no loss and no duplicates.
- The coarsest tier, Gorilla chunks and gap sidecars are then REBUILT
  from the merged fine tiers by ``run_cascade``'s existing fine-resume
  branch — tier-sized work ((series × windows)-bounded), never
  corpus-sized, which is the continuous-aggregate property.

Scale notes (100×): delta decode cost ∝ delta bytes; the merge reads
delta + overlapping-window main files (boundary-sized for time-ordered
appends; worst case one tier, never the corpus); the rebuild is
fine-tier-sized.  Removed or modified inputs are detected from the
manifest's per-file inventory and fall back to a full rebuild — the
append-only diff never guesses.

Lineage: every increment appends {inc_id, files, delta samples,
per-tier merge stats} to ``out_dir/_REFRESH.json`` (idempotent by
inc_id), on top of the per-tier manifests the cascade already keeps.

Interplay with retention/compaction: a late-arriving append whose
samples fall before a tier's pruned horizon re-introduces those windows
until the next ``apply_retention`` pass (standard continuous-aggregate
behavior — retention is a policy sweep, not an ingest filter), and
compaction's untagged output files simply demote that tier's next merge
to the global mode.  Float exactness bound: partial sums are integers
carried in float64, exact up to 2^53 — the same bound the in-run tree
combine already assumes; beyond it, merge order could round differently
than a monolithic build (not reachable with the bounded token values
this engine decodes).
"""

from __future__ import annotations

import json
import math
import os
import re
import shutil
import time

from ..state import manifest as mf
from .cascade import DEFAULT_TIERS, NUMERIC_COLS, run_cascade, tier_dir

# bucket index baked into tier file names by the fused gather
# (part-<bucket>.parquet) and by per-bucket merge outputs
# (part-<bucket>-<inc_id>.parquet); compaction output (compacted-N)
# does not parse, which correctly disables the per-bucket fast path
_BUCKET_RE = re.compile(r"^part-(\d+)(?:[.-]|$)")


def _bucket_tag(name: str) -> int | None:
    m = _BUCKET_RE.match(name)
    return int(m.group(1)) if m else None

REFRESH_JOURNAL = "_REFRESH_JOURNAL.json"
LINEAGE_FILE = "_REFRESH.json"
LABEL_COLS = ["name", "source", "shard"]


# the manifest's append-diff inventory (shared with run_cascade's
# manifest publishes so the two sides can never skew)
corpus_inventory = mf.input_inventory


def _sweep_stale_staging(out_dir: str, keep: str) -> None:
    """Remove `_staging_*` dirs from refreshes whose corpus fingerprint
    was superseded before they completed (orphaned delta copies)."""
    if not os.path.isdir(out_dir):
        return
    for n in os.listdir(out_dir):
        if n.startswith("_staging_") and n != os.path.basename(keep):
            shutil.rmtree(os.path.join(out_dir, n), ignore_errors=True)


def _tier_parquet_files(tdir: str) -> list[str]:
    if not os.path.isdir(tdir):
        return []
    return sorted(
        os.path.join(tdir, n)
        for n in os.listdir(tdir)
        if n.endswith(".parquet")
    )


def recover_tier_merge(tdir: str) -> str | None:
    """Journal replay for a crashed ``_merge_tier_delta``.

    Outputs all durable → roll FORWARD (remove the journaled inputs);
    any output missing → roll BACK (remove the partial outputs; the
    inputs — including the staging delta files — are still intact, so
    the merge simply re-runs).  Stale ``*.inc.tmp`` files are removed
    either way.  Returns "forward"/"back"/None."""
    action = None
    jp = os.path.join(tdir, REFRESH_JOURNAL)
    if os.path.exists(jp):
        try:
            with open(jp) as f:
                j = json.load(f)
        except (OSError, ValueError):
            j = None  # torn journal write: no output rename ever happened
        if j is not None:
            outs = [os.path.join(tdir, o) for o in j["outputs"]]
            if all(os.path.exists(o) for o in outs):
                for name in j["inputs_main"]:
                    p = os.path.join(tdir, name)
                    if os.path.exists(p):
                        os.remove(p)
                for p in j["inputs_staging"]:
                    if os.path.exists(p):
                        os.remove(p)
                action = "forward"
            else:
                for o in outs:
                    if os.path.exists(o):
                        os.remove(o)
                action = "back"
        os.remove(jp)
    if os.path.isdir(tdir):
        for n in os.listdir(tdir):
            if n.endswith(".inc.tmp"):
                os.remove(os.path.join(tdir, n))
    return action


def _combine_points_table(t: "pa.Table") -> "pa.Table":
    """One row per (series_id, window_ts): merge the partial struct,
    attach labels positionally from a group representative (labels are
    functions of series_id, so any row of the group carries them)."""
    import pyarrow as pa

    from ..stages.rollup import np_combine_partials

    cols = {
        c: t[c].combine_chunks().to_numpy(zero_copy_only=False)
        for c in NUMERIC_COLS
    }
    out, take = np_combine_partials(cols, return_take=True)
    idx = pa.array(take)
    arrays = {c: pa.array(out[c]) for c in NUMERIC_COLS}
    arrays["series_id"] = pa.array(out["series_id"], type=pa.uint64())
    for c in LABEL_COLS:
        arrays[c] = t[c].combine_chunks().take(idx)
    return pa.table(arrays)


def _combine_files_to_tmp(paths: list[str], dst_tmp: str) -> int:
    """Read + key-combine ``paths``, write the canonical table to
    ``dst_tmp``.  Runs as a Ray task in the per-bucket fast path (one
    task per bucket — bucket-bounded memory) and inline in the global
    fallback."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    merged = _combine_points_table(
        pa.concat_tables(
            [pq.read_table(p) for p in paths], promote_options="default"
        )
    )
    pq.write_table(merged, dst_tmp)
    return merged.num_rows


def _commit_merge(
    tdir: str, inc_id: str, outputs: list[str], inputs_main: list[str],
    inputs_staging: list[str],
) -> None:
    """Journal → rename → remove-inputs → clear: the crash-safe commit
    shared by both merge modes (tmp files must already exist)."""
    jp = os.path.join(tdir, REFRESH_JOURNAL)
    with open(jp + ".tmp", "w") as f:
        json.dump(
            {
                "inc_id": inc_id,
                "outputs": outputs,
                "inputs_main": inputs_main,
                "inputs_staging": inputs_staging,
            },
            f,
        )
    os.replace(jp + ".tmp", jp)  # commit point: recovery rolls back/forward
    for name in outputs:
        dst = os.path.join(tdir, name)
        os.replace(dst + ".inc.tmp", dst)
    for name in inputs_main:
        os.remove(os.path.join(tdir, name))
    for p in inputs_staging:
        os.remove(p)
    os.remove(jp)


def _merge_tier_delta(
    tdir: str,
    staging_tdir: str,
    inc_id: str,
    target_rows: int = 2_000_000,
    pair_buckets: bool = False,
) -> dict:
    """Journaled key-combining merge of a tier's delta into the tier.

    Two modes, identical results and identical crash contract
    (``recover_tier_merge``):

    - **per-bucket** (``pair_buckets=True``, the scale path): the delta
      ran with the SAME bucket hash and count as the main build, so
      ``part-<b>*.parquet`` files pair by bucket index — each touched
      bucket merges in its own Ray task (bucket-bounded memory,
      buckets in parallel), untouched buckets are never read.  Requires
      every file name to carry a bucket tag; compaction output doesn't,
      which automatically falls back.
    - **global** (fallback, always correct): one inline combine of the
      delta files + the main files whose footer ``window_ts`` range
      overlaps the delta's span (boundary-sized for time-ordered
      appends; at worst one tier, never the corpus)."""
    import pyarrow.parquet as pq

    from .retention import _file_window_range

    def _range(path: str) -> tuple[int, int] | None:
        # None = footer has no usable window_ts statistics.  Callers
        # treat None conservatively: a stat-less file is INCLUDED in the
        # merge (delta: full-span; main: overlap-everything) — the only
        # files dropped are genuinely EMPTY ones (the num_rows check
        # below), never rows
        try:
            return _file_window_range(path)
        except (TypeError, AttributeError):
            return None

    recover_tier_merge(tdir)
    staged = [
        os.path.abspath(p)
        for p in _tier_parquet_files(staging_tdir)
        if pq.ParquetFile(p).metadata.num_rows > 0
    ]
    if not staged:
        return {"delta_files": 0, "rows_out": 0, "rewritten_files": 0}
    os.makedirs(tdir, exist_ok=True)
    main_files = _tier_parquet_files(tdir)

    staged_tags = {p: _bucket_tag(os.path.basename(p)) for p in staged}
    main_tags = {p: _bucket_tag(os.path.basename(p)) for p in main_files}
    if (
        pair_buckets
        and all(t is not None for t in staged_tags.values())
        and all(t is not None for t in main_tags.values())
    ):
        import ray

        task = ray.remote(_combine_files_to_tmp)
        touched = sorted({t for t in staged_tags.values()})
        touched_set = set(touched)
        by_bucket = {
            b: [p for p, t in staged_tags.items() if t == b]
            + [p for p, t in main_tags.items() if t == b]
            for b in touched
        }
        outputs = [f"part-{b:05d}-{inc_id}.parquet" for b in touched]
        refs = [
            task.remote(by_bucket[b], os.path.join(tdir, name + ".inc.tmp"))
            for b, name in zip(touched, outputs)
        ]
        rows_out = int(sum(ray.get(refs)))
        inputs_main = sorted(
            os.path.basename(p) for p, t in main_tags.items() if t in touched_set
        )
        _commit_merge(tdir, inc_id, outputs, inputs_main, sorted(staged))
        return {
            "mode": "bucket",
            "delta_files": len(staged),
            "buckets_merged": len(touched),
            "rewritten_files": len(inputs_main),
            "rows_out": rows_out,
        }

    ranges = [_range(p) for p in staged]
    # a stat-less delta file means an unknown span: widen to everything
    lo = min((r[0] for r in ranges if r), default=None)
    hi = max((r[1] for r in ranges if r), default=None)
    unknown_span = any(r is None for r in ranges) or lo is None
    overlapping = []
    for p in main_files:
        r = None if unknown_span else _range(p)
        if unknown_span or r is None or not (r[1] < lo or r[0] > hi):
            overlapping.append(p)
    import pyarrow as pa

    merged = _combine_points_table(
        pa.concat_tables(
            [pq.read_table(p) for p in staged + overlapping],
            promote_options="default",
        )
    )
    n_out = max(1, math.ceil(merged.num_rows / target_rows))
    step = math.ceil(merged.num_rows / n_out)
    outputs = [f"inc-{inc_id}-{i:05d}.parquet" for i in range(n_out)]
    # tmp-write BEFORE the journal: a crash here leaves only *.inc.tmp
    # litter, which recovery sweeps
    for i, name in enumerate(outputs):
        pq.write_table(
            merged.slice(i * step, step),
            os.path.join(tdir, name + ".inc.tmp"),
        )
    _commit_merge(
        tdir,
        inc_id,
        outputs,
        [os.path.basename(p) for p in overlapping],
        [os.path.abspath(p) for p in staged],
    )
    return {
        "mode": "global",
        "delta_files": len(staged),
        "rewritten_files": len(overlapping),
        "rows_out": merged.num_rows,
        "window_span": [int(lo), int(hi)],
    }


def _append_lineage(out_dir: str, entry: dict) -> None:
    """Idempotent (by inc_id) append to out_dir/_REFRESH.json."""
    path = os.path.join(out_dir, LINEAGE_FILE)
    doc = {"increments": []}
    if os.path.exists(path):
        try:
            with open(path) as f:
                doc = json.load(f)
        except (OSError, ValueError):
            pass
    if any(e.get("inc_id") == entry["inc_id"] for e in doc["increments"]):
        return
    doc["increments"].append(entry)
    with open(path + ".tmp", "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    os.replace(path + ".tmp", path)


def refresh_cascade(
    corpus_path: str,
    out_dir: str,
    tiers: list[int] | None = None,
    **cascade_kwargs,
) -> dict:
    """Incrementally refresh the tier set under ``out_dir`` for an
    APPEND-ONLY change to ``corpus_path``; falls back to a full
    ``run_cascade`` when the change is not an append (or there is no
    prior complete build).  Returns run_cascade's stats dict plus a
    ``refresh`` entry describing what happened.  Re-entrant: a crash at
    any point converges on the next call (journal replay + manifest
    fingerprints), with no data loss and no duplicated points."""
    tiers = sorted(tiers or DEFAULT_TIERS)
    if len(tiers) == 1:
        # single-tier pipelines have no fine-resume rebuild to regenerate
        # chunk/gap sidecars from a merged tier — a full rebuild is the
        # correct (and not meaningfully slower) path there
        stats = run_cascade(corpus_path, out_dir, tiers, **cascade_kwargs)
        stats["refresh"] = {"mode": "full_rebuild_single_tier"}
        return stats
    fine = tiers[:-1]
    raw_dir = tier_dir(out_dir, tiers[0])
    # journal replay first: a crashed previous merge must converge
    # before anything reads the tier dirs
    for t in tiers:
        recover_tier_merge(tier_dir(out_dir, t))
    corpus_fp = mf.dir_fingerprint(corpus_path)
    now = corpus_inventory(corpus_path)
    staging = os.path.join(out_dir, f"_staging_{corpus_fp[:12]}")
    # orphaned staging dirs from refreshes whose fingerprint was
    # superseded before completion are dead weight — sweep them (the
    # CURRENT fingerprint's staging survives for resume)
    _sweep_stale_staging(out_dir, staging)
    raw_m = mf.load(raw_dir)

    if raw_m is None or not raw_m.get("completed") or "input_files" not in raw_m:
        # no prior complete build (or a pre-inventory manifest): full run
        stats = run_cascade(corpus_path, out_dir, tiers, **cascade_kwargs)
        stats["refresh"] = {"mode": "full_build"}
        return stats

    if raw_m.get("tiers") != tiers or not all(
        # complete at the old fingerprint, or already re-pointed at the
        # new one by a refresh that crashed mid-manifest-loop (the raw
        # tier moves last, so replay repeats the earlier steps as no-ops)
        mf.is_complete(tier_dir(out_dir, t), raw_m["input_fingerprint"])
        or mf.is_complete(tier_dir(out_dir, t), corpus_fp)
        for t in fine
    ):
        # the tiers on disk were built with a DIFFERENT tier list (the
        # bucket span / exchange key would not line up and a partial
        # tier set would merge against missing history), or some fine
        # tier never completed at the old fingerprint: the append diff
        # cannot apply — full rebuild
        shutil.rmtree(staging, ignore_errors=True)
        stats = run_cascade(corpus_path, out_dir, tiers, **cascade_kwargs)
        stats["refresh"] = {
            "mode": "full_rebuild",
            "reason": "tier_list_mismatch"
            if raw_m.get("tiers") != tiers
            else "incomplete_fine_tiers",
        }
        return stats

    if raw_m["input_fingerprint"] == corpus_fp:
        # up to date — or a refresh that crashed after the fine manifests
        # were re-pointed: run_cascade either no-ops or fine-resumes the
        # coarse tier / chunks / gaps rebuild
        shutil.rmtree(staging, ignore_errors=True)
        stats = run_cascade(corpus_path, out_dir, tiers, **cascade_kwargs)
        stats["refresh"] = {"mode": "noop" if stats["skipped"] == tiers else "resume"}
        return stats

    old = raw_m["input_files"]
    modified = sorted(n for n in old if now.get(n) != old[n])
    if modified:
        # removed or rewritten inputs: the append diff doesn't apply —
        # run_cascade sees the stale fingerprint and rebuilds everything
        stats = run_cascade(corpus_path, out_dir, tiers, **cascade_kwargs)
        stats["refresh"] = {"mode": "full_rebuild", "modified_inputs": modified}
        return stats

    new_files = sorted(set(now) - set(old))
    inc_id = corpus_fp[:12]
    t0 = time.perf_counter()

    # 1) staging corpus: a symlink view of ONLY the new files, so the
    # unchanged phase-1 cascade machinery decodes just the delta
    staging_corpus = os.path.join(staging, "corpus")
    staging_out = os.path.join(staging, "out")
    os.makedirs(staging_corpus, exist_ok=True)
    for n in new_files:
        link = os.path.join(staging_corpus, n)
        if not os.path.exists(link):
            try:
                os.symlink(os.path.abspath(os.path.join(corpus_path, n)), link)
            except OSError:
                shutil.copy2(os.path.join(corpus_path, n), link)

    # 2) delta cascade into staging (full tier list so the bucket span —
    # and hence the exchange key — matches the main run; no chunks/gaps,
    # they are rebuilt from the merged tiers in step 5).  run_cascade's
    # own manifests make this step resumable.  The delta reuses the MAIN
    # build's bucket count so the per-bucket merge fast path can pair
    # files by bucket index.
    main_nb = (raw_m.get("exchange_buckets") or {}).get("num_buckets")
    sub_kwargs = dict(cascade_kwargs)
    if main_nb and sub_kwargs.get("num_buckets") is None:
        sub_kwargs["num_buckets"] = int(main_nb)
    # the delta never writes chunks or gaps — they are rebuilt from the
    # merged tiers in step 5 (override, don't duplicate, caller kwargs)
    sub_kwargs["chunk_min_tier_ms"] = 1 << 62
    sub_kwargs["write_gaps"] = False
    sub = run_cascade(staging_corpus, staging_out, tiers, **sub_kwargs)
    delta_raw = int(sub["raw_samples"])

    # 3) merge the delta partials into each FINE tier (the coarsest tier
    # is rebuilt from the merged top fine tier in step 5).  Per-bucket
    # fast path iff delta and main ran the same exchange (same bucket
    # hash + count) — otherwise the window-overlap global merge.
    sub_m = mf.load(tier_dir(staging_out, tiers[0])) or {}
    pair = (
        main_nb is not None
        and (sub_m.get("exchange_buckets") or {}).get("num_buckets") == main_nb
        and raw_m.get("exchange_mode") is not None
        and sub_m.get("exchange_mode") == raw_m.get("exchange_mode")
    )
    merges = {
        str(t): _merge_tier_delta(
            tier_dir(out_dir, t), tier_dir(staging_out, t), inc_id,
            pair_buckets=pair,
        )
        for t in fine
    }

    # 4) lineage BEFORE the manifests move (idempotent by inc_id): a
    # crash between the two leaves the increment replayable
    _append_lineage(
        out_dir,
        {
            "inc_id": inc_id,
            "new_files": new_files,
            "delta_raw_samples": delta_raw,
            "merges": merges,
            "ts": time.time(),
        },
    )

    # 5) re-point the fine-tier manifests at the new corpus fingerprint
    # (raw tier LAST — it is the diff source, so a crash mid-loop makes
    # the re-run repeat steps 1-4 as no-ops rather than skip them), then
    # rebuild coarse tier / Gorilla chunks / gap sidecars from the merged
    # fine tiers via run_cascade's fine-resume branch
    rows_in = int(raw_m.get("rows_in", 0)) + delta_raw
    for t in sorted(fine, reverse=True):
        tdir = tier_dir(out_dir, t)
        m_old = mf.load(tdir) or {}
        extra = {
            "input_files": now,
            "exchange_buckets": m_old.get("exchange_buckets", {}),
            "refreshed_inc": inc_id,
            # carry the build identity forward: without these, a crash
            # after the raw re-point would make the NEXT refresh read a
            # tiers-less manifest and demote to a full rebuild
            "tiers": tiers,
            "exchange_mode": raw_m.get("exchange_mode"),
        }
        if t == tiers[0]:
            extra["raw_samples"] = int(m_old.get("raw_samples", 0)) + delta_raw
        mf.publish(
            tdir,
            tier_ms=t,
            input_path=corpus_path,
            input_fingerprint=corpus_fp,
            rows_in=rows_in,
            wall_sec=round(time.perf_counter() - t0, 3),
            extra=extra,
        )
    shutil.rmtree(staging, ignore_errors=True)

    stats = run_cascade(corpus_path, out_dir, tiers, **cascade_kwargs)
    stats["refresh"] = {
        "mode": "incremental",
        "inc_id": inc_id,
        "new_files": len(new_files),
        "delta_raw_samples": delta_raw,
        "merges": merges,
        "wall_sec": round(time.perf_counter() - t0, 3),
    }
    return stats
