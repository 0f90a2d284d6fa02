"""Incremental cascade refresh (pipelines/refresh.py).

The contract under test: for an append-only corpus change,
``refresh_cascade`` produces EXACTLY the tier points / chunks / gaps a
full ``run_cascade`` over the whole corpus would have produced — while
decoding only the new files — and converges after a crash at any step
with no loss and no duplicated points.
"""

from __future__ import annotations

import glob
import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pq_ray.fixtures import generate_tokens_table
from pq_ray.pipelines.cascade import run_cascade, tier_dir
from pq_ray.pipelines import refresh as rf
from pq_ray.pipelines.refresh import (
    REFRESH_JOURNAL,
    corpus_inventory,
    recover_tier_merge,
    refresh_cascade,
)

TIERS = [1000, 60_000, 3_600_000, 86_400_000]
N_DOCS = 2400
N_FILES = 3  # 800 docs per part file


def _write_parts(out_dir: str, table: pa.Table, n_parts: int) -> list[str]:
    os.makedirs(out_dir, exist_ok=True)
    step = table.num_rows // n_parts
    paths = []
    for i in range(n_parts):
        n = step if i < n_parts - 1 else table.num_rows - step * i
        p = os.path.join(out_dir, f"part-{i:05d}.parquet")
        pq.write_table(table.slice(i * step, n), p)
        paths.append(p)
    return paths


@pytest.fixture(scope="module")
def corpus_table():
    return generate_tokens_table(N_DOCS, seed=11)


@pytest.fixture(scope="module")
def reference_out(corpus_table, tmp_path_factory):
    """Full run over the complete corpus — the equivalence oracle."""
    root = tmp_path_factory.mktemp("ref")
    corpus = str(root / "corpus")
    _write_parts(corpus, corpus_table, N_FILES)
    out = str(root / "out")
    stats = run_cascade(corpus, out, TIERS)
    return out, stats


def _tier_points(out_dir: str, tier_ms: int) -> pd.DataFrame:
    files = sorted(glob.glob(f"{tier_dir(out_dir, tier_ms)}/*.parquet"))
    df = pd.concat(
        [pq.read_table(f).to_pandas() for f in files], ignore_index=True
    )
    return (
        df.sort_values(["series_id", "window_ts"])
        .reset_index(drop=True)
        .sort_index(axis=1)
    )


def _chunk_rows(out_dir: str) -> pd.DataFrame:
    files = sorted(glob.glob(f"{out_dir}/chunks/**/*.parquet", recursive=True))
    frames = []
    for f in files:
        d = pq.read_table(f).to_pandas()
        d["tier_ms"] = int(f.split("tier_ms=")[1].split(os.sep)[0])
        frames.append(d)
    df = pd.concat(frames, ignore_index=True)
    return (
        df.sort_values(["tier_ms", "series_id", "t0"])
        .reset_index(drop=True)
        .sort_index(axis=1)
    )


def _gaps(out_dir: str, tier_ms: int) -> pd.DataFrame:
    df = pq.read_table(f"{out_dir}/gaps/tier={tier_ms}.parquet").to_pandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _assert_equivalent(out: str, ref_out: str):
    for t in TIERS:
        pd.testing.assert_frame_equal(
            _tier_points(out, t), _tier_points(ref_out, t), check_like=True
        )
    pd.testing.assert_frame_equal(
        _chunk_rows(out), _chunk_rows(ref_out), check_like=True
    )
    for t in TIERS:
        pd.testing.assert_frame_equal(_gaps(out, t), _gaps(ref_out, t))


def _initial_then_append(corpus_table, tmp_path, n_initial=2):
    """Corpus dir with the first n_initial parts; returns (corpus, out,
    append_fn) where append_fn() adds the remaining parts in place."""
    corpus = str(tmp_path / "corpus")
    full = _write_parts(str(tmp_path / "full"), corpus_table, N_FILES)
    os.makedirs(corpus, exist_ok=True)
    import shutil

    for p in full[:n_initial]:
        shutil.copy2(p, os.path.join(corpus, os.path.basename(p)))

    def append(upto: int = N_FILES):
        for p in full[n_initial:upto]:
            shutil.copy2(p, os.path.join(corpus, os.path.basename(p)))

    return corpus, str(tmp_path / "out"), append


def test_refresh_append_matches_full_build(corpus_table, reference_out, tmp_path):
    ref_out, ref_stats = reference_out
    corpus, out, append = _initial_then_append(corpus_table, tmp_path)
    s0 = run_cascade(corpus, out, TIERS)
    assert s0["raw_samples"] < ref_stats["raw_samples"]
    append()
    stats = refresh_cascade(corpus, out, TIERS)
    assert stats["refresh"]["mode"] == "incremental"
    assert stats["refresh"]["new_files"] == 1
    # the delta decoded ONLY the appended rows
    assert (
        stats["refresh"]["delta_raw_samples"]
        == ref_stats["raw_samples"] - s0["raw_samples"]
    )
    # same exchange on both sides -> the per-bucket parallel fast path
    for t in TIERS[:-1]:
        assert stats["refresh"]["merges"][str(t)]["mode"] == "bucket"
    _assert_equivalent(out, ref_out)
    # manifests point at the full corpus now
    m = json.load(open(os.path.join(tier_dir(out, TIERS[0]), "_MANIFEST.json")))
    assert m["input_files"] == corpus_inventory(corpus)
    assert m["raw_samples"] == ref_stats["raw_samples"]
    # lineage recorded the increment
    lin = json.load(open(os.path.join(out, "_REFRESH.json")))
    assert len(lin["increments"]) == 1
    assert lin["increments"][0]["delta_raw_samples"] == (
        ref_stats["raw_samples"] - s0["raw_samples"]
    )
    # second call: up-to-date no-op
    again = refresh_cascade(corpus, out, TIERS)
    assert again["refresh"]["mode"] == "noop"
    _assert_equivalent(out, ref_out)


def test_refresh_two_successive_appends(corpus_table, reference_out, tmp_path):
    ref_out, _ = reference_out
    corpus, out, _ = _initial_then_append(corpus_table, tmp_path, n_initial=1)
    full = _write_parts(str(tmp_path / "full2"), corpus_table, N_FILES)
    import shutil

    run_cascade(corpus, out, TIERS)
    shutil.copy2(full[1], os.path.join(corpus, os.path.basename(full[1])))
    s1 = refresh_cascade(corpus, out, TIERS)
    assert s1["refresh"]["mode"] == "incremental"
    shutil.copy2(full[2], os.path.join(corpus, os.path.basename(full[2])))
    s2 = refresh_cascade(corpus, out, TIERS)
    assert s2["refresh"]["mode"] == "incremental"
    _assert_equivalent(out, ref_out)
    lin = json.load(open(os.path.join(out, "_REFRESH.json")))
    assert len(lin["increments"]) == 2


def test_refresh_after_compaction_uses_global_merge(
    corpus_table, reference_out, tmp_path
):
    """Compaction strips the bucket tags from the raw tier's file names;
    the merge must fall back to the window-overlap global mode there —
    and still produce the exact full-build result."""
    from pq_ray.pipelines.retention import compact_tier

    ref_out, _ = reference_out
    corpus, out, append = _initial_then_append(corpus_table, tmp_path)
    run_cascade(corpus, out, TIERS)
    compact_tier(out, TIERS[0], target_rows=10_000_000)
    assert any(
        n.startswith("compacted-")
        for n in os.listdir(tier_dir(out, TIERS[0]))
    )
    append()
    stats = refresh_cascade(corpus, out, TIERS)
    assert stats["refresh"]["mode"] == "incremental"
    assert stats["refresh"]["merges"][str(TIERS[0])]["mode"] == "global"
    # untouched (uncompacted) tiers still take the fast path
    assert stats["refresh"]["merges"][str(TIERS[1])]["mode"] == "bucket"
    _assert_equivalent(out, ref_out)


def test_refresh_no_prior_build_is_full_build(corpus_table, reference_out, tmp_path):
    ref_out, _ = reference_out
    corpus = str(tmp_path / "corpus")
    _write_parts(corpus, corpus_table, N_FILES)
    out = str(tmp_path / "out")
    stats = refresh_cascade(corpus, out, TIERS)
    assert stats["refresh"]["mode"] == "full_build"
    _assert_equivalent(out, ref_out)


def test_refresh_modified_input_falls_back_to_rebuild(
    corpus_table, reference_out, tmp_path
):
    ref_out, _ = reference_out
    corpus, out, append = _initial_then_append(corpus_table, tmp_path)
    run_cascade(corpus, out, TIERS)
    append()
    # rewrite part-00000 with different content (different size): the
    # append diff no longer applies
    sliced = corpus_table.slice(0, 700)
    pq.write_table(sliced, os.path.join(corpus, "part-00000.parquet"))
    stats = refresh_cascade(corpus, out, TIERS)
    assert stats["refresh"]["mode"] == "full_rebuild"
    assert stats["refresh"]["modified_inputs"] == ["part-00000.parquet"]
    # and the rebuild equals a direct full run over the modified corpus
    ref2 = str(tmp_path / "ref2")
    run_cascade(corpus, ref2, TIERS)
    for t in TIERS:
        pd.testing.assert_frame_equal(
            _tier_points(out, t), _tier_points(ref2, t), check_like=True
        )


def test_refresh_resumes_after_crash_before_manifests(
    corpus_table, reference_out, tmp_path, monkeypatch
):
    """Crash window: delta merged into the tiers but neither lineage nor
    manifests written. The re-run must converge (no duplicate points)."""
    ref_out, ref_stats = reference_out
    corpus, out, append = _initial_then_append(corpus_table, tmp_path)
    run_cascade(corpus, out, TIERS)
    append()

    def boom(*a, **k):
        raise RuntimeError("injected crash after merge, before lineage")

    monkeypatch.setattr(rf, "_append_lineage", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        refresh_cascade(corpus, out, TIERS)
    monkeypatch.undo()
    stats = refresh_cascade(corpus, out, TIERS)
    assert stats["refresh"]["mode"] == "incremental"
    _assert_equivalent(out, ref_out)
    m = json.load(open(os.path.join(tier_dir(out, TIERS[0]), "_MANIFEST.json")))
    assert m["raw_samples"] == ref_stats["raw_samples"]


def _mk_parquet(path: str, n: int = 3):
    pq.write_table(pa.table({"window_ts": pa.array(range(n), pa.int64())}), path)


def test_recover_tier_merge_roll_forward(tmp_path):
    tdir = str(tmp_path / "tier")
    os.makedirs(tdir)
    _mk_parquet(os.path.join(tdir, "inc-x-00000.parquet"))  # output, durable
    _mk_parquet(os.path.join(tdir, "part-00000.parquet"))  # journaled input
    staging = str(tmp_path / "staging.parquet")
    _mk_parquet(staging)
    with open(os.path.join(tdir, REFRESH_JOURNAL), "w") as f:
        json.dump(
            {
                "inc_id": "x",
                "outputs": ["inc-x-00000.parquet"],
                "inputs_main": ["part-00000.parquet"],
                "inputs_staging": [staging],
            },
            f,
        )
    assert recover_tier_merge(tdir) == "forward"
    assert os.path.exists(os.path.join(tdir, "inc-x-00000.parquet"))
    assert not os.path.exists(os.path.join(tdir, "part-00000.parquet"))
    assert not os.path.exists(staging)
    assert not os.path.exists(os.path.join(tdir, REFRESH_JOURNAL))


def test_recover_tier_merge_roll_back(tmp_path):
    tdir = str(tmp_path / "tier")
    os.makedirs(tdir)
    # one of two outputs missing -> roll back: outputs removed, inputs kept
    _mk_parquet(os.path.join(tdir, "inc-x-00000.parquet"))
    _mk_parquet(os.path.join(tdir, "part-00000.parquet"))
    _mk_parquet(os.path.join(tdir, "leftover.parquet.inc.tmp"))
    staging = str(tmp_path / "staging.parquet")
    _mk_parquet(staging)
    with open(os.path.join(tdir, REFRESH_JOURNAL), "w") as f:
        json.dump(
            {
                "inc_id": "x",
                "outputs": ["inc-x-00000.parquet", "inc-x-00001.parquet"],
                "inputs_main": ["part-00000.parquet"],
                "inputs_staging": [staging],
            },
            f,
        )
    assert recover_tier_merge(tdir) == "back"
    assert not os.path.exists(os.path.join(tdir, "inc-x-00000.parquet"))
    assert os.path.exists(os.path.join(tdir, "part-00000.parquet"))
    assert os.path.exists(staging)
    assert not os.path.exists(os.path.join(tdir, "leftover.parquet.inc.tmp"))
    assert not os.path.exists(os.path.join(tdir, REFRESH_JOURNAL))


def test_recover_tier_merge_torn_journal(tmp_path):
    tdir = str(tmp_path / "tier")
    os.makedirs(tdir)
    _mk_parquet(os.path.join(tdir, "part-00000.parquet"))
    with open(os.path.join(tdir, REFRESH_JOURNAL), "w") as f:
        f.write('{"outputs": [')  # torn write
    assert recover_tier_merge(tdir) is None
    assert os.path.exists(os.path.join(tdir, "part-00000.parquet"))
    assert not os.path.exists(os.path.join(tdir, REFRESH_JOURNAL))


def test_refresh_single_tier_falls_back(corpus_table, tmp_path):
    corpus = str(tmp_path / "corpus")
    _write_parts(corpus, corpus_table, 2)
    out = str(tmp_path / "out")
    run_cascade(corpus, out, [1000])
    full = _write_parts(str(tmp_path / "full"), corpus_table, N_FILES)
    import shutil

    shutil.copy2(full[2], os.path.join(corpus, os.path.basename(full[2])))
    # (the 2-part and 3-part splits share part-00000 only; sizes of
    # part-00001 differ, so this is a modified-input shape — the point
    # here is just that single-tier never takes the incremental path)
    stats = refresh_cascade(corpus, out, [1000])
    assert stats["refresh"]["mode"] == "full_rebuild_single_tier"
    ref = str(tmp_path / "ref")
    run_cascade(corpus, ref, [1000])
    pd.testing.assert_frame_equal(
        _tier_points(out, 1000), _tier_points(ref, 1000), check_like=True
    )


def test_refresh_respects_caller_chunk_and_gap_kwargs(corpus_table, tmp_path):
    """chunk_min_tier_ms / write_gaps in cascade_kwargs must not collide
    with the staging run's overrides (regression: duplicate kwarg)."""
    corpus, out, append = _initial_then_append(corpus_table, tmp_path)
    run_cascade(corpus, out, TIERS, chunk_min_tier_ms=3_600_000, write_gaps=True)
    append()
    stats = refresh_cascade(
        corpus, out, TIERS, chunk_min_tier_ms=3_600_000, write_gaps=True
    )
    assert stats["refresh"]["mode"] == "incremental"
    # chunks exist only for tiers >= the caller's chunk_min
    assert not os.path.isdir(os.path.join(out, "chunks", "tier_ms=60000"))
    assert os.path.isdir(os.path.join(out, "chunks", "tier_ms=3600000"))


def test_refresh_tier_list_mismatch_rebuilds(corpus_table, tmp_path):
    """An incremental merge against tiers built with a different tier
    list would pair buckets hashed with different spans and merge into a
    partial tier set — it must fall back to a full rebuild instead."""
    corpus, out, append = _initial_then_append(corpus_table, tmp_path)
    three = TIERS[:3]
    run_cascade(corpus, out, three)
    append()
    stats = refresh_cascade(corpus, out, TIERS)  # four tiers now
    assert stats["refresh"]["mode"] == "full_rebuild"
    assert stats["refresh"]["reason"] == "tier_list_mismatch"
    ref = str(tmp_path / "ref")
    run_cascade(corpus, ref, TIERS)
    for t in TIERS:
        pd.testing.assert_frame_equal(
            _tier_points(out, t), _tier_points(ref, t), check_like=True
        )


def test_refresh_sweeps_stale_staging(corpus_table, tmp_path):
    corpus, out, append = _initial_then_append(corpus_table, tmp_path)
    run_cascade(corpus, out, TIERS)
    os.makedirs(os.path.join(out, "_staging_deadbeefdead"))
    append()
    stats = refresh_cascade(corpus, out, TIERS)
    assert stats["refresh"]["mode"] == "incremental"
    assert not any(n.startswith("_staging_") for n in os.listdir(out))
