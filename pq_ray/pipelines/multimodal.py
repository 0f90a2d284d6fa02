"""Multimodal column pipelines: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with
typed metadata columns alongside — the Arrow-native layout for 100 TB
multimodal corpora (never decode at read time; decode inside actor-pool
stages sized for the payload).

The actual codec libraries (PIL/ffmpeg/etc.) are NOT in this container,
so the decode kernel is stubbed two ways (both clearly marked):

- ``FakeImageCodec``: a deterministic synthetic format (16-byte header
  ``PQRI`` + width + height + seed, then width*height gray bytes) that
  the decode stage really parses — so the Ray-side plumbing (schema,
  batch sizing for large binary rows, actor signature, output layout)
  is real and tested end-to-end;
- ``decode_real(...)`` raises NotImplementedError with the dependency
  it would need.

Stages: decode → resize (area-mean pooling on the fake grid) →
feature-extract (16-bin histogram as ``list<float>``) — each an
actor-pool ``map_batches`` with small batch_size (large binary rows:
a few MB x batch x concurrency must fit the worker heap).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

MAGIC = b"PQRI"
HEADER = struct.Struct(">4sHHI")  # magic, width, height, seed


def synth_image(width: int, height: int, seed: int) -> bytes:
    """Deterministic fake image payload."""
    rng = np.random.default_rng(seed)
    pixels = rng.integers(0, 256, size=width * height, dtype=np.uint8)
    return HEADER.pack(MAGIC, width, height, seed) + pixels.tobytes()


def synth_corpus(n: int, seed: int = 42) -> pa.Table:
    """media table: (media_id, payload: binary, mime, width, height)."""
    rng = np.random.default_rng(seed)
    rows = {"media_id": [], "payload": [], "mime": [], "width": [], "height": []}
    for i in range(n):
        w = int(rng.integers(16, 64))
        h = int(rng.integers(16, 64))
        rows["media_id"].append(i)
        rows["payload"].append(synth_image(w, h, seed * 1_000_003 + i))
        rows["mime"].append("image/x-pqri")
        rows["width"].append(w)
        rows["height"].append(h)
    return pa.table(
        {
            "media_id": pa.array(rows["media_id"], type=pa.int64()),
            "payload": pa.array(rows["payload"], type=pa.binary()),
            "mime": pa.array(rows["mime"], type=pa.string()),
            "width": pa.array(rows["width"], type=pa.int32()),
            "height": pa.array(rows["height"], type=pa.int32()),
        }
    )


def decode_real(payload: bytes, mime: str):
    """Where a real decoder would go. The codec libraries are not in
    this container — STUB, by design."""
    raise NotImplementedError(
        f"real decode for {mime} requires an image/audio codec library "
        "(e.g. PIL / torchaudio) which is not available in this environment"
    )


class DecodeMedia:
    """Actor-pool stage: parse payloads → pixel arrays.

    Real semantics for the fake format; anything else raises (and the
    row is dropped or surfaced per ``on_error``).
    """

    def __init__(self, on_error: str = "raise"):
        self.on_error = on_error

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        pixels, ok = [], []
        for payload, mime in zip(batch["payload"], batch["mime"]):
            try:
                if mime != "image/x-pqri":
                    decode_real(payload, mime)
                magic, w, h, seed = HEADER.unpack(payload[: HEADER.size])
                if magic != MAGIC:
                    raise ValueError("bad magic")
                px = np.frombuffer(payload[HEADER.size :], dtype=np.uint8)
                if len(px) != w * h:
                    raise ValueError("truncated payload")
                pixels.append(px.astype(np.float32))
                ok.append(True)
            except NotImplementedError:
                if self.on_error == "raise":
                    raise
                pixels.append(np.zeros(0, dtype=np.float32))
                ok.append(False)
        out = batch[["media_id", "width", "height"]].copy()
        out["pixels"] = pixels
        out["decoded"] = ok
        return out


class ExtractFeatures:
    """Actor-pool stage: pixels → 16-bin normalized histogram feature
    (list<float>) + mean/std stats. Vectorized per image via numpy."""

    BINS = 16

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        feats, means, stds = [], [], []
        for px in batch["pixels"]:
            if len(px) == 0:
                feats.append(np.zeros(self.BINS, dtype=np.float32))
                means.append(0.0)
                stds.append(0.0)
                continue
            hist, _ = np.histogram(px, bins=self.BINS, range=(0, 256))
            feats.append((hist / len(px)).astype(np.float32))
            means.append(float(px.mean()))
            stds.append(float(px.std()))
        return pd.DataFrame(
            {
                "media_id": batch["media_id"],
                "feature": feats,
                "mean_px": np.round(means, 4),
                "std_px": np.round(stds, 4),
            }
        )


def media_feature_pipeline(table_or_path, *, batch_size: int = 64, concurrency: int = 2):
    """media table → per-item feature rows.

    batch_size is small on purpose: binary payload rows are wide, and
    batch x concurrency must fit each worker's heap.
    """
    ds = (
        rd.read_parquet(table_or_path)
        if isinstance(table_or_path, str)
        else rd.from_arrow(table_or_path)
    )
    decoded = ds.map_batches(
        DecodeMedia,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    return decoded.map_batches(
        ExtractFeatures,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def q_media_features(sf_dir: str) -> "pd.DataFrame":
    """Driver-facing query: decode + feature-extract a deterministic
    synthetic media corpus (sized off the documents table so it scales
    with sf). Rows-only check — the fake-codec pipeline has no SQL
    analogue; determinism and feature invariants are pytest-verified."""
    import duckdb

    n = int(
        duckdb.sql(
            f"select count(*) from read_parquet('{sf_dir}/documents.parquet')"
        ).fetchone()[0]
    )
    t = synth_corpus(min(n, 500), seed=42)
    feats = media_feature_pipeline(t, batch_size=64, concurrency=2).to_pandas()
    out = feats[["media_id", "mean_px", "std_px"]].copy()
    out["feature_l1"] = [float(np.abs(f).sum().round(4)) for f in feats["feature"]]
    return out.sort_values("media_id").reset_index(drop=True)


QUERIES = {"media_features": q_media_features}
ORACLES: dict = {}


# ---------------------------------------------------------------------------
# video frame sampling — the per-modality stage a video corpus needs
# ---------------------------------------------------------------------------

VMAGIC = b"PQRV"
VHEADER = struct.Struct(">4sHHHI")  # magic, width, height, n_frames, seed


def synth_video(width: int, height: int, n_frames: int, seed: int) -> bytes:
    """Deterministic fake video payload: header + n_frames gray frames."""
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, size=n_frames * width * height, dtype=np.uint8)
    return VHEADER.pack(VMAGIC, width, height, n_frames, seed) + frames.tobytes()


def synth_video_corpus(n: int, seed: int = 42) -> pa.Table:
    rng = np.random.default_rng(seed)
    rows = {"media_id": [], "payload": [], "mime": [], "n_frames": []}
    for i in range(n):
        w, h = int(rng.integers(8, 24)), int(rng.integers(8, 24))
        nf = int(rng.integers(4, 40))
        rows["media_id"].append(i)
        rows["payload"].append(synth_video(w, h, nf, seed * 7_000_003 + i))
        rows["mime"].append("video/x-pqrv")
        rows["n_frames"].append(nf)
    return pa.table(
        {
            "media_id": pa.array(rows["media_id"], type=pa.int64()),
            "payload": pa.array(rows["payload"], type=pa.binary()),
            "mime": pa.array(rows["mime"], type=pa.string()),
            "n_frames": pa.array(rows["n_frames"], type=pa.int32()),
        }
    )


class SampleFrames:
    """Actor-pool stage: video payload → every ``stride``-th frame as
    its own output ROW (media_id, frame_idx, pixels) — the flat_map
    shape a frame-level training pipeline consumes.  Real parsing for
    the fake format; real codecs would slot into ``decode_real``.

    Output rows are (much) larger than input rows when stride is small:
    callers size batch_size × concurrency for the EXPANDED frames, not
    the input payloads.
    """

    def __init__(self, stride: int = 4, on_error: str = "raise"):
        self.stride = stride
        self.on_error = on_error

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        mids, fidx, pixels = [], [], []
        for media_id, payload, mime in zip(
            batch["media_id"], batch["payload"], batch["mime"]
        ):
            try:
                if mime != "video/x-pqrv":
                    decode_real(payload, mime)
                magic, w, h, nf, _seed = VHEADER.unpack(payload[: VHEADER.size])
                if magic != VMAGIC:
                    raise ValueError("bad magic")
                frames = np.frombuffer(payload[VHEADER.size :], dtype=np.uint8)
                if len(frames) != nf * w * h:
                    raise ValueError("truncated payload")
                frames = frames.reshape(nf, w * h)
                for k in range(0, nf, self.stride):
                    mids.append(media_id)
                    fidx.append(k)
                    pixels.append(frames[k].astype(np.float32))
            except NotImplementedError:
                if self.on_error == "raise":
                    raise
        return pd.DataFrame({"media_id": mids, "frame_idx": fidx, "pixels": pixels})


def video_frame_pipeline(
    table_or_path, *, stride: int = 4, batch_size: int = 16, concurrency: int = 2
):
    """video table → sampled frame rows → per-frame features (reusing
    the image feature stage: a frame IS an image once sampled)."""
    ds = (
        rd.read_parquet(table_or_path)
        if isinstance(table_or_path, str)
        else rd.from_arrow(table_or_path)
    )
    frames = ds.map_batches(
        SampleFrames,
        fn_constructor_kwargs={"stride": stride},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )

    class FrameFeatures(ExtractFeatures):
        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            out = super().__call__(batch)
            out["frame_idx"] = batch["frame_idx"].to_numpy()
            return out

    return frames.map_batches(
        FrameFeatures,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# audio feature extraction — the third modality the corpus brief names
# ---------------------------------------------------------------------------

AMAGIC = b"PQRA"
AHEADER = struct.Struct(">4sIHI")  # magic, n_samples, sample_rate_khz, seed


def synth_audio(n_samples: int, rate_khz: int, seed: int) -> bytes:
    """Deterministic fake audio payload: header + int16 PCM mono."""
    rng = np.random.default_rng(seed)
    pcm = rng.integers(-32768, 32768, size=n_samples, dtype=np.int16)
    # pin the PCM byte order so payloads are platform-independent
    return AHEADER.pack(AMAGIC, n_samples, rate_khz, seed) + pcm.astype(
        "<i2"
    ).tobytes()


def synth_audio_corpus(n: int, seed: int = 42) -> pa.Table:
    rng = np.random.default_rng(seed)
    rows = {"media_id": [], "payload": [], "mime": [], "n_samples": []}
    for i in range(n):
        ns = int(rng.integers(2_000, 40_000))
        rows["media_id"].append(i)
        rows["payload"].append(synth_audio(ns, 16, seed * 9_000_011 + i))
        rows["mime"].append("audio/x-pqra")
        rows["n_samples"].append(ns)
    return pa.table(
        {
            "media_id": pa.array(rows["media_id"], type=pa.int64()),
            "payload": pa.array(rows["payload"], type=pa.binary()),
            "mime": pa.array(rows["mime"], type=pa.string()),
            "n_samples": pa.array(rows["n_samples"], type=pa.int32()),
        }
    )


def decode_audio_real(payload: bytes, mime: str):
    """Real audio decode, dependency-gated like decode_real: soundfile /
    librosa aren't in this container, so non-synthetic mimes raise a
    clearly-marked NotImplementedError while the Ray plumbing (schema,
    actor signature, batch sizing) stays real and tested."""
    try:  # pragma: no cover — dependency not installed here
        import soundfile  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            f"real audio decode for {mime!r} needs soundfile/librosa "
            "(not installed in this environment)"
        ) from None
    raise NotImplementedError("real decode path reserved for soundfile")


class AudioFrameEnergy:
    """Actor-pool stage: audio payload → per-frame RMS energy features.

    Frames are ``frame_len``-sample windows with no overlap; the whole
    computation is one reshape + vectorized RMS per payload (no
    per-sample Python).  Output: one row per audio with
    ``energy list<float>`` (frame RMS, normalized to int16 full scale)
    + n_frames — the fixed-shape feature a curriculum/quality filter
    consumes.  Large payloads: size batch_size so
    batch_size × n_samples × 2 B fits the worker heap.
    """

    def __init__(self, frame_len: int = 1024, on_error: str = "raise"):
        self.frame_len = frame_len
        self.on_error = on_error

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        mids, energies, nframes, rates = [], [], [], []
        for media_id, payload, mime in zip(
            batch["media_id"], batch["payload"], batch["mime"]
        ):
            try:
                if mime != "audio/x-pqra":
                    decode_audio_real(payload, mime)
                magic, ns, rate_khz, _seed = AHEADER.unpack(
                    payload[: AHEADER.size]
                )
                if magic != AMAGIC:
                    raise ValueError("bad magic")
                pcm = np.frombuffer(payload[AHEADER.size:], dtype="<i2")
                if len(pcm) != ns:
                    raise ValueError("truncated payload")
                nf = len(pcm) // self.frame_len
                if nf == 0:
                    frames = pcm.astype(np.float64)[None, :]
                    nf = 1
                else:
                    frames = (
                        pcm[: nf * self.frame_len]
                        .astype(np.float64)
                        .reshape(nf, self.frame_len)
                    )
                rms = np.sqrt((frames * frames).mean(axis=1)) / 32768.0
                mids.append(media_id)
                energies.append(rms.astype(np.float32))
                nframes.append(nf)
                rates.append(rate_khz)
            except NotImplementedError:
                if self.on_error == "raise":
                    raise
        return pd.DataFrame(
            {
                "media_id": mids,
                "energy": energies,
                "n_frames": np.asarray(nframes, dtype=np.int64),
                "rate_khz": np.asarray(rates, dtype=np.int64),
            }
        )


def audio_feature_pipeline(
    table_or_path, *, frame_len: int = 1024, batch_size: int = 32,
    concurrency: int = 2,
):
    """audio table → per-item frame-energy feature rows (actor pool,
    stateful frame config in __init__ — one per actor, not per batch)."""
    ds = (
        rd.read_parquet(table_or_path)
        if isinstance(table_or_path, str)
        else rd.from_arrow(table_or_path)
    )
    return ds.map_batches(
        AudioFrameEnergy,
        fn_constructor_kwargs={"frame_len": frame_len},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )
