"""Multimodal binary-column pipeline: real plumbing, stubbed codecs."""

import numpy as np
import pytest

from pq_ray.pipelines.multimodal import (
    DecodeMedia,
    decode_real,
    media_feature_pipeline,
    synth_corpus,
    synth_image,
)


def test_synth_deterministic():
    assert synth_image(8, 8, 7) == synth_image(8, 8, 7)
    t = synth_corpus(10, seed=1)
    assert t.schema.names == ["media_id", "payload", "mime", "width", "height"]


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_real(b"\x89PNG", "image/png")


def test_decode_batch_parses_payload():
    import pandas as pd

    t = synth_corpus(5, seed=2).to_pandas()
    out = DecodeMedia()(t)
    assert out["decoded"].all()
    for _, row in out.iterrows():
        assert len(row["pixels"]) == row["width"] * row["height"]


def test_feature_pipeline_end_to_end(ray_session):
    t = synth_corpus(40, seed=3)
    feats = media_feature_pipeline(t, batch_size=8, concurrency=2).to_pandas()
    assert len(feats) == 40
    f = np.stack(feats.sort_values("media_id")["feature"].to_numpy())
    assert f.shape == (40, 16)
    # histograms are normalized
    assert np.allclose(f.sum(axis=1), 1.0, atol=1e-5)
    # deterministic across runs
    feats2 = media_feature_pipeline(t, batch_size=8, concurrency=2).to_pandas()
    assert np.array_equal(
        np.stack(feats2.sort_values("media_id")["feature"].to_numpy()), f
    )


def test_video_frame_sampling(ray_session):
    """Frame sampling really parses the fake video format: every
    stride-th frame becomes a row, pixel content matches a direct
    decode, and per-frame features ride the same image feature stage."""
    import numpy as np

    from pq_ray.pipelines.multimodal import (
        VHEADER,
        synth_video_corpus,
        video_frame_pipeline,
    )

    t = synth_video_corpus(20, seed=7)
    out = video_frame_pipeline(t, stride=4, batch_size=8, concurrency=2).to_pandas()
    nf = {m: n for m, n in zip(t["media_id"].to_pylist(), t["n_frames"].to_pylist())}
    # row count: ceil(n_frames / stride) per video
    import math
    expected = sum(math.ceil(n / 4) for n in nf.values())
    assert len(out) == expected
    assert set(out["frame_idx"] % 4) == {0}
    # spot-check one frame's pixels against a direct parse
    payload = t["payload"][0].as_py()
    magic, w, h, n, _seed = VHEADER.unpack(payload[: VHEADER.size])
    frames = np.frombuffer(payload[VHEADER.size:], dtype=np.uint8).reshape(n, w * h)
    row = out[(out["media_id"] == 0) & (out["frame_idx"] == 0)].iloc[0]
    hist, _ = np.histogram(frames[0], bins=16, range=(0, 256))
    assert np.allclose(row["feature"], hist / (w * h))


def test_audio_frame_energy(ray_session):
    """Audio features really parse the fake PCM format: frame count =
    n_samples // frame_len, RMS matches a direct numpy computation, and
    real-codec mimes raise the dependency-gated NotImplementedError."""
    import numpy as np
    import pytest

    from pq_ray.pipelines.multimodal import (
        AHEADER,
        AudioFrameEnergy,
        audio_feature_pipeline,
        decode_audio_real,
        synth_audio_corpus,
    )

    t = synth_audio_corpus(25, seed=11)
    out = audio_feature_pipeline(t, frame_len=1024, batch_size=8,
                                 concurrency=2).to_pandas()
    assert len(out) == 25
    ns = {m: n for m, n in zip(t["media_id"].to_pylist(),
                               t["n_samples"].to_pylist())}
    for _, row in out.iterrows():
        assert row["n_frames"] == max(ns[row["media_id"]] // 1024, 1)
        assert len(row["energy"]) == row["n_frames"]
    # spot-check one payload's RMS against a direct parse
    payload = t["payload"][0].as_py()
    magic, n, rate, _seed = AHEADER.unpack(payload[: AHEADER.size])
    pcm = np.frombuffer(payload[AHEADER.size:], dtype="<i2")
    nf = n // 1024
    frames = pcm[: nf * 1024].astype(np.float64).reshape(nf, 1024)
    rms = np.sqrt((frames * frames).mean(axis=1)) / 32768.0
    row = out[out["media_id"] == 0].iloc[0]
    assert np.allclose(row["energy"], rms.astype(np.float32))
    assert row["rate_khz"] == rate
    # dependency gate
    with pytest.raises(NotImplementedError, match="soundfile"):
        decode_audio_real(b"xx", "audio/wav")
    # on_error="skip" drops undecodable rows instead of failing the batch
    import pandas as pd
    st = AudioFrameEnergy(on_error="skip")
    res = st(pd.DataFrame({"media_id": [9], "payload": [b"xx"],
                           "mime": ["audio/wav"]}))
    assert len(res) == 0
