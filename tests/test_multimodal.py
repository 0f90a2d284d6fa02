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
