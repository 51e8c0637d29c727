"""Multimodal binary-column plumbing: decode/feature/resize/frame-sample."""

from __future__ import annotations

import numpy as np
import pytest

from cross_sentence_relation_extraction_idepnn_spark.operators import multimodal as M


def test_decode_features_matches_numpy_oracle(spark, sf_dir):
    """The Arrow-batched decode must equal a direct per-row numpy
    re-derivation from the same payload bytes."""
    assets = M.asset_table(spark, sf_dir).limit(30)
    pdf = M.decode_features(assets).toPandas().sort_values("asset_id")
    assert len(pdf) == 30
    for _, r in pdf.iterrows():
        b = np.frombuffer(bytes(r["payload"]), dtype=np.uint8)
        pad = (-len(b)) % M.FEAT_DIM
        expect = np.pad(b, (0, pad)).reshape(M.FEAT_DIM, -1).mean(axis=1) / 255.0
        np.testing.assert_allclose(np.array(r["feat"]), expect, rtol=1e-12)
        if r["modality"] == "image":
            assert r["d0"] == 16 + int(b[:4].sum()) % 64
            assert r["d2"] == 3
        elif r["modality"] == "audio":
            assert r["d0"] == 16000 and r["d1"] == len(b) // 2
        else:
            assert r["d0"] == max(len(b) // M.FRAME_BYTES, 1)


def test_decode_real_codec_is_explicit_stub(spark, sf_dir):
    with pytest.raises(NotImplementedError):
        M.decode_features(M.asset_table(spark, sf_dir), fake=False)


def test_resize_features_pools_correctly(spark, sf_dir):
    assets = M.asset_table(spark, sf_dir).limit(5)
    out = M.resize_features(M.decode_features(assets), new_dim=4).toPandas()
    for _, r in out.iterrows():
        a = np.asarray(r["feat"], dtype=np.float64)
        pad = (-len(a)) % 4
        expect = np.pad(a, (0, pad)).reshape(4, -1).mean(axis=1)
        np.testing.assert_allclose(np.array(r["feat_resized"]), expect, rtol=1e-12)


def test_frame_sample_covers_even_frames_only(spark, sf_dir):
    assets = M.asset_table(spark, sf_dir)
    frames = M.frame_sample(assets, every_n=2).toPandas()
    assert len(frames) > 0
    assert (frames["frame_idx"] % 2 == 0).all()
    assert (frames["frame_bytes"] <= M.FRAME_BYTES).all()
    # every video asset contributes at least frame 0
    n_videos = assets.filter("modality = 'video'").count()
    assert frames["asset_id"].nunique() == n_videos
