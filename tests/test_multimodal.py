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


def test_decode_real_codec_seam_still_raises_for_missing_codecs(spark, sf_dir):
    """fake=False must fail loudly at the codec seam for the one codec
    this container has no real decoder for (h264) — at execution time,
    since dispatch is per-row by codec tag."""
    from pyspark.errors import PythonException

    h264_only = M.asset_table(spark, sf_dir).filter("codec = 'h264.fake'")
    assert h264_only.count() > 0
    with pytest.raises(PythonException, match="NotImplementedError"):
        M.decode_features(h264_only, fake=False).collect()


def test_y4m_decoder_is_real(spark, sf_dir):
    """The YUV4MPEG2 codec genuinely parses: (a) fake=False works
    end-to-end on the y4m rows and recovers frame count, dims, and
    exact plane sums; (b) the parser handles unknown header tags,
    per-frame parameters, and C420 plane sizing (spec features the
    fixture never emits)."""
    y4m_rows = M.asset_table(spark, sf_dir).filter("codec = 'y4m'")
    rows = M.decode_features(y4m_rows, fake=False).collect()
    assert len(rows) > 0
    for r in rows:
        b = bytes(r["payload"])
        w, h, cs, frames = M.decode_y4m(b)
        assert (r["d0"], r["d1"], r["d2"]) == (len(frames), w, h)
        assert cs == "444" and len(frames) >= 1
        stack = np.stack(frames).astype(np.int64)
        wh = w * h
        assert r["feat"][0] == float(stack[:, :wh].sum())
        assert r["feat"][3] == float(len(frames) * wh)

    # hand-built stream: unknown Xtag, per-frame params, 2 frames
    f0 = bytes(range(12))  # 2x2 C444 = 12 bytes/frame
    f1 = bytes(range(100, 112))
    raw = (
        b"YUV4MPEG2 W2 H2 F30:1 Ip A1:1 C444 XYSCSS=444\n"
        b"FRAME\n" + f0 + b"FRAME Ixyz\n" + f1
    )
    w, h, cs, frames = M.decode_y4m(raw)
    assert (w, h, cs) == (2, 2, "444") and len(frames) == 2
    assert frames[0].tolist() == list(f0) and frames[1].tolist() == list(f1)
    # C420 plane sizing: 2x2 -> 4 + 2*1 = 6 bytes/frame
    raw420 = b"YUV4MPEG2 W2 H2 C420\nFRAME\n" + bytes(6)
    w, h, cs, frames = M.decode_y4m(raw420)
    assert cs == "420" and len(frames) == 1 and frames[0].size == 6
    with pytest.raises(ValueError):
        M.decode_y4m(b"JUNK W2 H2\nFRAME\n" + bytes(12))
    with pytest.raises(ValueError):
        M.decode_y4m(b"YUV4MPEG2 W2 H2 C444\nFRAME\n" + bytes(5))  # truncated
    with pytest.raises(ValueError):
        M.decode_y4m(b"YUV4MPEG2 W2 H2 C444\nBLOB\n" + bytes(12))  # bad marker


def test_wav_decoder_is_real(spark, sf_dir):
    """The RIFF/WAVE codec genuinely parses: (a) fake=False works
    end-to-end on the audio rows and recovers the fmt-chunk metadata +
    exact sample statistics; (b) the chunk walk handles files with
    extra chunks (LIST before data), odd-length chunk padding, and
    negative samples (spec features the fixture never emits)."""
    audio = M.asset_table(spark, sf_dir).filter("modality = 'audio'")
    rows = M.decode_features(audio, fake=False).collect()
    assert len(rows) > 0
    for r in rows:
        b = bytes(r["payload"])
        rate, ch, samples = M.decode_wav(b)
        assert (r["d0"], r["d1"], r["d2"]) == (rate, len(samples), ch)
        assert rate == M.WAV_SAMPLE_RATE and ch == 1
        s = samples.astype(np.int64)
        assert r["feat"][0] == float(s.sum())
        assert r["feat"][2] == float(s.min())
        assert r["feat"][3] == float(s.max())
        # samples really are the text bytes as LE int16
        data = b[44:]
        assert s.tolist() == np.frombuffer(data, "<i2").tolist()

    # hand-built file: LIST chunk before data, odd-sized data chunk
    # (pad byte after it), genuinely negative sample values
    import struct

    pcm = struct.pack("<4h", -5, 7, -32768, 32767)
    list_body = b"INFOx"  # odd length -> pad byte exercises alignment
    chunks = (
        b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, 2, 44100, 44100 * 4, 4, 16)
        + b"LIST" + struct.pack("<I", len(list_body)) + list_body + b"\x00"
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    wav = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    rate, ch, samples = M.decode_wav(wav)
    assert (rate, ch) == (44100, 2)
    assert samples.tolist() == [-5, 7, -32768, 32767]
    with pytest.raises(ValueError):
        M.decode_wav(b"RIFX" + wav[4:])          # wrong magic
    with pytest.raises(ValueError):
        M.decode_wav(wav[:20])                   # missing fmt/data
    bad_bits = bytearray(wav)
    bad_bits[12 + 8 + 14] = 8                    # bits=8 in fmt chunk
    with pytest.raises(ValueError):
        M.decode_wav(bytes(bad_bits))


def test_ppm_decoder_is_real(spark, sf_dir):
    """The P6 codec genuinely parses: (a) fake=False works end-to-end
    on the image rows and recovers the header dims + exact channel
    sums; (b) the parser handles arbitrary header whitespace and
    comment lines (spec features the fixture never emits)."""
    import numpy as np

    images = M.asset_table(spark, sf_dir).filter("modality = 'image'")
    rows = M.decode_features(images, fake=False).collect()
    assert len(rows) > 0
    for r in rows:
        b = bytes(r["payload"])
        w, h, maxval, arr = M.decode_ppm(b)
        assert (r["d0"], r["d1"], r["d2"]) == (w, h, 3) and maxval == 255
        ch = arr.reshape(-1, 3).astype(np.int64)
        assert r["feat"][0] == float(ch[:, 0].sum())
        assert r["feat"][3] == float(w * h)
    # spec tolerance: comments + multi-whitespace header
    img = bytes([1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12])
    raw = b"P6 # a comment\n# another\n  2\t2 # dims\n 255\n" + img
    w, h, maxval, arr = M.decode_ppm(raw)
    assert (w, h, maxval) == (2, 2, 255)
    assert arr.reshape(-1).tolist() == list(img)
    with pytest.raises(ValueError):
        M.decode_ppm(b"P5\n2 2\n255\n" + img)      # wrong magic
    with pytest.raises(ValueError):
        M.decode_ppm(b"P6\n2 2\n255\n" + img[:5])  # truncated plane


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
