"""Multimodal plumbing: real Spark schema/batching, stubbed decode."""

import numpy as np
import pytest

from text_indexing_and_retrieval_system_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.synth_media(spark, n=30, seed=5).cache()


def test_feature_extraction_fake_kernel(media):
    feats = mm.extract_features(media, fake=True).collect()
    assert len(feats) == 30
    for r in feats:
        assert len(r["feature"]) == mm.FEATURE_DIM
        assert r["n_bytes"] >= 64
    # deterministic: same payload -> same feature
    again = mm.extract_features(media, fake=True).collect()
    a = {r["media_id"]: r["feature"] for r in feats}
    b = {r["media_id"]: r["feature"] for r in again}
    assert a == b


def test_real_decode_is_stubbed(media):
    with pytest.raises(Exception) as ei:
        mm.extract_features(media, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_frame_sampling(media):
    frames = mm.sample_frames(media, every_ms=1000)
    rows = frames.collect()
    assert rows, "video rows expected"
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r["ts_ms"])
    for ts in by_media.values():
        ts = sorted(ts)
        assert ts[0] == 0
        assert all(b - a == 1000 for a, b in zip(ts, ts[1:]))


# ---- round-4: real decode kernels (BMP / PPM / WAV, numpy) ----

import os

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _read(name):
    with open(os.path.join(FIX, name), "rb") as f:
        return f.read()


def test_bmp_decode_fixture_byte_exact():
    px = np.load(os.path.join(FIX, "tiny_bmp_pixels.npy"))
    got = mm.decode_bmp(_read("tiny.bmp"))
    assert got.dtype == np.uint8 and got.shape == px.shape
    assert (got == px).all()
    # magic dispatch
    assert (mm.decode_image(_read("tiny.bmp")) == px).all()


def test_ppm_decode_fixture_byte_exact():
    px = np.load(os.path.join(FIX, "tiny_ppm_pixels.npy"))
    assert (mm.decode_ppm(_read("tiny.ppm")) == px).all()
    # comments + whitespace in header are tolerated
    hdr = b"P6\n# a comment\n6 4\n255\n" + px.tobytes()
    assert (mm.decode_ppm(hdr) == px).all()


def test_wav_decode_fixture_byte_exact():
    samp = np.load(os.path.join(FIX, "tiny_wav_samples.npy"))
    got, sr = mm.decode_wav(_read("tiny.wav"))
    assert sr == 8000 and got.shape == samp.shape
    assert (got == samp).all()


def test_real_feature_extraction_spark(spark, media):
    """image+audio rows decode for real inside the Arrow kernel."""
    real = media.filter(media.kind != "video")
    feats = mm.extract_features(real, fake=False).collect()
    assert feats and all(len(r["feature"]) == mm.FEATURE_DIM for r in feats)
    # image features are mean-pooled grayscale in [0, 1]
    img_ids = {r["media_id"] for r in media.filter(media.kind == "image").collect()}
    for r in feats:
        if r["media_id"] in img_ids:
            assert all(0.0 <= v <= 1.0 for v in r["feature"])
    # fake=True is only a FALLBACK: payloads with a known magic still
    # take the real decode path, so results are identical
    fake = {r["media_id"]: r["feature"]
            for r in mm.extract_features(real, fake=True).collect()}
    realmap = {r["media_id"]: r["feature"] for r in feats}
    assert realmap == fake
    # same payloads -> same features on a second run
    again = {r["media_id"]: r["feature"]
             for r in mm.extract_features(real, fake=False).collect()}
    assert realmap == again


def test_compressed_formats_still_raise():
    with pytest.raises(NotImplementedError, match="codec"):
        mm.decode_image(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(NotImplementedError, match="codec"):
        mm.decode_audio(b"ID3\x04....")
