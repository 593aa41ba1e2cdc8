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
