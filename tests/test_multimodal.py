"""Multimodal plumbing: schema, pruning pushdown, Arrow batch contract."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from knowledge_graph_studio_spark.operators.multimodal import (
    extract_features, filter_by_meta, resize_stub, sample_frames, set_decoder,
    synthetic_media, _fake_decode,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthetic_media(spark, 30, seed=7).persist()


def test_meta_filter_prunes_without_decode(media):
    vids = filter_by_meta(media, media_type="video")
    assert vids.count() == 10
    small = filter_by_meta(media, max_bytes=32)
    assert small.count() == 0  # payloads are 64 bytes


def test_extract_features_shape_and_determinism(media):
    f1 = {r["media_id"]: r["features"]
          for r in extract_features(media, dim=16).collect()}
    f2 = {r["media_id"]: r["features"]
          for r in extract_features(media, dim=16).collect()}
    assert set(f1) == {f"m{i:05d}" for i in range(30)}
    assert all(len(v) == 16 for v in f1.values())
    for k in f1:
        assert np.allclose(f1[k], f2[k])


def test_sample_frames_fanout_is_jvm_side(media):
    frames = sample_frames(media, every_ms=1000)
    rows = frames.collect()
    # every video contributes ceil(duration/1000) frames
    vids = {r["media_id"]: r["meta"]["duration_ms"]
            for r in filter_by_meta(media, media_type="video").collect()}
    expected = sum((d - 1) // 1000 + 1 for d in vids.values())
    assert len(rows) == expected
    assert all(len(r["frame_features"]) == 64 for r in rows)
    per_vid = {r["media_id"] for r in rows}
    assert per_vid == set(vids)


def test_resize_updates_meta_only(media):
    out = resize_stub(media, 320, 240).limit(1).collect()[0]
    assert out["meta"]["width"] == 320 and out["meta"]["height"] == 240
    assert out["payload"] is not None


def test_decoder_hook_swappable(spark):
    m = synthetic_media(spark, 3, seed=1)
    try:
        set_decoder(lambda payload, meta: np.ones(8))
        feats = extract_features(m, dim=8).collect()
        assert all(np.allclose(r["features"], 1.0) for r in feats)
    finally:
        set_decoder(_fake_decode)
