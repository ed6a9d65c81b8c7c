"""Multimodal plumbing tests: schema, mapInPandas batch shape, digest
determinism, frame sampling explode."""

from __future__ import annotations

from p6_spark.operators.multimodal import (
    extract_features,
    resize_images,
    sample_frames,
    synthetic_media,
)


def test_extract_features_shape_and_determinism(spark):
    media = synthetic_media(spark, 32)
    feats = extract_features(media)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 32
    r0 = rows[0]
    assert r0["n_bytes"] == 128
    assert len(r0["feature"]) == 32
    # deterministic: same payload -> same digest on a second run
    again = {r["media_id"]: r["digest"] for r in extract_features(media).collect()}
    assert all(again[k] == v["digest"] for k, v in rows.items())


def test_resize_images_only_images(spark):
    media = synthetic_media(spark, 30)
    out = resize_images(media, 224, 224).collect()
    assert len(out) == 10  # every 3rd row is an image
    assert all(r["width"] == 224 and r["height"] == 224 for r in out)
    assert all(r["payload"] is not None for r in out)


def test_sample_frames(spark):
    media = synthetic_media(spark, 9)
    frames = sample_frames(media, every_ms=500).collect()
    # kind=='video' rows are ids 2,5,8 with duration 1002/1005/1008 ms -> 3 frames each
    assert len(frames) == 9
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r["frame_ts_ms"])
    assert sorted(by_id) == [2, 5, 8]
    assert by_id[2] == [0, 500, 1000]
