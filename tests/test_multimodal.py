"""Multimodal plumbing: schema/batch-shape tests with the stubbed decoder."""

import pytest

from graph_data_science_spark.operators.multimodal import (
    extract_features,
    resize_images,
    sample_frames,
    synthesize_assets,
)


@pytest.fixture(scope="module")
def assets(spark):
    return synthesize_assets(spark, n=30).persist()


def test_asset_schema(assets):
    assert assets.count() == 30
    kinds = {r["kind"] for r in assets.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_extract_features_deterministic(assets):
    a = {r["asset_id"]: r["features"] for r in extract_features(assets, dim=8).collect()}
    b = {r["asset_id"]: r["features"] for r in
         extract_features(assets.repartition(7), dim=8).collect()}
    assert a == b  # partitioning-invariant
    assert all(len(v) == 8 for v in a.values())
    assert all(0.0 <= x < 1.0 for v in a.values() for x in v)


def test_real_decoder_is_explicit_stub(assets):
    with pytest.raises(Exception, match="NotImplementedError|real decode"):
        extract_features(assets, decoder="real").collect()


def test_resize_only_images(assets):
    out = resize_images(assets, 128, 128).collect()
    n_images = assets.where("kind = 'image'").count()
    assert len(out) == n_images
    assert all(r["width"] == 128 and r["height"] == 128 for r in out)


def test_sample_frames_timestamps(assets):
    out = sample_frames(assets, every_ms=500).collect()
    vids = {r["asset_id"] for r in assets.where("kind = 'video'").collect()}
    assert {r["asset_id"] for r in out} == vids
    for r in out:
        assert r["ts_ms"] == r["frame_idx"] * 500
