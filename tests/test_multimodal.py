"""Multimodal plumbing tests — schemas/batching real, decode stubbed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedupe_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    return spark.createDataFrame(M.make_media_fixture(), M.MEDIA_SCHEMA).cache()


def test_extract_media_features(media):
    feats = M.extract_media_features(media)
    assert feats.schema == M.FEATURE_SCHEMA
    rows = feats.collect()
    assert len(rows) == 20
    by_id = {r["media_id"]: r for r in rows}
    # deterministic stub: exact-dup contents -> identical features + hash
    assert by_id["m002"]["feature"] == by_id["m005"]["feature"]
    assert by_id["m002"]["content_hash"] == by_id["m005"]["content_hash"]
    assert by_id["m000"]["content_hash"] != by_id["m001"]["content_hash"]
    assert all(len(r["feature"]) == 8 for r in rows)
    assert all(0.0 <= v <= 1.0 for r in rows for v in r["feature"])


def test_media_metadata_prunes_content(media):
    meta = M.media_metadata(media)
    rows = meta.collect()
    assert len(rows) == 20
    assert "content" not in meta.columns
    assert all(r["n_bytes"] >= 64 for r in rows)


def test_frame_sample_plan(media):
    frames = M.frame_sample_plan(media, every_ms=1000)
    rows = frames.collect()
    vids = media.where("kind = 'video'").count()
    assert len(rows) == vids * 5  # 5000ms / 1000ms
    assert {r["frame_ts"] for r in rows} == {0, 1000, 2000, 3000, 4000}


def test_media_near_dup_pairs(media):
    pairs = {
        (r["id1"], r["id2"]) for r in M.media_near_dup_pairs(media).collect()
    }
    assert ("m002", "m005") in pairs
    assert ("m008", "m011") in pairs


def test_real_decode_gate():
    with pytest.raises(NotImplementedError):
        M.real_decode_gate("image")
