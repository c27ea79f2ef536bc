"""Multimodal plumbing: binary columns, Arrow-batched feature extraction
(stubbed decoder), frame-sampling plan, real-decoder seam raises."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from wage_etl_spark.sources.multimodal import (
    extract_features, frame_sample_plan, synthesize_media,
)


def test_media_schema_and_determinism(spark):
    m1 = synthesize_media(spark, n=20).collect()
    m2 = synthesize_media(spark, n=20).collect()
    assert [r["media_id"] for r in m1] == [r["media_id"] for r in m2]
    assert all(isinstance(r["data"], (bytes, bytearray)) for r in m1)
    assert {r["mime"] for r in m1} <= {"image/png", "audio/wav", "video/mp4"}


def test_extract_features_fake_decoder(spark):
    media = synthesize_media(spark, n=30)
    feats = extract_features(media, decoder="fake")
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 30
    # cross-check one row's sha against driver-side hashing of the same blob
    blob = {r["media_id"]: bytes(r["data"]) for r in media.collect()}
    for mid in list(rows)[:3]:
        assert rows[mid]["sha256"] == hashlib.sha256(blob[mid]).hexdigest()
        assert rows[mid]["n_bytes"] == len(blob[mid])


def test_real_decoder_is_explicit_stub(spark):
    media = synthesize_media(spark, n=2)
    with pytest.raises(Exception) as exc:
        extract_features(media, decoder="real").collect()
    assert "NotImplementedError" in str(exc.value) or isinstance(
        exc.value, NotImplementedError
    )


def test_frame_sample_plan(spark):
    media = synthesize_media(spark, n=50)
    frames = frame_sample_plan(media, every_ms=10000)
    rows = frames.collect()
    assert all(r["mime"] == "video/mp4" for r in rows)
    vids = media.filter(F.col("mime") == "video/mp4").collect()
    expected = sum(v["duration_ms"] // 10000 + 1 for v in vids)
    assert len(rows) == expected
