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


def test_real_decoder_undecodable_mime_is_explicit(spark):
    """video/mp4 has no stdlib decoder -> NotImplementedError (the honest
    seam); corrupt bytes under a decodable mime -> ValueError."""
    from wage_etl_spark.sources.multimodal import MEDIA_SCHEMA

    video = spark.createDataFrame(
        [(1, "video/mp4", None, None, 1000, bytearray(b"\x00" * 64))], MEDIA_SCHEMA
    )
    with pytest.raises(Exception) as exc:
        extract_features(video, decoder="real").collect()
    assert "NotImplementedError" in str(exc.value)

    bad_png = spark.createDataFrame(
        [(2, "image/png", 4, 4, None, bytearray(b"not a png at all"))], MEDIA_SCHEMA
    )
    with pytest.raises(Exception) as exc:
        extract_features(bad_png, decoder="real").collect()
    assert "ValueError" in str(exc.value) or "not a PNG" in str(exc.value)


def test_real_decoder_png_and_wav(spark):
    """decoder='real' on genuine bytes: PNG dims + pixel mean match the
    generator's formula; WAV rate/channels/sample-count/RMS match a direct
    computation. Both decoders are pure stdlib."""
    import math

    from wage_etl_spark.sources.multimodal import synthesize_real_media

    media = synthesize_real_media(spark, n=8, seed=7)
    feats = {r["media_id"]: r for r in extract_features(media, decoder="real").collect()}
    assert len(feats) == 8

    for i in range(0, 8, 2):  # PNGs
        w, h = 8 + (i % 5), 6 + (i % 4)
        r = feats[i]
        assert (r["dec_width"], r["dec_height"]) == (w, h)
        assert r["dec_bit_depth"] == 8 and r["dec_channels"] == 1
        expected = sum(
            ((x * 31 + y * 17 + (7 + i)) % 251) for y in range(h) for x in range(w)
        ) / (w * h)
        assert abs(float(r["dec_mean"]) - expected) < 1e-6  # unfiltering exact

    for i in range(1, 8, 2):  # WAVs
        ns = 500 + 37 * i
        r = feats[i]
        assert r["dec_sample_rate"] == 16000 and r["dec_channels"] == 1
        assert r["dec_n_samples"] == ns
        samples = [((k * 2654435761 + 7 + i) % 20001) - 10000 for k in range(ns)]
        rms = math.sqrt(sum(s * s for s in samples) / ns)
        assert abs(float(r["dec_mean"]) - rms) < 1e-3


def test_frame_sample_plan(spark):
    media = synthesize_media(spark, n=50)
    frames = frame_sample_plan(media, every_ms=10000)
    rows = frames.collect()
    assert all(r["mime"] == "video/mp4" for r in rows)
    vids = media.filter(F.col("mime") == "video/mp4").collect()
    expected = sum(v["duration_ms"] // 10000 + 1 for v in vids)
    assert len(rows) == expected
