"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, partition sizing, Arrow batch shape,
mapInPandas signatures) is real and tested; the actual media decoding is
STUBBED — the sandbox has no image/audio libraries — behind
``decoder="fake"`` (deterministic synthetic features) or ``decoder="real"``
(raises NotImplementedError with the dependency it would need).

Design for 100 TB of media:
- media bytes live in a ``binary`` column; metadata (mime, width, height,
  duration_ms) in plain columns so filters/pruning never touch the blob;
- all Python work is ``mapInPandas`` over Arrow batches — a batch of blobs
  crosses the boundary once, is decoded vectorized, and only the (small)
  feature output comes back;
- ``maxRecordsPerBatch`` should be lowered for large blobs (a 10 MB image x
  10k default batch would OOM the worker) — callers set
  spark.sql.execution.arrow.maxRecordsPerBatch accordingly.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("data", BinaryType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
        StructField("feat_mean", StringType()),  # hex-packed fake feature
    ]
)


def synthesize_media(spark: SparkSession, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: blob = repeated md5 bytes."""
    mimes = F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4"))
    ids = spark.range(n).withColumnRenamed("id", "media_id")
    h = F.abs(F.xxhash64(F.lit(seed), F.col("media_id")))
    return ids.select(
        "media_id",
        F.element_at(mimes, (h % 3 + 1).cast("int")).alias("mime"),
        ((h % 1024) + 16).cast("int").alias("width"),
        ((h % 768) + 16).cast("int").alias("height"),
        ((h % 60000) + 100).cast("int").alias("duration_ms"),
        F.to_binary(
            F.repeat(F.md5(F.concat_ws("|", F.lit(seed), F.col("media_id"))), 64), F.lit("hex")
        ).alias("data"),
    )


def extract_features(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode/feature-extract media blobs via mapInPandas (Arrow-batched).

    decoder="real" is the production seam: it would dispatch on mime to
    PIL/librosa/ffmpeg — none of which ship in this container."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if decoder == "real":
                raise NotImplementedError(
                    "real media decoding needs PIL/librosa/ffmpeg; install them "
                    "and implement the per-mime dispatch here"
                )
            blobs = pdf["data"]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": blobs.map(len).astype("int64"),
                    "sha256": blobs.map(lambda b: hashlib.sha256(bytes(b)).hexdigest()),
                    # deterministic fake "embedding": digest of the blob head
                    "feat_mean": blobs.map(
                        lambda b: hashlib.md5(bytes(b[:256])).hexdigest()
                    ),
                }
            )
            yield out

    return df.mapInPandas(_batches, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: expand each video row into frame
    timestamps (the decode of each frame is the stubbed step). The explode
    happens JVM-side; only sampled offsets would reach the decoder."""
    return (
        df.filter(F.col("mime") == "video/mp4")
        .withColumn(
            "frame_ts_ms",
            F.explode(F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))),
        )
        .select("media_id", "frame_ts_ms", "mime")
    )
