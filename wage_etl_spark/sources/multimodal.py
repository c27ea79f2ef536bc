"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, partition sizing, Arrow batch shape,
mapInPandas signatures) is real and tested. Decoding:

- ``decoder="fake"`` — deterministic synthetic features (works on any blob);
- ``decoder="real"`` — PURE-STDLIB decoders for PNG (signature + IHDR parse
  with CRC check, zlib IDAT inflate, scanline unfiltering, pixel mean) and
  WAV (RIFF/fmt/data chunk walk, int16 PCM RMS). Mimes with no stdlib
  decoder (video/mp4) raise NotImplementedError — the honest seam where
  PIL/librosa/ffmpeg would plug in.

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
        # real-decode outputs (null under decoder="fake" / per-mime)
        StructField("dec_width", IntegerType()),
        StructField("dec_height", IntegerType()),
        StructField("dec_bit_depth", IntegerType()),
        StructField("dec_channels", IntegerType()),
        StructField("dec_sample_rate", IntegerType()),
        StructField("dec_n_samples", LongType()),
        StructField("dec_mean", StringType()),  # pixel mean / PCM RMS, 6dp str
    ]
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (PNG spec 11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(b: bytes) -> dict:
    """Pure-stdlib PNG decode: verify signature + IHDR CRC, inflate IDAT,
    unfilter scanlines (all 5 filter types), return dims + pixel mean.
    8-bit images fully decoded; other bit depths return header info only."""
    import struct
    import zlib

    if bytes(b[:8]) != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = bit_depth = color_type = None
    idat = bytearray()
    while pos + 8 <= len(b):
        (length,), ctype = struct.unpack(">I", b[pos:pos + 4]), bytes(b[pos + 4:pos + 8])
        body = bytes(b[pos + 8:pos + 8 + length])
        crc = struct.unpack(">I", b[pos + 8 + length:pos + 12 + length])[0]
        if zlib.crc32(b[pos + 4:pos + 8 + length]) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        if ctype == b"IHDR":
            width, height, bit_depth, color_type = struct.unpack(">IIBB", body[:10])
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("no IHDR chunk")
    channels = _PNG_CHANNELS.get(color_type)
    if channels is None:
        raise ValueError(f"unknown color type {color_type}")
    out = {
        "dec_width": width, "dec_height": height,
        "dec_bit_depth": bit_depth, "dec_channels": channels,
    }
    if bit_depth == 8 and idat:
        raw = zlib.decompress(bytes(idat))
        bpp = channels
        stride = width * bpp
        prev = bytearray(stride)
        total = 0
        for y in range(height):
            base = y * (stride + 1)
            ftype = raw[base]
            line = bytearray(raw[base + 1:base + 1 + stride])
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                up = prev[x]
                if ftype == 1:  # Sub
                    line[x] = (line[x] + a) & 0xFF
                elif ftype == 2:  # Up
                    line[x] = (line[x] + up) & 0xFF
                elif ftype == 3:  # Average
                    line[x] = (line[x] + (a + up) // 2) & 0xFF
                elif ftype == 4:  # Paeth
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + up - c
                    pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                    line[x] = (line[x] + pr) & 0xFF
            total += sum(line)
            prev = line
        out["dec_mean"] = f"{total / (height * stride):.6f}"
    return out


def decode_wav(b: bytes) -> dict:
    """Pure-stdlib WAV decode: RIFF chunk walk, fmt parse, int16 PCM RMS."""
    import array
    import math
    import struct

    b = bytes(b)
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = data = None
    while pos + 8 <= len(b):
        cid, sz = struct.unpack("<4sI", b[pos:pos + 8])
        body = b[pos + 8:pos + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, channels, rate, _byte_rate, _align, bits = struct.unpack("<HHIIHH", fmt[:16])
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"only 16-bit PCM supported (fmt={audio_fmt}, bits={bits})")
    samples = array.array("h")
    samples.frombytes(data[: len(data) // 2 * 2])
    n = len(samples)
    rms = math.sqrt(sum(s * s for s in samples) / n) if n else 0.0
    return {
        "dec_channels": channels,
        "dec_sample_rate": rate,
        "dec_bit_depth": bits,
        "dec_n_samples": n // max(channels, 1),
        "dec_mean": f"{rms:.6f}",
    }


_REAL_DECODERS = {"image/png": decode_png, "audio/wav": decode_wav}


def make_png(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic valid 8-bit grayscale PNG (pure stdlib) — test/fixture
    bytes for the real decoder. Mixes filter types 0/1/2 across rows."""
    import struct
    import zlib

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = bytearray()
    prev = [0] * width
    for y in range(height):
        pixels = [((x * 31 + y * 17 + seed) % 251) for x in range(width)]
        ftype = y % 3
        raw.append(ftype)
        for x in range(width):
            if ftype == 0:
                raw.append(pixels[x])
            elif ftype == 1:
                left = pixels[x - 1] if x else 0
                raw.append((pixels[x] - left) & 0xFF)
            else:
                raw.append((pixels[x] - prev[x]) & 0xFF)
        prev = pixels
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def make_wav(n_samples: int, rate: int = 16000, seed: int = 0) -> bytes:
    """Deterministic valid 16-bit mono PCM WAV (pure stdlib)."""
    import array
    import struct

    samples = array.array(
        "h", [((i * 2654435761 + seed) % 20001) - 10000 for i in range(n_samples)]
    )
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


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

    decoder="real" dispatches on mime to the pure-stdlib decoders
    (image/png, audio/wav); mimes with no stdlib decoder (video/mp4) raise
    NotImplementedError — the seam where PIL/librosa/ffmpeg would plug in."""

    dec_cols = [
        "dec_width", "dec_height", "dec_bit_depth", "dec_channels",
        "dec_sample_rate", "dec_n_samples", "dec_mean",
    ]

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
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
            decoded: dict[str, list] = {c: [] for c in dec_cols}
            for mime, blob in zip(pdf["mime"], blobs):
                d: dict = {}
                if decoder == "real":
                    fn = _REAL_DECODERS.get(mime)
                    if fn is None:
                        raise NotImplementedError(
                            f"no stdlib decoder for {mime}; plug in "
                            "PIL/librosa/ffmpeg at _REAL_DECODERS"
                        )
                    d = fn(blob)
                for c in dec_cols:
                    decoded[c].append(d.get(c))
            for c in dec_cols:
                out[c] = decoded[c]
            yield out

    return df.mapInPandas(_batches, FEATURE_SCHEMA)


def synthesize_real_media(spark: SparkSession, n: int = 30, seed: int = 7) -> DataFrame:
    """Small table of GENUINE media bytes (valid PNGs + WAVs, pure stdlib)
    for exercising decoder="real". Built driver-side — fixture scale only;
    at corpus scale blobs arrive from the lake, not a generator."""
    rows = []
    for i in range(n):
        if i % 2 == 0:
            w, h = 8 + (i % 5), 6 + (i % 4)
            rows.append((i, "image/png", w, h, None, bytearray(make_png(w, h, seed + i))))
        else:
            ns = 500 + 37 * i
            rows.append((i, "audio/wav", None, None, ns * 1000 // 16000, bytearray(make_wav(ns, seed=seed + i))))
    # fixture-sized local relation: keep it to ONE partition so the Arrow
    # decode pass costs one python-worker round-trip, not defaultParallelism
    # near-empty tasks (the lake-scale path gets its partitioning from the
    # source table, never from this generator)
    from wage_etl_spark.sources.fixtures import fixture_df

    return fixture_df(spark, rows, MEDIA_SCHEMA)


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
