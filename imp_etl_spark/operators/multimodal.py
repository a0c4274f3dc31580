"""Multimodal column plumbing (north-star, SURVEY.md §7.8).

Images/audio/video ride as opaque ``binary`` columns with a typed
metadata struct. The Spark-side machinery — schema, partition-preserving
``mapInPandas``, Arrow batch shape, output contract — is real and tested,
and so is the codec for uncompressed containers: ``decode_media`` parses
BMP (BITMAPINFOHEADER dims/bpp) and WAV (RIFF fmt/data chunks ->
channels, sample rate, bit depth, duration) headers in pure Python — no
image/audio libraries needed. Compressed codecs (JPEG/PNG/MP3/H.264) are
where real deployments plug Pillow/librosa/av into the same
``mapInPandas`` seam; unknown formats decode to NULL metadata plus the
content byte-histogram, never an error.

Scale notes: ``mapInPandas`` streams Arrow batches — no per-row Python
overhead, no collect; decode parallelism = input partitions, so
repartition by a size-balanced key before heavy decode. Binary payloads
never shuffle here (narrow transform); only extracted features (small)
flow downstream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: metadata struct carried alongside every media payload
MEDIA_META = StructType([
    StructField("media_type", StringType()),   # 'image' | 'audio' | 'video'
    StructField("format", StringType()),       # 'png', 'wav', ...
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_bytes", LongType()),
])

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("payload", BinaryType()),
    StructField("meta", MEDIA_META),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("format_detected", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("bit_depth", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("sample_rate_hz", IntegerType()),
    StructField("duration_s", DoubleType()),
    StructField("features", ArrayType(FloatType())),
])


def attach_media(df: DataFrame, payload_col: str, media_type: str,
                 fmt: str, id_col: str) -> DataFrame:
    """Wrap an existing binary/string column as a media frame with typed
    metadata (the ingestion shape for multimodal tables)."""
    payload = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


# --------------------------------------------------------------------------
# Real uncompressed-container codecs: pure-Python header parse (no
# libraries). Writers exist so tests and fixture queries can synthesize
# genuine files distributively; parsers are the decode step.
# --------------------------------------------------------------------------

_PATTERN = bytes(range(256))


def _fill(n: int, seed: int) -> bytes:
    """Deterministic byte fill == (seed+i) & 0xFF, built from slices."""
    s = seed & 0xFF
    return (_PATTERN[s:] + _PATTERN * (n // 256 + 1))[:n]


def make_bmp(width: int, height: int, seed: int = 0) -> bytes:
    """A valid 24-bit uncompressed BMP (BITMAPINFOHEADER), deterministic
    pixel fill from ``seed``. Row stride pads to 4 bytes per the spec."""
    import struct

    stride = (width * 3 + 3) & ~3
    data_size = stride * height
    px = _fill(data_size, seed)
    file_header = b"BM" + struct.pack("<IHHI", 54 + data_size, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      data_size, 2835, 2835, 0, 0)
    return file_header + dib + px


def make_wav(n_samples: int, sample_rate: int = 8000, channels: int = 1,
             bits: int = 16, seed: int = 0) -> bytes:
    """A valid PCM WAV (RIFF/fmt/data), deterministic sample fill."""
    import struct

    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    data_size = n_samples * block_align
    data = _fill(data_size, seed)
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate,
                      block_align, bits)
    return (b"RIFF" + struct.pack("<I", 36 + data_size) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", data_size) + data)


def parse_bmp(b: bytes) -> dict | None:
    """BMP header -> dims/bpp (BITMAPINFOHEADER; negative height means
    top-down per the spec — report magnitude)."""
    if b is None or len(b) < 54 or b[:2] != b"BM":
        return None
    width = int.from_bytes(b[18:22], "little", signed=True)
    height = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    if width <= 0 or height == 0:
        return None
    return {"format_detected": "bmp", "width": width, "height": abs(height),
            "bit_depth": bpp}


def parse_wav(b: bytes) -> dict | None:
    """RIFF walk: fmt chunk -> channels/rate/bits; data chunk -> duration.
    Chunk-order agnostic (the spec allows LIST etc. between them)."""
    if b is None or len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos, info, data_size = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        csize = int.from_bytes(b[pos + 4:pos + 8], "little")
        if cid == b"fmt " and pos + 8 + 16 <= len(b):
            channels = int.from_bytes(b[pos + 10:pos + 12], "little")
            rate = int.from_bytes(b[pos + 12:pos + 16], "little")
            bits = int.from_bytes(b[pos + 22:pos + 24], "little")
            info = (channels, rate, bits)
        elif cid == b"data":
            data_size = csize
        pos += 8 + csize + (csize & 1)  # chunks pad to even length
    if info is None or data_size is None:
        return None
    channels, rate, bits = info
    block = channels * bits // 8
    if rate <= 0 or block <= 0:
        return None
    n_samples = data_size // block
    return {"format_detected": "wav", "channels": channels,
            "sample_rate_hz": rate, "bit_depth": bits,
            # exact ints -> one IEEE division: deterministic cross-engine
            "duration_s": float(n_samples) / float(rate)}


def byte_histogram(payload: bytes) -> list[float]:
    """8-bucket normalized byte histogram — a real (if crude) content
    feature that needs no codec; kept alongside the parsed metadata."""
    if not payload:
        return [0.0] * 8
    hist = [0] * 8
    for b in payload:
        hist[b >> 5] += 1
    n = float(len(payload))
    return [round(h / n, 6) for h in hist]


def decode_media(payload: bytes) -> dict:
    """Sniff + parse a media payload. BMP and WAV decode fully (pure
    Python); anything else yields NULL metadata + content histogram —
    the seam where real deployments plug compressed codecs."""
    base = {"format_detected": None, "width": None, "height": None,
            "bit_depth": None, "channels": None, "sample_rate_hz": None,
            "duration_s": None}
    parsed = parse_bmp(payload) or parse_wav(payload)
    if parsed:
        base.update(parsed)
    base["features"] = byte_histogram(payload)
    base["n_bytes"] = len(payload) if payload is not None else 0
    return base


def extract_features(media: DataFrame,
                     batch_hint: int | None = None) -> DataFrame:
    """Arrow-batched decode + feature extraction over media payloads.

    ``mapInPandas`` keeps the binary column off the shuffle and processes
    whole Arrow batches per call; the returned frame carries only parsed
    metadata and small feature vectors.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode_media(p) for p in pdf["payload"]]
            out = {"media_id": pdf["media_id"].tolist()}
            for k in ("n_bytes", "format_detected", "width", "height",
                      "bit_depth", "channels", "sample_rate_hz",
                      "duration_s", "features"):
                out[k] = [r[k] for r in rows]
            yield pd.DataFrame(out)

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def synthesize_media(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic REAL-container media frame from an id column: even
    ids become 24-bit BMPs (width = 1 + id % 64, height = 1 + id % 48),
    odd ids become 16-bit mono 8 kHz WAVs (n_samples = 100 + id % 50).
    Runs in ``mapInPandas`` so synthesis scales with input partitions —
    no driver-side build. The dimension formulas are closed-form in the
    id, which is what makes the decode round-trip oracle-checkable
    (queries_llm.multimodal_features)."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = [int(i) for i in pdf[id_col]]
            payloads, metas = [], []
            for i in ids:
                if i % 2 == 0:
                    w, h = 1 + i % 64, 1 + i % 48
                    p = make_bmp(w, h, seed=i)
                    metas.append({"media_type": "image", "format": "bmp",
                                  "width": w, "height": h,
                                  "n_bytes": len(p)})
                else:
                    p = make_wav(100 + i % 50, seed=i)
                    metas.append({"media_type": "audio", "format": "wav",
                                  "width": None, "height": None,
                                  "n_bytes": len(p)})
                payloads.append(p)
            yield pd.DataFrame({"media_id": ids, "payload": payloads,
                                "meta": metas})

    return df.select(F.col(id_col).cast("long").alias(id_col)) \
             .mapInPandas(_gen, schema=MEDIA_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64,
                 max_frames: int = 8) -> DataFrame:
    """'Frame sampling' on the opaque payload: take byte-offsets every
    ``every_n_bytes`` (the video-frame-sampling shape without a codec).
    Pure built-ins — stays JVM-side."""
    idx = F.sequence(F.lit(0), F.least(
        F.floor(F.length("payload") / every_n_bytes),
        F.lit(max_frames - 1)))
    return media.select(
        "media_id",
        F.posexplode(idx).alias("frame_no", "__i"),
    ).select(
        "media_id", "frame_no",
        (F.col("frame_no") * every_n_bytes).alias("byte_offset"),
    )
