"""Multimodal column plumbing (north-star, SURVEY.md §7.8).

Images/audio/video ride as opaque ``binary`` columns with a typed
metadata struct. The Spark-side machinery — schema, partition-preserving
``mapInPandas``, Arrow batch shape, output contract — is real and tested;
the actual codec step is STUBBED (the container ships no image/audio
libraries): ``decode_stub`` raises ``NotImplementedError`` unless
``fake=True``, in which case it produces a deterministic fake feature
vector derived from the bytes, so the pipeline shape is testable
end-to-end.

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


def decode_stub(payload: bytes, fake: bool) -> list[float]:
    """STUB codec. Real deployments plug Pillow/librosa/av here; this
    container has none, so either fail loudly or produce a deterministic
    fake: 8 bucket-normalized byte histograms."""
    if not fake:
        raise NotImplementedError(
            "media codecs are not available in this environment; "
            "pass fake=True for the deterministic stand-in"
        )
    if not payload:
        return [0.0] * 8
    hist = [0] * 8
    for b in payload:
        hist[b >> 5] += 1
    n = float(len(payload))
    return [round(h / n, 6) for h in hist]


def extract_features(media: DataFrame, fake: bool = True,
                     batch_hint: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over media payloads.

    ``mapInPandas`` keeps the binary column off the shuffle and processes
    whole Arrow batches per call; the returned frame carries only small
    feature vectors.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_stub(p, fake) for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_bytes": [len(p) if p is not None else 0
                            for p in pdf["payload"]],
                "features": feats,
            })

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


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
