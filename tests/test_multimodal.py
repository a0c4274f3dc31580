"""Golden tests for the real (pure-Python) BMP/WAV codec and the Spark
multimodal plumbing (operators/multimodal.py)."""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from imp_etl_spark.operators.multimodal import (
    attach_media,
    byte_histogram,
    decode_media,
    extract_features,
    frame_sample,
    make_bmp,
    make_wav,
    parse_bmp,
    parse_wav,
    synthesize_media,
)


def test_bmp_roundtrip_golden():
    b = make_bmp(3, 2, seed=7)
    # stride pads 3*3=9 px-bytes to 12; file = 54 header + 24 data
    assert len(b) == 54 + 12 * 2
    assert b[:2] == b"BM"
    got = parse_bmp(b)
    assert got == {"format_detected": "bmp", "width": 3, "height": 2,
                   "bit_depth": 24}


def test_bmp_topdown_negative_height():
    b = bytearray(make_bmp(4, 5))
    struct.pack_into("<i", b, 22, -5)  # top-down per spec
    assert parse_bmp(bytes(b))["height"] == 5


def test_wav_roundtrip_golden():
    w = make_wav(8000, sample_rate=8000, channels=1, bits=16, seed=3)
    assert len(w) == 44 + 16000
    got = parse_wav(w)
    assert got == {"format_detected": "wav", "channels": 1,
                   "sample_rate_hz": 8000, "bit_depth": 16,
                   "duration_s": 1.0}


def test_wav_with_interleaved_chunk():
    """RIFF walk must skip unknown chunks (LIST) between fmt and data."""
    w = make_wav(100, sample_rate=44100, channels=2, bits=16)
    fmt_chunk = w[12:12 + 8 + 16]
    data_chunk = w[12 + 8 + 16:]
    lst = b"LIST" + struct.pack("<I", 4) + b"INFO"
    body = fmt_chunk + lst + data_chunk
    rebuilt = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    got = parse_wav(rebuilt)
    assert got["sample_rate_hz"] == 44100 and got["channels"] == 2
    assert got["duration_s"] == 100.0 / 44100.0


def test_garbage_and_truncated_payloads():
    assert parse_bmp(b"not a bmp at all" * 10) is None
    assert parse_wav(b"RIFFxxxx") is None
    assert parse_bmp(make_bmp(3, 2)[:20]) is None
    d = decode_media(b"\x00\x01plain text payload")
    assert d["format_detected"] is None and d["width"] is None
    assert d["n_bytes"] == 20 and len(d["features"]) == 8


def test_byte_histogram_normalized():
    h = byte_histogram(bytes([0, 0, 255, 255]))
    assert h[0] == 0.5 and h[7] == 0.5 and sum(h) == 1.0
    assert byte_histogram(b"") == [0.0] * 8


def test_extract_features_spark_roundtrip(spark):
    """synthesize real containers distributively, decode them back, and
    check the parsed metadata against the closed-form id formulas."""
    base = spark.range(10).select(F.col("id").alias("doc_id"))
    out = {r["media_id"]: r for r in
           extract_features(synthesize_media(base, "doc_id")).collect()}
    assert len(out) == 10
    for i in range(10):
        r = out[i]
        if i % 2 == 0:
            assert r["format_detected"] == "bmp"
            assert r["width"] == 1 + i % 64 and r["height"] == 1 + i % 48
            assert r["bit_depth"] == 24 and r["duration_s"] is None
        else:
            assert r["format_detected"] == "wav"
            assert r["sample_rate_hz"] == 8000 and r["channels"] == 1
            assert r["duration_s"] == (100 + i % 50) / 8000.0
            assert r["width"] is None
        assert abs(sum(r["features"]) - 1.0) < 1e-4


def test_attach_media_and_frame_sample(spark):
    df = spark.createDataFrame([(1, "x" * 200), (2, "y" * 10)],
                               "doc_id INT, text STRING")
    media = attach_media(df, "text", "video", "raw", "doc_id")
    m = {r["media_id"]: r for r in media.collect()}
    assert m[1]["meta"]["n_bytes"] == 200
    frames = frame_sample(media, every_n_bytes=64, max_frames=8).collect()
    per_id = {}
    for r in frames:
        per_id.setdefault(r["media_id"], []).append(r["byte_offset"])
    assert sorted(per_id[1]) == [0, 64, 128, 192]
    assert sorted(per_id[2]) == [0]
