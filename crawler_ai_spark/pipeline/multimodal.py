"""Multimodal column plumbing: image/audio/video as opaque BINARY columns
with typed metadata, processed via mapInPandas in fixed-size Arrow batches.

The decode step itself is STUBBED (this container ships no PIL/ffmpeg —
``_decode_image`` raises NotImplementedError unless ``fake=True``, which
substitutes a deterministic header-parse). Everything AROUND the decode is
real and tested: the schema contract, the Arrow batch shape, partition
sizing by byte budget, and the metadata extraction that needs no codec
(magic-number sniffing, container dimensions from PNG/GIF/BMP headers).

Scale notes: media rows are large and variable — the repartitioner targets
BYTES per partition, not rows (spark.sql.files.maxPartitionBytes analogue
for in-flight data), so a partition of 4K images and a partition of 10
videos cost the same executor memory."""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),      # image | audio | video
        StructField("content", BinaryType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime_sniffed", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("header_hex", StringType()),
    ]
)

_MAGIC = [
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"BM", "image/bmp"),
    (b"RIFF", "audio/wav"),       # refined by the WAVE tag below
    (b"ID3", "audio/mpeg"),
    (b"\x1aE\xdf\xa3", "video/webm"),
]


def sniff_mime(data: bytes | None) -> str:
    if not data:
        return "application/octet-stream"
    for magic, mime in _MAGIC:
        if data.startswith(magic):
            if mime == "audio/wav" and len(data) >= 12 and data[8:12] != b"WAVE":
                return "application/octet-stream"
            return mime
    if len(data) > 8 and data[4:8] == b"ftyp":
        return "video/mp4"
    return "application/octet-stream"


def header_dimensions(data: bytes | None) -> tuple[int | None, int | None]:
    """Width/height from container headers alone — no codec needed."""
    if not data:
        return None, None
    try:
        if data.startswith(b"\x89PNG") and len(data) >= 24:
            w, h = struct.unpack(">II", data[16:24])
            return int(w), int(h)
        if data.startswith((b"GIF87a", b"GIF89a")) and len(data) >= 10:
            w, h = struct.unpack("<HH", data[6:10])
            return int(w), int(h)
        if data.startswith(b"BM") and len(data) >= 26:
            w, h = struct.unpack("<ii", data[18:26])
            return int(w), abs(int(h))
    except struct.error:
        return None, None
    return None, None


def _decode_image(data: bytes, fake: bool = False):
    """Full pixel decode — NOT AVAILABLE in this container.

    ``fake=True`` returns a deterministic stand-in (dimensions from the
    header, mean 'pixel' = byte mean) so the downstream plumbing —
    feature vectors, resize bookkeeping, batch shapes — is exercised for
    real. A deployment with PIL installs the real decode behind this exact
    signature."""
    if not fake:
        raise NotImplementedError(
            "pixel decode requires an image codec (PIL/libvips) — not in this sandbox; "
            "pass fake=True for the deterministic stand-in"
        )
    w, h = header_dimensions(data)
    mean_byte = (sum(data) / len(data)) if data else 0.0
    return {"width": w, "height": h, "mean_pixel": round(mean_byte / 255.0, 6)}


def extract_media_meta(media: DataFrame, batch_bytes: int = 64 << 20) -> DataFrame:
    """mapInPandas metadata pass: sniff + header dims per row, Arrow
    batches re-chunked so each pandas batch stays under ``batch_bytes``."""

    def _meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # re-chunk by byte budget: a single Arrow batch of videos can
            # blow past executor memory if taken whole
            sizes = pdf["content"].map(lambda b: len(b) if b is not None else 0)
            cuts, acc = [0], 0
            for i, s in enumerate(sizes):
                acc += int(s)
                if acc >= batch_bytes:
                    cuts.append(i + 1)
                    acc = 0
            cuts.append(len(pdf))
            for lo, hi in zip(cuts, cuts[1:]):
                if lo >= hi:
                    continue
                chunk = pdf.iloc[lo:hi]
                data = chunk["content"]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].values,
                        "mime_sniffed": [sniff_mime(b) for b in data],
                        "n_bytes": [len(b) if b is not None else 0 for b in data],
                        "width": [header_dimensions(b)[0] for b in data],
                        "height": [header_dimensions(b)[1] for b in data],
                        "header_hex": [
                            (bytes(b[:8]).hex() if b else "") for b in data
                        ],
                    }
                )

    return media.mapInPandas(_meta, MEDIA_META_SCHEMA)


def repartition_by_bytes(media: DataFrame, target_bytes: int = 256 << 20,
                         total_bytes: int | None = None) -> DataFrame:
    """Byte-budget repartition: ranges by cumulative size, not row count.
    One count+sum action when total_bytes isn't supplied."""
    if total_bytes is None:
        total_bytes = media.agg(F.sum(F.length("content"))).first()[0] or 0
    n_parts = max(1, int(total_bytes / target_bytes) + 1)
    return media.repartitionByRange(n_parts, F.col("n_bytes").desc(), F.col("media_id"))


def frame_sample_plan(media: DataFrame, every_n_seconds: int = 5,
                      assumed_fps: int = 25) -> DataFrame:
    """Video frame-sampling plan: one row per frame to extract (the decode
    itself is the stubbed step). Demonstrates the explode-based fan-out
    shape: n_frames estimated from container size (no codec)."""
    est_seconds = (F.col("n_bytes") / F.lit(500_000)).cast("int")  # ~0.5MB/s proxy
    n_samples = F.greatest(est_seconds / F.lit(every_n_seconds), F.lit(1)).cast("int")
    return (
        media.where(F.col("kind") == "video")
        .withColumn("sample_idx", F.explode(F.sequence(F.lit(0), n_samples - 1)))
        .withColumn("frame_no", F.col("sample_idx") * every_n_seconds * assumed_fps)
        .select("media_id", "sample_idx", "frame_no")
    )


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table (tiny valid PNG/GIF/BMP/WAV headers +
    noise bodies) for tests — no external data."""
    import random

    rng = random.Random(42)
    rows = []
    for i in range(n):
        kind = ["image", "image", "image", "audio", "video"][i % 5]
        if i % 5 == 0:
            w, h = 16 + i % 64, 9 + i % 48
            body = b"\x89PNG\r\n\x1a\n" + b"\x00" * 8 + struct.pack(">II", w, h)
        elif i % 5 == 1:
            w, h = 8 + i % 32, 8 + i % 32
            body = b"GIF89a" + struct.pack("<HH", w, h)
        elif i % 5 == 2:
            w, h = 32 + i % 16, 24 + i % 16
            body = b"BM" + b"\x00" * 16 + struct.pack("<ii", w, h)
        elif i % 5 == 3:
            body = b"RIFF" + b"\x00\x00\x00\x00" + b"WAVE"
        else:
            body = b"\x00\x00\x00\x18ftypmp42"
        body += bytes(rng.randrange(256) for _ in range(rng.randrange(64, 256)))
        rows.append((i, kind, body, None, len(body)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
