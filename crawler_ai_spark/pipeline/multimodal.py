"""Multimodal column plumbing: image/audio/video as opaque BINARY columns
with typed metadata, processed via mapInPandas in fixed-size Arrow batches.

PNG pixel decode is REAL — a pure-stdlib (zlib) codec below handles the
8-bit non-interlaced critical path (gray/RGB/palette/RGBA, all five row
filters), so `decode_image_features` produces true dimensions, channel
counts, pixel means and pixel hashes for PNG columns with no PIL in the
container. JPEG/GIF/BMP pixel decode still needs a codec this sandbox
lacks (`_decode_image` raises NotImplementedError unless ``fake=True``
substitutes a deterministic header-parse). Everything AROUND decode is
real and tested either way: the schema contract, the Arrow batch shape,
partition sizing by byte budget, and codec-free metadata extraction
(magic-number sniffing, container dimensions from headers).

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
    DoubleType,
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


# ---------------------------------------------------------------------------
# PNG codec — pure stdlib (zlib); the one image format this sandbox can
# decode for real. RFC 2083 critical path: chunk walk, IDAT inflate,
# per-row unfilter (None/Sub/Up/Average/Paeth), 8-bit gray/RGB/palette/
# RGBA, non-interlaced. 16-bit and Adam7 raise ValueError (rare on the
# web; a PIL deployment replaces _decode_image wholesale).
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 6: 4, 4: 2}


def _png_chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        yield ctype, body
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IEND":
            return
    raise ValueError("PNG missing IEND")


def _png_unfilter(raw: bytes, width: int, height: int, bpp: int) -> bytearray:
    stride = width * bpp
    if len(raw) < (stride + 1) * height:
        raise ValueError("PNG pixel data shorter than geometry requires")
    out = bytearray(stride * height)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        row = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        o = y * stride
        p = o - stride  # previous row offset (invalid for y=0, guarded)
        if ftype == 0:  # None
            out[o : o + stride] = row
        elif ftype == 1:  # Sub
            for x in range(stride):
                left = out[o + x - bpp] if x >= bpp else 0
                out[o + x] = (row[x] + left) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                up = out[p + x] if y else 0
                out[o + x] = (row[x] + up) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = out[o + x - bpp] if x >= bpp else 0
                up = out[p + x] if y else 0
                out[o + x] = (row[x] + ((left + up) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = out[o + x - bpp] if x >= bpp else 0
                up = out[p + x] if y else 0
                ul = out[p + x - bpp] if (y and x >= bpp) else 0
                pa, pb, pc = abs(up - ul), abs(left - ul), abs(left + up - 2 * ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                out[o + x] = (row[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    return out


def decode_png(data: bytes) -> dict:
    """Decode a PNG to raw 8-bit pixels. Returns {width, height, channels,
    pixels: bytes (row-major, channel-interleaved, palette expanded to
    RGB), mean_pixel, pixel_sha256}."""
    import hashlib
    import zlib

    if not data or not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    ihdr = None
    palette = None
    idat = bytearray()
    for ctype, body in _png_chunks(data):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body[:13])
        elif ctype == b"PLTE":
            palette = body
        elif ctype == b"IDAT":
            idat.extend(body)
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    width, height, depth, ctype_n, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("nonstandard PNG compression/filter method")
    if interlace != 0:
        raise ValueError("Adam7-interlaced PNG not supported by the stdlib decoder")
    if depth != 8:
        raise ValueError(f"PNG bit depth {depth} not supported (8 only)")
    if ctype_n not in _PNG_CHANNELS:
        raise ValueError(f"PNG color type {ctype_n} not supported")
    if width == 0 or height == 0:
        raise ValueError("zero-dimension PNG")
    bpp = _PNG_CHANNELS[ctype_n]
    raw = zlib.decompress(bytes(idat))
    pixels = _png_unfilter(raw, width, height, bpp)
    channels = bpp
    if ctype_n == 3:  # palette -> RGB
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        rgb = bytearray(width * height * 3)
        for i, idx in enumerate(pixels):
            rgb[i * 3 : i * 3 + 3] = palette[idx * 3 : idx * 3 + 3]
        pixels, channels = rgb, 3
    mean = (sum(pixels) / len(pixels)) if pixels else 0.0
    return {
        "width": width,
        "height": height,
        "channels": channels,
        "pixels": bytes(pixels),
        "mean_pixel": round(mean / 255.0, 6),
        # exact-integer twins so cross-engine consumers can re-derive the
        # mean with engine-native float ops (Python round() is banker's —
        # never hash-compare it against SQL round())
        "pixel_sum": sum(pixels),
        "n_pix": len(pixels),
        "pixel_sha256": hashlib.sha256(bytes(pixels)).hexdigest(),
    }


def encode_png(width: int, height: int, pixels: bytes, channels: int = 3) -> bytes:
    """Minimal non-interlaced 8-bit PNG writer (filter 0 rows) — the
    fixture side of the codec; decode_png(encode_png(...)) round-trips."""
    import zlib

    ctype = {1: 0, 3: 2, 4: 6}[channels]
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError("pixel buffer does not match geometry")
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def _decode_image(data: bytes, fake: bool = False):
    """Pixel decode. PNG decodes FOR REAL via the stdlib codec above
    (no PIL needed); JPEG/GIF/BMP still require a codec this container
    lacks — for those, ``fake=True`` returns a deterministic stand-in
    (dimensions from the header, mean 'pixel' = byte mean) so downstream
    plumbing — feature vectors, resize bookkeeping, batch shapes — is
    exercised for real. A deployment with PIL replaces only this
    function."""
    if data and data.startswith(_PNG_SIG):
        d = decode_png(data)
        return {
            "width": d["width"],
            "height": d["height"],
            "mean_pixel": d["mean_pixel"],
            "channels": d["channels"],
            "pixel_sha256": d["pixel_sha256"],
        }
    if not fake:
        raise NotImplementedError(
            "pixel decode for non-PNG formats requires an image codec "
            "(PIL/libvips) — not in this sandbox; pass fake=True for the "
            "deterministic stand-in"
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


IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("mean_pixel", DoubleType()),
        StructField("pixel_sum", LongType()),
        StructField("n_pix", LongType()),
        StructField("pixel_sha256", StringType()),
    ]
)


def decode_image_features(media: DataFrame, batch_bytes: int = 64 << 20) -> DataFrame:
    """Real pixel-decode pass over PNG rows (stdlib codec — no PIL):
    mapInPandas with the same byte-budget re-chunking as the metadata
    pass; non-PNG and undecodable rows surface NULL features rather than
    failing the batch (a corrupt image must not kill a 100 TB job)."""

    def _feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
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
                out = {k.name: [] for k in IMAGE_FEATURES_SCHEMA.fields}
                cols = ("width", "height", "channels", "mean_pixel",
                        "pixel_sum", "n_pix", "pixel_sha256")
                for mid, blob in zip(chunk["media_id"], chunk["content"]):
                    row = [None] * len(cols)
                    if blob is not None and bytes(blob[:8]) == _PNG_SIG:
                        try:
                            d = decode_png(bytes(blob))
                            row = [d[k] for k in cols]
                        except ValueError:
                            pass  # undecodable -> NULL features
                    out["media_id"].append(mid)
                    for k, v in zip(cols, row):
                        out[k].append(v)
                yield pd.DataFrame(out)

    return media.mapInPandas(_feats, IMAGE_FEATURES_SCHEMA)


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
    """Deterministic fake media table for tests — no external data. PNG
    rows (i%5==0) are REAL decodable images (stdlib encoder, deterministic
    RGB gradient) so the pixel-decode path is exercised on true bytes;
    the other formats carry valid headers + noise bodies."""
    import random

    rng = random.Random(42)
    rows = []
    for i in range(n):
        kind = ["image", "image", "image", "audio", "video"][i % 5]
        if i % 5 == 0:
            w, h = 16 + i % 64, 9 + i % 48
            px = bytes(
                ((x * 7 + y * 13 + c * 29 + i) % 256)
                for y in range(h)
                for x in range(w)
                for c in range(3)
            )
            body = encode_png(w, h, px, channels=3)
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
