"""Multimodal column plumbing: image/audio/video as opaque BINARY columns
with typed metadata, processed via mapInPandas in fixed-size Arrow batches.

PNG, 24-bit-BMP, GIF and baseline JPEG pixel decode are REAL —
pure-stdlib codecs handle PNG's 8-bit non-interlaced critical path
(gray/RGB/palette/RGBA, all five row filters, zlib inflate), BMP's
uncompressed BI_RGB path (padding, bottom-up/top-down, BGR swap),
GIF87a/89a first-frame decode (full variable-width LZW with dictionary
reset, local/global palettes, 4-pass deinterlace), and baseline-
sequential JPEG (pipeline/jpegcodec.py: stream-read Huffman tables,
restart intervals, 4:2:0/4:2:2/4:4:4, numpy IDCT, JFIF YCbCr→RGB), so
`decode_image_features` produces true dimensions, channel counts, pixel
means and pixel hashes with no PIL in the container. Only codec-less
formats (WebP/TIFF/AVIF) and progressive JPEG need ``fake=True``'s
deterministic header-parse stand-in. Everything AROUND decode is
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


# ---------------------------------------------------------------------------
# GIF codec — GIF87a/89a single-frame: logical screen + global/local color
# tables, extension-block skip, full LZW decompression with variable code
# width and dictionary reset, Adam-style 4-pass deinterlace. Animated GIFs
# decode their FIRST frame (the thumbnail semantics a curation pipeline
# wants). Palette → RGB. Encoder emits real LZW for fixture round-trips.
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int) -> bytearray:
    """GIF-flavor LZW: variable code width starting at min_code_size+1,
    CLEAR resets the dictionary, EOI terminates; codes emit byte strings."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    # bit reader, LSB-first across the concatenated sub-block payload
    bitpos = 0
    total_bits = len(data) * 8

    def read(width: int) -> int | None:
        nonlocal bitpos
        if bitpos + width > total_bits:
            return None
        v = 0
        for i in range(width):
            byte = data[(bitpos + i) >> 3]
            v |= ((byte >> ((bitpos + i) & 7)) & 1) << i
        bitpos += width
        return v

    def fresh():
        return {i: bytes([i]) for i in range(clear)}

    table = fresh()
    width = min_code_size + 1
    prev: bytes | None = None
    next_code = eoi + 1
    while True:
        code = read(width)
        if code is None or code == eoi:
            return out
        if code == clear:
            table, width, prev, next_code = fresh(), min_code_size + 1, None, eoi + 1
            continue
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError("corrupt GIF LZW stream")
        out.extend(entry)
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry


def _lzw_encode(pixels: bytes, min_code_size: int) -> bytes:
    """Real GIF LZW encoder (the fixture side; decode∘encode = identity)."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    run = b""
    for b in pixels:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            # the decoder's table lags the encoder's by exactly one add
            # (it reconstructs an entry only after reading the NEXT code),
            # so the encoder grows its width one assignment later than the
            # decoder's 2^width threshold — the classic GIF +1 rule
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code, width = eoi + 1, min_code_size + 1
        run = bytes([b])
    if run:
        emit(table[run], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def decode_gif(data: bytes) -> dict:
    """Decode the first frame of a GIF to the decode_png dict shape
    (palette expanded to RGB, interlace resolved)."""
    import hashlib

    if not data or not data.startswith((b"GIF87a", b"GIF89a")) or len(data) < 13:
        raise ValueError("not a GIF")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = data[pos : pos + 3 * n]
        if len(gct) < 3 * n:
            raise ValueError("truncated GIF global color table")
        pos += 3 * n
    while pos < len(data):
        b = data[pos]
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            if pos + 10 > len(data):
                raise ValueError("truncated GIF image descriptor")
            _ix, _iy, iw, ih, iflags = struct.unpack_from("<HHHHB", data, pos + 1)
            pos += 10
            table = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                table = data[pos : pos + 3 * n]
                if len(table) < 3 * n:
                    raise ValueError("truncated GIF local color table")
                pos += 3 * n
            if table is None:
                raise ValueError("GIF frame has no color table")
            if iw == 0 or ih == 0:
                raise ValueError("zero-dimension GIF frame")
            min_code = data[pos]
            pos += 1
            payload = bytearray()
            while pos < len(data) and data[pos] != 0:
                ln = data[pos]
                payload.extend(data[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            idx = _lzw_decode(bytes(payload), min_code)
            if len(idx) < iw * ih:
                raise ValueError("GIF pixel data shorter than geometry requires")
            idx = idx[: iw * ih]
            if iflags & 0x40:  # deinterlace (4 passes)
                rows = [idx[y * iw : (y + 1) * iw] for y in range(ih)]
                order = (
                    list(range(0, ih, 8)) + list(range(4, ih, 8))
                    + list(range(2, ih, 4)) + list(range(1, ih, 2))
                )
                fixed = [b""] * ih
                for src_row, dst_y in enumerate(order):
                    fixed[dst_y] = rows[src_row]
                idx = bytearray(b"".join(fixed))
            ncolors = len(table) // 3
            rgb = bytearray(iw * ih * 3)
            for i, ci in enumerate(idx):
                if ci >= ncolors:
                    raise ValueError("GIF pixel index outside color table")
                rgb[i * 3 : i * 3 + 3] = table[ci * 3 : ci * 3 + 3]
            mean = (sum(rgb) / len(rgb)) if rgb else 0.0
            return {
                "width": iw,
                "height": ih,
                "channels": 3,
                "pixels": bytes(rgb),
                "mean_pixel": round(mean / 255.0, 6),
                "pixel_sum": sum(rgb),
                "n_pix": len(rgb),
                "pixel_sha256": hashlib.sha256(bytes(rgb)).hexdigest(),
            }
        elif b == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    raise ValueError("GIF contains no image frame")


def encode_gif(width: int, height: int, indices: bytes, palette: bytes) -> bytes:
    """Minimal single-frame GIF89a writer: `indices` are palette indices
    (row-major), `palette` is packed RGB (len multiple of 3, ≤256 entries,
    padded up to a power of two)."""
    ncolors = len(palette) // 3
    if ncolors < 2 or ncolors > 256:
        raise ValueError("palette must hold 2..256 colors")
    if len(indices) != width * height:
        raise ValueError("index buffer does not match geometry")
    if indices and max(indices) >= ncolors:
        raise ValueError("index outside palette")
    bits = max(1, (ncolors - 1).bit_length())
    padded = palette + b"\x00" * 3 * ((1 << bits) - ncolors)
    hdr = b"GIF89a" + struct.pack("<HHBBB", width, height, 0x80 | (bits - 1), 0, 0)
    desc = b"\x2C" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    min_code = max(2, bits)
    lzw = _lzw_encode(indices, min_code)
    blocks = bytearray([min_code])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks.append(len(chunk))
        blocks.extend(chunk)
    blocks.append(0)
    return hdr + padded + desc + bytes(blocks) + b"\x3B"


# ---------------------------------------------------------------------------
# BMP codec — 24-bit BI_RGB (the uncompressed common case), BITMAPINFOHEADER,
# bottom-up or top-down (negative height), 4-byte row padding, BGR→RGB.
# Other depths/compressions raise ValueError (a PIL deployment replaces
# _decode_image wholesale).
# ---------------------------------------------------------------------------


def decode_bmp(data: bytes) -> dict:
    """Decode a 24-bit uncompressed BMP to the same dict shape as
    decode_png (pixels RGB row-major top-down)."""
    import hashlib

    if not data or not data.startswith(b"BM") or len(data) < 54:
        raise ValueError("not a BMP")
    (pixel_offset,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER BMP not supported")
    width, height = struct.unpack_from("<ii", data, 18)
    _planes, bpp = struct.unpack_from("<HH", data, 26)
    (comp,) = struct.unpack_from("<I", data, 30)
    if bpp != 24 or comp != 0:
        raise ValueError(f"BMP bpp={bpp} compression={comp} not supported (24-bit BI_RGB only)")
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height == 0:
        raise ValueError("bad BMP geometry")
    stride = width * 3
    pad = (4 - (stride % 4)) % 4
    if len(data) < pixel_offset + (stride + pad) * height:
        raise ValueError("BMP pixel data truncated")
    out = bytearray(stride * height)
    for i in range(height):
        src = pixel_offset + i * (stride + pad)
        row = data[src : src + stride]
        rgb = bytearray(stride)
        rgb[0::3] = row[2::3]
        rgb[1::3] = row[1::3]
        rgb[2::3] = row[0::3]
        y = i if top_down else height - 1 - i
        out[y * stride : (y + 1) * stride] = rgb
    mean = (sum(out) / len(out)) if out else 0.0
    return {
        "width": width,
        "height": height,
        "channels": 3,
        "pixels": bytes(out),
        "mean_pixel": round(mean / 255.0, 6),
        "pixel_sum": sum(out),
        "n_pix": len(out),
        "pixel_sha256": hashlib.sha256(bytes(out)).hexdigest(),
    }


def encode_bmp(width: int, height: int, pixels: bytes, channels: int = 3) -> bytes:
    """Minimal 24-bit bottom-up BI_RGB BMP writer; pixels are RGB
    row-major top-down (the decode_png/decode_bmp convention) —
    decode_bmp(encode_bmp(...)) round-trips."""
    if channels != 3:
        raise ValueError("BMP writer emits 24-bit RGB only")
    stride = width * 3
    if len(pixels) != stride * height:
        raise ValueError("pixel buffer does not match geometry")
    pad = b"\x00" * ((4 - (stride % 4)) % 4)
    rows = []
    for y in range(height - 1, -1, -1):
        row = pixels[y * stride : (y + 1) * stride]
        bgr = bytearray(stride)
        bgr[0::3] = row[2::3]
        bgr[1::3] = row[1::3]
        bgr[2::3] = row[0::3]
        rows.append(bytes(bgr) + pad)
    data = b"".join(rows)
    off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + dib + data


# ---------------------------------------------------------------------------
# WAV codec — RIFF/WAVE chunk walk, PCM 8/16-bit. The RIFF size field
# bounds the walk, so trailing garbage after the container is ignored
# (real-world WAVs are often padded or appended to).
# ---------------------------------------------------------------------------


def decode_wav(data: bytes) -> dict:
    """Decode a PCM WAV to sample statistics: channels, sample_rate, bit
    depth, frame count, duration, integer abs-sum/peak (exact twins a SQL
    oracle can re-derive), and a content hash of the raw PCM bytes."""
    import hashlib

    if not data or not data.startswith(b"RIFF") or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = min(len(data), 8 + riff_size)
    pos = 12
    fmt = pcm = None
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + ln]
        if len(body) < ln:
            raise ValueError("truncated WAV chunk")
        if tag == b"fmt ":
            fmt = body
        elif tag == b"data":
            pcm = body
        pos += 8 + ln + (ln & 1)  # chunks are 2-byte aligned
    if fmt is None or pcm is None or len(fmt) < 16:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, rate = struct.unpack_from("<HHI", fmt, 0)
    (bits,) = struct.unpack_from("<H", fmt, 14)
    if audio_format != 1 or bits not in (8, 16):
        raise ValueError(f"WAV format {audio_format}/{bits}-bit not supported (PCM 8/16 only)")
    if channels == 0 or rate == 0:
        raise ValueError("bad WAV geometry")
    frame_bytes = (bits // 8) * channels
    n_frames = len(pcm) // frame_bytes
    usable = pcm[: n_frames * frame_bytes]
    if bits == 8:  # 8-bit WAV is unsigned, centered at 128
        samples = [b - 128 for b in usable]
    else:
        samples = list(struct.unpack(f"<{n_frames * channels}h", usable))
    return {
        "channels": channels,
        "sample_rate": rate,
        "bits": bits,
        "n_frames": n_frames,
        "duration_ms": n_frames * 1000 // rate,
        "abs_sum": sum(abs(s) for s in samples),
        "peak": max((abs(s) for s in samples), default=0),
        "pcm_sha256": hashlib.sha256(usable).hexdigest(),
    }


def encode_wav(samples: bytes | list[int], rate: int, channels: int = 1, bits: int = 8) -> bytes:
    """Minimal PCM WAV writer (fixture side; decode_wav round-trips).
    8-bit takes raw unsigned bytes; 16-bit takes signed ints."""
    if bits == 8:
        pcm = bytes(samples)
    elif bits == 16:
        pcm = struct.pack(f"<{len(samples)}h", *samples)
    else:
        raise ValueError("PCM 8/16-bit only")
    block = (bits // 8) * channels
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm + (b"\x00" if len(pcm) & 1 else b"")
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ---------------------------------------------------------------------------
# MP4 probe — ISO BMFF box walk: ftyp brand, moov→mvhd (timescale,
# duration), moov→trak→tkhd (track dims). Metadata only — frame decode
# needs real codecs; frame_sample_plan below plans that work instead.
# ---------------------------------------------------------------------------


def probe_mp4(data: bytes) -> dict:
    """Container metadata from the box structure alone. Tolerates trailing
    garbage after the last well-formed top-level box."""

    def walk(buf: bytes, start: int, end: int):
        pos = start
        while pos + 8 <= end:
            (size,) = struct.unpack_from(">I", buf, pos)
            tag = buf[pos + 4 : pos + 8]
            hdr = 8
            if size == 1:
                if pos + 16 > end:
                    return
                (size,) = struct.unpack_from(">Q", buf, pos + 8)
                hdr = 16
            elif size == 0:
                size = end - pos
            if size < hdr or pos + size > end:
                return  # trailing garbage / truncated box: stop the walk
            yield tag, pos + hdr, pos + size
            pos += size

    if not data or len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF/MP4 file")
    out = {
        "brand": data[8:12].decode("latin-1"),
        "timescale": None,
        "duration_ms": None,
        "width": None,
        "height": None,
        "n_tracks": 0,
    }
    for tag, lo, hi in walk(data, 0, len(data)):
        if tag != b"moov":
            continue
        for t2, l2, h2 in walk(data, lo, hi):
            if t2 == b"mvhd" and h2 - l2 >= 20:
                ver = data[l2]
                if ver == 1:
                    ts, dur = struct.unpack_from(">IQ", data, l2 + 20)
                else:
                    ts, dur = struct.unpack_from(">II", data, l2 + 12)
                if ts:
                    out["timescale"] = ts
                    out["duration_ms"] = dur * 1000 // ts
            elif t2 == b"trak":
                out["n_tracks"] += 1
                for t3, l3, h3 in walk(data, l2, h2):
                    if t3 == b"tkhd" and h3 - l3 >= 84:
                        ver = data[l3]
                        off = l3 + (96 if ver == 1 else 84) - 8
                        w, h = struct.unpack_from(">II", data, off)
                        if w and h and out["width"] is None:
                            out["width"], out["height"] = w >> 16, h >> 16
    if out["timescale"] is None:
        raise ValueError("MP4 missing mvhd")
    return out


def encode_mp4_stub(width: int, height: int, duration_ticks: int, timescale: int = 600) -> bytes:
    """Minimal ftyp+moov(mvhd+trak(tkhd)) container for fixtures — no
    media data, but a structurally real box tree probe_mp4 parses."""

    def box(tag: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + tag + body

    ftyp = box(b"ftyp", b"mp42\x00\x00\x00\x00mp42isom")
    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00"  # version 0 + flags
        + struct.pack(">II", 0, 0)  # ctime/mtime
        + struct.pack(">II", timescale, duration_ticks)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)  # rate, volume, reserved
        + b"\x00" * 8 + b"\x00" * 36 + b"\x00" * 24 + struct.pack(">I", 2),
    )
    tkhd = box(
        b"tkhd",
        b"\x00\x00\x00\x07"  # version 0 + enabled flags
        + struct.pack(">IIII", 0, 0, 1, 0)  # ctime/mtime/track_id/reserved
        + struct.pack(">I", duration_ticks)
        + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0)
        + b"\x00" * 36
        + struct.pack(">II", width << 16, height << 16),
    )
    return ftyp + box(b"moov", mvhd + box(b"trak", tkhd))


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("bits", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("duration_ms", LongType()),
        StructField("abs_sum", LongType()),
        StructField("peak", IntegerType()),
        StructField("pcm_sha256", StringType()),
    ]
)


def decode_audio_features(media: DataFrame, batch_bytes: int = 64 << 20) -> DataFrame:
    """Real PCM decode pass over WAV rows (stdlib struct — no soundfile):
    same byte-budget mapInPandas shape as the image pass; non-WAV and
    undecodable rows surface NULL features rather than failing the batch."""

    def _feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in AUDIO_FEATURES_SCHEMA.fields}
            cols = ("channels", "sample_rate", "bits", "n_frames",
                    "duration_ms", "abs_sum", "peak", "pcm_sha256")
            acc = 0
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                row = [None] * len(cols)
                if blob is not None and bytes(blob[:4]) == b"RIFF":
                    try:
                        d = decode_wav(bytes(blob))
                        row = [d[k] for k in cols]
                    except ValueError:
                        pass  # undecodable -> NULL features
                out["media_id"].append(mid)
                for k, v in zip(cols, row):
                    out[k].append(v)
                acc += len(blob) if blob is not None else 0
                if acc >= batch_bytes:
                    yield pd.DataFrame(out)
                    out = {f.name: [] for f in AUDIO_FEATURES_SCHEMA.fields}
                    acc = 0
            if out["media_id"]:
                yield pd.DataFrame(out)

    return media.mapInPandas(_feats, AUDIO_FEATURES_SCHEMA)


def _try_decode_pixels(data: bytes) -> dict | None:
    """Real pixel decode where a stdlib codec exists (PNG, 24-bit BMP,
    GIF, baseline JPEG); None for other formats or undecodable bytes."""
    try:
        if data.startswith(_PNG_SIG):
            return decode_png(data)
        if data.startswith(b"BM"):
            return decode_bmp(data)
        if data.startswith((b"GIF87a", b"GIF89a")):
            return decode_gif(data)
        if data.startswith(b"\xff\xd8"):
            from crawler_ai_spark.pipeline.jpegcodec import decode_jpeg

            return decode_jpeg(data)
    except ValueError:
        return None
    return None


def _decode_image(data: bytes, fake: bool = False):
    """Pixel decode. PNG, 24-bit BMP, GIF and baseline-sequential JPEG
    decode FOR REAL via the stdlib codecs (no PIL needed — full LZW for
    GIF, full Huffman+IDCT for JPEG in pipeline/jpegcodec.py). For the
    formats with no codec here (WebP/TIFF/AVIF, progressive JPEG),
    ``fake=True`` returns a deterministic stand-in (dimensions from the
    header, mean 'pixel' = byte mean) so downstream plumbing — feature
    vectors, resize bookkeeping, batch shapes — is exercised for real.
    A deployment with PIL replaces only this function."""
    if data and data.startswith(_PNG_SIG):
        d = decode_png(data)
    elif data and data.startswith(b"BM") and not fake:
        d = decode_bmp(data)  # malformed BMP = data error, raises ValueError
    elif data and data.startswith((b"GIF87a", b"GIF89a")) and not fake:
        d = decode_gif(data)
    elif data and data.startswith(b"\xff\xd8") and not fake:
        from crawler_ai_spark.pipeline.jpegcodec import decode_jpeg

        d = decode_jpeg(data)  # progressive/arithmetic raise ValueError
    else:
        d = None
    if d is not None:
        return {
            "width": d["width"],
            "height": d["height"],
            "mean_pixel": d["mean_pixel"],
            "channels": d["channels"],
            "pixel_sha256": d["pixel_sha256"],
        }
    if not fake:
        raise NotImplementedError(
            "pixel decode for non-PNG/BMP/GIF/JPEG formats requires an "
            "image codec (PIL/libvips) — not in this sandbox; pass "
            "fake=True for the deterministic stand-in"
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
    """Real pixel-decode pass over PNG and 24-bit-BMP rows (stdlib codecs
    — no PIL): mapInPandas with the same byte-budget re-chunking as the
    metadata pass; other formats and undecodable rows surface NULL
    features rather than failing the batch (a corrupt image must not kill
    a 100 TB job)."""

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
                    if blob is not None:
                        d = _try_decode_pixels(bytes(blob))
                        if d is not None:
                            row = [d[k] for k in cols]
                    out["media_id"].append(mid)
                    for k, v in zip(cols, row):
                        out[k].append(v)
                yield pd.DataFrame(out)

    return media.mapInPandas(_feats, IMAGE_FEATURES_SCHEMA)


def nearest_resize(pixels: bytes, sw: int, sh: int, channels: int, dw: int, dh: int) -> bytes:
    """Nearest-neighbor resample (the thumbnail/normalize step a training
    pipeline runs before feature extraction): dst (x,y) samples src
    (floor(x·sw/dw), floor(y·sh/dh))."""
    if dw <= 0 or dh <= 0:
        raise ValueError("bad target geometry")
    out = bytearray(dw * dh * channels)
    for y in range(dh):
        sy = y * sh // dh
        src_row = sy * sw * channels
        dst_row = y * dw * channels
        for x in range(dw):
            sx = x * sw // dw
            s = src_row + sx * channels
            d = dst_row + x * channels
            out[d : d + channels] = pixels[s : s + channels]
    return bytes(out)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("src_width", IntegerType()),
        StructField("src_height", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("content", BinaryType()),
        StructField("pixel_sum", LongType()),
        StructField("n_pix", LongType()),
    ]
)


def resize_images(media: DataFrame, dst_w: int, dst_h: int,
                  batch_bytes: int = 64 << 20) -> DataFrame:
    """Real image RESIZE pass: decode (PNG/BMP/GIF, stdlib codecs) →
    nearest-neighbor resample to (dst_w, dst_h) → re-encode as PNG, with
    exact integer pixel sums for oracle-grade verification. Gray stays
    1-channel; palette/GIF expand to RGB; RGBA keeps alpha. Undecodable
    rows surface NULL content rather than failing the batch. Same
    byte-budget Arrow framing as the other media passes."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in RESIZED_SCHEMA.fields}
            acc = 0
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                vals = [None] * (len(RESIZED_SCHEMA.fields) - 1)
                if blob is not None:
                    d = _try_decode_pixels(bytes(blob))
                    if d is not None:
                        px = nearest_resize(
                            d["pixels"], d["width"], d["height"],
                            d["channels"], dst_w, dst_h,
                        )
                        # gray+alpha (2ch) has no PNG writer form here:
                        # stats still emit, content stays NULL
                        enc = (
                            encode_png(dst_w, dst_h, px, channels=d["channels"])
                            if d["channels"] in (1, 3, 4)
                            else None
                        )
                        vals = [
                            d["width"], d["height"], dst_w, dst_h, d["channels"],
                            enc, sum(px), len(px),
                        ]
                out["media_id"].append(mid)
                for f, v in zip([f.name for f in RESIZED_SCHEMA.fields][1:], vals):
                    out[f].append(v)
                acc += len(blob) if blob is not None else 0
                if acc >= batch_bytes:
                    yield pd.DataFrame(out)
                    out = {f.name: [] for f in RESIZED_SCHEMA.fields}
                    acc = 0
            if out["media_id"]:
                yield pd.DataFrame(out)

    return media.mapInPandas(_resize, RESIZED_SCHEMA)


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
    rows (i%5==0), GIF rows (i%5==1) and BMP rows (i%5==2) are REAL
    decodable images (stdlib encoders, deterministic gradients) so every
    pixel-decode path is exercised on true bytes; audio/video rows carry
    valid headers + noise bodies."""
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
            palette = bytes(
                v for j in range(8) for v in (j * 31 % 256, (j * 57 + i) % 256, j * 13 % 256)
            )
            idx = bytes(((x * 3 + y * 7 + i) % 8) for y in range(h) for x in range(w))
            body = encode_gif(w, h, idx, palette)
        elif i % 5 == 2:
            w, h = 32 + i % 16, 24 + i % 16
            px = bytes(
                ((x * 7 + y * 13 + c * 29 + i) % 256)
                for y in range(h)
                for x in range(w)
                for c in range(3)
            )
            body = encode_bmp(w, h, px, channels=3)
        elif i % 5 == 3:
            n = 160 + i * 5
            body = encode_wav(
                bytes(((j * 7 + i) % 256) for j in range(n)), rate=8000, channels=1, bits=8
            )
        else:
            body = encode_mp4_stub(
                320 + i % 64, 180 + i % 36, duration_ticks=600 + i * 30, timescale=600
            )
        body += bytes(rng.randrange(256) for _ in range(rng.randrange(64, 256)))
        rows.append((i, kind, body, None, len(body)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


DHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("dhash_bits", StringType()),
    ]
)


def image_dhash(media: DataFrame, dw: int = 9, dh: int = 8,
                batch_bytes: int = 64 << 20) -> DataFrame:
    """Perceptual difference-hash (dHash, the published gradient hash):
    decode → integer grayscale ((r+g+b)//3; alpha ignored; gray channels
    pass through) → nearest-resize to dw×dh → one bit per horizontal
    neighbor pair (left > right), row-major — (dw-1)·dh bits as a bit
    string (64 at the 9×8 default). Exact-match grouping or
    hamming-banded joins over the hash find visual near-dups without
    touching pixels again — the image-side twin of SimHash dedup.
    Undecodable rows surface NULL bits. Same byte-budget Arrow framing
    as the other media passes."""

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {f.name: [] for f in DHASH_SCHEMA.fields}
            acc = 0
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                w = h = bits = None
                if blob is not None:
                    d = _try_decode_pixels(bytes(blob))
                    if d is not None:
                        w, h, ch, px = d["width"], d["height"], d["channels"], d["pixels"]
                        if ch == 1:
                            gray = px
                        elif ch == 2:  # gray+alpha
                            gray = bytes(px[i] for i in range(0, len(px), 2))
                        else:  # rgb / rgba: integer mean of the color channels
                            gray = bytes(
                                (px[i] + px[i + 1] + px[i + 2]) // 3
                                for i in range(0, len(px), ch)
                            )
                        g = nearest_resize(gray, w, h, 1, dw, dh)
                        bits = "".join(
                            "1" if g[y * dw + x] > g[y * dw + x + 1] else "0"
                            for y in range(dh)
                            for x in range(dw - 1)
                        )
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["dhash_bits"].append(bits)
                acc += len(blob) if blob is not None else 0
                if acc >= batch_bytes:
                    yield pd.DataFrame(out)
                    out = {f.name: [] for f in DHASH_SCHEMA.fields}
                    acc = 0
            if out["media_id"]:
                yield pd.DataFrame(out)

    return media.mapInPandas(_hash, DHASH_SCHEMA)
