"""Baseline-sequential JPEG codec, stdlib + numpy only (public ITU T.81
spec) — closes the last media stub: rounds 1-3 shipped real PNG/BMP/GIF/
WAV/MP4 codecs but JPEG pixel decode raised NotImplementedError because
the sandbox has no PIL/libvips. This module implements the baseline DCT
sequential process for real:

- marker parse: SOI / APPn / COM / DQT (8- and 16-bit tables) / SOF0 /
  DHT / DRI / SOS / RSTn / EOI; progressive (SOF2) and arithmetic coding
  are rejected with ValueError (the documented bound of a *baseline*
  decoder — the overwhelming majority of web JPEGs are baseline).
- entropy decode: canonical Huffman (tables read from the stream's DHT,
  never assumed), byte-stuffing (FF 00) removal, restart-interval DC
  predictor resets.
- block pipeline: dequantize → de-zigzag → 8x8 IDCT (numpy matrix form
  of the type-III DCT) → +128 level shift → clamp.
- chroma upsampling for 4:4:4 / 4:2:2 / 4:2:0 (nearest, per sampling
  factors) and JFIF YCbCr → RGB.

The companion `encode_jpeg` writes a valid baseline 4:4:4 stream with
the T.81 Annex K example Huffman tables and an all-ones quantization
table — the fixture side of the codec: quant=1 keeps the DCT round-trip
error to coefficient rounding only, so decode(encode(img)) is within ±2
of the source per sample and byte-for-byte DETERMINISTIC (the property
the multimodal oracles need; a generic-quality encoder would be lossy in
content-dependent ways no SQL oracle could predict).

Reference behavior being reproduced: the crawler treats image bytes as
opaque payloads with typed metadata (SURVEY.md multimodal lane);
decoding exists so feature extraction (mean pixel, pixel hash, resize)
operates on true pixels rather than header-derived stand-ins.
"""

from __future__ import annotations

import struct

import numpy as np

# zig-zag scan order: ZIGZAG[i] = raster index of the i-th scanned coeff
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# T.81 Annex K.3 example Huffman tables (luminance) — used by the
# ENCODER only; the decoder always builds tables from the stream's DHT.
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
assert sum(_AC_BITS) == len(_AC_VALS) == 162


def _dct_matrix() -> np.ndarray:
    """8x8 type-II DCT basis C: forward = C @ block @ C.T, inverse =
    C.T @ coeffs @ C (C is orthonormal)."""
    C = np.zeros((8, 8))
    for u in range(8):
        cu = np.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            C[u, x] = cu * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return C


_C = _dct_matrix()


# ---------------------------------------------------------------------------
# Huffman
# ---------------------------------------------------------------------------


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length), canonical JPEG assignment (T.81 C.2)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffTable:
    """Decode-side table: (length, code) → symbol."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first reader over entropy-coded data with FF00 unstuffing;
    restart markers are consumed explicitly via expect_rst()."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bit = 0  # bits consumed of current byte

    def _current(self) -> int:
        d, p = self.data, self.pos
        if p >= len(d):
            raise ValueError("JPEG entropy data truncated")
        b = d[p]
        if b == 0xFF:
            nxt = d[p + 1] if p + 1 < len(d) else None
            if nxt != 0x00:
                # a real marker inside entropy data — padding 1-bits end
                # the scan here; treat as truncation-safe EOB territory
                raise ValueError("unexpected marker in entropy data")
        return b

    def read_bit(self) -> int:
        b = self._current()
        v = (b >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
            if b == 0xFF:
                self.pos += 1  # skip the stuffed 00
        return v

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: _HuffTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")

    def byte_align(self) -> None:
        if self.bit:
            self.bit = 0
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF and self.pos < len(self.data) and self.data[self.pos] == 0x00:
                self.pos += 1

    def expect_rst(self, n: int) -> None:
        self.byte_align()
        if (
            self.pos + 1 >= len(self.data)
            or self.data[self.pos] != 0xFF
            or self.data[self.pos + 1] != 0xD0 + (n & 7)
        ):
            raise ValueError("missing JPEG restart marker")
        self.pos += 2


def _extend(v: int, t: int) -> int:
    """DIFF/AC magnitude decode (T.81 F.2.2.1): t-bit value v to signed."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg(data: bytes) -> dict:
    """Decode a baseline-sequential JPEG. Returns the same shape as
    decode_png: {width, height, channels, pixels (row-major interleaved
    RGB or grayscale), mean_pixel, pixel_sum, n_pix, pixel_sha256}."""
    import hashlib

    if not data or not data.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG")
    qt: dict[int, np.ndarray] = {}
    dc_tables: dict[int, _HuffTable] = {}
    ac_tables: dict[int, _HuffTable] = {}
    frame = None  # (precision, height, width, comps)
    restart_interval = 0
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            continue  # parameterless
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(body[i : i + 64], dtype=np.uint8).astype(np.int32)
                    i += 64
                else:
                    tbl = np.frombuffer(body[i : i + 128], dtype=">u2").astype(np.int32)
                    i += 128
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(body[i + 17 : i + 17 + nv])
                (dc_tables if tc == 0 else ac_tables)[th] = _HuffTable(bits, vals)
                i += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            precision, h, w, nc = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if precision != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG (progressive/arithmetic) not supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                comp = next(x for x in frame[2] if x["id"] == cs)
                scan.append((comp, tt >> 4, tt & 0x0F))
            pixels = _decode_scan(
                data, pos + seglen, frame, scan, qt, dc_tables, ac_tables,
                restart_interval,
            )
            h, w, comps = frame
            channels = 3 if len(comps) == 3 else 1
            flat = pixels.tobytes()
            total = int(pixels.astype(np.int64).sum())
            n_pix = pixels.size
            return {
                "width": w,
                "height": h,
                "channels": channels,
                "pixels": flat,
                "mean_pixel": round(total / n_pix / 255.0, 6) if n_pix else 0.0,
                "pixel_sum": total,
                "n_pix": n_pix,
                "pixel_sha256": hashlib.sha256(flat).hexdigest(),
            }
        pos += seglen
    raise ValueError("JPEG has no scan")


def _decode_scan(data, pos, frame, scan, qt, dc_tables, ac_tables, restart_interval):
    h, w, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        for c in comps
    }
    reader = _BitReader(data, pos)
    pred = {c["id"]: 0 for c in comps}
    rst_n = 0
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.expect_rst(rst_n)
                rst_n = (rst_n + 1) & 7
                pred = {c["id"]: 0 for c in comps}
            for comp, td, ta in scan:
                cid = comp["id"]
                q = qt[comp["tq"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        block = _decode_block(
                            reader, dc_tables[td], ac_tables[ta], q, pred, cid
                        )
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1
    # upsample each component to full resolution (nearest), crop, stack
    out = []
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out.append(p[:h, :w])
    if len(comps) == 3:
        y, cb, cr = out
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.stack([r, g, b], axis=-1)
        return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return np.clip(np.round(out[0]), 0, 255).astype(np.uint8)


def _decode_block(reader, dc_tbl, ac_tbl, q, pred, cid) -> np.ndarray:
    coeffs = np.zeros(64, dtype=np.float64)
    t = reader.decode_symbol(dc_tbl)
    diff = _extend(reader.read_bits(t), t)
    pred[cid] += diff
    coeffs[0] = pred[cid] * q[0]
    k = 1
    while k < 64:
        rs = reader.decode_symbol(ac_tbl)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC coefficient index out of range")
        coeffs[ZIGZAG[k]] = _extend(reader.read_bits(s), s) * q[k]
        k += 1
    # coeffs were written de-zigzagged (ZIGZAG[k] raster index) while the
    # q[k] factors use zigzag position — the stream's quant table is in
    # zigzag order, matching k; reshape(8,8) is raster.
    block = _C.T @ coeffs.reshape(8, 8) @ _C  # type-III (inverse) DCT
    return block + 128.0


# ---------------------------------------------------------------------------
# encoder (fixture side): baseline 4:4:4, quant = all ones
# ---------------------------------------------------------------------------


class _BitWriter:
    """MSB-first accumulator → FF-stuffed entropy bytes."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def put(self, code: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (code & ((1 << nbits) - 1))
        self.nacc += nbits
        while self.nacc >= 8:
            byte = (self.acc >> (self.nacc - 8)) & 0xFF
            self.nacc -= 8
            self.acc &= (1 << self.nacc) - 1
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)

    def align(self) -> None:
        if self.nacc:
            pad = 8 - self.nacc
            byte = ((self.acc << pad) | ((1 << pad) - 1)) & 0xFF
            self.acc = 0
            self.nacc = 0
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)

    def marker(self, m: int) -> None:
        self.align()
        self.out += bytes([0xFF, m])


def _encode_block(w: _BitWriter, plane, y0, x0, pred, ci, dc_codes, ac_codes):
    block = plane[y0 : y0 + 8, x0 : x0 + 8] - 128.0
    zz = np.round((_C @ block @ _C.T).reshape(64)[ZIGZAG]).astype(np.int64)

    def magnitude(v: int) -> tuple[int, int]:
        t = int(v).bit_length() if v > 0 else int(-v).bit_length()
        if v < 0:
            v = v + (1 << t) - 1
        return t, v

    diff = int(zz[0]) - pred[ci]
    pred[ci] = int(zz[0])
    t, v = magnitude(diff) if diff else (0, 0)
    code, ln = dc_codes[t]
    w.put(code, ln)
    if t:
        w.put(v, t)
    run = 0
    last_nz = int(np.nonzero(zz[1:])[0][-1]) + 1 if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            w.put(code, ln)
            run -= 16
        t, v = magnitude(int(zz[k]))
        code, ln = ac_codes[(run << 4) | t]
        w.put(code, ln)
        w.put(v, t)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        w.put(code, ln)


def encode_jpeg(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 3,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Write a valid baseline-sequential JPEG (all-ones quant, Annex K
    luminance Huffman tables for every component). Quant=1 bounds the
    round-trip error to DCT coefficient rounding (±2/sample for 4:4:4)
    and makes encode→decode fully deterministic — the fixture property.

    ``subsample=True`` emits 4:2:0 (luma 2x2 per MCU, chroma 2x2-box-
    averaged) and ``restart_interval`` emits DRI + RSTn markers — both
    exist to drive the decoder's general MCU/restart paths in tests."""
    arr = (
        np.frombuffer(pixels, dtype=np.uint8)
        .reshape(height, width, channels)
        .astype(np.float64)
    )
    if channels == 3:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    elif channels == 1:
        planes = [arr[..., 0]]
    else:
        raise ValueError("encode_jpeg supports 1 or 3 channels")
    if subsample and channels != 3:
        raise ValueError("4:2:0 subsampling needs 3 channels")

    # per-component sampling factors (h, v)
    samp = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * len(planes)
    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcux = (width + mcu_w - 1) // mcu_w
    mcuy = (height + mcu_h - 1) // mcu_h

    def pad_to(p: np.ndarray, th: int, tw: int) -> np.ndarray:
        p2 = np.empty((th, tw))
        ph, pw = p.shape
        p2[:ph, :pw] = p
        p2[ph:, :pw] = p[-1:, :]
        p2[:, pw:] = p2[:, pw - 1 : pw]
        return p2

    comp_planes = []
    for p, (h, v) in zip(planes, samp):
        if (h, v) == (hmax, vmax):
            comp_planes.append(pad_to(p, mcuy * v * 8, mcux * h * 8))
        else:
            ry, rx = vmax // v, hmax // h
            full = pad_to(p, mcuy * vmax * 8, mcux * hmax * 8)
            sub = full.reshape(full.shape[0] // ry, ry, full.shape[1] // rx, rx)
            comp_planes.append(np.round(sub.mean(axis=(1, 3))))

    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)
    w = _BitWriter()
    pred = [0] * len(planes)
    rst_n = 0
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                w.marker(0xD0 + (rst_n & 7))
                rst_n += 1
                pred = [0] * len(planes)
            for ci, (p, (h, v)) in enumerate(zip(comp_planes, samp)):
                for by in range(v):
                    for bx in range(h):
                        _encode_block(
                            w, p, (my * v + by) * 8, (mx * h + bx) * 8,
                            pred, ci, dc_codes, ac_codes,
                        )
            mcu_count += 1
    w.align()
    entropy = w.out

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    nc = len(planes)
    head = bytearray(b"\xff\xd8")
    head += seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    if restart_interval:
        head += seg(0xDD, struct.pack(">H", restart_interval))
    sof_body = bytes([8]) + struct.pack(">HH", height, width) + bytes([nc])
    for ci in range(nc):
        h, v = samp[ci]
        sof_body += bytes([ci + 1, (h << 4) | v, 0])
    head += seg(0xC0, sof_body)
    head += seg(
        0xC4,
        bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
        + bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS),
    )
    sos_body = bytes([nc])
    for ci in range(nc):
        sos_body += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
    sos_body += bytes([0, 63, 0])
    head += seg(0xDA, sos_body)
    return bytes(head) + bytes(entropy) + b"\xff\xd9"
