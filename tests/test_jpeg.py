"""pipeline/jpegcodec.py — the baseline-sequential JPEG codec (ITU T.81)
that closed the repo's last media stub. The encoder (all-ones quant) is
the fixture side: encode→decode must round-trip within coefficient-
rounding error and be byte-deterministic; the decoder must handle
stream-supplied Huffman tables, restart intervals, grayscale, and
4:2:0 subsampling, and reject progressive streams with a data error."""

from __future__ import annotations

import numpy as np
import pytest

from crawler_ai_spark.pipeline.jpegcodec import decode_jpeg, encode_jpeg


def _gradient(h, w, channels=3):
    img = np.zeros((h, w, channels), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            for c in range(channels):
                img[y, x, c] = (x * (7 + 2 * c) + y * (13 - 3 * c)) % 256
    return img


def _roundtrip(img, **kw):
    h, w, c = img.shape
    data = encode_jpeg(w, h, img.tobytes(), c, **kw)
    d = decode_jpeg(data)
    assert (d["width"], d["height"], d["channels"]) == (w, h, 3 if c == 3 else 1)
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(h, w, -1).astype(int)
    return data, d, np.abs(got.reshape(img.shape) - img.astype(int))


def test_444_roundtrip_within_rounding():
    img = _gradient(37, 29)
    _, _, err = _roundtrip(img)
    # quant=1: the only loss is DCT coefficient rounding
    assert err.max() <= 2


def test_grayscale_roundtrip_exact_on_smooth():
    img = _gradient(24, 17, channels=1)
    _, _, err = _roundtrip(img)
    assert err.max() <= 2


def test_restart_intervals():
    img = _gradient(40, 33)
    plain, d0, _ = _roundtrip(img)
    rst, d1, err = _roundtrip(img, restart_interval=2)
    assert err.max() <= 2
    # restart markers change the byte stream but not the pixels
    assert len(rst) > len(plain)
    assert d0["pixel_sha256"] == d1["pixel_sha256"]


def test_420_subsampling_exact_on_constant_chroma():
    h, w = 37, 29
    img = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            lum = (x * 4 + y * 2) % 200 + 20
            img[y, x] = [lum, lum, lum]  # gray ⇒ chroma constant 128
    _, _, err = _roundtrip(img, subsample=True, restart_interval=4)
    assert err.max() == 0  # chroma averaging is lossless on constants
    blocky = np.zeros((40, 32, 3), dtype=np.uint8)
    colors = [(200, 40, 40), (40, 200, 40), (40, 40, 200), (180, 180, 60)]
    for y in range(40):
        for x in range(32):
            blocky[y, x] = colors[((y // 4) + (x // 4)) % 4]
    _, _, err = _roundtrip(blocky, subsample=True)
    assert err.max() <= 2  # 2x2-aligned colors survive the box average


def test_decode_is_deterministic():
    img = _gradient(19, 23)
    data = encode_jpeg(23, 19, img.tobytes(), 3)
    a, b = decode_jpeg(data), decode_jpeg(data)
    assert a["pixel_sha256"] == b["pixel_sha256"]
    assert a["pixel_sum"] == b["pixel_sum"] and a["n_pix"] == 19 * 23 * 3


def test_trailing_garbage_tolerated():
    """synth media bodies carry random trailing bytes after the container
    (pipeline/multimodal.py synth_media) — decode must not read past the
    scan it returns from."""
    img = _gradient(16, 16)
    data = encode_jpeg(16, 16, img.tobytes(), 3) + b"\x13\x37" * 40
    assert decode_jpeg(data)["n_pix"] == 16 * 16 * 3


def test_progressive_rejected_as_data_error():
    img = _gradient(16, 16)
    data = bytearray(encode_jpeg(16, 16, img.tobytes(), 3))
    i = bytes(data).find(b"\xff\xc0")
    data[i + 1] = 0xC2  # SOF0 → SOF2 (progressive)
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(bytes(data))


def test_not_a_jpeg():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError):
        decode_jpeg(b"")


def test_roundtrip_property_random_images():
    """Property sweep: arbitrary sizes (incl. 1xN edge strips), random
    noise content (the adversarial case for DCT rounding), all variants.
    With quant=1 the per-sample error is bounded by coefficient rounding
    alone (~0.5/coeff through the IDCT, measured <=2 over thousands of
    random images; 4 is the asserted safety bound). 4:2:0 on noise is
    inherently lossy beyond any fixed bound (out-of-gamut chroma
    reconstruction clamps per-channel, shifting even luma), so the
    subsampled variant asserts geometry + determinism here and its
    accuracy is pinned by the smooth/blocky-chroma tests above."""
    rng = np.random.default_rng(7)
    for _ in range(40):
        h, w = int(rng.integers(1, 28)), int(rng.integers(1, 28))
        ch = int(rng.choice([1, 3]))
        img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
        rst = int(rng.integers(0, 3))
        data = encode_jpeg(w, h, img.tobytes(), ch, restart_interval=rst)
        d = decode_jpeg(data)
        assert (d["width"], d["height"]) == (w, h)
        got = np.frombuffer(d["pixels"], dtype=np.uint8).astype(int)
        assert np.abs(got - img.reshape(-1).astype(int)).max() <= 4, (h, w, ch, rst)
        if ch == 3:
            blob = encode_jpeg(w, h, img.tobytes(), ch, subsample=True)
            sub = decode_jpeg(blob)
            assert (sub["width"], sub["height"]) == (w, h)
            assert sub["pixel_sha256"] == decode_jpeg(blob)["pixel_sha256"]
