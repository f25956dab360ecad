"""Perceptual dHash (pipeline/multimodal.image_dhash)."""

from crawler_ai_spark.pipeline.multimodal import (
    encode_bmp,
    encode_png,
    image_dhash,
)


def _gradient(w, h, off=0):
    return bytes(
        (x * 7 + y * 13 + c * 29 + off) % 256
        for y in range(h) for x in range(w) for c in range(3)
    )


def _hashes(spark, blobs):
    df = spark.createDataFrame(list(enumerate(blobs)), "media_id long, content binary")
    return {r.media_id: r.dhash_bits for r in image_dhash(df).collect()}


def test_same_image_same_hash_across_codecs(spark):
    px = _gradient(16, 12)
    got = _hashes(spark, [encode_png(16, 12, px, 3), encode_bmp(16, 12, px, 3)])
    assert got[0] == got[1]
    assert len(got[0]) == 64 and set(got[0]) <= {"0", "1"}


def test_perturbation_is_near_not_equal(spark):
    base = bytearray(_gradient(18, 16))
    mut = bytearray(base)
    # alternate-column blowout on the top row: flips left>right comparisons
    # there (a uniform brightening would NOT — dHash is gradient-based)
    for x in range(0, 18, 4):
        for c in range(3):
            mut[x * 3 + c] = 255
    got = _hashes(spark, [encode_png(18, 16, bytes(base), 3),
                          encode_png(18, 16, bytes(mut), 3)])
    ham = sum(a != b for a, b in zip(got[0], got[1]))
    assert 0 < ham <= 16  # near-dup distance, not identical, not random


def test_grayscale_and_undecodable(spark):
    gray = bytes((x * 11 + y * 3) % 256 for y in range(8) for x in range(8))
    got = _hashes(spark, [encode_png(8, 8, gray, 1), b"not an image"])
    assert len(got[0]) == 64
    assert got[1] is None
