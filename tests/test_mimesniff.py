"""MIME sniffer edge cases beyond the catalog row's class sweep."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_ai_spark.functions import mimesniff as MS


def _sniff(spark, bodies):
    df = spark.createDataFrame([(b,) for b in bodies], ["body"])
    m = MS.sniff_mime(F.col("body"))
    return [
        (r.mime, r.route)
        for r in df.select(m.alias("mime"), MS.route_for(m).alias("route")).collect()
    ]


def test_ftyp_in_text_is_not_video(spark):
    """'ftyp' at byte offset 4 alone must not sniff as MP4 — the box-size
    check (first 4 bytes a plausible big-endian length) rejects text."""
    out = _sniff(
        spark,
        [
            "2024ftyp annual report for shareholders",  # text, not video
            "\x00\x00\x00\x18ftypisomdata",             # a real ftyp box
            None,                                        # failed fetch
        ],
    )
    assert out[0] == ("text/plain", "text")
    assert out[1] == ("video/mp4", "video")
    assert out[2] == (None, "none")
