"""functions/charset.py semantics over REAL bytes through the
BinaryType entry point (the catalog oracle pins the latin-1-view parity;
this pins that actual fetch-stage bytes — BOMs, multibyte UTF-8,
broken encodings — land on the right label)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StringType, StructField, StructType

from crawler_ai_spark.functions import charset as CS

SCHEMA = StructType(
    [StructField("body", BinaryType()), StructField("ct", StringType())]
)

CASES = [
    # (body bytes, content-type, expected label)
    (b"\xef\xbb\xbf<html>x", "text/html; charset=windows-1252", "utf-8"),  # BOM wins
    ("résumé café".encode("utf-8"), None, "utf-8"),  # grammar heuristic
    ("résumé".encode("latin-1"), None, "windows-1252"),  # invalid utf-8
    (b"plain ascii only", "text/html; charset=Shift_JIS", "shift_jis"),
    (b"x", "text/html; charset=LATIN1", "iso-8859-1"),  # alias canon
    (b'<head><meta charset="EUC-KR"></head>', "text/html", "euc-kr"),
    (b"\xff\xfeh\x00i\x00", None, "utf-16le"),
    (b"\xfe\xff\x00h\x00i", None, "utf-16be"),
    (b"", None, "utf-8"),  # empty body is vacuously well-formed UTF-8
    # meta present but header also present: header outranks meta
    (b'<meta charset="koi8-r">', "text/html; charset=utf8", "utf-8"),
]


def test_sniff_charset_bytes(spark):
    df = spark.createDataFrame([(b, ct) for b, ct, _ in CASES], SCHEMA)
    out = [
        r.charset
        for r in df.select(
            CS.sniff_charset_bytes(F.col("body"), F.col("ct")).alias("charset")
        ).collect()
    ]
    assert out == [exp for _, _, exp in CASES]


def test_utf8_grammar_rejects_overlongs_and_surrogates(spark):
    bad = [
        b"\xc0\xaf",  # overlong '/'
        b"\xed\xa0\x80",  # UTF-16 surrogate half
        b"\xf5\x80\x80\x80",  # > U+10FFFF
        b"\x80",  # bare continuation
        b"\xc2",  # truncated sequence
    ]
    df = spark.createDataFrame([(b, None) for b in bad], SCHEMA)
    out = {
        r.charset
        for r in df.select(
            CS.sniff_charset_bytes(F.col("body"), F.col("ct")).alias("charset")
        ).collect()
    }
    assert out == {"windows-1252"}
