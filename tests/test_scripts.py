"""Unicode script detection (pipeline/textstats.py: script_columns).
Cross-engine regex-dialect identity (Java \\p{script=X} vs RE2 \\p{X})
is pinned by the catalog's doc_script_detect oracle row."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_ai_spark.pipeline.textstats import script_columns


def _run(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    cols = script_columns(F.col("t"))
    return df.select(
        "t", *[cols[k].alias(k) for k in sorted(cols)]
    ).collect()


def test_pure_scripts(spark):
    rows = {r.t: r for r in _run(spark, ["hello world", "привет мир", "你好世界"])}
    assert rows["hello world"].dominant_script == "latin"
    assert rows["hello world"].script_latin == 1.0
    assert rows["привет мир"].dominant_script == "cyrillic"
    assert rows["你好世界"].dominant_script == "han"
    assert rows["你好世界"].script_han == 1.0


def test_mixed_ratios(spark):
    # 5 latin + 5 cyrillic non-space chars
    (r,) = _run(spark, ["abcde привет"[:12]])
    assert r.script_chars == 11
    assert r.script_latin == pytest.approx(5 / 11)
    assert r.script_cyrillic == pytest.approx(6 / 11)
    assert r.dominant_script == "cyrillic"


def test_empty_and_digits(spark):
    rows = _run(spark, ["", "   ", "12345 !!!"])
    for r in rows[:2]:
        assert r.script_chars == 0 and r.dominant_script == "none"
    # digits/punct are no script: counted chars but no dominant script
    assert rows[2].script_chars == 8 and rows[2].dominant_script == "none"


def test_japanese_scripts_distinguished(spark):
    (hira,) = _run(spark, ["こんにちは"])
    (kata,) = _run(spark, ["コンニチハ"])
    assert hira.dominant_script == "hiragana"
    assert kata.dominant_script == "katakana"
