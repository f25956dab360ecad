"""Luhn-gated card scrubbing (functions/pii.py): checksum math against
known test PANs, no over-redaction of non-validating digit runs, and
the check-digit synthesizer. Cross-engine identity is pinned by the
catalog's doc_card_scrub oracle row."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_ai_spark.functions.pii import (
    luhn_check_digit,
    luhn_valid,
    scrub_card_numbers,
)


def _eval(spark, rows):
    df = spark.createDataFrame([(r,) for r in rows], "s string")
    return [r.v for r in df.select(luhn_valid(F.col("s")).alias("v")).collect()]


def test_known_pans(spark):
    # canonical industry test numbers: all Luhn-valid
    valid = ["4111111111111111", "5500005555555559", "4012888888881881"]
    # last digit bumped: all invalid
    invalid = [v[:-1] + str((int(v[-1]) + 1) % 10) for v in valid]
    assert _eval(spark, valid) == [True, True, True]
    assert _eval(spark, invalid) == [False, False, False]


def test_doubling_over_nine_correction(spark):
    # digits >= 5 in doubled positions exercise the -9 branch:
    # ...91 -> 9*2=18->9, +1 = 10 (valid); ...92 -> 9 + 2 = 11 (invalid)
    assert _eval(spark, ["0000000000000091"]) == [True]
    assert _eval(spark, ["0000000000000092"]) == [False]
    assert _eval(spark, ["0000000000000059"]) == [True]  # 5*2=10->1, +9 = 10


def test_check_digit_synthesizer(spark):
    df = spark.range(50).select(
        F.concat(
            F.lit("4"), F.lpad((F.col("id") * 7919 % 10**14).cast("string"), 14, "0")
        ).alias("base")
    )
    full = df.select(
        F.concat(F.col("base"), luhn_check_digit(F.col("base")).cast("string")).alias("s")
    )
    assert all(r.v for r in full.select(luhn_valid(F.col("s")).alias("v")).collect())


def test_scrub_redacts_only_valid(spark):
    text = (
        "pay with 4111111111111111 today; order 4111111111111112 ships, "
        "backup card 4012888888881881."
    )
    df = spark.createDataFrame([(text,)], "text string")
    n, scrubbed = scrub_card_numbers(F.col("text"))
    row = df.select(n.alias("n"), scrubbed.alias("t")).collect()[0]
    assert row.n == 2
    assert "4111111111111112" in row.t  # the order number survives
    assert "4111111111111111" not in row.t and "4012888888881881" not in row.t
    assert row.t.count("<CARD>") == 2


def test_scrub_leaves_embedded_runs_intact(spark):
    # a Luhn-valid 16-digit run embedded in a 20-digit tracking number:
    # the extractor never flags it (\b anchors), so the redactor must
    # not corrupt it either — even when the same 16 digits also appear
    # standalone elsewhere in the text.
    text = "card 4111111111111111 ok, track 12411111111111111199 intact"
    df = spark.createDataFrame([(text,)], "text string")
    n, scrubbed = scrub_card_numbers(F.col("text"))
    row = df.select(n.alias("n"), scrubbed.alias("t")).collect()[0]
    assert row.n == 1
    assert "12411111111111111199" in row.t  # tracking number untouched
    assert "card <CARD> ok" in row.t
