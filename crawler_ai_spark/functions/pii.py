"""Checksum-validated PII detection: Luhn-gated card-number scrubbing.

The regex-only PII pass (catalog doc_pii_scrub: emails, phone runs)
over-redacts structured numbers: a 16-digit order id or tracking number
matches \\d{16} but is not a card. The industry fix is the Luhn mod-10
checksum (ISO/IEC 7812) — every real PAN passes it, ~90% of arbitrary
digit runs fail it — so the scrub only redacts candidates that
checksum-validate.

All pure JVM column expressions (sequence/transform/aggregate over the
digit string); the redaction folds the validated candidates through
literal replaces. Zero shuffle, linear scan — identical semantics
expressible in DuckDB list ops for the oracle."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

CARD_RX = r"\b\d{16}\b"


def luhn_valid(digits: Column) -> Column:
    """True iff the digit string passes the Luhn mod-10 check. Position
    parity counts from the RIGHT (the check digit is position 1, never
    doubled); doubled digits over 9 subtract 9."""
    n = F.length(digits)
    total = F.aggregate(
        F.sequence(F.lit(1), n),
        F.lit(0),
        lambda acc, i: acc
        + F.when(
            (n - i) % 2 == 1,
            # doubled position: 2d - 9 iff 2d > 9, via a branchless form
            # that stays identical in SQL: d*2 - 9*floor(d*2/10) == d*2
            # when <=9 (floor 0) and d*2-9 when >=10 (floor 1)
            F.substring(digits, i, 1).cast("int") * 2
            - 9 * F.floor(F.substring(digits, i, 1).cast("int") * 2 / 10).cast("int"),
        ).otherwise(F.substring(digits, i, 1).cast("int")),
    )
    return (total % 10) == 0


def luhn_check_digit(base: Column) -> Column:
    """Check digit that makes base||digit Luhn-valid (for synthesizing
    test PANs deterministically: the digit d with
    (checksum(base||'0') + d) % 10 == 0)."""
    n = F.length(base)
    # checksum of base shifted one position left (i.e. as if a 0 check
    # digit were appended): position parity from the right of base||d
    total = F.aggregate(
        F.sequence(F.lit(1), n),
        F.lit(0),
        lambda acc, i: acc
        + F.when(
            (n - i) % 2 == 0,  # with the appended digit, these double
            F.substring(base, i, 1).cast("int") * 2
            - 9 * F.floor(F.substring(base, i, 1).cast("int") * 2 / 10).cast("int"),
        ).otherwise(F.substring(base, i, 1).cast("int")),
    )
    return (10 - (total % 10)) % 10


def scrub_card_numbers(text: Column) -> tuple[Column, Column]:
    """(n_cards, text_scrubbed): count and redact ONLY Luhn-valid
    16-digit runs; non-validating runs (order ids, tracking numbers)
    pass through untouched.

    Redaction is boundary-anchored per candidate (\\b...\\b, matching
    CARD_RX's own anchors): a literal replace would also corrupt a
    Luhn-valid 16-digit SUBSTRING embedded in a longer digit run (e.g.
    a 20-digit tracking number) that the extractor itself would never
    flag. Candidates are digit-only, so no regex-escaping is needed."""
    candidates = F.regexp_extract_all(text, F.lit(CARD_RX), 0)
    valid = F.filter(candidates, luhn_valid)
    scrubbed = F.aggregate(
        F.array_distinct(valid),
        text,
        lambda acc, c: F.regexp_replace(
            acc, F.concat(F.lit(r"\b"), c, F.lit(r"\b")), F.lit("<CARD>")
        ),
    )
    return F.size(valid), scrubbed
