"""Contact extraction (P4/P5/P6) as built-in JVM expressions.

The reference runs Python ``re`` over the raw HTML string
(crawler.py:292-327) and over footer text (contact_footer.py). Java regex
supports everything these patterns need — including the fixed-width
lookbehind/lookahead of the strict VN phone pattern — so the whole pipeline
is ``regexp_extract_all`` + array transforms: no Python, fully codegen'd.

Python-`re` ↔ Java-regex parity notes:
- ``\\s`` differs (Python is Unicode-aware, Java ASCII by default); the phone
  separator class is therefore spelled out explicitly below to match
  Python's ``\\s`` exactly (app/utils/text.py:40 builds the class from
  ``\\s\\u00A0\\u2000-\\u200B``).
- the email patterns use only ASCII classes; ``(?i)`` mirrors re.IGNORECASE.
- tests/test_contacts.py asserts expression output == the pure-Python
  pipeline (functions/textnorm.py) row-by-row on the fixture corpus.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from crawler_ai_spark import constants as K

# Python's str-mode \\s spelled out for Java (Java's \\s is ASCII-only).
# Built at import time from Python re itself so parity is definitional:
# the class = {all cp < 0x10000 matching Python \\s} ∪ [\u00A0 \u2000-\u200B]
# (the explicit additions of app/utils/text.py:40).
import re as _re

_PY_WS_CHARS = sorted(
    {c for c in map(chr, range(0x10000)) if _re.match(r"\s", c)}
    | {"\u00a0"}
    | {chr(cp) for cp in range(0x2000, 0x200C)}
)
_PY_WS_FOR_JAVA = "".join("\\u%04X" % ord(c) for c in _PY_WS_CHARS)
VN_PHONE_JAVA = (
    r"(?<!\d)(?:\+?84|0)(?:[" + _PY_WS_FOR_JAVA + r"\.\-\(\)]*\d){8,10}(?!\d)"
)

_EMAIL_JAVA_1 = r"(?i)\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b"
_EMAIL_JAVA_2 = r"(?i)[a-zA-Z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}"
_FOOTER_EMAIL_JAVA = r"(?i)[A-Z0-9._%+-]+@[A-Z0-9.-]+\.[A-Z]{2,}"


def emails_expr(content: Column) -> Column:
    """Email pipeline — crawler.py:292-316.

    Two overlapping regex sweeps, lowercase, reject substrings, set-dedup;
    emitted sorted (the reference's final spider output is sorted —
    scrapy_career_spider.py:678; its intermediate list(set()) order is
    hash-nondeterministic, so sorted IS the deterministic reading)."""
    found = F.concat(
        F.regexp_extract_all(content, F.lit(_EMAIL_JAVA_1), F.lit(0)),
        F.regexp_extract_all(content, F.lit(_EMAIL_JAVA_2), F.lit(0)),
    )
    lowered = F.transform(found, lambda e: F.lower(F.trim(e)))
    # '@' and '.'-in-domain are guaranteed by the regex; apply the substring
    # reject list (crawler.py:309-312)
    bad = "|".join("\\Q" + s + "\\E" for s in K.EMAIL_INVALID_SUBSTRINGS)
    valid = F.filter(lowered, lambda e: ~e.rlike(bad))
    return F.array_sort(F.array_distinct(valid))


def clean_phone_expr(raw: Column) -> Column:
    """clean_phone — app/utils/text.py:48-55 (NULL when not 10-11 digits)."""
    s = F.regexp_replace(raw, r"[^\d+]", "")
    s = F.when(s.startswith("+84"), F.concat(F.lit("0"), F.substring(s, 4, 64))).otherwise(s)
    s = F.regexp_replace(s, r"\D", "")
    return F.when(F.length(s).between(10, 11), s).otherwise(F.lit(None))


def phones_strict_expr(text: Column) -> Column:
    """Strict VN phone pipeline — contact_footer.py:60-66: normalize unicode
    whitespace, VN_PHONE_RX sweep, clean_phone, ordered dedup
    (array_distinct keeps first-occurrence order)."""
    normalized = F.trim(
        F.regexp_replace(text, "[" + _PY_WS_FOR_JAVA + "]+", " ")
    )
    matches = F.regexp_extract_all(normalized, F.lit(VN_PHONE_JAVA), F.lit(0))
    cleaned = F.transform(matches, lambda m: clean_phone_expr(m))
    return F.array_distinct(F.filter(cleaned, lambda p: p.isNotNull()))


def phones_naive_expr(content: Column) -> Column:
    """Naive phone sweep — crawler.py:319-327 (3 patterns, concatenated)."""
    arrs = [F.regexp_extract_all(content, F.lit(p), F.lit(0)) for p in K.PHONE_PATTERNS_NAIVE]
    return F.concat(*arrs)


def footer_emails_expr(footer_text: Column) -> Column:
    """Footer emails — contact_footer.py:68-72 (first-seen order, lowered)."""
    found = F.regexp_extract_all(footer_text, F.lit(_FOOTER_EMAIL_JAVA), F.lit(0))
    return F.array_distinct(F.transform(found, F.lower))


def socials_expr(content: Column) -> Column:
    """Social-link sweep (P6) — contact_extractor_service.py:56-63.

    Returns array<struct<platform,url>> of full regex matches per platform."""
    parts = []
    for platform, pattern in K.SOCIAL_PATTERNS.items():
        matches = F.regexp_extract_all(content, F.lit(pattern), F.lit(0))
        parts.append(
            F.transform(
                matches,
                lambda m, p=platform: F.struct(
                    F.lit(p).alias("platform"), m.alias("url")
                ),
            )
        )
    return F.array_distinct(F.concat(*parts))
