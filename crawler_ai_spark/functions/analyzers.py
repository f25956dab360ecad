"""C7 — job field analyzers (app/services/job_analyzer.py:54-388) as
column expressions: technology extraction, job level, job category, and
the title analysis struct.

Parity notes:
- extract_technologies returns ``list(set(...))`` in the reference —
  hash-order nondeterministic, so BOTH sides emit the SORTED list (the
  deterministic reading; tests compare sets against the reference).
- level/category are first-match loops over ordered dicts — the fold
  below preserves that order (later entries only apply when earlier
  missed).
- tech matching is substring-based on purpose: 'r' matches inside
  'React' (reference behavior, job_analyzer.py:362-364)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from crawler_ai_spark import constants as K

ALL_TECHNOLOGIES = tuple(t for _, techs in K.TECHNOLOGY_KEYWORDS for t in techs)


def technologies_expr(text: Column) -> Column:
    """Sorted distinct technology keywords occurring in the text."""
    low = F.lower(text)
    arr = F.array(*[F.lit(t) for t in ALL_TECHNOLOGIES])
    return F.array_sort(F.array_distinct(F.filter(arr, lambda t: low.contains(t))))


def job_level_expr(title: Column) -> Column:
    """First-match level over the ordered pattern groups, else UNKNOWN."""
    low = F.lower(title)
    out = F.lit("UNKNOWN")
    for level, patterns in reversed(K.JOB_LEVEL_PATTERNS):
        hit = low.rlike("|".join(f"(?:{p})" for p in patterns))
        out = F.when(hit, F.lit(level)).otherwise(out)
    return out


def job_category_expr(title: Column) -> Column:
    """First-match category over the ordered keyword groups, else OTHER."""
    from crawler_ai_spark.functions.filters import any_substr

    low = F.lower(title)
    out = F.lit("OTHER")
    for category, keywords in reversed(K.JOB_CATEGORIES):
        out = F.when(any_substr(low, keywords), F.lit(category)).otherwise(out)
    return out


CATEGORIES_FLAT = tuple(k for _, kws in K.JOB_CATEGORIES for k in kws)

# JOB_VALIDATION_RULES["TITLE"] — job_constants.py (min 3, max 100, charset)
TITLE_MIN_LEN = 3
TITLE_MAX_LEN = 100
TITLE_CHARSET_RX = r"^[a-zA-Z\s\(\)\-\+\&]+$"


def analyze_title_expr(title: Column) -> Column:
    """The title analysis struct (job_analyzer.py:54-88). Faithful
    semantics: empty/null → invalid with score 0; length/charset/category
    checks subtract 0.3/0.2/0.2/0.1 from 1.0 (floored at 0); length and
    word_count measured on the ORIGINAL string; short/long are elif-
    exclusive; ``valid`` stays True for any non-empty title regardless of
    issues (reference quirk — it is never downgraded)."""
    from crawler_ai_spark.functions.filters import any_substr

    normalized = F.regexp_replace(F.lower(F.trim(title)), r"\s+", " ")
    length = F.length(title)
    words = F.size(
        F.filter(F.split(F.trim(title), r"\s+"), lambda x: x != "")
    )
    too_short = length < TITLE_MIN_LEN
    too_long = ~too_short & (length > TITLE_MAX_LEN)
    bad_charset = ~title.rlike(TITLE_CHARSET_RX)
    no_category = ~any_substr(F.lower(title), CATEGORIES_FLAT)
    issues = F.filter(
        F.array(
            F.when(too_short, "Title too short"),
            F.when(too_long, "Title too long"),
            F.when(bad_charset, "Title contains invalid characters"),
            F.when(no_category, "Title doesn't match common job categories"),
        ),
        lambda x: x.isNotNull(),
    )
    score = (
        F.lit(1.0)
        - F.when(too_short, 0.3).otherwise(0.0)
        - F.when(too_long, 0.2).otherwise(0.0)
        - F.when(bad_charset, 0.2).otherwise(0.0)
        - F.when(no_category, 0.1).otherwise(0.0)
    )
    empty = title.isNull() | (title == "")
    return F.struct(
        F.when(~empty, normalized).alias("normalized"),
        F.when(~empty, length).alias("length"),
        F.when(~empty, words).alias("word_count"),
        F.when(empty, F.lit(False)).otherwise(F.lit(True)).alias("valid"),
        F.when(empty, F.lit(0.0))
        .otherwise(F.round(F.greatest(score, F.lit(0.0)), 6))
        .alias("score"),
        F.when(empty, F.array(F.lit("Title is empty"))).otherwise(issues).alias("issues"),
    )
