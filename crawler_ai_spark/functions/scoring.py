"""Score expressions (SURVEY.md §2.4) — computed columns, all built-ins.

The reference computes these with per-row Python loops; here each score is a
closed-form Catalyst expression over keyword-hit counts, algebraically equal
to the loop (see career_score_expr for the early-break derivation).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from crawler_ai_spark import constants as K
from crawler_ai_spark.functions.filters import any_substr, count_hits

# ---------------------------------------------------------------------------
# C1 — spider career score (scrapy_career_spider.py:497-546)
# ---------------------------------------------------------------------------


def career_score_expr(url: Column, content_lower: Column, title_lower: Column) -> Column:
    """+0.4 on first URL-indicator hit, +0.3 on first title hit, +0.1 per
    content hit with the loop breaking once score >= 0.6, capped at 1.0.

    The break makes the content contribution
    ``0.1 * min(n_hits, max(1, ceil((0.6 - base) / 0.1)))`` for n_hits > 0:
    the loop always adds the hit it is on, *then* checks the threshold."""
    low_url = F.lower(url)
    url_hit = any_substr(low_url, K.CAREER_URL_INDICATORS).cast("int")
    title_hit = any_substr(title_lower, K.CAREER_TITLE_INDICATORS).cast("int")
    base = url_hit * F.lit(0.4) + title_hit * F.lit(0.3)
    n_hits = count_hits(content_lower, K.CAREER_CONTENT_INDICATORS)
    needed = F.greatest(F.lit(1), F.ceil((F.lit(0.6) - base) / F.lit(0.1)).cast("int"))
    content = F.when(n_hits > 0, F.lit(0.1) * F.least(n_hits, needed)).otherwise(F.lit(0.0))
    return F.least(base + content, F.lit(1.0))


def career_indicators_expr(url: Column, content_lower: Column, title_lower: Column) -> Column:
    """Indicator labels — scrapy_career_spider.py:548-579 (ordered array)."""
    low_url = F.lower(url)
    checks = [
        (low_url.contains("career"), "URL contains career"),
        (low_url.contains("job"), "URL contains job"),
        (low_url.contains("tuyen-dung"), "URL contains tuyen-dung"),
        (title_lower.contains("career"), "Title contains career"),
        (title_lower.contains("job"), "Title contains job"),
        (content_lower.contains("apply"), "Content contains apply"),
        (content_lower.contains("position"), "Content contains position"),
        (content_lower.contains("hiring"), "Content contains hiring"),
    ]
    arr = F.array(*[F.when(cond, F.lit(label)).otherwise(F.lit(None)) for cond, label in checks])
    return F.filter(arr, lambda x: x.isNotNull())


# ---------------------------------------------------------------------------
# C5 — detection confidence (career_pages_service.py:915-930)
# ---------------------------------------------------------------------------


def detection_confidence_expr(n_career: Column, n_potential: Column, n_total: Column) -> Column:
    """min(pages*0.3, 1) + min(potential*0.1, 0.3) + min(total/100, 0.2), cap 1.0."""
    return F.least(
        F.least(n_career.cast("double") * 0.3, F.lit(1.0))
        + F.least(n_potential.cast("double") * 0.1, F.lit(0.3))
        + F.least(n_total.cast("double") / 100.0, F.lit(0.2)),
        F.lit(1.0),
    )


# ---------------------------------------------------------------------------
# C4 — job-link score (job_extractor.py:480-585)
# ---------------------------------------------------------------------------

# job_extractor.py high/medium-priority path fragments (:489-503)
_HIGH_PRIORITY_PATHS = (
    "/tuyen-dung/", "/careers/", "/jobs/", "/recruitment/",
    "/tuyendung/", "/career/", "/job/",
)
_MEDIUM_PRIORITY_PATHS = ("/viec-lam/", "/vieclam/", "/employment/", "/vacancy/", "/vacancies/")
_PATH_KEYWORDS = ("tuyen-dung", "career", "job", "recruitment", "viec-lam", "employment")
_TEXT_KEYWORDS = (
    "tuyển dụng", "career", "job", "việc làm", "apply", "ứng tuyển",
    "vị trí", "position", "vacancy", "hiring",
)


def job_link_score_expr(href: Column, anchor_text: Column) -> Column:
    """+5 high-priority path, +3 medium, +2/path-kw (cap 3 kws), +1/text-kw
    (cap 3), +1 depth 2-4 — a faithful simplification of job_extractor.py's
    score ladder over the columns this engine carries (href + anchor text).
    """
    low = F.lower(href)
    text_low = F.lower(F.coalesce(anchor_text, F.lit("")))
    high = any_substr(low, _HIGH_PRIORITY_PATHS).cast("int") * F.lit(5)
    medium = any_substr(low, _MEDIUM_PRIORITY_PATHS).cast("int") * F.lit(3)
    path_kw = F.least(count_hits(low, _PATH_KEYWORDS), F.lit(3)) * F.lit(2)
    text_kw = F.least(count_hits(text_low, _TEXT_KEYWORDS), F.lit(3))
    depth = F.size(F.split(F.regexp_replace(low, "^https?://[^/]*", ""), "/")) - 1
    depth_bonus = ((depth >= 2) & (depth <= 4)).cast("int")
    return high + medium + path_kw + text_kw + depth_bonus
