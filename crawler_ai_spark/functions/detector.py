"""F5 early-rejection rules + C2 career-detector score as column
expressions — app/services/career_detector.py:56-267, thresholds
app/utils/constants.py:254-260.

Rule-order fidelity: check_early_rejection returns the FIRST matching
rule's reason, so the CASE cascade below mirrors rules 1→7 exactly (the
emitted reason is the rule CATEGORY — a stable column contract; the
reference embeds the specific token in an f-string).

Quirks reproduced on purpose (they are the reference's behavior):
- rule 2 includes the bare ``/\\d{4}`` — any 4-digit run in a path rejects;
- rule 3 includes ``/[a-f0-9]{4,}`` — hex-looking words ('deed', 'face')
  reject;
- in C2, a high/exact pattern hit scores 0 when ANY non-career careers-
  subpage substring is present (the reference 'continue's per pattern, but
  the subpage test is pattern-independent, so it gates the whole rule);
- CAREER_KEYWORDS_VI matches by substring, so 'tuyen' AND 'tuyen-dung'
  both count for '/tuyen-dung' (capped at 3 scored keywords).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from crawler_ai_spark import constants as K
from crawler_ai_spark.functions.filters import any_substr, count_hits


def _path_lower(url: Column) -> Column:
    return F.lower(F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit("")))


def _query_lower(url: Column) -> Column:
    return F.lower(F.coalesce(F.try_parse_url(url, F.lit("QUERY")), F.lit("")))


def _path_depth(path: Column) -> Column:
    stripped = F.regexp_replace(path, "^/+|/+$", "")
    return F.when(stripped == "", F.lit(0)).otherwise(F.size(F.split(stripped, "/+")))


def early_rejection_reason_expr(url: Column) -> Column:
    """F5 — NULL when the URL passes; else the first-matching rule
    category: non_career_indicator | date_pattern | long_id |
    file_extension | path_too_deep | non_career_path | job_detail_page."""
    path = _path_lower(url)
    query = _query_lower(url)
    depth = _path_depth(path)
    pq = F.concat(path, F.lit(" "), query)

    r1 = any_substr(pq, K.STRONG_NON_CAREER_INDICATORS)
    r2 = path.rlike("|".join(K.EARLY_DATE_PATTERNS))
    r3 = path.rlike("|".join(K.EARLY_ID_PATTERNS))
    r4 = any_substr(path, K.EARLY_FILE_EXTENSIONS)
    r5 = depth > K.EARLY_MAX_PATH_DEPTH
    r6 = any_substr(path, K.EARLY_NON_CAREER_PATHS)
    r7 = (depth > 1) & any_substr(path, K.EARLY_JOB_DETAIL_INDICATORS)
    return (
        F.when(r1, F.lit("non_career_indicator"))
        .when(r2, F.lit("date_pattern"))
        .when(r3, F.lit("long_id"))
        .when(r4, F.lit("file_extension"))
        .when(r5, F.lit("path_too_deep"))
        .when(r6, F.lit("non_career_path"))
        .when(r7, F.lit("job_detail_page"))
    )


def career_detector_score_expr(url: Column) -> Column:
    """C2 — the +5/+3/+2×3/+4/+1/+2 ladder with −3/−depth/−2/−1 penalties
    (career_detector.py:159-267). Accept at ≥ C2_ACCEPT_THRESHOLD."""
    path = _path_lower(url)
    query = _query_lower(url)
    depth = _path_depth(path)
    pq = F.concat(path, F.lit(" "), query)

    subpage = any_substr(path, K.C2_NON_CAREER_SUBPAGES)
    high = (any_substr(path, K.C2_HIGH_PRIORITY_PATTERNS) & ~subpage).cast("int") * 5
    medium = any_substr(path, K.C2_MEDIUM_PRIORITY_PATTERNS).cast("int") * 3
    kw = F.least(count_hits(pq, K.CAREER_KEYWORDS_VI), F.lit(3)) * 2
    exact = (any_substr(path, K.CAREER_EXACT_PATTERNS) & ~subpage).cast("int") * 4

    # +1 per career query-param NAME present (exact key match)
    param_keys = F.transform(
        F.filter(F.split(query, "&"), lambda p: p != ""),
        lambda p: F.element_at(F.split(p, "="), 1),
    )
    qp = F.size(
        F.filter(
            F.array(*[F.lit(p) for p in K.C2_QUERY_PARAMS]),
            lambda p: F.array_contains(param_keys, p),
        )
    )

    clean = path.isin(*K.C2_CLEAN_PATHS).cast("int") * 2

    pen_kw = count_hits(pq, K.C2_NON_CAREER_KEYWORDS) * -3
    pen_depth = F.when(depth > 3, -(depth - 3)).otherwise(F.lit(0))
    pen_ids = (path.rlike(r"/\d+") | path.rlike(r"/[a-f0-9]{4,}")).cast("int") * -2
    pen_special = path.rlike(r"[%&$#@!]").cast("int") * -1

    return (
        high + medium + kw + exact + qp + clean + pen_kw + pen_depth + pen_ids + pen_special
    ).cast("int")


def career_page_decision_expr(url: Column) -> Column:
    """The combined detector decision: pass early rejection AND score ≥
    threshold (career_detector.py:342-367)."""
    return early_rejection_reason_expr(url).isNull() & (
        career_detector_score_expr(url) >= F.lit(K.C2_ACCEPT_THRESHOLD)
    )
