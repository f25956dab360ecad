"""C3 — URL career-confidence analyzer (career_pages_service.py:328-476)
as one struct-valued column expression.

FLOAT-PARITY NOTE: the reference accumulates `confidence` with sequential
Python float additions, and thresholds (≥1.0/≥0.8/≥0.5/<0.0) sit exactly
where partial sums like 0.3+0.3+0.2 = 0.7999999999999999 land — so the
expression folds the SAME terms in the SAME order with left-associative
double addition (IEEE-identical on the JVM), never `count × weight`.
tests/test_detector_parity.py asserts bit-equality of the confidence
against executing the reference's own coroutine.

KNOWN TRADE-OFF: the ~290-term fold exceeds the JVM's 64 KB method limit,
so whole-stage codegen logs a compile failure and Spark falls back to
interpreted evaluation for this expression — correct, modestly slower.
The fold cannot be collapsed to `count × weight` or group subtotals
without changing results: every addition rounds relative to the RUNNING
sum (0.3 + 0.3 + 0.2 ≠ 0.8 exactly), and the reference's accept
thresholds sit on those edges. If bit-parity is ever relaxed to a 1e-9
tolerance, replace the fold with count arithmetic and codegen returns."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from crawler_ai_spark import constants as K


def _analyze_parts(url: Column) -> tuple[Column, Column, Column, Column]:
    path = F.lower(F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit("")))
    query = F.coalesce(F.try_parse_url(url, F.lit("QUERY")), F.lit(""))
    domain = F.lower(F.coalesce(F.try_parse_url(url, F.lit("HOST")), F.lit("")))
    stripped = F.regexp_replace(path, "^/+|/+$", "")
    depth = F.when(stripped == "", F.lit(0)).otherwise(F.size(F.split(stripped, "/+")))
    return path, query, domain, depth


def career_confidence_expr(url: Column) -> Column:
    """struct(confidence DOUBLE, is_career_page, is_potential,
    rejection STRING-category-or-null) — the full analyzer."""
    path, query, domain, depth = _analyze_parts(url)
    low_url = F.lower(url)

    is_xml = low_url.endswith(".xml") | low_url.endswith(".rss") | low_url.endswith(".atom")
    non_http = ~(url.startswith("http://") | url.startswith("https://"))
    is_homepage = path.isin(*K.HOMEPAGE_PATHS) & (query == "")
    career_sub = (
        domain.startswith("career.") | domain.startswith("careers.") | domain.startswith("jobs.")
    )

    # confidence fold — term order mirrors the reference exactly
    conf = F.lit(0.0)
    for kw in K.C3_EXACT_KEYWORDS:                       # :382-386, +1.0
        conf = conf + F.when(path.contains(kw), 1.0).otherwise(0.0)
    segs = F.split(F.regexp_replace(path, "^/+|/+$", ""), "/")
    for kw in K.C3_GENERIC_KEYWORDS:                     # :389-396, +0.3
        hit = (
            path.contains("/" + kw)
            | path.contains(kw + "/")
            | path.contains("-" + kw)
            | path.contains(kw + "-")
            | F.array_contains(segs, kw)
        )
        conf = conf + F.when(hit, 0.3).otherwise(0.0)
    for pat in K.C3_CAREER_PATTERNS:                     # :399-410, +1.2
        conf = conf + F.when(path.contains(pat), 1.2).otherwise(0.0)
    for kw in K.C3_DOMAIN_KEYWORDS:                      # :413-416, +0.05
        conf = conf + F.when(domain.contains(kw), 0.05).otherwise(0.0)
    for board in K.C3_JOB_BOARDS:                        # :419-422, +0.5
        conf = conf + F.when(domain.contains(board), 0.5).otherwise(0.0)
    shallow_bonus = F.when(depth <= 2, 0.2).otherwise(0.0)   # :425-428
    conf_pre_depth = conf + shallow_bonus

    too_deep = depth > 4                                  # :429-431 early return

    conf_final = conf_pre_depth
    strong_pen = F.lit(False)
    for pat, pen in K.C3_PENALTIES:                       # :441-465
        hit = path.contains(pat)
        conf_final = conf_final + F.when(hit, float(pen)).otherwise(0.0)
        if pen <= -0.5:
            strong_pen = strong_pen | hit

    # validation ladder :468-480 (≥1.0 clears a strong-penalty rejection)
    is_career = conf_final >= 1.0
    rejection_post = (
        F.when(conf_final >= 1.0, F.lit(None).cast("string"))
        .when(strong_pen, F.lit("strong_non_career"))
        .when(conf_final < 0.0, F.lit("low_confidence"))
    )
    is_career_full = conf_final >= 0.8
    is_potential = ~is_career_full & (conf_final >= 0.5)

    return F.struct(
        F.when(is_xml | non_http | is_homepage, 0.0)
        .when(career_sub, 2.0)
        .when(too_deep, conf_pre_depth)
        .otherwise(conf_final)
        .alias("confidence"),
        (
            ~(is_xml | non_http | is_homepage)
            & (career_sub | (~too_deep & is_career_full))
        ).alias("is_career_page"),
        (~(is_xml | non_http | is_homepage | career_sub | too_deep) & is_potential).alias(
            "is_potential"
        ),
        F.when(is_xml, "xml")
        .when(non_http, "non_http")
        .when(is_homepage, "homepage")
        .when(career_sub, F.lit(None).cast("string"))
        .when(too_deep, "path_too_deep")
        .otherwise(rejection_post)
        .alias("rejection"),
    )
