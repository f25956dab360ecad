"""C3 — URL career-confidence analyzer (career_pages_service.py:328-476)
as one struct-valued column expression.

FLOAT-PARITY NOTE: the reference accumulates `confidence` with sequential
Python float additions, and thresholds (≥1.0/≥0.8/≥0.5/<0.0) sit exactly
where partial sums like 0.3+0.3+0.2 = 0.7999999999999999 land — so the
expression folds the SAME terms in the SAME order with left-associative
double addition (IEEE-identical on the JVM), never `count × weight`.
tests/test_detector_parity.py asserts bit-equality of the confidence
against executing the reference's own coroutine.

CODEGEN NOTE: the naive ~265-term `conf + CASE WHEN …` chain is a single
unsplittable expression whose generated consume method exceeds janino's
64 KB limit, silently downgrading the whole stage to interpreted
evaluation. `with_career_confidence` (the form every catalog query uses)
therefore stages the fold:

  stage 1 (whole-stage codegen, splittable): materialize the ordered term
    array — element i is the i-th term's weight if its keyword hit, else
    0.0 — via `F.array(...)`, whose codegen splits elements across
    methods, plus the shared path/query/domain/depth parts;
  stage 2: left-fold the array with `F.aggregate(terms, 0.0, acc+x)`.
    Skipped terms contribute exactly 0.0, and `acc + 0.0 == acc`
    bit-for-bit for every reachable partial sum (sums of ±weights are
    never -0.0 in round-to-nearest), so the fold over the full array is
    IEEE-identical to the reference's hit-only accumulation.

`F.aggregate` is a CodegenFallback higher-order function, so stage 2 runs
as a standalone ProjectExec — but by then the per-row work is summing
~250 doubles; all string matching stayed compiled in stage 1. The
size(terms) guard in stage 2 references the array column twice, which
stops CollapseProject from inlining the (expensive, multiply-referenced)
stage-1 expressions back into stage 2 and re-creating the giant
expression on the interpreted path; tests/test_codegen_health.py and
test_plans.py pin both properties (no janino fallback; term array built
inside a codegen'd Project).

`career_confidence_expr` keeps the reference-shaped single-Column fold as
the executable spec for small-data bit-parity tests; catalog queries must
use `with_career_confidence`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crawler_ai_spark import constants as K


def _analyze_parts(url: Column) -> tuple[Column, Column, Column, Column]:
    path = F.lower(F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit("")))
    query = F.coalesce(F.try_parse_url(url, F.lit("QUERY")), F.lit(""))
    domain = F.lower(F.coalesce(F.try_parse_url(url, F.lit("HOST")), F.lit("")))
    stripped = F.regexp_replace(path, "^/+|/+$", "")
    depth = F.when(stripped == "", F.lit(0)).otherwise(F.size(F.split(stripped, "/+")))
    return path, query, domain, depth


def _pre_depth_terms(path: Column, domain: Column) -> list[Column]:
    """The ordered pre-depth confidence terms (reference :382-422): each
    is the term's weight when its trigger hits, else exactly 0.0. Order
    mirrors the reference's sequential additions."""
    terms: list[Column] = []
    for kw in K.C3_EXACT_KEYWORDS:                       # :382-386, +1.0
        terms.append(F.when(path.contains(kw), 1.0).otherwise(0.0))
    segs = F.split(F.regexp_replace(path, "^/+|/+$", ""), "/")
    for kw in K.C3_GENERIC_KEYWORDS:                     # :389-396, +0.3
        hit = (
            path.contains("/" + kw)
            | path.contains(kw + "/")
            | path.contains("-" + kw)
            | path.contains(kw + "-")
            | F.array_contains(segs, kw)
        )
        terms.append(F.when(hit, 0.3).otherwise(0.0))
    for pat in K.C3_CAREER_PATTERNS:                     # :399-410, +1.2
        terms.append(F.when(path.contains(pat), 1.2).otherwise(0.0))
    for kw in K.C3_DOMAIN_KEYWORDS:                      # :413-416, +0.05
        terms.append(F.when(domain.contains(kw), 0.05).otherwise(0.0))
    for board in K.C3_JOB_BOARDS:                        # :419-422, +0.5
        terms.append(F.when(domain.contains(board), 0.5).otherwise(0.0))
    return terms


def _finalize_struct(
    url: Column,
    path: Column,
    query: Column,
    domain: Column,
    depth: Column,
    conf_base: Column,
) -> Column:
    """Depth bonus, penalties, and the validation ladder (:425-480) on top
    of the pre-depth running sum — shared by both forms below."""
    low_url = F.lower(url)
    is_xml = low_url.endswith(".xml") | low_url.endswith(".rss") | low_url.endswith(".atom")
    non_http = ~(url.startswith("http://") | url.startswith("https://"))
    is_homepage = path.isin(*K.HOMEPAGE_PATHS) & (query == "")
    career_sub = (
        domain.startswith("career.") | domain.startswith("careers.") | domain.startswith("jobs.")
    )

    shallow_bonus = F.when(depth <= 2, 0.2).otherwise(0.0)   # :425-428
    conf_pre_depth = conf_base + shallow_bonus

    too_deep = depth > 4                                  # :429-431 early return

    conf_final = conf_pre_depth
    strong_pen = F.lit(False)
    for pat, pen in K.C3_PENALTIES:                       # :441-465
        hit = path.contains(pat)
        conf_final = conf_final + F.when(hit, float(pen)).otherwise(0.0)
        if pen <= -0.5:
            strong_pen = strong_pen | hit

    # validation ladder :468-480 (≥1.0 clears a strong-penalty rejection)
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


def career_confidence_expr(url: Column) -> Column:
    """struct(confidence DOUBLE, is_career_page, is_potential,
    rejection STRING-category-or-null) — the full analyzer as ONE column,
    shaped like the reference's sequential fold. Executable spec for the
    bit-parity tests; too large for whole-stage codegen (janino 64 KB) —
    catalog queries use `with_career_confidence` instead."""
    path, query, domain, depth = _analyze_parts(url)
    conf = F.lit(0.0)
    for term in _pre_depth_terms(path, domain):
        conf = conf + term
    return _finalize_struct(url, path, query, domain, depth, conf)


def with_career_confidence(df: DataFrame, url: Column, out: str = "c") -> DataFrame:
    """Codegen-safe staged form: adds struct column `out` (same schema and
    bit-identical values as `career_confidence_expr`) plus nothing else.
    See the module docstring for why this is two projections."""
    path, query, domain, depth = _analyze_parts(url)
    staged = df.withColumns(
        {
            "_c3_terms": F.array(*_pre_depth_terms(path, domain)),
            "_c3_path": path,
            "_c3_query": query,
            "_c3_domain": domain,
            "_c3_depth": depth,
        }
    )
    terms = F.col("_c3_terms")
    # size(terms) is always >= 0; the dead branch exists to reference the
    # array column a second time so CollapseProject keeps the stages split
    # (it refuses to duplicate non-cheap multiply-referenced expressions).
    conf_base = F.when(F.size(terms) < 0, F.lit(0.0)).otherwise(
        F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x)
    )
    struct_col = _finalize_struct(
        url,
        F.col("_c3_path"),
        F.col("_c3_query"),
        F.col("_c3_domain"),
        F.col("_c3_depth"),
        conf_base,
    )
    return staged.withColumn(out, struct_col).drop(
        "_c3_terms", "_c3_path", "_c3_query", "_c3_domain", "_c3_depth"
    )
