"""Spark built-in-expression builders for the reference's URL/page rules.

Everything here compiles to Catalyst expressions (whole-stage codegen,
JVM-side) — no Python in the hot path. Each builder is the expression twin
of the pure-Python rule in ``functions/urlrules.py``; tests assert equality
on the fixture corpus.

Scale notes: keyword lists are embedded as literal arrays (constant-folded,
shipped with the plan — never shuffled, never broadcast-joined); substring
"any" checks compile to a single Java-regex alternation of \\Q…\\E-quoted
literals so each rule is ONE rlike per row, not N contains() calls.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F

from crawler_ai_spark import constants as K

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _quote_java_rx(lit: str) -> str:
    """Quote a literal for a Java regex alternation (\\Q…\\E)."""
    # \E inside the literal would terminate quoting; split around it
    return "\\Q" + lit.replace("\\E", "\\E\\\\E\\Q") + "\\E"


def trie_regex(words: Iterable[str]) -> str:
    """Prefix-trie-compressed regex matching any of ``words`` as a
    substring. Java's regex engine tries flat alternations alternative-by-
    alternative at every position (no Aho-Corasick); sharing common
    prefixes cuts the 110-keyword career list from ~25 µs/row to ~9 µs/row
    at 1M rows (2.6×, measured) with identical matches."""
    import re as _re

    trie: dict = {}
    for w in words:
        node = trie
        for ch in w:
            node = node.setdefault(ch, {})
        node[""] = {}

    def emit(node: dict) -> str:
        if list(node) == [""]:
            return ""
        alts = []
        has_end = False
        for ch, child in sorted(node.items()):
            if ch == "":
                has_end = True
                continue
            alts.append(_re.escape(ch) + emit(child))
        if has_end and alts:
            # the whole suffix is optional — parenthesize BEFORE the '?',
            # else it binds to the last atom only ('about-us' + 'about'
            # must compile to 'about(?:\-us)?', not 'about\-us?')
            return "(?:" + "|".join(alts) + ")?"
        return alts[0] if len(alts) == 1 else "(?:" + "|".join(alts) + ")"

    return emit(trie)


def any_substr(col: Column, substrings: Iterable[str]) -> Column:
    """True iff any literal substring occurs in ``col`` (one rlike over a
    trie-compressed alternation)."""
    return col.rlike(trie_regex(substrings))


def count_hits(col: Column, keywords: Iterable[str]) -> Column:
    """Number of keywords from the list occurring in ``col`` (list order
    doesn't matter for a count)."""
    arr = F.array(*[F.lit(k) for k in keywords])
    return F.size(F.filter(arr, lambda k: col.contains(k)))


def url_host(url: Column) -> Column:
    return F.lower(F.coalesce(F.try_parse_url(url, F.lit("HOST")), F.lit("")))


def url_path(url: Column) -> Column:
    return F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit(""))


def url_query(url: Column) -> Column:
    return F.coalesce(F.try_parse_url(url, F.lit("QUERY")), F.lit(""))


# ---------------------------------------------------------------------------
# F1 — raw-href validity filter (scrapy_career_spider.py:280-325)
# ---------------------------------------------------------------------------


def should_exclude_expr(href: Column) -> Column:
    """Menu-tab exclusion — scrapy_career_spider.py:264-278."""
    low = F.lower(href)
    kw_hit = any_substr(low, [f"/{k}" for k in K.EXCLUDE_MENU_KEYWORDS])
    # EXCLUDE_MENU_PATTERNS are re.match'd (anchored at start) — Java rlike is
    # unanchored, so anchor explicitly. The patterns themselves are RE2-safe.
    pat_hit = low.rlike("^(?:" + "|".join(K.EXCLUDE_MENU_PATTERNS) + ")")
    return kw_hit | pat_hit


def is_valid_link_expr(href: Column, seed_domain: Column) -> Column:
    """Validity of a RAW href against its seed domain — spider :280-325."""
    low = F.lower(href)
    bad_prefix = F.lit(False)
    for p in K.INVALID_LINK_PREFIXES:
        bad_prefix = bad_prefix | href.startswith(p)
    external = href.startswith("http") & ~F.contains(href, seed_domain)
    non_job = any_substr(low, K.NON_JOB_LINK_PATTERNS)
    return (
        href.isNotNull()
        & (href != "")
        & ~bad_prefix
        & ~external
        & ~should_exclude_expr(href)
        & ~non_job
    )


def same_domain_expr(url: Column, seed_host: Column) -> Column:
    """F2 — netloc equality gate (spider :196, :489)."""
    return F.coalesce(F.try_parse_url(url, F.lit("HOST")), F.lit("")) == seed_host


# ---------------------------------------------------------------------------
# O1 — priority bucketing (scrapy_career_spider.py:327-415)
# ---------------------------------------------------------------------------


def priority_expr(href: Column) -> Column:
    low = F.lower(href)
    return (
        F.when(any_substr(low, K.CAREER_KEYWORDS), F.lit(100))
        .when(any_substr(low, K.NAV_KEYWORDS), F.lit(80))
        .when(any_substr(low, K.CONTENT_KEYWORDS), F.lit(50))
        .otherwise(F.lit(10))
    )


def priority_budget_expr(priority: Column) -> Column:
    """Per-page per-bucket link budget — spider :185/:482."""
    return (
        F.when(priority == 100, F.lit(K.PRIORITY_BUDGETS[100]))
        .when(priority == 80, F.lit(K.PRIORITY_BUDGETS[80]))
        .otherwise(F.lit(2))
    )


# ---------------------------------------------------------------------------
# F3 — job-URL classifier (scrapy_career_spider.py:828-953)
# ---------------------------------------------------------------------------


def is_job_url_expr(url: Column) -> Column:
    low = F.lower(url)
    host = url_host(url)
    path = url_path(url)
    path_stripped = F.regexp_replace(path, "^/+|/+$", "")
    path_parts = F.split(path_stripped, "/")
    n_parts = F.when(path_stripped == "", F.lit(0)).otherwise(F.size(path_parts))
    last_part = F.element_at(path_parts, -1)

    skip = any_substr(low, K.JOB_URL_SKIP_PATTERNS) | any_substr(low, K.JOB_URL_SKIP_FILES)
    not_http = ~(url.startswith("http://") | url.startswith("https://"))

    career_sub = F.lit(False)
    for sub in K.CAREER_SUBDOMAINS:
        career_sub = career_sub | host.startswith(sub)
    career_sub = career_sub & (path_stripped != "")

    job_pattern = any_substr(low, K.JOB_URL_PATTERNS)
    job_query = F.contains(url, F.lit("?")) & any_substr(low, K.JOB_QUERY_PARAMS)
    numeric_id = (path_stripped != "") & last_part.rlike("^[0-9]+$")

    non_job = any_substr(low, K.OBVIOUS_NON_JOB_PATTERNS)
    low_rstrip = F.regexp_replace(low, "/+$", "")
    generic_tail = (
        low.endswith("/career")
        | low.endswith("/careers")
        | low.endswith("/jobs")
        | low.endswith("/")
        | F.element_at(F.split(low_rstrip, "/"), -1).isin("career", "careers", "jobs")
    )

    return (
        F.when(skip | not_http, F.lit(False))
        .when(career_sub, F.lit(True))
        .when(job_pattern, F.lit(True))
        .when(job_query, F.lit(True))
        .when(numeric_id, F.lit(True))
        .when(non_job | generic_tail | (n_parts < 2), F.lit(False))
        .otherwise(F.lit(False))
    )


# ---------------------------------------------------------------------------
# homepage / career-listing classifiers (spider :581-655)
# ---------------------------------------------------------------------------


def is_homepage_expr(url: Column) -> Column:
    # Mirror Python urlparse (the golden twin) rather than Java URI: strip
    # "<scheme>:[//authority]" then split path/query — Java URI rejects
    # opaque URLs (javascript:, tel:) that urlparse still decomposes.
    path_q = F.regexp_replace(url, r"^[a-zA-Z][a-zA-Z0-9+.\-]*:(//[^/?#]*)?", "")
    path = F.lower(F.regexp_extract(path_q, r"^([^?#]*)", 1))
    query = F.regexp_extract(path_q, r"^[^?#]*\?([^#]*)", 1)
    return path.isin(*K.HOMEPAGE_PATHS) & (query == "")


def is_career_listing_expr(url: Column, content_lower: Column, title_lower: Column) -> Column:
    """scrapy_career_spider.py:591-655 (title unused by the reference's rule
    beyond being computed; kept in the signature for parity clarity)."""
    low = F.lower(url)
    host = url_host(url)
    path = F.lower(url_path(url))
    career_sub = host.startswith("career.") | host.startswith("careers.") | host.startswith("jobs.")
    job_detail = any_substr(low, K.JOB_DETAIL_INDICATORS)
    listing = any_substr(low, K.CAREER_LISTING_INDICATORS)
    career_path = any_substr(path, K.CAREER_PATH_PATTERNS)
    content_hint = any_substr(content_lower, K.CAREER_CONTENT_LISTING_HINTS)
    return (
        F.when(is_homepage_expr(url), F.lit(False))
        .when(career_sub, F.lit(True))
        .when(job_detail, F.lit(False))
        .when(listing, F.lit(True))
        .when(career_path, F.lit(True))
        .when(content_hint, F.lit(True))
        .otherwise(F.lit(False))
    )


# ---------------------------------------------------------------------------
# P11 — company from URL (spider :722-741)
# ---------------------------------------------------------------------------


def company_from_url_expr(url: Column) -> Column:
    host = url_host(url)
    host = F.when(host.startswith("www."), F.substring(host, 5, 2048)).otherwise(host)
    first_label = F.element_at(F.split(host, "\\."), 1)
    # Python str.title(): uppercase every letter that follows a non-letter
    # ("other-site" → "Other-Site", "a1b" → "A1B") — initcap only splits on
    # whitespace, so title-case each letter-run segment explicitly.
    segments = F.split(first_label, r"(?<![a-zA-Z])(?=[a-zA-Z])")
    titled = F.concat_ws(
        "",
        F.transform(
            segments,
            lambda s: F.concat(F.upper(F.substring(s, 1, 1)), F.substring(s, 2, 2048)),
        ),
    )
    return F.when(
        first_label.isNull() | (first_label == ""), F.lit("Unknown")
    ).otherwise(titled)
