"""Pure-Python URL classification rules — the reference's frontier semantics.

This module is the *golden twin* of the Spark expressions in
``functions/filters.py`` / ``functions/scoring.py``: tests assert the Spark
built-in-expression implementations produce identical results on the fixture
corpus, and the plain-Python crawl simulator (tests/golden_crawl.py) uses
these directly. Keep both sides in sync.

Reference: /root/reference/app/services/scrapy_career_spider.py (file:line in
each docstring).
"""

from __future__ import annotations

import re
from urllib.parse import urljoin, urlparse

from crawler_ai_spark import constants as K

_EXCLUDE_MENU_RXS = [re.compile(p) for p in K.EXCLUDE_MENU_PATTERNS]


def canonicalize(base_url: str, href: str) -> str:
    """urljoin + fragment strip — crawler.py:398 + app/utils/text.py:26-31."""
    u = urljoin(base_url or "", href or "")
    if "#" in u:
        u = u.split("#", 1)[0]
    return u.strip()


def host_of(url: str) -> str:
    return urlparse(url or "").netloc


def is_homepage(url: str) -> bool:
    """scrapy_career_spider.py:581-589."""
    parsed = urlparse(url or "")
    return parsed.path.lower() in K.HOMEPAGE_PATHS and not parsed.query


def should_exclude_url(url: str) -> bool:
    """Menu-tab exclusion — scrapy_career_spider.py:264-278."""
    url_lower = (url or "").lower()
    for keyword in K.EXCLUDE_MENU_KEYWORDS:
        if f"/{keyword}" in url_lower or url_lower.endswith(f"/{keyword}"):
            return True
    for rx in _EXCLUDE_MENU_RXS:
        if rx.match(url_lower):
            return True
    return False


def is_valid_link(link: str, domain: str) -> bool:
    """Raw-href validity filter (F1) — scrapy_career_spider.py:280-325.

    NOTE: operates on the RAW href (before urljoin), exactly like the
    reference; ``domain`` is the seed's netloc (substring check, :288)."""
    if not link or link.startswith(K.INVALID_LINK_PREFIXES):
        return False
    if link.startswith("http") and domain not in link:
        return False
    if should_exclude_url(link):
        return False
    link_lower = link.lower()
    for pattern in K.NON_JOB_LINK_PATTERNS:
        if pattern in link_lower:
            return False
    return True


def link_priority(link: str) -> int:
    """Priority bucketing (O1) — scrapy_career_spider.py:327-415."""
    link_lower = (link or "").lower()
    if any(k in link_lower for k in K.CAREER_KEYWORDS):
        return 100
    if any(k in link_lower for k in K.NAV_KEYWORDS):
        return 80
    if any(k in link_lower for k in K.CONTENT_KEYWORDS):
        return 50
    return 10


def is_job_url(url: str) -> bool:
    """Job-URL classifier (F3) — scrapy_career_spider.py:828-953."""
    url_lower = (url or "").lower()
    for pattern in K.JOB_URL_SKIP_PATTERNS:
        if pattern in url_lower:
            return False
    if any(ext in url_lower for ext in K.JOB_URL_SKIP_FILES):
        return False
    if not url.startswith(("http://", "https://")):
        return False
    parsed = urlparse(url)
    domain = parsed.netloc.lower()
    for subdomain in K.CAREER_SUBDOMAINS:
        if domain.startswith(subdomain):
            path = parsed.path.strip("/")
            if path and len(path.split("/")) >= 1:
                return True
    for pattern in K.JOB_URL_PATTERNS:
        if pattern in url_lower:
            return True
    if "?" in url and any(p in url_lower for p in K.JOB_QUERY_PARAMS):
        return True
    path = parsed.path.strip("/")
    if path:
        parts = path.split("/")
        if parts and parts[-1].isdigit():
            return True
    for pattern in K.OBVIOUS_NON_JOB_PATTERNS:
        if pattern in url_lower:
            return False
    if (
        url_lower.endswith("/career")
        or url_lower.endswith("/careers")
        or url_lower.endswith("/jobs")
        or url_lower.endswith("/")
        or url_lower.rstrip("/").split("/")[-1] in ("career", "careers", "jobs")
    ):
        return False
    if not path or len(path.split("/")) < 2:
        return False
    return False


def is_career_listing_page(url: str, content_lower: str, title_lower: str) -> bool:
    """Career listing vs job-detail classifier — scrapy_career_spider.py:591-655."""
    url_l = (url or "").lower()
    parsed = urlparse(url_l)
    domain = parsed.netloc
    path = parsed.path
    if is_homepage(url_l):
        return False
    if domain.startswith(("career.", "careers.", "jobs.")):
        return True
    for indicator in K.JOB_DETAIL_INDICATORS:
        if indicator in url_l:
            return False
    for indicator in K.CAREER_LISTING_INDICATORS:
        if indicator in url_l:
            return True
    for pattern in K.CAREER_PATH_PATTERNS:
        if pattern in path:
            return True
    if any(h in content_lower for h in K.CAREER_CONTENT_LISTING_HINTS):
        return True
    return False


def career_score(url: str, content_lower: str, title_lower: str) -> float:
    """Career page score (C1) — scrapy_career_spider.py:497-546.

    +0.4 first URL-indicator hit; +0.3 first title hit; +0.1 per content hit
    stopping once score >= 0.6; min(score, 1.0)."""
    url_l = (url or "").lower()
    score = 0.0
    for indicator in K.CAREER_URL_INDICATORS:
        if indicator in url_l:
            score += 0.4
            break
    for indicator in K.CAREER_TITLE_INDICATORS:
        if indicator in title_lower:
            score += 0.3
            break
    for indicator in K.CAREER_CONTENT_INDICATORS:
        if indicator in content_lower:
            score += 0.1
            if score >= 0.6:
                break
    return min(score, 1.0)


def career_indicators(url: str, content_lower: str, title_lower: str) -> list[str]:
    """Indicator labels — scrapy_career_spider.py:548-579."""
    out: list[str] = []
    url_l = (url or "").lower()
    if "career" in url_l:
        out.append("URL contains career")
    if "job" in url_l:
        out.append("URL contains job")
    if "tuyen-dung" in url_l:
        out.append("URL contains tuyen-dung")
    if "career" in title_lower:
        out.append("Title contains career")
    if "job" in title_lower:
        out.append("Title contains job")
    if "apply" in content_lower:
        out.append("Content contains apply")
    if "position" in content_lower:
        out.append("Content contains position")
    if "hiring" in content_lower:
        out.append("Content contains hiring")
    return out


def company_from_url(url: str) -> str:
    """Company-from-URL (P11) — scrapy_career_spider.py:722-741."""
    try:
        domain = urlparse(url).netloc.lower()
        if domain.startswith("www."):
            domain = domain[4:]
        company = domain.split(".")[0]
        return company.title() if company else "Unknown"
    except Exception:
        return "Unknown"
