"""Subdomain-search parity: the pure parts of the reference's
_smart_subdomain_search — _safe_domain, _is_subdomain_of and
_get_minimal_fallback_patterns (career_pages_service.py:56-77, :1093-1110)
— executed directly and compared against the Spark expressions, plus a
distribution probe on the registered catalog query."""

from __future__ import annotations

import sys
import types

import pytest
from pyspark.sql import functions as F

from crawler_ai_spark.functions import subdomains as SD

URLS = [
    "https://www.acme.vn/",
    "https://acme.vn/about",
    "https://app.acme.com.vn/x",
    "https://careers.sub.acme.io/jobs?y=1",
    "https://acme.io/",
    "https://www.portal.example.co.uk/path",
    "http://site9.example.com/",
    "https://a.b.c.d.example.org/",
]

HOST_PAIRS = [
    ("career.acme.vn", "acme.vn"),
    ("acme.vn", "acme.vn"),
    ("notacme.vn", "acme.vn"),
    ("x.acme.vn", "ACME.VN"),
    ("deep.sub.acme.vn", "acme.vn"),
    ("acme.vn.evil.com", "acme.vn"),
    ("cdn.site3.com.vn", "site3.com.vn"),
]


@pytest.fixture(scope="module")
def ref_cps():
    sys.modules.setdefault("bs4", types.ModuleType("bs4"))
    sys.modules["bs4"].BeautifulSoup = object
    sys.modules.setdefault("aiohttp", types.ModuleType("aiohttp"))
    sys.modules["aiohttp"].ClientSession = object
    sys.modules["aiohttp"].ClientTimeout = object
    sys.modules["aiohttp"].TCPConnector = object
    sys.path.insert(0, "/root/reference")
    from app.services.career_pages_service import CareerPagesService

    return CareerPagesService()


def test_root_domain_matches_reference(spark, ref_cps):
    expected = {u: ref_cps._safe_domain(u)[0] for u in URLS}
    df = spark.createDataFrame([(u,) for u in URLS], "url STRING")
    got = {
        r.url: r.root
        for r in df.select("url", SD.root_domain_expr(F.col("url")).alias("root")).collect()
    }
    assert got == expected, {k: (got[k], expected[k]) for k in got if got[k] != expected[k]}


def test_is_subdomain_of_matches_reference(spark, ref_cps):
    expected = {(h, r): ref_cps._is_subdomain_of(h, r) for h, r in HOST_PAIRS}
    df = spark.createDataFrame(HOST_PAIRS, "host STRING, root STRING")
    got = {
        (r.host, r.root): r.ok
        for r in df.select(
            "host", "root",
            # the reference lowercases both sides before comparing
            SD.is_subdomain_of_expr(F.lower("host"), F.lower("root")).alias("ok"),
        ).collect()
    }
    assert got == expected, {k: (got[k], expected[k]) for k in got if got[k] != expected[k]}


def test_fallback_patterns_match_reference(ref_cps):
    for root in ["acme.vn", "site3.com.vn", "example.org"]:
        want = ref_cps._get_minimal_fallback_patterns(root)
        got = [f"https://{t}.{root}" for t in SD.CAREER_SUBDOMAIN_TAGS]
        assert got == want


def test_catalog_distribution_is_not_degenerate(spark):
    from crawler_ai_spark.catalog import QUERIES

    df = QUERIES["subdomain_candidates"](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert len(rows) > 0
    by_source = {}
    for r in rows:
        by_source.setdefault(r.source, set()).add(r.candidate_url)
    # both sources present, and discovery found hosts the fallback never
    # generates (www./cdn./intranet. subdomains)
    assert set(by_source) == {"discovered", "fallback"}
    assert any(
        u.startswith(("https://www.", "https://cdn.", "https://intranet."))
        for u in by_source["discovered"]
    )
    # both root shapes appear
    urls = {r.candidate_url for r in rows}
    assert any(u.endswith(".com.vn") for u in urls)
    assert any(u.endswith(".vn") and not u.endswith(".com.vn") for u in urls)
