"""Spark-expression ↔ pure-Python parity on the fixture corpus.

Every built-in-expression reimplementation of a reference rule must agree
with its pure-Python twin (functions/urlrules.py, functions/textnorm.py)
on every fixture row — this is what makes the plain-Python golden crawl
simulator a valid oracle for the Spark crawl loop.
"""

import pytest
from pyspark.sql import functions as F

from crawler_ai_spark.functions import contacts as C
from crawler_ai_spark.functions import filters as FL
from crawler_ai_spark.functions import textnorm as T
from crawler_ai_spark.functions import urlrules as U
from crawler_ai_spark.functions.html import decoded_html, explode_links, with_parse
from crawler_ai_spark.functions.scoring import career_score_expr

EDGE_HREFS = [
    "#top", "javascript:void(0)", "mailto:a@b.c", "tel:+8491", "",
    "/careers", "/careers/", "/about", "/about-us", "/services", "/services/",
    "/blog/2024/05/post", "/x.pdf", "/x.json", "https://site1.example/jobs",
    "https://other.example/jobs", "//cdn.example/lib.js", "?page=2",
    "/tuyen-dung", "/contact-page", "/privacy", "/team", "/vi-tri/ky-su",
    "/jobs/123", "/positions?id=9", "/careers/senior-java-developer",
]


@pytest.fixture(scope="module")
def link_rows(spark, pages_sf0001):
    """(seed_host, href) pairs: every link in the corpus + crafted edges."""
    parsed = with_parse(pages_sf0001.select("url", "html"))
    links = explode_links(parsed).select(
        F.regexp_replace(F.regexp_replace("url", "^https://", ""), "/.*$", "").alias("seed_host"),
        "href",
    )
    edges = spark.createDataFrame(
        [("site1.example", h) for h in EDGE_HREFS], ["seed_host", "href"]
    )
    return links.unionByName(edges).where(F.col("href").isNotNull()).distinct().collect()


def test_is_valid_link_parity(spark, link_rows):
    df = spark.createDataFrame([(r.seed_host, r.href) for r in link_rows], ["seed_host", "href"])
    got = df.withColumn("v", FL.is_valid_link_expr(F.col("href"), F.col("seed_host"))).collect()
    for row in got:
        assert row.v == U.is_valid_link(row.href, row.seed_host), (row.href, row.seed_host)


def test_priority_parity(spark, link_rows):
    df = spark.createDataFrame([(r.href,) for r in link_rows], ["href"])
    got = df.withColumn("p", FL.priority_expr(F.col("href"))).collect()
    for row in got:
        assert row.p == U.link_priority(row.href), row.href


@pytest.fixture(scope="module")
def url_rows(spark, pages_sf0001, link_rows):
    """Absolute URLs: fixture page urls + canonicalized fixture links."""
    urls = {r.url for r in pages_sf0001.select("url").collect()}
    for r in link_rows:
        urls.add(U.canonicalize(f"https://{r.seed_host}/", r.href))
    urls |= {
        "https://careers.x.example/senior-dev", "https://careers.x.example/",
        "https://x.example/jobs/123", "https://x.example/a/789",
        "https://x.example/careers", "https://x.example/x?id=1",
    }
    return sorted(u for u in urls if u)


def test_is_job_url_parity(spark, url_rows):
    df = spark.createDataFrame([(u,) for u in url_rows], ["url"])
    got = df.withColumn("j", FL.is_job_url_expr(F.col("url"))).collect()
    for row in got:
        assert row.j == U.is_job_url(row.url), row.url


def test_homepage_and_company_parity(spark, url_rows):
    df = spark.createDataFrame([(u,) for u in url_rows], ["url"])
    got = df.select(
        "url",
        FL.is_homepage_expr(F.col("url")).alias("h"),
        FL.company_from_url_expr(F.col("url")).alias("c"),
    ).collect()
    for row in got:
        assert row.h == U.is_homepage(row.url), row.url
        assert row.c == U.company_from_url(row.url), row.url


def test_parse_udf_text_matches_fixture_golden(spark, pages_sf0001):
    """The byte-identical-text invariant over the whole sf0.001 corpus."""
    parsed = with_parse(pages_sf0001.select("url", "html", "text"))
    bad = parsed.where(
        ~(F.col("parse.text").eqNullSafe(F.col("text")))
    ).count()
    assert bad == 0


def test_career_listing_and_score_parity(spark, pages_sf0001):
    # scoring applies to fetched pages; fetch-error rows carry NULL html
    pages_sf0001 = pages_sf0001.where(F.col("html").isNotNull())
    parsed = with_parse(pages_sf0001.select("url", "html")).select(
        "url",
        decoded_html(F.col("html")).alias("raw"),
        F.col("parse.title").alias("title"),
    )
    content_lower = F.lower(F.col("raw"))
    title_lower = F.lower(F.col("title"))
    got = parsed.select(
        "url", "raw", "title",
        FL.is_career_listing_expr(F.col("url"), content_lower, title_lower).alias("listing"),
        career_score_expr(F.col("url"), content_lower, title_lower).alias("score"),
    ).collect()
    for row in got:
        cl, tl = row.raw.lower(), row.title.lower()
        assert row.listing == U.is_career_listing_page(row.url, cl, tl), row.url
        assert abs(row.score - U.career_score(row.url, cl, tl)) < 1e-9, row.url


def test_emails_parity(spark, pages_sf0001):
    pages_sf0001 = pages_sf0001.where(F.col("html").isNotNull())
    got = pages_sf0001.select(
        "url", C.emails_expr(decoded_html(F.col("html"))).alias("emails"), "html"
    ).collect()
    for row in got:
        expected = T.extract_emails(bytes(row.html).decode("utf-8", errors="ignore"))
        assert sorted(row.emails) == expected, row.url


def test_footer_phone_parity(spark, pages_sf0001):
    parsed = with_parse(pages_sf0001.select("url", "html"))
    got = parsed.select(
        "url",
        F.col("parse.footer_text").alias("ft"),
        C.phones_strict_expr(F.col("parse.footer_text")).alias("phones"),
        F.col("parse.footer_phones").alias("py_phones_full"),
        F.col("parse.footer_tel_hrefs").alias("tels"),
    ).collect()
    for row in got:
        # expression twin covers the text-regex part of the footer pipeline
        expected_text_phones = T.extract_phones_strict(row.ft)
        assert list(row.phones) == expected_text_phones, row.url
        # full footer pipeline (tel: links first) from the UDF
        tel_first = []
        for href in row.tels:
            n = T.clean_phone(href[4:])
            if n and n not in tel_first:
                tel_first.append(n)
        merged = list(dict.fromkeys(tel_first + expected_text_phones))
        assert list(row.py_phones_full) == merged, row.url
