"""W3 — RFC 9309 §2.3.1.4 availability semantics for live robots:
UNAVAILABLE (4xx) = unrestricted; UNREACHABLE (5xx / transport failure)
= complete disallow when robots_unreachable_disallow is on."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_ai_spark.plans.crawl_loop import CrawlConfig, CrawlStore, run_crawl
from crawler_ai_spark.sources.robots import fetch_robots, parse_robots

_PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, lang string, "
    "status int, fetch_error string"
)


def _frontier(spark):
    return spark.createDataFrame(
        [(f"https://{h}.example/", f"{h}.example") for h in ("ok", "gone", "err", "down")],
        "url string, host string",
    )


def _robots_transport():
    def transport(url, headers):
        if url.startswith("https://ok.example/"):
            return 200, b"User-agent: *\nDisallow: /private", None
        if url.startswith("https://gone.example/"):
            return 404, None, "404 not found"
        if url.startswith("https://err.example/"):
            return 503, None, "503 service unavailable"
        return None, None, "Connection timeout after 15s"

    return transport


def test_fetch_robots_availability_classes(spark):
    f = _frontier(spark)
    strict = {
        r.host: r.body
        for r in fetch_robots(
            f, _robots_transport(), unreachable_disallow_all=True
        ).collect()
    }
    assert strict["ok.example"] == "User-agent: *\nDisallow: /private"
    assert strict["gone.example"] == ""  # 4xx unavailable → unrestricted
    assert strict["err.example"] == "User-agent: *\nDisallow: /"
    assert strict["down.example"] == "User-agent: *\nDisallow: /"
    # the synthetic body parses to a complete disallow
    rules = {
        r.host: r.disallow_prefixes
        for r in parse_robots(
            fetch_robots(f, _robots_transport(), unreachable_disallow_all=True)
        ).collect()
    }
    assert rules["err.example"] == ["/"] and rules["gone.example"] == []

    # default (permissive) reading: every failure class is unrestricted
    loose = {
        r.host: r.body for r in fetch_robots(f, _robots_transport()).collect()
    }
    assert loose["err.example"] == "" and loose["down.example"] == ""


def _page_transport():
    """Robots per host: ok → permissive rules, err → 500. Pages: 200."""

    def transport(url, headers):
        if url.endswith("/robots.txt"):
            if url.startswith("https://err."):
                return 500, None, "500 internal server error"
            return 200, b"User-agent: *\nDisallow: /private", None
        return 200, b"<html><head><title>t</title></head><body>p</body></html>", None

    return transport


def test_unreachable_robots_gates_host_in_loop(spark, tmp_path_factory):
    pages = spark.createDataFrame([], _PAGES_SCHEMA)
    seeds = spark.createDataFrame(
        [("https://ok.example/", 10, 5), ("https://err.example/", 10, 5)],
        ["seed_url", "max_pages", "max_career_pages"],
    )

    def run(strict):
        root = tmp_path_factory.mktemp(f"robots5xx_{strict}")
        res = run_crawl(
            spark, pages, seeds, root,
            CrawlConfig(
                max_batches=2, parallelism=4,
                live_transport=_page_transport(),
                live_robots=True,
                robots_unreachable_disallow=strict,
            ),
        )
        vis = CrawlStore(spark, root).read_all("visited", res["last_batch"])
        return {r.url for r in vis.collect()}

    strict_urls = run(True)
    assert "https://ok.example/" in strict_urls
    assert not any(u.startswith("https://err.") for u in strict_urls)
    loose_urls = run(False)
    assert "https://err.example/" in loose_urls


def test_ua_token_group_selection(spark):
    """RFC 9309 §2.2.1 — unit coverage of the parser's group selection
    (the catalog row robots_ua_groups drives the same cases through the
    driver gate)."""
    from crawler_ai_spark.sources.robots import parse_robots

    bodies = [
        ("override", "User-agent: *\nDisallow: /a\n"
                     "User-agent: crawler-ai\nDisallow: /bot"),
        ("fallback", "User-agent: *\nDisallow: /a\n"
                     "User-agent: Googlebot\nDisallow: /g"),
        ("empty_token", "User-agent: *\nDisallow: /a\nUser-agent: crawler-ai\n"),
        ("shared", "User-agent: Googlebot\nUser-agent: crawler-ai\n"
                   "Disallow: /shared\nUser-agent: *\nDisallow: /a"),
        ("case", "USER-AGENT: Crawler-AI\nDisallow: /case\n"
                 "User-agent: *\nDisallow: /a"),
    ]
    df = spark.createDataFrame(bodies, ["host", "body"])
    got = {
        r.host: r.disallow_prefixes
        for r in parse_robots(df, ua_token="crawler-ai").collect()
    }
    assert got == {
        "override": ["/bot"],
        "fallback": ["/a"],
        "empty_token": [],
        "shared": ["/shared"],
        "case": ["/case"],
    }
    # without a token the star reading is unchanged
    star = {r.host: r.disallow_prefixes for r in parse_robots(df).collect()}
    assert star["override"] == ["/a"] and star["case"] == ["/a"]


def test_ua_token_group_at_eof_without_newline(spark):
    """A token header that is the file's LAST line (no trailing newline)
    still selects — its empty rule block means allow-all (review finding:
    the group regex used to require a trailing \\n)."""
    from crawler_ai_spark.sources.robots import parse_robots

    df = spark.createDataFrame(
        [("h", "User-agent: *\nDisallow: /a\nUser-agent: crawler-ai")],
        ["host", "body"],
    )
    got = parse_robots(df, ua_token="crawler-ai").collect()[0]
    assert got.disallow_prefixes == []
