"""RFC 9309 §2.2.3 special characters in robots rules — '*' (any octet
sequence) and trailing '$' (end-of-path anchor) — through parse_robots →
apply_robots, plus global Sitemap: line extraction. Cases mirror the
RFC/Google matcher documentation examples."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_ai_spark.operators.frontier import apply_robots
from crawler_ai_spark.sources.robots import parse_robots


def _gate(spark, body: str, paths: list[str], with_allow: bool = True) -> set[str]:
    rules = parse_robots(
        spark.createDataFrame([("h.example", body)], ["host", "body"]),
        with_allow=with_allow,
    )
    frontier = spark.createDataFrame(
        [(f"https://h.example{p}", "h.example") for p in paths], ["url", "host"]
    )
    kept = apply_robots(frontier, rules)
    return {r.url.split("h.example", 1)[1] for r in kept.collect()}


def test_star_matches_any_sequence(spark):
    body = "User-agent: *\nDisallow: /*.php"
    paths = ["/index.php", "/folder/file.php", "/index.php5", "/page", "/"]
    kept = _gate(spark, body, paths)
    # '^/.*\.php' is a PREFIX match: .php5 still matches the prefix
    assert kept == {"/page", "/"}


def test_trailing_dollar_anchors_the_end(spark):
    body = "User-agent: *\nDisallow: /*.php$"
    paths = ["/filename.php", "/filename.php5", "/php", "/a.php/b"]
    kept = _gate(spark, body, paths)
    assert kept == {"/filename.php5", "/php", "/a.php/b"}


def test_star_inside_rule(spark):
    body = "User-agent: *\nDisallow: /fish*.php"
    paths = ["/fishheads/catfish.php", "/fish.php", "/fish/x.html", "/catfish.php"]
    kept = _gate(spark, body, paths)
    assert kept == {"/fish/x.html", "/catfish.php"}


def test_plain_prefix_rules_unchanged(spark):
    body = "User-agent: *\nDisallow: /fish"
    paths = ["/fish", "/fishheads", "/fish/salmon", "/Fish", "/catfish"]
    kept = _gate(spark, body, paths)
    assert kept == {"/Fish", "/catfish"}  # case-sensitive, prefix-only


def test_wildcard_longest_match_precedence(spark):
    # allow rule is longer (more octets) than the disallow → allow wins
    body = "User-agent: *\nDisallow: /*.php\nAllow: /page.php$"
    paths = ["/page.php", "/other.php"]
    kept = _gate(spark, body, paths)
    assert kept == {"/page.php"}


def test_nontrailing_dollar_is_literal(spark):
    body = "User-agent: *\nDisallow: /a$b"
    paths = ["/a$b/c", "/ab", "/a"]
    kept = _gate(spark, body, paths)
    assert kept == {"/ab", "/a"}


def test_regex_metachars_in_rules_are_literal(spark):
    body = "User-agent: *\nDisallow: /a(b)+c*z"
    paths = ["/a(b)+c123z", "/abbc"]
    kept = _gate(spark, body, paths)
    assert kept == {"/abbc"}


def test_sitemap_lines_are_global(spark):
    body = (
        "Sitemap: https://h.example/sitemap.xml\n"
        "User-agent: googlebot\nDisallow: /g\n"
        "User-agent: *\nDisallow: /x\n"
        "sitemap: https://h.example/sitemap2.xml\n"
    )
    rules = parse_robots(
        spark.createDataFrame([("h.example", body)], ["host", "body"]),
        with_sitemaps=True,
    ).collect()[0]
    assert sorted(rules.sitemap_urls) == [
        "https://h.example/sitemap.xml",
        "https://h.example/sitemap2.xml",
    ]
    assert list(rules.disallow_prefixes) == ["/x"]


def _sitemap_corpus(spark, tmp_path):
    """TableTransport corpus: an index → two child sitemaps → page URLs,
    plus a self-referencing index (cycle) and a missing child (404)."""
    h = "https://sm.example"

    def urlset(*locs):
        inner = "".join(f"<url><loc>{u}</loc></url>" for u in locs)
        return f'<?xml version="1.0"?><urlset>{inner}</urlset>'.encode()

    def index(*locs):
        inner = "".join(f"<sitemap><loc>{u}</loc></sitemap>" for u in locs)
        return f'<?xml version="1.0"?><sitemapindex>{inner}</sitemapindex>'.encode()

    rows = [
        (f"{h}/sitemap.xml", index(f"{h}/sm-a.xml", f"{h}/sm-b.xml",
                                    f"{h}/sitemap.xml", f"{h}/missing.xml"), 200, None),
        (f"{h}/sm-a.xml", urlset(f"{h}/p/1", f"{h}/p/2"), 200, None),
        (f"{h}/sm-b.xml", index(f"{h}/sm-c.xml"), 200, None),
        (f"{h}/sm-c.xml", urlset(f"{h}/p/3"), 200, None),
    ]
    path = str(tmp_path / "sitemap_pages.parquet")
    spark.createDataFrame(
        rows, "url string, html binary, status int, fetch_error string"
    ).write.mode("overwrite").parquet(path)
    rules = spark.createDataFrame(
        [("sm.example", [f"{h}/sitemap.xml"])], "host string, sitemap_urls array<string>"
    )
    return path, rules, h


def test_sitemap_index_recursion_bounded(spark, tmp_path):
    from crawler_ai_spark.sources.fetch import TableTransport
    from crawler_ai_spark.sources.robots import expand_sitemaps

    path, rules, h = _sitemap_corpus(spark, tmp_path)
    t = TableTransport(path)

    # depth 1 (default, old flat behavior): every <loc> of the root index
    flat = {r.url for r in expand_sitemaps(rules, t).collect()}
    assert flat == {f"{h}/sm-a.xml", f"{h}/sm-b.xml", f"{h}/sitemap.xml", f"{h}/missing.xml"}

    # depth 3: full expansion — pages only; the cycle back to the root
    # index and the 404 child contribute nothing and terminate
    deep = {r.url for r in expand_sitemaps(rules, t, max_depth=3).collect()}
    assert deep == {f"{h}/p/1", f"{h}/p/2", f"{h}/p/3"}

    # depth 2: sm-b's child index is depth-capped and surfaces as a
    # candidate instead of silently disappearing
    mid = {r.url for r in expand_sitemaps(rules, t, max_depth=2).collect()}
    assert mid == {f"{h}/p/1", f"{h}/p/2", f"{h}/sm-c.xml"}
