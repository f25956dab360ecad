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
