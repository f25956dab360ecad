"""Yandex Clean-param (sources/robots.py with_clean_param +
functions/urls.clean_param_strip_expr): parse shapes, path scoping,
query rebuild edge cases. Cross-engine identity is pinned by the
catalog's robots_clean_param oracle row."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_ai_spark.functions.urls import clean_param_strip_expr
from crawler_ai_spark.sources.robots import parse_robots


def _rules(spark, body):
    df = spark.createDataFrame([("h", body)], ["host", "body"])
    return parse_robots(df, with_clean_param=True).collect()[0]


def test_parse_shapes(spark):
    r = _rules(
        spark,
        "User-agent: *\nDisallow: /x\n"
        "Clean-param: sid&ref /products\n"
        "clean-param:   utm\n"          # case-insensitive, loose spacing
        "Clean-param: sid&ref /products\n",  # duplicate collapses
    )
    assert [(e.params_csv, e.prefix) for e in r.clean_params] == [
        ("sid&ref", "/products"),
        ("utm", "/"),
    ]
    assert r.disallow_prefixes == ["/x"]  # existing outputs untouched


def test_absent_directive_gives_empty_array(spark):
    r = _rules(spark, "User-agent: *\nDisallow:\n")
    assert r.clean_params == []


def _clean(spark, rules_body, urls):
    rules = parse_robots(
        spark.createDataFrame([("h", rules_body)], ["host", "body"]),
        with_clean_param=True,
    )
    df = spark.createDataFrame([(u,) for u in urls], "url string").crossJoin(
        F.broadcast(rules.select("clean_params"))
    )
    return [
        r.c
        for r in df.select(
            clean_param_strip_expr(F.col("url"), F.col("clean_params")).alias("c")
        ).collect()
    ]


def test_strip_semantics(spark):
    body = "User-agent: *\nClean-param: sid&ref /products\nClean-param: utm\n"
    got = _clean(
        spark,
        body,
        [
            "https://h/products/1?sid=9&color=red&ref=t",   # scoped strip
            "https://h/blog/1?sid=9&q=2",                   # out of scope
            "https://h/products/2?sid=9",                   # query empties
            "https://h/anything?utm=x&q=1",                 # global rule
            "https://h/products/3",                         # no query
        ],
    )
    assert got == [
        "https://h/products/1?color=red",
        "https://h/blog/1?sid=9&q=2",
        "https://h/products/2",
        "https://h/anything?q=1",
        "https://h/products/3",
    ]


def test_null_rules_pass_through(spark):
    df = spark.createDataFrame([("https://h/a?x=1",)], "url string").withColumn(
        "clean_params",
        F.lit(None).cast("array<struct<params_csv:string,prefix:string>>"),
    )
    got = df.select(
        clean_param_strip_expr(F.col("url"), F.col("clean_params")).alias("c")
    ).collect()[0].c
    assert got == "https://h/a?x=1"
