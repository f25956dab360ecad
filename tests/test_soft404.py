"""Soft-404 gate + rel=canonical extraction — row-local semantics pinned
at the function level (the catalog queries `soft404_detect` /
`canonical_link_collapse` oracle-check the same logic at 500 rows)."""

from pyspark.sql import functions as F

from crawler_ai_spark.functions.soft404 import is_soft404
from crawler_ai_spark.functions.urls import canonical_link_expr


def _soft(spark, rows):
    df = spark.createDataFrame(rows, "status int, title string, text string")
    return [
        r.v
        for r in df.select(
            is_soft404(F.col("status"), F.col("title"), F.col("text")).alias("v")
        ).collect()
    ]


def test_soft404_classes(spark):
    long_quoting = "lorem ipsum " * 60 + "our 404 error rate fell last year"
    rows = [
        # title phrase → soft404 regardless of body length
        (200, "Page Not Found - Acme", "x" * 2000),
        # body phrase + short page → soft404
        (200, "Products", "the page you requested could not be found."),
        # body phrase on a LONG page (an article quoting an error) → clean
        (200, "Annual report", long_quoting),
        # healthy page
        (200, "Welcome", "plain content"),
        # hard 404: already an error, not a SOFT 404
        (404, "Not Found", "gone"),
        # null title, phrase-bearing short body
        (200, None, "this page does not exist"),
        # null status (transport error) → not soft404
        (None, "Page Not Found", "x"),
    ]
    assert _soft(spark, rows) == [True, True, False, False, False, True, False]


def test_canonical_link_attribute_orders(spark):
    t = "https://example.com/canonical"
    rows = [
        # rel-then-href, double quotes
        (f'<link rel="canonical" href="{t}">', t),
        # href-then-rel, single quotes
        (f"<link href='{t}' rel='canonical'>", t),
        # unquoted, uppercase tag/attrs
        (f"<LINK REL=canonical HREF={t}>", t),
        # extra attributes between rel and href
        (f'<link rel="canonical" data-x="1" href="{t}" />', t),
        # alternate rel — not canonical
        (f'<link rel="alternate" href="{t}">', None),
        # no link element
        ("<html><body>hi</body></html>", None),
        (None, None),
    ]
    df = spark.createDataFrame([(h,) for h, _ in rows], "html string")
    got = [r.c for r in df.select(canonical_link_expr(F.col("html")).alias("c")).collect()]
    assert got == [want for _, want in rows]
