"""Soft-404 gate + rel=canonical extraction — row-local semantics pinned
at the function level (the catalog queries `soft404_detect` /
`canonical_link_collapse` oracle-check the same logic at 500 rows),
plus the crawl loop's opt-in soft404_filter."""

from pyspark.sql import functions as F

from crawler_ai_spark.functions.soft404 import is_soft404
from crawler_ai_spark.functions.urls import canonical_link_expr
from crawler_ai_spark.plans.crawl_loop import CrawlConfig, CrawlStore, run_crawl
from crawler_ai_spark.sources import fetch as FS


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


_S404_HOST = "ghost0.example"


def _soft404_transport():
    """200 + not-found content (with a live link) for the ghost host;
    synthetic elsewhere. Closure so cloudpickle ships it by value."""
    ghost = _S404_HOST

    def transport(url, headers):
        if ghost in url:
            body = (
                "<html><head><title>Page Not Found - Ghost</title></head>"
                '<body>this page does not exist <a href="/trap-link">x</a>'
                "</body></html>"
            )
            return 200, body.encode(), None, {}
        return FS.SyntheticTransport()(url, headers)

    return transport


def test_soft404_filter_suppresses_links_in_loop(spark, tmp_path_factory):
    """A 200 not-found page is flagged in visited and yields no links
    when the gate is on; off, its links expand the frontier."""
    pages = spark.createDataFrame(
        [],
        "url string, warc_ts timestamp, html binary, lang string, "
        "status int, fetch_error string",
    )
    seeds = spark.createDataFrame(
        [(f"https://{_S404_HOST}/", 20, 5)],
        ["seed_url", "max_pages", "max_career_pages"],
    )

    def run(flag):
        root = tmp_path_factory.mktemp(f"s404_{flag}")
        res = run_crawl(
            spark, pages, seeds, root,
            CrawlConfig(
                parallelism=4, max_batches=3,
                live_transport=_soft404_transport(),
                soft404_filter=flag,
            ),
        )
        vis = CrawlStore(spark, root).read_all("visited", res["last_batch"])
        return {r.url: r for r in vis.collect()}

    on = run(True)
    root_row = on[f"https://{_S404_HOST}/"]
    assert root_row.soft404 and root_row.fetched and not root_row.is_career_page
    assert not any("/trap-link" in u for u in on)  # no links harvested

    off = run(False)
    assert not off[f"https://{_S404_HOST}/"].soft404
    assert any("/trap-link" in u for u in off)  # gate off: link expands
