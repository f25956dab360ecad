"""RSS/Atom feed discovery + entry extraction — edge semantics pinned at
the function level (catalog `feed_discover` / `feed_entries_extract`
oracle-check the same logic at 500/750 rows)."""

from pyspark.sql import functions as F

from crawler_ai_spark.functions.feeds import feed_entries, feed_link_expr


def test_feed_link_variants(spark):
    rows = [
        ('<link rel="alternate" type="application/rss+xml" href="/f.xml">', "/f.xml"),
        ("<link href='/a.xml' type='application/atom+xml'>", "/a.xml"),
        ("<LINK TYPE=application/rss+xml HREF=/up.xml>", "/up.xml"),
        ('<link rel="stylesheet" type="text/css" href="/m.css">', None),
        ('<link rel="alternate" type="application/json" href="/x">', None),
        ("<html>no links</html>", None),
        (None, None),
    ]
    df = spark.createDataFrame([(h,) for h, _ in rows], "html string")
    got = [r.f for r in df.select(feed_link_expr(F.col("html")).alias("f")).collect()]
    assert got == [want for _, want in rows]


def test_feed_entries_mixed_and_malformed(spark):
    rss = (
        "<rss><channel><title>Chan</title>"
        "<item><title> A </title><link> https://s/1 </link>"
        "<pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate></item>"
        "<item><link>https://s/2</link></item>"  # no title, no date
        "</channel></rss>"
    )
    atom = (
        '<feed><entry><title>B</title><link href="https://s/3"/>'
        "<updated>2024-01-01T00:00:00Z</updated></entry></feed>"
    )
    df = spark.createDataFrame(
        [(0, rss), (1, atom), (2, "<html>not a feed</html>"), (3, None)],
        "id int, xml string",
    )
    got = {
        (r.id, r.entry_pos): (r.entry_url, r.entry_title, r.entry_date_raw)
        for r in feed_entries(df).collect()
    }
    assert got == {
        (0, 0): ("https://s/1", "A", "Mon, 01 Jan 2024 00:00:00 GMT"),
        (0, 1): ("https://s/2", None, None),
        (1, 0): ("https://s/3", "B", "2024-01-01T00:00:00Z"),
    }
