"""RSS/Atom feed discovery and entry extraction — the freshest URL
discovery channel a crawler has: a site's feed announces new content
hours before link graphs or sitemaps catch up (the reference's spider
only walks <a href>; this generalizes its link harvest the same way
sitemap_extract does, reference service analogy: sitemap handling in
crawl_service).

Discovery: <link rel="alternate" type="application/rss+xml|atom+xml"
href=…> in the page head. Extraction: RSS <item> blocks (link, title,
pubDate) and Atom <entry> blocks (link href=…, title, updated). All
pure-JVM regexps (Java regex supports the lazy quantifiers the block
split needs); no parse UDF."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --- discovery -------------------------------------------------------------

# attribute order varies; two patterns per concern, same approach as
# urls.canonical_link_expr
_FEED_TYPE = r"(?:application/(?:rss|atom)\+xml)"
_FEED_TYPE_HREF_RX = (
    rf"(?is)<link\b[^>]*\btype\s*=\s*[\"']?{_FEED_TYPE}[\"']?[^>]*"
    r"\bhref\s*=\s*[\"']?([^\"'\s>]+)"
)
_FEED_HREF_TYPE_RX = (
    rf"(?is)<link\b[^>]*\bhref\s*=\s*[\"']?([^\"'\s>]+)[\"']?[^>]*"
    rf"\btype\s*=\s*[\"']?{_FEED_TYPE}[\"']?"
)


def feed_link_expr(html: Column) -> Column:
    """First declared feed URL (<link type=application/rss+xml|atom+xml
    href=…>, either attribute order); NULL when the page declares none."""
    a = F.regexp_extract(html, _FEED_TYPE_HREF_RX, 1)
    b = F.regexp_extract(html, _FEED_HREF_TYPE_RX, 1)
    return F.when(a != "", a).when(b != "", b)


# --- extraction ------------------------------------------------------------

_RSS_ITEM_RX = r"(?is)<item\b.*?</item>"
_ATOM_ENTRY_RX = r"(?is)<entry\b.*?</entry>"
_RSS_LINK_RX = r"(?is)<link\s*>\s*([^<\s][^<]*?)\s*</link>"
_ATOM_LINK_RX = r"(?is)<link\b[^>]*\bhref\s*=\s*[\"']?([^\"'\s>]+)"
_TITLE_RX = r"(?is)<title\s*>\s*(.*?)\s*</title>"
_RSS_DATE_RX = r"(?is)<pubDate\s*>\s*(.*?)\s*</pubDate>"
_ATOM_DATE_RX = r"(?is)<updated\s*>\s*(.*?)\s*</updated>"


def _nullif_empty(c: Column) -> Column:
    return F.nullif(c, F.lit(""))


def feed_entries(feeds: DataFrame, xml_col: str = "xml") -> DataFrame:
    """One row per feed entry: (…input cols, entry_pos, entry_url,
    entry_title, entry_date_raw). Handles RSS 2.0 (<item><link>text)
    and Atom (<entry><link href=…>); a document may be either. The
    block split and field pulls are regexp_extract_all/regexp_extract —
    map-side, no shuffle; posexplode keeps per-feed entry order."""
    xml = F.coalesce(F.col(xml_col), F.lit(""))
    # Column-arg regexp_extract_all (not F.expr): a SQL string literal
    # would eat the \b escapes in the patterns
    blocks = F.concat(
        F.regexp_extract_all(xml, F.lit(_RSS_ITEM_RX), F.lit(0)),
        F.regexp_extract_all(xml, F.lit(_ATOM_ENTRY_RX), F.lit(0)),
    )
    out = feeds.withColumn("_blocks", blocks).select(
        *[c for c in feeds.columns],
        F.posexplode("_blocks").alias("entry_pos", "_block"),
    )
    b = F.col("_block")
    return out.select(
        *[c for c in feeds.columns],
        "entry_pos",
        F.coalesce(
            _nullif_empty(F.regexp_extract(b, _RSS_LINK_RX, 1)),
            _nullif_empty(F.regexp_extract(b, _ATOM_LINK_RX, 1)),
        ).alias("entry_url"),
        _nullif_empty(F.regexp_extract(b, _TITLE_RX, 1)).alias("entry_title"),
        F.coalesce(
            _nullif_empty(F.regexp_extract(b, _RSS_DATE_RX, 1)),
            _nullif_empty(F.regexp_extract(b, _ATOM_DATE_RX, 1)),
        ).alias("entry_date_raw"),
    )
