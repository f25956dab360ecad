"""Open Graph / Twitter-card metadata extraction — JVM-side column
expressions over the raw markup string.

The reference extracts page metadata ad hoc (title + meta description,
app/services/crawler.py:330-386); social-preview metadata is the other
half of the de-facto page-metadata surface on the public web (the Open
Graph protocol, ogp.me, and Twitter's card tags), and a webtext corpus
pipeline wants it for title/description/image enrichment and for
document-type routing (og:type article vs website vs video).

Semantics (mirroring the meta[name=description] rule in
functions/textnorm.py:207-208): FIRST matching tag wins; property= (OG)
or name= (Twitter) attribute; single- or double-quoted values; the
content attribute may precede or follow the property attribute. Pure
`regexp_extract` — whole-stage-codegen-friendly, no Python."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# attribute-order variants: property-then-content and content-then-property,
# each with double- or single-quoted content
_PROP_THEN_CONTENT_DQ = (
    r'(?is)<meta\b[^>]*\b{attr}\s*=\s*["\']{prop}["\'][^>]*\bcontent\s*=\s*"([^"]*)"'
)
_PROP_THEN_CONTENT_SQ = (
    r"(?is)<meta\b[^>]*\b{attr}\s*=\s*[\"']{prop}[\"'][^>]*\bcontent\s*=\s*'([^']*)'"
)
_CONTENT_THEN_PROP_DQ = (
    r'(?is)<meta\b[^>]*\bcontent\s*=\s*"([^"]*)"[^>]*\b{attr}\s*=\s*["\']{prop}["\']'
)
_CONTENT_THEN_PROP_SQ = (
    r"(?is)<meta\b[^>]*\bcontent\s*=\s*'([^']*)'[^>]*\b{attr}\s*=\s*[\"']{prop}[\"']"
)


def _meta_content(html: Column, attr: str, prop: str) -> Column:
    """First <meta {attr}={prop} content=...> value, '' if absent."""
    import re as _re

    quoted = _re.escape(prop)
    variants = [
        rx.format(attr=attr, prop=quoted)
        for rx in (
            _PROP_THEN_CONTENT_DQ,
            _PROP_THEN_CONTENT_SQ,
            _CONTENT_THEN_PROP_DQ,
            _CONTENT_THEN_PROP_SQ,
        )
    ]
    # first non-empty across the order/quote variants; regexp_extract
    # itself returns the FIRST match in document order within a variant
    out = F.regexp_extract(html, variants[0], 1)
    for rx in variants[1:]:
        out = F.when(out != "", out).otherwise(F.regexp_extract(html, rx, 1))
    return F.trim(out)


def og_expr(html: Column, prop: str) -> Column:
    """Open Graph value: <meta property="og:{prop}" content="...">."""
    return _meta_content(html, "property", f"og:{prop}")


def twitter_expr(html: Column, prop: str) -> Column:
    """Twitter-card value: <meta name="twitter:{prop}" content="...">."""
    return _meta_content(html, "name", f"twitter:{prop}")


OG_PROPS = ("title", "description", "type", "image", "url", "site_name")


def with_og_metadata(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Attach og_title..og_site_name + twitter_card columns. `html_col`
    may be BINARY (decoded JVM-side) or STRING."""
    from crawler_ai_spark.functions.html import decoded_html

    field = df.schema[html_col].dataType.typeName()
    html = decoded_html(F.col(html_col)) if field == "binary" else F.col(html_col)
    for p in OG_PROPS:
        df = df.withColumn(f"og_{p}", og_expr(html, p))
    return df.withColumn("twitter_card", twitter_expr(html, "card"))
