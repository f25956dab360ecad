"""Page-level Robots Exclusion Protocol — meta robots, X-Robots-Tag,
and rel=nofollow link annotations.

robots.txt (operators/robots + the catalog's robots_* family) is the
*host*-level REP; publishers also declare per-PAGE directives that a
web-scale crawler must honor:

- ``<meta name="robots" content="noindex, nofollow">`` — HTML standard
  / REP extension; ``none`` ≡ ``noindex, nofollow``; multiple tags
  union (most restrictive wins, the documented Google/Bing behavior).
- ``X-Robots-Tag`` response header — same directives for non-HTML.
- ``rel="nofollow"`` (and the 2019 ``ugc`` / ``sponsored`` refinements)
  on individual anchors — the link is not an endorsement; a polite
  frontier does not enqueue it.

The reference crawls only opted-in company sites so it never checks
these; at Common-Crawl scale they are mandatory politeness semantics
(cf. reference's robots-adjacent gates, scrapy_career_spider.py
same-domain rules). Everything here is JVM regexp + higher-order array
functions — no Python in the path, whole-stage-codegen friendly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# one <meta ...> tag, any attribute order/case, dotall
_META_RX = r"(?is)<meta\b[^>]*>"
# anchor attribute blob (href/rel extracted per element)
_ANCHOR_RX = r"(?is)<a\b([^>]*)>"
_NAME_ROBOTS_RX = r"(?i)\bname\s*=\s*[\"']?\s*robots\b"


def _attr_value(attrs: Column, name: str) -> Column:
    """Value of an HTML attribute out of a tag's attribute blob:
    double-quoted, single-quoted, or unquoted; '' when absent."""
    dq = F.regexp_extract(attrs, rf'(?is)\b{name}\s*=\s*"([^"]*)"', 1)
    sq = F.regexp_extract(attrs, rf"(?is)\b{name}\s*=\s*'([^']*)'", 1)
    uq = F.regexp_extract(attrs, rf"(?is)\b{name}\s*=\s*([^\s\"'>]+)", 1)
    return F.when(dq != "", dq).when(sq != "", sq).otherwise(uq)


def _has_token(value: Column, token: str) -> Column:
    """True when a comma/space/colon-separated directive list contains
    `token` (colon admits the header's optional `ua:` prefix form)."""
    return F.coalesce(value, F.lit("")).rlike(
        rf"(?i)(^|[,:\s])\s*{token}\s*($|[,:\s])"
    )


def _directive(blocks: Column, token: str) -> Column:
    # `none` ≡ noindex + nofollow (REP meta spec)
    return F.exists(
        blocks,
        lambda b: _has_token(_attr_value(b, "content"), token)
        | _has_token(_attr_value(b, "content"), "none"),
    )


def meta_robots_expr(html: Column) -> Column:
    """struct(noindex boolean, nofollow boolean) from every
    <meta name=robots> tag in the page; multiple tags union."""
    metas = F.regexp_extract_all(
        F.coalesce(html, F.lit("")), F.lit(_META_RX), F.lit(0)
    )
    robots = F.filter(metas, lambda m: m.rlike(_NAME_ROBOTS_RX))
    return F.struct(
        _directive(robots, "noindex").alias("noindex"),
        _directive(robots, "nofollow").alias("nofollow"),
    )


def x_robots_expr(header: Column) -> Column:
    """struct(noindex, nofollow) from an X-Robots-Tag header value
    (comma-separated directives, optional `ua:` prefixes)."""
    return F.struct(
        (_has_token(header, "noindex") | _has_token(header, "none")).alias(
            "noindex"
        ),
        (_has_token(header, "nofollow") | _has_token(header, "none")).alias(
            "nofollow"
        ),
    )


def rel_links_expr(html: Column) -> Column:
    """array<struct<href string, nofollow boolean>> — every anchor with
    an href, document order; nofollow=true when rel contains any of
    nofollow/ugc/sponsored. Map-side; pair with the page-level structs
    to decide which outlinks enter the frontier."""
    anchors = F.regexp_extract_all(
        F.coalesce(html, F.lit("")), F.lit(_ANCHOR_RX), F.lit(1)
    )
    links = F.transform(
        anchors,
        lambda a: F.struct(
            _attr_value(a, "href").alias("href"),
            (
                _has_token(_attr_value(a, "rel"), "nofollow")
                | _has_token(_attr_value(a, "rel"), "ugc")
                | _has_token(_attr_value(a, "rel"), "sponsored")
            ).alias("nofollow"),
        ),
    )
    return F.filter(links, lambda l: l["href"] != "")


def followable_hrefs(html: Column, x_robots: Column | None = None) -> Column:
    """array<string> of hrefs the REP permits following: empty when the
    page (meta robots or X-Robots-Tag) says nofollow, else every anchor
    href not individually rel-nofollow'd."""
    page_nf = meta_robots_expr(html)["nofollow"]
    if x_robots is not None:
        page_nf = page_nf | x_robots_expr(x_robots)["nofollow"]
    kept = F.filter(rel_links_expr(html), lambda l: ~l["nofollow"])
    return F.when(page_nf, F.array().cast("array<string>")).otherwise(
        F.transform(kept, lambda l: l["href"])
    )


# ---------------------------------------------------------------------------
# Pure-Python twins for the golden crawl simulator (tests/golden_crawl)
# — same regexes, same token semantics, so the Spark loop's REP gate can
# be pinned bit-for-bit against a sequential model (the pattern every
# loop gate in this repo follows).
# ---------------------------------------------------------------------------

import re as _re

_PY_META = _re.compile(_META_RX)
_PY_ANCHOR = _re.compile(_ANCHOR_RX)
_PY_NAME_ROBOTS = _re.compile(_NAME_ROBOTS_RX)


def _py_attr(attrs: str, name: str) -> str:
    m = _re.search(rf'(?is)\b{name}\s*=\s*"([^"]*)"', attrs)
    if m:
        return m.group(1)
    m = _re.search(rf"(?is)\b{name}\s*=\s*'([^']*)'", attrs)
    if m:
        return m.group(1)
    m = _re.search(rf"(?is)\b{name}\s*=\s*([^\s\"'>]+)", attrs)
    return m.group(1) if m else ""


def _py_has_token(value: str, token: str) -> bool:
    return bool(
        _re.search(rf"(?i)(^|[,:\s])\s*{token}\s*($|[,:\s])", value or "")
    )


def py_meta_robots(html: str | None) -> tuple[bool, bool]:
    """(noindex, nofollow) — twin of meta_robots_expr."""
    noindex = nofollow = False
    for m in _PY_META.finditer(html or ""):
        tag = m.group(0)
        if not _PY_NAME_ROBOTS.search(tag):
            continue
        content = _py_attr(tag, "content")
        none = _py_has_token(content, "none")
        noindex = noindex or none or _py_has_token(content, "noindex")
        nofollow = nofollow or none or _py_has_token(content, "nofollow")
    return noindex, nofollow


def py_nofollow_hrefs(html: str | None) -> set[str]:
    """hrefs of rel=nofollow/ugc/sponsored anchors — twin of
    rel_links_expr's nofollow=true subset."""
    out: set[str] = set()
    for m in _PY_ANCHOR.finditer(html or ""):
        attrs = m.group(1)
        href = _py_attr(attrs, "href")
        if not href:
            continue
        rel = _py_attr(attrs, "rel")
        if any(_py_has_token(rel, t) for t in ("nofollow", "ugc", "sponsored")):
            out.add(href)
    return out
