"""Soft-404 detection — pages that answer HTTP 200 with "not found"
content. Misconfigured servers do this constantly at web scale (Bar-
Yossef et al. 2004, "Sic Transit Gloria Telae", measured ~25%+ of dead
links answering 200), and a crawler that trusts the status code stores
error boilerplate as corpus text and keeps recrawling ghosts.

Row-local JVM expressions over (status, title, text): a strong phrase
hit in the TITLE marks the page outright; a body phrase only counts on
suspiciously short pages (real articles QUOTE error phrases; error pages
are short). Both signals and the final verdict are pure codegen —
oracle-expressible, no Python."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# phrase lists matched lowercase; title hits are authoritative, body
# hits need the short-page gate
TITLE_PHRASES = (
    "404", "not found", "page not found", "page doesn't exist",
    "page does not exist", "no longer available", "page unavailable",
    "error 404", "oops",
)

BODY_PHRASES = (
    "page not found", "page you requested could not be found",
    "page you are looking for does not exist",
    "page you're looking for doesn't exist",
    "this page doesn't exist", "this page does not exist",
    "404 error", "error 404", "no longer available",
    "has been removed or is temporarily unavailable",
)

# error pages are short; long pages merely MENTION errors
SHORT_BODY_CHARS = 512


def _any_phrase(col: Column, phrases: tuple[str, ...]) -> Column:
    low = F.lower(F.coalesce(col, F.lit("")))
    hit = F.lit(False)
    for p in phrases:
        hit = hit | low.contains(p)
    return hit


def soft404_signals(status: Column, title: Column, text: Column) -> dict[str, Column]:
    body = F.coalesce(text, F.lit(""))
    return {
        "title_hit": _any_phrase(title, TITLE_PHRASES),
        "body_hit": _any_phrase(text, BODY_PHRASES),
        "short_body": F.length(F.trim(body)) < SHORT_BODY_CHARS,
    }


def is_soft404(status: Column, title: Column, text: Column) -> Column:
    """TRUE iff the server said 200 but the content says not-found."""
    s = soft404_signals(status, title, text)
    return status.eqNullSafe(200) & (
        s["title_hit"] | (s["body_hit"] & s["short_body"])
    )
