"""Crawl-trap detection — URL-structure signals that mark spider traps.

The reference's early-rejection rules (career_detector.py:56-267 →
functions/detector.py) reject non-career content; a frontier at
10^10-URL scale additionally needs TRAP rejection: infinitely-generated
URL spaces (calendar pagers, session-id echoes, recursive relative
links, parameter cross-products) that a BFS would expand forever. All
signals are row-local column expressions (pure JVM, whole-stage
codegen) so the gate runs map-side before the seen-set shuffle — the
cheapest possible place to kill an infinite subspace.

Signals (each independently portable to ANSI SQL for the oracle gate):
  loop_segments   — the path repeats segments (>=2 duplicate segments,
                    e.g. /a/b/a/b/a/b from a recursive relative href)
  calendar        — /YYYY/M/D path step (calendar pagers enumerate one
                    URL per day forever)
  session_id      — session token echoed in the query string (every
                    visitor mints a fresh URL for the same page)
  query_explosion — >= 6 query parameters (faceted-search cross-products)
  too_deep        — > 12 path segments
  too_long        — > 300-octet URL

Reason precedence mirrors the detector's first-match convention.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# thresholds (module constants so loop config + oracle SQL share them)
TRAP_MAX_DEPTH = 12
TRAP_MAX_URL_LEN = 300
TRAP_MAX_PARAMS = 6
TRAP_MIN_DUP_SEGMENTS = 2
CALENDAR_RX = r"/(19|20)\d{2}/\d{1,2}/\d{1,2}(/|$)"
SESSION_TOKENS = ("jsessionid", "phpsessid", "sessionid", "sid=")


def _path_of(url: Column) -> Column:
    return F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit(""))


def _query_of(url: Column) -> Column:
    return F.coalesce(F.try_parse_url(url, F.lit("QUERY")), F.lit(""))


def _segments(path: Column) -> Column:
    stripped = F.regexp_replace(path, "^/+|/+$", "")
    return F.when(stripped == "", F.array().cast("array<string>")).otherwise(
        F.split(stripped, "/+")
    )


def _n_params(query: Column) -> Column:
    return F.when(query == "", F.lit(0)).otherwise(
        F.length(query) - F.length(F.regexp_replace(query, "&", "")) + 1
    )


def trap_reason_expr(url: Column) -> Column:
    """NULL when the URL is clean; else the first-matching trap signal:
    loop_segments | calendar | session_id | query_explosion | too_deep |
    too_long."""
    path = _path_of(url)
    query_l = F.lower(_query_of(url))
    segs = _segments(path)

    loop_seg = (F.size(segs) - F.size(F.array_distinct(segs))) >= TRAP_MIN_DUP_SEGMENTS
    calendar = path.rlike(CALENDAR_RX)
    session = F.lit(False)
    for tok in SESSION_TOKENS:
        session = session | query_l.contains(tok)
    explosion = _n_params(query_l) >= TRAP_MAX_PARAMS
    deep = F.size(segs) > TRAP_MAX_DEPTH
    long_url = F.length(url) > TRAP_MAX_URL_LEN

    return (
        F.when(loop_seg, F.lit("loop_segments"))
        .when(calendar, F.lit("calendar"))
        .when(session, F.lit("session_id"))
        .when(explosion, F.lit("query_explosion"))
        .when(deep, F.lit("too_deep"))
        .when(long_url, F.lit("too_long"))
    )


def is_trap_expr(url: Column) -> Column:
    return trap_reason_expr(url).isNotNull()
