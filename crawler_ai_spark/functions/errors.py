"""S1/W4 — fetch-error taxonomy and per-class retry policy.

The reference classifies fetch failures by substring over the error
message (crawler.py:424-446: timeout / dns / connection / blocked /
rate_limited / not_found / other, first hit in that order) and retries by
status class (crawler.py:197-233): 403/429/503 and transient transport
errors back off and retry; 404/410 are PERMANENT and abort immediately
(":224 if response.status in [404, 410]: raise Permanent error").

Here the pages table carries (status INT, fetch_error STRING) alongside
html; classification is one JVM when-chain, and the crawl loop's W4 retry
re-enqueues only non-permanent failures."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# crawler.py:424-446 — ordered (class, markers); first hit wins
ERROR_CLASS_MARKERS: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("timeout", ("timeout", "connection timeout")),
    ("dns", ("dns", "name or service not known")),
    ("connection", ("connection refused", "unreachable")),
    ("blocked", ("403", "forbidden", "blocked")),
    ("rate_limited", ("429", "rate limited")),
    ("not_found", ("404", "not found", "410", "gone")),
)

# crawler.py:224 — the one permanent class; everything else re-enters the
# retry ladder (403/429/503 explicitly, transport errors via the generic
# except-retry)
PERMANENT_CLASSES = ("not_found",)


def fetch_error_class_expr(error_msg: Column) -> Column:
    """NULL message (success) → NULL; else the first matching class."""
    low = F.lower(error_msg)
    out = F.lit("other")
    for cls, markers in reversed(ERROR_CLASS_MARKERS):
        hit = F.lit(False)
        for m in markers:
            hit = hit | low.contains(m)
        out = F.when(hit, F.lit(cls)).otherwise(out)
    return F.when(error_msg.isNull(), F.lit(None).cast("string")).otherwise(out)


def is_permanent_error_expr(error_class: Column) -> Column:
    """True iff the failure must NOT be retried (404/410 → not_found)."""
    return F.coalesce(error_class.isin(*PERMANENT_CLASSES), F.lit(False))


# RFC 9110 §10.2.3 Retry-After: either delta-seconds or an IMF-fixdate
# ("Sun, 06 Nov 1994 08:49:37 GMT"). Servers send it with 429/503 to say
# exactly how long to back off — server-directed politeness, stronger
# than any heuristic the crawler computes itself.
_RETRY_DELTA_RX = r"^\s*(\d+)\s*$"
# Spark's post-3.0 parser rejects EEE in parse patterns; the day-of-week
# prefix is redundant in an IMF-fixdate, so strip it and parse the rest
_IMF_DOW_PREFIX_RX = r"^[A-Za-z]{3},\s*"
_IMF_FIXDATE_FMT = "dd MMM yyyy HH:mm:ss 'GMT'"


def retry_after_seconds_expr(value: Column, now: Column | None = None) -> Column:
    """Retry-After header → backoff seconds (long). Delta-seconds parse
    directly; the IMF-fixdate form needs ``now`` (the request's wall
    clock) and clamps to ≥0 for dates already past; unparsable or absent
    → NULL. When ``now`` is None the date form returns NULL too (a
    batch-indexed caller with no wall-clock anchor treats any
    present-but-dateform value as a minimum one-interval backoff).
    Pure-JVM expressions; session timezone must be UTC for the date form
    (session.get_spark pins it)."""
    delta = F.nullif(
        F.regexp_extract(F.coalesce(value, F.lit("")), _RETRY_DELTA_RX, 1), F.lit("")
    ).cast("long")
    if now is None:
        return delta
    stripped = F.regexp_replace(
        F.coalesce(value, F.lit("")), _IMF_DOW_PREFIX_RX, ""
    )
    ts = F.try_to_timestamp(stripped, F.lit(_IMF_FIXDATE_FMT))
    from_date = F.when(
        ts.isNotNull(),
        F.greatest(ts.cast("long") - now.cast("long"), F.lit(0).cast("long")),
    )
    return F.coalesce(delta, from_date)
