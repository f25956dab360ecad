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
