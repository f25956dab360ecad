"""Sixth-wave catalog queries (round 4): server-directed crawl
politeness and freshness semantics layered on the fetch pipeline.

Every query synthesizes its input deterministically from the driver
tables (no external data) and carries a DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_ai_spark.queries._shared import _register, _t

# ---------------------------------------------------------------------------
# RFC 9110 §10.2.3 Retry-After → host backoff (functions/errors.
# retry_after_seconds_expr + the crawl loop's _advance_backoff policy):
# delta-seconds and IMF-fixdate forms, a 200 carrying the header (not
# rate limiting — ignored), garbage (present ⇒ minimum one batch),
# absent, and a cap-saturating delta. Interval 3600 s, cap 16 batches;
# the date form anchors at a fixed 'now' so both engines agree.
# ---------------------------------------------------------------------------

_RA_NOW = "1994-11-06 08:00:00"  # epoch 784108800, UTC

_RA_CASES = [
    # (status, retry_after)
    (429, "120"),  # delta → 120 s, 1 batch
    (503, "7200"),  # delta → 7200 s, 2 batches
    (429, "Sun, 06 Nov 1994 08:49:37 GMT"),  # date → 2977 s, 1 batch
    (503, "Sun, 06 Nov 1994 07:00:00 GMT"),  # date in the past → 0 s, 1
    (200, "120"),  # not rate-limited → no backoff
    (429, "soon"),  # unparsable but PRESENT → minimum 1 batch
    (429, None),  # absent → no backoff
    (503, "999999999"),  # delta → cap at 16 batches
]

_RA_ORACLE = f"""
WITH resp AS (
  SELECT doc_id,
    CAST(CASE doc_id % 8 {" ".join(f"WHEN {i} THEN {s}" for i, (s, _) in enumerate(_RA_CASES))} END AS INT) AS status,
    CASE doc_id % 8 {" ".join(
        f"WHEN {i} THEN " + ("NULL" if r is None else "'" + r + "'")
        for i, (_, r) in enumerate(_RA_CASES)
    )} END AS retry_after
  FROM documents
),
parsed AS (
  SELECT doc_id, status, retry_after,
    CASE
      WHEN regexp_matches(coalesce(retry_after, ''), '^\\s*\\d+\\s*$')
        THEN CAST(trim(retry_after) AS BIGINT)
      WHEN try_strptime(retry_after, '%a, %d %b %Y %H:%M:%S GMT') IS NOT NULL
        THEN greatest(CAST(epoch(try_strptime(retry_after,
               '%a, %d %b %Y %H:%M:%S GMT')) AS BIGINT)
             - CAST(epoch(TIMESTAMP '{_RA_NOW}') AS BIGINT), 0)
    END AS backoff_seconds
  FROM resp
)
SELECT doc_id, status, retry_after, backoff_seconds,
  CASE WHEN status IN (429, 503) AND retry_after IS NOT NULL THEN
    least(greatest(coalesce(CAST(ceil(backoff_seconds / 3600.0) AS BIGINT), 1),
                   1), 16)
  END AS backoff_batches
FROM parsed ORDER BY doc_id
"""


@_register("retry_after_backoff", oracle=_RA_ORACLE)
def q_retry_after_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9110 Retry-After → per-host backoff: delta-seconds or
    IMF-fixdate (anchored at a fixed now) parsed to seconds, then — on
    429/503 only — to ceil(seconds / batch_interval) batches clamped to
    [1, cap]; an unparsable-but-present directive still costs the
    minimum batch. This is the policy the crawl loop's host_backoff
    state applies (defer-not-drop). Pure-JVM expressions."""
    from crawler_ai_spark.functions.errors import retry_after_seconds_expr

    docs = _t(spark, sf_dir, "documents")
    cls = F.col("doc_id") % 8
    status = F.lit(None).cast("int")
    ra = F.lit(None).cast("string")
    for i, (s, r) in reversed(list(enumerate(_RA_CASES))):
        status = F.when(cls == i, F.lit(s)).otherwise(status)
        ra = F.when(cls == i, F.lit(r)).otherwise(ra)
    now = F.to_timestamp(F.lit(_RA_NOW))
    secs = retry_after_seconds_expr(F.col("retry_after"), now)
    resp = docs.select(
        "doc_id", status.cast("int").alias("status"), ra.alias("retry_after")
    ).withColumn("backoff_seconds", secs)
    batches = F.least(
        F.greatest(
            F.coalesce(
                F.ceil(F.col("backoff_seconds") / F.lit(3600.0)), F.lit(1)
            ).cast("long"),
            F.lit(1).cast("long"),
        ),
        F.lit(16).cast("long"),
    )
    return resp.select(
        "doc_id",
        "status",
        "retry_after",
        "backoff_seconds",
        F.when(
            F.col("status").isin(429, 503) & F.col("retry_after").isNotNull(),
            batches,
        ).alias("backoff_batches"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# RSS/Atom feed discovery (functions/feeds.feed_link_expr): four page
# classes — RSS type-then-href, Atom href-then-type (single quotes),
# a stylesheet <link> (must not match), no <link> at all. The oracle
# predicts the extractor's output per class.
# ---------------------------------------------------------------------------

_FEED_DISC_ORACLE = """
SELECT doc_id,
  CASE doc_id % 4
    WHEN 0 THEN 'https://fsite' || (doc_id % 11) || '.example/feed.xml'
    WHEN 1 THEN 'https://fsite' || (doc_id % 11) || '.example/atom.xml'
  END AS feed_url
FROM documents ORDER BY doc_id
"""


@_register("feed_discover", oracle=_FEED_DISC_ORACLE)
def q_feed_discover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feed autodiscovery: the page head's <link rel=alternate
    type=application/rss+xml|atom+xml href=…> declaration, either
    attribute order; stylesheet links and feed-less pages yield NULL.
    Map-side JVM regexp over the html — the freshest URL-discovery
    channel a crawl has."""
    from crawler_ai_spark.functions.feeds import feed_link_expr

    docs = _t(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.expr(
            "'https://fsite' || CAST(doc_id % 11 AS STRING) || '.example'"
        ).alias("site"),
        (F.col("doc_id") % 4).alias("variant"),
    )
    html = (
        F.when(
            F.col("variant") == 0,
            F.concat(
                F.lit('<html><head><link rel="alternate" '
                      'type="application/rss+xml" title="RSS" href="'),
                F.col("site"), F.lit('/feed.xml"></head><body>a</body></html>'),
            ),
        )
        .when(
            F.col("variant") == 1,
            F.concat(
                F.lit("<html><head><link href='"), F.col("site"),
                F.lit("/atom.xml' rel='alternate' "
                      "type='application/atom+xml'></head></html>"),
            ),
        )
        .when(
            F.col("variant") == 2,
            F.lit('<html><head><link rel="stylesheet" type="text/css" '
                  'href="/main.css"></head></html>'),
        )
        .otherwise(F.lit("<html><head><title>t</title></head></html>"))
    )
    return base.select(
        "doc_id", feed_link_expr(html).alias("feed_url")
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Feed entry extraction (functions/feeds.feed_entries): synthesized
# feeds with doc_id%4 entries each — RSS 2.0 for even docs, Atom for
# odd — through the REAL block-split extractor; the oracle generates
# the expected entry rows arithmetically (unnest(range(n))).
# ---------------------------------------------------------------------------

_FEED_ENTRIES_ORACLE = """
WITH e AS (
  SELECT doc_id, unnest(range(doc_id % 4)) AS pos FROM documents
)
SELECT doc_id, CAST(pos AS INT) AS entry_pos,
  'https://fsite' || (doc_id % 11) || '.example/post/' || doc_id || '/'
    || pos AS entry_url,
  'Post ' || doc_id || '-' || pos AS entry_title,
  CASE WHEN doc_id % 2 = 0
    THEN 'Mon, 0' || (pos + 1) || ' Jan 2024 08:00:00 GMT'
    ELSE '2024-01-0' || (pos + 1) || 'T08:00:00Z'
  END AS entry_date_raw
FROM e ORDER BY doc_id, entry_pos
"""


@_register("feed_entries_extract", oracle=_FEED_ENTRIES_ORACLE)
def q_feed_entries_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RSS <item> / Atom <entry> extraction: one row per feed entry with
    its link, title, and raw date, in document order. Block split +
    field pulls are map-side regexps; posexplode preserves order —
    no shuffle before the final presentation sort."""
    from crawler_ai_spark.functions.feeds import feed_entries

    docs = _t(spark, sf_dir, "documents")
    k = (F.col("doc_id") % 4).cast("int")
    base = docs.select(
        "doc_id",
        F.expr(
            "'https://fsite' || CAST(doc_id % 11 AS STRING) || '.example'"
        ).alias("site"),
        k.alias("k"),
        (F.col("doc_id") % 2 == 0).alias("is_rss"),
    )
    seq = F.when(F.col("k") > 0, F.sequence(F.lit(0), F.col("k") - 1)).otherwise(
        F.array().cast("array<int>")
    )

    def rss_item(i):
        return F.concat(
            F.lit("<item><title>Post "), F.col("doc_id").cast("string"),
            F.lit("-"), i.cast("string"), F.lit("</title><link>"),
            F.col("site"), F.lit("/post/"), F.col("doc_id").cast("string"),
            F.lit("/"), i.cast("string"),
            F.lit("</link><pubDate>Mon, 0"), (i + 1).cast("string"),
            F.lit(" Jan 2024 08:00:00 GMT</pubDate></item>"),
        )

    def atom_entry(i):
        return F.concat(
            F.lit("<entry><title>Post "), F.col("doc_id").cast("string"),
            F.lit("-"), i.cast("string"),
            F.lit('</title><link rel="alternate" href="'),
            F.col("site"), F.lit("/post/"), F.col("doc_id").cast("string"),
            F.lit("/"), i.cast("string"),
            F.lit('"/><updated>2024-01-0'), (i + 1).cast("string"),
            F.lit("T08:00:00Z</updated></entry>"),
        )

    xml = F.when(
        F.col("is_rss"),
        F.concat(
            F.lit('<?xml version="1.0"?><rss version="2.0"><channel>'),
            F.array_join(F.transform(seq, rss_item), ""),
            F.lit("</channel></rss>"),
        ),
    ).otherwise(
        F.concat(
            F.lit('<?xml version="1.0"?><feed xmlns='
                  '"http://www.w3.org/2005/Atom">'),
            F.array_join(F.transform(seq, atom_entry), ""),
            F.lit("</feed>"),
        )
    )
    feeds = base.select("doc_id", xml.alias("xml"))
    return (
        feed_entries(feeds, "xml")
        .select("doc_id", "entry_pos", "entry_url", "entry_title", "entry_date_raw")
        .orderBy("doc_id", "entry_pos")
    )
