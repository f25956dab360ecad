"""Sixth-wave catalog queries (round 4): server-directed crawl
politeness and freshness semantics layered on the fetch pipeline.

Every query synthesizes its input deterministically from the driver
tables (no external data) and carries a DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_ai_spark.queries._shared import _register, _scratch_dir, _t

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


# ---------------------------------------------------------------------------
# C4 cleaning rules (Raffel et al. 2020 §2.2, pipeline/corpus.
# c4_line_columns): line keep = terminal punctuation + ≥5 words; page
# keep = ≥3 sentences, no "lorem ipsum", no curly brace. The oracle
# re-derives every rule in DuckDB over the same text.
# ---------------------------------------------------------------------------

_C4_ORACLE = r"""
WITH base AS (
  SELECT doc_id, concat_ws(chr(10),
    'Sentence one is here. Sentence two follows! Is number three good?',
    'Short line.',
    'no terminal punctuation in this line',
    'Document ' || doc_id || ' closes with sentence number ' || doc_id
      || '.',
    CASE WHEN doc_id % 7 = 0
      THEN 'This page contains Lorem Ipsum filler text.' END,
    CASE WHEN doc_id % 11 = 3 THEN 'var x = { a: 1 };' END
  ) AS t FROM documents
),
linework AS (
  SELECT doc_id, t,
    string_split(t, chr(10)) AS lines,
    list_filter(
      string_split(t, chr(10)),
      ln -> regexp_matches(rtrim(ln), '[.!?]["''”]?$')
            AND len(string_split_regex(trim(ln), '\s+')) >= 5
            AND trim(ln) <> ''
    ) AS kept
  FROM base
),
cleaned AS (
  SELECT doc_id, t, lines, kept,
    coalesce(array_to_string(list_transform(kept, x -> trim(x)), chr(10)),
             '') AS c4
  FROM linework
)
SELECT doc_id,
  CAST(len(lines) AS BIGINT) AS n_lines,
  CAST(len(kept) AS BIGINT) AS n_kept_lines,
  CAST(len(regexp_extract_all(c4, '[.!?]')) AS BIGINT) AS n_sentences,
  contains(lower(t), 'lorem ipsum') AS has_lorem,
  contains(lower(t), '{') AS has_brace,
  (len(regexp_extract_all(c4, '[.!?]')) >= 3
   AND NOT contains(lower(t), 'lorem ipsum')
   AND NOT contains(lower(t), '{')) AS c4_keep,
  CASE WHEN (len(regexp_extract_all(c4, '[.!?]')) >= 3
   AND NOT contains(lower(t), 'lorem ipsum')
   AND NOT contains(lower(t), '{')) THEN CAST(length(c4) AS BIGINT) END
    AS c4_len
FROM cleaned ORDER BY doc_id
"""


@_register("doc_c4_clean", oracle=_C4_ORACLE)
def q_doc_c4_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4's published cleaning heuristics: keep lines ending in terminal
    punctuation with ≥5 words; drop pages with <3 sentences, any
    "lorem ipsum", or a curly brace. The input synthesizes pages with
    kept lines, a too-short line, an unterminated line, and per-residue
    lorem/brace poison lines (documents.text itself has no punctuation).
    Map-side array/regexp expressions; the kept-text length is the
    hashable proxy for the cleaned text."""
    from crawler_ai_spark.pipeline.corpus import c4_line_columns

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id").cast("string")
    page = F.concat_ws(
        "\n",
        F.lit("Sentence one is here. Sentence two follows! "
              "Is number three good?"),
        F.lit("Short line."),
        F.lit("no terminal punctuation in this line"),
        F.concat(
            F.lit("Document "), d, F.lit(" closes with sentence number "),
            d, F.lit("."),
        ),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.lit("This page contains Lorem Ipsum filler text."),
        ),
        F.when(F.col("doc_id") % 11 == 3, F.lit("var x = { a: 1 };")),
    )
    cols = c4_line_columns(page)
    return docs.select(
        "doc_id",
        cols["n_lines"].alias("n_lines"),
        cols["n_kept_lines"].alias("n_kept_lines"),
        cols["n_sentences"].alias("n_sentences"),
        cols["has_lorem"].alias("has_lorem"),
        cols["has_brace"].alias("has_brace"),
        cols["c4_keep"].alias("c4_keep"),
        F.length(cols["c4_text"]).cast("long").alias("c4_len"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# C4 three-sentence-span dedup (pipeline/corpus.sentence_span_dedup):
# cross-document span-grain dedup — globally first occurrence (min
# doc_id, then position) of every 3-sentence window is kept. The oracle
# re-derives the sentence split, windows and first-wins rule in SQL.
# ---------------------------------------------------------------------------

_SPAN_ORACLE = r"""
WITH base AS (
  SELECT doc_id,
    CASE WHEN doc_id % 5 = 4 THEN 'Tiny. Doc.'
    ELSE 'Common alpha one. Common beta two. Common gamma three. Unique '
      || doc_id || ' four. Unique ' || doc_id || ' five.'
    END AS text
  FROM documents
),
sent AS (
  SELECT doc_id,
    list_filter(
      string_split(
        regexp_replace(coalesce(text, ''), '([.!?])\s+', '\1' || chr(10), 'g'),
        chr(10)),
      s -> trim(s) <> ''
    ) AS ss
  FROM base
),
spans AS (
  SELECT doc_id, CAST(i AS INT) AS span_pos,
    array_to_string(ss[(i + 1):(i + 3)], ' ') AS span
  FROM sent, unnest(range(greatest(len(ss) - 2, 0))) AS u(i)
)
SELECT doc_id, span_pos,
  (row_number() OVER (PARTITION BY span ORDER BY doc_id, span_pos) = 1)
    AS is_kept
FROM spans ORDER BY doc_id, span_pos
"""


@_register("doc_span_dedup", oracle=_SPAN_ORACLE)
def q_doc_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4's cross-document three-sentence-span dedup at span grain:
    one row per span with the globally-first-occurrence verdict. The
    input synthesizes docs sharing a leading 3-sentence span (kept only
    by the lowest doc_id) plus unique tails; every fifth doc is too
    short to produce a span. The only shuffle is the span-fingerprint
    aggregation — exact-dedup shape, never all-pairs."""
    from crawler_ai_spark.pipeline.corpus import sentence_span_dedup

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id").cast("string")
    text = F.when(F.col("doc_id") % 5 == 4, F.lit("Tiny. Doc.")).otherwise(
        F.concat(
            F.lit("Common alpha one. Common beta two. Common gamma three. "
                  "Unique "),
            d, F.lit(" four. Unique "), d, F.lit(" five."),
        )
    )
    synth = docs.select("doc_id", text.alias("text"))
    return (
        sentence_span_dedup(synth)
        .select("doc_id", "span_pos", "is_kept")
        .orderBy("doc_id", "span_pos")
    )


# ---------------------------------------------------------------------------
# CDX index derivation (sources/warc.warc_cdx): synthesized pages →
# real WARC files on disk → per-record index rows with SURT urlkey,
# 14-digit timestamp, status, payload digest, and an in-plan slice
# self-check (offset/length re-parsed and compared — framing verified
# where it is computed, so the oracle needn't model header byte sizes).
# ---------------------------------------------------------------------------

_CDX_HTML = "'<html><body>' || text || '</body></html>'"
_CDX_MICROS = "1704067200000000 + doc_id * 1000000 + (doc_id * 1337) % 1000000"

_CDX_ORACLE = f"""
SELECT 'com,example,warc' || (doc_id % 23) || ')/p/' || doc_id AS urlkey,
       strftime(make_timestamp({_CDX_MICROS}), '%Y%m%d%H%M%S') AS ts14,
       CAST(CASE WHEN doc_id % 19 = 0 THEN 404 ELSE 200 END AS INT) AS status,
       md5({_CDX_HTML}) AS digest,
       true AS slice_ok
FROM documents WHERE text IS NOT NULL
ORDER BY urlkey
"""


@_register("warc_cdx_index", oracle=_CDX_ORACLE)
def q_warc_cdx_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDX index over freshly-written WARC: urlkey (SURT), 14-digit
    capture timestamp, status, payload md5, and the slice_ok framing
    self-check — the offsets are validated in-plan by re-parsing each
    record from its own [offset, offset+length) slice, so any header
    mis-framing fails the row rather than hiding in an unverifiable
    column. Files land in a fresh mkdtemp (tiny at catalog SF)."""
    from crawler_ai_spark.functions.urls import surt_key
    from crawler_ai_spark.sources.warc import warc_cdx, write_warc

    docs = _t(spark, sf_dir, "documents").where("text IS NOT NULL")
    pages = docs.select(
        F.expr(
            "'https://warc' || CAST(doc_id % 23 AS STRING) || '.example.com/p/'"
            " || CAST(doc_id AS STRING)"
        ).alias("url"),
        F.expr(f"timestamp_micros({_CDX_MICROS})").alias("warc_ts"),
        F.expr(f"CAST({_CDX_HTML} AS BINARY)").alias("html"),
        F.expr(
            "CAST(CASE WHEN doc_id % 19 = 0 THEN 404 ELSE 200 END AS INT)"
        ).alias("status"),
    )
    out = _scratch_dir("warc_cdx_")
    write_warc(pages.repartition(8, "url"), out, gzip_records=False).collect()
    return warc_cdx(spark, out).select(
        surt_key(F.col("url")).alias("urlkey"),
        F.date_format("warc_ts", "yyyyMMddHHmmss").alias("ts14"),
        "status",
        "digest",
        "slice_ok",
    ).orderBy("urlkey")


# ---------------------------------------------------------------------------
# hreflang alternates (functions/urls.hreflang_pairs): synthesized pages
# declaring en / vi / x-default variants in mixed attribute orders plus
# a malformed tag (hreflang without href — dropped); every fourth page
# declares none. The oracle generates the expected rows arithmetically.
# ---------------------------------------------------------------------------

_HREFLANG_ORACLE = """
WITH e AS (
  SELECT doc_id, unnest(range(3)) AS pos FROM documents WHERE doc_id % 4 <> 3
)
SELECT doc_id, CAST(pos AS INT) AS pos,
  CASE pos WHEN 0 THEN 'en' WHEN 1 THEN 'vi' ELSE 'x-default' END AS lang,
  'https://hsite' || (doc_id % 9) || '.example/'
    || (CASE pos WHEN 0 THEN 'en' WHEN 1 THEN 'vi' ELSE 'www' END)
    || '/p' || doc_id AS href
FROM e ORDER BY doc_id, pos
"""


@_register("hreflang_alternates", oracle=_HREFLANG_ORACLE)
def q_hreflang_alternates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hreflang variant extraction: every <link hreflang=… href=…>
    declaration in document order, any attribute order, case-folded
    language tags; tags missing an attribute drop. A crawler fetches one
    variant per language tier instead of N mirrors. Map-side regexps +
    posexplode — no shuffle before the presentation sort."""
    from crawler_ai_spark.functions.urls import hreflang_pairs

    docs = _t(spark, sf_dir, "documents")
    site = F.expr(
        "'https://hsite' || CAST(doc_id % 9 AS STRING) || '.example'"
    )
    d = F.col("doc_id").cast("string")
    html = F.when(
        F.col("doc_id") % 4 != 3,
        F.concat(
            F.lit('<html><head><link rel="alternate" hreflang="EN" href="'),
            site, F.lit("/en/p"), d, F.lit('">'),
            F.lit("<link hreflang='vi' href='"),
            site, F.lit("/vi/p"), d, F.lit("'>"),
            F.lit('<link href="'), site, F.lit("/www/p"), d,
            F.lit('" hreflang=x-default>'),
            F.lit('<link hreflang="de"></head></html>'),  # no href: drop
        ),
    ).otherwise(F.lit("<html><head><title>t</title></head></html>"))
    pages = docs.select("doc_id", html.alias("html"))
    return (
        pages.select(
            "doc_id", F.posexplode(hreflang_pairs(F.col("html"))).alias("pos", "p")
        )
        .select("doc_id", "pos", F.col("p.lang").alias("lang"),
                F.col("p.href").alias("href"))
        .orderBy("doc_id", "pos")
    )


# ---------------------------------------------------------------------------
# JSON-LD JobPosting extraction (functions/jsonld): schema.org blocks in
# <script type="application/ld+json"> — the highest-precision job-field
# source a web-scale crawler has (Google Jobs mandates it), generalizing
# the reference's embedded-JSON handling (crawler.py script-JSON path,
# job_extraction_service.py embedded-job parse). Five synthesized page
# shapes: a full JobPosting; an Organization block (wrong @type — drop);
# a garbage block followed by a valid posting (permissive parse nulls
# the garbage, keeps the posting); an uppercase-tag minimal posting with
# optional fields absent (nulls surface); no structured data at all.
# Block regexp + from_json are both JVM-side — no Python in the path.
# ---------------------------------------------------------------------------

_JSONLD_ORACLE = """
SELECT doc_id,
  'Senior Engineer ' || doc_id AS title,
  'Co ' || (doc_id % 7) AS company,
  CASE WHEN doc_id % 5 = 3 THEN NULL
       ELSE 'City' || (doc_id % 3) END AS location,
  CASE WHEN doc_id % 5 = 3 THEN NULL ELSE 'FULL_TIME' END AS employment_type,
  '2024-05-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') AS date_posted
FROM documents
WHERE doc_id % 5 IN (0, 2, 3)
ORDER BY doc_id
"""


@_register("jsonld_jobposting", oracle=_JSONLD_ORACLE)
def q_jsonld_jobposting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """schema.org JobPosting fields from embedded JSON-LD: extract every
    ld+json script payload (any attribute order/case, dotall bodies),
    parse with from_json (permissive — garbage blocks null out), keep
    @type = JobPosting, project typed fields. Scan → map-side regexp →
    explode → JVM JSON parse; the only shuffle is the presentation sort."""
    from crawler_ai_spark.functions.jsonld import (
        jobposting_from_block,
        jsonld_blocks,
    )

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id").cast("string")
    day = F.lpad((F.col("doc_id") % 28 + 1).cast("string"), 2, "0")
    co = (F.col("doc_id") % 7).cast("string")
    city = (F.col("doc_id") % 3).cast("string")
    jp_full = F.concat(
        F.lit('{"@context":"https://schema.org","@type":"JobPosting",'
              '"title":"Senior Engineer '), d,
        F.lit('","datePosted":"2024-05-'), day,
        F.lit('","employmentType":"FULL_TIME","hiringOrganization":'
              '{"@type":"Organization","name":"Co '), co,
        F.lit('"},"jobLocation":{"@type":"Place","address":'
              '{"addressLocality":"City'), city, F.lit('"}}}'),
    )
    jp_min = F.concat(
        F.lit('{"@type":"JobPosting","title":"Senior Engineer '), d,
        F.lit('","datePosted":"2024-05-'), day,
        F.lit('","hiringOrganization":{"name":"Co '), co, F.lit('"}}'),
    )
    org = F.concat(F.lit('{"@type":"Organization","name":"Co '), co, F.lit('"}'))
    m = F.col("doc_id") % 5
    html = (
        F.when(m == 0, F.concat(
            F.lit('<html><head><script type="application/ld+json">'),
            jp_full, F.lit('</script></head><body>p</body></html>')))
        .when(m == 1, F.concat(
            F.lit('<html><head><script type="application/ld+json">'),
            org, F.lit("</script></head></html>")))
        .when(m == 2, F.concat(
            F.lit("<html><head><script type='application/ld+json'>"
                  "plain text, not json</script>"
                  '<script async type="application/ld+json">'),
            jp_full, F.lit("</script></head></html>")))
        .when(m == 3, F.concat(
            F.lit('<HTML><HEAD><SCRIPT TYPE="application/ld+json">'),
            jp_min, F.lit("</SCRIPT></HEAD></HTML>")))
        .otherwise(F.lit("<html><body>no structured data</body></html>"))
    )
    pages = docs.select("doc_id", html.alias("html"))
    return (
        pages.select(
            "doc_id", F.explode(jsonld_blocks(F.col("html"))).alias("block")
        )
        .select("doc_id", jobposting_from_block(F.col("block")).alias("jp"))
        .where(F.col("jp.`@type`") == "JobPosting")
        .select(
            "doc_id",
            F.col("jp.title").alias("title"),
            F.col("jp.hiringOrganization.name").alias("company"),
            F.col("jp.jobLocation.address.addressLocality").alias("location"),
            F.col("jp.employmentType").alias("employment_type"),
            F.col("jp.datePosted").alias("date_posted"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Page-level REP (functions/pagerep): meta robots noindex/nofollow/none
# (any attribute order/quote/case, multiple-tag union), X-Robots-Tag
# header directives, and per-anchor rel=nofollow/ugc/sponsored. Six
# synthesized page shapes cover every gate; outputs are the decisions a
# frontier needs: may-index, may-follow, and how many outlinks survive.
# ---------------------------------------------------------------------------

_PAGEREP_ORACLE = """
SELECT doc_id,
  CASE doc_id % 6 WHEN 1 THEN 0 WHEN 2 THEN 0 ELSE 1 END AS index_ok,
  CASE doc_id % 6 WHEN 2 THEN 0 WHEN 4 THEN 0 ELSE 1 END AS follow_ok,
  CASE doc_id % 6 WHEN 0 THEN 3 WHEN 1 THEN 3 WHEN 2 THEN 0
                  WHEN 3 THEN 2 WHEN 4 THEN 0 ELSE 1 END AS links_followed
FROM documents ORDER BY doc_id
"""


@_register("page_rep_gate", oracle=_PAGEREP_ORACLE)
def q_page_rep_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-page Robots Exclusion Protocol decisions: index permission
    (meta/header noindex), follow permission (meta/header nofollow,
    `none` implying both), and the outlink set after dropping
    rel=nofollow/ugc/sponsored anchors. Pure map-side regexp + array
    higher-order functions; the only shuffle is the presentation sort."""
    from crawler_ai_spark.functions.pagerep import (
        followable_hrefs,
        meta_robots_expr,
        x_robots_expr,
    )

    docs = _t(spark, sf_dir, "documents")
    links3 = "<a href=\"/a\">A</a><a href='/b'>B</a><a href=/c>C</a>"
    m = F.col("doc_id") % 6
    html = (
        F.when(m == 0, F.lit(f"<html><body>{links3}</body></html>"))
        .when(m == 1, F.lit(
            '<html><head><meta name="robots" content="noindex, follow">'
            f"</head><body>{links3}</body></html>"))
        .when(m == 2, F.lit(
            "<html><head><META NAME=ROBOTS CONTENT=\"NONE\"></head>"
            f"<body>{links3}</body></html>"))
        .when(m == 3, F.lit(
            '<html><head><meta content="all" name="robots"></head><body>'
            '<a rel="nofollow" href="/paid">x</a>'
            "<a href=\"/ugc\" rel='ugc external'>y</a>"
            '<a href="/f1">z</a><a href="/f2">w</a></body></html>'))
        .when(m == 4, F.lit(f"<html><body>{links3}</body></html>"))
        .otherwise(F.lit(
            '<html><head><meta name="viewport" content="width=1"></head>'
            "<body><a href=/sp rel=sponsored>s</a>"
            '<a href="/ok">o</a></body></html>'))
    )
    x_robots = F.when(m == 4, F.lit("noarchive, nofollow"))
    pages = docs.select(
        "doc_id", html.alias("html"), x_robots.alias("x_robots")
    )
    meta = meta_robots_expr(F.col("html"))
    xr = x_robots_expr(F.col("x_robots"))
    return pages.select(
        "doc_id",
        (~(meta["noindex"] | xr["noindex"])).cast("int").alias("index_ok"),
        (~(meta["nofollow"] | xr["nofollow"])).cast("int").alias("follow_ok"),
        F.size(followable_hrefs(F.col("html"), F.col("x_robots")))
        .alias("links_followed"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# IDN host normalization (functions/urls.idn_host_expr): unicode hosts
# → punycode ASCII, the form DNS and the seen-set actually key on. The
# oracle pins the RFC 3490/3492 expected encodings as literals (DuckDB
# has no punycode); the Spark side computes them through the gated
# stdlib-IDNA pandas UDF (ASCII rows never reach Python).
# ---------------------------------------------------------------------------

_IDN_ORACLE = """
SELECT doc_id,
  CASE doc_id % 6
    WHEN 0 THEN 'xn--mnchen-3ya.example'
    WHEN 1 THEN 'xn--bcher-kva.de'
    WHEN 2 THEN 'xn--wgv71a.jp'
    WHEN 3 THEN 'xn--vitnam-jk8b.vn'
    WHEN 4 THEN 'www.example' || (doc_id % 11) || '.com'
    ELSE 'xn--mnchen-3ya.example'
  END AS ascii_host
FROM documents ORDER BY doc_id
"""


@_register("idn_host_normalize", oracle=_IDN_ORACLE)
def q_idn_host_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Punycode host canonicalization over a mixed unicode/ASCII host
    column: uppercase unicode, Latin/CJK/Vietnamese labels, trailing
    dots, already-encoded xn-- hosts, and the ASCII majority (which the
    plan keeps JVM-side — the UDF input is nulled for them)."""
    from crawler_ai_spark.functions.urls import idn_host_expr

    docs = _t(spark, sf_dir, "documents")
    m = F.col("doc_id") % 6
    host = (
        F.when(m == 0, F.lit("MÜNCHEN.example"))
        .when(m == 1, F.lit("bücher.de"))
        .when(m == 2, F.lit("日本.jp"))
        .when(m == 3, F.lit("việtnam.vn"))
        .when(m == 4, F.concat(
            F.lit("WWW.Example"), (F.col("doc_id") % 11).cast("string"),
            F.lit(".COM.")))
        .otherwise(F.lit("xn--mnchen-3ya.example"))
    )
    return (
        docs.select("doc_id", host.alias("host"))
        .select("doc_id", idn_host_expr(F.col("host")).alias("ascii_host"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Registered-domain extraction (functions/urls.registered_domain_expr):
# the PSL algorithm over exact / wildcard / exception rules — the grain
# host budgets and quality rollups actually want. Eight synthesized
# host shapes: multi-label country suffix, www + gTLD, private-section
# platform suffix (github.io), deep Vietnamese 2LD, a wildcard-ps host
# (NULL — nothing registered), a name under it, the !www.ck exception,
# and an unlisted TLD falling to the default rule.
# ---------------------------------------------------------------------------

_REGDOM_ORACLE = """
SELECT doc_id,
  CASE doc_id % 8
    WHEN 0 THEN 'bbc' || (doc_id % 3) || '.co.uk'
    WHEN 1 THEN 'example' || (doc_id % 7) || '.com'
    WHEN 2 THEN 'user' || (doc_id % 4) || '.github.io'
    WHEN 3 THEN 'site' || (doc_id % 5) || '.com.vn'
    WHEN 4 THEN NULL
    WHEN 5 THEN 'bar' || (doc_id % 3) || '.foo.ck'
    WHEN 6 THEN 'www.ck'
    ELSE 'host' || (doc_id % 9) || '.unknowntld'
  END AS reg_domain
FROM documents ORDER BY doc_id
"""


@_register("registered_domains", oracle=_REGDOM_ORACLE)
def q_registered_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Public-suffix-aware registrable-domain extraction. Membership
    probes compile to InSet — the whole derivation is one codegen'd
    projection; the only shuffle is the presentation sort."""
    from crawler_ai_spark.functions.urls import registered_domain_expr

    docs = _t(spark, sf_dir, "documents")
    m = F.col("doc_id") % 8
    s = lambda k: (F.col("doc_id") % k).cast("string")  # noqa: E731
    host = (
        F.when(m == 0, F.concat(F.lit("news."), F.lit("bbc"), s(3), F.lit(".co.uk")))
        .when(m == 1, F.concat(F.lit("www.example"), s(7), F.lit(".com")))
        .when(m == 2, F.concat(F.lit("user"), s(4), F.lit(".github.io")))
        .when(m == 3, F.concat(F.lit("deep.a.site"), s(5), F.lit(".com.vn")))
        .when(m == 4, F.lit("foo.ck"))
        .when(m == 5, F.concat(F.lit("bar"), s(3), F.lit(".foo.ck")))
        .when(m == 6, F.lit("WWW.CK"))
        .otherwise(F.concat(F.lit("host"), s(9), F.lit(".unknowntld")))
    )
    return (
        docs.select("doc_id", host.alias("host"))
        .select(
            "doc_id", registered_domain_expr(F.col("host")).alias("reg_domain")
        )
        .orderBy("doc_id")
    )
