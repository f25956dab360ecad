"""Round-4 fifth wave: AutoThrottle latency-feedback politeness (the
adaptive half of W2 the reference gets from Scrapy's AutoThrottle
extension, settings.py:55-59 / scrapy_career_spider.py:98-103) and the
published Gopher/MassiveWeb document-quality rules for the
training-data curation layer.

See catalog.py for the registry contract and parity rules. Inputs are
synthesized deterministically from documents.doc_id with engine-portable
integer arithmetic; the AutoThrottle update is integer-millisecond math
end to end so the cross-engine hash is exact, and the Gopher verdicts
compare integer counts cross-multiplied by each rule's threshold."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_ai_spark.functions import mimesniff as MS
from crawler_ai_spark.operators import autothrottle as AT
from crawler_ai_spark.pipeline import textstats as TS
from crawler_ai_spark.queries._shared import _register, _scratch_dir, _t

# ---------------------------------------------------------------------------
# AutoThrottle: synthesized batch of fetch responses — 23 hosts, latency
# 150..5149 ms, one failure class (doc_id % 13 == 0); hosts n % 3 == 0
# carry a previous delay (1200 + (n*53) % 1500), the rest start fresh.
# cfg = the spider's values: start/min 1000 ms, max 3000 ms, target
# concurrency 1.0. Budgets at a 120 s batch interval.
# ---------------------------------------------------------------------------

_AT_INTERVAL_S = 120

_AT_ORACLE = f"""
WITH resp AS (
  SELECT 'h' || CAST(doc_id % 23 AS VARCHAR) AS host,
         CAST(150 + (doc_id * 97) % 5000 AS BIGINT) AS fetch_ms,
         (doc_id % 13) != 0 AS ok
  FROM documents
),
agg AS (
  SELECT host,
         SUM(CASE WHEN ok THEN fetch_ms ELSE 0 END) AS sum_ok_ms,
         SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS n_ok,
         SUM(CASE WHEN ok THEN 0 ELSE 1 END) AS n_err
  FROM resp GROUP BY host
),
prev AS (
  SELECT 'h' || CAST(n AS VARCHAR) AS host,
         CAST(1200 + (n * 53) % 1500 AS BIGINT) AS delay_ms
  FROM (SELECT unnest(range(0, 23)) AS n) WHERE n % 3 = 0
),
upd AS (
  SELECT a.host, a.n_ok, a.n_err,
         coalesce(p.delay_ms, 1000) AS prev_ms,
         CASE WHEN a.n_ok > 0
              THEN (a.sum_ok_ms * 1000) // (a.n_ok * 1000) END AS target_ms
  FROM agg a LEFT JOIN prev p USING (host)
),
raw AS (
  SELECT host, n_ok, n_err, prev_ms,
         CASE WHEN n_ok > 0 THEN (prev_ms + target_ms) // 2
              ELSE prev_ms END AS raw_ms
  FROM upd
),
fin AS (
  SELECT host, n_ok, n_err,
         least(greatest(CASE WHEN n_err > 0 AND raw_ms < prev_ms
                             THEN prev_ms ELSE raw_ms END,
                        1000), 3000) AS delay_ms
  FROM raw
)
SELECT host,
       CAST(delay_ms AS BIGINT) AS delay_ms,
       CAST(n_ok AS BIGINT) AS n_ok,
       CAST(n_err AS BIGINT) AS n_err,
       CAST(greatest(1, ({_AT_INTERVAL_S} * 1000) // delay_ms) AS INT)
         AS host_budget
FROM fin ORDER BY host
"""


@_register("autothrottle_delays", oracle=_AT_ORACLE)
def q_autothrottle_delays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 adaptive politeness — the Scrapy AutoThrottle update at batch
    grain (operators/autothrottle.py): per-host mean success latency →
    target delay → averaged with the previous delay, never lowered off a
    batch with errors, clamped to the spider's [1 s, 3 s]; then the
    per-batch budget apply_host_budget enforces."""
    docs = _t(spark, sf_dir, "documents")
    resp = docs.select(
        F.expr("'h' || CAST(doc_id % 23 AS STRING)").alias("host"),
        F.expr("CAST(150 + (doc_id * 97) % 5000 AS BIGINT)").alias("fetch_ms"),
        F.expr("(doc_id % 13) != 0").alias("ok"),
    )
    prev = (
        spark.range(0, 23)
        .where("id % 3 = 0")
        .select(
            F.expr("'h' || CAST(id AS STRING)").alias("host"),
            F.expr("CAST(1200 + (id * 53) % 1500 AS BIGINT)").alias("delay_ms"),
        )
    )
    delays = AT.autothrottle_delays(resp, prev)
    budgets = AT.budget_from_delay(delays, _AT_INTERVAL_S)
    return (
        delays.join(budgets, "host")
        .select("host", "delay_ms", "n_ok", "n_err", "host_budget")
        .orderBy("host")
    )


# ---------------------------------------------------------------------------
# Conditional fetch (RFC 9110 §13.1) through the REAL fetch stage: per
# URL, one of {matching ETag → 304, stale ETag → 200 re-download, no
# validator → 200}. DuckDB re-derives every cell from md5(url) exactly
# like live_fetch_stage, plus the validator arithmetic.
# ---------------------------------------------------------------------------

_COND_ORACLE = """
WITH f AS (
  SELECT d.doc_id,
         'https://chost' || (d.doc_id % 11) || '.example/cf/' || d.doc_id AS url,
         'chost' || (d.doc_id % 11) || '.example' AS host
  FROM documents d
),
k AS (
  SELECT *, CAST(concat('0x', substr(md5(url), 1, 8)) AS BIGINT) AS key,
         '"' || substr(md5(url), 1, 16) || '"' AS true_etag
  FROM f
),
o AS (
  SELECT *, key % 100 AS r, doc_id % 3 AS mode FROM k
),
o2 AS (
  SELECT *,
         CASE WHEN r < 85 AND NOT (mode = 0)
              THEN '<html><head><title>Page ' || (key % 1000)
              || '</title></head><body>' || repeat('x', CAST(100 + key % 400 AS INT))
              || '</body></html>' END AS html
  FROM o
)
SELECT url,
       CAST(CASE WHEN r < 85 AND mode = 0 THEN 304
                 WHEN r < 85 THEN 200
                 WHEN r < 90 THEN 404 WHEN r < 93 THEN 403
                 WHEN r < 95 THEN 429 WHEN r < 97 THEN 503 END AS INT) AS status,
       CAST(coalesce(length(html), 0) AS BIGINT) AS body_bytes,
       CASE WHEN r < 85 THEN true_etag END AS etag,
       CASE WHEN r < 85
            THEN 'Thu, 01 Jan 1970 00:00:' || lpad(CAST(key % 60 AS VARCHAR), 2, '0')
                 || ' GMT' END AS last_modified
FROM o2 ORDER BY url
"""


@_register("conditional_fetch_stage", oracle=_COND_ORACLE)
def q_conditional_fetch_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5+ conditional revalidation through the real mapInPandas fetch
    stage (sources/fetch.py): rows with a matching If-None-Match answer
    bodyless 304s, stale validators re-download, and response validators
    (ETag / Last-Modified) surface for the TTL ledger either way."""
    from crawler_ai_spark.sources.fetch import FetchConfig, fetch_pages

    docs = _t(spark, sf_dir, "documents")
    true_etag = F.concat(
        F.lit('"'), F.substring(F.md5(F.col("url")), 1, 16), F.lit('"')
    )
    frontier = docs.select(
        F.concat(
            F.lit("https://chost"), (F.col("doc_id") % 11).cast("string"),
            F.lit(".example/cf/"), F.col("doc_id").cast("string"),
        ).alias("url"),
        F.concat(
            F.lit("chost"), (F.col("doc_id") % 11).cast("string"), F.lit(".example")
        ).alias("host"),
        F.lit(1).alias("priority"),
        F.col("doc_id").alias("discovered_seq"),
        (F.col("doc_id") % 3).alias("mode"),
    ).withColumn(
        "cond_etag",
        F.when(F.col("mode") == 0, true_etag)
        .when(F.col("mode") == 1, F.lit('"stale"')),
    )
    fetched = fetch_pages(frontier, FetchConfig(per_host_delay_ms=0))
    return fetched.select(
        "url", "status", "body_bytes", "etag", "last_modified"
    ).orderBy("url")


# ---------------------------------------------------------------------------
# Gopher rules: five synthesized page-text classes per doc exercise each
# rule family (plain prose, sane bullets, bullet-dominated, symbol-heavy
# short doc, ellipsis-ended lines). The class bodies are built from the
# SAME string pieces in both engines; newlines are chr(10).
# ---------------------------------------------------------------------------

_G_SHORT = "the cat and the hat be to of with have that went on and on "
_G_BULLETS10 = "".join(f"- item {i}\n" for i in range(10))

_GOPHER_BODY_SQL = f"""CASE doc_id % 5
  WHEN 0 THEN text
  WHEN 1 THEN '- alpha' || chr(10) || '- beta' || chr(10) || text
  WHEN 2 THEN {"||".join("'- item " + str(i) + "' || chr(10) " for i in range(10))} || text
  WHEN 3 THEN repeat('{_G_SHORT}', 5) || '# # # # # # # # # #'
  ELSE 'read more...' || chr(10) || 'see more...' || chr(10) || text
END"""

_G_STOP_SQL = ", ".join(f"'{s}'" for s in TS.GOPHER_STOPWORDS)

_GOPHER_ORACLE = f"""
WITH pages AS (
  SELECT doc_id, {_GOPHER_BODY_SQL} AS body FROM documents
),
feat AS (
  SELECT doc_id,
    trim(regexp_replace(body, '\\s+', ' ', 'g')) AS collapsed,
    string_split(body, chr(10)) AS lines
  FROM pages
),
counts AS (
  SELECT doc_id,
    CASE WHEN len(collapsed) = 0 THEN 0
         ELSE len(string_split(lower(collapsed), ' ')) END AS n_words,
    CAST(len(collapsed) - greatest(
      CASE WHEN len(collapsed) = 0 THEN 0
           ELSE len(string_split(lower(collapsed), ' ')) END - 1, 0) AS BIGINT)
      AS n_word_chars,
    CAST(len(list_filter(string_split(lower(collapsed), ' '),
         t -> regexp_matches(t, '[a-zA-Z]'))) AS BIGINT) AS n_alpha_words,
    CAST(len(regexp_extract_all(collapsed, '#|\\.\\.\\.|…')) AS BIGINT)
      AS n_symbols,
    CAST(len(lines) AS BIGINT) AS n_lines,
    CAST(len(list_filter(lines,
         l -> regexp_matches(ltrim(l), '^[-*•]'))) AS BIGINT) AS n_bullet,
    CAST(len(list_filter(lines,
         l -> regexp_matches(rtrim(l), '(\\.\\.\\.|…)$'))) AS BIGINT)
      AS n_ellipsis,
    CAST(len(list_filter([{_G_STOP_SQL}],
         s -> list_contains(string_split(lower(collapsed), ' '), s)))
      AS BIGINT) AS n_stop_types
  FROM feat
)
SELECT doc_id,
  CAST(n_words AS BIGINT) AS n_words,
  round(n_word_chars / greatest(n_words, 1), 6) AS mean_word_len,
  round(n_symbols / greatest(n_words, 1), 6) AS symbol_ratio,
  round(n_bullet / greatest(n_lines, 1), 6) AS bullet_line_ratio,
  round(n_ellipsis / greatest(n_lines, 1), 6) AS ellipsis_line_ratio,
  round(n_alpha_words / greatest(n_words, 1), 6) AS alpha_word_ratio,
  n_stop_types,
  (n_words >= 50 AND n_words <= 100000
   AND n_word_chars >= 3 * n_words AND n_word_chars <= 10 * n_words
   AND n_symbols * 10 <= n_words
   AND n_bullet * 10 <= n_lines * 9
   AND n_ellipsis * 10 <= n_lines * 3
   AND n_alpha_words * 10 >= n_words * 8
   AND n_stop_types >= 2) AS gopher_pass
FROM counts ORDER BY doc_id
"""


@_register("doc_gopher_rules", oracle=_GOPHER_ORACLE)
def q_doc_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveWeb quality rules (pipeline/textstats.gopher_columns)
    over five synthesized page-text classes — the standard pre-training
    quality gate alongside doc_lm_score and doc_stats. Row-local JVM
    expressions; no shuffle beyond the final orderBy."""
    docs = _t(spark, sf_dir, "documents")
    bullets = F.concat(
        *[F.lit(f"- item {i}\n") for i in range(10)], F.col("text")
    )
    body = (
        F.when(F.col("doc_id") % 5 == 0, F.col("text"))
        .when(
            F.col("doc_id") % 5 == 1,
            F.concat(F.lit("- alpha\n- beta\n"), F.col("text")),
        )
        .when(F.col("doc_id") % 5 == 2, bullets)
        .when(
            F.col("doc_id") % 5 == 3,
            F.concat(F.expr(f"repeat('{_G_SHORT}', 5)"), F.lit("# # # # # # # # # #")),
        )
        .otherwise(F.concat(F.lit("read more...\nsee more...\n"), F.col("text")))
    )
    pages = docs.select("doc_id", body.alias("body"))
    g = TS.gopher_columns(F.col("body"))
    return pages.select(
        "doc_id",
        g["n_words"].alias("n_words"),
        g["mean_word_len"].alias("mean_word_len"),
        g["symbol_ratio"].alias("symbol_ratio"),
        g["bullet_line_ratio"].alias("bullet_line_ratio"),
        g["ellipsis_line_ratio"].alias("ellipsis_line_ratio"),
        g["alpha_word_ratio"].alias("alpha_word_ratio"),
        g["n_stop_types"].alias("n_stop_types"),
        g["gopher_pass"].alias("gopher_pass"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# MIME sniffing + routing (functions/mimesniff.py): 14 synthesized body
# classes — each pattern family in the WHATWG table plus the two
# fallbacks — in the latin-1 byte view, built from the SAME codepoint
# arithmetic in both engines. The oracle is a prediction oracle
# (media_meta / robots_crawl_delay style): each class's sniffed type and
# route are pure functions of doc_id % 14.
# ---------------------------------------------------------------------------

# (python-chr pieces, duckdb-chr SQL) per class, index = doc_id % 14
_MIME_CASES = [
    ("<html><body>page", "'<html><body>page'"),
    ("   <!DOCTYPE HTML><html>", "'   <!DOCTYPE HTML><html>'"),
    ('<?xml version="1.0"?><urlset/>', "'<?xml version=\"1.0\"?><urlset/>'"),
    ("%PDF-1.4 obj", "'%PDF-1.4 obj'"),
    (
        chr(137) + "PNG\r\n" + chr(26) + "\nIHDR",
        "chr(137) || 'PNG' || chr(13) || chr(10) || chr(26) || chr(10) || 'IHDR'",
    ),
    ("GIF89adata", "'GIF89adata'"),
    (chr(255) + chr(216) + chr(255) + chr(224) + "JFIF",
     "chr(255) || chr(216) || chr(255) || chr(224) || 'JFIF'"),
    ("BMbmpdata", "'BMbmpdata'"),
    ("RIFF1234WAVEfmt ", "'RIFF1234WAVEfmt '"),
    (chr(0) * 3 + chr(24) + "ftypisom",
     "chr(0) || chr(0) || chr(0) || chr(24) || 'ftypisom'"),
    (chr(31) + chr(139) + chr(8) + "gz", "chr(31) || chr(139) || chr(8) || 'gz'"),
    ("PK" + chr(3) + chr(4) + "zip", "'PK' || chr(3) || chr(4) || 'zip'"),
    (chr(1) + "mystery bytes", "chr(1) || 'mystery bytes'"),
    ("plain text body", "'plain text body'"),
]

_MIME_EXPECT = [
    ("text/html", "parse"), ("text/html", "parse"), ("text/xml", "parse"),
    ("application/pdf", "skip"), ("image/png", "image"), ("image/gif", "image"),
    ("image/jpeg", "image"), ("image/bmp", "image"), ("audio/wav", "audio"),
    ("video/mp4", "video"), ("application/gzip", "skip"),
    ("application/zip", "skip"), ("application/octet-stream", "skip"),
    ("text/plain", "text"),
]

_MIME_ORACLE = (
    "SELECT doc_id,\n"
    + "  CASE doc_id % 14 "
    + " ".join(f"WHEN {i} THEN '{m}'" for i, (m, _) in enumerate(_MIME_EXPECT))
    + " END AS mime,\n"
    + "  CASE doc_id % 14 "
    + " ".join(f"WHEN {i} THEN '{r}'" for i, (_, r) in enumerate(_MIME_EXPECT))
    + " END AS route\n"
    + "FROM documents ORDER BY doc_id"
)


@_register("mime_sniff_route", oracle=_MIME_ORACLE)
def q_mime_sniff_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHATWG MIME sniffing over raw body bytes + the pipeline router
    (functions/mimesniff.py): servers lie about Content-Type at web
    scale, so the route into parse / image / audio / video / skip keys
    on the bytes. Pure codegen expressions over the latin-1 view."""
    docs = _t(spark, sf_dir, "documents")
    body = F.lit(None).cast("string")
    for i, (py, _) in reversed(list(enumerate(_MIME_CASES))):
        body = F.when(F.col("doc_id") % 14 == i, F.lit(py)).otherwise(body)
    pages = docs.select("doc_id", body.alias("body"))
    mime = MS.sniff_mime(F.col("body"))
    return pages.select(
        "doc_id", mime.alias("mime"), MS.route_for(mime).alias("route")
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# CCNet head/middle/tail buckets: the LM-score oracle (extended.py) and
# the language-ID oracle (corpusdocs.py) compose as subqueries, then the
# same integer cumulative-count rule splits each language into thirds at
# (lang, distinct-score) grain — ties never split.
# ---------------------------------------------------------------------------


def _lm_buckets_oracle() -> str:
    from crawler_ai_spark.queries.corpusdocs import _lang_oracle
    from crawler_ai_spark.queries.extended import _lm_score_oracle

    return f"""
WITH lm AS ({_lm_score_oracle()}),
lg AS ({_lang_oracle()}),
j AS (
  SELECT lm.doc_id, lg.lang_pred, lm.lm_score, lm.n_bigrams,
         coalesce(lm.lm_score, -1e9) AS sk
  FROM lm JOIN lg USING (doc_id)
),
sc AS (SELECT lang_pred, sk, count(*) AS c FROM j GROUP BY 1, 2),
cum AS (
  SELECT lang_pred, sk,
         sum(c) OVER (PARTITION BY lang_pred ORDER BY sk DESC
                      ROWS UNBOUNDED PRECEDING) AS cum_incl,
         sum(c) OVER (PARTITION BY lang_pred) AS n
  FROM sc
)
SELECT j.doc_id, j.lang_pred, j.lm_score, j.n_bigrams,
       CASE WHEN cum.cum_incl * 3 <= cum.n THEN 'head'
            WHEN cum.cum_incl * 3 <= cum.n * 2 THEN 'middle'
            ELSE 'tail' END AS lm_bucket
FROM j JOIN cum USING (lang_pred, sk)
ORDER BY j.doc_id
"""


@_register("doc_lm_buckets", oracle=_lm_buckets_oracle())
def q_doc_lm_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style per-language head/middle/tail quality buckets
    (pipeline/corpus.lm_buckets): the corpus-trained bigram LM score cut
    into thirds per language with an integer cumulative-count rule at
    (language, distinct-score) grain — the standard curation split that
    keeps head+middle and drops tail."""
    from crawler_ai_spark.pipeline.corpus import lm_buckets

    docs = _t(spark, sf_dir, "documents")
    return lm_buckets(docs).orderBy("doc_id")


# ---------------------------------------------------------------------------
# DNS resolution stage (operators/resolver.py): distinct hosts → (host,
# ip) with shared-hosting cluster skew, oracle-predicted from md5(host)
# — plus the derived server-grain budget shape (hosts per IP), which is
# exactly the skew apply_ip_budget exists to throttle.
# ---------------------------------------------------------------------------

_DNS_ORACLE = """
WITH hosts AS (
  SELECT DISTINCT 'srv' || (doc_id % 61) || '.example.net' AS host
  FROM documents
),
k AS (
  SELECT host,
         CAST(concat('0x', substr(md5(host), 1, 8)) AS BIGINT) AS key
  FROM hosts
),
r AS (
  SELECT host, key % 100 AS outcome, key % 40 AS c FROM k
)
SELECT host,
       CASE WHEN outcome < 97
            THEN '10.' || (c % 250) || '.' || ((c * 7) % 250) || '.' || (c % 50 + 1)
       END AS ip
FROM r ORDER BY host
"""


@_register("dns_resolve_hosts", oracle=_DNS_ORACLE)
def q_dns_resolve_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DNS stage feeding server-grain politeness: distinct hosts →
    (host, ip) through the real mapInPandas resolver pass with the
    deterministic resolver (unresolvable hosts NULL → host-grain
    fallback). DuckDB re-derives outcome and cluster IP from md5."""
    from crawler_ai_spark.operators.resolver import resolve_hosts

    docs = _t(spark, sf_dir, "documents")
    hosts = docs.select(
        F.concat(
            F.lit("srv"), (F.col("doc_id") % 61).cast("string"), F.lit(".example.net")
        ).alias("host")
    )
    return resolve_hosts(hosts).orderBy("host")


# ---------------------------------------------------------------------------
# WET derivation (sources/warc.warc_to_wet): WARC response records →
# plain-text conversion records through the REAL canonical HTML→text
# pipeline (P2). The synthesized html wraps documents.text in
# <html><body>…</body></html>, so the canonical extraction reduces to
# the reference's collapse-ws → len>50 gate → [:5000] truncation —
# re-derivable in SQL.
# ---------------------------------------------------------------------------

_WET_HTML = "'<html><body>' || text || '</body></html>'"
_WET_MICROS = "1704067200000000 + doc_id * 1000000"

_WET_ORACLE = f"""
WITH pages AS (
  SELECT 'https://wet' || (doc_id % 17) || '.example.com/p/' || doc_id AS url,
         make_timestamp({_WET_MICROS}) AS warc_ts,
         trim(regexp_replace(text, '\\s+', ' ', 'g')) AS collapsed,
         doc_id
  FROM documents WHERE text IS NOT NULL AND doc_id % 19 != 0
)
SELECT url,
       strftime(warc_ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
       CASE WHEN length(collapsed) > 50 THEN substr(collapsed, 1, 5000)
            ELSE '' END AS text
FROM pages ORDER BY url
"""


@_register("warc_wet_extract", oracle=_WET_ORACLE)
def q_warc_wet_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common Crawl WET product, end to end: synthesized pages → WARC
    files (per-record gzip) → read back → canonical HTML→text conversion
    (the P2 byte-parity pipeline) — 4xx records drop like CC's WET does.
    The oracle re-derives the text from first principles, so framing,
    decode and extraction must compose to an exact identity."""
    from crawler_ai_spark.sources.warc import read_warc, warc_to_wet, write_warc

    docs = _t(spark, sf_dir, "documents").where("text IS NOT NULL")
    pages = docs.select(
        F.expr(
            "'https://wet' || CAST(doc_id % 17 AS STRING) || '.example.com/p/'"
            " || CAST(doc_id AS STRING)"
        ).alias("url"),
        F.expr(f"timestamp_micros({_WET_MICROS})").alias("warc_ts"),
        F.expr(f"CAST({_WET_HTML} AS BINARY)").alias("html"),
        F.expr("CAST(CASE WHEN doc_id % 19 = 0 THEN 404 ELSE 200 END AS INT)").alias(
            "status"
        ),
    )
    out = _scratch_dir("warc_wet_")
    write_warc(pages.repartition(8, "url"), out, gzip_records=True).collect()
    return (
        warc_to_wet(read_warc(spark, out))
        .select(
            "url",
            F.date_format("warc_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
            "text",
        )
        .orderBy("url")
    )


# ---------------------------------------------------------------------------
# RFC 9309 §2.2.1 user-agent group selection: five robots classes cover
# token-specific override, fallback to *, explicit empty (allow-all)
# token group, shared headers, and case-insensitive token match. The
# oracle predicts each class's outcome (robots_crawl_delay style).
# ---------------------------------------------------------------------------

_UA_TOKEN = "crawler-ai"

_UA_BODIES = [
    # 0: token group overrides star; its Crawl-delay wins too
    "User-agent: *\nCrawl-delay: 10\nDisallow: /a\n"
    "User-agent: crawler-ai\nCrawl-delay: 5\nDisallow: /bot",
    # 1: only foreign specific groups → fall back to star
    "User-agent: *\nDisallow: /a\nUser-agent: Googlebot\nDisallow: /g",
    # 2: EMPTY token group (trailing, no rules) = explicit allow-all for
    # this bot; a token line merely SHARING a header with * would instead
    # inherit the shared rules (RFC group semantics)
    "User-agent: *\nDisallow: /a\nUser-agent: crawler-ai\n",
    # 3: shared header lists several tokens
    "User-agent: Googlebot\nUser-agent: crawler-ai\nDisallow: /shared\n"
    "User-agent: *\nDisallow: /a",
    # 4: case-insensitive token match
    "USER-AGENT: Crawler-AI\nDisallow: /case\nUser-agent: *\nDisallow: /a",
]

_UA_EXPECT = [("/bot", 5.0), ("/a", None), ("", None), ("/shared", None), ("/case", None)]


@_register(
    "robots_ua_groups",
    oracle="SELECT host,\n"
    + "  CASE n "
    + " ".join(
        f"WHEN {i} THEN '{d}'" for i, (d, _) in enumerate(_UA_EXPECT)
    )
    + " END AS disallow,\n"
    + "  CASE n "
    + " ".join(
        f"WHEN {i} THEN {c if c is not None else 'NULL'}" for i, (_, c) in enumerate(_UA_EXPECT)
    )
    + " END AS crawl_delay_s\n"
    + "FROM (SELECT DISTINCT 'ua' || (doc_id % 35) || '.example' AS host,"
    + " (doc_id % 35) % 5 AS n FROM documents) ORDER BY host",
)
def q_robots_ua_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 §2.2.1 — the crawler's own product token selects its
    rule group: matching groups (exact value, case-insensitive, shared
    headers included) override the * groups entirely, an explicitly
    EMPTY matching group means allow-all, and hosts with only foreign
    specific groups fall back to *. Runs the real parser
    (sources/robots.parse_robots(ua_token=...))."""
    from crawler_ai_spark.sources.robots import parse_robots

    docs = _t(spark, sf_dir, "documents")
    hosts = docs.select(
        F.expr("'ua' || CAST(doc_id % 35 AS STRING) || '.example'").alias("host"),
        (F.col("doc_id") % 35 % 5).cast("int").alias("n"),
    ).distinct()
    body = F.lit(None).cast("string")
    for i, b in reversed(list(enumerate(_UA_BODIES))):
        body = F.when(F.col("n") == i, F.lit(b)).otherwise(body)
    parsed = parse_robots(
        hosts.select("host", body.alias("body")),
        with_crawl_delay=True,
        ua_token=_UA_TOKEN,
    )
    return parsed.select(
        "host",
        F.concat_ws("|", F.array_sort("disallow_prefixes")).alias("disallow"),
        "crawl_delay_s",
    ).orderBy("host")


# ---------------------------------------------------------------------------
# IVF-PQ (pipeline/similarity.py): the memory-bounded 10^10-vector ANN
# design — coarse IVF pruning + product-quantized codes + ADC scoring +
# exact re-rank of a code-derived shortlist (the FAISS refine pattern).
# ---------------------------------------------------------------------------

_PQ_SAMPLE_MOD, _PQ_SAMPLE_KEEP = 5, 4  # same md5 gate as emb_ann_recall


@_register("emb_ivfpq_topk")  # no oracle: PQ recall < 1 by design
def q_emb_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ top-10 with exact refine — the THIRD ANN scale path next to
    hyperplane-LSH and IVF-Flat, and the only one whose index stores
    bytes-per-vector codes instead of vectors (64 floats → 16 six-bit
    codes here): the 10^10-vector memory story. Rows-only in the driver
    gate; `emb_ivfpq_recall` is the quality row."""
    from crawler_ai_spark.pipeline import similarity as SIM

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    path = _scratch_dir("emb_ivfpq_")
    SIM.build_ivfpq_index(emb, path, n_centroids=16, m=16, pq_k=64)
    return SIM.ivfpq_topk_refined(
        spark, path, queries, emb, k=10, n_probe=12, shortlist_mult=6
    ).orderBy("query_id", "rank")


_PQ_RECALL_ORACLE = f"""
WITH corpus AS (
  SELECT * FROM embeddings
  WHERE CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT)
        % {_PQ_SAMPLE_MOD} < {_PQ_SAMPLE_KEEP}
),
scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         round(list_dot_product(a.embedding, b.embedding) /
               greatest(sqrt(list_dot_product(a.embedding, a.embedding)) *
                        sqrt(list_dot_product(b.embedding, b.embedding)), 1e-12),
               6) AS cosine
  FROM embeddings a, corpus b
  WHERE a.vec_id < 10
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
),
brute AS (SELECT query_id, neighbor_id FROM ranked WHERE rank <= 10)
SELECT 'ivfpq' AS path,
       CAST((SELECT count(DISTINCT query_id) FROM brute) AS BIGINT) AS n_queries,
       CAST((SELECT count(*) FROM brute) AS BIGINT) AS n_brute,
       TRUE AS recall_ok
"""


@_register("emb_ivfpq_recall", oracle=_PQ_RECALL_ORACLE)
def q_emb_ivfpq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible IVF-PQ quality gate (emb_ann_recall pattern): the
    refined PQ path's recall@10 vs brute-force IN-PLAN over the same
    md5-sampled corpus; recall_ok = recall >= 0.9 folds into the value
    hash, so PQ degradation flips the row red."""
    from crawler_ai_spark.pipeline import similarity as SIM

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.where(
        F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % _PQ_SAMPLE_MOD
        < _PQ_SAMPLE_KEEP
    )
    path = _scratch_dir("emb_ivfpq_rec_")
    SIM.build_ivfpq_index(corpus, path, n_centroids=16, m=16, pq_k=64)
    ann = SIM.ivfpq_topk_refined(
        spark, path, queries, corpus, k=10, n_probe=12, shortlist_mult=6
    ).select("query_id", "neighbor_id", F.lit(1).alias("hit"))
    brute = SIM.cosine_topk(queries, corpus, k=10, q_id="query_id").select(
        "query_id", "neighbor_id"
    )
    return (
        brute.join(ann, ["query_id", "neighbor_id"], "left")
        .agg(
            F.countDistinct("query_id").cast("long").alias("n_queries"),
            F.count("*").cast("long").alias("n_brute"),
            (
                F.sum(F.coalesce(F.col("hit"), F.lit(0)))
                >= F.lit(0.9) * F.count("*")
            ).alias("recall_ok"),
        )
        .select(F.lit("ivfpq").alias("path"), "n_queries", "n_brute", "recall_ok")
    )


# ---------------------------------------------------------------------------
# Soft-404 detection (functions/soft404.py): six synthesized response
# classes — title-phrase hit, short error body, long page QUOTING an
# error phrase (must not flag), healthy page, hard 404, null title. The
# oracle re-derives the phrase/gate logic from the same constants.
# ---------------------------------------------------------------------------


def _like_any(col_sql: str, phrases) -> str:
    return "(" + " OR ".join(
        "lower(coalesce({c}, '')) LIKE '%{p}%'".format(
            c=col_sql, p=p.replace("'", "''")
        )
        for p in phrases
    ) + ")"


def _soft404_oracle() -> str:
    from crawler_ai_spark.functions import soft404 as S4

    return f"""
WITH resp AS (
  SELECT doc_id,
    CAST(CASE WHEN doc_id % 6 = 4 THEN 404 ELSE 200 END AS INT) AS status,
    CASE doc_id % 6
      WHEN 0 THEN 'Page Not Found - Acme'
      WHEN 1 THEN 'Products'
      WHEN 2 THEN 'Annual report'
      WHEN 3 THEN 'Welcome'
      WHEN 4 THEN 'Not Found'
    END AS title,
    CASE doc_id % 6
      WHEN 0 THEN text
      WHEN 1 THEN 'the page you requested could not be found.'
      WHEN 2 THEN repeat('lorem ipsum dolor sit amet ', 30)
                  || ' our 404 error rate fell last year'
      WHEN 3 THEN text
      WHEN 4 THEN 'gone'
      ELSE 'this page does not exist'
    END AS text
  FROM documents
)
SELECT doc_id, status,
  (status = 200 AND (
     {_like_any("title", S4.TITLE_PHRASES)}
     OR ({_like_any("text", S4.BODY_PHRASES)}
         AND length(trim(coalesce(text, ''))) < {S4.SHORT_BODY_CHARS})
  )) AS soft404
FROM resp ORDER BY doc_id
"""


@_register("soft404_detect", oracle=_soft404_oracle())
def q_soft404_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft-404 gate — 200-status pages whose content says not-found
    (title phrase, or body phrase on a short page; long pages merely
    quoting an error phrase pass). Keeps error boilerplate out of the
    corpus and dead URLs out of the recrawl ledger. Pure codegen."""
    from crawler_ai_spark.functions import soft404 as S4

    docs = _t(spark, sf_dir, "documents")
    cls = F.col("doc_id") % 6
    resp = docs.select(
        "doc_id",
        F.when(cls == 4, F.lit(404)).otherwise(F.lit(200)).cast("int").alias("status"),
        F.when(cls == 0, F.lit("Page Not Found - Acme"))
        .when(cls == 1, F.lit("Products"))
        .when(cls == 2, F.lit("Annual report"))
        .when(cls == 3, F.lit("Welcome"))
        .when(cls == 4, F.lit("Not Found"))
        .alias("title"),
        F.when(cls == 0, F.col("text"))
        .when(cls == 1, F.lit("the page you requested could not be found."))
        .when(
            cls == 2,
            F.concat(
                F.expr("repeat('lorem ipsum dolor sit amet ', 30)"),
                F.lit(" our 404 error rate fell last year"),
            ),
        )
        .when(cls == 3, F.col("text"))
        .when(cls == 4, F.lit("gone"))
        .otherwise(F.lit("this page does not exist"))
        .alias("text"),
    )
    return resp.select(
        "doc_id",
        "status",
        S4.is_soft404(F.col("status"), F.col("title"), F.col("text")).alias("soft404"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# rel=canonical collapse (RFC 6596, functions/urls.canonical_link_expr):
# synthesized pages where URL variants (tracking params, print views)
# declare one canonical; the crawl keeps ONE representative per
# canonical target. Four html classes cover rel-then-href,
# href-then-rel, single quotes/no quotes, and absent (self-canonical).
# ---------------------------------------------------------------------------

_CANON_ORACLE = """
WITH pages AS (
  SELECT doc_id,
    'https://csite' || (doc_id % 13) || '.example/page/' || (doc_id // 4)
      || CASE doc_id % 4 WHEN 1 THEN '?utm_source=feed'
                         WHEN 2 THEN '/print' WHEN 3 THEN '?ref=rss'
                         ELSE '' END AS url,
    'https://csite' || (doc_id % 13) || '.example/page/' || (doc_id // 4)
      AS canon_target,
    doc_id % 4 AS variant
  FROM documents
),
extracted AS (
  SELECT doc_id, url,
    CASE variant
      WHEN 0 THEN NULL
      ELSE canon_target
    END AS canonical
  FROM pages
),
collapsed AS (
  SELECT coalesce(canonical, url) AS fetch_key,
         count(*) AS n_variants,
         min(url) AS representative
  FROM extracted GROUP BY 1
)
SELECT fetch_key, n_variants, representative
FROM collapsed ORDER BY fetch_key
"""


@_register("canonical_link_collapse", oracle=_CANON_ORACLE)
def q_canonical_link_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rel=canonical dedup: extract each page's declared canonical URL
    (both attribute orders, quoted or not) and collapse URL variants to
    one fetch key — pages without a declaration are their own canonical.
    Map-side extraction + one group-by on the canonical key."""
    from crawler_ai_spark.functions.urls import canonical_link_expr

    docs = _t(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.expr(
            "'https://csite' || CAST(doc_id % 13 AS STRING) || '.example/page/' "
            "|| CAST(doc_id div 4 AS STRING)"
        ).alias("canon_target"),
        (F.col("doc_id") % 4).alias("variant"),
    ).select(
        "doc_id", "canon_target", "variant",
        F.concat(
            F.col("canon_target"),
            F.when(F.col("variant") == 1, F.lit("?utm_source=feed"))
            .when(F.col("variant") == 2, F.lit("/print"))
            .when(F.col("variant") == 3, F.lit("?ref=rss"))
            .otherwise(F.lit("")),
        ).alias("url"),
    )
    # three html shapes + one canonical-less page, all through the REAL
    # extractor (the oracle predicts its output per class)
    html = (
        F.when(
            F.col("variant") == 1,
            F.concat(
                F.lit('<html><head><link rel="canonical" href="'),
                F.col("canon_target"), F.lit('"></head><body>a</body></html>'),
            ),
        )
        .when(
            F.col("variant") == 2,
            F.concat(
                F.lit("<html><head><link href='"), F.col("canon_target"),
                F.lit("' rel='canonical'></head><body>b</body></html>"),
            ),
        )
        .when(
            F.col("variant") == 3,
            F.concat(
                F.lit("<html><head><LINK REL=canonical HREF="),
                F.col("canon_target"), F.lit("></head><body>c</body></html>"),
            ),
        )
        .otherwise(F.lit("<html><head><title>t</title></head><body>d</body></html>"))
    )
    extracted = base.select(
        "doc_id", "url", canonical_link_expr(html).alias("canonical")
    )
    return (
        extracted.groupBy(
            F.coalesce(F.col("canonical"), F.col("url")).alias("fetch_key")
        )
        .agg(
            F.count("*").cast("long").alias("n_variants"),
            F.min("url").alias("representative"),
        )
        .orderBy("fetch_key")
    )


# ---------------------------------------------------------------------------
# RFC 9111 freshness → recrawl interval (_http_ttl_batches): directive
# classes cover plain max-age, huge max-age (clamp), zero, no-cache,
# no-store with other directives, s-maxage only (ignored — we are a
# private cache), absent, and garbage. Interval 3600 s, cap 64.
# ---------------------------------------------------------------------------

_HTTP_TTL_CASES = [
    ("max-age=7200", 2),
    ("public, max-age=86400", 24),
    ("max-age=99999999", 64),
    ("max-age=0", 1),
    ("no-cache", 1),
    ("no-store, must-revalidate", 1),
    ("s-maxage=7200", None),
    (None, None),
    ("garbage-directive", None),
    ("MAX-AGE=10800", 3),
]


@_register(
    "http_ttl_schedule",
    oracle="SELECT doc_id,\n  CASE doc_id % 10 "
    + " ".join(
        f"WHEN {i} THEN {'NULL' if c is None else repr(c).replace(chr(39)*2, chr(39))}"
        for i, (c, _) in enumerate(
            (c if c is None else c.replace("'", "''"), t)
            for c, t in _HTTP_TTL_CASES
        )
    )
    + " END AS cache_control,\n  CAST(CASE doc_id % 10 "
    + " ".join(
        f"WHEN {i} THEN {t if t is not None else 'NULL'}"
        for i, (_, t) in enumerate(_HTTP_TTL_CASES)
    )
    + " END AS INT) AS ttl_batches\nFROM documents ORDER BY doc_id",
)
def q_http_ttl_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9111 Cache-Control → per-URL recrawl interval: max-age maps to
    ceil(max-age / batch_interval) clamped to [1, cap]; no-cache /
    no-store / max-age=0 pin the minimum; s-maxage alone, absence and
    garbage leave the crawler's own schedule (NULL). The server knows
    its churn — where it says so, the ledger believes it."""
    from crawler_ai_spark.plans.crawl_loop import _http_ttl_batches

    docs = _t(spark, sf_dir, "documents")
    cc = F.lit(None).cast("string")
    for i, (c, _) in reversed(list(enumerate(_HTTP_TTL_CASES))):
        cc = F.when(F.col("doc_id") % 10 == i, F.lit(c)).otherwise(cc)
    resp = docs.select("doc_id", cc.alias("cache_control"))
    return resp.select(
        "doc_id",
        "cache_control",
        _http_ttl_batches(F.col("cache_control"), 3600, 64).alias("ttl_batches"),
    ).orderBy("doc_id")
