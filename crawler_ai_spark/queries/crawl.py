"""Crawl-engine operators over synthesized URLs (SURVEY.md S/P/F/C/D/J/O/W rows exercised as catalog queries).

Split out of the monolithic catalog.py in round 4 (no behavior
change; see catalog.py for the registry contract and parity rules)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from crawler_ai_spark import constants as K
from crawler_ai_spark.functions import filters as FL

from crawler_ai_spark.queries._shared import (
    SYNTH_URLS_CTE,
    _any_substr_rx,
    _register,
    _rx_quote,
    _scratch_dir,
    _sql_quote,
    _t,
    synth_urls,
)


# ===========================================================================
# 1. crawl-engine operators over synthesized URLs
# ===========================================================================


@_register(
    "url_parse_norm",
    oracle=f"""
WITH {SYNTH_URLS_CTE},
parsed AS (
  SELECT doc_id, url,
         lower(regexp_extract(url, '^https?://([^/?#]+)', 1)) AS host,
         regexp_extract(url, '^https?://[^/?#]+([^?#]*)', 1) AS path,
         CASE WHEN regexp_extract(url, '^https?://([^/?#]+)', 1) LIKE 'www.%'
              THEN substr(regexp_extract(url, '^https?://([^/?#]+)', 1), 5)
              ELSE regexp_extract(url, '^https?://([^/?#]+)', 1) END AS host_nw
  FROM synth_urls
)
SELECT doc_id, url, host, path,
       upper(substr(split_part(host_nw, '.', 1), 1, 1)) ||
       substr(split_part(host_nw, '.', 1), 2) AS company
FROM parsed ORDER BY doc_id
""",
)
def q_url_parse_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P11 — URL decomposition + company-from-URL on one engine pass."""
    urls = synth_urls(spark, sf_dir)
    return urls.select(
        "doc_id",
        "url",
        FL.url_host(F.col("url")).alias("host"),
        FL.url_path(F.col("url")).alias("path"),
        FL.company_from_url_expr(F.col("url")).alias("company"),
    ).orderBy("doc_id")


def _job_url_oracle() -> str:
    skip_rx = _any_substr_rx(K.JOB_URL_SKIP_PATTERNS + K.JOB_URL_SKIP_FILES)
    job_rx = _any_substr_rx(K.JOB_URL_PATTERNS)
    query_rx = _any_substr_rx(K.JOB_QUERY_PARAMS)
    nonjob_rx = _any_substr_rx(K.OBVIOUS_NON_JOB_PATTERNS)
    sub_rx = "^(?:" + "|".join(_rx_quote(s) for s in K.CAREER_SUBDOMAINS) + ")"
    return f"""
WITH {SYNTH_URLS_CTE},
feat AS (
  SELECT doc_id, url, lower(url) AS low,
         lower(regexp_extract(url, '^https?://([^/?#]+)', 1)) AS host,
         regexp_replace(regexp_extract(url, '^https?://[^/?#]+([^?#]*)', 1),
                        '^/+|/+$', '', 'g') AS pstrip
  FROM synth_urls
),
cls AS (
  SELECT doc_id, url,
    CASE
      WHEN regexp_matches(low, {_sql_quote(skip_rx)})
        OR NOT (url LIKE 'http://%' OR url LIKE 'https://%') THEN FALSE
      WHEN regexp_matches(host, {_sql_quote(sub_rx)}) AND pstrip <> '' THEN TRUE
      WHEN regexp_matches(low, {_sql_quote(job_rx)}) THEN TRUE
      WHEN contains(url, '?') AND regexp_matches(low, {_sql_quote(query_rx)}) THEN TRUE
      WHEN pstrip <> '' AND regexp_matches(split_part(pstrip, '/', -1), '^[0-9]+$') THEN TRUE
      ELSE FALSE
    END AS is_job_url
  FROM feat
)
SELECT doc_id, url, is_job_url FROM cls ORDER BY doc_id
"""


@_register("job_url_classify", oracle=_job_url_oracle())
def q_job_url_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 — the 4-priority job-URL rule cascade as one boolean column."""
    urls = synth_urls(spark, sf_dir)
    return urls.select(
        "doc_id", "url", FL.is_job_url_expr(F.col("url")).alias("is_job_url")
    ).orderBy("doc_id")


def _priority_oracle() -> str:
    car = _any_substr_rx(K.CAREER_KEYWORDS)
    nav = _any_substr_rx(K.NAV_KEYWORDS)
    con = _any_substr_rx(K.CONTENT_KEYWORDS)
    return f"""
WITH {SYNTH_URLS_CTE},
prio AS (
  SELECT doc_id, host, url,
    CASE WHEN regexp_matches(lower(url), {_sql_quote(car)}) THEN 100
         WHEN regexp_matches(lower(url), {_sql_quote(nav)}) THEN 80
         WHEN regexp_matches(lower(url), {_sql_quote(con)}) THEN 50
         ELSE 10 END AS priority
  FROM synth_urls
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY host, priority ORDER BY doc_id) AS bucket_rank
  FROM prio
)
SELECT doc_id, host, url, priority, bucket_rank
FROM ranked
WHERE bucket_rank <= CASE priority WHEN 100 THEN 5 WHEN 80 THEN 3 ELSE 2 END
ORDER BY host, priority DESC, bucket_rank
"""


@_register("priority_schedule", oracle=_priority_oracle())
def q_priority_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1+O2 — priority bucketing + per-(host, bucket) budget window: the
    frontier scheduler's core ranking on one batch of candidate URLs."""
    urls = synth_urls(spark, sf_dir)
    w = Window.partitionBy("host", "priority").orderBy("doc_id")
    return (
        urls.withColumn("priority", FL.priority_expr(F.col("url")))
        .withColumn("bucket_rank", F.row_number().over(w))
        .where(F.col("bucket_rank") <= FL.priority_budget_expr(F.col("priority")))
        .select("doc_id", "host", "url", "priority", "bucket_rank")
        .orderBy("host", F.col("priority").desc(), "bucket_rank")
    )


@_register(
    "frontier_dedup",
    oracle=f"""
WITH {SYNTH_URLS_CTE},
candidates AS (SELECT doc_id AS discovered_seq, url, host FROM synth_urls),
seen AS (SELECT DISTINCT url FROM synth_urls WHERE doc_id % 3 = 0),
firsts AS (
  SELECT *, row_number() OVER (PARTITION BY url ORDER BY discovered_seq) AS rn
  FROM candidates
)
SELECT f.url, f.host, f.discovered_seq
FROM firsts f LEFT JOIN seen s ON f.url = s.url
WHERE f.rn = 1 AND s.url IS NULL
ORDER BY f.discovered_seq
""",
)
def q_frontier_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 — within-batch first-wins dedup + URL-seen anti-join."""
    urls = synth_urls(spark, sf_dir)
    candidates = urls.select(
        F.col("doc_id").alias("discovered_seq"), "url", "host"
    )
    seen = urls.where(F.col("doc_id") % 3 == 0).select("url").distinct()
    w = Window.partitionBy("url").orderBy("discovered_seq")
    firsts = (
        candidates.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1).drop("rn")
    )
    return (
        firsts.join(seen, "url", "left_anti")
        .select("url", "host", "discovered_seq")
        .orderBy("discovered_seq")
    )


@_register(
    "politeness_budget",
    oracle=f"""
WITH {SYNTH_URLS_CTE},
ranked AS (
  SELECT host, url, doc_id,
         row_number() OVER (PARTITION BY host ORDER BY doc_id) AS host_rank
  FROM synth_urls
)
SELECT host,
       count(*) FILTER (WHERE host_rank <= 4) AS scheduled,
       count(*) FILTER (WHERE host_rank > 4) AS deferred
FROM ranked GROUP BY host ORDER BY host
""",
)
def q_politeness_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 — per-host politeness cap: ≤ 4 URLs/host/batch, rest deferred."""
    urls = synth_urls(spark, sf_dir)
    w = Window.partitionBy("host").orderBy("doc_id")
    ranked = urls.withColumn("host_rank", F.row_number().over(w))
    return (
        ranked.groupBy("host")
        .agg(
            F.sum((F.col("host_rank") <= 4).cast("long")).alias("scheduled"),
            F.sum((F.col("host_rank") > 4).cast("long")).alias("deferred"),
        )
        .orderBy("host")
    )


def _career_score_oracle() -> str:
    url_rx = _any_substr_rx(K.CAREER_URL_INDICATORS)
    return f"""
WITH {SYNTH_URLS_CTE}
SELECT doc_id, url,
       round(least(1.0,
         (CASE WHEN regexp_matches(lower(url), {_sql_quote(url_rx)}) THEN 0.4 ELSE 0.0 END)
         + (CASE WHEN (doc_id % 12) IN (0, 3, 11) THEN 0.3 ELSE 0.0 END)
       ), 6) AS career_score
FROM synth_urls ORDER BY doc_id
"""


@_register("career_score_urls", oracle=_career_score_oracle())
def q_career_score_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 (url part) — additive capped career score; the title/content
    terms use a deterministic proxy (path family) on both engines."""
    urls = synth_urls(spark, sf_dir)
    url_hit = F.when(
        FL.any_substr(F.lower(F.col("url")), K.CAREER_URL_INDICATORS), F.lit(0.4)
    ).otherwise(F.lit(0.0))
    title_hit = F.when(
        (F.col("doc_id") % 12).isin(0, 3, 11), F.lit(0.3)
    ).otherwise(F.lit(0.0))
    return urls.select(
        "doc_id",
        "url",
        F.round(F.least(F.lit(1.0), url_hit + title_hit), 6).alias("career_score"),
    ).orderBy("doc_id")


def _email_oracle() -> str:
    # RE2 has no lookaround: use the two overlapping email sweeps (both
    # RE2-safe) + reject list, as the reference's crawler.py:292-316 does
    rx1 = r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b"
    bad = _any_substr_rx(K.EMAIL_INVALID_SUBSTRINGS)
    return f"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact: user' || doc_id || '@mail' || (doc_id % 7) ||
         '.example.com or favicon' || doc_id || '@x.png' AS text
  FROM documents
),
found AS (
  SELECT doc_id, lower(e) AS email
  FROM aug, unnest(regexp_extract_all(text, {_sql_quote(rx1)})) AS t(e)
),
valid AS (
  SELECT DISTINCT doc_id, email FROM found
  WHERE NOT regexp_matches(email, {_sql_quote(bad)})
)
SELECT doc_id, email FROM valid ORDER BY doc_id, email
"""


@_register("email_extract", oracle=_email_oracle())
def q_email_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 — email sweep + reject-substring filter + dedup, exploded."""
    docs = _t(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.expr(
            "text || ' contact: user' || CAST(doc_id AS STRING) || '@mail' || "
            "CAST(doc_id % 7 AS STRING) || '.example.com or favicon' || "
            "CAST(doc_id AS STRING) || '@x.png'"
        ).alias("text"),
    )
    rx = r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b"
    found = aug.select(
        "doc_id",
        F.explode(F.regexp_extract_all(F.col("text"), F.lit(rx), F.lit(0))).alias("raw"),
    ).select("doc_id", F.lower(F.col("raw")).alias("email"))
    valid = found.where(~FL.any_substr(F.col("email"), K.EMAIL_INVALID_SUBSTRINGS))
    return valid.distinct().orderBy("doc_id", "email")


# training-data pipeline: PII scrubbing before a corpus ships to training.
# RE2-safe patterns shared verbatim by both engines (the Java/RE2 dialect
# overlap this repo's oracles rely on); emails first so their digits never
# feed the phone pattern.
_PII_EMAIL_RX = r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b"
_PII_PHONE_RX = r"\b0\d{8,10}\b"


@_register(
    "doc_pii_scrub",
    oracle=f"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail'
              || CAST(doc_id % 7 AS VARCHAR) || '.example.com or call 09'
              || lpad(CAST(doc_id % 10000000 AS VARCHAR), 8, '0') || ' today' AS text
  FROM documents
),
counted AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{_PII_EMAIL_RX}')) AS n_emails,
         regexp_replace(text, '{_PII_EMAIL_RX}', '<EMAIL>', 'g') AS no_email
  FROM aug
)
SELECT doc_id,
       CAST(n_emails AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(no_email, '{_PII_PHONE_RX}')) AS BIGINT) AS n_phones,
       regexp_replace(no_email, '{_PII_PHONE_RX}', '<PHONE>', 'g') AS text_scrubbed
FROM counted ORDER BY doc_id
""",
)
def q_doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data PII scrub: redact emails then 0-leading phone runs
    with typed placeholders, counting replacements — the redaction pass a
    corpus gets before training. Pure JVM regexp_replace (global on both
    engines), one linear scan, no shuffle; the input is augmented with
    one synthesized email+phone per doc so the gate is non-degenerate."""
    docs = _t(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".example.com or call 09"),
            F.lpad((F.col("doc_id") % 10_000_000).cast("string"), 8, "0"),
            F.lit(" today"),
        ).alias("text"),
    )
    no_email = F.regexp_replace(F.col("text"), _PII_EMAIL_RX, "<EMAIL>")
    out = aug.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_PII_EMAIL_RX), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        no_email.alias("no_email"),
    )
    return out.select(
        "doc_id",
        "n_emails",
        F.size(F.regexp_extract_all(F.col("no_email"), F.lit(_PII_PHONE_RX), F.lit(0)))
        .cast("long")
        .alias("n_phones"),
        F.regexp_replace(F.col("no_email"), _PII_PHONE_RX, "<PHONE>").alias(
            "text_scrubbed"
        ),
    ).orderBy("doc_id")


@_register(
    "crawl_harvest_links",
    oracle=f"""
WITH {SYNTH_URLS_CTE},
pages AS (
  SELECT doc_id,
    '<html><head><title>Doc ' || doc_id || '</title></head><body>'
    || '<nav class="navbar"><a href="/careers">Careers</a>'
    || '<a href="/about-us">About</a><a href="#top">Top</a></nav>'
    || '<p>body text here</p>'
    || '<a href="/jobs/view/' || doc_id || '">Open role</a>'
    || '<a href="javascript:void(0)">Menu</a>'
    || '<footer><a href="/contact">Contact</a></footer></body></html>' AS html
  FROM synth_urls WHERE doc_id % 5 = 0
),
links AS (
  SELECT doc_id, regexp_extract_all(html, 'href="([^"]*)"', 1) AS hrefs
  FROM pages
),
exploded AS (
  SELECT doc_id, unnest(hrefs) AS href,
         unnest(generate_series(0, len(hrefs) - 1)) AS link_pos
  FROM links
)
SELECT doc_id, link_pos, href FROM exploded ORDER BY doc_id, link_pos
""",
)
def q_crawl_harvest_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 through the REAL structural parse UDF: synthesized HTML → parse →
    ordered link explode; the oracle recovers hrefs by regex. Checks that
    the DOM scanner sees exactly the document-order links."""
    from crawler_ai_spark.functions.html import explode_links, with_parse

    urls = synth_urls(spark, sf_dir).where(F.col("doc_id") % 5 == 0)
    pages = urls.select(
        "doc_id",
        F.expr(
            "'<html><head><title>Doc ' || CAST(doc_id AS STRING) || '</title></head><body>'"
            " || '<nav class=\"navbar\"><a href=\"/careers\">Careers</a>'"
            " || '<a href=\"/about-us\">About</a><a href=\"#top\">Top</a></nav>'"
            " || '<p>body text here</p>'"
            " || '<a href=\"/jobs/view/' || CAST(doc_id AS STRING) || '\">Open role</a>'"
            " || '<a href=\"javascript:void(0)\">Menu</a>'"
            " || '<footer><a href=\"/contact\">Contact</a></footer></body></html>'"
        ).alias("html"),
    )
    parsed = with_parse(pages)
    return (
        explode_links(parsed)
        .where(F.col("href").isNotNull())
        .select("doc_id", "link_pos", "href")
        .orderBy("doc_id", "link_pos")
    )


# ===========================================================================
# host-graph rank (crawl-budget prioritization; operators/hostrank.py)
# ===========================================================================

_HR_DAMP = 0.85
_HR_N = 37
_HR_ITERS = 3


def _host_rank_oracle() -> str:
    """Unrolled power iteration; every float literal is emitted in
    scientific notation so DuckDB parses DOUBLE (a bare decimal literal
    would be DECIMAL and the arithmetic would diverge from Spark's IEEE
    doubles). Contributions fold in src-sorted order — bit-identical to
    the Spark side's sorted-array aggregate."""
    damp = f"{_HR_DAMP:.17e}"
    base = f"{(1.0 - _HR_DAMP) / _HR_N:.17e}"
    init = f"{1.0 / _HR_N:.17e}"
    zero = f"{0.0:.17e}"
    steps = []
    prev = "r0"
    for k in range(1, _HR_ITERS + 1):
        steps.append(
            f"""
i{k} AS (
  SELECT e.dst AS host,
         list_reduce(list(r.rank / e.outdeg ORDER BY e.src), (a, b) -> a + b)
           AS inflow
  FROM e JOIN {prev} r ON e.src = r.host GROUP BY e.dst),
r{k} AS (
  SELECT h.host, {base} + {damp} * COALESCE(i{k}.inflow, {zero}) AS rank
  FROM hosts h LEFT JOIN i{k} ON h.host = i{k}.host)"""
        )
        prev = f"r{k}"
    return f"""
WITH hosts AS (SELECT range AS host FROM range({_HR_N})),
synth AS (
  SELECT DISTINCT doc_id % {_HR_N} AS src, (doc_id // {_HR_N}) % {_HR_N} AS dst
  FROM documents
  WHERE ((doc_id * 1103515245 + 12345) % 101) < 29
    AND (doc_id % {_HR_N}) != ((doc_id // {_HR_N}) % {_HR_N})),
ring AS (SELECT host AS src, (host + 1) % {_HR_N} AS dst FROM hosts),
edges AS (SELECT DISTINCT src, dst
          FROM (SELECT * FROM synth UNION ALL SELECT * FROM ring)),
deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
e AS (SELECT edges.src, edges.dst, deg.outdeg FROM edges JOIN deg USING (src)),
r0 AS (SELECT host, {init} AS rank FROM hosts),{",".join(steps)}
SELECT host, rank FROM r{_HR_ITERS} ORDER BY host
"""


def synth_host_edges(spark: SparkSession, sf_dir: str):
    """Deterministic host link graph from the documents table: src/dst are
    independent doc_id coordinates (mod / floor-div) so edges vary per
    src, an LCG-mixed keep-gate sparsifies, and a ring edge per host
    guarantees no dangling hosts (host_rank() requires outdeg >= 1)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    synth = (
        docs.where(
            f"((doc_id * 1103515245 + 12345) % 101) < 29"
            f" AND (doc_id % {_HR_N}) != ((doc_id DIV {_HR_N}) % {_HR_N})"
        )
        .selectExpr(f"doc_id % {_HR_N} AS src", f"(doc_id DIV {_HR_N}) % {_HR_N} AS dst")
        .distinct()
    )
    hosts = spark.range(_HR_N).select(F.col("id").alias("host"))
    ring = hosts.selectExpr("host AS src", f"(host + 1) % {_HR_N} AS dst")
    return synth.unionByName(ring).distinct(), hosts


@_register("host_rank", oracle=_host_rank_oracle())
def q_host_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global host-importance for crawl-budget allocation: damped PageRank
    (3 power steps) over the synthesized host graph. The reference has no
    global prioritizer (its spider scores URLs per-seed only —
    services/crawler/spider.py); this is the web-scale addition that
    ranks hosts for frontier budget. Oracle: unrolled CTE iteration in
    DuckDB, bit-identical doubles via src-sorted folds."""
    from crawler_ai_spark.operators.hostrank import host_rank

    edges, hosts = synth_host_edges(spark, sf_dir)
    return (
        host_rank(edges, hosts, n_hosts=_HR_N, iterations=_HR_ITERS, damping=_HR_DAMP)
        .orderBy("host")
    )


# ===========================================================================
# WARC source/sink round-trip (sources/warc.py)
# ===========================================================================

_WARC_HTML = "'<html><body>' || text || '</body></html>'"
_WARC_MICROS = "1704067200000000 + doc_id * 1000000 + (doc_id * 1337) % 1000000"


@_register(
    "warc_roundtrip",
    # DuckDB re-derives every column from documents directly; the Spark
    # side reads them back OUT OF WARC FILES it just wrote, so any header
    # mis-framing, payload corruption, timestamp truncation or lost/extra
    # record diverges the hash. strlen (BYTES in DuckDB, = Spark length on
    # BINARY) not length (chars).
    oracle=f"""
SELECT 'https://warc' || (doc_id % 23) || '.example.com/p/' || doc_id AS url,
       strftime(make_timestamp({_WARC_MICROS}),
                '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
       md5({_WARC_HTML}) AS html_md5,
       CAST(strlen({_WARC_HTML}) AS BIGINT) AS body_bytes,
       CAST(CASE WHEN doc_id % 19 = 0 THEN 404 ELSE 200 END AS INT) AS status
FROM documents WHERE text IS NOT NULL
ORDER BY url
""",
)
def q_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-Crawl-format I/O, driver-gated end to end: synthesized pages
    are written as per-record-gzip-member WARC/1.1 (ISO 28500, the CC
    layout) and read back through the binaryFile + Content-Length-framed
    parser; the oracle predicts every cell from first principles so the
    WARC layer must be an exact identity. Files land in a fresh mkdtemp
    scratch dir (session lifetime); the manifest collect() is 8 rows."""
    from crawler_ai_spark.sources.warc import read_warc, write_warc

    docs = _t(spark, sf_dir, "documents").where("text IS NOT NULL")
    pages = docs.select(
        F.expr(
            "'https://warc' || CAST(doc_id % 23 AS STRING) || '.example.com/p/'"
            " || CAST(doc_id AS STRING)"
        ).alias("url"),
        F.expr(f"timestamp_micros({_WARC_MICROS})").alias("warc_ts"),
        F.expr(f"CAST({_WARC_HTML} AS BINARY)").alias("html"),
        F.expr("CAST(CASE WHEN doc_id % 19 = 0 THEN 404 ELSE 200 END AS INT)").alias(
            "status"
        ),
    )
    out = _scratch_dir("warc_rt_")
    write_warc(pages.repartition(8, "url"), out, gzip_records=True).collect()
    back = read_warc(spark, out)
    return back.select(
        "url",
        F.date_format("warc_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
        F.md5(F.col("html")).alias("html_md5"),
        F.length(F.col("html")).cast("bigint").alias("body_bytes"),
        "status",
    ).orderBy("url")


# ===========================================================================
# rank-weighted politeness budgets (hostrank.budget_from_rank → W2)
# ===========================================================================

_RB_TOTAL, _RB_MIN, _RB_MAX = 150, 1, 8


def _rank_budget_oracle() -> str:
    car = _any_substr_rx(K.CAREER_KEYWORDS)
    nav = _any_substr_rx(K.NAV_KEYWORDS)
    con = _any_substr_rx(K.CONTENT_KEYWORDS)
    # reuse the full host-rank iteration (bit-identical ranks), then the
    # allocator clamp and the single-window equivalent of the two-phase
    # salted budget rank (see apply_host_budget's equivalence docstring)
    hr = _host_rank_oracle().strip()
    hr_ctes = hr[: hr.rindex("SELECT host, rank")].rstrip()  # CTE chain only
    return f"""{hr_ctes},
budgets AS (
  SELECT 'site' || host || '.example.com' AS hname,
         GREATEST({_RB_MIN}, LEAST({_RB_MAX},
             CAST(floor(CAST({_RB_TOTAL} AS DOUBLE) * rank) AS INTEGER)))
           AS host_budget
  FROM r{_HR_ITERS}),
{SYNTH_URLS_CTE.strip().lstrip()},
prio AS (
  SELECT doc_id, host, url,
    CASE WHEN regexp_matches(lower(url), {_sql_quote(car)}) THEN 100
         WHEN regexp_matches(lower(url), {_sql_quote(nav)}) THEN 80
         WHEN regexp_matches(lower(url), {_sql_quote(con)}) THEN 50
         ELSE 10 END AS priority
  FROM synth_urls),
ranked AS (
  SELECT p.*, b.host_budget,
         row_number() OVER (PARTITION BY p.host
                            ORDER BY p.priority DESC, p.doc_id, p.url) AS rk
  FROM prio p JOIN budgets b ON p.host = b.hname)
SELECT doc_id, host, url, priority, host_budget
FROM ranked WHERE rk <= host_budget
ORDER BY host, priority DESC, doc_id
"""


@_register("rank_budget_schedule", oracle=_rank_budget_oracle())
def q_rank_budget_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-weighted crawl-budget allocation end to end: host_rank over the
    synthesized host graph → budget_from_rank (floor(total×rank) clamped
    to [min,max]) → the REAL two-phase salted apply_host_budget (W2).
    Well-linked hosts get more fetch slots per batch; the oracle re-runs
    the whole chain as one SQL (single-window equivalence per
    apply_host_budget's docstring). Gates the allocator arithmetic AND
    the budget scheduler against rank-derived (not constant) caps."""
    from crawler_ai_spark.operators.frontier import apply_host_budget
    from crawler_ai_spark.operators.hostrank import budget_from_rank, host_rank

    edges, hosts = synth_host_edges(spark, sf_dir)
    ranks = host_rank(edges, hosts, n_hosts=_HR_N, iterations=_HR_ITERS)
    budgets = budget_from_rank(
        ranks, total_per_batch=_RB_TOTAL, min_budget=_RB_MIN, max_budget=_RB_MAX
    ).select(
        F.expr("'site' || CAST(host AS STRING) || '.example.com'").alias("host"),
        "host_budget",
    )
    urls = synth_urls(spark, sf_dir)
    frontier = urls.select(
        "url",
        "host",
        F.col("host").alias("seed_url"),  # constant within host: no order effect
        F.col("doc_id").alias("discovered_seq"),
        FL.priority_expr(F.col("url")).alias("priority"),
        "doc_id",
    )
    scheduled, _deferred = apply_host_budget(frontier, None, budgets)
    return (
        scheduled.join(F.broadcast(budgets), "host")
        .select("doc_id", "host", "url", "priority", "host_budget")
        .orderBy("host", F.col("priority").desc(), "doc_id")
    )


# ===========================================================================
