"""The engine's query catalog — every operator exposed as a named query
plus (where ANSI-SQL-expressible) an independently-written DuckDB oracle.

Registry contract (consumed by __spark_entry__.py / the driver):
  QUERIES[name] -> callable(spark, sf_dir) -> DataFrame
  ORACLES[name] -> SQL string over the driver's pre-registered views
                   (region nation customer supplier part orders lineitem
                    events documents embeddings), or absent for ops that
                   are not SQL-expressible (driver then does a weaker
                   rows-only check).

Parity rules that keep the cross-engine value-hash honest:
- every computed column is aliased identically on both sides;
- money/quantity sums are integer-scaled (cents) BIGINTs — float sums are
  accumulation-order-dependent and would hash-differ;
- ratio doubles come from identical integer inputs with identical
  expression shape, rounded to 6;
- keyword/classifier constants are shared (the oracle SQL is *generated*
  from the same Python tuples the Spark expressions use — same data,
  independently-written logic per engine);
- synthesized crawl inputs (urls, links, html) derive deterministically
  from documents.doc_id with engine-portable arithmetic, no randomness.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crawler_ai_spark import constants as K
from crawler_ai_spark.functions import filters as FL
from crawler_ai_spark.pipeline import corpus as CP
from crawler_ai_spark.pipeline import dedup as DD
from crawler_ai_spark.pipeline import similarity as SIM
from crawler_ai_spark.pipeline import textstats as TS

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# ---------------------------------------------------------------------------
# shared synthesized crawl inputs (documents → urls/links/html)
# ---------------------------------------------------------------------------

_PATH_CASES = [
    "'/careers'",
    "'/careers/senior-engineer-' || doc_id",
    "'/jobs/view/' || doc_id",
    "'/tuyen-dung'",
    "'/blog/post-' || doc_id",
    "'/products/item-' || doc_id",
    "'/about-us'",
    "'/login'",
    "'/job/' || doc_id || '?id=' || doc_id",
    "'/'",
    "'/news/2024/01/story-' || doc_id",
    "'/careers/apply/' || doc_id",
]

# identical CASE in DuckDB syntax (|| auto-casts ints) and Spark SQL
_PATH_CASE_SQL = (
    "CASE (doc_id % 12) "
    + " ".join(f"WHEN {i} THEN {expr}" for i, expr in enumerate(_PATH_CASES))
    + " END"
)
_PATH_CASE_SPARK = (
    "CASE CAST(doc_id % 12 AS INT) "
    + " ".join(
        f"WHEN {i} THEN {expr.replace('doc_id', 'CAST(doc_id AS STRING)')}"
        for i, expr in enumerate(_PATH_CASES)
    )
    + " END"
)

SYNTH_URLS_CTE = f"""
synth_urls AS (
  SELECT doc_id,
         'site' || (doc_id % 37) || '.example.com' AS host,
         {_PATH_CASE_SQL} AS path,
         'https://site' || (doc_id % 37) || '.example.com' || {_PATH_CASE_SQL} AS url
  FROM documents
)"""


def synth_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.expr("'site' || CAST(doc_id % 37 AS STRING) || '.example.com'").alias("host"),
        F.expr(_PATH_CASE_SPARK).alias("path"),
        F.expr(
            "'https://site' || CAST(doc_id % 37 AS STRING) || '.example.com' || "
            + _PATH_CASE_SPARK
        ).alias("url"),
    )


def _rx_quote(lit: str) -> str:
    """\\Q…\\E literal-quoting — valid in both Java regex and RE2."""
    return "\\Q" + lit.replace("\\E", "\\E\\\\E\\Q") + "\\E"


def _any_substr_rx(substrings) -> str:
    return "|".join(_rx_quote(s) for s in substrings)


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


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
# 2. relational core (TPC-H-shaped)
# ===========================================================================


@_register(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_price_c,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def q_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-agg with partial aggregation; money integer-
    scaled to cents so the cross-engine hash is exact."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("sum_qty_c"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("sum_price_c"),
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
            ).alias("sum_disc_price_c"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@_register(
    "top_revenue_orders",
    oracle="""
SELECT o.o_orderkey, c.c_mktsegment,
       CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderkey, c.c_mktsegment
ORDER BY revenue_c DESC, o_orderkey LIMIT 10
""",
)
def q_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + agg + deterministic top-k (TPC-H Q3 shape). The
    customer dim is broadcast; lineitem⋈orders shuffles on orderkey."""
    c = F.broadcast(_t(spark, sf_dir, "customer"))
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "c_mktsegment")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
            ).alias("revenue_c")
        )
        .orderBy(F.col("revenue_c").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@_register(
    "segment_order_stats",
    oracle="""
SELECT c.c_mktsegment,
       count(*) AS n_orders,
       count(DISTINCT o.o_custkey) AS n_customers,
       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
""",
)
def q_segment_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast dim join + multi-agg with exact distinct count."""
    c = F.broadcast(_t(spark, sf_dir, "customer"))
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("total_c"),
        )
        .orderBy("c_mktsegment")
    )


@_register(
    "nation_customer_rollup",
    oracle="""
SELECT r.r_name AS region, n.n_name AS nation, count(c.c_custkey) AS n_customers
FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
GROUP BY r.r_name, n.n_name ORDER BY region, nation
""",
)
def q_nation_customer_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dim-dim-fact join chain, broadcast all the way (J1/J2 shape)."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    return (
        F.broadcast(r)
        .join(n, n["n_regionkey"] == r["r_regionkey"])
        .join(c, c["c_nationkey"] == n["n_nationkey"], "left")
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.count("c_custkey").alias("n_customers"))
        .orderBy("region", "nation")
    )


@_register(
    "order_lines_topk",
    oracle="""
SELECT o_orderkey, l_linenumber, price_c, rk FROM (
  SELECT l_orderkey AS o_orderkey, l_linenumber,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY CAST(round(l_extendedprice * 100) AS BIGINT) DESC,
                                     l_linenumber) AS rk
  FROM lineitem
) WHERE rk <= 2 AND o_orderkey % 100 = 0
ORDER BY o_orderkey, rk
""",
)
def q_order_lines_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2/O5 shape — per-group top-k window (2 priciest lines per order;
    sampled 1-in-100 orders to keep the result compact)."""
    li = _t(spark, sf_dir, "lineitem")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    w = Window.partitionBy("l_orderkey").orderBy(
        price_c.desc(), F.col("l_linenumber")
    )
    return (
        li.withColumn("price_c", price_c)
        .withColumn("rk", F.row_number().over(w))
        .where((F.col("rk") <= 2) & (F.col("l_orderkey") % 100 == 0))
        .select(F.col("l_orderkey").alias("o_orderkey"), "l_linenumber", "price_c", "rk")
        .orderBy("o_orderkey", "rk")
    )


@_register(
    "customer_running_total",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_c
FROM orders WHERE o_custkey % 50 = 0
ORDER BY o_custkey, o_orderkey
""",
)
def q_customer_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative window (running revenue per customer, sampled)."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_custkey") % 50 == 0)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).over(w).alias("running_c"),
    ).orderBy("o_custkey", "o_orderkey")


# ===========================================================================
# 3. events (streaming-shaped, batch-checked)
# ===========================================================================


@_register(
    "events_hourly",
    oracle="""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_str,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS value_milli
FROM events GROUP BY 1, 2 ORDER BY hour_str, event_type
""",
)
def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h window aggregation (the batch twin of the Structured
    Streaming rollup in streaming/). The window key is a rendered STRING:
    formatting round-trips the stored wall-clock value identically in any
    session timezone, where epoch seconds would shift."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias(
                "hour_str"
            ),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 1000).cast("long")).alias("value_milli"),
        )
        .orderBy("hour_str", "event_type")
    )


@_register(
    "events_sessionize",
    oracle="""
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
              OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, event_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events,
       CAST(epoch_ms(max(ts)) - epoch_ms(min(ts)) AS BIGINT) AS duration_ms
FROM sess GROUP BY user_id, session_id
ORDER BY user_id, session_id
""",
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min gap) via lag + cumulative flag-sum — the
    batch form of streaming session windows."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wc = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    epoch = F.unix_millis(F.col("ts").cast("timestamp"))
    flagged = ev.withColumn(
        "new_session",
        F.when(
            (epoch - F.lag(epoch).over(w) > 1800000) | F.lag(epoch).over(w).isNull(), 1
        ).otherwise(0),
    )
    sess = flagged.withColumn("session_id", F.sum("new_session").over(wc))
    return (
        sess.groupBy("user_id", F.col("session_id").cast("long").alias("session_id"))
        .agg(
            F.count("*").alias("n_events"),
            (F.unix_millis(F.max("ts").cast("timestamp")) - F.unix_millis(F.min("ts").cast("timestamp")))
            .cast("long")
            .alias("duration_ms"),
        )
        .orderBy("user_id", "session_id")
    )


# ===========================================================================
# 4. corpus pipeline: documents
# ===========================================================================


@_register(
    "doc_exact_dups",
    oracle="""
WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 < 3
              THEN 'synthetic duplicate template #' || CAST(doc_id % 7 AS VARCHAR)
              ELSE text END AS text
  FROM documents
)
SELECT md5(text) AS text_hash, count(*) AS n_docs, min(doc_id) AS keep_id
FROM aug GROUP BY md5(text) HAVING count(*) > 1
ORDER BY text_hash
""",
)
def q_doc_exact_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups over deterministically-seeded duplicates: 30% of
    docs are rewritten onto one of 7 templates so the sf0.01 oracle compares
    NON-empty sets (natural dups first appear at sf0.1 — the round-1 gate
    was degenerate-green on an empty agreement)."""
    docs = _t(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 < 3,
            F.concat(
                F.lit("synthetic duplicate template #"),
                (F.col("doc_id") % 7).cast("string"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return DD.exact_dup_groups(aug).orderBy("text_hash")


_CHUNK_LEN = 400
_CHUNK_STRIDE = 350  # 50-char overlap between consecutive chunks


def _chunk_array(t):
    """Overlapping char windows as a pure-JVM array expression. Guard:
    Spark's sequence(0, -1) DESCENDS, so empty text must short-circuit."""
    n = F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.floor((F.length(t) - 1) / _CHUNK_STRIDE) + 1
    )
    idx = F.when(n >= 1, F.sequence(F.lit(0), (n - 1).cast("int"))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: t.substr(i * _CHUNK_STRIDE + 1, F.lit(_CHUNK_LEN)))


@_register(
    "doc_chunks",
    oracle=f"""
WITH t AS (SELECT doc_id, text, length(text) AS n FROM documents),
c AS (
  SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
         substr(text, CAST(i * {_CHUNK_STRIDE} + 1 AS BIGINT), {_CHUNK_LEN}) AS chunk_text
  FROM t, unnest(range(0,
    CAST(CASE WHEN n = 0 THEN 0 ELSE floor((n - 1) / {_CHUNK_STRIDE}) + 1 END AS BIGINT)
  )) AS u(i)
)
SELECT doc_id, chunk_id, chunk_text, length(chunk_text) AS n_chars
FROM c ORDER BY doc_id, chunk_id
""",
)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data chunking: fixed-size character windows with overlap
    ({chunk} chars, stride {stride}) — the step between curation and
    tokenization. Pure JVM (sequence + transform + posexplode), linear
    scan, no shuffle; char semantics match DuckDB's substr so the oracle
    is exact on unicode text. Token-aware chunking would swap the window
    arithmetic for the token counter in pipeline/textstats.py."""
    docs = _t(spark, sf_dir, "documents")
    chunks = _chunk_array(F.col("text"))
    return (
        docs.select("doc_id", F.posexplode(chunks).alias("chunk_id", "chunk_text"))
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            "chunk_text",
            F.length("chunk_text").cast("long").alias("n_chars"),
        )
        .orderBy("doc_id", "chunk_id")
    )


q_doc_chunks.__doc__ = q_doc_chunks.__doc__.format(
    chunk=_CHUNK_LEN, stride=_CHUNK_STRIDE
)


# ---------------------------------------------------------------------------
# corpus-level curation (pipeline/corpus.py): boilerplate line dedup,
# benchmark decontamination, repetition metrics, stratified sampling
# ---------------------------------------------------------------------------

# guarded normalized tokenizer: DuckDB's string_split('') returns ['']
# (1 phantom token / 1 phantom line) while the Spark operators guard
# empty/whitespace text to 0 tokens — the CASE keeps both engines at []
_TOKS_SPLIT = (
    "CASE WHEN length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) = 0"
    " THEN CAST([] AS VARCHAR[])"
    " ELSE string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') END"
)

# normalized-token CTE shared by the corpus oracles
_TOKS_CTE = f"""
toksed AS (
  SELECT doc_id,
         {_TOKS_SPLIT} AS toks
  FROM documents
)"""

# exactly LINE_TOKENS (8) tokens — prepended so seeded docs share their
# first synthesized line verbatim (mid-text insertion would shift window
# boundaries and break the cross-doc identity the dedup keys on)
_BOILER_LINE = "subscribe to our newsletter follow us on twitter"
if len(_BOILER_LINE.split()) != CP.LINE_TOKENS:  # survives python -O
    raise AssertionError("_BOILER_LINE must be exactly one LINE_TOKENS window")

_LINES_EXPR = (
    "list_transform(range(0, CAST(floor((len(toks)-1)/{n})+1 AS BIGINT)), "
    "i -> array_to_string(toks[CAST(i*{n}+1 AS BIGINT):CAST(i*{n}+{n} AS BIGINT)], ' '))"
).format(n=CP.LINE_TOKENS)


@_register(
    "doc_line_dedup",
    oracle=f"""
WITH base AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN '{_BOILER_LINE} ' || text ELSE text END AS text
  FROM documents
),
toksed AS (
  SELECT doc_id,
         {_TOKS_SPLIT} AS toks
  FROM base
),
w AS (SELECT doc_id, {_LINES_EXPR} AS lines FROM toksed),
ex AS (
  SELECT doc_id, CAST(i AS BIGINT) AS line_idx, lines[CAST(i + 1 AS BIGINT)] AS line
  FROM w, unnest(range(0, len(lines))) AS u(i)
),
boiler AS (SELECT line FROM ex GROUP BY line HAVING count(DISTINCT doc_id) >= 2),
kept AS (SELECT * FROM ex WHERE line NOT IN (SELECT line FROM boiler)),
reb AS (
  SELECT doc_id, string_agg(line, ' ' ORDER BY line_idx) AS clean_text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
),
tot AS (SELECT doc_id, count(*) AS n_lines FROM ex GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(reb.clean_text, '') AS clean_text,
       CAST(coalesce(tot.n_lines, 0) AS BIGINT) AS n_lines,
       CAST(coalesce(tot.n_lines, 0) - coalesce(reb.n_kept, 0) AS BIGINT) AS n_removed
FROM documents d LEFT JOIN tot ON d.doc_id = tot.doc_id
LEFT JOIN reb ON d.doc_id = reb.doc_id
ORDER BY d.doc_id
""",
)
def q_doc_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate line removal (RefinedWeb-style): drop
    every occurrence of any synthesized 8-token line appearing in >= 2
    distinct docs, reassemble survivors in order. Docs with doc_id%7==0
    get a shared boilerplate line PREPENDED so the gate compares
    non-empty removal sets at sf0.01 (the doc_exact_dups seeding
    pattern). Plan: df-count shuffle on short rows -> broadcast anti-join
    probe -> one per-doc regroup; see pipeline/corpus.py scale notes."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.lit(_BOILER_LINE + " "), F.col("text"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return CP.line_dedup(docs, min_df=2).orderBy("doc_id")


@_register(
    "doc_decontaminate",
    oracle=f"""
WITH {_TOKS_CTE},
bench AS (
  SELECT DISTINCT array_to_string(toks[3:10], ' ') AS gram
  FROM toksed WHERE doc_id % 29 = 0 AND len(toks) >= 10
),
g AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(toks) - {CP.DECONTAM_N} + 2),
           i -> array_to_string(
             toks[CAST(i AS BIGINT):CAST(i + {CP.DECONTAM_N} - 1 AS BIGINT)], ' '))) AS grams
  FROM toksed WHERE len(toks) >= {CP.DECONTAM_N}
  UNION ALL
  SELECT doc_id, [array_to_string(toks, ' ')] AS grams
  FROM toksed WHERE len(toks) < {CP.DECONTAM_N} AND len(toks) > 0
),
ex AS (SELECT doc_id, unnest(grams) AS gram FROM g),
hits AS (
  SELECT ex.doc_id, count(*) AS n_hits FROM ex JOIN bench ON ex.gram = bench.gram
  GROUP BY ex.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       coalesce(h.n_hits, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
ORDER BY d.doc_id
""",
)
def q_doc_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag docs sharing any 8-token gram with
    the synthesized benchmark set (tokens 3..10 of every doc_id%29==0
    doc — the contributing docs self-hit, so the gate is non-degenerate
    by construction, and cross-doc hits exercise the join). Benchmark is
    broadcast; the only shuffle is the short-row per-doc hit count."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(TS.norm_text(F.col("text")), " ")
    bench = docs.filter((F.col("doc_id") % 29 == 0) & (F.size(toks) >= 10)).select(
        F.array_join(F.slice(toks, 3, 8), " ").alias("gram")
    )
    return CP.decontaminate(docs, bench, n=CP.DECONTAM_N).orderBy("doc_id")


@_register(
    "doc_repetition",
    oracle=f"""
WITH toks0 AS (
  SELECT doc_id,
         {_TOKS_SPLIT} AS toks
  FROM documents
),
base AS (
  SELECT doc_id,
         CASE WHEN doc_id % 13 = 0
              THEN trim(repeat(array_to_string(toks[1:8], ' ') || ' ', 6))
              ELSE array_to_string(toks, ' ') END AS text
  FROM toks0
),
toksed AS (
  SELECT doc_id,
         {_TOKS_SPLIT} AS toks
  FROM base
),
w AS (
  SELECT doc_id,
         {_LINES_EXPR} AS lines,
         CASE WHEN len(toks) >= 2
              THEN list_transform(range(1, len(toks)),
                   i -> toks[i] || ' ' || toks[i+1])
              ELSE CAST([] AS VARCHAR[]) END AS bigrams
  FROM toksed
),
m AS (
  SELECT doc_id,
         len(lines) AS n_lines, len(bigrams) AS n_bg,
         CASE WHEN len(lines) > 0
              THEN round(1.0 - len(list_distinct(lines)) / greatest(len(lines), 1), 6)
              ELSE 0.0 END AS dup_line_ratio,
         CASE WHEN len(bigrams) > 0
              THEN round(1.0 - len(list_distinct(bigrams)) / greatest(len(bigrams), 1), 6)
              ELSE 0.0 END AS dup_bigram_ratio,
         CASE WHEN len(bigrams) > 0
              THEN round(list_max(list_transform(list_distinct(bigrams),
                   b -> len(list_filter(bigrams, x -> x = b))))
                   / greatest(len(bigrams), 1), 6)
              ELSE 0.0 END AS top_bigram_ratio
  FROM w
)
SELECT doc_id,
       CAST(n_lines AS BIGINT) AS n_lines,
       CAST(n_bg AS BIGINT) AS n_bigrams,
       dup_line_ratio, dup_bigram_ratio, top_bigram_ratio,
       (dup_line_ratio > 0.30 OR top_bigram_ratio > 0.18) AS repetitive
FROM m ORDER BY doc_id
""",
)
def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-doc repetition metrics: duplicate-line and
    duplicate-bigram fractions, top-bigram share, and the repetitive
    gate. Docs with doc_id%13==0 are rewritten to an 8-token phrase
    repeated 6x so the gate boolean actually fires at sf0.01 (the
    seeding pattern of doc_exact_dups / doc_line_dedup). Line metrics
    map-side; bigram top/distinct via explode + pre-combined short-row
    count shuffle keyed on doc_id (see pipeline/corpus.py on why this
    beats the per-row HOF alternatives ~50x)."""
    toks0 = F.split(TS.norm_text(F.col("text")), " ")
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 13 == 0,
            F.trim(
                F.repeat(F.concat(F.array_join(F.slice(toks0, 1, 8), " "), F.lit(" ")), 6)
            ),
        )
        .otherwise(F.array_join(toks0, " "))
        .alias("text"),
    )
    return CP.repetition_metrics(docs).orderBy("doc_id")


@_register(
    "doc_sample_stratified",
    oracle=f"""
WITH {_TOKS_CTE},
s AS (
  SELECT doc_id, len(toks) AS n_tokens,
         CASE WHEN len(toks) >= {CP.SAMPLE_BUCKETS[0][1]} THEN 'long'
              WHEN len(toks) >= {CP.SAMPLE_BUCKETS[1][1]} THEN 'mid'
              ELSE 'short' END AS bucket,
         substr(md5(doc_id || ':{CP.SAMPLE_SALT}'), 1, 4) AS sample_key
  FROM toksed
)
SELECT doc_id, bucket, sample_key, CAST(n_tokens AS BIGINT) AS n_tokens
FROM s
WHERE bucket = 'long'
   OR (bucket = 'mid' AND sample_key < '{CP.SAMPLE_BUCKETS[1][2]}')
   OR (bucket = 'short' AND sample_key < '{CP.SAMPLE_BUCKETS[2][2]}')
ORDER BY doc_id
""",
)
def q_doc_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified downsampling by size band (long 1.0 /
    mid 0.5 / short 0.125) keyed on a content-independent md5 — the
    reproducible data-mixing move before tokenization. Map-only, RNG-free;
    identical keyspace arithmetic on both engines (exact binary-fraction
    thresholds over lowercase hex)."""
    docs = _t(spark, sf_dir, "documents")
    return CP.stratified_sample(docs).orderBy("doc_id")


@_register(
    "corpus_mix",
    oracle=f"""
WITH {_TOKS_CTE},
s AS (
  SELECT d.doc_id, d.lang, len(t.toks) AS n_tokens,
         CASE WHEN len(t.toks) >= {CP.SAMPLE_BUCKETS[0][1]} THEN 'long'
              WHEN len(t.toks) >= {CP.SAMPLE_BUCKETS[1][1]} THEN 'mid'
              ELSE 'short' END AS bucket
  FROM documents d JOIN toksed t ON d.doc_id = t.doc_id
)
SELECT lang, bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS tokens_total,
       round(sum(n_tokens) / sum(sum(n_tokens)) OVER (), 6) AS token_share
FROM s GROUP BY lang, bucket
ORDER BY lang, bucket
""",
)
def q_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing report: doc and token counts per (lang, size-band)
    with share-of-corpus — what a recipe pipeline reads before choosing
    per-stratum sampling rates (doc_sample_stratified consumes the same
    banding). One partial-agg shuffle on a tiny key space plus a
    single-row total broadcast."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(TS.norm_text(F.col("text")), " ")
    n_tok = F.size(toks)
    bucket = (
        F.when(n_tok >= CP.SAMPLE_BUCKETS[0][1], F.lit("long"))
        .when(n_tok >= CP.SAMPLE_BUCKETS[1][1], F.lit("mid"))
        .otherwise(F.lit("short"))
    )
    per = docs.select(F.col("lang"), bucket.alias("bucket"), n_tok.alias("n_tokens"))
    agg = per.groupBy("lang", "bucket").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("tokens_total"),
    )
    total = Window.partitionBy()
    return agg.select(
        "lang",
        "bucket",
        "n_docs",
        "tokens_total",
        F.round(F.col("tokens_total") / F.sum("tokens_total").over(total), 6).alias(
            "token_share"
        ),
    ).orderBy("lang", "bucket")


@_register(
    "doc_stats",
    oracle="""
WITH t AS (
  SELECT doc_id, text, trim(regexp_replace(text, '\\s+', ' ', 'g')) AS tx FROM documents
)
SELECT doc_id,
       length(tx) AS n_chars,
       CASE WHEN length(tx) = 0 THEN 0 ELSE len(string_split(tx, ' ')) END AS n_tokens,
       round(length(tx) / greatest(CASE WHEN length(tx) = 0 THEN 0
             ELSE len(string_split(tx, ' ')) END, 1), 6) AS mean_token_len,
       round(1.0 - len(list_distinct(string_split(lower(tx), ' '))) /
             greatest(CASE WHEN length(tx) = 0 THEN 0
             ELSE len(string_split(tx, ' ')) END, 1), 6) AS repetition_ratio,
       md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
FROM t ORDER BY doc_id
""",
)
def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token/char stats + repetition + content fingerprint, one pass."""
    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    q = TS.quality_columns(t)
    return docs.select(
        "doc_id",
        q["n_chars"].alias("n_chars"),
        q["n_tokens"].alias("n_tokens"),
        q["mean_token_len"].alias("mean_token_len"),
        q["repetition_ratio"].alias("repetition_ratio"),
        TS.fingerprint(t).alias("fingerprint"),
    ).orderBy("doc_id")


def _lang_oracle(src: str = "documents") -> str:
    # argmax with lexicographic tie-break, as a greatest-of-structs trick
    score_exprs = []
    for lang in sorted(TS.LANG_MARKERS):
        markers = ", ".join(_sql_quote(m) for m in TS.LANG_MARKERS[lang])
        score_exprs.append(
            f"len(list_filter(toks, t -> list_contains([{markers}], t))) AS s_{lang}"
        )
    langs = sorted(TS.LANG_MARKERS)
    # fold left: keep first max
    best = f"'{langs[0]}'"
    best_s = f"s_{langs[0]}"
    for lang in langs[1:]:
        best = f"CASE WHEN s_{lang} > {best_s} THEN '{lang}' ELSE {best} END"
        best_s = f"CASE WHEN s_{lang} > {best_s} THEN s_{lang} ELSE {best_s} END"
    return f"""
WITH toksed AS (
  SELECT doc_id,
         string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
  FROM {src}
),
scored AS (
  SELECT doc_id, {', '.join(score_exprs)} FROM toksed
)
SELECT doc_id,
       CASE WHEN {best_s} > 0 THEN {best} ELSE 'und' END AS lang_pred
FROM scored ORDER BY doc_id
"""


@_register("doc_lang_id", oracle=_lang_oracle())
def q_doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", TS.lang_id(F.col("text")).alias("lang_pred")).orderBy(
        "doc_id"
    )


def _jaccard_oracle(threshold: float = 0.5) -> str:
    return f"""
WITH toksed AS (
  SELECT doc_id,
         string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3
              THEN list_distinct(list_transform(range(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
              ELSE [array_to_string(toks, ' ')] END AS shingles
  FROM toksed
),
ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
sizes AS (SELECT doc_id, count(*) AS set_size FROM ex GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_common
  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.a_id, i.b_id,
       round(CAST(i.n_common AS DOUBLE) /
             (sa.set_size + sb.set_size - i.n_common), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.a_id
JOIN sizes sb ON sb.doc_id = i.b_id
WHERE CAST(i.n_common AS DOUBLE) / (sa.set_size + sb.set_size - i.n_common)
      >= {threshold}
ORDER BY a_id, b_id
"""


@_register("doc_jaccard_pairs", oracle=_jaccard_oracle(0.5))
def q_doc_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram-shingle Jaccard near-dup pairs (threshold 0.5)."""
    docs = _t(spark, sf_dir, "documents")
    return DD.jaccard_pairs(docs, threshold=0.5).orderBy("a_id", "b_id")


@_register("doc_minhash_dups", oracle=_jaccard_oracle(0.5))
def q_doc_minhash_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH (64 hashes, 32×2 bands) + exact verify — must equal the
    brute-force Jaccard oracle up to ~1e-6 band-miss recall."""
    docs = _t(spark, sf_dir, "documents")
    return DD.minhash_lsh_pairs(docs, threshold=0.5).orderBy("a_id", "b_id")


@_register("doc_simhash_pairs")  # no SQL oracle: signature needs blake2b
def q_doc_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidates (hamming ≤ 3, pigeonhole-banded).
    Rows-only driver check; pytest cross-checks against jaccard pairs."""
    docs = _t(spark, sf_dir, "documents")
    return DD.simhash_pairs(docs, max_hamming=3).orderBy("a_id", "b_id")


@_register(
    "ngram_top_df",
    oracle="""
WITH toksed AS (
  SELECT doc_id,
         string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3
              THEN list_distinct(list_transform(range(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
              ELSE [array_to_string(toks, ' ')] END AS shingles
  FROM toksed
),
ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh)
SELECT shingle, count(*) AS df
FROM ex GROUP BY shingle
ORDER BY df DESC, shingle LIMIT 20
""",
)
def q_ngram_top_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 shape — top-k n-grams by document frequency (dedup blocking-key
    hot-list; also the max_df skew-guard diagnostic)."""
    docs = _t(spark, sf_dir, "documents")
    sh = DD.with_shingles(docs.select("doc_id", "text"))
    return (
        sh.select("doc_id", F.explode("shingles").alias("shingle"))
        .groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .orderBy(F.col("df").desc(), "shingle")
        .limit(20)
    )


# ===========================================================================
# 5. embeddings
# ===========================================================================

_COS_SQL = """
round(
  list_sum(list_transform(range(1, len(a.embedding) + 1),
    i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
  / (sqrt(list_sum(list_transform(range(1, len(a.embedding) + 1),
       i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
   * sqrt(list_sum(list_transform(range(1, len(b.embedding) + 1),
       i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))))
, 6)"""


@_register(
    "emb_topk",
    oracle=f"""
WITH scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {_COS_SQL} AS cosine
  FROM embeddings a, embeddings b
  WHERE a.vec_id < 10
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id, cosine FROM ranked
WHERE rank <= 10 ORDER BY query_id, rank
""",
)
def q_emb_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for the first 10 vectors as queries —
    the exact ANN baseline (broadcast queries, one corpus scan)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return SIM.cosine_topk(queries, emb, k=10, q_id="query_id").orderBy(
        "query_id", "rank"
    )


@_register(
    "emb_dup_pairs",
    oracle=f"""
SELECT a.vec_id AS a_id, b.vec_id AS b_id, {_COS_SQL} AS cosine
FROM embeddings a, embeddings b
WHERE a.vec_id < b.vec_id AND {_COS_SQL} >= 0.45
ORDER BY a_id, b_id
""",
)
def q_emb_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs, cosine ≥ 0.45, brute-force verifier\n    (threshold sits inside this corpus's similarity range so the check is\n    non-trivial; production near-dup dedup would use ~0.95)."""
    emb = _t(spark, sf_dir, "embeddings")
    return DD.embedding_dup_pairs(emb, threshold=0.45).orderBy("a_id", "b_id")


@_register("emb_ann_topk")  # no oracle: LSH recall < 1 by design
def q_emb_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH approximate top-10 — the REGISTERED ANN path (the
    100 TB plan: bucket join on a uniform (table_id, bucket) key + exact
    cosine inside buckets; the corpus never crossJoins). ``emb_topk`` stays
    as the brute-force recall oracle; pytest asserts recall >= 0.9 vs it.
    Rows-only in the driver gate by design (recall < 1)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return SIM.hyperplane_topk(
        queries, emb, k=10, dim=64, n_tables=8, bits=6, q_id="query_id"
    ).orderBy("query_id", "rank")


@_register("emb_ivf_topk")  # no oracle: IVF recall < 1 by design
def q_emb_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-10 — the second ANN scale path next to
    ``emb_ann_topk``: a spherical-k-means coarse quantizer (trained on a
    deterministic driver-side sample) assigns the corpus to cells in one
    Arrow matmul pass; each query probes its 6 nearest of 16 cells, so a
    query batch touches ~6/16 of the corpus instead of all of it, with
    the exploded query side broadcast (no corpus shuffle). Rows-only in
    the driver gate by design (recall < 1); pytest measures recall vs
    ``emb_topk``."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return SIM.ivf_topk(
        queries, emb, k=10, n_centroids=16, n_probe=6
    ).orderBy("query_id", "rank")


@_register("emb_lsh_pairs")  # no oracle: LSH recall < 1 by design
def q_emb_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH bucketed near-dup pairs (the 10^10-scale path for
    emb_dup_pairs). Rows-only check; pytest measures recall vs brute."""
    emb = _t(spark, sf_dir, "embeddings")
    return SIM.hyperplane_lsh_pairs(emb, threshold=0.45, dim=64, bits=6).orderBy("a_id", "b_id")


# the recall gate's brute ground truth runs on a DETERMINISTIC md5-keyed
# corpus sample (keep 4 of 5 key residues) — at 10^10 vectors the gate
# cannot scan the full corpus, and recall measured on a uniform sample is
# an unbiased estimate of corpus recall. Both engines derive the sample
# from the same md5 prefix so the subsets are identical.
_ANN_SAMPLE_MOD = 5
_ANN_SAMPLE_KEEP = 4


def _ann_recall_oracle() -> str:
    # DuckDB independently re-derives the BRUTE side (cross join against
    # the SAME md5-sampled corpus) for the row counts; the recall >= 0.9
    # assertion itself runs inside the Spark plan, so recall_ok=TRUE only
    # hash-matches when both ANN paths actually clear the bar.
    return f"""
WITH corpus AS (
  SELECT * FROM embeddings
  WHERE CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT)
        % {_ANN_SAMPLE_MOD} < {_ANN_SAMPLE_KEEP}
),
scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {_COS_SQL} AS cosine
  FROM embeddings a, corpus b
  WHERE a.vec_id < 10
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
),
brute AS (SELECT query_id, neighbor_id FROM ranked WHERE rank <= 10)
SELECT p.path,
       CAST((SELECT count(DISTINCT query_id) FROM brute) AS BIGINT) AS n_queries,
       CAST((SELECT count(*) FROM brute) AS BIGINT) AS n_brute,
       TRUE AS recall_ok
FROM (SELECT 'ivf' AS path UNION ALL SELECT 'lsh' AS path) p
ORDER BY path
"""


@_register("emb_ann_recall", oracle=_ann_recall_oracle())
def q_emb_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible ANN quality gate: recall@10 of BOTH registered
    approximate paths (hyperplane-LSH `emb_ann_topk`, IVF `emb_ivf_topk`)
    measured against the brute-force cosine top-10 IN-PLAN — one row per
    path with the brute row counts (DuckDB re-derives those from its own
    cross join) and recall_ok = recall >= 0.9. Turns the pytest-only
    recall checks into a green CORRECTNESS row: if either ANN path
    degrades below 0.9, recall_ok flips and the value hash diverges.

    The brute side runs against a BOUNDED deterministic corpus sample
    (md5(vec_id) residue gate, keep _ANN_SAMPLE_KEEP of _ANN_SAMPLE_MOD)
    so the gate itself survives 10^10 vectors: recall over a uniform
    sample is an unbiased corpus-recall estimate, and both ANN paths are
    measured on the same sampled corpus so the comparison stays exact."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.where(
        F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % _ANN_SAMPLE_MOD
        < _ANN_SAMPLE_KEEP
    )
    brute = SIM.cosine_topk(queries, corpus, k=10, q_id="query_id").select(
        "query_id", "neighbor_id"
    )
    # parameters sized for THIS corpus (500 x 64-dim, 10 clusters): 4-bit
    # tables keep ~31 rows/bucket so 24 tables reach deterministic 0.98
    # recall; IVF probes 12/16 cells for 0.95. At web scale both widen
    # (more bits / more centroids) with recall re-measured by this same
    # query — that is the point of making the gate a catalog row.
    paths = {
        "lsh": SIM.hyperplane_topk(
            queries, corpus, k=10, dim=64, n_tables=24, bits=4, q_id="query_id"
        ),
        "ivf": SIM.ivf_topk(queries, corpus, k=10, n_centroids=16, n_probe=12),
    }
    ann = None
    for name, df in paths.items():
        tagged = df.select(
            F.lit(name).alias("path"), "query_id", "neighbor_id", F.lit(1).alias("hit")
        )
        ann = tagged if ann is None else ann.unionByName(tagged)
    per_path = (
        brute.crossJoin(spark.createDataFrame([("ivf",), ("lsh",)], ["path"]))
        .join(ann, ["path", "query_id", "neighbor_id"], "left")
        .groupBy("path")
        .agg(
            F.countDistinct("query_id").cast("long").alias("n_queries"),
            F.count("*").cast("long").alias("n_brute"),
            (
                F.sum(F.coalesce(F.col("hit"), F.lit(0)))
                >= F.lit(0.9) * F.count("*")
            ).alias("recall_ok"),
        )
    )
    return per_path.select("path", "n_queries", "n_brute", "recall_ok").orderBy("path")


@_register(
    "emb_label_counts",
    oracle="""
SELECT label, count(*) AS n_vecs,
       count(DISTINCT vec_id) AS n_distinct
FROM embeddings GROUP BY label ORDER BY label
""",
)
def q_emb_label_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return (
        emb.groupBy("label")
        .agg(F.count("*").alias("n_vecs"), F.countDistinct("vec_id").alias("n_distinct"))
        .orderBy("label")
    )


# ===========================================================================
# 6. second-wave coverage (added after the first green sweep)
# ===========================================================================


@_register(
    "part_supplier_stats",
    oracle="""
SELECT p.p_brand,
       count(DISTINCT l.l_suppkey) AS n_suppliers,
       count(*) AS n_lines,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_c
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
GROUP BY p.p_brand ORDER BY p.p_brand
""",
)
def q_part_supplier_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dim join with exact distinct-count per brand (J2/A6 shape)."""
    li = _t(spark, sf_dir, "lineitem")
    p = F.broadcast(_t(spark, sf_dir, "part"))
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.count("*").alias("n_lines"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("revenue_c"),
        )
        .orderBy("p_brand")
    )


@_register(
    "order_priority_histogram",
    oracle="""
SELECT o_orderpriority, o_orderstatus, count(*) AS n
FROM orders GROUP BY o_orderpriority, o_orderstatus
ORDER BY o_orderpriority, o_orderstatus
""",
)
def q_order_priority_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 histogram shape (reference: per-type count folds)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority", "o_orderstatus")
        .agg(F.count("*").alias("n"))
        .orderBy("o_orderpriority", "o_orderstatus")
    )


@_register(
    "events_type_share",
    oracle="""
SELECT event_type, count(*) AS n,
       round(count(*) * 1.0 / sum(count(*)) OVER (), 6) AS share
FROM events GROUP BY event_type ORDER BY event_type
""",
)
def q_events_type_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 summary-share shape: per-type fraction of total via window-over-
    aggregate (integer inputs → identical doubles both engines)."""
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    w = Window.partitionBy()
    return (
        counts.withColumn("share", F.round(F.col("n") * 1.0 / F.sum("n").over(w), 6))
        .orderBy("event_type")
    )


@_register(
    "pagination_urls",
    oracle=f"""
WITH {SYNTH_URLS_CTE},
career AS (
  SELECT doc_id, url FROM synth_urls WHERE (doc_id % 12) = 0
)
SELECT doc_id, url || '?page=' || n AS page_url
FROM career, unnest(generate_series(2, 10)) AS t(n)
ORDER BY doc_id, page_url
""",
)
def q_pagination_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 — pagination candidate generator: career roots × pages 2-10
    (job_extraction_service.py:267-321) as explode(sequence())."""
    urls = synth_urls(spark, sf_dir).where(F.col("doc_id") % 12 == 0)
    return (
        urls.withColumn("n", F.explode(F.sequence(F.lit(2), F.lit(10))))
        .select(
            "doc_id",
            F.concat(F.col("url"), F.lit("?page="), F.col("n").cast("string")).alias(
                "page_url"
            ),
        )
        .orderBy("doc_id", "page_url")
    )


def _doc_quality_oracle(src: str = "documents") -> str:
    stop = ", ".join(_sql_quote(s) for s in TS.STOPWORDS_EN)
    return f"""
WITH t AS (
  SELECT doc_id, trim(regexp_replace(text, '\\s+', ' ', 'g')) AS tx FROM {src}
),
feat AS (
  SELECT doc_id,
         length(tx) AS n_chars,
         CASE WHEN length(tx) = 0 THEN 0 ELSE len(string_split(tx, ' ')) END AS n_tokens,
         len(list_filter(string_split(lower(tx), ' '),
             x -> list_contains([{stop}], x))) AS n_stop,
         len(regexp_extract_all(tx, '[^\\w\\s]')) AS n_punct,
         len(regexp_extract_all(tx, '\\d')) AS n_digit,
         len(list_distinct(string_split(lower(tx), ' '))) AS n_distinct
  FROM t
)
SELECT doc_id,
  round(n_stop / greatest(n_tokens, 1), 6) AS stopword_ratio,
  round(n_punct / greatest(n_chars, 1), 6) AS punct_ratio,
  round(n_digit / greatest(n_chars, 1), 6) AS digit_ratio,
  round(greatest(
    (CASE WHEN n_tokens < 5 THEN 0.0 WHEN n_tokens > 5000 THEN 0.2 ELSE 0.4 END)
    + least(round(n_stop / greatest(n_tokens, 1), 6) * 2, 0.3) + 0.3
    - greatest(round(1.0 - n_distinct / greatest(n_tokens, 1), 6) - 0.5, 0.0) * 0.6,
    0.0), 6) AS quality
FROM feat ORDER BY doc_id
"""


@_register("doc_quality", oracle=_doc_quality_oracle())
def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite curation quality score + its feature ratios."""
    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    q = TS.quality_columns(t)
    return docs.select(
        "doc_id",
        q["stopword_ratio"].alias("stopword_ratio"),
        q["punct_ratio"].alias("punct_ratio"),
        q["digit_ratio"].alias("digit_ratio"),
        TS.quality_score(t).alias("quality"),
    ).orderBy("doc_id")


# seeding CTE shared by the source-curation oracles: every 3rd source is
# degraded deterministically so all three tiers exist at the sf0.01 gate
# (natural data is uniformly high-quality / dup-free there)
_SRC_AUG_CTE = """
aug AS (
  SELECT doc_id, source,
         CASE WHEN (CAST(substr(source, 4) AS INT) % 3) = 1
                   AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'
              THEN 'shared corporate boilerplate announcement for ' || source
              WHEN (CAST(substr(source, 4) AS INT) % 3) = 2
              THEN 'zz qq ' || doc_id
              ELSE text END AS text
  FROM documents
)"""

_SRC_ROLLUP_SQL = f"""
qual AS (SELECT * FROM ({{qual_oracle}}) t),
j AS (
  SELECT a.source, q.quality,
         md5(lower(trim(regexp_replace(a.text, '\\s+', ' ', 'g')))) AS fp,
         CASE WHEN length(trim(regexp_replace(a.text, '\\s+', ' ', 'g'))) = 0 THEN 0
              ELSE len(string_split(trim(regexp_replace(a.text, '\\s+', ' ', 'g')), ' '))
         END AS n_tokens
  FROM aug a JOIN qual q USING (doc_id)
),
agg AS (
  SELECT source, count(*) AS n_docs, sum(n_tokens) AS tokens_total,
         round(avg(quality), 4) AS mean_quality,
         count(*) - count(DISTINCT fp) AS n_dup
  FROM j GROUP BY source
),
rolled AS (
  SELECT source,
         CAST(n_docs AS BIGINT) AS n_docs,
         CAST(tokens_total AS BIGINT) AS tokens_total,
         mean_quality,
         round(n_dup / greatest(n_docs, 1), 6) AS dup_rate,
         CASE WHEN mean_quality >= 0.55
                   AND round(n_dup / greatest(n_docs, 1), 6) <= 0.20 THEN 'full'
              WHEN mean_quality >= 0.40
                   AND round(n_dup / greatest(n_docs, 1), 6) <= 0.50 THEN 'half'
              ELSE 'eighth' END AS tier
  FROM agg
)"""


def _src_aug(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of _SRC_AUG_CTE."""
    docs = _t(spark, sf_dir, "documents")
    srcnum = F.substring("source", 4, 10).cast("int")
    return docs.select(
        "doc_id",
        "source",
        F.when(
            (srcnum % 3 == 1)
            & (F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < "8"),
            F.concat(
                F.lit("shared corporate boilerplate announcement for "),
                F.col("source"),
            ),
        )
        .when(
            srcnum % 3 == 2,
            F.concat(F.lit("zz qq "), F.col("doc_id").cast("string")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )


@_register(
    "source_quality_rollup",
    oracle=f"""
WITH {_SRC_AUG_CTE},
{_SRC_ROLLUP_SQL.format(qual_oracle=_doc_quality_oracle("aug"))}
SELECT * FROM rolled ORDER BY source
""",
)
def q_source_quality_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level curation rollup (FineWeb/CCNet-style: judge the
    SOURCE): per-source doc/token counts, mean quality, within-source
    exact-dup rate, and the derived sampling tier. Every 3rd source is
    seeded degenerate (dup templates / short garbage) so all three tiers
    are exercised at the sf0.01 gate. One partial-agg shuffle on the
    source key; see pipeline/corpus.py for the skew notes."""
    return CP.source_rollup(_src_aug(spark, sf_dir)).orderBy("source")


@_register(
    "doc_source_filter",
    oracle=f"""
WITH {_SRC_AUG_CTE},
{_SRC_ROLLUP_SQL.format(qual_oracle=_doc_quality_oracle("aug"))},
k AS (
  SELECT doc_id, source,
         substr(md5(doc_id || ':{CP.SAMPLE_SALT}'), 1, 4) AS sample_key
  FROM documents
)
SELECT k.doc_id, k.source, r.tier, k.sample_key
FROM k JOIN rolled r USING (source)
WHERE r.tier = 'full'
   OR (r.tier = 'half' AND k.sample_key < '8000')
   OR (r.tier = 'eighth' AND k.sample_key < '2000')
ORDER BY k.doc_id
""",
)
def q_doc_source_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the per-source tier back to documents: deterministic md5-key
    downsampling at the source's rate (full 1.0 / half 0.5 / eighth
    0.125). The rollup broadcasts (one row per source), so the apply pass
    shuffles nothing of the corpus."""
    aug = _src_aug(spark, sf_dir)
    rollup = CP.source_rollup(aug)
    return CP.source_filter(aug, rollup).orderBy("doc_id")


@_register(
    "corpus_pack_sequences",
    oracle=f"""
WITH t AS (
  SELECT source, doc_id,
         CAST(CASE WHEN length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) = 0 THEN 0
              ELSE len(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' '))
         END + 1 AS BIGINT) AS doc_len
  FROM documents
),
o AS (
  SELECT source, doc_id, doc_len,
         coalesce(sum(doc_len) OVER (PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS global_offset
  FROM t
),
e AS (
  SELECT source, doc_id, doc_len, global_offset, CAST(w AS BIGINT) AS window_id
  FROM o, unnest(generate_series(
      CAST(floor(global_offset / {CP.PACK_WINDOW}) AS BIGINT),
      CAST(floor((global_offset + doc_len - 1) / {CP.PACK_WINDOW}) AS BIGINT))) AS u(w)
)
SELECT source, window_id, doc_id,
       CAST(greatest(0, window_id * {CP.PACK_WINDOW} - global_offset) AS BIGINT) AS doc_from,
       CAST(least(doc_len, (window_id + 1) * {CP.PACK_WINDOW} - global_offset) AS BIGINT) AS doc_to,
       CAST(global_offset AS BIGINT) AS global_offset
FROM e ORDER BY source, window_id, doc_id
""",
)
def q_corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing manifest: concat-and-chunk each source shard's
    token stream (one EOD separator per doc) into fixed 128-token
    training windows; one row per (doc x window overlapped) with the
    doc's token subrange. Runs the hot-shard pre-split path (contiguous
    100-doc sub-shards per source, offsets stitched by a tiny window
    over sub-shard totals — see pipeline/corpus.py _pack_spans) so the
    skew-safe arithmetic is what the oracle's single-window re-derivation
    gates: identical offsets, bounded per-task stream length."""
    docs = _t(spark, sf_dir, "documents")
    return CP.pack_sequences(docs, sub_shard_docs=100).orderBy(
        "source", "window_id", "doc_id"
    )


@_register(
    "corpus_pack_windows",
    oracle=f"""
WITH t AS (
  SELECT source, doc_id,
         CASE WHEN length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) = 0
              THEN ['{CP.EOD_TOKEN}']
              ELSE string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')
                   || ['{CP.EOD_TOKEN}']
         END AS stream
  FROM documents
),
o AS (
  SELECT source, doc_id, stream, CAST(len(stream) AS BIGINT) AS doc_len,
         coalesce(sum(CAST(len(stream) AS BIGINT)) OVER (PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS global_offset
  FROM t
),
e AS (
  SELECT source, doc_id, stream, CAST(w AS BIGINT) AS window_id,
         greatest(0, CAST(w AS BIGINT) * {CP.PACK_WINDOW} - global_offset) AS a,
         least(doc_len, (CAST(w AS BIGINT) + 1) * {CP.PACK_WINDOW} - global_offset) AS b
  FROM o, unnest(generate_series(
      CAST(floor(global_offset / {CP.PACK_WINDOW}) AS BIGINT),
      CAST(floor((global_offset + doc_len - 1) / {CP.PACK_WINDOW}) AS BIGINT))) AS u(w)
)
SELECT source, window_id,
       string_agg(array_to_string(list_slice(stream, a + 1, b), ' '), ' ' ORDER BY doc_id) AS window_text,
       CAST(sum(b - a) AS BIGINT) AS n_tokens
FROM e GROUP BY source, window_id ORDER BY source, window_id
""",
)
def q_corpus_pack_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized packed training windows: the actual fixed-width token
    examples the pack_sequences manifest describes — per (source shard,
    window) the concatenated token text and count. Two corpus-sized
    exchanges total (offset window + partial-aggregatable regroup); runs
    the hot-shard pre-split path like corpus_pack_sequences."""
    docs = _t(spark, sf_dir, "documents")
    return CP.pack_windows(docs, sub_shard_docs=100).orderBy("source", "window_id")


@_register(
    "corpus_shuffle_shards",
    oracle=f"""
WITH k AS (
  SELECT doc_id,
         md5(concat(CAST(doc_id AS VARCHAR), ':{CP.SHUFFLE_SALT}')) AS shuffle_key
  FROM documents
),
s AS (
  SELECT doc_id, shuffle_key,
         CAST(concat('0x', substr(shuffle_key, 1, 4)) AS BIGINT) % {CP.SHUFFLE_SHARDS} AS shard_id
  FROM k
)
SELECT shard_id,
       CAST(row_number() OVER (PARTITION BY shard_id ORDER BY shuffle_key, doc_id) AS BIGINT) AS position,
       doc_id, shuffle_key
FROM s ORDER BY shard_id, position
""",
)
def q_corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global corpus shuffle: content-independent md5 keys
    assign each doc an output shard (first 4 hex digits mod n) and a
    within-shard order (full key) — the RNG-free decorrelation pass
    before training. One uniform shuffle on shard_id; see
    pipeline/corpus.py shuffle_shards for the writer form at scale."""
    docs = _t(spark, sf_dir, "documents")
    return CP.shuffle_shards(docs).orderBy("shard_id", "position")


@_register(
    "corpus_incremental_ingest",
    oracle="""
WITH odd AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1),
src AS (SELECT doc_id AS src_id, text AS src_text FROM documents),
inc AS (
  SELECT o.doc_id, coalesce(s.src_text, o.text) AS text
  FROM odd o LEFT JOIN src s
    ON s.src_id = CASE WHEN o.doc_id % 9 = 1 THEN o.doc_id - 1
                       WHEN o.doc_id % 42 = 3 THEN o.doc_id - 2 END
),
ex AS (
  SELECT DISTINCT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
  FROM documents WHERE doc_id % 2 = 0
),
f AS (
  SELECT doc_id,
         md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
  FROM inc
),
w AS (
  SELECT doc_id, fingerprint,
         row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn,
         fingerprint IN (SELECT fp FROM ex) AS known
  FROM f
)
SELECT doc_id, fingerprint, (NOT known AND rn = 1) AS is_new
FROM w ORDER BY doc_id
""",
)
def q_corpus_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot ingestion gate: even doc_ids are the existing
    corpus, odd ones the incoming batch; seeded copies (doc_id%9==1 takes
    its predecessor's text -> known duplicate; odd doc_id%42==3 takes
    doc_id-2's text -> within-batch duplicate) make both rejection paths
    non-degenerate. Fingerprint-keyed anti-join + first-wins window, both
    on the uniform md5 key; see pipeline/corpus.py incremental_ingest."""
    docs = _t(spark, sf_dir, "documents")
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    src_id = F.when(F.col("doc_id") % 9 == 1, F.col("doc_id") - 1).when(
        F.col("doc_id") % 42 == 3, F.col("doc_id") - 2
    )
    incoming = (
        odd.withColumn("src_id", src_id)
        .join(
            docs.select(F.col("doc_id").alias("src_id"), F.col("text").alias("src_text")),
            "src_id",
            "left",
        )
        .select("doc_id", F.coalesce("src_text", "text").alias("text"))
    )
    existing = docs.filter(F.col("doc_id") % 2 == 0)
    return CP.incremental_ingest(incoming, existing).orderBy("doc_id")


@_register("vn_phone_extract")  # rows-only: lookbehind is Java-regex-only
def q_vn_phone_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 — strict VN phone pipeline (lookaround regex, unicode separator
    class) over deterministically augmented text. RE2/DuckDB cannot express
    the lookbehind, so this is rows-only here; byte-parity vs the pure-
    Python reference pipeline is pinned in tests/test_contacts-style
    fixtures (functions/textnorm.py twins). Output is exploded to scalar
    (doc_id, idx, phone) rows — array columns break the driver's pandas
    canonicalizer (CORRECTNESS_r01 vn_phone_extract err)."""
    from crawler_ai_spark.functions.contacts import phones_strict_expr

    docs = _t(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.expr(
            "text || ' Hotline: 0' || CAST(90 + doc_id % 10 AS STRING) || "
            "' ' || CAST(1000000 + doc_id AS STRING)"
        ).alias("text"),
    )
    return (
        aug.select(
            "doc_id",
            F.posexplode(phones_strict_expr(F.col("text"))).alias("idx", "phone"),
        )
        .orderBy("doc_id", "idx")
    )


# the flagship training-data composition: every curation stage in ONE
# declarative plan. Duplicate templates are seeded so the dedup stage is
# non-degenerate at the gate SF (0 natural dups there) and are written to
# PASS the lang/quality gates (stopword-rich English, low repetition) and
# to EXERCISE the scrub (an email + a phone inside).
_CURATION_DUP_TEMPLATE = (
    "the quick brown fox and the lazy dog are in the house with a cat and "
    "they all see the sun in the day while the rain is far away call "
    "0912345678 or write user@ex.example now template #"
)
_CURATION_MIN_QUALITY = 0.75


def _curation_oracle() -> str:
    return f"""
WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 < 3
              THEN {_sql_quote(_CURATION_DUP_TEMPLATE)} || CAST(doc_id % 5 AS VARCHAR)
              ELSE text END AS text
  FROM documents
),
lang AS (SELECT * FROM ({_lang_oracle("aug")}) t),
qual AS (SELECT * FROM ({_doc_quality_oracle("aug")}) t),
kept AS (
  SELECT a.doc_id, a.text, l.lang_pred, q.quality
  FROM aug a JOIN lang l USING (doc_id) JOIN qual q USING (doc_id)
  WHERE l.lang_pred = 'en' AND q.quality >= {_CURATION_MIN_QUALITY}
  QUALIFY row_number() OVER (
    PARTITION BY md5(lower(trim(regexp_replace(a.text, '\\s+', ' ', 'g'))))
    ORDER BY a.doc_id) = 1
),
scrubbed AS (
  SELECT doc_id, lang_pred, quality,
         regexp_replace(regexp_replace(text, '{_PII_EMAIL_RX}', '<EMAIL>', 'g'),
                        '{_PII_PHONE_RX}', '<PHONE>', 'g') AS tx
  FROM kept
),
chunks AS (
  SELECT doc_id, lang_pred, quality, CAST(i AS BIGINT) AS chunk_id,
         substr(tx, CAST(i * {_CHUNK_STRIDE} + 1 AS BIGINT), {_CHUNK_LEN}) AS chunk_text
  FROM scrubbed, unnest(range(0,
    CAST(CASE WHEN length(tx) = 0 THEN 0
         ELSE floor((length(tx) - 1) / {_CHUNK_STRIDE}) + 1 END AS BIGINT))) AS u(i)
)
SELECT doc_id, lang_pred, quality, chunk_id, chunk_text
FROM chunks ORDER BY doc_id, chunk_id
"""


@_register("doc_curation_pipeline", oracle=_curation_oracle())
def q_doc_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation pipeline as ONE declarative plan: language gate
    → quality gate → exact dedup (first doc per fingerprint) → PII scrub
    → overlapping chunking. Catalyst sees every stage at once — the
    filters run before the window, the scrub/chunk projections fuse into
    the post-dedup stage, and the only shuffle is the fingerprint window.
    This is the composition a 100 TB corpus build would submit per
    partition of the crawl output."""
    docs = _t(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 < 3,
            F.concat(
                F.lit(_CURATION_DUP_TEMPLATE), (F.col("doc_id") % 5).cast("string")
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    # the gate expressions tokenize every document (CPU-bound JVM work);
    # a one-partition parquet source would serialize them — spread first
    from crawler_ai_spark.session import spread_to_cores

    aug = spread_to_cores(aug, "doc_id")
    t = F.col("text")
    staged = aug.select(
        "doc_id",
        "text",
        TS.lang_id(t).alias("lang_pred"),
        TS.quality_score(t).alias("quality"),
        TS.fingerprint(t).alias("fingerprint"),
    )
    kept = staged.where(
        (F.col("lang_pred") == "en") & (F.col("quality") >= _CURATION_MIN_QUALITY)
    )
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    kept = kept.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    scrubbed = kept.withColumn(
        "tx",
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _PII_EMAIL_RX, "<EMAIL>"),
            _PII_PHONE_RX,
            "<PHONE>",
        ),
    )
    return (
        scrubbed.select(
            "doc_id",
            "lang_pred",
            "quality",
            F.posexplode(_chunk_array(F.col("tx"))).alias("chunk_id", "chunk_text"),
        )
        .select(
            "doc_id",
            "lang_pred",
            "quality",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            "chunk_text",
        )
        .orderBy("doc_id", "chunk_id")
    )


def _training_manifest_oracle() -> str:
    w = CP.PACK_WINDOW
    shard = (
        f"CAST(concat('0x', substr(k, 1, 4)) AS BIGINT) % {CP.SHUFFLE_SHARDS}"
    )
    return f"""
WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 < 3
              THEN {_sql_quote(_CURATION_DUP_TEMPLATE)} || CAST(doc_id % 5 AS VARCHAR)
              ELSE text END AS text
  FROM documents
),
lang AS (SELECT * FROM ({_lang_oracle("aug")}) t),
qual AS (SELECT * FROM ({_doc_quality_oracle("aug")}) t),
kept AS (
  SELECT a.doc_id, a.text
  FROM aug a JOIN lang l USING (doc_id) JOIN qual q USING (doc_id)
  WHERE l.lang_pred = 'en' AND q.quality >= {_CURATION_MIN_QUALITY}
  QUALIFY row_number() OVER (
    PARTITION BY md5(lower(trim(regexp_replace(a.text, '\\s+', ' ', 'g'))))
    ORDER BY a.doc_id) = 1
),
keyed AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(text, '{_PII_EMAIL_RX}', '<EMAIL>', 'g'),
                        '{_PII_PHONE_RX}', '<PHONE>', 'g') AS tx,
         md5(concat(CAST(doc_id AS VARCHAR), ':{CP.SHUFFLE_SALT}')) AS k
  FROM kept
),
pos AS (
  SELECT {shard} AS shard_id,
         row_number() OVER (PARTITION BY {shard} ORDER BY k, doc_id) AS position,
         tx
  FROM keyed
),
t AS (
  SELECT shard_id, position,
         CASE WHEN length(trim(regexp_replace(tx, '\\s+', ' ', 'g'))) = 0
              THEN ['{CP.EOD_TOKEN}']
              ELSE string_split(lower(trim(regexp_replace(tx, '\\s+', ' ', 'g'))), ' ')
                   || ['{CP.EOD_TOKEN}']
         END AS stream
  FROM pos
),
o AS (
  SELECT shard_id, position, stream, CAST(len(stream) AS BIGINT) AS doc_len,
         coalesce(sum(CAST(len(stream) AS BIGINT)) OVER (PARTITION BY shard_id ORDER BY position
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS global_offset
  FROM t
),
e AS (
  SELECT shard_id, position, stream, CAST(w AS BIGINT) AS window_id,
         greatest(0, CAST(w AS BIGINT) * {w} - global_offset) AS a,
         least(doc_len, (CAST(w AS BIGINT) + 1) * {w} - global_offset) AS b
  FROM o, unnest(generate_series(
      CAST(floor(global_offset / {w}) AS BIGINT),
      CAST(floor((global_offset + doc_len - 1) / {w}) AS BIGINT))) AS u(w)
)
SELECT shard_id, window_id,
       string_agg(array_to_string(list_slice(stream, a + 1, b), ' '), ' ' ORDER BY position) AS window_text,
       CAST(sum(b - a) AS BIGINT) AS n_tokens
FROM e GROUP BY shard_id, window_id ORDER BY shard_id, window_id
"""


@_register("corpus_training_manifest", oracle=_training_manifest_oracle())
def q_corpus_training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data capstone as ONE declarative plan:
    lang gate → quality gate → exact dedup → PII scrub → deterministic
    global shuffle → fixed-width sequence packing. Raw crawl text in,
    decorrelated packed training windows out. Three shuffles total at
    any corpus size: the dedup fingerprint window, the shard window
    (whose partitioning the packing offset window REUSES — same key, so
    Catalyst inserts a sort, not a second exchange), and the packing
    regroup. Gates filter before every exchange; the seeded duplicate
    templates keep the dedup stage non-degenerate at the gate SF."""
    from crawler_ai_spark.session import spread_to_cores

    docs = _t(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 < 3,
            F.concat(
                F.lit(_CURATION_DUP_TEMPLATE), (F.col("doc_id") % 5).cast("string")
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    aug = spread_to_cores(aug, "doc_id")
    t = F.col("text")
    staged = aug.select(
        "doc_id",
        "text",
        TS.lang_id(t).alias("lang_pred"),
        TS.quality_score(t).alias("quality"),
        TS.fingerprint(t).alias("fingerprint"),
    )
    kept = staged.where(
        (F.col("lang_pred") == "en") & (F.col("quality") >= _CURATION_MIN_QUALITY)
    )
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    kept = kept.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    key = F.md5(
        F.concat_ws(":", F.col("doc_id").cast("string"), F.lit(CP.SHUFFLE_SALT))
    )
    # the shard column is named `source` from the start: if the position
    # window partitioned on a differently-named column, the rename below
    # would prune the attribute carrying the partitioning and Catalyst
    # would re-exchange before the packing offset window.
    keyed = kept.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _PII_EMAIL_RX, "<EMAIL>"),
            _PII_PHONE_RX,
            "<PHONE>",
        ).alias("tx"),
        key.alias("k"),
        (F.conv(F.substring(key, 1, 4), 16, 10).cast("long") % CP.SHUFFLE_SHARDS)
        .alias("source"),
    )
    pos = F.row_number().over(
        Window.partitionBy("source").orderBy("k", "doc_id")
    )
    shuffled = keyed.select(
        "source",
        pos.cast("long").alias("doc_id"),
        F.col("tx").alias("text"),
    )
    packed = CP.pack_windows(shuffled)
    return packed.select(
        F.col("source").alias("shard_id"), "window_id", "window_text", "n_tokens"
    ).orderBy("shard_id", "window_id")


@_register(
    "doc_dedup_pipeline",
    oracle="""
WITH ranked AS (
  SELECT doc_id, lang, n_chars,
         row_number() OVER (PARTITION BY md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
                            ORDER BY doc_id) AS rn
  FROM documents
)
SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM ranked WHERE rn = 1
GROUP BY lang ORDER BY lang
""",
)
def q_doc_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation step: normalize → fingerprint-dedup (keep min
    doc_id) → per-language corpus stats. The composed form of D1+A1."""
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy(TS.fingerprint(F.col("text"))).orderBy("doc_id")
    kept = docs.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return (
        kept.groupBy("lang")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        .orderBy("lang")
    )


# ===========================================================================
# 7. job-record operators (P9/P10/P12/P14, F6, D3/D4, C6) over synthesized
#    job cards — deterministic text built from documents on both engines
# ===========================================================================

_TITLES = [
    "'Senior Java Developer'", "'Business Analyst'", "'DevOps Engineer'",
    "'Data Engineer'", "'Frontend Developer'", "'QA Engineer'",
    "'Product Manager'", "'Competitive Salary And Benefits'",
    "'Python Developer'", "'Office Tour'",
]
_TITLE_CASE_SQL = (
    "CASE (doc_id % 10) "
    + " ".join(f"WHEN {i} THEN {t}" for i, t in enumerate(_TITLES))
    + " END"
)

_CARD_SQL = (
    "'Job: ' || " + _TITLE_CASE_SQL + " || '\n' || "
    "CASE WHEN doc_id % 4 = 0 THEN 'Location: Ha Noi\n' "
    "     WHEN doc_id % 4 = 1 THEN 'Nơi làm việc: Da Nang Xem Thêm\n' ELSE '' END || "
    "CASE WHEN doc_id % 3 = 0 THEN 'Mức lương: 25 triệu\n' "
    "     WHEN doc_id % 3 = 1 THEN 'salary: 1500 USD\n' ELSE '' END || "
    "CASE WHEN doc_id % 5 = 0 THEN 'This is a full-time role. ' "
    "     WHEN doc_id % 5 = 1 THEN 'Remote position. ' "
    "     WHEN doc_id % 5 = 2 THEN 'internship opening. ' ELSE '' END || "
    "substr(text, 1, 160)"
)
# Spark SQL twin: identical except '\n' literal spelling
_CARD_SPARK = _CARD_SQL.replace("\\n", "\\n").replace("doc_id", "CAST(doc_id AS STRING)") \
    .replace("CASE (CAST(doc_id AS STRING) % 10)", "CASE (doc_id % 10)")


def _cards(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    title = F.expr(_TITLE_CASE_SQL)
    loc = (
        F.when(F.col("doc_id") % 4 == 0, F.lit("Location: Ha Noi\n"))
        .when(F.col("doc_id") % 4 == 1, F.lit("Nơi làm việc: Da Nang Xem Thêm\n"))
        .otherwise(F.lit(""))
    )
    sal = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("Mức lương: 25 triệu\n"))
        .when(F.col("doc_id") % 3 == 1, F.lit("salary: 1500 USD\n"))
        .otherwise(F.lit(""))
    )
    typ = (
        F.when(F.col("doc_id") % 5 == 0, F.lit("This is a full-time role. "))
        .when(F.col("doc_id") % 5 == 1, F.lit("Remote position. "))
        .when(F.col("doc_id") % 5 == 2, F.lit("internship opening. "))
        .otherwise(F.lit(""))
    )
    card = F.concat(
        F.lit("Job: "), title, F.lit("\n"), loc, sal, typ, F.substring("text", 1, 160)
    )
    return docs.select("doc_id", title.alias("title"), card.alias("card"))


def _job_fields_oracle() -> str:
    return f"""
WITH cards AS (
  SELECT doc_id, {_TITLE_CASE_SQL} AS title, {_CARD_SQL} AS card FROM documents
)
SELECT doc_id,
  CASE WHEN regexp_matches(lower(card), 'full-time|full time|fulltime') THEN 'Full-time'
       WHEN regexp_matches(lower(card), 'part-time|part time|parttime') THEN 'Part-time'
       WHEN regexp_matches(lower(card), 'contract') THEN 'Contract'
       WHEN regexp_matches(lower(card), 'intern') THEN 'Internship'
       WHEN regexp_matches(lower(card), 'remote') THEN 'Remote'
       WHEN regexp_matches(lower(card), 'hybrid') THEN 'Hybrid'
       END AS job_type,
  nullif(trim(regexp_replace(
    coalesce(
      nullif(regexp_extract(card, '(?i)nơi làm việc[:\\s]+([^\\n]+)', 1), ''),
      nullif(regexp_extract(card, '(?i)location[:\\s]+([^\\n]+)', 1), '')
    ),
    '(Download JD|Apply now|Xem Thêm|Số lượng tuyển|Junior|Senior|Tuyển gấp).*$', '')), '') AS location,
  trim(coalesce(
      nullif(regexp_extract(card, '(?i)mức lương[:\\s]+([^\\n]+)', 1), ''),
      nullif(regexp_extract(card, '(?i)salary[:\\s]+([^\\n]+)', 1), ''),
      nullif(regexp_extract(card, '(?i)lương[:\\s]+([^\\n]+)', 1), '')
  )) AS salary
FROM cards ORDER BY doc_id
"""


@_register("job_fields_extract", oracle=_job_fields_oracle())
def q_job_fields_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 — job_type cascade + location/salary first-match patterns over
    synthesized job cards."""
    from crawler_ai_spark.functions import jobs as J

    cards = _cards(spark, sf_dir)
    return cards.select(
        "doc_id",
        J.job_type_expr(F.col("card")).alias("job_type"),
        J.location_expr(F.col("card")).alias("location"),
        J.salary_expr(F.col("card")).alias("salary"),
    ).orderBy("doc_id")


@_register(
    "job_title_filter",
    oracle=f"""
WITH cards AS (
  SELECT doc_id, {_TITLE_CASE_SQL} AS title FROM documents
)
SELECT doc_id, title FROM cards
WHERE length(trim(title)) >= 5
  AND regexp_matches(lower(title), '{"|".join(sorted(set(K.JOB_TITLE_INDICATORS)))}')
  AND NOT regexp_matches(lower(title), '{"|".join(sorted(set(K.NON_JOB_TITLE_INDICATORS)))}')
ORDER BY doc_id
""",
)
def q_job_title_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 — allowlist/denylist job-title predicate ('Competitive Salary
    And Benefits' and 'Office Tour' must be rejected)."""
    from crawler_ai_spark.functions import jobs as J

    cards = _cards(spark, sf_dir)
    return (
        cards.where(J.is_real_job_title_expr(F.col("title")))
        .select("doc_id", "title")
        .orderBy("doc_id")
    )


@_register(
    "job_dedup_exact",
    oracle=f"""
WITH jobs AS (
  SELECT doc_id, {_TITLE_CASE_SQL} AS title,
         'Company' || (doc_id % 7) AS company
  FROM documents
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY lower(title), lower(company)
                               ORDER BY doc_id) AS rn
  FROM jobs
)
SELECT doc_id, title, company FROM ranked WHERE rn = 1
ORDER BY doc_id
""",
)
def q_job_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3 — first-wins dedup on lower(title)|lower(company)."""
    from crawler_ai_spark.functions import jobs as J

    cards = _cards(spark, sf_dir).withColumn(
        "company", F.concat(F.lit("Company"), (F.col("doc_id") % 7).cast("string"))
    )
    return (
        J.dedup_jobs_exact(cards.select("doc_id", "title", "company"), order_col="doc_id")
        .select("doc_id", "title", "company")
        .orderBy("doc_id")
    )


@_register(
    "job_quality_scores",
    oracle=f"""
WITH jobs AS (
  SELECT doc_id, {_TITLE_CASE_SQL} AS title,
         CASE WHEN doc_id % 3 = 0 THEN NULL ELSE substr(text, 1, 200) END AS description,
         'https://x' || doc_id AS url,
         CASE WHEN doc_id % 4 = 0 THEN 'Ha Noi' END AS location,
         CASE WHEN doc_id % 5 = 0 THEN 'Full-time' END AS job_type,
         CASE WHEN doc_id % 2 = 0 THEN 'Company' END AS company,
         CASE WHEN doc_id % 6 = 0 THEN '20 trieu' END AS salary,
         CASE WHEN doc_id % 7 = 0 THEN CAST(doc_id % 100 AS INT) END AS days_ago
  FROM documents
),
scored AS (
  SELECT doc_id,
    round(((CASE WHEN title IS NOT NULL AND trim(title) <> '' THEN 1.0 ELSE 0.0 END
          + CASE WHEN description IS NOT NULL AND trim(description) <> '' THEN 1.0 ELSE 0.0 END
          + CASE WHEN url IS NOT NULL AND trim(url) <> '' THEN 1.0 ELSE 0.0 END) / 3) * 0.8
        + ((CASE WHEN company IS NOT NULL THEN 1.0 ELSE 0.0 END
          + CASE WHEN location IS NOT NULL THEN 1.0 ELSE 0.0 END
          + CASE WHEN job_type IS NOT NULL THEN 1.0 ELSE 0.0 END
          + CASE WHEN salary IS NOT NULL THEN 1.0 ELSE 0.0 END
          + CASE WHEN CAST(NULL AS VARCHAR) IS NOT NULL THEN 1.0 ELSE 0.0 END) / 5) * 0.2
    , 6) AS completeness,
    CASE WHEN days_ago IS NULL THEN 0.5
         WHEN days_ago <= 7 THEN 1.0
         WHEN days_ago <= 30 THEN 0.7
         WHEN days_ago <= 90 THEN 0.4
         ELSE 0.1 END AS freshness
  FROM jobs
)
SELECT doc_id, completeness, freshness FROM scored ORDER BY doc_id
""",
)
def q_job_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6 — completeness (0.8 required / 0.2 optional) + freshness buckets
    (relevance needs keyword-hit parity already covered by F6's oracle)."""
    from crawler_ai_spark.functions import jobs as J

    docs = _t(spark, sf_dir, "documents")
    jobs_df = docs.select(
        "doc_id",
        F.expr(_TITLE_CASE_SQL).alias("title"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(None)).otherwise(
            F.substring("text", 1, 200)
        ).alias("description"),
        F.concat(F.lit("https://x"), F.col("doc_id").cast("string")).alias("url"),
        F.when(F.col("doc_id") % 4 == 0, F.lit("Ha Noi")).alias("location"),
        F.when(F.col("doc_id") % 5 == 0, F.lit("Full-time")).alias("job_type"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("Company")).alias("company"),
        F.when(F.col("doc_id") % 6 == 0, F.lit("20 trieu")).alias("salary"),
        F.when(F.col("doc_id") % 7 == 0, (F.col("doc_id") % 100).cast("int")).alias("days_ago"),
    )
    cols = {c: F.col(c) for c in jobs_df.columns}
    cols["posted_date"] = F.lit(None).cast("string")
    return jobs_df.select(
        "doc_id",
        J.completeness_expr(cols).alias("completeness"),
        J.freshness_expr(F.col("days_ago")).alias("freshness"),
    ).orderBy("doc_id")


@_register(
    "date_parse_multi",
    oracle="""
WITH raw AS (
  SELECT doc_id,
    CASE (doc_id % 8)
      WHEN 0 THEN '2024-03-15' WHEN 1 THEN '15/03/2024' WHEN 2 THEN '03/15/2024'
      WHEN 3 THEN '15-03-2024' WHEN 4 THEN '2024/03/15' WHEN 5 THEN '15.03.2024'
      WHEN 6 THEN '2024.03.15' ELSE 'not a date' END AS raw_date
  FROM documents
)
SELECT doc_id, raw_date,
  strftime(coalesce(
    try_strptime(raw_date, '%Y-%m-%d'), try_strptime(raw_date, '%d/%m/%Y'),
    try_strptime(raw_date, '%m/%d/%Y'), try_strptime(raw_date, '%d-%m-%Y'),
    try_strptime(raw_date, '%Y/%m/%d'), try_strptime(raw_date, '%d.%m.%Y'),
    try_strptime(raw_date, '%Y.%m.%d')), '%Y-%m-%d') AS parsed
FROM raw ORDER BY doc_id
""",
)
def q_date_parse_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P14 — 7-format date parse cascade; output rendered yyyy-MM-dd."""
    from crawler_ai_spark.functions import jobs as J

    docs = _t(spark, sf_dir, "documents")
    raw = (
        F.when(F.col("doc_id") % 8 == 0, F.lit("2024-03-15"))
        .when(F.col("doc_id") % 8 == 1, F.lit("15/03/2024"))
        .when(F.col("doc_id") % 8 == 2, F.lit("03/15/2024"))
        .when(F.col("doc_id") % 8 == 3, F.lit("15-03-2024"))
        .when(F.col("doc_id") % 8 == 4, F.lit("2024/03/15"))
        .when(F.col("doc_id") % 8 == 5, F.lit("15.03.2024"))
        .when(F.col("doc_id") % 8 == 6, F.lit("2024.03.15"))
        .otherwise(F.lit("not a date"))
    )
    return docs.select(
        "doc_id",
        raw.alias("raw_date"),
        F.date_format(J.posted_date_expr(raw), "yyyy-MM-dd").alias("parsed"),
    ).orderBy("doc_id")


@_register(
    "job_fuzzy_pairs",
    oracle=f"""
WITH jobs AS (
  SELECT doc_id AS job_id,
    CASE (doc_id % 6)
      WHEN 0 THEN 'Senior Java Developer'
      WHEN 1 THEN 'Senior Java Developer (Remote)'
      WHEN 2 THEN 'Java Developer Senior'
      WHEN 3 THEN 'Business Analyst'
      WHEN 4 THEN 'Data Platform Engineer'
      ELSE 'Office Manager' END AS title
  FROM documents WHERE doc_id < 40
),
base AS (
  SELECT job_id, title,
         lower(trim(regexp_replace(title, '\\s+', ' ', 'g'))) AS norm,
         list_distinct(list_filter(string_split(lower(trim(regexp_replace(title, '\\s+', ' ', 'g'))), ' '),
                     t -> NOT list_contains([{", ".join(_sql_quote(w) for w in K.TITLE_COMMON_WORDS)}], t) AND t <> '')) AS toks
  FROM jobs
  WHERE length(trim(title)) >= 5
    AND NOT (len(string_split(norm, ' ')) = 1 AND
             list_contains([{", ".join(_sql_quote(w) for w in K.GENERIC_SINGLE_TITLES)}], norm))
)
SELECT a.job_id AS a_id, b.job_id AS b_id
FROM base a JOIN base b ON a.job_id < b.job_id
WHERE CASE
  WHEN a.norm = b.norm THEN TRUE
  WHEN len(list_intersect(a.toks, b.toks)) = len(list_distinct(a.toks))
    OR len(list_intersect(a.toks, b.toks)) = len(list_distinct(b.toks))
  THEN (len(list_distinct(a.toks)) - len(list_intersect(a.toks, b.toks)))
     + (len(list_distinct(b.toks)) - len(list_intersect(a.toks, b.toks))) <= 1
  ELSE len(list_intersect(a.toks, b.toks)) >= 3 END
ORDER BY a_id, b_id
""",
)
def q_job_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 — fuzzy-title duplicate pairs on a constructed variant set
    ('Senior Java Developer' ≈ its Remote/reordered variants; 'Business
    Analyst' ≉ 'Data Platform Engineer')."""
    from crawler_ai_spark.functions import jobs as J

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 40)
    title = (
        F.when(F.col("doc_id") % 6 == 0, F.lit("Senior Java Developer"))
        .when(F.col("doc_id") % 6 == 1, F.lit("Senior Java Developer (Remote)"))
        .when(F.col("doc_id") % 6 == 2, F.lit("Java Developer Senior"))
        .when(F.col("doc_id") % 6 == 3, F.lit("Business Analyst"))
        .when(F.col("doc_id") % 6 == 4, F.lit("Data Platform Engineer"))
        .otherwise(F.lit("Office Manager"))
    )
    jobs_df = docs.select(F.col("doc_id").alias("job_id"), title.alias("title"))
    return J.fuzzy_title_pairs(jobs_df)


@_register(
    "title_clean",
    oracle=f"""
WITH raw AS (
  SELECT doc_id,
    CASE (doc_id % 4)
      WHEN 0 THEN '  Senior <b>Java</b> Developer Fully Remote '
      WHEN 1 THEN 'com Business   Analyst See Details'
      WHEN 2 THEN 'DevOps Engineer'
      ELSE 'QA   Engineer Remote' END AS raw_title
  FROM documents
)
SELECT doc_id, raw_title,
  trim(regexp_replace(regexp_replace(
    regexp_replace(regexp_replace(raw_title, '<[^>]+>', ' ', 'g'), '\\s+', ' ', 'g'),
    '(?i)\\s*(Singapore Only|Fully Remote|Remote|See Details|See)\\s*$', ''),
    '(?i)^com\\s*', '')) AS title
FROM raw ORDER BY doc_id
""",
)
def q_title_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10 — tag strip, ws collapse, suffix/prefix cleanup."""
    from crawler_ai_spark.functions import jobs as J

    docs = _t(spark, sf_dir, "documents")
    raw = (
        F.when(F.col("doc_id") % 4 == 0, F.lit("  Senior <b>Java</b> Developer Fully Remote "))
        .when(F.col("doc_id") % 4 == 1, F.lit("com Business   Analyst See Details"))
        .when(F.col("doc_id") % 4 == 2, F.lit("DevOps Engineer"))
        .otherwise(F.lit("QA   Engineer Remote"))
    )
    return docs.select(
        "doc_id", raw.alias("raw_title"), J.clean_title_expr(raw).alias("title")
    ).orderBy("doc_id")


@_register(
    "description_summarize",
    # the reference's cut (job_extraction_service.py:1102-1118): collapse
    # ws; <=300 keep; else cut at last '.' past 60% of the limit, else last
    # space, then ' ...'. Lookaround-free — fully RE2/DuckDB-expressible
    # (greedy '^(.*X)' length = rfind(X)+1 on both engines).
    oracle="""
WITH t AS (
  SELECT doc_id, trim(regexp_replace(coalesce(text, ''), '\\s+', ' ', 'g')) AS d
  FROM documents
),
h AS (
  SELECT doc_id, d,
         length(regexp_extract(substring(d, 1, 300), '^(.*\\.)', 1)) AS dot,
         length(regexp_extract(substring(d, 1, 300), '^(.* )', 1)) AS spc
  FROM t
)
SELECT doc_id,
       CASE WHEN length(d) <= 300 THEN d
            ELSE trim(substring(d, 1,
                 CASE WHEN dot >= 181 THEN dot
                      WHEN spc > 1 THEN spc
                      ELSE 300 END)) || ' ...' END AS summary
FROM h ORDER BY doc_id
""",
)
def q_description_summarize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12 — description summarize column over document text (oracle-gated;
    byte-parity vs the pure-Python twin is also asserted in pytest)."""
    from crawler_ai_spark.functions import jobs as J

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", J.summarize_description_expr(F.col("text")).alias("summary")
    ).orderBy("doc_id")


# ===========================================================================
# 8. wave 4 — sources (S6/S7), contacts (P6), link scoring (C4), merge (D6)
# ===========================================================================


@_register(
    "social_links_extract",
    oracle="""
WITH aug AS (
  SELECT doc_id,
    text || ' follow us https://facebook.com/corp' || (doc_id % 9)
         || ' and https://www.linkedin.com/company/corp' || (doc_id % 9)
         || CASE WHEN doc_id % 2 = 0
                 THEN ' code at https://github.com/corp' || (doc_id % 9) ELSE '' END AS text
  FROM documents
),
hits AS (
  SELECT doc_id, 'facebook' AS platform,
         unnest(regexp_extract_all(text, 'facebook\\.com/[^/\\s]+')) AS handle FROM aug
  UNION ALL
  SELECT doc_id, 'linkedin',
         unnest(regexp_extract_all(text, 'linkedin\\.com/(?:company|in)/[^/\\s]+')) FROM aug
  UNION ALL
  SELECT doc_id, 'github',
         unnest(regexp_extract_all(text, 'github\\.com/[^/\\s]+')) FROM aug
)
SELECT DISTINCT doc_id, platform, handle FROM hits
ORDER BY doc_id, platform, handle
""",
)
def q_social_links_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 — per-platform social-link regex sweep, exploded + dedup'd
    (contact_extractor_service.py:56-63 patterns)."""
    docs = _t(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.expr(
            "text || ' follow us https://facebook.com/corp' || CAST(doc_id % 9 AS STRING)"
            " || ' and https://www.linkedin.com/company/corp' || CAST(doc_id % 9 AS STRING)"
            " || CASE WHEN doc_id % 2 = 0"
            " THEN ' code at https://github.com/corp' || CAST(doc_id % 9 AS STRING) ELSE '' END"
        ).alias("text"),
    )
    parts = []
    for platform in ("facebook", "linkedin", "github"):
        rx = K.SOCIAL_PATTERNS[platform].replace("(company|in)", "(?:company|in)")
        parts.append(
            aug.select(
                "doc_id",
                F.lit(platform).alias("platform"),
                F.explode(F.regexp_extract_all(F.col("text"), F.lit(rx), F.lit(0))).alias(
                    "handle"
                ),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct().orderBy("doc_id", "platform", "handle")


@_register(
    "sitemap_extract",
    oracle=f"""
WITH {SYNTH_URLS_CTE},
sitemaps AS (
  SELECT doc_id,
    '<?xml version="1.0"?><urlset>'
    || '<url><loc>https://site' || (doc_id % 37) || '.example.com/careers</loc></url>'
    || '<url><loc>https://site' || (doc_id % 37) || '.example.com/jobs/view/' || doc_id || '</loc></url>'
    || '<url><loc>https://site' || (doc_id % 37) || '.example.com/blog/post-' || doc_id || '</loc></url>'
    || '</urlset>' AS xml
  FROM synth_urls WHERE doc_id % 10 = 0
),
locs AS (
  SELECT doc_id, unnest(regexp_extract_all(xml, '<loc>([^<]+)</loc>', 1)) AS loc FROM sitemaps
)
SELECT doc_id, loc FROM locs
WHERE regexp_matches(lower(loc), 'job|career|tuyen-dung|viec-lam|recruit')
ORDER BY doc_id, loc
""",
)
def q_sitemap_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 — sitemap <loc> extraction + job-keyword filter
    (career_pages_service.py:291-317)."""
    urls = synth_urls(spark, sf_dir).where(F.col("doc_id") % 10 == 0)
    xml = F.expr(
        "'<?xml version=\"1.0\"?><urlset>'"
        " || '<url><loc>https://site' || CAST(doc_id % 37 AS STRING) || '.example.com/careers</loc></url>'"
        " || '<url><loc>https://site' || CAST(doc_id % 37 AS STRING) || '.example.com/jobs/view/' || CAST(doc_id AS STRING) || '</loc></url>'"
        " || '<url><loc>https://site' || CAST(doc_id % 37 AS STRING) || '.example.com/blog/post-' || CAST(doc_id AS STRING) || '</loc></url>'"
        " || '</urlset>'"
    )
    locs = urls.select(
        "doc_id",
        F.explode(F.regexp_extract_all(xml, F.lit("<loc>([^<]+)</loc>"), F.lit(1))).alias("loc"),
    )
    return (
        locs.where(F.lower(F.col("loc")).rlike("job|career|tuyen-dung|viec-lam|recruit"))
        .orderBy("doc_id", "loc")
    )


@_register(
    "embedded_jobs_extract",
    oracle="""
WITH pages AS (
  SELECT doc_id,
    '{"jobs": [{"title": "Engineer ' || doc_id || '", "location": "Hanoi", "type": "Full-time"},'
    || '{"title": "Analyst ' || doc_id || '", "location": "Remote", "type": "Contract"}]}' AS payload
  FROM documents WHERE doc_id % 8 = 0
)
SELECT doc_id,
       json_extract_string(payload, '$.jobs[' || i || '].title') AS title,
       json_extract_string(payload, '$.jobs[' || i || '].location') AS location,
       json_extract_string(payload, '$.jobs[' || i || '].type') AS job_type
FROM pages, unnest([0, 1]) AS t(i)
ORDER BY doc_id, title
""",
)
def q_embedded_jobs_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 — embedded-JSON job arrays parsed with from_json + explode
    (hidden_job_extractor_requests.py:84-170 semantics)."""
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") % 8 == 0)
    payload = F.expr(
        "'{\"jobs\": [{\"title\": \"Engineer ' || CAST(doc_id AS STRING) || '\", \"location\": \"Hanoi\", \"type\": \"Full-time\"},'"
        " || '{\"title\": \"Analyst ' || CAST(doc_id AS STRING) || '\", \"location\": \"Remote\", \"type\": \"Contract\"}]}'"
    )
    schema = "STRUCT<jobs: ARRAY<STRUCT<title: STRING, location: STRING, type: STRING>>>"
    parsed = docs.select("doc_id", F.from_json(payload, schema).alias("p"))
    return (
        parsed.select("doc_id", F.explode("p.jobs").alias("j"))
        .select(
            "doc_id",
            F.col("j.title").alias("title"),
            F.col("j.location").alias("location"),
            F.col("j.type").alias("job_type"),
        )
        .orderBy("doc_id", "title")
    )


def _job_link_score_oracle() -> str:
    from crawler_ai_spark.functions import scoring as SC

    high = _any_substr_rx(SC._HIGH_PRIORITY_PATHS)
    med = _any_substr_rx(SC._MEDIUM_PRIORITY_PATHS)
    pk_hits = " + ".join(
        f"CASE WHEN contains(low, {_sql_quote(k)}) THEN 1 ELSE 0 END"
        for k in SC._PATH_KEYWORDS
    )
    tk_hits = " + ".join(
        f"CASE WHEN contains(tlow, {_sql_quote(k)}) THEN 1 ELSE 0 END"
        for k in SC._TEXT_KEYWORDS
    )
    return f"""
WITH {SYNTH_URLS_CTE},
links AS (
  SELECT doc_id, lower(url) AS low,
         lower(CASE (doc_id % 4) WHEN 0 THEN 'Apply now' WHEN 1 THEN 'Tuyển dụng'
               WHEN 2 THEN 'Read more' ELSE 'Open position' END) AS tlow,
         url
  FROM synth_urls
)
SELECT doc_id, url,
  CAST((CASE WHEN regexp_matches(low, {_sql_quote(high)}) THEN 5 ELSE 0 END)
  + (CASE WHEN regexp_matches(low, {_sql_quote(med)}) THEN 3 ELSE 0 END)
  + least({pk_hits}, 3) * 2
  + least({tk_hits}, 3)
  + (CASE WHEN len(string_split(regexp_replace(low, '^https?://[^/]*', ''), '/')) - 1
          BETWEEN 2 AND 4 THEN 1 ELSE 0 END) AS INT) AS score
FROM links ORDER BY doc_id
"""


@_register("job_link_score", oracle=_job_link_score_oracle())
def q_job_link_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 — job-link score ladder over synthesized (href, anchor text)."""
    from crawler_ai_spark.functions.scoring import job_link_score_expr

    urls = synth_urls(spark, sf_dir)
    anchor = (
        F.when(F.col("doc_id") % 4 == 0, F.lit("Apply now"))
        .when(F.col("doc_id") % 4 == 1, F.lit("Tuyển dụng"))
        .when(F.col("doc_id") % 4 == 2, F.lit("Read more"))
        .otherwise(F.lit("Open position"))
    )
    return urls.select(
        "doc_id", "url", job_link_score_expr(F.col("url"), anchor).alias("score")
    ).orderBy("doc_id")


@_register(
    "merge_detection_results",
    oracle=f"""
WITH {SYNTH_URLS_CTE},
scrapy AS (
  SELECT doc_id, url, 1 AS source_rank, doc_id AS seq FROM synth_urls WHERE doc_id % 12 IN (0, 1, 3)
),
fallback AS (
  SELECT doc_id, url, 2 AS source_rank, doc_id AS seq FROM synth_urls WHERE doc_id % 12 IN (0, 2, 11)
),
unioned AS (SELECT * FROM scrapy UNION ALL SELECT * FROM fallback),
dedup AS (
  SELECT *, row_number() OVER (PARTITION BY url ORDER BY source_rank, seq) AS rn
  FROM unioned
),
hosted AS (
  SELECT doc_id, url, source_rank,
         regexp_extract(url, '^https?://([^/]+)', 1) AS host,
         CASE WHEN regexp_matches(lower(url), '/tuyen-dung|/careers/') THEN 1
              WHEN regexp_matches(lower(url), '/careers$|/career$') THEN 2
              ELSE 3 END AS prio
  FROM dedup WHERE rn = 1
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY host ORDER BY prio, doc_id) AS k
  FROM hosted
)
SELECT host, url, source_rank, prio FROM ranked WHERE k <= 3
ORDER BY host, prio, url
""",
)
def q_merge_detection_results(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6/O3 — two detection sources merged with source priority, URL
    dedup (scrapy wins), per-host priority sort, top-3
    (career_pages_service.py:1178-1260)."""
    urls = synth_urls(spark, sf_dir)
    scrapy = urls.where((F.col("doc_id") % 12).isin(0, 1, 3)).select(
        "doc_id", "url", F.lit(1).alias("source_rank"), F.col("doc_id").alias("seq")
    )
    fallback = urls.where((F.col("doc_id") % 12).isin(0, 2, 11)).select(
        "doc_id", "url", F.lit(2).alias("source_rank"), F.col("doc_id").alias("seq")
    )
    unioned = scrapy.unionByName(fallback)
    w = Window.partitionBy("url").orderBy("source_rank", "seq")
    dedup = unioned.withColumn("rn", F.row_number().over(w)).where("rn = 1").drop("rn")
    low = F.lower(F.col("url"))
    prio = (
        F.when(low.rlike("/tuyen-dung|/careers/"), 1)
        .when(low.rlike("/careers$|/career$"), 2)
        .otherwise(3)
    )
    hosted = dedup.select(
        "doc_id", "url", "source_rank",
        F.regexp_extract("url", "^https?://([^/]+)", 1).alias("host"),
        prio.alias("prio"),
    )
    wk = Window.partitionBy("host").orderBy("prio", "doc_id")
    return (
        hosted.withColumn("k", F.row_number().over(wk))
        .where(F.col("k") <= 3)
        .select("host", "url", "source_rank", "prio")
        .orderBy("host", "prio", "url")
    )


# ===========================================================================
# 9. wave 5 — detection confidence (C5), job-count estimate (A5),
#    robots gate (W3), ordered merge-dedup (D5)
# ===========================================================================


@_register(
    "detection_confidence",
    oracle=f"""
WITH {SYNTH_URLS_CTE},
per_host AS (
  SELECT host,
         count(*) FILTER (WHERE (doc_id % 12) IN (0, 3, 11)) AS n_career,
         count(*) FILTER (WHERE (doc_id % 12) IN (1, 2, 8)) AS n_potential,
         count(*) AS n_total
  FROM synth_urls GROUP BY host
)
SELECT host, n_career, n_potential, n_total,
       round(least(least(n_career * 0.3, 1.0)
             + least(n_potential * 0.1, 0.3)
             + least(n_total / 100.0, 0.2), 1.0), 6) AS confidence
FROM per_host ORDER BY host
""",
)
def q_detection_confidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 — detection confidence over per-host aggregates
    (career_pages_service.py:915-930)."""
    from crawler_ai_spark.functions.scoring import detection_confidence_expr

    urls = synth_urls(spark, sf_dir)
    per_host = urls.groupBy("host").agg(
        F.sum(((F.col("doc_id") % 12).isin(0, 3, 11)).cast("long")).alias("n_career"),
        F.sum(((F.col("doc_id") % 12).isin(1, 2, 8)).cast("long")).alias("n_potential"),
        F.count("*").alias("n_total"),
    )
    return per_host.select(
        "host", "n_career", "n_potential", "n_total",
        F.round(
            detection_confidence_expr(
                F.col("n_career"), F.col("n_potential"), F.col("n_total")
            ),
            6,
        ).alias("confidence"),
    ).orderBy("host")


@_register(
    "job_count_estimate",
    oracle="""
SELECT doc_id,
       CAST(len(string_split(lower(text), 'job')) - 1 AS INT)
       + CAST(len(string_split(lower(text), 'position')) - 1 AS INT) AS job_mentions
FROM documents ORDER BY doc_id
""",
)
def q_job_count_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — html.count('job') + html.count('position')
    (career_pages_service.py:688) as split-size arithmetic."""
    docs = _t(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    mentions = (
        (F.size(F.split(low, "job", -1)) - 1) + (F.size(F.split(low, "position", -1)) - 1)
    ).cast("int")
    return docs.select("doc_id", mentions.alias("job_mentions")).orderBy("doc_id")


@_register(
    "robots_gate",
    oracle=f"""
WITH {SYNTH_URLS_CTE},
rules AS (
  SELECT DISTINCT host,
         CASE WHEN regexp_extract(host, 'site([0-9]+)', 1)::INT % 3 = 0
              THEN ['/login', '/news/'] ELSE [] END AS disallow_prefixes
  FROM synth_urls
)
SELECT u.doc_id, u.url
FROM synth_urls u JOIN rules r ON u.host = r.host
WHERE NOT EXISTS (
  SELECT 1 FROM unnest(r.disallow_prefixes) AS t(p)
  WHERE u.path LIKE p || '%'
)
ORDER BY u.doc_id
""",
)
def q_robots_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 — robots disallow-prefix gate via the engine's broadcast
    host_rules join (every 3rd host disallows /login and /news/)."""
    from crawler_ai_spark.operators.frontier import apply_robots

    urls = synth_urls(spark, sf_dir)
    rules = (
        urls.select("host")
        .distinct()
        .withColumn(
            "disallow_prefixes",
            F.when(
                F.regexp_extract("host", r"site(\d+)", 1).cast("int") % 3 == 0,
                F.array(F.lit("/login"), F.lit("/news/")),
            ).otherwise(F.array().cast("array<string>")),
        )
    )
    gated = apply_robots(urls.select("doc_id", "url", "host"), rules)
    return gated.select("doc_id", "url").orderBy("doc_id")


@_register(
    "ordered_contact_merge",
    oracle=f"""
WITH {SYNTH_URLS_CTE},
primary_vals AS (
  SELECT doc_id, 'val' || (doc_id % 5) AS value, 1 AS source_rank, doc_id AS seq
  FROM synth_urls WHERE doc_id % 2 = 0
),
secondary_vals AS (
  SELECT doc_id, 'val' || (doc_id % 7) AS value, 2 AS source_rank, doc_id AS seq
  FROM synth_urls WHERE doc_id % 3 = 0
),
unioned AS (SELECT * FROM primary_vals UNION ALL SELECT * FROM secondary_vals),
ranked AS (
  SELECT value, source_rank, seq,
         row_number() OVER (PARTITION BY value ORDER BY source_rank, seq) AS rn
  FROM unioned
)
SELECT value, source_rank, seq FROM ranked WHERE rn = 1 ORDER BY value
""",
)
def q_ordered_contact_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 — list(dict.fromkeys(a+b)) merge semantics: first occurrence
    wins across ordered sources (contact_extractor_service.py:259-266)."""
    urls = synth_urls(spark, sf_dir)
    prim = urls.where(F.col("doc_id") % 2 == 0).select(
        F.concat(F.lit("val"), (F.col("doc_id") % 5).cast("string")).alias("value"),
        F.lit(1).alias("source_rank"),
        F.col("doc_id").alias("seq"),
    )
    sec = urls.where(F.col("doc_id") % 3 == 0).select(
        F.concat(F.lit("val"), (F.col("doc_id") % 7).cast("string")).alias("value"),
        F.lit(2).alias("source_rank"),
        F.col("doc_id").alias("seq"),
    )
    w = Window.partitionBy("value").orderBy("source_rank", "seq")
    return (
        prim.unionByName(sec)
        .withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("value", "source_rank", "seq")
        .orderBy("value")
    )


# ===========================================================================
# 10. wave 6 — early-rejection rules (F5) + career-detector score (C2)
# ===========================================================================


def _early_rejection_oracle() -> str:
    r1 = _any_substr_rx(K.STRONG_NON_CAREER_INDICATORS)
    r4 = _any_substr_rx(K.EARLY_FILE_EXTENSIONS)
    r6 = _any_substr_rx(K.EARLY_NON_CAREER_PATHS)
    r7 = _any_substr_rx(K.EARLY_JOB_DETAIL_INDICATORS)
    return f"""
WITH {SYNTH_URLS_CTE},
feat AS (
  SELECT doc_id, url,
         lower(regexp_extract(url, '^https?://[^/?#]+([^?#]*)', 1)) AS path,
         lower(coalesce(nullif(regexp_extract(url, '\\?([^#]*)', 1), ''), '')) AS query,
         CASE WHEN regexp_replace(regexp_extract(url, '^https?://[^/?#]+([^?#]*)', 1),
                                  '^/+|/+$', '', 'g') = '' THEN 0
              ELSE len(string_split_regex(
                regexp_replace(regexp_extract(url, '^https?://[^/?#]+([^?#]*)', 1),
                               '^/+|/+$', '', 'g'), '/+')) END AS depth
  FROM synth_urls
)
SELECT doc_id, url,
  CASE
    WHEN regexp_matches(path || ' ' || query, {_sql_quote(r1)}) THEN 'non_career_indicator'
    WHEN regexp_matches(path, {_sql_quote("|".join(K.EARLY_DATE_PATTERNS))}) THEN 'date_pattern'
    WHEN regexp_matches(path, {_sql_quote("|".join(K.EARLY_ID_PATTERNS))}) THEN 'long_id'
    WHEN regexp_matches(path, {_sql_quote(r4)}) THEN 'file_extension'
    WHEN depth > {K.EARLY_MAX_PATH_DEPTH} THEN 'path_too_deep'
    WHEN regexp_matches(path, {_sql_quote(r6)}) THEN 'non_career_path'
    WHEN depth > 1 AND regexp_matches(path, {_sql_quote(r7)}) THEN 'job_detail_page'
  END AS rejection_reason
FROM feat ORDER BY doc_id
"""


@_register("early_rejection", oracle=_early_rejection_oracle())
def q_early_rejection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 — the 7-rule early-rejection cascade with first-match reason."""
    from crawler_ai_spark.functions.detector import early_rejection_reason_expr

    urls = synth_urls(spark, sf_dir)
    return urls.select(
        "doc_id", "url", early_rejection_reason_expr(F.col("url")).alias("rejection_reason")
    ).orderBy("doc_id")


def _career_detector_oracle() -> str:
    sub = _any_substr_rx(K.C2_NON_CAREER_SUBPAGES)
    high = _any_substr_rx(K.C2_HIGH_PRIORITY_PATTERNS)
    med = _any_substr_rx(K.C2_MEDIUM_PRIORITY_PATTERNS)
    exact = _any_substr_rx(K.CAREER_EXACT_PATTERNS)
    kw_list = ", ".join(_sql_quote(k) for k in K.CAREER_KEYWORDS_VI)
    nk_list = ", ".join(_sql_quote(k) for k in K.C2_NON_CAREER_KEYWORDS)
    qp_list = ", ".join(_sql_quote(p) for p in K.C2_QUERY_PARAMS)
    clean_list = ", ".join(_sql_quote(p) for p in K.C2_CLEAN_PATHS)
    return f"""
WITH {SYNTH_URLS_CTE},
feat AS (
  SELECT doc_id, url,
         lower(regexp_extract(url, '^https?://[^/?#]+([^?#]*)', 1)) AS path,
         lower(coalesce(nullif(regexp_extract(url, '\\?([^#]*)', 1), ''), '')) AS query,
         CASE WHEN regexp_replace(regexp_extract(url, '^https?://[^/?#]+([^?#]*)', 1),
                                  '^/+|/+$', '', 'g') = '' THEN 0
              ELSE len(string_split_regex(
                regexp_replace(regexp_extract(url, '^https?://[^/?#]+([^?#]*)', 1),
                               '^/+|/+$', '', 'g'), '/+')) END AS depth
  FROM synth_urls
),
scored AS (
  SELECT doc_id, url, path, query, depth,
    (CASE WHEN regexp_matches(path, {_sql_quote(high)})
           AND NOT regexp_matches(path, {_sql_quote(sub)}) THEN 5 ELSE 0 END)
    + (CASE WHEN regexp_matches(path, {_sql_quote(med)}) THEN 3 ELSE 0 END)
    + least(len(list_filter([{kw_list}],
        k -> contains(path, k) OR contains(query, k))), 3) * 2
    + (CASE WHEN regexp_matches(path, {_sql_quote(exact)})
           AND NOT regexp_matches(path, {_sql_quote(sub)}) THEN 4 ELSE 0 END)
    + len(list_filter([{qp_list}], p -> list_contains(
        list_transform(list_filter(string_split(query, '&'), x -> x <> ''),
                       x -> string_split(x, '=')[1]), p)))
    + (CASE WHEN list_contains([{clean_list}], path) THEN 2 ELSE 0 END)
    + len(list_filter([{nk_list}],
        k -> contains(path, k) OR contains(query, k))) * -3
    + (CASE WHEN depth > 3 THEN -(depth - 3) ELSE 0 END)
    + (CASE WHEN regexp_matches(path, '/\\d+') OR regexp_matches(path, '/[a-f0-9]{{4,}}')
            THEN -2 ELSE 0 END)
    + (CASE WHEN regexp_matches(path, '[%&$#@!]') THEN -1 ELSE 0 END)
    AS score
  FROM feat
)
SELECT doc_id, url, CAST(score AS INT) AS score,
       score >= {K.C2_ACCEPT_THRESHOLD} AS accepted
FROM scored ORDER BY doc_id
"""


@_register("career_detector_score", oracle=_career_detector_oracle())
def q_career_detector_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 — the full detector score ladder with penalties + accept flag."""
    from crawler_ai_spark.functions.detector import career_detector_score_expr

    urls = synth_urls(spark, sf_dir)
    score = career_detector_score_expr(F.col("url"))
    return urls.select(
        "doc_id", "url", score.alias("score"),
        (score >= F.lit(K.C2_ACCEPT_THRESHOLD)).alias("accepted"),
    ).orderBy("doc_id")


# ===========================================================================
# 11. wave 7 — C3 URL career confidence
# ===========================================================================


def _c3_oracle() -> str:
    # the confidence fold must add terms in the reference's exact order
    # (left-assoc double addition) — thresholds sit on FP edges like
    # 0.3+0.3+0.2 = 0.7999999999999999. DuckDB's binder caps expression
    # depth at 128, so the ~290-term chain is staged through CTEs in
    # batches of 60 (same addition order overall).
    terms = []
    for kw in K.C3_EXACT_KEYWORDS:
        terms.append(f"(CASE WHEN contains(path, {_sql_quote(kw)}) THEN 1.0 ELSE 0.0 END)")
    for kw in K.C3_GENERIC_KEYWORDS:
        q = _sql_quote
        terms.append(
            f"(CASE WHEN contains(path, {q('/' + kw)}) OR contains(path, {q(kw + '/')})"
            f" OR contains(path, {q('-' + kw)}) OR contains(path, {q(kw + '-')})"
            f" OR list_contains(segs, {q(kw)}) THEN 0.3 ELSE 0.0 END)"
        )
    for pat in K.C3_CAREER_PATTERNS:
        terms.append(f"(CASE WHEN contains(path, {_sql_quote(pat)}) THEN 1.2 ELSE 0.0 END)")
    for kw in K.C3_DOMAIN_KEYWORDS:
        terms.append(f"(CASE WHEN contains(dom, {_sql_quote(kw)}) THEN 0.05 ELSE 0.0 END)")
    for b in K.C3_JOB_BOARDS:
        terms.append(f"(CASE WHEN contains(dom, {_sql_quote(b)}) THEN 0.5 ELSE 0.0 END)")
    terms.append("(CASE WHEN depth <= 2 THEN 0.2 ELSE 0.0 END)")

    base_cols = "doc_id, url, path, dom, query, segs, depth"
    ctes, prev, acc = [], "feat", "CAST(0.0 AS DOUBLE)"
    for i in range(0, len(terms), 60):
        chunk = " + ".join([acc] + terms[i : i + 60])
        name = f"s{i // 60}"
        ctes.append(f"{name} AS (SELECT {base_cols}, ({chunk}) AS acc FROM {prev})")
        prev, acc = name, "acc"
    pen_terms = [
        f"(CASE WHEN contains(path, {_sql_quote(p)}) THEN {w} ELSE 0.0 END)"
        for p, w in K.C3_PENALTIES
    ]
    strong = " OR ".join(
        f"contains(path, {_sql_quote(p)})" for p, w in K.C3_PENALTIES if w <= -0.5
    )
    ctes.append(
        f"scored AS (SELECT {base_cols}, acc AS conf_pre, "
        f"(acc + {' + '.join(pen_terms)}) AS conf_final, ({strong}) AS strong_pen FROM {prev})"
    )
    chain = ",\n".join(ctes)
    return f"""
WITH {SYNTH_URLS_CTE},
feat AS (
  SELECT doc_id, url,
         lower(regexp_extract(url, '^https?://[^/?#]+([^?#]*)', 1)) AS path,
         lower(regexp_extract(url, '^https?://([^/?#]+)', 1)) AS dom,
         coalesce(nullif(regexp_extract(url, '\\?([^#]*)', 1), ''), '') AS query,
         string_split_regex(regexp_replace(
           regexp_extract(url, '^https?://[^/?#]+([^?#]*)', 1), '^/+|/+$', '', 'g'), '/+') AS segs,
         CASE WHEN regexp_replace(regexp_extract(url, '^https?://[^/?#]+([^?#]*)', 1),
                                  '^/+|/+$', '', 'g') = '' THEN 0
              ELSE len(string_split_regex(regexp_replace(
                regexp_extract(url, '^https?://[^/?#]+([^?#]*)', 1), '^/+|/+$', '', 'g'), '/+')) END AS depth
  FROM synth_urls
),
{chain}
SELECT doc_id, url,
  CASE WHEN lower(url) LIKE '%.xml' OR lower(url) LIKE '%.rss' OR lower(url) LIKE '%.atom' THEN 0.0
       WHEN NOT (url LIKE 'http://%' OR url LIKE 'https://%') THEN 0.0
       WHEN list_contains(['/', '', '/index.html', '/index.php', '/default.html', '/default.php'], path)
            AND query = '' THEN 0.0
       WHEN dom LIKE 'career.%' OR dom LIKE 'careers.%' OR dom LIKE 'jobs.%' THEN 2.0
       WHEN depth > 4 THEN conf_pre
       ELSE conf_final END AS confidence,
  CASE WHEN lower(url) LIKE '%.xml' OR lower(url) LIKE '%.rss' OR lower(url) LIKE '%.atom' THEN FALSE
       WHEN NOT (url LIKE 'http://%' OR url LIKE 'https://%') THEN FALSE
       WHEN list_contains(['/', '', '/index.html', '/index.php', '/default.html', '/default.php'], path)
            AND query = '' THEN FALSE
       WHEN dom LIKE 'career.%' OR dom LIKE 'careers.%' OR dom LIKE 'jobs.%' THEN TRUE
       WHEN depth > 4 THEN FALSE
       ELSE conf_final >= 0.8 END AS is_career_page
FROM scored ORDER BY doc_id
"""


@_register("url_career_confidence", oracle=_c3_oracle())
def q_url_career_confidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 — the URL confidence analyzer (order-faithful float fold; parity
    vs the reference's own coroutine in tests/test_detector_parity.py)."""
    from crawler_ai_spark.functions.confidence import with_career_confidence

    urls = synth_urls(spark, sf_dir)
    return (
        with_career_confidence(urls, F.col("url"))
        .select(
            "doc_id", "url",
            F.col("c.confidence").alias("confidence"),
            F.col("c.is_career_page").alias("is_career_page"),
        )
        .orderBy("doc_id")
    )


# ===========================================================================
# 12. wave 8 — C7 job analyzers
# ===========================================================================


def _analyzers_oracle() -> str:
    from crawler_ai_spark.functions.analyzers import ALL_TECHNOLOGIES

    tech_list = ", ".join(_sql_quote(t) for t in ALL_TECHNOLOGIES)
    level_case = "CASE "
    for level, patterns in K.JOB_LEVEL_PATTERNS:
        rx = "|".join(f"(?:{p})" for p in patterns)
        level_case += f"WHEN regexp_matches(low, {_sql_quote(rx)}) THEN '{level}' "
    level_case += "ELSE 'UNKNOWN' END"
    cat_case = "CASE "
    for category, keywords in K.JOB_CATEGORIES:
        rx = _any_substr_rx(keywords)
        cat_case += f"WHEN regexp_matches(low, {_sql_quote(rx)}) THEN '{category}' "
    cat_case += "ELSE 'OTHER' END"
    return f"""
WITH cards AS (
  SELECT doc_id, {_TITLE_CASE_SQL} AS title,
         substr(text, 1, 120)
         || CASE WHEN doc_id % 2 = 0 THEN ' built with python and react on aws' ELSE '' END
         || CASE WHEN doc_id % 3 = 0 THEN ' docker kubernetes ci/cd' ELSE '' END AS body
  FROM documents
),
feat AS (
  SELECT doc_id, title, lower(title) AS low, lower(body) AS blow FROM cards
)
SELECT doc_id, title,
       {level_case} AS level,
       {cat_case} AS category,
       array_to_string(
         list_sort(list_distinct(list_filter([{tech_list}], t -> contains(blow, t)))),
         '|') AS technologies
FROM feat ORDER BY doc_id
"""


@_register("job_analyzers", oracle=_analyzers_oracle())
def q_job_analyzers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7 — level, category, and technology extraction in one pass
    (parity vs the reference's JobAnalyzer in tests/test_detector_parity)."""
    from crawler_ai_spark.functions.analyzers import (
        job_category_expr,
        job_level_expr,
        technologies_expr,
    )

    docs = _t(spark, sf_dir, "documents")
    body = F.expr(
        "substr(text, 1, 120)"
        " || CASE WHEN doc_id % 2 = 0 THEN ' built with python and react on aws' ELSE '' END"
        " || CASE WHEN doc_id % 3 = 0 THEN ' docker kubernetes ci/cd' ELSE '' END"
    )
    cards = docs.select(
        "doc_id", F.expr(_TITLE_CASE_SQL).alias("title"), body.alias("body")
    )
    # The underlying expr keeps its ARRAY type (the crawl loop consumes it);
    # the catalog projection serializes to '|'-joined text so the driver's
    # hash canonicalizer (which cannot sort list cells) can compare rows.
    return cards.select(
        "doc_id", "title",
        job_level_expr(F.col("title")).alias("level"),
        job_category_expr(F.col("title")).alias("category"),
        F.concat_ws("|", F.array_sort(technologies_expr(F.col("body")))).alias(
            "technologies"
        ),
    ).orderBy("doc_id")


# ===========================================================================
# 13. wave 9 — F7 rule-based job validation
# ===========================================================================


def _job_validation_oracle() -> str:
    urlrx = _any_substr_rx(K.F7_NON_JOB_URL_PATTERNS)
    crit = _any_substr_rx(K.F7_CRITICAL_REJECT)
    pos_list = ", ".join(_sql_quote(p) for p in K.F7_POSITIVE_INDICATORS)
    tkw = _any_substr_rx(K.F7_JOB_TITLE_KEYWORDS)
    bword = _any_substr_rx(K.F7_BORDERLINE_TITLE_WORDS)
    return f"""
WITH cards AS (
  SELECT doc_id, {_TITLE_CASE_SQL} AS title,
         CASE WHEN doc_id % 6 = 0 THEN 'Responsibilities: build. Requirements: experience. salary and benefits.'
              WHEN doc_id % 6 = 1 THEN 'short'
              WHEN doc_id % 6 = 2 THEN 'about us and our core values page with company overview inside'
              WHEN doc_id % 6 = 3 THEN substr(text, 1, 80)
              WHEN doc_id % 6 = 4 THEN 'apply with resume today for this opening with experience'
              ELSE '' END AS description,
         CASE WHEN doc_id % 5 = 0 THEN 'https://x' || doc_id || '.com/news/item'
              ELSE 'https://x' || doc_id || '.com/jobs/' || doc_id END AS url
  FROM documents
),
feat AS (
  SELECT doc_id, title, description, url,
         trim(title) AS t, trim(description) AS d, lower(url) AS u,
         lower(trim(title) || ' ' || trim(description)) AS content,
         lower(trim(title)) AS tl
  FROM cards
),
scored AS (
  SELECT doc_id, title, description, url, t, d, u, content, tl,
         len(list_filter([{pos_list}], p -> contains(content, p))) AS pc,
         (length(t) > 5 AND regexp_matches(tl, {_sql_quote(tkw)})) AS titleish,
         (length(t) > 5 AND regexp_matches(tl, {_sql_quote(bword)})) AS borderline
  FROM feat
)
SELECT doc_id, url,
  CASE WHEN regexp_matches(u, {_sql_quote(urlrx)}) THEN FALSE
       WHEN t = '' AND d = '' THEN FALSE
       WHEN d = '' OR length(d) < {K.F7_MIN_DESCRIPTION_LEN} THEN FALSE
       WHEN regexp_matches(content, {_sql_quote(crit)}) THEN FALSE
       WHEN pc = 0 AND titleish THEN TRUE
       WHEN pc >= 3 THEN TRUE
       WHEN pc >= 1 AND (borderline OR titleish) THEN TRUE
       ELSE FALSE END AS is_valid_job
FROM scored ORDER BY doc_id
"""


@_register("job_validation", oracle=_job_validation_oracle())
def q_job_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 — the rule-based job-validation cascade (parity vs the
    reference's coroutine in tests/test_detector_parity)."""
    from crawler_ai_spark.functions.validation import validate_job_expr

    docs = _t(spark, sf_dir, "documents")
    desc = (
        F.when(F.col("doc_id") % 6 == 0,
               F.lit("Responsibilities: build. Requirements: experience. salary and benefits."))
        .when(F.col("doc_id") % 6 == 1, F.lit("short"))
        .when(F.col("doc_id") % 6 == 2,
              F.lit("about us and our core values page with company overview inside"))
        .when(F.col("doc_id") % 6 == 3, F.substring("text", 1, 80))
        .when(F.col("doc_id") % 6 == 4,
              F.lit("apply with resume today for this opening with experience"))
        .otherwise(F.lit(""))
    )
    url = F.when(
        F.col("doc_id") % 5 == 0,
        F.expr("'https://x' || CAST(doc_id AS STRING) || '.com/news/item'"),
    ).otherwise(
        F.expr("'https://x' || CAST(doc_id AS STRING) || '.com/jobs/' || CAST(doc_id AS STRING)")
    )
    cards = docs.select(
        "doc_id", F.expr(_TITLE_CASE_SQL).alias("title"), desc.alias("description"),
        url.alias("url"),
    )
    return cards.select(
        "doc_id", "url",
        validate_job_expr(F.col("title"), F.col("description"), F.col("url")).alias(
            "is_valid_job"
        ),
    ).orderBy("doc_id")


# ===========================================================================
# 14. wave 10 — F8 user-facing job filters
# ===========================================================================


def _job_filters_oracle() -> str:
    from crawler_ai_spark.functions.jobfilters import JOB_TYPE_MAPPINGS, LOCATION_PATTERNS

    def type_hit(ftype):
        kws = (ftype,) + JOB_TYPE_MAPPINGS[ftype]
        rx = _any_substr_rx(kws)
        return (
            f"(regexp_matches(lower(coalesce(job_type, '')), {_sql_quote(rx)})"
            f" OR regexp_matches(lower(coalesce(title, '')), {_sql_quote(rx)})"
            f" OR regexp_matches(lower(coalesce(description, '')), {_sql_quote(rx)}))"
        )

    loc_rx = _any_substr_rx(("hanoi",) + LOCATION_PATTERNS["hanoi"]
                            + ("ho_chi_minh",) + LOCATION_PATTERNS["ho_chi_minh"])
    return f"""
WITH jobs AS (
  SELECT doc_id, {_TITLE_CASE_SQL} AS title,
         CASE WHEN doc_id % 4 = 0 THEN 'work from home role with benefits'
              WHEN doc_id % 4 = 1 THEN 'hợp đồng 6 tháng tại văn phòng'
              ELSE substr(text, 1, 60) END AS description,
         CASE WHEN doc_id % 3 = 0 THEN 'Full-time'
              WHEN doc_id % 3 = 1 THEN 'Internship' END AS job_type,
         CASE WHEN doc_id % 5 = 0 THEN 'Hà Nội' WHEN doc_id % 5 = 1 THEN 'TP.HCM'
              WHEN doc_id % 5 = 2 THEN 'Đà Nẵng' END AS location,
         CASE WHEN doc_id % 6 = 0 THEN CAST(500 + doc_id AS VARCHAR) || ' USD'
              WHEN doc_id % 6 = 1 THEN 'thỏa thuận' END AS salary
  FROM documents
)
SELECT doc_id, title,
  ({type_hit('full-time')} OR {type_hit('remote')}) AS matches_type,
  regexp_matches(lower(coalesce(location, '')), {_sql_quote(loc_rx)}) AS matches_location,
  (coalesce(salary, '') = ''
   OR regexp_extract(replace(salary, ',', ''), '(\\d+)', 1) = ''
   OR (TRY_CAST(regexp_extract(replace(salary, ',', ''), '(\\d+)', 1) AS BIGINT)
       BETWEEN 600 AND 100000)) AS matches_salary
FROM jobs ORDER BY doc_id
""".replace("{_sql", "{_sql")


@_register("job_filters", oracle=_job_filters_oracle())
def q_job_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 — type/location/salary filter predicates as columns (parity vs
    the reference's _apply_job_filters in tests/test_detector_parity)."""
    from crawler_ai_spark.functions import jobfilters as JF

    docs = _t(spark, sf_dir, "documents")
    desc = (
        F.when(F.col("doc_id") % 4 == 0, F.lit("work from home role with benefits"))
        .when(F.col("doc_id") % 4 == 1, F.lit("hợp đồng 6 tháng tại văn phòng"))
        .otherwise(F.substring("text", 1, 60))
    )
    jt = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("Full-time"))
        .when(F.col("doc_id") % 3 == 1, F.lit("Internship"))
    )
    loc = (
        F.when(F.col("doc_id") % 5 == 0, F.lit("Hà Nội"))
        .when(F.col("doc_id") % 5 == 1, F.lit("TP.HCM"))
        .when(F.col("doc_id") % 5 == 2, F.lit("Đà Nẵng"))
    )
    sal = (
        F.when(F.col("doc_id") % 6 == 0,
               F.expr("CAST(500 + doc_id AS STRING) || ' USD'"))
        .when(F.col("doc_id") % 6 == 1, F.lit("thỏa thuận"))
    )
    jobs = docs.select(
        "doc_id", F.expr(_TITLE_CASE_SQL).alias("title"), desc.alias("description"),
        jt.alias("job_type"), loc.alias("location"), sal.alias("salary"),
    )
    return jobs.select(
        "doc_id", "title",
        JF.matches_job_type_expr(
            F.col("job_type"), F.col("title"), F.col("description"), ["full-time", "remote"]
        ).alias("matches_type"),
        JF.matches_location_expr(F.col("location"), ["hanoi", "ho_chi_minh"]).alias(
            "matches_location"
        ),
        JF.matches_salary_expr(F.col("salary"), 600, 100000).alias("matches_salary"),
    ).orderBy("doc_id")


@_register(
    "robots_parse",
    # RFC 9309 multi-agent headers: split on user-agent:, then group
    # fragments into header blocks — a fragment with no content after its
    # first line (header_only) shares the rule block of the next fragment;
    # block_id = count of rule-carrying fragments strictly before it. A
    # block contributes iff any of its fragments' first line is '*'.
    oracle=f"""
WITH {SYNTH_URLS_CTE},
bodies AS (
  SELECT DISTINCT host,
    CASE WHEN regexp_extract(host, 'site([0-9]+)', 1)::INT % 4 = 0
         THEN 'User-agent: *' || chr(10) || 'Disallow: /login' || chr(10)
              || 'Disallow: /news/' || chr(10) || 'User-agent: Googlebot'
              || chr(10) || 'Disallow: /all'
         WHEN regexp_extract(host, 'site([0-9]+)', 1)::INT % 4 = 1
         THEN 'User-agent: Bingbot' || chr(10) || 'User-agent: *' || chr(10)
              || 'Disallow: /x' || chr(10) || 'User-agent: Yandex'
              || chr(10) || 'Disallow: /y'
         WHEN regexp_extract(host, 'site([0-9]+)', 1)::INT % 4 = 2
         THEN 'user-agent: *' || chr(10) || 'user-agent: googlebot'
              || chr(10) || 'disallow: /shared' || chr(10) || 'disallow:'
         ELSE '' END AS body
  FROM synth_urls
),
frags AS (
  SELECT host,
         unnest(string_split_regex(body, '(?i)user-agent:')) AS frag,
         generate_subscripts(string_split_regex(body, '(?i)user-agent:'), 1) AS ord
  FROM bodies
),
marked AS (
  SELECT host, frag, ord,
         regexp_matches(frag, '^[^\\S\\n]*\\*') AS is_star,
         NOT regexp_matches(frag, '\\n\\s*\\S') AS header_only
  FROM frags WHERE ord > 1
),
blocks AS (
  SELECT host, frag, is_star,
         coalesce(sum(CASE WHEN header_only THEN 0 ELSE 1 END)
             OVER (PARTITION BY host ORDER BY ord
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS block_id
  FROM marked
),
star_blocks AS (
  SELECT host, block_id FROM blocks GROUP BY host, block_id HAVING bool_or(is_star)
),
prefixes AS (
  SELECT b.host, p
  FROM blocks b
  JOIN star_blocks s ON b.host = s.host AND b.block_id = s.block_id,
       unnest(regexp_extract_all(b.frag,
         '(?im)^[^\\S\\n]*disallow:[^\\S\\n]*(\\S*)[^\\S\\n]*$', 1)) AS t(p)
  WHERE p <> ''
)
SELECT bodies.host,
       coalesce(array_to_string(
         coalesce(list_sort(list_distinct(list(p) FILTER (WHERE p IS NOT NULL))),
                  []),
         '|'), '') AS disallow_prefixes
FROM bodies LEFT JOIN prefixes ON bodies.host = prefixes.host
GROUP BY bodies.host ORDER BY bodies.host
""",
)
def q_robots_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 — robots.txt body parsing into the gate's rules shape, incl.
    RFC 9309 multi-agent group headers (star-after-agent and
    star-before-agent shared headers both exercised)."""
    from crawler_ai_spark.sources.robots import parse_robots

    urls = synth_urls(spark, sf_dir)
    n = F.regexp_extract("host", r"site(\d+)", 1).cast("int")
    body = (
        F.when(n % 4 == 0,
               F.lit("User-agent: *\nDisallow: /login\nDisallow: /news/\n"
                     "User-agent: Googlebot\nDisallow: /all"))
        .when(n % 4 == 1,
              F.lit("User-agent: Bingbot\nUser-agent: *\nDisallow: /x\n"
                    "User-agent: Yandex\nDisallow: /y"))
        .when(n % 4 == 2,
              F.lit("user-agent: *\nuser-agent: googlebot\n"
                    "disallow: /shared\ndisallow:"))
        .otherwise(F.lit(""))
    )
    robots = urls.select("host").distinct().withColumn("body", body)
    # parse_robots keeps the ARRAY shape for the frontier gate; the catalog
    # projection joins to '|'-separated text so the external driver's hash
    # canonicalizer (pandas sort over cells) can handle the column.
    return (
        parse_robots(robots)
        .select(
            "host",
            F.array_join(F.array_sort("disallow_prefixes"), "|").alias(
                "disallow_prefixes"
            ),
        )
        .orderBy("host")
    )


@_register(
    "contacts_table",
    oracle="""
WITH aug AS (
  SELECT doc_id,
    text || ' lien he: hr' || (doc_id % 9) || '@corp' || (doc_id % 5) || '.vn'
         || ' hotline 0' || (90 + doc_id % 10) || lpad(CAST(doc_id % 1000000000 AS VARCHAR), 9, '0')
         || CASE WHEN doc_id % 2 = 0
                 THEN ' fb https://facebook.com/corp' || (doc_id % 9) ELSE '' END AS text
  FROM documents
),
emails AS (
  SELECT doc_id, 'email' AS kind, lower(e) AS value
  FROM aug, unnest(regexp_extract_all(text,
    '\\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}\\b')) AS t(e)
),
phones AS (
  SELECT doc_id, 'phone' AS kind, p AS value
  FROM aug, unnest(regexp_extract_all(text, '0\\d{1,2}\\s?\\d{3}\\s?\\d{3}\\s?\\d{3}')) AS t(p)
),
socials AS (
  SELECT doc_id, 'social' AS kind, s AS value
  FROM aug, unnest(regexp_extract_all(text, 'facebook\\.com/[^/\\s]+')) AS t(s)
),
merged AS (
  SELECT DISTINCT * FROM emails
  UNION SELECT DISTINCT * FROM phones
  UNION SELECT DISTINCT * FROM socials
)
SELECT doc_id, kind, value,
       row_number() OVER (PARTITION BY doc_id, kind
                          ORDER BY length(value), value) AS rank
FROM merged ORDER BY doc_id, kind, rank
""",
)
def q_contacts_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§1.5 contacts table — P4/P5/P6 extractions exploded into
    (doc_id, kind, value) with per-kind dedup (D7) and the reference's
    sort-by-length phone ordering generalized as a rank (O7,
    contact_extractor_service.py:388)."""
    docs = _t(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.expr(
            "text || ' lien he: hr' || CAST(doc_id % 9 AS STRING) || '@corp' ||"
            " CAST(doc_id % 5 AS STRING) || '.vn' || ' hotline 0' ||"
            " CAST(90 + doc_id % 10 AS STRING) || lpad(CAST(doc_id % 1000000000 AS STRING), 9, '0')"
            " || CASE WHEN doc_id % 2 = 0 THEN ' fb https://facebook.com/corp' ||"
            " CAST(doc_id % 9 AS STRING) ELSE '' END"
        ).alias("text"),
    )
    email_rx = r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b"
    phone_rx = r"0\d{1,2}\s?\d{3}\s?\d{3}\s?\d{3}"
    social_rx = r"facebook\.com/[^/\s]+"
    parts = [
        aug.select(
            "doc_id", F.lit("email").alias("kind"),
            F.explode(F.regexp_extract_all("text", F.lit(email_rx), F.lit(0))).alias("raw"),
        ).select("doc_id", "kind", F.lower("raw").alias("value")),
        aug.select(
            "doc_id", F.lit("phone").alias("kind"),
            F.explode(F.regexp_extract_all("text", F.lit(phone_rx), F.lit(0))).alias("value"),
        ),
        aug.select(
            "doc_id", F.lit("social").alias("kind"),
            F.explode(F.regexp_extract_all("text", F.lit(social_rx), F.lit(0))).alias("value"),
        ),
    ]
    merged = parts[0].unionByName(parts[1]).unionByName(parts[2]).distinct()
    w = Window.partitionBy("doc_id", "kind").orderBy(F.length("value"), "value")
    return (
        merged.withColumn("rank", F.row_number().over(w))
        .orderBy("doc_id", "kind", "rank")
    )


# ===========================================================================
# 9. wave 5 — embedded job-card extraction (P9b), subdomain search, errors
# ===========================================================================


def _card_aug_spark(docs: DataFrame) -> DataFrame:
    """documents.text + deterministic card blob (doc_id % 5)."""
    from crawler_ai_spark.functions import jobcards as JC

    blob = F.lit(JC.CARD_FIXTURE_BLOBS[0])
    for i in range(1, len(JC.CARD_FIXTURE_BLOBS)):
        blob = F.when(F.col("doc_id") % 5 == i, F.lit(JC.CARD_FIXTURE_BLOBS[i])).otherwise(blob)
    return docs.select("doc_id", F.concat(F.col("text"), F.lit("\n"), blob).alias("text"))


def _contains_any_sql(expr: str, words) -> str:
    return "(" + " OR ".join(f"contains({expr}, {_sql_quote(w)})" for w in words) + ")"


def _job_cards_oracle() -> str:
    """DuckDB twin of extract_job_cards. The one lookahead pattern is
    emulated RE2-safe: `X(\\s+Intern)?` + keep-iff-lower(match)==X, which
    keeps exactly the occurrences the lookahead accepts."""
    from crawler_ai_spark.functions import jobcards as JC

    pats = []
    for i, p in enumerate(JC.CARD_PATTERNS):
        if i == JC._LOOKAHEAD_IDX:
            pats.append(
                f"list_filter(regexp_extract_all(text, {_sql_quote('(?si)' + JC._LOOKAHEAD_RE2)}, 0), "
                f"m -> lower(m) = {_sql_quote(JC._LOOKAHEAD_KEEP)})"
            )
        else:
            pats.append(f"regexp_extract_all(text, {_sql_quote('(?si)' + p)}, 0)")
    matches = "flatten([" + ", ".join(pats) + "])"

    blob_case = (
        "CASE doc_id % 5 "
        + " ".join(
            f"WHEN {i} THEN {_sql_quote(b)}" for i, b in enumerate(JC.CARD_FIXTURE_BLOBS)
        )
        + " END"
    )
    lines = "list_transform(string_split(job_text, chr(10)), l -> trim(l))"
    kw = _contains_any_sql("lower(l)", JC.TITLE_KEYWORDS)
    sized = "length(l) > 5 AND length(l) < 100"
    shape = _sql_quote(JC.TITLE_SHAPE_RX)

    loc_cands = []
    for p in JC.LOCATION_PATTERNS:
        raw = f"trim(regexp_extract(job_text, {_sql_quote('(?i)' + p)}, 1))"
        cl = f"trim(regexp_replace({raw}, {_sql_quote('(?i)' + JC.LOCATION_CLEAN_RX)}, ''))"
        loc_cands.append(f"CASE WHEN length({cl}) > 0 AND length({cl}) < 100 THEN {cl} END")
    loc = (
        "CASE WHEN contains(raw_title, 'Singapore Only') THEN 'Singapore Only' "
        "WHEN contains(raw_title, 'Fully Remote') THEN 'Fully Remote' "
        "WHEN contains(raw_title, 'Remote') THEN 'Remote' "
        "ELSE coalesce(" + ", ".join(loc_cands) + ", '') END"
    )
    sal_cands = []
    for p in JC.SALARY_PATTERNS:
        raw = f"trim(regexp_extract(job_text, {_sql_quote('(?i)' + p)}, 1))"
        sal_cands.append(f"CASE WHEN length({raw}) > 0 AND length({raw}) < 100 THEN {raw} END")
    sal = "coalesce(" + ", ".join(sal_cands) + ", '')"
    jt = (
        "CASE WHEN "
        + _contains_any_sql("lower(job_text)", ["fulltime", "full-time", "toàn thời gian"])
        + " THEN 'Full-time' WHEN "
        + _contains_any_sql("lower(job_text)", ["part-time", "parttime", "bán thời gian"])
        + " THEN 'Part-time' WHEN "
        + _contains_any_sql("lower(job_text)", ["contract", "hợp đồng"])
        + " THEN 'Contract' WHEN "
        + _contains_any_sql("lower(job_text)", ["intern", "thực tập"])
        + " THEN 'Internship' ELSE 'Full-time' END"
    )
    desc = (
        "trim(array_to_string(list_filter(" + lines + ", "
        "l -> l <> '' AND NOT " + _contains_any_sql("lower(l)", JC.DESCRIPTION_SKIP_WORDS)
        + "), chr(10)))"
    )
    return f"""
WITH aug AS (
  SELECT doc_id, text || chr(10) || {blob_case} AS text FROM documents
),
m AS (
  SELECT doc_id,
         unnest({matches}) AS job_text,
         generate_subscripts({matches}, 1) AS pos
  FROM aug
),
tl AS (
  SELECT doc_id, pos, job_text,
         coalesce(
           (list_filter({lines}, l -> {sized} AND ({kw} OR regexp_matches(l, {shape}))))[1],
           (list_filter({lines}, l -> {sized}))[1],
           '') AS raw_title
  FROM m
),
ct AS (
  SELECT doc_id, pos, job_text, raw_title,
         trim(regexp_replace(trim(regexp_replace(trim(regexp_replace(raw_title,
           '(Singapore Only|Fully Remote|See Details|See)$', '')),
           '^com\\s*', '')), '\\s+', ' ', 'g')) AS title
  FROM tl WHERE raw_title <> ''
),
d AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id, title ORDER BY pos) AS rn FROM ct
),
k AS (
  SELECT doc_id, pos, job_text, raw_title, title,
         row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS job_index
  FROM d WHERE rn = 1
)
SELECT doc_id, job_index, title,
       {loc} AS location,
       {jt} AS job_type,
       {sal} AS salary,
       {desc} AS description
FROM k ORDER BY doc_id, job_index
"""


@_register("job_cards_extract", oracle=_job_cards_oracle())
def q_job_cards_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9b — embedded job-card extraction (_extract_jobs_by_patterns +
    _parse_job_text, job_extraction_service.py:2192-2290): 26 ordered
    patterns, line-based title extraction, clean-title first-wins dedup,
    location/type/salary/description fields. Reference-exec parity in
    tests/test_jobcards_parity.py."""
    from crawler_ai_spark.functions import jobcards as JC

    docs = _t(spark, sf_dir, "documents")
    return JC.extract_job_cards(_card_aug_spark(docs)).orderBy("doc_id", "job_index")


@_register("job_cards_dedup")  # rows-only: the greedy kept-set scan (a job
# is dropped iff similar to a previously KEPT one) is non-transitive and
# inherently sequential per page — not SQL-expressible; parity vs the
# reference's _deduplicate_jobs_by_title is pinned in pytest instead.
def q_job_cards_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9b+D4 — full _extract_jobs_from_cards: pattern extraction followed
    by the greedy title-similarity dedup (job_extraction_service.py:
    2116-2161), as a per-page JVM aggregate fold."""
    from crawler_ai_spark.functions import jobcards as JC

    docs = _t(spark, sf_dir, "documents")
    cards = JC.extract_job_cards(_card_aug_spark(docs))
    return JC.dedup_job_cards(cards).orderBy("doc_id", "job_index")


# P16 — anchor→container extraction fixtures: four deterministic page
# shapes keyed on doc_id % 4, parameterized by n = doc_id % 37. The filler
# paragraph keeps body/html text ≥2000 chars so the container walk can
# never terminate at a page-level element, and contains no indicator or
# validation word (the reference's 2000-char cap, container_extractor.py:74).
_CONTAINER_FILLER = ("pangram quartz vex nymph " * 90).strip()

_CONTAINER_TEMPLATES = [
    t.replace("{FILLER}", _CONTAINER_FILLER)
    for t in [
        # v0: two valid cards, h3 titles, absolute links, decoy anchor
        """<html><body>
<p>{FILLER}</p>
<p>Join us today</p>
<div class="card">
<h3>Senior Developer {N}</h3>
<p>Apply now</p>
<p>Location: Hanoi {N}</p>
<p>Salary: $1{N}00</p>
<p>Full-time</p>
<a href="https://site{N}.vn/jobs/1">View details</a>
</div>
<div class="card">
<h3>Data Analyst {N}</h3>
<p>Apply now</p>
<p>Location: Saigon {N}</p>
<p>Salary: $2{N}00</p>
<p>Part-time</p>
<a href="https://site{N}.vn/jobs/2">View details</a>
</div>
</body></html>""",
        # v1: class-title card, invalid (keyword-less) strong card leaving a
        # job_index gap, plain-line-title card with no link
        """<html><body>
<p>{FILLER}</p>
<div class="card">
<div class="job-title">QA Tester {N}</div>
<p>Apply now</p>
<p>Salary: $3{N}</p>
<a href="https://site{N}.vn/jobs/3">View details</a>
</div>
<div class="card">
<strong>Office Barista {N}</strong>
<p>Apply now</p>
<p>Location: Hue {N}</p>
<p>Contract</p>
</div>
<div class="card">
Junior Designer {N}
<p>Apply now</p>
<p>Location: Remote {N}</p>
<p>Salary: negotiable {N}</p>
</div>
</body></html>""",
        # v2: nested wrapper (container is the inner div), h2 title,
        # relative link falls back to the page url, no salary
        """<html><body>
<p>{FILLER}</p>
<div class="outer">
<div class="card">
<h2>Marketing Manager {N}</h2>
<p>Apply now</p>
<p>Work location: Danang {N}</p>
<a href="/jobs/relative{N}">View details</a>
</div>
</div>
</body></html>""",
        # v3: no job containers at all
        """<html><body>
<p>{FILLER}</p>
<p>Join us today</p>
</body></html>""",
    ]
]


def _container_pages_spark(docs: DataFrame) -> DataFrame:
    n = (F.col("doc_id") % 37).cast("string")
    tpl = F.lit(_CONTAINER_TEMPLATES[0])
    for i in range(1, 4):
        tpl = F.when(F.col("doc_id") % 4 == i, F.lit(_CONTAINER_TEMPLATES[i])).otherwise(tpl)
    return docs.select(
        "doc_id",
        F.replace(tpl, F.lit("{N}"), n).alias("html"),
        F.concat(F.lit("https://www.site"), n, F.lit(".vn/careers")).alias("page_url"),
    )


def _container_oracle() -> str:
    """Hand-derived expected output per page shape (NOT produced by
    running the extractor): each row below is what the reference
    algorithm yields on the corresponding template, worked out from
    container_extractor.py by hand — so the gate discriminates the whole
    DOM pipeline (anchor sweep, walk-up, structural dedup, title
    fallback ladder, field regexes, validity gate, index gaps)."""
    return """
WITH d AS (
  SELECT doc_id, CAST(doc_id % 37 AS VARCHAR) AS n, doc_id % 4 AS v FROM documents
),
expected AS (
  SELECT doc_id, 1 AS job_index,
         'Senior Developer ' || n AS title,
         'Site' || n AS company,
         'Hanoi ' || n AS location,
         'Full-time' AS job_type,
         '$1' || n || '00' AS salary,
         'https://site' || n || '.vn/jobs/1' AS job_link,
         'Senior Developer ' || n || chr(10) || 'Apply now' || chr(10) ||
         'Location: Hanoi ' || n || chr(10) || 'Salary: $1' || n || '00' || chr(10) ||
         'Full-time' || chr(10) || 'View details' AS description
  FROM d WHERE v = 0
  UNION ALL
  SELECT doc_id, 2, 'Data Analyst ' || n, 'Site' || n, 'Saigon ' || n,
         'Part-time', '$2' || n || '00', 'https://site' || n || '.vn/jobs/2',
         'Data Analyst ' || n || chr(10) || 'Apply now' || chr(10) ||
         'Location: Saigon ' || n || chr(10) || 'Salary: $2' || n || '00' || chr(10) ||
         'Part-time' || chr(10) || 'View details'
  FROM d WHERE v = 0
  UNION ALL
  SELECT doc_id, 1, 'QA Tester ' || n, 'Site' || n, '',
         'Full-time', '$3' || n, 'https://site' || n || '.vn/jobs/3',
         'QA Tester ' || n || chr(10) || 'Apply now' || chr(10) ||
         'Salary: $3' || n || chr(10) || 'View details'
  FROM d WHERE v = 1
  UNION ALL
  SELECT doc_id, 3, 'Junior Designer ' || n, 'Site' || n, 'Remote ' || n,
         'Full-time', 'negotiable ' || n, 'https://www.site' || n || '.vn/careers',
         'Junior Designer ' || n || chr(10) || 'Apply now' || chr(10) ||
         'Location: Remote ' || n || chr(10) || 'Salary: negotiable ' || n
  FROM d WHERE v = 1
  UNION ALL
  SELECT doc_id, 1, 'Marketing Manager ' || n, 'Site' || n, 'Danang ' || n,
         'Full-time', '', 'https://www.site' || n || '.vn/careers',
         'Marketing Manager ' || n || chr(10) || 'Apply now' || chr(10) ||
         'Work location: Danang ' || n || chr(10) || 'View details'
  FROM d WHERE v = 2
)
SELECT doc_id, job_index, title, company, location, job_type, salary,
       job_link, description
FROM expected ORDER BY doc_id, job_index
"""


def _container_jobs_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Container-extracted jobs over the synthesized pages — shared by
    the extraction query and the agent-summary aggregate (one place owns
    the UDF schema/field list)."""
    from crawler_ai_spark.functions import domlite as DL

    docs = _t(spark, sf_dir, "documents")
    pages = _container_pages_spark(docs)
    # DOM parse+walk is CPU-bound (~2 ms/page) — see session.spread_to_cores
    from crawler_ai_spark.session import spread_to_cores

    pages = spread_to_cores(pages, "doc_id")
    return pages.select(
        "doc_id",
        F.explode(DL.container_jobs_udf(10)(F.col("html"), F.col("page_url"))).alias("j"),
    ).select(
        "doc_id",
        F.col("j.job_index").alias("job_index"),
        F.col("j.title").alias("title"),
        F.col("j.company").alias("company"),
        F.col("j.location").alias("location"),
        F.col("j.job_type").alias("job_type"),
        F.col("j.salary").alias("salary"),
        F.col("j.job_link").alias("job_link"),
        F.col("j.description").alias("description"),
    )


@_register("container_jobs_extract", oracle=_container_oracle())
def q_container_jobs_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P16 — anchor→container job extraction (the reference's third
    embedded-job strategy, container_extractor.py:36-226): indicator
    text sweep → parent anchors → ≤6-level container walk-up (≥2 field
    indicators, <2000 chars) → structural dedup → per-card
    title/type/location/salary/link extraction → validity gate.
    DOM algorithm in functions/domlite.py (Arrow pandas UDF over a
    stdlib-html.parser mini-DOM); reference-exec parity in
    tests/test_container_parity.py runs the REAL reference methods
    against the same DOM."""
    return _container_jobs_df(spark, sf_dir).orderBy("doc_id", "job_index")


# S10 — /validate_job_details (routes.py:401-440 + schemas.py:207-228):
# the n8n-integration validation endpoint. The rules are the Pydantic
# validators (job_link non-empty + http(s) scheme; job_description ≥10
# chars after strip); the route maps the first failing field to a fixed
# message, job_link taking precedence (routes.py:431-434).

_VALIDATE_LINK_MSG = "Job link must be a valid URL"
_VALIDATE_DESC_MSG = "Job description must be at least 10 characters"


def _job_details_input_spark(docs: DataFrame) -> DataFrame:
    n = (F.col("doc_id") % 37).cast("string")
    link = (
        F.when(F.col("doc_id") % 4 == 0, F.concat(F.lit("https://co"), n, F.lit(".example/j")))
        .when(F.col("doc_id") % 4 == 1, F.concat(F.lit("http://co"), n, F.lit(".example/j")))
        .when(F.col("doc_id") % 4 == 2, F.lit(""))
        .otherwise(F.concat(F.lit("notaurl"), n))
    )
    desc = (
        F.when(F.col("doc_id") % 3 == 0, F.concat(F.lit("A sufficiently long description "), n))
        .when(F.col("doc_id") % 3 == 1, F.lit("short"))
        .otherwise(F.lit("         "))
    )
    return docs.select(
        "doc_id",
        F.concat(F.lit("Job "), F.col("doc_id").cast("string")).alias("job_name"),
        link.alias("job_link"),
        desc.alias("job_description"),
    )


@_register(
    "job_details_validate",
    oracle="""
WITH inp AS (
  SELECT doc_id,
         'Job ' || CAST(doc_id AS VARCHAR) AS job_name,
         CASE doc_id % 4
           WHEN 0 THEN 'https://co' || CAST(doc_id % 37 AS VARCHAR) || '.example/j'
           WHEN 1 THEN 'http://co' || CAST(doc_id % 37 AS VARCHAR) || '.example/j'
           WHEN 2 THEN ''
           ELSE 'notaurl' || CAST(doc_id % 37 AS VARCHAR) END AS job_link,
         CASE doc_id % 3
           WHEN 0 THEN 'A sufficiently long description ' || CAST(doc_id % 37 AS VARCHAR)
           WHEN 1 THEN 'short'
           ELSE '         ' END AS job_description
  FROM documents
),
checked AS (
  SELECT doc_id, job_name,
         (starts_with(job_link, 'http://') OR starts_with(job_link, 'https://')) AS link_ok,
         length(trim(job_description)) >= 10 AS desc_ok
  FROM inp
)
SELECT doc_id, job_name, (link_ok AND desc_ok) AS valid,
       CASE WHEN NOT link_ok THEN 'job_link'
            WHEN NOT desc_ok THEN 'job_description' END AS error_field,
       CASE WHEN NOT link_ok THEN 'Job link must be a valid URL'
            WHEN NOT desc_ok THEN 'Job description must be at least 10 characters'
            END AS error_message
FROM checked ORDER BY doc_id
""",
)
def q_job_details_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10 — /validate_job_details as a predicate query: Pydantic's
    validators (schemas.py:216-228) as column expressions, the route's
    field-precedence error mapping (routes.py:431-434) as a when-chain.
    Reference-exec parity (real Pydantic model) in
    tests/test_endpoint_parity.py."""
    docs = _t(spark, sf_dir, "documents")
    inp = _job_details_input_spark(docs)
    link_ok = F.col("job_link").startswith("http://") | F.col("job_link").startswith(
        "https://"
    )
    desc_ok = F.length(F.trim(F.col("job_description"))) >= 10
    return (
        inp.withColumn("valid", link_ok & desc_ok)
        .withColumn(
            "error_field",
            F.when(~link_ok, F.lit("job_link"))
            .when(~desc_ok, F.lit("job_description")),
        )
        .withColumn(
            "error_message",
            F.when(~link_ok, F.lit(_VALIDATE_LINK_MSG))
            .when(~desc_ok, F.lit(_VALIDATE_DESC_MSG)),
        )
        .select("doc_id", "job_name", "valid", "error_field", "error_message")
        .orderBy("doc_id")
    )


def _agent_summary_oracle() -> str:
    """Composes the container-extraction oracle (second-wave precedent:
    endpoint oracles reuse component ORACLES as subqueries — the inner
    ORDER BY is ignored)."""
    return """
WITH jobs AS (
  SELECT t.*, (doc_id * 7 + job_index) % 101 AS qs
  FROM (""" + _container_oracle() + """) t
),
types AS (
  SELECT job_type, CAST(count(*) AS DOUBLE) AS n FROM jobs
  WHERE job_type <> '' GROUP BY job_type
),
comp AS (
  SELECT company, row_number() OVER (ORDER BY company) AS rk
  FROM (SELECT DISTINCT company FROM jobs)
),
loc AS (
  SELECT location, row_number() OVER (ORDER BY location) AS rk
  FROM (SELECT DISTINCT location FROM jobs)
)
SELECT * FROM (
  SELECT 'total_jobs' AS metric, '' AS key, CAST(count(*) AS DOUBLE) AS value FROM jobs
  UNION ALL
  SELECT 'companies', '', CAST(count(DISTINCT company) AS DOUBLE) FROM jobs
  UNION ALL
  -- engine-portable mean: exact integer sum, ONE division, then round
  -- (a float avg() accumulates in partition order — the documented
  -- Spark<->DuckDB parity trap)
  SELECT 'avg_quality', '', round(CAST(sum(qs) AS DOUBLE) / (count(*) * 100.0), 6) FROM jobs
  UNION ALL
  SELECT 'top_company', company, CAST(rk AS DOUBLE) FROM comp WHERE rk <= 5
  UNION ALL
  SELECT 'top_location', location, CAST(rk AS DOUBLE) FROM loc WHERE rk <= 5
  UNION ALL
  SELECT 'job_type', job_type, n FROM types
) ORDER BY metric, key
"""


@_register("job_agent_summary", oracle=_agent_summary_oracle())
def q_job_agent_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 — /ai_agent_analysis 'summary' (advanced_job_finder.py:357-450):
    the reference's local analysis stub computes total jobs, distinct
    companies, top-5 companies/locations, job-type distribution (empty
    keys skipped, :437-443), and mean quality. Its top-5 is
    ``list(set(...))[:5]`` — hash-order nondeterministic — so this engine
    determinizes to sorted-distinct-first-5 (O6 policy); everything else
    is exact. Runs over the container-extracted jobs table with a
    deterministic quality column (the endpoint's optional
    ``quality_score`` input). Tidy (metric, key, value) rows — the driver
    canonicalizer can't sort array columns. Reference-exec parity in
    tests/test_endpoint_parity.py."""
    jobs = _container_jobs_df(spark, sf_dir).withColumn(
        "qs", (F.col("doc_id") * 7 + F.col("job_index")) % 101
    )
    totals = jobs.agg(
        F.count("*").cast("double").alias("total_jobs"),
        F.countDistinct("company").cast("double").alias("companies"),
        # exact integer sum + one division — see the oracle's comment
        F.round(
            F.sum("qs").cast("double") / (F.count("*") * F.lit(100.0)), 6
        ).alias("avg_quality"),
    )
    one = totals.select(
        F.explode(
            F.array(
                F.struct(F.lit("total_jobs").alias("metric"), F.lit("").alias("key"), F.col("total_jobs").alias("value")),
                F.struct(F.lit("companies").alias("metric"), F.lit("").alias("key"), F.col("companies").alias("value")),
                F.struct(F.lit("avg_quality").alias("metric"), F.lit("").alias("key"), F.col("avg_quality").alias("value")),
            )
        ).alias("r")
    ).select("r.metric", "r.key", "r.value")
    w_c = Window.orderBy("company")
    top_comp = (
        jobs.select("company").distinct()
        .withColumn("rk", F.row_number().over(w_c))
        .where(F.col("rk") <= 5)
        .select(F.lit("top_company").alias("metric"), F.col("company").alias("key"), F.col("rk").cast("double").alias("value"))
    )
    w_l = Window.orderBy("location")
    top_loc = (
        jobs.select("location").distinct()
        .withColumn("rk", F.row_number().over(w_l))
        .where(F.col("rk") <= 5)
        .select(F.lit("top_location").alias("metric"), F.col("location").alias("key"), F.col("rk").cast("double").alias("value"))
    )
    types = (
        jobs.where(F.col("job_type") != "")
        .groupBy("job_type")
        .count()
        .select(F.lit("job_type").alias("metric"), F.col("job_type").alias("key"), F.col("count").cast("double").alias("value"))
    )
    return one.unionByName(top_comp).unionByName(top_loc).unionByName(types).orderBy("metric", "key")


def _subdomain_oracle() -> str:
    from crawler_ai_spark.functions import subdomains as SD

    host_of = (
        "CASE WHEN regexp_matches(u, '(?i)^https?://')"
        " THEN lower(regexp_extract(u, '(?i)^https?://([^/?#]+)', 1))"
        " WHEN starts_with(u, '//') THEN lower(regexp_extract(u, '^//([^/?#]+)', 1))"
        " WHEN regexp_matches(u, '^[a-zA-Z][a-zA-Z0-9+.\\-]*:') THEN NULL"
        " ELSE basehost END"
    )
    text_arrays = ", ".join(
        f"list_transform(regexp_extract_all(html, {_sql_quote('(?i)' + p)}, 1), h -> lower(h))"
        for p in SD.TEXT_URL_PATTERNS
    )
    tags = ", ".join(_sql_quote(t) for t in SD.CAREER_SUBDOMAIN_TAGS)
    return f"""
WITH p1 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN 'www.site' || CAST(doc_id % 37 AS VARCHAR) || '.vn'
              ELSE 'app.site' || CAST(doc_id % 37 AS VARCHAR) || '.com.vn' END AS basehost,
         CAST(doc_id % 37 AS VARCHAR) AS n
  FROM documents
),
p2 AS (
  SELECT doc_id, basehost,
         '<html><body><a href="https://career.site' || n || '.vn/jobs">Careers</a>'
         || '<a href="/tuyen-dung">TD</a>'
         || '<script src="//cdn.site' || n || '.com.vn/app.js"></script>'
         || CASE WHEN doc_id % 3 = 0 THEN '"url": "https://jobs.site' || n || '.vn"' ELSE '' END
         || '<img src="https://static.partner' || n || '.example.org/logo.png">'
         || '<a href="mailto:hr@site' || n || '.vn">mail</a>'
         || ' Visit https://intranet.site' || n || '.com.vn now</body></html>' AS html
  FROM p1
),
p3 AS (
  SELECT doc_id, basehost, html,
         CASE WHEN len(string_split(regexp_replace(basehost, '^www\\.', ''), '.')) >= 3
              THEN CASE WHEN length((string_split(regexp_replace(basehost, '^www\\.', ''), '.'))[-1]) <= 2
                        THEN array_to_string((string_split(regexp_replace(basehost, '^www\\.', ''), '.'))[-3:], '.')
                        ELSE array_to_string((string_split(regexp_replace(basehost, '^www\\.', ''), '.'))[-2:], '.') END
              ELSE regexp_replace(basehost, '^www\\.', '') END AS root
  FROM p2
),
harv AS (
  SELECT doc_id, root, h AS host
  FROM p3, unnest(list_filter(list_distinct(flatten([
    list_transform(regexp_extract_all(html, {_sql_quote(SD.ATTR_URL_RX)}, 1), u -> {host_of}),
    {text_arrays}
  ])), h -> h IS NOT NULL AND h <> '')) AS t(h)
),
cands AS (
  SELECT doc_id, root, host FROM harv
  WHERE ends_with(host, '.' || root) AND host <> root
),
probe AS (SELECT DISTINCT host FROM harv WHERE length(host) % 3 <> 0),
discovered AS (
  SELECT DISTINCT doc_id, 'https://' || host AS candidate_url, 'discovered' AS source
  FROM cands JOIN probe USING (host)
),
fallback AS (
  SELECT doc_id, 'https://' || t || '.' || root AS candidate_url, 'fallback' AS source
  FROM p3, unnest([{tags}]) AS u(t)
)
SELECT doc_id, candidate_url, min(source) AS source
FROM (SELECT * FROM discovered UNION ALL SELECT * FROM fallback)
GROUP BY doc_id, candidate_url
ORDER BY doc_id, candidate_url
"""


def _subdomain_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesized base pages: two root shapes (site{n}.vn / site{n}.com.vn
    — exercising both _safe_domain branches), HTML carrying subdomain refs
    via attributes, protocol-relative src, JSON url fields, a relative link
    (resolves to the base host), mailto (no netloc), and an off-domain
    host (filtered by the subdomain-of gate)."""
    docs = _t(spark, sf_dir, "documents")
    n = (F.col("doc_id") % 37).cast("string")
    basehost = F.when(
        F.col("doc_id") % 2 == 0, F.concat(F.lit("www.site"), n, F.lit(".vn"))
    ).otherwise(F.concat(F.lit("app.site"), n, F.lit(".com.vn")))
    html = F.concat(
        F.lit('<html><body><a href="https://career.site'), n, F.lit('.vn/jobs">Careers</a>'),
        F.lit('<a href="/tuyen-dung">TD</a>'),
        F.lit('<script src="//cdn.site'), n, F.lit('.com.vn/app.js"></script>'),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit('"url": "https://jobs.site'), n, F.lit('.vn"')),
        ).otherwise(F.lit("")),
        F.lit('<img src="https://static.partner'), n, F.lit('.example.org/logo.png">'),
        F.lit('<a href="mailto:hr@site'), n, F.lit('.vn">mail</a>'),
        F.lit(" Visit https://intranet.site"), n, F.lit(".com.vn now</body></html>"),
    )
    return docs.select(
        "doc_id",
        F.concat(F.lit("https://"), basehost, F.lit("/")).alias("url"),
        html.alias("html"),
    )


@_register("subdomain_candidates", oracle=_subdomain_oracle())
def q_subdomain_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subdomain search (career_pages_service.py:932-1111): harvest hosts
    from base-page HTML, keep subdomains of the root, probe-join for
    aliveness (probe = harvested hosts with length % 3 != 0 — a
    deterministic stand-in for _validate_host_alive), union the always-on
    career fallbacks. Parity of the pure parts (_safe_domain,
    _is_subdomain_of, _get_minimal_fallback_patterns) in
    tests/test_subdomain_parity.py."""
    from crawler_ai_spark.functions import subdomains as SD

    pages = _subdomain_pages(spark, sf_dir)
    harv = pages.select(
        F.explode(
            SD.harvested_hosts_expr(F.col("html"), SD.netloc_expr(F.col("url")))
        ).alias("host")
    )
    probe = harv.where(F.length("host") % 3 != 0).select("host").distinct()
    return SD.subdomain_search(pages, probe).orderBy("doc_id", "candidate_url")


def _fetch_error_oracle() -> str:
    from crawler_ai_spark.functions import errors as ER

    msg_case = """CASE doc_id % 10
    WHEN 1 THEN 'Permanent error: HTTP 404 - Not Found'
    WHEN 2 THEN 'Permanent error: HTTP 410 - Gone'
    WHEN 3 THEN '503 Service Unavailable - server overloaded'
    WHEN 4 THEN '429 Rate Limited - too many requests'
    WHEN 5 THEN '403 Forbidden - likely blocked by server'
    WHEN 6 THEN 'Connection timeout to host after 15s'
    WHEN 7 THEN 'Cannot connect: Name or service not known'
    WHEN 8 THEN 'Connection refused by peer'
    WHEN 9 THEN 'SSL handshake failed unexpectedly'
    ELSE NULL END"""
    whens = " ".join(
        f"WHEN {_contains_any_sql('lower(error_message)', markers)} THEN {_sql_quote(cls)}"
        for cls, markers in ER.ERROR_CLASS_MARKERS
    )
    return f"""
WITH msgs AS (
  SELECT doc_id, {msg_case} AS error_message FROM documents
),
classified AS (
  SELECT doc_id, error_message,
         CASE WHEN error_message IS NULL THEN NULL {whens} ELSE 'other' END AS error_class
  FROM msgs
)
SELECT doc_id, error_message, error_class,
       coalesce(error_class IN ('not_found'), FALSE) AS permanent
FROM classified ORDER BY doc_id
"""


@_register("fetch_error_classify", oracle=_fetch_error_oracle())
def q_fetch_error_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/W4 — fetch-error taxonomy (crawler.py:424-446) + the permanent
    class driving per-class retry (:224). Message battery synthesized from
    the reference's own error strings; variant 6 exercises the ORDERED
    chain (contains both 'timeout' and 'connection' — timeout must win)."""
    from crawler_ai_spark.functions import errors as ER

    docs = _t(spark, sf_dir, "documents")
    m = F.col("doc_id") % 10
    msg = (
        F.when(m == 1, F.lit("Permanent error: HTTP 404 - Not Found"))
        .when(m == 2, F.lit("Permanent error: HTTP 410 - Gone"))
        .when(m == 3, F.lit("503 Service Unavailable - server overloaded"))
        .when(m == 4, F.lit("429 Rate Limited - too many requests"))
        .when(m == 5, F.lit("403 Forbidden - likely blocked by server"))
        .when(m == 6, F.lit("Connection timeout to host after 15s"))
        .when(m == 7, F.lit("Cannot connect: Name or service not known"))
        .when(m == 8, F.lit("Connection refused by peer"))
        .when(m == 9, F.lit("SSL handshake failed unexpectedly"))
        .otherwise(F.lit(None).cast("string"))
    )
    out = docs.select("doc_id", msg.alias("error_message"))
    out = out.withColumn("error_class", ER.fetch_error_class_expr(F.col("error_message")))
    return out.withColumn(
        "permanent", ER.is_permanent_error_expr(F.col("error_class"))
    ).orderBy("doc_id")


def _element_check_oracle() -> str:
    from crawler_ai_spark.functions import elements as EL

    kws = ", ".join(_sql_quote(k) for k in EL.ELEMENT_JOB_KEYWORDS)
    pm_sum = " + ".join(
        f"CASE WHEN regexp_matches(low, {_sql_quote(p)}) THEN 1 ELSE 0 END"
        for p in EL.ELEMENT_JOB_PATTERNS
    )
    cls_hit = _contains_any_sql("lower(class_text)", EL.ELEMENT_ATTR_KEYWORDS)
    id_hit = _contains_any_sql("lower(id_text)", EL.ELEMENT_ATTR_KEYWORDS)
    return f"""
WITH el AS (
  SELECT doc_id,
    CASE doc_id % 5
      WHEN 0 THEN 'too short'
      WHEN 1 THEN 'We are hiring a senior developer with experience in cloud systems and a good salary package. Apply now to join our team for full-time work.'
      WHEN 2 THEN substr(text, 1, 80)
      WHEN 3 THEN 'Tuyển dụng vị trí kỹ sư phần mềm, việc làm hấp dẫn tại Hà Nội'
      ELSE 'Liên hệ với chúng tôi qua email để biết thêm chi tiết về sản phẩm.' END AS text,
    doc_id % 4 = 1 AS has_data_attr,
    CASE doc_id % 3 WHEN 0 THEN 'job-card featured' WHEN 1 THEN 'menu item' ELSE '' END AS class_text,
    CASE WHEN doc_id % 7 = 0 THEN 'career-section' ELSE '' END AS id_text
  FROM documents
),
feat AS (
  SELECT doc_id, trim(text) AS stripped, lower(trim(text)) AS low,
         has_data_attr, class_text, id_text
  FROM el
),
scored AS (
  SELECT doc_id, stripped,
         len(list_filter([{kws}], k -> contains(low, k))) AS kw,
         {pm_sum} AS pm,
         has_data_attr, {cls_hit} AS cls_hit, {id_hit} AS idh
  FROM feat
),
conf AS (
  SELECT doc_id, stripped, kw, pm,
         (CASE WHEN kw > 0 THEN least(kw * 0.2, 0.6) ELSE 0.0 END)
         + (CASE WHEN pm > 0 THEN least(pm * 0.15, 0.4) ELSE 0.0 END)
         + (CASE WHEN has_data_attr THEN 0.3 ELSE 0.0 END)
         + (CASE WHEN cls_hit THEN 0.2 ELSE 0.0 END)
         + (CASE WHEN idh THEN 0.2 ELSE 0.0 END) AS c
  FROM scored
)
SELECT doc_id,
  round(CASE WHEN stripped IS NULL OR length(stripped) < 10 THEN 0.0 ELSE least(c, 1.0) END, 6) AS confidence,
  CASE WHEN stripped IS NULL OR length(stripped) < 10 THEN FALSE ELSE c >= 0.3 END AS is_likely_job,
  CASE WHEN stripped IS NULL OR length(stripped) < 10 THEN 'Text too short'
       ELSE 'Keywords: ' || kw || ', Patterns: ' || pm END AS reason
FROM conf ORDER BY doc_id
"""


@_register("element_job_check", oracle=_element_check_oracle())
def q_element_job_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7b — element-confidence validation (element_checker.py:20-101)
    over synthesized elements: text variants (short/en-rich/natural/vi/
    none), data-attribute flag, class tokens, id. Reference-exec parity in
    tests/test_elements_parity.py."""
    from crawler_ai_spark.functions import elements as EL

    docs = _t(spark, sf_dir, "documents")
    m = F.col("doc_id") % 5
    text = (
        F.when(m == 0, F.lit("too short"))
        .when(m == 1, F.lit(
            "We are hiring a senior developer with experience in cloud systems"
            " and a good salary package. Apply now to join our team for"
            " full-time work."))
        .when(m == 2, F.expr("substr(text, 1, 80)"))
        .when(m == 3, F.lit("Tuyển dụng vị trí kỹ sư phần mềm, việc làm hấp dẫn tại Hà Nội"))
        .otherwise(F.lit("Liên hệ với chúng tôi qua email để biết thêm chi tiết về sản phẩm."))
    )
    el = docs.select(
        "doc_id",
        text.alias("text"),
        (F.col("doc_id") % 4 == 1).alias("has_data_attr"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("job-card featured"))
        .when(F.col("doc_id") % 3 == 1, F.lit("menu item"))
        .otherwise(F.lit(""))
        .alias("class_text"),
        F.when(F.col("doc_id") % 7 == 0, F.lit("career-section")).otherwise(F.lit("")).alias("id_text"),
    )
    chk = EL.element_job_check_expr(
        F.col("text"), F.col("has_data_attr"), F.col("class_text"), F.col("id_text")
    )
    return (
        el.withColumn("_c", chk)
        .select(
            "doc_id",
            F.round(F.col("_c.confidence"), 6).alias("confidence"),
            F.col("_c.is_likely_job").alias("is_likely_job"),
            F.col("_c.reason").alias("reason"),
        )
        .orderBy("doc_id")
    )


def _top_tech_oracle() -> str:
    from crawler_ai_spark.functions.analyzers import ALL_TECHNOLOGIES

    tech_list = ", ".join(_sql_quote(t) for t in ALL_TECHNOLOGIES)
    return f"""
WITH cards AS (
  SELECT doc_id,
         lower(substr(text, 1, 120)
         || CASE WHEN doc_id % 2 = 0 THEN ' built with python and react on aws' ELSE '' END
         || CASE WHEN doc_id % 3 = 0 THEN ' docker kubernetes ci/cd' ELSE '' END) AS blow
  FROM documents
),
tl AS (
  -- list_distinct: ALL_TECHNOLOGIES carries duplicate entries (swift,
  -- kotlin) and Spark's technologies_expr applies array_distinct — without
  -- it the oracle double-counts those techs on any corpus containing them
  SELECT doc_id, list_distinct(list_filter([{tech_list}], t -> contains(blow, t))) AS techs
  FROM cards
),
techs AS (
  SELECT doc_id, unnest(techs) AS technology FROM tl
),
counts AS (
  SELECT technology, count(*) AS n_jobs FROM techs GROUP BY technology
),
ranked AS (
  SELECT technology, n_jobs,
         row_number() OVER (ORDER BY n_jobs DESC, technology) AS rank
  FROM counts
)
SELECT rank, technology, n_jobs FROM ranked WHERE rank <= 5 ORDER BY rank
"""


@_register("top_technologies", oracle=_top_tech_oracle())
def q_top_technologies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — top-5 technologies across extracted jobs
    (user_friendly_formatter.py:242-248 Counter(...).most_common(5)).
    Counter's insertion-order tie is determinized to (count desc,
    technology asc) — the list(set(...)) treatment of round 1. Map-side
    partial agg then a 5-row TakeOrdered: scale-trivial."""
    from crawler_ai_spark.functions.analyzers import technologies_expr

    docs = _t(spark, sf_dir, "documents")
    body = F.expr(
        "substr(text, 1, 120)"
        " || CASE WHEN doc_id % 2 = 0 THEN ' built with python and react on aws' ELSE '' END"
        " || CASE WHEN doc_id % 3 = 0 THEN ' docker kubernetes ci/cd' ELSE '' END"
    )
    techs = docs.select(
        F.explode(technologies_expr(body)).alias("technology")
    )
    counts = techs.groupBy("technology").agg(F.count("*").alias("n_jobs"))
    w = Window.orderBy(F.col("n_jobs").desc(), F.col("technology").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("rank", "technology", "n_jobs")
        .orderBy("rank")
    )


def _ai_text_oracle() -> str:
    # independent regex re-derivation, valid for the controlled html shape
    # (no nested same-name tags, no '>' inside attributes)
    strip = "html"
    for tag in ("script", "style", "nav", "header", "footer"):
        strip = f"regexp_replace({strip}, '(?s)<{tag}.*?</{tag}>', '', 'g')"
    text = f"regexp_replace({strip}, '<[^>]+>', '', 'g')"
    return f"""
WITH pages AS (
  SELECT doc_id,
    '<html><head><title>Page ' || CAST(doc_id AS VARCHAR) || '</title>'
    || '<script>var x = 1;</script><style>.a {{ color: red; }}</style></head>'
    || '<body><nav>Nav Links Here</nav><header>Site Header</header>'
    || '<h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1>'
    || '<p>First  line with  double  spaces</p>'
    || CASE WHEN doc_id % 2 = 0 THEN '<aside>Aside kept here</aside>' ELSE '' END
    || '<div>Line one' || chr(10) || '  indented  chunk  ' || chr(10) || 'tail</div>'
    || '<footer>Footer stuff</footer></body></html>' AS html
  FROM documents
),
txt AS (SELECT doc_id, {text} AS t FROM pages)
SELECT doc_id,
  array_to_string(
    list_filter(
      list_transform(
        flatten(list_transform(string_split(t, chr(10)),
                               l -> string_split(trim(l), '  '))),
        c -> trim(c)),
      c -> c <> ''),
    ' ') AS ai_text
FROM txt ORDER BY doc_id
"""


@_register("ai_text_extract", oracle=_ai_text_oracle())
def q_ai_text_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 — HTML→text variant B (job_extractor.py:257-269): decompose
    script/style/nav/header/footer (keeping aside — unlike canonical_text),
    get_text(), per-line strip + double-space chunking. Spark side runs the
    real parser twin (textnorm.ai_text) as an Arrow-batched pandas UDF; the
    oracle re-derives the text with regexes valid for this controlled html
    shape — two independent implementations."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from crawler_ai_spark.functions.textnorm import ai_text

    def _fn(s):
        return s.map(ai_text)

    # real-type annotations set explicitly: the module's PEP-563 string
    # annotations are unresolvable for pandas_udf's signature inspection
    _fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
    _ai_text_udf = pandas_udf(_fn, "string")

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit("<html><head><title>Page "), d, F.lit("</title>"),
        F.lit("<script>var x = 1;</script><style>.a { color: red; }</style></head>"),
        F.lit("<body><nav>Nav Links Here</nav><header>Site Header</header>"),
        F.lit("<h1>Doc "), d, F.lit("</h1>"),
        F.lit("<p>First  line with  double  spaces</p>"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("<aside>Aside kept here</aside>")).otherwise(F.lit("")),
        F.lit("<div>Line one\n  indented  chunk  \ntail</div>"),
        F.lit("<footer>Footer stuff</footer></body></html>"),
    )
    return docs.select(
        "doc_id", _ai_text_udf(html).alias("ai_text")
    ).orderBy("doc_id")


@_register(
    "head_precheck",
    # S2 — HEAD availability pre-check (crawler.py:103-134): ok statuses
    # pass, 404/410 are permanent skips, other statuses carry the reason,
    # a failed HEAD (NULL status) leaves availability UNKNOWN (try GET)
    oracle="""
WITH h AS (
  SELECT doc_id,
    CASE doc_id % 7 WHEN 0 THEN 200 WHEN 1 THEN 301 WHEN 2 THEN 302
         WHEN 3 THEN 404 WHEN 4 THEN 410 WHEN 5 THEN 503 ELSE NULL END AS status,
    CASE doc_id % 7 WHEN 0 THEN 'OK' WHEN 1 THEN 'Moved Permanently'
         WHEN 2 THEN 'Found' WHEN 3 THEN 'Not Found' WHEN 4 THEN 'Gone'
         WHEN 5 THEN 'Service Unavailable' ELSE NULL END AS reason
  FROM documents
)
SELECT doc_id, CAST(status AS VARCHAR) AS status,
  CAST(CASE WHEN status IS NULL THEN NULL
       WHEN status IN (200, 301, 302, 303, 307, 308) THEN TRUE
       ELSE FALSE END AS VARCHAR) AS available,
  CASE WHEN status IS NULL THEN 'head failed'
       WHEN status IN (200, 301, 302, 303, 307, 308) THEN NULL
       WHEN status IN (404, 410) THEN 'Permanent error: HTTP ' || status
       ELSE 'HTTP ' || status || ' - ' || reason END AS error
FROM h ORDER BY doc_id
""",
)
def q_head_precheck(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 — HEAD pre-check as a status predicate over the pages/probe
    table: the frontier filter form of check_url_availability
    (crawler.py:103-134). 404/410 rows never reach the GET stage."""
    docs = _t(spark, sf_dir, "documents")
    m = F.col("doc_id") % 7
    status = (
        F.when(m == 0, 200).when(m == 1, 301).when(m == 2, 302)
        .when(m == 3, 404).when(m == 4, 410).when(m == 5, 503)
        .otherwise(F.lit(None).cast("int"))
    )
    reason = (
        F.when(m == 0, "OK").when(m == 1, "Moved Permanently")
        .when(m == 2, "Found").when(m == 3, "Not Found").when(m == 4, "Gone")
        .when(m == 5, "Service Unavailable").otherwise(F.lit(None).cast("string"))
    )
    h = docs.select("doc_id", status.alias("status"), reason.alias("reason"))
    ok = F.col("status").isin(200, 301, 302, 303, 307, 308)
    return h.select(
        "doc_id",
        # string status: a nullable int column canonicalizes as float NaN
        # on one engine and None on the other in the driver's gate
        F.col("status").cast("string").alias("status"),
        F.when(F.col("status").isNull(), F.lit(None).cast("boolean"))
        .otherwise(ok)
        .cast("string")
        .alias("available"),
        F.when(F.col("status").isNull(), F.lit("head failed"))
        .when(ok, F.lit(None).cast("string"))
        .when(
            F.col("status").isin(404, 410),
            F.concat(F.lit("Permanent error: HTTP "), F.col("status").cast("string")),
        )
        .otherwise(
            F.concat(
                F.lit("HTTP "), F.col("status").cast("string"), F.lit(" - "), F.col("reason")
            )
        )
        .alias("error"),
    ).orderBy("doc_id")


def _detection_pipeline_oracle() -> str:
    # compose the two component oracles as subqueries (their trailing
    # ORDER BYs are legal-and-ignored inside FROM) — the composition IS the
    # flagship endpoint flow: F5 gate -> C3 confidence -> O3 per-host top-3
    er = ORACLES["early_rejection"]
    c3 = ORACLES["url_career_confidence"]
    return f"""
WITH er AS (SELECT * FROM ({er}) t1),
conf AS (SELECT * FROM ({c3}) t2),
joined AS (
  SELECT conf.doc_id, conf.url, conf.confidence, conf.is_career_page,
         'site' || CAST(conf.doc_id % 37 AS VARCHAR) || '.example.com' AS host
  FROM conf JOIN er ON conf.doc_id = er.doc_id
  WHERE er.rejection_reason IS NULL
),
ranked AS (
  SELECT host, url, confidence,
         row_number() OVER (PARTITION BY host ORDER BY confidence DESC, url) AS rank
  FROM joined WHERE is_career_page
)
SELECT host, rank, url, confidence FROM ranked WHERE rank <= 3
ORDER BY host, rank
"""


@_register("career_detection_pipeline", oracle=_detection_pipeline_oracle())
def q_career_detection_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §3.1 — the flagship detect_career_pages flow composed as ONE
    DataFrame plan: F5 early-rejection gate → C3 URL confidence → keep
    career pages → O3 per-host top-3 by confidence. One window shuffle;
    both scoring stages are expressions over the scan (the C3 fold staged
    through its term-array form so the plan whole-stage-compiles — see
    functions/confidence.py CODEGEN NOTE)."""
    from crawler_ai_spark.functions.confidence import with_career_confidence
    from crawler_ai_spark.functions.detector import early_rejection_reason_expr

    urls = synth_urls(spark, sf_dir)
    survivors = urls.where(early_rejection_reason_expr(F.col("url")).isNull())
    scored = with_career_confidence(survivors, F.col("url"))
    career = scored.where(F.col("c.is_career_page")).select(
        "host", "url", F.col("c.confidence").alias("confidence")
    )
    w = Window.partitionBy("host").orderBy(F.col("confidence").desc(), F.col("url").asc())
    return (
        career.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("host", "rank", "url", "confidence")
        .orderBy("host", "rank")
    )


@_register(
    "job_url_pipeline",
    # §3.2 extract_job_urls composed: F3 accept gate -> C4 link score ->
    # O4 global sort + O8 limit. Component oracles reused as subqueries.
    oracle=None,  # set below — needs ORACLES entries registered above
)
def q_job_url_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §3.2 — the extract_job_urls endpoint as one plan: classify
    every candidate URL (F3), keep accepted, score each link (C4), global
    sort by score then url (O4/O6), top 50 (O8 — TakeOrderedAndProject,
    no single-partition window).

    CODEGEN SHAPE: the F3 gate is expressed as a NULLed-out score inside
    the projection (`WHEN accept THEN score`) with rejects dropped by a
    tiny attribute filter ABOVE the limit, not as a `where(accept)` below
    it. FilterExec's predicate codegen has no common-subexpression
    elimination and predicate pushdown re-inlines aliases, so a plain
    filter embeds the synthesized-url CASE once per reference (~1.5 MB of
    generated code, janino 64 KB overflow -> interpreted stage); inside
    ProjectExec the shared subtrees are CSE'd (~28 KB, compiles). Row set
    and ordering are identical: rejects sort last (desc_nulls_last) and
    can never displace an accepted row from the top-50."""
    from crawler_ai_spark.functions.scoring import job_link_score_expr

    urls = synth_urls(spark, sf_dir)
    anchor = (
        F.when(F.col("doc_id") % 4 == 0, F.lit("Apply now"))
        .when(F.col("doc_id") % 4 == 1, F.lit("Tuyển dụng"))
        .when(F.col("doc_id") % 4 == 2, F.lit("Read more"))
        .otherwise(F.lit("Open position"))
    )
    scored = urls.select(
        "doc_id",
        "url",
        F.when(
            FL.is_job_url_expr(F.col("url")), job_link_score_expr(F.col("url"), anchor)
        ).alias("score"),
    )
    return (
        scored.orderBy(F.col("score").desc_nulls_last(), F.col("url").asc())
        .limit(50)
        .where(F.col("score").isNotNull())
    )


ORACLES["job_url_pipeline"] = f"""
WITH cls AS (SELECT * FROM ({ORACLES["job_url_classify"]}) t1),
sc AS (SELECT * FROM ({ORACLES["job_link_score"]}) t2)
SELECT sc.doc_id, sc.url, sc.score
FROM sc JOIN cls ON sc.doc_id = cls.doc_id
WHERE cls.is_job_url
ORDER BY sc.score DESC, sc.url ASC LIMIT 50
"""


@_register(
    "job_details_pipeline",
    oracle=None,  # set below
)
def q_job_details_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §3.3 — extract_job_details composed: P9 fields + P10 title
    clean + P12 summary + C6 quality in ONE pass over the shared input
    (no self-joins — every stage is an expression over the same scan)."""
    from crawler_ai_spark.functions import jobs as J

    docs = _t(spark, sf_dir, "documents")
    cards = _cards(spark, sf_dir)
    joined = docs.select("doc_id", "text").join(cards, "doc_id")
    title_raw = (
        F.when(F.col("doc_id") % 4 == 0, F.lit("  Senior <b>Java</b> Developer Fully Remote "))
        .when(F.col("doc_id") % 4 == 1, F.lit("com Business   Analyst See Details"))
        .when(F.col("doc_id") % 4 == 2, F.lit("DevOps Engineer"))
        .otherwise(F.lit("QA   Engineer Remote"))
    )
    out = joined.select(
        "doc_id",
        J.clean_title_expr(title_raw).alias("title"),
        J.job_type_expr(F.col("card")).alias("job_type"),
        J.location_expr(F.col("card")).alias("location"),
        J.salary_expr(F.col("card")).alias("salary"),
        J.summarize_description_expr(F.col("text")).alias("summary"),
    )
    cols = {
        "title": F.col("title"),
        "description": F.col("summary"),
        "url": F.concat(F.lit("https://x"), F.col("doc_id").cast("string")),
        "location": F.col("location"),
        "job_type": F.col("job_type"),
        "company": F.lit(None).cast("string"),
        "salary": F.col("salary"),
        "posted_date": F.lit(None).cast("string"),
    }
    from crawler_ai_spark.functions.jobs import completeness_expr

    return out.withColumn("completeness", completeness_expr(cols)).orderBy("doc_id")


ORACLES["job_details_pipeline"] = f"""
WITH tc AS (SELECT * FROM ({ORACLES["title_clean"]}) t1),
jf AS (SELECT * FROM ({ORACLES["job_fields_extract"]}) t2),
ds AS (SELECT * FROM ({ORACLES["description_summarize"]}) t3)
SELECT tc.doc_id, tc.title, jf.job_type, jf.location, jf.salary, ds.summary,
       round((
         (CASE WHEN tc.title IS NOT NULL AND trim(tc.title) <> '' THEN 1.0 ELSE 0.0 END
          + CASE WHEN ds.summary IS NOT NULL AND trim(ds.summary) <> '' THEN 1.0 ELSE 0.0 END
          + 1.0) / 3.0 * 0.8
         + (CASE WHEN jf.location IS NOT NULL AND trim(jf.location) <> '' THEN 1.0 ELSE 0.0 END
            + CASE WHEN jf.job_type IS NOT NULL AND trim(jf.job_type) <> '' THEN 1.0 ELSE 0.0 END
            + CASE WHEN jf.salary IS NOT NULL AND trim(jf.salary) <> '' THEN 1.0 ELSE 0.0 END
           ) / 5.0 * 0.2
       ), 6) AS completeness
FROM tc JOIN jf ON tc.doc_id = jf.doc_id JOIN ds ON tc.doc_id = ds.doc_id
ORDER BY tc.doc_id
"""


@_register(
    "emb_dup_clusters",
    # transitive closure of the near-dup pairs: DuckDB computes component
    # labels with a recursive CTE (min reachable id over symmetric edges),
    # Spark with iterative min-label propagation — independent algorithms,
    # same fixpoint
    oracle=f"""
WITH RECURSIVE pairs AS (
  SELECT a_id, b_id FROM ({ORACLES['emb_dup_pairs']}) t
  UNION ALL
  -- seeded 6-node chain: the natural sf0.01 pairs are all disjoint edges,
  -- which would leave multi-hop transitivity untested (degenerate green)
  SELECT vec_id AS a_id, vec_id + 1 AS b_id FROM embeddings WHERE vec_id < 5
),
edges AS (
  SELECT a_id AS src, b_id AS dst FROM pairs
  UNION SELECT b_id, a_id FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
walk(node, label) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.dst, w.label FROM walk w JOIN edges e ON e.src = w.node
)
SELECT node AS vec_id, min(label) AS cluster_id
FROM walk GROUP BY node ORDER BY vec_id
""",
)
def q_emb_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS over the embedding pair graph — the keep-one-per-
    group step after pairwise dedup (pairs alone aren't dedup: matching is
    transitive only through components). Iterative min-label propagation,
    O(diameter) rounds of key-joins."""
    emb = _t(spark, sf_dir, "embeddings")
    pairs = DD.embedding_dup_pairs(emb, threshold=0.45).select("a_id", "b_id")
    chain = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("a_id"), (F.col("vec_id") + 1).alias("b_id")
    )
    cc = DD.connected_components(pairs.unionByName(chain))
    return cc.select(F.col("node").alias("vec_id"), "cluster_id").orderBy("vec_id")


@_register(
    "media_meta",
    # the oracle PREDICTS the metadata from doc_id arithmetic (the blobs
    # are constructed deterministically from doc_id); the Spark side
    # PARSES it back out of the actual bytes through the mapInPandas
    # byte-budget plumbing — round-trip proof of the binary path. Width/
    # height stringified (nullable-int NaN/None canonicalization trap).
    oracle="""
SELECT doc_id,
  CASE doc_id % 5 WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/gif'
       WHEN 2 THEN 'image/bmp' WHEN 3 THEN 'audio/wav'
       ELSE 'video/mp4' END AS mime_sniffed,
  CAST(CASE doc_id % 5 WHEN 0 THEN 24 WHEN 1 THEN 10 WHEN 2 THEN 26
       WHEN 3 THEN 12 ELSE 12 END + doc_id % 50 AS BIGINT) AS n_bytes,
  CAST(CASE doc_id % 5 WHEN 0 THEN 16 + doc_id % 64
       WHEN 1 THEN 8 + doc_id % 32 WHEN 2 THEN 32 + doc_id % 16 END AS VARCHAR) AS width,
  CAST(CASE doc_id % 5 WHEN 0 THEN 9 + doc_id % 48
       WHEN 1 THEN 8 + doc_id % 32 WHEN 2 THEN 24 + doc_id % 16 END AS VARCHAR) AS height
FROM documents ORDER BY doc_id
""",
)
def q_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal metadata pass over opaque binary columns: deterministic
    container blobs (PNG/GIF/BMP/WAV/MP4 headers + padding) built from
    doc_id, then mime sniff + header-dimension extraction through the
    byte-budget mapInPandas plumbing (pipeline/multimodal.py). Codec-free
    by design — the REAL stdlib decodes are gated separately:
    media_decode_features (PNG+BMP pixels), media_audio_features (PCM
    WAV), media_video_meta (MP4 box walk); JPEG pixel decode remains the
    one documented codec-bound stub."""
    import struct

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from crawler_ai_spark.pipeline.multimodal import extract_media_meta

    def _blob(s):
        out = []
        for d in s:
            d = int(d)
            m, pad = d % 5, b"x" * (d % 50)
            if m == 0:
                body = b"\x89PNG\r\n\x1a\n" + b"\x00" * 8 + struct.pack(
                    ">II", 16 + d % 64, 9 + d % 48
                )
            elif m == 1:
                body = b"GIF89a" + struct.pack("<HH", 8 + d % 32, 8 + d % 32)
            elif m == 2:
                body = b"BM" + b"\x00" * 16 + struct.pack("<ii", 32 + d % 16, 24 + d % 16)
            elif m == 3:
                body = b"RIFF" + b"\x00\x00\x00\x00" + b"WAVE"
            else:
                body = b"\x00\x00\x00\x18ftypmp42"
            out.append(body + pad)
        return pd.Series(out)

    _blob.__annotations__ = {"s": pd.Series, "return": pd.Series}
    blob_udf = pandas_udf(_blob, "binary")

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"), blob_udf(F.col("doc_id")).alias("content")
    )
    meta = extract_media_meta(media)
    return meta.select(
        F.col("media_id").alias("doc_id"),
        "mime_sniffed",
        "n_bytes",
        F.col("width").cast("string").alias("width"),
        F.col("height").cast("string").alias("height"),
    ).orderBy("doc_id")


@_register(
    "media_decode_features",
    # the oracle PREDICTS true pixel statistics arithmetically (the images
    # carry a deterministic (x*7 + y*13 + c*29 + doc_id) % 256 gradient);
    # the Spark side round-trips the actual bytes: stdlib PNG (even ids) /
    # BMP (odd ids) encode in a pandas UDF -> real pixel decode in
    # mapInPandas — container-blind prediction, so one row gates both.
    # The mean is re-derived from EXACT integer (pixel_sum, n_pix) with
    # engine-native double ops on both sides (identical expression shape).
    oracle="""
WITH g AS (
  SELECT d.doc_id,
         8 + d.doc_id % 16 AS w,
         6 + d.doc_id % 12 AS h
  FROM documents d
),
px AS (
  SELECT g.doc_id, g.w, g.h,
         (ux.x * 7 + uy.y * 13 + uc.c * 29 + g.doc_id) % 256 AS v
  FROM g,
       unnest(generate_series(0, g.w - 1)) AS ux(x),
       unnest(generate_series(0, g.h - 1)) AS uy(y),
       unnest(generate_series(0, 2)) AS uc(c)
)
SELECT doc_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(3 AS INT) AS channels,
       round(CAST(sum(v) AS DOUBLE) / count(*) / 255.0, 6) AS mean_pixel
FROM px GROUP BY doc_id, w, h
ORDER BY doc_id
""",
)
def q_media_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode through the whole binary path: deterministic RGB
    gradient images are encoded from doc_id — PNG for even ids, 24-bit
    BMP for odd (pipeline/multimodal.encode_png/encode_bmp, pure stdlib)
    — shipped as a binary column, and pixel-decoded back by
    decode_image_features (zlib inflate + PNG unfilter / BMP unpad +
    BGR swap in byte-budgeted mapInPandas). The oracle re-derives
    width/height/mean from the gradient formula alone, container-blind —
    one green row gates BOTH codecs byte-for-byte."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from crawler_ai_spark.pipeline.multimodal import (
        decode_image_features,
        encode_bmp,
        encode_png,
    )

    def _blob(s):
        out = []
        for d in s:
            d = int(d)
            w, h = 8 + d % 16, 6 + d % 12
            px = bytes(
                ((x * 7 + y * 13 + c * 29 + d) % 256)
                for y in range(h)
                for x in range(w)
                for c in range(3)
            )
            enc = encode_png if d % 2 == 0 else encode_bmp
            out.append(enc(w, h, px, channels=3))
        return pd.Series(out)

    _blob.__annotations__ = {"s": pd.Series, "return": pd.Series}
    blob_udf = pandas_udf(_blob, "binary")

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"), blob_udf(F.col("doc_id")).alias("content")
    )
    feats = decode_image_features(media)
    return feats.select(
        F.col("media_id").alias("doc_id"),
        "width",
        "height",
        "channels",
        F.round(
            F.col("pixel_sum").cast("double") / F.col("n_pix") / F.lit(255.0), 6
        ).alias("mean_pixel"),
    ).orderBy("doc_id")


@_register(
    "live_fetch_stage",
    # DuckDB re-derives EVERY output column arithmetically from md5(url):
    # the synthetic transport's outcome residue, body text and byte count,
    # the UA rotation index, and the per-host politeness schedule (row k of
    # a host dispatches at (k-1)*delay — a window the SQL side re-states).
    # If the fetch stage dropped a row, mis-ordered a host, double-booked a
    # politeness slot or mangled a body byte, the value hash diverges.
    oracle="""
WITH f AS (
  SELECT 'https://host' || (d.doc_id % 37) || '.example/fp/' || d.doc_id AS url,
         'host' || (d.doc_id % 37) || '.example' AS host,
         d.doc_id % 3 AS priority,
         d.doc_id AS discovered_seq
  FROM documents d
),
k AS (
  SELECT *, CAST(concat('0x', substr(md5(url), 1, 8)) AS BIGINT) AS key
  FROM f
),
o AS (
  SELECT *, key % 100 AS r,
         row_number() OVER (PARTITION BY host ORDER BY priority, discovered_seq) AS rk
  FROM k
),
o2 AS (
  SELECT *,
         CASE WHEN r < 85 THEN '<html><head><title>Page ' || (key % 1000)
              || '</title></head><body>' || repeat('x', CAST(100 + key % 400 AS INT))
              || '</body></html>' END AS html
  FROM o
)
SELECT url, host,
       CAST(CASE WHEN r < 85 THEN 200 WHEN r < 90 THEN 404 WHEN r < 93 THEN 403
                 WHEN r < 95 THEN 429 WHEN r < 97 THEN 503 END AS INT) AS status,
       html,
       CASE WHEN r >= 85 AND r < 90 THEN '404 not found'
            WHEN r >= 90 AND r < 93 THEN '403 forbidden'
            WHEN r >= 93 AND r < 95 THEN '429 rate limited'
            WHEN r >= 95 AND r < 97 THEN '503 service unavailable'
            WHEN r >= 97 AND r < 99 THEN 'Connection timeout after 15s'
            WHEN r >= 99 THEN 'DNS name or service not known' END AS fetch_error,
       CASE WHEN r < 85 THEN NULL
            WHEN r < 90 THEN 'not_found' WHEN r < 93 THEN 'blocked'
            WHEN r < 95 THEN 'rate_limited' WHEN r < 97 THEN 'other'
            WHEN r < 99 THEN 'timeout' ELSE 'dns' END AS error_class,
       CAST(coalesce(length(html), 0) AS BIGINT) AS body_bytes,
       CAST((rk - 1) * 500 AS BIGINT) AS planned_offset_ms,
       CAST(key % 8 AS INT) AS ua_idx
FROM o2
ORDER BY url
""",
)
def q_live_fetch_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 live-fetch mode, driver-gated end to end: a synthetic frontier
    (37 hosts over the documents table) runs through the REAL
    host-partitioned mapInPandas fetch stage (sources/fetch.py) — host
    co-location, (priority, seq) in-partition order, per-host politeness
    offsets, UA rotation, utf-8 body decode, reference error taxonomy
    (crawler.py:424-446 via functions/errors.py) — against the
    deterministic md5-keyed transport, so DuckDB predicts every cell."""
    from crawler_ai_spark.functions.errors import fetch_error_class_expr
    from crawler_ai_spark.sources.fetch import FetchConfig, fetch_pages

    docs = _t(spark, sf_dir, "documents")
    frontier = docs.select(
        F.concat(
            F.lit("https://host"), (F.col("doc_id") % 37).cast("string"),
            F.lit(".example/fp/"), F.col("doc_id").cast("string"),
        ).alias("url"),
        F.concat(
            F.lit("host"), (F.col("doc_id") % 37).cast("string"), F.lit(".example")
        ).alias("host"),
        (F.col("doc_id") % 3).alias("priority"),
        F.col("doc_id").alias("discovered_seq"),
    )
    fetched = fetch_pages(frontier, FetchConfig(per_host_delay_ms=500))
    return fetched.select(
        "url", "host", "status", "html", "fetch_error",
        fetch_error_class_expr(F.col("fetch_error")).alias("error_class"),
        "body_bytes", "planned_offset_ms", "ua_idx",
    ).orderBy("url")


@_register(
    "media_audio_features",
    # the oracle PREDICTS true PCM statistics arithmetically: the WAVs
    # carry deterministic 8-bit samples s_j = (j*7 + doc_id) % 256, so
    # abs-sum and peak (centered at 128) and the frame/duration math are
    # pure integer functions of doc_id that DuckDB re-derives — the Spark
    # side round-trips the actual encoded container bytes.
    oracle="""
WITH g AS (SELECT doc_id, 200 + doc_id % 300 AS n FROM documents),
s AS (
  SELECT g.doc_id, g.n, abs(((u.j * 7 + g.doc_id) % 256) - 128) AS a
  FROM g, unnest(generate_series(0, g.n - 1)) AS u(j)
)
SELECT doc_id,
       CAST(1 AS INT) AS channels,
       CAST(8000 AS INT) AS sample_rate,
       CAST(8 AS INT) AS bits,
       CAST(n AS BIGINT) AS n_frames,
       CAST((n * 1000) // 8000 AS BIGINT) AS duration_ms,
       CAST(sum(a) AS BIGINT) AS abs_sum,
       CAST(max(a) AS INT) AS peak
FROM s GROUP BY doc_id, n
ORDER BY doc_id
""",
)
def q_media_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode through the whole binary path: deterministic
    8-bit PCM WAVs are encoded from doc_id (pipeline/multimodal.encode_wav,
    pure stdlib), shipped as a binary column, and sample-decoded back by
    decode_audio_features (RIFF chunk walk + PCM stats in byte-budgeted
    mapInPandas). The oracle re-derives frames/duration/abs-sum/peak from
    the sample formula alone — if the codec path mangled one PCM byte,
    abs_sum would diverge."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from crawler_ai_spark.pipeline.multimodal import decode_audio_features, encode_wav

    def _wav(s):
        out = []
        for d in s:
            d = int(d)
            n = 200 + d % 300
            out.append(
                encode_wav(
                    bytes(((j * 7 + d) % 256) for j in range(n)),
                    rate=8000, channels=1, bits=8,
                )
            )
        return pd.Series(out)

    _wav.__annotations__ = {"s": pd.Series, "return": pd.Series}
    wav_udf = pandas_udf(_wav, "binary")

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"), wav_udf(F.col("doc_id")).alias("content")
    )
    feats = decode_audio_features(media)
    return feats.select(
        F.col("media_id").alias("doc_id"),
        "channels", "sample_rate", "bits", "n_frames",
        "duration_ms", "abs_sum", "peak",
    ).orderBy("doc_id")


@_register(
    "media_video_meta",
    # ISO-BMFF probe oracle: the stub containers carry deterministic
    # mvhd/tkhd values derived from doc_id (timescale 600), so brand,
    # track dims and the tick→ms conversion are integer-predictable.
    oracle="""
SELECT doc_id,
       'mp42' AS brand,
       CAST(600 AS INT) AS timescale,
       CAST(((60 + doc_id % 900) * 1000) // 600 AS BIGINT) AS duration_ms,
       CAST(320 + doc_id % 64 AS INT) AS width,
       CAST(180 + doc_id % 36 AS INT) AS height,
       CAST(1 AS INT) AS n_tracks
FROM documents
ORDER BY doc_id
""",
)
def q_media_video_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-container metadata through the binary path: structurally
    real ftyp+moov(mvhd+trak(tkhd)) boxes built from doc_id
    (encode_mp4_stub), probed back by probe_mp4's box walk inside the
    byte-budget mapInPandas plumbing. Frame decode needs codecs this
    sandbox lacks (frame_sample_plan plans that work); the container
    probe — what a curation pipeline filters on — is fully real."""
    import pandas as pd

    from crawler_ai_spark.pipeline.multimodal import encode_mp4_stub, probe_mp4

    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def _probe(batches):
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "brand", "timescale", "duration_ms",
                                    "width", "height", "n_tracks")}
            for d in pdf["doc_id"]:
                d = int(d)
                blob = encode_mp4_stub(
                    320 + d % 64, 180 + d % 36,
                    duration_ticks=60 + d % 900, timescale=600,
                )
                m = probe_mp4(blob)
                rows["doc_id"].append(d)
                rows["brand"].append(m["brand"])
                rows["timescale"].append(m["timescale"])
                rows["duration_ms"].append(m["duration_ms"])
                rows["width"].append(m["width"])
                rows["height"].append(m["height"])
                rows["n_tracks"].append(m["n_tracks"])
            yield pd.DataFrame(rows)

    out = docs.mapInPandas(
        _probe,
        "doc_id long, brand string, timescale int, duration_ms long, "
        "width int, height int, n_tracks int",
    )
    return out.orderBy("doc_id")


def _lm_score_oracle() -> str:
    return f"""
WITH {_TOKS_CTE},
uni AS (
  SELECT u.tok AS tok, count(*) AS c1
  FROM toksed, unnest(toks) AS u(tok)
  GROUP BY 1
),
v AS (SELECT count(*) AS v FROM uni),
bi AS (
  SELECT t.doc_id, t.toks[CAST(r.i AS INT)] AS w1, t.toks[CAST(r.i AS INT) + 1] AS w2
  FROM toksed t, unnest(range(1, greatest(len(t.toks), 1))) AS r(i)
  WHERE len(t.toks) >= 2
),
bic AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY 1, 2),
scored AS (
  SELECT b.doc_id,
         count(*) AS n_bigrams,
         round(avg(log2((bc.c12 + 1.0) / (u.c1 + 1.0 * v.v))), 4) AS lm_score
  FROM bi b
  JOIN bic bc ON bc.w1 = b.w1 AND bc.w2 = b.w2
  JOIN uni u ON u.tok = b.w1
  CROSS JOIN v
  GROUP BY b.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       s.lm_score
FROM documents d
LEFT JOIN scored s ON s.doc_id = d.doc_id
ORDER BY d.doc_id
"""


@_register("doc_lm_score", oracle=_lm_score_oracle())
def q_doc_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality signal (pipeline/corpus.lm_bigram_score):
    an add-1-smoothed bigram LM trained on the corpus itself, in-plan,
    scoring every doc by mean log2 p(w2|w1). The DuckDB oracle re-derives
    the whole model (counts, vocabulary, smoothing, log-mean) from the
    same guarded tokenizer — engine-grade float parity at round(4)."""
    from crawler_ai_spark.pipeline.corpus import lm_bigram_score

    docs = _t(spark, sf_dir, "documents")
    return lm_bigram_score(docs).orderBy("doc_id")


@_register(
    "media_resize_features",
    # the oracle predicts the RESIZED pixel sum arithmetically: nearest-
    # neighbor maps dst (x,y) to src (x*w//4, y*h//3), and the source
    # gradient is (sx*7 + sy*13 + c*29 + doc_id) % 256 — so the sampled
    # sum is a pure integer function of doc_id. Containers alternate
    # PNG/BMP by parity like media_decode_features.
    oracle="""
WITH g AS (
  SELECT doc_id, 8 + doc_id % 16 AS w, 6 + doc_id % 12 AS h FROM documents
),
px AS (
  SELECT g.doc_id, g.w, g.h,
         (((ux.x * g.w) // 4) * 7 + ((uy.y * g.h) // 3) * 13 + uc.c * 29
          + g.doc_id) % 256 AS v
  FROM g,
       unnest(generate_series(0, 3)) AS ux(x),
       unnest(generate_series(0, 2)) AS uy(y),
       unnest(generate_series(0, 2)) AS uc(c)
)
SELECT doc_id,
       CAST(w AS INT) AS src_width,
       CAST(h AS INT) AS src_height,
       CAST(4 AS INT) AS width,
       CAST(3 AS INT) AS height,
       CAST(3 AS INT) AS channels,
       CAST(sum(v) AS BIGINT) AS pixel_sum,
       CAST(36 AS BIGINT) AS n_pix
FROM px GROUP BY doc_id, w, h
ORDER BY doc_id
""",
)
def q_media_resize_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize through the whole binary path: the same gradient
    PNG/BMP containers as media_decode_features, pixel-decoded and
    nearest-neighbor-resampled to 4x3 by resize_images (which also
    re-encodes the thumbnail as a PNG binary column). The oracle
    re-derives the sampled pixel sum from the resample arithmetic alone
    — wrong sampling coordinates, channel order, or a byte lost in the
    decode→resize→stats chain all diverge the hash."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from crawler_ai_spark.pipeline.multimodal import (
        encode_bmp,
        encode_png,
        resize_images,
    )

    def _blob(s):
        out = []
        for d in s:
            d = int(d)
            w, h = 8 + d % 16, 6 + d % 12
            px = bytes(
                ((x * 7 + y * 13 + c * 29 + d) % 256)
                for y in range(h)
                for x in range(w)
                for c in range(3)
            )
            enc = encode_png if d % 2 == 0 else encode_bmp
            out.append(enc(w, h, px, channels=3))
        return pd.Series(out)

    _blob.__annotations__ = {"s": pd.Series, "return": pd.Series}
    blob_udf = pandas_udf(_blob, "binary")

    docs = _t(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"), blob_udf(F.col("doc_id")).alias("content")
    )
    resized = resize_images(media, dst_w=4, dst_h=3)
    return resized.select(
        F.col("media_id").alias("doc_id"),
        "src_width", "src_height", "width", "height", "channels",
        "pixel_sum", "n_pix",
    ).orderBy("doc_id")


@_register(
    "robots_crawl_delay",
    # prediction oracle (media_meta style): the bodies are synthesized
    # from the site number, so the parsed delay and the derived per-batch
    # budget are pure functions of n%4 — the star-group scoping (the
    # Googlebot group's 'Crawl-delay: 1' must NOT leak into site%4==0)
    # and the min-of-values rule (2.5 vs 7) are what the hash checks.
    oracle=f"""
WITH {SYNTH_URLS_CTE},
hosts AS (
  SELECT DISTINCT host, regexp_extract(host, 'site([0-9]+)', 1)::INT % 4 AS n
  FROM synth_urls
)
SELECT host,
       CASE WHEN n = 0 THEN 10.0 WHEN n = 1 THEN 2.5 END AS crawl_delay_s,
       CAST(CASE WHEN n = 0 THEN 360 WHEN n = 1 THEN 1440 END AS INT) AS host_budget
FROM hosts ORDER BY host
""",
)
def q_robots_crawl_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 × W2 — robots Crawl-delay through the REAL parser into the
    politeness arithmetic the crawl loop applies: min across the star
    group's values, non-star groups ignored, absent → NULL (crawler's own
    pace), and host_budget = max(1, floor(batch_interval / delay)) — the
    per-host per-batch cap apply_host_budget enforces."""
    from crawler_ai_spark.sources.robots import parse_robots

    urls = synth_urls(spark, sf_dir)
    n = F.regexp_extract("host", r"site(\d+)", 1).cast("int") % 4
    body = (
        F.when(n == 0,
               F.lit("User-agent: *\nCrawl-delay: 10\nDisallow: /login\n"
                     "User-agent: Googlebot\nCrawl-delay: 1\nDisallow: /all"))
        .when(n == 1,
              F.lit("User-agent: Bingbot\nUser-agent: *\nCrawl-delay: 2.5\n"
                    "Disallow: /x\ncrawl-delay: 7\nUser-agent: Yandex\n"
                    "Crawl-delay: 0.1"))
        .when(n == 2,
              F.lit("user-agent: *\ndisallow: /shared"))
        .otherwise(F.lit(""))
    )
    robots = urls.select("host").distinct().withColumn("body", body)
    parsed = parse_robots(robots, with_crawl_delay=True)
    return parsed.select(
        "host",
        "crawl_delay_s",
        F.when(
            F.col("crawl_delay_s").isNotNull(),
            F.greatest(F.lit(1), F.floor(F.lit(3600) / F.col("crawl_delay_s"))).cast("int"),
        ).alias("host_budget"),
    ).orderBy("host")


@_register(
    "robots_allow_gate",
    # RFC 9309 longest-match precedence re-derived as explicit CASE logic
    # per rule group (the rules are fixed, so the SQL can expand the
    # aggregate): site%3==0 disallows /careers but allows the LONGER
    # /careers/apply (specific allow beats general disallow); %3==1
    # disallows and allows /login at EQUAL length (tie -> least
    # restrictive wins, nothing blocked); %3==2 is disallow-only.
    oracle=f"""
WITH {SYNTH_URLS_CTE},
f AS (
  SELECT doc_id, host, url,
         split_part(path, '?', 1) AS p,
         regexp_extract(host, 'site([0-9]+)', 1)::INT % 3 AS n
  FROM synth_urls
)
SELECT doc_id, host, url
FROM f
WHERE NOT (
      (n = 0 AND starts_with(p, '/careers') AND NOT starts_with(p, '/careers/apply'))
   OR (n = 2 AND (starts_with(p, '/news/') OR starts_with(p, '/jobs/')))
)
ORDER BY doc_id
""",
)
def q_robots_allow_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 — RFC 9309 Allow lines with longest-match precedence, through
    the REAL parser + gate: bodies carry Allow/Disallow pairs, parse_robots
    (with_allow=True) extracts both prefix sets, and apply_robots picks
    the most specific matching rule per URL (ties -> allow) in one JVM
    aggregate over the broadcast rule arrays."""
    from crawler_ai_spark.operators.frontier import apply_robots
    from crawler_ai_spark.sources.robots import parse_robots

    urls = synth_urls(spark, sf_dir)
    n = F.regexp_extract("host", r"site(\d+)", 1).cast("int") % 3
    body = (
        F.when(n == 0,
               F.lit("User-agent: *\nDisallow: /careers\nAllow: /careers/apply"))
        .when(n == 1, F.lit("User-agent: *\nDisallow: /login\nAllow: /login"))
        .otherwise(F.lit("User-agent: *\nDisallow: /news/\nDisallow: /jobs/"))
    )
    rules = parse_robots(
        urls.select("host").distinct().withColumn("body", body), with_allow=True
    )
    frontier = urls.select("doc_id", "host", "url")
    return apply_robots(frontier, rules).orderBy("doc_id")
