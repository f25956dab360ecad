"""Contacts, link scoring, merges, detection confidence, early rejection, career/URL confidence, analyzers, validation, user-facing filters (waves 4-10).

Split out of the monolithic catalog.py in round 4 (no behavior
change; see catalog.py for the registry contract and parity rules)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from crawler_ai_spark import constants as K

from crawler_ai_spark.queries._shared import (
    SYNTH_URLS_CTE,
    _any_substr_rx,
    _register,
    _sql_quote,
    _t,
    synth_urls,
)
from crawler_ai_spark.queries.jobs import _TITLE_CASE_SQL


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
