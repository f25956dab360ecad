"""Late waves: embedded job cards (P9b), subdomains, fetch errors, endpoints, media decode, live fetch, robots, LM scoring.

Split out of the monolithic catalog.py in round 4 (no behavior
change; see catalog.py for the registry contract and parity rules)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from crawler_ai_spark.functions import filters as FL
from crawler_ai_spark.pipeline import dedup as DD

from crawler_ai_spark.queries._shared import (
    ORACLES,
    SYNTH_URLS_CTE,
    _register,
    _sql_quote,
    _t,
    synth_urls,
)
from crawler_ai_spark.queries.corpusdocs import _TOKS_CTE
from crawler_ai_spark.queries.jobs import _cards


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
    2116-2161), as a per-page JVM aggregate fold. Rows-only by design
    (see the register comment); the green companions are the oracle row
    ``job_cards_extract`` (the extraction stage alone) and the
    REFERENCE-EXEC parity suite (tests/test_jobcards_parity.py runs the
    reference's own dedup over the same cards)."""
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


@_register(
    "media_jpeg_roundtrip",
    # the oracle predicts geometry + variant flags arithmetically and
    # asserts roundtrip_ok=TRUE: Spark's side computes it by ENCODING a
    # deterministic image per doc_id with the baseline JPEG encoder and
    # DECODING it with the full baseline decoder (pipeline/jpegcodec.py —
    # Huffman, IDCT, 4:2:0 upsampling, restart intervals), then comparing
    # decoded pixels to the source. All-ones quant bounds the error to
    # coefficient rounding: measured max |err| over doc_id 0..4999 is 1,
    # the gate allows <= 2. Any codec regression (wrong dims, dropped
    # block, mis-ordered restart, broken upsampling) flips a hashed cell.
    oracle="""
SELECT doc_id,
       CAST(8 + doc_id % 16 AS INT) AS width,
       CAST(6 + doc_id % 12 AS INT) AS height,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS INT) AS channels,
       CAST((8 + doc_id % 16) * (6 + doc_id % 12)
            * CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS BIGINT) AS n_pix,
       (doc_id % 2 = 1 AND doc_id % 5 <> 0) AS subsampled,
       (doc_id % 3 = 0) AS restart_coded,
       TRUE AS roundtrip_ok
FROM documents ORDER BY doc_id
""",
)
def q_media_jpeg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baseline JPEG codec gated by the official driver: per doc_id a
    deterministic linear-ramp image (grayscale for even ids, RGB for odd;
    4:2:0 for most RGB rows, restart intervals every 2 MCUs for ids%3==0)
    is encoded and decoded by the REAL stdlib codec and the decoded
    pixels compared against the source in-plan. Complements
    media_decode_features (PNG+BMP) so every real image codec in the repo
    has a green correctness row."""
    from collections.abc import Iterator

    import pandas as pd

    from crawler_ai_spark.pipeline.jpegcodec import decode_jpeg, encode_jpeg

    out_schema = (
        "doc_id long, width int, height int, channels int, n_pix bigint, "
        "subsampled boolean, restart_coded boolean, roundtrip_ok boolean"
    )

    def _roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 8 + d % 16, 6 + d % 12
                if d % 2 == 0:
                    ch = 1
                    px = bytes(
                        min(255, 10 + x * 3 + y * 2 + d % 37)
                        for y in range(h)
                        for x in range(w)
                    )
                else:
                    ch = 3
                    px = bytes(
                        min(255, 10 + x * 3 + y * 2 + d % 37 + c * 11)
                        for y in range(h)
                        for x in range(w)
                        for c in range(3)
                    )
                sub = (d % 2 == 1) and (d % 5 != 0)
                rst = 2 if d % 3 == 0 else 0
                dec = decode_jpeg(
                    encode_jpeg(w, h, px, ch, subsample=sub, restart_interval=rst)
                )
                err = max(
                    (abs(a - b) for a, b in zip(dec["pixels"], px)), default=0
                )
                rows.append(
                    (
                        d, dec["width"], dec["height"], dec["channels"],
                        dec["n_pix"], sub, rst > 0, err <= 2,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "channels", "n_pix",
                    "subsampled", "restart_coded", "roundtrip_ok",
                ],
            )

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    # pure-CPU per-row work: spread rows across the cluster first
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    return docs.mapInPandas(_roundtrip, out_schema).orderBy("doc_id")


@_register(
    "robots_wildcard_gate",
    # outcomes predicted per synthesized rule case (the established
    # robots-oracle style: the SQL re-states WHICH urls survive, it does
    # not re-implement the matcher):
    #   n%4==0  Disallow: /careers*apply      → ^/careers.*apply blocked
    #   n%4==1  Disallow: /job*  Allow: /jobs/view*
    #           → longest-match keeps /jobs/view/..., blocks other /job...
    #   n%4==2  Disallow: /*-us$               → exact-suffix '-us' blocked
    #   n%4==3  no robots
    oracle=f"""
WITH {SYNTH_URLS_CTE},
f AS (
  SELECT doc_id, host, url, path AS p,
         CAST(regexp_extract(host, 'site(\\d+)', 1) AS INT) % 4 AS n
  FROM synth_urls
)
SELECT doc_id, host, url FROM f
WHERE NOT (
      (n = 0 AND regexp_matches(p, '^/careers.*apply'))
   OR (n = 1 AND starts_with(p, '/job') AND NOT starts_with(p, '/jobs/view'))
   OR (n = 2 AND regexp_matches(p, '^/.*-us$'))
)
ORDER BY doc_id
""",
)
def q_robots_wildcard_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 — RFC 9309 §2.2.3 special characters through the REAL parser +
    gate: '*' (any octet sequence) and trailing '$' (end anchor) in both
    Disallow and Allow rules, with most-octets precedence — evaluated
    JVM-side (operators/frontier._robots_rule_matches)."""
    from crawler_ai_spark.operators.frontier import apply_robots
    from crawler_ai_spark.sources.robots import parse_robots

    urls = synth_urls(spark, sf_dir)
    n = F.regexp_extract("host", r"site(\d+)", 1).cast("int") % 4
    body = (
        F.when(n == 0, F.lit("User-agent: *\nDisallow: /careers*apply"))
        .when(n == 1,
              F.lit("User-agent: *\nDisallow: /job*\nAllow: /jobs/view*"))
        .when(n == 2, F.lit("User-agent: *\nDisallow: /*-us$"))
        .otherwise(F.lit(""))
    )
    rules = parse_robots(
        urls.select("host").distinct().withColumn("body", body), with_allow=True
    )
    frontier = urls.select("doc_id", "host", "url")
    return apply_robots(frontier, rules).orderBy("doc_id")
