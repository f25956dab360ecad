"""Job-record operators (P9/P10/P12/P14, F6, D3/D4, C6) over synthesized job cards.

Split out of the monolithic catalog.py in round 4 (no behavior
change; see catalog.py for the registry contract and parity rules)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from crawler_ai_spark import constants as K

from crawler_ai_spark.queries._shared import (
    _register,
    _sql_quote,
    _t,
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
