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

from crawler_ai_spark.operators import autothrottle as AT
from crawler_ai_spark.pipeline import textstats as TS
from crawler_ai_spark.queries._shared import _register, _t

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
SELECT host, delay_ms, n_ok, n_err,
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
