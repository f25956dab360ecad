"""Round-4 third wave: redirect-chain resolution, crawl-trap detection,
mirror-host detection (crawl-scale frontier hygiene operators).

See catalog.py for the registry contract and parity rules. Inputs are
synthesized deterministically from documents.doc_id with engine-portable
integer arithmetic (same convention as SYNTH_URLS_CTE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_ai_spark.queries._shared import _register, _t

# ---------------------------------------------------------------------------
# synthesized redirect edges: one edge per document.
#   pos = doc_id % 8, g = doc_id // 8  →  8-link chains;
#   pos < 7         : hop to doc_id+1 (next link in the chain)
#   pos = 7, g%5==0 : hop BACK to the chain head (an 8-cycle)
#   pos = 7, else   : land on the group's terminal page (no out-edge)
# Covers: resolved-at-exactly-max_hops (pos 0 of a full non-cyclic group),
# short chains (pos 6→7), cycles (g%5==0), and ragged chain tails (the
# last group, whose doc_id+1 target has no out-edge and absorbs early).
# ---------------------------------------------------------------------------

_REDIRECT_HOPS = 8


def _u_sql(i: str) -> str:
    return f"'http://h' || CAST(({i}) % 50 AS VARCHAR) || '.test/r/' || CAST({i} AS VARCHAR)"


_REDIRECT_EDGES_CTE = f"""
redirect_edges AS (
  SELECT {_u_sql('doc_id')} AS src,
         CASE WHEN doc_id % 8 < 7 THEN {_u_sql('doc_id + 1')}
              WHEN (doc_id // 8) % 5 = 0 THEN {_u_sql('(doc_id // 8) * 8')}
              ELSE 'http://h' || CAST((doc_id // 8) % 50 AS VARCHAR)
                   || '.test/final/' || CAST(doc_id // 8 AS VARCHAR)
         END AS dst
  FROM documents
)"""


def _u_col(i):
    return F.concat(
        F.lit("http://h"),
        (i % 50).cast("string"),
        F.lit(".test/r/"),
        i.cast("string"),
    )


def synth_redirect_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = F.col("doc_id")
    g = F.floor(d / 8).cast("long")
    dst = (
        F.when(d % 8 < 7, _u_col(d + 1))
        .when(g % 5 == 0, _u_col(g * 8))
        .otherwise(
            F.concat(
                F.lit("http://h"),
                (g % 50).cast("string"),
                F.lit(".test/final/"),
                g.cast("string"),
            )
        )
    )
    return (
        _t(spark, sf_dir, "documents")
        .select(_u_col(d).alias("src"), dst.alias("dst"))
    )


# ---------------------------------------------------------------------------
# synthesized trap-shaped URLs: (path, query) per doc_id % 12 —
# cases 0-5 exercise one trap signal each, 6-11 are clean (8 and 10 are
# deliberate near-misses: a date-like path with a non-numeric day and a
# single repeated segment).
# ---------------------------------------------------------------------------

_TRAP_CASES = [
    ("'/a/b/a/b/a/b/item-' || doc_id", "''"),                       # loop_segments
    ("'/archive/2021/' || (doc_id % 12 + 1) || '/' || (doc_id % 28 + 1)", "''"),  # calendar
    ("'/products/item-' || doc_id", "'jsessionid=' || doc_id"),     # session_id
    ("'/search'", "'a=1&b=2&c=3&d=4&e=5&f=' || doc_id"),            # query_explosion
    ("'/c1/c2/c3/c4/c5/c6/c7/c8/c9/c10/c11/c12/p-' || doc_id", "''"),  # too_deep
    ("'/long/' || repeat('z', 300) || '-' || doc_id", "''"),        # too_long
    ("'/careers'", "''"),
    ("'/blog/post-' || doc_id", "''"),
    ("'/news/2024/01/story-' || doc_id", "''"),                     # near-miss calendar
    ("'/'", "''"),
    ("'/a/b/a/item-' || doc_id", "''"),                             # near-miss loop
    ("'/docs'", "'page=' || (doc_id % 100)"),
]


def _case12(exprs, spark_side: bool) -> str:
    body = " ".join(
        f"WHEN {i} THEN {e.replace('doc_id', 'CAST(doc_id AS STRING)') if spark_side else e}"
        for i, e in enumerate(exprs)
    )
    key = "CAST(doc_id % 12 AS INT)" if spark_side else "(doc_id % 12)"
    return f"CASE {key} {body} END"


def _trap_urls_cte() -> str:
    p = _case12([c[0] for c in _TRAP_CASES], spark_side=False)
    q = _case12([c[1] for c in _TRAP_CASES], spark_side=False)
    return f"""
synth_trap_urls AS (
  SELECT doc_id,
         'host' || (doc_id % 23) || '.example.com' AS host,
         {p} AS path,
         {q} AS query,
         'https://host' || (doc_id % 23) || '.example.com' || {p}
           || CASE WHEN {q} = '' THEN '' ELSE '?' || {q} END AS url
  FROM documents
)"""


def synth_trap_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _case12([c[0] for c in _TRAP_CASES], spark_side=True)
    q = _case12([c[1] for c in _TRAP_CASES], spark_side=True)
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr("'host' || CAST(doc_id % 23 AS STRING) || '.example.com'").alias("host"),
        F.expr(
            f"'https://host' || CAST(doc_id % 23 AS STRING) || '.example.com' || {p} "
            f"|| CASE WHEN {q} = '' THEN '' ELSE '?' || {q} END"
        ).alias("url"),
    )


# the oracle re-derives every signal over the CTE's path/query columns in
# DuckDB SQL (the Spark side parses them back out of the URL with
# try_parse_url — an intentional difference: it checks the parser too).
_TRAP_REASON_SQL = """
  CASE
    WHEN len(segs) - len(list_distinct(segs)) >= 2 THEN 'loop_segments'
    WHEN regexp_matches(path, '/(19|20)\\d{2}/\\d{1,2}/\\d{1,2}(/|$)') THEN 'calendar'
    WHEN lower(query) LIKE '%jsessionid%' OR lower(query) LIKE '%phpsessid%'
         OR lower(query) LIKE '%sessionid%' OR lower(query) LIKE '%sid=%'
      THEN 'session_id'
    WHEN (CASE WHEN query = '' THEN 0
               ELSE length(query) - length(replace(query, '&', '')) + 1 END) >= 6
      THEN 'query_explosion'
    WHEN len(segs) > 12 THEN 'too_deep'
    WHEN length(url) > 300 THEN 'too_long'
  END
"""

_TRAP_FLAGS_CTE = f"""
trap_flags AS (
  SELECT doc_id, host, url, {_TRAP_REASON_SQL} AS trap_reason
  FROM (
    SELECT *,
           regexp_split_to_array(
             regexp_replace(path, '^/+|/+$', '', 'g'), '/+') AS segs
    FROM synth_trap_urls
  )
)"""


@_register(
    "url_trap_detect",
    oracle=f"""
WITH {_trap_urls_cte()},
{_TRAP_FLAGS_CTE}
SELECT doc_id, host, url, trap_reason, trap_reason IS NOT NULL AS is_trap
FROM trap_flags ORDER BY doc_id
""",
)
def q_url_trap_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spider-trap classifier (functions/traps.py): row-local URL-structure
    signals — segment loops, calendar pagers, session-id echoes, query
    cross-products, depth, length — evaluated JVM-side so the frontier can
    kill infinite URL subspaces map-side, before the seen-set shuffle."""
    from crawler_ai_spark.functions import traps as TR

    urls = synth_trap_urls(spark, sf_dir)
    return urls.select(
        "doc_id",
        "host",
        "url",
        TR.trap_reason_expr(F.col("url")).alias("trap_reason"),
        TR.is_trap_expr(F.col("url")).alias("is_trap"),
    ).orderBy("doc_id")


@_register(
    "trap_host_quarantine",
    oracle=f"""
WITH {_trap_urls_cte()},
{_TRAP_FLAGS_CTE}
SELECT host,
       CAST(count(*) AS BIGINT) AS n_urls,
       CAST(count(*) FILTER (WHERE trap_reason IS NOT NULL) AS BIGINT) AS n_traps,
       round(count(*) FILTER (WHERE trap_reason IS NOT NULL) * 1.0 / count(*), 6)
         AS trap_share,
       count(*) FILTER (WHERE trap_reason IS NOT NULL) * 2 >= count(*) AS quarantined
FROM trap_flags GROUP BY host ORDER BY host
""",
)
def q_trap_host_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level trap rollup: hosts whose candidate mix is >= 50% trap
    URLs get quarantined (budget-dampened) — the aggregate is one
    map-side-combined groupBy on host, so the signal is nearly free next
    to the frontier's own politeness shuffle."""
    from crawler_ai_spark.functions import traps as TR

    urls = synth_trap_urls(spark, sf_dir)
    flagged = urls.select("host", TR.is_trap_expr(F.col("url")).alias("is_trap"))
    n_traps = F.sum(F.when(F.col("is_trap"), 1).otherwise(0)).cast("long")
    return (
        flagged.groupBy("host")
        .agg(
            F.count("*").alias("n_urls"),
            n_traps.alias("n_traps"),
        )
        .select(
            "host",
            "n_urls",
            "n_traps",
            F.round(F.col("n_traps") * 1.0 / F.col("n_urls"), 6).alias("trap_share"),
            (F.col("n_traps") * 2 >= F.col("n_urls")).alias("quarantined"),
        )
        .orderBy("host")
    )


@_register(
    "redirect_resolve",
    # Independent re-derivation: a step-at-a-time recursive walk with
    # terminal absorption (the join fails at a URL with no out-edge),
    # capped at 8 hops — per url the deepest row is the landing state,
    # exactly what 3 pointer-doubling rounds compute (min(L, 8) hops).
    oracle=f"""
WITH RECURSIVE {_REDIRECT_EDGES_CTE},
walk(url, cur, hops) AS (
  SELECT src, dst, 1 FROM redirect_edges
  UNION ALL
  SELECT w.url, e.dst, w.hops + 1
  FROM walk w JOIN redirect_edges e ON e.src = w.cur
  WHERE w.hops < {_REDIRECT_HOPS}
),
last AS (SELECT url, max(hops) AS hops FROM walk GROUP BY url)
SELECT w.url AS url, w.cur AS final_url, CAST(w.hops AS INT) AS hops,
       w.cur NOT IN (SELECT src FROM redirect_edges) AS resolved
FROM walk w JOIN last l ON l.url = w.url AND l.hops = w.hops
ORDER BY url
""",
)
def q_redirect_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redirect-alias chains collapsed by pointer doubling — ceil(log2(8))=3
    self-joins resolve every chain up to 8 hops; cycles come back
    resolved=false (reference follows redirects one URL at a time inside
    requests; at frontier scale the alias map is a table)."""
    from crawler_ai_spark.operators.redirects import resolve_redirects

    edges = synth_redirect_edges(spark, sf_dir)
    return resolve_redirects(edges, max_hops=_REDIRECT_HOPS).orderBy("url")
