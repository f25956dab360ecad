"""Round-4 third wave: redirect-chain resolution, crawl-trap detection,
mirror-host detection (crawl-scale frontier hygiene operators).

See catalog.py for the registry contract and parity rules. Inputs are
synthesized deterministically from documents.doc_id with engine-portable
integer arithmetic (same convention as SYNTH_URLS_CTE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crawler_ai_spark.queries._shared import QUERIES, SYNTH_URLS_CTE, _register, _t, synth_urls
from crawler_ai_spark.queries.secondwave import _doc_quality_oracle

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


# ---------------------------------------------------------------------------
# synthesized mirror corpus: host_id = doc_id % 40, item = doc_id // 40.
#   host_id % 8 in (0,1): fp = item            → a 10-host mirror family
#   host_id % 8 in (2,3): fp = item (even) or unique (odd)
#   else                : unique fp
#   item % 97 == 0      : fp = -1 on EVERY host — universal boilerplate,
#                          dropped by the stop-word gate (40 > 16 hosts)
# Post-gate shape (sf0.01): even-item fps are shared by 20 hosts (family
# + partial) → also stop-worded, so the family's surviving sets are the
# odd items (+ the tail item carried only by low host_ids). That splits
# the family into two perfect cliques (j=1.0) whose cross pairs land at
# 6/7 ≈ 0.857 — a genuine sub-threshold near-miss — while partial hosts'
# shared fps are all gated away (no pairs at all). Every branch of the
# operator (gate, threshold, clique, near-miss) is exercised.
# ---------------------------------------------------------------------------

_MIRROR_PAGES_CTE = """
mirror_pages AS (
  SELECT doc_id,
         'm' || lpad(CAST(doc_id % 40 AS VARCHAR), 2, '0') || '.mirror.test'
           AS host,
         CASE WHEN (doc_id // 40) % 97 = 0 THEN CAST(-1 AS BIGINT)
              WHEN (doc_id % 40) % 8 IN (0, 1) THEN doc_id // 40
              WHEN (doc_id % 40) % 8 IN (2, 3) AND (doc_id // 40) % 2 = 0
                THEN doc_id // 40
              ELSE (doc_id % 40) * 1000000 + doc_id // 40
         END AS fp
  FROM documents
)"""

_MIRROR_IDX_CTE = """
fps AS (SELECT DISTINCT host, fp FROM mirror_pages),
rare AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 16),
idx AS (SELECT f.host, f.fp FROM fps f SEMI JOIN rare r ON f.fp = r.fp),
sizes AS (SELECT host, CAST(count(*) AS BIGINT) AS size FROM idx GROUP BY host),
mpairs AS (
  SELECT a.host AS host_a, b.host AS host_b,
         CAST(count(*) AS BIGINT) AS shared
  FROM idx a JOIN idx b ON a.fp = b.fp AND a.host < b.host
  GROUP BY a.host, b.host
),
scored AS (
  SELECT p.host_a, p.host_b, p.shared, sa.size AS size_a, sb.size AS size_b,
         round(p.shared * 1.0 / (sa.size + sb.size - p.shared), 6) AS jaccard
  FROM mpairs p
  JOIN sizes sa ON sa.host = p.host_a
  JOIN sizes sb ON sb.host = p.host_b
  WHERE p.shared * 1.0 / (sa.size + sb.size - p.shared) >= 0.9
)"""


def synth_mirror_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = F.col("doc_id")
    h = d % 40
    item = F.floor(d / 40).cast("long")
    fp = (
        F.when(item % 97 == 0, F.lit(-1).cast("long"))
        .when((h % 8).isin(0, 1), item)
        .when((h % 8).isin(2, 3) & (item % 2 == 0), item)
        .otherwise(h * 1000000 + item)
    )
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("m"), F.lpad(h.cast("string"), 2, "0"), F.lit(".mirror.test")
        ).alias("host"),
        fp.alias("fingerprint"),
    )


@_register(
    "mirror_host_pairs",
    oracle=f"""
WITH {_MIRROR_PAGES_CTE},
{_MIRROR_IDX_CTE}
SELECT host_a, host_b, shared, size_a, size_b, jaccard
FROM scored ORDER BY host_a, host_b
""",
)
def q_mirror_host_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mirror-host pairs (operators/mirrors.py): content-fingerprint
    inverted-index join — pairs exist only where a fingerprint is shared
    (LSH-banding shape, never all-pairs over hosts), universal
    boilerplate fps stop-worded at >16 hosts, Jaccard >= 0.9 over the
    surviving sets. The frontier collapses a mirror family to one host
    before spending fetch budget."""
    from crawler_ai_spark.operators import mirrors as MI

    pairs = MI.mirror_pairs(synth_mirror_pages(spark, sf_dir))
    return pairs.select(
        "host_a", "host_b", "shared", "size_a", "size_b",
        F.round("jaccard", 6).alias("jaccard"),
    ).orderBy("host_a", "host_b")


@_register(
    "mirror_canonical_hosts",
    oracle=f"""
WITH {_MIRROR_PAGES_CTE},
{_MIRROR_IDX_CTE},
edges AS (
  SELECT host_a AS host, host_b AS peer FROM scored
  UNION ALL
  SELECT host_b AS host, host_a AS peer FROM scored
)
SELECT host, least(host, min(peer)) AS canonical_host
FROM edges GROUP BY host ORDER BY host
""",
)
def q_mirror_canonical_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical representative per mirrored host: lexicographic min over
    the host's direct mirror partners (exact for cliques — what true
    mirrors form). One groupBy over the pair edges."""
    from crawler_ai_spark.operators import mirrors as MI

    pairs = MI.mirror_pairs(synth_mirror_pages(spark, sf_dir))
    return MI.mirror_canonical(pairs).orderBy("host")


# ---------------------------------------------------------------------------
# synthesized SURT inputs: mixed-case hosts, www prefixes, subdomains —
# 9 registered domains × several host shapes, so the locality rollup sees
# multiple hosts collapsing into one registered-domain key range. Case 7
# ("wwwsite…", no dot) is the near-miss: the www-strip must not fire.
# ---------------------------------------------------------------------------

_SURT_HOST_CASES = [
    "'www.Site' || k || '.example.com'",
    "'site' || k || '.example.com'",
    "'news.site' || k || '.example.com'",
    "'Jobs.Site' || k || '.EXAMPLE.COM'",
    "'www.site' || k || '.example.org'",
    "'cdn' || k || '.Mirror-Host.net'",
    "'static.img.site' || k || '.example.com'",
    "'wwwsite' || k || '.example.com'",
]

_SURT_PATH_CASES = [
    ("'/Careers/Item-' || doc_id", "''"),
    ("'/a/b'", "'Ref=HomePage&x=' || doc_id"),
    ("'/'", "''"),
    ("'/ARCHIVE/doc-' || doc_id", "'Q=Spark'"),
]


def _surt_case(exprs, spark_side: bool, mod: int) -> str:
    body = " ".join(
        f"WHEN {i} THEN {e.replace('doc_id', 'CAST(doc_id AS STRING)').replace(' k ', ' CAST(k AS STRING) ') if spark_side else e}"
        for i, e in enumerate(exprs)
    )
    key = f"CAST(doc_id % {mod} AS INT)" if spark_side else f"(doc_id % {mod})"
    return f"CASE {key} {body} END"


def _surt_urls_cte() -> str:
    h = _surt_case(_SURT_HOST_CASES, spark_side=False, mod=8)
    p = _surt_case([c[0] for c in _SURT_PATH_CASES], spark_side=False, mod=4)
    q = _surt_case([c[1] for c in _SURT_PATH_CASES], spark_side=False, mod=4)
    return f"""
surt_urls AS (
  SELECT doc_id, host, path, query,
         'https://' || host || path
           || CASE WHEN query = '' THEN '' ELSE '?' || query END AS url
  FROM (
    SELECT doc_id, {h} AS host, {p} AS path, {q} AS query
    FROM (SELECT doc_id, doc_id % 9 AS k FROM documents)
  )
)"""


def synth_surt_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = _surt_case(_SURT_HOST_CASES, spark_side=True, mod=8)
    p = _surt_case([c[0] for c in _SURT_PATH_CASES], spark_side=True, mod=4)
    q = _surt_case([c[1] for c in _SURT_PATH_CASES], spark_side=True, mod=4)
    return (
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.expr("doc_id % 9").alias("k"))
        .select(
            "doc_id",
            F.expr(h).alias("host"),
            F.expr(p).alias("path"),
            F.expr(q).alias("query"),
        )
        .select(
            "doc_id",
            F.expr(
                "'https://' || host || path "
                "|| CASE WHEN query = '' THEN '' ELSE '?' || query END"
            ).alias("url"),
        )
    )


# oracle re-derives the SURT from the pre-parse components (the Spark side
# parses host/path/query back OUT of the url with try_parse_url — checking
# the parser too, same convention as the trap oracle)
_SURT_KEY_SQL = """
  array_to_string(
    list_reverse(string_split(regexp_replace(lower(host), '^www\\.', ''), '.')),
    ',')
  || ')' || lower(path)
  || CASE WHEN query = '' THEN '' ELSE '?' || lower(query) END
"""


@_register(
    "surt_keys",
    oracle=f"""
WITH {_surt_urls_cte()}
SELECT doc_id, url, {_SURT_KEY_SQL} AS surt
FROM surt_urls ORDER BY doc_id
""",
)
def q_surt_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURT key (functions/urls.py:surt_key) — the CDX sort-friendly URL
    transform Common Crawl indexes by: ``com,example)/path``. Range-
    partitioning the frontier/seen store on this key makes every URL of a
    registered domain (all subdomains included) one contiguous key range,
    so per-domain operations prune partitions instead of hashing the
    whole table. Pure JVM expressions; reference crawls one site per
    request so never needs a global order (routes.py keyed by site URL)."""
    from crawler_ai_spark.functions import urls as U

    return (
        synth_surt_urls(spark, sf_dir)
        .select("doc_id", "url", U.surt_key(F.col("url")).alias("surt"))
        .orderBy("doc_id")
    )


@_register(
    "surt_locality",
    oracle=f"""
WITH {_surt_urls_cte()},
keyed AS (SELECT {_SURT_KEY_SQL} AS surt, host FROM surt_urls)
SELECT array_to_string((string_split(string_split(surt, ')')[1], ','))[1:2], ',')
         AS domain,
       CAST(count(*) AS BIGINT) AS n_urls,
       CAST(count(DISTINCT lower(host)) AS BIGINT) AS n_hosts,
       min(surt) AS range_lo,
       max(surt) AS range_hi
FROM keyed GROUP BY domain ORDER BY domain
""",
)
def q_surt_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered-domain locality rollup over SURT keys: each domain's
    URLs — across every subdomain and www variant — fall in ONE
    [range_lo, range_hi] key interval, the property that lets a
    SURT-sorted store answer per-domain scans with a range prune. One
    map-side-combined groupBy."""
    from crawler_ai_spark.functions import urls as U

    keyed = synth_surt_urls(spark, sf_dir).select(
        U.surt_key(F.col("url")).alias("surt"),
        F.lower(U.host_expr(F.col("url"))).alias("host"),
    )
    return (
        keyed.groupBy(U.surt_domain_prefix(F.col("surt"), 2).alias("domain"))
        .agg(
            F.count("*").alias("n_urls"),
            F.countDistinct("host").alias("n_hosts"),
            F.min("surt").alias("range_lo"),
            F.max("surt").alias("range_hi"),
        )
        .orderBy("domain")
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


# ---------------------------------------------------------------------------
# sitemap <lastmod>/<changefreq>/<priority> scheduling (sitemaps.org
# protocol): the existing S6 source reads <loc> only; a recrawl scheduler
# additionally wants the freshness metadata. Synthesized XML: one <url>
# entry per document, lastmod dates spread over Jan-Feb 2024 (absent when
# doc_id % 7 == 0), changefreq cycling daily/weekly/monthly/yearly,
# priority 0.0-0.9. "now" is pinned to 2024-03-01 so both engines compute
# identical ages.
# ---------------------------------------------------------------------------

_SITEMAP_NOW = "2024-03-01"

_SM_XML_SQL = """
  '<url><loc>https://sm' || (doc_id % 15) || '.example.com/page/' || doc_id
  || '</loc>'
  || CASE WHEN doc_id % 7 = 0 THEN ''
          ELSE '<lastmod>2024-0' || (1 + doc_id % 2) || '-'
               || lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0') || '</lastmod>'
     END
  || '<changefreq>'
  || CASE (doc_id % 4) WHEN 0 THEN 'daily' WHEN 1 THEN 'weekly'
                       WHEN 2 THEN 'monthly' ELSE 'yearly' END
  || '</changefreq>'
  || '<priority>0.' || (doc_id % 10) || '</priority></url>'
"""

# same construction, Spark SQL dialect (explicit string casts)
_SM_XML_SPARK = """
  '<url><loc>https://sm' || CAST(doc_id % 15 AS STRING) || '.example.com/page/'
  || CAST(doc_id AS STRING) || '</loc>'
  || CASE WHEN doc_id % 7 = 0 THEN ''
          ELSE '<lastmod>2024-0' || CAST(1 + doc_id % 2 AS STRING) || '-'
               || lpad(CAST(1 + doc_id % 28 AS STRING), 2, '0') || '</lastmod>'
     END
  || '<changefreq>'
  || CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'daily' WHEN 1 THEN 'weekly'
                                  WHEN 2 THEN 'monthly' ELSE 'yearly' END
  || '</changefreq>'
  || '<priority>0.' || CAST(doc_id % 10 AS STRING) || '</priority></url>'
"""


_SM_FREQ_DAYS = (
    "CASE changefreq WHEN 'daily' THEN 1 WHEN 'weekly' THEN 7 "
    "WHEN 'monthly' THEN 30 ELSE 365 END"
)


@_register(
    "sitemap_lastmod_schedule",
    oracle=f"""
WITH sitemaps AS (
  SELECT (doc_id % 15) AS host_id, {_SM_XML_SQL} AS xml FROM documents
),
entries AS (
  SELECT 'sm' || host_id || '.example.com' AS host,
         regexp_extract(xml, '<loc>([^<]+)</loc>', 1) AS loc,
         regexp_extract(xml, '<lastmod>([^<]+)</lastmod>', 1) AS lastmod,
         regexp_extract(xml, '<changefreq>([^<]+)</changefreq>', 1) AS changefreq,
         CAST(regexp_extract(xml, '<priority>([^<]+)</priority>', 1) AS DOUBLE)
           AS priority
  FROM sitemaps
),
aged AS (
  SELECT host, loc, lastmod, changefreq, priority,
         CASE WHEN lastmod = '' THEN NULL
              ELSE date_diff('day', CAST(lastmod AS DATE), DATE '{_SITEMAP_NOW}')
         END AS age_days
  FROM entries
),
scheduled AS (
  SELECT host, loc, changefreq, priority,
         CAST(age_days AS INT) AS age_days,
         age_days IS NULL OR age_days >= {_SM_FREQ_DAYS} AS due,
         round(priority / (1.0 + coalesce(age_days, 365) / 7.0), 6) AS score
  FROM aged
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY host ORDER BY score DESC, loc) AS rank
  FROM scheduled WHERE due
)
SELECT host, loc, changefreq, priority, age_days, score, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5 ORDER BY host, rank
""",
)
def q_sitemap_lastmod_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness-aware sitemap scheduling (sitemaps.org <lastmod>/
    <changefreq>/<priority>): an entry is DUE when its advertised change
    interval has elapsed since lastmod (or lastmod is absent), scored
    priority/(1+age/7) and ranked per host — the top-k due URLs feed the
    frontier first. One regex parse pass (map-only) + one per-host window,
    the same shuffle grain as the politeness scheduler, so at 100 TB this
    rides the frontier's existing host partitioning."""
    docs = _t(spark, sf_dir, "documents")
    xml = F.expr(_SM_XML_SPARK)
    entries = docs.select(
        F.concat(
            F.lit("sm"), F.expr("CAST(doc_id % 15 AS STRING)"), F.lit(".example.com")
        ).alias("host"),
        F.regexp_extract(xml, "<loc>([^<]+)</loc>", 1).alias("loc"),
        F.regexp_extract(xml, "<lastmod>([^<]+)</lastmod>", 1).alias("lastmod"),
        F.regexp_extract(xml, "<changefreq>([^<]+)</changefreq>", 1).alias(
            "changefreq"
        ),
        F.regexp_extract(xml, "<priority>([^<]+)</priority>", 1)
        .cast("double")
        .alias("priority"),
    )
    aged = entries.withColumn(
        "age_days",
        F.when(F.col("lastmod") == "", F.lit(None).cast("int")).otherwise(
            F.datediff(F.lit(_SITEMAP_NOW).cast("date"), F.col("lastmod").cast("date"))
        ),
    )
    scheduled = aged.select(
        "host",
        "loc",
        "changefreq",
        "priority",
        F.col("age_days").cast("int").alias("age_days"),
        (
            F.col("age_days").isNull()
            | (F.col("age_days") >= F.expr(_SM_FREQ_DAYS))
        ).alias("due"),
        F.round(
            F.col("priority")
            / (F.lit(1.0) + F.coalesce(F.col("age_days"), F.lit(365)) / F.lit(7.0)),
            6,
        ).alias("score"),
    )
    w = Window.partitionBy("host").orderBy(F.col("score").desc(), F.col("loc"))
    return (
        scheduled.where("due")
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 5)
        .select("host", "loc", "changefreq", "priority", "age_days", "score", "rank")
        .orderBy("host", "rank")
    )


@_register(
    "ip_politeness_budget",
    oracle=f"""
WITH {SYNTH_URLS_CTE},
ipmap AS (
  SELECT DISTINCT host, '10.0.0.' || ((doc_id % 37) % 7) AS ip
  FROM synth_urls WHERE (doc_id % 37) % 5 <> 0
),
fr AS (
  SELECT url, host, doc_id AS discovered_seq, (doc_id % 3) AS priority,
         'https://' || host || '/' AS seed_url
  FROM synth_urls
),
grouped AS (
  SELECT f.*, coalesce(m.ip, f.host) AS ipg
  FROM fr f LEFT JOIN ipmap m ON f.host = m.host
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY ipg ORDER BY priority DESC, discovered_seq, url, seed_url
  ) AS rn
  FROM grouped
)
SELECT host,
       CAST(count(*) FILTER (WHERE rn <= 3) AS BIGINT) AS scheduled,
       CAST(count(*) FILTER (WHERE rn > 3) AS BIGINT) AS deferred
FROM ranked GROUP BY host ORDER BY host
""",
)
def q_ip_politeness_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Server-grain politeness (operators/frontier.py:apply_ip_budget):
    vhosts sharing a resolved IP share one ≤3/batch budget (Heritrix/
    Nutch-style IP politeness queues); unmapped hosts fall back to
    host-grain. Same two-phase salted windows as the host budget, so the
    hot-server key parallelizes across salts."""
    from crawler_ai_spark.operators import frontier as FR

    urls = synth_urls(spark, sf_dir)
    hid = F.col("doc_id") % 37
    ip_map = (
        urls.where((hid % 5) != 0)
        .select(
            "host",
            F.concat(F.lit("10.0.0."), (hid % 7).cast("string")).alias("ip"),
        )
        .distinct()
    )
    fr = urls.select(
        "url",
        "host",
        F.col("doc_id").alias("discovered_seq"),
        (F.col("doc_id") % 3).alias("priority"),
        F.concat(F.lit("https://"), F.col("host"), F.lit("/")).alias("seed_url"),
    )
    scheduled, deferred = FR.apply_ip_budget(fr, ip_map, 3)
    tagged = scheduled.select("host", F.lit(True).alias("_s")).unionByName(
        deferred.select("host", F.lit(False).alias("_s"))
    )
    return (
        tagged.groupBy("host")
        .agg(
            F.sum(F.col("_s").cast("long")).alias("scheduled"),
            F.sum((~F.col("_s")).cast("long")).alias("deferred"),
        )
        .orderBy("host")
    )


# ---------------------------------------------------------------------------
# aggressive-canonical dedup key (functions/urls.py:dedup_key): alias
# groups built per resource r = doc_id // 10, case c = doc_id % 10:
#   {0 mixed-case host, 1 +tracking-only query} and
#   {2 'b=2&a=1', 3 'a=1&b=2', 7 'a=1&utm_campaign=z&b=2'}
# collapse to one key each; 4 (:80 http) / 5 (:443 https) strip their
# default port, 6 (:8080) keeps it, 8 (empty path) keys as '/', 9 drops
# 'ref=' but keeps 'a=1'. The oracle derives the expected key from the
# construction rules, never from a URL parser — the Spark side's
# try_parse_url round-trip is part of what's under test.
# ---------------------------------------------------------------------------


def _dedup_parts_sql(cast) -> str:
    k, r = cast("k"), cast("res")
    return f"""
  SELECT doc_id, res, c, k,
    CASE WHEN c = 4 THEN 'http' ELSE 'https' END AS scheme,
    CASE c
      WHEN 0 THEN 'Site' || {k} || '.Example.com'
      WHEN 4 THEN 'site' || {k} || '.example.com:80'
      WHEN 5 THEN 'site' || {k} || '.example.com:443'
      WHEN 6 THEN 'site' || {k} || '.example.com:8080'
      ELSE 'site' || {k} || '.example.com' END AS auth,
    CASE WHEN c = 8 THEN ''
         WHEN c IN (4, 5, 6) THEN '/p/' || {r}
         ELSE '/page/' || {r} END AS path,
    CASE c WHEN 1 THEN 'utm_source=x&utm_medium=y'
           WHEN 2 THEN 'b=2&a=1' WHEN 3 THEN 'a=1&b=2'
           WHEN 7 THEN 'a=1&utm_campaign=z&b=2'
           WHEN 9 THEN 'ref=home&a=1' ELSE '' END AS query
"""


def _dedup_urls_cte(cast, int_case) -> str:
    return f"""
dk_ids AS (
  SELECT doc_id, doc_id / 10 AS res, {int_case} AS c, (doc_id / 10) % 9 AS k
  FROM (SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents)
),
dk_parts AS ({_dedup_parts_sql(cast)} FROM dk_ids),
dk_urls AS (
  SELECT doc_id, res, c, k, scheme, auth, path, query,
         scheme || '://' || auth || path
           || CASE WHEN query = '' THEN '' ELSE '?' || query END AS url
  FROM dk_parts
)"""


_DK_CTE_SQL = _dedup_urls_cte(lambda e: e, "(doc_id % 10)").replace(
    "doc_id / 10", "doc_id // 10"
)

_DK_EXPECTED_SQL = """
  CASE WHEN c = 4 THEN 'http' ELSE 'https' END || '://'
  || CASE WHEN c = 6 THEN 'site' || k || '.example.com:8080'
          ELSE 'site' || k || '.example.com' END
  || CASE WHEN c = 8 THEN '/' ELSE path END
  || CASE WHEN c IN (2, 3, 7) THEN '?a=1&b=2'
          WHEN c = 9 THEN '?a=1' ELSE '' END
"""


@_register(
    "url_dedup_key",
    oracle=f"""
WITH {_DK_CTE_SQL}
SELECT doc_id, url, {_DK_EXPECTED_SQL} AS canon
FROM dk_urls ORDER BY doc_id
""",
)
def q_url_dedup_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggressive-canonical seen-set key: lowercase scheme/authority,
    default-port strip, tracking-param (utm_*/gclid/…) removal,
    query-param sort, empty path → '/'. All JVM column expressions —
    at 100 TB the key is computed map-side and hashed straight into
    the bloom/anti-join, zero extra shuffle."""
    from crawler_ai_spark.functions import urls as U

    docs = _t(spark, sf_dir, "documents")
    base = docs.select(F.col("doc_id").cast("long").alias("doc_id"))
    parts = base.selectExpr(
        "doc_id",
        "CAST(doc_id / 10 AS BIGINT) AS res",
        "CAST(doc_id % 10 AS INT) AS c",
        "CAST(doc_id / 10 AS BIGINT) % 9 AS k",
    ).selectExpr(
        "doc_id",
        "CASE WHEN c = 4 THEN 'http' ELSE 'https' END AS scheme",
        """CASE c
             WHEN 0 THEN 'Site' || CAST(k AS STRING) || '.Example.com'
             WHEN 4 THEN 'site' || CAST(k AS STRING) || '.example.com:80'
             WHEN 5 THEN 'site' || CAST(k AS STRING) || '.example.com:443'
             WHEN 6 THEN 'site' || CAST(k AS STRING) || '.example.com:8080'
             ELSE 'site' || CAST(k AS STRING) || '.example.com' END AS auth""",
        """CASE WHEN c = 8 THEN ''
                WHEN c IN (4, 5, 6) THEN '/p/' || CAST(res AS STRING)
                ELSE '/page/' || CAST(res AS STRING) END AS path""",
        """CASE c WHEN 1 THEN 'utm_source=x&utm_medium=y'
                  WHEN 2 THEN 'b=2&a=1' WHEN 3 THEN 'a=1&b=2'
                  WHEN 7 THEN 'a=1&utm_campaign=z&b=2'
                  WHEN 9 THEN 'ref=home&a=1' ELSE '' END AS query""",
    )
    urls = parts.selectExpr(
        "doc_id",
        "scheme || '://' || auth || path "
        "|| CASE WHEN query = '' THEN '' ELSE '?' || query END AS url",
    )
    return urls.select(
        "doc_id", "url", U.dedup_key(F.col("url")).alias("canon")
    ).orderBy("doc_id")


@_register(
    "url_dedup_collapse",
    oracle=f"""
WITH {_DK_CTE_SQL},
keyed AS (SELECT {_DK_EXPECTED_SQL} AS canon FROM dk_urls)
SELECT canon, CAST(count(*) AS BIGINT) AS n_aliases
FROM keyed GROUP BY canon ORDER BY canon
""",
)
def q_url_dedup_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alias-group rollup over the dedup key: the tracking-noise and
    param-order alias families collapse to n_aliases 2 and 3 — the fetch
    savings the stronger key buys the frontier."""
    per_url = QUERIES["url_dedup_key"](spark, sf_dir)
    return (
        per_url.groupBy("canon")
        .agg(F.count("*").alias("n_aliases"))
        .orderBy("canon")
    )


@_register(
    "quality_host_budgets",
    oracle=f"""
WITH dq AS (
  SELECT doc_id, quality FROM ({{Q}})
),
hosted AS (
  SELECT 'site' || (doc_id % 37) || '.example.com' AS host,
         CAST(round(quality * 1000000) AS BIGINT) AS q_micro
  FROM dq
),
mass AS (SELECT host, sum(q_micro) AS m FROM hosted GROUP BY host),
tot AS (SELECT sum(m) AS t FROM mass)
SELECT host,
       CAST(least(32, greatest(1, (256 * m) // t)) AS INT) AS host_budget
FROM mass, tot ORDER BY host
""".replace("{Q}", _doc_quality_oracle()),
)
def q_quality_host_budgets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-feedback crawl budgets: hosts whose fetched documents
    score higher on the curation quality metric earn a larger share of
    the batch's 256 fetch slots (clamped to [1, 32] — the tail stays
    crawlable, no host hogs the batch). The (host, host_budget) output
    feeds apply_host_budget like the PageRank budgets; quality mass is
    summed in integer micro-units so the allocation is bit-identical
    across engines and partitionings. One map-side-combined groupBy on
    host + a broadcast one-row total."""
    from crawler_ai_spark.pipeline import textstats as TS

    docs = _t(spark, sf_dir, "documents")
    hosted = docs.select(
        F.expr(
            "'site' || CAST(doc_id % 37 AS STRING) || '.example.com'"
        ).alias("host"),
        F.round(TS.quality_score(F.col("text")) * 1000000)
        .cast("long")
        .alias("q_micro"),
    )
    mass = hosted.groupBy("host").agg(F.sum("q_micro").alias("m"))
    tot = mass.agg(F.sum("m").alias("t"))
    return (
        mass.crossJoin(F.broadcast(tot))
        .select(
            "host",
            F.least(
                F.lit(32), F.greatest(F.lit(1), F.expr("256 * m div t"))
            )
            .cast("int")
            .alias("host_budget"),
        )
        .orderBy("host")
    )


@_register(
    "token_bucket_schedule",
    oracle=f"""
WITH {SYNTH_URLS_CTE},
arr AS (
  SELECT host, url, (doc_id % 20) AS arrival_s FROM synth_urls
),
ranked AS (
  SELECT host, url, arrival_s,
         row_number() OVER (PARTITION BY host ORDER BY arrival_s, url) AS k
  FROM arr
),
disp AS (
  SELECT host, url, arrival_s,
         greatest(arrival_s, 2 * (k - 3), 0) AS dispatch_s
  FROM ranked
)
SELECT host, url, CAST(arrival_s AS INT) AS arrival_s,
       CAST(dispatch_s AS INT) AS dispatch_s,
       dispatch_s > arrival_s AS delayed
FROM disp ORDER BY host, dispatch_s, url
""",
)
def q_token_bucket_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-bucket fetch pacing, the continuous-time analogue of the
    batch host budget: burst 3, refill 1 token / 2 s. The bucket's
    virtual-scheduling property makes it window-expressible — the k-th
    request of a host can dispatch at max(arrival, 2·(k−3)) — so pacing
    is one per-host window + integer arithmetic, no sequential state, no
    Python. (The live fetch stage enforces the same wall-clock gaps
    imperatively inside its mapInPandas partition; this is the plan-side
    twin a scheduler uses to PRE-compute dispatch times.)"""
    urls = synth_urls(spark, sf_dir)
    arr = urls.select(
        "host", "url", (F.col("doc_id") % 20).cast("int").alias("arrival_s")
    )
    w = Window.partitionBy("host").orderBy("arrival_s", "url")
    ranked = arr.withColumn("k", F.row_number().over(w))
    return (
        ranked.select(
            "host",
            "url",
            "arrival_s",
            F.greatest(
                F.col("arrival_s"), (2 * (F.col("k") - 3)).cast("int"), F.lit(0)
            ).alias("dispatch_s"),
        )
        .withColumn("delayed", F.col("dispatch_s") > F.col("arrival_s"))
        .orderBy("host", "dispatch_s", "url")
    )


@_register(
    "url_template_mine",
    oracle=f"""
WITH {SYNTH_URLS_CTE},
templ AS (
  -- synth 'path' embeds the query for one case; strip it first, matching
  -- the Spark side's parse_url(url, 'PATH')
  SELECT host,
         regexp_replace(regexp_replace(path, '\\?.*$', ''), '[0-9]+', '#', 'g')
           AS template
  FROM synth_urls
),
counted AS (
  SELECT host, template, CAST(count(*) AS BIGINT) AS n
  FROM templ GROUP BY host, template
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY host ORDER BY n DESC, template) AS rank
  FROM counted
)
SELECT host, template, n, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 3 ORDER BY host, rank
""",
)
def q_url_template_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL template mining: digit runs in paths generalize to '#', and
    the per-host top templates surface the site's generated URL spaces —
    the scheduler's coarse complement to the per-URL trap signals (a
    template with a huge count and unbounded parameter is a crawl-space
    to cap). One map-side regexp + a host-grain groupBy + per-host
    window — frontier shuffle grain, no new exchange shape."""
    urls = synth_urls(spark, sf_dir)
    templ = urls.select(
        "host",
        F.regexp_replace(
            F.expr("parse_url(url, 'PATH')"), "[0-9]+", "#"
        ).alias("template"),
    )
    counted = templ.groupBy("host", "template").agg(F.count("*").alias("n"))
    w = Window.partitionBy("host").orderBy(F.col("n").desc(), "template")
    return (
        counted.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 3)
        .orderBy("host", "rank")
    )
