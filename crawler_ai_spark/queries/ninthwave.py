"""Ninth-wave catalog queries (round 4, continued): declared mirror
preference, corpus diversity metrics.

Inputs are synthesized deterministically from documents.doc_id (no
external data); each DuckDB oracle re-derives the full computation
independently."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_ai_spark.queries._shared import _register, _t

# ---------------------------------------------------------------------------
# Corpus diversity metrics: the recipe-QA numbers a data team reads
# before training — per-source token share, Shannon entropy of the
# source distribution, and the effective source count exp(H) ("this
# 20-source corpus behaves like N equally-sized sources"). A corpus
# dominated by one crawl slice has low effective count no matter how
# many sources are nominally present. One map-combined groupBy; the
# entropy folds over sources in name order (unique key) and rounds 9 dp
# to absorb libm ln ulp skew.
# ---------------------------------------------------------------------------

_DIVERSITY_ORACLE = f"""
WITH toksed AS (
  SELECT source,
         CASE WHEN length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) = 0
              THEN 0
              ELSE len(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' '))
         END AS n
  FROM documents
),
per AS (SELECT source, SUM(n) AS tokens FROM toksed GROUP BY source),
tot AS (SELECT CAST(SUM(tokens) AS DOUBLE) AS t FROM per),
sh AS (
  SELECT source, tokens, tokens / tot.t AS share FROM per, tot
),
ent AS (
  SELECT round(-list_reduce(
           list_prepend({0.0:.17e},
                        list(share * ln(share) ORDER BY source)),
           (a, v) -> a + v), 9) + {0.0:.17e} AS entropy
  FROM sh WHERE share > 0
)
SELECT sh.source,
       CAST(sh.tokens AS BIGINT) AS tokens,
       sh.share,
       ent.entropy,
       round(exp(ent.entropy), 9) AS effective_sources
FROM sh, ent ORDER BY sh.source
"""


@_register("corpus_diversity", oracle=_DIVERSITY_ORACLE)
def q_corpus_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-distribution diversity: token share per source, Shannon
    entropy, effective source count exp(H). The corpus-level fields
    repeat per row so the whole report is one scan + one tiny agg."""
    from crawler_ai_spark.pipeline.corpus import _toks
    from crawler_ai_spark.pipeline.textstats import norm_text

    docs = _t(spark, sf_dir, "documents")
    n_tok = F.when(F.length(norm_text(F.col("text"))) == 0, F.lit(0)).otherwise(
        F.size(_toks(F.col("text")))
    )
    per = (
        docs.select("source", n_tok.cast("long").alias("n"))
        .groupBy("source")
        .agg(F.sum("n").alias("tokens"))
    )
    tot = per.agg(F.sum("tokens").cast("double").alias("t"))
    sh = per.crossJoin(F.broadcast(tot)).select(
        "source", "tokens", (F.col("tokens") / F.col("t")).alias("share")
    )
    ent = sh.where(F.col("share") > 0).agg(
        (
            F.round(
                -F.expr(
                    "aggregate(array_sort(collect_list(struct(source, share))),"
                    " cast(0.0 as double),"
                    " (acc, x) -> acc + x.share * ln(x.share))"
                ),
                9,
            )
            + F.lit(0.0)
        ).alias("entropy")
    )
    return (
        sh.crossJoin(F.broadcast(ent))
        .select(
            "source",
            F.col("tokens").cast("long").alias("tokens"),
            "share",
            "entropy",
            F.round(F.exp("entropy"), 9).alias("effective_sources"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Yandex Host directive (sources/robots.py with_host_directive): the
# publisher's DECLARED canonical mirror — the config-side complement to
# content-fingerprint mirror detection (operators/mirrors.py). First
# syntactically plausible Host line wins (the published behavior);
# bodies without one yield NULL and the crawler falls back to detected
# mirrors. DuckDB re-derives the expected host from the synth body
# construction directly.
# ---------------------------------------------------------------------------

_HOSTDIR_ORACLE = """
SELECT 'm' || (doc_id % 23) || '.example' AS host,
       CASE WHEN (doc_id % 23) % 3 = 0
            THEN 'www.m' || (doc_id % 23) || '.example'
            WHEN (doc_id % 23) % 3 = 1
            THEN NULL
            ELSE 'm' || (doc_id % 23) || '.example'
       END AS preferred_host
FROM (SELECT DISTINCT doc_id % 23 AS doc_id FROM documents)
ORDER BY host
"""


@_register("robots_host_directive", oracle=_HOSTDIR_ORACLE)
def q_robots_host_directive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-directive extraction through the real parser: class-0 bodies
    declare a www mirror, class-1 declare none (NULL — detected mirrors
    decide), class-2 declare themselves (and a second Host line that
    must lose to the first)."""
    from crawler_ai_spark.sources.robots import parse_robots

    docs = _t(spark, sf_dir, "documents").select(
        (F.col("doc_id") % 23).alias("n")
    ).distinct()
    host = F.concat(F.lit("m"), F.col("n").cast("string"), F.lit(".example"))
    body = (
        F.when(
            F.col("n") % 3 == 0,
            F.concat(
                F.lit("User-agent: *\nDisallow: /x\nHost: www.m"),
                F.col("n").cast("string"),
                F.lit(".example\n"),
            ),
        )
        .when(F.col("n") % 3 == 1, F.lit("User-agent: *\nDisallow:\n"))
        .otherwise(
            F.concat(
                F.lit("User-agent: *\nHost: m"),
                F.col("n").cast("string"),
                F.lit(".example\nHost: other.example\n"),
            )
        )
    )
    parsed = parse_robots(
        docs.select(host.alias("host"), body.alias("body")),
        with_host_directive=True,
    )
    return parsed.select("host", "preferred_host").orderBy("host")


# ---------------------------------------------------------------------------
# Microdata extraction (functions/microdata.py): the third structured-
# data channel (JSON-LD and OG/Twitter are the other two). The synth
# page per doc carries one JobPosting item with meta/a/time/data/text
# props, a multi-name itemprop, a nested Organization item, and a
# stray itemprop OUTSIDE any scope that must NOT extract. The Spark
# side parses real HTML through the stdlib DOM; DuckDB predicts every
# (item_idx, itemtype, prop, value) row from the construction.
# ---------------------------------------------------------------------------

_MD_ORACLE = """
WITH d AS (SELECT doc_id FROM documents),
rows_ AS (
  SELECT doc_id, * FROM d, (VALUES
    (0, 'https://schema.org/JobPosting', 'title', 'title'),
    (1, 'https://schema.org/JobPosting', 'datePosted', 'date'),
    (2, 'https://schema.org/JobPosting', 'url', 'url'),
    (3, 'https://schema.org/JobPosting', 'validThrough', 'vt'),
    (4, 'https://schema.org/JobPosting', 'employmentType', 'et'),
    (5, 'https://schema.org/JobPosting', 'workHours', 'et'),
    (6, 'https://schema.org/JobPosting', 'hiringOrganization', 'org'),
    (7, 'https://schema.org/Organization', 'name', 'name')
  ) v(ord, itemtype, prop, kind)
)
SELECT 'https://md' || (doc_id % 9) || '.example/p/' || doc_id AS url,
       CAST(CASE WHEN itemtype LIKE '%Organization' THEN 1 ELSE 0 END AS INT)
         AS item_idx,
       itemtype, prop,
       CASE kind
         WHEN 'title' THEN 'Engineer ' || doc_id
         WHEN 'date'  THEN '2024-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
         WHEN 'url'   THEN '/jobs/' || doc_id
         WHEN 'vt'    THEN '2024-02-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
         WHEN 'et'    THEN CASE WHEN doc_id % 2 = 0 THEN 'FULL_TIME' ELSE 'PART_TIME' END
         WHEN 'org'   THEN '[item:https://schema.org/Organization]'
         WHEN 'name'  THEN 'Acme ' || (doc_id % 7)
       END AS value,
       CAST(ord AS INT) AS ord
FROM rows_
ORDER BY url, ord
"""


@_register("microdata_extract", oracle=_MD_ORACLE)
def q_microdata_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Microdata over real HTML parse: JobPosting + nested Organization
    per page; value resolution per element type, multi-name itemprops,
    out-of-scope itemprops dropped. One mapInPandas pass, no shuffle."""
    from crawler_ai_spark.functions.microdata import microdata_rows

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    day1 = F.lpad((d % 28 + 1).cast("string"), 2, "0")
    et = F.when(d % 2 == 0, F.lit("FULL_TIME")).otherwise(F.lit("PART_TIME"))
    html = F.concat(
        F.lit('<html><body><div itemscope itemtype="https://schema.org/JobPosting">'),
        F.lit('<h1 itemprop="title">Engineer '), d.cast("string"), F.lit("</h1>"),
        F.lit('<meta itemprop="datePosted" content="2024-01-'), day1, F.lit('">'),
        F.lit('<a itemprop="url" href="/jobs/'), d.cast("string"), F.lit('">go</a>'),
        F.lit('<time itemprop="validThrough" datetime="2024-02-'), day1,
        F.lit('">Feb</time>'),
        F.lit('<span itemprop="employmentType workHours">'), et, F.lit("</span>"),
        F.lit('<div itemprop="hiringOrganization" itemscope'
              ' itemtype="https://schema.org/Organization">'
              '<span itemprop="name">Acme '),
        (d % 7).cast("string"),
        F.lit("</span></div></div>"
              '<p itemprop="stray">never extracted</p></body></html>'),
    )
    pages = docs.select(
        F.concat(
            F.lit("https://md"), (d % 9).cast("string"), F.lit(".example/p/"),
            d.cast("string"),
        ).alias("url"),
        html.cast("binary").alias("html"),
    )
    rows = microdata_rows(pages)
    # a stable within-page ordinal for the hash compare: position of the
    # prop in the fixed construction (prop names are unique per item)
    ord_col = (
        F.when(F.col("prop") == "title", 0)
        .when(F.col("prop") == "datePosted", 1)
        .when(F.col("prop") == "url", 2)
        .when(F.col("prop") == "validThrough", 3)
        .when(F.col("prop") == "employmentType", 4)
        .when(F.col("prop") == "workHours", 5)
        .when(F.col("prop") == "hiringOrganization", 6)
        .otherwise(7)
    )
    return rows.select(
        "url", "item_idx", "itemtype", "prop", "value",
        ord_col.cast("int").alias("ord"),
    ).orderBy("url", "ord")


# ---------------------------------------------------------------------------
# MMR diversified top-k (pipeline/similarity.py: mmr_topk): greedy
# λ·rel − (1−λ)·max-sim-to-selected over each query's shortlist. Both
# relevance and pair similarities are 6-dp-quantized sequential-fold
# cosines, so the greedy compares identical doubles in every engine;
# DuckDB unrolls all 4 selection steps (argmax + accumulated selected
# set + max-sim join per step) from scratch.
# ---------------------------------------------------------------------------

_MMR_K = 4
_MMR_SHORT = 8
_MMR_LAM = 0.7


def _mmr_oracle() -> str:
    from crawler_ai_spark.queries.embeddings import _COS_SQL

    lam = f"{_MMR_LAM:.17e}"
    one_m = f"{1.0 - _MMR_LAM:.17e}"
    cos_ab = _COS_SQL.replace("a.embedding", "e1.embedding").replace(
        "b.embedding", "e2.embedding"
    )
    steps = []
    for t in range(2, _MMR_K + 1):
        prev_acc = " UNION ALL ".join(
            f"SELECT query_id, sel FROM p{i}" for i in range(1, t)
        )
        steps.append(
            f"""
acc{t - 1} AS ({prev_acc}),
m{t} AS (
  SELECT r.query_id, r.neighbor_id, MAX(s.sim) AS ms
  FROM rel r
  JOIN acc{t - 1} p ON r.query_id = p.query_id
  JOIN sims s ON s.query_id = r.query_id
   AND ((s.a_id = r.neighbor_id AND s.b_id = p.sel)
     OR (s.b_id = r.neighbor_id AND s.a_id = p.sel))
  WHERE r.neighbor_id NOT IN (SELECT sel FROM acc{t - 1} a2
                              WHERE a2.query_id = r.query_id)
  GROUP BY r.query_id, r.neighbor_id),
s{t} AS (
  SELECT m{t}.query_id, m{t}.neighbor_id,
         round({lam} * r.rel - {one_m} * m{t}.ms, 6) AS score,
         row_number() OVER (
           PARTITION BY m{t}.query_id
           ORDER BY round({lam} * r.rel - {one_m} * m{t}.ms, 6) DESC,
                    m{t}.neighbor_id) AS rk
  FROM m{t} JOIN rel r ON r.query_id = m{t}.query_id
                      AND r.neighbor_id = m{t}.neighbor_id),
p{t} AS (SELECT query_id, neighbor_id AS sel, score FROM s{t} WHERE rk = 1)"""
        )
    selects = " UNION ALL ".join(
        f"SELECT query_id, {i} AS pos, sel AS neighbor_id, score AS mmr_score FROM p{i}"
        for i in range(1, _MMR_K + 1)
    )
    return f"""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
allcos AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, {_COS_SQL} AS cosine
  FROM q a, embeddings b),
rel AS (
  SELECT query_id, neighbor_id, cosine AS rel FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rk
    FROM allcos) WHERE rk <= {_MMR_SHORT}),
sims AS (
  SELECT r1.query_id, r1.neighbor_id AS a_id, r2.neighbor_id AS b_id,
         {cos_ab} AS sim
  FROM rel r1
  JOIN rel r2 ON r1.query_id = r2.query_id AND r1.neighbor_id < r2.neighbor_id
  JOIN embeddings e1 ON e1.vec_id = r1.neighbor_id
  JOIN embeddings e2 ON e2.vec_id = r2.neighbor_id),
s1 AS (
  SELECT query_id, neighbor_id, round({lam} * rel, 6) AS score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round({lam} * rel, 6) DESC, neighbor_id) AS rk
  FROM rel),
p1 AS (SELECT query_id, neighbor_id AS sel, score FROM s1 WHERE rk = 1),{",".join(steps)}
SELECT query_id, pos, neighbor_id, mmr_score FROM ({selects})
ORDER BY query_id, pos
"""


@_register("emb_mmr_topk", oracle=_mmr_oracle())
def q_emb_mmr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-aware reranking: 4 greedy MMR picks per query over an
    8-candidate shortlist, λ=0.7. Relevance shortlist + pair sims in
    the plan (quantized), greedy over the quantized values per query."""
    from crawler_ai_spark.pipeline.similarity import mmr_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return mmr_topk(
        queries,
        emb,
        k=_MMR_K,
        shortlist=_MMR_SHORT,
        lam=_MMR_LAM,
    ).orderBy("query_id", "pos")


# ---------------------------------------------------------------------------
# Canonical election (operators/dust.py: elect_canonical): one
# representative per duplicate cluster from declared rel=canonical
# claims with deterministic fallbacks. Synth clusters of 4 URLs
# (groups by doc_id//4): cluster class 0 has two members declaring the
# same member (majority wins), class 1 has ONE declaration pointing
# OUTSIDE the cluster (invalid — shortest-URL fallback must kick in),
# class 2 is silent (pure fallback incl. a length tie broken
# lexicographically). DuckDB re-runs the precedence from scratch.
# ---------------------------------------------------------------------------

_ELECT_ORACLE = """
WITH g AS (
  SELECT doc_id, doc_id // 4 AS cid, doc_id % 4 AS k, (doc_id // 4) % 3 AS cls
  FROM documents
),
m AS (
  SELECT cid, cls, k,
         'https://c' || cid || '.example/' ||
           CASE k WHEN 0 THEN 'p'
                  WHEN 1 THEN 'p/print'
                  WHEN 2 THEN 'q'
                  ELSE 'p?sid=' || doc_id END AS url,
         CASE WHEN cls = 0 AND k IN (1, 3)
              THEN 'https://c' || cid || '.example/p'
              WHEN cls = 1 AND k = 1
              THEN 'https://outside.example/x'
              ELSE NULL END AS declared
  FROM g
),
valid AS (
  SELECT m.cid, m.declared AS cand
  FROM m JOIN m u ON m.cid = u.cid AND m.declared = u.url
  WHERE m.declared IS NOT NULL
),
decl AS (
  SELECT cid, cand, COUNT(*) AS n FROM valid GROUP BY cid, cand
),
decl_w AS (
  SELECT cid, cand AS decl_url FROM (
    SELECT cid, cand,
           row_number() OVER (PARTITION BY cid ORDER BY n DESC, cand) AS rk
    FROM decl) WHERE rk = 1
),
fb AS (
  SELECT cid, url AS short_url FROM (
    SELECT cid, url,
           row_number() OVER (PARTITION BY cid ORDER BY strlen(url), url) AS rk
    FROM (SELECT DISTINCT cid, url FROM m)) WHERE rk = 1
),
chosen AS (
  SELECT fb.cid, COALESCE(decl_w.decl_url, fb.short_url) AS canonical_url
  FROM fb LEFT JOIN decl_w ON fb.cid = decl_w.cid
)
SELECT m.cid AS cluster_id, m.url, c.canonical_url,
       m.url = c.canonical_url AS is_canonical
FROM (SELECT DISTINCT cid, url FROM m) m JOIN chosen c ON m.cid = c.cid
ORDER BY cluster_id, url
"""


@_register("canonical_election", oracle=_ELECT_ORACLE)
def q_canonical_election(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One canonical per duplicate cluster: majority of member-valid
    rel=canonical declarations, else shortest member URL, ties
    lexicographic. Three cluster-key shuffles, no windows."""
    from crawler_ai_spark.operators.dust import elect_canonical

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    cid = (d / 4).cast("long")
    k = d % 4
    cls = cid % 3
    url = F.concat(
        F.lit("https://c"), cid.cast("string"), F.lit(".example/"),
        F.when(k == 0, F.lit("p"))
        .when(k == 1, F.lit("p/print"))
        .when(k == 2, F.lit("q"))
        .otherwise(F.concat(F.lit("p?sid="), d.cast("string"))),
    )
    declared = (
        F.when(
            (cls == 0) & k.isin(1, 3),
            F.concat(F.lit("https://c"), cid.cast("string"), F.lit(".example/p")),
        )
        .when((cls == 1) & (k == 1), F.lit("https://outside.example/x"))
        .otherwise(F.lit(None).cast("string"))
    )
    members = docs.select(
        cid.alias("cluster_id"), url.alias("url"), declared.alias("declared")
    )
    return elect_canonical(members).orderBy("cluster_id", "url")


# ---------------------------------------------------------------------------
# TF-IDF top-k keywords (pipeline/retrieval.py: tfidf_keywords): what a
# page is ABOUT, corpus-relatively — corpus-wide boilerplate terms
# self-suppress through near-zero idf. DuckDB rebuilds postings, df, N
# and the ranked window from scratch; the ln-weighted scores round 6 dp
# so both regex/libm dialects hash identically.
# ---------------------------------------------------------------------------

_KW_ORACLE = """
WITH toksed AS (
  SELECT doc_id,
         list_filter(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' '),
                     t -> t <> '') AS toks
  FROM documents WHERE text IS NOT NULL
),
ex AS (SELECT doc_id, unnest(toks) AS term FROM toksed),
post AS (SELECT doc_id, term, count(*) AS tf FROM ex GROUP BY doc_id, term),
dft AS (SELECT term, count(*) AS df FROM post GROUP BY term),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM toksed),
scored AS (
  SELECT p.doc_id, p.term, p.tf,
         round(p.tf * ln(n.n_docs / dft.df), 6) AS weight
  FROM post p JOIN dft USING (term), n
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY weight DESC, term) AS rank
  FROM scored
)
SELECT doc_id, CAST(rank AS INT) AS rank, term,
       CAST(tf AS BIGINT) AS tf, weight
FROM ranked WHERE rank <= 5 ORDER BY doc_id, rank
"""


@_register("doc_tfidf_keywords", oracle=_KW_ORACLE)
def q_doc_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF keywords per doc: the postings shuffle + a
    term-keyed df aggregate + a bounded per-doc window."""
    from crawler_ai_spark.pipeline.retrieval import tfidf_keywords

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return tfidf_keywords(docs, k=5).orderBy("doc_id", "rank")


# ---------------------------------------------------------------------------
# Exact latency percentiles per host (operators/autothrottle.py:
# host_latency_percentiles): p = the value at rank ceil(p*n) in sorted
# order — exact discrete quantiles, no sketch whose merge order could
# drift cross-engine. Synth latencies are LCG-spread with a heavy tail
# every 13th fetch so p95 actually separates from p50.
# ---------------------------------------------------------------------------

_LAT_ORACLE = """
WITH f AS (
  SELECT 'lat' || (doc_id % 7) || '.example' AS host,
         'https://lat' || (doc_id % 7) || '.example/p/' || doc_id AS url,
         CAST(50 + (doc_id * 1103515245 + 12345) % 400
              + CASE WHEN doc_id % 13 = 0 THEN 5000 ELSE 0 END AS BIGINT)
           AS fetch_ms
  FROM documents
),
ranked AS (
  SELECT host, fetch_ms,
         row_number() OVER (PARTITION BY host ORDER BY fetch_ms, url) AS rk,
         count(*) OVER (PARTITION BY host) AS n
  FROM f
)
SELECT host,
       CAST(MAX(n) AS BIGINT) AS n_fetches,
       CAST(MAX(CASE WHEN rk = CAST(ceil(0.5 * n) AS BIGINT)
                     THEN fetch_ms END) AS BIGINT) AS p50_ms,
       CAST(MAX(CASE WHEN rk = CAST(ceil(0.95 * n) AS BIGINT)
                     THEN fetch_ms END) AS BIGINT) AS p95_ms
FROM ranked GROUP BY host ORDER BY host
"""


@_register("host_latency_percentiles", oracle=_LAT_ORACLE)
def q_host_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p95 fetch latency per host, exact rank-based quantiles —
    the tail-latency complement to AutoThrottle's mean reaction."""
    from crawler_ai_spark.operators.autothrottle import host_latency_percentiles

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    fetches = docs.select(
        F.concat(F.lit("lat"), (d % 7).cast("string"), F.lit(".example")).alias(
            "host"
        ),
        F.concat(
            F.lit("https://lat"), (d % 7).cast("string"), F.lit(".example/p/"),
            d.cast("string"),
        ).alias("url"),
        (
            50
            + (d * 1103515245 + 12345) % 400
            + F.when(d % 13 == 0, 5000).otherwise(0)
        )
        .cast("long")
        .alias("fetch_ms"),
    )
    return host_latency_percentiles(fetches).orderBy("host")


# ---------------------------------------------------------------------------
# Efraimidis-Spirakis weighted sampling (pipeline/corpus.py:
# weighted_sample): top-k of u^(1/w) over the deterministic md5
# keyspace — reproducible weighted sampling without replacement.
# Weights = n_chars so long docs sample more; DuckDB recomputes u, the
# pow keys and the global rank from scratch.
# ---------------------------------------------------------------------------

_WS_K = 25

_WS_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id, CAST(n_chars AS DOUBLE) AS w,
         round(pow(
           (('0x' || substr(md5(doc_id || ':es-v1'), 1, 12))::BIGINT + {1.0:.17e})
             / {float(2**48 + 1):.17e},
           {1.0:.17e} / n_chars), 12) AS es_key
  FROM documents WHERE n_chars > 0
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY es_key DESC, doc_id) AS pick
  FROM keyed
)
SELECT doc_id, w, es_key, CAST(pick AS INT) AS pick
FROM ranked WHERE pick <= {_WS_K} ORDER BY pick
"""


@_register("corpus_weighted_sample", oracle=_WS_ORACLE)
def q_corpus_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible weighted sampling without replacement (top-25 by
    u^(1/w), w = n_chars): the one-pass distributed algorithm, keys on
    the same deterministic md5 keyspace as every sampling decision."""
    from crawler_ai_spark.pipeline.corpus import weighted_sample

    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return weighted_sample(
        docs, F.col("n_chars").cast("double"), k=_WS_K
    ).orderBy("pick")


# ---------------------------------------------------------------------------
# KMV distinct-count sketches (operators/anf.py: kmv_distinct):
# mergeable per-host distinct-URL estimation — exact below k,
# (k-1)*2^48/kth above. The oracle computes the k smallest hashes per
# host in ONE pass; the Spark side's salted two-phase merge is provably
# identical (any global top-k hash is in its own salt's top-k). Hosts
# span both regimes: small hosts stay exact, one hot host saturates.
# ---------------------------------------------------------------------------

_KMV_K = 32

_KMV_ORACLE = f"""
WITH urls AS (
  SELECT 'kv' || (doc_id % 11) || '.example' AS host,
         CASE WHEN doc_id % 11 = 0
              THEN 'https://kv0.example/p/' || doc_id
              ELSE 'https://kv' || (doc_id % 11) || '.example/p/' || (doc_id % 17)
         END AS url
  FROM documents
),
hashed AS (
  SELECT DISTINCT host,
         ('0x' || substr(md5(url || ':anf'), 1, 12))::BIGINT AS h
  FROM urls
),
ranked AS (
  SELECT host, h, row_number() OVER (PARTITION BY host ORDER BY h) AS rk,
         count(*) OVER (PARTITION BY host) AS nd
  FROM hashed
)
SELECT host,
       CASE WHEN MAX(nd) < {_KMV_K} THEN CAST(MAX(nd) AS DOUBLE)
            ELSE {float(_KMV_K - 1):.17e} * {float(2**48):.17e}
                 / CAST(MAX(CASE WHEN rk = {_KMV_K} THEN h END) AS DOUBLE)
       END AS distinct_est
FROM ranked GROUP BY host ORDER BY host
"""


@_register("host_distinct_kmv", oracle=_KMV_ORACLE)
def q_host_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host distinct-URL estimates from mergeable KMV sketches —
    the incremental-crawl accounting primitive (union of per-batch
    sketches = sketch of the union). Two salted short-row shuffles."""
    from crawler_ai_spark.operators.anf import kmv_distinct

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    urls = docs.select(
        F.concat(F.lit("kv"), (d % 11).cast("string"), F.lit(".example")).alias(
            "host"
        ),
        F.when(
            d % 11 == 0,
            F.concat(F.lit("https://kv0.example/p/"), d.cast("string")),
        )
        .otherwise(
            F.concat(
                F.lit("https://kv"), (d % 11).cast("string"),
                F.lit(".example/p/"), (d % 17).cast("string"),
            )
        )
        .alias("url"),
    )
    return (
        kmv_distinct(urls, "host", "url", k=_KMV_K)
        .select("host", "distinct_est")
        .orderBy("host")
    )


# ---------------------------------------------------------------------------
# Host-graph summary (one-row report over the synth graph): edge and
# host counts, reciprocity (share of edges whose reverse exists — link
# exchanges reciprocate, organic linking mostly doesn't), max/mean
# out-degree. All integer-exact except mean (exact division).
# ---------------------------------------------------------------------------

_GSTAT_ORACLE = """
WITH hosts AS (SELECT range AS host FROM range(37)),
synth AS (
  SELECT DISTINCT doc_id % 37 AS src, (doc_id // 37) % 37 AS dst
  FROM documents
  WHERE ((doc_id * 1103515245 + 12345) % 101) < 29
    AND (doc_id % 37) != ((doc_id // 37) % 37)),
ring AS (SELECT host AS src, (host + 1) % 37 AS dst FROM hosts),
e AS (SELECT DISTINCT src, dst FROM (SELECT * FROM synth UNION ALL SELECT * FROM ring)),
recip AS (
  SELECT count(*) AS n_recip
  FROM e a JOIN e b ON a.src = b.dst AND a.dst = b.src),
deg AS (SELECT src, count(*) AS d FROM e GROUP BY src)
SELECT CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
       CAST((SELECT count(*) FROM hosts) AS BIGINT) AS n_hosts,
       CAST((SELECT n_recip FROM recip) AS BIGINT) AS n_reciprocal,
       CAST((SELECT n_recip FROM recip) AS DOUBLE)
         / (SELECT count(*) FROM e) AS reciprocity,
       CAST((SELECT max(d) FROM deg) AS BIGINT) AS max_outdeg,
       CAST((SELECT count(*) FROM e) AS DOUBLE)
         / (SELECT count(*) FROM deg) AS mean_outdeg
"""


@_register("host_graph_stats", oracle=_GSTAT_ORACLE)
def q_host_graph_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row host-graph report: edges, hosts, reciprocity (the
    link-exchange signal), max/mean out-degree. Self-join on the edge
    key + two tiny aggregates."""
    from crawler_ai_spark.queries.crawl import synth_host_edges

    edges, hosts = synth_host_edges(spark, sf_dir)
    edges = edges.persist()
    rev = edges.select(F.col("src").alias("dst"), F.col("dst").alias("src"))
    n_recip = edges.join(rev, ["src", "dst"]).count()
    n_edges = edges.count()
    n_hosts = hosts.count()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    stats = deg.agg(
        F.max("d").alias("max_outdeg"), F.count(F.lit(1)).alias("n_src")
    ).collect()[0]
    return spark.createDataFrame(
        [
            (
                n_edges,
                n_hosts,
                n_recip,
                float(n_recip) / n_edges,
                stats.max_outdeg,
                float(n_edges) / stats.n_src,
            )
        ],
        "n_edges long, n_hosts long, n_reciprocal long, reciprocity double,"
        " max_outdeg long, mean_outdeg double",
    )


# ---------------------------------------------------------------------------
# Declared mirror election (operators/mirrors.py:
# mirror_canonical_declared): robots Host directives override the
# lexicographic mirror heuristic — pair class 0 declares its www
# partner canonical (beating the heuristic, which would pick the bare
# host), class 1 declares a FOREIGN host (invalid: heuristic stands),
# class 2 declares nothing. DuckDB re-runs the precedence.
# ---------------------------------------------------------------------------

_MC_ORACLE = """
WITH pairs AS (
  SELECT DISTINCT 'm' || (doc_id % 29) || '.example' AS host_a,
         'www.m' || (doc_id % 29) || '.example' AS host_b,
         (doc_id % 29) % 3 AS cls
  FROM documents
),
edges AS (
  SELECT host_a AS host, host_b AS peer, cls FROM pairs
  UNION ALL
  SELECT host_b AS host, host_a AS peer, cls FROM pairs
),
base AS (
  SELECT host, LEAST(host, MIN(peer)) AS heuristic, MIN(cls) AS cls
  FROM edges GROUP BY host
)
SELECT host,
       CASE WHEN cls = 0 THEN 'www.' || CASE WHEN host LIKE 'www.%'
                                             THEN substr(host, 5) ELSE host END
            ELSE heuristic END AS canonical_host
FROM base ORDER BY host
"""


@_register("mirror_declared_canonical", oracle=_MC_ORACLE)
def q_mirror_declared_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mirror-host election with publisher declarations: valid Host
    directives (naming a neighborhood member) win, foreign claims are
    ignored, silence falls back to the lexicographic heuristic."""
    from crawler_ai_spark.operators.mirrors import mirror_canonical_declared

    docs = _t(spark, sf_dir, "documents").select(
        (F.col("doc_id") % 29).alias("n")
    ).distinct()
    bare = F.concat(F.lit("m"), F.col("n").cast("string"), F.lit(".example"))
    www = F.concat(F.lit("www.m"), F.col("n").cast("string"), F.lit(".example"))
    pairs = docs.select(bare.alias("host_a"), www.alias("host_b"))
    cls = F.col("n") % 3
    prefs = docs.select(
        bare.alias("host"),
        F.when(cls == 0, www)
        .when(cls == 1, F.lit("foreign.example"))
        .otherwise(F.lit(None).cast("string"))
        .alias("preferred_host"),
    )
    return mirror_canonical_declared(pairs, prefs).orderBy("host")


# ---------------------------------------------------------------------------
# Token-budget manifest cut (pipeline/corpus.py: cut_token_budget):
# keep the longest prefix of the deterministic shuffle order totaling
# <= budget tokens — the final act of a data recipe ("train on the
# first N tokens of the shuffled corpus"). DuckDB re-derives the
# shuffle keys, the two-phase running totals and the cut.
# ---------------------------------------------------------------------------

_CUT_BUDGET = 8000

_CUT_ORACLE = f"""
WITH toksed AS (
  SELECT doc_id,
         CASE WHEN length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) = 0
              THEN 0
              ELSE len(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' '))
         END AS n_tokens,
         md5(doc_id || ':shuffle-v1') AS skey
  FROM documents
),
sharded AS (
  SELECT doc_id, n_tokens, skey,
         ('0x' || substr(skey, 1, 4))::BIGINT % 8 AS shard_id
  FROM toksed
),
pos AS (
  SELECT *, row_number() OVER (PARTITION BY shard_id ORDER BY skey) AS position
  FROM sharded
),
run AS (
  SELECT doc_id, shard_id, position, n_tokens,
         SUM(n_tokens) OVER (ORDER BY shard_id, position) AS running_total
  FROM pos
)
SELECT doc_id, CAST(shard_id AS INT) AS shard_id,
       CAST(position AS INT) AS position,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(running_total AS BIGINT) AS running_total
FROM run WHERE running_total <= {_CUT_BUDGET}
ORDER BY shard_id, position
"""


@_register("corpus_token_budget_cut", oracle=_CUT_ORACLE)
def q_corpus_token_budget_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cut the shuffled corpus at an 8k-token budget: two-phase running
    totals (per-shard offsets broadcast + bounded within-shard
    cumsum), no single-partition window."""
    from crawler_ai_spark.pipeline.corpus import _toks, cut_token_budget
    from crawler_ai_spark.pipeline.textstats import norm_text

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    n_tok = F.when(F.length(norm_text(F.col("text"))) == 0, F.lit(0)).otherwise(
        F.size(_toks(F.col("text")))
    )
    skey = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":shuffle-v1")))
    sharded = docs.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        skey.alias("skey"),
        (F.conv(F.substring(skey, 1, 4), 16, 10).cast("long") % 8)
        .cast("int")
        .alias("shard_id"),
    )
    from pyspark.sql import Window as W

    pos = sharded.withColumn(
        "position",
        F.row_number().over(W.partitionBy("shard_id").orderBy("skey")).cast("int"),
    ).drop("skey")
    return (
        cut_token_budget(pos, _CUT_BUDGET)
        .select("doc_id", "shard_id", "position", "n_tokens", "running_total")
        .orderBy("shard_id", "position")
    )


# ---------------------------------------------------------------------------
# Response-size anomaly flags (operators/autothrottle.py:
# size_anomalies): Iglewicz-Hoaglin modified z-score over exact
# rank-based median/MAD — the size-side complement to the soft-404
# content gate. Synth sizes cluster per host with planted error-page
# and tarpit outliers plus one ZERO-MAD host; DuckDB recomputes the
# lower-medians, MAD and flags.
# ---------------------------------------------------------------------------

_SZ_ORACLE = """
WITH f AS (
  SELECT 'sz' || (doc_id % 5) || '.example' AS host,
         'https://sz' || (doc_id % 5) || '.example/p/' || doc_id AS url,
         CAST(CASE WHEN doc_id % 5 = 4 THEN 5000
                   WHEN doc_id % 37 = 0 THEN 300
                   WHEN doc_id % 41 = 0 THEN 9000000
                   ELSE 40000 + (doc_id % 7) * 100 END AS BIGINT) AS n_bytes
  FROM documents
),
med AS (
  SELECT host, n_bytes AS host_median FROM (
    SELECT host, n_bytes,
           row_number() OVER (PARTITION BY host ORDER BY n_bytes, url) AS rk,
           count(*) OVER (PARTITION BY host) AS n
    FROM f) WHERE rk = CAST(ceil(n / 2.0) AS BIGINT)
),
dev AS (
  SELECT f.host, f.url, f.n_bytes, m.host_median,
         abs(f.n_bytes - m.host_median) AS adev
  FROM f JOIN med m ON f.host = m.host
),
mad AS (
  SELECT host, adev AS host_mad FROM (
    SELECT host, adev, url,
           row_number() OVER (PARTITION BY host ORDER BY adev, url) AS dk,
           count(*) OVER (PARTITION BY host) AS n
    FROM dev) WHERE dk = CAST(ceil(n / 2.0) AS BIGINT)
)
SELECT d.host, d.url, d.n_bytes,
       CAST(d.host_median AS BIGINT) AS host_median,
       CAST(m.host_mad AS BIGINT) AS host_mad,
       CASE WHEN m.host_mad > 0
            THEN round(0.6745 * d.adev / m.host_mad, 6) END AS mod_z,
       CASE WHEN m.host_mad > 0
            THEN round(0.6745 * d.adev / m.host_mad, 6) > 3.5
            ELSE d.n_bytes != d.host_median END AS anomalous
FROM dev d JOIN mad m ON d.host = m.host
ORDER BY d.url
"""


@_register("fetch_size_anomalies", oracle=_SZ_ORACLE)
def q_fetch_size_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-fetch size anomaly flags via exact median/MAD modified
    z-scores — deterministic rank statistics, two bounded windows."""
    from crawler_ai_spark.operators.autothrottle import size_anomalies

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    fetches = docs.select(
        F.concat(F.lit("sz"), (d % 5).cast("string"), F.lit(".example")).alias(
            "host"
        ),
        F.concat(
            F.lit("https://sz"), (d % 5).cast("string"), F.lit(".example/p/"),
            d.cast("string"),
        ).alias("url"),
        F.when(d % 5 == 4, 5000)
        .when(d % 37 == 0, 300)
        .when(d % 41 == 0, 9000000)
        .otherwise(40000 + (d % 7) * 100)
        .cast("long")
        .alias("n_bytes"),
    )
    return size_anomalies(fetches).orderBy("url")


# ---------------------------------------------------------------------------
# Power-law tail exponent of the in-degree distribution — the Hill
# estimator alpha = 1 + n / sum(ln(d_i / d_min)) over degrees >= d_min:
# the classic scale-free-web diagnostic (alpha ~ 2.1 for real web
# in-degrees; a link farm's synthetic graph deviates). Deterministic:
# the ln-sum folds in (degree, host)-sorted order and rounds 6 dp.
# ---------------------------------------------------------------------------

_HILL_DMIN = 2

_HILL_ORACLE = f"""
WITH hosts AS (SELECT range AS host FROM range(37)),
synth AS (
  SELECT DISTINCT doc_id % 37 AS src, (doc_id // 37) % 37 AS dst
  FROM documents
  WHERE ((doc_id * 1103515245 + 12345) % 101) < 29
    AND (doc_id % 37) != ((doc_id // 37) % 37)),
ring AS (SELECT host AS src, (host + 1) % 37 AS dst FROM hosts),
e AS (SELECT DISTINCT src, dst FROM (SELECT * FROM synth UNION ALL SELECT * FROM ring)),
deg AS (SELECT dst AS host, count(*) AS d FROM e GROUP BY dst),
tail AS (SELECT host, d FROM deg WHERE d >= {_HILL_DMIN})
SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_hosts_linked,
       CAST((SELECT count(*) FROM tail) AS BIGINT) AS n_tail,
       round({1.0:.17e} + (SELECT count(*) FROM tail)
             / (SELECT list_reduce(
                    list_prepend({0.0:.17e},
                                 list(ln(CAST(d AS DOUBLE) / {float(_HILL_DMIN):.17e})
                                      ORDER BY d, host)),
                    (a, v) -> a + v) FROM tail), 6) AS alpha
"""


@_register("host_indegree_powerlaw", oracle=_HILL_ORACLE)
def q_host_indegree_powerlaw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill tail-exponent estimate over host in-degrees: one degree
    aggregation + one sorted ln-fold."""
    from crawler_ai_spark.queries.crawl import synth_host_edges

    edges, hosts = synth_host_edges(spark, sf_dir)
    deg = edges.groupBy("dst").agg(F.count(F.lit(1)).alias("d")).withColumnRenamed(
        "dst", "host"
    )
    tail = deg.where(F.col("d") >= _HILL_DMIN)
    agg = tail.agg(
        F.count(F.lit(1)).cast("long").alias("n_tail"),
        F.expr(
            f"aggregate(array_sort(collect_list(struct(d, host))),"
            f" cast(0.0 as double),"
            f" (acc, x) -> acc + ln(cast(x.d as double) / {float(_HILL_DMIN)!r}))"
        ).alias("lnsum"),
    )
    n_linked = deg.count()
    return agg.select(
        F.lit(n_linked).cast("long").alias("n_hosts_linked"),
        "n_tail",
        F.round(F.lit(1.0) + F.col("n_tail") / F.col("lnsum"), 6).alias("alpha"),
    )


# ---------------------------------------------------------------------------
# BM25F field-weighted retrieval (pipeline/retrieval.py: bm25f_topk):
# title hits outweigh body hits via pooled, per-field-normalized term
# frequencies saturated ONCE (the Robertson/Zaragoza construction).
# Synth titles = 'guide' + the doc's first 3 body tokens at weight 3 vs
# body weight 1; the query includes 'guide' (title-only) and two body
# terms. DuckDB rebuilds both field indexes, the pooled tf~, idf and
# the saturated fold.
# ---------------------------------------------------------------------------

_BM25F_TERMS = ("guide", "spark", "window")
_BM25F_K1, _BM25F_B = 1.2, 0.75
_BM25F_WT, _BM25F_WB = 3.0, 1.0

_BM25F_ORACLE = f"""
WITH toksed AS (
  SELECT doc_id,
         list_filter(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' '),
                     t -> t <> '') AS btoks
  FROM documents WHERE text IS NOT NULL
),
fields AS (
  SELECT doc_id, btoks,
         list_prepend('guide', btoks[1:3]) AS ttoks
  FROM toksed
),
q AS (SELECT unnest({list(_BM25F_TERMS)!r}) AS term),
bpost AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(btoks) AS term FROM fields)
  JOIN q USING (term) GROUP BY doc_id, term),
tpost AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(ttoks) AS term FROM fields)
  JOIN q USING (term) GROUP BY doc_id, term),
bdl AS (SELECT doc_id, len(btoks) AS dl FROM fields),
tdl AS (SELECT doc_id, len(ttoks) AS dl FROM fields),
bavg AS (SELECT avg(dl) AS avgdl FROM bdl),
tavg AS (SELECT avg(dl) AS avgdl FROM tdl),
bw AS (
  SELECT p.doc_id, p.term,
         {_BM25F_WB:.17e} * CAST(p.tf AS DOUBLE)
           / ({1.0 - _BM25F_B:.17e} + {_BM25F_B:.17e} * d.dl / a.avgdl) AS wtf
  FROM bpost p JOIN bdl d USING (doc_id), bavg a),
tw AS (
  SELECT p.doc_id, p.term,
         {_BM25F_WT:.17e} * CAST(p.tf AS DOUBLE)
           / ({1.0 - _BM25F_B:.17e} + {_BM25F_B:.17e} * d.dl / a.avgdl) AS wtf
  FROM tpost p JOIN tdl d USING (doc_id), tavg a),
tft AS (
  SELECT COALESCE(bw.doc_id, tw.doc_id) AS doc_id,
         COALESCE(bw.term, tw.term) AS term,
         {0.0:.17e} + COALESCE(bw.wtf, {0.0:.17e}) + COALESCE(tw.wtf, {0.0:.17e})
           AS tft
  FROM bw FULL OUTER JOIN tw ON bw.doc_id = tw.doc_id AND bw.term = tw.term),
dft AS (SELECT term, count(*) AS df FROM tft GROUP BY term),
nd AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents)
SELECT doc_id,
       round(list_reduce(
         list_prepend({0.0:.17e},
           list(ln({1.0:.17e} + (nd.n_docs - dft.df + {0.5:.17e}) / (dft.df + {0.5:.17e}))
                * tft.tft / ({_BM25F_K1:.17e} + tft.tft)
                ORDER BY tft.term)),
         (a, v) -> a + v), 6) AS score,
       CAST(count(*) AS BIGINT) AS n_matched
FROM tft JOIN dft USING (term), nd
GROUP BY doc_id, nd.n_docs
ORDER BY score DESC, doc_id LIMIT 20
"""


@_register("bm25f_topk", oracle=_BM25F_ORACLE)
def q_bm25f_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field-weighted retrieval over (title x3, body x1): pooled
    per-field-normalized tf saturated once per term."""
    from crawler_ai_spark.pipeline.retrieval import _clean_tokens, bm25f_topk

    docs = _t(spark, sf_dir, "documents").where("text IS NOT NULL")
    btoks = _clean_tokens(F.col("text"))
    docs2 = docs.select(
        "doc_id",
        "text",
        F.array_join(
            F.concat(F.array(F.lit("guide")), F.slice(btoks, 1, 3)), " "
        ).alias("title"),
    )
    return bm25f_topk(
        docs2,
        list(_BM25F_TERMS),
        fields={"title": _BM25F_WT, "text": _BM25F_WB},
        k=20,
        k1=_BM25F_K1,
        b=_BM25F_B,
    ).orderBy(F.desc("score"), "doc_id")


# ---------------------------------------------------------------------------
# Reciprocal rank fusion (pipeline/retrieval.py: rrf_fuse): hybrid
# search — fuse a BM25 lexical ranking with an embedding ranking, no
# score calibration. Lexical side = bm25 over documents for fixed
# terms; vector side = cosine ranks for query vec 0 mapped onto doc ids
# (vec_id shares the id space at this SF). DuckDB rebuilds both
# rankings and the fused fold.
# ---------------------------------------------------------------------------

_RRF_TERMS = ("spark", "window", "join")

def _rrf_oracle() -> str:
    from crawler_ai_spark.queries.embeddings import _COS_SQL
    from crawler_ai_spark.queries.seventhwave import _BM25_ORACLE  # noqa: F401

    return f"""
WITH toksed AS (
  SELECT doc_id,
         list_filter(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' '),
                     t -> t <> '') AS toks
  FROM documents WHERE text IS NOT NULL
),
ex AS (SELECT doc_id, unnest(toks) AS term FROM toksed),
dl AS (SELECT doc_id, len(toks) AS dl FROM toksed),
post AS (SELECT doc_id, term, count(*) AS tf FROM ex GROUP BY doc_id, term),
q AS (SELECT unnest({list(_RRF_TERMS)!r}) AS term),
m AS (SELECT p.doc_id, p.term, p.tf FROM post p JOIN q USING (term)),
dft AS (SELECT term, count(*) AS df FROM m GROUP BY term),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
lex AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
  FROM (
    SELECT m.doc_id,
           round(sum(
             ln(1 + (n_docs - df + 0.5) / (df + 0.5))
             * CAST(tf AS DOUBLE) * 2.2
             / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * dl / avgdl))
           ), 6) AS score
    FROM m JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
    GROUP BY m.doc_id ORDER BY score DESC, m.doc_id LIMIT 20)
),
vec AS (
  SELECT neighbor_id AS doc_id,
         row_number() OVER (ORDER BY cosine DESC, neighbor_id) AS rank
  FROM (
    SELECT b.vec_id AS neighbor_id, {_COS_SQL} AS cosine
    FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id = 0) a,
         embeddings b
    ORDER BY cosine DESC, neighbor_id LIMIT 20)
),
uni AS (
  SELECT doc_id, 0 AS ri, 1.0 / (60.0 + rank) AS c FROM lex
  UNION ALL
  SELECT doc_id, 1 AS ri, 1.0 / (60.0 + rank) AS c FROM vec
),
fused AS (
  SELECT doc_id,
         round(list_reduce(list_prepend({0.0:.17e}, list(c ORDER BY ri)),
                           (a, v) -> a + v), 9) AS rrf_score,
         CAST(count(*) AS BIGINT) AS n_rankings
  FROM uni GROUP BY doc_id
)
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS INT)
         AS fused_rank,
       rrf_score, n_rankings
FROM fused
QUALIFY fused_rank <= 20
ORDER BY fused_rank
"""


@_register("hybrid_rrf_topk", oracle=_rrf_oracle())
def q_hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-20 fused with the cosine top-20 of
    query vector 0 by reciprocal rank — no score calibration needed."""
    from crawler_ai_spark.pipeline.retrieval import bm25_topk, rrf_fuse
    from crawler_ai_spark.pipeline.similarity import cosine_topk

    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents").where("text IS NOT NULL")
    emb = _t(spark, sf_dir, "embeddings")
    lex = bm25_topk(docs, list(_RRF_TERMS), k=20)
    w = Window.orderBy(F.desc("score"), F.col("doc_id"))
    lex = lex.withColumn("rank", F.row_number().over(w)).select("doc_id", "rank")
    queries = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    vec = (
        cosine_topk(queries, emb, k=20, q_id="query_id")
        .select(F.col("neighbor_id").alias("doc_id"), "rank")
    )
    return rrf_fuse([lex, vec], k=60, top=20).orderBy("fused_rank")


# ---------------------------------------------------------------------------
# nDCG@10 (pipeline/retrieval.py: ndcg_at_k): ranking-quality
# evaluation — DCG over the produced ranking vs the ideal gain-sorted
# ranking. Synth runs: 7 queries whose rankings interleave relevant and
# irrelevant docs deterministically; one query has NO positive qrels
# (nDCG undefined -> NULL). DuckDB recomputes both folds.
# ---------------------------------------------------------------------------

_NDCG_ORACLE = """
WITH runs AS (
  SELECT doc_id % 7 AS query_id, doc_id AS doc_id,
         CAST(row_number() OVER (PARTITION BY doc_id % 7 ORDER BY doc_id) AS INT)
           AS rank
  FROM documents
),
qrels AS (
  SELECT doc_id % 7 AS query_id, doc_id,
         CASE WHEN doc_id % 7 = 6 THEN 0.0
              WHEN doc_id % 3 = 0 THEN 2.0
              WHEN doc_id % 5 = 0 THEN 1.0
              ELSE 0.0 END AS rel
  FROM documents
),
gained AS (
  SELECT r.query_id, r.rank,
         COALESCE(q.rel, 0.0) / log2(r.rank + 1.0) AS g
  FROM runs r LEFT JOIN qrels q USING (query_id, doc_id)
  WHERE r.rank <= 10
),
dcg AS (
  SELECT query_id,
         list_reduce(list_prepend(0.0, list(g ORDER BY rank)), (a, v) -> a + v)
           AS dcg
  FROM gained GROUP BY query_id
),
ideal AS (
  SELECT query_id,
         list_reduce(list_prepend(0.0, list(rel / log2(irank + 1.0) ORDER BY irank)),
                     (a, v) -> a + v) AS idcg
  FROM (
    SELECT query_id, rel,
           row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, doc_id)
             AS irank
    FROM qrels WHERE rel > 0)
  WHERE irank <= 10 GROUP BY query_id
)
SELECT d.query_id, round(d.dcg, 6) AS dcg, round(i.idcg, 6) AS idcg,
       CASE WHEN i.idcg > 0 THEN round(d.dcg / i.idcg, 6) END AS ndcg
FROM dcg d LEFT JOIN ideal i USING (query_id)
ORDER BY d.query_id
"""


@_register("retrieval_ndcg", oracle=_NDCG_ORACLE)
def q_retrieval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 per query over synthesized runs/qrels — the evaluation
    loop a retrieval stack at scale needs next to its indexes."""
    from pyspark.sql import Window

    from crawler_ai_spark.pipeline.retrieval import ndcg_at_k

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    w = Window.partitionBy((d % 7)).orderBy("doc_id")
    runs = docs.select(
        (d % 7).alias("query_id"), "doc_id",
        F.row_number().over(w).cast("int").alias("rank"),
    )
    qrels = docs.select(
        (d % 7).alias("query_id"), "doc_id",
        F.when(d % 7 == 6, 0.0)
        .when(d % 3 == 0, 2.0)
        .when(d % 5 == 0, 1.0)
        .otherwise(0.0)
        .alias("rel"),
    )
    return ndcg_at_k(runs, qrels, k=10).orderBy("query_id")


# ---------------------------------------------------------------------------
# Degree assortativity (Newman 2002): the Pearson correlation of
# out-degrees across edge endpoints — organic webs are DISassortative
# (hubs link to leaves, r < 0), link farms assort (r ~ 1). Exact
# integer sums (degrees are ints, moments are integer sums folded
# (src,dst)-sorted) with one final rounded division.
# ---------------------------------------------------------------------------

_ASSORT_ORACLE = """
WITH hosts AS (SELECT range AS host FROM range(37)),
synth AS (
  SELECT DISTINCT doc_id % 37 AS src, (doc_id // 37) % 37 AS dst
  FROM documents
  WHERE ((doc_id * 1103515245 + 12345) % 101) < 29
    AND (doc_id % 37) != ((doc_id // 37) % 37)),
ring AS (SELECT host AS src, (host + 1) % 37 AS dst FROM hosts),
e AS (SELECT DISTINCT src, dst FROM (SELECT * FROM synth UNION ALL SELECT * FROM ring)),
deg AS (SELECT src AS v, count(*) AS d FROM e GROUP BY src),
pairs AS (
  SELECT ds.d AS x, dd.d AS y
  FROM e JOIN deg ds ON e.src = ds.v JOIN deg dd ON e.dst = dd.v),
mom AS (
  SELECT CAST(count(*) AS DOUBLE) AS m,
         CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
         CAST(sum(x * y) AS DOUBLE) AS sxy,
         CAST(sum(x * x) AS DOUBLE) AS sxx,
         CAST(sum(y * y) AS DOUBLE) AS syy
  FROM pairs)
SELECT CAST(m AS BIGINT) AS n_edges,
       round((m * sxy - sx * sy)
             / (sqrt(m * sxx - sx * sx) * sqrt(m * syy - sy * sy)), 6)
         AS assortativity
FROM mom
"""


@_register("host_assortativity", oracle=_ASSORT_ORACLE)
def q_host_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-degree assortativity over edges both of whose endpoints have
    out-degree (the ring guarantees all do): integer moment sums, one
    rounded Pearson quotient."""
    from crawler_ai_spark.queries.crawl import synth_host_edges

    edges, hosts = synth_host_edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d")).withColumnRenamed(
        "src", "v"
    )
    pairs = (
        edges.join(deg.withColumnRenamed("v", "src").withColumnRenamed("d", "x"), "src")
        .join(deg.withColumnRenamed("v", "dst").withColumnRenamed("d", "y"), "dst")
        .select("x", "y")
    )
    mom = pairs.agg(
        F.count(F.lit(1)).cast("double").alias("m"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    return mom.select(
        F.col("m").cast("long").alias("n_edges"),
        F.round(
            (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (
                F.sqrt(F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * F.sqrt(F.col("m") * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("assortativity"),
    )


# ---------------------------------------------------------------------------
# MRR + MAP@10 (pipeline/retrieval.py: mrr_map_at_k): same runs/qrels
# shape as retrieval_ndcg — together the standard evaluation trio.
# The per-query fold carries (first-hit reciprocal, precision sum,
# hits-so-far) through the rank-sorted stream; DuckDB re-runs the
# identical stateful fold.
# ---------------------------------------------------------------------------

_MRR_ORACLE = """
WITH runs AS (
  SELECT doc_id % 7 AS query_id, doc_id,
         CAST(row_number() OVER (PARTITION BY doc_id % 7 ORDER BY doc_id) AS INT)
           AS rank
  FROM documents
),
qrels AS (
  SELECT doc_id % 7 AS query_id, doc_id,
         CASE WHEN doc_id % 7 = 6 THEN 0.0
              WHEN doc_id % 3 = 0 THEN 2.0
              WHEN doc_id % 5 = 0 THEN 1.0
              ELSE 0.0 END AS rel
  FROM documents
),
hits AS (
  SELECT r.query_id, r.rank,
         CASE WHEN q.rel IS NOT NULL THEN 1 ELSE 0 END AS is_rel
  FROM runs r
  LEFT JOIN (SELECT query_id, doc_id, rel FROM qrels WHERE rel > 0) q
    USING (query_id, doc_id)
  WHERE r.rank <= 10
),
folded AS (
  SELECT query_id,
         list_reduce(
           list_prepend({'rr': 0.0, 'psum': 0.0, 'nrel': 0},
             list({'rr': CAST(NULL AS DOUBLE), 'psum': CAST(is_rel AS DOUBLE),
                   'nrel': rank} ORDER BY rank)),
           (acc, x) -> {
             'rr': CASE WHEN acc.nrel = 0 AND x.psum = 1.0
                        THEN 1.0 / x.nrel ELSE acc.rr END,
             'psum': acc.psum + CASE WHEN x.psum = 1.0
                        THEN CAST(acc.nrel + 1 AS DOUBLE) / x.nrel ELSE 0.0 END,
             'nrel': acc.nrel + CAST(x.psum AS INT)
           }) AS s
  FROM hits GROUP BY query_id
),
nrel AS (
  SELECT query_id, count(*) AS n_rel_total FROM qrels WHERE rel > 0 GROUP BY query_id
)
SELECT f.query_id,
       round(COALESCE(f.s.rr, 0.0), 6) AS mrr,
       round(CASE WHEN COALESCE(n.n_rel_total, 0) > 0
                  THEN f.s.psum / LEAST(10, n.n_rel_total)
                  ELSE 0.0 END, 6) AS ap
FROM folded f LEFT JOIN nrel n USING (query_id)
ORDER BY f.query_id
"""


@_register("retrieval_mrr_map", oracle=_MRR_ORACLE)
def q_retrieval_mrr_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR and MAP@10 per query over the same synthesized runs/qrels as
    retrieval_ndcg — one rank-sorted stateful fold per query."""
    from pyspark.sql import Window

    from crawler_ai_spark.pipeline.retrieval import mrr_map_at_k

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    w = Window.partitionBy((d % 7)).orderBy("doc_id")
    runs = docs.select(
        (d % 7).alias("query_id"), "doc_id",
        F.row_number().over(w).cast("int").alias("rank"),
    )
    qrels = docs.select(
        (d % 7).alias("query_id"), "doc_id",
        F.when(d % 7 == 6, 0.0)
        .when(d % 3 == 0, 2.0)
        .when(d % 5 == 0, 1.0)
        .otherwise(0.0)
        .alias("rel"),
    )
    return mrr_map_at_k(runs, qrels, k=10).orderBy("query_id")


# ---------------------------------------------------------------------------
# Lexical diversity (type-token ratio + hapax share): the curation
# signal quality scores miss — keyword-stuffed spam repeats a tiny
# vocabulary (low TTR), template boilerplate has few hapaxes. Pure
# row-local array arithmetic; exact integer ratios.
# ---------------------------------------------------------------------------

_LEX_ORACLE = """
WITH toksed AS (
  SELECT doc_id,
         CASE WHEN length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) = 0
              THEN CAST([] AS VARCHAR[])
              ELSE string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')
         END AS toks
  FROM documents
),
per AS (
  SELECT doc_id, len(toks) AS n_tokens,
         len(list_distinct(toks)) AS n_types,
         len(list_filter(list_distinct(toks),
             t -> len(list_filter(toks, u -> u = t)) = 1)) AS n_hapax
  FROM toksed
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_types AS BIGINT) AS n_types,
       CAST(n_hapax AS BIGINT) AS n_hapax,
       CASE WHEN n_tokens > 0 THEN CAST(n_types AS DOUBLE) / n_tokens END AS ttr,
       CASE WHEN n_types > 0 THEN CAST(n_hapax AS DOUBLE) / n_types END AS hapax_share
FROM per ORDER BY doc_id
"""


@_register("doc_lexical_diversity", oracle=_LEX_ORACLE)
def q_doc_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-token ratio and hapax share per doc — zero shuffle, exact
    integer ratios (keyword stuffing scores low TTR, templates few
    hapaxes)."""
    from crawler_ai_spark.pipeline.corpus import _toks
    from crawler_ai_spark.pipeline.textstats import norm_text

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.when(
        F.length(norm_text(F.col("text"))) == 0,
        F.array().cast("array<string>"),
    ).otherwise(_toks(F.col("text")))
    base = docs.select("doc_id", toks.alias("toks"))
    n_tokens = F.size("toks")
    types = F.array_distinct("toks")
    n_types = F.size(types)
    n_hapax = F.size(
        F.filter(
            types,
            lambda t: F.size(F.filter(F.col("toks"), lambda u: u == t)) == 1,
        )
    )
    return base.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        n_types.cast("long").alias("n_types"),
        n_hapax.cast("long").alias("n_hapax"),
        F.when(n_tokens > 0, n_types.cast("double") / n_tokens).alias("ttr"),
        F.when(n_types > 0, n_hapax.cast("double") / n_types).alias("hapax_share"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Zipf tail exponent over the corpus term-frequency distribution —
# the Hill estimator again, on the text side: natural corpora sit near
# alpha ~ 2 (Zipf s ~ 1); machine-generated/boilerplate-heavy corpora
# deviate. One vocabulary-grain count shuffle + one sorted ln-fold.
# ---------------------------------------------------------------------------

_ZIPF_FMIN = 3

_ZIPF_ORACLE = f"""
WITH toksed AS (
  SELECT doc_id,
         list_filter(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' '),
                     t -> t <> '') AS toks
  FROM documents WHERE text IS NOT NULL
),
tf AS (
  SELECT term, count(*) AS f
  FROM (SELECT unnest(toks) AS term FROM toksed) GROUP BY term
),
tail AS (SELECT term, f FROM tf WHERE f >= {_ZIPF_FMIN})
SELECT CAST((SELECT count(*) FROM tf) AS BIGINT) AS vocab,
       CAST((SELECT count(*) FROM tail) AS BIGINT) AS n_tail,
       round({1.0:.17e} + (SELECT count(*) FROM tail)
             / (SELECT list_reduce(
                    list_prepend({0.0:.17e},
                        list(ln(CAST(f AS DOUBLE) / {float(_ZIPF_FMIN):.17e})
                             ORDER BY f, term)),
                    (a, v) -> a + v) FROM tail), 6) AS alpha
"""


@_register("corpus_zipf_alpha", oracle=_ZIPF_ORACLE)
def q_corpus_zipf_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill tail exponent of the term-frequency distribution: vocab
    size, tail size at f >= 3, and alpha."""
    from crawler_ai_spark.pipeline.retrieval import _clean_tokens

    docs = _t(spark, sf_dir, "documents").where("text IS NOT NULL")
    tf = (
        docs.select(F.explode(_clean_tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    vocab = tf.count()
    tail = tf.where(F.col("f") >= _ZIPF_FMIN)
    agg = tail.agg(
        F.count(F.lit(1)).cast("long").alias("n_tail"),
        F.expr(
            f"aggregate(array_sort(collect_list(struct(f, term))),"
            f" cast(0.0 as double),"
            f" (acc, x) -> acc + ln(cast(x.f as double) / {float(_ZIPF_FMIN)!r}))"
        ).alias("lnsum"),
    )
    return agg.select(
        F.lit(vocab).cast("long").alias("vocab"),
        "n_tail",
        F.round(F.lit(1.0) + F.col("n_tail") / F.col("lnsum"), 6).alias("alpha"),
    )


# ---------------------------------------------------------------------------
# Heaps' law fit: vocabulary growth V = K * N^beta, estimated by
# ordinary least squares on (ln N, ln V) per-source points (each
# source contributes its token count and distinct-type count). Natural
# text sits near beta ~ 0.5; templated corpora flatten. Completes the
# corpus-law trio next to Zipf alpha and the degree power law. Sorted
# folds over the 20 source points; slope/intercept rounded 6 dp.
# ---------------------------------------------------------------------------

_HEAPS_ORACLE = """
WITH toksed AS (
  SELECT source,
         list_filter(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' '),
                     t -> t <> '') AS toks
  FROM documents WHERE text IS NOT NULL
),
ntok AS (SELECT source, CAST(sum(len(toks)) AS DOUBLE) AS n FROM toksed GROUP BY source),
vtyp AS (
  SELECT source, CAST(count(DISTINCT term) AS DOUBLE) AS v
  FROM (SELECT source, unnest(toks) AS term FROM toksed) GROUP BY source
),
per AS (SELECT ntok.source, ntok.n, vtyp.v FROM ntok JOIN vtyp USING (source)),
pts AS (SELECT source, ln(n) AS x, ln(v) AS y FROM per WHERE n > 0),
mom AS (
  SELECT CAST(count(*) AS DOUBLE) AS m,
         list_reduce(list_prepend(0.0, list(x ORDER BY source)), (a,b) -> a+b) AS sx,
         list_reduce(list_prepend(0.0, list(y ORDER BY source)), (a,b) -> a+b) AS sy,
         list_reduce(list_prepend(0.0, list(x*y ORDER BY source)), (a,b) -> a+b) AS sxy,
         list_reduce(list_prepend(0.0, list(x*x ORDER BY source)), (a,b) -> a+b) AS sxx
  FROM pts)
SELECT CAST(m AS BIGINT) AS n_points,
       round((m * sxy - sx * sy) / (m * sxx - sx * sx), 6) AS beta,
       round(exp((sy - ((m * sxy - sx * sy) / (m * sxx - sx * sx)) * sx) / m), 6)
         AS k_coef
FROM mom
"""


@_register("corpus_heaps_law", oracle=_HEAPS_ORACLE)
def q_corpus_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law OLS over per-source (tokens, types) points: beta and
    K. One token-grain distinct aggregation per source + a 20-point
    sorted-fold regression."""
    from crawler_ai_spark.pipeline.retrieval import _clean_tokens

    docs = _t(spark, sf_dir, "documents").where("text IS NOT NULL")
    ex = docs.select("source", F.explode(_clean_tokens(F.col("text"))).alias("term"))
    per = ex.groupBy("source").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.countDistinct("term").cast("double").alias("v"),
    )
    pts = per.where(F.col("n") > 0).select(
        "source", F.log("n").alias("x"), F.log("v").alias("y")
    )
    fold = lambda e: F.expr(  # noqa: E731
        f"aggregate(array_sort(collect_list(struct(source, {e}))),"
        f" cast(0.0 as double), (acc, t) -> acc + t.{e})"
    )
    mom = pts.select(
        "source", "x", "y",
        (F.col("x") * F.col("y")).alias("xy"),
        (F.col("x") * F.col("x")).alias("xx"),
    ).agg(
        F.count(F.lit(1)).cast("double").alias("m"),
        fold("x").alias("sx"),
        fold("y").alias("sy"),
        fold("xy").alias("sxy"),
        fold("xx").alias("sxx"),
    )
    slope = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return mom.select(
        F.col("m").cast("long").alias("n_points"),
        F.round(slope, 6).alias("beta"),
        F.round(F.exp((F.col("sy") - slope * F.col("sx")) / F.col("m")), 6).alias(
            "k_coef"
        ),
    )


# ---------------------------------------------------------------------------
# Gini coefficient of the per-host fetch allocation — scheduler
# fairness in one number: 0 = every host got equal fetches, -> 1 = one
# host took everything (exactly what politeness budgets exist to
# prevent; a rising Gini flags budget-starvation regressions). Exact:
# G = 2*sum(i * x_(i)) / (n * sum x) - (n + 1)/n over rank-sorted
# integer counts — a sorted fold, one rounded division.
# ---------------------------------------------------------------------------

_GINI_ORACLE = """
WITH alloc AS (
  SELECT 'g' || (doc_id % 13) || '.example' AS host, count(*) AS fetches
  FROM (SELECT CASE WHEN doc_id % 3 = 0 THEN 0 ELSE doc_id % 13 END AS doc_id
        FROM documents)
  GROUP BY host
),
ranked AS (
  SELECT fetches,
         row_number() OVER (ORDER BY fetches, host) AS i,
         count(*) OVER () AS n,
         sum(fetches) OVER () AS tot
  FROM alloc
)
SELECT CAST(MAX(n) AS BIGINT) AS n_hosts,
       CAST(MAX(tot) AS BIGINT) AS total_fetches,
       round(2.0 * sum(CAST(i AS DOUBLE) * fetches) / (MAX(n) * MAX(tot))
             - (MAX(n) + 1.0) / MAX(n), 6) AS gini
FROM ranked
"""


@_register("crawl_allocation_gini", oracle=_GINI_ORACLE)
def q_crawl_allocation_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fairness of the fetch allocation across hosts (synth allocation
    with a deliberately hot host): exact rank-weighted Gini."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    skewed = docs.select(
        F.when(d % 3 == 0, F.lit(0)).otherwise(d % 13).alias("hslot")
    )
    alloc = skewed.select(
        F.concat(F.lit("g"), F.col("hslot").cast("string"), F.lit(".example")).alias(
            "host"
        )
    ).groupBy("host").agg(F.count(F.lit(1)).alias("fetches"))
    w = Window.orderBy(F.col("fetches").asc(), F.col("host").asc())
    ranked = alloc.withColumn("i", F.row_number().over(w))
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_hosts"),
        F.sum("fetches").cast("long").alias("total_fetches"),
        F.round(
            F.lit(2.0)
            * F.sum(F.col("i").cast("double") * F.col("fetches"))
            / (F.count(F.lit(1)) * F.sum("fetches"))
            - (F.count(F.lit(1)) + F.lit(1.0)) / F.count(F.lit(1)),
            6,
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# URL structure histogram: path-depth x has-query distribution over a
# synthesized frontier — the crawl-shape diagnostic (a depth
# distribution with a fat deep tail means trap subspaces; a high
# query-string share means parameter churn for the DUST/Clean-param
# machinery). Exact integer counts and shares.
# ---------------------------------------------------------------------------

_URLHIST_ORACLE = """
WITH urls AS (
  SELECT 'https://u' || (doc_id % 9) || '.example' ||
         repeat('/seg', CAST(doc_id % 5 AS INT)) ||
         CASE WHEN doc_id % 4 = 0 THEN '/p?id=' || doc_id
              ELSE '/p' || doc_id END AS url
  FROM documents
),
feat AS (
  SELECT len(string_split(split_part(split_part(url, '://', 2), '?', 1), '/')) - 1
           AS path_depth,
         contains(url, '?') AS has_query
  FROM urls
),
hist AS (
  SELECT path_depth, has_query, count(*) AS n FROM feat GROUP BY 1, 2
),
tot AS (SELECT CAST(sum(n) AS DOUBLE) AS t FROM hist)
SELECT CAST(path_depth AS INT) AS path_depth, has_query,
       CAST(n AS BIGINT) AS n, n / tot.t AS share
FROM hist, tot ORDER BY path_depth, has_query
"""


@_register("url_structure_histogram", oracle=_URLHIST_ORACLE)
def q_url_structure_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path-depth x query-string histogram over the synth frontier —
    one map pass + a tiny aggregate."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    url = F.concat(
        F.lit("https://u"), (d % 9).cast("string"), F.lit(".example"),
        F.repeat(F.lit("/seg"), (d % 5).cast("int")),
        F.when(
            d % 4 == 0, F.concat(F.lit("/p?id="), d.cast("string"))
        ).otherwise(F.concat(F.lit("/p"), d.cast("string"))),
    )
    feat = docs.select(
        (
            F.size(
                F.split(
                    F.split_part(
                        F.split_part(url, F.lit("://"), F.lit(2)),
                        F.lit("?"),
                        F.lit(1),
                    ),
                    "/",
                )
            )
            - 1
        ).alias("path_depth"),
        url.contains("?").alias("has_query"),
    )
    hist = feat.groupBy("path_depth", "has_query").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = hist.agg(F.sum("n").cast("double").alias("t"))
    return (
        hist.crossJoin(F.broadcast(tot))
        .select(
            F.col("path_depth").cast("int").alias("path_depth"),
            "has_query",
            F.col("n").cast("long").alias("n"),
            (F.col("n") / F.col("t")).alias("share"),
        )
        .orderBy("path_depth", "has_query")
    )
