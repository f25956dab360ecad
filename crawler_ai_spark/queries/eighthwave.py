"""Eighth-wave catalog queries (round 4, continued): main-content
extraction over synthesized pages.

Input is synthesized deterministically from documents.doc_id (no
external data); the DuckDB oracle re-runs the same segmentation and
density arithmetic independently on the identical html strings."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crawler_ai_spark.queries._shared import _register, _scratch_dir, _t

# ---------------------------------------------------------------------------
# Main-content extraction (functions/maincontent.py): jusText-style
# block segmentation + integer link-density rule. The synth page mixes
# every block class: a pure-link nav (boiler: short + dense), a short
# heading (boiler: short), 1-3 long prose paragraphs (content),
# doc_id%2 a link-bearing-but-prose paragraph (content: density under a
# third), doc_id%4 a link-list sidebar (boiler), and a footer whose text
# clears the length gate but fails the density gate — so both halves of
# the AND are load-bearing. Both engines run the same regexes (chosen
# for identical Java-regex/RE2 semantics: no lazy quantifiers, no
# lookaround) on byte-identical html.
# ---------------------------------------------------------------------------

# DID = doc_id rendered as a string; M37 = doc_id % 37 as a string —
# the _PATH_CASE_SPARK precedent: DuckDB auto-casts ints in ||, Spark
# needs explicit CAST.
_MC_PARA = (
    " || CASE WHEN doc_id % 3 >= {i} THEN '<p>Paragraph {i} of article '"
    " || DID || ': web pages mix navigation boilerplate with substantive"
    " prose, and block-level link density separates the two reliably at"
    " scale.</p>' ELSE '' END"
)

_MC_HTML_TPL = (
    "'<div><a href=\"/\">Home</a> <a href=\"/jobs\">Jobs</a>"
    " <a href=\"/about\">About us</a></div>'"
    " || '<h1>Story ' || DID || '</h1>'"
    + "".join(_MC_PARA.format(i=i) for i in range(3))
    + " || CASE WHEN doc_id % 2 = 1 THEN"
    " '<p>See <a href=\"/ref/' || DID || '\">the reference notes</a> for"
    " the full derivation and the surrounding context that keeps this"
    " block mostly prose.</p>' ELSE '' END"
    + " || CASE WHEN doc_id % 4 = 0 THEN"
    " '<li><a href=\"/t/a' || DID || '\">alpha</a></li>"
    "<li><a href=\"/t/b' || DID || '\">beta</a></li>' ELSE '' END"
    + " || '<div>(c) 2026 Site ' || M37 ||"
    " ' <a href=\"/privacy\">Privacy</a>"
    " <a href=\"/terms\">Terms</a></div>'"
)

_MC_HTML_DUCK = _MC_HTML_TPL.replace("DID", "doc_id").replace(
    "M37", "(doc_id % 37)"
)
_MC_HTML_SPARK = _MC_HTML_TPL.replace("DID", "CAST(doc_id AS STRING)").replace(
    "M37", "CAST(doc_id % 37 AS STRING)"
)

# RE2/DuckDB twins of the Java-regex constants in functions/maincontent
# (same strings; SQL-escaped)
_MC_SPLIT = (
    "</?(?:p|div|h[1-6]|li|td|th|blockquote|section|article|aside|nav|"
    "header|footer|ul|ol|table|tr|br)\\b[^>]*>"
)
_MC_ANCHOR = "<a\\s[^>]*>([^<]*)</a>"

_MC_ORACLE = f"""
WITH pages AS (
  SELECT doc_id, {_MC_HTML_DUCK} AS html FROM documents
),
blocks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(html, '{_MC_SPLIT}')) AS raw,
         generate_subscripts(regexp_split_to_array(html, '{_MC_SPLIT}'), 1) AS ord
  FROM pages
),
norm AS (
  SELECT doc_id, ord,
         trim(regexp_replace(regexp_replace(raw, '<[^>]*>', '', 'g'),
                             '\\s+', ' ', 'g')) AS text,
         coalesce(list_sum(list_transform(
             regexp_extract_all(raw, '{_MC_ANCHOR}', 1),
             t -> length(trim(regexp_replace(t, '\\s+', ' ', 'g'))))), 0)
           AS link_chars
  FROM blocks
),
scored AS (
  SELECT doc_id, ord, text, length(text) AS chars, link_chars,
         length(text) >= 25 AND link_chars * 3 <= length(text) AS is_content
  FROM norm WHERE length(text) > 0
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_blocks,
       CAST(sum(CASE WHEN is_content THEN 1 ELSE 0 END) AS BIGINT) AS n_content,
       CAST(coalesce(sum(CASE WHEN is_content THEN chars END), 0) AS BIGINT)
         AS content_chars,
       CAST(coalesce(sum(CASE WHEN NOT is_content THEN chars END), 0) AS BIGINT)
         AS boiler_chars,
       coalesce(string_agg(CASE WHEN is_content THEN text END, chr(10)
                           ORDER BY ord), '') AS main_text
FROM scored GROUP BY doc_id ORDER BY doc_id
"""


@_register("main_content_extract", oracle=_MC_ORACLE)
def q_main_content_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jusText/Boilerpipe-style boilerplate removal: block segmentation
    at block-tag boundaries + the integer length/link-density rule, all
    row-local JVM array expressions (zero shuffle — a 100 TB corpus
    pays scan cost only). Generalizes the reference's wholesale
    soup.get_text() (job_extraction_service.py:744-745)."""
    from crawler_ai_spark.functions import maincontent as MC

    docs = _t(spark, sf_dir, "documents")
    pages = docs.select("doc_id", F.expr(_MC_HTML_SPARK).alias("html"))
    out = MC.with_main_content(pages, html_col="html")
    return out.select(
        "doc_id", "n_blocks", "n_content", "content_chars", "boiler_chars",
        "main_text",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Priority aging under the host budget (operators/frontier.py:
# apply_host_budget(aging_batches=...)): starvation-free W2/O1
# scheduling. The synth frontier gives every host more rows than its
# budget with wait counts spanning three aging steps, so the scheduled
# set differs from the un-aged ranking iff the effective-priority
# arithmetic (priority + wait_batches // aging) is applied exactly;
# DuckDB re-ranks with its own integer division + window.
# ---------------------------------------------------------------------------

_AGED_ORACLE = """
WITH fr AS (
  SELECT doc_id,
         'h' || (doc_id % 5) || '.example.com' AS host,
         'https://h' || (doc_id % 5) || '.example.com/p/' || doc_id AS url,
         'https://h' || (doc_id % 5) || '.example.com/' AS seed_url,
         CAST(doc_id % 3 AS INT) AS priority,
         CAST(doc_id AS BIGINT) AS discovered_seq,
         CAST(doc_id % 9 AS INT) AS wait_batches
  FROM documents
),
ranked AS (
  SELECT *,
         row_number() OVER (
           PARTITION BY host
           ORDER BY priority + (wait_batches // 3) DESC, priority DESC,
                    discovered_seq ASC, url ASC, seed_url ASC
         ) AS rn
  FROM fr
)
SELECT doc_id, host, priority, wait_batches,
       CAST(priority + (wait_batches // 3) AS BIGINT) AS eff_priority
FROM ranked WHERE rn <= 4 ORDER BY host, doc_id
"""


@_register("aged_budget_schedule", oracle=_AGED_ORACLE)
def q_aged_budget_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Starvation-free host-budget scheduling: rank by effective priority
    priority + wait_batches // aging so long-deferred rows outrank any
    fixed priority eventually. Same two-phase salted windows as the
    un-aged budget — skew-proof at a Zipf host distribution."""
    from crawler_ai_spark.operators import frontier as FR

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    fr = docs.select(
        "doc_id",
        F.concat(F.lit("h"), (d % 5).cast("string"), F.lit(".example.com")).alias(
            "host"
        ),
        F.concat(
            F.lit("https://h"), (d % 5).cast("string"),
            F.lit(".example.com/p/"), d.cast("string"),
        ).alias("url"),
        F.concat(
            F.lit("https://h"), (d % 5).cast("string"), F.lit(".example.com/")
        ).alias("seed_url"),
        (d % 3).cast("int").alias("priority"),
        d.cast("long").alias("discovered_seq"),
        (d % 9).cast("int").alias("wait_batches"),
    )
    scheduled, _deferred = FR.apply_host_budget(fr, 4, aging_batches=3)
    return scheduled.select(
        "doc_id", "host", "priority", "wait_batches",
        (
            F.col("priority")
            + F.floor(F.col("wait_batches") / F.lit(3))
        ).cast("long").alias("eff_priority"),
    ).orderBy("host", "doc_id")


# ---------------------------------------------------------------------------
# Registrable-domain-grain politeness (operators/frontier.py:
# apply_domain_budget): the subdomain-spam cap. Seven subdomains per
# registrable domain, three suffix classes — plain .com, PSL 2-level
# suffix .co.uk, private suffix github.io — so the schedule is correct
# iff the PSL grain collapses every subdomain group to ONE domain (a
# host-grain rank would pass 7x the budget). DuckDB re-derives the
# grain with explicit suffix CASE logic and re-ranks with its own
# window; the Spark side uses the real PSL expression, so the oracle
# cross-checks the PSL arithmetic on these shapes too.
# ---------------------------------------------------------------------------

_DOMAIN_BUDGET_ORACLE = """
WITH fr AS (
  SELECT doc_id,
         'sub' || (doc_id % 7) || '.' ||
           CASE doc_id % 3 WHEN 0 THEN 'alpha.com'
                           WHEN 1 THEN 'beta.co.uk'
                           ELSE 'gamma.github.io' END AS host,
         CAST(doc_id % 4 AS INT) AS priority,
         CAST(doc_id AS BIGINT) AS discovered_seq
  FROM documents
),
fr2 AS (
  SELECT *,
         'https://' || host || '/p/' || doc_id AS url,
         'https://' || host || '/' AS seed_url,
         CASE WHEN host LIKE '%.alpha.com' THEN 'alpha.com'
              WHEN host LIKE '%.beta.co.uk' THEN 'beta.co.uk'
              ELSE 'gamma.github.io' END AS reg_domain
  FROM fr
),
ranked AS (
  SELECT *,
         row_number() OVER (
           PARTITION BY reg_domain
           ORDER BY priority DESC, discovered_seq ASC, url ASC, seed_url ASC
         ) AS rn
  FROM fr2
)
SELECT doc_id, host, reg_domain, priority
FROM ranked WHERE rn <= 5 ORDER BY doc_id
"""


@_register("domain_budget_schedule", oracle=_DOMAIN_BUDGET_ORACLE)
def q_domain_budget_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registrant-grain W2: at most 5 URLs per registrable domain per
    batch, PSL public-suffix+1 grouping — all subdomains of one
    registrant share the cap. Two-phase salted windows, skew-proof."""
    from crawler_ai_spark.functions.urls import registered_domain_expr
    from crawler_ai_spark.operators import frontier as FR

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    host = F.concat(
        F.lit("sub"), (d % 7).cast("string"), F.lit("."),
        F.when(d % 3 == 0, F.lit("alpha.com"))
        .when(d % 3 == 1, F.lit("beta.co.uk"))
        .otherwise(F.lit("gamma.github.io")),
    )
    fr = docs.select(
        "doc_id",
        host.alias("host"),
        (d % 4).cast("int").alias("priority"),
        d.cast("long").alias("discovered_seq"),
    ).withColumns(
        {
            "url": F.concat(
                F.lit("https://"), F.col("host"), F.lit("/p/"),
                F.col("doc_id").cast("string"),
            ),
            "seed_url": F.concat(F.lit("https://"), F.col("host"), F.lit("/")),
        }
    )
    scheduled, _deferred = FR.apply_domain_budget(fr, 5)
    return scheduled.select(
        "doc_id",
        "host",
        registered_domain_expr(F.col("host")).alias("reg_domain"),
        "priority",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# OPIC host importance (operators/hostrank.py: opic): the on-line
# page-importance estimator crawlers use for frontier ordering instead
# of waiting for PageRank to converge (Abiteboul/Preda/Cobena WWW'03).
# Same synthetic host graph as host_rank (LCG-sparsified edges + a ring
# so no host dangles); DuckDB unrolls the cash/history recurrence with
# src-sorted folds so every double is bit-identical to the Spark side.
# ---------------------------------------------------------------------------

_OPIC_N = 37
_OPIC_ITERS = 3


def _opic_oracle() -> str:
    init = f"{1.0 / _OPIC_N:.17e}"
    zero = f"{0.0:.17e}"
    denom = f"{float(_OPIC_ITERS + 1):.17e}"
    steps = []
    prev = "s0"
    for k in range(1, _OPIC_ITERS + 1):
        steps.append(
            f"""
i{k} AS (
  SELECT e.dst AS host,
         list_reduce(list(s.cash / e.outdeg ORDER BY e.src), (a, b) -> a + b)
           AS inflow
  FROM e JOIN {prev} s ON e.src = s.host GROUP BY e.dst),
s{k} AS (
  SELECT s.host, COALESCE(i{k}.inflow, {zero}) AS cash,
         s.history + s.cash AS history
  FROM {prev} s LEFT JOIN i{k} ON s.host = i{k}.host)"""
        )
        prev = f"s{k}"
    return f"""
WITH hosts AS (SELECT range AS host FROM range({_OPIC_N})),
synth AS (
  SELECT DISTINCT doc_id % {_OPIC_N} AS src, (doc_id // {_OPIC_N}) % {_OPIC_N} AS dst
  FROM documents
  WHERE ((doc_id * 1103515245 + 12345) % 101) < 29
    AND (doc_id % {_OPIC_N}) != ((doc_id // {_OPIC_N}) % {_OPIC_N})),
ring AS (SELECT host AS src, (host + 1) % {_OPIC_N} AS dst FROM hosts),
edges AS (SELECT DISTINCT src, dst
          FROM (SELECT * FROM synth UNION ALL SELECT * FROM ring)),
deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
e AS (SELECT edges.src, edges.dst, deg.outdeg FROM edges JOIN deg USING (src)),
s0 AS (SELECT host, {init} AS cash, {zero} AS history FROM hosts),{",".join(steps)}
SELECT host, cash, history, (history + cash) / {denom} AS importance
FROM s{_OPIC_ITERS} ORDER BY host
"""


@_register("opic_host_importance", oracle=_opic_oracle())
def q_opic_host_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPIC over the synthesized host graph, 3 synchronous steps: bank
    cash into history, redistribute along out-edges; importance =
    (history + cash) / (steps + 1). Meaningful after ONE step — the
    crawl-time alternative to converged PageRank for frontier budget."""
    from crawler_ai_spark.operators.hostrank import opic
    from crawler_ai_spark.queries.crawl import synth_host_edges

    edges, hosts = synth_host_edges(spark, sf_dir)
    return opic(edges, hosts, n_hosts=_OPIC_N, iterations=_OPIC_ITERS).orderBy("host")


# ---------------------------------------------------------------------------
# Language-mixture sampling (pipeline/corpus.py: mixture_sample): the
# multilingual data-recipe move — downsample per language so the kept
# corpus hits a target TOKEN mixture. The recipe excludes 'de' (dropped
# entirely) and overweights 'fr' relative to availability so the
# binding-language math (largest feasible corpus T = min avail/w, keep
# rate w*T/avail) is load-bearing, not all-ones. DuckDB re-derives
# availability, T, the rates and the 16-bit thresholds from scratch;
# any divergence in the token counts, the min, the rate arithmetic or
# the md5 keyspace thresholding flips rows in or out of the sample.
# ---------------------------------------------------------------------------

_MIX_TARGETS = {"en": 0.45, "zh": 0.25, "es": 0.15, "fr": 0.15}

_MIX_ORACLE = f"""
WITH n AS (
  SELECT doc_id, lang,
         CASE WHEN length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) = 0
              THEN 0
              ELSE len(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' '))
         END AS n_tokens
  FROM documents
),
tgt(lang, w) AS (VALUES {", ".join(f"('{l}', {w:.17e})" for l, w in sorted(_MIX_TARGETS.items()))}),
avail AS (
  SELECT tgt.lang, tgt.w,
         COALESCE(SUM(n.n_tokens), 0) AS avail_tokens
  FROM tgt LEFT JOIN n ON n.lang = tgt.lang
  GROUP BY tgt.lang, tgt.w
),
tt AS (SELECT MIN(avail_tokens / w) AS t_total FROM avail),
rates AS (
  SELECT lang, avail_tokens,
         LEAST({1.0:.17e}, w * tt.t_total / avail_tokens) AS rate
  FROM avail, tt
),
keyed AS (
  SELECT n.doc_id, n.lang, n.n_tokens, r.rate,
         ('0x' || substr(md5(n.doc_id || ':corpus-v1'), 1, 4))::BIGINT AS key_int,
         CAST(floor(r.rate * {65536.0:.17e}) AS BIGINT) AS thr
  FROM n JOIN rates r ON n.lang = r.lang
)
SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens, key_int, rate
FROM keyed WHERE key_int < thr ORDER BY doc_id
"""


@_register("corpus_mixture_sample", oracle=_MIX_ORACLE)
def q_corpus_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Target-token-mixture sampling: the binding language is kept whole,
    every other target language downsampled to its share of the largest
    feasible corpus; non-target languages dropped. One tiny per-language
    aggregation + a broadcast rate join — map-only at corpus scale."""
    from crawler_ai_spark.pipeline import corpus as CP

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    return CP.mixture_sample(docs, _MIX_TARGETS).orderBy("doc_id")


# ---------------------------------------------------------------------------
# DUST rule mining (operators/dust.py): learn URL rewrite rules from
# same-content URL groups — star pairing against the group's canonical
# URL, longest-common-prefix/suffix decomposition, digit-run
# generalization, support filter. Synth corpus: every doc has a base
# URL; even docs add a ?sessionid=<value> variant (value differs per
# doc — only the '*' generalization lets those accumulate support) and
# doc%3 docs add a /print variant. DuckDB re-runs the entire pipeline:
# list aggregation + slicing, the monotone-prefix LCP via list_filter,
# the overlap-capped suffix, bucketing and the support cut.
# ---------------------------------------------------------------------------

_DUST_ORACLE = """
WITH pages AS (
  SELECT 'https://h' || (doc_id % 7) || '.example.com/item/' || doc_id AS url,
         'content-' || doc_id AS body
  FROM documents
  UNION ALL
  SELECT 'https://h' || (doc_id % 7) || '.example.com/item/' || doc_id
           || '?sessionid=' || (doc_id * 31 + 7) AS url,
         'content-' || doc_id AS body
  FROM documents WHERE doc_id % 2 = 0
  UNION ALL
  SELECT 'https://h' || (doc_id % 7) || '.example.com/item/' || doc_id
           || '/print' AS url,
         'content-' || doc_id AS body
  FROM documents WHERE doc_id % 3 = 0
),
groups AS (
  SELECT split_part(url, '/', 3) AS host, md5(body) AS fp,
         list_sort(list(DISTINCT url))[1:16] AS urls
  FROM pages GROUP BY 1, 2
),
pairs AS (
  SELECT host, urls[1] AS canon, unnest(urls[2:]) AS variant
  FROM groups WHERE len(urls) >= 2
),
cut AS (
  SELECT host, canon, variant,
         len(list_filter(range(1, least(strlen(canon), strlen(variant)) + 1),
                         i -> substr(canon, 1, i) = substr(variant, 1, i))) AS lcp,
         least(
           len(list_filter(range(1, least(strlen(canon), strlen(variant)) + 1),
                           i -> substr(reverse(canon), 1, i)
                              = substr(reverse(variant), 1, i))),
           least(strlen(canon), strlen(variant))
             - len(list_filter(range(1, least(strlen(canon), strlen(variant)) + 1),
                               i -> substr(canon, 1, i) = substr(variant, 1, i)))
         ) AS lcs
  FROM pairs
),
rules AS (
  SELECT host,
         regexp_replace(substr(variant, lcp + 1,
                               strlen(variant) - lcp - lcs), '[0-9]+', '*', 'g')
           AS rule_from,
         regexp_replace(substr(canon, lcp + 1,
                               strlen(canon) - lcp - lcs), '[0-9]+', '*', 'g')
           AS rule_to
  FROM cut
)
SELECT rule_from, rule_to, CAST(count(*) AS BIGINT) AS support,
       CAST(count(DISTINCT host) AS BIGINT) AS n_hosts
FROM rules GROUP BY 1, 2 HAVING count(*) >= 3
ORDER BY rule_from, rule_to
"""


@_register("dust_rules", oracle=_DUST_ORACLE)
def q_dust_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DUST: mine URL rewrite rules (print views, session-id variants)
    from same-content URL groups the crawl already paid for. One
    fingerprint shuffle with capped group lists, one short-row rule
    count — linear star pairing, never the quadratic all-pairs join."""
    from crawler_ai_spark.operators.dust import mine_dust_rules

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    base = F.concat(
        F.lit("https://h"), (d % 7).cast("string"),
        F.lit(".example.com/item/"), d.cast("string"),
    )
    body = F.concat(F.lit("content-"), d.cast("string"))
    pages = (
        docs.select(base.alias("url"), body.alias("body"))
        .unionAll(
            docs.where(d % 2 == 0).select(
                F.concat(
                    base, F.lit("?sessionid="), (d * 31 + 7).cast("string")
                ).alias("url"),
                body.alias("body"),
            )
        )
        .unionAll(
            docs.where(d % 3 == 0).select(
                F.concat(base, F.lit("/print")).alias("url"), body.alias("body")
            )
        )
    )
    return mine_dust_rules(
        pages, fingerprint=F.md5(F.col("body"))
    ).select(
        "rule_from", "rule_to",
        F.col("support").cast("long").alias("support"),
        F.col("n_hosts").cast("long").alias("n_hosts"),
    ).orderBy("rule_from", "rule_to")


# ---------------------------------------------------------------------------
# DSIR importance weights (pipeline/dsir.py): hashed-unigram importance
# resampling scores — ln p_target(bucket) - ln p_raw(bucket) summed
# over each doc's bucket counts, per-token normalized. Target = three
# of the twenty synth sources. DuckDB refits both multinomials from
# scratch (same md5 bucket hash, same add-1 smoothing, same
# bucket-ordered fold) — any drift in the hashing, the smoothing
# denominators or the fold order flips weights.
# ---------------------------------------------------------------------------

_DSIR_B = 512

_DSIR_ORACLE = f"""
WITH toksed AS (
  SELECT doc_id, source,
         CASE WHEN length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) = 0
              THEN CAST([] AS VARCHAR[])
              ELSE string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')
         END AS toks
  FROM documents
),
tok AS (
  SELECT doc_id, source IN ('src0', 'src1', 'src2') AS is_target,
         ('0x' || substr(md5(t.tokstr), 1, 4))::BIGINT % {_DSIR_B} AS b
  FROM toksed, unnest(toks) AS t(tokstr)
),
cnt AS (
  SELECT b,
         SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS ct,
         SUM(CASE WHEN is_target THEN 0 ELSE 1 END) AS cr
  FROM tok GROUP BY b
),
totals AS (SELECT SUM(ct) AS tt, SUM(cr) AS tr FROM cnt),
ratio AS (
  SELECT b,
         ln((ct + {1.0:.17e}) / (tt + {float(_DSIR_B):.17e}))
           - ln((cr + {1.0:.17e}) / (tr + {float(_DSIR_B):.17e})) AS lr
  FROM cnt, totals
),
pdb AS (SELECT doc_id, b, COUNT(*) AS c FROM tok GROUP BY doc_id, b),
w AS (
  SELECT pdb.doc_id, SUM(pdb.c) AS n_tokens,
         round(list_reduce(list(pdb.c * r.lr ORDER BY pdb.b),
                           (a, x) -> a + x) / SUM(pdb.c), 4) AS logweight
  FROM pdb JOIN ratio r USING (b) GROUP BY pdb.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(w.n_tokens, 0) AS BIGINT) AS n_tokens,
       w.logweight,
       COALESCE(w.logweight, {0.0:.17e}) > {0.0:.17e} AS selected
FROM documents d LEFT JOIN w ON d.doc_id = w.doc_id
ORDER BY d.doc_id
"""


@_register("doc_dsir_weights", oracle=_DSIR_ORACLE)
def q_doc_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR: per-doc log importance weight of target vs pool hashed-
    unigram models, fit in-plan; selected = per-token weight > 0. Two
    512-key count shuffles + a broadcast ratio join + one doc-keyed
    fold — no classifier, no global sort."""
    from crawler_ai_spark.pipeline.dsir import dsir_logweights

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    return dsir_logweights(
        docs, F.col("source").isin("src0", "src1", "src2")
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# TrustRank (operators/hostrank.py: host_rank(teleport=...)): biased
# PageRank whose restart distributes only over a curated trusted seed
# set, so hosts reachable from no seed converge to zero — the classic
# link-spam demotion signal (Gyongyi et al. VLDB'04). Same synth graph
# as host_rank; seeds = every 5th host with uniform trust. DuckDB
# unrolls the iteration with the per-host teleport base and src-sorted
# folds for bit-identical doubles.
# ---------------------------------------------------------------------------

_TR_N = 37
_TR_ITERS = 3
_TR_DAMP = 0.85
_TR_SEEDS = 8  # hosts 0,5,10,...,35


def _trust_rank_oracle() -> str:
    damp = f"{_TR_DAMP:.17e}"
    oneminus = f"{1.0 - _TR_DAMP:.17e}"
    tseed = f"{1.0 / _TR_SEEDS:.17e}"
    zero = f"{0.0:.17e}"
    steps = []
    prev = "r0"
    for k in range(1, _TR_ITERS + 1):
        steps.append(
            f"""
i{k} AS (
  SELECT e.dst AS host,
         list_reduce(list(r.rank / e.outdeg ORDER BY e.src), (a, b) -> a + b)
           AS inflow
  FROM e JOIN {prev} r ON e.src = r.host GROUP BY e.dst),
r{k} AS (
  SELECT h.host, {oneminus} * h.t + {damp} * COALESCE(i{k}.inflow, {zero}) AS rank
  FROM hosts h LEFT JOIN i{k} ON h.host = i{k}.host)"""
        )
        prev = f"r{k}"
    return f"""
WITH hosts AS (
  SELECT range AS host,
         CASE WHEN range % 5 = 0 THEN {tseed} ELSE {zero} END AS t
  FROM range({_TR_N})),
synth AS (
  SELECT DISTINCT doc_id % {_TR_N} AS src, (doc_id // {_TR_N}) % {_TR_N} AS dst
  FROM documents
  WHERE ((doc_id * 1103515245 + 12345) % 101) < 29
    AND (doc_id % {_TR_N}) != ((doc_id // {_TR_N}) % {_TR_N})),
ring AS (SELECT host AS src, (host + 1) % {_TR_N} AS dst FROM hosts),
edges AS (SELECT DISTINCT src, dst
          FROM (SELECT * FROM synth UNION ALL SELECT * FROM ring)),
deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
e AS (SELECT edges.src, edges.dst, deg.outdeg FROM edges JOIN deg USING (src)),
r0 AS (SELECT host, t AS rank FROM hosts),{",".join(steps)}
SELECT host, rank FROM r{_TR_ITERS} ORDER BY host
"""


@_register("trust_rank", oracle=_trust_rank_oracle())
def q_trust_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TrustRank over the synthesized host graph: restart mass flows
    only to the trusted seed set, demoting link-spam neighborhoods no
    seed endorses. Same 2-shuffles-per-step shape as host_rank."""
    from crawler_ai_spark.operators.hostrank import host_rank
    from crawler_ai_spark.queries.crawl import synth_host_edges

    edges, hosts = synth_host_edges(spark, sf_dir)
    tel = hosts.where(F.col("host") % 5 == 0).select(
        "host", F.lit(1.0 / _TR_SEEDS).alias("t")
    )
    return host_rank(
        edges, hosts, n_hosts=_TR_N, iterations=_TR_ITERS, damping=_TR_DAMP,
        teleport=tel,
    ).orderBy("host")


# ---------------------------------------------------------------------------
# ANF / harmonic centrality (operators/anf.py): neighborhood-function
# estimation with k-minimum-values sketches — the HyperANF idea with
# integer-exact merges, so DuckDB replays every iteration bit-for-bit
# (list_distinct+sort+slice == Spark's array ops on the same 48-bit md5
# hashes). 37 hosts with k=8 forces the ESTIMATION regime (sketches
# saturate), not just exact small-set counting. Output is flattened to
# scalar columns (driver hash canonicalizer cannot sort array cells).
# ---------------------------------------------------------------------------

_ANF_N = 37
_ANF_ITERS = 3
_ANF_K = 8


def _anf_oracle() -> str:
    k = _ANF_K
    two48 = f"{float(2**48):.17e}"
    km1 = f"{float(k - 1):.17e}"
    steps = []
    prev = "s0"
    for t in range(1, _ANF_ITERS + 1):
        steps.append(
            f"""
m{t} AS (
  SELECT e.src AS host,
         list_sort(list_distinct(flatten(list(s.sketch))))[1:{k}] AS nsk
  FROM e JOIN {prev} s ON e.dst = s.host GROUP BY e.src),
s{t} AS (
  SELECT h.host,
         list_sort(list_distinct(
           flatten([h.sketch, COALESCE(m{t}.nsk, CAST([] AS BIGINT[]))])
         ))[1:{k}] AS sketch
  FROM {prev} h LEFT JOIN m{t} ON h.host = m{t}.host)"""
        )
        prev = f"s{t}"
    est = (
        lambda s: f"CASE WHEN len({s}.sketch) < {k} THEN CAST(len({s}.sketch) AS DOUBLE)"
        f" ELSE {km1} * {two48} / CAST({s}.sketch[{k}] AS DOUBLE) END"
    )
    return f"""
WITH hosts AS (SELECT range AS host FROM range({_ANF_N})),
synth AS (
  SELECT DISTINCT doc_id % {_ANF_N} AS src, (doc_id // {_ANF_N}) % {_ANF_N} AS dst
  FROM documents
  WHERE ((doc_id * 1103515245 + 12345) % 101) < 29
    AND (doc_id % {_ANF_N}) != ((doc_id // {_ANF_N}) % {_ANF_N})),
ring AS (SELECT host AS src, (host + 1) % {_ANF_N} AS dst FROM hosts),
e AS (SELECT DISTINCT src, dst FROM (SELECT * FROM synth UNION ALL SELECT * FROM ring)),
s0 AS (
  SELECT host,
         [('0x' || substr(md5(host || ':anf'), 1, 12))::BIGINT] AS sketch
  FROM hosts),{",".join(steps)}
SELECT s0.host,
       {est("s0")} AS b0, {est("s1")} AS b1, {est("s2")} AS b2, {est("s3")} AS b3,
       ({est("s1")} - {est("s0")}) / {1.0:.17e}
         + ({est("s2")} - {est("s1")}) / {2.0:.17e}
         + ({est("s3")} - {est("s2")}) / {3.0:.17e} AS harmonic
FROM s0 JOIN s1 USING (host) JOIN s2 USING (host) JOIN s3 USING (host)
ORDER BY host
"""


@_register("anf_harmonic", oracle=_anf_oracle())
def q_anf_harmonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic centrality via KMV neighborhood sketches over the synth
    host graph: T iterations = 2T shuffles, sketch state n*k longs,
    two-phase salted merges so hub fan-in never concentrates."""
    from crawler_ai_spark.operators.anf import anf_harmonic
    from crawler_ai_spark.queries.crawl import synth_host_edges

    edges, hosts = synth_host_edges(spark, sf_dir)
    out = anf_harmonic(edges, hosts, iterations=_ANF_ITERS, k=_ANF_K)
    return out.select(
        "host",
        *[
            F.element_at("ball_sizes", i + 1).alias(f"b{i}")
            for i in range(_ANF_ITERS + 1)
        ],
        "harmonic",
    ).orderBy("host")


# ---------------------------------------------------------------------------
# Change-rate estimation (operators/freshness.py): the Cho/Garcia-
# Molina bias-corrected Poisson estimator over a synthesized revisit
# history (8 visits/URL at daily spacing, changed bit LCG-derived per
# (doc, visit), with doc%97 pinned always-changed and doc%89 pinned
# never-changed so X covers both endpoints — the X=n case is
# exactly what the naive estimator cannot handle). DuckDB recomputes
# λ̂ and the clamped half-life interval from the same counts.
# ---------------------------------------------------------------------------

_FRESH_VISITS = 8
_FRESH_DT = 86400.0

_FRESH_ORACLE = f"""
WITH visits AS (
  SELECT 'https://d' || (doc_id % 11) || '.example.com/p/' || doc_id AS url,
         (doc_id % 97 = 0) OR
           ((doc_id % 89 != 0) AND
            ((doc_id * 8 + v.k) * 1103515245 + 12345) % 7 < 3) AS changed
  FROM documents, range({_FRESH_VISITS}) v(k)
),
agg AS (
  SELECT url, COUNT(*) AS n_visits,
         SUM(CASE WHEN changed THEN 1 ELSE 0 END) AS n_changed
  FROM visits GROUP BY url
),
est AS (
  SELECT url, n_visits, n_changed,
         round(-ln((n_visits - n_changed + {0.5:.17e}) / (n_visits + {0.5:.17e}))
               / {_FRESH_DT:.17e}, 12) + {0.0:.17e} AS lam
  FROM agg
)
SELECT url, CAST(n_visits AS BIGINT) AS n_visits,
       CAST(n_changed AS BIGINT) AS n_changed,
       lam AS lambda_hat,
       CAST(floor(LEAST({30 * 86400:.17e},
                  GREATEST({3600:.17e},
                           CASE WHEN n_changed = 0 THEN {30 * 86400:.17e}
                                ELSE {0.6931471805599453094:.17e} / lam END)))
            AS BIGINT) AS revisit_s
FROM est ORDER BY url
"""


@_register("change_rate_estimate", oracle=_FRESH_ORACLE)
def q_change_rate_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cho/Garcia-Molina λ̂ per URL from revisit observations, plus the
    half-life revisit interval clamped to [1h, 30d] — the offline
    scheduler feeding per-URL recrawl TTLs. One map-combined groupBy,
    then row-local math."""
    from crawler_ai_spark.operators.freshness import estimate_change_rate

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    history = docs.join(
        spark.range(_FRESH_VISITS).select(F.col("id").alias("k")),
    ).select(
        F.concat(
            F.lit("https://d"), (d % 11).cast("string"),
            F.lit(".example.com/p/"), d.cast("string"),
        ).alias("url"),
        (
            (d % 97 == 0)
            | ((d % 89 != 0) & (((d * 8 + F.col("k")) * 1103515245 + 12345) % 7 < 3))
        ).alias("changed"),
    )
    return estimate_change_rate(history, interval_s=_FRESH_DT).orderBy("url")


# ---------------------------------------------------------------------------
# Luhn-gated card scrubbing (functions/pii.py): the regex-only PII pass
# over-redacts 16-digit order ids; this one checksum-validates. Each
# doc's text is augmented with one VALID synthetic PAN (check digit
# computed in-plan) and one INVALID sibling (check digit bumped +1):
# the scrub must redact exactly the valid one. DuckDB recomputes the
# full Luhn arithmetic — position parity, doubling, the branchless
# over-9 correction — and the fold-replace.
# ---------------------------------------------------------------------------

_LUHN_SQL_TOTAL = (
    "list_reduce(list_transform(range(1, 15 + 1), i -> "
    "CASE WHEN (15 - i) % 2 = 0 THEN "
    "CAST(substr(base, i, 1) AS INT) * 2 - 9 * ((CAST(substr(base, i, 1) AS INT) * 2) // 10) "
    "ELSE CAST(substr(base, i, 1) AS INT) END), (a, b) -> a + b)"
)

_LUHN_VALID_SQL = (
    "((list_reduce(list_transform(range(1, 16 + 1), i -> "
    "CASE WHEN (16 - i) % 2 = 1 THEN "
    "CAST(substr(c, i, 1) AS INT) * 2 - 9 * ((CAST(substr(c, i, 1) AS INT) * 2) // 10) "
    "ELSE CAST(substr(c, i, 1) AS INT) END), (a, b) -> a + b)) % 10) = 0"
)

_CARD_ORACLE = f"""
WITH pan AS (
  SELECT doc_id, text,
         '4' || lpad(CAST((doc_id * 7919) % 100000000000000 AS VARCHAR), 14, '0')
           AS base
  FROM documents
),
made AS (
  SELECT doc_id, text, base,
         (10 - ({_LUHN_SQL_TOTAL} % 10)) % 10 AS cd
  FROM pan
),
aug AS (
  SELECT doc_id,
         base || cd AS valid_pan,
         base || ((cd + 1) % 10) AS invalid_pan,
         text || ' card ' || base || cd
              || ' order ' || base || ((cd + 1) % 10) || ' end' AS text
  FROM made
),
scrubbed AS (
  SELECT doc_id,
         list_filter(regexp_extract_all(text, '\\b\\d{{16}}\\b'),
                     c -> {_LUHN_VALID_SQL}) AS valid,
         text
  FROM aug
)
SELECT doc_id,
       CAST(len(valid) AS BIGINT) AS n_cards,
       list_reduce(
         list_prepend(text, list_distinct(valid)),
         (acc, c) -> regexp_replace(acc, '\\b' || c || '\\b', '<CARD>', 'g')
       ) AS text_scrubbed
FROM scrubbed ORDER BY doc_id
"""


@_register("doc_card_scrub", oracle=_CARD_ORACLE)
def q_doc_card_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checksum-validated PII: redact 16-digit runs ONLY when they pass
    the Luhn mod-10 check — each doc carries one valid and one invalid
    synthetic PAN, so over- and under-redaction both flip the hash.
    Pure JVM expressions, zero shuffle."""
    from crawler_ai_spark.functions.pii import luhn_check_digit, scrub_card_numbers

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    base = F.concat(
        F.lit("4"), F.lpad(((d * 7919) % 100000000000000).cast("string"), 14, "0")
    )
    cd = luhn_check_digit(base)
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" card "), base, cd.cast("string"),
            F.lit(" order "), base, ((cd + 1) % 10).cast("string"),
            F.lit(" end"),
        ).alias("text"),
    )
    n_cards, scrubbed = scrub_card_numbers(F.col("text"))
    return aug.select(
        "doc_id",
        n_cards.cast("long").alias("n_cards"),
        scrubbed.alias("text_scrubbed"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# In-plan logistic quality classifier (pipeline/classifier.py): 3
# full-batch GD steps over hashed-unigram features, trained and scored
# inside one plan. DuckDB REPEATS THE ENTIRE TRAINING — feature
# matrix, per-doc sigmoid folds, per-bucket gradient folds, the
# 9-decimal weight quantization each step — so a drift anywhere in the
# optimization flips scores. Labels: the DSIR target sources.
# ---------------------------------------------------------------------------

_CLF_B = 256
_CLF_STEPS = 3


def _clf_oracle() -> str:
    fold = lambda items: (  # noqa: E731
        f"list_reduce(list_prepend({0.0:.17e}, {items}), (a, v) -> a + v)"
    )
    steps_sql = []
    prev = "w0"
    for t in range(1, _CLF_STEPS + 1):
        steps_sql.append(
            f"""
p{t} AS (
  SELECT x.doc_id, x.y,
         {1.0:.17e} / ({1.0:.17e} + exp(-({fold("list(x.x * w.w ORDER BY x.b)")})))
           AS p
  FROM x JOIN {prev} w ON x.b = w.b GROUP BY x.doc_id, x.y),
g{t} AS (
  SELECT x.b,
         {fold("list((p.p - x.y) * x.x ORDER BY x.doc_id)")} / nt.nd AS g
  FROM x JOIN p{t} p ON x.doc_id = p.doc_id, ntot nt GROUP BY x.b, nt.nd),
w{t} AS (
  SELECT w.b, round(w.w - {1.0:.17e} * COALESCE(g.g, {0.0:.17e}), 9) + {0.0:.17e} AS w
  FROM {prev} w LEFT JOIN g{t} g ON w.b = g.b)"""
        )
        prev = f"w{t}"
    return f"""
WITH toksed AS (
  SELECT doc_id, source,
         CASE WHEN length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) = 0
              THEN CAST([] AS VARCHAR[])
              ELSE string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')
         END AS toks
  FROM documents
),
tok AS (
  SELECT doc_id,
         CASE WHEN source IN ('src0', 'src1', 'src2') THEN {1.0:.17e}
              ELSE {0.0:.17e} END AS y,
         ('0x' || substr(md5(t.tokstr), 1, 4))::BIGINT % {_CLF_B} AS b
  FROM toksed, unnest(toks) AS t(tokstr)
),
pdb AS (SELECT doc_id, y, b, COUNT(*) AS c FROM tok GROUP BY doc_id, y, b),
nd AS (SELECT doc_id, SUM(c) AS n FROM pdb GROUP BY doc_id),
x AS (
  SELECT pdb.doc_id, pdb.y, pdb.b, CAST(pdb.c AS DOUBLE) / nd.n AS x
  FROM pdb JOIN nd ON pdb.doc_id = nd.doc_id),
ntot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd FROM documents),
w0 AS (SELECT range AS b, {0.0:.17e} AS w FROM range({_CLF_B})),{",".join(steps_sql)},
z AS (
  SELECT x.doc_id, {fold("list(x.x * w.w ORDER BY x.b)")} AS z
  FROM x JOIN w{_CLF_STEPS} w ON x.b = w.b GROUP BY x.doc_id)
SELECT d.doc_id,
       round({1.0:.17e} / ({1.0:.17e} + exp(-COALESCE(z.z, {0.0:.17e}))), 6) AS score
FROM documents d LEFT JOIN z ON d.doc_id = z.doc_id
ORDER BY d.doc_id
"""


@_register("doc_quality_classifier", oracle=_clf_oracle())
def q_doc_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-and-score on-cluster: 3 GD steps of logistic regression
    over hashed features (labels = target sources), then score every
    doc. Per step: one broadcast weight join + one doc-keyed fold + one
    bucket-keyed gradient — weights quantized 9 dp so engines never
    drift through the iterations."""
    from crawler_ai_spark.pipeline.classifier import (
        doc_features,
        score_docs,
        train_logreg,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    labels = docs.select(
        "doc_id",
        F.when(F.col("source").isin("src0", "src1", "src2"), 1.0)
        .otherwise(0.0)
        .alias("y"),
    )
    feats = doc_features(docs, buckets=_CLF_B).persist()
    w = train_logreg(feats, labels, steps=_CLF_STEPS, buckets=_CLF_B)
    return score_docs(docs, w, buckets=_CLF_B).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Yandex Clean-param (sources/robots.py with_clean_param +
# functions/urls.clean_param_strip_expr): publisher-DECLARED DUST.
# Even hosts declare 'Clean-param: sid&ref /products' (path-scoped) and
# 'Clean-param: utm' (global); odd hosts declare none. The Spark side
# runs the real parser over the robots bodies and folds the rules over
# each URL; DuckDB re-derives the strip from the declared semantics
# directly (which params are live for this host+path) — so parse,
# scoping and the query-string rebuild must all agree.
# ---------------------------------------------------------------------------

_CP_BODY_RULES = (
    "User-agent: *\nDisallow: /private\n"
    "Clean-param: sid&ref /products\nClean-param: utm\n"
)
_CP_BODY_NONE = "User-agent: *\nDisallow:\n"

_CLEANPARAM_ORACLE = f"""
WITH urls AS (
  SELECT doc_id,
         'h' || (doc_id % 5) AS host,
         (doc_id % 5) % 2 = 0 AS has_rules,
         CASE WHEN doc_id % 3 = 0 THEN '/products/' || doc_id
              ELSE '/blog/' || doc_id END AS path,
         CASE WHEN doc_id % 2 = 0
              THEN 'sid=' || doc_id || '&color=c' || (doc_id % 7) || '&utm=x'
              ELSE 'ref=r' || doc_id || '&q=' || (doc_id % 13) END AS qs
  FROM documents
),
u2 AS (
  SELECT doc_id, 'https://' || host || '.example.com' || path || '?' || qs AS url,
         has_rules, path, qs
  FROM urls
),
cleaned AS (
  SELECT doc_id, url,
         CASE WHEN NOT has_rules THEN url
              ELSE (
                SELECT CASE WHEN len(kept) > 0
                            THEN split_part(url, '?', 1) || '?' || list_aggregate(kept, 'string_agg', '&')
                            ELSE split_part(url, '?', 1) END
                FROM (
                  SELECT list_filter(string_split(qs, '&'), kv ->
                           NOT (split_part(kv, '=', 1) = 'utm'
                                OR (path LIKE '/products/%'
                                    AND split_part(kv, '=', 1) IN ('sid', 'ref')))
                         ) AS kept
                )
              ) END AS cleaned
  FROM u2
)
SELECT doc_id, url, cleaned FROM cleaned ORDER BY doc_id
"""


@_register("robots_clean_param", oracle=_CLEANPARAM_ORACLE)
def q_robots_clean_param(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clean-param end to end: parse the declarations out of robots
    bodies, broadcast the per-host rule arrays, fold them over each
    URL's query string (path-scoped and global rules). Pure JVM; the
    declared complement to the learned dust_rules."""
    from crawler_ai_spark.functions.urls import clean_param_strip_expr
    from crawler_ai_spark.sources.robots import parse_robots

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    host = F.concat(F.lit("h"), (d % 5).cast("string"))
    path = F.when(
        d % 3 == 0, F.concat(F.lit("/products/"), d.cast("string"))
    ).otherwise(F.concat(F.lit("/blog/"), d.cast("string")))
    qs = F.when(
        d % 2 == 0,
        F.concat(
            F.lit("sid="), d.cast("string"), F.lit("&color=c"),
            (d % 7).cast("string"), F.lit("&utm=x"),
        ),
    ).otherwise(
        F.concat(
            F.lit("ref=r"), d.cast("string"), F.lit("&q="), (d % 13).cast("string")
        )
    )
    urls = docs.select(
        "doc_id",
        host.alias("host"),
        F.concat(
            F.lit("https://"), host, F.lit(".example.com"), path, F.lit("?"), qs
        ).alias("url"),
    )
    robots = (
        urls.select("host")
        .distinct()
        .select(
            "host",
            F.when(
                F.substring("host", 2, 10).cast("int") % 2 == 0,
                F.lit(_CP_BODY_RULES),
            )
            .otherwise(F.lit(_CP_BODY_NONE))
            .alias("body"),
        )
    )
    rules = parse_robots(robots, with_clean_param=True)
    return (
        urls.join(F.broadcast(rules.select("host", "clean_params")), "host", "left")
        .select(
            "doc_id",
            "url",
            clean_param_strip_expr(F.col("url"), F.col("clean_params")).alias(
                "cleaned"
            ),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# WARC revisit-record dedup (sources/warc.py: write_warc_dedup /
# read_warc_dedup): ISO 28500's identical-payload-digest profile —
# repeated payloads store one full response record plus small revisit
# pointers; the reader joins revisits back to their referenced body.
# Groups of 3 docs share a payload, capture time rises with doc_id, so
# the group's lowest doc_id is the original and the other two MUST come
# back as revisits with the original's bytes restored exactly. The
# oracle predicts every cell (incl. is_revisit) from first principles —
# the whole write→dedup→read pipeline must be an identity + a flag.
# ---------------------------------------------------------------------------

_RV_HTML = "'<html><body>' || (SELECT d2.text FROM documents d2 WHERE d2.doc_id = (d.doc_id - d.doc_id % 3)) || '</body></html>'"
_RV_MICROS = "1704067200000000 + doc_id * 1000000"


@_register(
    "warc_revisit_roundtrip",
    oracle=f"""
WITH grouped AS (
  SELECT d.doc_id,
         d.doc_id - d.doc_id % 3 AS leader,
         {_RV_MICROS.replace('doc_id', 'd.doc_id')} AS micros,
         {_RV_HTML} AS html
  FROM documents d
  WHERE d.text IS NOT NULL
    AND EXISTS (SELECT 1 FROM documents x
                WHERE x.doc_id = d.doc_id - d.doc_id % 3 AND x.text IS NOT NULL)
),
marked AS (
  SELECT *,
         doc_id = min(doc_id) OVER (PARTITION BY leader) AS is_original
  FROM grouped
)
SELECT 'https://rv' || (doc_id % 13) || '.example.com/p/' || doc_id AS url,
       strftime(make_timestamp(micros), '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
       md5(html) AS html_md5,
       CAST(strlen(html) AS BIGINT) AS body_bytes,
       CAST(200 AS INT) AS status,
       NOT is_original AS is_revisit
FROM marked ORDER BY url
""",
)
def q_warc_revisit_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Archive-level dedup end to end: write with revisit records, read
    back with payload restoration; every byte and every revisit flag
    predicted by the oracle. Files land in a session-lifetime scratch dir."""

    from crawler_ai_spark.sources.warc import read_warc_dedup, write_warc_dedup

    docs = _t(spark, sf_dir, "documents").where("text IS NOT NULL").alias("d")
    leaders = (
        _t(spark, sf_dir, "documents")
        .where("text IS NOT NULL")
        .selectExpr("doc_id AS leader_id", "text AS leader_text")
        .alias("l")
    )
    pages = docs.join(
        leaders, F.expr("d.doc_id - d.doc_id % 3") == F.col("l.leader_id")
    ).select(
        F.expr(
            "'https://rv' || CAST(d.doc_id % 13 AS STRING) || '.example.com/p/'"
            " || CAST(d.doc_id AS STRING)"
        ).alias("url"),
        F.expr("timestamp_micros(1704067200000000 + d.doc_id * 1000000)").alias(
            "warc_ts"
        ),
        F.expr(
            "CAST('<html><body>' || l.leader_text || '</body></html>' AS BINARY)"
        ).alias("html"),
        F.lit(200).cast("int").alias("status"),
    )
    out = _scratch_dir("warc_rv_")
    write_warc_dedup(pages.repartition(8, "url"), out, gzip_records=True).collect()
    back = read_warc_dedup(spark, out)
    return back.select(
        "url",
        F.date_format("warc_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
        F.md5(F.col("html")).alias("html_md5"),
        F.length(F.col("html")).cast("bigint").alias("body_bytes"),
        "status",
        "is_revisit",
    ).orderBy("url")


# ---------------------------------------------------------------------------
# Triangle counts / clustering coefficient (operators/hostrank.py:
# triangle_clustering): the link-ring signal — near-clique neighbor-
# hoods cluster toward 1, organic hosts sit lower, spokes at 0. DuckDB
# re-runs the degree-ordered wedge join from scratch; the coefficient
# is an exact integer ratio so no rounding is needed.
# ---------------------------------------------------------------------------

_TRI_ORACLE = """
WITH hosts AS (SELECT range AS host FROM range(37)),
synth AS (
  SELECT DISTINCT doc_id % 37 AS src, (doc_id // 37) % 37 AS dst
  FROM documents
  WHERE ((doc_id * 1103515245 + 12345) % 101) < 29
    AND (doc_id % 37) != ((doc_id // 37) % 37)),
ring AS (SELECT host AS src, (host + 1) % 37 AS dst FROM hosts),
e0 AS (SELECT DISTINCT src, dst FROM (SELECT * FROM synth UNION ALL SELECT * FROM ring)),
und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM e0 WHERE src != dst),
deg AS (SELECT v, COUNT(*) AS degree FROM (
          SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und) GROUP BY v),
orient AS (
  SELECT CASE WHEN da.degree < db.degree
                OR (da.degree = db.degree AND und.a < und.b)
              THEN und.a ELSE und.b END AS lo,
         CASE WHEN da.degree < db.degree
                OR (da.degree = db.degree AND und.a < und.b)
              THEN und.b ELSE und.a END AS hi
  FROM und JOIN deg da ON und.a = da.v JOIN deg db ON und.b = db.v),
wedges AS (
  SELECT e1.lo AS p, e1.hi AS x, e2.hi AS y
  FROM orient e1 JOIN orient e2 ON e1.lo = e2.lo AND e1.hi < e2.hi),
closing AS (
  SELECT DISTINCT x2, y2 FROM (
    SELECT LEAST(lo, hi) AS x2, GREATEST(lo, hi) AS y2 FROM orient
    UNION ALL
    SELECT GREATEST(lo, hi) AS x2, LEAST(lo, hi) AS y2 FROM orient)),
tris AS (
  SELECT p, x, y FROM wedges JOIN closing ON x = x2 AND y = y2),
per_node AS (
  SELECT v, COUNT(*) AS triangles FROM (
    SELECT p AS v FROM tris UNION ALL SELECT x AS v FROM tris
    UNION ALL SELECT y AS v FROM tris) GROUP BY v)
SELECT h.host,
       CAST(COALESCE(deg.degree, 0) AS BIGINT) AS degree,
       CAST(COALESCE(pn.triangles, 0) AS BIGINT) AS triangles,
       CASE WHEN COALESCE(deg.degree, 0) >= 2
            THEN 2.0 * COALESCE(pn.triangles, 0)
                 / (deg.degree * (deg.degree - 1))
            ELSE 0.0 END AS clustering
FROM hosts h
LEFT JOIN deg ON h.host = deg.v
LEFT JOIN per_node pn ON h.host = pn.v
ORDER BY h.host
"""


@_register("host_triangles", oracle=_TRI_ORACLE)
def q_host_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host triangle counts + local clustering coefficient via the
    degree-ordered wedge join (oriented out-degree bounded ~sqrt(m), so
    hubs never explode the self-join). Three shuffles total."""
    from crawler_ai_spark.operators.hostrank import triangle_clustering
    from crawler_ai_spark.queries.crawl import synth_host_edges

    edges, hosts = synth_host_edges(spark, sf_dir)
    return triangle_clustering(edges, hosts).orderBy("host")


# ---------------------------------------------------------------------------
# Unicode script detection (pipeline/textstats.py: script_columns):
# per-script character ratios + dominant script. Each doc's ASCII text
# gets a doc_id-selected non-Latin snippet appended so every script
# class and the mixed-script ratios are exercised; DuckDB counts with
# RE2's \p{Script} dialect (Spark uses Java's \p{script=...}) — the
# counts must agree exactly across regex engines.
# ---------------------------------------------------------------------------

_SCRIPT_SNIPPETS = [
    ("Cyrillic", "привет мир статья"),
    ("Han", "你好世界文章"),
    ("Arabic", "مرحبا بالعالم"),
    ("Devanagari", "नमस्ते दुनिया"),
    ("Hangul", "안녕하세요 세계"),
    ("Hiragana", "こんにちは"),
    ("Katakana", "コンニチハ"),
    ("Greek", "γεια σου κόσμε"),
    ("Hebrew", "שלום עולם"),
    ("Thai", "สวัสดีชาวโลก"),
]


def _script_case_sql() -> str:
    whens = " ".join(
        f"WHEN {i} THEN '{snip}'" for i, (_, snip) in enumerate(_SCRIPT_SNIPPETS)
    )
    return f"CASE doc_id % {len(_SCRIPT_SNIPPETS)} {whens} END"


_SCRIPT_COUNT_COLS = ", ".join(
    "len(regexp_extract_all(t, '" + "\\p{" + s + "}" + "')) AS c_" + s.lower()
    for s in ("Latin", "Cyrillic", "Han", "Arabic", "Devanagari",
              "Hangul", "Hiragana", "Katakana", "Greek", "Hebrew", "Thai")
)


_SCRIPT_ORACLE = f"""
WITH aug AS (
  SELECT doc_id, text || ' ' || {_script_case_sql()} AS t
  FROM documents WHERE text IS NOT NULL
),
counted AS (
  SELECT doc_id,
         len(regexp_extract_all(t, '\\S')) AS ns,
         {_SCRIPT_COUNT_COLS}
  FROM aug
)
SELECT doc_id,
       CAST(ns AS BIGINT) AS script_chars,
       CAST(c_latin AS DOUBLE) / ns AS script_latin,
       CAST(c_cyrillic AS DOUBLE) / ns AS script_cyrillic,
       CAST(c_han AS DOUBLE) / ns AS script_han,
       CAST(c_arabic AS DOUBLE) / ns AS script_arabic,
       CASE (
         SELECT s FROM (VALUES
           ('latin', c_latin), ('cyrillic', c_cyrillic), ('han', c_han),
           ('arabic', c_arabic), ('devanagari', c_devanagari),
           ('hangul', c_hangul), ('hiragana', c_hiragana),
           ('katakana', c_katakana), ('greek', c_greek),
           ('hebrew', c_hebrew), ('thai', c_thai)) AS v(s, c)
         WHERE c = GREATEST(c_latin, c_cyrillic, c_han, c_arabic,
                            c_devanagari, c_hangul, c_hiragana,
                            c_katakana, c_greek, c_hebrew, c_thai)
           AND c > 0
         ORDER BY s LIMIT 1
       ) WHEN NULL THEN 'none' ELSE COALESCE((
         SELECT s FROM (VALUES
           ('latin', c_latin), ('cyrillic', c_cyrillic), ('han', c_han),
           ('arabic', c_arabic), ('devanagari', c_devanagari),
           ('hangul', c_hangul), ('hiragana', c_hiragana),
           ('katakana', c_katakana), ('greek', c_greek),
           ('hebrew', c_hebrew), ('thai', c_thai)) AS v(s, c)
         WHERE c = GREATEST(c_latin, c_cyrillic, c_han, c_arabic,
                            c_devanagari, c_hangul, c_hiragana,
                            c_katakana, c_greek, c_hebrew, c_thai)
           AND c > 0
         ORDER BY s LIMIT 1
       ), 'none') END AS dominant_script
FROM counted ORDER BY doc_id
"""


@_register("doc_script_detect", oracle=_SCRIPT_ORACLE)
def q_doc_script_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode script ratios + dominant script per doc — the gate in
    front of any language model in a langid stack. Row-local JVM
    regexp_count; zero shuffle."""
    from crawler_ai_spark.pipeline.textstats import script_columns

    docs = _t(spark, sf_dir, "documents").where("text IS NOT NULL")
    snippet = F.lit("")
    for i, (_, snip) in enumerate(_SCRIPT_SNIPPETS):
        snippet = F.when(
            F.col("doc_id") % len(_SCRIPT_SNIPPETS) == i, F.lit(snip)
        ).otherwise(snippet)
    aug = docs.select(
        "doc_id", F.concat(F.col("text"), F.lit(" "), snippet).alias("t")
    )
    cols = script_columns(F.col("t"))
    return aug.select(
        "doc_id",
        cols["script_chars"].alias("script_chars"),
        cols["script_latin"].alias("script_latin"),
        cols["script_cyrillic"].alias("script_cyrillic"),
        cols["script_han"].alias("script_han"),
        cols["script_arabic"].alias("script_arabic"),
        cols["dominant_script"].alias("dominant_script"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# UCB adaptive host allocation (operators/hostrank.py: ucb_host_scores):
# bandit scoring over fetch outcomes — exploit hosts that pay off,
# explore barely-tried ones. Synth history: 19 hosts with LCG-derived
# per-fetch success and doc-dependent fetch counts, so rates AND pull
# counts both vary; DuckDB recomputes rate + c*sqrt(ln(N)/n) and the
# normalization from scratch.
# ---------------------------------------------------------------------------

_UCB_C = 1.4142135623730951

_UCB_ORACLE = f"""
WITH history AS (
  SELECT 'u' || (doc_id % 19) || '.example' AS host,
         ((doc_id * 4 + v.k) * 1103515245 + 12345) % 5 < 2 AS success
  FROM documents, range(4) v(k)
  WHERE (doc_id % 19) + v.k < 21
),
agg AS (
  SELECT host, COUNT(*) AS n_fetches,
         SUM(CASE WHEN success THEN 1 ELSE 0 END) AS successes
  FROM history GROUP BY host
),
tot AS (SELECT CAST(SUM(n_fetches) AS DOUBLE) AS n_total FROM agg),
scored AS (
  SELECT host, n_fetches, successes,
         round(CAST(successes AS DOUBLE) / n_fetches
               + {_UCB_C:.17e} * sqrt(ln(tot.n_total) / n_fetches), 9)
           + {0.0:.17e} AS score
  FROM agg, tot
),
ssum AS (SELECT SUM(score) AS s FROM scored)
SELECT host, CAST(n_fetches AS BIGINT) AS n_fetches,
       CAST(successes AS BIGINT) AS successes,
       score, score / ssum.s AS rank
FROM scored, ssum ORDER BY host
"""


@_register("ucb_host_allocation", oracle=_UCB_ORACLE)
def q_ucb_host_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UCB1 over per-host fetch outcomes: normalized scores feed
    budget_from_rank, so crawl budget balances exploitation of
    productive hosts against exploration of untried ones. One
    map-combined groupBy + two one-row broadcasts."""
    from crawler_ai_spark.operators.hostrank import ucb_host_scores

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    history = (
        docs.join(spark.range(4).select(F.col("id").alias("k")))
        .where((d % 19) + F.col("k") < 21)
        .select(
            F.concat(F.lit("u"), (d % 19).cast("string"), F.lit(".example")).alias(
                "host"
            ),
            (((d * 4 + F.col("k")) * 1103515245 + 12345) % 5 < 2).alias("success"),
        )
    )
    return ucb_host_scores(history, c=_UCB_C).orderBy("host")
