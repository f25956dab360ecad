"""DUST rule mining — Different URLs with Similar Text (Bar-Yossef,
Keidar, Schonfeld, WWW 2007): learn URL rewrite rules from observed
same-content URL pairs, so the crawler stops re-fetching print views,
session-id variants and index.html aliases it has already seen.

The reference crawler dedups only by exact canonical URL
(app/services/crawler.py visited-set membership); at web scale the
bigger waste is *structurally* duplicate URLs, and the classic answer
is to mine substitution rules from the duplicates the crawl has already
paid for:

1. group fetched pages by (host, content fingerprint);
2. STAR-PAIR each group: every URL pairs with the group's canonical
   (lexicographically smallest) URL — n-1 pairs per group, linear, not
   the quadratic all-pairs join;
3. decompose each pair by longest common prefix/suffix into one
   substring substitution rule  alpha -> beta  (variant -> canonical);
4. bucket digit runs in both sides to '*' (the paper's generalization
   move: '?sid=123' and '?sid=987' are one rule '?sid=*');
5. aggregate by rule, keep rules supported by >= min_support distinct
   pairs — value-dependent accidents (two pages that merely happen to
   collide) can't accumulate support, constant affix rules can.

Plan shape at 10^10 URLs: one fingerprint shuffle (groupBy host+fp,
group lists capped at `max_group` URLs so a viral page can't build an
unbounded array), one rule-count shuffle over short rows. The LCP/LCS
scan is O(len^2) per pair in whole-stage codegen — URL lengths are
~100 chars, and the identical formulation runs on the DuckDB side, so
the cross-engine hash pins every rule byte."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MIN_SUPPORT = 3
MAX_GROUP = 16


def _lcp_len(a: Column, b: Column) -> Column:
    """Length of the longest common prefix: max i with equal prefixes
    (prefix equality is monotone, so max over the matching set is the
    boundary). NULL-free: empty match set -> 0."""
    n = F.least(F.length(a), F.length(b))
    return F.coalesce(
        F.array_max(
            F.filter(
                F.transform(
                    F.sequence(F.lit(1), n),
                    lambda i: F.when(a.substr(F.lit(1), i) == b.substr(F.lit(1), i), i),
                ),
                lambda x: x.isNotNull(),
            )
        ),
        F.lit(0),
    )


def mine_dust_rules(
    pages: DataFrame,
    fingerprint: Column | None = None,
    min_support: int = MIN_SUPPORT,
    max_group: int = MAX_GROUP,
) -> DataFrame:
    """pages(url, ...) + a content fingerprint column -> supported DUST
    rules (rule_from, rule_to, support, n_hosts). `fingerprint` defaults
    to md5 of the page's normalized text column (callers with raw html
    should pass their extraction's fingerprint instead)."""
    from crawler_ai_spark.functions.urls import host_expr

    fp = fingerprint if fingerprint is not None else F.md5(F.col("text"))
    groups = (
        pages.select(
            host_expr(F.col("url")).alias("host"),
            fp.alias("fp"),
            F.col("url"),
        )
        .groupBy("host", "fp")
        .agg(
            F.slice(F.array_sort(F.collect_set("url")), 1, max_group).alias("urls")
        )
        .where(F.size("urls") >= 2)
    )
    pairs = groups.select(
        "host",
        F.element_at("urls", 1).alias("canon"),
        F.explode(F.slice("urls", 2, max_group)).alias("variant"),
    )
    lcp = _lcp_len(F.col("canon"), F.col("variant"))
    # suffix match on the reversed remainders, capped so prefix+suffix
    # never overlap on the shorter string
    rc = F.reverse(F.col("canon"))
    rv = F.reverse(F.col("variant"))
    lcs_raw = _lcp_len(rc, rv)
    lcs = F.least(
        lcs_raw,
        F.least(F.length("canon"), F.length("variant")) - lcp,
    )
    mid = lambda c: F.substring(  # noqa: E731
        c, lcp + 1, F.length(c) - lcp - lcs
    )
    rules = pairs.select(
        "host",
        F.regexp_replace(mid(F.col("variant")), "[0-9]+", "*").alias("rule_from"),
        F.regexp_replace(mid(F.col("canon")), "[0-9]+", "*").alias("rule_to"),
    )
    return (
        rules.groupBy("rule_from", "rule_to")
        .agg(
            F.count(F.lit(1)).alias("support"),
            F.countDistinct("host").alias("n_hosts"),
        )
        .where(F.col("support") >= min_support)
    )


def apply_dust_rules(
    frontier: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    min_from_len: int = 4,
    min_hosts: int = 2,
) -> DataFrame:
    """Rewrite frontier URLs by the mined CONSTANT rules (no '*' in
    either side — generalized rules need per-value matching and stay
    advisory). Rules are few (a learned table, not data-scale) and
    broadcast; applied longest rule_from first so more specific
    rewrites win. Adds `canonical_url`; unmatched URLs pass through
    unchanged.

    Because the rewritten URL becomes the fetched child_url, a bad rule
    misdirects fetches — three guards keep coincidental rules from
    firing crawl-wide:

    - `min_from_len`: a 1-2 char rule_from (minable from min_support
      pairs that all happen to share a tiny mid) would match almost
      every URL; require a meaningful affix.
    - `min_hosts`: rules whose support comes from a single host are
      host idioms at best and accidents at worst; require cross-host
      evidence before rewriting other hosts' URLs.
    - single-occurrence anchor: the mined substitution sits between one
      LCP/LCS split point, so a URL containing rule_from more than once
      is outside the mined evidence — leave it unchanged rather than
      rewriting every occurrence."""
    const_rules = [
        (r.rule_from, r.rule_to)
        for r in rules.where(
            ~F.col("rule_from").contains("*")
            & ~F.col("rule_to").contains("*")
            & (F.length("rule_from") >= min_from_len)
            & (F.col("n_hosts") >= min_hosts)
        ).collect()
    ]
    const_rules.sort(key=lambda t: (-len(t[0]), t[0], t[1]))
    out = F.col(url_col)
    for frm, to in const_rules:
        once = (
            F.length(out) - F.length(F.replace(out, F.lit(frm), F.lit("")))
        ) == F.lit(len(frm))
        out = F.when(once, F.replace(out, F.lit(frm), F.lit(to))).otherwise(out)
    return frontier.withColumn("canonical_url", out)


def elect_canonical(members: DataFrame) -> DataFrame:
    """Canonical-URL election per duplicate cluster — the integration
    point of the dedup signals: content fingerprints put URLs in one
    cluster (exact dedup / MinHash closure / mirror detection), pages
    may DECLARE a canonical (rel=canonical — functions/urls.py:
    canonical_link_expr; robots Host directive at host grain), and the
    archive still needs exactly ONE representative per cluster.

    members(cluster_id, url, declared) — declared = the page's own
    canonical claim (NULL when silent). Precedence per cluster:

    1. the most-declared URL among declarations that point AT a cluster
       member (external declarations can't hijack the cluster; ties by
       count break lexicographically);
    2. no valid declarations -> the shortest member URL (the classic
       index.html/print-variant heuristic);
    3. length ties -> lexicographic.

    Plan: one cluster-grain aggregation for valid declaration counts +
    one for the fallback minimum + a members join — three shuffles on
    the cluster key, no windows over raw pages. Returns (cluster_id,
    url, canonical_url, is_canonical)."""
    m = members.select("cluster_id", "url", "declared")
    urls = m.select("cluster_id", "url").distinct()
    # a declaration is valid only when it names a cluster member
    valid_decl = (
        m.where(F.col("declared").isNotNull())
        .join(
            urls.select(
                F.col("cluster_id").alias("_c"), F.col("url").alias("_u")
            ),
            (F.col("cluster_id") == F.col("_c")) & (F.col("declared") == F.col("_u")),
        )
        .select("cluster_id", F.col("declared").alias("cand"))
    )
    # most-declared wins; count ties break to the lexicographically
    # smallest candidate (min_by over the orderable (-n, cand) struct)
    decl_winner = (
        valid_decl.groupBy("cluster_id", "cand")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("cluster_id")
        .agg(F.expr("min_by(cand, struct(-n, cand))").alias("decl_url"))
    )
    fallback = urls.groupBy("cluster_id").agg(
        F.expr("min_by(url, struct(length(url), url))").alias("short_url")
    )
    chosen = fallback.join(decl_winner, "cluster_id", "left").select(
        "cluster_id",
        F.coalesce("decl_url", "short_url").alias("canonical_url"),
    )
    return urls.join(chosen, "cluster_id").select(
        "cluster_id",
        "url",
        "canonical_url",
        (F.col("url") == F.col("canonical_url")).alias("is_canonical"),
    )
