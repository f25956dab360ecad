"""Frontier expansion operators — one crawl batch as a DataFrame pipeline.

This is the Spark re-expression of the reference spider's per-page loop
(scrapy_career_spider.py:156-209 homepage, :417-495 pages): link harvest →
validity filter → per-page dedup → priority bucketing → per-bucket budget →
urljoin → same-domain gate → scheduler dedup (URL-seen anti-join).

Determinization note (SURVEY.md §4.3): the reference's ``list(set(links))``
is hash-order nondeterministic; the determinized model — shared verbatim by
the plain-Python golden simulator in tests/golden_crawl.py — keeps FIRST
OCCURRENCE document order within each page. Everything downstream
(discovered_seq, bucket ranks, the final URL-seen set) is a pure function of
that order, so Spark run ≡ golden run, bit for bit.

Scale shape (what the plan compiles to):
- parse UDF runs once per scheduled page, AFTER url-only filters
- link pipeline is explode + window ops partitioned by (seed, parent) —
  narrow keys, no skew (a page yields ≤ ~100 links)
- the seen anti-join is the only big shuffle; it joins on url_hash BIGINT
  (sort-merge at scale, AQE-converted to broadcast when the batch is small;
  optionally bloom-prefiltered — operators/seen.py)
- hot-host skew in the parse stage is defeated by salted repartition:
  repartition(host, pmod(xxhash64(url), SALT)) — W2
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from crawler_ai_spark import constants as K
from crawler_ai_spark.functions import filters as FL
from crawler_ai_spark.functions.html import explode_links
from crawler_ai_spark.functions.urls import canonicalize_udf, url_hash

PARSE_SALT_BUCKETS = 8


def salted_repartition(df: DataFrame, n_partitions: int, salt_buckets: int = PARSE_SALT_BUCKETS) -> DataFrame:
    """W2 — spread a hot host over ``salt_buckets`` partitions while keeping
    locality for cold hosts. AQE fixes skewed *joins*; this fixes the skewed
    *parse/fetch* stage, which AQE cannot see into."""
    return df.repartition(
        n_partitions,
        F.col("host"),
        F.pmod(F.xxhash64(F.col("url")), F.lit(salt_buckets)),
    )


def harvest_links(parsed: DataFrame) -> DataFrame:
    """Parsed pages → candidate child links with deterministic per-page order.

    Input: columns url (parent), seed_url, seed_host, page_order (per-seed
    processing rank of the parent), parse (struct).
    Output: one row per (parent, unique valid href) with bucket priority and
    within-bucket rank, budget-capped — the spider's prioritize + [:max]
    (scrapy_career_spider.py:179-208/:476-495)."""
    links = explode_links(parsed).where(F.col("href").isNotNull())

    # page-level REP (column-guarded, CrawlConfig.obey_page_rep): a
    # rel-nofollow'd anchor drops BEFORE dedup/bucketing so it never
    # consumes O2 budget — matching the sequential model, where the
    # publisher's annotation removes the link from consideration
    if "rep_nofollow_hrefs" in parsed.columns:
        links = links.where(
            ~F.array_contains(
                F.coalesce(
                    F.col("rep_nofollow_hrefs"),
                    F.array().cast("array<string>"),
                ),
                F.col("href"),
            )
        ).drop("rep_nofollow_hrefs")

    # F1 — raw-href validity vs the SEED's domain (spider :280-325)
    links = links.where(FL.is_valid_link_expr(F.col("href"), F.col("seed_host")))

    # per-page first-occurrence dedup (determinized list(set(...)), :252)
    w_first = Window.partitionBy("seed_url", "url", "href").orderBy("link_pos")
    links = (
        links.withColumn("_occ", F.row_number().over(w_first))
        .where(F.col("_occ") == 1)
        .drop("_occ")
    )

    # O1 — priority bucket from the raw href (:327-415). Arrow/RE2 fast
    # path: values pinned identical to FL.priority_expr by
    # tests/test_fastmatch.py; at frontier scale the JVM-NFA twin was the
    # single hottest expression of the whole scheduling pipeline
    # (functions/fastmatch.py has the measurements)
    from crawler_ai_spark.functions.fastmatch import priority_fast

    links = links.withColumn("priority", priority_fast(F.col("href")))

    # O2 — per-(page, bucket) budget: first N by document order (:185-186)
    w_bucket = Window.partitionBy("seed_url", "url", "priority").orderBy("link_pos")
    links = (
        links.withColumn("bucket_rank", F.row_number().over(w_bucket))
        .where(F.col("bucket_rank") <= FL.priority_budget_expr(F.col("priority")))
    )

    # P1 — canonicalize (urljoin + fragment strip), then F2 same-domain gate
    links = links.withColumn("child_url", canonicalize_udf(F.col("url"), F.col("href")))
    links = links.where(FL.same_domain_expr(F.col("child_url"), F.col("seed_host")))
    return links


def assign_sequence(links: DataFrame, seq_offsets: DataFrame | None = None) -> DataFrame:
    """Deterministic discovered_seq per seed (SURVEY.md §4.3 — no
    monotonically_increasing_id): order = (parent processing order, bucket
    priority desc, within-bucket rank), continuing each seed's counter via
    ``seq_offsets(seed_url, seq_offset)``."""
    w = Window.partitionBy("seed_url").orderBy(
        F.col("page_order").asc(), F.col("priority").desc(), F.col("bucket_rank").asc(), F.col("link_pos").asc()
    )
    out = links.withColumn("_rn", F.row_number().over(w))
    if seq_offsets is not None:
        out = out.join(F.broadcast(seq_offsets), "seed_url", "left").withColumn(
            "discovered_seq", F.col("_rn") + F.coalesce(F.col("seq_offset"), F.lit(0))
        ).drop("seq_offset")
    else:
        out = out.withColumn("discovered_seq", F.col("_rn"))
    return out.drop("_rn")


def dedup_against_seen(candidates: DataFrame, seen: DataFrame) -> DataFrame:
    """D2 — the scheduler's URL-seen anti-join, keyed on xxhash64(url).

    Within-batch duplicates collapse to the FIRST discovery (min
    discovered_seq) — Scrapy's fingerprint dedup admits the first yield.
    ``seen`` needs only a ``url_hash`` column."""
    w = Window.partitionBy("seed_url", "url_hash").orderBy("discovered_seq")
    firsts = (
        candidates.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    return firsts.join(seen.select("url_hash").distinct(), "url_hash", "left_anti")


def with_url_hash(df: DataFrame, url_col: str = "child_url") -> DataFrame:
    return df.withColumn("url_hash", url_hash(F.col(url_col)))


def _robots_rule_matches(path: Column, p: Column) -> Column:
    """RFC 9309 §2.2.3 special characters, evaluated JVM-side: ``*``
    matches any octet sequence and a TRAILING ``$`` anchors the end of
    the path; everything else is a literal prefix match. Plain rules (the
    overwhelming majority) stay on the fast startswith path; a wildcard
    rule translates to an anchored Java regex (metachars escaped, ``*``
    → ``.*``, optional end anchor) checked with regexp_like."""
    anchored = p.endswith("$")
    wild = p.contains("*") | anchored
    # strip the trailing anchor BEFORE escaping — any remaining '$' in
    # the rule body is a literal octet and gets escaped below
    core = F.when(anchored, F.substring(p, F.lit(1), F.length(p) - 1)).otherwise(p)
    escaped = F.regexp_replace(core, r"([\\.\^\$\+\?\(\)\[\]\{\}\|])", r"\\$1")
    rx = F.concat(
        F.lit("^"),
        F.replace(escaped, F.lit("*"), F.lit(".*")),
        F.when(anchored, F.lit("$")).otherwise(F.lit("")),
    )
    return F.when(wild, F.regexp_like(path, rx)).otherwise(path.startswith(p))


def apply_robots(frontier: DataFrame, host_rules: DataFrame | None) -> DataFrame:
    """W3 — robots gate: drop frontier URLs a host's rules disallow.
    Broadcast join (host_rules is small). Default allow-all reproduces
    the reference (ROBOTSTXT_OBEY=False, crawler_ai/settings.py:9).

    Disallow-only rules: blocked iff any disallow rule matches. When
    host_rules also carries ``allow_prefixes`` (parse_robots
    with_allow=True), RFC 9309 longest-match precedence applies: the most
    specific matching rule wins; at equal length the least restrictive
    (allow) wins — all in one JVM aggregate over the rule arrays, no
    Python, no extra shuffle. Rules may use the RFC's ``*`` / trailing
    ``$`` special characters (_robots_rule_matches); specificity is the
    rule's length, the standard most-octets tiebreak."""
    if host_rules is None:
        return frontier
    path = F.coalesce(F.try_parse_url(F.col("url"), F.lit("PATH")), F.lit(""))

    def longest_match(arr: Column) -> Column:
        return F.aggregate(
            F.filter(
                F.coalesce(arr, F.array()),
                lambda p: _robots_rule_matches(path, p),
            ),
            F.lit(-1),
            lambda acc, p: F.greatest(acc, F.length(p)),
        )

    rule_cols = ["host", "disallow_prefixes"]
    if "allow_prefixes" in host_rules.columns:
        rule_cols.append("allow_prefixes")
        blocked = longest_match(F.col("disallow_prefixes")) > longest_match(
            F.col("allow_prefixes")
        )
    else:
        blocked = F.exists(
            F.coalesce(F.col("disallow_prefixes"), F.array()),
            lambda p: _robots_rule_matches(path, p),
        )
    return (
        frontier.join(F.broadcast(host_rules.select(*rule_cols)), "host", "left")
        .where(~blocked)
        .drop("disallow_prefixes", "allow_prefixes")
    )


def salted_budget_rank(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list,
    budget,
    salt_buckets: int = PARSE_SALT_BUCKETS,
    salt_on: str = "url",
) -> DataFrame:
    """Two-phase windowed top-``budget`` per key, skew-proof (W2/O2 at
    scale). A plain ``row_number() over (partition by key)`` serializes a
    hot key into ONE task — with a Zipf host distribution the hottest host
    holds ~half the batch and caps speedup regardless of cores. Phase 1
    ranks within (key, salt) and keeps ≤ budget per salt (parallel across
    salts); phase 2 re-ranks only the ≤ budget×salts survivors per key.
    Identical output to the single window (both phases order by the same
    deterministic key), ~salt× more parallel on the hot key.

    ``order_cols`` MUST be a total order within each key partition (append
    a unique column such as url as the final tie-break) — with ties the
    phase-1 winners, and hence the two-phase ≡ one-window equivalence,
    would depend on partition order."""
    salt = F.pmod(F.xxhash64(F.col(salt_on)), F.lit(salt_buckets))
    w1 = Window.partitionBy(*partition_cols, salt).orderBy(*order_cols)
    survivors = (
        df.withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= budget)
        .drop("_r1")
    )
    w2 = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return (
        survivors.withColumn("_r2", F.row_number().over(w2))
        .where(F.col("_r2") <= budget)
        .drop("_r2")
    )


def _politeness_order(aging_batches: int | None) -> list:
    """The one total order every politeness window (host, registrable-
    domain, IP grain) ranks by, so the scheduled/deferred split composes
    deterministically across grains.

    (url, seed_url) is the unique final tie-break: discovered_seq is a
    PER-SEED ordinal, so two seeds sharing a key can tie on (priority,
    seq) — and the SAME url can appear under two seeds in one batch
    (the within-batch dedup is per (seed_url, url_hash)), so url alone
    is still not total. Without a total order the scheduled/deferred
    split (and resume determinism) would depend on partition order.

    With ``aging_batches`` set, effective priority
    ``priority + wait_batches // aging_batches`` ranks FIRST (raw
    priority stays as the next key so equal-effective rows keep the
    un-aged order). Every budget grain must use the same aged key:
    aging only at the host window lets a row clear the host budget yet
    starve forever at the domain/IP window behind an endless supply of
    new higher-priority URLs — the starvation-freedom guarantee has to
    hold end-to-end through the whole budget chain."""
    order = [
        F.col("priority").desc(),
        F.col("discovered_seq").asc(),
        F.col("url").asc(),
        F.col("seed_url").asc(),
    ]
    if aging_batches is not None:
        order.insert(
            0,
            (
                F.col("priority")
                + F.floor(
                    F.coalesce(F.col("wait_batches"), F.lit(0))
                    / F.lit(aging_batches)
                )
            ).desc(),
        )
    return order


def apply_host_budget(
    frontier: DataFrame,
    per_host_per_batch: int | None,
    host_budgets: DataFrame | None = None,
    aging_batches: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """W2 politeness budget: at most N URLs per host per batch (the batch
    analogue of DOWNLOAD_DELAY=1/s — crawl rate × batch wall-time). Returns
    (scheduled, deferred); deferred rows re-enter the next batch's frontier
    unchanged, preserving their discovered_seq (so ordering is stable).

    ``host_budgets`` (host, host_budget INT — typically derived from
    robots Crawl-delay: interval ÷ delay) tightens the cap per host via a
    broadcast join: effective budget = least(global, host's own); a host
    with neither is unlimited. NULL-safe: `least` ignores NULLs and rows
    with no budget at all are always scheduled.

    ``aging_batches`` (starvation freedom): rank by effective priority
    ``priority + wait_batches // aging_batches`` instead of raw priority,
    where ``wait_batches`` counts consecutive deferrals (the loop bumps
    it on every deferral and mints 0 on schedule). A fixed-priority row
    can otherwise starve forever behind an endless supply of new
    higher-priority rows on a hot host; with aging its effective
    priority grows without bound, so every row schedules in finite
    batches. Requires the ``wait_batches`` column when set."""
    if per_host_per_batch is None and host_budgets is None:
        return frontier, frontier.limit(0)
    order = _politeness_order(aging_batches)
    # two-phase salted rank (see salted_budget_rank): a row whose salt-local
    # rank exceeds the budget has ≥ budget same-host rows ahead of it in ITS
    # salt alone, so its host-global rank exceeds the budget too — phase-1
    # losers are provably deferred, and only ≤ budget×salts survivors reach
    # the single-task-per-host phase-2 window
    had_budget_col = False
    if host_budgets is not None:
        frontier = frontier.join(
            F.broadcast(host_budgets.select("host", "host_budget")), "host", "left"
        )
        had_budget_col = True
        eff = (
            F.least(F.lit(per_host_per_batch), F.col("host_budget"))
            if per_host_per_batch is not None
            else F.col("host_budget")
        )
    else:
        eff = F.lit(per_host_per_batch)

    def keep(rank):
        return eff.isNull() | (rank <= eff)

    salt = F.pmod(F.xxhash64(F.col("url")), F.lit(PARSE_SALT_BUCKETS))
    w1 = Window.partitionBy("host", salt).orderBy(*order)
    r1 = frontier.withColumn("_hr1", F.row_number().over(w1))
    survivors = r1.where(keep(F.col("_hr1"))).drop("_hr1")
    lost1 = r1.where(~keep(F.col("_hr1"))).drop("_hr1")
    w2 = Window.partitionBy("host").orderBy(*order)
    r2 = survivors.withColumn("_hr2", F.row_number().over(w2))
    scheduled = r2.where(keep(F.col("_hr2"))).drop("_hr2")
    lost2 = r2.where(~keep(F.col("_hr2"))).drop("_hr2")
    if had_budget_col:
        scheduled = scheduled.drop("host_budget")
        lost1 = lost1.drop("host_budget")
        lost2 = lost2.drop("host_budget")
    return scheduled, lost1.unionByName(lost2)


def apply_ip_budget(
    frontier: DataFrame,
    ip_map: DataFrame | None,
    per_ip_per_batch: int | None,
    aging_batches: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """W2 at the SERVER grain: at most N URLs per resolved IP per batch.
    Host-grain politeness under-throttles when many vhosts share one
    server (a shared-hosting box with 200 domains takes 200× the
    intended rate) — production crawlers (Heritrix, Nutch) therefore
    group politeness queues by IP. ``ip_map`` is (host, ip) from a
    resolver stage; it is HOST-grain (small next to the frontier) and
    broadcast. Hosts with no mapping fall back to their own host as the
    group key — unknown-IP hosts keep host-grain politeness rather than
    sharing one giant NULL group.

    Same two-phase salted windows as apply_host_budget (phase-1 losers
    are provably over-budget in their salt alone), same total order —
    including the ``aging_batches`` effective-priority key, so
    starvation freedom holds through this grain too (see
    _politeness_order) — so composing after apply_host_budget preserves
    the deterministic scheduled/deferred split. Returns
    (scheduled, deferred)."""
    if ip_map is None or per_ip_per_batch is None:
        return frontier, frontier.limit(0)
    tagged = frontier.join(
        F.broadcast(ip_map.select("host", "ip")), "host", "left"
    ).withColumn("_ipg", F.coalesce(F.col("ip"), F.col("host")))
    order = _politeness_order(aging_batches)
    salt = F.pmod(F.xxhash64(F.col("url")), F.lit(PARSE_SALT_BUCKETS))
    w1 = Window.partitionBy("_ipg", salt).orderBy(*order)
    r1 = tagged.withColumn("_ir1", F.row_number().over(w1))
    survivors = r1.where(F.col("_ir1") <= per_ip_per_batch).drop("_ir1")
    lost1 = r1.where(F.col("_ir1") > per_ip_per_batch).drop("_ir1")
    w2 = Window.partitionBy("_ipg").orderBy(*order)
    r2 = survivors.withColumn("_ir2", F.row_number().over(w2))
    scheduled = r2.where(F.col("_ir2") <= per_ip_per_batch).drop("_ir2")
    lost2 = r2.where(F.col("_ir2") > per_ip_per_batch).drop("_ir2")
    drop = lambda d: d.drop("ip", "_ipg")  # noqa: E731
    return drop(scheduled), drop(lost1.unionByName(lost2))


def apply_domain_budget(
    frontier: DataFrame,
    per_domain_per_batch: int | None,
    aging_batches: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """W2 at the REGISTRABLE-DOMAIN grain: at most N URLs per public-
    suffix-plus-one domain per batch. Host-grain politeness under-
    throttles a registrant who fans one site across unbounded subdomains
    (a1.spam.com, a2.spam.com, ... each gets a full host budget — the
    classic subdomain-spam shape); grouping by the PSL registrable
    domain (functions/urls.py: registered_domain_expr) caps the
    registrant as a whole, matching how production crawlers assign
    politeness queues by domain, not host. Hosts whose registrable
    domain is NULL (bare public suffixes, IPs, empty) fall back to their
    own host — they keep host-grain politeness rather than sharing one
    NULL group.

    The group key is a pure-codegen expression over the host — no join,
    no resolver stage — so this composes with apply_host_budget and
    apply_ip_budget at the cost of its own two windows only. Same
    two-phase salted rank, same total order — including the
    ``aging_batches`` effective-priority key, so a row that cleared the
    aged host window cannot starve forever here behind fresh
    high-priority URLs of the same registrant (see _politeness_order) —
    defer-not-drop contract: returns (scheduled, deferred)."""
    if per_domain_per_batch is None:
        return frontier, frontier.limit(0)
    from crawler_ai_spark.functions.urls import registered_domain_expr

    tagged = frontier.withColumn(
        "_dom", F.coalesce(registered_domain_expr(F.col("host")), F.col("host"))
    )
    order = _politeness_order(aging_batches)
    salt = F.pmod(F.xxhash64(F.col("url")), F.lit(PARSE_SALT_BUCKETS))
    w1 = Window.partitionBy("_dom", salt).orderBy(*order)
    r1 = tagged.withColumn("_dr1", F.row_number().over(w1))
    survivors = r1.where(F.col("_dr1") <= per_domain_per_batch).drop("_dr1")
    lost1 = r1.where(F.col("_dr1") > per_domain_per_batch).drop("_dr1")
    w2 = Window.partitionBy("_dom").orderBy(*order)
    r2 = survivors.withColumn("_dr2", F.row_number().over(w2))
    scheduled = r2.where(F.col("_dr2") <= per_domain_per_batch).drop("_dr2")
    lost2 = r2.where(F.col("_dr2") > per_domain_per_batch).drop("_dr2")
    return scheduled.drop("_dom"), lost1.unionByName(lost2).drop("_dom")
