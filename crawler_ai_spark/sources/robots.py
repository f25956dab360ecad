"""W3 — robots.txt parsing: raw robots bodies → host_rules(host,
disallow_prefixes) for operators/frontier.apply_robots.

The reference DISOBEYS robots (ROBOTSTXT_OBEY=False, crawler_ai/
settings.py:9), so there is no parity target; this implements the
standard subset the gate consumes: ``User-agent`` groups and their
``Disallow`` prefixes, taking the union of the ``*`` group(s), plus the
non-standard-but-ubiquitous ``Crawl-delay`` (min across the ``*``
group's values; consumed by the politeness budget as a per-host
fetches-per-batch cap and by the live fetch stage as the slot width).
Allow lines (with_allow=True → RFC 9309 longest-match precedence), the
RFC's ``*`` / trailing-``$`` wildcard rule values (interpreted by
apply_robots), and global ``Sitemap:`` lines (with_sitemaps=True, fed to
expand_sitemaps) are all supported.

JVM-side: one regexp_extract_all per body picks the "User-agent: *"
groups, a second picks their Disallow values — no Python in the path."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# RFC 9309 group header: consecutive User-agent lines share the rule block
# that follows. A "*" group = a star UA line, then zero or more further UA
# lines (the rest of the shared header), then the rules up to the next UA
# line (which starts a NEW header, since this one already has rules) or
# EOF. Star lines anywhere in a header work: the match simply starts at
# the star line and skips the remaining header lines. Out of scope (as
# before): blank-line group termination inside a header.
_STAR_GROUP_RX = (
    r"(?is)user-agent:[^\S\n]*\*[^\n]*\n"
    r"(?:[^\S\n]*user-agent:[^\n]*\n)*"
    r"(.*?)(?=user-agent:|\z)"
)


def _token_group_rx(token: str) -> str:
    """Group-extraction regex for a specific product token (RFC 9309
    §2.2.1: case-insensitive match of the crawler's product token against
    a User-agent line's value; same consecutive-header handling as the
    star regex). The token is \\Q…\\E-quoted — valid in Java regex and
    RE2 alike."""
    quoted = "\\Q" + token.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    # (?:\n|\z): a token header that is the file's LAST line (no trailing
    # newline) still selects — its empty rule block means allow-all
    return (
        rf"(?is)user-agent:[^\S\n]*{quoted}[^\S\n]*(?:\n|\z)"
        r"(?:[^\S\n]*user-agent:[^\n]*\n)*"
        r"(.*?)(?=user-agent:|\z)"
    )
# [^\S\n] (line-local whitespace), NOT \s: a greedy \s* after the colon
# would cross the newline of an empty "Disallow:" line and capture the
# NEXT line's text as the value (found by the hypothesis property test)
_DISALLOW_RX = r"(?im)^[^\S\n]*disallow:[^\S\n]*(\S*)[^\S\n]*$"
_ALLOW_RX = r"(?im)^[^\S\n]*allow:[^\S\n]*(\S*)[^\S\n]*$"
# digits only after the colon (same line-local whitespace discipline);
# fractional seconds allowed (seen in the wild), negative/garbage ignored
_CRAWL_DELAY_RX = r"(?im)^[^\S\n]*crawl-delay:[^\S\n]*([0-9]+(?:\.[0-9]+)?)[^\S\n]*$"
# Sitemap lines are GLOBAL, not group-scoped (sitemaps.org protocol /
# RFC 9309 §2.2.4 "other records"): extracted from the whole body
_SITEMAP_RX = r"(?im)^[^\S\n]*sitemap:[^\S\n]*(\S+)[^\S\n]*$"

# Yandex Clean-param (published spec: "Clean-param: p1&p2 [path-prefix]")
# — publisher-DECLARED DUST: these query params don't change the
# resource, strip them before dedup. Inter-sectional like Sitemap, so
# extracted from the whole body; the capture keeps "params [prefix]".
_CLEAN_PARAM_RX = (
    r"(?im)^[^\S\n]*clean-param:[^\S\n]*(\S+(?:[^\S\n]+\S+)?)[^\S\n]*$"
)

# Yandex Host directive: the publisher's declared canonical mirror.
# Inter-sectional; published behavior takes the FIRST valid line.
_HOST_DIRECTIVE_RX = r"(?im)^[^\S\n]*host:[^\S\n]*(\S+)[^\S\n]*$"


def parse_robots(
    robots: DataFrame,
    host_col: str = "host",
    body_col: str = "body",
    with_crawl_delay: bool = False,
    with_allow: bool = False,
    with_sitemaps: bool = False,
    with_clean_param: bool = False,
    with_host_directive: bool = False,
    ua_token: str | None = None,
) -> DataFrame:
    """(host, body) → (host, disallow_prefixes ARRAY<STRING>[,
    allow_prefixes ARRAY<STRING>][, crawl_delay_s DOUBLE][,
    sitemap_urls ARRAY<STRING>]).

    Empty ``Disallow:`` lines (allow-all markers) are dropped; hosts whose
    ``*`` group disallows nothing come back with an empty array. With
    ``with_allow``, ``Allow`` prefixes are emitted too and apply_robots
    switches to RFC 9309 longest-match precedence. With
    ``with_crawl_delay``, the minimum valid ``Crawl-delay`` across the
    ``*`` group(s) is emitted (NULL when absent — crawler picks its own
    pace). With ``with_sitemaps``, ``Sitemap:`` URLs are emitted —
    these are GLOBAL lines (not group-scoped), ready to seed the S6
    sitemap source. Rule values may carry RFC 9309 ``*`` / trailing
    ``$`` special characters; the gate (operators/frontier.apply_robots)
    interprets them.

    With ``ua_token``, RFC 9309 §2.2.1 group selection applies: if ANY
    group's User-agent line matches the crawler's product token
    (case-insensitive, exact value), the union of THOSE groups governs
    and the ``*`` groups are ignored — even when the matching groups
    allow everything (the presence of the group is what selects it, not
    the presence of rules); hosts with no matching group fall back to
    the ``*`` groups as before."""
    groups = F.regexp_extract_all(F.col(body_col), F.lit(_STAR_GROUP_RX), F.lit(1))
    star_text = F.concat_ws("\n", groups)
    if ua_token is not None:
        tok_rx = _token_group_rx(ua_token)
        tok_groups = F.regexp_extract_all(F.col(body_col), F.lit(tok_rx), F.lit(1))
        # presence of a MATCHING HEADER selects the token groups, even if
        # their rule block is empty (an explicit allow-all for this bot)
        star_text = F.when(F.size(tok_groups) > 0, F.concat_ws("\n", tok_groups)).otherwise(
            star_text
        )
    prefixes = F.regexp_extract_all(star_text, F.lit(_DISALLOW_RX), F.lit(1))
    cleaned = F.array_distinct(F.filter(prefixes, lambda p: p != ""))
    cols = [F.col(host_col).alias("host"), cleaned.alias("disallow_prefixes")]
    if with_allow:
        # (?<!dis) is unnecessary: _ALLOW_RX anchors at line start through
        # whitespace only, so "Disallow:" lines can never match it
        allows = F.regexp_extract_all(star_text, F.lit(_ALLOW_RX), F.lit(1))
        cols.append(
            F.array_distinct(F.filter(allows, lambda p: p != "")).alias("allow_prefixes")
        )
    if with_crawl_delay:
        delays = F.regexp_extract_all(star_text, F.lit(_CRAWL_DELAY_RX), F.lit(1))
        cols.append(
            F.array_min(F.transform(delays, lambda d: d.cast("double"))).alias(
                "crawl_delay_s"
            )
        )
    if with_sitemaps:
        maps = F.regexp_extract_all(F.col(body_col), F.lit(_SITEMAP_RX), F.lit(1))
        cols.append(F.array_distinct(maps).alias("sitemap_urls"))
    if with_clean_param:
        # each entry → struct(params_csv '&'-joined names, path prefix
        # defaulting to '/'); inter-sectional, whole-body extraction
        lines = F.regexp_extract_all(
            F.col(body_col), F.lit(_CLEAN_PARAM_RX), F.lit(1)
        )
        entries = F.transform(
            F.array_distinct(lines),
            lambda l: F.struct(
                F.split_part(
                    F.regexp_replace(l, r"\s+", " "), F.lit(" "), F.lit(1)
                ).alias("params_csv"),
                F.coalesce(
                    F.nullif(
                        F.split_part(
                            F.regexp_replace(l, r"\s+", " "), F.lit(" "), F.lit(2)
                        ),
                        F.lit(""),
                    ),
                    F.lit("/"),
                ).alias("prefix"),
            ),
        )
        cols.append(entries.alias("clean_params"))
    if with_host_directive:
        # first valid Host line wins (Yandex behavior); absent → NULL
        hosts_found = F.regexp_extract_all(
            F.col(body_col), F.lit(_HOST_DIRECTIVE_RX), F.lit(1)
        )
        cols.append(
            F.when(F.size(hosts_found) > 0, F.element_at(hosts_found, 1))
            .otherwise(F.lit(None).cast("string"))
            .alias("preferred_host")
        )
    return robots.select(*cols)


def fetch_robots(
    frontier: DataFrame,
    transport,
    host_partitions: int | None = None,
    unreachable_disallow_all: bool = False,
) -> DataFrame:
    """W3 LIVE mode — fetch each host's /robots.txt through the real
    fetch stage (host co-location, UA rotation, shared error taxonomy;
    sources/fetch.py) and return (host, body) ready for parse_robots.

    The robots URL derives from a deterministic exemplar frontier URL per
    host (min(url)), because the HOST component alone loses scheme and
    port. Availability semantics follow RFC 9309 §2.3.1: an UNAVAILABLE
    robots file (4xx) means unrestricted — empty body, which parses to an
    empty rule set = allow-all. With ``unreachable_disallow_all`` the
    RFC's §2.3.1.4 server-error rule applies too: an UNREACHABLE file
    (5xx or transport failure) yields a synthetic complete-disallow body
    ("User-agent: *\\nDisallow: /"), so the whole host defers until a
    later fetch succeeds (compose with robots_ttl_batches for the RFC's
    retry-within-a-reasonable-time). Off by default: the permissive
    treat-unreachable-as-unavailable reading, the prior behavior (the
    reference itself crawls with ROBOTSTXT_OBEY=False, so any obedience
    at all is an extension).

    One fetch per host per crawl: the caller caches results in the
    robots_cache state table (plans/crawl_loop.py) and only newly-seen
    hosts reach this stage."""
    from crawler_ai_spark.sources.fetch import FetchConfig, fetch_pages

    origins = (
        frontier.groupBy("host")
        .agg(F.min("url").alias("u"))
        .select("host", F.regexp_extract("u", r"^(https?://[^/]+)", 1).alias("origin"))
    )
    robots_frontier = origins.select(
        F.concat(F.col("origin"), F.lit("/robots.txt")).alias("url"),
        "host",
        F.lit(0).alias("priority"),
        F.lit(0).cast("long").alias("discovered_seq"),
    )
    fetched = fetch_pages(
        robots_frontier,
        FetchConfig(transport=transport, per_host_delay_ms=0, host_partitions=host_partitions),
    )
    body = F.when(
        (F.col("status") == 200) & F.col("html").isNotNull(), F.col("html")
    )
    if unreachable_disallow_all:
        # 5xx or no response at all = UNREACHABLE (RFC 9309 §2.3.1.4):
        # assume complete disallow until a later fetch answers
        body = body.when(
            (F.col("status") >= 500) | F.col("status").isNull(),
            F.lit("User-agent: *\nDisallow: /"),
        )
    return fetched.select("host", body.otherwise(F.lit("")).alias("body"))


def expand_sitemaps(
    rules: DataFrame,
    transport,
    host_partitions: int | None = None,
    max_depth: int = 1,
) -> DataFrame:
    """Robots → sitemap → candidate URLs: fetch every ``Sitemap:`` URL a
    host's robots.txt advertised (parse_robots with_sitemaps=True) through
    the real fetch stage and extract the ``<loc>`` entries — the
    standard seed-expansion pipeline real crawlers run (sitemaps.org
    protocol; the same <loc> scan as the S6 sitemap source). Returns
    (host, url) candidate rows, deterministic order by (host, url).

    Unfetchable or non-XML sitemap bodies contribute nothing (a missing
    sitemap must not fail a crawl batch). ``<sitemapindex>`` files
    (sitemaps.org index format — the layout large sites actually use)
    recurse: their child <loc>s are re-fetched for up to ``max_depth``
    fetch rounds, with an already-fetched anti-join so index cycles
    terminate; children still unexpanded when the depth cap hits are
    returned as candidates (the caller sees them rather than losing
    them). ``max_depth=1`` is the flat single-round behavior.
    Driver work is one bounded loop of plan-building rounds — no
    per-URL driver state; each round is one host-partitioned fetch."""
    from crawler_ai_spark.sources.fetch import FetchConfig, fetch_pages

    targets = rules.select(
        "host",
        F.explode(
            F.coalesce(F.col("sitemap_urls"), F.array().cast("array<string>"))
        ).alias("url"),
    ).distinct()

    def _fetch_locs(tgts: DataFrame) -> DataFrame:
        frontier = tgts.select(
            "url", "host", F.lit(0).alias("priority"),
            F.lit(0).cast("long").alias("discovered_seq"),
        )
        fetched = fetch_pages(
            frontier,
            FetchConfig(
                transport=transport, per_host_delay_ms=0, host_partitions=host_partitions
            ),
        )
        body = F.coalesce(F.col("html"), F.lit(""))
        return fetched.select(
            "host",
            F.contains(body, F.lit("<sitemapindex")).alias("from_index"),
            F.explode(
                F.regexp_extract_all(body, F.lit(r"<loc>([^<]+)</loc>"), F.lit(1))
            ).alias("url"),
        )

    final = None
    seen_maps = targets.select("host", "url")
    for depth in range(max_depth):
        locs = _fetch_locs(targets)
        pages = locs.where(~F.col("from_index")).select("host", "url")
        final = pages if final is None else final.unionByName(pages)
        children = locs.where(F.col("from_index")).select("host", "url").distinct()
        last_round = depth == max_depth - 1
        if last_round:
            # depth cap: surface unexpanded child sitemaps as candidates
            final = final.unionByName(children)
            break
        targets = children.join(seen_maps, ["host", "url"], "left_anti").persist()
        if targets.limit(1).count() == 0:
            break
        seen_maps = seen_maps.unionByName(targets)
    return final.distinct().orderBy("host", "url")
