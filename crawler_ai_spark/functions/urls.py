"""URL column functions: canonicalization (P1) and hashing.

``canonicalize_udf`` is one of the engine's four pandas UDFs (SURVEY.md
§2.10): RFC-3986 reference resolution (urljoin) has no Spark built-in, and
byte-parity with the reference's ``urljoin(base, href)`` + fragment-strip
(crawler.py:398, app/utils/text.py:26-31) matters for the URL-seen set.
Vectorized over Arrow batches; ~1M urls/sec/core in practice.

``url_hash`` is the frontier key: xxhash64 of the canonical URL — JVM-side,
used for the seen anti-join and the partitioned bloom filter."""

from __future__ import annotations

from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


def _canon_one(base: str, href: str) -> str:
    try:
        u = urljoin(base or "", href or "")
    except ValueError:
        return (href or "").strip()
    if "#" in u:
        u = u.split("#", 1)[0]
    return u.strip()


@pandas_udf(StringType())
def canonicalize_udf(base: pd.Series, href: pd.Series) -> pd.Series:
    return pd.Series([_canon_one(b, h) for b, h in zip(base, href)])


def url_hash(url: Column) -> Column:
    """xxhash64 of the canonical url string (the frontier/seen key)."""
    return F.xxhash64(url)


def host_expr(url: Column) -> Column:
    return F.coalesce(F.try_parse_url(url, F.lit("HOST")), F.lit(""))


def surt_host(host: Column) -> Column:
    """Host → SURT form: lowercase, one leading ``www.`` stripped, dot
    labels reversed and comma-joined (``www.News.Example.com`` →
    ``com,example,news``). Pure JVM string/array ops."""
    h = F.regexp_replace(F.lower(host), r"^www\.", "")
    return F.array_join(F.reverse(F.split(h, r"\.")), ",")


def surt_key(url: Column) -> Column:
    """Sort-friendly URI Reordering Transform key (the web-archive CDX
    convention Common Crawl indexes by): ``com,example)/path?query``,
    all-lowercase. Sorting/range-partitioning the frontier or seen-set by
    this key makes every URL of a registered domain — including all its
    subdomains — CONTIGUOUS on disk: per-domain scans become partition-
    range prunes instead of full-table hash probes, and per-host frontier
    work co-locates without a shuffle when the store is SURT-bucketed.
    scheme and a single leading www are dropped (they don't affect crawl
    identity); path+query are kept verbatim apart from lowercasing."""
    path = F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit(""))
    query = F.try_parse_url(url, F.lit("QUERY"))
    return F.concat(
        surt_host(host_expr(url)),
        F.lit(")"),
        F.lower(path),
        F.when(
            query.isNotNull() & (query != ""), F.concat(F.lit("?"), F.lower(query))
        ).otherwise(F.lit("")),
    )


def surt_domain_prefix(key: Column, labels: int = 2) -> Column:
    """First ``labels`` comma-separated labels of a SURT key — the
    registered-domain range prefix (``com,example``) that groups every
    subdomain of a domain into one contiguous key range."""
    host_part = F.split(key, r"\)", 2).getItem(0)
    return F.array_join(F.slice(F.split(host_part, ","), 1, labels), ",")


# tracking params that never change the resource a URL names (the usual
# analytics suspects); stripped from the dedup key
TRACKING_PARAM_RX = r"^(utm_[a-z0-9_]*|gclid|fbclid|msclkid|mc_cid|mc_eid|ref)="


def dedup_key(url: Column) -> Column:
    """Aggressive-canonical URL key for the SEEN SET (stronger than the
    byte-parity P1 canonicalize, which must match the reference): two
    URLs naming the same resource through analytics noise collapse to
    one key, so the frontier fetches it once. Normalizations — each safe
    (never merges distinct resources): lowercase scheme + authority,
    strip the scheme's default port (:80 http / :443 https; other ports
    KEPT), drop tracking query params (utm_*, gclid, fbclid, …), sort
    the surviving params (order never matters to a server), empty path →
    '/'. Pure JVM expressions + higher-order array functions — no
    Python, no shuffle; the key feeds url_hash for the bloom/anti-join."""
    scheme = F.lower(
        F.coalesce(F.try_parse_url(url, F.lit("PROTOCOL")), F.lit("https"))
    )
    auth = F.lower(
        F.coalesce(F.try_parse_url(url, F.lit("AUTHORITY")), F.lit(""))
    )
    auth = F.regexp_replace(auth, r"^[^@/]*@", "")  # userinfo never keys
    auth = (
        F.when(scheme == "http", F.regexp_replace(auth, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(auth, ":443$", ""))
        .otherwise(auth)
    )
    path = F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit(""))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    qs = F.coalesce(F.try_parse_url(url, F.lit("QUERY")), F.lit(""))
    kept = F.array_sort(
        F.filter(
            F.split(qs, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RX),
        )
    )
    qpart = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), auth, path, qpart)


# rel=canonical (RFC 6596): the page's own declaration of its preferred
# URL — the strongest dedup signal a crawler gets (print views, tracking
# params, mobile mirrors all point at one canonical). Attribute order
# varies in the wild, so two patterns cover rel-then-href and
# href-then-rel; values may be single-, double- or un-quoted.
_CANONICAL_REL_HREF_RX = (
    r"(?is)<link\b[^>]*\brel\s*=\s*[\"']?canonical[\"']?[^>]*"
    r"\bhref\s*=\s*[\"']?([^\"'\s>]+)"
)
_CANONICAL_HREF_REL_RX = (
    r"(?is)<link\b[^>]*\bhref\s*=\s*[\"']?([^\"'\s>]+)[\"']?[^>]*"
    r"\brel\s*=\s*[\"']?canonical[\"']?"
)


def canonical_link_expr(html: Column) -> Column:
    """First <link rel=canonical href=…> target in the page, either
    attribute order; NULL when absent. Pure-JVM regexp — no parse UDF
    needed for this one element."""
    a = F.regexp_extract(html, _CANONICAL_REL_HREF_RX, 1)
    b = F.regexp_extract(html, _CANONICAL_HREF_REL_RX, 1)
    out = F.when(a != "", a).when(b != "", b)
    return out


# hreflang alternates (RFC 8288 link relations + Google's hreflang
# convention): a page's declared language/region variants. A crawler
# uses the cluster to fetch ONE variant per language tier instead of
# N mirrors, and a corpus pipeline uses it for language-aware dedup.
_HREFLANG_TAG_RX = r"(?is)<link\b[^>]*\bhreflang\s*=[^>]*>"
_HREFLANG_LANG_RX = r"(?is)\bhreflang\s*=\s*[\"']?([A-Za-z0-9-]+)"
_HREFLANG_HREF_RX = r"(?is)\bhref\s*=\s*[\"']?([^\"'\s>]+)"


def hreflang_pairs(html: Column) -> Column:
    """array<struct<lang,href>> of every <link hreflang=… href=…>
    declaration, document order, any attribute order; tags missing
    either attribute drop. Pure-JVM regexps over the tag list."""
    tags = F.regexp_extract_all(
        F.coalesce(html, F.lit("")), F.lit(_HREFLANG_TAG_RX), F.lit(0)
    )
    pairs = F.transform(
        tags,
        lambda t: F.struct(
            F.lower(F.regexp_extract(t, _HREFLANG_LANG_RX, 1)).alias("lang"),
            F.regexp_extract(t, _HREFLANG_HREF_RX, 1).alias("href"),
        ),
    )
    return F.filter(pairs, lambda p: (p["lang"] != "") & (p["href"] != ""))


# ---------------------------------------------------------------------------
# IDN (internationalized domain name) host normalization. The web's DNS
# layer only speaks ASCII: a crawler that keys its frontier/seen-set on
# raw unicode hosts fetches münchen.example and xn--mnchen-3ya.example
# as two different sites. Punycode (RFC 3492 bootstring via the stdlib
# IDNA codec) is inherently procedural, so this is a deliberate
# pandas-UDF slow path — but GATED: the UDF only ever receives the rare
# non-ASCII hosts (null for the rest), so the hot path stays a JVM
# lowercase. Composes in front of surt_key / dedup_key when a corpus
# carries raw IRIs.
# ---------------------------------------------------------------------------

_NON_ASCII_RX = "[^\\x00-\\x7F]"


def _idn_one(host):
    if host is None:
        return None
    h = host.strip().rstrip(".").lower()
    if not h:
        return h
    try:
        return h.encode("idna").decode("ascii")
    except UnicodeError:
        return h  # malformed/overlong label: keep the lowercased form


@pandas_udf(StringType())
def _idn_udf(host: pd.Series) -> pd.Series:
    return host.map(_idn_one)


def idn_host_expr(host: Column) -> Column:
    """Host → ASCII (punycode) form: trim, strip trailing dots,
    lowercase; non-ASCII labels IDNA-encoded. ASCII hosts (≈all of the
    web) never touch Python — the UDF input is nulled for them, so the
    Arrow transfer carries no work."""
    ascii_fast = F.lower(F.regexp_replace(F.trim(host), r"\.+$", ""))
    slow = _idn_udf(F.when(host.rlike(_NON_ASCII_RX), host))
    return F.coalesce(slow, ascii_fast)


# ---------------------------------------------------------------------------
# Registered (registrable) domain via the Public Suffix List algorithm.
# Host-grain crawl budgets, mirror detection and quality rollups all
# want "example.co.uk", not "co.uk" (naive last-2-labels) — at web
# scale grouping by the wrong grain merges every .co.uk site into one
# politeness bucket. Rules below are a representative embedded subset
# of the PSL (publicsuffix.org, MPL-licensed data): exact rules,
# wildcard rules (*.ck), and exception rules (!www.ck), evaluated
# longest-match-first per the published algorithm; unlisted TLDs fall
# to the default '*' rule. The full 9k-rule list drops in by extending
# these sets — membership compiles to an InSet hash probe, so the whole
# thing stays inside whole-stage codegen: no UDF, no join, no shuffle.
# ---------------------------------------------------------------------------

_PSL_EXACT = [
    # ICANN 2nd-level country suffixes (subset)
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "co.in", "net.in", "org.in", "gen.in",
    "co.kr", "or.kr", "go.kr",
    "com.mx", "org.mx", "gob.mx",
    "com.tr", "org.tr", "gov.tr",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn",
    "co.nz", "org.nz", "govt.nz",
    "com.sg", "edu.sg", "gov.sg",
    "com.hk", "org.hk", "gov.hk",
    "co.za", "org.za", "gov.za",
    "com.ar", "org.ar", "gob.ar",
    "co.th", "or.th", "go.th",
    "com.tw", "org.tw", "gov.tw",
    # private-section suffixes (subset): platform subdomains are
    # independent registrants — exactly the grain a crawler budgets on
    "github.io", "gitlab.io", "blogspot.com", "wordpress.com",
    "herokuapp.com", "netlify.app", "vercel.app", "web.app",
    "firebaseapp.com", "pages.dev", "workers.dev", "tumblr.com",
    "s3.amazonaws.com", "cloudfront.net", "azurewebsites.net",
]
_PSL_WILDCARD_PARENTS = ["ck", "er", "np", "compute.amazonaws.com"]
_PSL_EXCEPTIONS = ["www.ck"]

_PSL_MAX = 2 + max(
    max(s.count(".") + 1 for s in _PSL_EXACT),
    max(s.count(".") + 1 for s in _PSL_WILDCARD_PARENTS),
)


def registered_domain_expr(host: Column) -> Column:
    """Host → registrable domain (public suffix + one label), PSL
    longest-match semantics; NULL when the host itself is a public
    suffix (nothing is registered). Compose after idn_host_expr for
    raw-IRI corpora."""
    h = F.lower(F.regexp_replace(F.trim(F.coalesce(host, F.lit(""))), r"\.+$", ""))
    labels = F.split(h, r"\.")
    n = F.size(labels)

    def suffix(k: int) -> Column:
        return F.array_join(F.slice(labels, n - k + 1, F.lit(k)), ".")

    def is_ps(k: int) -> Column:
        if k == 1:
            return n >= 1  # default '*' rule: every TLD is a public suffix
        exact = suffix(k).isin(_PSL_EXACT)
        wild = suffix(k - 1).isin(_PSL_WILDCARD_PARENTS) & ~suffix(k).isin(
            _PSL_EXCEPTIONS
        )
        return (n >= k) & (exact | wild)

    # longest matching public suffix wins; suffix(p+1) is NULL-by-slice
    # when the host has no label left of the suffix
    out = F.when(n >= 2, suffix(2)).otherwise(F.lit(None).cast("string"))
    for p in range(2, _PSL_MAX + 1):
        out = F.when(
            is_ps(p),
            F.when(n >= p + 1, suffix(p + 1)),
        ).otherwise(out)
    return F.when(h == "", F.lit(None).cast("string")).otherwise(out)


def clean_param_strip_expr(url: Column, rules: Column) -> Column:
    """Yandex ``Clean-param`` application: ``rules`` is the host's
    ARRAY<STRUCT<params_csv, prefix>> from sources/robots.parse_robots
    (with_clean_param=True); each rule strips its '&'-separated query
    parameter names from URLs whose PATH starts with the rule's prefix.
    The rules fold left-to-right over the URL (declaration order); a URL
    whose query empties loses its '?'. Pure JVM string/array ops — the
    publisher-declared complement to the learned DUST rewrite rules."""

    def apply_rule(acc: Column, r: Column) -> Column:
        base = F.split_part(acc, F.lit("?"), F.lit(1))
        qs = F.substring(acc, F.length(base) + 2, F.lit(1 << 20))
        path = F.regexp_extract(base, r"^[a-z][a-z0-9+.-]*://[^/]*(/.*)?$", 1)
        path = F.when(path == "", F.lit("/")).otherwise(path)
        names = F.split(r["params_csv"], "&")
        kept = F.filter(
            F.split(qs, "&"),
            lambda kv: ~F.array_contains(
                names, F.split_part(kv, F.lit("="), F.lit(1))
            ),
        )
        rebuilt = F.when(F.size(kept) > 0, F.concat(base, F.lit("?"), F.array_join(kept, "&"))).otherwise(base)
        applies = path.startswith(r["prefix"]) & (F.length(qs) > 0)
        return F.when(applies, rebuilt).otherwise(acc)

    return F.aggregate(
        F.coalesce(rules, F.array().cast(
            "array<struct<params_csv:string,prefix:string>>"
        )),
        url,
        apply_rule,
    )
