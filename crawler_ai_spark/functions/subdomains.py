"""Subdomain search — the reference's third career-page detection strategy
(`_smart_subdomain_search` + `_discover_subdomains_dynamically` +
`_collect_hosts_from_html` + `_get_minimal_fallback_patterns`,
career_pages_service.py:56-130, :932-1111): harvest candidate hosts from
the base page's HTML (URL attributes + URL-shaped strings in text), keep
subdomains of the root domain, validate aliveness, and ALWAYS add the
essential career-subdomain fallbacks (career/careers/jobs/tuyen-dung/
viec-lam).

Spark-first shape: harvesting is per-row JVM regexp work (no parse UDF
needed — the reference's attr walk over a/link/script/img/form/source/
iframe reduces to one href|src|action attribute regex plus its four
URL-in-text regexes); aliveness is a key join against a probe table (in
production the crawl's own pages/seen table — the fetch cache IS the
prober); fallbacks are generated, not fetched. At 10^10 scale the only
shuffle is the host join, and the candidate side is pre-shrunk by the
subdomain-of filter before it."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# career_pages_service.py:1098 — essential tags, always tried
CAREER_SUBDOMAIN_TAGS = ("career", "careers", "jobs", "tuyen-dung", "viec-lam")

# career_pages_service.py:118-124 — URL-shaped strings in text/JSON
TEXT_URL_PATTERNS = (
    r"https?://([A-Za-z0-9\-\._~%]+)(?:[:/][^\s'\"]*)?",
    r'"url":\s*"https?://([A-Za-z0-9\-\._~%]+)',
    r'"href":\s*"https?://([A-Za-z0-9\-\._~%]+)',
    r"https?://([A-Za-z0-9\-\._~%]+)\.com\.vn",
)

ATTR_URL_RX = r"""(?i)(?:href|src|action)\s*=\s*["']([^"']+)["']"""


def netloc_expr(url: Column) -> Column:
    """Scheme-ful URL → lowered netloc (synthetic inputs always carry a
    scheme; the reference's schemeless fallback path is out of scope)."""
    return F.lower(F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]+)", 1))


def root_domain_expr(url: Column) -> Column:
    """_safe_domain's root (:56-71): strip www., then keep the last 2
    labels — or 3 when the TLD label is <=2 chars (site.com.vn style)."""
    netloc = F.regexp_replace(netloc_expr(url), r"^www\.", "")
    parts = F.split(netloc, r"\.")
    last = F.try_element_at(parts, F.lit(-1))
    return F.when(
        F.size(parts) >= 3,
        F.when(
            F.length(last) <= 2, F.array_join(F.slice(parts, -3, 3), ".")
        ).otherwise(F.array_join(F.slice(parts, -2, 2), ".")),
    ).otherwise(netloc)


def _host_of(u: Column, base_netloc: Column) -> Column:
    """urljoin(base, u) → netloc, as expressions (:79-98): absolute http(s)
    URLs keep their own host, protocol-relative take the host after //,
    other schemes (mailto:, javascript:) resolve to no netloc, everything
    else is relative and resolves to the base host."""
    own = F.lower(F.regexp_extract(u, r"(?i)^https?://([^/?#]+)", 1))
    proto_rel = F.lower(F.regexp_extract(u, r"^//([^/?#]+)", 1))
    return (
        F.when(u.rlike(r"(?i)^https?://"), own)
        .when(u.startswith("//"), proto_rel)
        .when(u.rlike(r"^[a-zA-Z][a-zA-Z0-9+.\-]*:"), F.lit(None).cast("string"))
        .otherwise(base_netloc)
    )


def harvested_hosts_expr(html: Column, base_netloc: Column) -> Column:
    """_collect_hosts_from_html (:86-130) as one JVM expression: hosts from
    href/src/action attributes (resolved against the base) plus the four
    URL-in-text regexes, lowered, distinct, empties dropped."""
    attr_urls = F.regexp_extract_all(html, F.lit(ATTR_URL_RX), F.lit(1))
    attr_hosts = F.transform(attr_urls, lambda u: _host_of(u, base_netloc))
    arrays = [attr_hosts]
    for p in TEXT_URL_PATTERNS:
        arrays.append(
            F.transform(
                F.regexp_extract_all(html, F.lit("(?i)" + p), F.lit(1)),
                lambda h: F.lower(h),
            )
        )
    merged = F.array_distinct(F.concat(*arrays))
    return F.filter(merged, lambda h: h.isNotNull() & (h != ""))


def is_subdomain_of_expr(host: Column, root: Column) -> Column:
    """_is_subdomain_of (:73-77): endswith('.'+root) and != root."""
    return host.endswith(F.concat(F.lit("."), root)) & (host != root)


def subdomain_search(
    pages: DataFrame,
    probe: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """_smart_subdomain_search (:932-966) per base page: harvested
    subdomain candidates that pass the aliveness probe (join on host —
    the Spark analogue of _validate_host_alive's fetch), unioned with the
    always-tried career fallbacks, as distinct https:// URLs. A URL found
    both ways reports source='discovered' (min of the two labels)."""
    base = pages.select(
        F.col(id_col),
        F.col(url_col).alias("_url"),
        F.col(html_col).alias("_html"),
        netloc_expr(F.col(url_col)).alias("_netloc"),
        root_domain_expr(F.col(url_col)).alias("_root"),
    )
    harvested = base.select(
        id_col,
        "_root",
        F.explode(harvested_hosts_expr(F.col("_html"), F.col("_netloc"))).alias("host"),
    ).where(is_subdomain_of_expr(F.col("host"), F.col("_root")))
    alive = harvested.join(probe.select("host").distinct(), "host", "left_semi")
    discovered = alive.select(
        id_col,
        F.concat(F.lit("https://"), F.col("host")).alias("candidate_url"),
        F.lit("discovered").alias("source"),
    )
    tags = F.array(*[F.lit(t) for t in CAREER_SUBDOMAIN_TAGS])
    fallback = base.select(
        id_col,
        F.explode(
            F.transform(tags, lambda t: F.concat(F.lit("https://"), t, F.lit("."), F.col("_root")))
        ).alias("candidate_url"),
        F.lit("fallback").alias("source"),
    )
    return (
        discovered.unionByName(fallback)
        .groupBy(id_col, "candidate_url")
        .agg(F.min("source").alias("source"))
    )
