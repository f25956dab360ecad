"""Mirror-host detection (operators/mirrors.py) and SURT keys
(functions/urls.py) — unit semantics; the cross-engine checks are the
catalog's mirror_host_pairs / mirror_canonical_hosts / surt_keys /
surt_locality oracle rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_ai_spark.functions import urls as U
from crawler_ai_spark.operators import mirrors as MI


def _pages(spark, rows):
    return spark.createDataFrame(rows, "host string, fingerprint long")


def test_identical_sets_form_clique_and_canonical(spark):
    rows = [(h, fp) for h in ("a.test", "b.test", "c.test") for fp in (1, 2, 3)]
    rows += [("lone.test", 99)]
    pairs = MI.mirror_pairs(_pages(spark, rows)).collect()
    got = {(r.host_a, r.host_b): r.jaccard for r in pairs}
    assert set(got) == {
        ("a.test", "b.test"), ("a.test", "c.test"), ("b.test", "c.test")
    }
    assert all(j == 1.0 for j in got.values())
    canon = {
        r.host: r.canonical_host
        for r in MI.mirror_canonical(
            MI.mirror_pairs(_pages(spark, rows))
        ).collect()
    }
    assert canon == {h: "a.test" for h in ("a.test", "b.test", "c.test")}


def test_threshold_and_near_identical(spark):
    # x/y share 9 of 10 (j = 9/11 < 0.9 at union 11? no: sizes 10,10,
    # shared 9 → 9/11 = 0.818); x/z share 10 of 10 minus one extra on z
    # (shared 10, sizes 10/11 → 10/11 = 0.909 >= 0.9)
    rows = [("x.test", i) for i in range(10)]
    rows += [("y.test", i) for i in range(1, 11)]
    rows += [("z.test", i) for i in range(10)] + [("z.test", 100)]
    got = {
        (r.host_a, r.host_b)
        for r in MI.mirror_pairs(_pages(spark, rows)).collect()
    }
    assert ("x.test", "z.test") in got
    assert ("x.test", "y.test") not in got


def test_stopword_gate_blocks_boilerplate_cliques(spark):
    # 20 hosts share ONLY fp 7 (a cookie-banner page): with the default
    # cap 16 the fp is non-discriminative — zero pairs, not C(20,2)
    rows = [(f"h{i:02d}.test", 7) for i in range(20)]
    assert MI.mirror_pairs(_pages(spark, rows)).count() == 0
    # at a permissive cap the clique appears — the gate is the only gate
    assert (
        MI.mirror_pairs(_pages(spark, rows), max_hosts_per_fp=25).count()
        == 190
    )


def test_duplicate_page_rows_do_not_inflate_overlap(spark):
    # same fingerprint crawled 5× on one host counts once (distinct gate)
    rows = [("a.test", 1)] * 5 + [("a.test", 2), ("b.test", 1), ("b.test", 2)]
    pairs = MI.mirror_pairs(_pages(spark, rows)).collect()
    assert len(pairs) == 1 and pairs[0].shared == 2 and pairs[0].jaccard == 1.0


SURT_CASES = [
    ("https://www.Example.COM/Path/X?Q=1", "com,example)/path/x?q=1"),
    ("https://news.site.example.com/a", "com,example,site,news)/a"),
    ("https://wwwsite.example.com/", "com,example,wwwsite)/"),  # no www-strip
    ("http://example.com/", "com,example)/"),  # scheme-independent
    ("https://www.www.example.com/p", "com,example,www)/p"),  # one strip only
]


def test_surt_key_cases(spark):
    df = spark.createDataFrame([(u,) for u, _ in SURT_CASES], "url string")
    got = {
        r.url: r.surt
        for r in df.select("url", U.surt_key(F.col("url")).alias("surt")).collect()
    }
    for url, want in SURT_CASES:
        assert got[url] == want, url


def test_surt_domain_prefix_groups_subdomains(spark):
    urls = [
        "https://www.example.com/a",
        "https://jobs.example.com/b",
        "https://static.img.example.com/c",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    prefixes = {
        r[0]
        for r in df.select(
            U.surt_domain_prefix(U.surt_key(F.col("url")), 2)
        ).collect()
    }
    assert prefixes == {"com,example"}


def _product_urls():
    """Deterministic sweep over url shape combinations."""
    urls = []
    for scheme in ("http", "https"):
        for host in ("Ex.COM", "www.ex.com", "a.b.ex.com", "ex.com:8080"):
            for path in ("", "/", "/A/b-1"):
                for q in ("", "a=1", "b=2&a=1", "utm_source=x&a=1", "utm_only=1"):
                    u = f"{scheme}://{host}{path}"
                    if q:
                        u += "?" + q
                    urls.append(u)
    return urls


def test_dedup_key_idempotent_over_shape_sweep(spark):
    # the canonical key is itself a URL: canonicalizing it again must be
    # a fixed point (else two passes over a pipeline disagree)
    df = spark.createDataFrame([(u,) for u in _product_urls()], "url string")
    out = df.select(
        U.dedup_key(F.col("url")).alias("k1"),
        U.dedup_key(U.dedup_key(F.col("url"))).alias("k2"),
    ).collect()
    for r in out:
        assert r.k1 == r.k2, r.k1


def test_dedup_key_invariant_to_param_order_and_tracking(spark):
    base = "https://ex.com/p"
    variants = [
        f"{base}?a=1&b=2",
        f"{base}?b=2&a=1",
        f"{base}?utm_source=x&a=1&b=2",
        f"{base}?a=1&utm_campaign=z&b=2&gclid=abc",
        f"{base}?b=2&fbclid=f&a=1",
    ]
    df = spark.createDataFrame([(u,) for u in variants], "url string")
    keys = {r[0] for r in df.select(U.dedup_key(F.col("url"))).collect()}
    assert keys == {"https://ex.com/p?a=1&b=2"}


def test_dedup_key_never_merges_distinct_resources(spark):
    # distinct paths/params/ports/schemes must stay distinct
    distinct = [
        "https://ex.com/p?a=1",
        "https://ex.com/p?a=2",
        "https://ex.com/q?a=1",
        "https://ex.com:8080/p?a=1",
        "http://ex.com/p?a=1",
        "https://other.com/p?a=1",
        "https://ex.com/P?a=1",  # path case is significant
    ]
    df = spark.createDataFrame([(u,) for u in distinct], "url string")
    keys = [r[0] for r in df.select(U.dedup_key(F.col("url"))).collect()]
    assert len(set(keys)) == len(distinct)


def test_surt_key_stable_across_www_and_case(spark):
    aliases = ["https://WWW.Ex.Com/p", "https://ex.com/p", "http://www.ex.com/p"]
    df = spark.createDataFrame([(u,) for u in aliases], "url string")
    keys = {r[0] for r in df.select(U.surt_key(F.col("url"))).collect()}
    assert keys == {"com,ex)/p"}
