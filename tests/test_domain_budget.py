"""Registrable-domain-grain politeness (apply_domain_budget +
CrawlConfig.domain_budget_per_batch): the subdomain-spam cap. Host-grain
budgets give every aN.spam.com its own full allowance; the PSL grain
caps the registrant as a whole. Cross-engine semantics are pinned by the
catalog's domain_budget_schedule oracle row."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_ai_spark.operators import frontier as FR
from crawler_ai_spark.plans.crawl_loop import CrawlConfig, CrawlStore, run_crawl


def _frontier(spark, rows):
    return spark.createDataFrame(
        rows,
        "url string, host string, priority int, discovered_seq long, seed_url string",
    )


def test_subdomains_share_one_budget(spark):
    # 5 subdomains x 3 rows of one registrable domain: host-grain would
    # schedule all 15 under budget 3; domain-grain schedules exactly 3
    rows = [
        (f"https://s{k}.spam.example/p{i}", f"s{k}.spam.example", 0, k * 3 + i,
         "https://spam.example/")
        for k in range(5)
        for i in range(3)
    ]
    scheduled, deferred = FR.apply_domain_budget(_frontier(spark, rows), 3)
    assert scheduled.count() == 3 and deferred.count() == 12
    assert "_dom" not in scheduled.columns and "_dom" not in deferred.columns


def test_distinct_registrants_keep_own_budgets(spark):
    # same left label, different registrable domains (incl. a PSL
    # 2-level suffix and a private suffix): no sharing across them
    hosts = ["www.alpha.example", "www.beta.co.uk", "www.gamma.github.io"]
    rows = [
        (f"https://{h}/p{i}", h, 0, i, f"https://{h}/")
        for h in hosts
        for i in range(4)
    ]
    scheduled, _ = FR.apply_domain_budget(_frontier(spark, rows), 2)
    per_host = {r.host: r["count"] for r in scheduled.groupBy("host").count().collect()}
    assert per_host == {h: 2 for h in hosts}


def test_null_domain_falls_back_to_host_grain(spark):
    # a bare public suffix has no registrable domain (NULL) — it must
    # keep its own host as the group, not share one NULL bucket
    rows = [
        (f"https://{h}/p{i}", h, 0, i, f"https://{h}/")
        for h in ("co.uk", "github.io")
        for i in range(3)
    ]
    scheduled, _ = FR.apply_domain_budget(_frontier(spark, rows), 2)
    per_host = {r.host: r["count"] for r in scheduled.groupBy("host").count().collect()}
    assert per_host == {"co.uk": 2, "github.io": 2}


def test_priority_order_decides_within_domain(spark):
    rows = [
        (f"https://s{k}.d.example/p", f"s{k}.d.example", prio, k,
         "https://d.example/")
        for k, prio in enumerate([1, 5, 3, 5, 2])
    ]
    scheduled, _ = FR.apply_domain_budget(_frontier(spark, rows), 2)
    got = sorted(r.host for r in scheduled.collect())
    # the two priority-5 rows win; equal priorities break by discovered_seq
    assert got == ["s1.d.example", "s3.d.example"]


def test_disabled_is_identity(spark):
    fr = _frontier(spark, [("https://a.test/p", "a.test", 0, 0, "https://a.test/")])
    s, d = FR.apply_domain_budget(fr, None)
    assert s is fr and d.count() == 0


@pytest.fixture(scope="module")
def subdomain_corpus(spark, fixture_root):
    """The fixture corpus re-hosted as subdomains of ONE registrable
    domain: siteN.example -> siteN.shared.example. Links are relative in
    the fixture html, so rewriting the url column re-bases the whole
    site; html/text bytes are untouched."""
    pages = spark.read.parquet(str(fixture_root / "sf0.001" / "pages.parquet"))
    pages = pages.withColumn(
        "url", F.regexp_replace("url", r"\.example/", ".shared.example/")
    )
    seeds_urls = sorted(
        r.url for r in pages.select("url").collect()
        if r.url.endswith(".shared.example/")
    )[:2]
    seeds = spark.createDataFrame(
        [(s, 10, 5) for s in seeds_urls], ["seed_url", "max_pages", "max_career_pages"]
    )
    return pages, seeds, seeds_urls


def test_loop_domain_budget_caps_registrant(spark, subdomain_corpus, tmp_path_factory):
    pages, seeds, seeds_urls = subdomain_corpus
    root = tmp_path_factory.mktemp("domain_budget")
    res = run_crawl(
        spark, pages, seeds, root,
        CrawlConfig(max_batches=6, parallelism=8, domain_budget_per_batch=1),
    )
    store = CrawlStore(spark, root)
    vis = store.read_all("visited", res["last_batch"])
    per_batch = {
        r.batch_id: r["count"] for r in vis.groupBy("batch_id").count().collect()
    }
    # both seed hosts are subdomains of shared.example: ONE fetch per
    # batch across the registrant, not one per host
    assert per_batch and all(c <= 1 for c in per_batch.values())
    # deferral, not starvation: both homepages are eventually visited
    urls = {r.url for r in vis.collect()}
    assert set(seeds_urls) <= urls


def test_loop_domain_budget_off_is_byte_identical(spark, subdomain_corpus, tmp_path_factory):
    """Default config never enters the domain-budget branch: the loop's
    visited set matches a pre-feature run shape (host-grain only)."""
    pages, seeds, _ = subdomain_corpus
    r1 = tmp_path_factory.mktemp("dom_off_a")
    r2 = tmp_path_factory.mktemp("dom_off_b")
    res_a = run_crawl(spark, pages, seeds, r1, CrawlConfig(max_batches=4, parallelism=8))
    res_b = run_crawl(
        spark, pages, seeds, r2,
        CrawlConfig(max_batches=4, parallelism=8, domain_budget_per_batch=None),
    )
    vis_a = CrawlStore(spark, r1).read_all("visited", res_a["last_batch"])
    vis_b = CrawlStore(spark, r2).read_all("visited", res_b["last_batch"])
    key = ["batch_id", "seed_url", "url", "page_order"]
    assert sorted(map(tuple, vis_a.select(*key).collect())) == sorted(
        map(tuple, vis_b.select(*key).collect())
    )
