"""Server-grain (per-IP) politeness: apply_ip_budget unit semantics and
its composition into the crawl loop (CrawlConfig.ip_budget_per_batch +
run_crawl(ip_map=...)). Cross-engine semantics are pinned by the
catalog's ip_politeness_budget oracle row."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_ai_spark.operators import frontier as FR
from crawler_ai_spark.plans.crawl_loop import CrawlConfig, CrawlStore, run_crawl


def _frontier(spark, rows):
    return spark.createDataFrame(
        rows, "url string, host string, priority int, discovered_seq long, seed_url string"
    )


def test_vhosts_share_one_budget(spark):
    rows = [
        (f"https://{h}/p{i}", h, 0, i, f"https://{h}/")
        for h in ("a.test", "b.test")
        for i in range(3)
    ]
    ip_map = spark.createDataFrame(
        [("a.test", "10.0.0.1"), ("b.test", "10.0.0.1")], "host string, ip string"
    )
    scheduled, deferred = FR.apply_ip_budget(_frontier(spark, rows), ip_map, 2)
    # 6 candidate rows on one server: exactly 2 scheduled TOTAL (not 2/host)
    assert scheduled.count() == 2 and deferred.count() == 4
    assert "ip" not in scheduled.columns and "_ipg" not in scheduled.columns


def test_unmapped_host_falls_back_to_host_grain(spark):
    rows = [
        (f"https://{h}/p{i}", h, 0, i, f"https://{h}/")
        for h in ("a.test", "x.test")
        for i in range(3)
    ]
    ip_map = spark.createDataFrame([("a.test", "10.0.0.1")], "host string, ip string")
    scheduled, _ = FR.apply_ip_budget(_frontier(spark, rows), ip_map, 2)
    per_host = {r.host: r["count"] for r in scheduled.groupBy("host").count().collect()}
    # mapped host capped by its (singleton) server group; unmapped host
    # keeps its own group — both get 2, nobody shares a NULL group
    assert per_host == {"a.test": 2, "x.test": 2}


def test_disabled_is_identity(spark):
    rows = [("https://a.test/p", "a.test", 0, 0, "https://a.test/")]
    fr = _frontier(spark, rows)
    s, d = FR.apply_ip_budget(fr, None, 2)
    assert s is fr and d.count() == 0


@pytest.fixture(scope="module")
def corpus(spark, fixture_root):
    pages = spark.read.parquet(str(fixture_root / "sf0.001" / "pages.parquet"))
    seeds_urls = sorted(
        r.url for r in pages.select("url").collect() if r.url.endswith(".example/")
    )[:2]
    seeds = spark.createDataFrame(
        [(s, 10, 5) for s in seeds_urls], ["seed_url", "max_pages", "max_career_pages"]
    )
    return pages, seeds, seeds_urls


def test_loop_ip_budget_caps_shared_server(spark, corpus, tmp_path_factory):
    pages, seeds, seeds_urls = corpus
    hosts = [u.split("/")[2] for u in seeds_urls]
    ip_map = spark.createDataFrame(
        [(h, "10.9.9.9") for h in hosts], "host string, ip string"
    )
    root = tmp_path_factory.mktemp("ip_budget")
    res = run_crawl(
        spark, pages, seeds, root,
        CrawlConfig(max_batches=5, parallelism=8, ip_budget_per_batch=1),
        ip_map=ip_map,
    )
    store = CrawlStore(spark, root)
    vis = store.read_all("visited", res["last_batch"])
    per_batch = {r.batch_id: r["count"] for r in vis.groupBy("batch_id").count().collect()}
    # both seed hosts resolve to one server: at most ONE fetch per batch
    assert per_batch and all(c <= 1 for c in per_batch.values())
    # deferral, not starvation: both homepages are eventually visited
    urls = {r.url for r in vis.collect()}
    assert set(seeds_urls) <= urls
