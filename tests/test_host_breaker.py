"""W4 at host granularity — the per-host failure circuit breaker:
consecutive all-failure batches trip a cooldown, cooling rows defer
(never drop), probes resume after the cooldown, healthy hosts are
untouched, and the state survives resume."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_ai_spark.plans.crawl_loop import (
    CrawlConfig,
    CrawlStore,
    _advance_breaker,
    run_crawl,
)


def test_advance_breaker_state_machine(spark):
    def gated(rows):
        return spark.createDataFrame(rows, "host string, fetched boolean")

    empty = spark.createDataFrame([], "host string, consec_fail_batches int, cooldown_until long")
    # batch 1: a fails, b mixed, c all-success
    s1 = _advance_breaker(
        empty,
        gated([("a", False), ("a", False), ("b", False), ("b", True), ("c", True)]),
        1, threshold=2, cooldown=3,
    )
    rows = {r.host: r for r in s1.collect()}
    assert set(rows) == {"a"}  # b/c reset to idle and are pruned
    assert rows["a"].consec_fail_batches == 1 and rows["a"].cooldown_until == -1
    # batch 2: a fails again -> trips (streak reset, cooldown 2+3)
    s2 = _advance_breaker(s1, gated([("a", False)]), 2, threshold=2, cooldown=3)
    rows = {r.host: r for r in s2.collect()}
    assert rows["a"].consec_fail_batches == 0 and rows["a"].cooldown_until == 5
    # batches 3-5: not attempted (cooling) -> state carried, pruned after 5
    s3 = _advance_breaker(s2, gated([]), 3, threshold=2, cooldown=3)
    assert s3.collect()[0].cooldown_until == 5
    s5 = _advance_breaker(s3, gated([]), 5, threshold=2, cooldown=3)
    assert s5.count() == 0  # idle again -> pruned; next batch probes
    # a success during a streak resets it
    s = _advance_breaker(empty, gated([("d", False)]), 1, threshold=3, cooldown=2)
    s = _advance_breaker(s, gated([("d", True), ("d", False)]), 2, threshold=3, cooldown=2)
    assert s.count() == 0


@pytest.fixture(scope="module")
def corpus(spark, fixture_root):
    pages = spark.read.parquet(str(fixture_root / "sf0.001" / "pages.parquet")).where(
        ~F.col("url").endswith(".xml")
    )
    seeds_urls = sorted(
        r.url for r in pages.select("url").collect() if r.url.endswith(".example/")
    )[:2]
    dead = seeds_urls[0].split("//")[1].rstrip("/")
    # every fetch of the dead host misses (its pages leave the table)
    pages_broken = pages.where(~F.col("url").startswith(f"https://{dead}/"))
    seeds = spark.createDataFrame(
        [(s, 30, 10) for s in seeds_urls], ["seed_url", "max_pages", "max_career_pages"]
    )
    return pages_broken, seeds, dead


def _attempt_batches(spark, root, last_batch, dead):
    vis = CrawlStore(spark, root).read_all("visited", last_batch)
    return sorted(
        r.batch_id
        for r in vis.where(F.col("url").startswith(f"https://{dead}/")).collect()
    )


def test_breaker_cools_dead_host_in_loop(spark, corpus, tmp_path_factory):
    pages_broken, seeds, dead = corpus
    cfg = CrawlConfig(
        max_batches=8, parallelism=8, max_fetch_attempts=3,
        host_failure_threshold=2, host_cooldown_batches=2,
    )
    root = tmp_path_factory.mktemp("breaker_loop")
    res = run_crawl(spark, pages_broken, seeds, root, cfg)
    # attempts: batch 1 (fail, streak 1), 2 (fail, trip), cool 3-4,
    # probe 5 (fail, last attempt) — defer-not-drop: all 3 attempts land
    assert _attempt_batches(spark, root, res["last_batch"], dead) == [1, 2, 5]
    # the healthy seed is untouched by the dead host's breaker
    vis = CrawlStore(spark, root).read_all("visited", res["last_batch"])
    healthy = vis.where(~F.col("url").startswith(f"https://{dead}/"))
    assert healthy.where("fetched").count() > 0
    no_breaker = tmp_path_factory.mktemp("breaker_off")
    cfg_off = CrawlConfig(max_batches=8, parallelism=8, max_fetch_attempts=3)
    run_crawl(spark, pages_broken, seeds, no_breaker, cfg_off)
    vis_off = CrawlStore(spark, no_breaker).read_all("visited", res["last_batch"])
    healthy_off = vis_off.where(~F.col("url").startswith(f"https://{dead}/"))
    assert (
        sorted(r.url for r in healthy.where("fetched").collect())
        == sorted(r.url for r in healthy_off.where("fetched").collect())
    )
    # without the breaker the dead host burns consecutive batches instead
    assert _attempt_batches(spark, no_breaker, res["last_batch"], dead) == [1, 2, 3]


def test_breaker_state_survives_resume(spark, corpus, tmp_path_factory):
    pages_broken, seeds, dead = corpus
    cfg = CrawlConfig(
        max_batches=2, parallelism=8, max_fetch_attempts=3,
        host_failure_threshold=2, host_cooldown_batches=2,
    )
    root = tmp_path_factory.mktemp("breaker_resume")
    run_crawl(spark, pages_broken, seeds, root, cfg)  # stops tripped at batch 2
    cfg2 = CrawlConfig(
        max_batches=6, parallelism=8, max_fetch_attempts=3,
        host_failure_threshold=2, host_cooldown_batches=2,
    )
    res = run_crawl(spark, pages_broken, seeds, root, cfg2, resume=True)
    # identical attempt pattern to the uninterrupted 8-batch run
    assert _attempt_batches(spark, root, res["last_batch"], dead) == [1, 2, 5]
