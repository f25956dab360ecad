"""S5+ adaptive recrawl — change-frequency-aware refresh intervals:
unchanged content doubles a URL's TTL (capped), changed content resets
it, fixed mode is byte-identical, gaps between refreshes idle the loop
instead of ending it, and the doubling state survives resume."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_ai_spark.plans.crawl_loop import (
    CrawlConfig,
    CrawlStore,
    _ledger_delta,
    _merge_ledger,
    run_crawl,
)

_LCOLS = (
    "seed_url string, url string, last_fetch_batch long, last_visit_batch long,"
    " priority int, depth int, discovered_seq long, content_hash long,"
    " ttl_batches int"
)


def _ledger(spark, rows):
    return spark.createDataFrame(rows, _LCOLS)


def _row(fetch, visit, h, ttl):
    return ("s", "u", fetch, visit, 100, 0, 1, h, ttl)


def test_merge_ttl_transitions(spark):
    prev = _ledger(spark, [_row(1, 1, 111, 4)])
    # unchanged content → doubles (capped)
    out = _merge_ledger(
        prev, _ledger(spark, [_row(5, 5, 111, 1)]),
        adaptive=True, base_ttl=1, max_ttl=8,
    ).collect()[0]
    assert out.ttl_batches == 8 and out.content_hash == 111
    out = _merge_ledger(
        prev, _ledger(spark, [_row(5, 5, 111, 1)]),
        adaptive=True, base_ttl=1, max_ttl=6,
    ).collect()[0]
    assert out.ttl_batches == 6  # least() cap, not power-of-two-only
    # changed content → resets to base
    out = _merge_ledger(
        prev, _ledger(spark, [_row(5, 5, 222, 1)]),
        adaptive=True, base_ttl=1, max_ttl=8,
    ).collect()[0]
    assert out.ttl_batches == 1 and out.content_hash == 222
    # refresh missed (visit advanced, no fetch) → everything carried
    out = _merge_ledger(
        prev, _ledger(spark, [_row(None, 6, None, None)]),
        adaptive=True, base_ttl=1, max_ttl=8,
    ).collect()[0]
    assert out.ttl_batches == 4 and out.content_hash == 111
    assert out.last_fetch_batch == 1 and out.last_visit_batch == 6
    # fixed mode: same delta, ttl pinned at base
    out = _merge_ledger(
        prev, _ledger(spark, [_row(5, 5, 111, 1)]),
        adaptive=False, base_ttl=1,
    ).collect()[0]
    assert out.ttl_batches == 1
    # pre-upgrade snapshot (no adaptive columns) backfills cleanly
    old = spark.createDataFrame(
        [("s", "u", 1, 1, 100, 0, 1)],
        "seed_url string, url string, last_fetch_batch long, last_visit_batch long,"
        " priority int, depth int, discovered_seq long",
    )
    out = _merge_ledger(
        old, _ledger(spark, [_row(5, 5, 111, 1)]),
        adaptive=True, base_ttl=1, max_ttl=8,
    ).collect()[0]
    assert out.ttl_batches == 1  # no prior hash → treated as first fetch


def _ttl_cfg(adaptive, batches, max_ttl=8):
    return CrawlConfig(
        max_batches=batches, parallelism=8,
        recrawl_ttl_seconds=3600, batch_interval_seconds=3600,  # base ttl 1
        adaptive_recrawl=adaptive, recrawl_ttl_max_batches=max_ttl,
        max_pages=3, max_career_pages=3,  # tiny site: discovery ends fast
    )


@pytest.fixture(scope="module")
def small_site(spark, fixture_root):
    pages = spark.read.parquet(str(fixture_root / "sf0.001" / "pages.parquet")).where(
        ~F.col("url").endswith(".xml")
    )
    seed = sorted(
        r.url for r in pages.select("url").collect() if r.url.endswith(".example/")
    )[0]
    seeds = spark.createDataFrame([(seed, 3, 3)], ["seed_url", "max_pages", "max_career_pages"])
    return pages, seeds, seed


def _refresh_batches(spark, root, last_batch, url):
    vis = CrawlStore(spark, root).read_all("visited", last_batch)
    return sorted(
        r.batch_id
        for r in vis.where(
            (F.col("url") == url) & F.col("is_recrawl") & F.col("fetched")
        ).collect()
    )


def test_static_content_doubles_interval_in_loop(spark, small_site, tmp_path_factory):
    pages, seeds, seed = small_site
    root = tmp_path_factory.mktemp("adaptive_on")
    res = run_crawl(spark, pages, seeds, root, _ttl_cfg(adaptive=True, batches=16))
    # seed fetched at batch 1; the fixture corpus is static so every
    # refresh sees identical bytes: due at 2 (ttl 1→2), 4 (→4), 8 (→8), 16
    assert _refresh_batches(spark, root, res["last_batch"], seed) == [2, 4, 8, 16]
    # fixed mode refreshes every batch — the load adaptive mode sheds
    root_f = tmp_path_factory.mktemp("adaptive_off")
    res_f = run_crawl(spark, pages, seeds, root_f, _ttl_cfg(adaptive=False, batches=8))
    assert _refresh_batches(spark, root_f, res_f["last_batch"], seed) == list(range(2, 9))


def test_adaptive_state_survives_resume(spark, small_site, tmp_path_factory):
    pages, seeds, seed = small_site
    root = tmp_path_factory.mktemp("adaptive_resume")
    run_crawl(spark, pages, seeds, root, _ttl_cfg(adaptive=True, batches=5))
    res = run_crawl(
        spark, pages, seeds, root, _ttl_cfg(adaptive=True, batches=11), resume=True
    )
    assert _refresh_batches(spark, root, res["last_batch"], seed) == [2, 4, 8, 16]
