"""S1 fetch-error taxonomy + W4 per-class retry.

The fixture corpus gives every site one error page
(/our-offices, linked from the services page) whose
status/message cycles through the reference's ladder
(fixtures._ERROR_CYCLE). With retries enabled, permanent classes
(404/410 → not_found) must appear in visited exactly once while transient
classes (503/429/403/timeout) re-enter the next batch with attempt+1 —
the per-class divergence crawler.py:197-233 implements."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from crawler_ai_spark.functions.errors import (
    fetch_error_class_expr,
    is_permanent_error_expr,
)
from crawler_ai_spark.plans.crawl_loop import CrawlConfig, CrawlStore, run_crawl
from crawler_ai_spark.sources.fixtures import _ERROR_CYCLE

CASES = [
    ("Permanent error: HTTP 404 - Not Found", "not_found", True),
    ("Permanent error: HTTP 410 - Gone", "not_found", True),
    ("503 Service Unavailable - server overloaded", "other", False),
    ("429 Rate Limited - too many requests", "rate_limited", False),
    ("403 Forbidden - likely blocked by server", "blocked", False),
    ("Connection timeout to host", "timeout", False),  # ordered: beats 'connection'
    ("Name or service not known", "dns", False),
    ("Connection refused", "connection", False),
    ("something exploded", "other", False),
    (None, None, False),
]


def test_classifier_unit(spark):
    df = spark.createDataFrame(
        [(i, m) for i, (m, _, _) in enumerate(CASES)], "i INT, msg STRING"
    )
    rows = df.select(
        "i",
        fetch_error_class_expr(F.col("msg")).alias("cls"),
        is_permanent_error_expr(fetch_error_class_expr(F.col("msg"))).alias("perm"),
    ).collect()
    got = {r.i: (r.cls, r.perm) for r in rows}
    for i, (msg, cls, perm) in enumerate(CASES):
        assert got[i] == (cls, perm), (msg, got[i], (cls, perm))


@pytest.fixture(scope="module")
def crawl_with_retries(spark, fixture_root, tmp_path_factory):
    pages = spark.read.parquet(str(fixture_root / "sf0.001" / "pages.parquet"))
    seeds = spark.read.parquet(str(fixture_root / "sf0.001" / "seeds.parquet"))
    root = tmp_path_factory.mktemp("crawl_retries")
    cfg = CrawlConfig(max_batches=6, max_fetch_attempts=3, parallelism=8)
    run_crawl(spark, pages, seeds, root, cfg=cfg)
    store = CrawlStore(spark, root)
    last = max(store.committed_batches())
    return store.read_all("visited", last).toPandas()


def test_per_class_retry_divergence(crawl_with_retries):
    vis = crawl_with_retries
    err = vis[vis.url.str.endswith("/our-offices")]
    assert len(err) > 0, "crawl never reached the error pages"
    by_url = err.groupby("url")
    saw_permanent = saw_transient = False
    for url, g in by_url:
        rank = int(url.split("site", 1)[1].split(".", 1)[0])
        status, _msg = _ERROR_CYCLE[rank % len(_ERROR_CYCLE)]
        assert not g.fetched.any()
        classes = set(g.fetch_error_class)
        if status in (404, 410):
            # permanent: exactly one attempt, never re-enqueued
            assert len(g) == 1, (url, len(g))
            assert classes == {"not_found"}
            saw_permanent = True
        else:
            # transient: re-enters until the attempt budget (3) is spent
            assert len(g) == 3, (url, len(g))
            assert sorted(g.attempt) == [0, 1, 2]
            assert "not_found" not in classes
            saw_transient = True
    assert saw_permanent and saw_transient


def test_success_rows_have_no_error(crawl_with_retries):
    vis = crawl_with_retries
    ok = vis[vis.fetched]
    assert ok.fetch_error.isna().all()
    assert ok.fetch_error_class.isna().all()
    assert (ok.status == 200).all()
    # frontier rows with no pages row at all classify as 'other'
    miss = vis[~vis.fetched & vis.status.isna()]
    assert len(miss) > 0
    assert set(miss.fetch_error_class) <= {"other", "timeout"}


def test_host_budget_defers_without_loss(spark, fixture_root, tmp_path_factory):
    """W2 politeness INSIDE the loop: with a per-host budget, no batch
    schedules more than the budget per host, and deferred rows re-enter
    later batches — the final visited set equals the unbudgeted crawl's
    (nothing is lost, only delayed)."""
    from pyspark.sql import functions as F

    pages = spark.read.parquet(str(fixture_root / "sf0.001" / "pages.parquet")).where(
        ~F.col("url").endswith(".xml")
    )
    seeds_urls = sorted(
        r.url for r in pages.select("url").distinct().collect() if r.url.endswith(".example/")
    )[:4]
    seeds = spark.createDataFrame(
        [(s, 50, 10) for s in seeds_urls], ["seed_url", "max_pages", "max_career_pages"]
    )

    def run(budget, batches, root):
        run_crawl(
            spark, pages, seeds, root,
            CrawlConfig(max_batches=batches, parallelism=8, host_budget_per_batch=budget),
        )
        return CrawlStore(spark, root)

    free = run(None, 6, tmp_path_factory.mktemp("free"))
    capped = run(3, 12, tmp_path_factory.mktemp("capped"))

    # per (batch, host): scheduled rows never exceed the budget
    last = max(capped.committed_batches())
    for b in capped.committed_batches():
        if b == 0:
            continue
        counts = (
            capped.read("visited", b)
            .groupBy(F.regexp_extract("url", r"https://([^/]+)/", 1).alias("host"))
            .count()
            .collect()
        )
        for r in counts:
            assert r["count"] <= 3, (b, r.host, r["count"])

    # deferral, not loss: same final visited URL set per seed
    free_last = max(free.committed_batches())
    a = {
        (r.seed_url, r.url)
        for r in free.read_all("visited", free_last).select("seed_url", "url").collect()
    }
    bset = {
        (r.seed_url, r.url)
        for r in capped.read_all("visited", last).select("seed_url", "url").collect()
    }
    assert a == bset
