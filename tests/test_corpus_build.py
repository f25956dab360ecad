"""Crawl store → training manifest bridge (plans/corpus_build.py): the
end-to-end path from a finished crawl to packed token windows, with
gates, dedup and the token-budget cut applied — and fully reproducible."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_ai_spark.plans.corpus_build import build_corpus_manifest, crawl_documents
from crawler_ai_spark.plans.crawl_loop import CrawlConfig, CrawlStore, run_crawl

WINDOW = 64


@pytest.fixture(scope="module")
def crawled(spark, fixture_root, tmp_path_factory):
    pages = spark.read.parquet(str(fixture_root / "sf0.001" / "pages.parquet"))
    seeds_urls = sorted(
        r.url for r in pages.select("url").collect() if r.url.endswith(".example/")
    )[:4]
    seeds = spark.createDataFrame(
        [(s, 10, 5) for s in seeds_urls], ["seed_url", "max_pages", "max_career_pages"]
    )
    root = tmp_path_factory.mktemp("corpus_build")
    res = run_crawl(spark, pages, seeds, root, CrawlConfig(max_batches=3, parallelism=8))
    return CrawlStore(spark, root), res["last_batch"], pages


def test_documents_cover_fetched_urls(spark, crawled):
    store, last, pages = crawled
    docs = crawl_documents(spark, store, last, pages)
    visited = {
        r.url
        for r in store.read_all("visited", last).where("fetched").collect()
    }
    got = {r.url: r for r in docs.collect()}
    assert set(got) == {
        u for u in visited
        if u in {p.url for p in pages.where(F.col("html").isNotNull()).collect()}
    }
    assert all(r.text for r in got.values())  # extractor produced text


def test_manifest_windows_and_budget(spark, crawled):
    store, last, pages = crawled
    m = build_corpus_manifest(
        spark, store, last, pages, min_quality=0.0, window=WINDOW
    ).collect()
    assert m, "no windows packed"
    # every window except each shard's last is exactly WINDOW tokens
    by_shard = {}
    for r in m:
        by_shard.setdefault(r.source, []).append(r)
    for rows in by_shard.values():
        rows.sort(key=lambda r: r.window_id)
        assert all(r.n_tokens == WINDOW for r in rows[:-1])
        assert 0 < rows[-1].n_tokens <= WINDOW
    cut = build_corpus_manifest(
        spark, store, last, pages, min_quality=0.0, window=WINDOW, token_budget=150
    ).collect()
    assert cut and max(r.running_total for r in cut) <= 150


def test_reproducible(spark, crawled):
    store, last, pages = crawled
    a = sorted(
        (r.source, r.window_id, r.window_text)
        for r in build_corpus_manifest(
            spark, store, last, pages, min_quality=0.0, window=WINDOW
        ).collect()
    )
    b = sorted(
        (r.source, r.window_id, r.window_text)
        for r in build_corpus_manifest(
            spark, store, last, pages, min_quality=0.0, window=WINDOW
        ).collect()
    )
    assert a == b
