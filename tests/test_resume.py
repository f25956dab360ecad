"""W6 — deterministic restart from checkpoint mid-crawl (SURVEY.md §5.4).

Run the full crawl once; run it again but killed after batch 2, then
resumed; every committed table must be bit-identical between the two runs.
"""

import pytest
from pyspark.sql import functions as F

from crawler_ai_spark.plans.crawl_loop import CrawlConfig, CrawlStore, run_crawl


@pytest.fixture(scope="module")
def inputs(spark, fixture_root):
    pages = spark.read.parquet(str(fixture_root / "sf0.001" / "pages.parquet")).where(
        ~F.col("url").endswith(".xml")
    )
    seeds_urls = sorted(
        r.url for r in pages.select("url").collect() if r.url.endswith(".example/")
    )
    seeds = spark.createDataFrame(
        [(s, 50, 10) for s in seeds_urls], ["seed_url", "max_pages", "max_career_pages"]
    )
    return pages, seeds


def _table_fingerprint(store: CrawlStore, table: str, last: int) -> set:
    df = store.read_all(table, last)
    cols = sorted(df.columns)
    return {tuple(str(v) for v in row) for row in df.select(*cols).collect()}


def test_resume_is_bit_identical(spark, inputs, tmp_path_factory):
    pages, seeds = inputs

    # run A: uninterrupted
    root_a = tmp_path_factory.mktemp("run_a")
    run_crawl(spark, pages, seeds, root_a, CrawlConfig(max_batches=4, parallelism=8))
    store_a = CrawlStore(spark, root_a)

    # run B: stop after 2 batches (simulated kill), then resume
    root_b = tmp_path_factory.mktemp("run_b")
    run_crawl(spark, pages, seeds, root_b, CrawlConfig(max_batches=2, parallelism=8))
    run_crawl(
        spark, pages, seeds, root_b, CrawlConfig(max_batches=4, parallelism=8), resume=True
    )
    store_b = CrawlStore(spark, root_b)

    last_a = max(store_a.committed_batches())
    last_b = max(store_b.committed_batches())
    assert last_a == last_b

    for table in ("frontier", "seen_delta", "visited", "career_pages", "job_urls", "seed_state"):
        fa = _table_fingerprint(store_a, table, last_a)
        fb = _table_fingerprint(store_b, table, last_b)
        assert fa == fb, f"table {table} differs after resume"


def test_retry_rows_reenter_frontier(spark, inputs, tmp_path_factory):
    """W4 — with max_fetch_attempts=3, an unfetched URL re-enters the next
    two batches' frontiers with attempt 1 then 2, then stops; with the
    default budget (1) nothing is retried and outputs are unchanged."""
    pages, seeds = inputs
    # drop one known child page from the corpus → that URL never fetches
    victim = (
        pages.where(F.col("url").endswith("/careers")).select("url").limit(1).collect()[0].url
    )
    holey = pages.where(F.col("url") != victim)

    root = tmp_path_factory.mktemp("retry")
    run_crawl(
        spark, holey, seeds, root,
        CrawlConfig(max_batches=4, parallelism=8, max_fetch_attempts=3),
    )
    store = CrawlStore(spark, root)
    last = max(store.committed_batches())
    frontier_all = store.read_all("frontier", last)
    attempts = sorted(
        r.attempt for r in frontier_all.where(F.col("url") == victim).collect()
    )
    # scheduled once at attempt 0 (batch 0 frontier is written pre-fetch),
    # retried at attempts 1 and 2, never at 3
    assert attempts == [1, 2] or attempts == [0, 1, 2], attempts

    # default budget: the victim appears only once across all frontiers
    root2 = tmp_path_factory.mktemp("noretry")
    run_crawl(spark, holey, seeds, root2, CrawlConfig(max_batches=4, parallelism=8))
    store2 = CrawlStore(spark, root2)
    f2 = store2.read_all("frontier", max(store2.committed_batches()))
    assert f2.where(F.col("url") == victim).count() <= 1
