"""S5 — TTL-driven recrawl exercised END-TO-END in the crawl loop
(reference app/services/cache.py:15-33: md5(url)-keyed fetch cache, 1 h
TTL, success-only): a page's cache entry expires mid-crawl, its key is
DELETED from the deletable cuckoo cache filter, and the URL re-enters a
later batch's frontier and is re-FETCHED.

The seen-set semantics are pinned as re-crawl ≠ re-seen: a refresh
advances no counters, yields no links, and adds no seen/career/job rows,
so every output except `visited` is bit-identical to a TTL-disabled run —
and the TTL-disabled run is itself pinned bit-for-bit against the plain-
Python golden simulator (tests/test_crawl_equivalence.py), which
transitively pins the TTL run's crawl semantics too."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_ai_spark.plans.crawl_loop import CrawlConfig, CrawlStore, run_crawl

TTL_BATCHES = 2  # recrawl_ttl_seconds=7200 at the 3600 s default interval


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


@pytest.fixture(scope="module")
def runs(spark, inputs, tmp_path_factory):
    pages, seeds = inputs
    root_base = tmp_path_factory.mktemp("ttl_base")
    base = run_crawl(
        spark, pages, seeds, root_base, CrawlConfig(max_batches=6, parallelism=8)
    )
    root_ttl = tmp_path_factory.mktemp("ttl_on")
    ttl = run_crawl(
        spark, pages, seeds, root_ttl,
        CrawlConfig(max_batches=6, parallelism=8, recrawl_ttl_seconds=7200),
    )
    return (CrawlStore(spark, root_base), base), (CrawlStore(spark, root_ttl), ttl)


def _rows(store, table, last, cols):
    df = store.read_all(table, last)
    return {tuple(str(r[c]) for c in cols) for r in df.select(*cols).collect()}


def test_pages_expire_and_are_refetched(runs):
    (_, base), (store_t, ttl) = runs
    assert ttl["cache_evictions"] > 0, "no cache entry ever expired"
    assert ttl["total_recrawled"] > 0, "no URL was rescheduled after expiry"
    last = ttl["last_batch"]
    vis = store_t.read_all("visited", last)
    re_rows = vis.where(F.col("is_recrawl")).collect()
    assert re_rows, "no refresh visit was recorded"
    # every refresh re-FETCHED its page (the fixture corpus is static)
    assert all(r.fetched for r in re_rows)
    # a refresh happens exactly TTL batches after the fetch it refreshes
    first_fetch = {
        (r.seed_url, r.url): r.b
        for r in vis.where(F.col("fetched") & ~F.col("is_recrawl"))
        .groupBy("seed_url", "url")
        .agg(F.min("batch_id").alias("b"))
        .collect()
    }
    for r in re_rows:
        assert (r.batch_id - first_fetch[(r.seed_url, r.url)]) % TTL_BATCHES == 0, (
            r.url,
            r.batch_id,
        )
    # consecutive visits of the same cache entry are >= TTL apart
    per_url: dict[tuple, list[int]] = {}
    for r in vis.collect():
        per_url.setdefault((r.seed_url, r.url), []).append(r.batch_id)
    for key, batches in per_url.items():
        batches.sort()
        for a, b in zip(batches, batches[1:]):
            assert b - a >= TTL_BATCHES, (key, batches)


def test_recrawl_is_not_reseen(runs):
    """Everything except visited is bit-identical to the TTL-disabled run:
    refreshes add no seen rows, no career/job rows, and no frontier
    children."""
    (store_b, base), (store_t, ttl) = runs
    # refresh rows can keep the TTL run's frontier non-empty after the
    # base run exhausts, so it may legally run MORE batches; the shared
    # prefix must agree exactly
    assert ttl["last_batch"] >= base["last_batch"]
    last = min(base["last_batch"], ttl["last_batch"])
    checks = {
        "seen_delta": ["url_hash", "url", "seed_url"],
        "career_pages": ["seed_url", "url", "title", "confidence", "depth"],
        "job_urls": ["seed_url", "career_url", "job_url"],
        "seed_state": ["seed_url", "crawled_total", "career_total", "seq_offset"],
    }
    for table, cols in checks.items():
        assert _rows(store_b, table, last, cols) == _rows(store_t, table, last, cols), table
    # the non-refresh slice of visited is identical too
    cols = ["seed_url", "url", "fetched", "page_order", "is_career_page", "batch_id"]
    vb = {
        tuple(str(r[c]) for c in cols)
        for r in store_b.read_all("visited", last).where(~F.col("is_recrawl")).select(*cols).collect()
    }
    vt = {
        tuple(str(r[c]) for c in cols)
        for r in store_t.read_all("visited", last).where(~F.col("is_recrawl")).select(*cols).collect()
    }
    assert vb == vt


def test_incremental_ledger_equals_full_history(runs):
    """The per-batch merged cache_ledger snapshot must equal the full
    re-aggregation of all visited history (min/max associativity) — the
    incremental state is what lets a 10^10-URL crawl avoid an
    O(crawl-age) visited re-scan every batch."""
    (_, _), (store_t, ttl) = runs
    last = ttl["last_batch"]
    stored = store_t.read("cache_ledger", last)
    full = (
        store_t.read_all("visited", last)
        .groupBy("seed_url", "url")
        .agg(
            F.max(F.when(F.col("fetched"), F.col("batch_id"))).alias("last_fetch_batch"),
            F.max("batch_id").alias("last_visit_batch"),
            F.min("priority").alias("priority"),
            F.min("depth").alias("depth"),
            F.min("discovered_seq").alias("discovered_seq"),
            # adaptive-recrawl columns: the hash of the LATEST fetch (the
            # fixture corpus is static, so max == latest), and in fixed-TTL
            # mode every fetched entry sits at the base interval
            # (7200 s ttl / 3600 s batch = 2 here)
            F.max(F.when(F.col("fetched"), F.col("content_hash"))).alias("content_hash"),
            F.max(F.when(F.col("fetched"), F.lit(2).cast("int"))).alias("ttl_batches"),
            # validator columns (conditional revalidation): the latest
            # fetch's response validators — all NULL in table mode, but
            # the aggregation shape must still match the merged state
            F.max(F.when(F.col("fetched"), F.col("etag"))).alias("etag"),
            F.max(F.when(F.col("fetched"), F.col("last_modified"))).alias("last_modified"),
        )
    )
    cols = sorted(stored.columns)
    assert cols == sorted(full.columns)
    a = {tuple(str(v) for v in r) for r in stored.select(*cols).collect()}
    b = {tuple(str(v) for v in r) for r in full.select(*cols).collect()}
    assert a == b


def test_cache_ledger_backfills_pre_ttl_visited(spark, tmp_path):
    """Enabling recrawl_ttl_seconds on a store written BEFORE the TTL
    upgrade must work: old visited files lack batch_id (and is_recrawl);
    _cache_ledger reads with mergeSchema and recovers batch_id from the
    batch_id=N partition directory in the file path."""
    from crawler_ai_spark.plans.crawl_loop import _cache_ledger

    store = CrawlStore(spark, tmp_path / "store")
    old = spark.createDataFrame(
        [("s", "u1", True, 1, 0, 0), ("s", "u2", True, 1, 0, 1)],
        ["seed_url", "url", "fetched", "priority", "depth", "discovered_seq"],
    )
    old.write.parquet(str(store.batch_dir(1) / "visited"))
    (store.batch_dir(1) / "_COMMITTED").touch()
    new = spark.createDataFrame(
        [("s", "u1", True, 1, 0, 0, False, 2)],
        [
            "seed_url", "url", "fetched", "priority", "depth",
            "discovered_seq", "is_recrawl", "batch_id",
        ],
    )
    new.write.parquet(str(store.batch_dir(2) / "visited"))
    (store.batch_dir(2) / "_COMMITTED").touch()
    ledger = {r.url: r for r in _cache_ledger(store, 2).collect()}
    assert ledger["u1"].last_fetch_batch == 2  # refreshed in the new era
    assert ledger["u2"].last_fetch_batch == 1  # recovered from the path


def test_ttl_with_host_budget_no_duplicate_refresh(spark, inputs, tmp_path_factory):
    """S5 × W2: a refresh row DEFERRED by the per-host budget writes no
    visited row, so its ledger never advances and _recrawl_due would
    regenerate the same (seed, url) refresh next batch — the loop must
    keep exactly ONE copy (the anti-join against the carried frontier),
    or the URL double-fetches in one batch and the 'consecutive visits of
    a cache entry ≥ TTL apart' invariant breaks."""
    pages, seeds = inputs
    root = tmp_path_factory.mktemp("ttl_budget")
    run_crawl(
        spark, pages, seeds, root,
        CrawlConfig(
            max_batches=8, parallelism=8, recrawl_ttl_seconds=7200,
            host_budget_per_batch=2,
        ),
    )
    store = CrawlStore(spark, root)
    last = max(store.committed_batches())
    vis = store.read_all("visited", last)
    dup = (
        vis.groupBy("seed_url", "url", "batch_id")
        .count()
        .where(F.col("count") > 1)
        .count()
    )
    assert dup == 0, "a (seed, url) was visited twice in one batch"
    per_url: dict[tuple, list[int]] = {}
    for r in vis.where(F.col("fetched")).collect():
        per_url.setdefault((r.seed_url, r.url), []).append(r.batch_id)
    for key, batches in per_url.items():
        batches.sort()
        for a, b in zip(batches, batches[1:]):
            assert b - a >= TTL_BATCHES, (key, batches)


def test_pre_blob_store_resume_rebuilds_distributed(spark, inputs, tmp_path_factory, runs):
    """A store whose committed batches predate the sharded cache_blobs
    table (= the round-3 driver-resident filter era) resumes via the
    distributed ledger rebuild and still produces bit-identical output
    tables."""
    import shutil

    pages, seeds = inputs
    (_, _), (store_t, ttl) = runs
    root = tmp_path_factory.mktemp("ttl_preblob")
    cfg2 = CrawlConfig(max_batches=2, parallelism=8, recrawl_ttl_seconds=7200)
    run_crawl(spark, pages, seeds, root, cfg2)
    store_r = CrawlStore(spark, root)
    for b in store_r.committed_batches():
        blob_dir = store_r.batch_dir(b) / "cache_blobs"
        if blob_dir.exists():
            shutil.rmtree(blob_dir)
    cfg4 = CrawlConfig(max_batches=4, parallelism=8, recrawl_ttl_seconds=7200)
    run_crawl(spark, pages, seeds, root, cfg4, resume=True)
    last = ttl["last_batch"]
    assert max(store_r.committed_batches()) == last
    for table in ("frontier", "visited", "seen_delta", "seed_state"):
        df_a = store_t.read_all(table, last)
        cols = sorted(df_a.columns)
        a = {tuple(str(v) for v in r) for r in df_a.select(*cols).collect()}
        b = {
            tuple(str(v) for v in r)
            for r in store_r.read_all(table, last).select(*cols).collect()
        }
        assert a == b, f"table {table} differs after pre-blob-store resume"


def test_state_compaction_then_resume_bit_identical(spark, inputs, tmp_path_factory, runs):
    """compact_state + vacuum collapse the per-batch full-state snapshots
    (cache_blobs / cache_ledger) to one live copy — state storage
    O(state), not O(batches × state) — and a resumed crawl restores
    through the snapshot-log fallback and stays bit-identical."""
    pages, seeds = inputs
    (_, _), (store_t, ttl) = runs
    root = tmp_path_factory.mktemp("ttl_state_compact")
    cfg2 = CrawlConfig(max_batches=2, parallelism=8, recrawl_ttl_seconds=7200)
    run_crawl(spark, pages, seeds, root, cfg2)
    store = CrawlStore(spark, root)
    vacuumed = 0
    for t in CrawlStore.STATE_TABLES:
        if store.compact_state(t) is not None:
            vacuumed += len(store.log.vacuum(t))
    assert vacuumed > 0, "no superseded state files were expired"
    # every per-batch state dir is empty now; the live copy is the replace
    for b in store.committed_batches():
        for t in ("cache_blobs", "cache_ledger"):
            assert not list((store.batch_dir(b) / t).glob("*.parquet")), (b, t)
    cfg4 = CrawlConfig(max_batches=4, parallelism=8, recrawl_ttl_seconds=7200)
    run_crawl(spark, pages, seeds, root, cfg4, resume=True)
    last = ttl["last_batch"]
    assert max(store.committed_batches()) == last
    for table in ("frontier", "visited", "seen_delta", "seed_state"):
        df_a = store_t.read_all(table, last)
        cols = sorted(df_a.columns)
        a = {tuple(str(v) for v in r) for r in df_a.select(*cols).collect()}
        b = {
            tuple(str(v) for v in r)
            for r in store.read_all(table, last).select(*cols).collect()
        }
        assert a == b, f"table {table} differs after state compaction + resume"


def test_ttl_resume_is_bit_identical(spark, inputs, tmp_path_factory, runs):
    """W6 x S5: kill after 2 batches and resume — the deletable cache
    filter is rebuilt deterministically from the visited ledger, so the
    resumed run (refresh visits included) is bit-identical."""
    pages, seeds = inputs
    (_, _), (store_t, ttl) = runs
    root = tmp_path_factory.mktemp("ttl_resume")
    cfg2 = CrawlConfig(max_batches=2, parallelism=8, recrawl_ttl_seconds=7200)
    run_crawl(spark, pages, seeds, root, cfg2)
    # max_batches counts batches RUN this invocation, not the lifetime
    # total — resuming after 2 committed batches, ask for the 4 remaining
    cfg4 = CrawlConfig(max_batches=4, parallelism=8, recrawl_ttl_seconds=7200)
    run_crawl(spark, pages, seeds, root, cfg4, resume=True)
    store_r = CrawlStore(spark, root)
    last = ttl["last_batch"]
    assert max(store_r.committed_batches()) == last
    for table in ("frontier", "seen_delta", "visited", "career_pages", "job_urls", "seed_state"):
        df_a = store_t.read_all(table, last)
        cols = sorted(df_a.columns)
        a = {tuple(str(v) for v in r) for r in df_a.select(*cols).collect()}
        b = {
            tuple(str(v) for v in r)
            for r in store_r.read_all(table, last).select(*cols).collect()
        }
        assert a == b, f"table {table} differs after TTL resume"
