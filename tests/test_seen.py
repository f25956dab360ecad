"""Bloom/cuckoo URL-seen tests — bloom-vs-exact equivalence (SURVEY.md M4)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from crawler_ai_spark.operators import seen as S
from crawler_ai_spark.operators.frontier import dedup_against_seen


@pytest.fixture(scope="module")
def seen_and_candidates(spark):
    # 5k seen keys, 5k candidates with 50% overlap, multiple seeds
    seen = spark.range(0, 5000).select(
        F.xxhash64(F.concat(F.lit("seen"), F.col("id"))).alias("url_hash")
    )
    cand = spark.range(2500, 7500).select(
        F.xxhash64(F.concat(F.lit("seen"), F.col("id"))).alias("url_hash"),
        F.concat(F.lit("https://s/"), F.col("id")).alias("child_url"),
        F.lit("seed").alias("seed_url"),
        F.col("id").alias("discovered_seq"),
    )
    return seen, cand


def test_bloom_no_false_negatives(spark, seen_and_candidates):
    seen, cand = seen_and_candidates
    blooms = S.build_bloom(seen, n_buckets=16)
    tagged = S.bloom_split(cand, blooms, n_buckets=16)
    # every truly-seen candidate must be tagged maybe_seen
    missed = (
        tagged.join(seen, "url_hash", "left_semi").where(~F.col("maybe_seen")).count()
    )
    assert missed == 0


def test_bloom_dedup_equals_exact_dedup(spark, seen_and_candidates):
    seen, cand = seen_and_candidates
    blooms = S.build_bloom(seen, n_buckets=16)
    exact = {r.url_hash for r in dedup_against_seen(cand, seen).collect()}
    fast = {
        r.url_hash
        for r in S.dedup_with_bloom(cand, seen, blooms, n_buckets=16).collect()
    }
    assert fast == exact
    assert len(exact) == 2500  # ids 5000..7499 are new


def test_bloom_false_positive_rate_reasonable(spark, seen_and_candidates):
    seen, cand = seen_and_candidates
    blooms = S.build_bloom(seen, n_buckets=16)
    tagged = S.bloom_split(cand, blooms, n_buckets=16)
    truly_new = tagged.join(seen, "url_hash", "left_anti")
    fp = truly_new.where(F.col("maybe_seen")).count()
    total_new = truly_new.count()
    assert total_new == 2500
    assert fp / total_new < 0.05  # 10 bits/key, k=7 → ~0.8% expected


def test_merge_blooms_unions_batches(spark):
    a = spark.range(0, 1000).select(F.xxhash64(F.col("id")).alias("url_hash"))
    b = spark.range(1000, 2000).select(F.xxhash64(F.col("id")).alias("url_hash"))
    cap = 2000
    ba = S.build_bloom(a, n_buckets=4, expected_keys_per_bucket=cap)
    bb = S.build_bloom(b, n_buckets=4, expected_keys_per_bucket=cap)
    merged = S.merge_blooms(ba.unionByName(bb))
    cand = spark.range(0, 2000).select(
        F.xxhash64(F.col("id")).alias("url_hash"),
        F.lit("s").alias("seed_url"),
        F.col("id").alias("discovered_seq"),
    )
    tagged = S.bloom_split(cand, merged, n_buckets=4)
    assert tagged.where(~F.col("maybe_seen")).count() == 0  # all seen → all maybe


@settings(max_examples=50, deadline=None)
@given(st.sets(st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=200))
def test_cuckoo_insert_contains_delete(keys):
    cf = S.CuckooFilter(capacity=1024)
    keys = list(keys)
    for k in keys:
        assert cf.insert(k)
    for k in keys:
        assert cf.contains(k)
    for k in keys[: len(keys) // 2]:
        assert cf.delete(k)
    # deleted keys may still 'maybe' collide with remaining fingerprints,
    # but remaining keys must all still be present (no false negatives)
    for k in keys[len(keys) // 2 :]:
        assert cf.contains(k)


def test_cuckoo_ttl_recrawl_semantics():
    """The reference's 1h cache TTL (cache.py:15-33): expired → deleted →
    schedulable again."""
    cf = S.CuckooFilter(capacity=64)
    url_key = 12345678901
    assert cf.insert(url_key)
    assert cf.contains(url_key)       # within TTL: skip fetch
    assert cf.delete(url_key)         # TTL expired: evict
    assert cf.insert(url_key)         # recrawl schedules again


def test_crawl_bloom_path_identical(spark, fixture_root, tmp_path_factory):
    """A full crawl with the bloom-prefiltered seen-dedup must produce
    bit-identical frontier/seen tables to the exact-anti-join crawl."""
    from pyspark.sql import functions as F

    from crawler_ai_spark.plans.crawl_loop import CrawlConfig, CrawlStore, run_crawl

    pages = spark.read.parquet(str(fixture_root / "sf0.001" / "pages.parquet")).where(
        ~F.col("url").endswith(".xml")
    )
    seeds_urls = sorted(
        r.url for r in pages.select("url").collect() if r.url.endswith(".example/")
    )[:6]
    seeds = spark.createDataFrame(
        [(s, 50, 10) for s in seeds_urls], ["seed_url", "max_pages", "max_career_pages"]
    )

    def run(use_bloom, root):
        run_crawl(
            spark, pages, seeds, root,
            CrawlConfig(max_batches=3, parallelism=8, use_bloom=use_bloom),
        )
        store = CrawlStore(spark, root)
        last = max(store.committed_batches())
        out = {}
        for t in ("frontier", "seen_delta", "visited"):
            df = store.read_all(t, last)
            cols = sorted(df.columns)
            out[t] = {tuple(str(v) for v in row) for row in df.select(*cols).collect()}
        return out

    a = run(False, tmp_path_factory.mktemp("exact"))
    b = run(True, tmp_path_factory.mktemp("bloom"))
    for t in a:
        assert a[t] == b[t], f"{t} differs between exact and bloom paths"


def test_robots_parse_and_gate(spark):
    """W3 end-to-end: robots.txt bodies → rules → frontier gate."""
    from pyspark.sql import functions as F

    from crawler_ai_spark.operators.frontier import apply_robots
    from crawler_ai_spark.sources.robots import parse_robots

    bodies = [
        ("a.com", "User-agent: *\nDisallow: /admin\nDisallow: /tmp/\n\n"
                  "User-agent: Googlebot\nDisallow: /g-only"),
        ("b.com", "User-agent: Bingbot\nDisallow: /b-only"),
        ("c.com", "user-agent: *\ndisallow:\n"),
        ("d.com", "User-agent: *\r\nDisallow: /x\r\nUser-agent: *\nDisallow: /y"),
        ("e.com", ""),
    ]
    rules = parse_robots(spark.createDataFrame(bodies, "host STRING, body STRING"))
    got = {r.host: sorted(r.disallow_prefixes) for r in rules.collect()}
    assert got == {
        "a.com": ["/admin", "/tmp/"], "b.com": [], "c.com": [],
        "d.com": ["/x", "/y"], "e.com": [],
    }
    frontier = spark.createDataFrame(
        [(1, "https://a.com/admin/x", "a.com"), (2, "https://a.com/jobs", "a.com"),
         (3, "https://b.com/b-only", "b.com"), (4, "https://d.com/y/z", "d.com"),
         (5, "https://zz.com/any", "zz.com")],
        "id LONG, url STRING, host STRING",
    )
    assert sorted(r.id for r in apply_robots(frontier, rules).collect()) == [2, 3, 5]


def test_incremental_delta_blooms_equal_full_rebuild(spark):
    """OR-merged per-batch delta blobs (fixed m via
    expected_keys_per_bucket) must be BITMAP-identical to one build over
    the union of keys — the invariant behind the crawl loop's incremental
    bloom path."""
    from crawler_ai_spark.operators import seen as S

    batches = [
        [(i * 2654435761 % (1 << 31),) for i in range(lo, hi)]
        for lo, hi in [(0, 400), (400, 900), (900, 1000)]
    ]
    deltas = [
        S.build_bloom(
            spark.createDataFrame(b, "url_hash LONG"),
            n_buckets=16,
            expected_keys_per_bucket=256,
        )
        for b in batches
    ]
    merged = S.merge_blooms(deltas[0].unionByName(deltas[1]).unionByName(deltas[2]))
    full = S.build_bloom(
        spark.createDataFrame([r for b in batches for r in b], "url_hash LONG"),
        n_buckets=16,
        expected_keys_per_bucket=256,
    )
    m = {r.bucket_id: bytes(r.bitmap) for r in merged.collect()}
    f = {r.bucket_id: bytes(r.bitmap) for r in full.collect()}
    assert m == f
    # and exactly one blob per bucket survived the merge (same m everywhere)
    assert merged.count() == len(m)


def test_bloom_resume_from_bloomless_store_no_false_negatives(
    spark, fixture_root, tmp_path_factory
):
    """Coverage guard: resuming WITH --bloom from a store whose earlier
    batches ran WITHOUT it must not re-crawl seen URLs (partial delta
    blobs would otherwise probe false-negative). The mixed run's tables
    must equal an all-exact run's."""
    from pyspark.sql import functions as F

    from crawler_ai_spark.plans.crawl_loop import CrawlConfig, CrawlStore, run_crawl

    pages = spark.read.parquet(str(fixture_root / "sf0.001" / "pages.parquet")).where(
        ~F.col("url").endswith(".xml")
    )
    seeds_urls = sorted(
        r.url for r in pages.select("url").collect() if r.url.endswith(".example/")
    )[:5]
    seeds = spark.createDataFrame(
        [(s, 50, 10) for s in seeds_urls], ["seed_url", "max_pages", "max_career_pages"]
    )

    def tables(root):
        store = CrawlStore(spark, root)
        last = max(store.committed_batches())
        out = {}
        for t in ("frontier", "seen_delta", "visited"):
            df = store.read_all(t, last)
            out[t] = {tuple(str(v) for v in row) for row in df.select(*sorted(df.columns)).collect()}
        return out

    exact_root = tmp_path_factory.mktemp("all_exact")
    run_crawl(spark, pages, seeds, exact_root, CrawlConfig(max_batches=4, parallelism=8))

    mixed_root = tmp_path_factory.mktemp("mixed")
    run_crawl(spark, pages, seeds, mixed_root,
              CrawlConfig(max_batches=2, parallelism=8, use_bloom=False))
    run_crawl(spark, pages, seeds, mixed_root,
              CrawlConfig(max_batches=2, parallelism=8, use_bloom=True), resume=True)

    a, b = tables(exact_root), tables(mixed_root)
    for t in a:
        assert a[t] == b[t], f"{t} differs: bloom resume re-crawled or dropped rows"

    # and the catch-up batch left a _FULL blob so later batches go incremental
    store = CrawlStore(spark, mixed_root)
    markers = [
        b for b in store.committed_batches()
        if (store.batch_dir(b) / "bloom_delta" / "_FULL").exists()
    ]
    assert markers, "no _FULL catch-up blob written on bloom resume"
