"""Snapshot-log (Iceberg-style metadata layer) tests — sources/snapshots.py.

Covers the north-rule claims directly: appends produce a parent-linked
snapshot chain with per-partition lineage, manifest row counts match the
tables, time travel reproduces any committed prefix, a crash between data
write and commit is invisible to readers, a replayed batch supersedes its
stale snapshot, and manifest bounds prune point lookups on the
range-clustered seen set to a strict subset of files."""

import pathlib

import pytest
from pyspark.sql import functions as F

from crawler_ai_spark.plans.crawl_loop import CrawlConfig, CrawlStore, run_crawl
from crawler_ai_spark.sources.snapshots import SnapshotLog


@pytest.fixture(scope="module")
def crawled(spark, fixture_root, tmp_path_factory):
    root = tmp_path_factory.mktemp("snapstore")
    pages = spark.read.parquet(str(fixture_root / "sf0.001" / "pages.parquet")).where(
        ~F.col("url").endswith(".xml")
    )
    seeds_urls = sorted(
        r.url for r in pages.select("url").collect() if r.url.endswith(".example/")
    )[:6]
    seeds = spark.createDataFrame(
        [(u, None, None) for u in seeds_urls],
        "seed_url string, max_pages int, max_career_pages int",
    )
    cfg = CrawlConfig(max_batches=3, parallelism=4, seen_delta_files=4)
    run_crawl(spark, pages, seeds, root, cfg)
    return CrawlStore(spark, root)


def test_chain_is_consistent_and_counts_match(crawled):
    store = crawled
    committed = store.committed_batches()
    assert committed, "crawl produced no committed batches"
    for table in store.log.tables():
        chain = store.log.snapshots(table)
        # parent links walk back monotonically over committed batch ids
        assert [s["parent_id"] for s in chain] == [None] + [
            s["snapshot_id"] for s in chain[:-1]
        ]
        assert all(s["batch_id"] in committed for s in chain)
        for snap in chain:
            actual = store.read(table, snap["batch_id"]).count()
            assert snap["summary"]["added_rows"] == actual, (table, snap["batch_id"])
            for entry in snap["manifest"]:
                assert pathlib.Path(entry["path"]).exists()
                assert entry["spark_partition"] is not None


def test_time_travel_matches_directory_reads(spark, crawled):
    store = crawled
    last = max(store.committed_batches())
    for through in (0, last):
        paths = store.log.data_paths("seen_delta", through_batch=through)
        via_manifest = spark.read.parquet(*paths)
        via_dirs = spark.read.parquet(
            *[
                str(store.batch_dir(b) / "seen_delta")
                for b in store.committed_batches()
                if b <= through
            ]
        )
        a = {tuple(r) for r in via_manifest.collect()}
        b = {tuple(r) for r in via_dirs.collect()}
        assert a == b


def test_uncommitted_write_is_invisible(spark, crawled):
    store = crawled
    table = "seen_delta"
    before = store.log.current_snapshot_id(table)
    rows_before = {tuple(r) for r in store.read_all(table, 10_000).collect()}
    # simulate a crash: data files land for a new batch, commit never runs
    phantom = max(store.committed_batches()) + 1
    df = spark.createDataFrame(
        [(1, "https://phantom.example/", "https://phantom.example/")],
        "url_hash long, url string, seed_url string",
    )
    store.write(phantom, table, df)
    assert store.log.current_snapshot_id(table) == before
    assert {tuple(r) for r in store.read_all(table, 10_000).collect()} == rows_before
    store._pending.pop(phantom, None)


def test_replayed_batch_supersedes_stale_snapshot(spark, tmp_path):
    log = SnapshotLog(tmp_path)
    d1, d2 = tmp_path / "b1a", tmp_path / "b1b"
    spark.createDataFrame([(1,), (2,)], "k long").coalesce(1).write.parquet(str(d1))
    spark.createDataFrame([(3,)], "k long").coalesce(1).write.parquet(str(d2))
    log.commit("t", 0, d1)
    stale = log.commit("t", 1, d1)  # first attempt at batch 1, "crashes" after
    fresh = log.commit("t", 1, d2)  # replayed batch 1
    chain = log.snapshots("t")
    assert [s["snapshot_id"] for s in chain] == [1, fresh]
    assert stale not in {s["snapshot_id"] for s in chain}
    # reader sees batch 0's files + the replay's files only
    paths = log.data_paths("t")
    got = sorted(r.k for r in spark.read.parquet(*paths).collect())
    assert got == [1, 2, 3]


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_compaction_and_vacuum(spark, tmp_path):
    store = CrawlStore(spark, tmp_path / "store")
    for b in range(3):
        df = spark.createDataFrame(
            [(b * 10 + i, f"https://h{i}.example/{b}", "s") for i in range(5)],
            "url_hash long, url string, seed_url string",
        )
        store.write(b, "seen_delta", df.repartitionByRange(3, "url_hash"))
        store.commit(b)
    before = _rows(store.read_all("seen_delta", 2))
    prefix = _rows(store.read_all("seen_delta", 1))
    n_files_before = len(store.log.data_paths("seen_delta", through_batch=2))

    store.compact("seen_delta", files=2)
    assert _rows(store.read_all("seen_delta", 2)) == before
    assert len(store.log.data_paths("seen_delta", through_batch=2)) == 2 < n_files_before
    # per-batch read still returns ONE batch's delta, not the compacted
    # whole (replace entries carry the compaction's batch id)
    assert _rows(store.read("seen_delta", 1)) == {
        r for r in before if 10 <= int(r[0]) < 20
    }
    # time travel to a pre-compaction batch still resolves (snapshots retained)
    assert {
        tuple(r)
        for r in spark.read.parquet(
            *store.log.data_paths("seen_delta", through_batch=1)
        ).collect()
    } == prefix

    deleted = store.log.vacuum("seen_delta")
    assert deleted and all(not pathlib.Path(p).exists() for p in deleted)
    assert _rows(store.read_all("seen_delta", 2)) == before
    # appends after the compaction keep working
    df = spark.createDataFrame(
        [(99, "https://new.example/", "s")], "url_hash long, url string, seed_url string"
    )
    store.write(3, "seen_delta", df)
    store.commit(3)
    assert _rows(store.read_all("seen_delta", 3)) == before | _rows(df)


def test_resume_after_compaction_is_identical(spark, fixture_root, tmp_path_factory):
    pages = spark.read.parquet(str(fixture_root / "sf0.001" / "pages.parquet")).where(
        ~F.col("url").endswith(".xml")
    )
    seeds_urls = sorted(
        r.url for r in pages.select("url").collect() if r.url.endswith(".example/")
    )[:6]
    seeds = spark.createDataFrame(
        [(u, None, None) for u in seeds_urls],
        "seed_url string, max_pages int, max_career_pages int",
    )
    cfg = lambda n: CrawlConfig(max_batches=n, parallelism=4, seen_delta_files=4)  # noqa: E731

    root_a = tmp_path_factory.mktemp("uncompacted")
    run_crawl(spark, pages, seeds, root_a, cfg(8))

    root_b = tmp_path_factory.mktemp("compacted")
    run_crawl(spark, pages, seeds, root_b, cfg(2))
    store_b = CrawlStore(spark, root_b)
    store_b.compact("seen_delta", files=4)
    store_b.log.vacuum("seen_delta")
    run_crawl(spark, pages, seeds, root_b, cfg(8), resume=True)

    store_a = CrawlStore(spark, root_a)
    store_b = CrawlStore(spark, root_b)
    last_a = max(store_a.committed_batches())
    last_b = max(store_b.committed_batches())
    assert last_a == last_b
    for table in ("visited", "career_pages", "job_urls", "seen_delta"):
        def fp(store, last):
            df = store.read_all(table, last)
            return {
                tuple(str(v) for v in row)
                for row in df.select(*sorted(df.columns)).collect()
            }
        assert fp(store_a, last_a) == fp(store_b, last_b), (
            f"table {table} diverged after compaction+resume"
        )


def test_resume_after_compaction_bloom_path(spark, fixture_root, tmp_path_factory):
    """Seen-delta compaction must not disturb the bloom delta chain: a
    bloom crawl stopped, compacted+vacuumed, and resumed with bloom ends
    bit-identical to an uninterrupted bloom crawl."""
    pages = spark.read.parquet(str(fixture_root / "sf0.001" / "pages.parquet")).where(
        ~F.col("url").endswith(".xml")
    )
    seeds_urls = sorted(
        r.url for r in pages.select("url").collect() if r.url.endswith(".example/")
    )[:6]
    seeds = spark.createDataFrame(
        [(u, None, None) for u in seeds_urls],
        "seed_url string, max_pages int, max_career_pages int",
    )
    cfg = lambda n: CrawlConfig(  # noqa: E731
        max_batches=n, parallelism=4, seen_delta_files=4, use_bloom=True
    )

    root_a = tmp_path_factory.mktemp("bloom_plain")
    run_crawl(spark, pages, seeds, root_a, cfg(8))

    root_b = tmp_path_factory.mktemp("bloom_compacted")
    run_crawl(spark, pages, seeds, root_b, cfg(2))
    store_b = CrawlStore(spark, root_b)
    store_b.compact("seen_delta", files=4)
    store_b.log.vacuum("seen_delta")
    run_crawl(spark, pages, seeds, root_b, cfg(8), resume=True)

    store_a = CrawlStore(spark, root_a)
    store_b = CrawlStore(spark, root_b)
    last = max(store_a.committed_batches())
    assert last == max(store_b.committed_batches())
    for table in ("visited", "seen_delta"):
        fa = _rows(store_a.read_all(table, last).select("url"))
        fb = _rows(store_b.read_all(table, last).select("url"))
        assert fa == fb, f"table {table} diverged (bloom + compaction)"


def test_manifest_bounds_prune_point_lookup(spark, crawled):
    store = crawled
    last = max(store.committed_batches())
    all_paths = store.log.data_paths("seen_delta", through_batch=last)
    probe = store.read_all("seen_delta", last).select("url_hash").first().url_hash
    pruned = store.log.prune(
        "seen_delta", "url_hash", probe, probe, through_batch=last
    )
    # range-clustered layout → a point lookup keeps at most one file per
    # batch; with seen_delta_files=4 that is a strict subset
    assert len(pruned) < len(all_paths)
    full = {
        tuple(r)
        for r in spark.read.parquet(*all_paths)
        .where(F.col("url_hash") == probe)
        .collect()
    }
    via_pruned = {
        tuple(r)
        for r in spark.read.parquet(*pruned)
        .where(F.col("url_hash") == probe)
        .collect()
    }
    assert via_pruned == full and full


def test_surt_clustered_compaction_prunes_by_domain(spark, tmp_path):
    """compact(cluster='surt'): identical row set, files range-clustered by
    the SURT key so one registered domain (all subdomains) resolves to a
    subset of files via manifest footer-bound pruning."""
    store = CrawlStore(spark, tmp_path / "store")
    # the target domain is a small slice of the keyspace so the surt
    # range clustering isolates it to a strict file subset
    hosts = (
        ["alpha.com"] * 10
        + ["beta.com"] * 10
        + ["example.com", "www.example.com", "jobs.example.com"] * 2
        + ["phi.org"] * 10
        + ["zeta.org"] * 10
    )
    rows = [
        (b * 1000 + i, f"https://{h}/p/{b}/{i}", "s")
        for b in range(2)
        for i, h in enumerate(hosts)
    ]
    half = len(rows) // 2
    for b, chunk in enumerate((rows[:half], rows[half:])):
        df = spark.createDataFrame(
            chunk, "url_hash long, url string, seed_url string"
        )
        store.write(b, "seen_delta", df)
        store.commit(b)
    before = _rows(store.read_all("seen_delta", 1).select("url_hash", "url", "seed_url"))

    store.compact("seen_delta", files=3, cluster="surt")
    after = store.read_all("seen_delta", 1)
    assert "surt" in after.columns  # materialized pruning key
    assert _rows(after.select("url_hash", "url", "seed_url")) == before

    all_files = store.log.data_paths("seen_delta", through_batch=1)
    assert len(all_files) == 3
    pruned = store.log.prune("seen_delta", "surt", "com,example", "com,example~")
    assert len(pruned) < len(all_files)
    # completeness: every example.com URL (any subdomain) is in the kept files
    kept = spark.read.parquet(*pruned)
    want = {u for (_, u, _) in before if "example.com" in u}
    got = {r.url for r in kept.collect() if "example.com" in r.url}
    assert got == want

    # appends after a surt compaction keep working (plain schema, no surt)
    df = spark.createDataFrame(
        [(9999, "https://new.example/", "s")],
        "url_hash long, url string, seed_url string",
    )
    store.write(2, "seen_delta", df)
    store.commit(2)
    merged = store.read_all("seen_delta", 2, merge_schema=True)
    assert _rows(merged.select("url_hash", "url", "seed_url")) == before | _rows(df)


def _takedown_store(spark, root, compact_surt: bool):
    store = CrawlStore(spark, root)
    hosts = (
        ["alpha.com"] * 10
        + ["beta.com"] * 10
        + ["example.com", "www.example.com", "jobs.example.com"] * 2
        + ["phi.org"] * 10
        + ["zeta.org"] * 10
    )
    rows = [
        (b * 1000 + i, f"https://{h}/p/{b}/{i}", "s")
        for b in range(2)
        for i, h in enumerate(hosts)
    ]
    half = len(rows) // 2
    for b, chunk in enumerate((rows[:half], rows[half:])):
        store.write(
            b,
            "seen_delta",
            spark.createDataFrame(chunk, "url_hash long, url string, seed_url string"),
        )
        store.commit(b)
    if compact_surt:
        store.compact("seen_delta", files=3, cluster="surt")
    return store, rows


def test_domain_takedown_rewrites_only_affected_files(spark, tmp_path):
    store, rows = _takedown_store(spark, tmp_path / "s1", compact_surt=True)
    before_paths = set(store.log.data_paths("seen_delta", through_batch=1))
    pre_sid = store.log.current_snapshot_id("seen_delta")

    res = store.delete_domain("seen_delta", "example.com")
    assert res["rows_deleted"] == 12  # apex + 2 subdomains, 2 copies, 2 batches
    after = store.read_all("seen_delta", 1, merge_schema=True)
    urls = {r.url for r in after.collect()}
    assert not any("example.com" in u for u in urls)
    assert len(urls) == len(rows) - 12  # everything else intact

    # surgical: the files outside the domain's surt range were NOT copied
    after_paths = set(store.log.data_paths("seen_delta", through_batch=1))
    untouched = before_paths & after_paths
    assert res["files_rewritten"] < len(before_paths)
    assert len(untouched) == len(before_paths) - res["files_rewritten"]

    # time travel to the pre-delete snapshot still sees the domain
    pre = spark.read.parquet(
        *store.log.data_paths("seen_delta", snapshot_id=pre_sid)
    )
    assert pre.where(pre.url.contains("example.com")).count() == 12

    # absent domain is a no-op; appends after a takedown keep working
    assert store.delete_domain("seen_delta", "nosuch.net") is None
    store.write(
        2,
        "seen_delta",
        spark.createDataFrame(
            [(7, "https://new.example2.net/", "s")],
            "url_hash long, url string, seed_url string",
        ),
    )
    store.commit(2)
    assert store.read_all("seen_delta", 2, merge_schema=True).count() == len(rows) - 12 + 1


def test_domain_takedown_on_uncompacted_store(spark, tmp_path):
    # no surt bounds anywhere: every file is a candidate (prune keeps
    # bound-less files), and the delete is still exact
    store, rows = _takedown_store(spark, tmp_path / "s2", compact_surt=False)
    res = store.delete_domain("seen_delta", "example.com")
    assert res["rows_deleted"] == 12
    urls = {r.url for r in store.read_all("seen_delta", 1).collect()}
    assert not any("example.com" in u for u in urls)
    assert len(urls) == len(rows) - 12
