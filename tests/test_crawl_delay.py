"""W3 × W2 — robots Crawl-delay honored end to end: parser extraction,
per-host budget tightening in apply_host_budget, the batch cap inside
run_crawl, and the live fetch stage's per-host slot widths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_ai_spark.operators.frontier import apply_host_budget
from crawler_ai_spark.sources import fetch as FS
from crawler_ai_spark.sources.robots import parse_robots


def test_parse_robots_crawl_delay_scoping(spark):
    rows = {
        r.host: r
        for r in parse_robots(
            spark.createDataFrame(
                [
                    # star group 10; Googlebot group's 1 must not leak
                    ("a", "User-agent: *\nCrawl-delay: 10\nDisallow: /x\n"
                          "User-agent: Googlebot\nCrawl-delay: 1"),
                    # min of the star group's two values, fractional kept
                    ("b", "User-agent: *\nCrawl-delay: 7\ncrawl-delay: 2.5"),
                    # absent / garbage / negative -> NULL
                    ("c", "User-agent: *\nDisallow: /y"),
                    ("d", "User-agent: *\nCrawl-delay: soon\nCrawl-delay: -5"),
                ],
                ["host", "body"],
            ),
            with_crawl_delay=True,
        ).collect()
    }
    assert rows["a"].crawl_delay_s == 10.0
    assert rows["b"].crawl_delay_s == 2.5
    assert rows["c"].crawl_delay_s is None
    assert rows["d"].crawl_delay_s is None
    # the prefix output is unchanged by the new column
    assert rows["a"].disallow_prefixes == ["/x"]


def _frontier(spark, n=60, hosts=3):
    return spark.range(n).select(
        F.concat(F.lit("https://h"), (F.col("id") % hosts).cast("string"),
                 F.lit(".example/p/"), F.col("id").cast("string")).alias("url"),
        F.concat(F.lit("h"), (F.col("id") % hosts).cast("string"), F.lit(".example")).alias("host"),
        F.lit(1).alias("priority"),
        F.col("id").alias("discovered_seq"),
        F.lit("s").alias("seed_url"),
    )


def test_apply_host_budget_per_host_caps(spark):
    f = _frontier(spark)  # 20 rows per host
    budgets = spark.createDataFrame(
        [("h0.example", 3), ("h1.example", 50)], ["host", "host_budget"]
    )
    sched, deferred = apply_host_budget(f, 10, host_budgets=budgets)
    per_host = {r.host: r.n for r in sched.groupBy("host").agg(F.count("*").alias("n")).collect()}
    # h0: min(10, 3) = 3; h1: min(10, 50) = 10; h2: no row -> global 10
    assert per_host == {"h0.example": 3, "h1.example": 10, "h2.example": 10}
    assert sched.count() + deferred.count() == 60  # defer, never drop
    assert "host_budget" not in sched.columns and "host_budget" not in deferred.columns
    # host budgets alone (no global cap): unlisted hosts are unlimited
    sched2, deferred2 = apply_host_budget(f, None, host_budgets=budgets)
    per_host2 = {r.host: r.n for r in sched2.groupBy("host").agg(F.count("*").alias("n")).collect()}
    assert per_host2 == {"h0.example": 3, "h1.example": 20, "h2.example": 20}
    assert sched2.count() + deferred2.count() == 60
    # the deferred rows are exactly h0's tail in scheduler order: the 3
    # lowest discovered_seq are scheduled, the remaining 17 deferred
    d2 = deferred2.collect()
    assert all(r.host == "h0.example" for r in d2)
    h0_seqs = sorted(r.discovered_seq for r in f.where(F.col("host") == "h0.example").collect())
    assert sorted(r.discovered_seq for r in d2) == h0_seqs[3:]


def test_crawl_delay_caps_batches_in_loop(spark, fixture_root, tmp_path_factory):
    """A host whose robots asks for 1800 s between fetches gets at most
    interval/1800 = 2 fetches per batch in the REAL loop, and deferral is
    not loss — its pages still arrive, across more batches."""
    from crawler_ai_spark.plans.crawl_loop import CrawlConfig, CrawlStore, run_crawl

    pages = spark.read.parquet(str(fixture_root / "sf0.001" / "pages.parquet")).where(
        ~F.col("url").endswith(".xml")
    )
    seeds_urls = sorted(
        r.url for r in pages.select("url").collect() if r.url.endswith(".example/")
    )[:3]
    seeds = spark.createDataFrame(
        [(s, 50, 10) for s in seeds_urls], ["seed_url", "max_pages", "max_career_pages"]
    )
    slow_host = seeds_urls[0].split("//")[1].rstrip("/")
    host_rules = spark.createDataFrame(
        [(slow_host, [], 1800.0)],
        "host STRING, disallow_prefixes ARRAY<STRING>, crawl_delay_s DOUBLE",
    )

    root = tmp_path_factory.mktemp("crawl_delay")
    res = run_crawl(
        spark, pages, seeds, root,
        CrawlConfig(max_batches=12, parallelism=8), host_rules=host_rules,
    )
    store = CrawlStore(spark, root)
    vis = store.read_all("visited", res["last_batch"])
    on_slow = F.col("url").startswith(f"https://{slow_host}/")
    per_batch = {
        r.batch_id: r.n
        for r in vis.where(on_slow).groupBy("batch_id").agg(F.count("*").alias("n")).collect()
    }
    assert per_batch, "slow host never crawled"
    assert all(n <= 2 for n in per_batch.values()), per_batch
    assert sum(per_batch.values()) > 2, "deferral should spread across batches"


def test_fetch_stage_honors_host_delays(spark):
    f = _frontier(spark, n=30, hosts=3).drop("seed_url")
    cfg = FS.FetchConfig(
        per_host_delay_ms=100,
        host_delays_ms={"h1.example": 1000},
        host_partitions=4,
    )
    rows = FS.fetch_pages(f, cfg).collect()
    by_host = {}
    for r in rows:
        by_host.setdefault(r.host, []).append(r.planned_offset_ms)
    assert sorted(by_host["h0.example"]) == [i * 100 for i in range(10)]
    assert sorted(by_host["h1.example"]) == [i * 1000 for i in range(10)]
    assert sorted(by_host["h2.example"]) == [i * 100 for i in range(10)]


def test_robots_allow_longest_match_precedence(spark):
    """RFC 9309: most specific rule wins; equal length -> allow."""
    from crawler_ai_spark.operators.frontier import apply_robots

    rules = parse_robots(
        spark.createDataFrame(
            [("h", "User-agent: *\nDisallow: /a\nAllow: /a/b\n"
                   "Disallow: /a/b/c\nAllow: /t\nDisallow: /t")],
            ["host", "body"],
        ),
        with_allow=True,
    )
    frontier = spark.createDataFrame(
        [("h", f"https://h{p}") for p in
         ["/a", "/a/x", "/a/b", "/a/b/z", "/a/b/c", "/a/b/c/d", "/t", "/t/u", "/other", "/"]],
        ["host", "url"],
    )
    kept = {r.url.split("https://h")[1] for r in apply_robots(frontier, rules).collect()}
    assert kept == {"/a/b", "/a/b/z", "/t", "/t/u", "/other", "/"}, kept
    # disallow-only rules keep the old exists() semantics
    rules2 = parse_robots(
        spark.createDataFrame([("h", "User-agent: *\nDisallow: /a")], ["host", "body"])
    )
    kept2 = {r.url.split("https://h")[1] for r in apply_robots(frontier, rules2).collect()}
    assert kept2 == {"/t", "/t/u", "/other", "/"}
    # a host with no rules row at all is unrestricted in both modes
    f2 = frontier.withColumn("host", F.lit("unknown.example"))
    assert apply_robots(f2, rules).count() == 10
