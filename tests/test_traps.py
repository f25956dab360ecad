"""Spider-trap detection (functions/traps.py) — signal semantics and the
opt-in crawl-loop gate (CrawlConfig.trap_filter).

The cross-engine check of the catalog's `url_trap_detect` /
`trap_host_quarantine` queries is covered by the oracle gate; these pin
the classifier's per-signal behavior, precedence, near-misses, and that
the loop drops trap links before they consume queue order — while the
default path stays byte-identical.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_ai_spark.functions import traps as TR
from crawler_ai_spark.plans.crawl_loop import CrawlConfig, CrawlStore, run_crawl

B = "https://h.example"

CASES = [
    # (url, expected reason or None)
    (f"{B}/a/b/a/b/a/b/item-1", "loop_segments"),
    (f"{B}/x/y/x/page", None),  # single repeat — below the dup threshold
    (f"{B}/archive/2021/3/14", "calendar"),
    (f"{B}/archive/2021/3/14/photos", "calendar"),
    (f"{B}/news/2024/01/story-7", None),  # day slot is non-numeric
    (f"{B}/y/1850/1/1", None),  # pre-1900 year — not a calendar pager
    (f"{B}/page?jsessionid=abc123", "session_id"),
    (f"{B}/page?PHPSESSID=zz", "session_id"),
    (f"{B}/page?sid=9", "session_id"),
    (f"{B}/page?side=9", None),  # 'side=' does not contain 'sid='
    (f"{B}/search?a=1&b=2&c=3&d=4&e=5&f=6", "query_explosion"),
    (f"{B}/search?a=1&b=2&c=3&d=4&e=5", None),  # 5 params — under the cap
    (f"{B}/" + "/".join(f"s{i}" for i in range(13)), "too_deep"),
    (f"{B}/" + "/".join(f"s{i}" for i in range(12)), None),
    (f"{B}/long/" + "z" * 300, "too_long"),
    (f"{B}/careers", None),
    (f"{B}/", None),
]


def test_signal_semantics(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = {
        r["url"]: r["reason"]
        for r in df.select(
            "url", TR.trap_reason_expr(F.col("url")).alias("reason")
        ).collect()
    }
    for url, want in CASES:
        assert got[url] == want, url


def test_session_substring_is_deliberately_greedy(spark):
    # 'sid=' matches anywhere in the query — '?asid=5' IS flagged; the
    # signal trades precision for a pure substring scan (documented).
    df = spark.createDataFrame([(f"{B}/page?id=1&asid=5",)], "url string")
    assert df.select(TR.is_trap_expr(F.col("url"))).first()[0] is True


def test_precedence_first_match_wins(spark):
    # loop + calendar + session all present → loop_segments reported
    url = f"{B}/a/b/a/b/a/b/2021/3/14?jsessionid=1"
    df = spark.createDataFrame([(url,)], "url string")
    assert (
        df.select(TR.trap_reason_expr(F.col("url"))).first()[0] == "loop_segments"
    )


@pytest.fixture(scope="module")
def trapped_corpus(spark, fixture_root):
    pages = spark.read.parquet(str(fixture_root / "sf0.001" / "pages.parquet"))
    seeds_urls = sorted(
        r.url for r in pages.select("url").collect() if r.url.endswith(".example/")
    )[:2]
    # every seed homepage grows one trap link
    trap_html = '<a href="/a/b/a/b/a/b/item-9">loop</a>'
    pages = pages.withColumn(
        "html",
        F.when(
            F.col("url").isin(seeds_urls), F.concat(F.col("html"), F.lit(trap_html))
        ).otherwise(F.col("html")),
    )
    seeds = spark.createDataFrame(
        [(s, 30, 10) for s in seeds_urls], ["seed_url", "max_pages", "max_career_pages"]
    )
    return pages, seeds


def _frontier_urls(spark, root, last_batch):
    fr = CrawlStore(spark, root).read_all("visited", last_batch)
    return {r.url for r in fr.select("url").collect()}


def test_loop_gate_drops_traps_keeps_siblings(spark, trapped_corpus, tmp_path_factory):
    pages, seeds = trapped_corpus
    cfg_on = CrawlConfig(max_batches=4, parallelism=8, trap_filter=True)
    cfg_off = CrawlConfig(max_batches=4, parallelism=8)
    root_on = tmp_path_factory.mktemp("trap_on")
    root_off = tmp_path_factory.mktemp("trap_off")
    res_on = run_crawl(spark, pages, seeds, root_on, cfg_on)
    res_off = run_crawl(spark, pages, seeds, root_off, cfg_off)
    on = _frontier_urls(spark, root_on, res_on["last_batch"])
    off = _frontier_urls(spark, root_off, res_off["last_batch"])
    assert not any("/a/b/a/b/a/b/" in u for u in on)
    assert any("/a/b/a/b/a/b/" in u for u in off)  # default schedules it
    # the gate doesn't shrink non-trap coverage: freed budget slots are
    # refilled (or at worst left empty) — never fewer clean pages
    off_clean = {u for u in off if "/a/b/a/b/a/b/" not in u}
    assert len(on) >= len(off_clean)


def test_host_quarantine_in_loop(spark, trapped_corpus, tmp_path_factory):
    pages, seeds = trapped_corpus
    seed_urls = {r.seed_url for r in seeds.collect()}

    # threshold ~0: one trap link on the homepage quarantines the whole
    # seed host for the batch — the crawl visits ONLY the homepages
    root_q = tmp_path_factory.mktemp("trap_q0")
    res_q = run_crawl(
        spark, pages, seeds, root_q,
        CrawlConfig(max_batches=4, parallelism=8, trap_quarantine_share=0.001),
    )
    assert _frontier_urls(spark, root_q, res_q["last_batch"]) == seed_urls

    # threshold ~1 never quarantines; quarantine implies the per-URL
    # gate, so the visited set equals trap_filter=True exactly
    root_q99 = tmp_path_factory.mktemp("trap_q99")
    root_on = tmp_path_factory.mktemp("trap_gate_only")
    res_q99 = run_crawl(
        spark, pages, seeds, root_q99,
        CrawlConfig(max_batches=4, parallelism=8, trap_quarantine_share=0.99),
    )
    res_on = run_crawl(
        spark, pages, seeds, root_on,
        CrawlConfig(max_batches=4, parallelism=8, trap_filter=True),
    )
    assert _frontier_urls(spark, root_q99, res_q99["last_batch"]) == _frontier_urls(
        spark, root_on, res_on["last_batch"]
    )
