"""CrawlConfig(obey_page_rep=True) ≡ golden simulator with the same
flag, on the fixture corpus with REP annotations INJECTED: noindex'd
career pages, page-level-nofollow blogs, and rel=nofollow'd service
links. Pins that the Spark loop's JVM-regexp REP gate (functions/
pagerep.py) and the simulator's pure-Python twins make identical
visited/career/frontier/seen/job decisions — and that the gate
actually bites (each annotation class changes the crawl)."""

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StringType, StructField, StructType, TimestampType

from crawler_ai_spark.plans.crawl_loop import CrawlConfig, CrawlStore, run_crawl
from tests.golden_crawl import simulate_crawl

MAX_BATCHES = 4

_NOINDEX = '<meta name="robots" content="noindex">'
_NOFOLLOW = '<meta name="robots" content="NOFOLLOW">'


def _site_rank(url: str) -> int:
    # fixture hosts are siteNNN.example
    host = url.split("/")[2]
    return int("".join(ch for ch in host.split(".")[0] if ch.isdigit()))


def _annotate(url: str, html: str) -> str:
    rank = _site_rank(url)
    path = "/" + url.split("/", 3)[3] if url.count("/") >= 3 else "/"
    if path == "/careers" and rank % 3 == 0:
        html = html.replace("<head>", "<head>" + _NOINDEX, 1)
    if path == "/blog" and rank % 5 == 0:
        html = html.replace("<head>", "<head>" + _NOFOLLOW, 1)
    if rank % 4 == 0:
        # every page's /services anchors, so the link can't leak into
        # the frontier through a secondary page
        html = html.replace(
            '<a href="/services">', '<a rel="nofollow" href="/services">'
        )
    return html


@pytest.fixture(scope="module")
def corpus(fixture_root):
    tbl = pq.read_table(fixture_root / "sf0.001" / "pages.parquet")
    pages = {}
    for u, h in zip(tbl["url"].to_pylist(), tbl["html"].to_pylist()):
        if u.endswith(".xml") or h is None:
            continue
        pages[u] = _annotate(u, h.decode("utf-8"))
    seeds = sorted({u for u in pages if u.endswith(".example/")})
    return pages, seeds


@pytest.fixture(scope="module")
def golden(corpus):
    pages, seeds = corpus
    return simulate_crawl(pages, seeds, max_batches=MAX_BATCHES, obey_page_rep=True)


@pytest.fixture(scope="module")
def spark_run(spark, corpus, tmp_path_factory):
    pages, seeds = corpus
    schema = StructType(
        [
            StructField("url", StringType()),
            StructField("warc_ts", TimestampType()),
            StructField("html", BinaryType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
        ]
    )
    pages_df = spark.createDataFrame(
        [(u, None, h.encode("utf-8"), None, "en") for u, h in pages.items()], schema
    )
    seeds_df = spark.createDataFrame(
        [(s, 50, 10) for s in seeds], ["seed_url", "max_pages", "max_career_pages"]
    )
    state_root = tmp_path_factory.mktemp("rep_crawl")
    cfg = CrawlConfig(max_batches=MAX_BATCHES, parallelism=8, obey_page_rep=True)
    summary = run_crawl(spark, pages_df, seeds_df, state_root, cfg)
    return CrawlStore(spark, state_root), summary


def test_rep_visited_and_career_match(golden, spark_run):
    store, summary = spark_run
    rows = (
        store.read_all("visited", summary["last_batch"])
        .select("seed_url", "url", "priority", "depth", "discovered_seq",
                "fetched", "is_career_page")
        .collect()
    )
    got = {tuple(r) for r in rows}
    expected = {
        (v["seed"], v["url"], v["priority"], v["depth"], v["seq"],
         v["fetched"], v["is_career"])
        for v in golden["visited"]
    }
    assert got == expected
    crows = store.read_all("career_pages", summary["last_batch"]).collect()
    cgot = {(r.seed_url, r.url, round(r.confidence, 9)) for r in crows}
    cexp = {(c["seed"], c["url"], c["confidence"]) for c in golden["career_pages"]}
    assert cgot == cexp
    # the noindex injection bit: no rank%3==0 careers page is a career page
    assert all(_site_rank(u) % 3 != 0 for _, u, _ in cgot if u.endswith("/careers"))


def test_rep_seen_and_jobs_match(golden, spark_run):
    store, summary = spark_run
    rows = store.read_all("seen_delta", summary["last_batch"]).collect()
    got: dict[str, set] = {}
    for r in rows:
        got.setdefault(r.seed_url, set()).add(r.url)
    assert got == {s: set(v) for s, v in golden["seen"].items()}
    # rel=nofollow injection bit: /services of rank%4==0 seeds never seen
    for seed, seen in got.items():
        if _site_rank(seed) % 4 == 0:
            assert not any(u.endswith("/services") for u in seen), seed
    jrows = store.read_all("job_urls", summary["last_batch"]).collect()
    jgot = {(r.seed_url, r.career_url, r.job_url) for r in jrows}
    assert jgot == set(map(tuple, golden["job_urls"]))


def test_rep_gate_changes_the_crawl(corpus):
    """Same corpus, flag off vs on (golden side only — loop≡golden is
    pinned above): the REP annotations must change career pages, seen
    sets, and yield decisions."""
    pages, seeds = corpus
    off = simulate_crawl(pages, seeds, max_batches=MAX_BATCHES)
    on = simulate_crawl(pages, seeds, max_batches=MAX_BATCHES, obey_page_rep=True)
    career_off = {(c["seed"], c["url"]) for c in off["career_pages"]}
    career_on = {(c["seed"], c["url"]) for c in on["career_pages"]}
    assert career_on < career_off  # noindex removed some, added none
    seen_off = {s: set(v) for s, v in off["seen"].items()}
    seen_on = {s: set(v) for s, v in on["seen"].items()}
    assert any(seen_on[s] < seen_off[s] for s in seen_off)  # links dropped
