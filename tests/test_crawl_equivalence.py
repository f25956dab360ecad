"""SURVEY.md §5.3 — Spark crawl loop ≡ plain-Python golden simulator.

Runs both on the sf0.001 fixture corpus with the reference's default
budgets (max_pages=50, max_career=10, buckets {5,3,2,2}) and asserts:
- identical visited (url, priority, depth, discovered_seq) sets per batch
- identical career-page sets with identical confidences
- identical final URL-seen sets per seed
- identical frontier ordering under (priority desc, discovered_seq asc)
"""

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from crawler_ai_spark.plans.crawl_loop import CrawlConfig, CrawlStore, run_crawl
from tests.golden_crawl import simulate_crawl

MAX_BATCHES = 5


@pytest.fixture(scope="module")
def corpus(fixture_root):
    tbl = pq.read_table(fixture_root / "sf0.001" / "pages.parquet")
    pages = {
        u: h.decode("utf-8")
        for u, h in zip(tbl["url"].to_pylist(), tbl["html"].to_pylist())
        if not u.endswith(".xml") and h is not None  # error rows = no response
    }
    seeds = sorted({u for u in pages if u.endswith(".example/")})
    return pages, seeds


@pytest.fixture(scope="module")
def golden(corpus):
    pages, seeds = corpus
    return simulate_crawl(pages, seeds, max_batches=MAX_BATCHES)


@pytest.fixture(scope="module")
def spark_run(spark, fixture_root, corpus, tmp_path_factory):
    pages, seeds = corpus
    state_root = tmp_path_factory.mktemp("crawl_state")
    pages_df = spark.read.parquet(str(fixture_root / "sf0.001" / "pages.parquet")).where(
        ~F.col("url").endswith(".xml")
    )
    seeds_df = spark.createDataFrame(
        [(s, 50, 10) for s in seeds], ["seed_url", "max_pages", "max_career_pages"]
    )
    cfg = CrawlConfig(max_batches=MAX_BATCHES, parallelism=8)
    summary = run_crawl(spark, pages_df, seeds_df, state_root, cfg)
    return CrawlStore(spark, state_root), summary


def _spark_visited(store, last_batch):
    rows = (
        store.read_all("visited", last_batch)
        .select("seed_url", "url", "priority", "depth", "discovered_seq", "fetched", "is_career_page")
        .collect()
    )
    return {
        (r.seed_url, r.url, r.priority, r.depth, r.discovered_seq, r.fetched, r.is_career_page)
        for r in rows
    }


def test_visited_set_matches(golden, spark_run):
    store, summary = spark_run
    got = _spark_visited(store, summary["last_batch"])
    expected = {
        (v["seed"], v["url"], v["priority"], v["depth"], v["seq"], v["fetched"], v["is_career"])
        for v in golden["visited"]
    }
    assert got == expected


def test_career_pages_match_with_scores(golden, spark_run):
    store, summary = spark_run
    rows = store.read_all("career_pages", summary["last_batch"]).collect()
    got = {(r.seed_url, r.url, round(r.confidence, 9), r.priority_found) for r in rows}
    expected = {
        (c["seed"], c["url"], c["confidence"], c["priority_found"]) for c in golden["career_pages"]
    }
    assert got == expected


def test_final_seen_set_matches(golden, spark_run):
    store, summary = spark_run
    rows = store.read_all("seen_delta", summary["last_batch"]).collect()
    got: dict[str, set] = {}
    for r in rows:
        got.setdefault(r.seed_url, set()).add(r.url)
    expected = {s: set(v) for s, v in golden["seen"].items()}
    assert got == expected


def test_frontier_order_matches(golden, spark_run):
    """Crawl ordering: per (seed, batch), frontier rows sorted by
    (priority desc, seq asc) must be IDENTICAL sequences."""
    store, summary = spark_run
    batches = store.committed_batches()
    spark_order: dict[tuple, list] = {}
    for b in batches:
        for r in store.read("frontier", b).collect():
            spark_order.setdefault((r.seed_url, b), []).append(
                (-r.priority, r.discovered_seq, r.url)
            )
    golden_order: dict[tuple, list] = {}
    for fr in golden["frontier"]:
        golden_order.setdefault((fr["seed"], fr["batch"]), []).append(
            (-fr["priority"], fr["seq"], fr["url"])
        )
    for key in set(spark_order) | set(golden_order):
        assert sorted(spark_order.get(key, [])) == sorted(golden_order.get(key, [])), key


def test_job_urls_match_and_nonempty(golden, spark_run):
    """F3 accept path INSIDE the loop: card career pages link
    reference-accepted job-URL shapes (/jobs/view/<id>,
    /tuyen-dung/ky-su-<n>), so the job_urls table must be non-empty and
    equal the golden simulator's set."""
    store, summary = spark_run
    rows = store.read_all("job_urls", summary["last_batch"]).collect()
    got = {(r.seed_url, r.career_url, r.job_url) for r in rows}
    expected = set(map(tuple, golden["job_urls"]))
    assert expected, "golden simulator found no job URLs — fixtures regressed"
    assert got == expected


def test_crawl_invariant_under_parallelism(spark, fixture_root, corpus, spark_run, tmp_path_factory):
    """North-rule determinism across cluster sizes, asserted at LOOP level:
    the same crawl at parallelism 2 (the N stand-in) produces every store
    table bit-identically to the parallelism-8 run (4N). The golden-sim
    equivalence pins semantics; this pins that no window, dedup
    tie-break, or politeness rank leaks partition count into results."""
    pages, seeds = corpus
    pages_df = spark.read.parquet(str(fixture_root / "sf0.001" / "pages.parquet")).where(
        ~F.col("url").endswith(".xml")
    )
    seeds_df = spark.createDataFrame(
        [(s, 50, 10) for s in seeds], ["seed_url", "max_pages", "max_career_pages"]
    )
    root2 = tmp_path_factory.mktemp("crawl_par2")
    sum2 = run_crawl(
        spark, pages_df, seeds_df, root2, CrawlConfig(max_batches=MAX_BATCHES, parallelism=2)
    )
    store8, sum8 = spark_run
    assert sum2["last_batch"] == sum8["last_batch"]
    store2 = CrawlStore(spark, root2)
    for table in ("frontier", "seen_delta", "visited", "career_pages", "job_urls", "seed_state"):
        da = store8.read_all(table, sum8["last_batch"])
        cols = sorted(da.columns)
        a = {tuple(str(v) for v in r) for r in da.select(*cols).collect()}
        b = {
            tuple(str(v) for v in r)
            for r in store2.read_all(table, sum2["last_batch"]).select(*cols).collect()
        }
        assert a == b, f"table {table} differs between parallelism 2 and 8"
