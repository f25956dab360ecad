"""DUST rules in the crawl loop (run_crawl(dust_rules=...)): harvested
variant URLs rewrite to their canonical form before hashing, so
structural duplicates cost zero fetches; default None stays
byte-identical (pinned by the unchanged golden-equivalence suite)."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StringType, StructField, StructType, TimestampType

from crawler_ai_spark.plans.crawl_loop import CrawlConfig, CrawlStore, run_crawl

MAX_BATCHES = 3


@pytest.fixture(scope="module")
def corpus(spark, fixture_root):
    """Fixture corpus with an injected print-view career variant: every
    homepage gains a link to /careers/print, and that URL serves the
    same bytes as /careers."""
    tbl = pq.read_table(fixture_root / "sf0.001" / "pages.parquet")
    pages = {}
    for u, h in zip(tbl["url"].to_pylist(), tbl["html"].to_pylist()):
        if u.endswith(".xml") or h is None:
            continue
        pages[u] = h.decode("utf-8")
    seeds = sorted({u for u in pages if u.endswith(".example/")})[:3]
    seed_hosts = {s.split("/")[2] for s in seeds}
    for u in list(pages):
        host = u.split("/")[2]
        if host not in seed_hosts:
            continue
        if u.endswith(".example/"):
            pages[u] = pages[u].replace(
                '<a href="/careers">',
                '<a href="/careers">Careers</a> <a href="/careers/print">',
                1,
            )
        if u.endswith("/careers"):
            pages[u + "/print"] = pages[u]
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
    return pages_df, seeds_df


def _visited(spark, root, summary):
    return CrawlStore(spark, root).read_all("visited", summary["last_batch"])


def test_variants_fetched_without_rules(spark, corpus, tmp_path_factory):
    pages, seeds = corpus
    root = tmp_path_factory.mktemp("dust_off")
    res = run_crawl(spark, pages, seeds, root, CrawlConfig(max_batches=MAX_BATCHES, parallelism=8))
    urls = {r.url for r in _visited(spark, root, res).collect()}
    assert any(u.endswith("/careers/print") for u in urls), "variant link must crawl without rules"


def test_rules_collapse_variants(spark, corpus, tmp_path_factory):
    pages, seeds = corpus
    rules = spark.createDataFrame(
        [("/print", "", 10, 3)],
        "rule_from string, rule_to string, support long, n_hosts long",
    )
    root = tmp_path_factory.mktemp("dust_on")
    res = run_crawl(
        spark, pages, seeds, root,
        CrawlConfig(max_batches=MAX_BATCHES, parallelism=8),
        dust_rules=rules,
    )
    vis = _visited(spark, root, res).collect()
    urls = [r.url for r in vis]
    # no variant is ever fetched; the canonical page is fetched exactly once per seed
    assert not any(u.endswith("/careers/print") for u in urls)
    per_careers = {}
    for r in vis:
        if r.url.endswith("/careers"):
            per_careers[(r.seed_url, r.url)] = per_careers.get((r.seed_url, r.url), 0) + 1
    assert per_careers and all(c == 1 for c in per_careers.values())
