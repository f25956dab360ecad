"""Cross-batch WARC revisit dedup in the crawl loop
(CrawlConfig.warc_dedup + sources/warc.write_warc_dedup_with_index): a
payload archived in an earlier batch never stores its body again; the
combined archive restores every capture; resume carries the digest
index."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StringType, StructField, StructType, TimestampType

from crawler_ai_spark.plans.crawl_loop import CrawlConfig, run_crawl
from crawler_ai_spark.sources.warc import read_warc, read_warc_dedup


@pytest.fixture(scope="module")
def corpus(spark, fixture_root):
    """Fixture corpus where every /careers page serves the SAME bytes as
    its homepage — the batch-2 fetches duplicate batch-1 payloads."""
    tbl = pq.read_table(fixture_root / "sf0.001" / "pages.parquet")
    pages = {}
    for u, h in zip(tbl["url"].to_pylist(), tbl["html"].to_pylist()):
        if u.endswith(".xml") or h is None:
            continue
        pages[u] = h.decode("utf-8")
    seeds = sorted({u for u in pages if u.endswith(".example/")})[:3]
    for u in list(pages):
        if u.endswith("/careers") and (u.rsplit("/", 1)[0] + "/") in pages:
            pages[u] = pages[u.rsplit("/", 1)[0] + "/"]
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
        [(s, 10, 5) for s in seeds], ["seed_url", "max_pages", "max_career_pages"]
    )
    return pages_df, seeds_df, seeds


def test_cross_batch_revisits_and_restoration(spark, corpus, tmp_path_factory):
    pages, seeds, seed_urls = corpus
    root = tmp_path_factory.mktemp("warc_dd_state")
    warc = tmp_path_factory.mktemp("warc_dd_archive")
    run_crawl(
        spark, pages, seeds, root,
        CrawlConfig(
            max_batches=3, parallelism=8,
            warc_dir=str(warc), warc_dedup=True,
        ),
    )
    # batch-1 archived the homepages; the /careers fetches in batch 2
    # carry identical payloads -> revisit records, bodies not re-stored
    back = read_warc_dedup(spark, str(warc) + "/batch-*")
    revisit_urls = {r.url for r in back.where("is_revisit").collect()}
    assert any(u.endswith("/careers") for u in revisit_urls), revisit_urls
    # every capture's body restores to the fetched page bytes
    fetched = {
        r.url: bytes(r.html)
        for r in pages.collect()
    }
    for r in back.collect():
        assert bytes(r.html) == fetched[r.url], r.url
    # plain reader sees only the full records (the originals)
    n_full = read_warc(spark, str(warc) + "/batch-*").count()
    assert n_full == back.count() - len({r.url for r in back.where("is_revisit").collect()})


def test_partial_glob_unresolved_revisits(spark, corpus, tmp_path_factory):
    """Reading one batch dir in isolation leaves revisits whose original
    lives in an earlier batch dangling: the default read FAILS loudly
    (html=NULL silently standing in for a payload corrupts downstream),
    and on_unresolved='flag' keeps the rows with the gap marked."""
    import os

    pages, seeds, _ = corpus
    root = tmp_path_factory.mktemp("warc_dd_partial")
    warc = tmp_path_factory.mktemp("warc_dd_partial_archive")
    run_crawl(
        spark, pages, seeds, root,
        CrawlConfig(
            max_batches=3, parallelism=8,
            warc_dir=str(warc), warc_dedup=True,
        ),
    )
    # last batch dir that actually archived records AND holds a revisit
    # whose original lives in an earlier dir (batch 1 is all originals;
    # a trailing batch can be empty)
    flagged = dangling = None
    for d in sorted(
        (d for d in os.listdir(warc) if d.startswith("batch-")), reverse=True
    ):
        if not any(f.endswith(".warc.gz") for f in os.listdir(warc / d)):
            continue
        cand = read_warc_dedup(spark, str(warc / d), on_unresolved="flag")
        if cand.where("unresolved_revisit").count() >= 1:
            flagged, last = cand, d
            break
    assert flagged is not None, "no batch dir with cross-batch revisits"
    dangling = flagged.where("unresolved_revisit")
    assert dangling.where(F.col("html").isNotNull()).count() == 0
    # resolved rows in the same partial read are untouched
    assert flagged.where("NOT unresolved_revisit AND html IS NULL").count() == 0
    with pytest.raises(Exception, match="unresolved revisit"):
        read_warc_dedup(spark, str(warc / last)).where("html IS NULL").count()
    # the full-glob read resolves everything — default mode passes clean
    full = read_warc_dedup(spark, str(warc) + "/batch-*")
    assert full.where(F.col("html").isNull()).count() == 0


def test_resume_carries_digest_index(spark, corpus, tmp_path_factory):
    pages, seeds, _ = corpus
    root = tmp_path_factory.mktemp("warc_dd_resume")
    warc = tmp_path_factory.mktemp("warc_dd_resume_archive")
    cfg = CrawlConfig(
        max_batches=1, parallelism=8, warc_dir=str(warc), warc_dedup=True
    )
    run_crawl(spark, pages, seeds, root, cfg)
    cfg2 = CrawlConfig(
        max_batches=3, parallelism=8, warc_dir=str(warc), warc_dedup=True
    )
    run_crawl(spark, pages, seeds, root, cfg2, resume=True)
    back = read_warc_dedup(spark, str(warc) + "/batch-*")
    # duplicates fetched after the restart still dedup against batch 1's
    # index: at least one revisit exists and all bodies restore
    assert back.where("is_revisit").count() >= 1
    assert back.where(F.col("html").isNull()).count() == 0
