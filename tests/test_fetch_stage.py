"""S1 live-fetch stage (sources/fetch.py): host co-location, politeness
pacing, parallelism invariance, transport gating, encoding fallback —
the properties the `live_fetch_stage` oracle row can't express."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_ai_spark.sources import fetch as FS


def _frontier(spark, n=200, hosts=7):
    return spark.range(n).select(
        F.concat(
            F.lit("https://h"), (F.col("id") % hosts).cast("string"),
            F.lit(".example/p/"), F.col("id").cast("string"),
        ).alias("url"),
        F.concat(F.lit("h"), (F.col("id") % hosts).cast("string"), F.lit(".example")).alias("host"),
        (F.col("id") % 3).alias("priority"),
        F.col("id").alias("discovered_seq"),
    )


def test_politeness_offsets_per_host(spark):
    rows = FS.fetch_pages(_frontier(spark), FS.FetchConfig(per_host_delay_ms=250)).collect()
    assert len(rows) == 200
    by_host: dict[str, list] = {}
    for r in rows:
        by_host.setdefault(r.host, []).append(r)
    for host, hrows in by_host.items():
        offsets = sorted(r.planned_offset_ms for r in hrows)
        # exactly one politeness slot per row, delay-spaced, no double-booking
        assert offsets == [i * 250 for i in range(len(hrows))], host
        # slot order == scheduler order (priority, then discovery sequence;
        # _frontier derives both from the url's trailing id)
        in_slot_order = sorted(hrows, key=lambda r: r.planned_offset_ms)
        keys = [
            (int(r.url.rsplit("/", 1)[1]) % 3, int(r.url.rsplit("/", 1)[1]))
            for r in in_slot_order
        ]
        assert keys == sorted(keys), host


def test_host_colocation_single_partition(spark):
    staged = FS.fetch_pages(_frontier(spark), FS.FetchConfig(host_partitions=8))
    with_pid = staged  # fetch output preserves partitioning of the stage
    # recompute partition ids on the staged input shape instead: each host
    # must map to exactly one partition for pacing to be a local loop
    f = _frontier(spark).repartition(8, F.col("host")).withColumn(
        "pid", F.spark_partition_id()
    )
    parts = f.groupBy("host").agg(F.countDistinct("pid").alias("n")).collect()
    assert all(r.n == 1 for r in parts)
    assert with_pid.count() == 200


def test_output_invariant_under_parallelism(spark):
    """The fetched table (politeness schedule included) is a pure function
    of the frontier — identical at any partition count (the politeness
    clock is per-host and hosts never split)."""
    cols = ["url", "host", "status", "html", "fetch_error",
            "body_bytes", "planned_offset_ms", "ua_idx"]
    a = {tuple(str(r[c]) for c in cols)
         for r in FS.fetch_pages(_frontier(spark), FS.FetchConfig(host_partitions=2)).collect()}
    b = {tuple(str(r[c]) for c in cols)
         for r in FS.fetch_pages(_frontier(spark), FS.FetchConfig(host_partitions=16)).collect()}
    assert a == b


def test_synthetic_transport_outcome_mix(spark):
    rows = FS.fetch_pages(_frontier(spark, n=400)).collect()
    statuses = {r.status for r in rows}
    assert 200 in statuses
    errs = {r.fetch_error for r in rows if r.fetch_error}
    assert errs, "the residue mix must produce some failures at n=400"
    for r in rows:
        if r.status == 200:
            assert r.fetch_error is None and r.html.startswith("<html>")
            assert r.body_bytes == len(r.html)
        else:
            assert r.html is None and r.fetch_error is not None
        assert 0 <= r.ua_idx < len(FS.USER_AGENTS)


def test_batch_byte_budget_flush(spark):
    """A byte budget far below one batch's body volume must split the
    emitted Arrow frames without losing rows, slots, or body bytes;
    max_body_bytes must truncate pathological bodies."""

    class BigBody:
        def __call__(self, url, headers):
            return 200, b"A" * 10_000, None

    cfg = FS.FetchConfig(
        transport=BigBody(), batch_budget_bytes=25_000,
        max_body_bytes=8_000, host_partitions=1, per_host_delay_ms=10,
    )
    rows = FS.fetch_pages(_frontier(spark, n=40, hosts=1), cfg).collect()
    assert len(rows) == 40
    assert all(r.body_bytes == 8_000 and len(r.html) == 8_000 for r in rows)
    assert sorted(r.planned_offset_ms for r in rows) == [i * 10 for i in range(40)]


def test_urllib_transport_is_network_gated():
    with pytest.raises(RuntimeError, match="allow_network"):
        FS.UrllibTransport()


def test_encoding_fallback_latin1(spark):
    """A transport returning non-utf8 bytes must fall back byte-safely
    (crawler.py:252-262), not fail the batch."""

    class Latin1Transport:
        def __call__(self, url, headers):
            return 200, "caf\xe9 r\xe9sum\xe9".encode("latin-1"), None

    f = _frontier(spark, n=5, hosts=1)
    rows = FS.fetch_pages(f, FS.FetchConfig(transport=Latin1Transport())).collect()
    assert all(r.html == "caf\xe9 r\xe9sum\xe9" for r in rows)
    # the RAW bytes ride through untouched — the decode ladder is a view,
    # not the record; byte-true downstream values come from `body`
    assert all(bytes(r.body) == "caf\xe9 r\xe9sum\xe9".encode("latin-1") for r in rows)


def test_enforce_pacing_spaces_every_host(spark):
    """enforce_pacing must pace EVERY host by wall time between its own
    dispatches. The round-3 implementation compared the logical offset to
    a partition-start clock, so every host after the first in a partition
    (hosts run serially, host-sorted) saw elapsed > all its offsets and
    fired back-to-back with zero delay."""
    import time as _t

    class ClockTransport:
        def __call__(self, url, headers):
            return 200, repr(_t.perf_counter()).encode(), None

    delay_ms = 250
    rows = FS.fetch_pages(
        _frontier(spark, n=6, hosts=2),
        FS.FetchConfig(
            transport=ClockTransport(), per_host_delay_ms=delay_ms,
            host_partitions=1, enforce_pacing=True,
        ),
    ).collect()
    by_host: dict[str, list[float]] = {}
    for r in rows:
        by_host.setdefault(r.host, []).append(float(bytes(r.body).decode()))
    assert len(by_host) == 2
    for host, times in by_host.items():
        times.sort()
        for a, b in zip(times, times[1:]):
            # sleep granularity margin; the broken path gives deltas ~0
            assert b - a >= delay_ms / 1000.0 - 0.02, (host, times)


def test_transport_exception_becomes_error_row(spark):
    class Boom:
        def __call__(self, url, headers):
            raise OSError("socket exploded")

    rows = FS.fetch_pages(_frontier(spark, n=6, hosts=2), FS.FetchConfig(transport=Boom())).collect()
    assert len(rows) == 6
    assert all(r.status is None and "transport error" in r.fetch_error for r in rows)


def test_live_mode_equals_table_mode(spark, fixture_root, tmp_path_factory):
    """The whole crawl loop through the LIVE fetch stage (TableTransport
    answering from the same pages parquet) is bit-identical to the
    pages-join mode — the live path changes the physical fetch, not one
    bit of crawl semantics."""
    from crawler_ai_spark.plans.crawl_loop import CrawlConfig, CrawlStore, run_crawl

    pages_path = str(fixture_root / "sf0.001" / "pages.parquet")
    pages = spark.read.parquet(pages_path)
    seeds_urls = sorted(
        r.url for r in pages.select("url").collect() if r.url.endswith(".example/")
    )[:6]
    seeds = spark.createDataFrame(
        [(s, 40, 8) for s in seeds_urls], ["seed_url", "max_pages", "max_career_pages"]
    )

    root_a = tmp_path_factory.mktemp("mode_table")
    a = run_crawl(spark, pages, seeds, root_a, CrawlConfig(max_batches=3, parallelism=8))
    root_b = tmp_path_factory.mktemp("mode_live")
    b = run_crawl(
        spark, pages, seeds, root_b,
        CrawlConfig(max_batches=3, parallelism=8, live_transport=FS.TableTransport(pages_path)),
    )
    assert a["last_batch"] == b["last_batch"]
    sa, sb = CrawlStore(spark, root_a), CrawlStore(spark, root_b)
    for table in ("frontier", "seen_delta", "visited", "career_pages", "job_urls", "seed_state"):
        da = sa.read_all(table, a["last_batch"])
        cols = sorted(da.columns)
        ra = {tuple(str(v) for v in r) for r in da.select(*cols).collect()}
        rb = {
            tuple(str(v) for v in r)
            for r in sb.read_all(table, b["last_batch"]).select(*cols).collect()
        }
        assert ra == rb, f"table {table} differs between live and table mode"
