"""Starvation-free scheduling (priority_aging_batches): the effective
priority priority + wait_batches // aging must eventually outrank ANY
fixed priority, and the loop must maintain the wait_batches deferral
clock (bump on defer, 0 on schedule/mint)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from crawler_ai_spark.operators.frontier import (
    apply_domain_budget,
    apply_host_budget,
    apply_ip_budget,
)
from crawler_ai_spark.plans.crawl_loop import CrawlConfig, CrawlStore, run_crawl

_FR_SCHEMA = (
    "url STRING, host STRING, priority INT, discovered_seq LONG, "
    "seed_url STRING, wait_batches INT"
)


def _contest(spark, wait):
    # one long-waiting low-priority row vs a brand-new high-priority row,
    # budget 1 — the perpetual-starvation shape
    return spark.createDataFrame(
        [
            ("https://h.example/low", "h.example", 10, 0, "s", wait),
            ("https://h.example/hot", "h.example", 80, 999, "s", 0),
        ],
        _FR_SCHEMA,
    )


def test_aging_boundary_arithmetic(spark):
    # aging=1: eff(low) = 10 + wait. At wait=70 it TIES 80 and the raw
    # priority is the next key, so hot still wins; at 71 low outranks.
    sched, _ = apply_host_budget(_contest(spark, 70), 1, aging_batches=1)
    assert [r.url for r in sched.collect()] == ["https://h.example/hot"]
    sched, _ = apply_host_budget(_contest(spark, 71), 1, aging_batches=1)
    assert [r.url for r in sched.collect()] == ["https://h.example/low"]


def test_no_aging_starves(spark):
    # without aging the same row loses forever, however long it waited
    sched, deferred = apply_host_budget(_contest(spark, 10_000), 1)
    assert [r.url for r in sched.collect()] == ["https://h.example/hot"]
    assert [r.url for r in deferred.collect()] == ["https://h.example/low"]


def test_aging_step_granularity(spark):
    # aging=4: wait 283 → eff 10 + 70 = 80 ties (hot wins);
    # wait 284 → 81 (low wins) — integer division, not a float ratio
    sched, _ = apply_host_budget(_contest(spark, 283), 1, aging_batches=4)
    assert [r.url for r in sched.collect()] == ["https://h.example/hot"]
    sched, _ = apply_host_budget(_contest(spark, 284), 1, aging_batches=4)
    assert [r.url for r in sched.collect()] == ["https://h.example/low"]


def _cross_host_contest(spark, wait):
    # DIFFERENT hosts of one registrable domain: each clears a host
    # budget of 1 alone, so only the domain/IP window arbitrates — the
    # end-to-end starvation shape the host-window aging can't fix.
    return spark.createDataFrame(
        [
            ("https://a.dom.example/low", "a.dom.example", 10, 0, "s", wait),
            ("https://b.dom.example/hot", "b.dom.example", 80, 999, "s", 0),
        ],
        _FR_SCHEMA,
    )


def test_domain_window_ages_too(spark):
    """A row that cleared the aged host budget must not starve at the
    domain window: with aging threaded through, enough accumulated wait
    outranks any fixed priority at the registrant grain as well."""
    fr = _cross_host_contest(spark, 71)
    # both survive host budget 1 (distinct hosts) regardless of aging
    hosted, _ = apply_host_budget(fr, 1, aging_batches=1)
    assert hosted.count() == 2
    # without aging the domain window starves the old row forever
    sched, _ = apply_domain_budget(hosted, 1)
    assert [r.url for r in sched.collect()] == ["https://b.dom.example/hot"]
    # with the same aged key it schedules (eff 10+71=81 > 80)
    sched, deferred = apply_domain_budget(hosted, 1, aging_batches=1)
    assert [r.url for r in sched.collect()] == ["https://a.dom.example/low"]
    assert [r.url for r in deferred.collect()] == ["https://b.dom.example/hot"]


def test_ip_window_ages_too(spark):
    """Same end-to-end guarantee at the server grain: vhosts sharing an
    IP share a budget, and the aged key must rank there as well."""
    fr = _cross_host_contest(spark, 71)
    ip_map = spark.createDataFrame(
        [("a.dom.example", "10.0.0.1"), ("b.dom.example", "10.0.0.1")],
        "host string, ip string",
    )
    sched, _ = apply_ip_budget(fr, ip_map, 1)
    assert [r.url for r in sched.collect()] == ["https://b.dom.example/hot"]
    sched, _ = apply_ip_budget(fr, ip_map, 1, aging_batches=1)
    assert [r.url for r in sched.collect()] == ["https://a.dom.example/low"]


@pytest.fixture(scope="module")
def loop_inputs(spark):
    body = (
        '<a href="/careers/role-a">a</a> <a href="/careers/role-b">b</a> '
        '<a href="/careers/role-c">c</a>'
    )
    mk = lambda title, inner: (  # noqa: E731
        "<html><head><title>" + title + "</title></head><body>"
        + inner + "</body></html>"
    ).encode()
    rows = [
        ("https://aging.example/", mk("Seed", body)),
        ("https://aging.example/careers/role-a", mk("A", "")),
        ("https://aging.example/careers/role-b", mk("B", "")),
        ("https://aging.example/careers/role-c", mk("C", "")),
    ]
    schema = StructType(
        [
            StructField("url", StringType()),
            StructField("warc_ts", TimestampType()),
            StructField("html", BinaryType()),
            StructField("lang", StringType()),
        ]
    )
    pages = spark.createDataFrame(
        [(u, None, h, None) for u, h in rows], schema
    )
    seeds = spark.createDataFrame(
        [("https://aging.example/", 50, 10)],
        ["seed_url", "max_pages", "max_career_pages"],
    )
    return pages, seeds


def test_loop_wait_clock_and_equivalence(spark, loop_inputs, tmp_path):
    """Three same-priority links through a budget of 1: the loop must
    bump wait_batches on each deferral, and (ties broken identically)
    an aging-on run must visit the exact same (url, batch) set as the
    default run."""
    pages, seeds = loop_inputs
    cfg = dict(max_batches=4, parallelism=4, host_budget_per_batch=1)

    root_a = tmp_path / "aging"
    run_crawl(
        spark, pages, seeds, root_a,
        CrawlConfig(**cfg, priority_aging_batches=5),
    )
    store = CrawlStore(spark, root_a)

    def frontier_waits(batch):
        return {
            r.url.rsplit("-", 1)[-1]: r.wait_batches
            for r in store.read("frontier", batch).collect()
        }

    # frontier(0) is the init write; batch 1 schedules the seed and
    # mints the 3 links at wait 0
    assert frontier_waits(1) == {"a": 0, "b": 0, "c": 0}
    # batch 2 schedules one, defers two (clock bumps to 1)
    w2 = frontier_waits(2)
    assert sorted(w2.values()) == [1, 1]
    # batch 3 schedules the next, the last defers again (clock 2)
    w3 = frontier_waits(3)
    assert list(w3.values()) == [2]
    # batch 4 drains it
    assert frontier_waits(4) == {}

    root_b = tmp_path / "plain"
    run_crawl(spark, pages, seeds, root_b, CrawlConfig(**cfg))
    plain = CrawlStore(spark, root_b)

    def visits(st):
        rows = st.read_all("visited", 4).select("url", "batch_id").collect()
        return sorted((r.url, r.batch_id) for r in rows)

    assert visits(store) == visits(plain)
