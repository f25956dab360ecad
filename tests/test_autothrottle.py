"""W2 adaptive — AutoThrottle latency feedback: the Scrapy update rule at
batch grain (operators/autothrottle.py), its budget derivation, and the
end-to-end loop behavior (a slow host's learned delay tightens its
per-batch budget; state survives resume)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from crawler_ai_spark.operators.autothrottle import (
    AutoThrottleConfig,
    autothrottle_delays,
    budget_from_delay,
)
from crawler_ai_spark.sources import fetch as FS

CFG = AutoThrottleConfig(
    start_delay_ms=100, min_delay_ms=10, max_delay_ms=400,
    target_concurrency_milli=1000,
)


def _resp(spark, rows):
    return spark.createDataFrame(rows, "host string, fetch_ms long, ok boolean")


def test_update_math_and_clamps(spark):
    rows = _resp(
        spark,
        [
            ("fast", 4, True), ("fast", 6, True),          # mean 5 → target 5
            ("slow", 900, True),                            # target 900
            ("mid", 260, True), ("mid", 300, True),         # mean 280
        ],
    )
    out = {r.host: r for r in autothrottle_delays(rows, None, CFG).collect()}
    # fast: raw (100+5)/2 = 52 — above min, no clamp
    assert out["fast"].delay_ms == 52
    # slow: raw (100+900)/2 = 500 → clamped to max 400
    assert out["slow"].delay_ms == 400
    # mid: (100+280)/2 = 190
    assert out["mid"].delay_ms == 190
    assert out["fast"].n_ok == 2 and out["fast"].n_err == 0


def test_error_batch_never_lowers(spark):
    prev = spark.createDataFrame([("h", 300)], "host string, delay_ms long")
    # successes alone would lower: target 100 → raw (300+100)/2 = 200;
    # one failure in the batch holds the delay at 300 (Scrapy's non-200 rule)
    held = autothrottle_delays(
        _resp(spark, [("h", 100, True), ("h", 0, False)]), prev, CFG
    ).collect()[0]
    assert held.delay_ms == 300 and held.n_err == 1
    # without the failure it does lower
    lowered = autothrottle_delays(
        _resp(spark, [("h", 100, True)]), prev, CFG
    ).collect()[0]
    assert lowered.delay_ms == 200
    # errors may still RAISE the delay: target 900 → raw 600 → max-clamp 400
    raised = autothrottle_delays(
        _resp(spark, [("h", 900, True), ("h", 0, False)]), prev, CFG
    ).collect()[0]
    assert raised.delay_ms == 400


def test_carried_host_keeps_delay(spark):
    prev = spark.createDataFrame(
        [("seen", 250), ("idle", 180)], "host string, delay_ms long"
    )
    out = {
        r.host: r.delay_ms
        for r in autothrottle_delays(
            _resp(spark, [("seen", 250, True)]), prev, CFG
        ).collect()
    }
    # 'idle' sent nothing this batch: carried, not reset to start_delay
    assert out["idle"] == 180
    assert out["seen"] == 250  # (250 + 250/1.0)/2


def test_all_error_batch_holds_previous(spark):
    prev = spark.createDataFrame([("h", 220)], "host string, delay_ms long")
    out = autothrottle_delays(
        _resp(spark, [("h", 0, False), ("h", 0, False)]), prev, CFG
    ).collect()[0]
    assert out.delay_ms == 220 and out.n_ok == 0 and out.n_err == 2


def test_budget_from_delay_floor_and_min(spark):
    delays = spark.createDataFrame(
        [("a", 200), ("b", 7), ("c", 5000)], "host string, delay_ms long"
    )
    out = {r.host: r.host_budget for r in budget_from_delay(delays, 1).collect()}
    assert out == {"a": 5, "b": 142, "c": 1}  # 1000//200, 1000//7, max(1, 1000//5000)


def _slow_host_transport(pages_path: str, slow_host: str, sleep_s: float):
    """TableTransport wrapper that sleeps before answering one host —
    deterministic content, measurable latency. A closure (not a class)
    so cloudpickle ships it by value to executors."""
    inner = FS.TableTransport(pages_path)

    def transport(url, headers):
        if slow_host in url:
            time.sleep(sleep_s)
        return inner(url, headers)

    return transport


def test_autothrottle_tightens_slow_host_in_loop(spark, fixture_root, tmp_path_factory):
    """End to end: a host that answers in ~300 ms (vs ~0 for the rest)
    learns a higher delay, which caps its per-batch fetches from batch 2
    on — and the learned state persists per batch for resume."""
    from crawler_ai_spark.plans.crawl_loop import CrawlConfig, CrawlStore, run_crawl

    pages_path = str(fixture_root / "sf0.001" / "pages.parquet")
    pages = spark.read.parquet(pages_path).where(~F.col("url").endswith(".xml"))
    seeds_urls = sorted(
        r.url for r in pages.select("url").collect() if r.url.endswith(".example/")
    )[:3]
    seeds = spark.createDataFrame(
        [(s, 50, 10) for s in seeds_urls], ["seed_url", "max_pages", "max_career_pages"]
    )
    slow_host = seeds_urls[0].split("//")[1].rstrip("/")

    root = tmp_path_factory.mktemp("autothrottle")
    res = run_crawl(
        spark, pages, seeds, root,
        CrawlConfig(
            max_batches=4, parallelism=8,
            live_transport=_slow_host_transport(pages_path, slow_host, 0.3),
            autothrottle=CFG,
            batch_interval_seconds=1,
        ),
    )
    store = CrawlStore(spark, root)
    delays = {
        r.host: r.delay_ms
        for r in store.read("at_delays", res["last_batch"]).collect()
    }
    assert slow_host in delays
    slow = delays.pop(slow_host)
    fast = [d for d in delays.values() if d is not None]
    # slow host: target ≈ 300 ms → delay ≥ 150 after the first update;
    # fast hosts converge toward min (raw (100+ε)/2 ≈ 50)
    assert slow >= 150, (slow, delays)
    assert fast and all(d <= 80 for d in fast), delays
    assert all(CFG.min_delay_ms <= d <= CFG.max_delay_ms for d in [slow, *fast])

    # the learned delay must CAP the slow host's later batches:
    # budget = 1000 // delay ≤ 6 for delay ≥ 150
    vis = store.read_all("visited", res["last_batch"])
    per_batch = {
        r.batch_id: r.n
        for r in vis.where(F.col("url").startswith(f"https://{slow_host}/"))
        .groupBy("batch_id").agg(F.count("*").alias("n")).collect()
    }
    late = {b: n for b, n in per_batch.items() if b >= 2}
    assert late, per_batch
    assert all(n <= 6 for n in late.values()), per_batch
