"""Exact latency percentiles (operators/autothrottle.py:
host_latency_percentiles). Cross-engine identity is pinned by the
catalog's host_latency_percentiles oracle row."""

from __future__ import annotations

from crawler_ai_spark.operators.autothrottle import host_latency_percentiles


def _fetches(spark, spec):
    rows = []
    for host, lats in spec.items():
        rows += [(host, f"https://{host}/p{i}", ms) for i, ms in enumerate(lats)]
    return spark.createDataFrame(rows, "host string, url string, fetch_ms long")


def test_exact_ranks(spark):
    # 20 fetches 1..20: p50 = rank ceil(10) = 10, p95 = rank 19
    out = {
        r.host: r
        for r in host_latency_percentiles(
            _fetches(spark, {"a": list(range(1, 21)), "b": [7]})
        ).collect()
    }
    assert out["a"].n_fetches == 20
    assert out["a"].p50_ms == 10 and out["a"].p95_ms == 19
    # single fetch: every percentile is that fetch
    assert out["b"].p50_ms == 7 and out["b"].p95_ms == 7


def test_heavy_tail_separates(spark):
    lats = [100] * 18 + [9000, 9500]
    out = host_latency_percentiles(_fetches(spark, {"h": lats})).collect()[0]
    assert out.p50_ms == 100 and out.p95_ms == 9000


def test_custom_percentiles(spark):
    out = host_latency_percentiles(
        _fetches(spark, {"h": list(range(1, 11))}), percentiles=(0.1, 1.0)
    ).collect()[0]
    assert out.p10_ms == 1 and out.p100_ms == 10
