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


def test_zipf_hot_host_windows_at_value_grain(spark):
    """The skew guard: percentiles are computed by windowing DISTINCT
    (host, fetch_ms) counts, so a Zipf-hot host's window task is bounded
    by its latency cardinality (here 40) — not its fetch count (8000).
    Asserts both the numbers (vs a plain-Python rank oracle) and the
    plan (the window's input is the value-grain pre-aggregation)."""
    import math

    # hot host: 8000 fetches over only 40 distinct ms values (latencies
    # quantize in practice); cold hosts: a handful each
    hot = [(i * 7919) % 40 + 10 for i in range(8000)]
    spec = {"hot.example": hot}
    for c in range(20):
        spec[f"cold{c}.example"] = [(c * 13 + j) % 90 + 5 for j in range(5)]
    df = host_latency_percentiles(_fetches(spark, spec))

    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # value-grain pre-agg feeds the window: an aggregate keyed on
    # (host, fetch_ms) exists, and no per-row ranking window remains
    assert "fetch_ms" in plan and "HashAggregate" in plan
    assert "row_number" not in plan

    got = {r.host: r for r in df.collect()}
    for host, lats in spec.items():
        s = sorted(lats)
        assert got[host].n_fetches == len(lats)
        assert got[host].p50_ms == s[math.ceil(0.5 * len(s)) - 1]
        assert got[host].p95_ms == s[math.ceil(0.95 * len(s)) - 1]


def test_per_batch_grain(spark):
    """grain_cols threads a batch key through every statistic: an
    all-history store gets bounded (host, batch) groups and per-batch
    numbers identical to filtering each batch separately."""
    rows = [("h", f"u{i}", 100 + i, i % 2) for i in range(10)]
    df = spark.createDataFrame(
        rows, "host string, url string, fetch_ms long, batch_id int"
    )
    out = {
        (r.host, r.batch_id): r
        for r in host_latency_percentiles(df, grain_cols=("batch_id",)).collect()
    }
    assert out[("h", 0)].n_fetches == 5 and out[("h", 1)].n_fetches == 5
    # batch 0 = 100,102,104,106,108 → p50 rank 3 = 104; batch 1 → 105
    assert out[("h", 0)].p50_ms == 104 and out[("h", 1)].p50_ms == 105
