"""AutoThrottle — latency-feedback politeness (W2's adaptive half).

The reference enables Scrapy's AutoThrottle extension on every crawl
(`crawler_ai/settings.py:55-59`: START_DELAY=1, MAX_DELAY=10,
TARGET_CONCURRENCY=2.0; tightened per-spider at
`app/services/scrapy_career_spider.py:98-103`: MAX_DELAY=3,
TARGET_CONCURRENCY=1.0). The published algorithm (Scrapy docs,
"AutoThrottle extension") adjusts a per-host download delay from
observed response latency:

    target_delay = latency / target_concurrency
    next_delay   = (prev_delay + target_delay) / 2
    never decrease the delay off a batch that saw errors
    clamp to [min_delay, max_delay]

This module is the batch-grain analogue: one update per host per crawl
batch, folding the batch's response latencies through the same rule. The
static half of W2 (k URLs/host/batch ≙ delay·rate) stays in
``apply_host_budget``; this derives NEXT batch's per-host budget from
THIS batch's measured `fetch_ms` (sources/fetch.py emits it per row).

Scale shape: one host-grain aggregate (map-side combined — O(hosts)
rows out of O(urls) in) plus one host-grain outer join against the
previous delay table. No frontier-scale shuffle; the result broadcasts
into ``apply_host_budget`` like every other budget source.

All arithmetic is integer milliseconds (and milli-units for the target
concurrency), so the update is bit-identical across engines — the same
convention as quality_host_budgets' integer-micro mass.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@dataclass(frozen=True)
class AutoThrottleConfig:
    # spider-tightened reference values (scrapy_career_spider.py:98-103);
    # min_delay is DOWNLOAD_DELAY=1 (settings.py:15) — Scrapy never
    # throttles below the configured download delay.
    start_delay_ms: int = 1000
    min_delay_ms: int = 1000
    max_delay_ms: int = 3000
    target_concurrency_milli: int = 1000  # 1.0 ≙ 1000


def autothrottle_delays(
    responses: DataFrame,
    prev_delays: DataFrame | None = None,
    cfg: AutoThrottleConfig = AutoThrottleConfig(),
) -> DataFrame:
    """One AutoThrottle update per host from a batch of responses.

    ``responses``: (host, fetch_ms LONG, ok BOOLEAN) — one row per fetch
    attempt; ``ok`` is the 2xx-success predicate (Scrapy only lets a
    non-200 response KEEP the delay, never lower it).
    ``prev_delays``: (host, delay_ms LONG) from the previous batch, or
    None/absent host → start_delay_ms.

    Returns (host, delay_ms LONG, n_ok LONG, n_err LONG) for every host
    present in ``responses`` or ``prev_delays`` (carried hosts keep their
    clamped delay so a host that skips a batch doesn't reset).
    """
    agg = responses.groupBy("host").agg(
        F.sum(F.when(F.col("ok"), F.col("fetch_ms")).otherwise(F.lit(0))).alias(
            "_sum_ok_ms"
        ),
        F.sum(F.col("ok").cast("long")).alias("n_ok"),
        F.sum((~F.col("ok")).cast("long")).alias("n_err"),
    )
    if prev_delays is not None:
        agg = agg.join(
            prev_delays.select("host", F.col("delay_ms").alias("_prev_raw")),
            "host",
            "full_outer",
        )
    else:
        agg = agg.withColumn("_prev_raw", F.lit(None).cast("long"))

    prev_ms = F.coalesce(F.col("_prev_raw"), F.lit(cfg.start_delay_ms))
    n_ok = F.coalesce(F.col("n_ok"), F.lit(0))
    n_err = F.coalesce(F.col("n_err"), F.lit(0))
    # target = mean success latency / concurrency, in integer ms:
    #   (sum_ms * 1000) div (n_ok * conc_milli)
    target_ms = F.expr(
        f"(_sum_ok_ms * 1000) div (n_ok * {cfg.target_concurrency_milli})"
    )
    raw_ms = F.when(n_ok > 0, F.expr("(_prev_ms + _target_ms) div 2")).otherwise(
        prev_ms
    )
    staged = (
        agg.withColumn("_prev_ms", prev_ms)
        .withColumn("_target_ms", F.when(n_ok > 0, target_ms))
        .withColumn("_raw_ms", raw_ms)
    )
    # error rule: a batch with any failure may hold or raise, never lower
    adj = F.when(
        (n_err > 0) & (F.col("_raw_ms") < F.col("_prev_ms")), F.col("_prev_ms")
    ).otherwise(F.col("_raw_ms"))
    clamped = F.least(
        F.greatest(adj, F.lit(cfg.min_delay_ms).cast("long")),
        F.lit(cfg.max_delay_ms).cast("long"),
    )
    return staged.select(
        "host",
        clamped.alias("delay_ms"),
        n_ok.alias("n_ok"),
        n_err.alias("n_err"),
    )


def budget_from_delay(delays: DataFrame, batch_interval_s: int) -> DataFrame:
    """(host, host_budget INT) = per-batch fetch cap implied by a per-host
    delay: interval ÷ delay, floored, never below 1 — the same arithmetic
    _crawl_delay_budgets applies to robots Crawl-delay, in integer ms."""
    return delays.select(
        "host",
        F.greatest(
            F.lit(1).cast("long"),
            F.expr(f"({batch_interval_s} * 1000) div delay_ms"),
        )
        .cast("int")
        .alias("host_budget"),
    )


def host_latency_percentiles(
    fetches: DataFrame,
    percentiles: tuple[float, ...] = (0.5, 0.95),
) -> DataFrame:
    """Exact discrete latency percentiles per host — the ops view behind
    politeness tuning: AutoThrottle reacts to the MEAN, but a host whose
    p95 is 10x its p50 (overloaded origin, flaky edge) deserves a wider
    delay even when the mean looks fine.

    Exact and deterministic by construction: percentile p = the value at
    1-based rank ceil(p * n) in (latency, url)-sorted order — no
    t-digest/approx sketch whose merge order could shift a cross-engine
    bit. One window over each host's fetches; at 10^10-fetch scale run
    it per batch or windowed, not over all history.

    fetches(host, url, fetch_ms) -> (host, n_fetches, p50_ms, p95_ms,
    ...) with one column per requested percentile."""
    w = Window.partitionBy("host").orderBy(F.col("fetch_ms").asc(), F.col("url").asc())
    ranked = fetches.select("host", "url", "fetch_ms").withColumn(
        "_rk", F.row_number().over(w)
    )
    n = fetches.groupBy("host").agg(F.count(F.lit(1)).alias("n_fetches"))
    out = n
    for p in percentiles:
        col = f"p{int(round(p * 100))}_ms"
        tgt = ranked.join(n, "host").where(
            F.col("_rk") == F.ceil(F.lit(p) * F.col("n_fetches"))
        ).select("host", F.col("fetch_ms").alias(col))
        out = out.join(tgt, "host")
    return out


def size_anomalies(
    fetches: DataFrame,
    threshold: float = 3.5,
) -> DataFrame:
    """Robust per-host response-size outliers: modified z-score over the
    median absolute deviation (|x - median| / MAD, scaled 0.6745 — the
    Iglewicz-Hoaglin rule). Catches what averages hide: a host whose
    pages run ~40 KB serving a 300-byte "OK" error page (soft-404's
    size-side complement) or a 10 MB tarpit response. Median and MAD are
    EXACT rank statistics (lower-median of the sorted multiset — same
    convention both engines), so flags are deterministic.

    fetches(host, url, n_bytes) -> per-fetch rows + (host_median,
    host_mad, mod_z rounded 6, anomalous). Hosts with MAD = 0 (all
    sizes identical) flag only exact deviants (mod_z = infinity is
    expressed as the `anomalous` bool; mod_z NULL there)."""
    w = Window.partitionBy("host").orderBy(F.col("n_bytes").asc(), F.col("url").asc())
    n = Window.partitionBy("host")
    ranked = fetches.select("host", "url", "n_bytes").withColumn(
        "_rk", F.row_number().over(w)
    ).withColumn("_n", F.count(F.lit(1)).over(n))
    med = ranked.where(
        F.col("_rk") == F.ceil(F.col("_n") / 2)  # lower median
    ).select("host", F.col("n_bytes").alias("host_median"))
    dev = fetches.join(med, "host").withColumn(
        "_adev", F.abs(F.col("n_bytes") - F.col("host_median"))
    )
    wd = Window.partitionBy("host").orderBy(F.col("_adev").asc(), F.col("url").asc())
    dd = dev.withColumn("_dk", F.row_number().over(wd)).withColumn(
        "_n", F.count(F.lit(1)).over(n)
    )
    mad = dd.where(F.col("_dk") == F.ceil(F.col("_n") / 2)).select(
        "host", F.col("_adev").alias("host_mad")
    )
    out = dev.join(mad, "host").select(
        "host",
        "url",
        "n_bytes",
        "host_median",
        "host_mad",
        F.when(
            F.col("host_mad") > 0,
            F.round(
                F.lit(0.6745) * F.col("_adev") / F.col("host_mad"), 6
            ),
        ).alias("mod_z"),
    )
    return out.withColumn(
        "anomalous",
        F.when(F.col("host_mad") > 0, F.col("mod_z") > threshold).otherwise(
            F.col("n_bytes") != F.col("host_median")
        ),
    )
