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
    grain_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Exact discrete latency percentiles per host — the ops view behind
    politeness tuning: AutoThrottle reacts to the MEAN, but a host whose
    p95 is 10x its p50 (overloaded origin, flaky edge) deserves a wider
    delay even when the mean looks fine.

    Exact and deterministic by construction: percentile p = the value at
    1-based rank ceil(p * n) of the sorted latency multiset — no
    t-digest/approx sketch whose merge order could shift a cross-engine
    bit. Rank statistics depend only on the value MULTISET, so the plan
    pre-aggregates to (host, fetch_ms) counts (map-side partial combine)
    and windows over DISTINCT latencies with a running count: the hot
    host's window task is bounded by its latency cardinality (ms-grain
    ints — thousands), not its fetch count (billions under Zipf skew),
    so one hot host cannot serialize the stage.

    ``grain_cols`` partitions every statistic by extra columns (e.g. a
    batch_id) — the per-batch grain an all-history store needs so no
    (host, batch) group grows without bound.

    fetches(host, url, fetch_ms[, *grain_cols]) -> (host[, *grain_cols],
    n_fetches, p50_ms, p95_ms, ...) one column per percentile."""
    keys = ["host", *grain_cols]
    counts = fetches.groupBy(*keys, "fetch_ms").agg(F.count(F.lit(1)).alias("_c"))
    w = Window.partitionBy(*keys).orderBy(F.col("fetch_ms").asc())
    cum = counts.withColumn("_cum", F.sum("_c").over(w))
    n = fetches.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_fetches"))
    out = n
    for p in percentiles:
        col = f"p{int(round(p * 100))}_ms"
        # value at rank ceil(p*n) = smallest latency whose running count
        # reaches the rank
        tgt = (
            cum.join(n, keys)
            .where(F.col("_cum") >= F.ceil(F.lit(p) * F.col("n_fetches")))
            .groupBy(*keys)
            .agg(F.min("fetch_ms").alias(col))
        )
        out = out.join(tgt, keys)
    return out


def _group_lower_median(
    df: DataFrame, keys: list[str], val_col: str, out_col: str
) -> DataFrame:
    """Exact lower median per key group at the DISTINCT-VALUE grain:
    pre-aggregate to (keys, value) counts, running count over distinct
    values, median = smallest value whose running count reaches
    ceil(n/2). Identical to ranking every row (rank statistics depend
    only on the value multiset) but the window task is bounded by value
    cardinality, not group row count."""
    counts = df.groupBy(*keys, val_col).agg(F.count(F.lit(1)).alias("_c"))
    w = Window.partitionBy(*keys).orderBy(F.col(val_col).asc())
    cum = counts.withColumn("_cum", F.sum("_c").over(w)).withColumn(
        "_n", F.sum("_c").over(Window.partitionBy(*keys))
    )
    return (
        cum.where(F.col("_cum") >= F.ceil(F.col("_n") / 2))
        .groupBy(*keys)
        .agg(F.min(val_col).alias(out_col))
    )


def size_anomalies(
    fetches: DataFrame,
    threshold: float = 3.5,
    grain_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Robust per-host response-size outliers: modified z-score over the
    median absolute deviation (|x - median| / MAD, scaled 0.6745 — the
    Iglewicz-Hoaglin rule). Catches what averages hide: a host whose
    pages run ~40 KB serving a 300-byte "OK" error page (soft-404's
    size-side complement) or a 10 MB tarpit response. Median and MAD are
    EXACT rank statistics (lower-median of the sorted multiset — same
    convention both engines), so flags are deterministic.

    Both medians run at the distinct-value grain (_group_lower_median):
    the hot host's window task is bounded by how many DISTINCT sizes it
    serves, not how many fetches it got, so Zipf host skew can't
    serialize the stage. ``grain_cols`` adds e.g. a batch_id to every
    statistic's key for bounded per-batch groups over all-history
    stores.

    fetches(host, url, n_bytes[, *grain_cols]) -> per-fetch rows +
    (host_median, host_mad, mod_z rounded 6, anomalous). Hosts with
    MAD = 0 (all sizes identical) flag only exact deviants (mod_z =
    infinity is expressed as the `anomalous` bool; mod_z NULL there)."""
    keys = ["host", *grain_cols]
    med = _group_lower_median(
        fetches.select(*keys, "n_bytes"), keys, "n_bytes", "host_median"
    )
    dev = fetches.join(med, keys).withColumn(
        "_adev", F.abs(F.col("n_bytes") - F.col("host_median"))
    )
    mad = _group_lower_median(
        dev.select(*keys, "_adev"), keys, "_adev", "host_mad"
    )
    out = dev.join(mad, keys).select(
        *keys,
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
