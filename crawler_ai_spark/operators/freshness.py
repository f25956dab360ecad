"""Change-rate estimation for refresh scheduling (Cho & Garcia-Molina,
"Estimating Frequency of Change", ACM TOIT 2003): from n revisits of a
URL at interval Δ with X observed changes, the bias-corrected Poisson
rate estimate is

    λ̂ = -ln((n - X + 0.5) / (n + 0.5)) / Δ

(the naive -ln(1 - X/n)/Δ is inconsistent and blows up at X = n; the
+0.5 correction keeps it finite and near-unbiased — the paper's
recommended estimator). The derived revisit interval is the change
HALF-LIFE ln(2)/λ̂ — revisit when the page has a 50% chance of having
changed — clamped to a [min, max] band so cold pages still get probed
and hot pages don't starve the budget.

This is the principled offline complement to the loop's online
geometric policy (CrawlConfig.adaptive_recrawl doubles/halves per
observation): run it over the visited history between crawls and feed
the intervals back as per-URL TTLs.

Scale shape: one groupBy url over the visit history (map-side combined
counts), then row-local math — no joins, no windows."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MIN_REVISIT_S = 3600          # probe at least hourly band floor
MAX_REVISIT_S = 30 * 86400    # and at most monthly


def estimate_change_rate(
    history: DataFrame,
    interval_s: float,
    min_revisit_s: int = MIN_REVISIT_S,
    max_revisit_s: int = MAX_REVISIT_S,
) -> DataFrame:
    """history(url, changed boolean) — one row per completed revisit at
    ~interval_s spacing -> (url, n_visits, n_changed, lambda_hat,
    revisit_s). X = 0 gives λ̂ = exactly 0 (no change ever observed) —
    those URLs park at the max interval instead of dividing the
    half-life by zero."""
    agg = history.groupBy("url").agg(
        F.count("*").cast("long").alias("n_visits"),
        F.sum(F.col("changed").cast("long")).cast("long").alias("n_changed"),
    )
    lam = -F.log(
        (F.col("n_visits") - F.col("n_changed") + F.lit(0.5))
        / (F.col("n_visits") + F.lit(0.5))
    ) / F.lit(float(interval_s))
    # λ̂ is quantized to 12 dp (+ 0.0 collapses IEEE -0.0 from -ln(1))
    # BEFORE the half-life division: libm ln() differs across engines in
    # the last ulp, and an unrounded quotient can straddle the integer
    # floor boundary (observed: 86400·ln2/ln17 within one ulp of 21138).
    # Dividing identical rounded doubles makes revisit_s reproducible.
    agg = agg.withColumn("lambda_hat", F.round(lam, 12) + F.lit(0.0))
    # guard on the ROUNDED λ̂, not just n_changed: at very low change
    # rates (λ < 5e-13, ~1 change over >1e12 visit-seconds) the 12-dp
    # quantization rounds λ̂ to exactly 0 with n_changed > 0 — dividing
    # would throw DIVIDE_BY_ZERO under ANSI mode (or, non-ANSI, yield
    # NULL and invert the clamp to the MIN interval for the coldest
    # pages). λ̂ == 0 means "effectively never changes": max interval.
    half_life = F.when(
        (F.col("n_changed") == 0) | (F.col("lambda_hat") <= 0),
        F.lit(float(max_revisit_s)),
    ).otherwise(F.lit(float(math.log(2.0))) / F.col("lambda_hat"))
    return agg.select(
        "url",
        "n_visits",
        "n_changed",
        "lambda_hat",
        # explicit floor: Spark's double->long cast truncates but
        # DuckDB's CAST rounds to nearest — floor() means the same thing
        # in both engines
        F.floor(
            F.least(
                F.lit(float(max_revisit_s)),
                F.greatest(F.lit(float(min_revisit_s)), half_life),
            )
        )
        .cast("long")
        .alias("revisit_s"),
    )
