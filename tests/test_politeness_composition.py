"""Politeness composition: the per-host batch cap is the POINTWISE
MINIMUM of every active budget source. The loop merges five sources
tightest-wins before the host window —

  1. static  — CrawlConfig.host_budget_per_batch (global cap, applied
               inside apply_host_budget via least())
  2. robots  — Crawl-delay d → interval/d  (plans/crawl_loop.py:
               _crawl_delay_budgets)
  3. rank    — rank-proportional allocation (operators/hostrank.py:
               budget_from_rank)
  4. quality — quality-feedback allocation (same (host, host_budget)
               contract; queries/thirdwave.py: quality_host_budgets)
  5. adaptive— AutoThrottle learned delay → interval/delay (operators/
               autothrottle.py: budget_from_delay); its continuous-time
               twin is the token bucket (thirdwave.py:
               token_bucket_schedule), same delay→cap arithmetic

— each suite pins its own source; THIS test pins the composition
semantics end-to-end so a sixth source can't silently change the merge:
with all five active, every host schedules exactly
min(static, robots, rank, quality, adaptive) URLs, missing entries are
neutral (a host absent from a source is capped only by the others),
and the merge is order-independent."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from crawler_ai_spark.operators.autothrottle import budget_from_delay
from crawler_ai_spark.operators.frontier import apply_host_budget
from crawler_ai_spark.operators.hostrank import budget_from_rank
from crawler_ai_spark.plans.crawl_loop import (
    _crawl_delay_budgets,
    _merge_host_budgets,
)

_INTERVAL_S = 60
_STATIC = 6

# per-host source inputs, chosen so a DIFFERENT source is the tightest
# for each host (and None = the host is absent from that source):
#   host     crawl_delay_s  rank    quality_budget  at_delay_ms   caps
#   a.ex     15 → 4         .05→5   3               30000 → 2     min=2 (adaptive)
#   b.ex     30 → 2         .08→8   7               12000 → 5     min=2 (robots)
#   c.ex     None           .01→1   9               6000  → 10    min=1 (rank)
#   d.ex     6  → 10        .09→9   3               20000 → 3     min=3 (quality, tied adaptive)
#   e.ex     2  → 30        .90→32  31              1000  → 60    min=6 (static)
#   f.ex     None           None    None            None          min=6 (static only)
_HOSTS = {
    "a.ex": dict(delay=15.0, rank=0.05, quality=3, at_ms=30000),
    "b.ex": dict(delay=30.0, rank=0.08, quality=7, at_ms=12000),
    "c.ex": dict(delay=None, rank=0.01, quality=9, at_ms=6000),
    "d.ex": dict(delay=6.0, rank=0.09, quality=3, at_ms=20000),
    "e.ex": dict(delay=2.0, rank=0.90, quality=31, at_ms=1000),
    "f.ex": dict(delay=None, rank=None, quality=None, at_ms=None),
}
_RANK_TOTAL = 100  # budget_from_rank: floor(100 * rank), clamp [1, 32]


def _expected_caps():
    out = {}
    for h, s in _HOSTS.items():
        caps = [_STATIC]
        if s["delay"] is not None:
            caps.append(max(1, int(_INTERVAL_S // s["delay"])))
        if s["rank"] is not None:
            caps.append(min(32, max(1, int(_RANK_TOTAL * s["rank"]))))
        if s["quality"] is not None:
            caps.append(s["quality"])
        if s["at_ms"] is not None:
            caps.append(max(1, (_INTERVAL_S * 1000) // s["at_ms"]))
        out[h] = min(caps)
    return out


def _sources(spark):
    rules = spark.createDataFrame(
        [(h, float(s["delay"])) for h, s in _HOSTS.items() if s["delay"]],
        "host string, crawl_delay_s double",
    )
    ranks = spark.createDataFrame(
        [(h, float(s["rank"])) for h, s in _HOSTS.items() if s["rank"]],
        "host string, rank double",
    )
    quality = spark.createDataFrame(
        [(h, s["quality"]) for h, s in _HOSTS.items() if s["quality"]],
        "host string, host_budget int",
    )
    at_state = spark.createDataFrame(
        [(h, s["at_ms"]) for h, s in _HOSTS.items() if s["at_ms"]],
        "host string, delay_ms long",
    )
    return [
        _crawl_delay_budgets(rules, _INTERVAL_S),
        budget_from_rank(ranks, _RANK_TOTAL, min_budget=1, max_budget=32),
        quality,
        budget_from_delay(at_state, _INTERVAL_S),
    ]


def _frontier(spark, per_host=40):
    rows = [
        (f"https://{h}/p{i:03d}", h, 50, i, "s", 0)
        for h in _HOSTS
        for i in range(per_host)
    ]
    return spark.createDataFrame(
        rows,
        "url string, host string, priority int, discovered_seq long, "
        "seed_url string, wait_batches int",
    )


def test_five_sources_merge_to_pairwise_minimum(spark):
    merged = None
    for src in _sources(spark):
        merged = _merge_host_budgets(merged, src)
    scheduled, deferred = apply_host_budget(
        _frontier(spark), _STATIC, host_budgets=merged
    )
    got = {
        r.host: r.n
        for r in scheduled.groupBy("host").agg(F.count("*").alias("n")).collect()
    }
    assert got == _expected_caps()
    # defer-not-drop across the whole composition
    assert scheduled.count() + deferred.count() == 40 * len(_HOSTS)


def test_merge_is_order_independent(spark):
    srcs = _sources(spark)
    baseline = None
    for perm in itertools.permutations(range(len(srcs))):
        merged = None
        for i in perm:
            merged = _merge_host_budgets(merged, srcs[i])
        caps = {r.host: r.host_budget for r in merged.collect()}
        if baseline is None:
            baseline = caps
        else:
            assert caps == baseline, f"merge order {perm} changed the caps"


def test_missing_entries_are_neutral(spark):
    # f.ex appears in NO source: the merged table has no row for it, and
    # apply_host_budget leaves absent hosts at the static cap alone
    merged = None
    for src in _sources(spark):
        merged = _merge_host_budgets(merged, src)
    assert merged.where(F.col("host") == "f.ex").count() == 0
    scheduled, _ = apply_host_budget(_frontier(spark), _STATIC, host_budgets=merged)
    assert scheduled.where(F.col("host") == "f.ex").count() == _STATIC
