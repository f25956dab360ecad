"""UCB host allocation (operators/hostrank.py: ucb_host_scores):
explore/exploit ordering properties and the budget composition.
Cross-engine identity is pinned by the catalog's ucb_host_allocation
oracle row."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from crawler_ai_spark.operators.hostrank import budget_from_rank, ucb_host_scores


def _hist(spark, spec):
    rows = []
    for host, (n, wins) in spec.items():
        rows += [(host, i < wins) for i in range(n)]
    return spark.createDataFrame(rows, "host string, success boolean")


def test_formula_and_exploration_bonus(spark):
    out = {
        r.host: r
        for r in ucb_host_scores(
            _hist(spark, {"proven": (100, 60), "fresh": (2, 1), "dud": (100, 1)})
        ).collect()
    }
    n_total = 202.0
    c = 1.4142135623730951
    for h, (n, w) in {"proven": (100, 60), "fresh": (2, 1), "dud": (100, 1)}.items():
        want = round(w / n + c * math.sqrt(math.log(n_total) / n), 9)
        assert out[h].score == pytest.approx(want, abs=1e-12)
    # the barely-tried host outranks the proven one (exploration bonus),
    # the heavily-tried dud ranks last (bonus exhausted, rate low)
    assert out["fresh"].score > out["proven"].score > out["dud"].score
    # normalized ranks sum to 1
    assert sum(r.rank for r in out.values()) == pytest.approx(1.0, abs=1e-12)


def test_budget_composition(spark):
    scores = ucb_host_scores(
        _hist(spark, {"a": (50, 40), "b": (50, 5), "c": (3, 1)})
    ).select("host", "rank")
    budgets = {r.host: r.host_budget for r in budget_from_rank(scores, 90).collect()}
    assert budgets["a"] > budgets["b"] >= 1  # exploit
    assert budgets["c"] >= budgets["b"]      # explore


def test_deterministic(spark):
    h = _hist(spark, {f"h{i}": (10 + i, i) for i in range(12)})
    a = sorted(map(tuple, ucb_host_scores(h).collect()))
    b = sorted(map(tuple, ucb_host_scores(h).collect()))
    assert a == b
