"""OPIC (operators/hostrank.py: opic): cash conservation, history
accounting, agreement with a pure-Python twin, and the budget
composition. Cross-engine float identity is pinned by the catalog's
opic_host_importance oracle row."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_ai_spark.operators.hostrank import budget_from_rank, opic


def _graph(spark):
    # 4 hosts: 0 -> 1,2 ; 1 -> 2 ; 2 -> 0 ; 3 -> 0 (3 receives nothing)
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (2, 0), (3, 0)], "src long, dst long"
    )
    hosts = spark.createDataFrame([(i,) for i in range(4)], "host long")
    return edges, hosts


def _py_opic(edges, n, iters):
    """Plain-Python twin of the synchronous recurrence."""
    from collections import defaultdict

    out = defaultdict(list)
    for s, d in edges:
        out[s].append(d)
    cash = {i: 1.0 / n for i in range(n)}
    hist = {i: 0.0 for i in range(n)}
    for _ in range(iters):
        nxt = {i: 0.0 for i in range(n)}
        for i in range(n):
            hist[i] += cash[i]
            for d in sorted(out[i]):
                nxt[d] += cash[i] / len(out[i])
        cash = nxt
    return {i: (hist[i] + cash[i]) / (iters + 1) for i in range(n)}


def test_invariants_and_python_twin(spark):
    edges, hosts = _graph(spark)
    rows = {r.host: r for r in opic(edges, hosts, n_hosts=4, iterations=3).collect()}
    # conservation: no dangling host, so total cash stays 1 and history
    # banks exactly one unit per step
    assert sum(r.cash for r in rows.values()) == pytest.approx(1.0, abs=1e-12)
    assert sum(r.history for r in rows.values()) == pytest.approx(3.0, abs=1e-12)
    assert sum(r.importance for r in rows.values()) == pytest.approx(1.0, abs=1e-12)
    twin = _py_opic([(0, 1), (0, 2), (1, 2), (2, 0), (3, 0)], 4, 3)
    for i in range(4):
        assert rows[i].importance == pytest.approx(twin[i], abs=1e-12)
    # host 3 receives no cash: after step 1 its cash is 0 forever, its
    # history froze at the initial allotment — the never-linked host
    # decays instead of accumulating
    assert rows[3].cash == 0.0
    assert rows[3].importance < rows[0].importance


def test_meaningful_after_one_step(spark):
    """The OPIC selling point: one step already orders hosts by in-flow
    (no fixpoint needed). Host 2 has two in-edges from the richest
    spenders, host 3 has none."""
    edges, hosts = _graph(spark)
    rows = {r.host: r for r in opic(edges, hosts, n_hosts=4, iterations=1).collect()}
    assert rows[2].importance > rows[3].importance
    assert rows[0].importance > rows[3].importance


def test_importance_feeds_budget(spark):
    edges, hosts = _graph(spark)
    ranks = opic(edges, hosts, n_hosts=4, iterations=3).select(
        "host", F.col("importance").alias("rank")
    )
    budgets = {r.host: r.host_budget for r in budget_from_rank(ranks, 100).collect()}
    assert set(budgets) == {0, 1, 2, 3}
    assert all(b >= 1 for b in budgets.values())
    # better-linked hosts get more slots
    assert budgets[0] > budgets[3]


def test_sum_path_matches_fold_path_on_bounded_graph(spark):
    edges, hosts = _graph(spark)
    a = {r.host: r.importance
         for r in opic(edges, hosts, 4, 3, deterministic_fold=True).collect()}
    b = {r.host: r.importance
         for r in opic(edges, hosts, 4, 3, deterministic_fold=False).collect()}
    for i in range(4):
        assert a[i] == pytest.approx(b[i], rel=1e-12)
