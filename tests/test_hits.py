"""HITS (operators/hostrank.hits) vs a pure-Python reference, plus
structural semantics on a star graph."""

import math

import pytest

from crawler_ai_spark.operators.hostrank import hits


def _py_hits(edges, n, iterations):
    hub = {v: 1.0 for v in range(n)}
    auth = None
    for _ in range(iterations):
        auth = {v: 0.0 for v in range(n)}
        for s, d in sorted(edges):
            auth[d] += hub[s]
        nrm = math.sqrt(sum(x * x for _, x in sorted(auth.items())))
        auth = {v: x / nrm for v, x in auth.items()}
        hub = {v: 0.0 for v in range(n)}
        for s, d in sorted(edges, key=lambda e: (e[1], e[0])):
            hub[s] += auth[d]
        nrm = math.sqrt(sum(x * x for _, x in sorted(hub.items())))
        hub = {v: x / nrm for v, x in hub.items()}
    return auth, hub


def _run(spark, edges, n, iterations=2):
    e = spark.createDataFrame(edges, "src long, dst long")
    h = spark.range(n).selectExpr("id AS host")
    return {r.host: (r.auth, r.hub) for r in hits(e, h, iterations).collect()}


def test_star_graph_semantics(spark):
    # 0..3 all point at 4: node 4 is the pure authority, 0..3 pure hubs
    edges = [(s, 4) for s in range(4)]
    got = _run(spark, edges, 5)
    assert got[4][0] == pytest.approx(1.0)   # sole authority
    assert got[4][1] == 0.0                  # no out-links → zero hub
    for s in range(4):
        assert got[s][0] == 0.0
        assert got[s][1] == pytest.approx(0.5)  # 4 equal hubs, L2 = 1


def test_matches_python_reference(spark):
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 1), (4, 0), (2, 4)]
    got = _run(spark, edges, 5, iterations=3)
    auth, hub = _py_hits(edges, 5, 3)
    for v in range(5):
        assert got[v][0] == pytest.approx(auth[v], abs=1e-12), v
        assert got[v][1] == pytest.approx(hub[v], abs=1e-12), v
