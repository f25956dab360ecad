"""ANF harmonic centrality (operators/anf.py): exact-regime equivalence
to BFS ball sizes, estimation-regime accuracy, and salt invariance.
Cross-engine bit identity (incl. the estimation regime) is pinned by
the catalog's anf_harmonic oracle row."""

from __future__ import annotations

import pytest

from crawler_ai_spark.operators.anf import anf_harmonic


def _bfs_balls(edges, n, t_max):
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    balls = {}
    for v in range(n):
        ball = {v}
        sizes = [1]
        for _ in range(t_max):
            ball = ball | {w for u in ball for w in adj.get(u, ())}
            sizes.append(len(ball))
        balls[v] = sizes
    return balls


def _harmonic(sizes):
    return sum((sizes[t] - sizes[t - 1]) / t for t in range(1, len(sizes)))


def test_exact_regime_matches_bfs(spark):
    # 10 nodes, k=32 > n: sketches never saturate, estimates are exact
    edges = [(i, (i + 1) % 10) for i in range(10)] + [(0, 5), (3, 7), (7, 2)]
    e = spark.createDataFrame(edges, "src long, dst long")
    h = spark.createDataFrame([(i,) for i in range(10)], "host long")
    got = {r.host: r for r in anf_harmonic(e, h, iterations=4, k=32).collect()}
    want = _bfs_balls(edges, 10, 4)
    for v in range(10):
        assert got[v].ball_sizes == [float(x) for x in want[v]]
        assert got[v].harmonic == pytest.approx(_harmonic(want[v]), abs=1e-9)


def test_estimation_regime_tracks_truth(spark):
    # 200-node LCG graph, k=16: sketches saturate; the KMV estimate of
    # the 2-hop ball should land within 40% of the true size on average
    n = 200
    edges = []
    for v in range(n):
        x = v
        for _ in range(4):
            x = (x * 1103515245 + 12345) % n
            if x != v:
                edges.append((v, x))
    e = spark.createDataFrame(sorted(set(edges)), "src long, dst long")
    h = spark.createDataFrame([(i,) for i in range(n)], "host long")
    got = {r.host: r for r in anf_harmonic(e, h, iterations=2, k=16).collect()}
    want = _bfs_balls(sorted(set(edges)), n, 2)
    rel_errs = [
        abs(got[v].ball_sizes[2] - want[v][2]) / want[v][2] for v in range(n)
    ]
    assert sum(rel_errs) / n < 0.40, sum(rel_errs) / n


def test_salt_invariance(spark):
    edges = [(i, (i + 3) % 30) for i in range(30)] + [(i, (i + 1) % 30) for i in range(30)]
    e = spark.createDataFrame(edges, "src long, dst long")
    h = spark.createDataFrame([(i,) for i in range(30)], "host long")
    a = sorted(map(tuple, anf_harmonic(e, h, iterations=3, k=8, salts=1).collect()))
    b = sorted(map(tuple, anf_harmonic(e, h, iterations=3, k=8, salts=8).collect()))
    assert a == b  # two-phase salted merge is set-semantics, salt-free
