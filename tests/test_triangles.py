"""Triangle counting / clustering coefficient (operators/hostrank.py:
triangle_clustering): hand-checkable shapes and a brute-force reference
on a random graph. Cross-engine identity is pinned by the catalog's
host_triangles oracle row."""

from __future__ import annotations

from itertools import combinations

from crawler_ai_spark.operators.hostrank import triangle_clustering


def _run(spark, edges, n):
    e = spark.createDataFrame(edges, "src long, dst long")
    h = spark.createDataFrame([(i,) for i in range(n)], "host long")
    return {r.host: r for r in triangle_clustering(e, h).collect()}


def test_k4_with_pendant_and_isolate(spark):
    edges = [(a, b) for a in range(4) for b in range(4) if a < b] + [(4, 0)]
    rows = _run(spark, edges, 6)
    assert [rows[i].triangles for i in range(6)] == [3, 3, 3, 3, 0, 0]
    assert rows[1].clustering == 1.0          # pure clique member
    assert rows[0].clustering == 0.5          # 2*3/(4*3): pendant dilutes
    assert rows[4].clustering == 0.0 and rows[5].degree == 0


def test_direction_and_duplicates_collapse(spark):
    # both directions + repeats of one triangle: still exactly 1 each
    edges = [(0, 1), (1, 0), (1, 2), (2, 1), (2, 0), (0, 2), (0, 1)]
    rows = _run(spark, edges, 3)
    assert all(rows[i].triangles == 1 for i in range(3))
    assert all(rows[i].clustering == 1.0 for i in range(3))


def test_matches_bruteforce_on_random_graph(spark):
    n = 40
    edges = []
    for v in range(n):
        x = v
        for _ in range(5):
            x = (x * 1103515245 + 12345) % n
            if x != v:
                edges.append((v, x))
    und = {(min(a, b), max(a, b)) for a, b in edges}
    adj = {v: set() for v in range(n)}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    want = {
        v: sum(1 for x, y in combinations(sorted(adj[v]), 2) if y in adj[x])
        for v in range(n)
    }
    rows = _run(spark, sorted(edges), n)
    for v in range(n):
        assert rows[v].triangles == want[v], v
        d = len(adj[v])
        expect_c = 2.0 * want[v] / (d * (d - 1)) if d >= 2 else 0.0
        assert rows[v].clustering == expect_c, v
