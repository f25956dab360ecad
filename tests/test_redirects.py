"""resolve_redirects (operators/redirects.py) — pointer-doubling chain
collapse vs a naive Python walk, on hand-built and randomized alias maps.

The cross-engine check of the catalog's `redirect_resolve` query (DuckDB
recursive-CTE re-derivation) is covered by the oracle gate; these pin the
operator semantics: terminal absorption, exact hop counts min(L, H),
cycle/over-long detection, and the alias seen-set expansion.
"""

import random

import pytest

from crawler_ai_spark.operators.redirects import alias_seen_urls, resolve_redirects


def _walk(edges: dict, u: str, max_hops: int):
    """Naive reference: follow up to max_hops, absorbing at terminals."""
    cur, hops = edges[u], 1
    while cur in edges and hops < max_hops:
        cur, hops = edges[cur], hops + 1
    return cur, hops, cur not in edges


def _check(spark, edges: dict, max_hops: int = 8):
    df = spark.createDataFrame(list(edges.items()), "src string, dst string")
    got = {
        r["url"]: (r["final_url"], r["hops"], r["resolved"])
        for r in resolve_redirects(df, max_hops=max_hops).collect()
    }
    want = {u: _walk(edges, u, max_hops) for u in edges}
    assert got == want
    return got


def test_straight_chain(spark):
    edges = {f"u{i}": f"u{i + 1}" for i in range(5)}  # u0→…→u5 (terminal)
    got = _check(spark, edges)
    assert got["u0"] == ("u5", 5, True)
    assert got["u4"] == ("u5", 1, True)


def test_chain_resolving_exactly_at_cap(spark):
    edges = {f"u{i}": f"u{i + 1}" for i in range(8)}
    got = _check(spark, edges)
    assert got["u0"] == ("u8", 8, True)


def test_over_long_chain_unresolved(spark):
    edges = {f"u{i}": f"u{i + 1}" for i in range(20)}
    got = _check(spark, edges)
    assert got["u0"] == ("u8", 8, False)  # stopped mid-chain at the cap
    assert got["u12"] == ("u20", 8, True)


def test_cycle_detected(spark):
    edges = {"a": "b", "b": "c", "c": "a", "x": "a"}
    got = _check(spark, edges)
    assert not got["a"][2] and not got["x"][2]
    # 3-cycle walked 8 hops from 'a' lands on f^8(a): a→b→c→a→b→c→a→b
    assert got["a"] == ("c", 8, False)


def test_self_loop(spark):
    got = _check(spark, {"a": "a", "b": "a"})
    assert got["a"] == ("a", 8, False)
    assert got["b"] == ("a", 8, False)


def test_converging_aliases(spark):
    # http→https + www + trailing-slash variants all land on one canonical
    edges = {
        "http://e.com": "https://e.com",
        "http://www.e.com": "https://www.e.com",
        "https://www.e.com": "https://e.com",
        "https://e.com": "https://e.com/home",
    }
    got = _check(spark, edges)
    finals = {v[0] for v in got.values()}
    assert finals == {"https://e.com/home"}


@pytest.mark.parametrize("seed", [0, 1])
def test_random_alias_maps(spark, seed):
    rng = random.Random(seed)
    nodes = [f"n{i}" for i in range(120)]
    edges = {}
    for u in nodes:
        if rng.random() < 0.8:
            edges[u] = rng.choice(nodes + [f"t{i}" for i in range(20)])
    _check(spark, edges, max_hops=8)


def test_alias_seen_urls(spark):
    edges = {"a": "b", "b": "final", "c": "c"}
    df = spark.createDataFrame(list(edges.items()), "src string, dst string")
    seen = {r["url"] for r in alias_seen_urls(resolve_redirects(df)).collect()}
    # resolved aliases and their landings; the unresolved cycle stays out
    assert seen == {"a", "b", "final"}
