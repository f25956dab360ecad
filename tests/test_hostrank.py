"""host_rank (operators/hostrank.py) — semantics on hand-checkable graphs.

The cross-engine float bit-identity of the catalog's `host_rank` query is
covered by the oracle gate; these tests pin the PageRank math itself.
"""

import math

import pytest
from pyspark.sql import functions as F

from crawler_ai_spark.operators.hostrank import host_rank


def _rank_map(df):
    return {r["host"]: r["rank"] for r in df.collect()}


def _graph(spark, edges, n):
    e = spark.createDataFrame(edges, "src long, dst long")
    h = spark.range(n).select(F.col("id").alias("host"))
    return e, h


def test_ring_is_uniform(spark):
    # symmetric ring: every host identical by symmetry, sum == 1
    n = 5
    e, h = _graph(spark, [(i, (i + 1) % n) for i in range(n)], n)
    ranks = _rank_map(host_rank(e, h, n_hosts=n, iterations=4))
    assert len(ranks) == n
    assert math.isclose(sum(ranks.values()), 1.0, rel_tol=1e-12)
    assert all(math.isclose(v, 1.0 / n, rel_tol=1e-12) for v in ranks.values())


def _py_pagerank(edges, n, iterations, d=0.85):
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = (1.0 - d) / n
    r = [1.0 / n] * n
    for _ in range(iterations):
        inflow = [0.0] * n
        for s, t in sorted(edges):
            inflow[t] += r[s] / outdeg[s]
        r = [base + d * inflow[i] for i in range(n)]
    return r


def test_star_matches_python_reference(spark):
    # hosts 1..4 all point at 0; 0 points back at 1 (no dangling).  The
    # star oscillates between hub and spoke under power iteration, so pin
    # the exact iterated values against a plain-Python reference rather
    # than converged-order claims.
    n = 5
    edges = [(i, 0) for i in range(1, n)] + [(0, 1)]
    e, h = _graph(spark, edges, n)
    ranks = _rank_map(host_rank(e, h, n_hosts=n, iterations=10))
    ref = _py_pagerank(edges, n, iterations=10)
    for i in range(n):
        assert math.isclose(ranks[i], ref[i], rel_tol=1e-12), (i, ranks[i], ref[i])
    assert ranks[2] == ranks[3] == ranks[4]  # symmetric leaves, no inflow
    assert math.isclose(sum(ranks.values()), 1.0, rel_tol=1e-9)


def test_two_iterations_hand_computed(spark):
    # 3 hosts: 0->1, 0->2, 1->2, 2->0.  Hand-run two damped steps.
    n, d = 3, 0.85
    e, h = _graph(spark, [(0, 1), (0, 2), (1, 2), (2, 0)], n)
    base = (1.0 - d) / n
    r = [1.0 / n] * 3
    for _ in range(2):
        r = [
            base + d * r[2],
            base + d * (r[0] / 2),
            base + d * (r[0] / 2 + r[1]),
        ]
    got = _rank_map(host_rank(e, h, n_hosts=n, iterations=2, damping=d))
    for i in range(3):
        assert math.isclose(got[i], r[i], rel_tol=1e-12), (i, got[i], r[i])


def test_sum_path_matches_fold_path(spark):
    # production SUM aggregation agrees with the deterministic fold
    n = 7
    edges = [(i, (i * 3 + 1) % n) for i in range(n)] + [(i, (i + 1) % n) for i in range(n)]
    edges = [(s, t) for s, t in dict.fromkeys(edges).keys() if s != t]
    e, h = _graph(spark, edges, n)
    fold = _rank_map(host_rank(e, h, n_hosts=n, iterations=3, deterministic_fold=True))
    summed = _rank_map(host_rank(e, h, n_hosts=n, iterations=3, deterministic_fold=False))
    for i in range(n):
        assert math.isclose(fold[i], summed[i], rel_tol=1e-12)


def test_catalog_fixture_has_no_dangling_hosts(spark):
    from crawler_ai_spark.queries.crawl import _HR_N, synth_host_edges

    edges, hosts = synth_host_edges(spark, "/root/testdata/sf0.001")
    assert edges.where("src = dst").count() == 0
    assert edges.select("src").distinct().count() == _HR_N  # every host emits
    ranks = host_rank(edges, hosts, n_hosts=_HR_N)
    total = ranks.agg(F.sum("rank")).collect()[0][0]
    assert math.isclose(total, 1.0, rel_tol=1e-9)


def test_budget_from_rank_clamps(spark):
    from crawler_ai_spark.operators.hostrank import budget_from_rank

    ranks = spark.createDataFrame(
        [(0, 0.5), (1, 0.001), (2, 0.09), (3, 0.25)], "host long, rank double"
    )
    got = {r.host: r.host_budget for r in budget_from_rank(
        ranks, total_per_batch=100, min_budget=2, max_budget=20
    ).collect()}
    assert got == {0: 20, 1: 2, 2: 9, 3: 20}  # clamp high, clamp low, floor


def test_rank_budget_respected_per_host(spark):
    from crawler_ai_spark.queries.crawl import q_rank_budget_schedule, _RB_MAX, _RB_MIN

    out = q_rank_budget_schedule(spark, "/root/testdata/sf0.001")
    per_host = out.groupBy("host", "host_budget").count().collect()
    assert per_host  # non-empty schedule
    for r in per_host:
        assert _RB_MIN <= r["host_budget"] <= _RB_MAX
        assert r["count"] <= r["host_budget"], r


def test_caller_budgets_cap_loop_and_merge_tightest(spark, fixture_root, tmp_path_factory):
    """run_crawl(host_budgets=...) caps a host per batch exactly like a
    Crawl-delay rule, and when BOTH are present the tighter cap wins."""
    from pyspark.sql import functions as F2

    from crawler_ai_spark.plans.crawl_loop import (
        CrawlConfig,
        CrawlStore,
        _merge_host_budgets,
        run_crawl,
    )

    merged = {
        r.host: r.host_budget
        for r in _merge_host_budgets(
            spark.createDataFrame([("a", 5), ("b", 2)], ["host", "host_budget"]),
            spark.createDataFrame([("a", 3), ("c", 7)], ["host", "host_budget"]),
        ).collect()
    }
    assert merged == {"a": 3, "b": 2, "c": 7}

    pages = spark.read.parquet(str(fixture_root / "sf0.001" / "pages.parquet")).where(
        ~F2.col("url").endswith(".xml")
    )
    seeds_urls = sorted(
        r.url for r in pages.select("url").collect() if r.url.endswith(".example/")
    )[:3]
    seeds = spark.createDataFrame(
        [(s, 50, 10) for s in seeds_urls], ["seed_url", "max_pages", "max_career_pages"]
    )
    capped = seeds_urls[0].split("//")[1].rstrip("/")
    budgets = spark.createDataFrame([(capped, 1)], ["host", "host_budget"])

    root = tmp_path_factory.mktemp("rank_budget_loop")
    res = run_crawl(
        spark, pages, seeds, root,
        CrawlConfig(max_batches=12, parallelism=8), host_budgets=budgets,
    )
    vis = CrawlStore(spark, root).read_all("visited", res["last_batch"])
    on_capped = F2.col("url").startswith(f"https://{capped}/")
    per_batch = {
        r.batch_id: r.n
        for r in vis.where(on_capped).groupBy("batch_id").agg(F2.count("*").alias("n")).collect()
    }
    assert per_batch, "capped host never crawled"
    assert all(n <= 1 for n in per_batch.values()), per_batch
    assert sum(per_batch.values()) > 1, "deferral should spread across batches"


def test_host_edges_from_pages(spark):
    from crawler_ai_spark.operators.hostrank import host_edges_from_pages

    def page(url, hrefs):
        body = "".join(f'<a href="{h}">x</a>' for h in hrefs)
        return (url, f"<html><body>{body}</body></html>".encode())

    pages = spark.createDataFrame(
        [
            page("https://a.example/", ["https://b.example/jobs", "/local", "https://a.example/self"]),
            page("https://b.example/", ["https://c.example/", "https://c.example/dup"]),
            page("https://d.example/", []),  # no out-links -> not in universe
        ],
        "url string, html binary",
    )
    edges, hosts = host_edges_from_pages(pages)
    got = {(r.src, r.dst) for r in edges.collect()}
    # relative + same-host links dropped; (b->c) deduped to one edge
    assert got == {("a.example", "b.example"), ("b.example", "c.example")}
    assert {r.host for r in hosts.collect()} == {"a.example", "b.example"}


def test_random_graphs_match_python_reference(spark):
    """Random digraphs (every host given an out-edge) against the plain-
    Python power iteration — both the fold and SUM paths."""
    import random

    for seed in (7, 23, 61):
        rng = random.Random(seed)
        n = rng.randint(3, 12)
        edges = {(i, (i + 1) % n) for i in range(n)}  # ring: no dangling
        for _ in range(rng.randint(0, 3 * n)):
            s, t = rng.randrange(n), rng.randrange(n)
            if s != t:
                edges.add((s, t))
        edges = sorted(edges)
        iters = rng.randint(1, 5)
        e, h = _graph(spark, edges, n)
        ref = _py_pagerank(edges, n, iterations=iters)
        for fold in (True, False):
            got = _rank_map(host_rank(e, h, n_hosts=n, iterations=iters,
                                      deterministic_fold=fold))
            for i in range(n):
                assert math.isclose(got[i], ref[i], rel_tol=1e-12), (seed, fold, i)
