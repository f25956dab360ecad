"""TrustRank (operators/hostrank.py: host_rank(teleport=...)): trust
propagates from seeds only; unreachable spam converges to zero; the
uniform path is unchanged. Cross-engine float identity is pinned by the
catalog's trust_rank oracle row."""

from __future__ import annotations

import pytest

from crawler_ai_spark.operators.hostrank import host_rank


def _graph(spark):
    # trusted triangle 0->1->2->0, spam island 3<->4 with a spam->good
    # edge (5 -> 0 style): spam pointing AT good hosts must not earn
    # the spam any trust
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (3, 4), (4, 3), (3, 0)],
        "src long, dst long",
    )
    hosts = spark.createDataFrame([(i,) for i in range(5)], "host long")
    return edges, hosts


def test_unreachable_spam_gets_zero(spark):
    edges, hosts = _graph(spark)
    tel = spark.createDataFrame([(0, 1.0)], "host long, t double")
    t = {r.host: r.rank
         for r in host_rank(edges, hosts, 5, iterations=4, teleport=tel).collect()}
    assert t[3] == 0.0 and t[4] == 0.0
    assert t[0] > 0 and t[1] > 0 and t[2] > 0
    assert sum(t.values()) == pytest.approx(1.0, abs=1e-12)


def test_outlinks_to_good_earn_spam_nothing(spark):
    # 3 -> 0 exists, yet 3 has no in-trust: linking TO trusted hosts is
    # free for spammers and must not be rewarded
    edges, hosts = _graph(spark)
    tel = spark.createDataFrame([(0, 0.5), (1, 0.5)], "host long, t double")
    t = {r.host: r.rank
         for r in host_rank(edges, hosts, 5, iterations=6, teleport=tel).collect()}
    assert t[3] == 0.0 and t[4] == 0.0


def test_uniform_path_unchanged(spark):
    edges, hosts = _graph(spark)
    u = {r.host: r.rank for r in host_rank(edges, hosts, 5, iterations=3).collect()}
    # uniform restart still gives the island its share
    assert u[3] > 0.0 and u[4] > 0.0
    assert sum(u.values()) == pytest.approx(1.0, abs=1e-12)


def test_trust_split_across_seeds(spark):
    edges, hosts = _graph(spark)
    tel = spark.createDataFrame(
        [(0, 0.5), (3, 0.5)], "host long, t double"
    )
    t = {r.host: r.rank
         for r in host_rank(edges, hosts, 5, iterations=4, teleport=tel).collect()}
    # seeding the island launders trust into it — the curation decision
    # is the seed list, and the math honors it
    assert t[4] > 0.0
    assert sum(t.values()) == pytest.approx(1.0, abs=1e-12)
