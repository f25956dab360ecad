"""Canonical election (operators/dust.py: elect_canonical): precedence
rules and hijack resistance. Cross-engine identity is pinned by the
catalog's canonical_election oracle row."""

from __future__ import annotations

from crawler_ai_spark.operators.dust import elect_canonical


def _run(spark, rows):
    df = spark.createDataFrame(rows, "cluster_id string, url string, declared string")
    return {(r.cluster_id, r.url): r for r in elect_canonical(df).collect()}


def test_majority_declaration_wins(spark):
    rows = [
        ("A", "https://h/a", None),
        ("A", "https://h/a/print", "https://h/a"),
        ("A", "https://h/a?sid=1", "https://h/a"),
        ("A", "https://h/a/amp", "https://h/a/amp"),  # self-vote, minority
    ]
    out = _run(spark, rows)
    assert all(v.canonical_url == "https://h/a" for v in out.values())
    assert out[("A", "https://h/a")].is_canonical
    assert sum(v.is_canonical for v in out.values()) == 1


def test_outside_declaration_cannot_hijack(spark):
    rows = [
        ("B", "https://h/long-name", "https://attacker.example/steal"),
        ("B", "https://h/x", None),
    ]
    out = _run(spark, rows)
    # the external claim is invalid; shortest member wins
    assert all(v.canonical_url == "https://h/x" for v in out.values())


def test_silent_cluster_shortest_then_lexicographic(spark):
    rows = [
        ("C", "https://h/bb", None),
        ("C", "https://h/ba", None),   # same length: lexicographic
        ("C", "https://h/bbb", None),
    ]
    out = _run(spark, rows)
    assert all(v.canonical_url == "https://h/ba" for v in out.values())


def test_declaration_count_tie_breaks_lexicographically(spark):
    rows = [
        ("D", "https://h/p1", "https://h/p2"),
        ("D", "https://h/p2", "https://h/p1"),
        ("D", "https://h/zzz", None),
    ]
    out = _run(spark, rows)
    # p1 and p2 each get one valid vote: lexicographically smaller wins
    assert all(v.canonical_url == "https://h/p1" for v in out.values())
