"""Declared mirror election (operators/mirrors.py:
mirror_canonical_declared). Cross-engine identity pinned by the
catalog's mirror_declared_canonical oracle row."""

from __future__ import annotations

from crawler_ai_spark.operators.mirrors import mirror_canonical_declared


def _run(spark, pairs, prefs):
    p = spark.createDataFrame(pairs, "host_a string, host_b string")
    hp = (
        spark.createDataFrame(prefs, "host string, preferred_host string")
        if prefs is not None
        else None
    )
    return {r.host: r.canonical_host for r in mirror_canonical_declared(p, hp).collect()}


def test_declaration_beats_heuristic(spark):
    out = _run(spark, [("b.example", "www.b.example")],
               [("b.example", "www.b.example")])
    # heuristic alone would pick the lexicographically smaller bare host
    assert out == {"b.example": "www.b.example", "www.b.example": "www.b.example"}


def test_foreign_declaration_ignored(spark):
    out = _run(spark, [("x.example", "y.example")],
               [("x.example", "attacker.example")])
    assert out == {"x.example": "x.example", "y.example": "x.example"}


def test_none_prefs_is_base_operator(spark):
    out = _run(spark, [("c.example", "a.example")], None)
    assert out == {"c.example": "a.example", "a.example": "a.example"}


def test_competing_declarations_take_min(spark):
    # both sides declare themselves: lexicographically smaller wins
    out = _run(spark, [("a.example", "b.example")],
               [("a.example", "a.example"), ("b.example", "b.example")])
    assert out == {"a.example": "a.example", "b.example": "a.example"}
