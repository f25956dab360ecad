"""Inverted index + BM25 (pipeline/retrieval.py) vs an independent
pure-Python computation on a hand-sized corpus."""

import math

import pytest

from crawler_ai_spark.pipeline import retrieval as R

DOCS = [
    (0, "spark join join window"),
    (1, "the quick brown fox"),
    (2, "spark spark spark"),
    (3, "window join table scan scan scan scan scan"),
    (4, ""),          # empty → dl 0, no postings
    (5, None),        # null text → excluded entirely
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_bm25(query, k1=1.2, b=0.75):
    corpus = {i: (t or "").lower().split() for i, t in DOCS if t is not None}
    n = len(corpus)
    avgdl = sum(len(t) for t in corpus.values()) / n
    df = {q: sum(1 for t in corpus.values() if q in t) for q in query}
    out = {}
    for i, toks in corpus.items():
        s, m = 0.0, 0
        for q in query:
            tf = toks.count(q)
            if not tf:
                continue
            m += 1
            idf = math.log(1 + (n - df[q] + 0.5) / (df[q] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(toks) / avgdl))
        if m:
            out[i] = (round(s, 6), m)
    return out


def test_postings_and_lengths(docs_df):
    rows = {(r.doc_id, r.term): (r.tf, r.first_pos) for r in R.postings(docs_df).collect()}
    assert rows[(0, "join")] == (2, 1)
    assert rows[(0, "spark")] == (1, 0)
    assert rows[(2, "spark")] == (3, 0)
    assert rows[(3, "scan")] == (5, 3)
    assert not any(d == 4 or d == 5 for d, _ in rows)
    dl = {r.doc_id: r.dl for r in R.doc_lengths(docs_df).collect()}
    assert dl == {0: 4, 1: 4, 2: 3, 3: 8, 4: 0}


def test_bm25_matches_reference(docs_df):
    query = ["spark", "join"]
    got = {r.doc_id: (r.score, r.n_matched) for r in
           R.bm25_topk(docs_df, query, k=10).collect()}
    assert got == _py_bm25(query)
    # ranking: doc 2 (3×spark, short) must beat doc 1 (no terms absent)
    order = [r.doc_id for r in R.bm25_topk(docs_df, query, k=10).collect()]
    assert order == sorted(got, key=lambda d: (-got[d][0], d))


def test_positions_proximity_kwic(docs_df):
    pos = {(r.doc_id, r.term): list(r.positions)
           for r in R.positions(docs_df).collect()}
    assert pos[(0, "join")] == [1, 2]
    assert pos[(3, "scan")] == [3, 4, 5, 6, 7]

    # doc 0: spark@0, window@3 → dist 3; doc 3: window@0, no spark
    prox = {r.doc_id: r.distance
            for r in R.proximity_match(docs_df, "spark", "window", 5).collect()}
    assert prox == {0: 3}
    assert R.proximity_match(docs_df, "spark", "window", 2).count() == 0

    kw = {r.doc_id: (r.match_pos, r.snippet)
          for r in R.kwic_snippets(docs_df, "join", radius=1).collect()}
    assert kw == {0: (1, "spark join join"), 3: (1, "window join table")}
