"""TF-IDF keywords (pipeline/retrieval.py: tfidf_keywords). Cross-engine
identity is pinned by the catalog's doc_tfidf_keywords oracle row."""

from __future__ import annotations

import math

import pytest

from crawler_ai_spark.pipeline.retrieval import tfidf_keywords


def _docs(spark, texts):
    return spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")


def test_distinctive_terms_beat_boilerplate(spark):
    docs = _docs(
        spark,
        [
            "the company the company hiring quantum engineer",
            "the company the company selling discount shoes",
            "the company the company brewing artisanal coffee",
        ],
    )
    out = tfidf_keywords(docs, k=2).collect()
    top1 = {r.doc_id: r.term for r in out if r.rank == 1}
    # 'the'/'company' appear in every doc (idf = ln(1) = 0) and can
    # never outrank the distinctive terms despite tf = 2
    assert set(top1.values()) <= {
        "quantum", "engineer", "hiring", "selling", "discount", "shoes",
        "brewing", "artisanal", "coffee",
    }
    # weight math: tf=1, df=1, N=3
    w = [r.weight for r in out if r.doc_id == 0 and r.rank == 1][0]
    assert w == pytest.approx(round(math.log(3.0), 6))


def test_min_df_prunes_hapax(spark):
    docs = _docs(spark, ["unique1 shared", "unique2 shared", "unique3 shared"])
    out = tfidf_keywords(docs, k=5, min_df=2).collect()
    assert {r.term for r in out} == {"shared"}


def test_tie_break_and_k(spark):
    docs = _docs(spark, ["b a c", "x"])
    out = [r.term for r in tfidf_keywords(docs, k=2).collect() if r.doc_id == 0]
    assert out == ["a", "b"]  # equal weights: term-ascending, capped at k
