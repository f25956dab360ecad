"""nDCG@k (pipeline/retrieval.py: ndcg_at_k). Cross-engine identity
pinned by the catalog's retrieval_ndcg oracle row."""

from __future__ import annotations

import math

import pytest

from crawler_ai_spark.pipeline.retrieval import ndcg_at_k


def _dfs(spark, runs, qrels):
    r = spark.createDataFrame(runs, "query_id long, doc_id long, rank int")
    q = spark.createDataFrame(qrels, "query_id long, doc_id long, rel double")
    return r, q


def test_perfect_and_inverted_rankings(spark):
    qrels = [(0, 1, 2.0), (0, 2, 1.0), (0, 3, 0.0)]
    perfect = [(0, 1, 1), (0, 2, 2), (0, 3, 3)]
    inverted = [(0, 3, 1), (0, 2, 2), (0, 1, 3)]
    r, q = _dfs(spark, perfect, qrels)
    assert ndcg_at_k(r, q).collect()[0].ndcg == 1.0
    r2, _ = _dfs(spark, inverted, qrels)
    out = ndcg_at_k(r2, q).collect()[0]
    want_dcg = 0.0 + 1.0 / math.log2(3) + 2.0 / math.log2(4)
    want_idcg = 2.0 + 1.0 / math.log2(3)
    assert out.ndcg == pytest.approx(round(round(want_dcg, 6) / round(want_idcg, 6), 6), abs=2e-6)
    assert out.ndcg < 1.0


def test_no_positive_qrels_is_null(spark):
    r, q = _dfs(spark, [(0, 1, 1)], [(0, 1, 0.0)])
    assert ndcg_at_k(r, q).collect()[0].ndcg is None


def test_k_cutoff(spark):
    # the relevant doc beyond rank k contributes nothing
    qrels = [(0, 9, 2.0), (0, 1, 1.0)]
    runs = [(0, 1, 1)] + [(0, i + 10, i + 2) for i in range(9)] + [(0, 9, 11)]
    r, q = _dfs(spark, runs, qrels)
    out = ndcg_at_k(r, q, k=10).collect()[0]
    assert out.dcg == 1.0  # only the rank-1 rel=1 doc counts
