"""MRR/MAP@k (pipeline/retrieval.py: mrr_map_at_k). Cross-engine
identity pinned by the catalog's retrieval_mrr_map oracle row."""

from __future__ import annotations

import pytest

from crawler_ai_spark.pipeline.retrieval import mrr_map_at_k


def _dfs(spark, runs, qrels):
    r = spark.createDataFrame(runs, "query_id long, doc_id long, rank int")
    q = spark.createDataFrame(qrels, "query_id long, doc_id long, rel double")
    return mrr_map_at_k(r, q)


def test_textbook_example(spark):
    # relevant docs at ranks 1 and 3 of 4, 2 relevant total:
    # MRR = 1.0; AP = (1/1 + 2/3) / 2
    runs = [(0, i, i) for i in range(1, 5)]
    qrels = [(0, 1, 1.0), (0, 3, 1.0)]
    out = _dfs(spark, runs, qrels).collect()[0]
    assert out.mrr == 1.0
    assert out.ap == pytest.approx(round((1.0 + 2 / 3) / 2, 6))


def test_first_hit_deep(spark):
    runs = [(0, i, i) for i in range(1, 6)]
    qrels = [(0, 4, 2.0)]
    out = _dfs(spark, runs, qrels).collect()[0]
    assert out.mrr == 0.25
    assert out.ap == 0.25


def test_no_relevant_in_topk_scores_zero(spark):
    runs = [(0, i, i) for i in range(1, 11)] + [(0, 99, 11)]
    qrels = [(0, 99, 1.0)]  # only relevant doc is past the cutoff
    out = _dfs(spark, runs, qrels).collect()[0]
    assert out.mrr == 0.0 and out.ap == 0.0
