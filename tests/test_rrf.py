"""Reciprocal rank fusion (pipeline/retrieval.py: rrf_fuse). Cross-
engine identity pinned by the catalog's hybrid_rrf_topk oracle row."""

from __future__ import annotations

import pytest

from crawler_ai_spark.pipeline.retrieval import rrf_fuse


def _rank(spark, ids):
    return spark.createDataFrame(
        [(d, i + 1) for i, d in enumerate(ids)], "doc_id long, rank int"
    )


def test_consensus_beats_single_list_top(spark):
    a = _rank(spark, [1, 2, 3, 4])
    b = _rank(spark, [9, 2, 3, 1])
    out = rrf_fuse([a, b], k=60, top=4).collect()
    by_id = {r.doc_id: r for r in out}
    # doc 2 (ranks 2+2) outranks doc 9 (rank 1 in one list only)
    assert by_id[2].fused_rank < by_id[9].fused_rank
    assert by_id[2].rrf_score == pytest.approx(round(1 / 62 + 1 / 62, 9))
    assert by_id[9].n_rankings == 1 and by_id[2].n_rankings == 2


def test_single_ranking_passthrough_order(spark):
    a = _rank(spark, [5, 6, 7])
    out = rrf_fuse([a], top=3).collect()
    assert [r.doc_id for r in sorted(out, key=lambda r: r.fused_rank)] == [5, 6, 7]


def test_ties_break_by_id(spark):
    a = _rank(spark, [10])
    b = _rank(spark, [3])
    out = sorted(rrf_fuse([a, b], top=2).collect(), key=lambda r: r.fused_rank)
    assert [r.doc_id for r in out] == [3, 10]  # equal scores: id ascending
