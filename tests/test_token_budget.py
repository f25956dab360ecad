"""Token-budget manifest cut (pipeline/corpus.py: cut_token_budget).
Cross-engine identity pinned by the catalog's corpus_token_budget_cut
oracle row."""

from __future__ import annotations

from crawler_ai_spark.pipeline.corpus import cut_token_budget


def _manifest(spark, rows):
    # rows: (shard_id, position, doc_id, n_tokens)
    return spark.createDataFrame(
        rows, "shard_id int, position int, doc_id long, n_tokens long"
    )


def test_exact_prefix_cut(spark):
    rows = [(0, 1, 10, 100), (0, 2, 11, 200), (1, 1, 20, 300), (1, 2, 21, 400)]
    out = sorted(
        (r.shard_id, r.position, r.running_total)
        for r in cut_token_budget(_manifest(spark, rows), 600).collect()
    )
    # order: (0,1)=100 (0,2)=300 (1,1)=600 (1,2)=1000 -> cut keeps 3
    assert out == [(0, 1, 100), (0, 2, 300), (1, 1, 600)]


def test_overflow_doc_excluded_not_truncated(spark):
    rows = [(0, 1, 1, 500), (0, 2, 2, 400)]
    out = cut_token_budget(_manifest(spark, rows), 800).collect()
    assert [(r.position, r.running_total) for r in out] == [(1, 500)]


def test_budget_larger_than_corpus_keeps_all(spark):
    rows = [(s, p, s * 10 + p, 10) for s in range(3) for p in range(1, 4)]
    out = cut_token_budget(_manifest(spark, rows), 10_000).collect()
    assert len(out) == 9
    assert max(r.running_total for r in out) == 90


def test_deterministic(spark):
    rows = [(s, p, s * 100 + p, (s * 7 + p) % 11 + 1) for s in range(4) for p in range(1, 20)]
    m = _manifest(spark, rows)
    a = sorted(map(tuple, cut_token_budget(m, 300).collect()))
    b = sorted(map(tuple, cut_token_budget(m, 300).collect()))
    assert a == b
