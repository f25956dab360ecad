"""BM25F (pipeline/retrieval.py: bm25f_topk): title hits outrank body
hits; pooled saturation beats per-field double counting. Cross-engine
identity pinned by the catalog's bm25f_topk oracle row."""

from __future__ import annotations

from crawler_ai_spark.pipeline.retrieval import bm25f_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, title string, text string")


def test_title_hit_outranks_body_hit(spark):
    docs = _docs(
        spark,
        [
            (1, "quantum computing guide", "filler words " * 5),
            (2, "unrelated title", "quantum " + "filler words " * 5),
            (3, "boring page", "more filler text entirely"),
        ],
    )
    out = bm25f_topk(docs, ["quantum"], fields={"title": 3.0, "text": 1.0}, k=3).collect()
    assert [r.doc_id for r in out] == [1, 2]
    assert out[0].score > out[1].score


def test_pooled_saturation_not_double_counted(spark):
    # a term in BOTH fields must score less than 2x a single-field hit
    docs = _docs(
        spark,
        [
            (1, "alpha", "alpha filler filler"),
            (2, "alpha", "beta filler filler"),
            (3, "gamma", "delta filler filler"),
        ],
    )
    out = {r.doc_id: r.score for r in bm25f_topk(
        docs, ["alpha"], fields={"title": 1.0, "text": 1.0}, k=3).collect()}
    assert out[1] > out[2]
    assert out[1] < 2 * out[2]  # saturation, not naive addition
