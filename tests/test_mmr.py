"""MMR diversified top-k (pipeline/similarity.py: mmr_topk): diversity
beats raw relevance on a clustered corpus; self-query picks itself
first. Cross-engine identity (incl. the unrolled greedy) is pinned by
the catalog's emb_mmr_topk oracle row."""

from __future__ import annotations

from pyspark.sql import functions as F


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_mmr_diversifies_clustered_corpus(spark):
    from crawler_ai_spark.pipeline.similarity import mmr_topk

    # query along +x; clusters A (ids 1-3) and B (ids 4-5) are equally
    # relevant but mutually less similar (orthogonal off-axis parts).
    # Plain top-3 = self + two of cluster A; MMR's pick 3 must jump to
    # cluster B because A's intra-similarity (~1.0) outweighs B's
    # cross-similarity (~0.96) at equal relevance.
    vecs = [
        [1.0, 0.0, 0.0],            # 0: the query vector
        [0.98, 0.2, 0.0],           # 1  cluster A
        [0.98, 0.201, 0.0],         # 2
        [0.98, 0.199, 0.0],         # 3
        [0.98, 0.0, 0.2],           # 4  cluster B
        [0.98, 0.0, 0.201],         # 5
    ]
    emb = _emb(spark, vecs)
    queries = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = mmr_topk(queries, emb, k=3, shortlist=6, lam=0.5).orderBy("pos").collect()
    picks = [r.neighbor_id for r in out]
    assert picks[0] == 0                      # self: rel 1.0, no penalty
    assert set(picks) & {4, 5}, picks         # the oblique cluster is reached
    # scores non-increasing in pick order
    assert all(out[i].mmr_score >= out[i + 1].mmr_score for i in range(len(out) - 1))


def test_fewer_candidates_than_k(spark):
    from crawler_ai_spark.pipeline.similarity import mmr_topk

    emb = _emb(spark, [[1.0, 0.0], [0.9, 0.1]])
    queries = emb.limit(1).select(F.col("vec_id").alias("query_id"), "embedding")
    out = mmr_topk(queries, emb, k=10, shortlist=10).collect()
    assert len(out) == 2  # exhausts the corpus, no crash
