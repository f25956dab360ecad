"""Efraimidis-Spirakis weighted sampling (pipeline/corpus.py:
weighted_sample): statistical bias toward heavy weights, determinism,
non-positive-weight exclusion. Cross-engine identity is pinned by the
catalog's corpus_weighted_sample oracle row."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, weights):
    return spark.createDataFrame(
        list(enumerate(weights)), "doc_id long, w double"
    )


def test_heavy_weights_oversample(spark):
    from crawler_ai_spark.pipeline.corpus import weighted_sample

    # 50 heavy (w=100) + 450 light (w=1): a 50-sample should be mostly
    # heavy (E[heavy share] >> uniform's 10%)
    docs = _docs(spark, [100.0] * 50 + [1.0] * 450)
    picked = weighted_sample(docs, F.col("w"), k=50).collect()
    heavy = sum(1 for r in picked if r.doc_id < 50)
    assert heavy >= 35, heavy
    # ranks are 1..k with no gaps
    assert sorted(r.pick for r in picked) == list(range(1, 51))


def test_deterministic_and_salted(spark):
    from crawler_ai_spark.pipeline.corpus import weighted_sample

    docs = _docs(spark, [float(i % 7 + 1) for i in range(200)])
    a = [r.doc_id for r in weighted_sample(docs, F.col("w"), k=20).collect()]
    b = [r.doc_id for r in weighted_sample(docs, F.col("w"), k=20).collect()]
    c = [r.doc_id for r in weighted_sample(docs, F.col("w"), k=20, salt="other").collect()]
    assert a == b
    assert a != c  # a different salt draws a different sample


def test_nonpositive_weights_never_sample(spark):
    from crawler_ai_spark.pipeline.corpus import weighted_sample

    docs = _docs(spark, [0.0, -1.0, 5.0, 5.0])
    picked = {r.doc_id for r in weighted_sample(docs, F.col("w"), k=10).collect()}
    assert picked == {2, 3}
