"""In-plan logistic classifier (pipeline/classifier.py): separation on
disjoint vocabularies, direction of learned weights, empty-doc neutral
score, determinism. Cross-engine training identity is pinned by the
catalog's doc_quality_classifier oracle row (DuckDB re-runs all 3 GD
steps)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_ai_spark.pipeline.classifier import (
    doc_features,
    score_docs,
    train_logreg,
)

TGT = "theorem lemma proof corollary integral manifold".split()
POOL = "sale discount shipping cart checkout coupon".split()


def _corpus(spark, n_pos=40, n_neg=60):
    rows = []
    for i in range(n_pos):
        rows.append((i, 1.0, " ".join(TGT[i % 3 :] + TGT)))
    for i in range(n_pos, n_pos + n_neg):
        rows.append((i, 0.0, " ".join(POOL[i % 3 :] + POOL)))
    rows.append((n_pos + n_neg, 0.0, "   "))  # blank doc
    docs = spark.createDataFrame(
        [(d, t) for d, _, t in rows], "doc_id long, text string"
    )
    labels = spark.createDataFrame(
        [(d, y) for d, y, _ in rows], "doc_id long, y double"
    )
    return docs, labels


def test_separates_disjoint_vocabularies(spark):
    docs, labels = _corpus(spark)
    w = train_logreg(doc_features(docs), labels, steps=3)
    s = {r.doc_id: r.score for r in score_docs(docs, w).collect()}
    pos = [s[i] for i in range(40)]
    neg = [s[i] for i in range(40, 100)]
    assert min(pos) > 0.5 > max(neg)
    assert min(pos) > max(neg)
    # featureless doc scores sigmoid(0) exactly
    assert s[100] == 0.5


def test_weights_move_toward_labels(spark):
    docs, labels = _corpus(spark)
    feats = doc_features(docs)
    w = train_logreg(feats, labels, steps=1)
    wmap = {r.b: r.w for r in w.collect()}
    from crawler_ai_spark.pipeline.classifier import CLF_BUCKETS
    from crawler_ai_spark.pipeline.dsir import bucket_of

    probe = spark.createDataFrame([(t,) for t in TGT + POOL], "tok string").select(
        "tok", bucket_of(F.col("tok"), CLF_BUCKETS).alias("b")
    )
    bmap = {r.tok: r.b for r in probe.collect()}
    # after one step, every target-vocab bucket weight > every pool one
    tgt_w = [wmap[bmap[t]] for t in TGT]
    pool_w = [wmap[bmap[t]] for t in POOL]
    assert min(tgt_w) > 0 > max(pool_w)
    # untouched buckets stay exactly 0
    touched = set(bmap.values())
    assert all(v == 0.0 for b, v in wmap.items() if b not in touched)


def test_training_deterministic(spark):
    docs, labels = _corpus(spark)
    feats = doc_features(docs)
    a = sorted(map(tuple, train_logreg(feats, labels, steps=2).collect()))
    b = sorted(map(tuple, train_logreg(feats, labels, steps=2).collect()))
    assert a == b
