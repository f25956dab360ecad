"""DSIR importance weights (pipeline/dsir.py): target-like pool docs
score positive, pool-like docs negative, empty docs are inert.
Cross-engine float identity is pinned by the catalog's doc_dsir_weights
oracle row."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_ai_spark.pipeline.dsir import dsir_logweights

TARGET_WORDS = "theorem lemma proof corollary integral manifold".split()
POOL_WORDS = "sale discount shipping cart checkout coupon".split()


def _corpus(spark):
    rows = []
    i = 0
    for _ in range(30):  # target split: math-y vocabulary
        rows.append((i, True, " ".join(TARGET_WORDS[i % 3 :] + TARGET_WORDS)))
        i += 1
    for _ in range(60):  # pool: commerce vocabulary
        rows.append((i, False, " ".join(POOL_WORDS[i % 3 :] + POOL_WORDS)))
        i += 1
    for _ in range(10):  # pool docs that LOOK like the target
        rows.append((i, False, " ".join(TARGET_WORDS)))
        i += 1
    rows.append((i, False, "   "))  # blank pool doc
    return spark.createDataFrame(rows, "doc_id long, is_tgt boolean, text string")


def test_target_like_pool_docs_selected(spark):
    docs = _corpus(spark)
    out = {r.doc_id: r for r in dsir_logweights(docs, F.col("is_tgt")).collect()}
    # the 10 target-looking pool docs (ids 90..99) land positive
    assert all(out[i].selected for i in range(90, 100))
    # commerce pool docs land negative
    assert all(not out[i].selected for i in range(30, 90))
    # target docs score themselves positive (sanity direction)
    assert sum(out[i].selected for i in range(30)) >= 28
    # blank doc: zero tokens, NULL weight, not selected
    blank = out[100]
    assert blank.n_tokens == 0 and blank.logweight is None and not blank.selected


def test_per_token_normalization_is_length_free(spark):
    rows = [
        (0, True, " ".join(TARGET_WORDS)),
        (1, False, " ".join(POOL_WORDS * 4)),
        (2, False, " ".join(TARGET_WORDS)),        # short target-like
        (3, False, " ".join(TARGET_WORDS * 10)),   # long target-like
    ]
    docs = spark.createDataFrame(rows, "doc_id long, is_tgt boolean, text string")
    out = {r.doc_id: r for r in dsir_logweights(docs, F.col("is_tgt")).collect()}
    # same token distribution at different lengths -> same per-token weight
    assert out[2].logweight == out[3].logweight


def test_deterministic(spark):
    docs = _corpus(spark)
    a = sorted(map(tuple, dsir_logweights(docs, F.col("is_tgt")).collect()))
    b = sorted(map(tuple, dsir_logweights(docs, F.col("is_tgt")).collect()))
    assert a == b
