"""IVF-PQ (pipeline/similarity.py): codebook determinism, bytes-only
index layout, ADC sanity, refined recall ≥ 0.9, and run-to-run
determinism of the full query path."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawler_ai_spark.pipeline import similarity as SIM

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def queries(emb):
    return emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


@pytest.fixture(scope="module")
def index(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivfpq_idx"))
    SIM.build_ivfpq_index(emb, path, n_centroids=16, m=16, pq_k=64)
    return path


def test_codebooks_deterministic_and_shaped():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(400, 64))
    a = SIM.train_pq_codebooks(x, m=8, k=16)
    b = SIM.train_pq_codebooks(x, m=8, k=16)
    assert a.shape == (8, 16, 8)
    assert np.array_equal(a, b)
    with pytest.raises(ValueError, match="not divisible"):
        SIM.train_pq_codebooks(x, m=7)


def test_index_stores_codes_not_vectors(spark, index):
    cells = spark.read.parquet(f"{index}/cells")
    assert set(cells.columns) == {"neighbor_id", "code", "cell"}
    row = cells.limit(1).collect()[0]
    assert len(row.code) == 16 and all(0 <= c < 64 for c in row.code)
    # the compression claim: 16 small ints vs 64 floats, no embedding col
    assert "embedding" not in cells.columns and "c_vec" not in cells.columns


def test_adc_shortlist_contains_signal(spark, emb, queries, index):
    """ADC alone (codes only, no refine) must already put a solid share
    of the true top-10 into a 4x shortlist — the property that makes the
    refine step a point lookup rather than a rescue scan."""
    short = SIM.ivfpq_topk_indexed(spark, index, queries, k=40, n_probe=12)
    brute = SIM.cosine_topk(queries, emb, k=10, q_id="query_id").select(
        "query_id", "neighbor_id"
    )
    hits = brute.join(
        short.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"], "left_semi"
    ).count()
    assert hits / brute.count() >= 0.8, hits


def test_refined_recall_and_determinism(spark, emb, queries, index):
    got = SIM.ivfpq_topk_refined(
        spark, index, queries, emb, k=10, n_probe=12, shortlist_mult=6
    )
    brute = SIM.cosine_topk(queries, emb, k=10, q_id="query_id").select(
        "query_id", "neighbor_id"
    )
    hits = brute.join(
        got.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"], "left_semi"
    ).count()
    assert hits / brute.count() >= 0.9
    again = SIM.ivfpq_topk_refined(
        spark, index, queries, emb, k=10, n_probe=12, shortlist_mult=6
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, again.collect()))


def test_sq8_recall_vs_exact(spark, fixture_root):
    """SQ8 path: recall@10 vs exact cosine must be ≥0.9 (per-dim step
    error is tiny on real spreads), and the quantizer must actually
    quantize (codes differ from raw floats)."""
    from crawler_ai_spark.pipeline.similarity import cosine_topk, sq8_topk

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = emb.where("vec_id < 20").selectExpr("vec_id AS query_id", "embedding")
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(queries, emb, k=10).collect()}
    approx = {(r.query_id, r.neighbor_id) for r in sq8_topk(queries, emb, k=10).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, recall
    # cosine values should differ slightly from exact (it IS lossy)
    ex_cos = {(r.query_id, r.neighbor_id): r.cosine for r in cosine_topk(queries, emb, k=10).collect()}
    ap_cos = {(r.query_id, r.neighbor_id): r.cosine for r in sq8_topk(queries, emb, k=10).collect()}
    common = set(ex_cos) & set(ap_cos)
    assert any(abs(ex_cos[p] - ap_cos[p]) > 0 for p in common)
    assert all(abs(ex_cos[p] - ap_cos[p]) < 0.01 for p in common)
