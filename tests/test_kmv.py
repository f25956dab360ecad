"""KMV distinct sketches (operators/anf.py: kmv_distinct): exact regime,
estimation accuracy, mergeability, salt invariance. Cross-engine
identity is pinned by the catalog's host_distinct_kmv oracle row."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_ai_spark.operators.anf import _estimate, _merge, kmv_distinct


def _df(spark, spec):
    rows = []
    for g, n_distinct, copies in spec:
        rows += [(g, f"{g}/u{i % n_distinct}") for i in range(n_distinct * copies)]
    return spark.createDataFrame(rows, "host string, url string")


def test_exact_below_k(spark):
    out = {
        r.host: r
        for r in kmv_distinct(_df(spark, [("a", 10, 5), ("b", 31, 2)]), "host", "url", k=32).collect()
    }
    assert out["a"].distinct_est == 10.0      # sketch IS the set
    assert out["b"].distinct_est == 31.0
    assert len(out["a"].sketch) == 10


def test_estimation_accuracy(spark):
    out = kmv_distinct(_df(spark, [("big", 2000, 2)]), "host", "url", k=64).collect()[0]
    assert abs(out.distinct_est - 2000) / 2000 < 0.30
    assert len(out.sketch) == 64


def test_sketches_merge_to_union(spark):
    # sketch(A) merge sketch(B) == sketch(A ∪ B): the incremental-batch
    # property — estimated from merged sketches vs computed directly
    a = kmv_distinct(_df(spark, [("h", 500, 1)]), "host", "url", k=32).collect()[0]
    rows_b = [("h", f"h/v{i}") for i in range(400)]
    b = kmv_distinct(
        spark.createDataFrame(rows_b, "host string, url string"), "host", "url", k=32
    ).collect()[0]
    both = _df(spark, [("h", 500, 1)]).unionAll(
        spark.createDataFrame(rows_b, "host string, url string")
    )
    direct = kmv_distinct(both, "host", "url", k=32).collect()[0]
    merged_df = spark.createDataFrame(
        [(list(a.sketch), list(b.sketch))], "s1 array<long>, s2 array<long>"
    ).select(
        _merge(F.array(F.col("s1"), F.col("s2")), 32).alias("m")
    ).select(F.col("m"), _estimate(F.col("m"), 32).alias("est"))
    m = merged_df.collect()[0]
    assert list(m.m) == list(direct.sketch)
    assert m.est == direct.distinct_est


def test_salt_invariance(spark):
    df = _df(spark, [("h", 300, 3)])
    a = kmv_distinct(df, "host", "url", k=16, salts=1).collect()[0]
    b = kmv_distinct(df, "host", "url", k=16, salts=8).collect()[0]
    assert list(a.sketch) == list(b.sketch) and a.distinct_est == b.distinct_est
