"""Size anomalies (operators/autothrottle.py: size_anomalies): planted
error-page / tarpit outliers flag, the cluster does not; zero-MAD hosts
flag exact deviants only. Cross-engine identity pinned by the catalog's
fetch_size_anomalies oracle row."""

from __future__ import annotations

from crawler_ai_spark.operators.autothrottle import size_anomalies


def test_outliers_and_cluster(spark):
    rows = [("h", f"u{i}", 40000 + (i % 7) * 100) for i in range(20)]
    rows += [("h", "err", 300), ("h", "tarpit", 10_000_000)]
    df = spark.createDataFrame(rows, "host string, url string, n_bytes long")
    out = {r.url: r for r in size_anomalies(df).collect()}
    assert out["err"].anomalous and out["tarpit"].anomalous
    assert not any(out[f"u{i}"].anomalous for i in range(20))
    assert out["err"].mod_z > 3.5


def test_zero_mad_host(spark):
    rows = [("f", f"p{i}", 5000) for i in range(6)] + [("f", "odd", 5001)]
    df = spark.createDataFrame(rows, "host string, url string, n_bytes long")
    out = {r.url: r for r in size_anomalies(df).collect()}
    assert out["odd"].anomalous and out["odd"].mod_z is None
    assert not out["p0"].anomalous
