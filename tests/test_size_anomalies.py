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


def test_zipf_hot_host_value_grain_and_batch_grain(spark):
    """Skew guard + per-batch grain: medians/MAD window distinct
    (host, value) counts (no per-row ranking window in the plan), and
    grain_cols=('batch_id',) reproduces per-batch stats exactly."""
    rows = [("hot", f"u{i}", 40000 + (i % 25) * 100) for i in range(5000)]
    rows += [("hot", "err", 300)]
    df = spark.createDataFrame(rows, "host string, url string, n_bytes long")
    out = size_anomalies(df)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "row_number" not in plan and "HashAggregate" in plan
    got = {r.url: r for r in out.collect()}
    assert got["err"].anomalous and not got["u0"].anomalous
    # lower median of 5001 values: rank 2501 over the 25-value cluster
    assert got["u0"].host_median == 41200

    bdf = spark.createDataFrame(
        [("h", f"u{i}", 1000 * (1 + i % 2) + i, i % 2) for i in range(12)],
        "host string, url string, n_bytes long, batch_id int",
    )
    per_batch = size_anomalies(bdf, grain_cols=("batch_id",))
    meds = {
        (r.host, r.batch_id): r.host_median for r in per_batch.collect()
    }
    # batch 0 sizes 1000,1002,...,1010 → lower median 1004;
    # batch 1 sizes 2001,2003,...,2011 → 2005
    assert meds[("h", 0)] == 1004 and meds[("h", 1)] == 2005
