"""Structured Streaming tests: the streamed rollup must equal its batch
twin once the stream drains (AvailableNow), and sessionization must close
sessions correctly across micro-batches."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from crawler_ai_spark.streaming import events as SE

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Events split into several parquet files → several micro-batches."""
    root = tmp_path_factory.mktemp("events_stream")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ev.repartition(4).write.mode("overwrite").parquet(str(root / "in"))
    return str(root / "in")


def test_hourly_rollup_equals_batch(spark, events_dir, tmp_path):
    stream = SE.stream_events(spark, events_dir, max_files=1)
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    SE.run_to_parquet(SE.hourly_rollup(stream), out, ck, complete=True)

    got = spark.read.parquet(out)
    # batch twin over the same files
    ev = spark.read.parquet(events_dir).withColumn("ts", F.col("ts").cast("timestamp"))
    want = (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour_str"
            ),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 1000).cast("long")).alias("value_milli"),
        )
    )
    g = {tuple(r) for r in got.collect()}
    w = {tuple(r) for r in want.collect()}
    assert g == w


def test_sessionize_stream(spark, events_dir, tmp_path):
    stream = SE.stream_events(spark, events_dir, max_files=4)
    out = str(tmp_path / "sess_out")
    ck = str(tmp_path / "sess_ck")
    SE.run_to_parquet(SE.sessionize(stream), out, ck)

    got = spark.read.parquet(out)
    # closed sessions must be a subset of the batch sessionization (open
    # sessions at stream end stay in state), with identical counts/durations
    ev = spark.read.parquet(events_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wc = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    flagged = ev.withColumn(
        "new_s",
        F.when((ms - F.lag(ms).over(w) > 1800000) | F.lag(ms).over(w).isNull(), 1).otherwise(0),
    )
    batch = (
        flagged.withColumn("sid", F.sum("new_s").over(wc))
        .groupBy("user_id", "sid")
        .agg(
            F.count("*").alias("n_events"),
            F.min(ms).alias("session_start_ms"),
            (F.max(ms) - F.min(ms)).alias("duration_ms"),
        )
    )
    # expected = batch sessions MINUS each user's last (still-open) session
    from pyspark.sql import Window as W2

    wlast = W2.partitionBy("user_id").orderBy(F.col("session_start_ms").desc())
    closed_batch = (
        batch.withColumn("_r", F.row_number().over(wlast)).where("_r > 1").drop("_r")
    )
    b = {
        (r.user_id, r.session_start_ms, r.n_events, r.duration_ms)
        for r in closed_batch.collect()
    }
    g = {(r.user_id, r.session_start_ms, r.n_events, r.duration_ms) for r in got.collect()}
    assert g, "stream emitted no closed sessions"
    assert g == b, f"stream≠batch: extra={sorted(g - b)[:3]} missing={sorted(b - g)[:3]}"
