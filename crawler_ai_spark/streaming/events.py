"""Structured Streaming layer — the streaming twins of the batch event
queries (catalog.events_hourly / events_sessionize).

The engine's crawl loop is deliberately a BATCH loop (SURVEY.md §1.6 —
deterministic, resumable ordering), but the metrics/events side of a
production crawl is a stream: fetch telemetry arriving continuously.
This module gives it the standard Spark treatment:

- ``stream_events``: file-source stream over an events parquet directory
  (schema pinned; new files picked up as they land — exactly how a crawl's
  per-batch metric appends become a stream).
- ``hourly_rollup``: watermarked tumbling-window aggregation; late rows
  beyond the watermark are dropped, within it they update their window —
  the streaming superset of the batch events_hourly query (same keys, same
  integer-scaled values, so a completed window equals the batch result).
- ``sessionize``: per-user 30-min-gap sessions via
  ``applyInPandasWithState`` (GroupState timeout) — the streaming twin of
  the batch lag/cumsum sessionization; emits a row per CLOSED session.

Tests drive these with Trigger.AvailableNow against a copy of the sf
events table and compare against the batch twins."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def stream_events(spark: SparkSession, events_dir: str, max_files: int = 4) -> DataFrame:
    """File-source event stream (one new file per micro-batch cap keeps
    the demo deterministic)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(events_dir)
    )


def hourly_rollup(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1h × event_type counts/sums, late data beyond ``watermark``
    dropped. Output keys match catalog.events_hourly (hour_str string —
    session-tz-proof)."""
    ts = F.col("ts").cast("timestamp")
    return (
        stream.withColumn("ts", ts)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 1000).cast("long")).alias("value_milli"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("hour_str"),
            "event_type",
            "n_events",
            "value_milli",
        )
    )


SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_ms", LongType()),
        StructField("n_events", LongType()),
        StructField("duration_ms", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_ms", LongType()),
        StructField("last_ms", LongType()),
        StructField("n", LongType()),
    ]
)

SESSION_GAP_MS = 30 * 60 * 1000


def _session_fn(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user session accumulator. Emits CLOSED sessions; the open
    session stays in GroupState (on a continuous stream the next event or
    a downstream TTL policy closes it — a processing-time flush timer is
    deliberately NOT used: AvailableNow drains spin state-cleanup
    micro-batches until every pending timer fires, which never converges
    on an idle source)."""
    (user_id,) = key
    if state.exists:
        start_ms, last_ms, n = state.get
    else:
        start_ms = last_ms = None
        n = 0

    closed = []
    for pdf in pdfs:
        ms = (pdf["ts"].astype("int64") // 1_000_000).sort_values()
        for t in ms:
            t = int(t)
            if last_ms is None:
                start_ms, last_ms, n = t, t, 1
            elif t - last_ms > SESSION_GAP_MS:
                closed.append([user_id, start_ms, n, last_ms - start_ms])
                start_ms, last_ms, n = t, t, 1
            else:
                last_ms = max(last_ms, t)
                n += 1
    if start_ms is not None:
        state.update((start_ms, last_ms, n))
    if closed:
        yield pd.DataFrame(closed, columns=[f.name for f in SESSION_SCHEMA.fields])


def sessionize(stream: DataFrame) -> DataFrame:
    """Streaming 30-min-gap sessionization (applyInPandasWithState)."""
    return (
        stream.select("user_id", F.col("ts").cast("timestamp").alias("ts"))
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_to_parquet(
    result: DataFrame, out_dir: str, checkpoint_dir: str, complete: bool = False
) -> None:
    """Drain the stream with AvailableNow into parquet (test/demo sink).
    ``complete`` mode routes via foreachBatch overwrite (aggregations)."""
    if complete:
        q = (
            result.writeStream.outputMode("complete")
            .foreachBatch(
                lambda df, _id: df.write.mode("overwrite").parquet(out_dir)
            )
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
    else:
        q = (
            result.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
    q.awaitTermination()
