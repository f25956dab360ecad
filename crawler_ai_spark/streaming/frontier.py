"""Structured Streaming twins of the frontier-ingest operators (D2/W2).

The crawl loop itself stays a BATCH loop (deterministic, resumable
ordering — SURVEY.md §1.6); this module covers the streaming half of a
production crawl's intake: candidate URLs arriving continuously from
fetch workers, deduped and politeness-budgeted before they are appended
to the frontier table the batch scheduler consumes.

- ``stream_candidates``: file-source stream over candidate parquet
  appends (each crawl batch's harvest becomes a micro-batch).
- ``dedup_candidates``: first-arrival-wins URL dedup via
  ``dropDuplicatesWithinWatermark`` on the 64-bit url_hash — the
  streaming state store holds ONLY the watermark horizon of keys, not
  crawl history (bounded state at any scale). Whole-history dedup
  remains the batch loop's bloom + exact anti-join (operators/seen.py);
  this stage removes the duplicate storm inside the horizon so the
  batch layer sees each URL once per window.
- ``host_budget_stream``: per-host politeness cap per tumbling window as
  a custom stateful operator (``applyInPandasWithState`` keyed on host,
  state = current window + count). Accepted rows are the first ``budget``
  arrivals per (host, window) — arrival-order semantics, the streaming
  counterpart of the batch priority-order ``apply_host_budget``
  (operators/frontier.py); rejected rows are emitted with
  ``accepted=false`` so a downstream stage can re-queue them, mirroring
  the batch path's defer-not-drop contract.

Each function is a single stateful operator so any combination can be
staged through parquet between queries (multi-stateful chaining in one
query is restricted); tests drive them with Trigger.AvailableNow and pin
streaming ≡ batch equivalence.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from crawler_ai_spark.functions.urls import host_expr, url_hash

CANDIDATE_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("seed_url", StringType()),
        StructField("priority", IntegerType()),
        StructField("ts", TimestampType()),
    ]
)


def stream_candidates(spark: SparkSession, cand_dir: str, max_files: int = 1) -> DataFrame:
    """Candidate-URL stream (one file per micro-batch keeps tests
    deterministic; production would land one file per harvest task)."""
    return (
        spark.readStream.schema(CANDIDATE_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(cand_dir)
    )


def with_frontier_cols(stream: DataFrame) -> DataFrame:
    return stream.withColumn("url_hash", url_hash(F.col("url"))).withColumn(
        "host", host_expr(F.col("url"))
    )


def dedup_candidates(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """First-arrival-wins dedup on url_hash with watermark-bounded state."""
    return with_frontier_cols(stream).withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["url_hash"]
    )


BUDGET_OUT_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("url", StringType()),
        StructField("seed_url", StringType()),
        StructField("priority", IntegerType()),
        StructField("ts_ms", LongType()),
        StructField("win_start_ms", LongType()),
        StructField("accepted", BooleanType()),
    ]
)

BUDGET_STATE_SCHEMA = StructType(
    [StructField("win_ms", LongType()), StructField("n", LongType())]
)


def _budget_fn(budget: int, window_ms: int):
    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (host,) = key
        win_ms, n = state.get if state.exists else (-1, 0)
        out = []
        for pdf in pdfs:
            pdf = pdf.assign(ts_ms=pdf["ts"].astype("int64") // 1_000_000)
            # deterministic within-batch order; across micro-batches the
            # source's file order IS arrival order
            pdf = pdf.sort_values(["ts_ms", "url"])
            for r in pdf.itertuples(index=False):
                w = (r.ts_ms // window_ms) * window_ms
                if w != win_ms:
                    win_ms, n = w, 0
                ok = n < budget
                n += 1 if ok else 0
                out.append([host, r.url, r.seed_url, r.priority, r.ts_ms, w, ok])
        state.update((int(win_ms), int(n)))
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in BUDGET_OUT_SCHEMA.fields])

    return fn


def host_budget_stream(
    stream: DataFrame, budget: int, window: str = "10 minutes"
) -> DataFrame:
    """Per-(host, tumbling window) politeness cap; accepted = first
    ``budget`` arrivals, the rest flagged for re-queue (defer, not drop)."""
    window_ms = {"10 minutes": 600_000, "1 minute": 60_000, "1 hour": 3_600_000}.get(
        window
    )
    if window_ms is None:
        raise ValueError(f"unsupported window: {window}")
    cols = with_frontier_cols(stream).select("host", "url", "seed_url", "priority", "ts")
    return cols.groupBy("host").applyInPandasWithState(
        _budget_fn(budget, window_ms),
        outputStructType=BUDGET_OUT_SCHEMA,
        stateStructType=BUDGET_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
