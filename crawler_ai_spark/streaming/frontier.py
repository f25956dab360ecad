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

# state: the newest window seen plus a JSON map of per-window ACCEPTED
# counts for every retained window — late arrivals within the retention
# horizon charge their own window's budget instead of resetting it
BUDGET_STATE_SCHEMA = StructType(
    [StructField("max_win_ms", LongType()), StructField("counts_json", StringType())]
)


def _window_ms(window: str) -> int:
    n, unit = window.split()
    mult = {
        "second": 1_000, "seconds": 1_000,
        "minute": 60_000, "minutes": 60_000,
        "hour": 3_600_000, "hours": 3_600_000,
    }[unit]
    return int(n) * mult


def _budget_fn(budget: int, window_ms: int, late_windows: int):
    import json

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        # the group key is the politeness GRAIN (host, or registrable
        # domain); each output row reports its own host column, which
        # coincides with the key only at host grain
        (_grain,) = key
        if state.exists:
            max_win, counts_json = state.get
            counts = {int(k): int(v) for k, v in json.loads(counts_json).items()}
        else:
            max_win, counts = -1, {}
        # one total order per group and micro-batch: a hot host's rows can
        # arrive as multiple Arrow chunks whose relative order is the
        # shuffle-merge order — sorting per chunk would not be a total order
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.dropna(subset=["ts"])  # defense-in-depth; stream filters too
        if pdf.empty:
            state.update((int(max_win), json.dumps(counts)))
            return
        pdf = pdf.assign(ts_ms=pdf["ts"].astype("int64") // 1_000_000).sort_values(
            ["ts_ms", "url"]
        )
        horizon = late_windows * window_ms
        out = []
        for r in pdf.itertuples(index=False):
            w = (int(r.ts_ms) // window_ms) * window_ms
            if w > max_win:
                max_win = w
                counts = {k: v for k, v in counts.items() if k >= max_win - horizon}
            if w < max_win - horizon:
                # beyond retention: state for that window is gone — defer
                # (politeness is never violated by forgetting; a dropped
                # accept only under-fills the old window)
                ok = False
            else:
                n = counts.get(w, 0)
                ok = n < budget
                if ok:
                    counts[w] = n + 1
            out.append([r.host, r.url, r.seed_url, r.priority, int(r.ts_ms), w, ok])
        state.update((int(max_win), json.dumps(counts)))
        yield pd.DataFrame(out, columns=[f.name for f in BUDGET_OUT_SCHEMA.fields])

    return fn


def host_budget_stream(
    stream: DataFrame,
    budget: int,
    window: str = "10 minutes",
    late_windows: int = 2,
    grain: str = "host",
) -> DataFrame:
    """Per-(grain, tumbling window) politeness cap; accepted = first
    ``budget`` arrivals per window, the rest flagged for re-queue (defer,
    not drop). Arrivals up to ``late_windows`` windows late still charge
    their own window's budget; beyond that horizon they are deferred
    outright. Rows with a null event time are invalid input and filtered
    before the stateful operator (one poison row would otherwise fail the
    micro-batch and replay forever).

    ``grain="domain"`` keys the state store by PSL registrable domain
    instead of host — the streaming twin of the batch
    apply_domain_budget (all subdomains of one registrant share one
    window budget; bare public suffixes fall back to host grain)."""
    wm = _window_ms(window)
    cols = (
        with_frontier_cols(stream)
        .where(F.col("ts").isNotNull())
        .select("host", "url", "seed_url", "priority", "ts")
    )
    if grain == "domain":
        from crawler_ai_spark.functions.urls import registered_domain_expr

        cols = cols.withColumn(
            "_grain",
            F.coalesce(registered_domain_expr(F.col("host")), F.col("host")),
        )
    elif grain == "host":
        cols = cols.withColumn("_grain", F.col("host"))
    else:  # pragma: no cover - caller bug
        raise ValueError(f"unknown politeness grain: {grain!r}")
    return cols.groupBy("_grain").applyInPandasWithState(
        _budget_fn(budget, wm, late_windows),
        outputStructType=BUDGET_OUT_SCHEMA,
        stateStructType=BUDGET_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def trap_gate_stream(stream: DataFrame) -> DataFrame:
    """Stateless spider-trap gate for the streaming intake: the same
    pure-JVM URL-structure signals as the batch loop's
    ``CrawlConfig.trap_filter`` (functions/traps.py), applied BEFORE the
    dedup state store so a trap storm (calendar pager, session-id echo)
    never occupies streaming state. Stateless map-side filter — valid
    under any trigger/watermark combination, and composable in the same
    query as one stateful stage."""
    from crawler_ai_spark.functions.traps import is_trap_expr

    return stream.where(~is_trap_expr(F.col("url")))
