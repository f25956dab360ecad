"""Streaming frontier-ingest twins (streaming/frontier.py): drained with
AvailableNow, the stateful dedup and host-budget operators must agree
with their batch twins on the same candidate files."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from crawler_ai_spark.streaming import events as SE
from crawler_ai_spark.streaming import frontier as SFR

BUDGET = 3
WINDOW_MS = 600_000

T0 = datetime.datetime(2025, 6, 1, 12, 0, 0)


@pytest.fixture(scope="module")
def cand_dir(spark, tmp_path_factory):
    """Four candidate files = four micro-batches. Zipf-ish host skew
    (host0 hot), duplicate URLs across files, strictly increasing ts
    (arrival order == event order, the module's contract)."""
    root = tmp_path_factory.mktemp("cand_stream")
    rows = []
    seq = 0
    for f in range(4):
        for i in range(40):
            host = f"h{(i * i) % 7}"  # skewed: h0,h1,h2,h4 recur
            # every 5th row repeats an earlier URL (cross-file duplicates)
            page = (seq - 7) if (i % 5 == 0 and seq > 7) else seq
            rows.append(
                (
                    f"https://{host}.example/p{page}",
                    "https://seed.example/",
                    100 - (i % 4) * 10,
                    T0 + datetime.timedelta(seconds=15 * seq),
                )
            )
            seq += 1
        df = spark.createDataFrame(
            rows[-40:], "url string, seed_url string, priority int, ts timestamp"
        )
        df.coalesce(1).write.mode("append").parquet(str(root / "in"))
    return str(root / "in")


def test_dedup_stream_equals_batch_first_wins(spark, cand_dir, tmp_path):
    stream = SFR.stream_candidates(spark, cand_dir, max_files=1)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    SE.run_to_parquet(SFR.dedup_candidates(stream), out, ck)

    got = {r.url_hash for r in spark.read.parquet(out).collect()}
    batch = SFR.with_frontier_cols(spark.read.parquet(cand_dir))
    want = {r.url_hash for r in batch.select("url_hash").distinct().collect()}
    assert got == want
    # exactly one row per key survived
    assert spark.read.parquet(out).count() == len(want)


def test_host_budget_stream_equals_batch(spark, cand_dir, tmp_path):
    stream = SFR.stream_candidates(spark, cand_dir, max_files=1)
    out, ck = str(tmp_path / "bout"), str(tmp_path / "bck")
    SE.run_to_parquet(SFR.host_budget_stream(stream, BUDGET, "10 minutes"), out, ck)

    got = spark.read.parquet(out)
    inp = SFR.with_frontier_cols(spark.read.parquet(cand_dir))

    # defer-not-drop: every input row came out exactly once
    assert got.count() == inp.count()
    assert {(r.host, r.url, r.ts_ms) for r in got.collect()} == {
        (r.host, r.url, int(r.ts.timestamp() * 1000)) for r in inp.collect()
    }

    # batch twin: first BUDGET arrivals per (host, window) by (ts, url)
    w = Window.partitionBy(
        "host", ((F.col("ts_ms") / WINDOW_MS).cast("long") * WINDOW_MS).cast("long")
    ).orderBy("ts_ms", "url")
    batch = (
        inp.withColumn("ts_ms", (F.col("ts").cast("double") * 1000).cast("long"))
        .withColumn("rk", F.row_number().over(w))
        .withColumn("want_accept", F.col("rk") <= BUDGET)
    )
    want = {(r.host, r.url, r.ts_ms): r.want_accept for r in batch.collect()}
    for r in got.collect():
        assert r.accepted == want[(r.host, r.url, r.ts_ms)], (r.host, r.url)
        assert r.win_start_ms == (r.ts_ms // WINDOW_MS) * WINDOW_MS

    # politeness invariant: never more than BUDGET accepted per (host, win)
    per = (
        got.where("accepted")
        .groupBy("host", "win_start_ms")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert per <= BUDGET
    # and the hot host actually hit the cap (non-degenerate)
    assert per == BUDGET
