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

    surv = {r.url_hash: r.ts for r in spark.read.parquet(out).collect()}
    batch = SFR.with_frontier_cols(spark.read.parquet(cand_dir))
    want = {r.url_hash for r in batch.select("url_hash").distinct().collect()}
    assert set(surv) == want
    # exactly one row per key survived
    assert spark.read.parquet(out).count() == len(want)
    # FIRST arrival wins: the survivor carries the minimum ts per key
    first = {
        r.url_hash: r.min_ts
        for r in batch.groupBy("url_hash").agg(F.min("ts").alias("min_ts")).collect()
    }
    assert surv == first


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


class _FakeState:
    """Minimal GroupState stand-in for driving _budget_fn directly."""

    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def _drive(batches, budget=2, window_ms=60_000, late_windows=2):
    import pandas as pd

    fn = SFR._budget_fn(budget, window_ms, late_windows)
    state = _FakeState()
    out = []
    for rows in batches:
        pdf = pd.DataFrame(
            rows, columns=["url", "seed_url", "priority", "ts"]
        ).assign(
            host="h0.example",  # the real pipeline always carries host
            ts=lambda d: pd.to_datetime(d["ts"], unit="ms", utc=True).dt.tz_localize(None),
        )
        out.extend(
            r for chunk in fn(("h0",), iter([pdf]), state) for r in chunk.itertuples(index=False)
        )
    return out


def test_budget_out_of_order_arrivals_never_exceed_cap():
    """A late row from an older window charges THAT window's budget —
    it must not reset the current window's count (the single-window-state
    bug class) nor over-accept in its own window."""
    W = 60_000
    mk = lambda i, t: (f"https://h0.example/p{i}", "s", 100, t)  # noqa: E731
    batches = [
        # batch 1: window 1 fills its budget (2 of 3 accepted)
        [mk(1, W + 1000), mk(2, W + 2000), mk(3, W + 3000)],
        # batch 2: window 2 fills its budget
        [mk(4, 2 * W + 1000), mk(5, 2 * W + 2000)],
        # batch 3: a LATE window-1 row (must not reset window 2's count)
        # plus another window-2 row (budget there already spent)
        [mk(6, W + 50_000), mk(7, 2 * W + 3000)],
        # batch 4: jump ahead, then a row 4 windows late — beyond the
        # 2-window retention, deferred outright
        [mk(8, 5 * W + 1000), mk(9, W + 55_000)],
    ]
    rows = _drive(batches, budget=2, window_ms=W, late_windows=2)
    by_url = {r.url.rsplit("p", 1)[1]: r for r in rows}
    by_win = {}
    for r in rows:
        by_win.setdefault(r.win_start_ms, []).append(r.accepted)
    # cap holds in every window, including for the late arrivals
    assert all(sum(a) <= 2 for a in by_win.values())
    assert [by_url[str(i)].accepted for i in (1, 2, 3)] == [True, True, False]
    assert by_url["6"].accepted is False           # late w1 row: budget spent
    assert by_url["7"].accepted is False           # w2 unaffected by late row
    assert [by_url[str(i)].accepted for i in (4, 5)] == [True, True]
    assert by_url["8"].accepted is True
    assert by_url["9"].accepted is False           # beyond retention → deferred
    # defer-not-drop: every input row came out
    assert len(rows) == 9


def test_trap_gate_stream_equals_batch(spark, tmp_path):
    """Stateless trap gate: streaming output == the batch trap filter on
    the same files, and it composes before the stateful dedup."""
    root = tmp_path / "trap_in"
    rows = []
    for i in range(30):
        host = f"h{i % 3}"
        if i % 5 == 0:
            url = f"https://{host}.example/a/b/a/b/a/b/item-{i}"  # loop trap
        elif i % 5 == 1:
            url = f"https://{host}.example/page-{i}?jsessionid={i}"  # session
        else:
            url = f"https://{host}.example/p{i}"
        rows.append(
            (url, "https://seed.example/", 50, T0 + datetime.timedelta(seconds=i))
        )
    df = spark.createDataFrame(
        rows, "url string, seed_url string, priority int, ts timestamp"
    )
    df.coalesce(1).write.parquet(str(root))

    stream = SFR.stream_candidates(spark, str(root), max_files=1)
    out, ck = str(tmp_path / "tout"), str(tmp_path / "tck")
    SE.run_to_parquet(
        SFR.dedup_candidates(SFR.trap_gate_stream(stream)), out, ck
    )
    got = {r.url for r in spark.read.parquet(out).collect()}

    from crawler_ai_spark.functions.traps import is_trap_expr

    want = {
        r.url
        for r in spark.read.parquet(str(root))
        .where(~is_trap_expr(F.col("url")))
        .collect()
    }
    assert got == want
    assert len(want) == 18  # the 12 trap rows (2 of every 5) are gone


@pytest.fixture(scope="module")
def subdomain_cand_dir(spark, tmp_path_factory):
    """Candidates whose hosts are 4 subdomains of ONE registrable domain
    plus one unrelated registrant: the domain grain must pool the first
    four into a single window budget."""
    root = tmp_path_factory.mktemp("stream_dom_cand")
    rows = []
    for i in range(60):
        host = (
            f"s{i % 4}.shared.example" if i % 5 != 4 else "solo.example"
        )
        rows.append(
            (
                f"https://{host}/p{i}",
                "https://seed.example/",
                100,
                T0 + datetime.timedelta(seconds=15 * i),
            )
        )
    spark.createDataFrame(
        rows, "url string, seed_url string, priority int, ts timestamp"
    ).coalesce(1).write.parquet(str(root / "in"))
    return str(root / "in")


def test_domain_grain_budget_stream(spark, subdomain_cand_dir, tmp_path):
    from crawler_ai_spark.functions.urls import registered_domain_expr

    stream = SFR.stream_candidates(spark, subdomain_cand_dir, max_files=1)
    out, ck = str(tmp_path / "dout"), str(tmp_path / "dck")
    SE.run_to_parquet(
        SFR.host_budget_stream(stream, BUDGET, "10 minutes", grain="domain"), out, ck
    )
    got = spark.read.parquet(out)
    inp = SFR.with_frontier_cols(spark.read.parquet(subdomain_cand_dir))
    assert got.count() == inp.count()  # defer-not-drop

    # batch twin at the registrable-domain grain
    w = Window.partitionBy(
        F.coalesce(registered_domain_expr(F.col("host")), F.col("host")),
        ((F.col("ts_ms") / WINDOW_MS).cast("long") * WINDOW_MS).cast("long"),
    ).orderBy("ts_ms", "url")
    batch = (
        inp.withColumn("ts_ms", (F.col("ts").cast("double") * 1000).cast("long"))
        .withColumn("rk", F.row_number().over(w))
        .withColumn("want_accept", F.col("rk") <= BUDGET)
    )
    want = {(r.host, r.url, r.ts_ms): r.want_accept for r in batch.collect()}
    for r in got.collect():
        assert r.accepted == want[(r.host, r.url, r.ts_ms)], (r.host, r.url)
    # and the pooling is real: within one window the shared registrant
    # accepted exactly BUDGET rows across its 4 subdomains
    first_win = got.where(
        (F.col("win_start_ms") == got.agg(F.min("win_start_ms")).first()[0])
        & F.col("host").endswith(".shared.example")
    )
    assert first_win.where("accepted").count() == BUDGET
