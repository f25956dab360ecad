"""W4 server-directed backoff (RFC 9110 §10.2.3): a 429/503 carrying
Retry-After defers the whole host (defer-not-drop) until the directive
elapses; other hosts are untouched; longest directive wins; the state
survives resume."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_ai_spark.functions.errors import retry_after_seconds_expr
from crawler_ai_spark.plans.crawl_loop import (
    CrawlConfig,
    CrawlStore,
    _advance_backoff,
    run_crawl,
)
from crawler_ai_spark.sources import fetch as FS

_PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, lang string, "
    "status int, fetch_error string"
)

_RL_HOST = "rlhost0.example"


def _ok_seed_urls(n):
    out, i = [], 0
    while len(out) < n:
        u = f"https://rasite{i}.example/"
        if FS._url_key(u) % 100 < 85:
            out.append(u)
        i += 1
    return out


def _rate_limited_transport():
    """429 + Retry-After=7200 for the rate-limited host; synthetic
    everywhere else. A closure so cloudpickle ships it BY VALUE (a
    module-level test function is pickled by reference and the test
    module is not importable on executors)."""
    rl_host = _RL_HOST

    def transport(url, headers):
        if rl_host in url:
            return 429, None, "429 rate limited", {"Retry-After": "7200"}
        return FS.SyntheticTransport()(url, headers)

    return transport


def test_retry_after_seconds_expr(spark):
    now = F.to_timestamp(F.lit("1994-11-06 08:00:00"))
    df = spark.createDataFrame(
        [
            ("120",),
            (" 30 ",),
            ("Sun, 06 Nov 1994 08:49:37 GMT",),
            ("Sun, 06 Nov 1994 07:00:00 GMT",),  # past → clamp 0
            ("soon",),
            (None,),
        ],
        "ra string",
    )
    got = [
        r.s
        for r in df.select(
            retry_after_seconds_expr(F.col("ra"), now).alias("s")
        ).collect()
    ]
    assert got == [120, 30, 2977, 0, None, None]
    # without a wall clock the date form is unparsable (loop contract)
    got2 = [
        r.s
        for r in df.select(retry_after_seconds_expr(F.col("ra")).alias("s")).collect()
    ]
    assert got2 == [120, 30, None, None, None, None]


def test_advance_backoff_state_machine(spark):
    def gated(rows):
        return spark.createDataFrame(
            rows, "host string, status int, retry_after string"
        )

    empty = spark.createDataFrame([], "host string, eligible_batch long")
    # batch 1: a → 7200 s (2 batches), b → 200 with header (ignored),
    # c → 429 without header (ignored), d → garbage (minimum 1 batch)
    s1 = _advance_backoff(
        empty,
        gated(
            [
                ("a", 429, "7200"),
                ("b", 200, "7200"),
                ("c", 429, None),
                ("d", 503, "Sun, 06 Nov 1994 08:49:37 GMT"),
            ]
        ),
        1,
        interval_s=3600,
        cap=16,
    )
    rows = {r.host: r.eligible_batch for r in s1.collect()}
    assert rows == {"a": 3, "d": 2}
    # batch 2: d expires (pruned); a gets a SHORTER directive — the
    # standing longer one wins; e saturates the cap
    s2 = _advance_backoff(
        s1,
        gated([("a", 429, "10"), ("e", 503, "999999999")]),
        2,
        interval_s=3600,
        cap=16,
    )
    rows = {r.host: r.eligible_batch for r in s2.collect()}
    assert rows == {"a": 3, "e": 18}
    # batch 3: a expires with no new directive → pruned
    s3 = _advance_backoff(s2, gated([]), 3, interval_s=3600, cap=16)
    assert {r.host for r in s3.collect()} == {"e"}


def _attempt_batches(spark, root, last_batch):
    vis = CrawlStore(spark, root).read_all("visited", last_batch)
    return sorted(
        r.batch_id
        for r in vis.where(F.col("url").contains(_RL_HOST)).collect()
    )


def _cfg(honor, **kw):
    kw.setdefault("max_batches", 6)
    return CrawlConfig(
        parallelism=4,
        max_fetch_attempts=3,
        batch_interval_seconds=3600,
        live_transport=_rate_limited_transport(),
        honor_retry_after=honor,
        **kw,
    )


def test_retry_after_defers_host_in_loop(spark, tmp_path_factory):
    """Retry-After 7200 at 3600 s/batch = 2-batch backoff: the host's 3
    attempts land at batches 1/3/5 instead of 1/2/3, and the healthy
    seed's crawl is bit-identical either way."""
    pages = spark.createDataFrame([], _PAGES_SCHEMA)
    seeds = spark.createDataFrame(
        [(u, 20, 5) for u in ([f"https://{_RL_HOST}/"] + _ok_seed_urls(1))],
        ["seed_url", "max_pages", "max_career_pages"],
    )

    root_on = tmp_path_factory.mktemp("ra_on")
    res_on = run_crawl(spark, pages, seeds, root_on, _cfg(True))
    assert _attempt_batches(spark, root_on, res_on["last_batch"]) == [1, 3, 5]

    root_off = tmp_path_factory.mktemp("ra_off")
    res_off = run_crawl(spark, pages, seeds, root_off, _cfg(False))
    assert _attempt_batches(spark, root_off, res_off["last_batch"]) == [1, 2, 3]

    # healthy host unaffected: identical fetched sets
    def healthy(root, last):
        vis = CrawlStore(spark, root).read_all("visited", last)
        return sorted(
            r.url
            for r in vis.where(
                ~F.col("url").contains(_RL_HOST) & F.col("fetched")
            ).collect()
        )

    assert healthy(root_on, res_on["last_batch"]) == healthy(
        root_off, res_off["last_batch"]
    )


def test_retry_after_state_survives_resume(spark, tmp_path_factory):
    pages = spark.createDataFrame([], _PAGES_SCHEMA)
    seeds = spark.createDataFrame(
        [(f"https://{_RL_HOST}/", 20, 5)],
        ["seed_url", "max_pages", "max_career_pages"],
    )
    root = tmp_path_factory.mktemp("ra_resume")
    run_crawl(spark, pages, seeds, root, _cfg(True, max_batches=2))
    res = run_crawl(
        spark, pages, seeds, root, _cfg(True, max_batches=6), resume=True
    )
    # same schedule as the uninterrupted run: backoff state restored
    assert _attempt_batches(spark, root, res["last_batch"]) == [1, 3, 5]
