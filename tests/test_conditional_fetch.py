"""S5+ conditional revalidation (RFC 9110 §13.1): TTL refresh rows send
If-None-Match / If-Modified-Since from the ledger's stored validators; an
unchanged page answers a bodyless 304 that still advances the cache clock
(and doubles the adaptive interval) while transferring nothing."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_ai_spark.plans.crawl_loop import CrawlConfig, CrawlStore, run_crawl
from crawler_ai_spark.sources import fetch as FS

_PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, lang string, "
    "status int, fetch_error string"
)


def _ok_seed_urls(n):
    """Deterministic seed URLs whose SyntheticTransport outcome is a 200."""
    out, i = [], 0
    while len(out) < n:
        u = f"https://condsite{i}.example/"
        if FS._url_key(u) % 100 < 85:
            out.append(u)
        i += 1
    return out


def test_synthetic_transport_revalidates():
    t = FS.SyntheticTransport()
    url = _ok_seed_urls(1)[0]
    status, body, err, hdrs = t(url, {})
    assert status == 200 and body and err is None
    etag = hdrs["ETag"]
    status2, body2, err2, hdrs2 = t(url, {"If-None-Match": etag})
    assert status2 == 304 and body2 is None and err2 is None
    assert hdrs2["ETag"] == etag
    # a non-matching validator still downloads
    status3, body3, _, _ = t(url, {"If-None-Match": '"nope"'})
    assert status3 == 200 and body3 == body


def test_fetch_stage_conditional_headers(spark):
    urls = _ok_seed_urls(4)
    t = FS.SyntheticTransport()
    etags = {u: t(u, {})[3]["ETag"] for u in urls}
    frontier = spark.createDataFrame(
        [
            # matching etag → 304; no validator → 200
            (u, "h0.example", 1, i, etags[u] if i % 2 == 0 else None)
            for i, u in enumerate(urls)
        ],
        "url string, host string, priority int, discovered_seq long, cond_etag string",
    )
    rows = {r.url: r for r in FS.fetch_pages(frontier, FS.FetchConfig()).collect()}
    for i, u in enumerate(urls):
        if i % 2 == 0:
            assert rows[u].status == 304 and rows[u].html is None
        else:
            assert rows[u].status == 200 and rows[u].html
        assert rows[u].etag == etags[u]  # validators surface either way


def _cfg(conditional, **kw):
    kw.setdefault("max_batches", 5)
    kw.setdefault("live_transport", FS.SyntheticTransport())
    kw.setdefault("adaptive_recrawl", True)
    return CrawlConfig(
        parallelism=4,
        recrawl_ttl_seconds=3600,
        batch_interval_seconds=3600,
        recrawl_ttl_max_batches=8,
        conditional_revalidation=conditional,
        **kw,
    )


def test_revalidation_in_loop(spark, tmp_path_factory):
    """End to end vs the re-download control run: same refresh SCHEDULE
    (a 304 is proof of unchanged content, so adaptive doubling matches),
    zero refresh bytes, validators persisted in the ledger."""
    pages = spark.createDataFrame([], _PAGES_SCHEMA)
    seeds = spark.createDataFrame(
        [(u, 20, 5) for u in _ok_seed_urls(2)],
        ["seed_url", "max_pages", "max_career_pages"],
    )

    roots = {}
    for conditional in (False, True):
        root = tmp_path_factory.mktemp(f"cond_{conditional}")
        res = run_crawl(spark, pages, seeds, root, _cfg(conditional))
        roots[conditional] = (root, res)

    vis = {
        c: CrawlStore(spark, root).read_all("visited", res["last_batch"])
        for c, (root, res) in roots.items()
    }
    # identical refresh schedule: same (url, batch_id) refresh set
    sched = {
        c: sorted(
            (r.url, r.batch_id)
            for r in v.where(F.col("is_recrawl")).collect()
        )
        for c, v in vis.items()
    }
    assert sched[True] == sched[False] and sched[True]
    # control run re-downloads every refresh; conditional run 304s them
    off = vis[False].where(F.col("is_recrawl")).collect()
    assert all(r.fetched and not r.revalidated and r.page_bytes > 0 for r in off)
    on = vis[True].where(F.col("is_recrawl")).collect()
    assert all(
        (not r.fetched) and r.revalidated and r.status == 304
        and r.page_bytes == 0 and r.fetch_error is None
        for r in on
    )
    # adaptive doubling happened through the 304s: with base ttl 1 and 5
    # batches, fetch batches per URL are 1, 2, 4 (gap at 3 and 5)
    per_url = {}
    for r in vis[True].where(F.col("fetched") | F.col("revalidated")).collect():
        per_url.setdefault(r.url, []).append(r.batch_id)
    assert per_url and all(sorted(b) == [1, 2, 4] for b in per_url.values())

    # the ledger holds validators and the ORIGINAL content hash
    root, res = roots[True]
    ledger = CrawlStore(spark, root).read("cache_ledger", res["last_batch"])
    lrows = ledger.collect()
    assert lrows
    assert all(r.etag and r.last_modified for r in lrows)
    assert all(r.content_hash is not None for r in lrows)
    assert all(r.ttl_batches == 4 for r in lrows)

    # the career/job outputs are unaffected by the transfer mode
    for table in ("career_pages", "job_urls", "seen_delta"):
        sets = {
            c: {
                tuple(str(v) for v in r)
                for r in CrawlStore(spark, root).read_all(table, res["last_batch"])
                .collect()
            }
            for c, (root, res) in roots.items()
        }
        assert sets[True] == sets[False]


def test_revalidation_survives_resume(spark, tmp_path_factory):
    """Kill after batch 1, resume: the ledger's validators read back and
    the batch-2 refresh still revalidates with a 304."""
    pages = spark.createDataFrame([], _PAGES_SCHEMA)
    seeds = spark.createDataFrame(
        [(u, 20, 5) for u in _ok_seed_urls(1)],
        ["seed_url", "max_pages", "max_career_pages"],
    )
    root = tmp_path_factory.mktemp("cond_resume")
    run_crawl(spark, pages, seeds, root, _cfg(True, max_batches=1))
    res = run_crawl(
        spark, pages, seeds, root, _cfg(True, max_batches=2), resume=True
    )
    vis = CrawlStore(spark, root).read_all("visited", res["last_batch"])
    refresh = vis.where(F.col("is_recrawl")).collect()
    assert refresh and all(r.revalidated and r.status == 304 for r in refresh)


def _outage_on_refresh_transport():
    """200s on unconditional fetches; any conditional request (i.e. a TTL
    refresh carrying If-None-Match) hits a transport failure — the shape
    that used to make `revalidated` NULL (status NULL == 304 → NULL) and
    silently drop the row from retries, metrics, and the breaker."""
    inner = FS.SyntheticTransport()

    def transport(url, headers):
        if "If-None-Match" in headers:
            return None, None, "Connection timeout after 15s", None
        return inner(url, headers)

    return transport


def test_failed_refresh_is_counted_and_retried(spark, tmp_path_factory):
    pages = spark.createDataFrame([], _PAGES_SCHEMA)
    seeds = spark.createDataFrame(
        [(u, 20, 5) for u in _ok_seed_urls(1)],
        ["seed_url", "max_pages", "max_career_pages"],
    )
    root = tmp_path_factory.mktemp("cond_fail")
    res = run_crawl(
        spark, pages, seeds, root,
        _cfg(True, max_batches=3, live_transport=_outage_on_refresh_transport(),
             max_fetch_attempts=2),
    )
    store = CrawlStore(spark, root)
    vis = store.read_all("visited", res["last_batch"])
    refresh = vis.where(F.col("is_recrawl")).collect()
    assert refresh, "no refresh attempted"
    # the failed refresh is a plain error: revalidated FALSE (not NULL),
    # error class populated
    assert all(r.revalidated is False for r in refresh)
    assert all(not r.fetched and r.fetch_error_class == "timeout" for r in refresh)
    # metrics count it as a fetch error
    m = store.read_all("metrics", res["last_batch"])
    batches_with_refresh = {r.batch_id for r in refresh}
    err_by_batch = {
        r.batch_id: r.err
        for r in m.groupBy("batch_id").agg(F.sum("fetch_errors").alias("err")).collect()
    }
    assert all(err_by_batch.get(b, 0) > 0 for b in batches_with_refresh)
    # and the W4 retry ladder re-enqueued it (attempt 1 row for the URL)
    retried = vis.where(F.col("attempt") > 0).count()
    assert retried > 0


def test_304_refreshed_validators_update_ledger(spark):
    """RFC 9110 §15.4.5: a 304 carrying rotated validators updates the
    stored ones; a bodyless 304 WITHOUT them keeps the previous."""
    from crawler_ai_spark.plans.crawl_loop import _ledger_delta, _merge_ledger

    prev = spark.createDataFrame(
        [("s", "u", 1, 1, 100, 0, 1, 111, 1, '"old"', "Mon")],
        "seed_url string, url string, last_fetch_batch long, last_visit_batch long,"
        " priority int, depth int, discovered_seq long, content_hash long,"
        " ttl_batches int, etag string, last_modified string",
    )
    vis_cols = (
        "seed_url string, url string, fetched boolean, priority int, depth int,"
        " discovered_seq long, batch_id long, content_hash long, etag string,"
        " last_modified string, revalidated boolean"
    )
    # revalidation with a rotated etag
    d1 = _ledger_delta(
        spark.createDataFrame(
            [("s", "u", False, 100, 0, 1, 2, None, '"new"', "Tue", True)], vis_cols
        ),
        base_ttl=1,
    )
    out = _merge_ledger(prev, d1, adaptive=True, base_ttl=1, max_ttl=8).collect()[0]
    assert out.etag == '"new"' and out.last_modified == "Tue"
    assert out.content_hash == 111 and out.ttl_batches == 2  # 304 ⇒ unchanged
    # revalidation without validators keeps the stored ones
    d2 = _ledger_delta(
        spark.createDataFrame(
            [("s", "u", False, 100, 0, 1, 2, None, None, None, True)], vis_cols
        ),
        base_ttl=1,
    )
    out = _merge_ledger(prev, d2, adaptive=True, base_ttl=1, max_ttl=8).collect()[0]
    assert out.etag == '"old"' and out.last_modified == "Mon"


def _max_age_transport(max_age_s):
    """SyntheticTransport wrapper stamping Cache-Control on 200s."""
    inner = FS.SyntheticTransport()

    def transport(url, headers):
        result = inner(url, headers)
        if len(result) == 4 and result[3] is not None:
            hdrs = dict(result[3])
            hdrs["Cache-Control"] = f"public, max-age={max_age_s}"
            return result[0], result[1], result[2], hdrs
        return result

    return transport


def test_http_cache_ttl_drives_refresh_schedule(spark, tmp_path_factory):
    """RFC 9111: a server declaring max-age = 2 batch intervals pushes
    the refresh from batch 2 (the fixed-TTL default) to batch 3; with
    http_cache_ttl off the same responses refresh every batch."""
    pages = spark.createDataFrame([], _PAGES_SCHEMA)
    seeds = spark.createDataFrame(
        [(u, 20, 5) for u in _ok_seed_urls(1)],
        ["seed_url", "max_pages", "max_career_pages"],
    )

    def refresh_batches(http):
        root = tmp_path_factory.mktemp(f"httpttl_{http}")
        res = run_crawl(
            spark, pages, seeds, root,
            _cfg(
                False,
                max_batches=4,
                live_transport=_max_age_transport(7200),
                adaptive_recrawl=False,
                http_cache_ttl=http,
            ),
        )
        vis = CrawlStore(spark, root).read_all("visited", res["last_batch"])
        return sorted(
            r.batch_id for r in vis.where(F.col("is_recrawl")).collect()
        )

    # base ttl 1 batch: without the directive a refresh lands EVERY batch
    assert refresh_batches(False) == [2, 3, 4]
    # max-age=7200 at 3600 s/batch → interval 2: refreshes at 3 only
    # (batch 5 would be next; the run ends at 4)
    assert refresh_batches(True) == [3]
