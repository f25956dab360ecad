"""WARC source/sink (sources/warc.py) — round-trip, format, determinism."""

import gzip
import hashlib

import pytest
from pyspark.sql import functions as F

from crawler_ai_spark.sources import warc as W


@pytest.fixture(scope="module")
def pages(spark, fixture_root):
    return (
        spark.read.parquet(str(fixture_root / "sf0.01" / "pages.parquet"))
        .where("html IS NOT NULL")
        .select("url", "warc_ts", "html", "status")
        .limit(300)
    )


def _roundtrip(spark, pages, out_dir, gz):
    manifest = W.write_warc(pages.repartition(3), str(out_dir), gzip_records=gz)
    m = manifest.collect()
    assert sum(r.n_records for r in m) == pages.count()
    assert all(r.path.endswith(".warc.gz" if gz else ".warc") for r in m)
    return W.read_warc(spark, str(out_dir))


@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip_bit_exact(spark, pages, tmp_path, gz):
    back = _roundtrip(spark, pages, tmp_path / ("gz" if gz else "plain"), gz)
    a = {r.url: r for r in pages.collect()}
    b = {r.url: r for r in back.collect()}
    assert set(a) == set(b)
    for url, row in a.items():
        got = b[url]
        assert bytes(got.html) == bytes(row.html), url
        assert got.status == row.status, url
        assert got.warc_ts == row.warc_ts, url  # microsecond-exact WARC-Date


def test_gzip_members_are_per_record(pages, spark, tmp_path):
    # CC convention: each record its own gzip member → member count ==
    # record count, and any member boundary is a valid seek point
    manifest = W.write_warc(pages.coalesce(1), str(tmp_path), gzip_records=True).collect()
    path = manifest[0]["path"]
    data = open(path, "rb").read()
    members = data.count(b"\x1f\x8b\x08")  # gzip magic + deflate method
    assert members == manifest[0]["n_records"]
    # second member parses standalone from its boundary
    second = data.index(b"\x1f\x8b\x08", 1)
    rec = gzip.decompress(data[second:])
    assert rec.startswith(b"WARC/1.1\r\n")


def test_deterministic_bytes(spark, pages, tmp_path):
    m1 = W.write_warc(pages.coalesce(1), str(tmp_path / "a"), gzip_records=True).collect()
    m2 = W.write_warc(pages.coalesce(1), str(tmp_path / "b"), gzip_records=True).collect()
    h = lambda p: hashlib.md5(open(p, "rb").read()).hexdigest()  # noqa: E731
    assert h(m1[0]["path"]) == h(m2[0]["path"])


def test_non_response_records_skipped(spark, tmp_path):
    info = (
        b"WARC/1.1\r\nWARC-Type: warcinfo\r\nWARC-Date: 2024-01-01T00:00:00.000000Z\r\n"
        b"Content-Length: 9\r\n\r\nsoftware\n\r\n\r\n"
    )
    rec = W._record_bytes("https://x.example.com/", "2024-01-02T03:04:05.000006", b"<p>hi</p>", 200)
    p = tmp_path / "mixed.warc"
    p.write_bytes(info + rec)
    rows = W.read_warc(spark, str(p)).collect()
    assert len(rows) == 1
    assert rows[0].url == "https://x.example.com/"
    assert bytes(rows[0].html) == b"<p>hi</p>"
    assert rows[0].status == 200


def test_payload_with_crlf_crlf_inside_html(spark, tmp_path):
    # Content-Length framing, not delimiter splitting: html containing
    # the record separator must survive
    html = b"<html>\r\n\r\nWARC/1.1\r\n\r\n</html>"
    rec = W._record_bytes("https://t.example.com/a", "2024-01-01T00:00:00", html, 404)
    p = tmp_path / "tricky.warc"
    p.write_bytes(rec + rec.replace(b"/a", b"/b"))
    rows = {r.url: r for r in W.read_warc(spark, str(p)).collect()}
    assert len(rows) == 2
    assert bytes(rows["https://t.example.com/a"].html) == html
    assert rows["https://t.example.com/a"].status == 404


def test_crawl_loop_warc_archive(spark, fixture_root, tmp_path_factory):
    """cfg.warc_dir archives exactly the fetched pages of every batch,
    byte-identical to the pages table, without touching crawl results."""
    from pyspark.sql import functions as F2

    from crawler_ai_spark.plans.crawl_loop import CrawlConfig, CrawlStore, run_crawl

    pages = spark.read.parquet(str(fixture_root / "sf0.001" / "pages.parquet")).where(
        ~F2.col("url").endswith(".xml")
    )
    seeds_urls = sorted(
        r.url for r in pages.select("url").collect() if r.url.endswith(".example/")
    )[:2]
    seeds = spark.createDataFrame(
        [(s, 30, 10) for s in seeds_urls], ["seed_url", "max_pages", "max_career_pages"]
    )
    root = tmp_path_factory.mktemp("warc_loop_state")
    warc_dir = tmp_path_factory.mktemp("warc_loop_archive")
    res_a = run_crawl(
        spark, pages, seeds, root,
        CrawlConfig(max_batches=4, parallelism=8, warc_dir=str(warc_dir)),
    )
    # archive == fetched visited set, per batch
    vis = CrawlStore(spark, root).read_all("visited", res_a["last_batch"])
    fetched_urls = {r.url for r in vis.where("fetched").select("url").distinct().collect()}
    batch_dirs = sorted(p for p in warc_dir.iterdir() if p.name.startswith("batch-"))
    assert batch_dirs, "no batch archives written"
    archived = {}
    for d in batch_dirs:
        for r in W.read_warc(spark, str(d)).collect():
            archived[r.url] = bytes(r.html)
    assert set(archived) == fetched_urls
    truth = {r.url: bytes(r.html) for r in pages.where("html IS NOT NULL").collect()}
    assert all(archived[u] == truth[u] for u in archived)
    # side-sink must not perturb the crawl itself
    root_b = tmp_path_factory.mktemp("warc_loop_state_b")
    res_b = run_crawl(
        spark, pages, seeds, root_b, CrawlConfig(max_batches=4, parallelism=8),
    )
    assert {k: v for k, v in res_a.items() if k != "wall_s"} == {
        k: v for k, v in res_b.items() if k != "wall_s"
    }


@pytest.mark.parametrize("gz", [False, True])
def test_cdx_index_offsets_and_digests(spark, pages, tmp_path, gz):
    """CDX rows cover every response record; every offset/length slice
    re-parses to its own record (slice_ok); for uncompressed files the
    offsets also hold against the RAW file bytes read independently."""
    out = tmp_path / ("cdx_gz" if gz else "cdx")
    W.write_warc(pages.repartition(3), str(out), gzip_records=gz).collect()
    cdx = W.warc_cdx(spark, str(out)).collect()
    assert len(cdx) == pages.count()
    assert all(r.slice_ok for r in cdx)
    truth = {r.url: bytes(r.html) for r in pages.collect()}
    for r in cdx:
        assert r.digest == hashlib.md5(truth[r.url]).hexdigest()
    if not gz:
        # independent check against raw disk bytes, not the parser's view
        by_file = {}
        for r in cdx:
            by_file.setdefault(r.filename, []).append(r)
        for fname, rows in by_file.items():
            data = (out / fname).read_bytes()
            for r in rows:
                sliced = list(W._parse_warc(data[r.offset : r.offset + r.rec_length]))
                assert len(sliced) == 1 and sliced[0][0] == r.url


def test_wat_json_structure(spark):
    """warc_to_wat emits parseable JSON whose envelope reproduces the
    record header and whose html_meta matches the structural parse —
    including a non-200 record (WAT keeps all records, unlike WET) and
    a bodyless one (empty html_meta, not a crash)."""
    import datetime as dt
    import json

    html = (
        b"<html><head><title>T1</title>"
        b'<meta name="description" content="D1"></head>'
        b'<body><nav><a href="/nav">Nav</a></nav>'
        b'<p>hello <a href="/x">X link</a></p>'
        b'<footer><a href="/f">F</a></footer></body></html>'
    )
    ts = dt.datetime(2024, 3, 1, 12, 0, 0, 123456)
    rows = [
        ("https://a.example/", ts, html, 200),
        ("https://a.example/gone", ts, None, 404),
    ]
    records = spark.createDataFrame(rows, W.PAGE_SCHEMA)
    out = {r.url: r for r in W.warc_to_wat(records).collect()}
    assert set(out) == {u for u, *_ in rows}

    w = json.loads(out["https://a.example/"].wat_json)["envelope"]
    assert w["warc_header"] == {
        "target_uri": "https://a.example/",
        "date": "2024-03-01T12:00:00.123456Z",
        "type": "response",
    }
    meta = w["payload"]["html_meta"]
    assert w["payload"]["status"] == 200
    assert meta["title"] == "T1"
    assert meta["meta_description"] == "D1"
    assert [(l["href"], l["slot"], l["text"]) for l in meta["links"]] == [
        ("/nav", "nav", "Nav"),
        ("/x", "body", "X link"),
        ("/f", "footer", "F"),
    ]

    gone = json.loads(out["https://a.example/gone"].wat_json)["envelope"]
    assert gone["payload"]["status"] == 404
    assert gone["payload"]["html_meta"]["links"] == []

    # from_json(WAT_SCHEMA) reads the column back into typed fields
    typed = (
        W.warc_to_wat(records)
        .select(F.from_json("wat_json", W.WAT_SCHEMA).alias("w"))
        .where(F.col("w.envelope.payload.status") == 200)
        .select("w.envelope.payload.html_meta.title")
        .collect()
    )
    assert [r.title for r in typed] == ["T1"]
