"""WARC revisit-record dedup (sources/warc.py): byte-exact payload
restoration, storage savings, original selection determinism, and
interop with the plain reader. Cross-engine identity is pinned by the
catalog's warc_revisit_roundtrip oracle row."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from crawler_ai_spark.sources.warc import (
    read_warc,
    read_warc_dedup,
    write_warc,
    write_warc_dedup,
)

T0 = datetime.datetime(2024, 1, 1)


def _pages(spark, n=24, dupes=3):
    rows = [
        (
            f"https://h{i % 4}.example/p/{i}",
            T0 + datetime.timedelta(hours=i),
            f"<html>payload {i // dupes}</html>".encode(),
            200,
        )
        for i in range(n)
    ]
    return rows, spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, status int"
    )


def test_roundtrip_restores_payloads(spark, tmp_path):
    rows, df = _pages(spark)
    write_warc_dedup(df.repartition(3), str(tmp_path), gzip_records=True).collect()
    back = read_warc_dedup(spark, str(tmp_path))
    got = {(r.url, r.warc_ts, bytes(r.html), r.status) for r in back.collect()}
    assert got == set(rows)
    # 8 distinct payloads of 24 captures: exactly 16 revisits
    assert back.where("is_revisit").count() == 16


def test_original_is_earliest_capture(spark, tmp_path):
    rows, df = _pages(spark)
    write_warc_dedup(df.repartition(3), str(tmp_path)).collect()
    back = read_warc_dedup(spark, str(tmp_path))
    originals = {r.url for r in back.where(~F.col("is_revisit")).collect()}
    # the first capture (lowest timestamp) of each payload group
    assert originals == {f"https://h{i % 4}.example/p/{i}" for i in range(0, 24, 3)}


def test_storage_savings(spark, tmp_path):
    # savings need bodies that outweigh a revisit record's ~350-byte
    # header (true of real pages): 5 KB payloads, 10 captures each
    rows = [
        (
            f"https://h.example/p/{i}",
            T0 + datetime.timedelta(hours=i),
            (f"<html>{'x' * 5000} {i // 10}</html>").encode(),
            200,
        )
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, status int"
    )
    full = sum(
        m.n_bytes
        for m in write_warc(df.repartition(2), str(tmp_path / "full")).collect()
    )
    dedup = sum(
        m.n_bytes
        for m in write_warc_dedup(df.repartition(2), str(tmp_path / "dd")).collect()
    )
    assert dedup < full  # 27 of 30 bodies elided (revisit headers cost less)


def test_plain_reader_sees_only_full_records(spark, tmp_path):
    rows, df = _pages(spark)
    write_warc_dedup(df.repartition(3), str(tmp_path)).collect()
    # read_warc skips non-response records: exactly the 8 originals
    plain = read_warc(spark, str(tmp_path))
    assert plain.count() == 8
