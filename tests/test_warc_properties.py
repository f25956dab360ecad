"""Hypothesis property tests for the WARC codec (sources/warc.py) — the
record writer/parser pair is pure Python, so these fuzz broadly without
Spark: arbitrary payload bytes (including header-lookalike content),
arbitrary urls/timestamps/status codes, multi-record streams, gzip
member streams."""

from __future__ import annotations

import gzip

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from crawler_ai_spark.sources import warc as W

_url = st.from_regex(r"https://[a-z]{1,10}\.example\.com/[a-zA-Z0-9_\-./%?=&]{0,40}", fullmatch=True)
_ts = st.integers(min_value=0, max_value=2**41).map(
    lambda us: pd.Timestamp(1980, 1, 1) + pd.Timedelta(microseconds=us)
)
_status = st.sampled_from([200, 301, 404, 429, 500, 503])
_body = st.binary(min_size=0, max_size=4096)

_record = st.tuples(_url, _ts, _body, _status)


@settings(max_examples=200, deadline=None)
@given(st.lists(_record, min_size=1, max_size=8, unique_by=lambda r: r[0]))
def test_record_stream_roundtrip(records):
    blob = b"".join(W._record_bytes(u, ts, b, s) for u, ts, b, s in records)
    parsed = {u: (ts, h, s) for u, ts, h, s in W._parse_warc(blob)}
    assert len(parsed) == len(records)
    for u, ts, body, status in records:
        pts, phtml, pstatus = parsed[u]
        assert phtml == body  # byte-exact, even when body embeds \r\n\r\n or "WARC/1.1"
        assert pstatus == status
        assert pts == ts  # microsecond-exact WARC-Date


@settings(max_examples=50, deadline=None)
@given(st.lists(_record, min_size=1, max_size=5, unique_by=lambda r: r[0]))
def test_gzip_member_stream_roundtrip(records):
    members = []
    for u, ts, b, s in records:
        import io

        g = io.BytesIO()
        with gzip.GzipFile(fileobj=g, mode="wb", mtime=0) as zf:
            zf.write(W._record_bytes(u, ts, b, s))
        members.append(g.getvalue())
    data = b"".join(members)
    assert data.count(b"\x1f\x8b\x08") >= len(records)  # one member each
    parsed = list(W._parse_warc(W._gunzip_members(data)))
    assert len(parsed) == len(records)
    assert {p[0] for p in parsed} == {r[0] for r in records}


@settings(max_examples=100, deadline=None)
@given(_body)
def test_payload_never_confuses_framing(body):
    # a second record follows a payload that looks like record headers;
    # Content-Length framing must land exactly on the boundary
    a = W._record_bytes("https://a.example.com/", "2024-01-01", body, 200)
    b = W._record_bytes("https://b.example.com/", "2024-01-02", b"tail", 404)
    out = list(W._parse_warc(a + b))
    assert [r[0] for r in out] == ["https://a.example.com/", "https://b.example.com/"]
    assert out[0][2] == body and out[1][2] == b"tail"
