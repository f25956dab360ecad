"""WARC source/sink — Common Crawl's interchange format (ISO 28500).

The reference crawler persists pages as database rows only
(services/crawl_service.py result dicts); a web-scale engine whose input
is "Common-Crawl-style pages" (BASELINE.json input_hint) needs to read
and write the archive format those corpora actually ship in. Implemented
from the public WARC/1.0–1.1 spec with the stdlib only.

Format choices (all from the public CC conventions):
  * one `response` record per page; payload is a full HTTP/1.1 response
    (status line + headers + body bytes), so `html` round-trips
    byte-exactly and `status` survives;
  * `WARC-Date` is emitted with microsecond precision (WARC/1.1 §5.4
    allows fractional seconds) so `warc_ts` round-trips exactly;
  * `gzip_records=True` writes each record as its OWN gzip member
    (the Common Crawl layout) — a member boundary is a clean seek
    point, which is what keeps multi-GB .warc.gz files splittable for
    record-level readers.

Scale notes:
  * The sink is `mapInPandas` → one `part-<pid>.warc[.gz]` per input
    partition, executor-side, no driver involvement; it returns a
    manifest DataFrame (path, n_records, n_bytes) so callers keep
    lineage. Size output partitions upstream (repartition) to hit the
    ~1 GB/file CC convention.
  * The source reads via `binaryFile` + `mapInPandas`: whole-file per
    task, which is the right granularity when files are written at the
    per-partition sizes above; a splittable member-seeking reader can
    replace the loader without touching the parser.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CRLF = b"\r\n"

PAGE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("status", T.IntegerType()),
    ]
)

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("n_records", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

_REASON = {200: "OK", 301: "Moved Permanently", 404: "Not Found", 500: "Internal Server Error"}


def _warc_date(ts) -> str:
    # WARC/1.1 permits fractional seconds; microseconds keep warc_ts exact
    return pd.Timestamp(ts).strftime("%Y-%m-%dT%H:%M:%S.%f") + "Z"


def _record_bytes(url: str, ts, html: bytes, status: int) -> bytes:
    html = bytes(html or b"")
    # pandas renders a nullable int column as float64 with NaN — treat
    # missing status (corpora without one) as 200 either way
    status = 200 if status is None or pd.isna(status) else int(status)
    reason = _REASON.get(status, "Unknown")
    http = (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: text/html\r\n"
        f"Content-Length: {len(html)}\r\n\r\n"
    ).encode("ascii") + html
    rid = hashlib.md5((url + "|" + _warc_date(ts)).encode("utf-8")).hexdigest()
    head = (
        "WARC/1.1\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        f"WARC-Date: {_warc_date(ts)}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode("utf-8")
    return head + http + _CRLF + _CRLF


def write_warc(df: DataFrame, out_dir: str, gzip_records: bool = False) -> DataFrame:
    """Write (url, warc_ts, html, status[, ...]) as WARC files, one per
    partition. Returns the manifest (path, n_records, n_bytes); the
    write happens when the manifest is consumed (pure-plan semantics —
    cache/collect the manifest once)."""
    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if gzip_records else ".warc"
    cols = df.select("url", "warc_ts", "html", F.col("status").cast("int"))

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}{ext}")
        n = 0
        buf = io.BytesIO()
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                rec = _record_bytes(row.url, row.warc_ts, row.html, row.status)
                if gzip_records:
                    # one gzip MEMBER per record (CC convention, mtime=0
                    # for determinism) — member boundaries keep the file
                    # seekable/splittable at record granularity
                    g = io.BytesIO()
                    with gzip.GzipFile(fileobj=g, mode="wb", mtime=0) as zf:
                        zf.write(rec)
                    buf.write(g.getvalue())
                else:
                    buf.write(rec)
                n += 1
        data = buf.getvalue()
        if n:
            with open(path, "wb") as f:
                f.write(data)
            yield pd.DataFrame({"path": [path], "n_records": [n], "n_bytes": [len(data)]})

    return cols.mapInPandas(_write, schema=MANIFEST_SCHEMA)


def _parse_warc(data: bytes) -> Iterator[tuple]:
    """Yield (url, warc_ts, html, status) from raw WARC bytes (headers
    block + Content-Length payload per ISO 28500 — no naive splitting,
    payload bytes may contain anything)."""
    for url, ts, html, status, _off, _ln in _parse_warc_records(data):
        yield url, ts, html, status


def _parse_warc_records(data: bytes) -> Iterator[tuple]:
    """Offset-aware WARC parse: yields (url, warc_ts, html, status,
    offset, rec_length) where offset/rec_length frame the whole record
    (version line through payload end) in ``data`` — the fields a CDX
    index stores so a reader can fetch one record without scanning."""
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while data.startswith(_CRLF, pos):
            pos += 2
        if pos >= n:
            break
        rec_start = pos
        hdr_end = data.index(b"\r\n\r\n", pos)
        headers = {}
        lines = data[pos:hdr_end].split(_CRLF)
        version = lines[0]
        if not version.startswith(b"WARC/"):
            raise ValueError(f"not a WARC record at offset {pos}: {version[:20]!r}")
        for line in lines[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        clen = int(headers[b"content-length"])
        body = data[hdr_end + 4 : hdr_end + 4 + clen]
        pos = hdr_end + 4 + clen
        if headers.get(b"warc-type") != b"response":
            continue  # warcinfo/request/metadata records: skip
        url = headers[b"warc-target-uri"].decode("utf-8")
        ts = pd.Timestamp(headers[b"warc-date"].decode("ascii").rstrip("Z"))
        # payload is an HTTP/1.1 response: status line, headers, body
        status_line, _, rest = body.partition(_CRLF)
        status = int(status_line.split(b" ")[1])
        _, _, html = rest.partition(b"\r\n\r\n")
        yield url, ts, html, status, rec_start, pos - rec_start


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a concatenation of gzip members (stdlib gzip.decompress
    already handles multi-member streams)."""
    return gzip.decompress(data)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read .warc / .warc.gz files into (url, warc_ts, html, status)."""
    files = spark.read.format("binaryFile").load(
        os.path.join(path, "*.warc*") if os.path.isdir(path) else path
    )

    def _read(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                data = bytes(row.content)
                if row.path.endswith(".gz"):
                    data = _gunzip_members(data)
                rows.extend(_parse_warc(data))
            if rows:
                yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "status"])

    return files.select("path", "content").mapInPandas(_read, schema=PAGE_SCHEMA)


CDX_SCHEMA = (
    "url string, warc_ts timestamp, status int, digest string, "
    "offset long, rec_length long, filename string, slice_ok boolean"
)


def warc_cdx(spark: SparkSession, path: str) -> DataFrame:
    """CDX index derivation (the Common Crawl *.cdx product shape): one
    row per WARC response record with the fields an index stores — URL,
    capture timestamp, status, a payload digest (md5 hex here; Common
    Crawl uses sha1-base32 — one constant to swap), and the record's
    byte offset + length in its file. ``slice_ok`` is an in-plan
    self-check: the [offset, offset+rec_length) slice is re-parsed and
    must reproduce the record exactly, so the framing is verified where
    it is computed instead of trusted. For .warc.gz inputs the offsets
    refer to the DECOMPRESSED stream (record-gzip member offsets would
    need the compressed framing; CC's own CDX stores compressed offsets
    — documented difference). SURT urlkeys come from
    functions.urls.surt_key at query time (a Column expr, JVM-side).

    One Arrow pass per file, same shape as read_warc — no shuffle."""
    import hashlib

    files = spark.read.format("binaryFile").load(
        os.path.join(path, "*.warc*") if os.path.isdir(path) else path
    )

    def _index(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                data = bytes(row.content)
                if row.path.endswith(".gz"):
                    data = _gunzip_members(data)
                fname = os.path.basename(row.path)
                for url, ts, html, status, off, ln in _parse_warc_records(data):
                    try:
                        reparse = list(_parse_warc(data[off : off + ln]))
                        ok = reparse == [(url, ts, html, status)]
                    except Exception:  # noqa: BLE001 - bad framing IS the signal
                        ok = False
                    rows.append(
                        (
                            url, ts, status,
                            hashlib.md5(bytes(html)).hexdigest(),
                            off, ln, fname, ok,
                        )
                    )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "url", "warc_ts", "status", "digest",
                        "offset", "rec_length", "filename", "slice_ok",
                    ],
                )

    return files.select("path", "content").mapInPandas(_index, schema=CDX_SCHEMA)


def warc_to_wet(records: DataFrame) -> DataFrame:
    """WET derivation (the Common Crawl *.warc.wet.gz product): WARC
    response records → plain-text conversion records (url, warc_ts,
    text), where text is the engine's canonical HTML→text pipeline —
    the SAME byte-parity extraction the crawl loop runs (P2,
    functions/textnorm.canonical_text), so a WET export and a crawl
    agree byte for byte.

    One Arrow pass over the records; 4xx/5xx and bodyless records drop
    (CC WET only converts successful responses)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from crawler_ai_spark.functions import textnorm

    def _text(html: pd.Series) -> pd.Series:
        out = []
        for h in html:
            if h is None:
                out.append(None)
                continue
            if isinstance(h, (bytes, bytearray)):
                try:
                    h = bytes(h).decode("utf-8")
                except UnicodeDecodeError:
                    h = bytes(h).decode("latin-1", errors="replace")
            out.append(textnorm.canonical_text(h))
        return pd.Series(out, dtype="object")

    text_udf = pandas_udf(_text, "string")
    ok = records.where(
        (F.col("status") == 200) & F.col("html").isNotNull()
    )
    return ok.select(
        "url", "warc_ts", text_udf(F.col("html")).alias("text")
    )


WAT_LINK_SCHEMA = T.StructType(
    [
        T.StructField("href", T.StringType()),
        T.StructField("slot", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)

# the WAT payload shape (subset of Common Crawl's *.warc.wat.gz JSON:
# Envelope.WARC-Header-Metadata + Payload-Metadata.HTTP-Response-Metadata
# .HTML-Metadata, snake_cased) — also the from_json schema consumers use
# to read a WAT column back into typed fields
WAT_SCHEMA = T.StructType(
    [
        T.StructField(
            "envelope",
            T.StructType(
                [
                    T.StructField(
                        "warc_header",
                        T.StructType(
                            [
                                T.StructField("target_uri", T.StringType()),
                                T.StructField("date", T.StringType()),
                                T.StructField("type", T.StringType()),
                            ]
                        ),
                    ),
                    T.StructField(
                        "payload",
                        T.StructType(
                            [
                                T.StructField("status", T.IntegerType()),
                                T.StructField(
                                    "html_meta",
                                    T.StructType(
                                        [
                                            T.StructField("title", T.StringType()),
                                            T.StructField(
                                                "meta_description", T.StringType()
                                            ),
                                            T.StructField(
                                                "links", T.ArrayType(WAT_LINK_SCHEMA)
                                            ),
                                        ]
                                    ),
                                ),
                            ]
                        ),
                    ),
                ]
            ),
        )
    ]
)


def warc_to_wat(records: DataFrame) -> DataFrame:
    """WAT derivation (the Common Crawl *.warc.wat.gz product shape) —
    the third CC derivative next to warc_to_wet and warc_cdx: one JSON
    metadata record per WARC response record, carrying the WARC header
    envelope (target URI, capture date, record type) and the extracted
    HTML metadata — title, meta[name=description], and the out-link list
    with slot (nav|footer|body) and anchor text. The reference stores the
    same parse fields as ad-hoc result-dict rows (crawler.py:330-386);
    WAT is their archive-format equivalent, and the extraction here is
    the SAME structural parse the crawl loop runs (functions/html
    parse_page → textnorm.scan_html), so a WAT export and a crawl agree
    field for field.

    Unlike WET, WAT keeps non-200 records (CC emits metadata for every
    record); bodyless records carry empty html_meta. The plan is one
    Arrow parse pass + a JVM-side to_json — no shuffle. Read the column
    back with from_json(wat_json, WAT_SCHEMA)."""
    from crawler_ai_spark.functions import html as HT

    parsed = HT.with_parse(records)
    p = F.col("parse")
    links = F.arrays_zip(
        p["link_hrefs"].alias("href"),
        p["link_slots"].alias("slot"),
        p["link_texts"].alias("text"),
    )
    envelope = F.struct(
        F.struct(
            F.col("url").alias("target_uri"),
            F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").alias("date"),
            F.lit("response").alias("type"),
        ).alias("warc_header"),
        F.struct(
            F.col("status").alias("status"),
            F.struct(
                p["title"].alias("title"),
                p["meta_description"].alias("meta_description"),
                links.alias("links"),
            ).alias("html_meta"),
        ).alias("payload"),
    )
    return parsed.select(
        "url",
        "warc_ts",
        "status",
        F.to_json(F.struct(envelope.alias("envelope"))).alias("wat_json"),
    )


# ---------------------------------------------------------------------------
# Revisit-record dedup (ISO 28500 / WARC 1.1 §6.7.2, the
# identical-payload-digest profile): the archive-level dedup production
# crawls ship — when a capture's payload digest matches an earlier
# record, write a small `revisit` record pointing at the original
# instead of storing the body again. A 10^10-page archive where 30% of
# captures are unchanged recrawls saves 30% of its body bytes for two
# cheap digest-grain hops.
# ---------------------------------------------------------------------------

_REVISIT_PROFILE = "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest"


def _revisit_record_bytes(
    url: str, ts, status: int, digest: str, ref_url: str, ref_ts
) -> bytes:
    status = 200 if status is None or pd.isna(status) else int(status)
    reason = _REASON.get(status, "Unknown")
    # revisit payload: the HTTP response WITHOUT its body (the spec
    # permits truncated/omitted content; the digest names the body)
    http = (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: text/html\r\nContent-Length: 0\r\n\r\n"
    ).encode("ascii")
    rid = hashlib.md5((url + "|" + _warc_date(ts) + "|r").encode("utf-8")).hexdigest()
    head = (
        "WARC/1.1\r\n"
        "WARC-Type: revisit\r\n"
        f"WARC-Profile: {_REVISIT_PROFILE}\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        f"WARC-Date: {_warc_date(ts)}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Payload-Digest: md5:{digest}\r\n"
        f"WARC-Refers-To-Target-URI: {ref_url}\r\n"
        f"WARC-Refers-To-Date: {_warc_date(ref_ts)}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode("utf-8")
    return head + http + _CRLF + _CRLF


def write_warc_dedup(
    df: DataFrame, out_dir: str, gzip_records: bool = False
) -> DataFrame:
    """write_warc with identical-payload-digest dedup: the FIRST capture
    of each payload (min (warc_ts, url) — deterministic) is written as a
    full response record; every other capture becomes a revisit record
    referencing it. Returns the manifest (path, n_records, n_bytes).

    Plan shape: one digest-grain aggregation for the originals table
    (map-side combined — a mega-duplicated payload collapses to one row
    per map task before the exchange) + one digest-keyed join; then the
    same one-file-per-partition writer."""
    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if gzip_records else ".warc"
    base = df.select(
        "url", "warc_ts", "html", F.col("status").cast("int"),
        F.md5(F.coalesce(F.col("html"), F.lit(b""))).alias("digest"),
    )
    originals = base.groupBy("digest").agg(
        F.min(F.struct("warc_ts", "url")).alias("first")
    ).select(
        "digest",
        F.col("first.url").alias("ref_url"),
        F.col("first.warc_ts").alias("ref_ts"),
    )
    tagged = base.join(originals, "digest").select(
        "url", "warc_ts", "html", "status", "digest", "ref_url", "ref_ts",
        ((F.col("url") == F.col("ref_url")) & (F.col("warc_ts") == F.col("ref_ts"))).alias(
            "is_original"
        ),
    )

    return tagged.mapInPandas(
        _tagged_writer(out_dir, ext, gzip_records), schema=MANIFEST_SCHEMA
    )


_DEDUP_READ_SCHEMA = (
    "url string, warc_ts timestamp, html binary, status int, "
    "rec_type string, digest string"
)


def read_warc_dedup(
    spark: SparkSession, path: str, on_unresolved: str = "error"
) -> DataFrame:
    """Read a revisit-deduped archive and RESTORE every payload: revisit
    records join the response records on the payload digest and inherit
    the referenced body, so the result is the same (url, warc_ts, html,
    status) table write_warc_dedup consumed — plus is_revisit for
    accounting. One digest-keyed join; response bodies broadcast when
    small, shuffled when not (AQE decides).

    Revisit digests resolve only against response records found in the
    SAME read, so ``path`` must span every batch dir of a warc_dedup
    crawl (e.g. ``state/warc/batch-*``) — an incremental crawl writes
    originals in earlier batches than their revisits. Reading a single
    batch dir in isolation therefore leaves dangling references;
    ``on_unresolved`` decides what happens to them:

    - ``"error"`` (default): the job fails at the first unresolved
      revisit with a message naming its url — a partial glob is a
      caller bug, and html=NULL silently standing in for a real payload
      would corrupt anything downstream.
    - ``"flag"``: keep the row with html=NULL and add a boolean
      ``unresolved_revisit`` column, for intentionally-partial reads
      (per-batch accounting, archive repair) that handle the gaps."""
    if on_unresolved not in ("error", "flag"):
        raise ValueError(f"on_unresolved must be 'error' or 'flag': {on_unresolved!r}")
    files = spark.read.format("binaryFile").load(
        os.path.join(path, "*.warc*") if os.path.isdir(path) else path
    )

    def _read(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                data = bytes(row.content)
                if row.path.endswith(".gz"):
                    data = _gunzip_members(data)
                pos, n = 0, len(data)
                while pos < n:
                    while data.startswith(_CRLF, pos):
                        pos += 2
                    if pos >= n:
                        break
                    hdr_end = data.index(b"\r\n\r\n", pos)
                    headers = {}
                    lines = data[pos:hdr_end].split(_CRLF)
                    if not lines[0].startswith(b"WARC/"):
                        raise ValueError(f"not a WARC record at {pos}")
                    for line in lines[1:]:
                        k, _, v = line.partition(b":")
                        headers[k.strip().lower()] = v.strip()
                    clen = int(headers[b"content-length"])
                    body = data[hdr_end + 4 : hdr_end + 4 + clen]
                    pos = hdr_end + 4 + clen
                    rtype = headers.get(b"warc-type", b"").decode("ascii")
                    if rtype not in ("response", "revisit"):
                        continue
                    url = headers[b"warc-target-uri"].decode("utf-8")
                    ts = pd.Timestamp(
                        headers[b"warc-date"].decode("ascii").rstrip("Z")
                    )
                    status_line, _, rest = body.partition(_CRLF)
                    status = int(status_line.split(b" ")[1])
                    _, _, html = rest.partition(b"\r\n\r\n")
                    if rtype == "response":
                        digest = hashlib.md5(html).hexdigest()
                    else:
                        digest = (
                            headers[b"warc-payload-digest"]
                            .decode("ascii")
                            .split(":", 1)[1]
                        )
                        html = None
                    rows.append((url, ts, html, status, rtype, digest))
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=["url", "warc_ts", "html", "status", "rec_type", "digest"],
                )

    recs = files.select("path", "content").mapInPandas(_read, schema=_DEDUP_READ_SCHEMA)
    bodies = recs.where(F.col("rec_type") == "response").select(
        F.col("digest").alias("digest"), F.col("html").alias("ref_html")
    ).dropDuplicates(["digest"])
    unresolved = (F.col("rec_type") == "revisit") & F.col("ref_html").isNull()
    body = F.coalesce("html", "ref_html")
    if on_unresolved == "error":
        # assert_true returns NULL when the predicate holds and throws
        # (with the url in the message) otherwise — embedding it in the
        # html expression makes the check row-local and unprunable
        body = F.when(
            F.assert_true(
                ~unresolved,
                F.concat(
                    F.lit(
                        "read_warc_dedup: unresolved revisit (no response "
                        "record with its payload digest in this read — pass "
                        "a glob spanning ALL batch dirs, or "
                        "on_unresolved='flag') for "
                    ),
                    F.col("url"),
                ),
            ).isNull(),
            body,
        )
    out = recs.join(bodies, "digest", "left").select(
        "url",
        "warc_ts",
        body.alias("html"),
        "status",
        (F.col("rec_type") == "revisit").alias("is_revisit"),
        unresolved.alias("unresolved_revisit"),
    )
    return out if on_unresolved == "flag" else out.drop("unresolved_revisit")



def _tagged_writer(out_dir: str, ext: str, gzip_records: bool):
    """mapInPandas fn writing tagged rows (is_original + revisit refs)
    as one WARC file per partition — shared by the batch-local and the
    index-aware dedup writers."""

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}{ext}")
        n = 0
        buf = io.BytesIO()
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                if row.is_original:
                    rec = _record_bytes(row.url, row.warc_ts, row.html, row.status)
                else:
                    rec = _revisit_record_bytes(
                        row.url, row.warc_ts, row.status, row.digest,
                        row.ref_url, row.ref_ts,
                    )
                if gzip_records:
                    g = io.BytesIO()
                    with gzip.GzipFile(fileobj=g, mode="wb", mtime=0) as zf:
                        zf.write(rec)
                    buf.write(g.getvalue())
                else:
                    buf.write(rec)
                n += 1
        data = buf.getvalue()
        if n:
            with open(path, "wb") as f:
                f.write(data)
            yield pd.DataFrame(
                {"path": [path], "n_records": [n], "n_bytes": [len(data)]}
            )

    return _write


def write_warc_dedup_with_index(
    df: DataFrame,
    index: DataFrame,
    out_dir: str,
    gzip_records: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Cross-batch revisit dedup: ``index(digest, ref_url, ref_ts)``
    carries every payload digest archived by PRIOR batches; this batch's
    rows matching a known digest become revisit records referencing the
    ORIGINAL capture (possibly batches ago), unknown digests dedup
    batch-locally exactly like write_warc_dedup. Returns (manifest,
    new_index_rows) — union new_index_rows into the carried index for
    the next batch; at a 10^10-page archive the index is one row per
    distinct payload, digest-keyed, and both hops here are digest-grain
    joins with map-side-combined aggregation.

    The write happens when the MANIFEST is consumed; collect it before
    using new_index_rows (which is derived from the same lineage)."""
    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if gzip_records else ".warc"
    base = df.select(
        "url", "warc_ts", "html", F.col("status").cast("int"),
        F.md5(F.coalesce(F.col("html"), F.lit(b""))).alias("digest"),
    )
    idx = index.select(
        "digest", F.col("ref_url").alias("_iurl"), F.col("ref_ts").alias("_its")
    )
    # plain digest join: AQE broadcasts the index at runtime when small
    joined = base.join(idx, "digest", "left")
    fresh_first = (
        joined.where(F.col("_iurl").isNull())
        .groupBy("digest")
        .agg(F.min(F.struct("warc_ts", "url")).alias("first"))
        .select(
            "digest",
            F.col("first.url").alias("_burl"),
            F.col("first.warc_ts").alias("_bts"),
        )
    )
    tagged = joined.join(fresh_first, "digest", "left").select(
        "url", "warc_ts", "html", "status", "digest",
        F.coalesce("_iurl", "_burl").alias("ref_url"),
        F.coalesce("_its", "_bts").alias("ref_ts"),
        # original only when the digest is NEW to the archive and this
        # row is the batch-first capture; anything matching the carried
        # index is a revisit even if url+ts collide with the original
        (
            F.col("_iurl").isNull()
            & (F.col("url") == F.col("_burl"))
            & (F.col("warc_ts") == F.col("_bts"))
        ).alias("is_original"),
    )
    manifest = tagged.mapInPandas(
        _tagged_writer(out_dir, ext, gzip_records), schema=MANIFEST_SCHEMA
    )
    new_index = fresh_first.select(
        "digest", F.col("_burl").alias("ref_url"), F.col("_bts").alias("ref_ts")
    )
    return manifest, new_index