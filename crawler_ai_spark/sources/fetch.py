"""S1 live-fetch mode — the host-partitioned mapInPandas fetch stage.

In this sandbox the crawl loop's "fetch" is a join against the pre-crawled
pages table (SURVEY.md S1: the Iceberg pages table IS the fetch). This
module is the LIVE-mode counterpart the survey sketches — "a mapInPandas
fetch stage over one host-partition at a time" — with every part except
the socket real and tested:

- **host co-location**: the frontier is hash-repartitioned so each host
  lands in exactly one partition (politeness is a per-host serial
  constraint; spreading a host across executors would need distributed
  rate coordination — co-locating it makes pacing a local loop, the same
  move the per-host budget windows make in operators/frontier.py);
- **in-partition ordering**: rows sort by (host, priority,
  discovered_seq), so each host's pages fetch in scheduler order;
- **per-host pacing**: a logical politeness clock per host — row k of a
  host is dispatched at offset (k-1)·delay_ms. In live mode
  (enforce_pacing=True) the worker actually sleeps the residual; in
  planning mode it only books the offsets, so tests and oracle checks run
  at full speed while asserting the exact schedule a live run would obey;
- **UA rotation + headers**: deterministic per-URL agent choice
  (reference crawler.py:49-58 USER_AGENTS, :71-101 get_enhanced_headers
  randomizes per request; here hash-keyed so reruns are reproducible);
- **error taxonomy**: transport failures surface as the same message
  substrings the reference's classifier keys on (crawler.py:424-446),
  so functions/errors.fetch_error_class_expr works unchanged;
- **encoding fallback**: utf-8 → latin-1 with replacement
  (crawler.py:252-262's ContentEncodingError/charset ladder collapsed to
  the byte-safe form);
- **Arrow batching**: bodies stream back in pandas batches; a byte budget
  caps each emitted frame like pipeline/multimodal.py does, so a run of
  multi-MB pages cannot blow an Arrow frame.

Transports are pluggable: `SyntheticTransport` (default) derives status,
body and failure deterministically from md5(url) — DuckDB can re-derive
every output column arithmetically, which is what makes `live_fetch_stage`
an oracle-gated catalog row; `UrllibTransport` is the stdlib live
implementation (no aiohttp dependency), constructor-gated behind
allow_network because this sandbox must never egress — it IS executed
in tests against a loopback http.server (tests/test_urllib_transport.py:
real sockets, real status lines, real timeouts, zero egress).

Retries stay OUT of this stage by design: the crawl loop's W4 ladder
(plans/crawl_loop.py) re-enqueues non-permanent failures as attempt+1
frontier rows, so a retry lands in a later batch with its own politeness
slot — matching the reference's backoff-then-retry (crawler.py:197-233)
without blocking an executor core on sleep.

Scale: one partition per ~host-bucket, no shuffle beyond the single
repartition, no driver collect; the pacing state is O(hosts-in-partition).
"""

from __future__ import annotations

import hashlib
import struct
import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# reference crawler.py:49-58 (the rotation pool is part of S1's semantics)
USER_AGENTS = (
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/124.0.0.0 Safari/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/124.0.0.0 Safari/537.36",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64; rv:109.0) Gecko/20100101 Firefox/115.0",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 13_5) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/16.4 Safari/605.1.15",
    "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/124.0.0.0 Safari/537.36",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Edge/124.0.0.0",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/16.4 Safari/605.1.15",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/123.0.0.0 Safari/537.36",
)

FETCH_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("host", StringType()),
        StructField("status", IntegerType()),
        StructField("html", StringType()),
        StructField("fetch_error", StringType()),
        # the RAW response bytes (post-truncation): `html` is the decoded
        # convenience view, but the utf-8→latin-1 ladder is lossy for
        # non-utf8 pages, so byte-true downstream values (page_bytes, byte
        # parity vs the pages table) must come from here, not from
        # re-encoding `html`
        StructField("body", BinaryType()),
        StructField("body_bytes", LongType()),
        StructField("planned_offset_ms", LongType()),
        StructField("fetch_ms", LongType()),
        StructField("ua_idx", IntegerType()),
        # response validators (RFC 9110 §8.8): stored by the crawl loop's
        # TTL ledger and sent back as If-None-Match / If-Modified-Since on
        # refresh rows, so an unchanged page revalidates with a bodyless
        # 304 instead of a full transfer — at a 10^10-URL frontier most
        # refresh bandwidth disappears. NULL when the transport doesn't
        # surface headers (the 3-tuple contract remains valid).
        StructField("etag", StringType()),
        StructField("last_modified", StringType()),
        # freshness directive (RFC 9111): the crawl loop's TTL ledger
        # turns max-age into the per-URL recrawl interval
        StructField("cache_control", StringType()),
        # RFC 9110 §10.2.3 — server-directed backoff on 429/503; the
        # crawl loop defers the whole host until it elapses
        StructField("retry_after", StringType()),
    ]
)


def _url_key(url: str) -> int:
    """md5-derived integer key — the same 32-bit prefix DuckDB computes as
    CAST(('0x' || substr(md5(url),1,8)) AS BIGINT), which is what lets the
    synthetic transport be oracle-predicted column for column."""
    return struct.unpack(">I", hashlib.md5(url.encode()).digest()[:4])[0]


class SyntheticTransport:
    """Deterministic, network-free transport: md5(url) decides outcome.

    Residue r = key % 100 maps to the reference's observed outcome mix
    (crawler.py:197-233 status ladder, :424-446 error messages):
      r < 85 → 200 + html body   r < 90 → 404   r < 93 → 403
      r < 95 → 429               r < 97 → 503
      r < 99 → connection timeout (transport error, no status)
      else   → DNS failure (transport error, no status)
    A 200 body is a title + 'x'·(100 + key%400) filler — body length is a
    pure function of the key, so DuckDB predicts byte counts too."""

    def __call__(self, url: str, headers: dict[str, str]):
        key = _url_key(url)
        r = key % 100
        if r < 85:
            # deterministic validators: the body is a pure function of the
            # URL, so its ETag can be too — and a conditional request whose
            # If-None-Match matches revalidates with a bodyless 304, which
            # is what lets the TTL-refresh 304 path be tested (and oracle-
            # predicted) without sockets
            etag = f'"{hashlib.md5(url.encode()).hexdigest()[:16]}"'
            resp_headers = {
                "ETag": etag,
                "Last-Modified": f"Thu, 01 Jan 1970 00:00:{key % 60:02d} GMT",
            }
            if headers.get("If-None-Match") == etag:
                return 304, None, None, resp_headers
            body = (
                f"<html><head><title>Page {key % 1000}</title></head>"
                f"<body>{'x' * (100 + key % 400)}</body></html>"
            )
            return 200, body.encode(), None, resp_headers
        if r < 90:
            return 404, None, "404 not found"
        if r < 93:
            return 403, None, "403 forbidden"
        if r < 95:
            return 429, None, "429 rate limited"
        if r < 97:
            return 503, None, "503 service unavailable"
        if r < 99:
            return None, None, "Connection timeout after 15s"
        return None, None, "DNS name or service not known"


class UrllibTransport:
    """Stdlib live transport (urllib, no aiohttp). Constructor-gated:
    this sandbox must never open a socket, so allow_network must be set
    EXPLICITLY by a deployment. Exceptions are normalized to the
    reference's classifier substrings (crawler.py:424-446)."""

    def __init__(self, timeout_s: float = 15.0, allow_network: bool = False):
        if not allow_network:
            raise RuntimeError(
                "UrllibTransport opens real sockets — construct with "
                "allow_network=True only in a deployment with egress"
            )
        self.timeout_s = timeout_s

    def __call__(self, url: str, headers: dict[str, str]):
        import socket
        import urllib.error
        import urllib.request

        req = urllib.request.Request(url, headers=headers)
        try:
            with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                return resp.status, resp.read(), None, dict(resp.headers)
        except urllib.error.HTTPError as e:
            if e.code == 304:
                # Not Modified is a SUCCESSFUL revalidation, not an error
                return 304, None, None, dict(e.headers)
            return e.code, None, f"{e.code} {e.reason}", None
        except socket.timeout:
            return None, None, f"Connection timeout after {self.timeout_s:g}s", None
        except urllib.error.URLError as e:
            reason = str(e.reason).lower()
            if "name or service not known" in reason or "nodename" in reason:
                return None, None, "DNS name or service not known", None
            return None, None, f"connection refused or unreachable: {e.reason}", None


@dataclass
class FetchConfig:
    transport: Callable[[str, dict[str, str]], tuple[int | None, bytes | None, str | None]] = field(
        default_factory=SyntheticTransport
    )
    per_host_delay_ms: int = 500
    # robots Crawl-delay overrides, host → slot width ms (e.g.
    # {h: int(d*1000) for h, d in parse_robots(..., with_crawl_delay=True)};
    # hosts absent here use per_host_delay_ms). A dict, not a DataFrame:
    # it rides into the Arrow workers via closure, sized like host_rules.
    host_delays_ms: dict[str, int] | None = None
    host_partitions: int | None = None  # default: defaultParallelism * 2
    enforce_pacing: bool = False  # live mode sleeps; planning mode only books
    max_body_bytes: int = 2 << 20  # truncate pathological bodies (per row)
    batch_budget_bytes: int = 64 << 20  # emitted Arrow frame cap


def _headers_for(url: str, ua: str) -> dict[str, str]:
    # the reference's anti-bot header block (crawler.py:83-101), minus the
    # per-request randomness (Referer self-link kept, language pinned)
    return {
        "User-Agent": ua,
        "Accept": "text/html,application/xhtml+xml,application/xml;q=0.9,*/*;q=0.8",
        "Accept-Language": "vi-VN,vi;q=0.9,en-US;q=0.8,en;q=0.7",
        "Accept-Encoding": "gzip, deflate",
        "Referer": url,
        "Connection": "keep-alive",
    }


def fetch_pages(
    frontier: DataFrame,
    cfg: FetchConfig | None = None,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """The live-fetch stage: frontier(url, host, priority, discovered_seq)
    → one fetched row per input row, host-co-located and politeness-paced.
    `passthrough` names extra frontier columns to carry through unchanged
    (the crawl loop rides its scheduling metadata along instead of paying
    a join back onto the fetched rows).

    The plan is exactly one exchange (hash on host) + an in-partition sort
    + the Arrow stage — at 10^10-URL scale the repartition count rises with
    the cluster, hosts stay serial, and hot hosts are already capped
    upstream by the budget windows so no partition degenerates."""
    cfg = cfg or FetchConfig()
    spark = frontier.sparkSession
    n_parts = cfg.host_partitions or spark.sparkContext.defaultParallelism * 2
    transport = cfg.transport
    delay_ms = cfg.per_host_delay_ms
    host_delays = cfg.host_delays_ms or {}
    enforce = cfg.enforce_pacing
    max_body = cfg.max_body_bytes
    budget = cfg.batch_budget_bytes

    # priority/discovered_seq are always staged (the politeness sort keys)
    # and always ride through; callers' passthrough adds to them, each
    # column selected exactly ONCE (a duplicate name breaks the Arrow frame)
    passthrough = tuple(
        c
        for c in dict.fromkeys(("priority", "discovered_seq", *passthrough))
        if c not in ("url", "host")
    )
    in_fields = {f.name: f for f in frontier.schema.fields}
    out_schema = StructType(
        list(FETCH_SCHEMA.fields) + [in_fields[c] for c in passthrough]
    )
    out_cols = [f.name for f in out_schema.fields]

    def _fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        next_slot: dict[str, int] = {}  # host → next politeness offset (ms)
        last_dispatch: dict[str, float] = {}  # host → last dispatch wall time
        rows: list[tuple] = []
        acc_bytes = 0

        def flush():
            nonlocal rows, acc_bytes
            if rows:
                yield pd.DataFrame(rows, columns=out_cols)
                rows, acc_bytes = [], 0

        for pdf in batches:
            extra = [pdf[c].tolist() for c in passthrough]
            # conditional-request validators ride in as optional frontier
            # columns (the crawl loop joins them from its TTL ledger onto
            # refresh rows); absent columns mean unconditional fetches
            cond_etag = pdf["cond_etag"].tolist() if "cond_etag" in pdf.columns else None
            cond_lm = (
                pdf["cond_last_modified"].tolist()
                if "cond_last_modified" in pdf.columns
                else None
            )
            for i, (url, host) in enumerate(zip(pdf["url"], pdf["host"])):
                key = _url_key(url)
                ua_idx = key % len(USER_AGENTS)
                offset = next_slot.get(host, 0)
                next_slot[host] = offset + host_delays.get(host, delay_ms)
                if enforce:
                    # pacing is per-host WALL time between dispatches, not
                    # the logical offset vs a partition-start clock: hosts
                    # run serially in host-sorted order, so by the time the
                    # second host starts, partition-elapsed already exceeds
                    # every one of its offsets and an offset-based lag
                    # would never sleep — zero politeness in the only mode
                    # where the delay is real.
                    prev_t = last_dispatch.get(host)
                    if prev_t is not None:
                        lag = prev_t + host_delays.get(host, delay_ms) / 1000.0 - time.perf_counter()
                        if lag > 0:
                            time.sleep(lag)
                req_headers = _headers_for(url, USER_AGENTS[ua_idx])
                if cond_etag is not None and isinstance(cond_etag[i], str):
                    req_headers["If-None-Match"] = cond_etag[i]
                if cond_lm is not None and isinstance(cond_lm[i], str):
                    req_headers["If-Modified-Since"] = cond_lm[i]
                t0 = time.perf_counter()
                last_dispatch[host] = t0
                try:
                    result = transport(url, req_headers)
                    # transports MAY return (status, body, err, headers);
                    # the legacy 3-tuple means "no headers surfaced"
                    if len(result) == 4:
                        status, body, err, resp_headers = result
                    else:
                        status, body, err = result
                        resp_headers = None
                except Exception as e:  # noqa: BLE001 - a 100 TB job survives one bad URL
                    status, body, err, resp_headers = None, None, f"transport error: {e}", None
                fetch_ms = int((time.perf_counter() - t0) * 1000)
                etag = last_modified = cache_control = retry_after = None
                if resp_headers:
                    lowered = {k.lower(): v for k, v in resp_headers.items()}
                    etag = lowered.get("etag")
                    last_modified = lowered.get("last-modified")
                    cache_control = lowered.get("cache-control")
                    retry_after = lowered.get("retry-after")
                if body is not None and len(body) > max_body:
                    body = body[:max_body]
                if body is not None:
                    try:  # crawler.py:252-262 encoding ladder, byte-safe form
                        html = body.decode("utf-8")
                    except UnicodeDecodeError:
                        html = body.decode("latin-1", errors="replace")
                else:
                    html = None
                rows.append(
                    (
                        url, host,
                        int(status) if status is not None else None,
                        html, err, body,
                        len(body) if body is not None else 0,
                        offset, fetch_ms, ua_idx,
                        etag, last_modified, cache_control, retry_after,
                        *(col[i] for col in extra),
                    )
                )
                # the frame carries the body twice (raw + decoded view)
                acc_bytes += 2 * (len(body) if body is not None else 0)
                if acc_bytes >= budget:
                    yield from flush()
        yield from flush()

    # conditional-request validators are stage INPUTS (header material)
    # whether or not the caller passes them through to the output
    cond_cols = tuple(
        c
        for c in ("cond_etag", "cond_last_modified")
        if c in frontier.columns and c not in passthrough
    )
    staged = (
        frontier.repartition(n_parts, F.col("host"))
        .sortWithinPartitions("host", "priority", "discovered_seq")
        .select("url", "host", *passthrough, *cond_cols)
    )
    return staged.mapInPandas(_fetch, out_schema)


class TableTransport:
    """Live-mode transport backed by a parquet pages table — the bridge
    that proves live mode ≡ table mode: it answers each URL with exactly
    the (status, html, fetch_error) row the pages table holds, and misses
    with the pages-join's 'fetch miss' message, so `run_crawl` through the
    fetch stage must be bit-identical to `run_crawl` through the join.
    The table loads once per worker process via pyarrow (module cache);
    at real scale a live crawl has no such table — this transport exists
    for equivalence testing and replay."""

    _cache: dict[str, dict] = {}

    def __init__(self, parquet_path: str):
        self.path = str(parquet_path)

    def _table(self) -> dict:
        tbl = self._cache.get(self.path)
        if tbl is None:
            import pyarrow.parquet as pq

            t = pq.read_table(self.path)
            names = t.column_names
            cols = {
                c: t.column(c).to_pylist()
                for c in ("url", "html", "status", "fetch_error")
                if c in names
            }
            tbl = {}
            for i, u in enumerate(cols["url"]):
                tbl[u] = (
                    cols.get("status", [None] * len(cols["url"]))[i],
                    cols["html"][i],
                    cols.get("fetch_error", [None] * len(cols["url"]))[i],
                )
            self._cache[self.path] = tbl
        return tbl

    def __call__(self, url: str, headers: dict[str, str]) -> tuple[int | None, bytes | None, str | None]:
        row = self._table().get(url)
        if row is None:
            return None, None, "fetch miss: no response"
        status, html, err = row
        if html is not None:
            body = html if isinstance(html, (bytes, bytearray)) else html.encode("utf-8")
            return (int(status) if status is not None else None), bytes(body), None
        return (
            int(status) if status is not None else None,
            None,
            err if err is not None else "fetch miss: no response",
        )
