"""W1 — the multi-batch frontier-expansion loop, checkpointed and resumable.

The reference's Scrapy event loop (scrapy_career_spider.py; pagination BFS
job_extraction_service.py:323-367) becomes a driver-side batch loop: each
batch is one DataFrame lineage frontier → fetch(join pages) → parse →
harvest links → anti-join seen → next frontier, with every state table
written as an atomically-committed batch directory. In production these
writes are Iceberg appends (each one a snapshot); the sandbox ships a
parquet-directory implementation with the same commit semantics (write
batch dir → fsync → rename _COMMITTED marker), so resume-from-checkpoint is
identical: find max committed batch, continue.

Determinized crawl model (shared bit-for-bit with tests/golden_crawl.py —
see operators/frontier.py for why determinization is needed):

- page processing order per seed = (batch asc, priority desc,
  discovered_seq asc); only fetched pages (present in the pages table)
  advance the counters — the reference only counts parsed responses.
- a page P yields links iff crawled_through(P) < max_pages AND
  career_through(P) < max_career_pages (counters INCLUDE P itself —
  spider :459-469); depth-0 homepages always yield (:179-208 runs with
  counters at zero).
- per page: F1-filter raw hrefs → first-occurrence dedup → priority buckets
  (100/80/50/10) → first {5,3,2,2} per bucket → urljoin → same-domain →
  scheduler dedup (first yield wins, then URL-seen anti-join).
- discovered_seq: per-seed ordinal over yields in (parent order, bucket
  desc, bucket rank) order, monotone across batches. Assigned BEFORE
  scheduler dedup (Scrapy assigns queue order at yield time).
"""

from __future__ import annotations

import dataclasses
import pathlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crawler_ai_spark import constants as K
from crawler_ai_spark.functions import filters as FL
from crawler_ai_spark.functions import scoring as SC
from crawler_ai_spark.functions.html import decoded_html, with_parse
from crawler_ai_spark.functions.urls import host_expr, url_hash
from crawler_ai_spark.operators import frontier as FR


@dataclasses.dataclass
class CrawlConfig:
    max_pages: int = K.DEFAULT_MAX_PAGES              # routes.py:60
    max_career_pages: int = K.DEFAULT_MAX_CAREER_PAGES  # spider :462
    max_batches: int = 8
    parallelism: int = 32
    host_budget_per_batch: int | None = None          # W2 politeness cap
    salt_buckets: int = FR.PARSE_SALT_BUCKETS
    use_bloom: bool = False                           # D2 bloom prefilter (operators/seen.py)
    # fixed per-bucket bloom capacity so every batch's DELTA blob shares m
    # and OR-merges into one blob per bucket (incremental build: each batch
    # hashes only its fresh keys, never the full seen set). Size for the
    # expected total keys per bucket at the target crawl scale.
    bloom_keys_per_bucket: int = 4096
    # seen_delta data layout: files per batch append, range-clustered on
    # url_hash so each file covers a disjoint hash range and the snapshot
    # manifest's per-file bounds (sources/snapshots.py) prune a point
    # lookup to ONE file per batch. At 10^10-URL scale set this to
    # thousands; the per-batch repartitionByRange sampling job is noise
    # next to the parse stage.
    seen_delta_files: int = 8
    # W4 — transient-fetch retry budget (crawler.py:157, :199-248): an
    # unfetched frontier row re-enters the NEXT batch with attempt+1 until
    # attempt+1 >= max_fetch_attempts. 1 = no retries (the fixture corpus
    # is static, so a miss is permanent — mirroring the reference's
    # 404/410 permanent class); the state machine is what W4 specifies.
    max_fetch_attempts: int = 1
    # S5 — TTL-driven recrawl (reference cache.py:15-33: md5-keyed fetch
    # cache, 1 h TTL, success-only). Logical time is batch-granular: one
    # batch ≙ batch_interval_seconds of wall time, so an entry fetched in
    # batch b expires at the start of batch b + ttl_batches where
    # ttl_batches = ceil(ttl / interval); with the defaults (both 3600 s)
    # a page refreshes one batch after its last successful fetch. On
    # expiry the key is DELETED from the deletable cache filter (the
    # cuckoo filter — a bloom cannot delete, which is exactly why the
    # north rule asks for the cuckoo fallback) and the URL re-enters the
    # frontier flagged is_recrawl: it is re-FETCHED (visited records the
    # refresh) but is NOT re-seen — it advances no counters, yields no
    # links, and emits no new career/job/seen rows, mirroring a cache
    # refresh rather than a new page discovery. None disables recrawl.
    recrawl_ttl_seconds: int | None = None
    batch_interval_seconds: int = 3600
    # fixed per-bucket capacity of the sharded cache filter (operators/
    # cachefilter.py) — like bloom_keys_per_bucket, every shard shares one
    # table geometry so per-batch updates never resize. Size for the live-
    # within-TTL key count per bucket at the target crawl scale; a shard
    # overflow raises (rebuild from the ledger at higher capacity).
    cache_keys_per_bucket: int = 8192
    # S5+ ADAPTIVE recrawl (freshness-aware scheduling a fixed TTL can't
    # give a 10^10-URL frontier): every successful refresh compares the
    # page's content hash against the ledger's; unchanged content DOUBLES
    # that URL's recrawl interval (capped at recrawl_ttl_max_batches),
    # changed content resets it to the base ttl — stable pages drift to
    # rare refreshes, churning pages stay fresh, and total refresh load
    # drops geometrically on a mostly-static corpus. False pins every URL
    # at the base TTL (scheduling byte-identical to the fixed-TTL loop).
    adaptive_recrawl: bool = False
    recrawl_ttl_max_batches: int = 64
    # S1 LIVE-fetch mode: when set, the batch "fetch" runs through the
    # host-partitioned politeness-paced fetch stage (sources/fetch.py)
    # with this transport instead of joining the pre-fetched pages table.
    # TableTransport(pages.parquet) makes the two modes bit-identical
    # (pinned by tests/test_fetch_stage.py); a deployment passes
    # UrllibTransport(allow_network=True).
    live_transport: object | None = None
    live_delay_ms: int = 0  # politeness slot width booked by the stage
    # W3 LIVE robots: fetch each newly-seen host's /robots.txt through the
    # live fetch stage (sources/robots.fetch_robots), parse it (Allow
    # longest-match + Crawl-delay), cache the rules in a per-batch
    # robots_cache state table, and gate/budget the frontier with them —
    # replacing the static host_rules input. Requires live_transport;
    # mutually exclusive with a caller-supplied host_rules.
    live_robots: bool = False
    # S8 side-sink — archive every fetched page per batch as WARC
    # (Common-Crawl layout, sources/warc.py) under warc_dir/batch-NNNNN/.
    # None disables; the crawl state store is unaffected either way.
    warc_dir: str | None = None
    # Cross-batch archive dedup (requires warc_dir): a persistent
    # digest index (state table warc_digests) makes repeated payloads —
    # unchanged recrawls, mirrored pages fetched batches apart — write
    # small revisit records referencing the ORIGINAL capture instead of
    # re-storing bodies (ISO 28500 identical-payload-digest profile).
    # read_warc_dedup over all batch dirs restores every body.
    warc_dedup: bool = False
    # W4 at HOST granularity — failure circuit breaker: a host whose
    # attempted batch produced only failures (≥1 attempt, 0 successes)
    # for `host_failure_threshold` consecutive attempted batches is
    # cooled down — its frontier rows defer untouched (never dropped)
    # for `host_cooldown_batches` batches, then one probe batch runs and
    # a failure re-trips. Protects the politeness budget from being
    # burned on a dead/blocking host while its queue ages fairly.
    # None disables (default: loop byte-identical).
    host_failure_threshold: int | None = None
    host_cooldown_batches: int = 2
    # Spider-trap gate (functions/traps.py): drop harvested links whose
    # URL structure marks an infinitely-generated subspace (segment
    # loops, calendar pagers, session-id echoes, query cross-products,
    # depth/length caps) BEFORE sequence assignment and the seen-set
    # shuffle — row-local JVM expressions, so the kill is map-side free.
    # False (default) keeps the loop byte-identical to the golden sim.
    trap_filter: bool = False
    # Host-level quarantine on top of the per-URL gate: if, within a
    # batch's harvested links, >= this share of a host's candidates are
    # traps, the WHOLE host is dropped for the batch — the "clean-
    # looking" remainder of a trap-dominated host is usually generated
    # too. The signal is one host-grain map-side-combined aggregate
    # whose result is broadcast-joinable (O(hosts), not O(urls)).
    # Implies the per-URL gate. None (default) disables.
    trap_quarantine_share: float | None = None
    # W3 group selection (RFC 9309 §2.2.1): the crawler's product token.
    # When set, live-robots parsing obeys groups matching this token
    # (exact value, case-insensitive) and ignores * groups on hosts that
    # address this bot directly; None keeps the *-only reading.
    robots_ua_token: str | None = None
    # W3 strict availability (RFC 9309 §2.3.1.4): a host whose live
    # robots fetch was UNREACHABLE (5xx / transport failure) is treated
    # as completely disallowed until a later fetch answers — compose
    # with robots_ttl_batches so the failed entry expires and refetches.
    # False (default): unreachable = unrestricted, the permissive
    # reading, prior behavior. Only meaningful with live_robots.
    robots_unreachable_disallow: bool = False
    # Live-robots cache TTL in batches: a cached /robots.txt older than
    # this is dropped, so the host's next frontier appearance refetches
    # it (lazy revalidation — RFC 9309 caps robots caching at ~24h;
    # hosts not being crawled are never proactively refetched). None
    # (default): cache for the life of the crawl, the prior behavior.
    robots_ttl_batches: int | None = None
    # Server-grain politeness: at most N URLs per RESOLVED IP per batch
    # (vhosts sharing a server share one budget; Heritrix/Nutch group
    # politeness queues this way). Requires run_crawl(ip_map=(host, ip));
    # hosts absent from the map keep host-grain politeness. None
    # (default) disables — loop byte-identical.
    ip_budget_per_batch: int | None = None
    # W2 ADAPTIVE — AutoThrottle (operators/autothrottle.py): each batch
    # folds the measured per-host fetch_ms through the Scrapy update
    # (target = latency/concurrency, averaged with the previous delay,
    # never lowered off an error batch, clamped), persists the delays in
    # an at_delays state table, and derives next batch's per-host budget
    # from them (tightest-wins with Crawl-delay / caller budgets).
    # Requires live_transport — the fetch stage is what measures
    # latency. None (default) disables — loop byte-identical.
    autothrottle: object | None = None  # AutoThrottleConfig
    # S5+ CONDITIONAL revalidation (RFC 9110 §13.1): TTL refresh rows
    # carry the ledger's stored ETag / Last-Modified as If-None-Match /
    # If-Modified-Since; an unchanged page answers 304 with no body —
    # the refresh still advances the cache clock (and, in adaptive mode,
    # doubles the interval: a 304 IS proof of unchanged content) but
    # transfers nothing. At a 10^10-URL frontier, where most refreshes
    # hit unchanged pages, this removes most refresh bandwidth.
    # Requires live_transport + recrawl_ttl_seconds. False (default):
    # refreshes re-download, the prior behavior.
    conditional_revalidation: bool = False
    # S5+ HTTP-driven freshness (RFC 9111): a response carrying
    # Cache-Control max-age sets that URL's recrawl interval directly
    # (ceil(max-age / batch_interval), clamped to [1,
    # recrawl_ttl_max_batches]); no-cache / no-store / max-age=0 pin the
    # URL at the minimum interval. URLs without a directive keep the
    # fixed-or-adaptive schedule. The server knows its own churn better
    # than any change detector — where it says so, believe it. Requires
    # recrawl_ttl_seconds. False (default): directives ignored.
    http_cache_ttl: bool = False
    # W4 server-directed backoff (RFC 9110 §10.2.3): a 429/503 carrying
    # Retry-After defers the WHOLE host's frontier rows (defer-not-drop,
    # same contract as the breaker) until ceil(delta / batch_interval)
    # batches elapse, capped at retry_after_max_batches so a hostile
    # server cannot park a host forever. The date form has no wall-clock
    # anchor at batch grain and counts as a one-batch minimum. Inert in
    # table mode (no response headers). False (default): header ignored.
    honor_retry_after: bool = False
    retry_after_max_batches: int = 16
    # Soft-404 gate (functions/soft404.py): a 200 whose content says
    # not-found (title phrase, or body phrase on a short page) is marked
    # in visited, never counts as a career page, and yields no links —
    # error boilerplate stays out of the corpus and link graph. The page
    # still advances crawl counters (it WAS downloaded) and still enters
    # the TTL ledger (a soft 404 can come back to life). Row-local JVM
    # expressions, map-side free. False (default): loop byte-identical.
    soft404_filter: bool = False
    # Page-level REP gate (functions/pagerep.py): meta robots noindex
    # drops the page from career/job emission (crawled, never indexed);
    # meta robots nofollow/none drops ALL its outlinks from the
    # frontier; rel=nofollow/ugc/sponsored anchors drop individually
    # BEFORE bucketing so a nofollow'd link never consumes O2 budget.
    # Row-local JVM regexps, map-side free; pinned against the golden
    # simulator's pure-Python twins (tests/test_pagerep_loop.py).
    # False (default): loop byte-identical.
    obey_page_rep: bool = False
    # Starvation-free scheduling (O1/W2): every deferral (budget, IP
    # budget, breaker, Retry-After) bumps the row's wait_batches; with
    # aging set, the host-budget rank uses effective priority
    # priority + wait_batches // priority_aging_batches, so a
    # low-priority row deferred k·aging batches outranks any fixed
    # priority eventually — no row starves behind an endless supply of
    # new high-priority URLs on a hot host. None (default): raw
    # priority, loop ordering byte-identical.
    priority_aging_batches: int | None = None
    # W2 at the registrable-domain grain (PSL public suffix + one
    # label): caps a registrant fanning one site across unbounded
    # subdomains — host-grain budgets give every aN.spam.com its own
    # full allowance. Composes after the host budget (tightest grain
    # first), defer-not-drop. None (default): off, loop byte-identical.
    domain_budget_per_batch: int | None = None


FRONTIER_COLS = [
    "url", "url_hash", "host", "seed_url", "seed_host",
    "priority", "depth", "discovered_seq", "parent_url", "attempt",
    "is_recrawl",
    # conditional-revalidation validators: attached when refresh rows are
    # MINTED (from the ledger's stored response validators) and carried
    # through budget deferrals, so a deferred refresh still revalidates
    # in the batch that finally schedules it; NULL everywhere else
    "cond_etag", "cond_last_modified",
    # consecutive-deferral count (priority_aging_batches): minted 0,
    # +1 per deferral, reset to 0 once actually scheduled (retries are
    # scheduled rows, so they re-enter at 0)
    "wait_batches",
]


# ---------------------------------------------------------------------------
# checkpoint store (Iceberg-append semantics over parquet dirs)
# ---------------------------------------------------------------------------


class CrawlStore:
    TABLES = ("frontier", "seen_delta", "visited", "career_pages", "job_urls", "metrics", "seed_state", "bloom_delta", "cache_blobs", "cache_ledger", "robots_cache", "host_breaker", "at_delays", "host_backoff", "warc_digests")

    def __init__(self, spark: SparkSession, root: str | pathlib.Path):
        from crawler_ai_spark.sources.snapshots import SnapshotLog

        self.spark = spark
        self.root = pathlib.Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self.log = SnapshotLog(self.root)
        self._pending: dict[int, list[str]] = {}

    def batch_dir(self, batch_id: int) -> pathlib.Path:
        return self.root / f"batch_id={batch_id}"

    def committed_batches(self) -> list[int]:
        out = []
        for d in self.root.glob("batch_id=*"):
            if (d / "_COMMITTED").exists():
                out.append(int(d.name.split("=", 1)[1]))
        return sorted(out)

    def write(self, batch_id: int, table: str, df: DataFrame) -> None:
        path = self.batch_dir(batch_id) / table
        df.write.mode("overwrite").parquet(str(path))
        self._pending.setdefault(batch_id, []).append(table)

    def commit(self, batch_id: int) -> None:
        """Atomic batch commit: data files first, then one snapshot per
        written table appended to the Iceberg-style log (sources/
        snapshots.py — manifests with per-file stats + per-partition
        lineage), marker last (os.replace-style atomicity mirrors the
        reference's atomic_write_json, scrapy_career_spider.py:40-53).
        A replayed batch after a mid-commit crash supersedes its stale
        snapshots — chain-walking readers never see the dead files."""
        for table in self._pending.pop(batch_id, []):
            self.log.commit(table, batch_id, self.batch_dir(batch_id) / table)
        (self.batch_dir(batch_id) / "_COMMITTED").touch()

    def _manifest_paths(self, table: str, through_batch: int) -> list[str] | None:
        """Manifest-planned file list for committed batches ≤ through_batch,
        or None when any committed batch predates the snapshot log (legacy
        store) — callers then fall back to directory listing."""
        snaps = self.log.snapshots(table)
        logged = {s["batch_id"] for s in snaps}
        # a compaction (replace) snapshot makes the manifest authoritative
        # for every batch it shadows — after vacuum those appends have no
        # snapshots (and no files) of their own
        compacted_through = max(
            (
                s["replaces_through_batch"]
                for s in snaps
                if s["operation"] == "replace" and s["batch_id"] <= through_batch
            ),
            default=-1,
        )
        want = [
            b
            for b in self.committed_batches()
            if b <= through_batch and (self.batch_dir(b) / table).exists()
        ]
        if not want or any(
            b not in logged and b > compacted_through for b in want
        ):
            return None
        return self.log.data_paths(table, through_batch=through_batch)

    def compact(self, table: str, files: int = 8, cluster: str = "hash") -> int:
        """Rewrite every committed append of ``table`` into one
        range-clustered replace snapshot at the current tip (Iceberg's
        rewrite_data_files): at crawl scale the seen set otherwise
        fragments into O(batches × files/batch) small files, and both scan
        planning and the OS pay for it. Readers (including a resumed
        crawl's ``read_all``) see the identical row set; time travel to
        pre-compaction batches keeps working until :meth:`SnapshotLog.
        vacuum` expires the shadowed snapshots. Call between runs, not
        while a batch is mid-write. Returns the new snapshot id.

        ``cluster`` picks the range key: ``"hash"`` (default) clusters by
        url_hash — uniform file sizes, point-lookup pruning. ``"surt"``
        (tables with a url column) materializes the SURT key
        (functions/urls.py) as an extra ``surt`` column, range-clusters
        and sorts by it, so every registered domain — subdomains included
        — is CONTIGUOUS within/across files and the manifest's footer
        bounds on ``surt`` let :meth:`SnapshotLog.prune` answer
        per-domain scans (exports, targeted recrawls, takedowns) from a
        handful of files instead of the whole seen set. The extra column
        is nullable metadata: later plain appends simply lack it, and the
        crawl's own consumers key on url_hash and never read it."""
        tip = max(self.committed_batches())
        df = self.read_all(table, tip)
        sid = (self.log.current_snapshot_id(table) or 0) + 1
        out = self.root / "compacted" / table / f"through={tip}-snap={sid}"
        if cluster == "surt" and "url" in df.columns:
            from crawler_ai_spark.functions.urls import surt_key

            df = (
                df.withColumn("surt", surt_key(F.col("url")))
                .repartitionByRange(files, "surt")
                .sortWithinPartitions("surt")
            )
        else:
            key = "url_hash" if "url_hash" in df.columns else df.columns[0]
            df = df.repartitionByRange(files, key)
        df.write.mode("overwrite").parquet(str(out))
        return self.log.commit(
            table, tip, out, operation="replace", replaces_through_batch=tip
        )

    def delete_domain(self, table: str, domain: str) -> dict | None:
        """Surgical takedown: remove every row of ``domain`` (apex and
        all subdomains) from ``table`` by rewriting ONLY the data files
        that contain matching rows (snapshots.py operation="rewrite" —
        Iceberg's delete-with-rewrite). On a SURT-clustered store
        (compact(cluster="surt")) the manifest's footer bounds pre-prune
        candidates to the domain's contiguous key range; files without
        bounds (plain appends) stay candidates, so the walk is correct on
        any store. Untouched files are never copied — what makes a
        takedown affordable on a 10^10-row seen set. Time travel to
        pre-delete snapshots still sees the rows until compact+vacuum.
        Returns {snapshot_id, rows_deleted, files_rewritten}, or None
        when no row matches."""
        tip = max(self.committed_batches())
        prefix = ",".join(reversed(domain.lower().split(".")))
        cand = self.log.prune(table, "surt", prefix, prefix + "~", through_batch=tip)
        if not cand:
            return None
        df = (
            self.spark.read.option("mergeSchema", "true")
            .parquet(*cand)
            .withColumn("_file", F.input_file_name())
        )
        host = host_expr(F.col("url"))
        is_match = (host == domain.lower()) | host.endswith("." + domain.lower())
        matched_uris = [
            r["_file"]
            for r in df.where(is_match).select("_file").distinct().collect()
        ]
        if not matched_uris:
            return None

        def _plain(u: str) -> str:
            return u[7:] if u.startswith("file://") else u.removeprefix("file:")

        matched_plain = {_plain(u) for u in matched_uris}
        affected = [p for p in cand if p in matched_plain]
        n_deleted = df.where(is_match).count()
        kept = df.where(F.col("_file").isin(matched_uris) & ~is_match).drop("_file")
        sid_next = (self.log.current_snapshot_id(table) or 0) + 1
        out = self.root / "rewrites" / table / f"snap={sid_next}"
        kept.write.mode("overwrite").parquet(str(out))
        sid = self.log.commit(
            table, tip, out, operation="rewrite", removed_paths=affected
        )
        return {
            "snapshot_id": sid,
            "rows_deleted": n_deleted,
            "files_rewritten": len(affected),
        }

    # tables that write a FULL state snapshot every batch (only the
    # latest is ever read; older copies are replay history, not a log)
    STATE_TABLES = ("cache_blobs", "cache_ledger", "robots_cache", "host_breaker", "at_delays", "host_backoff", "warc_digests")

    def compact_state(self, table: str) -> int | None:
        """Rewrite a state table's LATEST snapshot as a replace at the
        tip so :meth:`SnapshotLog.vacuum` can expire the superseded
        per-batch copies — bounding state storage at O(state) instead of
        O(batches × state) for a long-running crawl. Readers keep working
        through :func:`_read_latest_state`'s log fallback. Returns the
        replace snapshot id, or None when the table has no data."""
        batches = [
            b
            for b in self.committed_batches()
            if any((self.batch_dir(b) / table).glob("*.parquet"))
        ]
        if not batches:
            return None
        tip = max(self.committed_batches())
        df = self.read(table, max(batches))
        sid = (self.log.current_snapshot_id(table) or 0) + 1
        out = self.root / "compacted" / table / f"through={tip}-snap={sid}"
        df.write.mode("overwrite").parquet(str(out))
        return self.log.commit(
            table, tip, out, operation="replace", replaces_through_batch=tip
        )

    def read(self, table: str, batch_id: int) -> DataFrame:
        """ONE batch's append — planned from that batch's append snapshot
        (never from a replace snapshot: compacted files cover the whole
        table and carry the compaction's batch id)."""
        paths = [e["path"] for e in self.log.batch_append_files(table, batch_id)]
        if paths:
            return self.spark.read.parquet(*paths)
        return self.spark.read.parquet(str(self.batch_dir(batch_id) / table))

    def read_all(
        self, table: str, through_batch: int, merge_schema: bool = False
    ) -> DataFrame:
        """All committed appends through a batch — planned from the
        snapshot manifests (one metadata read) instead of O(batches)
        directory listings; at object-store scale this is the difference
        between a LIST storm and a single manifest fetch.

        ``merge_schema=True`` unions file schemas across batches — needed
        when a store spans a schema upgrade (e.g. visited written before
        the TTL-recrawl columns existed), where the default pick-a-file
        schema would either drop the new columns or fail analysis."""
        reader = self.spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        paths = self._manifest_paths(table, through_batch)
        if paths is not None:
            return reader.parquet(*paths)
        paths = [
            str(self.batch_dir(b) / table)
            for b in self.committed_batches()
            if b <= through_batch and (self.batch_dir(b) / table).exists()
        ]
        return reader.parquet(*paths)


# ---------------------------------------------------------------------------
# batch construction
# ---------------------------------------------------------------------------


def init_frontier(seeds: DataFrame) -> DataFrame:
    """Batch-0 frontier from the seed list (priority 100, depth 0 —
    spider start_requests :141-154)."""
    return seeds.select(
        F.col("seed_url").alias("url"),
        url_hash(F.col("seed_url")).alias("url_hash"),
        host_expr(F.col("seed_url")).alias("host"),
        F.col("seed_url"),
        host_expr(F.col("seed_url")).alias("seed_host"),
        F.lit(100).alias("priority"),
        F.lit(0).alias("depth"),
        F.lit(0).cast("long").alias("discovered_seq"),
        F.lit(None).cast("string").alias("parent_url"),
        F.lit(0).alias("attempt"),
        F.lit(False).alias("is_recrawl"),
        F.lit(None).cast("string").alias("cond_etag"),
        F.lit(None).cast("string").alias("cond_last_modified"),
        F.lit(0).alias("wait_batches"),
    )


def init_seed_state(seeds: DataFrame) -> DataFrame:
    return seeds.select(
        "seed_url",
        F.lit(0).cast("long").alias("crawled_total"),
        F.lit(0).cast("long").alias("career_total"),
        F.lit(0).cast("long").alias("seq_offset"),
        F.coalesce(F.col("max_pages"), F.lit(K.DEFAULT_MAX_PAGES)).alias("max_pages"),
        F.coalesce(F.col("max_career_pages"), F.lit(K.DEFAULT_MAX_CAREER_PAGES)).alias(
            "max_career_pages"
        ),
    )


def fetch_and_parse(frontier: DataFrame, pages: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """"Fetch" = join the pre-fetched pages table (S1: the Iceberg pages
    table IS the fetch cache, SURVEY.md S5); then the single structural
    parse UDF. Salted repartition defeats hot-host skew in this stage.

    S1 error taxonomy: the pages table may carry (status, fetch_error) for
    failed fetches (html NULL); `fetch_error_class` classifies per
    crawler.py:424-446 and drives the W4 per-class retry. Legacy pages
    tables without those columns get them as NULLs."""
    from crawler_ai_spark.functions.errors import fetch_error_class_expr

    if cfg.live_transport is not None:
        # S1 LIVE mode — the real fetch stage (host co-location, politeness
        # slots, UA rotation, encoding ladder). Downstream is identical:
        # the stage emits the same (url, host, status, html, fetch_error)
        # shape the pages join produces, frontier metadata rides through.
        from crawler_ai_spark.sources.fetch import FetchConfig, fetch_pages

        passthrough = tuple(c for c in frontier.columns if c not in ("url", "host"))
        fetched = fetch_pages(
            frontier,
            FetchConfig(
                transport=cfg.live_transport,
                per_host_delay_ms=cfg.live_delay_ms,
                host_partitions=cfg.parallelism,
            ),
            passthrough=passthrough,
            # fetch_ms rides through for the AutoThrottle update (W2
            # adaptive); every store write selects explicit columns, so
            # the extra column never reaches persisted state
        ).drop("body_bytes", "planned_offset_ms", "ua_idx")
        fetched = (
            # the loop's page schema is BINARY: use the stage's RAW body
            # bytes, not a re-encode of the decoded text — the utf-8→
            # latin-1 ladder is lossy for non-utf8 pages, and byte-true
            # page_bytes is what makes live mode ≡ pages-table mode for
            # arbitrary corpora, not just utf-8-round-trippable ones
            fetched.withColumn("html", F.col("body")).drop("body")
            .withColumn("warc_ts", F.lit(None).cast("timestamp"))
            .withColumn("lang", F.lit(None).cast("string"))
            .withColumn("fetched", F.col("html").isNotNull())
            # a 304 on a refresh row is a SUCCESSFUL bodyless revalidation
            # (conditional_revalidation), not a fetch failure. eqNullSafe:
            # a transport failure has status NULL, and `NULL == 304`
            # would make revalidated NULL — silently excluding the failed
            # refresh from retries, error metrics, the breaker and the
            # AutoThrottle error rule (all of which AND/negate this flag)
            .withColumn(
                "revalidated",
                F.coalesce(F.col("is_recrawl"), F.lit(False))
                & F.col("status").eqNullSafe(304),
            )
            .withColumn(
                "fetch_error",
                F.when(
                    F.col("fetched") | F.col("revalidated"),
                    F.lit(None).cast("string"),
                ).otherwise(
                    F.coalesce(F.col("fetch_error"), F.lit("fetch miss: no response"))
                ),
            )
            .withColumn("fetch_error_class", fetch_error_class_expr(F.col("fetch_error")))
        )
    else:
        page_cols = ["url", "warc_ts", "html", "lang"]
        right = pages
        for c in ("status", "fetch_error"):
            if c in pages.columns:
                page_cols.append(c)
            else:
                right = right.withColumn(
                    c, F.lit(None).cast("int" if c == "status" else "string")
                )
                page_cols.append(c)
        fetched = (
            frontier.join(right.select(*page_cols), "url", "left")
            .withColumn("fetched", F.col("html").isNotNull())
            .withColumn(
                "fetch_error",
                # a frontier row with NO pages row at all is a miss — the
                # reference's generic transport failure, class 'other'
                F.when(F.col("fetched"), F.lit(None).cast("string")).otherwise(
                    F.coalesce(F.col("fetch_error"), F.lit("fetch miss: no response"))
                ),
            )
            .withColumn("fetch_error_class", fetch_error_class_expr(F.col("fetch_error")))
            # table mode has no response headers and no conditional path;
            # the columns exist so visited has ONE schema across modes
            .withColumn("etag", F.lit(None).cast("string"))
            .withColumn("last_modified", F.lit(None).cast("string"))
            .withColumn("cache_control", F.lit(None).cast("string"))
            .withColumn("retry_after", F.lit(None).cast("string"))
            .withColumn("revalidated", F.lit(False))
        )
    # retry rows re-enter via select(*FRONTIER_COLS) off this output, so
    # the validator columns must exist whether or not the input carried
    # them (direct callers may pass minimal frontiers)
    for c in ("cond_etag", "cond_last_modified"):
        if c not in fetched.columns:
            fetched = fetched.withColumn(c, F.lit(None).cast("string"))
    if "wait_batches" not in fetched.columns:
        fetched = fetched.withColumn("wait_batches", F.lit(0))
    fetched = FR.salted_repartition(fetched, cfg.parallelism, cfg.salt_buckets)
    parsed = with_parse(fetched)
    content_lower = F.lower(F.coalesce(decoded_html(F.col("html")), F.lit("")))
    title_lower = F.lower(F.coalesce(F.col("parse.title"), F.lit("")))
    career_score = SC.career_score_expr(F.col("url"), content_lower, title_lower)
    is_listing = FL.is_career_listing_expr(F.col("url"), content_lower, title_lower)
    if cfg.soft404_filter:
        from crawler_ai_spark.functions.soft404 import is_soft404

        soft404 = F.col("fetched") & is_soft404(
            F.col("status"), F.col("parse.title"), F.col("parse.text")
        )
    else:
        soft404 = F.lit(False)
    not_noindex = F.lit(True)
    out = parsed
    if cfg.obey_page_rep:
        from crawler_ai_spark.functions import pagerep as REP

        html_str = decoded_html(F.col("html"))
        meta = REP.meta_robots_expr(html_str)
        nf_hrefs = F.transform(
            F.filter(REP.rel_links_expr(html_str), lambda l: l["nofollow"]),
            lambda l: l["href"],
        )
        out = (
            out.withColumn("rep_noindex", F.col("fetched") & meta["noindex"])
            .withColumn("rep_nofollow", F.col("fetched") & meta["nofollow"])
            .withColumn(
                "rep_nofollow_hrefs",
                F.when(F.col("fetched"), nf_hrefs).otherwise(
                    F.array().cast("array<string>")
                ),
            )
        )
        not_noindex = ~F.col("rep_noindex")
    return (
        out.withColumn("soft404", soft404)
        .withColumn("career_score", F.when(F.col("fetched"), career_score).otherwise(F.lit(0.0)))
        .withColumn(
            "is_career_page",
            F.col("fetched") & ~F.col("soft404") & not_noindex
            & is_listing & (career_score >= F.lit(K.CAREER_SCORE_THRESHOLD)),
        )
        .withColumn(
            "career_indicators",
            F.when(
                F.col("fetched"), SC.career_indicators_expr(F.col("url"), content_lower, title_lower)
            ).otherwise(F.array().cast("array<string>")),
        )
        .withColumn("page_bytes", F.coalesce(F.length(F.col("html")), F.lit(0)))
    )


def order_and_gate(parsed: DataFrame, seed_state: DataFrame) -> DataFrame:
    """Per-seed processing order + cumulative stop-condition gate."""
    w_order = Window.partitionBy("seed_url").orderBy(
        F.col("priority").desc(), F.col("discovered_seq").asc()
    )
    w_cum = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df = parsed.join(F.broadcast(seed_state), "seed_url", "left")
    # only fetched pages advance counters (no response → no parse_page);
    # TTL refreshes (is_recrawl) are cache maintenance, not new pages —
    # they advance nothing and never yield (re-crawl ≠ re-seen)
    counts = (F.col("fetched") & ~F.col("is_recrawl")).cast("long")
    df = df.withColumn("page_order", F.sum(counts).over(w_cum))
    df = df.withColumn(
        "career_cum",
        F.sum((F.col("is_career_page") & ~F.col("is_recrawl")).cast("long")).over(w_cum),
    )
    crawled_through = F.col("crawled_total") + F.col("page_order")
    career_through = F.col("career_total") + F.col("career_cum")
    # soft-404 pages yield nothing (column-guarded: direct callers may
    # pass minimal parsed shapes); ditto page-level REP nofollow
    not_soft = ~F.col("soft404") if "soft404" in parsed.columns else F.lit(True)
    not_rep_nf = (
        ~F.col("rep_nofollow") if "rep_nofollow" in parsed.columns else F.lit(True)
    )
    return df.withColumn(
        "yields_links",
        F.col("fetched")
        & not_soft
        & not_rep_nf
        & ~F.col("is_recrawl")
        & (
            (F.col("depth") == 0)
            | (
                (crawled_through < F.col("max_pages"))
                & (career_through < F.col("max_career_pages"))
            )
        ),
    )


def extract_job_urls(parsed: DataFrame) -> DataFrame:
    """Job URLs from career pages (spider :743-826): ALL links, urljoined,
    F3-classified, distinct per career page. No budget/validity filter —
    the reference's Method 1 walks every <a href>."""
    from crawler_ai_spark.functions.html import explode_links
    from crawler_ai_spark.functions.urls import canonicalize_udf

    career = parsed.where(F.col("is_career_page"))
    links = explode_links(career.select("seed_url", "url", "parse"))
    links = links.where(F.col("href").isNotNull()).withColumn(
        "job_url", canonicalize_udf(F.col("url"), F.col("href"))
    )
    return (
        links.where(FL.is_job_url_expr(F.col("job_url")))
        .select("seed_url", F.col("url").alias("career_url"), "job_url")
        .distinct()
    )


def next_frontier(
    gated: DataFrame,
    seen: DataFrame,
    seed_state: DataFrame,
    use_bloom: bool = False,
    cache_registry: list | None = None,
    blooms: DataFrame | None = None,
    trap_filter: bool = False,
    trap_quarantine_share: float | None = None,
    dust_rules: DataFrame | None = None,
) -> DataFrame:
    """Links of yield-allowed pages → scheduled child frontier rows.

    ``use_bloom`` routes the seen-dedup through the partitioned bloom
    prefilter (operators/seen.dedup_with_bloom — identical output, only
    the bloom-"maybe" residue pays the exact check); the default exact
    anti-join is the sandbox-scale fast path. Pass ``blooms`` (e.g. the
    OR-merge of committed per-batch delta blobs) to skip the full
    rebuild-from-seen — the incremental path run_crawl uses."""
    rep_cols = (
        ["rep_nofollow_hrefs"] if "rep_nofollow_hrefs" in gated.columns else []
    )
    yielding = gated.where(F.col("yields_links")).select(
        "seed_url", "seed_host", "url", "depth", "page_order", "parse", *rep_cols
    )
    links = FR.harvest_links(yielding)
    if trap_filter or trap_quarantine_share is not None:
        from crawler_ai_spark.functions import traps as TR

        # before sequence assignment: a trap URL never consumes queue
        # order (mirrors the reference's enqueue-time should_exclude_url)
        links = links.withColumn("_trap", TR.is_trap_expr(F.col("child_url")))
        if trap_quarantine_share is not None:
            # batch-local host signal: share of trap candidates per host;
            # hosts at/over the threshold lose ALL their links this batch.
            # links derives from the persisted gated batch, so the
            # aggregate branch recomputes only the cheap harvest; its
            # result is host-grain (broadcast anti-join under AQE).
            links = links.withColumn("_lhost", host_expr(F.col("child_url")))
            bad_hosts = (
                links.groupBy("_lhost")
                .agg(F.avg(F.col("_trap").cast("double")).alias("_share"))
                .where(F.col("_share") >= float(trap_quarantine_share))
                .select("_lhost")
            )
            links = links.join(bad_hosts, "_lhost", "left_anti").drop("_lhost")
        links = links.where(~F.col("_trap")).drop("_trap")
    seq_offsets = seed_state.select("seed_url", F.col("seq_offset"))
    candidates = FR.assign_sequence(links, seq_offsets)
    if dust_rules is not None:
        # learned structural-duplicate collapse: rewrite by the mined
        # constant rules BEFORE hashing, so print-view/session-id
        # variants share one url_hash and the first-discovery window
        # in the seen-dedup keeps exactly one — the other variants cost
        # zero fetches. Sequence numbers are assigned pre-rewrite: a
        # collapsed variant still consumed its discovery slot, keeping
        # the rules-off and rules-on orderings aligned on shared URLs.
        from crawler_ai_spark.operators.dust import apply_dust_rules

        candidates = (
            apply_dust_rules(candidates, dust_rules, url_col="child_url")
            .drop("child_url")
            .withColumnRenamed("canonical_url", "child_url")
        )
    candidates = FR.with_url_hash(candidates, "child_url")
    if use_bloom:
        from crawler_ai_spark.operators import seen as SN

        if blooms is None:
            blooms = SN.build_bloom(seen.select("url_hash"))
        fresh = SN.dedup_with_bloom(
            candidates, seen, blooms, cache_registry=cache_registry
        )
    else:
        fresh = FR.dedup_against_seen(candidates, seen)
    return fresh.select(
        F.col("child_url").alias("url"),
        "url_hash",
        host_expr(F.col("child_url")).alias("host"),
        "seed_url",
        "seed_host",
        "priority",
        (F.col("depth") + 1).alias("depth"),
        F.col("discovered_seq").cast("long").alias("discovered_seq"),
        F.col("url").alias("parent_url"),
        F.lit(0).alias("attempt"),
        F.lit(False).alias("is_recrawl"),
        F.lit(None).cast("string").alias("cond_etag"),
        F.lit(None).cast("string").alias("cond_last_modified"),
        F.lit(0).alias("wait_batches"),
    ), candidates


def batch_metrics(gated: DataFrame, batch_id: int) -> DataFrame:
    """A4 — per-partition fetch/parse metrics (north rule): one row per
    (batch, physical partition, host-bucket proxy)."""
    return (
        gated.withColumn("part_id", F.spark_partition_id())
        .groupBy("part_id")
        .agg(
            F.count("*").alias("scheduled"),
            F.sum(F.col("fetched").cast("long")).alias("fetched"),
            # a 304 revalidation is a SUCCESSFUL bodyless refresh, not an
            # error (conditional_revalidation); counted on its own
            F.sum(F.col("revalidated").cast("long")).alias("revalidated"),
            F.sum(
                (~F.col("fetched") & ~F.col("revalidated")).cast("long")
            ).alias("fetch_errors"),
            # S1 taxonomy breakdown: permanent (never retried) vs transient
            F.sum(
                (F.col("fetch_error_class") == "not_found").cast("long")
            ).alias("permanent_errors"),
            F.sum(
                (~F.col("fetched") & ~F.col("revalidated")
                 & (F.coalesce(F.col("fetch_error_class"), F.lit("")) != "not_found")).cast("long")
            ).alias("transient_errors"),
            F.sum(F.col("is_career_page").cast("long")).alias("career_pages"),
            F.sum("page_bytes").alias("bytes"),
            F.approx_count_distinct("host").alias("hosts"),
        )
        .withColumn("batch_id", F.lit(batch_id))
    )


def _read_latest_state(
    store: CrawlStore, table: str, prev: int
) -> tuple[DataFrame, int] | None:
    """Latest copy of a full-state-per-batch table through batch ``prev``
    plus the batch it is current AS OF: the newest committed batch dir
    that still holds parquet files (a vacuumed dir may exist but be
    empty), else the newest replace snapshot in the table's log
    (compact_state + vacuum moves the only live copy there; its as-of is
    replaces_through_batch), else None."""
    with_files = [
        b
        for b in store.committed_batches()
        if b <= prev and any((store.batch_dir(b) / table).glob("*.parquet"))
    ]
    if with_files:
        b0 = max(with_files)
        return store.read(table, b0), b0
    reps = [s for s in store.log.snapshots(table) if s["operation"] == "replace"]
    if reps:
        paths = [e["path"] for e in reps[-1]["manifest"]]
        if paths:
            as_of = reps[-1].get("replaces_through_batch") or reps[-1]["batch_id"]
            return store.spark.read.parquet(*paths), int(as_of)
    return None


def _with_adaptive_cols(ledger: DataFrame) -> DataFrame:
    """Backfill the adaptive-recrawl / validator ledger columns on
    snapshots written before they existed (same pattern as the frontier's
    is_recrawl backfill): NULLs mean 'no history' and every consumer
    coalesces ttl_batches to the configured base."""
    for c, t in (
        ("content_hash", "long"),
        ("ttl_batches", "int"),
        ("etag", "string"),
        ("last_modified", "string"),
    ):
        if c not in ledger.columns:
            ledger = ledger.withColumn(c, F.lit(None).cast(t))
    return ledger


_MAX_AGE_RX = r"(?i)(?:^|[,\s])max-age\s*=\s*(\d+)"
_NO_CACHE_RX = r"(?i)(?:^|[,\s])no-(?:cache|store)(?:$|[,\s])"


def _http_ttl_batches(cache_control: Column, interval_s: int, max_ttl: int) -> Column:
    """RFC 9111 freshness → recrawl interval in batches: max-age=N maps
    to ceil(N / interval) clamped to [1, max_ttl]; no-cache/no-store (or
    max-age=0) pin the minimum; absent/unparsable → NULL (caller keeps
    its fixed/adaptive schedule). Pure JVM expressions."""
    max_age = F.nullif(
        F.regexp_extract(F.coalesce(cache_control, F.lit("")), _MAX_AGE_RX, 1),
        F.lit(""),
    ).cast("long")
    # guard on presence FIRST: Spark's greatest/least SKIP nulls, so the
    # clamp alone would turn "no directive" into 1 instead of NULL
    from_age = F.when(
        max_age.isNotNull(),
        F.least(
            F.greatest(F.ceil(max_age / F.lit(interval_s)).cast("int"), F.lit(1)),
            F.lit(max_ttl),
        ),
    )
    no_cache = F.coalesce(cache_control, F.lit("")).rlike(_NO_CACHE_RX)
    return F.when(no_cache, F.lit(1)).otherwise(from_age).cast("int")


def _ledger_delta(
    visited: DataFrame,
    base_ttl: int | None = None,
    http_ttl_interval_s: int | None = None,
    http_ttl_max: int | None = None,
) -> DataFrame:
    """One batch's visited rows folded to the ledger shape. content_hash
    rides along for the adaptive-recrawl change detector; a fresh fetch
    starts at the base interval (the doubling happens in _merge_ledger
    where the previous hash is visible). A 304 revalidation advances the
    fetch clock like a download but carries no body: its content_hash /
    validators stay NULL and _merge_ledger keeps the previous ones."""
    for c, t in (  # pre-upgrade visited files
        ("content_hash", "long"),
        ("etag", "string"),
        ("last_modified", "string"),
        ("cache_control", "string"),
        ("revalidated", "boolean"),
    ):
        if c not in visited.columns:
            visited = visited.withColumn(c, F.lit(None).cast(t))
    reval = F.coalesce(F.col("revalidated"), F.lit(False))
    refreshed = F.col("fetched") | reval
    return visited.groupBy("seed_url", "url").agg(
        F.max(F.when(refreshed, F.col("batch_id"))).alias("last_fetch_batch"),
        F.max("batch_id").alias("last_visit_batch"),
        F.min("priority").alias("priority"),
        F.min("depth").alias("depth"),
        F.min("discovered_seq").alias("discovered_seq"),
        F.max(F.when(F.col("fetched"), F.col("content_hash"))).alias("content_hash"),
        F.max(
            F.when(refreshed, F.lit(base_ttl).cast("int"))
        ).alias("ttl_batches"),
        # validators also refresh off a 304 (RFC 9110 §15.4.5: the 304's
        # header fields update the stored response) — the fetch stage
        # surfaces them on revalidations too
        F.max(F.when(refreshed, F.col("etag"))).alias("etag"),
        F.max(F.when(refreshed, F.col("last_modified"))).alias("last_modified"),
        F.max(F.when(F.col("fetched"), F.col("batch_id"))).alias("_real_fetch_batch"),
        # http_cache_ttl: the directive-implied interval of this batch's
        # response (NULL when off, absent, or unparsable)
        (
            F.max(
                F.when(
                    refreshed,
                    _http_ttl_batches(
                        F.col("cache_control"), http_ttl_interval_s, http_ttl_max
                    ),
                )
            )
            if http_ttl_interval_s is not None
            else F.lit(None).cast("int")
        ).alias("_http_ttl"),
    )


def _merge_ledger(
    prev_ledger: DataFrame,
    delta: DataFrame,
    adaptive: bool = False,
    base_ttl: int | None = None,
    max_ttl: int | None = None,
) -> DataFrame:
    """Fold a batch delta into the carried ledger state. min/max are
    associative, so merging per batch equals aggregating all history:
    greatest/least skip NULLs in Spark, which keeps last_fetch_batch NULL
    until the first successful fetch — same as the global aggregate.

    Adaptive recrawl (Cho & Garcia-Molina-style freshness): when the
    delta's fetch returned the SAME content hash the ledger already
    holds, the URL's recrawl interval doubles (capped at max_ttl); a
    CHANGED hash resets it to base_ttl; a first fetch starts at base_ttl.
    The fold is order-dependent by design and every caller replays
    batches in ascending order. adaptive=False pins ttl_batches at
    base_ttl — byte-identical scheduling to the fixed-TTL loop."""
    keys = ("seed_url", "url")
    vals = (
        "last_fetch_batch", "last_visit_batch", "priority", "depth",
        "discovered_seq", "content_hash", "ttl_batches", "etag",
        "last_modified",
    )
    prev_ledger = _with_adaptive_cols(prev_ledger)
    delta = _with_adaptive_cols(delta)
    if "_real_fetch_batch" not in delta.columns:  # delta from legacy replay
        delta = delta.withColumn("_real_fetch_batch", F.col("last_fetch_batch"))
    if "_http_ttl" not in delta.columns:
        delta = delta.withColumn("_http_ttl", F.lit(None).cast("int"))
    p = prev_ledger.select(*keys, *[F.col(c).alias(f"p_{c}") for c in vals])
    d = delta.select(
        *keys,
        *[F.col(c).alias(f"d_{c}") for c in vals],
        F.col("_real_fetch_batch").alias("d_real_fetch"),
        F.col("_http_ttl").alias("d_http_ttl"),
    )
    j = p.join(d, list(keys), "full_outer")
    fetched_now = F.col("d_last_fetch_batch").isNotNull() & (
        F.coalesce(F.col("p_last_fetch_batch"), F.lit(-1))
        < F.col("d_last_fetch_batch")
    )
    # did the advance come from a real 200 download (new body, new
    # validators) or a bodyless 304 revalidation (keep the previous ones)?
    real_now = fetched_now & F.col("d_real_fetch").isNotNull()
    reval_now = fetched_now & F.col("d_real_fetch").isNull()
    prev_ttl = F.coalesce(F.col("p_ttl_batches"), F.lit(base_ttl).cast("int"))
    if adaptive:
        unchanged = reval_now | (
            F.col("p_content_hash").isNotNull()
            & (F.col("d_content_hash") == F.col("p_content_hash"))
        )
        new_ttl = (
            F.when(
                fetched_now & unchanged,
                F.least(prev_ttl * 2, F.lit(max_ttl).cast("int")),
            )
            .when(fetched_now, F.lit(base_ttl).cast("int"))
            .otherwise(F.col("p_ttl_batches"))
        )
    else:
        new_ttl = F.when(
            fetched_now, F.lit(base_ttl).cast("int")
        ).otherwise(F.col("p_ttl_batches"))
    # http_cache_ttl (RFC 9111): a directive on THIS advance is
    # authoritative over both the fixed base and the adaptive estimate —
    # the server declared its own freshness lifetime
    new_ttl = F.when(
        fetched_now & F.col("d_http_ttl").isNotNull(), F.col("d_http_ttl")
    ).otherwise(new_ttl)
    return j.select(
        *keys,
        F.greatest("p_last_fetch_batch", "d_last_fetch_batch").alias("last_fetch_batch"),
        F.greatest("p_last_visit_batch", "d_last_visit_batch").alias("last_visit_batch"),
        F.least("p_priority", "d_priority").alias("priority"),
        F.least("p_depth", "d_depth").alias("depth"),
        F.least("p_discovered_seq", "d_discovered_seq").alias("discovered_seq"),
        F.when(real_now, F.col("d_content_hash"))
            .otherwise(F.col("p_content_hash")).alias("content_hash"),
        new_ttl.cast("int").alias("ttl_batches"),
        # any advance (download OR 304) may carry refreshed validators;
        # a bodyless 304 without them keeps the previous ones
        F.when(fetched_now, F.coalesce(F.col("d_etag"), F.col("p_etag")))
            .otherwise(F.col("p_etag")).alias("etag"),
        F.when(fetched_now, F.coalesce(F.col("d_last_modified"), F.col("p_last_modified")))
            .otherwise(F.col("p_last_modified")).alias("last_modified"),
    )


def _cache_ledger(
    store: CrawlStore,
    prev: int,
    adaptive: bool = False,
    base_ttl: int | None = None,
    max_ttl: int | None = None,
    http_interval_s: int | None = None,
):
    """Per-URL fetch-cache state through batch ``prev`` (S5 TTL recrawl):
    one row per (seed_url, url) with the batch of the last SUCCESSFUL
    fetch (= the cache entry's logical timestamp — success-only caching,
    reference cache.py:26-33), the last visit of any kind (spacing bound
    for refresh attempts on pages that have since vanished), and the
    scheduling metadata a refresh row re-enters the frontier with.
    None before the first visited batch exists (batch 0 writes none).

    The state is INCREMENTAL: every TTL batch persists its merged ledger
    as the ``cache_ledger`` table, so the steady-state read here is one
    parquet load of the latest snapshot — NOT an O(crawl-age) re-scan of
    all visited history per batch (at a 10^10-URL frontier the visited
    log only grows; re-aggregating it every batch is the same disease the
    sharded cache filter fixed for the key set). Two fallbacks keep old
    stores working: batches run before this table existed (or with TTL
    disabled) are folded in from their per-batch visited deltas; a store
    with no ledger snapshot at all falls back to the full-history
    aggregation with mergeSchema + path-derived batch_id backfill."""
    committed = [b for b in store.committed_batches() if b <= prev]
    state = _read_latest_state(store, "cache_ledger", prev)
    if state is not None:
        ledger, b0 = state
        # fold in any visited batches after the snapshot (TTL toggled off
        # and on again, or a legacy tail) — bounded by the gap, not by age
        for b in committed:
            if b > b0 and (store.batch_dir(b) / "visited").exists():
                ledger = _merge_ledger(
                    ledger,
                    _ledger_delta(
                        store.read("visited", b), base_ttl=base_ttl,
                        http_ttl_interval_s=http_interval_s, http_ttl_max=max_ttl,
                    ),
                    adaptive=adaptive, base_ttl=base_ttl, max_ttl=max_ttl,
                )
        return _with_adaptive_cols(ledger)
    if not any((store.batch_dir(b) / "visited").exists() for b in committed):
        return None
    vis = store.read_all("visited", prev, merge_schema=True)
    # A store written before the TTL-recrawl upgrade has visited files
    # without batch_id; mergeSchema surfaces the column as null for those
    # files (or omits it when NO file has it). Recover it from the
    # batch_id=N partition directory in the file path, same as the
    # frontier's is_recrawl backfill in run_crawl.
    if "batch_id" not in vis.columns:
        vis = vis.withColumn("batch_id", F.lit(None).cast("long"))
    vis = vis.withColumn(
        "batch_id",
        F.coalesce(
            F.col("batch_id"),
            F.regexp_extract(F.input_file_name(), r"batch_id=(\d+)", 1).cast("long"),
        ),
    )
    # full-history fallback: adaptive doubling state is NOT replayable
    # from a single aggregate (it is a per-batch fold); legacy stores
    # restart every URL at the base interval, which only means earlier-
    # than-necessary refreshes, never stale ones
    return _with_adaptive_cols(
        vis.groupBy("seed_url", "url").agg(
            F.max(F.when(F.col("fetched"), F.col("batch_id"))).alias("last_fetch_batch"),
            F.max("batch_id").alias("last_visit_batch"),
            F.min("priority").alias("priority"),
            F.min("depth").alias("depth"),
            F.min("discovered_seq").alias("discovered_seq"),
        )
    )


def _url_cache_state(ledger: DataFrame, default_ttl: int | None = None) -> DataFrame:
    """URL-level cache timestamps: the cache is keyed by the URL alone
    (reference cache.py:17 md5(url)), while the ledger is per (seed, url)
    — a URL two seeds share is ONE cache entry, refreshed by whichever
    visit fetched it last. url_ttl is the entry's CURRENT recrawl
    interval (adaptive mode; the max across seeds tracks the interval of
    the latest fetch), coalesced to the configured base for rows without
    adaptive history."""
    ledger = _with_adaptive_cols(ledger)
    out = ledger.groupBy("url").agg(
        F.max("last_fetch_batch").alias("url_fetch_batch"),
        F.max("last_visit_batch").alias("url_visit_batch"),
        F.max("ttl_batches").alias("url_ttl"),
    )
    if default_ttl is not None:
        out = out.withColumn(
            "url_ttl", F.coalesce(F.col("url_ttl"), F.lit(default_ttl).cast("int"))
        )
    return out


def _recrawl_due(ledger: DataFrame, batch_id: int, ttl_batches: int) -> DataFrame:
    """Cache entries whose TTL lapsed and whose refresh is due this batch:
    expired (last successful fetch >= url_ttl batches ago, URL-level) and
    not attempted within the TTL window (so a refresh that misses — page
    since deleted — retries every url_ttl, not every batch, like the
    reference re-fetching an uncacheable URL on each access). Every seed
    that visited the URL gets a refresh row. url_ttl is the per-URL
    adaptive interval, == ttl_batches everywhere in fixed-TTL mode."""
    due_urls = _url_cache_state(ledger, default_ttl=ttl_batches).where(
        F.col("url_fetch_batch").isNotNull()
        & (F.col("url_fetch_batch") <= F.lit(batch_id) - F.col("url_ttl"))
        & (F.col("url_visit_batch") <= F.lit(batch_id) - F.col("url_ttl"))
    )
    return ledger.join(F.broadcast(due_urls.select("url")), "url", "left_semi")


def _recrawl_frontier(due: DataFrame, with_validators: bool = False) -> DataFrame:
    """Refresh rows re-enter the frontier with their original scheduling
    metadata, flagged is_recrawl (no counters, no yields, no seen delta —
    order_and_gate / run_crawl enforce re-crawl ≠ re-seen).

    ``with_validators`` (conditional_revalidation): the ledger rows this
    is minted from already carry the last response's ETag/Last-Modified;
    attaching them HERE — rather than re-joining the ledger at fetch time
    — costs nothing extra and survives budget deferrals (the stored
    frontier keeps the columns)."""
    if with_validators:
        cond_etag = F.col("etag")
        cond_lm = F.col("last_modified")
    else:
        cond_etag = F.lit(None).cast("string")
        cond_lm = F.lit(None).cast("string")
    return due.select(
        "url",
        url_hash(F.col("url")).alias("url_hash"),
        host_expr(F.col("url")).alias("host"),
        "seed_url",
        host_expr(F.col("seed_url")).alias("seed_host"),
        "priority",
        "depth",
        F.col("discovered_seq").cast("long").alias("discovered_seq"),
        F.lit(None).cast("string").alias("parent_url"),
        F.lit(0).alias("attempt"),
        F.lit(True).alias("is_recrawl"),
        cond_etag.alias("cond_etag"),
        cond_lm.alias("cond_last_modified"),
        F.lit(0).alias("wait_batches"),
    )


def _restore_cache_blobs(
    spark: SparkSession,
    store: CrawlStore,
    prev: int,
    ttl_batches: int,
    capacity_per_bucket: int,
    adaptive: bool = False,
    max_ttl: int | None = None,
) -> DataFrame:
    """Deterministically restore the SHARDED cache filter (operators/
    cachefilter.py — per-bucket cuckoo blobs, built and updated on
    executors like the bloom deltas) for a (resumed) crawl entering batch
    prev+1. Prefer the blob table the last committed batch wrote: those
    are the exact bytes the uninterrupted run would carry, so resume is
    bit-identical by construction. A store predating the blob table (or a
    fresh crawl) rebuilds from the authoritative ledger: the live entries
    are exactly the keys whose last successful fetch is within the TTL
    window (everything older was deleted at its own expiry batch) — a
    distributed groupBy-bucket build, no driver collect."""
    from crawler_ai_spark.operators import cachefilter as CF

    state = _read_latest_state(store, "cache_blobs", prev)
    if state is not None:
        blobs, as_of = state
        # a blob snapshot is only continuable if no visited batch ran
        # after it (a TTL-off gap fetches pages the filter never saw;
        # the ledger, not the filter, is the source of truth — rebuild)
        stale = any(
            b > as_of and (store.batch_dir(b) / "visited").exists()
            for b in store.committed_batches()
            if b <= prev
        )
        if not stale:
            return blobs
    ledger = _cache_ledger(
        store, prev, adaptive=adaptive, base_ttl=ttl_batches, max_ttl=max_ttl
    )
    if ledger is None:
        return CF.empty_blobs(spark)
    live = _url_cache_state(ledger, default_ttl=ttl_batches).where(
        F.col("url_fetch_batch").isNotNull()
        & (F.col("url_fetch_batch") + F.col("url_ttl") > F.lit(prev))
    )
    return CF.build_cuckoo_blobs(
        live.select(url_hash(F.col("url")).alias("url_hash")),
        capacity_per_bucket=capacity_per_bucket,
    )


def _crawl_delay_budgets(host_rules: DataFrame | None, interval_s: int) -> DataFrame | None:
    """W3 × W2 — robots Crawl-delay as a per-host batch cap: a host asking
    for d seconds between fetches gets at most interval/d fetches per
    batch (one batch ≙ interval_s of wall time; same logical clock the
    TTL recrawl uses). Tiny table, broadcast by the budget op."""
    if host_rules is None or "crawl_delay_s" not in host_rules.columns:
        return None
    return host_rules.where(
        F.col("crawl_delay_s").isNotNull() & (F.col("crawl_delay_s") > 0)
    ).select(
        "host",
        F.greatest(
            F.lit(1), F.floor(F.lit(interval_s) / F.col("crawl_delay_s"))
        )
        .cast("int")
        .alias("host_budget"),
    )


def _merge_host_budgets(
    a: DataFrame | None, b: DataFrame | None
) -> DataFrame | None:
    """Tightest-wins merge of two (host, host_budget) tables: a host in
    both gets least(budget_a, budget_b); a host in one keeps its own
    (Spark `least` skips NULLs). Used to combine robots Crawl-delay caps
    with caller-supplied budgets (e.g. hostrank.budget_from_rank)."""
    if a is None:
        return b
    if b is None:
        return a
    return (
        a.select("host", F.col("host_budget").alias("_ba"))
        .join(b.select("host", F.col("host_budget").alias("_bb")), "host", "full_outer")
        .select("host", F.least("_ba", "_bb").cast("int").alias("host_budget"))
    )


_ROBOTS_CACHE_SCHEMA = (
    "host string, disallow_prefixes array<string>, "
    "allow_prefixes array<string>, crawl_delay_s double, "
    "sitemap_urls array<string>, fetched_batch long"
)


_BREAKER_SCHEMA = "host string, consec_fail_batches int, cooldown_until long"


def _restore_breaker(spark: SparkSession, store: CrawlStore, prev: int) -> DataFrame:
    """Latest committed host_breaker snapshot (one row per host currently
    failing or cooling), or an empty table for a fresh crawl."""
    state = _read_latest_state(store, "host_breaker", prev)
    if state is not None:
        return state[0]
    return spark.createDataFrame([], _BREAKER_SCHEMA)


def _advance_breaker(
    breaker: DataFrame, gated: DataFrame, batch_id: int, threshold: int, cooldown: int
) -> DataFrame:
    """Fold one batch's per-host fetch outcomes into the breaker state.

    A host attempted this batch with 0 successes extends its consecutive-
    failure streak; any success resets it. A streak reaching `threshold`
    trips: cooldown_until = batch_id + cooldown and the streak resets (the
    post-cooldown batch is a fresh probe). Hosts not attempted (cooling or
    simply absent from the batch) carry their state. Rows that are fully
    idle (no streak, cooldown elapsed) are pruned so the state stays
    proportional to the failing-host set, not the host universe."""
    # a 304 revalidation is a live server answering — a success for the
    # breaker (column-guarded: unit tests feed minimal gated shapes)
    ok = F.col("fetched")
    if "revalidated" in gated.columns:
        ok = ok | F.col("revalidated")
    stats = gated.groupBy("host").agg(
        F.sum(ok.cast("int")).alias("_succ"),
        F.sum((~ok).cast("int")).alias("_fail"),
    )
    merged = breaker.join(stats, "host", "full_outer")
    attempted = F.col("_succ").isNotNull()
    streak = F.when(
        attempted,
        F.when(
            (F.col("_succ") == 0) & (F.col("_fail") > 0),
            F.coalesce(F.col("consec_fail_batches"), F.lit(0)) + 1,
        ).otherwise(F.lit(0)),
    ).otherwise(F.coalesce(F.col("consec_fail_batches"), F.lit(0)))
    merged = merged.select(
        "host",
        streak.alias("_streak"),
        F.coalesce(F.col("cooldown_until"), F.lit(-1)).alias("_cool"),
    )
    tripped = F.col("_streak") >= threshold
    out = merged.select(
        "host",
        F.when(tripped, F.lit(0)).otherwise(F.col("_streak")).cast("int")
            .alias("consec_fail_batches"),
        F.when(tripped, F.lit(batch_id + cooldown)).otherwise(F.col("_cool"))
            .cast("long").alias("cooldown_until"),
    )
    return out.where(
        (F.col("consec_fail_batches") > 0) | (F.col("cooldown_until") > batch_id)
    )


_BACKOFF_SCHEMA = "host string, eligible_batch long"


def _restore_backoff(spark: SparkSession, store: CrawlStore, prev: int) -> DataFrame:
    """Latest committed host_backoff snapshot (one row per host whose
    server-directed Retry-After has not elapsed), or empty."""
    state = _read_latest_state(store, "host_backoff", prev)
    if state is not None:
        return state[0]
    return spark.createDataFrame([], _BACKOFF_SCHEMA)


def _advance_backoff(
    backoff: DataFrame, gated: DataFrame, batch_id: int, interval_s: int, cap: int
) -> DataFrame:
    """Fold one batch's Retry-After headers into the host-backoff state
    (RFC 9110 §10.2.3). Only 429/503 responses count — Retry-After on a
    3xx or 200 is redirect/feature metadata, not rate limiting. The
    delta-seconds form maps to ceil(delta / interval) batches; the
    IMF-fixdate form (no wall-clock anchor at batch grain) counts as 1;
    both clamp to [1, cap]. Per host the LONGEST directive wins, and a
    new directive extends (never shortens) a standing one. Rows whose
    backoff has elapsed are pruned so the state stays proportional to
    the rate-limited host set. Host-grain aggregate + full-outer merge
    — no frontier-scale shuffle."""
    from crawler_ai_spark.functions.errors import retry_after_seconds_expr

    if "retry_after" not in gated.columns:  # minimal test shapes
        gated = gated.withColumn("retry_after", F.lit(None).cast("string"))
    ra = gated.where(
        F.col("status").isin(429, 503) & F.col("retry_after").isNotNull()
    )
    secs = retry_after_seconds_expr(F.col("retry_after"))
    batches = F.least(
        F.greatest(
            F.coalesce(F.ceil(secs / F.lit(interval_s)), F.lit(1)).cast("long"),
            F.lit(1).cast("long"),
        ),
        F.lit(cap).cast("long"),
    )
    new = ra.groupBy("host").agg(
        (F.lit(batch_id) + F.max(batches)).alias("_new_eligible")
    )
    merged = backoff.join(new, "host", "full_outer").select(
        "host",
        F.greatest(
            F.coalesce(F.col("eligible_batch"), F.lit(0)),
            F.coalesce(F.col("_new_eligible"), F.lit(0)),
        ).alias("eligible_batch"),
    )
    return merged.where(F.col("eligible_batch") > batch_id)


_AT_DELAYS_SCHEMA = "host string, delay_ms long, n_ok long, n_err long"


def _restore_at_delays(spark: SparkSession, store: CrawlStore, prev: int) -> DataFrame:
    """Latest committed AutoThrottle delay snapshot (one row per host ever
    attempted), or an empty table for a fresh crawl — resume reads the
    learned delays back instead of resetting every host to start_delay."""
    state = _read_latest_state(store, "at_delays", prev)
    if state is not None:
        return state[0]
    return spark.createDataFrame([], _AT_DELAYS_SCHEMA)


def _restore_warc_digests(spark: SparkSession, store: CrawlStore, prev: int) -> DataFrame:
    """Latest committed WARC digest-index snapshot (one row per distinct
    payload ever archived), or an empty table for a fresh crawl."""
    state = _read_latest_state(store, "warc_digests", prev)
    if state is not None:
        return state[0]
    return spark.createDataFrame(
        [], "digest string, ref_url string, ref_ts timestamp"
    )


def _restore_robots_cache(spark: SparkSession, store: CrawlStore, prev: int) -> DataFrame:
    """Latest committed robots_cache snapshot (live-robots mode state:
    one row per host ever seen, rules parsed from its fetched
    /robots.txt), or an empty table for a fresh crawl."""
    state = _read_latest_state(store, "robots_cache", prev)
    if state is not None:
        cache = state[0]
        if "fetched_batch" not in cache.columns:  # pre-TTL store resume
            cache = cache.withColumn("fetched_batch", F.lit(None).cast("long"))
        return cache
    return spark.createDataFrame([], _ROBOTS_CACHE_SCHEMA)


def _bloom_coverage_start(store: CrawlStore, prev: int) -> int | None:
    """First batch of an unbroken bloom_delta chain that covers ALL seen
    keys through ``prev``: batch 0's blob is full by construction (its
    delta IS the whole seen set then), and a _FULL-marked blob covers
    everything before it. Returns None when no such chain exists (e.g.
    earlier batches ran without use_bloom) — callers must then fall back
    to the exact rebuild, or bloom false negatives would re-crawl seen
    URLs."""
    batches = [b for b in store.committed_batches() if b <= prev]
    full_points = [
        b
        for b in batches
        if (store.batch_dir(b) / "bloom_delta").exists()
        and (b == 0 or (store.batch_dir(b) / "bloom_delta" / "_FULL").exists())
    ]
    for start in sorted(full_points, reverse=True):
        if all(
            (store.batch_dir(b) / "bloom_delta").exists()
            for b in batches
            if b >= start
        ):
            return start
    return None


# ---------------------------------------------------------------------------
# the loop
# ---------------------------------------------------------------------------


def run_crawl(
    spark: SparkSession,
    pages: DataFrame,
    seeds: DataFrame,
    state_root: str | pathlib.Path,
    cfg: CrawlConfig | None = None,
    host_rules: DataFrame | None = None,
    resume: bool = False,
    host_budgets: DataFrame | None = None,
    ip_map: DataFrame | None = None,
    dust_rules: DataFrame | None = None,
) -> dict:
    """Run (or resume) the crawl to completion; returns summary counters.

    ``dust_rules``: optional mined DUST table (operators/dust.py —
    rule_from, rule_to, support, n_hosts). Harvested candidate URLs are
    rewritten by the CONSTANT rules before hashing, so structural
    duplicates (print views, session-id aliases) collapse into one
    frontier row instead of one fetch each. None (default): loop
    byte-identical.

    Every batch commit is a restart point: kill the driver anywhere, call
    again with resume=True, and the remaining batches produce bit-identical
    tables (tests/test_resume.py)."""
    cfg = cfg or CrawlConfig()
    store = CrawlStore(spark, state_root)

    if cfg.use_bloom:
        from crawler_ai_spark.operators import seen as SN

    done = store.committed_batches() if resume else []
    if not done:
        f0 = init_frontier(seeds)
        store.write(0, "frontier", f0)
        store.write(
            0,
            "seen_delta",
            f0.select("url_hash", "url", "seed_url").repartitionByRange(
                cfg.seen_delta_files, "url_hash"
            ),
        )
        store.write(0, "seed_state", init_seed_state(seeds))
        if cfg.use_bloom:
            store.write(
                0,
                "bloom_delta",
                SN.build_bloom(
                    f0.select("url_hash"),
                    expected_keys_per_bucket=cfg.bloom_keys_per_bucket,
                ),
            )
        store.commit(0)
        start = 1
    else:
        start = max(done) + 1

    import math

    # W3 × W2 — robots Crawl-delay as a per-host batch cap: a host asking
    # for d seconds between fetches gets at most interval/d fetches per
    # batch — see _crawl_delay_budgets. In live-robots mode the budgets
    # derive per batch from the growing robots_cache instead. Caller
    # budgets (host_budgets — e.g. rank-proportional allocation from
    # hostrank.budget_from_rank) merge tightest-wins in both modes.
    crawl_delay_budgets = _merge_host_budgets(
        _crawl_delay_budgets(host_rules, cfg.batch_interval_seconds), host_budgets
    )

    robots_state = None
    if cfg.live_robots:
        if cfg.live_transport is None:
            raise ValueError("live_robots=True requires a live_transport")
        if host_rules is not None:
            raise ValueError(
                "live_robots replaces the static host_rules input — pass one "
                "or the other"
            )
        robots_state = _restore_robots_cache(spark, store, start - 1)

    breaker_state = None
    if cfg.host_failure_threshold is not None:
        breaker_state = _restore_breaker(spark, store, start - 1)

    backoff_state = None
    if cfg.honor_retry_after:
        backoff_state = _restore_backoff(spark, store, start - 1)

    if cfg.conditional_revalidation:
        if cfg.live_transport is None:
            raise ValueError(
                "conditional_revalidation requires a live_transport — the "
                "fetch stage is what sends If-None-Match / If-Modified-Since"
            )
        if cfg.recrawl_ttl_seconds is None:
            raise ValueError(
                "conditional_revalidation only applies to TTL refresh rows "
                "— set recrawl_ttl_seconds"
            )
    if cfg.http_cache_ttl and cfg.recrawl_ttl_seconds is None:
        raise ValueError(
            "http_cache_ttl drives the recrawl schedule — set "
            "recrawl_ttl_seconds"
        )

    at_state = None
    if cfg.autothrottle is not None:
        if cfg.live_transport is None:
            raise ValueError(
                "autothrottle requires a live_transport — the fetch stage "
                "is what measures per-request latency"
            )
        at_state = _restore_at_delays(spark, store, start - 1)

    warc_digests = None
    if cfg.warc_dedup:
        if cfg.warc_dir is None:
            raise ValueError("warc_dedup requires warc_dir")
        warc_digests = _restore_warc_digests(spark, store, start - 1)

    ttl_batches = None
    cache_blobs = None
    if cfg.recrawl_ttl_seconds is not None:
        from crawler_ai_spark.operators import cachefilter as CF

        ttl_batches = max(
            1, math.ceil(cfg.recrawl_ttl_seconds / cfg.batch_interval_seconds)
        )
        cache_blobs = _restore_cache_blobs(
            spark, store, start - 1, ttl_batches, cfg.cache_keys_per_bucket,
            adaptive=cfg.adaptive_recrawl, max_ttl=cfg.recrawl_ttl_max_batches,
        )

    total_scheduled = 0
    total_recrawled = 0
    total_evictions = 0
    for batch_id in range(start, start + cfg.max_batches):
        prev = batch_id - 1
        frontier = store.read("frontier", prev)
        if "is_recrawl" not in frontier.columns:  # pre-TTL store resume
            frontier = frontier.withColumn("is_recrawl", F.lit(False))
        for c in ("cond_etag", "cond_last_modified"):  # pre-validator store
            if c not in frontier.columns:
                frontier = frontier.withColumn(c, F.lit(None).cast("string"))
        if "wait_batches" not in frontier.columns:  # pre-aging store
            frontier = frontier.withColumn("wait_batches", F.lit(0))

        ledger = (
            _cache_ledger(
                store, prev, adaptive=cfg.adaptive_recrawl,
                base_ttl=ttl_batches, max_ttl=cfg.recrawl_ttl_max_batches,
                http_interval_s=(
                    cfg.batch_interval_seconds if cfg.http_cache_ttl else None
                ),
            )
            if ttl_batches is not None
            else None
        )
        blob_stage_cache = None
        if ledger is not None:
            # S5 — TTL expiry: entries fetched exactly ttl_batches ago lapse
            # NOW; their keys leave the deletable cache filter (cuckoo —
            # delete must succeed: the entry was inserted at fetch time and
            # expiry fires exactly once per fetch) and due URLs re-enter
            # the frontier as refresh rows. The delete is applied shard-
            # locally on executors (cogroup over bucket blobs); the only
            # driver-side value is the scalar eviction count.
            expiring = (
                _url_cache_state(ledger, default_ttl=ttl_batches)
                # equality fires exactly once per cache entry: the ttl
                # only changes when a NEW fetch also advances
                # url_fetch_batch, so (fetch, ttl) pairs are stable
                # between fetch and expiry — adaptive or fixed
                .where(F.col("url_fetch_batch") + F.col("url_ttl") == F.lit(batch_id))
                .select(url_hash(F.col("url")).alias("url_hash"))
            )
            n_expiring = expiring.count()
            if n_expiring:
                cache_blobs = CF.update_cuckoo_blobs(
                    cache_blobs,
                    expiring,
                    op="delete",
                    capacity_per_bucket=cfg.cache_keys_per_bucket,
                ).persist()
                blob_stage_cache = cache_blobs
            total_evictions += n_expiring
            due = _recrawl_due(ledger, batch_id, ttl_batches)
            recrawl_rows = _recrawl_frontier(
                due, with_validators=cfg.conditional_revalidation
            )
            # a refresh DEFERRED by the host budget last batch is still in
            # the carried-over frontier, and its ledger rows never advanced
            # (a deferral writes no visited row) — so _recrawl_due
            # regenerates the same (seed, url) refresh. Keeping both would
            # double-fetch the URL in one batch and break the "consecutive
            # visits ≥ TTL apart" invariant; drop the regenerated copy.
            recrawl_rows = recrawl_rows.join(
                frontier.select("seed_url", "url"), ["seed_url", "url"], "left_anti"
            )
            # coherence invariant, FULL and in-plan (the old driver loop
            # was bounded to 4096 rows at 10^10-URL scale): a due URL is by
            # definition expired, so its key must have left the filter when
            # the expiry delete ran
            stale = (
                CF.probe_cuckoo_blobs(
                    recrawl_rows.select("url_hash").distinct(), cache_blobs
                )
                .where(F.col("in_cache"))
                .count()
            )
            if stale:
                raise RuntimeError("recrawl-due key still present in cache filter")
            n_recrawl = recrawl_rows.count()
            total_recrawled += n_recrawl
            frontier = frontier.unionByName(recrawl_rows.select(*FRONTIER_COLS))

        if frontier.limit(1).count() == 0:
            # with recrawl enabled, an empty batch is a GAP, not the end:
            # a fetched entry always refreshes eventually (adaptive
            # intervals make gaps routine; even fixed ttl>1 has them once
            # discovery ends), and each batch is one tick of the logical
            # clock — so idle through the batch instead of exiting while
            # refreshes pend. Bounded by max_batches like everything else.
            pending_refresh = (
                ttl_batches is not None
                and ledger is not None
                and ledger.where(
                    F.col("last_fetch_batch").isNotNull()
                ).limit(1).count() > 0
            )
            if not pending_refresh:
                break
        cooling = None
        if breaker_state is not None:
            # circuit breaker: rows of cooling hosts skip this batch's
            # fetch entirely and re-enter the next frontier untouched
            # (defer-not-drop, same contract as the budget deferral).
            # The cooling-host set is proportional to the failing hosts,
            # not the host universe — AQE picks the join strategy.
            cooling_hosts = breaker_state.where(
                F.col("cooldown_until") >= batch_id
            ).select("host")
            cooling = frontier.join(cooling_hosts, "host", "left_semi").persist()
            frontier = frontier.join(cooling_hosts, "host", "left_anti")
        backed_off = None
        if backoff_state is not None:
            # RFC 9110 Retry-After: a host inside its server-directed
            # backoff window skips the batch entirely; its rows re-enter
            # the next frontier untouched (defer-not-drop, breaker
            # contract). State is proportional to the rate-limited host
            # set — AQE picks the join strategy.
            backoff_hosts = backoff_state.where(
                F.col("eligible_batch") > batch_id
            ).select("host")
            backed_off = frontier.join(backoff_hosts, "host", "left_semi").persist()
            frontier = frontier.join(backoff_hosts, "host", "left_anti")
        seed_state = store.read("seed_state", prev)
        seen = store.read_all("seen_delta", prev)

        if cfg.live_robots:
            # W3 LIVE — robots.txt fetched over the wire for hosts this
            # crawl has never seen (anti-join against the cached host set:
            # one robots fetch per host per crawl, like the reference's
            # per-site robots middleware would do), parsed with RFC 9309
            # Allow precedence + Crawl-delay, folded into the robots_cache
            # state table that persists with the batch (resume reads it
            # back — no refetch on restart).
            from crawler_ai_spark.sources.robots import fetch_robots, parse_robots

            if cfg.robots_ttl_batches is not None:
                # lazy revalidation: entries older than the TTL drop out
                # of the cache, so a host re-entering the frontier gets a
                # fresh /robots.txt (RFC 9309 §2.4 caps caching at ~24h;
                # here measured in batches). Hosts not being crawled cost
                # nothing — no proactive refetch. Pre-TTL rows (null
                # fetched_batch) count as ancient.
                robots_state = robots_state.where(
                    F.coalesce(F.col("fetched_batch"), F.lit(-(1 << 60)))
                    > F.lit(batch_id - cfg.robots_ttl_batches)
                )
            unseen = frontier.join(robots_state.select("host"), "host", "left_anti")
            new_rules = parse_robots(
                fetch_robots(
                    unseen.select("url", "host"),
                    cfg.live_transport,
                    host_partitions=cfg.parallelism,
                    unreachable_disallow_all=cfg.robots_unreachable_disallow,
                ),
                with_allow=True,
                with_crawl_delay=True,
                with_sitemaps=True,
                ua_token=cfg.robots_ua_token,
            ).withColumn("fetched_batch", F.lit(batch_id).cast("long"))
            robots_state = robots_state.unionByName(new_rules)
            store.write(batch_id, "robots_cache", robots_state)
            robots_state = store.read("robots_cache", batch_id)  # lineage reset
            rules_now = robots_state
            budgets_now = _merge_host_budgets(
                _crawl_delay_budgets(rules_now, cfg.batch_interval_seconds),
                host_budgets,
            )
        else:
            rules_now, budgets_now = host_rules, crawl_delay_budgets
        if at_state is not None:
            # W2 adaptive: last batch's learned per-host delays tighten
            # this batch's budgets (a host Crawl-delay already throttles
            # harder keeps its robots cap — tightest wins)
            from crawler_ai_spark.operators import autothrottle as AT

            budgets_now = _merge_host_budgets(
                budgets_now,
                AT.budget_from_delay(at_state, cfg.batch_interval_seconds),
            )
        frontier = FR.apply_robots(frontier, rules_now)
        frontier, deferred = FR.apply_host_budget(
            frontier, cfg.host_budget_per_batch, host_budgets=budgets_now,
            aging_batches=cfg.priority_aging_batches,
        )
        if cfg.domain_budget_per_batch is not None:
            # registrant-grain politeness on top of the host grain: all
            # subdomains of one registrable domain share a budget — the
            # subdomain-spam cap (defer-not-drop, same contract)
            frontier, dom_deferred = FR.apply_domain_budget(
                frontier, cfg.domain_budget_per_batch,
                aging_batches=cfg.priority_aging_batches,
            )
            deferred = deferred.unionByName(dom_deferred.select(*deferred.columns))
        if ip_map is not None and cfg.ip_budget_per_batch is not None:
            # server-grain politeness on top of the host grain: vhosts
            # sharing a resolved IP share one budget (defer-not-drop,
            # same contract as the host budget)
            frontier, ip_deferred = FR.apply_ip_budget(
                frontier, ip_map, cfg.ip_budget_per_batch,
                aging_batches=cfg.priority_aging_batches,
            )
            deferred = deferred.unionByName(ip_deferred.select(*deferred.columns))
        if cooling is not None:
            deferred = deferred.select(*FRONTIER_COLS).unionByName(
                cooling.select(*FRONTIER_COLS)
            )
        if backed_off is not None:
            deferred = deferred.select(*FRONTIER_COLS).unionByName(
                backed_off.select(*FRONTIER_COLS)
            )
        # every deferral path converges here: one more batch waited
        # (drives priority aging; free bookkeeping when aging is off)
        deferred = deferred.withColumn(
            "wait_batches", F.coalesce(F.col("wait_batches"), F.lit(0)) + 1
        )

        parsed = fetch_and_parse(frontier, pages, cfg)
        gated = order_and_gate(parsed, seed_state).persist()

        visited = gated.select(
            "seed_url", "url", "priority", "depth", "discovered_seq", "fetched",
            "career_score", "is_career_page", "page_order", "page_bytes",
            F.col("parse.title").alias("title"),
            "attempt", "status", "fetch_error", "fetch_error_class",
            "is_recrawl", F.lit(batch_id).cast("long").alias("batch_id"),
            # content fingerprint of the fetched bytes — the adaptive-
            # recrawl change detector (and a useful archive invariant)
            F.when(F.col("fetched"), F.xxhash64(F.col("html"))).alias("content_hash"),
            # RFC 9110 validators + the 304 refresh outcome — the ledger
            # stores them for conditional_revalidation's request headers —
            # and the RFC 9111 freshness directive for http_cache_ttl
            "etag", "last_modified", "cache_control", "revalidated",
            # soft404_filter verdict (False when the gate is off) — kept
            # so corpus consumers can exclude error boilerplate
            "soft404",
        )
        store.write(batch_id, "visited", visited)

        if breaker_state is not None:
            breaker_state = _advance_breaker(
                breaker_state,
                gated,
                batch_id,
                cfg.host_failure_threshold,
                cfg.host_cooldown_batches,
            )
            store.write(batch_id, "host_breaker", breaker_state)
            breaker_state = store.read("host_breaker", batch_id)  # lineage reset

        if backoff_state is not None:
            backoff_state = _advance_backoff(
                backoff_state,
                gated,
                batch_id,
                cfg.batch_interval_seconds,
                cfg.retry_after_max_batches,
            )
            store.write(batch_id, "host_backoff", backoff_state)
            backoff_state = store.read("host_backoff", batch_id)  # lineage reset

        if at_state is not None:
            # fold this batch's measured latencies through the
            # AutoThrottle update; persist so resume keeps learned delays
            from crawler_ai_spark.operators import autothrottle as AT

            responses = gated.select(
                "host",
                F.coalesce(F.col("fetch_ms"), F.lit(0)).cast("long").alias("fetch_ms"),
                (F.col("fetched") | F.col("revalidated")).alias("ok"),
            )
            at_state = AT.autothrottle_delays(responses, at_state, cfg.autothrottle)
            store.write(batch_id, "at_delays", at_state)
            at_state = store.read("at_delays", batch_id)  # lineage reset

        if cfg.warc_dir is not None:
            # S8 side-sink: archive this batch's fetched pages as
            # per-record-gzip WARC (sources/warc.py, the Common Crawl
            # layout) under warc_dir/batch-NNNNN/. Best-effort side
            # output — the store stays the source of truth (a batch
            # re-run after resume rewrites its own directory; readers
            # see whole batches only). warc_ts falls back to the
            # batch's logical clock for pages the corpus didn't stamp.
            from crawler_ai_spark.sources.warc import (
                write_warc,
                write_warc_dedup_with_index,
            )

            archive = gated.where(F.col("fetched")).select(
                "url",
                F.coalesce(
                    F.col("warc_ts"),
                    F.expr(f"timestamp_micros({int(batch_id)} * 1000000)"),
                ).alias("warc_ts"),
                "html",
                F.col("status").cast("int").alias("status"),
            )
            out_dir = str(pathlib.Path(cfg.warc_dir) / f"batch-{batch_id:05d}")
            if cfg.warc_dedup:
                # cross-batch revisit dedup against the carried digest
                # index; fresh digests append to the index snapshot
                manifest, new_digests = write_warc_dedup_with_index(
                    archive, warc_digests, out_dir, gzip_records=True
                )
                manifest.collect()  # manifest rows only (one/partition)
                warc_digests = warc_digests.unionByName(new_digests)
                store.write(batch_id, "warc_digests", warc_digests)
                warc_digests = store.read("warc_digests", batch_id)  # lineage reset
            else:
                write_warc(archive, out_dir, gzip_records=True).collect()

        if ttl_batches is not None:
            # incremental ledger snapshot: fold THIS batch's visited into
            # the carried per-(seed,url) state so the next batch reads one
            # table instead of re-aggregating all visited history
            delta = _ledger_delta(
                visited, base_ttl=ttl_batches,
                http_ttl_interval_s=(
                    cfg.batch_interval_seconds if cfg.http_cache_ttl else None
                ),
                http_ttl_max=cfg.recrawl_ttl_max_batches,
            )
            new_ledger = (
                _merge_ledger(
                    ledger, delta, adaptive=cfg.adaptive_recrawl,
                    base_ttl=ttl_batches, max_ttl=cfg.recrawl_ttl_max_batches,
                )
                if ledger is not None
                # first ledger: a directive on the initial fetch is as
                # authoritative as on a refresh — fold it into the TTL
                else delta.withColumn(
                    "ttl_batches", F.coalesce("_http_ttl", "ttl_batches")
                ).drop("_real_fetch_batch", "_http_ttl")
            )
            store.write(batch_id, "cache_ledger", new_ledger)
            # cache store-on-success (cache.py:26-33): every successful
            # fetch this batch (fresh page or refresh) re-enters the filter
            # — insert-if-absent applied shard-locally on executors, then
            # the full sharded state (metadata-sized: buckets × fixed
            # capacity) persists WITH the batch. The next batch and any
            # resume read these exact bytes, which is what makes the blob
            # chain — and therefore resume — bit-identical.
            cache_blobs = CF.update_cuckoo_blobs(
                cache_blobs,
                # a 304 revalidation refreshes the cache entry exactly
                # like a re-download — both re-enter the filter
                gated.where(F.col("fetched") | F.col("revalidated"))
                .select("url_hash").distinct(),
                op="insert_if_absent",
                capacity_per_bucket=cfg.cache_keys_per_bucket,
            )
            store.write(batch_id, "cache_blobs", cache_blobs)
            cache_blobs = store.read("cache_blobs", batch_id)
            if blob_stage_cache is not None:
                blob_stage_cache.unpersist()

        # TTL refreshes update visited only (a cache refresh, not a new
        # discovery) — the career/job/seen outputs of a crawl with
        # recrawl enabled are IDENTICAL to one without
        career_pages = gated.where(F.col("is_career_page") & ~F.col("is_recrawl")).select(
            "seed_url",
            "url",
            F.col("parse.title").alias("title"),
            F.col("career_score").alias("confidence"),
            F.col("career_indicators").alias("indicators"),
            F.col("priority").alias("priority_found"),
            "depth",
            "discovered_seq",
        )
        store.write(batch_id, "career_pages", career_pages)
        store.write(
            batch_id, "job_urls", extract_job_urls(gated.where(~F.col("is_recrawl")))
        )
        store.write(batch_id, "metrics", batch_metrics(gated, batch_id))

        batch_caches: list = []
        # incremental seen-filter: OR-merge the committed per-batch delta
        # blobs (fixed m — cfg.bloom_keys_per_bucket) instead of re-hashing
        # the entire seen set; per-batch bloom cost is O(|delta|).
        # COVERAGE GUARD: a crawl started without --bloom (or resumed from
        # an older store) has committed batches WITHOUT delta blobs —
        # merging a partial set would produce bloom FALSE NEGATIVES, which
        # dedup_with_bloom trusts ("definitely new"), silently re-crawling
        # seen URLs. Unless a full-coverage chain of blobs exists, fall
        # back to rebuild-from-seen and write THIS batch's blob over
        # seen+fresh with a _FULL marker so later batches resume the
        # incremental path from here.
        blooms = None
        bloom_full_catchup = False
        if cfg.use_bloom:
            covered_from = _bloom_coverage_start(store, prev)
            if covered_from is not None:
                delta_paths = [
                    str(store.batch_dir(b) / "bloom_delta")
                    for b in store.committed_batches()
                    if covered_from <= b <= prev
                ]
                blooms = SN.merge_blooms(spark.read.parquet(*delta_paths))
            else:
                bloom_full_catchup = True
        fresh, candidates = next_frontier(
            gated, seen, seed_state, cfg.use_bloom,
            cache_registry=batch_caches, blooms=blooms,
            trap_filter=cfg.trap_filter,
            trap_quarantine_share=cfg.trap_quarantine_share,
            dust_rules=dust_rules,
        )
        fresh = fresh.persist()
        new_frontier = fresh.unionByName(deferred.select(*FRONTIER_COLS))
        if cfg.max_fetch_attempts > 1:
            # W4 — unfetched rows with budget left re-enter the next batch;
            # they bypass the seen-dedup deliberately (already seen — this
            # IS the re-fetch of the same URL). Per-class policy
            # (crawler.py:197-233): permanent failures (404/410 →
            # not_found) never retry; transient classes (403/429/503,
            # timeout, connection, dns, other) back off into the next batch.
            from crawler_ai_spark.functions.errors import is_permanent_error_expr

            retries = (
                gated.where(
                    ~F.col("fetched")
                    & ~F.col("revalidated")  # a 304 refresh succeeded
                    & (F.col("attempt") + 1 < F.lit(cfg.max_fetch_attempts))
                    & ~is_permanent_error_expr(F.col("fetch_error_class"))
                )
                .withColumn("attempt", F.col("attempt") + 1)
                # a retry WAS scheduled (it consumed budget and fetched);
                # its deferral clock restarts
                .withColumn("wait_batches", F.lit(0))
                .select(*FRONTIER_COLS)
            )
            new_frontier = new_frontier.unionByName(retries)
        store.write(batch_id, "frontier", new_frontier)
        store.write(
            batch_id,
            "seen_delta",
            fresh.select("url_hash", "url", "seed_url").repartitionByRange(
                cfg.seen_delta_files, "url_hash"
            ),
        )
        if cfg.use_bloom:
            delta_keys = fresh.select("url_hash")
            if bloom_full_catchup:
                # over-coverage is safe for a bloom (a superset only raises
                # the FP rate a little; false negatives stay impossible)
                delta_keys = seen.select("url_hash").unionByName(delta_keys)
            store.write(
                batch_id,
                "bloom_delta",
                SN.build_bloom(
                    delta_keys,
                    expected_keys_per_bucket=cfg.bloom_keys_per_bucket,
                ),
            )
            if bloom_full_catchup:
                (store.batch_dir(batch_id) / "bloom_delta" / "_FULL").touch()

        # advance per-seed counters; seq_offset advances over ALL yielded
        # candidates (pre-dedup — queue order is assigned at yield time)
        batch_counts = gated.groupBy("seed_url").agg(
            # refreshes (is_recrawl) are cache maintenance — counters see
            # only first-time fetches, matching order_and_gate's gate
            F.sum((F.col("fetched") & ~F.col("is_recrawl")).cast("long")).alias("_crawled"),
            F.sum((F.col("is_career_page") & ~F.col("is_recrawl")).cast("long")).alias("_career"),
        )
        seq_max = candidates.groupBy("seed_url").agg(F.max("discovered_seq").alias("_seq_max"))
        new_state = (
            seed_state.join(batch_counts, "seed_url", "left")
            .join(seq_max, "seed_url", "left")
            .select(
                "seed_url",
                (F.col("crawled_total") + F.coalesce(F.col("_crawled"), F.lit(0))).alias("crawled_total"),
                (F.col("career_total") + F.coalesce(F.col("_career"), F.lit(0))).alias("career_total"),
                F.greatest(F.col("seq_offset"), F.coalesce(F.col("_seq_max"), F.lit(0))).alias("seq_offset"),
                "max_pages",
                "max_career_pages",
            )
        )
        store.write(batch_id, "seed_state", new_state)
        store.commit(batch_id)

        total_scheduled += frontier.count()
        gated.unpersist()
        fresh.unpersist()
        if backed_off is not None:
            backed_off.unpersist()
        for c in batch_caches:  # bloom/tagged caches from dedup_with_bloom
            c.unpersist()

    final_batches = store.committed_batches()
    return {
        "batches": len(final_batches),
        "last_batch": max(final_batches),
        "total_scheduled": total_scheduled,
        "total_recrawled": total_recrawled,
        "cache_evictions": total_evictions,
    }
