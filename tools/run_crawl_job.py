"""spark-submit entry point for the crawl engine (north-rule packaging).

Cluster:
    zip -r crawler_ai_spark.zip crawler_ai_spark
    spark-submit --py-files crawler_ai_spark.zip tools/run_crawl_job.py \
        --pages  s3://bucket/warehouse/pages        # Iceberg/parquet pages table
        --seeds  s3://bucket/seeds.parquet          # seed_url[, max_pages, max_career_pages]
        --state  s3://bucket/crawl_state            # checkpointed batch dirs
        --batches 8 --host-budget 1000 --bloom --resume

Local sandbox smoke:
    python tools/run_crawl_job.py --fixtures sf0.001 --state /tmp/crawl_state

Every batch commit is a restart point; rerunning with --resume continues
from the last committed batch and yields bit-identical final tables
(tests/test_resume.py, test_seen.py::test_crawl_bloom_path_identical)."""

from __future__ import annotations

import argparse
import json
import os
import sys

# local runs from any cwd; on a cluster --py-files puts the package on the path
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# executor python workers unpickle UDF closures that import the package —
# they need it on PYTHONPATH too (in local mode they inherit this env; on a
# cluster --py-files covers them)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", help="pages table path (parquet/Iceberg dir)")
    ap.add_argument("--seeds", help="seeds parquet (seed_url[, max_pages, max_career_pages])")
    ap.add_argument("--fixtures", help="use the built-in fixture corpus at this SF (e.g. sf0.001)")
    ap.add_argument("--state", required=True, help="checkpoint/state root")
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--parallelism", type=int, default=0)
    ap.add_argument("--host-budget", type=int, default=None,
                    help="max URLs per host per batch (politeness W2)")
    ap.add_argument("--bloom", action="store_true", help="bloom-prefiltered seen dedup")
    ap.add_argument("--bloom-keys", type=int, default=4096,
                    help="per-bucket bloom capacity (fixes m so per-batch "
                         "delta blobs OR-merge; size for total keys/bucket)")
    ap.add_argument("--max-attempts", type=int, default=1,
                    help="fetch attempts per URL (W4 retry rows; 1 = no retry)")
    ap.add_argument("--recrawl-ttl", type=int, default=None,
                    help="S5 fetch-cache TTL in seconds (reference: 3600); "
                         "expired pages re-enter the frontier as refresh "
                         "rows; state lives in the sharded cuckoo cache "
                         "filter + incremental ledger tables")
    ap.add_argument("--adaptive-recrawl", action="store_true",
                    help="with --recrawl-ttl: double a URL's refresh "
                         "interval when its content hash is unchanged "
                         "(capped at --recrawl-ttl-max), reset on change")
    ap.add_argument("--recrawl-ttl-max", type=int, default=64,
                    help="adaptive interval cap, in batches")
    ap.add_argument("--live", action="store_true",
                    help="LIVE fetch mode over real sockets "
                         "(UrllibTransport; needs egress) instead of the "
                         "pages-table join")
    ap.add_argument("--live-delay-ms", type=int, default=1000,
                    help="per-host politeness slot width for --live "
                         "(reference DOWNLOAD_DELAY=1s)")
    ap.add_argument("--live-robots", action="store_true",
                    help="with --live: fetch+parse+cache each host's "
                         "robots.txt in-loop (RFC 9309 Allow precedence, "
                         "Crawl-delay budgets) instead of a static "
                         "host_rules table")
    ap.add_argument("--warc-dedup", action="store_true",
                    help="cross-batch WARC revisit dedup (requires "
                         "--warc-dir): repeated payloads write pointer "
                         "records against a persistent digest index")
    ap.add_argument("--warc-dir", default=None,
                    help="archive every batch's fetched pages as "
                         "per-record-gzip WARC under this dir "
                         "(Common Crawl layout; sources/warc.py)")
    ap.add_argument("--host-budgets", default=None,
                    help="parquet of (host, host_budget) per-batch caps — "
                         "e.g. rank-proportional allocation from "
                         "operators/hostrank.budget_from_rank; merges "
                         "tightest-wins with robots Crawl-delay budgets")
    ap.add_argument("--rank-budget", type=int, default=None,
                    help="derive --host-budgets on the fly: PageRank the "
                         "host graph of the PAGES table's links and give "
                         "each host floor(RANK_BUDGET x rank) fetch slots "
                         "per batch (clamped to [1, --host-budget or 64])")
    ap.add_argument("--rank-algo", choices=("pagerank", "opic"),
                    default="pagerank",
                    help="importance estimator behind --rank-budget: "
                         "'opic' uses the on-line cash/history estimate "
                         "(meaningful without convergence) instead of "
                         "power-iteration PageRank")
    ap.add_argument("--domain-budget", type=int, default=None,
                    help="registrant-grain politeness: max URLs per PSL "
                         "registrable domain per batch (all subdomains of "
                         "one registrant share the cap — subdomain-spam "
                         "defense; composes with --host-budget/--ip-budget)")
    ap.add_argument("--priority-aging", type=int, default=None,
                    help="starvation-free scheduling: rank budget windows "
                         "by priority + wait_batches // AGING so endlessly "
                         "deferred rows eventually outrank any priority")
    ap.add_argument("--dust-rules", default=None,
                    help="parquet of mined DUST rules (rule_from, rule_to, "
                         "support, n_hosts — operators/dust.py): harvested "
                         "candidate URLs rewrite by the constant rules "
                         "before hashing, collapsing print-view/session-id "
                         "variants into one fetch")
    ap.add_argument("--ip-map", default=None,
                    help="parquet of (host, ip) from a resolver stage: "
                         "enables server-grain politeness with --ip-budget "
                         "(vhosts sharing an IP share one budget)")
    ap.add_argument("--ip-budget", type=int, default=None,
                    help="max URLs per resolved IP per batch (requires "
                         "--ip-map or --resolve-ips; unmapped hosts stay "
                         "host-grain)")
    ap.add_argument("--resolve-ips", choices=["synthetic", "socket"],
                    default=None,
                    help="build the (host, ip) map by resolving the seed "
                         "frontier's hosts through the mapInPandas DNS "
                         "stage (operators/resolver.py): 'socket' = real "
                         "getaddrinfo (deployment), 'synthetic' = the "
                         "deterministic md5 resolver (tests/replay). "
                         "Mutually exclusive with --ip-map")
    ap.add_argument("--fail-threshold", type=int, default=None,
                    help="host circuit breaker: consecutive all-failure "
                         "batches before a host is cooled down "
                         "(defer-not-drop; state table host_breaker)")
    ap.add_argument("--fail-cooldown", type=int, default=2,
                    help="batches a tripped host cools before a probe")
    ap.add_argument("--robots-ttl", type=int, default=None,
                    help="live-robots cache TTL in batches: stale entries "
                         "are dropped and the host's next frontier "
                         "appearance refetches /robots.txt (lazy "
                         "revalidation; default caches for the crawl)")
    ap.add_argument("--obey-page-rep", action="store_true",
                    help="honor page-level REP: meta robots noindex/"
                         "nofollow, rel=nofollow/ugc/sponsored links")
    ap.add_argument("--trap-filter", action="store_true",
                    help="drop spider-trap URLs (segment loops, calendar "
                         "pagers, session ids, query cross-products, depth/"
                         "length caps) map-side before scheduling")
    ap.add_argument("--trap-quarantine", type=float, default=None,
                    help="quarantine whole hosts whose per-batch candidate "
                         "mix is >= this trap share (implies --trap-filter "
                         "semantics)")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--compact", action="store_true",
                    help="after the run, rewrite the seen-delta appends into "
                         "one range-clustered replace snapshot (Iceberg-style "
                         "rewrite_data_files; sources/snapshots.py)")
    ap.add_argument("--vacuum", action="store_true",
                    help="expire snapshots shadowed by the newest seen-delta "
                         "compaction and delete their data files (drops "
                         "pre-compaction time travel); works with --compact "
                         "or on a previously compacted store")
    ap.add_argument("--compact-state", action="store_true",
                    help="rewrite each per-batch full-state table (cache "
                         "filter blobs / TTL ledger / robots cache) to its "
                         "latest snapshot only and vacuum the superseded "
                         "copies — state storage O(state), not "
                         "O(batches x state)")
    ap.add_argument("--compact-cluster", choices=("hash", "surt"),
                    default="hash",
                    help="range key for --compact: url_hash (uniform "
                         "files, point lookups) or the SURT key (every "
                         "registered domain contiguous; manifest bounds "
                         "answer per-domain scans from few files)")
    ap.add_argument("--compact-files", type=int, default=64,
                    help="target file count for --compact (size for ~total "
                         "seen keys / file at the crawl scale)")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from crawler_ai_spark.plans.crawl_loop import CrawlConfig, run_crawl
    from crawler_ai_spark.session import get_spark

    spark = get_spark("crawler-ai-spark-crawl")
    try:
        if args.fixtures:
            import pathlib

            from crawler_ai_spark.sources import fixtures as FX

            FX.ensure_all()
            root = pathlib.Path(FX.FIXTURE_ROOT) / args.fixtures
            pages = spark.read.parquet(str(root / "pages.parquet")).where(
                ~F.col("url").endswith(".xml")
            )
            seeds = spark.read.parquet(str(root / "seeds.parquet")).select(
                F.col("seed_url"),
                F.lit(None).cast("int").alias("max_pages"),
                F.lit(None).cast("int").alias("max_career_pages"),
            )
        else:
            if not (args.pages and args.seeds):
                ap.error("--pages and --seeds are required without --fixtures")
            pages = spark.read.parquet(args.pages)
            seeds = spark.read.parquet(args.seeds)
            for col, typ in (("max_pages", "int"), ("max_career_pages", "int")):
                if col not in seeds.columns:
                    seeds = seeds.withColumn(col, F.lit(None).cast(typ))

        host_budgets = None
        if args.host_budgets:
            host_budgets = spark.read.parquet(args.host_budgets)
        elif args.rank_budget:
            from crawler_ai_spark.operators.hostrank import (
                budget_from_rank,
                host_edges_from_pages,
                host_rank,
                opic,
            )

            edges, hosts = host_edges_from_pages(pages)
            edges = edges.persist()  # iteration-invariant across power steps
            n_hosts = hosts.count()
            if n_hosts:
                if args.rank_algo == "opic":
                    ranks = opic(
                        edges, hosts, n_hosts=n_hosts, deterministic_fold=False
                    ).select("host", F.col("importance").alias("rank"))
                else:
                    ranks = host_rank(
                        edges, hosts, n_hosts=n_hosts, deterministic_fold=False
                    )
                host_budgets = budget_from_rank(
                    ranks,
                    total_per_batch=args.rank_budget,
                    min_budget=1,
                    max_budget=args.host_budget or 64,
                ).persist()

        live_transport = None
        if args.live:
            from crawler_ai_spark.sources.fetch import UrllibTransport

            live_transport = UrllibTransport(allow_network=True)
        elif args.live_robots:
            ap.error("--live-robots requires --live")
        cfg = CrawlConfig(
            max_batches=args.batches,
            parallelism=args.parallelism or spark.sparkContext.defaultParallelism,
            host_budget_per_batch=args.host_budget,
            use_bloom=args.bloom,
            bloom_keys_per_bucket=args.bloom_keys,
            max_fetch_attempts=args.max_attempts,
            recrawl_ttl_seconds=args.recrawl_ttl,
            adaptive_recrawl=args.adaptive_recrawl,
            recrawl_ttl_max_batches=args.recrawl_ttl_max,
            live_transport=live_transport,
            live_delay_ms=args.live_delay_ms,
            live_robots=args.live_robots,
            host_failure_threshold=args.fail_threshold,
            host_cooldown_batches=args.fail_cooldown,
            obey_page_rep=args.obey_page_rep,
            trap_filter=args.trap_filter,
            trap_quarantine_share=args.trap_quarantine,
            robots_ttl_batches=args.robots_ttl,
            ip_budget_per_batch=args.ip_budget,
            domain_budget_per_batch=args.domain_budget,
            priority_aging_batches=args.priority_aging,
        )
        cfg.warc_dir = args.warc_dir
        cfg.warc_dedup = args.warc_dedup
        if args.ip_map and args.resolve_ips:
            ap.error("--ip-map and --resolve-ips are mutually exclusive")
        if args.resolve_ips:
            from crawler_ai_spark.operators.resolver import (
                SocketResolver,
                SyntheticResolver,
                resolve_hosts,
            )

            resolver = (
                SocketResolver(allow_network=True)
                if args.resolve_ips == "socket"
                else SyntheticResolver()
            )
            from crawler_ai_spark.functions.urls import host_expr as _host_of

            from pyspark.sql import functions as _F

            seed_hosts = seeds.select(_host_of(_F.col("seed_url")).alias("host"))
            ip_map = resolve_hosts(seed_hosts, resolver)
        else:
            ip_map = spark.read.parquet(args.ip_map) if args.ip_map else None
        if args.ip_budget and ip_map is None:
            ap.error("--ip-budget requires --ip-map or --resolve-ips")
        dust_rules = (
            spark.read.parquet(args.dust_rules) if args.dust_rules else None
        )
        summary = run_crawl(
            spark, pages, seeds, args.state, cfg,
            resume=args.resume, host_budgets=host_budgets, ip_map=ip_map,
            dust_rules=dust_rules,
        )
        if args.compact or args.vacuum or args.compact_state:
            from crawler_ai_spark.plans.crawl_loop import CrawlStore

            store = CrawlStore(spark, args.state)
            if args.compact:
                store.compact(
                    "seen_delta",
                    files=args.compact_files,
                    cluster=args.compact_cluster,
                )
            if args.vacuum:
                summary["vacuumed_files"] = len(store.log.vacuum("seen_delta"))
            if args.compact_state:
                removed = 0
                for t in CrawlStore.STATE_TABLES:
                    if store.compact_state(t) is not None:
                        removed += len(store.log.vacuum(t))
                summary["state_files_vacuumed"] = removed
        print(json.dumps(summary))
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
