"""DNS resolution stage — the producer of the (host, ip) map the
server-grain politeness budget consumes (operators/frontier.apply_ip_budget;
Heritrix/Nutch group politeness queues by IP because shared hosting puts
hundreds of vhosts on one server).

Same shape as the fetch stage: distinct hosts, hash-partitioned, one
mapInPandas pass with a pluggable resolver — `SyntheticResolver` derives
IPs deterministically from md5(host) with a shared-hosting cluster skew
(so the catalog row `dns_resolve_hosts` is oracle-predictable and the
ip-budget path is testable without sockets); `SocketResolver` is the
stdlib live implementation, constructor-gated like UrllibTransport
because this sandbox must never egress.

Scale: the host universe is tiny next to the frontier (10^7-10^8 hosts
vs 10^10 URLs); resolution is one distinct + one Arrow pass, O(hosts),
and the output broadcasts into the budget join. A deployment caches the
result per crawl epoch exactly like the robots_cache state table."""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _host_key(host: str) -> int:
    return struct.unpack(">I", hashlib.md5(host.encode()).digest()[:4])[0]


class SyntheticResolver:
    """Deterministic, network-free resolver: md5(host) decides outcome.

    r = key % 100: r >= 97 → unresolvable (None — the host keeps
    host-grain politeness). Otherwise the host joins shared-hosting
    cluster c = key % 40 and resolves to that cluster's IP
    10.(c%250).((c*7)%250).(c%50+1) — ~1/40 of hosts per IP, the skew
    shape apply_ip_budget exists to throttle."""

    def __call__(self, host: str) -> str | None:
        key = _host_key(host)
        if key % 100 >= 97:
            return None
        c = key % 40
        return f"10.{c % 250}.{(c * 7) % 250}.{c % 50 + 1}"


class SocketResolver:
    """Stdlib live resolver (socket.getaddrinfo). Constructor-gated:
    resolution opens real network lookups, so allow_network must be set
    EXPLICITLY by a deployment."""

    def __init__(self, timeout_s: float = 5.0, allow_network: bool = False):
        if not allow_network:
            raise RuntimeError(
                "SocketResolver performs real DNS lookups — construct with "
                "allow_network=True only in a deployment with egress"
            )
        self.timeout_s = timeout_s

    def __call__(self, host: str) -> str | None:
        import socket

        try:
            infos = socket.getaddrinfo(host, None, family=socket.AF_INET)
            # deterministic pick: lexicographically smallest A record
            return min(i[4][0] for i in infos) if infos else None
        except OSError:
            return None


def resolve_hosts(
    hosts: DataFrame, resolver=None, partitions: int | None = None
) -> DataFrame:
    """(… host …) → (host, ip) over the DISTINCT host set; ip NULL for
    unresolvable hosts (apply_ip_budget falls back to host grain for
    them). One exchange (distinct) + one Arrow pass."""
    resolver = resolver or SyntheticResolver()
    spark = hosts.sparkSession
    n_parts = partitions or spark.sparkContext.defaultParallelism

    def _resolve(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_hosts, out_ips = [], []
            for h in pdf["host"]:
                try:
                    ip = resolver(h)
                except Exception:  # noqa: BLE001 - one bad host must not kill a batch
                    ip = None
                out_hosts.append(h)
                out_ips.append(ip)
            yield pd.DataFrame({"host": out_hosts, "ip": out_ips})

    staged = hosts.select("host").distinct().repartition(n_parts, F.col("host"))
    return staged.mapInPandas(_resolve, "host string, ip string")
