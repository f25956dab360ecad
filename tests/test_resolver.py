"""DNS resolution stage (operators/resolver.py): deterministic resolver
semantics, the constructor gate on the live resolver, loopback-only real
resolution, and the resolve → per-IP budget composition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_ai_spark.operators.frontier import apply_ip_budget
from crawler_ai_spark.operators.resolver import (
    SocketResolver,
    SyntheticResolver,
    resolve_hosts,
)


def test_synthetic_resolver_deterministic_with_clusters():
    r = SyntheticResolver()
    hosts = [f"h{i}.example" for i in range(500)]
    ips = [r(h) for h in hosts]
    assert ips == [r(h) for h in hosts]  # deterministic
    resolved = [ip for ip in ips if ip is not None]
    assert resolved and len(resolved) < len(hosts)  # some unresolvable
    # shared-hosting skew: far fewer distinct IPs than hosts (≤ 40 clusters)
    assert 1 < len(set(resolved)) <= 40
    assert all(ip.startswith("10.") for ip in resolved)


def test_socket_resolver_gate_and_loopback():
    with pytest.raises(RuntimeError, match="allow_network"):
        SocketResolver()
    r = SocketResolver(allow_network=True)
    # /etc/hosts lookup — no egress
    assert r("localhost") == "127.0.0.1"
    assert r("no-such-host-zz.invalid") is None


def test_resolve_hosts_stage(spark):
    hosts = spark.createDataFrame(
        [(f"h{i}.example",) for i in range(40)] * 2, ["host"]  # dupes collapse
    )
    out = resolve_hosts(hosts).collect()
    assert len(out) == 40  # distinct
    r = SyntheticResolver()
    assert {(x.host, x.ip) for x in out} == {(h, r(h)) for h in (f"h{i}.example" for i in range(40))}


def test_resolved_map_drives_ip_budget(spark):
    """Hosts resolving to one IP share one budget; unresolvable hosts
    keep host-grain politeness — end of the Heritrix/Nutch story."""
    rows = []
    for i in range(30):
        rows.append((f"https://v{i % 3}.example/p/{i}", f"v{i % 3}.example", 1, i, "s"))
    frontier = spark.createDataFrame(
        rows, "url string, host string, priority int, discovered_seq long, seed_url string"
    )
    # v0+v1 share an IP, v2 unresolved → own group
    ip_map = spark.createDataFrame(
        [("v0.example", "10.1.1.1"), ("v1.example", "10.1.1.1"), ("v2.example", None)],
        "host string, ip string",
    )
    sched, deferred = apply_ip_budget(frontier, ip_map, 4)
    per_host = {
        r.host: r.n
        for r in sched.groupBy("host").agg(F.count("*").alias("n")).collect()
    }
    # shared IP: 4 slots split across v0+v1; v2 alone gets its own 4
    assert per_host.get("v0.example", 0) + per_host.get("v1.example", 0) == 4
    assert per_host["v2.example"] == 4
    assert sched.count() + deferred.count() == 30
