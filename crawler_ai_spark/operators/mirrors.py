"""Mirror-host detection: hosts serving (near-)identical content sets.

A web-scale frontier wastes budget crawling mirrors (CDN vanity hosts,
www/apex twins, region clones) page-by-page. The reference never needs
this — it crawls one site per request (routes.py) — but at 10^10-URL
scale the frontier should collapse a mirror family to one representative
host before spending fetch budget.

Detection is content-set overlap via an INVERTED INDEX, the same shape
as MinHash-LSH banding (pipeline/dedup.py): pairs are generated only for
hosts that SHARE a content fingerprint, never all-pairs over the host
universe. Two scale guards:

  * distinct (host, fingerprint) first — per-host page counts can't
    inflate overlap;
  * fingerprints served by more than ``max_hosts_per_fp`` hosts are
    dropped as non-discriminative boilerplate (the stop-word trick:
    a cookie-banner page shared by every host would otherwise emit
    O(hosts^2) pairs for zero signal).

Jaccard over the surviving fingerprint sets >= ``threshold`` marks a
mirror pair; the canonical representative is the lexicographic min over
each host's direct mirror partners (exact for cliques, which is what
true mirrors form; transitive closure for chained near-mirrors would
reuse the iterative min-label rounds of pipeline/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MIRROR_JACCARD_THRESHOLD = 0.9
MAX_HOSTS_PER_FP = 16


def mirror_pairs(
    pages: DataFrame,
    host_col: str = "host",
    fp_col: str = "fingerprint",
    threshold: float = MIRROR_JACCARD_THRESHOLD,
    max_hosts_per_fp: int = MAX_HOSTS_PER_FP,
) -> DataFrame:
    """(host_a, host_b, shared, size_a, size_b, jaccard) for every host
    pair with fingerprint-set Jaccard >= threshold; host_a < host_b."""
    fps = pages.select(
        F.col(host_col).alias("host"), F.col(fp_col).alias("fp")
    ).distinct()
    # stop-word gate: window-free — one groupBy on fp, then a semi join
    rare = fps.groupBy("fp").agg(F.count("*").alias("n_hosts")).where(
        F.col("n_hosts") <= max_hosts_per_fp
    )
    idx = fps.join(rare.select("fp"), "fp", "left_semi")
    # sizes AFTER the gate: Jaccard is over discriminative fingerprints
    # only, so universal boilerplate can neither join nor separate hosts
    sizes = idx.groupBy("host").agg(F.count("*").alias("size"))
    pairs = (
        idx.alias("a")
        .join(idx.alias("b"), "fp")
        .where(F.col("a.host") < F.col("b.host"))
        .groupBy(
            F.col("a.host").alias("host_a"), F.col("b.host").alias("host_b")
        )
        .agg(F.count("*").alias("shared"))
    )
    return (
        pairs.join(sizes.withColumnRenamed("host", "host_a"), "host_a")
        .withColumnRenamed("size", "size_a")
        .join(sizes.withColumnRenamed("host", "host_b"), "host_b")
        .withColumnRenamed("size", "size_b")
        .withColumn(
            "jaccard",
            F.col("shared")
            / (F.col("size_a") + F.col("size_b") - F.col("shared")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("host_a", "host_b", "shared", "size_a", "size_b", "jaccard")
    )


def mirror_canonical(pairs: DataFrame) -> DataFrame:
    """host -> canonical mirror representative (lexicographic min over the
    host's direct partners and itself). Every host in >= 1 pair appears."""
    edges = pairs.select(
        F.col("host_a").alias("host"), F.col("host_b").alias("peer")
    ).unionByName(
        pairs.select(F.col("host_b").alias("host"), F.col("host_a").alias("peer"))
    )
    return (
        edges.groupBy("host")
        .agg(F.min("peer").alias("min_peer"))
        .select(
            "host", F.least(F.col("host"), F.col("min_peer")).alias("canonical_host")
        )
    )


def mirror_canonical_declared(
    pairs: DataFrame, host_prefs: DataFrame | None
) -> DataFrame:
    """mirror_canonical with the publisher's say: ``host_prefs(host,
    preferred_host)`` from robots Host directives (sources/robots.py
    with_host_directive). Precedence per mirror pair-neighborhood:

    1. if any member DECLARES a preferred host that is itself a member
       of the neighborhood (the host itself or a direct partner), the
       lexicographically-smallest such declaration wins — a foreign
       declaration cannot hijack the group;
    2. otherwise the heuristic lexicographic minimum (mirror_canonical).

    host_prefs is host-grain (small) and broadcast; one extra join over
    the base operator."""
    base = mirror_canonical(pairs)
    if host_prefs is None:
        return base
    edges = pairs.select(
        F.col("host_a").alias("host"), F.col("host_b").alias("peer")
    ).unionByName(
        pairs.select(F.col("host_b").alias("host"), F.col("host_a").alias("peer"))
    )
    # self-edge so a host's own declaration naming ITSELF is in scope
    scope = edges.unionByName(
        edges.select("host", F.col("host").alias("peer")).distinct()
    )
    prefs = host_prefs.where(F.col("preferred_host").isNotNull()).select(
        F.col("host").alias("declarer"), "preferred_host"
    )
    # a declaration is valid for `host` when some neighborhood member
    # (host or peer) declared a host that is ALSO in the neighborhood
    declared = (
        scope.join(
            F.broadcast(prefs), scope["peer"] == F.col("declarer")
        )
        .join(
            scope.select(
                F.col("host").alias("_h"), F.col("peer").alias("_member")
            ),
            (F.col("host") == F.col("_h"))
            & (F.col("preferred_host") == F.col("_member")),
        )
        .groupBy("host")
        .agg(F.min("preferred_host").alias("declared_host"))
    )
    return base.join(declared, "host", "left").select(
        "host",
        F.coalesce("declared_host", "canonical_host").alias("canonical_host"),
    )
