"""Redirect-chain resolution by pointer doubling.

Real crawls accumulate large 3xx alias maps (www/apex moves, http→https,
trailing-slash canonicalization, URL-shortener hops). The frontier needs
every alias resolved to its final landing URL before the seen-set probe,
or the crawl re-fetches the same page once per alias spelling. The
reference follows redirects implicitly inside ``requests`` one URL at a
time (reference: services/crawler.py's requests.get default
``allow_redirects=True``); at 10^10 URLs the alias map is itself a large
table and chains (a→b→c→…) must be collapsed set-at-a-time.

``resolve_redirects`` collapses every chain in ``ceil(log2(H))``
self-joins instead of ``H`` sequential joins (pointer doubling /
path-halving, the standard PRAM list-ranking trick): after round k each
row's pointer has advanced ``2^k`` hops — with *terminal absorption*, a
row that already reached a URL with no outgoing redirect stops moving.
Chains longer than ``max_hops`` (crawler loop-detection policy; browsers
cap around 20) and true cycles come back with ``resolved = false``.

Scale shape: the state is exactly one row per redirect source; each
round is ONE equi-join of the state with itself on the pointer column
(sort-merge or AQE-chosen), so 10 rounds resolve chains up to 1024 hops
over any table size with no driver participation and no iteration count
proportional to chain length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["resolve_redirects", "alias_seen_urls"]


def resolve_redirects(edges: DataFrame, max_hops: int = 8) -> DataFrame:
    """Collapse redirect chains to their final landing URL.

    Parameters
    ----------
    edges : DataFrame with columns (src string, dst string); ``src`` must
        be unique (a URL has at most one Location target — last write
        wins upstream of this operator).
    max_hops : follow at most this many hops (power of two recommended;
        rounds = ceil(log2(max_hops))).

    Returns one row per ``src``:
      url        — the redirect source,
      final_url  — the URL reached after at most ``max_hops`` hops,
      hops       — hops actually walked (absorbed early at terminals),
      resolved   — true iff a terminal (no outgoing redirect) was reached
                   within ``max_hops``; false for cycles / over-long chains.
    """
    rounds = max(1, (max_hops - 1).bit_length())  # ceil(log2(max_hops))
    srcs = edges.select(F.col("src").alias("_s")).distinct()
    # seed: one hop walked; terminal iff dst has no outgoing edge.
    state = (
        edges.join(srcs, edges["dst"] == srcs["_s"], "left")
        .select(
            F.col("src").alias("url"),
            F.col("dst").alias("cur"),
            F.lit(1).cast("int").alias("hops"),
            F.col("_s").isNull().alias("resolved"),
        )
    )
    for _ in range(rounds):
        nxt = state.select(
            F.col("url").alias("_u"),
            F.col("cur").alias("_c"),
            F.col("hops").alias("_h"),
            F.col("resolved").alias("_r"),
        )
        # Unresolved rows advance by the partner's walk (the partner row
        # always exists: unresolved means cur has an outgoing edge, and
        # the state keeps one row per edge source).
        state = (
            state.join(nxt, state["cur"] == nxt["_u"], "left")
            .select(
                "url",
                F.when(F.col("resolved") | F.col("_u").isNull(), F.col("cur"))
                .otherwise(F.col("_c"))
                .alias("cur"),
                F.when(F.col("resolved") | F.col("_u").isNull(), F.col("hops"))
                .otherwise(
                    F.least(F.col("hops") + F.col("_h"), F.lit(max_hops))
                )
                .alias("hops"),
                F.when(F.col("resolved"), F.lit(True))
                .otherwise(F.coalesce(F.col("_r"), F.lit(False)))
                .alias("resolved"),
            )
        )
    return state.select(
        "url", F.col("cur").alias("final_url"), "hops", "resolved"
    )


def alias_seen_urls(resolved: DataFrame) -> DataFrame:
    """Seen-set insert rows for a resolved alias map: every alias AND its
    landing URL count as seen (so neither spelling is re-scheduled).
    Returns a single ``url`` column, distinct."""
    return (
        resolved.where(F.col("resolved"))
        .select(F.col("url"))
        .unionByName(resolved.where(F.col("resolved")).select(F.col("final_url").alias("url")))
        .distinct()
    )
