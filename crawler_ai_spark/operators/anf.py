"""ANF — approximate neighborhood function over the host graph
(Palmer/Gibbons/Faloutsos KDD'02; the HyperBall/HyperANF idea of
Boldi-Vigna WWW'11 with k-minimum-values sketches instead of HLL
registers): per host, estimate |B(v,t)| — how many hosts are reachable
within t hops — without materializing the quadratic reachability set,
then derive harmonic centrality

    H(v) = sum_{t>=1} (|B(v,t)| - |B(v,t-1)|) / t

the distance-aware importance measure used for web-graph ranking at
Common Crawl scale (it values being CLOSE to everything, where PageRank
values being LINKED by important things).

Why KMV and not HLL here: the sketch state is the k smallest 48-bit
hashes of the ball's members. Merging is array_union -> sort -> first k
— pure integer ops, associative, commutative, and bit-identical in any
engine; the only floats appear in the final estimate
((k-1) * 2^48 / kth_min when the sketch is full, exact |sketch| when it
is not), so the cross-engine oracle pins every iteration exactly. HLL
needs leading-zero counts whose SQL encodings invite off-by-one skew.

Scale shape per iteration: one shuffle-join of edges against sketches
(keyed dst) + a TWO-PHASE salted merge keyed src (phase 1 merges each
salt's neighbor sketches, phase 2 merges the <= SALTS partials — a hub
with 10^6 out-edges never collects 10^6 arrays into one task). State is
n_hosts * k longs. T iterations = 2T shuffles, no driver state."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ANF_K = 8
ANF_SALTS = 8
_HASH_BITS = 48  # 12 hex chars: always fits a signed 64-bit int


def node_hash(node: Column) -> Column:
    """Engine-portable 48-bit node hash (md5 slice, salted)."""
    return F.conv(
        F.substring(F.md5(F.concat(node.cast("string"), F.lit(":anf"))), 1, 12),
        16,
        10,
    ).cast("long")


def _merge(col: Column, k: int) -> Column:
    """KMV union: distinct, ascending, first k."""
    return F.slice(F.array_sort(F.array_distinct(F.flatten(col))), 1, k)


def _estimate(sketch: Column, k: int) -> Column:
    """|sketch| < k -> exact; else (k-1) * 2^48 / kth smallest."""
    kth = F.element_at(sketch, k)
    return F.when(F.size(sketch) < k, F.size(sketch).cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(float(2**_HASH_BITS)) / kth.cast("double")
    )


def anf_harmonic(
    edges: DataFrame,
    hosts: DataFrame,
    iterations: int = 3,
    k: int = ANF_K,
    salts: int = ANF_SALTS,
) -> DataFrame:
    """edges(src, dst) + hosts(host) -> (host, ball_sizes array<double>
    of |B(v,0)|..|B(v,T)|, harmonic). Balls grow along OUT-edges:
    B(v,t+1) = {v} ∪ ⋃_{v->w} B(w,t)."""
    sk = hosts.select("host", F.array(node_hash(F.col("host"))).alias("sketch"))
    ests = [sk.select("host", _estimate(F.col("sketch"), k).alias("e"))]
    for _ in range(iterations):
        contrib = edges.join(
            sk.withColumnRenamed("host", "dst"), "dst"
        ).select(F.col("src").alias("host"), "sketch")
        salt = F.pmod(F.xxhash64(F.element_at(F.col("sketch"), 1)), F.lit(salts))
        partial = (
            contrib.withColumn("_s", salt)
            .groupBy("host", "_s")
            .agg(_merge(F.collect_list("sketch"), k).alias("sketch"))
        )
        merged = partial.groupBy("host").agg(
            _merge(F.collect_list("sketch"), k).alias("nsk")
        )
        sk = (
            sk.join(merged, "host", "left")
            .select(
                "host",
                _merge(
                    F.array(
                        F.col("sketch"),
                        F.coalesce(F.col("nsk"), F.array().cast("array<long>")),
                    ),
                    k,
                ).alias("sketch"),
            )
        )
        ests.append(sk.select("host", _estimate(F.col("sketch"), k).alias("e")))
    out = ests[0].select("host", F.array(F.col("e")).alias("ball_sizes"))
    for e in ests[1:]:
        out = out.join(e, "host").select(
            "host", F.concat("ball_sizes", F.array(F.col("e"))).alias("ball_sizes")
        )
    harmonic = F.aggregate(
        F.sequence(F.lit(1), F.lit(iterations)),
        F.lit(0.0),
        lambda acc, t: acc
        + (
            F.element_at(F.col("ball_sizes"), t.cast("int") + 1)
            - F.element_at(F.col("ball_sizes"), t.cast("int"))
        )
        / t.cast("double"),
    )
    return out.select("host", "ball_sizes", harmonic.alias("harmonic"))


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    salts: int = ANF_SALTS,
) -> DataFrame:
    """Mergeable distinct-count estimation per group — the KMV sketch
    (Bar-Yossef et al. 2002) the ANF iteration is built on, exposed as
    its own operator: exact countDistinct shuffles every (group, value)
    pair; the sketch ships k longs per group and MERGES (union of
    per-batch sketches = sketch of the union), which is what incremental
    crawl accounting needs — per-host distinct-URL counts that update
    batch over batch without re-reading history.

    Exact below k (the sketch IS the distinct set), (k-1)*2^48/kth_min
    above. Integer-exact merges: bit-identical in any engine. Two-phase
    salted aggregation keyed (group, hash-salt) then group, so a hot
    group's values never collect into one task.

    Returns (group, sketch array<long>, n_exact_or_estimate as
    distinct_est double)."""
    h = node_hash(F.col(value_col))
    salt = F.pmod(F.xxhash64(F.col(value_col)), F.lit(salts))
    partial = (
        df.select(F.col(group_col).alias("g"), h.alias("h"), salt.alias("_s"))
        .groupBy("g", "_s")
        .agg(
            F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("sketch")
        )
    )
    merged = partial.groupBy("g").agg(
        _merge(F.collect_list("sketch"), k).alias("sketch")
    )
    return merged.select(
        F.col("g").alias(group_col),
        "sketch",
        _estimate(F.col("sketch"), k).alias("distinct_est"),
    )
