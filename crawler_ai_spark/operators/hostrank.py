"""Host-graph rank for crawl prioritization (power-iteration PageRank).

The reference crawler schedules fetches per-seed with static keyword
scores (services/crawler/spider.py priority heuristics); a web-scale
frontier additionally wants a *global* host-importance signal so crawl
budget flows toward well-linked hosts. This operator computes damped
PageRank over the host link graph with a fixed iteration count — the
classic batch formulation (Page et al. 1999; same shape as GraphX/
Pregel's pagerank but expressed as plain DataFrame joins so Catalyst
plans it).

Scale notes (10^8-host graph, 10^10 edges):
  * `edges` + `outdeg` are iteration-invariant — callers should persist
    (or bucket-by `src`) once; each iteration is then one shuffle-join
    on `src` (rank is re-keyed by `host`) plus one aggregation keyed by
    `dst`. K iterations = 2K shuffles, no driver state, no collect.
  * Map-side combine applies to the inflow aggregation; a hot host
    (huge in-degree) is absorbed by partial aggregation when
    `deterministic_fold=False` (plain SUM — the production path).
  * `deterministic_fold=True` sums each host's in-contributions in
    src-sorted order via a fold, making the resulting doubles
    bit-identical across engines (the cross-engine oracle-hash harness
    needs reproducible float addition order). That path materializes a
    per-host in-edge array, so it is for bounded-degree graphs /
    test rigs — production uses the SUM path where last-bit float
    determinism is not required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85


def host_rank(
    edges: DataFrame,
    hosts: DataFrame,
    n_hosts: int,
    iterations: int = 3,
    damping: float = DAMPING,
    deterministic_fold: bool = True,
    teleport: DataFrame | None = None,
) -> DataFrame:
    """Damped PageRank over a host graph, fixed `iterations` power steps.

    edges:  distinct (src, dst) host-id pairs, self-loops removed; every
            host MUST have >= 1 out-edge (add sink handling upstream —
            the catalog fixture guarantees it with a ring).
    hosts:  one row per host id (the rank universe).
    teleport: optional (host, t) distribution replacing the uniform
            restart — this is TrustRank (Gyongyi/Garcia-Molina/Pedersen
            VLDB'04) when t is nonzero only on a curated trusted seed
            set: trust flows OUT of the seeds along links, and a spam
            host reachable from no seed converges to rank 0 instead of
            collecting the (1-d)/n everyone gets under uniform restart.
            Caller normalizes t to sum 1; broadcast (seed sets are
            small). Init follows the teleport so iteration-0 mass
            already sits on the seeds.
    Returns (host, rank) with sum(rank) ~= 1.
    """
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    e = edges.join(outdeg, "src")  # iteration-invariant; persist at scale
    if teleport is not None:
        hosts = hosts.join(
            F.broadcast(teleport.select("host", "t")), "host", "left"
        ).select("host", F.coalesce("t", F.lit(0.0)).alias("t"))
        base_col = F.lit(1.0 - damping) * F.col("t")
        r = hosts.select("host", F.col("t").alias("rank"))
    else:
        base_col = F.lit((1.0 - damping) / n_hosts)
        r = hosts.select("host", F.lit(1.0 / n_hosts).alias("rank"))
    for _ in range(iterations):
        contrib = e.join(r, e["src"] == r["host"]).select(
            e["dst"], e["src"], (r["rank"] / e["outdeg"]).alias("c")
        )
        if deterministic_fold:
            inflow = contrib.groupBy("dst").agg(
                F.expr(
                    "aggregate(array_sort(collect_list(struct(src, c))),"
                    " cast(0.0 as double), (acc, x) -> acc + x.c)"
                ).alias("inflow")
            )
        else:
            inflow = contrib.groupBy("dst").agg(F.sum("c").alias("inflow"))
        r = (
            hosts.join(inflow, hosts["host"] == inflow["dst"], "left")
            .select(
                hosts["host"],
                (
                    base_col
                    + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return r.select("host", "rank")


def budget_from_rank(
    ranks: DataFrame,
    total_per_batch: int,
    min_budget: int = 1,
    max_budget: int | None = None,
) -> DataFrame:
    """Turn host ranks into per-host politeness budgets: each host gets a
    share of the batch's total fetch budget proportional to its rank
    (floor(total * rank), clamped to [min_budget, max_budget]). The output
    (host, host_budget) feeds operators/frontier.py:apply_host_budget's
    `host_budgets` parameter directly — well-linked hosts get more slots
    per batch, but min_budget keeps the tail crawlable and max_budget caps
    any single host (rank-proportional, still polite).

    floor() on the rank double is deterministic because host_rank's fold
    path makes the rank bits reproducible."""
    b = F.floor(F.lit(float(total_per_batch)) * F.col("rank")).cast("int")
    b = F.greatest(F.lit(min_budget), b)
    if max_budget is not None:
        b = F.least(F.lit(max_budget), b)
    return ranks.select("host", b.alias("host_budget"))


def host_edges_from_pages(pages: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Observed host link graph from a pages table (url, html): parse each
    page with the engine's structural scanner, canonicalize every href
    against its page, and keep distinct cross-host (src, dst) hostname
    pairs. Returns (edges, hosts) shaped for host_rank(), with the host
    universe restricted to hosts that have >= 1 out-edge (host_rank's
    no-dangling precondition — hosts that only receive links get no rank
    row and therefore no rank-derived budget, i.e. they fall back to the
    caller's global politeness cap).

    One parse pass + one distinct shuffle; at archive scale run it on a
    sample or reuse the crawl's already-parsed link deltas."""
    from crawler_ai_spark.functions.html import explode_links, with_parse
    from crawler_ai_spark.functions.urls import canonicalize_udf, host_expr

    parsed = with_parse(pages.select("url", "html").where(F.col("html").isNotNull()))
    links = explode_links(parsed).where(F.col("href").isNotNull())
    pairs = links.select(
        host_expr(F.col("url")).alias("src"),
        host_expr(canonicalize_udf(F.col("url"), F.col("href"))).alias("dst"),
    )
    edges = (
        pairs.where(
            F.col("src").isNotNull()
            & F.col("dst").isNotNull()
            & (F.col("src") != F.col("dst"))
        )
        .distinct()
    )
    hosts = edges.select(F.col("src").alias("host")).distinct()
    return edges, hosts


def hits(
    edges: DataFrame,
    hosts: DataFrame,
    iterations: int = 2,
    deterministic_fold: bool = True,
) -> DataFrame:
    """HITS hubs/authorities (Kleinberg 1999, the published algorithm)
    over the host graph — the link-analysis complement to host_rank's
    PageRank: authorities are pages many hubs point AT (content hosts),
    hubs are pages that point at many authorities (directory/portal
    hosts). Per iteration: a(v) = Σ_{u→v} h(u), L2-normalize; then
    h(u) = Σ_{u→v} a(v), L2-normalize.

    Same determinism discipline as host_rank: with deterministic_fold,
    per-node inflows fold in neighbor-sorted order and the global L2
    norm folds in host-sorted order, so the doubles are bit-identical
    across partitionings (and to the DuckDB oracle). Production flips
    the flag for plain SUMs with map-side combine. Per iteration: two
    key-joins + two aggregations + two one-row norm broadcasts — no
    driver state."""

    def _fold_sum(key: str, val: str):
        if deterministic_fold:
            return F.expr(
                f"aggregate(array_sort(collect_list(struct({key}, {val}))),"
                f" cast(0.0 as double), (acc, x) -> acc + x.{val})"
            )
        return F.sum(val)

    def _l2_normalize(df: DataFrame, col: str) -> DataFrame:
        if deterministic_fold:
            nrm = df.agg(
                F.sqrt(
                    F.expr(
                        f"aggregate(array_sort(collect_list(struct(host, {col}))),"
                        f" cast(0.0 as double), (acc, x) -> acc + x.{col} * x.{col})"
                    )
                ).alias("_nrm")
            )
        else:
            nrm = df.agg(F.sqrt(F.sum(F.col(col) * F.col(col))).alias("_nrm"))
        return df.crossJoin(F.broadcast(nrm)).select(
            "host", (F.col(col) / F.col("_nrm")).alias(col)
        )

    h = hosts.select("host", F.lit(1.0).alias("hub"))
    a = None
    for _ in range(iterations):
        raw_a = (
            edges.join(h, edges["src"] == h["host"])
            .select(edges["dst"], edges["src"], F.col("hub").alias("c"))
            .groupBy("dst")
            .agg(_fold_sum("src", "c").alias("raw"))
        )
        a = _l2_normalize(
            hosts.join(raw_a, hosts["host"] == raw_a["dst"], "left").select(
                hosts["host"], F.coalesce("raw", F.lit(0.0)).alias("auth")
            ),
            "auth",
        )
        raw_h = (
            edges.join(a, edges["dst"] == a["host"])
            .select(edges["src"], edges["dst"], F.col("auth").alias("c"))
            .groupBy("src")
            .agg(_fold_sum("dst", "c").alias("raw"))
        )
        h = _l2_normalize(
            hosts.join(raw_h, hosts["host"] == raw_h["src"], "left").select(
                hosts["host"], F.coalesce("raw", F.lit(0.0)).alias("hub")
            ),
            "hub",
        )
    return a.join(h, "host").select("host", "auth", "hub")


def opic(
    edges: DataFrame,
    hosts: DataFrame,
    n_hosts: int,
    iterations: int = 3,
    deterministic_fold: bool = True,
) -> DataFrame:
    """OPIC — On-line Page Importance Computation (Abiteboul, Preda,
    Cobena, WWW 2003), synchronous batch variant over the host graph.

    Crawl-time importance without waiting for PageRank to converge: each
    host holds CASH; one step banks every host's cash into its HISTORY
    and redistributes it equally along out-edges. The importance
    estimate after k steps is (history + cash) / (k + 1) — a running
    average that is meaningful from the very first step, which is why
    production crawlers use OPIC for frontier ordering (the original
    paper's use case) rather than iterating PageRank to a fixpoint.

        H_{k+1}(i) = H_k(i) + C_k(i)
        C_{k+1}(i) = sum_{j->i} C_k(j) / outdeg(j)

    Invariants (no-dangling graphs — same ring precondition as
    host_rank): sum(cash) == 1 after every step, sum(history) == k after
    k steps, so sum(importance) == 1.

    Same scale shape as host_rank: edges+outdeg are iteration-invariant
    (persist at scale), each step is one shuffle-join keyed src plus one
    aggregation keyed dst — K steps = 2K shuffles, no driver state. The
    deterministic_fold path sums in-contributions in src-sorted order
    for bit-identical doubles across engines (the oracle-hash harness);
    production uses the plain-SUM path with map-side combine.

    Returns (host, cash, history, importance). `importance` feeds
    budget_from_rank (rename to `rank`) exactly like PageRank does.
    """
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    e = edges.join(outdeg, "src")
    state = hosts.select(
        "host",
        F.lit(1.0 / n_hosts).alias("cash"),
        F.lit(0.0).alias("history"),
    )
    for _ in range(iterations):
        contrib = e.join(state, e["src"] == state["host"]).select(
            e["dst"], e["src"], (state["cash"] / e["outdeg"]).alias("c")
        )
        if deterministic_fold:
            inflow = contrib.groupBy("dst").agg(
                F.expr(
                    "aggregate(array_sort(collect_list(struct(src, c))),"
                    " cast(0.0 as double), (acc, x) -> acc + x.c)"
                ).alias("inflow")
            )
        else:
            inflow = contrib.groupBy("dst").agg(F.sum("c").alias("inflow"))
        state = (
            state.join(inflow, state["host"] == inflow["dst"], "left")
            .select(
                state["host"],
                F.coalesce(F.col("inflow"), F.lit(0.0)).alias("cash"),
                (state["history"] + state["cash"]).alias("history"),
            )
        )
    denom = float(iterations + 1)
    return state.select(
        "host",
        "cash",
        "history",
        ((F.col("history") + F.col("cash")) / F.lit(denom)).alias("importance"),
    )


def triangle_clustering(edges: DataFrame, hosts: DataFrame) -> DataFrame:
    """Triangle counts + local clustering coefficient per host over the
    UNDIRECTED host graph (direction dropped; self-loops and parallel
    edges collapse). The mirror-farm / link-ring signal: organic
    neighborhoods have moderate clustering, link rings are near-cliques
    (coefficient -> 1), isolated spam spokes are 0.

    The scale-standard degree-ordered wedge join (each triangle counted
    exactly once): orient every undirected edge from the lower-(degree,
    id) endpoint to the higher; a node's oriented out-degree is bounded
    by ~sqrt(m) regardless of its raw degree, so the wedge self-join a
    naive formulation explodes on hubs stays bounded. Three shuffles
    total (degree agg, wedge join, closing-edge join).

    Returns (host, degree, triangles, clustering) with clustering =
    2*T / (d*(d-1)) and 0.0 for degree < 2."""
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("v"))
        .unionAll(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    # orient low-(degree, id) -> high-(degree, id)
    da = deg.select(F.col("v").alias("a"), F.col("degree").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("degree").alias("db"))
    ranked = und.join(da, "a").join(db, "b")
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = ranked.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("hi"),
    )
    e1 = oriented.select(F.col("lo").alias("p"), F.col("hi").alias("x"))
    e2 = oriented.select(F.col("lo").alias("p"), F.col("hi").alias("y"))
    wedges = e1.join(e2, "p").where(F.col("x") < F.col("y"))
    closing = oriented.select(
        F.least("lo", "hi").alias("x2"), F.greatest("lo", "hi").alias("y2")
    ).unionAll(
        # the closing edge may be oriented either way relative to (x, y)
        oriented.select(
            F.greatest("lo", "hi").alias("x2"), F.least("lo", "hi").alias("y2")
        )
    ).distinct()
    tris = wedges.join(
        closing,
        (F.col("x") == F.col("x2")) & (F.col("y") == F.col("y2")),
    ).select("p", "x", "y")
    per_node = (
        tris.select(F.col("p").alias("v"))
        .unionAll(tris.select(F.col("x").alias("v")))
        .unionAll(tris.select(F.col("y").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return (
        hosts.join(deg, hosts["host"] == deg["v"], "left")
        .join(per_node, hosts["host"] == per_node["v"], "left")
        .select(
            hosts["host"],
            F.coalesce("degree", F.lit(0)).cast("long").alias("degree"),
            F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"),
            F.when(
                F.coalesce("degree", F.lit(0)) >= 2,
                F.lit(2.0)
                * F.coalesce("triangles", F.lit(0))
                / (F.col("degree") * (F.col("degree") - F.lit(1))),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering"),
        )
    )


def ucb_host_scores(history: DataFrame, c: float = 1.4142135623730951) -> DataFrame:
    """Adaptive crawl allocation as a bandit: each host is an arm, each
    fetch a pull, a "useful" fetch (career page found, job extracted —
    caller defines the success column) the reward. UCB1 (Auer et al.
    2002) scores every host

        score = success_rate + c * sqrt(ln(N_total) / n_host)

    so budget flows to hosts that HAVE paid off (exploit) and hosts the
    crawl has barely tried (explore) — the focused-crawler refinement of
    static rank-proportional budgets, and the mechanism that keeps a
    new, unproven host from starving behind established ones.

    history(host, success boolean), one row per completed fetch.
    Returns (host, n_fetches, successes, score, rank) where rank is the
    score normalized to sum 1 — drop-in for budget_from_rank. One
    map-combined groupBy + a one-row total broadcast; scores quantized
    to 9 dp (ln/sqrt are libm calls — the established cross-engine
    discipline)."""
    agg = history.groupBy("host").agg(
        F.count("*").cast("long").alias("n_fetches"),
        F.sum(F.col("success").cast("long")).cast("long").alias("successes"),
    )
    totals = agg.agg(F.sum("n_fetches").cast("double").alias("n_total"))
    scored = agg.crossJoin(F.broadcast(totals)).select(
        "host",
        "n_fetches",
        "successes",
        (
            F.round(
                F.col("successes") / F.col("n_fetches")
                + F.lit(c) * F.sqrt(F.log(F.col("n_total")) / F.col("n_fetches")),
                9,
            )
            + F.lit(0.0)
        ).alias("score"),
    )
    ssum = scored.agg(F.sum("score").alias("ssum"))
    return scored.crossJoin(F.broadcast(ssum)).select(
        "host",
        "n_fetches",
        "successes",
        "score",
        (F.col("score") / F.col("ssum")).alias("rank"),
    )
