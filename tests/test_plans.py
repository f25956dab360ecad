"""Physical-plan discipline checks: the properties that make the
headline queries scale are asserted on the optimizer's output, so a
regression (a filter that stops pushing down, a broadcast that silently
becomes a shuffle join, an accidental cartesian product) fails CI
instead of surfacing as a 100× slowdown on a real cluster.

These assert PLAN SHAPE, not timings — stable across machines."""

from __future__ import annotations

import pytest

from crawler_ai_spark import catalog as C

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = C.QUERIES[name](spark, SF_DIR)
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


# emb_topk / emb_dup_pairs are deliberately absent from the cartesian
# check below: their brute-force cross join IS the documented point
# (sandbox verifiers with registered LSH/IVF scale paths).


@pytest.mark.parametrize(
    "name",
    [
        "priority_schedule",
        "frontier_dedup",
        "q1_pricing_summary",
        "top_revenue_orders",
        "doc_minhash_dups",
        "doc_stats",
        "emb_ann_topk",
        "job_cards_extract",
        "container_jobs_extract",
        "doc_pii_scrub",
    ],
)
def test_no_cartesian_product(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name


def test_scan_agg_pushes_filter_and_prunes_columns(spark):
    plan = _plan(spark, "q1_pricing_summary")
    # the date predicate reaches the parquet scan...
    assert "PushedFilters: [" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200]
    # ...and the scan reads only the referenced columns, not the full row
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_comment" not in read_schema


def test_three_way_join_broadcasts_the_dimension(spark):
    """At sf0.001 every input sits under the broadcast threshold, so the
    planner may legally broadcast the fact-fact join too — the observable
    property at this scale is hash joins throughout (broadcast for the
    dim) and no nested-loop/cartesian fallback. The fact-fact shuffle
    behavior at size is governed by autoBroadcastJoinThreshold, not by
    anything this query hardcodes."""
    plan = _plan(spark, "top_revenue_orders")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_frontier_dedup_is_single_shuffle(spark):
    """First-wins dedup = one exchange on the dedup key, not several."""
    plan = _plan(spark, "frontier_dedup")
    # formatted mode lists the partitioning in the footer Arguments
    n_exchanges = plan.count("hashpartitioning(")
    assert 1 <= n_exchanges <= 2, f"dedup plan has {n_exchanges} hash exchanges"


def test_classifier_has_no_python_in_the_plan(spark):
    """The classifier cascade must stay pure JVM expressions (inside
    whole-stage codegen at execution; AQE's pre-execution formatted plan
    does not print codegen stages, so assert the meaningful inverse) — a
    Python eval node here would be the 100 TB regression."""
    plan = _plan(spark, "job_url_classify")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "PythonUDF" not in plan


def test_pii_scrub_is_pure_jvm_scan(spark):
    plan = _plan(spark, "doc_pii_scrub")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # linear scan: no join, no hash shuffle (only the final sort exchange)
    assert "Join" not in plan
    assert "hashpartitioning(" not in plan


def test_curation_pipeline_is_single_shuffle_pure_jvm(spark):
    """The composed curation flow must stay one fingerprint shuffle (plus
    the final sort) with zero Python nodes — the gates/scrub/chunk stages
    are all JVM expressions fused around the dedup window."""
    plan = _plan(spark, "doc_curation_pipeline")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # fingerprint window shuffle + (small sources only) the conditional
    # spread-to-cores of the gate projection
    assert 1 <= plan.count("hashpartitioning(") <= 2
    assert "Join" not in plan
    # the rn=1 dedup gets the WindowGroupLimit pushdown (partial before
    # the shuffle) — losing it would ship every duplicate row
    assert "WindowGroupLimit" in plan


@pytest.mark.parametrize(
    "name", ["doc_line_dedup", "doc_decontaminate", "doc_repetition"]
)
def test_corpus_curation_no_cartesian_no_python(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_line_dedup_broadcasts_boilerplate_set(spark):
    """In 'auto' mode (no forced hint) the planner must still pick a
    broadcast anti-join at sandbox SF, where the removal set genuinely
    fits — probing map-side without pinning an unbounded broadcast at
    corpus scale (AQE re-sizes from runtime stats; the selectable
    shuffle path is pinned by test_line_dedup_shuffle_mode below)."""
    plan = _plan(spark, "doc_line_dedup")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_decontaminate_broadcasts_benchmark_grams(spark):
    """The benchmark gram set is KBs-to-MBs; the contamination probe must
    broadcast it, never shuffle the corpus grams on the join key."""
    plan = _plan(spark, "doc_decontaminate")
    assert "BroadcastHashJoin" in plan


def test_source_filter_broadcasts_the_rollup(spark):
    """The per-source tier apply must broadcast the one-row-per-source
    rollup — shuffling the corpus on `source` to meet it would be the
    100 TB regression (and source keys are Zipf-skewed)."""
    plan = _plan(spark, "doc_source_filter")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_incremental_ingest_no_text_in_the_shuffle(spark):
    """The ingestion gate joins/windows on the md5 fingerprint — the text
    column must be pruned out before any exchange (the scan projects it to
    compute the hash; nothing downstream carries it)."""
    plan = _plan(spark, "corpus_incremental_ingest")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # every exchange ships (doc_id/fingerprint)-shaped rows only; in
    # formatted explain each Exchange detail block carries an Input line
    blocks = [b for b in plan.split("\n\n") if ") Exchange" in b.split("\n")[0]]
    assert blocks, plan  # the gate does shuffle — blocks must exist
    for b in blocks:
        input_line = next(l for l in b.split("\n") if l.startswith("Input"))
        assert "text#" not in input_line, b


def test_sampling_is_map_only(spark):
    """Stratified sampling is per-row: zero shuffles, zero joins besides
    the deterministic output sort."""
    plan = _plan(spark, "doc_sample_stratified")
    assert "hashpartitioning(" not in plan and "Join" not in plan


def test_repetition_shuffles_short_rows_with_partial_agg(spark):
    """The bigram counts must pre-combine map-side (partial HashAggregate
    before the exchange) and shuffle only on doc_id/bigram keys — and the
    doc_id join back to the line metrics must not degrade to a loop join."""
    plan = _plan(spark, "doc_repetition")
    assert "partial_count" in plan or "partial" in plan.lower()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_pack_windows_two_exchanges_pure_jvm(spark):
    """Window materialization is two CORPUS-sized exchanges (the
    (source, _sub) offset window + the partial-aggregatable regroup)
    plus the hot-shard pre-split's tiny stitch branch: a partial-agg
    totals exchange and a per-source base window, joined back by
    BROADCAST — never a corpus-keyed shuffle join. No Python in the
    data path."""
    plan = _plan(spark, "corpus_pack_windows")
    # pre-split active: the big window partitions on (source, _sub)
    assert "_sub" in plan, plan
    # 2 corpus exchanges + 2 stitch exchanges carrying short rows only
    assert plan.count("hashpartitioning(") == 4, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    # the totals branch must pre-combine map-side (partial agg below its
    # exchange) so only (source, _sub, total) rows cross the wire
    assert "partial" in plan.lower(), plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_training_manifest_three_exchanges(spark):
    """The end-to-end capstone (gates → dedup → scrub → shuffle → pack)
    must run in exactly three data-path hash exchanges: the input spread,
    the fingerprint dedup window, and the shard window — whose
    partitioning both the packing offset window AND the final regroup
    aggregate reuse (shard column named `source` end-to-end so the rename
    can't prune the partitioned attribute). Plus the deterministic output
    range sort; no joins, no Python."""
    plan = _plan(spark, "corpus_training_manifest")
    assert plan.count("hashpartitioning(") == 3, plan
    assert plan.count("rangepartitioning(") == 1, plan
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_shuffle_shards_single_uniform_exchange(spark):
    """The global shuffle is ONE exchange on the md5-derived shard_id
    (uniform by construction) — map-side key + shard assignment, no join."""
    plan = _plan(spark, "corpus_shuffle_shards")
    assert plan.count("hashpartitioning(") == 1, plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_arrow_udf_queries_use_arrow_not_row_python(spark):
    """The UDF-backed extractions must be Arrow-batched (ArrowEvalPython),
    never row-at-a-time (BatchEvalPython)."""
    for name in ("crawl_harvest_links", "container_jobs_extract"):
        plan = _plan(spark, name)
        assert "ArrowEvalPython" in plan, name
        assert "BatchEvalPython" not in plan, name


def test_brute_force_verifiers_broadcast_the_small_side(spark):
    """The documented cross joins must at least broadcast the small side
    (queries) — a shuffled cartesian would be wrong even as a verifier."""
    plan = _plan(spark, "emb_topk")
    assert "BroadcastNestedLoopJoin" in plan or "CartesianProduct" in plan
    assert "broadcast" in plan.lower()


def test_c3_confidence_term_array_stays_staged(spark):
    """The C3 staged form only beats the interpreted fallback if the term
    array is materialized in its own (whole-stage-compiled, splittable)
    Project below the CodegenFallback aggregate — i.e. CollapseProject
    must NOT inline the 246 keyword terms into the fallback projection.
    The `_c3_terms` intermediate surviving into the physical plan is the
    observable for that split (it vanishes if the projections merge);
    compilation itself is pinned by tests/test_codegen_health.py."""
    for name in ("url_career_confidence", "career_detection_pipeline"):
        plan = _plan(spark, name)
        assert "_c3_terms" in plan, name
        assert "aggregate(" in plan, name


def test_line_dedup_shuffle_mode_avoids_broadcast(spark):
    """The 100 TB-safe selectable path: boiler_join='shuffle' must plan a
    shuffled (hash) anti-join — no broadcast of the unbounded removal
    set. (The catalog query runs 'auto': AQE sizes the set at runtime and
    broadcasts at sandbox SF — test_line_dedup_broadcasts_boilerplate_set
    pins that side.)"""
    from crawler_ai_spark.pipeline import corpus as CP

    src = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    df = CP.line_dedup(src, min_df=2, boiler_join="shuffle")
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    anti = [l for l in plan.splitlines() if "LeftAnti" in l]
    assert anti, plan
    assert all("Broadcast" not in l for l in anti), anti


def test_live_fetch_stage_single_exchange(spark):
    """The fetch stage's plan is ONE host-hash exchange + in-partition
    sort + the Arrow stage — no join back for the frontier metadata, no
    global sort, no second shuffle (the politeness clock is partition-
    local by construction)."""
    plan = _plan(spark, "live_fetch_stage")
    data_path = plan.split("== Physical Plan ==")[-1]
    # exactly one hash exchange (the host repartition); the final
    # orderBy of the catalog wrapper adds a range exchange, excluded by
    # counting hashpartitioning only
    assert data_path.count("hashpartitioning(host") == 1, data_path[:2000]
    assert "SortMergeJoin" not in data_path and "BroadcastHashJoin" not in data_path
    assert "CartesianProduct" not in data_path


def test_cachefilter_probe_is_broadcast_no_shuffle(spark):
    """The sharded cache-filter probe (operators/cachefilter.py) must be
    map-side: blob map broadcast into an Arrow UDF, candidates never
    shuffled — the same discipline as the broadcast bloom probe."""
    from crawler_ai_spark.operators import cachefilter as CF

    keys = spark.range(0, 1000).selectExpr("xxhash64(id) AS url_hash")
    blobs = CF.build_cuckoo_blobs(keys, capacity_per_bucket=256)
    probed = CF.probe_cuckoo_blobs(spark.range(0, 500).selectExpr("xxhash64(id*7) AS url_hash"), blobs)
    plan = spark._jvm.PythonSQLUtils.explainString(
        probed._jdf.queryExecution(), "formatted"
    )
    assert "ArrowEvalPython" in plan  # vectorized, not row-at-a-time
    assert "BatchEvalPython" not in plan
    # candidate side: no exchange at all — the probe is purely map-side
    assert "Exchange" not in plan, plan


def test_cachefilter_update_single_cogroup_exchange_pair(spark):
    """A blob update is ONE cogroup: one hash exchange per side on
    bucket_id, the Arrow cogroup UDF, nothing else."""
    from crawler_ai_spark.operators import cachefilter as CF

    keys = spark.range(0, 1000).selectExpr("xxhash64(id) AS url_hash")
    blobs = CF.build_cuckoo_blobs(keys, capacity_per_bucket=256)
    upd = CF.update_cuckoo_blobs(
        blobs,
        spark.range(0, 100).selectExpr("xxhash64(id*3) AS url_hash"),
        op="insert_if_absent",
        capacity_per_bucket=256,
    )
    plan = spark._jvm.PythonSQLUtils.explainString(
        upd._jdf.queryExecution(), "formatted"
    )
    assert "FlatMapCoGroupsInPandas" in plan or "CoGroup" in plan
    n_exchanges = plan.count("hashpartitioning(")
    assert n_exchanges <= 4, f"update plan has {n_exchanges} hash exchanges"


def test_live_robots_fetch_single_exchange_per_host_stage(spark):
    """fetch_robots = one groupBy(host) for the exemplar origin, then the
    single host-hash exchange of the fetch stage — no extra shuffles, no
    row-at-a-time Python."""
    from crawler_ai_spark.sources.fetch import SyntheticTransport
    from crawler_ai_spark.sources.robots import fetch_robots

    frontier = spark.range(0, 200).selectExpr(
        "concat('https://h', id % 9, '.example/p/', id) AS url",
        "concat('h', id % 9, '.example') AS host",
    )
    robots = fetch_robots(frontier, SyntheticTransport(), host_partitions=4)
    plan = spark._jvm.PythonSQLUtils.explainString(
        robots._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in plan
    n_exchanges = plan.count("Exchange")
    assert n_exchanges <= 4, f"fetch_robots plan has {n_exchanges} exchanges"


def test_host_rank_is_pure_jvm_bounded_exchanges(spark):
    """Power iteration stays JVM-side (sorted-fold aggregate, no pandas)
    and plan size grows linearly in K: each step is one rank join + one
    inflow aggregation over the re-derived edge subtree (callers persist
    edges at scale; Spark ReusedExchange covers the rest at runtime).
    A superlinear exchange count would mean accidental plan blowup."""
    plan = _plan(spark, "host_rank")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan
    from crawler_ai_spark.queries.crawl import _HR_ITERS

    assert plan.count(") Exchange") <= 7 * _HR_ITERS


def test_rank_budget_schedule_broadcasts_budgets(spark):
    """The 37-row budget table must reach the frontier via broadcast (the
    frontier side is the big one at scale), and the whole chain stays
    JVM-side with no cartesian."""
    plan = _plan(spark, "rank_budget_schedule")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan
    assert "BroadcastHashJoin" in plan


@pytest.mark.parametrize("name", sorted(C.QUERIES))
def test_catalog_has_no_row_python_udf(spark, name):
    """Catalog-wide guard on the 10-100× silent tax: NO query may plan a
    row-at-a-time Python UDF (BatchEvalPython). Python is allowed only
    Arrow-batched (ArrowEvalPython / mapInPandas) — the fixed-list guard
    above protects specific shapes; this sweep protects every query that
    will ever be added."""
    plan = _plan(spark, name)
    assert "BatchEvalPython" not in plan, name
