"""Corpus-level curation operators for a 100 TB training-data pipeline:
cross-document boilerplate line removal, benchmark decontamination,
within-document repetition metrics, and deterministic stratified sampling.

These generalize the reference's per-page cleanups — nav/footer slot
stripping (app/utils/extract_job_info.py link slots), duplicate-title
suppression (job_extraction_service.py `_deduplicate_jobs_by_title`) —
into the corpus-scale forms a web-text pipeline needs (C4 / RefinedWeb /
Gopher style). Everything here is JVM column expressions (no Python in
the data path) so the plans stay inside whole-stage codegen and every
operator carries a DuckDB oracle in the catalog.

Scale notes (the shapes that survive 100 TB):
- line-dedup's boilerplate probe is SIZE-GATED (see line_dedup's
  boiler_join): AQE broadcasts the removal set when its runtime size
  fits, and falls back to a shuffled anti-join when it doesn't — at
  min_df=2 on a real web corpus the set is NOT small, so a forced
  broadcast would OOM; the df-count aggregation and per-doc regroup
  shuffle short rows;
- decontamination broadcasts the benchmark n-gram set (benchmarks are
  KBs-to-MBs against a TB corpus) so the probe is map-side;
- repetition metrics and sampling are map-only: zero shuffles, and the
  sampling key is a content-independent md5 so re-sampling at a new rate
  never re-reads more than the id column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crawler_ai_spark.pipeline.textstats import fingerprint, norm_text, quality_score

# non-overlapping token-window size used to synthesize "lines" — the
# testdata corpus is single-line text, so line structure is derived
# deterministically from token positions (identically in the oracles)
LINE_TOKENS = 8

# decontamination n-gram width (overlapping windows)
DECONTAM_N = 8


def _toks(text: Column) -> Column:
    return F.split(norm_text(text), " ")


def line_windows(text: Column, n: int = LINE_TOKENS) -> Column:
    """array<string> of consecutive non-overlapping n-token windows of the
    normalized text (last window may be partial). Empty text -> []."""
    toks = _toks(text)
    n_tok = F.when(F.length(norm_text(text)) == 0, F.lit(0)).otherwise(F.size(toks))
    n_win = F.floor((n_tok - 1) / n) + 1
    return F.when(
        n_tok > 0,
        F.transform(
            F.sequence(F.lit(0), (n_win - 1).cast("int")),
            lambda i: F.array_join(F.slice(toks, i * n + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def ngram_windows(text: Column, n: int = DECONTAM_N) -> Column:
    """array<string> of OVERLAPPING n-token windows (stride 1), distinct.
    Shorter-than-n docs contribute their whole token run as one gram."""
    toks = _toks(text)
    n_tok = F.when(F.length(norm_text(text)) == 0, F.lit(0)).otherwise(F.size(toks))
    full = F.transform(
        F.sequence(F.lit(1), (n_tok - n + 1).cast("int")),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    short = F.array(F.array_join(toks, " "))
    return F.when(n_tok >= n, F.array_distinct(full)).otherwise(
        F.when(n_tok > 0, short).otherwise(F.array().cast("array<string>"))
    )


def exploded_lines(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, line_idx, line) — one row per synthesized line."""
    return docs.select(
        "doc_id", F.posexplode(line_windows(F.col(text_col))).alias("line_idx", "line")
    )


def boilerplate_lines(lines: DataFrame, min_df: int = 2) -> DataFrame:
    """Lines appearing in >= min_df DISTINCT documents — the removal set.

    One shuffle, on the line text (at 100 TB you shuffle xxhash64(line)
    and keep one exemplar; the md5-free form here keeps the DuckDB oracle
    exact). High-df lines are by definition few relative to corpus rows,
    so the result broadcasts."""
    return (
        lines.groupBy("line")
        .agg(F.countDistinct("doc_id").alias("doc_freq"))
        .filter(F.col("doc_freq") >= min_df)
    )


def line_dedup(
    docs: DataFrame,
    min_df: int = 2,
    text_col: str = "text",
    boiler_join: str = "auto",
) -> DataFrame:
    """RefinedWeb-style cross-document boilerplate removal: drop EVERY
    occurrence of any line whose document frequency >= min_df, reassemble
    the survivors in order.

    Returns (doc_id, clean_text, n_lines, n_removed) for every input doc
    (fully-boilerplate docs come back with clean_text = '').

    Plan: two independent explode passes over the (column-pruned) source
    — deliberately NOT cached: caching the exploded corpus pins O(corpus)
    rows in executor storage at 100 TB, while recomputing a map-side
    explode from a pruned parquet scan is nearly free. Pass 1 shuffles
    only (line, doc_id-distinct) short rows for the df count; pass 2
    probes the boilerplate set and regroups survivors (the only wide text
    shuffle). n_lines is computed map-side from the window array — no
    third pass, no shuffle. The source is hash-spread on doc_id when it
    arrives under-partitioned (a no-op on a real many-split corpus) so
    the tokenize+window scan parallelizes.

    boiler_join sizes the removal-set probe — the set is NOT small by
    construction (at min_df=2 on a real web corpus, every line occurring
    twice qualifies: billions of rows at 100 TB):
      - "auto" (default): no hint; AQE plans the anti-join from the
        removal set's RUNTIME size — broadcast-hash when it fits under
        spark.sql.autoBroadcastJoinThreshold, shuffle join when it
        doesn't. This is the seen.py size-gated switch expressed
        declaratively (operators/seen.py BROADCAST_BLOOM_MAX_BYTES does
        the same gate imperatively for driver-collected blobs).
      - "broadcast": force map-side probe — only when the caller KNOWS
        the set is bounded (e.g. min_df scaled with corpus size so only
        true sitewide boilerplate qualifies).
      - "shuffle": force a shuffled anti-join — the 100 TB-safe bound;
        at that scale also raise min_df so the pass removes boilerplate
        rather than re-implementing exact dedup line-wise."""
    from crawler_ai_spark.session import spread_to_cores

    if boiler_join not in ("auto", "broadcast", "shuffle"):
        raise ValueError(f"boiler_join must be auto|broadcast|shuffle, got {boiler_join!r}")
    docs = spread_to_cores(docs, "doc_id")
    boiler = boilerplate_lines(exploded_lines(docs, text_col), min_df=min_df)
    if boiler_join == "broadcast":
        boiler = F.broadcast(boiler)
    elif boiler_join == "shuffle":
        boiler = boiler.hint("shuffle_hash")
    kept = exploded_lines(docs, text_col).join(boiler, "line", "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("line_idx", "line"))),
                lambda s: s["line"],
            ),
            " ",
        ).alias("clean_text"),
        F.count("*").alias("n_kept"),
    )
    totals = docs.select(
        "doc_id", F.size(line_windows(F.col(text_col))).alias("n_lines")
    )
    out = (
        totals.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_lines", F.lit(0)).cast("long").alias("n_lines"),
            (F.coalesce("n_lines", F.lit(0)) - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )
    return out


def decontaminate(
    docs: DataFrame, benchmark_grams: DataFrame, n: int = DECONTAM_N,
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag docs sharing any n-token gram with
    an eval benchmark (the standard pre-training hygiene step).

    `benchmark_grams` must have a single `gram` column; it is broadcast
    (benchmarks are tiny next to the corpus), so the probe adds no
    shuffle — the only wide stage is the per-doc hit count, which moves
    (doc_id, gram-hit) rows only.

    Returns (doc_id, n_hits, contaminated) for every doc."""
    from crawler_ai_spark.session import spread_to_cores

    docs = spread_to_cores(docs, "doc_id")
    grams = docs.select(
        "doc_id", F.explode(ngram_windows(F.col(text_col), n)).alias("gram")
    )
    bench = benchmark_grams.select("gram").distinct()
    hits = (
        grams.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def bigram_windows(text: Column) -> Column:
    """array<string> of overlapping token bigrams ([] under 2 tokens)."""
    toks = _toks(text)
    n_tok = F.when(F.length(norm_text(text)) == 0, F.lit(0)).otherwise(F.size(toks))
    return F.when(
        n_tok >= 2,
        F.transform(
            F.sequence(F.lit(1), (n_tok - 1).cast("int")),
            lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_metrics(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style within-document repetition metrics:

    - dup_line_ratio: fraction of synthesized lines that are repeats of
      another line in the same doc (1 - distinct/total);
    - dup_bigram_ratio: same over overlapping token bigrams;
    - top_bigram_ratio: occurrences of the single most frequent bigram /
      total bigrams (Gopher's top-2-gram fraction, count-based);
    - repetitive: the gate (dup_line_ratio > 0.30 OR top_bigram_ratio
      > 0.18 — the Gopher-paper neighborhood).

    Returns (doc_id, n_lines, n_bigrams, dup_line_ratio,
    dup_bigram_ratio, top_bigram_ratio, repetitive) for every doc.

    Shape: line metrics stay map-side (array ops are JVM-native); the
    top/distinct bigram counts go explode -> partial-agg count (doc_id,
    bigram) -> per-doc fold, entirely inside whole-stage codegen. The
    per-row alternatives lose: a distinct x contains scan is O(n^2)
    interpreted lambdas, and even a sorted run-length HOF fold evaluates
    interpreted at ~ms per kilotoken doc (~50x slower than this shuffle
    of short pre-combined rows). doc_id is the shuffle key — unskewed by
    construction."""
    from crawler_ai_spark.session import spread_to_cores

    docs = spread_to_cores(docs, "doc_id")
    text = F.col(text_col)
    lines = line_windows(text)
    n_lines = F.size(lines)
    safe_lines = F.greatest(n_lines, F.lit(1)).cast("double")
    # ratio gated on n_lines > 0: an empty doc has no repetition (the
    # ungated 1 - 0/1 form would flag every empty doc repetitive)
    dup_line = F.when(
        n_lines > 0,
        F.round(F.lit(1.0) - F.size(F.array_distinct(lines)) / safe_lines, 6),
    ).otherwise(0.0)
    line_side = docs.select(
        "doc_id",
        n_lines.cast("long").alias("n_lines"),
        dup_line.alias("dup_line_ratio"),
        F.size(bigram_windows(text)).cast("long").alias("n_bigrams"),
    )
    bg_counts = (
        docs.select("doc_id", F.explode(bigram_windows(text)).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_distinct_bg"),
            F.max("cnt").alias("top_bg"),
        )
    )
    safe_bg = F.greatest(F.col("n_bigrams"), F.lit(1)).cast("double")
    has_bg = F.col("n_bigrams") > 0
    dup_bg = F.when(
        has_bg,
        F.round(F.lit(1.0) - F.coalesce("n_distinct_bg", F.lit(0)) / safe_bg, 6),
    ).otherwise(0.0)
    top_ratio = F.when(
        has_bg, F.round(F.coalesce("top_bg", F.lit(0)) / safe_bg, 6)
    ).otherwise(0.0)
    return line_side.join(bg_counts, "doc_id", "left").select(
        "doc_id",
        "n_lines",
        "n_bigrams",
        "dup_line_ratio",
        dup_bg.alias("dup_bigram_ratio"),
        top_ratio.alias("top_bigram_ratio"),
        ((F.col("dup_line_ratio") > 0.30) | (top_ratio > 0.18)).alias("repetitive"),
    )


# deterministic sampling: bucket by size band, keep when the md5-derived
# hex key falls under the bucket's threshold. Rates are exact binary
# fractions of the 16-bit keyspace so the hex-string compare is exact.
SAMPLE_SALT = "corpus-v1"
SAMPLE_BUCKETS: tuple[tuple[str, int, str | None], ...] = (
    # (bucket, min_tokens, keep-threshold hex over 4 hex chars; None = keep all)
    ("long", 70, None),       # rate 1.0
    ("mid", 40, "8000"),      # rate 0.5
    ("short", 0, "2000"),     # rate 0.125
)


def sample_key(doc_id: Column) -> Column:
    """Content-independent, engine-portable sampling key: first 4 hex
    chars of md5(doc_id:salt). Lowercase-hex string order == numeric
    order, so thresholding is an exact binary fraction in any engine."""
    return F.substring(
        F.md5(F.concat_ws(":", doc_id.cast("string"), F.lit(SAMPLE_SALT))), 1, 4
    )


def stratified_sample(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic stratified downsampling by size band: long docs kept
    whole, mid at 1/2, short at 1/8 (the quality-weighted mixing move a
    data-recipe pipeline makes before tokenization). Map-only — no
    shuffle, no RNG; the same doc_id always lands the same way, so
    corpus builds are reproducible and resumable by construction."""
    toks = _toks(F.col(text_col))
    n_tok = F.when(F.length(norm_text(F.col(text_col))) == 0, F.lit(0)).otherwise(
        F.size(toks)
    )
    bucket = (
        F.when(n_tok >= SAMPLE_BUCKETS[0][1], F.lit("long"))
        .when(n_tok >= SAMPLE_BUCKETS[1][1], F.lit("mid"))
        .otherwise(F.lit("short"))
    )
    key = sample_key(F.col("doc_id"))
    keep = (
        F.when(bucket == "long", F.lit(True))
        .when(bucket == "mid", key < SAMPLE_BUCKETS[1][2])
        .otherwise(key < SAMPLE_BUCKETS[2][2])
    )
    return docs.select(
        "doc_id",
        bucket.alias("bucket"),
        key.alias("sample_key"),
        n_tok.cast("long").alias("n_tokens"),
    ).filter(keep)


# per-source sampling tiers derived from the rollup: (tier, rate,
# keep-threshold over the 4-hex sample keyspace; None = keep all)
SOURCE_TIERS: tuple[tuple[str, float, str | None], ...] = (
    ("full", 1.0, None),
    ("half", 0.5, "8000"),
    ("eighth", 0.125, "2000"),
)


def source_rollup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Domain-level curation rollup (the FineWeb/CCNet move: judge the
    SOURCE, not just the document): per source, doc/token counts, mean
    quality score, within-source exact-duplicate rate, and the derived
    sampling tier —

        full   : mean_quality >= 0.55 and dup_rate <= 0.20
        half   : mean_quality >= 0.40 and dup_rate <= 0.50
        eighth : everything else

    Returns (source, n_docs, tokens_total, mean_quality, dup_rate, tier).

    One partial-agg shuffle keyed on source; the dup count is
    count - approx-free countDistinct(fingerprint), which Spark plans as
    a two-phase expand + partial agg (no second scan). Source keys are
    Zipf-skewed on a real web corpus — AQE's skew-split handles the
    giant-host partition, and nothing here collects to the driver."""
    t = F.col(text_col)
    toks = _toks(t)
    n_tok = F.when(F.length(norm_text(t)) == 0, F.lit(0)).otherwise(F.size(toks))
    per = docs.select(
        "source",
        quality_score(t).alias("q"),
        fingerprint(t).alias("fp"),
        n_tok.alias("n_tokens"),
    )
    agg = per.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("tokens_total"),
        # 4 dp, not 6: the mean of per-doc doubles is summation-order
        # sensitive in the last ulps (Spark partial aggs vs a single-pass
        # oracle); 4 dp is far above that noise and far below the tier
        # threshold spacing
        F.round(F.avg("q"), 4).alias("mean_quality"),
        (F.count("*") - F.countDistinct("fp")).cast("long").alias("n_dup_docs"),
    )
    dup_rate = F.round(F.col("n_dup_docs") / F.greatest(F.col("n_docs"), F.lit(1)), 6)
    tier = (
        F.when(
            (F.col("mean_quality") >= 0.55) & (dup_rate <= 0.20), F.lit("full")
        )
        .when((F.col("mean_quality") >= 0.40) & (dup_rate <= 0.50), F.lit("half"))
        .otherwise(F.lit("eighth"))
    )
    return agg.select(
        "source",
        "n_docs",
        "tokens_total",
        "mean_quality",
        dup_rate.alias("dup_rate"),
        tier.alias("tier"),
    )


def source_filter(docs: DataFrame, rollup: DataFrame) -> DataFrame:
    """Apply the per-source tier back to documents: keep each doc when its
    content-independent sample key falls under its source's rate
    threshold (full sources keep everything). The rollup is one row per
    source — BROADCAST, so the apply pass is map-side with zero shuffle
    of the corpus.

    Returns (doc_id, source, tier, sample_key) for kept docs only."""
    rates = {name: thr for name, _, thr in SOURCE_TIERS}
    key = sample_key(F.col("doc_id"))
    tier = F.col("tier")
    keep = (
        F.when(tier == "full", F.lit(True))
        .when(tier == "half", key < rates["half"])
        .otherwise(key < rates["eighth"])
    )
    return (
        docs.select("doc_id", "source")
        .join(F.broadcast(rollup.select("source", "tier")), "source")
        .select("doc_id", "source", tier.alias("tier"), key.alias("sample_key"))
        .filter(keep)
    )


def incremental_ingest(
    incoming: DataFrame, existing: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Cross-snapshot dedup: tag each incoming doc as new iff its content
    fingerprint is absent from the existing corpus AND it is the first
    occurrence within its own batch (first = lowest doc_id, the
    reference's keep-first convention). The standard ingestion gate that
    keeps a growing corpus append-only without re-deduping history.

    Returns (doc_id, fingerprint, is_new) for every incoming doc.

    Plan: both sides project to (fingerprint[, doc_id]) before the join —
    md5 keys are uniform, so the shuffle is skew-free and moves 16-byte
    keys, never text. The within-batch first-wins is one window on the
    same key (co-partitioned with the join shuffle). At 100 TB the
    existing side is a fingerprint column read off the corpus table
    (column-pruned scan), and a bloom pre-filter (operators/seen.py) can
    drop the obvious non-members map-side first."""
    inc = incoming.select("doc_id", fingerprint(F.col(text_col)).alias("fingerprint"))
    seen = existing.select(fingerprint(F.col(text_col)).alias("fingerprint")).distinct()
    from pyspark.sql import Window

    first_in_batch = F.row_number().over(
        Window.partitionBy("fingerprint").orderBy("doc_id")
    )
    flagged = (
        inc.join(seen.withColumn("known", F.lit(True)), "fingerprint", "left")
        .withColumn("rn", first_in_batch)
        .select(
            "doc_id",
            "fingerprint",
            (F.col("known").isNull() & (F.col("rn") == 1)).alias("is_new"),
        )
    )
    return flagged


# training-window width for sequence packing (sandbox-sized; a real run
# passes 2048/4096/8192)
PACK_WINDOW = 128

# end-of-document separator token appended to every doc's token stream
EOD_TOKEN = "<|eod|>"


def _pack_spans(
    docs: DataFrame,
    window: int,
    text_col: str,
    with_stream: bool,
    sub_shard_docs: int | None = None,
) -> DataFrame:
    """Shared packing core: per-shard running token offsets (one shuffle
    on the shard key — only the length column crosses the exchange when
    ``with_stream`` is False, Catalyst projects doc_len below it) then a
    map-side explode to one row per (doc x window it overlaps), with the
    [doc_from, doc_to) token subrange. ``with_stream`` additionally
    carries the doc's token stream (tokens + EOD) so callers can slice
    pieces map-side.

    ``sub_shard_docs`` is the hot-shard pre-split: with a Zipf-skewed
    ``source``, a single per-source window puts the biggest source's
    whole token stream through one task. Setting it buckets each source
    into CONTIGUOUS doc_id ranges (_sub = floor(doc_id / stride) — order
    -preserving, so sub-shards concatenate back in doc_id order), runs
    the running sum per (source, _sub), and stitches exact global
    offsets with a second window over the per-sub-shard TOTALS — rows
    numbering n_sources x n_subshards, negligible. Catalyst prunes the
    totals branch down to an independent partial-aggregated pass over
    the column-pruned scan (its exchange carries only (source, _sub,
    total) rows — nothing corpus-sized shuffles twice), and the stitched
    bases broadcast back. Offsets are integer sums: bit-identical to the
    single-window form (pinned by tests/test_corpus.py on a Zipf
    fixture)."""
    from pyspark.sql import Window as W

    t = F.col(text_col)
    toks = F.when(
        F.length(norm_text(t)) == 0, F.array().cast("array<string>")
    ).otherwise(_toks(t))
    stream = F.concat(toks, F.array(F.lit(EOD_TOKEN)))
    doc_len = F.size(stream).cast("long")
    cols = [
        "source",
        "doc_id",
        doc_len.alias("doc_len"),
    ]
    if with_stream:
        cols.append(stream.alias("stream"))

    if sub_shard_docs is None:
        w = W.partitionBy("source").orderBy("doc_id").rowsBetween(
            W.unboundedPreceding, -1
        )
        off = F.coalesce(F.sum(doc_len).over(w), F.lit(0)).cast("long")
        base = docs.select(*cols, off.alias("global_offset"))
    else:
        sub = F.floor(F.col("doc_id") / sub_shard_docs).cast("long")
        pre = docs.select(*cols, sub.alias("_sub"))
        w_local = W.partitionBy("source", "_sub").orderBy("doc_id").rowsBetween(
            W.unboundedPreceding, -1
        )
        local = pre.withColumn(
            "_local_off",
            F.coalesce(F.sum("doc_len").over(w_local), F.lit(0)).cast("long"),
        )
        totals = local.groupBy("source", "_sub").agg(
            F.sum("doc_len").alias("_sub_total")
        )
        w_base = W.partitionBy("source").orderBy("_sub").rowsBetween(
            W.unboundedPreceding, -1
        )
        bases = totals.select(
            "source",
            "_sub",
            F.coalesce(F.sum("_sub_total").over(w_base), F.lit(0))
            .cast("long")
            .alias("_sub_base"),
        )
        base = (
            local.join(F.broadcast(bases), ["source", "_sub"])
            .withColumn(
                "global_offset", (F.col("_sub_base") + F.col("_local_off")).cast("long")
            )
            .drop("_sub", "_local_off", "_sub_base")
        )
    first_w = F.floor(F.col("global_offset") / window)
    last_w = F.floor((F.col("global_offset") + F.col("doc_len") - 1) / window)
    spanned = base.withColumn(
        "window_id", F.explode(F.sequence(first_w, last_w))
    ).withColumn("window_id", F.col("window_id").cast("long"))
    doc_from = F.greatest(
        F.lit(0).cast("long"), F.col("window_id") * window - F.col("global_offset")
    )
    doc_to = F.least(
        F.col("doc_len"), (F.col("window_id") + 1) * window - F.col("global_offset")
    )
    return spanned.withColumns(
        {"doc_from": doc_from, "doc_to": doc_to}
    )


def pack_sequences(
    docs: DataFrame,
    window: int = PACK_WINDOW,
    text_col: str = "text",
    sub_shard_docs: int | None = None,
) -> DataFrame:
    """GPT-style concat-and-chunk sequence packing manifest: within each
    source shard, documents are concatenated in doc_id order (one
    end-of-document separator token each) and the token stream is cut
    into fixed ``window``-token training windows. Emits one row per
    (document x window it overlaps):

        (source, window_id, doc_id, doc_from, doc_to, global_offset)

    where [doc_from, doc_to) is the token subrange of the doc landing in
    that window and global_offset is the doc's position in the shard
    stream — everything a tokenizer-side writer needs to materialize
    packed examples without re-scanning.

    Plan: one running-sum window per (source, doc_id-order) — a single
    shuffle on the shard key — then a map-side explode over the spanned
    window ids. Real pipelines pack per input shard, so the partition
    key is the shard id (unskewed by construction); for a Zipf-skewed
    `source`, pass ``sub_shard_docs`` to pre-split hot sources into
    contiguous doc_id-range sub-shards whose offsets are stitched by a
    tiny second window over per-sub-shard totals (bit-identical output —
    see _pack_spans)."""
    return _pack_spans(
        docs, window, text_col, with_stream=False, sub_shard_docs=sub_shard_docs
    ).select("source", "window_id", "doc_id", "doc_from", "doc_to", "global_offset")


def pack_windows(
    docs: DataFrame,
    window: int = PACK_WINDOW,
    text_col: str = "text",
    sub_shard_docs: int | None = None,
) -> DataFrame:
    """Materialized packed training windows: the actual ``window``-token
    examples `pack_sequences` describes, one row per (source, window_id)
    with the concatenated token text and its token count. Every window
    except a shard's last is exactly ``window`` tokens.

    Plan: the span core's single offset shuffle (here the token stream
    rides along — one corpus-sized exchange), map-side piece slicing,
    then one (source, window_id) aggregation whose shuffle carries each
    token exactly once (pieces partition the stream; no duplication).
    Two corpus-sized exchanges total — the same cost as a global
    sort-and-rechunk, with no driver involvement. Ordered reassembly is
    a sort_array over (doc_id, piece) structs inside the agg, not a
    window, so the agg stays partial-aggregatable. ``sub_shard_docs``
    pre-splits hot sources exactly as in pack_sequences."""
    spanned = _pack_spans(
        docs, window, text_col, with_stream=True, sub_shard_docs=sub_shard_docs
    )
    piece = F.slice(
        F.col("stream"),
        (F.col("doc_from") + 1).cast("int"),
        (F.col("doc_to") - F.col("doc_from")).cast("int"),
    )
    pieces = spanned.select(
        "source",
        "window_id",
        F.struct(F.col("doc_id"), piece.alias("piece")).alias("part"),
    )
    ordered = F.flatten(
        F.transform(
            F.sort_array(F.collect_list("part")), lambda s: s.getField("piece")
        )
    )
    return pieces.groupBy("source", "window_id").agg(
        F.array_join(ordered, " ").alias("window_text"),
        F.size(ordered).cast("long").alias("n_tokens"),
    )


# deterministic global corpus shuffle: shard count for the sandbox (a
# real run passes the target output-file count, e.g. 10k-100k shards)
SHUFFLE_SHARDS = 8
SHUFFLE_SALT = "shuffle-v1"


def shuffle_shards(docs: DataFrame, n_shards: int = SHUFFLE_SHARDS) -> DataFrame:
    """Deterministic global corpus shuffle (the decorrelation pass before
    training: adjacent docs must not share a crawl host/snapshot). Each
    doc gets a content-independent md5 shuffle key; the key's first 4 hex
    digits pick one of ``n_shards`` output shards and the full key orders
    docs within the shard:

        (shard_id, position, doc_id, shuffle_key)

    RNG-free and reproducible — re-running on the same corpus (or a
    grown corpus: existing docs keep their key, hence their shard) gives
    the same layout, so shuffles are resumable and auditable.

    Plan: map-side key + shard assignment, then ONE shuffle on shard_id
    (uniform by construction — md5 keys are unskewed regardless of how
    skewed doc_ids or sources are) for the within-shard row_number. At
    100 TB the writer form is `repartition(n_shards, shard_id)` +
    `sortWithinPartitions(shuffle_key)` — identical layout, no window —
    with n_shards sized so a shard fits an executor's sort buffer."""
    from pyspark.sql import Window as W

    key = F.md5(
        F.concat_ws(":", F.col("doc_id").cast("string"), F.lit(SHUFFLE_SALT))
    )
    shard = (
        F.conv(F.substring(key, 1, 4), 16, 10).cast("long") % n_shards
    ).alias("shard_id")
    keyed = docs.select(shard, F.col("doc_id"), key.alias("shuffle_key"))
    pos = F.row_number().over(
        W.partitionBy("shard_id").orderBy("shuffle_key", "doc_id")
    )
    return keyed.select(
        "shard_id",
        pos.cast("long").alias("position"),
        "doc_id",
        "shuffle_key",
    )


def lm_bigram_score(docs: DataFrame, text_col: str = "text", k: float = 1.0) -> DataFrame:
    """CCNet-style corpus-LM quality signal (Wenzek et al. 2019 score by
    LM perplexity; here the LM is an add-k-smoothed bigram model trained
    on the corpus ITSELF, in the same plan): every doc gets the mean
    log2 p(w2|w1) over its token bigrams, where
    p(w2|w1) = (c(w1 w2) + k) / (c(w1) + k·V).

    Gibberish, boilerplate-free OCR noise and wrong-language docs score
    far below fluent in-distribution text — the standard curation cut.

    Scale shape: unigram and bigram count tables are one partial-agg
    shuffle each on the token/bigram key; each doc's bigrams then join
    the count tables on those same keys (plain shuffle joins — at web
    scale the count tables dwarf the broadcast threshold, and AQE picks
    broadcast automatically when they don't); V rides in as a one-row
    broadcast. No driver collect, no window.
    """
    t = F.col(text_col)
    n_tok = F.when(F.length(norm_text(t)) == 0, F.lit(0)).otherwise(F.size(_toks(t)))
    base = docs.select(
        "doc_id",
        F.when(n_tok > 0, _toks(t)).otherwise(F.array().cast("array<string>")).alias("toks"),
    )
    uni = (
        base.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c1"))
    )
    vocab = uni.agg(F.count("*").alias("v"))
    bi = base.select(
        "doc_id", F.explode(bigram_windows_from_toks(F.col("toks"))).alias("bg")
    ).select(
        "doc_id",
        F.col("bg"),
        F.split(F.col("bg"), " ").getItem(0).alias("w1"),
    )
    bic = bi.groupBy("bg").agg(F.count("*").alias("c12"))
    scored = (
        bi.join(bic, "bg")
        .join(uni.withColumnRenamed("tok", "w1"), "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.round(
                F.avg(
                    F.log2(
                        (F.col("c12") + F.lit(k))
                        / (F.col("c1") + F.lit(k) * F.col("v"))
                    )
                ),
                4,
            ).alias("lm_score"),
        )
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            "lm_score",
        )
    )


def bigram_windows_from_toks(toks: Column) -> Column:
    """bigram_windows, but over an already-materialized token array (the
    LM scorer reuses one tokenization for unigrams and bigrams)."""
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), (n - 1).cast("int")),
            lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def lm_buckets(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """CCNet-style per-language quality buckets (Wenzek et al. 2019 §4.3):
    each language's documents split into head / middle / tail thirds by
    LM score (lm_bigram_score — higher = more fluent), the split CCNet
    feeds to downstream sampling (train on head+middle, drop tail).

    Scale shape: the only windows run at (language, DISTINCT rounded
    score) grain — bounded by score cardinality (round(4) over a ~[-30,0]
    range), never by corpus size, so no per-language mega-partition
    exists even when one language dominates a 100 TB corpus. Bucket
    assignment is an integer rule on cumulative doc counts
    (cum_incl·3 ≤ n → head, ≤ 2n → middle, else tail): a score group is
    never split, matching CCNet's threshold-based cut, and the verdict is
    bit-identical across engines. Docs too short to score (NULL lm_score)
    sort last and land in tail."""
    from pyspark.sql import Window as W

    from crawler_ai_spark.pipeline.textstats import lang_id

    t = F.col(text_col)
    scored = lm_bigram_score(docs, text_col)
    j = (
        docs.select("doc_id", lang_id(t).alias("lang_pred"))
        .join(scored, "doc_id")
        .withColumn("_sk", F.coalesce(F.col("lm_score"), F.lit(-1e9)))
    )
    sc = j.groupBy("lang_pred", "_sk").agg(F.count("*").alias("_c"))
    w_cum = (
        W.partitionBy("lang_pred")
        .orderBy(F.col("_sk").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_all = W.partitionBy("lang_pred")
    cum = sc.withColumn("_cum", F.sum("_c").over(w_cum)).withColumn(
        "_n", F.sum("_c").over(w_all)
    )
    bucket = (
        F.when(F.col("_cum") * 3 <= F.col("_n"), F.lit("head"))
        .when(F.col("_cum") * 3 <= F.col("_n") * 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        j.join(cum.select("lang_pred", "_sk", bucket.alias("lm_bucket")),
               ["lang_pred", "_sk"])
        .select("doc_id", "lang_pred", "lm_score", "n_bigrams", "lm_bucket")
    )


# ---------------------------------------------------------------------------
# C4 cleaning (Raffel et al. 2020, "Exploring the Limits of Transfer
# Learning…", §2.2) — the published line- and page-level heuristics that
# produced C4 from Common Crawl, as pure-JVM columns.
# ---------------------------------------------------------------------------

# a kept line ends in terminal punctuation (optionally a closing quote)
_C4_TERMINAL_RX = "[.!?][\"'”]?$"
_C4_SENTENCE_RX = "[.!?]"
C4_MIN_LINE_WORDS = 5
C4_MIN_SENTENCES = 3


def c4_line_columns(text: Column) -> dict[str, Column]:
    """C4's rules as integer-count columns: keep a line iff it ends in
    terminal punctuation AND has ≥ 5 words; drop the whole page if the
    kept text has < 3 sentences, mentions "lorem ipsum", or contains a
    curly brace (code). All array/regexp expressions — map-side, no
    shuffle, and every predicate is an integer comparison so the verdict
    is bit-identical across engines."""
    lines = F.split(text, "\n")
    kept = F.filter(
        lines,
        lambda ln: F.rtrim(ln).rlike(_C4_TERMINAL_RX)
        & (
            F.size(F.split(F.trim(ln), r"\s+"))
            >= F.lit(C4_MIN_LINE_WORDS)
        )
        & (F.trim(ln) != ""),
    )
    cleaned = F.array_join(F.transform(kept, F.trim), "\n")
    n_sentences = F.size(
        F.regexp_extract_all(cleaned, F.lit(_C4_SENTENCE_RX), F.lit(0))
    ).cast("long")
    low = F.lower(F.coalesce(text, F.lit("")))
    has_lorem = low.contains("lorem ipsum")
    has_brace = low.contains("{")
    keep = (
        (n_sentences >= C4_MIN_SENTENCES) & ~has_lorem & ~has_brace
    )
    return {
        "n_lines": F.size(lines).cast("long"),
        "n_kept_lines": F.size(kept).cast("long"),
        "n_sentences": n_sentences,
        "has_lorem": has_lorem,
        "has_brace": has_brace,
        "c4_keep": keep,
        "c4_text": F.when(keep, cleaned),
    }


def sentence_span_dedup(
    docs: DataFrame, text_col: str = "text", span: int = 3
) -> DataFrame:
    """C4's cross-document three-sentence-span dedup at span grain: split
    each doc into sentences, slide a `span`-sentence window, hash it, and
    keep only the globally FIRST occurrence (min doc_id, then min
    position — deterministic, matching the ordered single pass C4
    describes). Returns (doc_id, span_pos, span_hash, is_kept).

    Scale shape: posexplode is map-side; the only shuffle is one
    aggregation keyed by span_hash (64-bit xxhash), the same
    fingerprint-grain exchange as exact dedup — never all-pairs. At
    100 TB the span table is ~sentences-per-doc × docs rows of 3 small
    columns; AQE handles the hash-key skew of boilerplate spans."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    # sentence split on terminal punctuation keeping it attached:
    # split AFTER [.!?] runs — a lookbehind-free split via regexp
    sentences = F.filter(
        # the replacement needs a REAL newline char ("$1\n" non-raw):
        # Java's replacement syntax would read a raw backslash-n as 'n'
        F.split(F.regexp_replace(t, r"([.!?])\s+", "$1\n"), "\n"),
        lambda s: F.trim(s) != "",
    )
    n = F.size(sentences)
    spans = F.when(
        n >= span,
        F.transform(
            F.sequence(F.lit(0), n - span),
            lambda i: F.array_join(
                F.slice(sentences, i + 1, span), " "
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    exploded = docs.select(
        "doc_id", F.posexplode(spans).alias("span_pos", "_span")
    ).select("doc_id", "span_pos", F.xxhash64("_span").alias("span_hash"))
    from pyspark.sql import Window as W

    w = W.partitionBy("span_hash").orderBy("doc_id", "span_pos")
    return exploded.withColumn(
        "is_kept", F.row_number().over(w) == 1
    )


def decontaminate_fuzzy(
    docs: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    bench_id_col: str = "bench_id",
) -> DataFrame:
    """NEAR-DUP benchmark decontamination — the fuzzy complement to
    ``decontaminate``'s exact n-gram probe: flag corpus docs whose
    n-shingle Jaccard against ANY benchmark doc reaches ``threshold``
    (catches paraphrased/partially-copied eval material that shares no
    long exact gram).

    Scale shape: the benchmark side is tiny next to the corpus, so its
    exploded shingles BROADCAST; the only shuffled rows are (doc_id,
    bench_id) intersection hits — docs sharing zero shingles with every
    benchmark doc never leave the map side. Returns one row per corpus
    doc: (doc_id, n_flagged, max_jaccard, contaminated)."""
    from crawler_ai_spark.pipeline.dedup import with_shingles

    d = (
        with_shingles(docs.select("doc_id", text_col), text_col, n)
        .select("doc_id", F.explode("shingles").alias("shingle"))
    )
    b = (
        with_shingles(benchmark.select(bench_id_col, text_col), text_col, n)
        .select(bench_id_col, F.explode("shingles").alias("shingle"))
    )
    d_sizes = d.groupBy("doc_id").agg(F.count("*").alias("d_size"))
    b_sizes = b.groupBy(bench_id_col).agg(F.count("*").alias("b_size"))
    inter = (
        d.join(F.broadcast(b), "shingle")
        .groupBy("doc_id", bench_id_col)
        .agg(F.count("*").alias("n_common"))
    )
    scored = (
        inter.join(d_sizes, "doc_id")
        .join(F.broadcast(b_sizes), bench_id_col)
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.col("d_size") + F.col("b_size") - F.col("n_common")),
        )
        .where(F.col("jaccard") >= F.lit(threshold))
    )
    flagged = scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_flagged"),
        F.round(F.max("jaccard"), 6).alias("max_jaccard"),
    )
    return (
        docs.select("doc_id")
        .join(flagged, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_flagged", F.lit(0)).cast("long").alias("n_flagged"),
            "max_jaccard",
            (F.coalesce("n_flagged", F.lit(0)) > 0).alias("contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# Language-mixture sampling: downsample per language so the kept corpus
# hits a TARGET token mixture (the data-recipe move every multilingual
# pretraining run makes — e.g. 60% en / 20% zh / 20% rest — instead of
# inheriting whatever mix the crawl found).
# ---------------------------------------------------------------------------


def mixture_rates(
    docs: DataFrame, targets: dict[str, float], text_col: str = "text"
) -> DataFrame:
    """Per-language keep rates for an exact-feasible target mixture.

    Availability A_l = total tokens of language l; the largest corpus
    honoring target share w_l from every language is T = min_l A_l/w_l
    (the binding language is kept whole, everything else downsampled).
    Keep rate r_l = w_l * T / A_l. Languages absent from `targets` get
    rate 0 (dropped); a target language absent from the corpus binds
    T to 0 — surfacing the infeasible recipe rather than silently
    re-normalizing.

    One tiny aggregation (few language keys, map-side combined) + a
    broadcast of the rate table: 100 TB-safe, no driver state. The rate
    arithmetic runs IN-PLAN so both engines derive identical doubles.
    Returns (lang, avail_tokens, rate, thr) where thr =
    floor(rate * 65536) thresholds the 16-bit sample keyspace."""
    spark = docs.sparkSession
    tgt = spark.createDataFrame(
        [(l, float(w)) for l, w in sorted(targets.items())], "lang string, w double"
    )
    n_tok = F.when(
        F.length(norm_text(F.col(text_col))) == 0, F.lit(0)
    ).otherwise(F.size(_toks(F.col(text_col))))
    avail = (
        docs.select("lang", n_tok.cast("long").alias("n"))
        .groupBy("lang")
        .agg(F.sum("n").alias("avail_tokens"))
    )
    per = tgt.join(avail, "lang", "left").select(
        "lang",
        "w",
        F.coalesce("avail_tokens", F.lit(0)).alias("avail_tokens"),
    )
    t_total = per.agg(
        F.min(F.col("avail_tokens") / F.col("w")).alias("t_total")
    )
    # a target language with zero availability is the binding constraint
    # (T = 0); its own rate is pinned 0 explicitly — the unguarded 0/0
    # would throw under ANSI mode
    rate = F.when(F.col("avail_tokens") == 0, F.lit(0.0)).otherwise(
        F.least(F.lit(1.0), F.col("w") * F.col("t_total") / F.col("avail_tokens"))
    )
    return per.crossJoin(F.broadcast(t_total)).select(
        "lang",
        "avail_tokens",
        rate.alias("rate"),
        F.floor(rate * F.lit(65536.0)).cast("long").alias("thr"),
    )


def mixture_sample(
    docs: DataFrame, targets: dict[str, float], text_col: str = "text"
) -> DataFrame:
    """Deterministic doc-grain sampling to the target token mixture:
    keep a doc iff its content-independent sample key (16-bit slice of
    md5(doc_id:salt)) falls under its language's threshold. Keep
    decisions are independent of doc length, so expected kept tokens per
    language = rate * avail = w_l * T — the target mixture. Map-only
    after the broadcast rate join; same key machinery as
    stratified_sample, so builds stay reproducible and resumable."""
    rates = mixture_rates(docs, targets, text_col)
    key_int = F.conv(sample_key(F.col("doc_id")), 16, 10).cast("long")
    n_tok = F.when(
        F.length(norm_text(F.col(text_col))) == 0, F.lit(0)
    ).otherwise(F.size(_toks(F.col(text_col))))
    return (
        docs.join(F.broadcast(rates), "lang")
        .select(
            "doc_id",
            "lang",
            n_tok.cast("long").alias("n_tokens"),
            key_int.alias("key_int"),
            "rate",
        )
        .where(F.col("key_int") < F.col("thr"))
    )


# ---------------------------------------------------------------------------
# Weighted sampling without replacement — Efraimidis & Spirakis (IPL
# 2006), the one-pass distributed algorithm: give every row the key
# u^(1/w) for u uniform in (0,1) and take the top-k keys; the result is
# distributed exactly as sequential weighted sampling without
# replacement. Here u derives from the deterministic md5 keyspace, so
# the "random" sample is reproducible and resumable like every other
# sampling decision in this pipeline.
# ---------------------------------------------------------------------------


def weighted_sample(
    docs: DataFrame,
    weight: Column,
    k: int,
    id_col: str = "doc_id",
    salt: str = "es-v1",
) -> DataFrame:
    """Top-k weighted sample without replacement: key = u^(1/w), u =
    (md5_48(id:salt) + 1) / (2^48 + 1) in (0, 1) exclusive. Non-positive
    weights never sample. Keys are quantized to 12 dp before ranking
    (pow is libm; the established cross-engine discipline) with id as
    the final tie-break.

    One global top-k: expressed as a rank-1..k filter over a single
    ordered window — at corpus scale replace with orderBy(...).limit(k)
    (TakeOrdered, no single-partition window); the semantics are
    identical, the catalog-gated window keeps the plan deterministic
    for the oracle."""
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))),
                1,
                12,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(2**48 + 1))
    key = F.round(F.pow(u, F.lit(1.0) / weight), 12)
    scored = docs.where(weight > 0).select(
        id_col, weight.alias("w"), key.alias("es_key")
    )
    from pyspark.sql import Window

    w_rank = Window.orderBy(F.col("es_key").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("pick", F.row_number().over(w_rank))
        .where(F.col("pick") <= k)
        .select(id_col, "w", "es_key", F.col("pick").cast("int").alias("pick"))
    )


def cut_token_budget(
    manifest: DataFrame,
    token_budget: int,
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Cut a shuffled training manifest at EXACTLY the token budget: keep
    the longest prefix of the deterministic shuffle order whose running
    token total stays <= budget (the last doc that would overflow is
    excluded; the cut is reproducible because the order is).

    manifest(shard_id, position, ..., n_tokens) — the shuffle_shards
    layout. TWO-PHASE cumulative sum, no single-partition window:
    per-shard token totals (a tiny aggregate) turn into per-shard
    offsets via a running sum over the SHARD table (n_shards rows,
    broadcast), then each row's global running total = shard offset +
    within-shard cumsum — the within-shard window is bounded by shard
    size, which the shuffle sized to fit an executor. Adds
    running_total; filters to the budget."""
    from pyspark.sql import Window as W

    shard_tot = (
        manifest.groupBy("shard_id")
        .agg(F.sum(tokens_col).alias("_st"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_st").over(
                    W.orderBy("shard_id").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("shard_id", "_offset")
    )
    w_in = W.partitionBy("shard_id").orderBy("position").rowsBetween(
        W.unboundedPreceding, 0
    )
    out = (
        manifest.join(F.broadcast(shard_tot), "shard_id")
        .withColumn(
            "running_total",
            (F.col("_offset") + F.sum(tokens_col).over(w_in)).cast("long"),
        )
        .drop("_offset")
    )
    return out.where(F.col("running_total") <= token_budget)
