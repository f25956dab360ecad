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
- line-dedup probes a BROADCAST set of high-document-frequency lines
  (the boilerplate set is tiny relative to the corpus by construction —
  df >= threshold); only the df-count aggregation and the per-doc
  regroup shuffle, and both shuffle short (doc_id, hash) rows, never the
  full text;
- decontamination broadcasts the benchmark n-gram set (benchmarks are
  KBs-to-MBs against a TB corpus) so the probe is map-side;
- repetition metrics and sampling are map-only: zero shuffles, and the
  sampling key is a content-independent md5 so re-sampling at a new rate
  never re-reads more than the id column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crawler_ai_spark.pipeline.textstats import norm_text

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


def line_dedup(docs: DataFrame, min_df: int = 2, text_col: str = "text") -> DataFrame:
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
    probes the broadcast boilerplate set map-side and regroups survivors
    (the only wide text shuffle). n_lines is computed map-side from the
    window array — no third pass, no shuffle."""
    boiler = boilerplate_lines(exploded_lines(docs, text_col), min_df=min_df)
    kept = exploded_lines(docs, text_col).join(
        F.broadcast(boiler), "line", "left_anti"
    )
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


def repetition_columns(text: Column) -> dict[str, Column]:
    """Gopher-style within-document repetition metrics (map-only):

    - dup_line_ratio: fraction of synthesized lines that are repeats of
      another line in the same doc (1 - distinct/total);
    - dup_bigram_ratio: same over overlapping token bigrams;
    - top_bigram_ratio: occurrences of the single most frequent bigram /
      total bigrams (Gopher's top-2-gram fraction, count-based);
    - repetitive: the gate (dup_line_ratio > 0.30 OR top_bigram_ratio
      > 0.18 — the Gopher-paper neighborhood).

    The top-bigram count is distinct x total comparisons per doc —
    O(n_tokens^2) on a single row, fine for web-page-sized docs; a
    longer-doc deployment swaps in posexplode + groupBy(doc_id, bigram)
    + max, trading the per-row quadratic for one short-row shuffle."""
    toks = _toks(text)
    n_tok = F.when(F.length(norm_text(text)) == 0, F.lit(0)).otherwise(F.size(toks))
    lines = line_windows(text)
    n_lines = F.size(lines)
    safe_lines = F.greatest(n_lines, F.lit(1)).cast("double")
    bigrams = F.when(
        n_tok >= 2,
        F.transform(
            F.sequence(F.lit(1), (n_tok - 1).cast("int")),
            lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n_bg = F.size(bigrams)
    safe_bg = F.greatest(n_bg, F.lit(1)).cast("double")
    top_bg = F.when(
        n_bg > 0,
        F.array_max(
            F.transform(
                F.array_distinct(bigrams),
                lambda b: F.size(F.filter(bigrams, lambda x: x == b)),
            )
        ),
    ).otherwise(F.lit(0))
    dup_line = F.round(F.lit(1.0) - F.size(F.array_distinct(lines)) / safe_lines, 6)
    dup_bg = F.round(F.lit(1.0) - F.size(F.array_distinct(bigrams)) / safe_bg, 6)
    top_ratio = F.round(top_bg / safe_bg, 6)
    return {
        "n_lines": n_lines.cast("long"),
        "n_bigrams": n_bg.cast("long"),
        "dup_line_ratio": dup_line,
        "dup_bigram_ratio": dup_bg,
        "top_bigram_ratio": top_ratio,
        "repetitive": (dup_line > 0.30) | (top_ratio > 0.18),
    }


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
