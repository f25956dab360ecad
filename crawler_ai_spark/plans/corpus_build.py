"""Crawl store → training manifest: the bridge between the engine's two
halves. A finished crawl leaves a CrawlStore (visited URLs, lineage,
checkpoints) and the pages' bytes; a training run wants packed token
windows. This plan connects them with the SAME operators both sides
already test:

    visited ⋈ pages → canonical HTML→text (the byte-parity extractor)
      → language gate → quality gate → exact dedup → PII scrub
      → deterministic shuffle → sequence packing
      [→ token-budget cut]

Everything downstream of extraction is the catalog's
corpus_training_manifest pipeline (queries/secondwave.py) operating on
crawled pages instead of the synthetic documents table; extraction is
the crawl side's parse UDF. One function, resumable inputs, zero
RNG — re-running on the same store yields the same manifest."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crawler_ai_spark.pipeline import corpus as CP
from crawler_ai_spark.pipeline import textstats as TS


def crawl_documents(
    spark: SparkSession,
    store,
    last_batch: int,
    pages: DataFrame,
) -> DataFrame:
    """(doc_id, url, text): one document per FETCHED visited URL, text
    from the canonical extractor. doc_id = xxhash64(url) — stable across
    re-runs and resumes. The visited table carries no bodies (the store
    stays lean); bodies come from the pages table or a WARC read
    (sources/warc.read_warc_dedup over the archive dirs)."""
    from crawler_ai_spark.functions.html import with_parse

    visited = (
        store.read_all("visited", last_batch)
        .where(F.col("fetched"))
        .select("url")
        .distinct()
    )
    fetched = pages.join(visited, "url").where(F.col("html").isNotNull())
    parsed = with_parse(fetched.select("url", "html"))
    return parsed.select(
        F.xxhash64("url").alias("doc_id"),
        "url",
        F.col("parse.text").alias("text"),
    )


def build_corpus_manifest(
    spark: SparkSession,
    store,
    last_batch: int,
    pages: DataFrame,
    lang: str = "en",
    min_quality: float = 0.3,
    window: int = CP.PACK_WINDOW,
    token_budget: int | None = None,
) -> DataFrame:
    """Crawl store in, packed training windows out. Returns the
    pack_windows manifest (shard_id, seq_id, window_text, n_tokens),
    optionally cut at ``token_budget`` total tokens (two-phase running
    totals — plans stay single-partition-window-free)."""
    docs = crawl_documents(spark, store, last_batch, pages)
    t = F.col("text")
    staged = docs.select(
        "doc_id",
        "text",
        TS.lang_id(t).alias("lang_pred"),
        TS.quality_score(t).alias("quality"),
        TS.fingerprint(t).alias("fingerprint"),
    )
    kept = staged.where(
        (F.col("lang_pred") == lang) & (F.col("quality") >= min_quality)
    )
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    kept = (
        kept.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            "text",
            # pack shard = the deterministic shuffle key's bucket: the
            # same decorrelation move as shuffle_shards, expressed as
            # the packing operator's source column
            (
                F.conv(F.substring(CP.sample_key(F.col("doc_id")), 1, 4), 16, 10)
                % 8
            )
            .cast("string")
            .alias("source"),
        )
    )
    packed = CP.pack_windows(kept, window=window)
    if token_budget is not None:
        manifest = packed.select(
            F.col("source").alias("shard_id"),
            F.col("window_id").alias("position"),
            "window_text",
            "n_tokens",
        )
        cut = CP.cut_token_budget(manifest, token_budget)
        return cut.select(
            F.col("shard_id").alias("source"),
            F.col("position").alias("window_id"),
            "window_text",
            "n_tokens",
            "running_total",
        )
    return packed
