"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
public arXiv:2302.03169): score every raw document by how much more
likely its hashed n-gram features are under a TARGET distribution than
under the RAW pool, so a pretraining recipe can upweight "looks like
the target domain" text without a trained classifier.

This is the hashed-unigram variant: features are tokens hashed into B
buckets (md5-slice — engine-portable, unlike xxhash64 which DuckDB
lacks); both feature models are add-1-smoothed multinomials fit IN-PLAN
over the same corpus split; a doc's log importance weight is

    lw(d) = sum_b c_b(d) * [ ln p_target(b) - ln p_raw(b) ]

normalized per token so length drops out. lw > 0 reads "more
target-like than pool-like" — the scale-free selection cut (no global
sort, no percentile estimation at 10^10 docs).

Scale shape: two bucket-count aggregations (B=512 keys, map-side
combined to almost nothing), a one-row total broadcast, the log-ratio
table broadcast (B rows), then one shuffle keyed doc_id for the per-doc
fold. The fold sums (count * ratio) terms in bucket-sorted order —
per-(doc,bucket) counts are pre-aggregated, so the sort key is unique
per doc and the double addition order is reproducible across engines;
the final weight is rounded to 4 decimals (the lm_bigram_score
precedent) to absorb libm ln() last-ulp differences."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crawler_ai_spark.pipeline.corpus import _toks
from crawler_ai_spark.pipeline.textstats import norm_text

DSIR_BUCKETS = 512


def bucket_of(token: Column, buckets: int = DSIR_BUCKETS) -> Column:
    """Engine-portable feature hash: first 4 hex chars of md5(token)
    mod buckets."""
    return (
        F.conv(F.substring(F.md5(token), 1, 4), 16, 10).cast("long")
        % F.lit(buckets)
    )


def dsir_logweights(
    docs: DataFrame,
    is_target: Column,
    text_col: str = "text",
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """docs + a target-membership predicate -> (doc_id, n_tokens,
    logweight, selected). Raw model q = the NON-target remainder (the
    pool being re-weighted); target docs themselves are scored too (a
    sanity signal: they should mostly land positive)."""
    t = F.col(text_col)
    n_tok = F.when(F.length(norm_text(t)) == 0, F.lit(0)).otherwise(F.size(_toks(t)))
    base = docs.select(
        "doc_id",
        is_target.alias("is_target"),
        F.when(n_tok > 0, _toks(t)).otherwise(F.array().cast("array<string>")).alias(
            "toks"
        ),
    )
    tok = base.select(
        "doc_id", "is_target", F.explode("toks").alias("tokstr")
    ).select("doc_id", "is_target", bucket_of(F.col("tokstr"), buckets).alias("b"))

    # per-corpus bucket counts + totals (B keys: vanishing shuffles)
    cnt = tok.groupBy("b").agg(
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("ct"),
        F.sum(F.when(F.col("is_target"), 0).otherwise(1)).alias("cr"),
    )
    totals = cnt.agg(
        F.sum("ct").alias("tt"), F.sum("cr").alias("tr")
    )
    ratio = cnt.crossJoin(F.broadcast(totals)).select(
        "b",
        (
            F.log((F.col("ct") + F.lit(1.0)) / (F.col("tt") + F.lit(float(buckets))))
            - F.log((F.col("cr") + F.lit(1.0)) / (F.col("tr") + F.lit(float(buckets))))
        ).alias("lr"),
    )

    per_doc_bucket = tok.groupBy("doc_id", "b").agg(F.count("*").alias("c"))
    weights = (
        per_doc_bucket.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.expr(
                "aggregate(array_sort(collect_list(struct(b, c, lr))),"
                " cast(0.0 as double), (acc, x) -> acc + x.c * x.lr)"
            ).alias("raw_lw"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.round(F.col("raw_lw") / F.col("n_tokens"), 4).alias("logweight"),
        )
    )
    return (
        docs.select("doc_id")
        .join(weights, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            "logweight",
            (F.coalesce("logweight", F.lit(0.0)) > 0).alias("selected"),
        )
    )
