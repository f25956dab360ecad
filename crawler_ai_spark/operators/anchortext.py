"""Anchor-text rollup — the classic web-graph relevance signal: for
each link TARGET, aggregate what the web's link anchors call it. Search
stacks index this next to page text; a webtext pipeline uses it as a
page-quality/topicality feature and as title backfill for pages whose
own <title> is boilerplate.

Shape at 100 TB (edges ~10× pages):

- one shuffle on ``dst_url`` for in-degree / distinct-source counts
  (partial aggregation map-side combines before the exchange);
- anchor vocabulary counts shuffle on (dst_url, term) — a wider but
  lower-cardinality-per-key exchange, also map-combined; mega-hub
  targets (a homepage with 10^8 in-links) stay safe because the
  explode fans out BEFORE the combine, so each map task contributes
  one partial row per (dst, term), not per link;
- top-k per target is a bounded window over the already-aggregated
  (dst, term, cnt) rows, never over raw links.

Reference note: the reference keeps only each link's own text for
job-link classification (link_extraction: SURVEY §2 P8/F3); the rollup
is the cross-page aggregation of that same field.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawler_ai_spark.pipeline.textstats import STOPWORDS_EN

TOP_K = 3


def anchor_terms(anchor):
    """Normalized anchor tokens minus stopwords (JVM higher-order ops)."""
    toks = F.split(F.lower(F.trim(F.regexp_replace(anchor, r"\s+", " "))), " ")
    stop = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    return F.filter(
        F.array_except(F.array_distinct(toks), stop), lambda t: t != ""
    )


def anchor_text_rollup(edges: DataFrame, top_k: int = TOP_K) -> DataFrame:
    """Per link target: in-degree, distinct linking hosts, and the
    ``top_k`` most frequent non-stopword anchor terms (count desc, term
    asc tie-break) joined with '|'.

    ``edges``: (src_host, dst_url, anchor). Distinct terms PER EDGE
    (a repeated word inside one anchor counts once) so one spammy
    anchor cannot dominate the vocabulary.
    """
    degrees = edges.groupBy("dst_url").agg(
        F.count("*").alias("in_degree"),
        F.countDistinct("src_host").alias("n_src_hosts"),
    )
    term_counts = (
        edges.select("dst_url", F.explode(anchor_terms(F.col("anchor"))).alias("term"))
        .groupBy("dst_url", "term")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("dst_url").orderBy(F.desc("cnt"), F.asc("term"))
    top_terms = (
        term_counts.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= top_k)
        .groupBy("dst_url")
        .agg(
            F.concat_ws(
                "|", F.transform(F.sort_array(F.collect_list(F.struct("_rk", "term"))), lambda s: s["term"])
            ).alias("top_terms")
        )
    )
    return degrees.join(top_terms, "dst_url", "left").select(
        "dst_url",
        "in_degree",
        "n_src_hosts",
        F.coalesce("top_terms", F.lit("")).alias("top_terms"),
    )
