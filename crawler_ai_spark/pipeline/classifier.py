"""In-plan logistic-regression document classifier over hashed n-gram
features — the FineWeb-Edu / quality-classifier move: train a linear
scorer ON the cluster with full-batch gradient descent, then score the
whole corpus with it, no external ML runtime.

Features are the DSIR bucket hashes (pipeline/dsir.bucket_of — md5
slice mod B, engine-portable), length-normalized per doc
(x_{d,b} = count_{d,b} / n_tokens_d). Full-batch GD, `steps` rounds:

    p_d   = sigmoid( Σ_b x_{d,b} · w_b )
    g_b   = Σ_d (p_d - y_d) · x_{d,b} / N
    w_b  <- round(w_b - lr · g_b, 9)

Reproducibility discipline (the catalog's cross-engine gate runs the
SAME training in DuckDB): every double fold sorts on a per-group-unique
key (buckets within a doc, doc ids within a bucket), and the weights
are QUANTIZED to 9 decimals after every step — libm exp() may differ in
the last ulp between engines, but a sub-1e-15 drift cannot move a 1e-9
grid, so both engines enter every step with identical weight bits and
the divergence never compounds.

Scale shape per step: one broadcast of the B-row weight table, one
doc-keyed shuffle for the score fold, one bucket-keyed shuffle for the
gradient (B keys, map-combined). The per-(doc, bucket) feature matrix
is built once and reused across steps — persist it for real corpora.
Training cost = steps × 2 shuffles; scoring = one broadcast join +
one doc-keyed fold."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from crawler_ai_spark.pipeline.corpus import _toks
from crawler_ai_spark.pipeline.dsir import bucket_of
from crawler_ai_spark.pipeline.textstats import norm_text

CLF_BUCKETS = 256
W_DECIMALS = 9


def doc_features(
    docs: DataFrame, text_col: str = "text", buckets: int = CLF_BUCKETS
) -> DataFrame:
    """(doc_id, b, x): length-normalized hashed-unigram counts. Empty
    docs contribute no rows (they score sigmoid(0) = 0.5 downstream)."""
    t = F.col(text_col)
    n_tok = F.when(F.length(norm_text(t)) == 0, F.lit(0)).otherwise(F.size(_toks(t)))
    base = docs.select(
        "doc_id",
        F.when(n_tok > 0, _toks(t)).otherwise(F.array().cast("array<string>")).alias(
            "toks"
        ),
    )
    tok = base.select("doc_id", F.explode("toks").alias("tokstr")).select(
        "doc_id", bucket_of(F.col("tokstr"), buckets).alias("b")
    )
    pdb = tok.groupBy("doc_id", "b").agg(F.count("*").alias("c"))
    n_per_doc = pdb.groupBy("doc_id").agg(F.sum("c").alias("n"))
    return pdb.join(n_per_doc, "doc_id").select(
        "doc_id", "b", (F.col("c").cast("double") / F.col("n")).alias("x")
    )


def _sorted_fold(key: str, val: str) -> Column:
    return F.expr(
        f"aggregate(array_sort(collect_list(struct({key}, {val}))),"
        f" cast(0.0 as double), (acc, t) -> acc + t.{val})"
    )


def train_logreg(
    features: DataFrame,
    labels: DataFrame,
    steps: int = 3,
    lr: float = 1.0,
    buckets: int = CLF_BUCKETS,
) -> DataFrame:
    """features(doc_id, b, x) + labels(doc_id, y double in {0,1}) ->
    weights(b, w) after `steps` full-batch GD rounds from w = 0."""
    spark = features.sparkSession
    feats = features.join(labels, "doc_id")
    n_docs = labels.count()
    w = spark.range(buckets).select(
        F.col("id").cast("long").alias("b"), F.lit(0.0).alias("w")
    )
    for _ in range(steps):
        scored = (
            feats.join(F.broadcast(w), "b")
            .withColumn("xw", F.col("x") * F.col("w"))
            .groupBy("doc_id", "y")
            .agg(_sorted_fold("b", "xw").alias("z"))
            .select(
                "doc_id",
                "y",
                (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z")))).alias("p"),
            )
        )
        grad = (
            feats.join(scored.select("doc_id", "p", "y"), ["doc_id", "y"])
            .withColumn("gterm", (F.col("p") - F.col("y")) * F.col("x"))
            .groupBy("b")
            .agg((_sorted_fold("doc_id", "gterm") / F.lit(float(n_docs))).alias("g"))
        )
        w = (
            w.join(grad, "b", "left")
            .select(
                "b",
                (
                    F.round(
                        F.col("w") - F.lit(lr) * F.coalesce("g", F.lit(0.0)),
                        W_DECIMALS,
                    )
                    + F.lit(0.0)  # collapse any IEEE -0.0 to +0.0
                ).alias("w"),
            )
        )
    return w


def score_docs(
    docs: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    buckets: int = CLF_BUCKETS,
) -> DataFrame:
    """(doc_id, score): sigmoid of the feature/weight dot product, 6 dp.
    Docs with no features (empty text) score exactly 0.5. `buckets`
    must match the training-side feature space."""
    feats = doc_features(docs, text_col, buckets=buckets)
    z = (
        feats.join(F.broadcast(weights), "b")
        .withColumn("xw", F.col("x") * F.col("w"))
        .groupBy("doc_id")
        .agg(_sorted_fold("b", "xw").alias("z"))
    )
    return (
        docs.select("doc_id")
        .join(z, "doc_id", "left")
        .select(
            "doc_id",
            F.round(
                F.lit(1.0)
                / (F.lit(1.0) + F.exp(-F.coalesce(F.col("z"), F.lit(0.0)))),
                6,
            ).alias("score"),
        )
    )
