"""BPE tokenizer-vocabulary learning over the corpus — the tokenizer-
training step of an LLM data pipeline (Sennrich et al. 2016, the
published byte-pair-encoding algorithm), Spark-first.

Everything past the first aggregation runs at DISTINCT-WORD grain: the
corpus-size shuffle happens exactly once (word counts); pair counting,
merge selection, and re-segmentation are joins/maps over the vocabulary
(10^8 rows at 100 TB, not 10^13 tokens). Per merge round the driver sees
ONE row (the argmax pair) — the batch-synchronous crawl-loop pattern,
not a collect of state.

Segmentation is carried as a spaced symbol string (' s p a r k </w> ',
one space between symbols, sentinel spaces at both ends), so applying a
merge is a single JVM `replace(seg, ' a b ', ' ab ')` — left-to-right
non-overlapping, the same semantics in Spark, DuckDB, and Python's
str.replace, which is what keeps the cross-engine oracle and the pure-
Python test twin exact."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from crawler_ai_spark.pipeline.dedup import tokens_col

EOW = "</w>"


def word_counts(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(word, cnt) under the corpus tokenizer — the ONE corpus-size
    shuffle; everything downstream is vocabulary-grain."""
    toks = F.filter(tokens_col(F.col(text_col)), lambda t: t != "")
    return (
        docs.where(F.col(text_col).isNotNull())
        .select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def initial_segmentation(words: DataFrame) -> DataFrame:
    """(word, cnt, seg) with seg = ' c h a r s </w> '."""
    return words.withColumn(
        "seg",
        F.concat(
            F.lit(" "),
            F.regexp_replace(F.col("word"), r"(.)", "$1 "),
            F.lit(EOW + " "),
        ),
    )


def pair_counts(segged: DataFrame) -> DataFrame:
    """(left, right, cnt) adjacent-symbol pair frequencies, weighted by
    word count. Vocabulary-grain explode + one short shuffle on pair."""
    syms = F.split(F.trim(F.col("seg")), " ")
    pairs = F.transform(
        F.sequence(F.lit(0), F.size(syms) - 2),
        lambda i: F.struct(
            F.element_at(syms, i + 1).alias("left"),
            F.element_at(syms, i + 2).alias("right"),
        ),
    )
    return (
        segged.select("cnt", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("cnt").alias("cnt"))
    )


def learn_merges(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Run ``n_merges`` BPE rounds; returns ([(left, right, pair_cnt)]
    in merge order, final segmented vocabulary DataFrame). Argmax ties
    break (cnt DESC, left ASC, right ASC) — deterministic."""
    segged = initial_segmentation(word_counts(docs, text_col, id_col)).persist()
    segged.count()
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        best = (
            pair_counts(segged)
            .orderBy(F.desc("cnt"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right, cnt = best[0].left, best[0].right, int(best[0].cnt)
        merges.append((left, right, cnt))
        new_segged = segged.withColumn(
            "seg",
            F.expr(
                "replace(seg, ' {l} {r} ', ' {lr} ')".format(
                    l=left.replace("'", "\\'"),
                    r=right.replace("'", "\\'"),
                    lr=(left + right).replace("'", "\\'"),
                )
            ),
        ).persist()
        new_segged.count()
        segged.unpersist()
        segged = new_segged
    return merges, segged


def apply_merges(words: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Segment a (word, ...) DataFrame with an already-learned merge
    list: the ordered merges fold over the spaced form as a literal-array
    aggregate — pure JVM, map-side (how a 100 TB corpus gets tokenized
    with a vocabulary learned on a sample)."""
    pats = F.array(
        *[
            F.struct(
                F.lit(f" {l} {r} ").alias("find"), F.lit(f" {l}{r} ").alias("repl")
            )
            for l, r in merges
        ]
    )
    seg0 = F.concat(
        F.lit(" "), F.regexp_replace(F.col("word"), r"(.)", "$1 "), F.lit(EOW + " ")
    )
    folded = F.aggregate(
        pats, seg0, lambda acc, m: F.replace(acc, m["find"], m["repl"])
    )
    return words.withColumn("seg", folded).withColumn(
        "pieces", F.split(F.trim(F.col("seg")), " ")
    )
