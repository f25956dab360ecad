"""Inverted-index postings and BM25 ranked retrieval over the documents
table — the query-side capability a webtext corpus engine pairs with its
curation side (the reference greps pages per-request with regexes,
app/services/job_extraction_service.py; an indexed corpus answers the
same "find the matching documents" question at 100 TB without rescanning
text per query).

Scale shape:
  * ``postings`` — one posexplode + one partial-aggregating groupBy on
    (doc_id, term); tokens of one document never leave their partition
    before the map-side combine, so the shuffle carries (doc_id, term,
    tf) rows, not raw tokens.
  * ``bm25_topk`` — query terms and per-term document frequencies are
    one-row-per-term broadcasts; corpus stats (N, avgdl) are a one-row
    crossJoin broadcast (the corpus.py vocab-broadcast precedent). The
    only wide exchange is the per-doc score aggregation over ≤|query|
    rows per doc, then a TakeOrdered top-k — no global sort materialized.

Okapi BM25 with the Lucene-style non-negative idf:
  idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
  s(d, q) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
Scores are rounded to 6 (repo parity rule: ratio doubles from identical
integer inputs with identical expression shape, rounded to 6)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawler_ai_spark.pipeline.dedup import tokens_col


def _clean_tokens(text: F.Column) -> F.Column:
    # lowercase whitespace tokens, '' dropped (empty text → [''] → [])
    return F.filter(tokens_col(text), lambda t: t != "")


def postings(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, term, tf, first_pos) — the inverted-index row set.
    first_pos is the 0-based token position of the term's first
    occurrence (proximity/snippet material)."""
    toks = _clean_tokens(F.col(text_col))
    exploded = (
        docs.where(F.col(text_col).isNotNull())
        .select(id_col, F.posexplode(toks).alias("pos", "term"))
    )
    return exploded.groupBy(id_col, "term").agg(
        F.count("*").alias("tf"), F.min("pos").alias("first_pos")
    )


def doc_lengths(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, dl) token counts under the same tokenizer as postings."""
    return docs.where(F.col(text_col).isNotNull()).select(
        id_col, F.size(_clean_tokens(F.col(text_col))).alias("dl")
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents for a bag-of-terms query by BM25. Deterministic:
    ties on the rounded score break by doc_id ascending."""
    spark = docs.sparkSession
    post = postings(docs, text_col, id_col)
    dl = doc_lengths(docs, text_col, id_col)

    qt = spark.createDataFrame([(t,) for t in query_terms], ["term"])
    matched = post.join(F.broadcast(qt), "term")
    df_t = matched.groupBy("term").agg(F.count("*").alias("df"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )

    scored = (
        matched.join(F.broadcast(df_t), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf = F.col("tf").cast("double")
    norm = tf + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    contrib = idf * tf * F.lit(k1 + 1.0) / norm
    return (
        scored.groupBy(id_col)
        .agg(
            F.round(F.sum(contrib), 6).alias("score"),
            F.count("*").alias("n_matched"),
        )
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def positions(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, term, positions array<int>) — the positional index rows
    proximity/phrase queries consume. Same plan shape as ``postings``
    (collect_list replaces count; partial aggregation still applies)."""
    toks = _clean_tokens(F.col(text_col))
    exploded = (
        docs.where(F.col(text_col).isNotNull())
        .select(id_col, F.posexplode(toks).alias("pos", "term"))
    )
    return exploded.groupBy(id_col, "term").agg(
        F.array_sort(F.collect_list("pos")).alias("positions")
    )


def proximity_match(
    docs: DataFrame,
    term_a: str,
    term_b: str,
    window: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Documents where ``term_a`` and ``term_b`` co-occur within
    ``window`` tokens (|pos_a - pos_b| <= window), with the closest
    distance. Positional-index join on
    doc_id; the pair-distance scan is an exploded JVM expression over
    the two (short) position arrays — no Python."""
    pos = positions(docs, text_col, id_col)
    a = pos.where(F.col("term") == term_a).select(id_col, F.col("positions").alias("pa"))
    b = pos.where(F.col("term") == term_b).select(id_col, F.col("positions").alias("pb"))
    joined = a.join(b, id_col)
    # all |pa_i - pb_j| distances: flatten the pairwise transform grid
    dists = F.flatten(
        F.transform(
            F.col("pa"),
            lambda x: F.transform(F.col("pb"), lambda y: F.abs(x - y)),
        )
    )
    best = F.array_min(dists)
    return (
        joined.withColumn("distance", best)
        .where(F.col("distance") <= window)
        .select(id_col, "distance")
    )


def kwic_snippets(
    docs: DataFrame,
    term: str,
    radius: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keyword-in-context snippet around the FIRST occurrence of ``term``:
    up to ``radius`` tokens each side, space-joined. Token-grain (matches
    the index), map-only — slice + array_join on the token array."""
    toks = _clean_tokens(F.col(text_col))
    first = F.array_position(toks, term)  # 1-based; 0 = absent
    lo = F.greatest(first - radius, F.lit(1))
    ln = F.least(first + radius, F.size(toks)) - lo + 1
    return (
        docs.where(F.col(text_col).isNotNull())
        .withColumn("_toks", toks)
        .withColumn("_first", first)
        .where(F.col("_first") > 0)
        .select(
            id_col,
            (F.col("_first") - 1).alias("match_pos"),
            F.array_join(F.slice("_toks", lo, ln), " ").alias("snippet"),
        )
    )


def tfidf_keywords(
    docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
) -> DataFrame:
    """Per-doc top-k TF-IDF keywords — the classic doc-tagging signal
    (what is this page ABOUT, corpus-relatively): weight = tf * ln(N /
    df), stop-terms self-suppress because corpus-wide terms have ~zero
    idf. Ranked (weight desc, term asc); weight rounded 6 dp so the
    rank and the hash are engine-portable (ln is libm).

    Shapes: the postings shuffle (doc,term), one term-keyed df
    aggregation (map-combined), a broadcast of the one-row N, and a
    bounded per-doc window over ≤ |vocab ∩ doc| rows. min_df prunes
    hapax noise before the window at corpus scale."""
    p = postings(docs, text_col, id_col)
    df_tbl = p.groupBy("term").agg(F.count("*").alias("df"))
    if min_df > 1:
        df_tbl = df_tbl.where(F.col("df") >= min_df)
    n_docs = docs.where(F.col(text_col).isNotNull()).agg(
        F.count("*").cast("double").alias("n")
    )
    scored = (
        p.join(df_tbl, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            "tf",
            F.round(
                F.col("tf") * F.log(F.col("n") / F.col("df")), 6
            ).alias("weight"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("weight").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "rank", "term", F.col("tf").cast("long").alias("tf"), "weight")
    )


def bm25f_topk(
    docs: DataFrame,
    query_terms: list[str],
    fields: dict[str, float],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25F (Robertson/Zaragoza's simple variant) — the production
    retrieval default: a term hit in the TITLE is worth more than one in
    the body. Field term frequencies are length-normalized per field,
    weighted, and POOLED before the single saturation:

        tf~(t, d) = sum_f w_f * tf_f / (1 - b + b * dl_f / avgdl_f)
        score(d)  = sum_t idf(t) * tf~ / (k1 + tf~)

    (pooling before saturation is what makes BM25F different from — and
    better than — a weighted sum of per-field BM25 scores: a term
    matching in every field saturates once, not once per field).
    ``fields`` maps column name -> weight. idf counts a document once no
    matter which fields match. Deterministic: rounded scores, doc-id
    ties. Same shuffle shape as bm25_topk, once per field."""
    spark = docs.sparkSession
    qt = spark.createDataFrame([(t,) for t in query_terms], ["term"])
    per_field = []
    for fcol, w in sorted(fields.items()):
        p = postings(docs, fcol, id_col).join(F.broadcast(qt), "term")
        dl = doc_lengths(docs, fcol, id_col).withColumnRenamed("dl", "dl_f")
        avg = dl.agg(F.avg("dl_f").alias("avgdl_f"))
        pf = (
            p.join(dl, id_col)
            .crossJoin(F.broadcast(avg))
            .select(
                id_col,
                "term",
                (
                    F.lit(float(w))
                    * F.col("tf").cast("double")
                    / (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl_f") / F.col("avgdl_f")
                    )
                ).alias("wtf"),
                F.lit(fcol).alias("_field"),
            )
        )
        per_field.append(pf)
    pooled = per_field[0]
    for pf in per_field[1:]:
        pooled = pooled.unionByName(pf)
    # deterministic pooled tf~: fold per (doc, term) in field order
    tft = pooled.groupBy(id_col, "term").agg(
        F.expr(
            "aggregate(array_sort(collect_list(struct(_field, wtf))),"
            " cast(0.0 as double), (acc, x) -> acc + x.wtf)"
        ).alias("tft")
    )
    df_t = tft.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = tft.join(F.broadcast(df_t), "term").crossJoin(F.broadcast(n_docs))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    contrib = idf * F.col("tft") / (F.lit(k1) + F.col("tft"))
    return (
        scored.withColumn("_c", contrib)
        .groupBy(id_col)
        .agg(
            F.round(
                F.expr(
                    "aggregate(array_sort(collect_list(struct(term, _c))),"
                    " cast(0.0 as double), (acc, x) -> acc + x._c)"
                ),
                6,
            ).alias("score"),
            F.count("*").alias("n_matched"),
        )
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 60,
    top: int = 20,
    id_col: str = "doc_id",
) -> DataFrame:
    """Reciprocal rank fusion (Cormack/Clarke/Buettcher SIGIR'09) — the
    hybrid-search standard for combining heterogeneous rankings (BM25 ×
    embedding × anything) without score calibration:

        rrf(d) = sum_i 1 / (k + rank_i(d))

    Each input needs (id_col, rank); documents absent from a ranking
    simply contribute nothing. Deterministic: the per-doc fold sums in
    ranking-index order, scores round 9 dp, ties break by id. Inputs are
    top-N lists (small) — unions and one id-keyed aggregation."""
    tagged = []
    for i, r in enumerate(rankings):
        tagged.append(
            r.select(
                id_col,
                F.lit(i).alias("_ri"),
                (F.lit(1.0) / (F.lit(float(k)) + F.col("rank"))).alias("_c"),
            )
        )
    all_ = tagged[0]
    for t in tagged[1:]:
        all_ = all_.unionByName(t)
    fused = all_.groupBy(id_col).agg(
        F.round(
            F.expr(
                "aggregate(array_sort(collect_list(struct(_ri, _c))),"
                " cast(0.0 as double), (acc, x) -> acc + x._c)"
            ),
            9,
        ).alias("rrf_score"),
        F.count("*").alias("n_rankings"),
    )
    w = Window.orderBy(F.desc("rrf_score"), F.col(id_col))
    return (
        fused.withColumn("fused_rank", F.row_number().over(w))
        .where(F.col("fused_rank") <= top)
        .select(id_col, "fused_rank", "rrf_score", F.col("n_rankings").cast("long").alias("n_rankings"))
    )


def ndcg_at_k(
    runs: DataFrame,
    qrels: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Ranking-quality evaluation at corpus scale: nDCG@k per query.
    runs(query_id, doc_id, rank), qrels(query_id, doc_id, rel graded
    gain >= 0). DCG = sum gain_i / log2(rank_i + 1) over the top k;
    ideal DCG re-ranks the query's qrels by gain (ties by doc_id); the
    quotient is 1.0 for a perfect ranking. Queries with no positive
    qrels return NULL (undefined, not zero). Folds are rank-sorted,
    scores round 6 dp — deterministic in any engine. Shapes: two
    query-keyed aggregations over top-k-bounded rows."""
    gained = (
        runs.where(F.col("rank") <= k)
        .join(qrels, ["query_id", "doc_id"], "left")
        .select(
            "query_id",
            "rank",
            (
                F.coalesce(F.col("rel"), F.lit(0.0))
                / F.log2(F.col("rank") + F.lit(1.0))
            ).alias("_g"),
        )
    )
    dcg = gained.groupBy("query_id").agg(
        F.expr(
            "aggregate(array_sort(collect_list(struct(rank, _g))),"
            " cast(0.0 as double), (acc, x) -> acc + x._g)"
        ).alias("dcg")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rel"), F.col("doc_id"))
    ideal = (
        qrels.where(F.col("rel") > 0)
        .withColumn("irank", F.row_number().over(w))
        .where(F.col("irank") <= k)
        .select(
            "query_id",
            "irank",
            (F.col("rel") / F.log2(F.col("irank") + F.lit(1.0))).alias("_g"),
        )
        .groupBy("query_id")
        .agg(
            F.expr(
                "aggregate(array_sort(collect_list(struct(irank, _g))),"
                " cast(0.0 as double), (acc, x) -> acc + x._g)"
            ).alias("idcg")
        )
    )
    return (
        dcg.join(ideal, "query_id", "left")
        .select(
            "query_id",
            F.round("dcg", 6).alias("dcg"),
            F.round("idcg", 6).alias("idcg"),
            F.when(
                F.col("idcg") > 0, F.round(F.col("dcg") / F.col("idcg"), 6)
            ).alias("ndcg"),
        )
    )


def mrr_map_at_k(
    runs: DataFrame,
    qrels: DataFrame,
    k: int = 10,
) -> DataFrame:
    """The other two standard ranking metrics next to nDCG: per query,
    the reciprocal rank of the FIRST relevant hit (MRR's per-query term)
    and average precision at k (MAP's). Binary relevance: rel > 0.
    Queries with no relevant doc in the top k score 0 for both (the
    trec_eval convention). Rank-sorted folds, 6-dp rounding."""
    hits = (
        runs.where(F.col("rank") <= k)
        .join(qrels.where(F.col("rel") > 0), ["query_id", "doc_id"], "left")
        .select(
            "query_id",
            "rank",
            F.col("rel").isNotNull().cast("int").alias("is_rel"),
        )
    )
    per_q = hits.groupBy("query_id").agg(
        F.expr(
            "aggregate(array_sort(collect_list(struct(rank, is_rel))),"
            " struct(cast(0.0 as double) as rr, cast(0.0 as double) as psum,"
            "        cast(0 as int) as nrel, cast(0 as int) as seen),"
            " (acc, x) -> struct("
            "   CASE WHEN acc.nrel = 0 AND x.is_rel = 1"
            "        THEN cast(1.0 as double) / x.rank ELSE acc.rr END as rr,"
            "   acc.psum + CASE WHEN x.is_rel = 1"
            "        THEN cast(acc.nrel + 1 as double) / x.rank"
            "        ELSE cast(0.0 as double) END as psum,"
            "   acc.nrel + x.is_rel as nrel,"
            "   acc.seen + 1 as seen))"
        ).alias("s")
    )
    n_rel = qrels.where(F.col("rel") > 0).groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_rel_total")
    )
    return (
        per_q.join(n_rel, "query_id", "left")
        .select(
            "query_id",
            F.round(F.col("s.rr"), 6).alias("mrr"),
            F.round(
                F.when(
                    F.coalesce("n_rel_total", F.lit(0)) > 0,
                    F.col("s.psum")
                    / F.least(F.lit(k), F.col("n_rel_total")).cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("ap"),
        )
    )
