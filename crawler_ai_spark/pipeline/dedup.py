"""Corpus deduplication — exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine. The scale layer the crawl's `pages`/`documents` output
feeds before training-data export.

Design for 100 TB (sandbox tests at sf0.01–0.1):

- EXACT: hash-groupBy on md5(text) — one shuffle on a 128-bit key, no
  payload movement (text column pruned before the shuffle; only the hash
  and doc_id travel).
- N-GRAM JACCARD: token-shingle explode → self-join on shingle → count
  intersections. The join key is a shingle string; frequency-skewed
  shingles (stop-shingles) are the classic hot key, so a document-frequency
  cap drops shingles appearing in > max_df docs BEFORE the join (they
  contribute ~0 discrimination and ~all the skew). O(sum_df²) worst case —
  use ONLY as the verifier behind a candidate generator at scale.
- MINHASH+LSH: 64 xxhash64 permutations (JVM-side, whole-stage codegen;
  no Python), 32 bands × 2 rows: P(candidate | j) = 1-(1-j²)^32 → recall
  ≥ 1-1e-6 at j ≥ 0.6. Banding shuffle is on (band_id, band_hash) — a
  uniform 64-bit key, unskewed by construction. Candidates are exact-
  verified with true Jaccard, so precision is exact and the ONLY
  probabilistic loss is band-miss recall.
- SIMHASH: 64-bit signatures in one Arrow pandas UDF (numpy bit-packing),
  then pigeonhole banding on 4×16-bit chunks: hamming ≤ 3 ⇒ ≥ 1 chunk
  equal, so candidate generation is 4 equality self-joins, not n².
- EMBEDDING: cosine ≥ τ pairs. Brute force (crossJoin) is the sandbox
  verifier; the scale path buckets by random-hyperplane LSH signature
  first (similarity.py) and verifies exactly inside buckets.

Reference note: the reference's only dedup is URL/list dedup + fuzzy job
title matching (job_extraction_service.py:658-673, :2116-2190 — D3/D4 in
SURVEY.md §2.5); these corpus-level operators generalize that to the
training-data scale the engine targets.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# shingling (shared by jaccard / minhash / simhash)
# ---------------------------------------------------------------------------


def tokens_col(text, lowercase: bool = True):
    """Whitespace tokenization of a text column (JVM-side)."""
    t = F.lower(text) if lowercase else text
    return F.split(F.trim(F.regexp_replace(t, r"\s+", " ")), " ")


def with_shingles(docs: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Adds a ``shingles`` column: DISTINCT word n-gram shingles (JVM-side
    higher-order functions). A doc shorter than n words yields its whole
    text as the single shingle so it still participates."""
    out = docs.withColumn("_toks", tokens_col(F.col(text_col)))
    ngrams = F.expr(
        f"transform(sequence(1, size(_toks) - {n - 1}), "
        f"i -> array_join(slice(_toks, i, {n}), ' '))"
    )
    whole = F.array(F.array_join(F.col("_toks"), " "))
    return out.withColumn(
        "shingles",
        F.when(F.size("_toks") >= n, F.array_distinct(ngrams)).otherwise(whole),
    ).drop("_toks")


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dup_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: one row per duplicated text, with the
    kept (min-id) representative and the duplicate count. Only (hash, id)
    shuffle — the text column never moves."""
    hashed = docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("text_hash"))
    return (
        hashed.groupBy("text_hash")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("keep_id"),
        )
        .where(F.col("n_docs") > 1)
    )


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the min-id document per distinct text (deterministic winner)."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact pairwise — the verifier)
# ---------------------------------------------------------------------------


def jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.6,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """All (a, b) pairs with shingle-set Jaccard ≥ threshold, a < b.

    Explode-join-count: pairs sharing zero shingles never materialize.
    ``max_df`` drops stop-shingles (appearing in > max_df docs) before the
    join — the skew guard; exactness is preserved only when the dropped
    shingles are also dropped from the set sizes, which this does."""
    sh = with_shingles(docs.select(id_col, text_col), text_col, n).select(
        F.col(id_col).alias("id"), "shingles"
    )
    exploded = sh.select("id", F.explode("shingles").alias("shingle"))
    if max_df is not None:
        df_counts = exploded.groupBy("shingle").agg(F.count("*").alias("_df"))
        exploded = (
            exploded.join(df_counts, "shingle")
            .where(F.col("_df") <= max_df)
            .drop("_df")
        )
    sizes = exploded.groupBy("id").agg(F.count("*").alias("set_size"))

    a = exploded.select(F.col("id").alias("a_id"), "shingle")
    b = exploded.select(F.col("id").alias("b_id"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "a_id").withColumnRenamed("set_size", "a_size"), "a_id")
        .join(sizes.withColumnRenamed("id", "b_id").withColumnRenamed("set_size", "b_size"), "b_id")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("a_size") + F.col("b_size") - F.col("n_common")),
        )
        .where(F.col("jaccard") >= F.lit(threshold))
        .select("a_id", "b_id", F.round("jaccard", 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH (candidate generator; exact-verified)
# ---------------------------------------------------------------------------

MINHASH_N = 64
LSH_BANDS = 32  # × 2 rows/band


def minhash_signatures(docs: DataFrame, n_hashes: int = MINHASH_N, n: int = 3,
                       id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, sig ARRAY<BIGINT>[n_hashes]) — min over xxhash64(shingle, seed)
    per seed. Pure JVM: explode → per-seed min via a single groupBy over
    n_hashes aggregate expressions (no Python, no extra shuffle per seed)."""
    sh = with_shingles(docs.select(id_col, text_col), text_col, n)
    exploded = sh.select(F.col(id_col).alias("id"), F.explode("shingles").alias("shingle"))
    aggs = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(seed))).alias(f"h{seed}")
        for seed in range(n_hashes)
    ]
    per_doc = exploded.groupBy("id").agg(*aggs)
    return per_doc.select(
        "id", F.array(*[F.col(f"h{s}") for s in range(n_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.6,
    n_hashes: int = MINHASH_N,
    bands: int = LSH_BANDS,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs via banded MinHash-LSH, exact-verified with true
    Jaccard. Output identical to ``jaccard_pairs`` up to band-miss recall
    (≥ 1-1e-6 at the default 32×2 banding for j ≥ 0.6)."""
    rows = n_hashes // bands
    # one shingling pass feeds BOTH the signatures and the exact verify —
    # without the cache the (tokenize + n-gram) scan of the corpus runs 3×
    # (signatures, then twice in the verify self-join). At 100 TB this
    # cache is a checkpoint to storage; the plan shape is the same.
    sh = with_shingles(docs.select(id_col, text_col), text_col, n).select(
        F.col(id_col).alias("id"), "shingles"
    ).persist()
    sigs = _signatures_from_shingles(sh, n_hashes)
    banded = sigs.select(
        "id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), "
                f"b -> xxhash64(concat_ws(',', slice(sig, b * {rows} + 1, {rows})), b))"
            )
        ).alias("band_id", "band_hash"),
    )
    left = banded.select(F.col("id").alias("a_id"), "band_id", "band_hash")
    right = banded.select(F.col("id").alias("b_id"), "band_id", "band_hash")
    candidates = (
        left.join(right, ["band_id", "band_hash"])
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    return _verify_pairs_jaccard(sh, candidates, threshold)


def _signatures_from_shingles(sh: DataFrame, n_hashes: int) -> DataFrame:
    exploded = sh.select("id", F.explode("shingles").alias("shingle"))
    aggs = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(seed))).alias(f"h{seed}")
        for seed in range(n_hashes)
    ]
    per_doc = exploded.groupBy("id").agg(*aggs)
    return per_doc.select(
        "id", F.array(*[F.col(f"h{s}") for s in range(n_hashes)]).alias("sig")
    )


def _verify_pairs_jaccard(sh: DataFrame, candidates: DataFrame, threshold: float):
    """Exact Jaccard on candidate pairs via shingle-array intersection
    (JVM array ops; the candidate set is small relative to n²).
    ``sh`` = (id, shingles) — ideally cached by the caller."""
    a = sh.select(F.col("id").alias("a_id"), F.col("shingles").alias("a_sh"))
    b = sh.select(F.col("id").alias("b_id"), F.col("shingles").alias("b_sh"))
    joined = candidates.join(a, "a_id").join(b, "b_id")
    inter = F.size(F.array_intersect("a_sh", "b_sh"))
    union = F.size("a_sh") + F.size("b_sh") - inter
    return (
        joined.withColumn("jaccard", inter / union)
        .where(F.col("jaccard") >= F.lit(threshold))
        .select("a_id", "b_id", F.round("jaccard", 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# SimHash (pandas-UDF signatures; pigeonhole-banded candidates)
# ---------------------------------------------------------------------------

SIMHASH_BITS = 64
SIMHASH_CHUNKS = 4  # hamming ≤ SIMHASH_CHUNKS-1 ⇒ some 16-bit chunk equal


def _simhash_batch(texts: pd.Series, n: int = 3) -> pd.Series:
    """64-bit SimHash per text over word n-gram shingles (numpy-vectorized
    per row; Arrow-batched across rows)."""
    out = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = (t or "").lower().split()
        if len(toks) >= n:
            shingles = {" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)}
        else:
            shingles = {" ".join(toks)}
        if not shingles:
            continue
        # blake2b 8-byte digests: deterministic across executors (Python's
        # builtin hash() is PYTHONHASHSEED-salted and would differ per worker)
        hs = np.array(
            [
                int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")
                for s in sorted(shingles)
            ],
            dtype=np.uint64,
        )
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
            np.int64
        )
        acc = (2 * bits - 1).sum(axis=0)
        sig = np.uint64(0)
        for b in np.nonzero(acc > 0)[0]:
            sig |= np.uint64(1) << np.uint64(b)
        out[i] = np.int64(sig)
    return pd.Series(out)


def simhash_signatures(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    sim = pandas_udf(lambda s: _simhash_batch(s), LongType())
    return docs.select(F.col(id_col).alias("id"), sim(F.col(text_col)).alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Candidate pairs with hamming(simhash) ≤ max_hamming via 16-bit-chunk
    pigeonhole banding (max_hamming < SIMHASH_CHUNKS required for
    completeness of the banding)."""
    sigs = simhash_signatures(docs, id_col, text_col)
    chunks = sigs.select(
        "id",
        "simhash",
        F.posexplode(
            F.expr(
                "transform(sequence(0, 3), c -> (simhash >> (c * 16)) & 65535)"
            )
        ).alias("chunk_id", "chunk_val"),
    )
    left = chunks.select(F.col("id").alias("a_id"), F.col("simhash").alias("a_sig"), "chunk_id", "chunk_val")
    right = chunks.select(F.col("id").alias("b_id"), F.col("simhash").alias("b_sig"), "chunk_id", "chunk_val")
    cand = (
        left.join(right, ["chunk_id", "chunk_val"])
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "a_sig", "b_sig")
        .distinct()
    )
    hamming = F.bit_count(F.col("a_sig").bitwiseXOR(F.col("b_sig")))
    return (
        cand.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )


# ---------------------------------------------------------------------------
# embedding cosine dedup
# ---------------------------------------------------------------------------


def _cosine_expr(a, b):
    """Sequential-order double-precision cosine over two float arrays —
    JVM higher-order functions, no UDF. Summation order is left-to-right
    on both engines, so DuckDB oracle parity holds to the ulp."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    return dot / (na * nb)


def embedding_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All (a, b) with cosine ≥ threshold — brute-force O(n²) verifier.
    At scale run similarity.hyperplane_lsh_pairs instead (bucketed
    candidates, exact verify inside buckets)."""
    a = embeddings.select(F.col(id_col).alias("a_id"), F.col(vec_col).alias("a_vec"))
    b = embeddings.select(F.col(id_col).alias("b_id"), F.col(vec_col).alias("b_vec"))
    return (
        a.crossJoin(b)
        .where(F.col("a_id") < F.col("b_id"))
        .withColumn("cosine", _cosine_expr(F.col("a_vec"), F.col("b_vec")))
        .where(F.col("cosine") >= F.lit(threshold))
        .select("a_id", "b_id", F.round("cosine", 6).alias("cosine"))
    )


# ---------------------------------------------------------------------------
# connected components over near-dup pairs (cluster dedup)
# ---------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iter: int = 50,
) -> DataFrame:
    """(a, b) near-dup edges → (node, cluster_id=min id in component).

    The "keep one per group" step after ANY pair-producing dedup (MinHash,
    SimHash, embedding-LSH): pairs only say "these two match"; dedup needs
    the transitive closure. Iterative min-label propagation with pointer
    jumping — each round every node adopts the min of its own label and its
    neighbors' labels, then follows its label's label (path halving), so
    convergence is O(log diameter) rounds rather than O(diameter) — a
    100-million-node chain converges in ~27 rounds, not 10^8. Per round:
    two key joins + one groupBy — all shuffles on the node id key; the
    driver only checks the converged-count, so the loop is
    batch-synchronous exactly like the crawl loop, not a collect().
    Raises if max_iter rounds pass without a fixpoint (silent
    non-convergence would mis-cluster)."""
    a, b = F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    edges = (
        pairs.select(a, b)
        .unionByName(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .persist()
    )
    labels.count()
    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels.withColumnRenamed("node", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
            .withColumnRenamed("src", "node")
        )
        prop = labels.select(
            "node",
            F.col("label").alias("_old"),
        ).join(neighbor_min, "node", "left").select(
            "node",
            "_old",
            F.least(F.col("_old"), F.coalesce(F.col("nmin"), F.col("_old"))).alias("label"),
        )
        # pointer jump (path halving): label <- label_of(label). Labels
        # are always node ids in the same component and only decrease, so
        # composing the node->label map with itself halves chain depth —
        # total rounds O(log diameter) instead of O(diameter).
        mapping = prop.select(
            F.col("node").alias("_m_node"), F.col("label").alias("_m_label")
        )
        # localCheckpoint TRUNCATES the logical plan each round — without
        # it every iteration re-analyzes the whole nested lineage and the
        # driver OOMs on deep chains (persist caches data but keeps the
        # plan; the standard iterative-graph fix)
        new_labels = (
            prop.join(mapping, prop["label"] == mapping["_m_node"], "left")
            .select(
                prop["node"],
                F.least(
                    prop["label"],
                    F.coalesce(F.col("_m_label"), prop["label"]),
                ).alias("label"),
                F.col("_old"),
            )
            .withColumn("_changed", F.col("label") < F.col("_old"))
            .drop("_old")
            .localCheckpoint(eager=True)
        )
        changed = new_labels.where(F.col("_changed")).count()
        labels.unpersist()
        labels = new_labels.drop("_changed")
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    return labels.select(F.col("node"), F.col("label").alias("cluster_id"))
