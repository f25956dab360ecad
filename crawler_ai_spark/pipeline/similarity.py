"""Approximate-nearest-neighbor search over an embedding column.

Three strategies, same output contract (query_id, rank, neighbor_id, cosine):

- BRUTE FORCE (``cosine_topk``): query-set × corpus crossJoin with the
  corpus side broadcast when small, window top-k. Exact; O(|Q|·|C|).
  This is the verifier and the right plan when |Q| is small (the usual
  "find neighbors of these 1k probes in the 10B corpus" shape BROADCASTS
  THE QUERIES, scans the corpus once, and aggregates per query — one pass,
  no shuffle of the corpus).
- HYPERPLANE LSH (``hyperplane_topk`` / ``hyperplane_lsh_pairs``): sign of
  r·v for k random hyperplanes → k-bit bucket signature; candidates share
  a signature band; exact cosine inside buckets. The corpus shuffles once
  on (table_id, band_hash) — a uniform key. Recall is tunable by
  (n_tables, band_bits); collisions P = (1-θ/π)^bits per table.
- IVF (``ivf_topk``): spherical-k-means coarse quantizer trained on a
  driver-side sample; corpus assigned to cells in one matmul pass; each
  query probes its n_probe nearest cells. Work ≈ n_probe/n_centroids of
  the corpus per query batch; recall tunable by n_probe.

The hyperplanes are generated from a seeded numpy RNG on the DRIVER —
every executor sees identical planes. Signatures default to ONE
Arrow-batched BLAS matmul per partition batch (with_lsh_signature_pandas;
JVM higher-order-function lambdas evaluate interpreted and are ~50×
slower per vector); the pure-expression JVM variant is kept as a
cross-implementation check, and a test pins exact bucket agreement
between the two."""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from crawler_ai_spark.pipeline.dedup import _cosine_expr


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    q_id: str = "query_id",
    c_id: str = "vec_id",
    vec_col: str = "embedding",
    broadcast_queries: bool = True,
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    Ties and float noise: rank orders by (round(cosine, 6) desc, id asc) so
    the result is bit-deterministic and engine-portable."""
    q = queries.select(F.col(q_id).alias("query_id"), F.col(vec_col).alias("q_vec"))
    c = corpus.select(F.col(c_id).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    if broadcast_queries:
        q = F.broadcast(q)
    scored = q.crossJoin(c).withColumn(
        "cosine", F.round(_cosine_expr(F.col("q_vec"), F.col("c_vec")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def _hyperplanes(dim: int, n_tables: int, bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, bits, dim))


def with_lsh_signature_pandas(
    df: DataFrame,
    dim: int,
    n_tables: int = 8,
    bits: int = 12,
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """``sig`` via ONE Arrow-batched BLAS matmul per partition batch:
    S = V @ P.T (n×dim by dim×(tables·bits)), sign bits packed per table.

    Why this exists next to the expression variant: higher-order-function
    lambdas (aggregate/zip_with) are evaluated INTERPRETED per element —
    ~60 µs/vector for 48 planes×64 dims — while the matmul is <1 µs/vector.
    At 10^10 vectors that is ~170 core-hours vs ~3; the Arrow hop is noise
    against a 50× data-path win, so this is the registered scale path.

    Sign boundaries: numpy's pairwise/BLAS summation can disagree with the
    sequential fold when |dot| ~ 1e-16; with continuous random planes the
    probability is ~0 and LSH is tolerant by construction (verify step is
    exact cosine)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    planes = _hyperplanes(dim, n_tables, bits, seed)
    proj = planes.reshape(n_tables * bits, dim).T.copy()  # dim × (tables·bits)
    weights = (1 << np.arange(bits)).astype(np.int64)

    def _sig(s):
        v = np.stack(s.to_numpy())  # n × dim
        signs = (v.astype(np.float64) @ proj) >= 0  # n × (tables·bits)
        per_table = signs.reshape(len(v), n_tables, bits)
        sigs = (per_table * weights).sum(axis=2).astype(np.int64)
        return pd.Series(list(sigs))

    _sig.__annotations__ = {"s": pd.Series, "return": pd.Series}
    udf = pandas_udf(_sig, "array<long>")
    return df.withColumn("sig", udf(F.col(vec_col)))


def with_lsh_signature(
    df: DataFrame,
    dim: int,
    n_tables: int = 8,
    bits: int = 12,
    vec_col: str = "embedding",
    seed: int = 42,
    impl: str = "pandas",
) -> DataFrame:
    """Adds ``sig`` ARRAY<BIGINT>[n_tables]: per-table bucket id = the
    sign-bit pattern of the hyperplane projections.

    impl="pandas" (default): one BLAS matmul per Arrow batch — the scale
    path (see with_lsh_signature_pandas). impl="jvm": each plane's dot
    product as an ``aggregate(zip_with(...))`` over literal plane
    coefficients — no Python in the plan, but HOF lambdas evaluate
    interpreted, so it is ~50× slower per vector; kept as the
    cross-implementation check (tests assert both produce the same
    buckets)."""
    if impl == "pandas":
        return with_lsh_signature_pandas(df, dim, n_tables, bits, vec_col, seed)
    planes = _hyperplanes(dim, n_tables, bits, seed)
    table_sigs = []
    for t in range(n_tables):
        bit_terms = None
        for b in range(bits):
            # one array Literal per plane (not dim scalar literals): the
            # plan stays n_tables×bits nodes instead of ×dim more — cuts
            # Catalyst/codegen compile time ~5x on wide signatures
            coeffs = F.lit([float(x) for x in planes[t, b]])
            dot = F.aggregate(
                F.zip_with(F.col(vec_col), coeffs, lambda v, c: v.cast("double") * c),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            bit = F.when(dot >= 0, F.lit(1 << b)).otherwise(F.lit(0))
            bit_terms = bit if bit_terms is None else (bit_terms + bit)
        table_sigs.append(bit_terms.cast("long"))
    return df.withColumn("sig", F.array(*table_sigs))


def hyperplane_lsh_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    n_tables: int = 8,
    bits: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs (cosine ≥ threshold) via LSH buckets + exact verify —
    the scale path behind dedup.embedding_dup_pairs."""
    sigs = with_lsh_signature(
        embeddings.select(id_col, vec_col), dim, n_tables, bits, vec_col, seed
    )
    banded = sigs.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.posexplode("sig").alias("table_id", "bucket"),
    )
    a = banded.select(F.col("id").alias("a_id"), F.col("vec").alias("a_vec"), "table_id", "bucket")
    b = banded.select(F.col("id").alias("b_id"), F.col("vec").alias("b_vec"), "table_id", "bucket")
    cand = (
        a.join(b, ["table_id", "bucket"])
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "a_vec", "b_id", "b_vec")
        .distinct()
    )
    return (
        cand.withColumn("cosine", _cosine_expr(F.col("a_vec"), F.col("b_vec")))
        .where(F.col("cosine") >= F.lit(threshold))
        .select("a_id", "b_id", F.round("cosine", 6).alias("cosine"))
    )


def train_ivf_centroids(
    sample: np.ndarray, n_centroids: int, iters: int = 10, seed: int = 42
) -> np.ndarray:
    """Spherical k-means (normalize → assign by max dot → mean →
    renormalize) on a DRIVER-side sample — the IVF coarse quantizer.
    Deterministic: seeded kmeans++-style init, fixed iteration count.
    At 10^10 vectors the quantizer still trains on a bounded sample
    (~100k rows ≈ 25 MB at dim 64); only assignment is distributed."""
    rng = np.random.default_rng(seed)
    x = sample.astype(np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    # kmeans++ seeding on the sample
    centroids = [x[rng.integers(len(x))]]
    for _ in range(n_centroids - 1):
        d = 1.0 - np.max(np.stack([x @ c for c in centroids]), axis=0)
        d = np.maximum(d, 0.0)
        probs = d / d.sum() if d.sum() > 0 else np.full(len(x), 1.0 / len(x))
        centroids.append(x[rng.choice(len(x), p=probs)])
    c = np.stack(centroids)
    for _ in range(iters):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(n_centroids):
            members = x[assign == j]
            if len(members):
                c[j] = members.mean(axis=0)
            else:  # empty cell — reseed to the point farthest from its centroid
                worst = np.argmin((x * c[assign]).sum(axis=1))
                c[j] = x[worst]
        c = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
    return c


def _ivf_cells_udf(centroids: np.ndarray, n_probe: int):
    """Pandas UDF: the ``n_probe`` nearest cells per vector (by cosine),
    one BLAS matmul per Arrow batch. n_probe=1 is corpus assignment."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ct = centroids.T.copy()

    def _cells(s):
        v = np.stack(s.to_numpy()).astype(np.float64)
        v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        scores = v @ ct
        top = np.argsort(-scores, axis=1)[:, :n_probe].astype(np.int32)
        return pd.Series(list(top))

    _cells.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_cells, "array<int>")


def _train_from_corpus(
    ids: DataFrame, n_centroids: int, max_train: int, seed: int
) -> np.ndarray:
    """Deterministic bounded training sample (hash-sample, sorted limit)
    + spherical k-means — shared by the inline and persisted IVF paths."""
    n = ids.count()
    keep_mod = max(1, n // max_train)
    sample_rows = (
        ids.where(F.pmod(F.xxhash64(F.col("neighbor_id")), F.lit(keep_mod)) == 0)
        .orderBy("neighbor_id")
        .limit(max_train)
        .select("c_vec")
        .collect()
    )
    return train_ivf_centroids(
        np.stack([r.c_vec for r in sample_rows]), n_centroids, seed=seed
    )


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """The shared tail: deterministic (cosine desc, id asc) window rank."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 6,
    max_train: int = 100_000,
    q_id: str = "query_id",
    c_id: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF approximate top-k: spherical-k-means coarse quantizer, corpus
    assigned to its nearest cell, each query probes its ``n_probe``
    nearest cells, exact cosine + window rank inside the probed cells.

    The 100 TB shape: the quantizer trains once on a driver-side sample
    (deterministic hash sample, bounded collect); corpus assignment is one
    Arrow-batched matmul pass, ideally persisted partitioned-by-cell and
    reused across query batches; the probe join BROADCASTS the exploded
    query side, so the corpus is scanned once with no shuffle. Work
    touched ≈ n_probe/n_centroids of the corpus vs all of it for brute
    force. Recall < 1 by design — measured vs cosine_topk in pytest."""
    ids = corpus.select(F.col(c_id).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    centroids = _train_from_corpus(ids, n_centroids, max_train, seed)

    assigned = ids.withColumn(
        "cell", _ivf_cells_udf(centroids, 1)(F.col("c_vec"))[0]
    )
    probes = (
        queries.select(F.col(q_id).alias("query_id"), F.col(vec_col).alias("q_vec"))
        .withColumn("cells", _ivf_cells_udf(centroids, n_probe)(F.col("q_vec")))
        .select("query_id", "q_vec", F.explode("cells").alias("cell"))
    )
    scored = (
        F.broadcast(probes)
        .join(assigned, "cell")
        .withColumn("cosine", F.round(_cosine_expr(F.col("q_vec"), F.col("c_vec")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def build_ivf_index(
    corpus: DataFrame,
    index_path: str,
    n_centroids: int = 16,
    max_train: int = 100_000,
    c_id: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> np.ndarray:
    """Persist an IVF index: the corpus assigned to cells and written
    ``partitionBy(cell)`` (plus the centroids as parquet) — the
    index-once / query-many shape for a static corpus. Each query batch
    then reads ONLY its probed cells via partition pruning: at 10^10
    vectors a 6-of-1024-cell probe touches ~0.6% of the files, and the
    quantizer never retrains per query. Returns the centroid matrix."""
    import pandas as pd

    ids = corpus.select(F.col(c_id).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    centroids = _train_from_corpus(ids, n_centroids, max_train, seed)
    assigned = ids.withColumn("cell", _ivf_cells_udf(centroids, 1)(F.col("c_vec"))[0])
    assigned.write.mode("overwrite").partitionBy("cell").parquet(f"{index_path}/cells")
    spark = corpus.sparkSession
    cent_pdf = pd.DataFrame(
        {
            "cell": range(len(centroids)),
            "centroid": [c.tolist() for c in centroids],
        }
    )
    spark.createDataFrame(cent_pdf).coalesce(1).write.mode("overwrite").parquet(
        f"{index_path}/centroids"
    )
    return centroids


def ivf_topk_indexed(
    spark,
    index_path: str,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 6,
    q_id: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query a persisted IVF index: probe cells per query, read only
    those partitions (``cell IN (...)`` prunes at scan planning), exact
    cosine + rank inside. The broadcast side is the exploded query set;
    the index is never shuffled."""
    cent_rows = spark.read.parquet(f"{index_path}/centroids").orderBy("cell").collect()
    centroids = np.array([r.centroid for r in cent_rows])
    probes = (
        queries.select(F.col(q_id).alias("query_id"), F.col(vec_col).alias("q_vec"))
        .withColumn("cells", _ivf_cells_udf(centroids, n_probe)(F.col("q_vec")))
        .select("query_id", "q_vec", F.explode("cells").alias("cell"))
    ).persist()  # consumed twice: the cell-list collect and the probe join
    probed_cells = sorted({r.cell for r in probes.select("cell").distinct().collect()})
    index = spark.read.parquet(f"{index_path}/cells").where(
        F.col("cell").isin(probed_cells)  # partition pruning at the scan
    )
    scored = (
        F.broadcast(probes)
        .join(index, "cell")
        .withColumn("cosine", F.round(_cosine_expr(F.col("q_vec"), F.col("c_vec")), 6))
    )
    return _rank_topk(scored, k)


def hyperplane_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_tables: int = 8,
    bits: int = 10,
    q_id: str = "query_id",
    c_id: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: union of LSH-bucket candidates across tables,
    exact cosine + window rank. Recall < 1 by design — compare against
    cosine_topk to measure it (tests do)."""
    q = with_lsh_signature(
        queries.select(F.col(q_id).alias("query_id"), F.col(vec_col).alias("q_vec")),
        dim, n_tables, bits, "q_vec", seed,
    ).select("query_id", "q_vec", F.posexplode("sig").alias("table_id", "bucket"))
    c = with_lsh_signature(
        corpus.select(F.col(c_id).alias("neighbor_id"), F.col(vec_col).alias("c_vec")),
        dim, n_tables, bits, "c_vec", seed,
    ).select("neighbor_id", "c_vec", F.posexplode("sig").alias("table_id", "bucket"))
    cand = (
        F.broadcast(q)
        .join(c, ["table_id", "bucket"])
        .select("query_id", "q_vec", "neighbor_id", "c_vec")
        .distinct()
    )
    scored = cand.withColumn(
        "cosine", F.round(_cosine_expr(F.col("q_vec"), F.col("c_vec")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )
