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
    ids: DataFrame, n_centroids: int, max_train: int, seed: int,
    return_sample: bool = False,
):
    """Deterministic bounded training sample (hash-sample, sorted limit)
    + spherical k-means — shared by the inline and persisted IVF paths.
    ``return_sample`` also hands back the raw sample matrix so callers
    that train MORE quantizers on it (IVF-PQ codebooks) don't re-scan the
    corpus and re-collect the identical rows."""
    n = ids.count()
    keep_mod = max(1, n // max_train)
    sample_rows = (
        ids.where(F.pmod(F.xxhash64(F.col("neighbor_id")), F.lit(keep_mod)) == 0)
        .orderBy("neighbor_id")
        .limit(max_train)
        .select("c_vec")
        .collect()
    )
    sample = np.stack([r.c_vec for r in sample_rows])
    centroids = train_ivf_centroids(sample, n_centroids, seed=seed)
    if return_sample:
        return centroids, sample
    return centroids


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


# ---------------------------------------------------------------------------
# IVF-PQ (Jégou et al. 2011, "Product Quantization for Nearest Neighbor
# Search") — the memory-bounded 10^10-vector design: the coarse IVF
# quantizer prunes the corpus to n_probe cells, and inside a cell each
# vector is stored as m sub-space code ids (m bytes at k=256; here
# m×log2(k) bits) instead of d floats — a 64-dim float32 vector (256 B)
# compresses to 8 codes. Queries score candidates by ASYMMETRIC DISTANCE
# COMPUTATION: one m×k lookup table per query (q_sub · codebook), then a
# table-gather per candidate — no decoded vectors, no original corpus
# read. Residual encoding (vector − its cell centroid) as in the paper.
# ---------------------------------------------------------------------------


def train_pq_codebooks(
    residuals: np.ndarray, m: int = 8, k: int = 16, iters: int = 10, seed: int = 7
) -> np.ndarray:
    """Per-subspace k-means on a driver-side residual sample → (m, k,
    d/m) codebooks. Deterministic: seeded kmeans++-style init, fixed
    iterations, empty-cluster reseed to the worst-quantized point."""
    n, d = residuals.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    rng = np.random.default_rng(seed)
    books = np.zeros((m, k, sub))
    for j in range(m):
        x = residuals[:, j * sub : (j + 1) * sub].astype(np.float64)
        cents = [x[rng.integers(n)]]
        for _ in range(k - 1):
            d2 = np.min(
                np.stack([((x - c) ** 2).sum(axis=1) for c in cents]), axis=0
            )
            probs = d2 / d2.sum() if d2.sum() > 0 else np.full(n, 1.0 / n)
            cents.append(x[rng.choice(n, p=probs)])
        c = np.stack(cents)
        for _ in range(iters):
            d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for ci in range(k):
                members = x[assign == ci]
                if len(members):
                    c[ci] = members.mean(axis=0)
                else:
                    c[ci] = x[np.argmax(d2[np.arange(n), assign])]
        books[j] = c
    return books


def _pq_encode_udf(centroids: np.ndarray, codebooks: np.ndarray):
    """Pandas UDF: normalized vector → (its cell's residual) → m code
    ids. One vectorized pass per Arrow batch."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    m, k, sub = codebooks.shape

    def _encode(vec, cell):
        v = np.stack(vec.to_numpy()).astype(np.float64)
        v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        r = v - centroids[cell.to_numpy().astype(np.int64)]
        codes = np.zeros((len(v), m), dtype=np.int32)
        for j in range(m):
            xj = r[:, j * sub : (j + 1) * sub]
            d2 = ((xj[:, None, :] - codebooks[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = np.argmin(d2, axis=1)
        return pd.Series(list(codes))

    _encode.__annotations__ = {"vec": pd.Series, "cell": pd.Series, "return": pd.Series}
    return pandas_udf(_encode, "array<int>")


def build_ivfpq_index(
    corpus: DataFrame,
    index_path: str,
    n_centroids: int = 16,
    m: int = 8,
    pq_k: int = 16,
    max_train: int = 100_000,
    c_id: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> None:
    """Persist an IVF-PQ index: per cell, only (neighbor_id, code) rows —
    the original vectors are NOT stored (that is the point: at 10^10
    vectors the index is m·log2(k)/8 bytes/vector plus ids). Coarse
    centroids and PQ codebooks land beside the cells as tiny parquet."""
    import pandas as pd

    ids = corpus.select(F.col(c_id).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    centroids, sample = _train_from_corpus(
        ids, n_centroids, max_train, seed, return_sample=True
    )
    x = sample.astype(np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    assign = np.argmax(x @ centroids.T, axis=1)
    books = train_pq_codebooks(x - centroids[assign], m=m, k=pq_k, seed=seed + 1)

    assigned = ids.withColumn("cell", _ivf_cells_udf(centroids, 1)(F.col("c_vec")))
    assigned = assigned.withColumn("cell", F.col("cell")[0]).withColumn(
        "code", _pq_encode_udf(centroids, books)(F.col("c_vec"), F.col("cell"))
    )
    assigned.select("neighbor_id", "code", "cell").write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(f"{index_path}/cells")
    spark = corpus.sparkSession
    spark.createDataFrame(
        pd.DataFrame(
            {"cell": range(len(centroids)), "centroid": [c.tolist() for c in centroids]}
        )
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_path}/centroids")
    book_rows = [
        (j, ci, books[j, ci].tolist())
        for j in range(m)
        for ci in range(pq_k)
    ]
    spark.createDataFrame(
        book_rows, "subspace int, code int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{index_path}/codebooks")


def _adc_score_udf(centroids: np.ndarray, codebooks: np.ndarray):
    """Pandas UDF: asymmetric distance computation. Per Arrow batch, one
    m×k lookup table per DISTINCT query; per candidate row a gather+sum:
    score ≈ q̂·(cell_centroid + decoded_residual)
          = q̂·c_cell + Σ_j (q̂_sub_j · codebook[j][code_j])."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    m, k, sub = codebooks.shape

    def _score(qv, cell, code):
        q = np.stack(qv.to_numpy()).astype(np.float64)
        q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        # LUT per distinct query in the batch
        keys = [v.tobytes() for v in q]
        luts: dict[bytes, np.ndarray] = {}
        for key, vec in zip(keys, q):
            if key not in luts:
                lut = np.zeros((m, k))
                for j in range(m):
                    lut[j] = codebooks[j] @ vec[j * sub : (j + 1) * sub]
                luts[key] = lut
        cells = cell.to_numpy().astype(np.int64)
        codes = np.stack(code.to_numpy()).astype(np.int64)
        coarse = (q * centroids[cells]).sum(axis=1)
        res = np.zeros(len(q))
        for i, key in enumerate(keys):
            res[i] = luts[key][np.arange(m), codes[i]].sum()
        return pd.Series(np.round(coarse + res, 6))

    _score.__annotations__ = {
        "qv": pd.Series, "cell": pd.Series, "code": pd.Series, "return": pd.Series
    }
    return pandas_udf(_score, "double")


def ivfpq_topk_indexed(
    spark,
    index_path: str,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 6,
    q_id: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query a persisted IVF-PQ index: probe cells per query (partition
    pruning at the scan), ADC-score the candidates from codes alone, rank
    deterministically. Returns (query_id, rank, neighbor_id, score) —
    score is the approximate inner product, not exact cosine (nothing to
    decode it from; that is the compression trade)."""
    import pandas as pd  # noqa: F401 - Arrow path

    cent_rows = spark.read.parquet(f"{index_path}/centroids").orderBy("cell").collect()
    centroids = np.array([r.centroid for r in cent_rows])
    book_rows = (
        spark.read.parquet(f"{index_path}/codebooks").orderBy("subspace", "code").collect()
    )
    m = 1 + max(r.subspace for r in book_rows)
    pq_k = 1 + max(r.code for r in book_rows)
    books = np.zeros((m, pq_k, len(book_rows[0].centroid)))
    for r in book_rows:
        books[r.subspace, r.code] = r.centroid

    probes = (
        queries.select(F.col(q_id).alias("query_id"), F.col(vec_col).alias("q_vec"))
        .withColumn("cells", _ivf_cells_udf(centroids, n_probe)(F.col("q_vec")))
        .select("query_id", "q_vec", F.explode("cells").alias("cell"))
    ).persist()
    probed_cells = sorted({r.cell for r in probes.select("cell").distinct().collect()})
    index = spark.read.parquet(f"{index_path}/cells").where(
        F.col("cell").isin(probed_cells)
    )
    scored = (
        F.broadcast(probes)
        .join(index, "cell")
        .withColumn(
            "score",
            _adc_score_udf(centroids, books)(
                F.col("q_vec"), F.col("cell"), F.col("code")
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "score")
    )


def ivfpq_topk_refined(
    spark,
    index_path: str,
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_probe: int = 6,
    shortlist_mult: int = 4,
    q_id: str = "query_id",
    c_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ with exact re-ranking (the FAISS ``IndexRefine`` pattern):
    ADC produces a shortlist of ``shortlist_mult``·k candidates per query
    from codes alone, then ONLY those candidates' original vectors are
    point-looked-up for exact cosine and the final rank. At 10^10 vectors
    the refine step reads ~shortlist_mult·k·|Q| rows by id — a broadcast
    semi-join against id-clustered storage, not a corpus scan — which is
    how production PQ deployments recover brute-force-grade top-k from a
    bytes-per-vector index."""
    shortlist = ivfpq_topk_indexed(
        spark, index_path, queries, k=shortlist_mult * k, n_probe=n_probe,
        q_id=q_id, vec_col=vec_col,
    ).select("query_id", "neighbor_id")
    qv = queries.select(F.col(q_id).alias("query_id"), F.col(vec_col).alias("q_vec"))
    cv = corpus.select(F.col(c_id).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    exact = (
        F.broadcast(shortlist.join(qv, "query_id"))
        .join(cv, "neighbor_id")
        .withColumn("cosine", F.round(_cosine_expr(F.col("q_vec"), F.col("c_vec")), 6))
    )
    return _rank_topk(exact, k)


def sq8_params(corpus: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-DIMENSION min/max over the corpus — the SQ8 training pass
    (one exploded aggregation, one output row per dimension), returned
    as a ONE-ROW frame of dim-ordered arrays ready to broadcast."""
    dims = corpus.select(
        F.posexplode(vec_col).alias("dim", "v")
    ).groupBy("dim").agg(
        F.min(F.col("v").cast("double")).alias("lo"),
        F.max(F.col("v").cast("double")).alias("hi"),
    )
    return dims.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "lo"))), lambda s: s["lo"]
        ).alias("los"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "hi"))), lambda s: s["hi"]
        ).alias("his"),
    )


def _sq8_codes(vec, los, his):
    # floor((v - lo) * 255 / (hi - lo)) clamped to [0, 255]; degenerate
    # dims (hi == lo) code to 0
    return F.zip_with(
        vec,
        F.zip_with(los, his, lambda lo, hi: F.struct(lo.alias("lo"), hi.alias("hi"))),
        lambda v, p: F.when(p["hi"] == p["lo"], F.lit(0)).otherwise(
            F.least(
                F.lit(255),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (v.cast("double") - p["lo"]) * F.lit(255.0)
                        / (p["hi"] - p["lo"])
                    ).cast("int"),
                ),
            )
        ),
    )


def _sq8_dequant(codes, los, his):
    return F.zip_with(
        codes,
        F.zip_with(los, his, lambda lo, hi: F.struct(lo.alias("lo"), hi.alias("hi"))),
        lambda c, p: p["lo"] + c.cast("double") * (p["hi"] - p["lo"]) / F.lit(255.0),
    )


def sq8_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    q_id: str = "query_id",
    c_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scalar-quantized approximate top-k — the third quantization memory
    path next to IVF and IVF-PQ: corpus vectors stored as one uint8 code
    per dimension (4× smaller than float32; at 10^10 vectors the codes
    fit where the floats don't), queries scored in float against the
    DEQUANTIZED codes. Training is one exploded min/max aggregation; the
    (lo, hi) arrays are a one-row broadcast; scoring is the same
    broadcast-queries single corpus scan as cosine_topk. Everything is
    JVM higher-order functions — no Python, and the quantize→dequant
    arithmetic is plain doubles, reproducible in the SQL oracle. Recall
    vs the exact path is pinned in pytest (SQ8 error is bounded by the
    per-dim step, so recall is near-1 on real spreads)."""
    params = sq8_params(corpus, vec_col)
    c = (
        corpus.select(F.col(c_id).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
        .crossJoin(F.broadcast(params))
        .select(
            "neighbor_id",
            _sq8_codes(F.col("c_vec"), F.col("los"), F.col("his")).alias("codes"),
            "los",
            "his",
        )
        .select(
            "neighbor_id",
            _sq8_dequant(F.col("codes"), F.col("los"), F.col("his")).alias("dq_vec"),
        )
    )
    q = F.broadcast(
        queries.select(F.col(q_id).alias("query_id"), F.col(vec_col).alias("q_vec"))
    )
    from crawler_ai_spark.pipeline.dedup import _cosine_expr

    scored = q.crossJoin(c).withColumn(
        "cosine", F.round(_cosine_expr(F.col("q_vec"), F.col("dq_vec")), 6)
    )
    return _rank_topk(scored, k)


# ---------------------------------------------------------------------------
# MMR — maximal marginal relevance (Carbonell & Goldstein, SIGIR'98):
# diversity-aware top-k. Plain top-k returns near-duplicates of the
# best hit; MMR greedily selects argmax λ·rel(c) − (1−λ)·max_sim(c,
# selected), so each pick balances relevance against redundancy — the
# standard rerank for retrieval UIs and for picking DIVERSE exemplars
# out of a training corpus.
# ---------------------------------------------------------------------------


def mmr_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    shortlist: int = 20,
    lam: float = 0.7,
    q_id: str = "query_id",
) -> DataFrame:
    """(query_id, pos, neighbor_id, mmr_score): greedy MMR over each
    query's relevance shortlist.

    Determinism discipline: BOTH the relevance cosines and the
    candidate-pair cosines are computed in-plan by the sequential-fold
    expression and rounded to 6 dp, so the greedy (which runs per query
    in an Arrow-batched applyInPandas over those already-quantized
    doubles — pure comparisons, no recomputation) makes bit-identical
    decisions in any engine; ties break by neighbor_id.

    Scale shape: relevance = the existing cosine_topk (crossJoin at
    sandbox SF; swap the ANN paths in at 10^10 vectors — the MMR stage
    only consumes (id, rel) pairs), pair sims = shortlist² per query
    (bounded by construction, one self-join), greedy = one pass per
    query over ≤ shortlist² cached sims."""
    import pandas as pd

    from crawler_ai_spark.pipeline.dedup import _cosine_expr

    rel = cosine_topk(queries, corpus, k=shortlist, q_id=q_id).select(
        q_id, "neighbor_id", F.col("cosine").alias("rel")
    )
    emb = corpus.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("vec")
    )
    cand = rel.join(emb, "neighbor_id")
    a = cand.select(q_id, F.col("neighbor_id").alias("a_id"), F.col("vec").alias("a_vec"))
    b = cand.select(
        F.col(q_id).alias("_q2"), F.col("neighbor_id").alias("b_id"),
        F.col("vec").alias("b_vec"),
    )
    sims = (
        a.join(b, (F.col(q_id) == F.col("_q2")) & (F.col("a_id") < F.col("b_id")))
        .select(
            q_id, "a_id", "b_id",
            F.round(_cosine_expr(F.col("a_vec"), F.col("b_vec")), 6).alias("sim"),
        )
    )
    # ship rel + sims into one grouped frame: y = -1 tags relevance rows
    packed = cand.select(
        q_id, F.col("neighbor_id").alias("x"), F.lit(-1).cast("long").alias("y"),
        F.col("rel").alias("v"),
    ).unionByName(
        sims.select(
            q_id, F.col("a_id").alias("x"), F.col("b_id").cast("long").alias("y"),
            F.col("sim").alias("v"),
        )
    )

    def _greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = pdf[q_id].iloc[0]
        rels = {int(r.x): float(r.v) for r in pdf[pdf.y < 0].itertuples()}
        sim = {}
        for r in pdf[pdf.y >= 0].itertuples():
            sim[(int(r.x), int(r.y))] = float(r.v)
            sim[(int(r.y), int(r.x))] = float(r.v)
        selected: list[tuple[int, float]] = []
        remaining = set(rels)
        while remaining and len(selected) < k:
            best = None
            for c in sorted(remaining):  # id-asc scan: ties keep lowest id
                ms = max((sim.get((c, s), 0.0) for s, _ in selected), default=0.0)
                score = round(lam * rels[c] - (1.0 - lam) * ms, 6)
                if best is None or score > best[1]:
                    best = (c, score)
            selected.append(best)
            remaining.discard(best[0])
        return pd.DataFrame(
            {
                q_id: [qid] * len(selected),
                "pos": range(1, len(selected) + 1),
                "neighbor_id": [s for s, _ in selected],
                "mmr_score": [v for _, v in selected],
            }
        )

    out_schema = f"{q_id} long, pos int, neighbor_id long, mmr_score double"
    return packed.groupBy(q_id).applyInPandas(_greedy, schema=out_schema)
