"""Persistent incremental MinHash-LSH dedup index.

The batch dedup operators in dedup.py answer "which pairs inside THIS
corpus are near-dups" — an O(corpus) job every time it runs. A
continuous crawl needs the other shape: a 100 TB corpus already
deduplicated once, and every new crawl batch (10^6-10^9 docs) checked
against it WITHOUT touching the corpus again. This module persists the
banded-LSH state of the corpus as two parquet tables and makes each
new batch a probe:

- ``buckets/``  — (id, band_id, band_hash), partitioned by band_id.
  A probe joins only on (band_id, band_hash): per-band partition
  pruning + a uniform 64-bit join key, the same unskewed shuffle shape
  as dedup.py's in-corpus banding.
- ``shingles/`` — (id, sh_hashes ARRAY<BIGINT>): xxhash64 of each
  distinct word-n-gram shingle, sorted. Candidates are exact-verified
  with true Jaccard over these hashed sets, so index precision is
  exact; hashing shingles to 8 bytes is what keeps the verify payload
  ~100× smaller than re-reading corpus text (collision odds at 64 bits
  are ~1e-19 per pair — below band-miss recall loss by 13 orders).
- ``meta.json`` — banding parameters; append-time compatibility gate.

Incremental growth: batch survivors (docs with no match in the index)
are appended as new parquet files under the same two tables — no
rewrite of existing index files, so indexing cost per batch is
O(batch), never O(corpus).

Reference note: the reference dedups only within one extraction run
(job_extraction_service.py:658-673); this is the cross-run persistent
generalization a crawl corpus needs.
"""

from __future__ import annotations

import json
import pathlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import LSH_BANDS, MINHASH_N, _signatures_from_shingles, with_shingles

_DEFAULTS = {"n_hashes": MINHASH_N, "bands": LSH_BANDS, "shingle_n": 3}


def _shingled(docs: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    return with_shingles(docs.select(id_col, text_col), text_col, n).select(
        F.col(id_col).alias("id"), "shingles"
    )


def _banded(sigs: DataFrame, n_hashes: int, bands: int) -> DataFrame:
    rows = n_hashes // bands
    return sigs.select(
        "id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), "
                f"b -> xxhash64(concat_ws(',', slice(sig, b * {rows} + 1, {rows})), b))"
            )
        ).alias("band_id", "band_hash"),
    )


def _hashed_shingles(sh: DataFrame) -> DataFrame:
    return sh.select(
        "id",
        F.array_sort(
            F.array_distinct(F.expr("transform(shingles, s -> xxhash64(s))"))
        ).alias("sh_hashes"),
    )


def _read_meta(path) -> dict:
    return json.loads((pathlib.Path(path) / "meta.json").read_text())


def build_lsh_index(
    docs: DataFrame,
    path,
    *,
    n_hashes: int = MINHASH_N,
    bands: int = LSH_BANDS,
    shingle_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    _mode: str = "overwrite",
) -> dict:
    """Build (or with ``_mode="append"`` via :func:`append_to_index`,
    extend) the persisted index from ``docs``. One shingling pass feeds
    both tables; nothing is collected. Returns the meta dict."""
    p = pathlib.Path(path)
    meta = {"n_hashes": n_hashes, "bands": bands, "shingle_n": shingle_n}
    if _mode == "append":
        existing = _read_meta(p)
        if existing != meta:
            raise ValueError(f"index params {existing} != append params {meta}")
    sh = _shingled(docs, id_col, text_col, shingle_n).persist()
    try:
        banded = _banded(_signatures_from_shingles(sh, n_hashes), n_hashes, bands)
        banded.write.mode(_mode).partitionBy("band_id").parquet(str(p / "buckets"))
        _hashed_shingles(sh).write.mode(_mode).parquet(str(p / "shingles"))
    finally:
        sh.unpersist()  # both writes are actions; the cache is spent
    p.mkdir(parents=True, exist_ok=True)
    (p / "meta.json").write_text(json.dumps(meta))
    return meta


def append_to_index(
    docs: DataFrame, path, *, id_col: str = "doc_id", text_col: str = "text"
) -> dict:
    """Add ``docs`` (typically a batch's survivors) to an existing index.
    Appends new parquet files only — O(batch), no index rewrite. The
    stored banding params are reused; mismatched params refuse."""
    meta = _read_meta(path)
    return build_lsh_index(
        docs,
        path,
        n_hashes=meta["n_hashes"],
        bands=meta["bands"],
        shingle_n=meta["shingle_n"],
        id_col=id_col,
        text_col=text_col,
        _mode="append",
    )


def probe_lsh_index(
    new_docs: DataFrame,
    path,
    *,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup matches of ``new_docs`` against the index: (new_id,
    idx_id, jaccard) with true hashed-shingle Jaccard ≥ threshold.
    The index is NOT scanned beyond the probed (band_id, band_hash)
    buckets plus the candidate ids' shingle rows — per-batch cost is
    O(batch + candidates), which is the whole point at 100 TB."""
    spark: SparkSession = new_docs.sparkSession
    meta = _read_meta(path)
    p = pathlib.Path(path)
    # persisted so one shingling pass feeds signatures AND the verify
    # (dedup.py:191-197 precedent); the returned plan is lazy, so the
    # cache is left to LRU eviction rather than an eager unpersist that
    # would force the caller's action to recompute the scan.
    sh_new = _shingled(new_docs, id_col, text_col, meta["shingle_n"]).persist()
    banded_new = _banded(
        _signatures_from_shingles(sh_new, meta["n_hashes"]),
        meta["n_hashes"],
        meta["bands"],
    ).select(F.col("id").alias("new_id"), "band_id", "band_hash")
    idx_buckets = spark.read.parquet(str(p / "buckets")).select(
        F.col("id").alias("idx_id"), "band_id", "band_hash"
    )
    candidates = (
        banded_new.join(idx_buckets, ["band_id", "band_hash"])
        .select("new_id", "idx_id")
        .distinct()
    )
    a = _hashed_shingles(sh_new).select(
        F.col("id").alias("new_id"), F.col("sh_hashes").alias("a_sh")
    )
    b = spark.read.parquet(str(p / "shingles")).select(
        F.col("id").alias("idx_id"), F.col("sh_hashes").alias("b_sh")
    )
    joined = candidates.join(a, "new_id").join(b, "idx_id")
    inter = F.size(F.array_intersect("a_sh", "b_sh"))
    union = F.size("a_sh") + F.size("b_sh") - inter
    return (
        joined.withColumn("jaccard", inter / union)
        .where(F.col("jaccard") >= F.lit(threshold))
        .select("new_id", "idx_id", F.round("jaccard", 6).alias("jaccard"))
    )


def dedup_against_index(
    new_docs: DataFrame,
    path,
    *,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Survivors: rows of ``new_docs`` with NO near-dup in the index.
    Anti-join on the probe's matched new ids. Feed the result to
    :func:`append_to_index` to complete one incremental-dedup batch."""
    matches = (
        probe_lsh_index(
            new_docs, path, threshold=threshold, id_col=id_col, text_col=text_col
        )
        .select(F.col("new_id").alias(id_col))
        .distinct()
    )
    return new_docs.join(matches, id_col, "left_anti")
