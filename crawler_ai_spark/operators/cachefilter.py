"""Bucket-sharded deletable cache filter — the TTL fetch-cache's
URL-seen state (reference app/services/cache.py:15-33: md5(url)-keyed,
1 h TTL, success-only) kept as per-bucket cuckoo blobs built and updated
ON EXECUTORS, mirroring the bloom-delta pattern (operators/seen.py).

Why not the single driver-resident CuckooFilter the loop used through
round 3: at the north rule's 10^10-URL frontier the live-within-TTL set
is O(fetch rate × TTL) keys — driver-memory-resident state plus an
O(fetched) Python insert loop on the driver EVERY batch, the exact
disease the seen set solved with executor-built bloom blobs. Here the
state is a DataFrame of (bucket_id, table-blob) rows:

- **build** — groupBy(bucket).applyInPandas over the live key set; each
  task builds its own shard. No driver collect.
- **update** — cogroup(blobs, keys-by-bucket): deletes (TTL expiry —
  must hit, the entry was inserted at fetch time) and insert-if-absent
  (store-on-success) applied shard-locally; only touched buckets do
  work. The blob round-trips through bytes every batch with a reset
  kick-RNG and sorted keys, so a resumed crawl replays byte-identical
  updates (tests/test_ttl_recrawl.py resume bit-identity).
- **probe** — blobs are metadata-sized (shards × fixed capacity), so the
  coherence check broadcasts the blob map (same ≤256 MB reasoning as
  seen.broadcast_probe) and runs a vectorized Arrow UDF; the "due key
  must be absent" invariant becomes an in-plan count, not a driver loop.

Shard capacity is FIXED per crawl (CrawlConfig.cache_keys_per_bucket),
like bloom_keys_per_bucket: every bucket's table has the same geometry,
updates never resize. A shard overflow raises inside the task — the
caller rebuilds from the authoritative ledger at higher capacity (the
ledger, not the filter, is the source of truth; the filter is the O(1)
membership view of it).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from crawler_ai_spark.operators.seen import (
    DEFAULT_N_BUCKETS,
    CuckooFilter,
    bucket_expr,
)

CUCKOO_BLOB_SCHEMA = StructType(
    [
        StructField("bucket_id", IntegerType()),
        StructField("table", BinaryType()),
        StructField("n_keys", LongType()),
        # bucketing modulus baked into the blobs (same reasoning as
        # BLOOM_SCHEMA: probing with a different modulus mis-routes keys)
        StructField("n_buckets", IntegerType()),
    ]
)

DEFAULT_KEYS_PER_BUCKET = 8192


def empty_blobs(spark) -> DataFrame:
    return spark.createDataFrame([], CUCKOO_BLOB_SCHEMA)


def _sorted_unique(pdf: pd.DataFrame) -> np.ndarray:
    # sorted, deduped order makes the insert/kick sequence deterministic
    return np.unique(pdf["url_hash"].to_numpy(dtype=np.int64))


def build_cuckoo_blobs(
    keys: DataFrame,
    n_buckets: int = DEFAULT_N_BUCKETS,
    capacity_per_bucket: int = DEFAULT_KEYS_PER_BUCKET,
) -> DataFrame:
    """keys(url_hash, distinct) → one cuckoo blob per bucket, built where
    the keys live. Used for the distributed resume rebuild (a store
    predating the blob table derives the live set from the ledger)."""

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        ks = _sorted_unique(pdf)
        cf = CuckooFilter(capacity_per_bucket)
        for k in ks:
            if not cf.insert(int(k)):  # pragma: no cover - 2x oversized
                raise RuntimeError(
                    "cache cuckoo shard overflow at build — raise "
                    "cache_keys_per_bucket or bucket count"
                )
        return pd.DataFrame(
            {
                "bucket_id": [int(pdf["bucket_id"].iloc[0])],
                "table": [cf.to_bytes()],
                "n_keys": [len(ks)],
                "n_buckets": [n_buckets],
            }
        )

    with_bucket = keys.select(
        "url_hash", bucket_expr(F.col("url_hash"), n_buckets).alias("bucket_id")
    )
    return with_bucket.groupBy("bucket_id").applyInPandas(_build, CUCKOO_BLOB_SCHEMA)


def blob_buckets(blobs: DataFrame) -> int | None:
    row = blobs.select("n_buckets").first()
    return None if row is None else int(row[0])


def update_cuckoo_blobs(
    blobs: DataFrame,
    keys: DataFrame,
    op: str,
    n_buckets: int | None = None,
    capacity_per_bucket: int = DEFAULT_KEYS_PER_BUCKET,
) -> DataFrame:
    """Apply ``op`` ('delete' | 'insert_if_absent') for keys(url_hash,
    distinct) to the sharded filter; returns the new blobs DataFrame.
    Buckets with no keys pass through untouched. Invariants raise inside
    the task: a TTL-expiry delete MUST hit (the key was inserted at fetch
    time and expiry fires exactly once per fetch); an insert overflow
    means the shard was under-provisioned."""
    if op not in ("delete", "insert_if_absent"):
        raise ValueError(f"unknown cuckoo op {op!r}")
    built_with = blob_buckets(blobs)
    n_buckets = built_with if built_with is not None else (n_buckets or DEFAULT_N_BUCKETS)

    def _update(blob_pdf: pd.DataFrame, key_pdf: pd.DataFrame) -> pd.DataFrame:
        if key_pdf.empty:
            return blob_pdf[["bucket_id", "table", "n_keys", "n_buckets"]]
        if blob_pdf.empty:
            if op == "delete":
                raise RuntimeError(
                    "cache filter eviction for a bucket with no shard"
                )
            cf = CuckooFilter(capacity_per_bucket)
            n_keys = 0
            bucket_id = int(key_pdf["bucket_id"].iloc[0])
        else:
            # one blob per bucket by construction — updates always fold a
            # bucket's state into a single row (unlike the OR-merged blooms)
            assert len(blob_pdf) == 1, "cache shard split across blob rows"
            cf = CuckooFilter.from_bytes(bytes(blob_pdf["table"].iloc[0]))
            n_keys = int(blob_pdf["n_keys"].iloc[0])
            bucket_id = int(blob_pdf["bucket_id"].iloc[0])
        for k in _sorted_unique(key_pdf):
            k = int(k)
            if op == "delete":
                if not cf.delete(k):
                    raise RuntimeError(
                        "cache filter eviction missed a key that must be present"
                    )
                n_keys -= 1
            else:
                if not cf.contains(k):
                    if not cf.insert(k):  # pragma: no cover - oversized
                        raise RuntimeError(
                            "cache cuckoo shard overflow at insert — raise "
                            "cache_keys_per_bucket"
                        )
                    n_keys += 1
        return pd.DataFrame(
            {
                "bucket_id": [bucket_id],
                "table": [cf.to_bytes()],
                "n_keys": [n_keys],
                "n_buckets": [n_buckets],
            }
        )

    with_bucket = keys.select(
        "url_hash", bucket_expr(F.col("url_hash"), n_buckets).alias("bucket_id")
    )
    return (
        blobs.groupby("bucket_id")
        .cogroup(with_bucket.groupby("bucket_id"))
        .applyInPandas(_update, CUCKOO_BLOB_SCHEMA)
    )


def probe_cuckoo_blobs(
    candidates: DataFrame, blobs: DataFrame, flag_col: str = "in_cache"
) -> DataFrame:
    """Tag candidates(url_hash, ...) with membership in the sharded
    filter — broadcast the (metadata-sized) blob map, probe in a
    vectorized Arrow UDF. The crawl loop's coherence invariant ("a
    recrawl-due key must already be evicted") runs as a count over this
    column instead of a driver-side loop."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BooleanType

    rows = blobs.select("bucket_id", "table").collect()
    blob_map = {int(r.bucket_id): bytes(r.table) for r in rows}
    n_buckets = blob_buckets(blobs) or DEFAULT_N_BUCKETS
    spark = candidates.sparkSession
    bc = spark.sparkContext.broadcast(blob_map)

    @pandas_udf(BooleanType())
    def _probe(url_hash: pd.Series, bucket_id: pd.Series) -> pd.Series:
        blobs_local = bc.value
        keys = url_hash.to_numpy(dtype=np.int64)
        buckets = bucket_id.to_numpy(dtype=np.int64)
        hit = np.zeros(len(keys), dtype=bool)
        order = np.argsort(buckets, kind="stable")
        sorted_b = buckets[order]
        starts = np.flatnonzero(np.r_[True, sorted_b[1:] != sorted_b[:-1]])
        ends = np.r_[starts[1:], len(sorted_b)] if len(sorted_b) else starts
        for lo, hi in zip(starts, ends):
            blob = blobs_local.get(int(sorted_b[lo]))
            if blob is None:
                continue
            idx = order[lo:hi]
            hit[idx] = CuckooFilter.from_bytes(blob).contains_many(keys[idx])
        return pd.Series(hit)

    with_bucket = candidates.withColumn(
        "bucket_id", bucket_expr(F.col("url_hash"), n_buckets)
    )
    return with_bucket.withColumn(
        flag_col, _probe(F.col("url_hash"), F.col("bucket_id"))
    ).drop("bucket_id")
