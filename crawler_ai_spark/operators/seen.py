"""D2 at scale — partitioned Bloom URL-seen set (+ cuckoo fallback).

The reference's ``visited_urls: set`` / Scrapy request-fingerprint dedup
(job_extraction_service.py:326-338, crawler_ai/settings.py:69) becomes, at
10^10-URL scale, a two-tier structure (SURVEY.md §1.3):

- FAST PATH: per-host-bucket Bloom filters, built and probed with
  Arrow-vectorized numpy inside ``applyInPandas``/``cogroup`` — a candidate
  whose bucket bloom says "absent" is DEFINITELY new and skips the exact
  join entirely (at steady state that is ~95%+ of candidates, so the big
  anti-join shrinks by ~20×).
- CORRECTNESS PATH: the exact left-anti join against the ``seen`` table
  (operators/frontier.dedup_against_seen) for the "maybe present" residue —
  bloom false positives can never drop a truly-new URL because every
  "maybe" is re-checked exactly.

Why not Spark's runtime bloom-join (spark.sql.optimizer.runtime.bloomFilter):
it is rebuilt per query and never persisted; a crawl needs the filter to
live ACROSS batches. These blobs are committed with each batch (an Iceberg
side table in production; parquet here) and unioned by bucket on read.

Sizing: bits_per_key=10, k=7 → ~0.8% false-positive rate. At 10^10 keys
that's 12.5 GB of bitmap split over n_buckets blobs (e.g. 8192 buckets →
~1.5 MB/blob); each executor core touches only the blobs of the buckets in
its partition (cogroup aligns candidates and blobs by bucket), so memory
per task stays O(blob), not O(filter).

The cuckoo filter (deletable — models the reference's 1h fetch-cache TTL
eviction, app/services/cache.py:15-33) is provided for the recrawl path and
property-tested; the crawl loop's scheduler dedup itself never deletes.
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

DEFAULT_BITS_PER_KEY = 10
DEFAULT_N_HASHES = 7
DEFAULT_N_BUCKETS = 64  # sandbox default; thousands at 10^10 scale


def bucket_expr(host, n_buckets: int = DEFAULT_N_BUCKETS):
    """bucket(N, host) — the Iceberg partition transform equivalent."""
    return F.pmod(F.xxhash64(host), F.lit(n_buckets)).cast("int")


# ---------------------------------------------------------------------------
# vectorized double hashing (numpy, runs inside Arrow batches)
# ---------------------------------------------------------------------------


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = x
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _bit_positions(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) array of bit indices for each key (double hashing)."""
    x = keys.astype(np.uint64)
    h1 = _splitmix64(x)
    h2 = _splitmix64(x ^ np.uint64(0xD6E8FEB86659FD93)) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)).astype(np.int64)


def _set_bits(bitmap: np.ndarray, positions: np.ndarray) -> None:
    flat = positions.reshape(-1)
    np.bitwise_or.at(bitmap, flat >> 3, (1 << (flat & 7)).astype(np.uint8))


def _test_bits(bitmap: np.ndarray, positions: np.ndarray) -> np.ndarray:
    """Per-key boolean: all k bits set → maybe present."""
    byte_idx = positions >> 3
    bit_mask = (1 << (positions & 7)).astype(np.uint8)
    hits = (bitmap[byte_idx] & bit_mask) != 0
    return hits.all(axis=1)


# ---------------------------------------------------------------------------
# build / probe as grouped Arrow operations
# ---------------------------------------------------------------------------

BLOOM_SCHEMA = StructType(
    [
        StructField("bucket_id", IntegerType()),
        StructField("bitmap", BinaryType()),
        StructField("n_keys", LongType()),
        # bucketing modulus baked into every blob: probing with a different
        # n_buckets than the build mis-routes buckets → silent false
        # negatives, so the probe reads the modulus from the blobs instead
        # of trusting a caller-supplied value
        StructField("n_buckets", IntegerType()),
    ]
)


def build_bloom(
    seen: DataFrame,
    n_buckets: int = DEFAULT_N_BUCKETS,
    bits_per_key: int = DEFAULT_BITS_PER_KEY,
    n_hashes: int = DEFAULT_N_HASHES,
    expected_keys_per_bucket: int | None = None,
) -> DataFrame:
    """seen(url_hash) → one bloom blob per host bucket (applyInPandas).

    Blob size is fixed per bucket from ``expected_keys_per_bucket`` (or the
    observed group size) so blobs from successive batches of the same bucket
    can be OR-merged (same m) — the persistence trick that makes the filter
    survive across crawl batches."""

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = pdf["url_hash"].to_numpy(dtype=np.int64)
        n = max(len(keys), 1)
        cap = expected_keys_per_bucket or n
        # round up to a byte boundary: the probe recovers m from the blob
        # length (bitmap_bytes * 8), so m MUST be byte-aligned or build and
        # probe hash with different moduli → false negatives
        m_bits = ((max(64, int(cap * bits_per_key)) + 7) // 8) * 8
        bitmap = np.zeros((m_bits + 7) // 8, dtype=np.uint8)
        _set_bits(bitmap, _bit_positions(keys, m_bits, n_hashes))
        return pd.DataFrame(
            {
                "bucket_id": [int(pdf["bucket_id"].iloc[0])],
                "bitmap": [bitmap.tobytes()],
                "n_keys": [len(keys)],
                "n_buckets": [n_buckets],
            }
        )

    # project to the hash alone BEFORE the groupBy shuffle — the url string
    # (and any other payload) would otherwise ride the wire for nothing
    with_bucket = seen.select(
        F.col("url_hash"), bucket_expr(F.col("url_hash"), n_buckets).alias("bucket_id")
    )
    return with_bucket.groupBy("bucket_id").applyInPandas(_build, BLOOM_SCHEMA)


def merge_blooms(blooms: DataFrame) -> DataFrame:
    """OR-merge per-bucket blobs from multiple batches (same m per bucket)."""

    def _merge(pdf: pd.DataFrame) -> pd.DataFrame:
        # bitmaps are only OR-mergeable at equal m; blobs sized differently
        # (e.g. batches with different key counts) stay as separate rows —
        # the probe ORs across all blobs of a bucket, so correctness holds
        arrs = [np.frombuffer(b, dtype=np.uint8) for b in pdf["bitmap"]]
        by_size: dict[int, np.ndarray] = {}
        keys_by_size: dict[int, int] = {}
        for a, nk in zip(arrs, pdf["n_keys"]):
            acc = by_size.setdefault(a.size, np.zeros(a.size, dtype=np.uint8))
            acc |= a
            keys_by_size[a.size] = keys_by_size.get(a.size, 0) + int(nk)
        sizes = sorted(by_size)
        return pd.DataFrame(
            {
                "bucket_id": [int(pdf["bucket_id"].iloc[0])] * len(sizes),
                "bitmap": [by_size[s].tobytes() for s in sizes],
                "n_keys": [keys_by_size[s] for s in sizes],
                "n_buckets": [int(pdf["n_buckets"].iloc[0])] * len(sizes),
            }
        )

    return blooms.groupBy("bucket_id").applyInPandas(_merge, BLOOM_SCHEMA)


def bloom_buckets(blooms: DataFrame) -> int | None:
    """The bucketing modulus the blobs were built with (None if no blobs).
    One tiny driver action over the (small, metadata-sized) blooms table."""
    row = blooms.select("n_buckets").first()
    return None if row is None else int(row[0])


def bloom_split(
    candidates: DataFrame,
    blooms: DataFrame,
    n_buckets: int | None = None,
    n_hashes: int = DEFAULT_N_HASHES,
) -> DataFrame:
    """Tag candidates with ``maybe_seen`` via a bucket-aligned cogroup probe.

    Rows with maybe_seen = false are DEFINITELY new (bloom has no false
    negatives); rows with true go to the exact anti-join. The bucketing
    modulus is read from the blobs themselves (see BLOOM_SCHEMA) so probe
    and build can never disagree."""
    from pyspark.sql.types import BooleanType

    # ALWAYS prefer the modulus recorded in the blobs — a caller-supplied
    # value that disagrees would mis-route buckets into silent false
    # negatives; the param is only a fallback for an empty blooms table
    built_with = bloom_buckets(blooms)
    n_buckets = built_with if built_with is not None else (n_buckets or DEFAULT_N_BUCKETS)

    with_bucket = candidates.withColumn("bucket_id", bucket_expr(F.col("url_hash"), n_buckets))
    out_schema = StructType(
        with_bucket.schema.fields + [StructField("maybe_seen", BooleanType())]
    )

    def _probe(cand_pdf: pd.DataFrame, bloom_pdf: pd.DataFrame) -> pd.DataFrame:
        if cand_pdf.empty:
            return cand_pdf.assign(maybe_seen=pd.Series([], dtype="bool"))
        if bloom_pdf.empty:
            return cand_pdf.assign(maybe_seen=False)
        keys = cand_pdf["url_hash"].to_numpy(dtype=np.int64)
        # a key is maybe-seen if ANY blob of this bucket contains it
        # (multi-batch blobs may arrive unmerged; each holds a key subset)
        maybe = np.zeros(len(keys), dtype=bool)
        for blob in bloom_pdf["bitmap"]:
            bitmap = np.frombuffer(blob, dtype=np.uint8)
            m_bits = bitmap.size * 8
            maybe |= _test_bits(bitmap, _bit_positions(keys, m_bits, n_hashes))
        return cand_pdf.assign(maybe_seen=maybe)

    return (
        with_bucket.groupBy("bucket_id")
        .cogroup(blooms.groupBy("bucket_id"))
        .applyInPandas(_probe, out_schema)
    )


def broadcast_probe(
    candidates: DataFrame,
    blooms: DataFrame,
    n_hashes: int = DEFAULT_N_HASHES,
) -> DataFrame:
    """Shuffle-free bloom probe: collect the (small) blobs to the driver,
    broadcast, probe in a scalar Arrow pandas UDF. The right mode whenever
    the filter set fits in executor memory (≤ ~1e9 seen keys ≈ 1.5 GB);
    beyond that, ``bloom_split``'s bucket-aligned cogroup keeps per-task
    memory O(blob). Bucket routing happens JVM-side (bucket_expr) so the
    UDF never needs to reimplement xxhash64."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BooleanType

    rows = blooms.select("bucket_id", "bitmap").collect()
    blob_map: dict[int, list[bytes]] = {}
    for r in rows:
        blob_map.setdefault(int(r.bucket_id), []).append(bytes(r.bitmap))
    n_buckets = bloom_buckets(blooms) or DEFAULT_N_BUCKETS
    spark = candidates.sparkSession
    bc = spark.sparkContext.broadcast(blob_map)

    @pandas_udf(BooleanType())
    def _probe(url_hash: pd.Series, bucket_id: pd.Series) -> pd.Series:
        blobs = bc.value
        keys = url_hash.to_numpy(dtype=np.int64)
        buckets = bucket_id.to_numpy(dtype=np.int64)
        maybe = np.zeros(len(keys), dtype=bool)
        # one stable argsort, then contiguous per-bucket runs — O(n log n)
        # instead of one full-array boolean mask per bucket per batch
        order = np.argsort(buckets, kind="stable")
        sorted_buckets = buckets[order]
        run_starts = np.flatnonzero(
            np.r_[True, sorted_buckets[1:] != sorted_buckets[:-1]]
        )
        run_ends = np.r_[run_starts[1:], len(sorted_buckets)] if len(sorted_buckets) else run_starts
        for lo, hi in zip(run_starts, run_ends):
            b = int(sorted_buckets[lo])
            idx = order[lo:hi]
            sub = keys[idx]
            acc = np.zeros(len(sub), dtype=bool)
            for blob in blobs.get(b, ()):
                bitmap = np.frombuffer(blob, dtype=np.uint8)
                acc |= _test_bits(bitmap, _bit_positions(sub, bitmap.size * 8, n_hashes))
            maybe[idx] = acc
        return pd.Series(maybe)

    with_bucket = candidates.withColumn(
        "bucket_id", bucket_expr(F.col("url_hash"), n_buckets)
    )
    return with_bucket.withColumn(
        "maybe_seen", _probe(F.col("url_hash"), F.col("bucket_id"))
    )


# broadcast the filter when its blobs total below this; else cogroup
BROADCAST_BLOOM_MAX_BYTES = 256 << 20


def dedup_with_bloom(
    candidates: DataFrame,
    seen: DataFrame,
    blooms: DataFrame,
    n_buckets: int | None = None,
    probe_mode: str = "auto",
    cache_registry: list | None = None,
) -> DataFrame:
    """Bloom-prefiltered exact scheduler dedup: equals
    frontier.dedup_against_seen(candidates, seen) exactly, but only the
    bloom-"maybe" residue pays the big anti-join shuffle.

    Caches two intermediate frames (blooms, tagged). Pass a
    ``cache_registry`` list to receive them and unpersist AFTER the result
    is materialized — a looping caller (the crawl loop) would otherwise
    leak one cached pair into executor storage per batch."""
    from crawler_ai_spark.operators.frontier import dedup_against_seen

    from pyspark.sql import Window

    cand_cols = candidates.columns
    # blooms are metadata-sized relative to candidates but their lineage
    # (applyInPandas over seen) is expensive — cache so the mode probe,
    # bucket lookup, and the probe itself build them once
    blooms = blooms.persist()

    if probe_mode == "auto":
        # one driver action decides the mode AND fetches the modulus
        total, built_with = blooms.agg(
            F.sum(F.length("bitmap")), F.first("n_buckets")
        ).first()
        probe_mode = (
            "broadcast" if (total or 0) <= BROADCAST_BLOOM_MAX_BYTES else "cogroup"
        )
        n_buckets = built_with or n_buckets

    # plan shape (broadcast mode): probe is MAP-SIDE (broadcast blobs), the
    # residue exact-check is two broadcast joins (zero shuffles of seen),
    # and the only shuffle in the whole dedup is the final first-yield-wins
    # window. Probing before the window is sound: seen-membership is
    # uniform across duplicates of a url_hash.
    if probe_mode == "broadcast":
        tagged = broadcast_probe(candidates, blooms).persist()
    else:
        tagged = bloom_split(candidates, blooms, n_buckets).persist()
    if cache_registry is not None:
        cache_registry.extend([blooms, tagged])
    definitely_new = tagged.where(~F.col("maybe_seen")).select(*cand_cols)
    residue = tagged.where(F.col("maybe_seen")).select(*cand_cols)
    # exact check of the residue. At steady state the residue is small
    # (truly-seen + ~1% FPs of the batch) while seen is enormous — a plain
    # anti-join would SHUFFLE ALL OF SEEN to weed out a handful of rows.
    # Small residue → (1) broadcast the residue hashes into a map-side
    # semi-join that streams seen with no shuffle, (2) broadcast the (even
    # smaller) confirmed-seen set back into the anti-join.
    n_residue = residue.count()  # cheap: tagged is cached; also warms it
    if n_residue <= 5_000_000:
        residue_keys = F.broadcast(residue.select("url_hash").distinct())
        confirmed = F.broadcast(
            seen.join(residue_keys, "url_hash", "left_semi").select("url_hash").distinct()
        )
        checked = residue.join(confirmed, "url_hash", "left_anti")
    else:
        checked = residue.join(seen.select("url_hash"), "url_hash", "left_anti")
    merged = definitely_new.unionByName(checked)
    # within-batch first-yield-wins dedup — the dedup's single shuffle
    w = Window.partitionBy("seed_url", "url_hash").orderBy("discovered_seq")
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# cuckoo filter (deletable fallback — recrawl/TTL path)
# ---------------------------------------------------------------------------


class CuckooFilter:
    """Minimal (2,4)-cuckoo filter over int64 keys: insert / contains /
    delete. Models the reference's TTL'd fetch-cache eviction
    (app/services/cache.py:22): when a page's 1h TTL lapses the key is
    DELETED so the URL becomes schedulable again — a bloom can't delete,
    hence the fallback (north rule)."""

    FINGERPRINT_BITS = 16
    BUCKET_SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, capacity: int):
        n_buckets = 1
        while n_buckets * self.BUCKET_SLOTS < capacity * 1.25:
            n_buckets *= 2
        self.n_buckets = n_buckets
        self.table = np.zeros((n_buckets, self.BUCKET_SLOTS), dtype=np.uint16)
        self._rng_state = np.uint64(0x2545F4914F6CDD1D)

    def _fingerprint(self, key: int) -> int:
        # mask to unsigned: xxhash64 keys are signed int64 and numpy's
        # negative-int -> uint64 conversion is a hard error on new numpy
        fp = int(_splitmix64(np.array([key & 0xFFFFFFFFFFFFFFFF], dtype=np.uint64))[0]) & 0xFFFF
        return fp or 1  # 0 means empty slot

    def _index1(self, key: int) -> int:
        k = (key ^ 0xABCDEF) & 0xFFFFFFFFFFFFFFFF
        return int(_splitmix64(np.array([k], dtype=np.uint64))[0]) % self.n_buckets

    def _index2(self, i1: int, fp: int) -> int:
        h = int(_splitmix64(np.array([fp], dtype=np.uint64))[0])
        return (i1 ^ h) % self.n_buckets

    def _try_put(self, idx: int, fp: int) -> bool:
        row = self.table[idx]
        for s in range(self.BUCKET_SLOTS):
            if row[s] == 0:
                row[s] = fp
                return True
        return False

    def insert(self, key: int) -> bool:
        fp = self._fingerprint(key)
        i1 = self._index1(key)
        i2 = self._index2(i1, fp)
        if self._try_put(i1, fp) or self._try_put(i2, fp):
            return True
        idx = i1
        for _ in range(self.MAX_KICKS):
            self._rng_state = _splitmix64(np.array([self._rng_state], dtype=np.uint64))[0]
            slot = int(self._rng_state) % self.BUCKET_SLOTS
            fp, self.table[idx][slot] = int(self.table[idx][slot]), fp
            idx = self._index2(idx, fp)
            if self._try_put(idx, fp):
                return True
        return False  # table full

    def _slots(self, key: int):
        fp = self._fingerprint(key)
        i1 = self._index1(key)
        return fp, i1, self._index2(i1, fp)

    def contains(self, key: int) -> bool:
        fp, i1, i2 = self._slots(key)
        return bool((self.table[i1] == fp).any() or (self.table[i2] == fp).any())

    def delete(self, key: int) -> bool:
        fp, i1, i2 = self._slots(key)
        for idx in (i1, i2):
            row = self.table[idx]
            hit = np.nonzero(row == fp)[0]
            if hit.size:
                row[hit[0]] = 0
                return True
        return False

    # -- blob form (executor-sharded state, operators/cachefilter.py) ------

    def to_bytes(self) -> bytes:
        """The table as an opaque blob; shape is recoverable (slots fixed,
        row count = len/ (2*BUCKET_SLOTS)), mirroring the bloom blobs."""
        return self.table.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CuckooFilter":
        arr = (
            np.frombuffer(blob, dtype=np.uint16)
            .reshape(-1, cls.BUCKET_SLOTS)
            .copy()  # frombuffer is read-only; the filter mutates
        )
        cf = cls.__new__(cls)
        cf.n_buckets = arr.shape[0]
        cf.table = arr
        # fresh kick-RNG: every blob update round starts from bytes, so a
        # resumed run replays the identical (reset-rng, sorted-keys) update
        # sequence as the uninterrupted one — blob bytes stay bit-identical
        cf._rng_state = np.uint64(0x2545F4914F6CDD1D)
        return cf

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership for an int64 key array — must agree with
        the scalar contains() bit-for-bit (same splitmix64 double-hash)."""
        if keys.size == 0:
            return np.zeros(0, dtype=bool)
        u = keys.astype(np.int64).view(np.uint64)
        fp = (_splitmix64(u) & np.uint64(0xFFFF)).astype(np.uint64)
        fp[fp == 0] = 1
        i1 = _splitmix64(u ^ np.uint64(0xABCDEF)) % np.uint64(self.n_buckets)
        i2 = (i1 ^ _splitmix64(fp)) % np.uint64(self.n_buckets)
        fps = fp.astype(np.uint16)[:, None]
        return (self.table[i1.astype(np.int64)] == fps).any(axis=1) | (
            self.table[i2.astype(np.int64)] == fps
        ).any(axis=1)
