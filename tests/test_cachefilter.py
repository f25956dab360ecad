"""operators/cachefilter.py — the sharded (executor-built) deletable
cache filter that backs S5 TTL recrawl at 10^10-URL scale. Semantics
must match the driver-resident CuckooFilter it replaced: insert /
contains / delete per key, delete-must-hit, plus blob round-tripping
and the vectorized probe agreeing with the scalar path bit-for-bit."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawler_ai_spark.operators import cachefilter as CF
from crawler_ai_spark.operators.seen import CuckooFilter


def _keys_df(spark, keys):
    return spark.createDataFrame([(int(k),) for k in keys], ["url_hash"])


def _blob_members(blobs, keys):
    """Membership of ``keys`` per the sharded filter, via the broadcast probe."""
    spark = blobs.sparkSession
    probed = CF.probe_cuckoo_blobs(_keys_df(spark, keys), blobs)
    return {r.url_hash: r.in_cache for r in probed.collect()}


KEYS = [3, -17, 2**40 + 5, -(2**62), 999983, 42, 7, 123456789123456789]
ABSENT = [11, -99, 2**41, 555]


def test_build_and_probe(spark):
    blobs = CF.build_cuckoo_blobs(_keys_df(spark, KEYS), capacity_per_bucket=64)
    members = _blob_members(blobs, KEYS + ABSENT)
    assert all(members[k] for k in KEYS)
    # cuckoo FPs are possible but astronomically unlikely at 16-bit
    # fingerprints over 8 keys; a failure here means routing is broken
    assert not any(members[k] for k in ABSENT)


def test_update_delete_and_insert(spark):
    blobs = CF.build_cuckoo_blobs(_keys_df(spark, KEYS), capacity_per_bucket=64)
    blobs = CF.update_cuckoo_blobs(
        blobs, _keys_df(spark, KEYS[:3]), op="delete", capacity_per_bucket=64
    )
    members = _blob_members(blobs, KEYS)
    assert not any(members[k] for k in KEYS[:3])
    assert all(members[k] for k in KEYS[3:])
    # re-insert one deleted key + a brand-new key; insert is if-absent so
    # re-inserting a present key is a no-op (no duplicate fingerprints)
    blobs = CF.update_cuckoo_blobs(
        blobs,
        _keys_df(spark, [KEYS[0], KEYS[4], 777]),
        op="insert_if_absent",
        capacity_per_bucket=64,
    )
    members = _blob_members(blobs, KEYS + [777])
    assert members[KEYS[0]] and members[777] and members[KEYS[4]]
    n_keys = {r.bucket_id: r.n_keys for r in blobs.collect()}
    assert sum(n_keys.values()) == len(KEYS) - 3 + 2


def test_delete_miss_raises(spark):
    blobs = CF.build_cuckoo_blobs(_keys_df(spark, KEYS), capacity_per_bucket=64)
    bad = CF.update_cuckoo_blobs(
        blobs, _keys_df(spark, [31337]), op="delete", capacity_per_bucket=64
    )
    with pytest.raises(Exception, match="eviction"):
        bad.collect()


def test_blob_roundtrip_and_vectorized_contains():
    cf = CuckooFilter(64)
    for k in KEYS:
        assert cf.insert(k)
    restored = CuckooFilter.from_bytes(cf.to_bytes())
    probe = np.array(KEYS + ABSENT, dtype=np.int64)
    vec = restored.contains_many(probe)
    scalar = np.array([cf.contains(int(k)) for k in probe])
    assert (vec == scalar).all()
    assert bytes(restored.to_bytes()) == bytes(cf.to_bytes())


def test_update_is_deterministic_across_runs(spark):
    """The blob chain must be byte-identical when replayed (resume)."""
    a = CF.build_cuckoo_blobs(_keys_df(spark, KEYS), capacity_per_bucket=64)
    b = CF.build_cuckoo_blobs(_keys_df(spark, list(reversed(KEYS))), capacity_per_bucket=64)
    rows_a = {r.bucket_id: bytes(r.table) for r in a.collect()}
    rows_b = {r.bucket_id: bytes(r.table) for r in b.collect()}
    assert rows_a == rows_b  # sorted-key insertion ⇒ order-independent
    a2 = CF.update_cuckoo_blobs(
        a, _keys_df(spark, [777, 778]), op="insert_if_absent", capacity_per_bucket=64
    )
    b2 = CF.update_cuckoo_blobs(
        b, _keys_df(spark, [778, 777]), op="insert_if_absent", capacity_per_bucket=64
    )
    assert {r.bucket_id: bytes(r.table) for r in a2.collect()} == {
        r.bucket_id: bytes(r.table) for r in b2.collect()
    }
