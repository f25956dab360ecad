"""Snapshot CDC diff (sources/snapshots.py: diff_snapshots): appends
surface as '+', takedown rewrites as '-', compaction replaces diff to
EMPTY, and duplicate multiplicity is exact."""

from __future__ import annotations

import pathlib

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawler_ai_spark.sources.snapshots import SnapshotLog, diff_snapshots


def _write(dirpath: pathlib.Path, rows: list[int], files: int = 2) -> None:
    dirpath.mkdir(parents=True, exist_ok=True)
    chunks = [rows[i::files] for i in range(files)] or [[]]
    for i, chunk in enumerate(chunks):
        pq.write_table(
            pa.table({"k": pa.array(chunk, pa.int64())}),
            dirpath / f"part-{i:05d}.parquet",
        )


@pytest.fixture()
def log(tmp_path):
    return SnapshotLog(tmp_path)


def _diff(spark, log, a, b):
    out = diff_snapshots(spark, log, "t", a, b).collect()
    return sorted((r.k, r.change_type) for r in out)


def test_append_and_duplicates(spark, log, tmp_path):
    _write(tmp_path / "d1", [1, 2, 2])
    s1 = log.commit("t", 0, tmp_path / "d1")
    _write(tmp_path / "d2", [2, 3])
    s2 = log.commit("t", 1, tmp_path / "d2")
    # snapshot 2 adds one MORE copy of 2 and a 3: multiset-exact
    assert _diff(spark, log, s1, s2) == [(2, "+"), (3, "+")]
    # reverse direction flips signs
    assert _diff(spark, log, s2, s1) == [(2, "-"), (3, "-")]


def test_compaction_is_cdc_invisible(spark, log, tmp_path):
    _write(tmp_path / "d1", [1, 2])
    s1 = log.commit("t", 0, tmp_path / "d1")
    _write(tmp_path / "d2", [3])
    log.commit("t", 1, tmp_path / "d2")
    # replace with identical combined content (the compaction move)
    _write(tmp_path / "c", [1, 2, 3], files=1)
    s3 = log.commit("t", 2, tmp_path / "c", operation="replace",
                    replaces_through_batch=2)
    assert _diff(spark, log, s1, s3) == [(3, "+")]
    prev = log.snapshots("t")[-2]["snapshot_id"]
    assert _diff(spark, log, prev, s3) == []  # pure rewrite: no changes


def test_takedown_surfaces_removals(spark, log, tmp_path):
    _write(tmp_path / "d1", [1, 2, 3, 4])
    s1 = log.commit("t", 0, tmp_path / "d1")
    _write(tmp_path / "d2", [1, 3], files=1)  # 2 and 4 deleted
    s2 = log.commit("t", 1, tmp_path / "d2", operation="replace",
                    replaces_through_batch=1)
    assert _diff(spark, log, s1, s2) == [(2, "-"), (4, "-")]
