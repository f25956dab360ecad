"""Semantics of the persistent incremental MinHash-LSH dedup index
(pipeline/dedup_index.py) on a hand-built corpus where the right answer
is obvious: probes find exactly the planted near-dups, survivors are
exactly the novel docs, an append makes earlier survivors visible to
later probes without rewriting existing index files, and mismatched
banding params refuse to append. The catalog oracles
(queries/fourthwave.py) pin exact cross-engine values; this pins the
incremental mechanics the SQL can't see (file-level append behavior)."""

from __future__ import annotations

import pathlib

import pytest
from pyspark.sql import functions as F

from crawler_ai_spark.pipeline import dedup_index as DI

BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "sailors watch from the harbor wall near the old lighthouse"
)
NOVEL_A = "completely unrelated text about quarterly maize futures and rainfall"
NOVEL_B = "another standalone document describing alpine railway timetables in detail"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def index_path(tmp_path):
    return tmp_path / "lsh_index"


def _parquet_files(path) -> set[str]:
    return {str(p) for p in pathlib.Path(path).rglob("*.parquet")}


def test_probe_finds_planted_near_dups(spark, index_path):
    corpus = _docs(spark, [(0, BASE), (1, NOVEL_A)])
    DI.build_lsh_index(corpus, index_path)
    batch = _docs(
        spark,
        [
            (100, BASE + " extra trailing clause"),  # near-dup of 0
            (101, NOVEL_B),  # no match
        ],
    )
    matches = DI.probe_lsh_index(batch, index_path, threshold=0.5).collect()
    assert {(r.new_id, r.idx_id) for r in matches} == {(100, 0)}
    assert all(0.5 <= r.jaccard <= 1.0 for r in matches)

    survivors = DI.dedup_against_index(batch, index_path, threshold=0.5)
    assert {r.doc_id for r in survivors.collect()} == {101}


def test_append_is_incremental_and_visible(spark, index_path):
    DI.build_lsh_index(_docs(spark, [(0, BASE)]), index_path)
    files_before = _parquet_files(index_path)

    DI.append_to_index(_docs(spark, [(1, NOVEL_A)]), index_path)
    files_after = _parquet_files(index_path)
    # append adds files; every pre-existing index file is untouched
    assert files_before < files_after

    # a later probe sees the appended doc
    batch = _docs(spark, [(200, NOVEL_A + " with a small suffix change")])
    matches = DI.probe_lsh_index(batch, index_path, threshold=0.5).collect()
    assert {(r.new_id, r.idx_id) for r in matches} == {(200, 1)}


def test_exact_duplicate_has_jaccard_one(spark, index_path):
    DI.build_lsh_index(_docs(spark, [(0, BASE)]), index_path)
    matches = DI.probe_lsh_index(
        _docs(spark, [(300, BASE)]), index_path, threshold=0.5
    ).collect()
    assert [(r.new_id, r.idx_id, r.jaccard) for r in matches] == [(300, 0, 1.0)]


def test_append_refuses_mismatched_params(spark, index_path):
    DI.build_lsh_index(_docs(spark, [(0, BASE)]), index_path, n_hashes=32, bands=16)
    with pytest.raises(ValueError, match="append params"):
        DI.build_lsh_index(
            _docs(spark, [(1, NOVEL_A)]), index_path, _mode="append"
        )


def test_short_doc_participates_via_whole_text_shingle(spark, index_path):
    # < 3 tokens → the whole text is the single shingle (with_shingles
    # contract); an identical short doc must still match at j = 1.0
    DI.build_lsh_index(_docs(spark, [(0, "tiny doc")]), index_path)
    matches = DI.probe_lsh_index(
        _docs(spark, [(400, "tiny doc")]), index_path
    ).collect()
    assert [(r.new_id, r.idx_id, r.jaccard) for r in matches] == [(400, 0, 1.0)]
