"""Model-based property test for the Iceberg-style snapshot log.

Random sequences of append / crash-replay / compact / vacuum are applied
to a SnapshotLog over real parquet files (written with pyarrow — no Spark
needed) and, after every operation, the log's visible file set is read
back and compared against a plain dict model {batch_id: rows}. Checks:

- HEAD view == union of the latest rows per batch (replays supersede);
- per-batch append reads return exactly that batch's latest rows;
- time travel to any batch ≥ the newest compaction point equals the
  model prefix; pre-compaction time travel holds until vacuum;
- vacuum never changes the HEAD view and only deletes dead files;
- summaries (added_rows) stay consistent with the files on disk."""

from __future__ import annotations

import pathlib

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings, strategies as st

from crawler_ai_spark.sources.snapshots import SnapshotLog


def _write(dirpath: pathlib.Path, rows: list[int], files: int = 2) -> None:
    dirpath.mkdir(parents=True, exist_ok=True)
    chunks = [rows[i::files] for i in range(files)] or [[]]
    for i, chunk in enumerate(chunks):
        pq.write_table(
            pa.table({"k": pa.array(chunk, pa.int64())}),
            dirpath / f"part-{i:05d}.parquet",
        )


def _read_paths(paths: list[str]) -> list[int]:
    out: list[int] = []
    for p in paths:
        out.extend(pq.read_table(p).column("k").to_pylist())
    return sorted(out)


# op stream: ("append", rows) advances the batch; ("replay", rows)
# re-commits the CURRENT batch with different rows (crash-replay);
# ("compact",) rewrites everything at the tip; ("vacuum",) expires.
OPS = st.lists(
    st.one_of(
        st.tuples(st.just("append"), st.lists(st.integers(0, 999), max_size=6)),
        st.tuples(st.just("replay"), st.lists(st.integers(0, 999), max_size=6)),
        st.just(("compact",)),
        st.just(("vacuum",)),
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=40, deadline=None)
@given(OPS)
def test_log_matches_model(tmp_path_factory, ops):
    root = tmp_path_factory.mktemp("model")
    log = SnapshotLog(root)
    model: dict[int, list[int]] = {}
    batch = -1
    seq = 0
    compacted_through = -1  # newest compaction point
    expired_through = -1    # vacuum watermark: appends at/below are gone

    for op in ops:
        seq += 1
        if op[0] == "append":
            batch += 1
            d = root / f"data-{seq}"
            _write(d, op[1])
            log.commit("t", batch, d)
            model[batch] = op[1]
        elif op[0] == "replay":
            # a replay models a crash between snapshot commits and the
            # _COMMITTED marker; compaction only ever runs on committed
            # tips, so a replay of an already-compacted batch cannot occur
            if batch < 0 or batch == compacted_through:
                continue
            d = root / f"data-{seq}"
            _write(d, op[1])
            log.commit("t", batch, d)
            model[batch] = op[1]
        elif op[0] == "compact":
            if batch < 0:
                continue
            d = root / f"data-{seq}"
            _write(d, sorted(x for rows in model.values() for x in rows), files=2)
            log.commit("t", batch, d, operation="replace", replaces_through_batch=batch)
            compacted_through = batch
        else:  # vacuum
            deleted = log.vacuum("t")
            if compacted_through >= 0:
                expired_through = max(expired_through, compacted_through)
            assert all(not pathlib.Path(p).exists() for p in deleted)

        # HEAD view == model union, always
        expect_all = sorted(x for rows in model.values() for x in rows)
        assert _read_paths(log.data_paths("t")) == expect_all

        # per-batch append reads (valid until a vacuum expires them)
        for b, rows in model.items():
            if b <= expired_through:
                continue
            got = _read_paths([e["path"] for e in log.batch_append_files("t", b)])
            assert got == sorted(rows), (b, got, rows)

        # time travel: every prefix down to the vacuum watermark (the
        # compaction snapshot itself remains the floor after vacuum)
        for b in model:
            if b < expired_through:
                continue
            expect = sorted(
                x for bb, rows in model.items() if bb <= b for x in rows
            )
            assert _read_paths(log.data_paths("t", through_batch=b)) == expect, b

        # manifest summaries agree with bytes on disk for the live chain
        for snap in log.snapshots("t"):
            assert snap["summary"]["added_rows"] == sum(
                e["row_count"] for e in snap["manifest"]
            )
