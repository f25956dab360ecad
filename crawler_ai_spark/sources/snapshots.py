"""Iceberg-style snapshot log for the crawl state store (north rule:
"frontier expansion written back as Iceberg appends with per-partition
lineage and checkpointed resume").

The sandbox has no Iceberg runtime jars, so this module implements the
part of the (public) Iceberg v2 table spec the crawl engine needs, over
plain parquet data files:

- **append-only snapshot chain** per table: each batch commit appends
  ``snap-<n>.json`` with ``parent_id`` links; readers resolve the chain
  from an atomically-replaced ``HEAD`` pointer (write-temp + os.replace,
  the same primitive as the reference's atomic_write_json,
  scrapy_career_spider.py:40-53). A crash between data write and HEAD
  update leaves the previous snapshot fully readable — snapshot
  isolation without a lock service.
- **manifests with file-level stats**: every snapshot lists its data
  files with row count, byte size, and per-column min/max bounds read
  from the parquet footers (no data scan). Point lookups and range
  scans prune files from the manifest before Spark ever lists a
  directory — on an object store at 10^10-URL scale, manifest-planned
  reads replace O(batches) directory listings with one metadata read.
- **per-partition lineage**: each manifest entry records which batch
  produced the file and which Spark partition wrote it (the
  ``part-NNNNN`` ordinal), so any row in any state table traces back to
  the (batch, task) that appended it.
- **retry-safe re-commit**: a batch replayed after a crash (data dirs
  rewritten, part files renamed) commits a snapshot whose parent skips
  the superseded attempt; chain-walking readers never see stale paths.

At cluster scale the footer-stat collection runs where Iceberg runs it —
in the writer tasks; here it is a driver-side pyarrow pass over the
just-written files, which is metadata-only (footers, not data).
"""

from __future__ import annotations

import json
import os
import pathlib
import re
import time
from typing import Any

_PART_RX = re.compile(r"part-(\d+)")

# bounds are truncated like Iceberg truncates byte bounds — a 64-char
# prefix keeps the manifest small while staying usable for pruning
_BOUND_MAX_CHARS = 64


def _json_bound(v: Any, *, is_max: bool = False) -> Any:
    """A JSON-safe, pruning-safe rendering of a parquet footer bound."""
    if isinstance(v, bytes):
        try:
            v = v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    if isinstance(v, str):
        if len(v) > _BOUND_MAX_CHARS:
            if is_max:
                # an upper bound must stay an upper bound after truncation
                prefix = v[:_BOUND_MAX_CHARS]
                return prefix[:-1] + chr(ord(prefix[-1]) + 1) if prefix else prefix
            return v[:_BOUND_MAX_CHARS]
        return v
    if isinstance(v, bool) or v is None:
        return v
    if isinstance(v, (int, float)):
        return v
    return None  # timestamps/decimals etc. — skip rather than mis-compare


def _file_manifest_entry(path: pathlib.Path, batch_id: int) -> dict:
    """One Iceberg-manifest-style entry: lineage + stats from the footer."""
    import pyarrow.parquet as pq

    meta = pq.ParquetFile(str(path)).metadata
    lower: dict[str, Any] = {}
    upper: dict[str, Any] = {}
    # a column's bounds are recorded ONLY if every row group has stats
    # for it — partial coverage would understate the range and make
    # prune() silently drop a file that contains matching rows
    partial: set[str] = set()
    for rg in range(meta.num_row_groups):
        group = meta.row_group(rg)
        for ci in range(group.num_columns):
            col = group.column(ci)
            name = col.path_in_schema
            stats = col.statistics
            lo = hi = None
            if stats is not None and stats.has_min_max:
                lo = _json_bound(stats.min)
                hi = _json_bound(stats.max, is_max=True)
            if lo is None or hi is None:
                partial.add(name)
                continue
            if name not in lower or lo < lower[name]:
                lower[name] = lo
            if name not in upper or hi > upper[name]:
                upper[name] = hi
    for name in partial:
        lower.pop(name, None)
        upper.pop(name, None)
    m = _PART_RX.search(path.name)
    return {
        "path": str(path),
        "batch_id": batch_id,
        "spark_partition": int(m.group(1)) if m else None,
        "row_count": meta.num_rows,
        "byte_size": path.stat().st_size,
        "lower_bounds": lower,
        "upper_bounds": upper,
    }


class SnapshotLog:
    """Per-table append-only snapshot chains under ``<root>/_metadata``."""

    def __init__(self, root: str | pathlib.Path):
        self.dir = pathlib.Path(root) / "_metadata"

    # -- low-level ---------------------------------------------------------

    def _table_dir(self, table: str) -> pathlib.Path:
        return self.dir / table

    def _atomic_write(self, path: pathlib.Path, text: str) -> None:
        tmp = path.with_name(path.name + ".tmp")
        tmp.write_text(text)
        os.replace(tmp, path)  # atomic on POSIX — the commit point

    def _load(self, table: str, snapshot_id: int) -> dict:
        return json.loads(
            (self._table_dir(table) / f"snap-{snapshot_id}.json").read_text()
        )

    # -- write path --------------------------------------------------------

    def commit(
        self,
        table: str,
        batch_id: int,
        data_dir: str | pathlib.Path,
        operation: str = "append",
        replaces_through_batch: int | None = None,
        removed_paths: list[str] | None = None,
    ) -> int:
        """Append one snapshot for ``table`` covering the parquet files in
        ``data_dir`` (one batch's worth). Returns the new snapshot id.

        If the chain HEAD already points at a snapshot for this
        ``batch_id`` (a replayed batch after a mid-commit crash), the new
        snapshot's parent skips it, superseding the stale attempt.

        ``operation="replace"`` with ``replaces_through_batch=B`` commits a
        compaction: readers at or past this snapshot drop every older
        manifest entry with ``batch_id <= B`` and see these files instead
        (Iceberg's rewrite_data_files); time travel to a batch before B
        still resolves through the retained older snapshots until
        :meth:`vacuum` expires them.

        ``operation="rewrite"`` with ``removed_paths`` commits a SURGICAL
        rewrite (Iceberg's delete-with-rewrite): readers drop exactly the
        listed data files and see this snapshot's files instead — every
        untouched file stays live without being copied, which is what
        makes a takedown affordable on a 10^10-row table. Time travel to
        a pre-rewrite snapshot still sees the removed files; their bytes
        stay on disk until a later compact+vacuum cycle reclaims them."""
        tdir = self._table_dir(table)
        tdir.mkdir(parents=True, exist_ok=True)
        files = sorted(pathlib.Path(data_dir).glob("*.parquet"))
        manifest = [_file_manifest_entry(p, batch_id) for p in files]

        parent = self.current_snapshot_id(table)
        while parent is not None and self._load(table, parent)["batch_id"] > batch_id:
            parent = self._load(table, parent)["parent_id"]
        if (
            parent is not None
            and operation == "append"
            and self._load(table, parent)["batch_id"] == batch_id
        ):
            parent = self._load(table, parent)["parent_id"]
        snapshot_id = (self.current_snapshot_id(table) or 0) + 1
        snap = {
            "snapshot_id": snapshot_id,
            "parent_id": parent,
            "batch_id": batch_id,
            "timestamp_ms": int(time.time() * 1000),
            "operation": operation,
            "replaces_through_batch": replaces_through_batch,
            "removed_paths": sorted(removed_paths) if removed_paths else None,
            "summary": {
                "added_files": len(manifest),
                "added_rows": sum(e["row_count"] for e in manifest),
                "added_bytes": sum(e["byte_size"] for e in manifest),
            },
            "manifest": manifest,
        }
        self._atomic_write(tdir / f"snap-{snapshot_id}.json", json.dumps(snap, indent=1))
        self._atomic_write(tdir / "HEAD", str(snapshot_id))
        return snapshot_id

    def vacuum(self, table: str) -> list[str]:
        """Expire snapshots fully shadowed by the newest ``replace``
        snapshot and delete their now-unreferenced data files (Iceberg's
        expire_snapshots + orphan-file removal). Trades time travel to
        pre-compaction batches for space; the HEAD view and every
        through-batch read at or past the compaction point are unchanged.
        Returns the deleted data-file paths."""
        chain = self.snapshots(table)
        cut = None
        for i, snap in enumerate(chain):
            if snap["operation"] == "replace":
                cut = i
        if cut is None or cut == 0:
            return []
        replace, expired = chain[cut], chain[:cut]
        live = {e["path"] for e in self.files(table)}
        deleted: list[str] = []
        for snap in expired:
            for e in snap["manifest"]:
                p = pathlib.Path(e["path"])
                if e["path"] not in live and p.exists():
                    p.unlink()
                    deleted.append(e["path"])
        # the replace becomes the new chain root
        tdir = self._table_dir(table)
        self._atomic_write(
            tdir / f"snap-{replace['snapshot_id']}.json",
            json.dumps(dict(replace, parent_id=None), indent=1),
        )
        for snap in expired:
            (tdir / f"snap-{snap['snapshot_id']}.json").unlink(missing_ok=True)
        return deleted

    # -- read path ---------------------------------------------------------

    def tables(self) -> list[str]:
        if not self.dir.exists():
            return []
        return sorted(d.name for d in self.dir.iterdir() if (d / "HEAD").exists())

    def current_snapshot_id(self, table: str) -> int | None:
        head = self._table_dir(table) / "HEAD"
        if not head.exists():
            return None
        return int(head.read_text().strip())

    def snapshots(self, table: str, snapshot_id: int | None = None) -> list[dict]:
        """The live chain (oldest first) at ``snapshot_id`` (default HEAD).
        Superseded snapshots — parents skipped by a re-commit — are not in
        the chain and never surface to readers."""
        sid = snapshot_id if snapshot_id is not None else self.current_snapshot_id(table)
        chain: list[dict] = []
        while sid is not None:
            snap = self._load(table, sid)
            chain.append(snap)
            sid = snap["parent_id"]
        return list(reversed(chain))

    def files(
        self,
        table: str,
        snapshot_id: int | None = None,
        through_batch: int | None = None,
    ) -> list[dict]:
        """Manifest entries visible at a snapshot (time travel), optionally
        restricted to batches ≤ ``through_batch``. A ``replace`` snapshot
        (compaction) shadows every older entry with ``batch_id <=
        replaces_through_batch``; skipping it via ``through_batch`` time
        travel reveals the retained pre-compaction appends instead."""
        out: list[dict] = []
        for snap in self.snapshots(table, snapshot_id):
            if through_batch is not None and snap["batch_id"] > through_batch:
                continue
            if snap["operation"] == "replace":
                rt = snap["replaces_through_batch"]
                out = [e for e in out if e["batch_id"] > rt]
            elif snap["operation"] == "rewrite":
                gone = set(snap.get("removed_paths") or ())
                out = [e for e in out if e["path"] not in gone]
            out.extend(snap["manifest"])
        return out

    def batch_append_files(self, table: str, batch_id: int) -> list[dict]:
        """Manifest entries of the APPEND snapshot for one batch — a
        single batch's delta. Distinct from :meth:`files`, whose replace
        entries carry the compaction's batch id and cover the whole
        table; after :meth:`vacuum` expires a batch's append snapshot its
        per-batch delta is no longer reconstructable (by design)."""
        return [
            e
            for snap in self.snapshots(table)
            if snap["operation"] == "append" and snap["batch_id"] == batch_id
            for e in snap["manifest"]
        ]

    def data_paths(
        self,
        table: str,
        snapshot_id: int | None = None,
        through_batch: int | None = None,
    ) -> list[str]:
        return [e["path"] for e in self.files(table, snapshot_id, through_batch)]

    def prune(
        self,
        table: str,
        column: str,
        lo: Any,
        hi: Any,
        snapshot_id: int | None = None,
        through_batch: int | None = None,
    ) -> list[str]:
        """Paths of files whose footer [min, max] for ``column`` overlaps
        [lo, hi] — manifest-level file pruning, the scan-planning step an
        Iceberg reader does before Spark sees a single path. Files with no
        recorded bounds for the column are kept (can't prove absence)."""
        keep = []
        for e in self.files(table, snapshot_id, through_batch):
            flo = e["lower_bounds"].get(column)
            fhi = e["upper_bounds"].get(column)
            if flo is not None and fhi is not None and (fhi < lo or flo > hi):
                continue
            keep.append(e["path"])
        return keep


def diff_snapshots(
    spark,
    log: SnapshotLog,
    table: str,
    from_id: int,
    to_id: int,
):
    """CDC read between two committed snapshots: the MULTISET difference
    of the table's contents at ``to_id`` vs ``from_id``, one row per
    change with change_type '+' (added) / '-' (removed). Iceberg's
    changelog-read semantics at the whole-row grain:

    - append snapshots diff to exactly their appended rows;
    - a compaction REPLACE rewrites files without changing content, so
      its diff is EMPTY — storage maintenance is invisible to CDC;
    - a delete-with-rewrite (domain takedown) surfaces the removed rows
      as '-' entries.

    exceptAll keeps duplicate multiplicity exact (two identical rows
    added = two '+' rows). Cost: two scans + the except shuffles; at
    archive scale diff consecutive snapshots (the appended files alone)
    rather than distant ones."""
    from pyspark.sql import functions as F

    def _read(snap_id: int):
        paths = log.data_paths(table, snapshot_id=snap_id)
        if not paths:
            return None
        return spark.read.parquet(*paths)

    old = _read(from_id)
    new = _read(to_id)
    if new is None and old is None:
        raise ValueError(f"no data at either snapshot for {table!r}")
    if old is None:
        return new.withColumn("change_type", F.lit("+"))
    if new is None:
        return old.withColumn("change_type", F.lit("-"))
    added = new.exceptAll(old).withColumn("change_type", F.lit("+"))
    removed = old.exceptAll(new).withColumn("change_type", F.lit("-"))
    return added.unionByName(removed)
