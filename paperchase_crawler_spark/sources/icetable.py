"""icetable — snapshot-log Parquet tables with Iceberg's semantics contract.

The north_rule demands an "Iceberg-backed priority frontier ... resumable from
Iceberg snapshot checkpoints with per-partition lineage and fetch/parse
metrics" (BASELINE.json:14). This sandbox has no iceberg-spark-runtime jar, no
pyiceberg, and no network (SURVEY.md §0.1), so this module provides the
*semantics* Iceberg gives us, in ~200 lines, with the same call shapes:

- layout: ``table/data/s<id>-<uuid>/part-*.parquet`` (one dir per commit) +
  ``table/metadata/snap-<id>.json`` + ``table/metadata/VERSION`` (the atomic
  current-snapshot pointer, written last via ``os.replace``).
- snapshot JSON records the **file list** (readers never directory-list),
  parent id, operation, per-file row counts (per-partition lineage), and an
  arbitrary ``meta`` dict (fetch/parse metrics, crawl counters).
- ops: ``append(df)``, ``overwrite(df)``, ``read(spark, snapshot_id=None)``
  (time travel), ``snapshot_ids()``, ``rollback(id)``.

Swapping in real Iceberg is localized: replace append/overwrite with
``df.writeTo(tbl).append()`` / ``.overwritePartitions()`` and read with
``spark.table(tbl)`` + ``VERSION AS OF``; the crawl loop only touches this
interface.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from typing import Any

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession


class IceTable:
    def __init__(self, path: str):
        self.path = path
        self.data_dir = os.path.join(path, "data")
        self.meta_dir = os.path.join(path, "metadata")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.meta_dir, exist_ok=True)

    # -- metadata ------------------------------------------------------------

    def _version_file(self) -> str:
        return os.path.join(self.meta_dir, "VERSION")

    def current_snapshot_id(self) -> int | None:
        try:
            with open(self._version_file()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def snapshot(self, snapshot_id: int | None = None) -> dict[str, Any] | None:
        sid = snapshot_id if snapshot_id is not None else self.current_snapshot_id()
        if sid is None:
            return None
        with open(os.path.join(self.meta_dir, f"snap-{sid}.json")) as f:
            return json.load(f)

    def snapshot_ids(self) -> list[int]:
        out = []
        for name in os.listdir(self.meta_dir):
            if name.startswith("snap-") and name.endswith(".json"):
                out.append(int(name[5:-5]))
        return sorted(out)

    # -- commits -------------------------------------------------------------

    def _next_sid(self) -> int:
        """Snapshot ids are NEVER reused (Iceberg semantics): after a rollback
        the next commit takes max(existing)+1, so rolled-back-over snapshots
        stay valid time-travel history instead of being silently overwritten."""
        ids = self.snapshot_ids()
        return (ids[-1] + 1) if ids else 0

    def _write_data(self, df: DataFrame, sid: int) -> tuple[list[str], dict[str, int]]:
        sub = os.path.join(self.data_dir, f"s{sid}-{uuid.uuid4().hex[:8]}")
        df.write.mode("errorifexists").parquet(sub)
        files = sorted(
            os.path.join(sub, f)
            for f in os.listdir(sub)
            if f.endswith(".parquet")
        )
        counts = {f: pq.ParquetFile(f).metadata.num_rows for f in files}
        self.last_commit_bytes = sum(os.path.getsize(f) for f in files)
        return files, counts

    def _commit(
        self,
        op: str,
        files: list[str],
        counts: dict[str, int],
        meta: dict[str, Any] | None,
    ) -> int:
        parent = self.current_snapshot_id()
        sid = self._next_sid()
        snap = {
            "id": sid,
            "parent": parent,
            "op": op,
            "files": files,
            "row_counts": counts,
            "total_rows": sum(counts.values()),
            "meta": meta or {},
        }
        snap_path = os.path.join(self.meta_dir, f"snap-{sid}.json")
        tmp = snap_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(snap, f)
        os.replace(tmp, snap_path)
        vtmp = self._version_file() + ".tmp"
        with open(vtmp, "w") as f:
            f.write(str(sid))
        os.replace(vtmp, self._version_file())  # atomic pointer swap, LAST
        return sid

    def append(self, df: DataFrame, meta: dict[str, Any] | None = None) -> int:
        parent = self.snapshot()
        files, counts = self._write_data(df, self._next_sid())
        if parent:
            files = parent["files"] + files
            counts = {**parent["row_counts"], **counts}
        return self._commit("append", files, counts, meta)

    def overwrite(self, df: DataFrame, meta: dict[str, Any] | None = None) -> int:
        files, counts = self._write_data(df, self._next_sid())
        return self._commit("overwrite", files, counts, meta)

    def commit_empty(self, meta: dict[str, Any] | None = None) -> int:
        """Metadata-only commit (carries counters without rewriting data)."""
        parent = self.snapshot()
        files = parent["files"] if parent else []
        counts = parent["row_counts"] if parent else {}
        return self._commit("meta", files, counts, meta)

    # -- reads ---------------------------------------------------------------

    def read(self, spark: SparkSession, snapshot_id: int | None = None) -> DataFrame:
        snap = self.snapshot(snapshot_id)
        if snap is None or not snap["files"]:
            raise ValueError(f"icetable {self.path}: no data at snapshot {snapshot_id}")
        return spark.read.parquet(*snap["files"])

    def rollback(self, snapshot_id: int | None) -> None:
        """Point VERSION back at ``snapshot_id``. ``None`` rolls back to the
        never-committed state (needed when a crash happened during a table's
        FIRST-ever commit: the checkpoint recorded no snapshot to return to).
        Later snapshots remain on disk as history; new commits take fresh ids."""
        if snapshot_id is None:
            try:
                os.remove(self._version_file())
            except FileNotFoundError:
                pass
            return
        if snapshot_id not in self.snapshot_ids():
            raise ValueError(f"unknown snapshot {snapshot_id}")
        vtmp = self._version_file() + ".tmp"
        with open(vtmp, "w") as f:
            f.write(str(snapshot_id))
        os.replace(vtmp, self._version_file())

    def expire_orphans(self) -> int:
        """Remove data dirs not referenced by any snapshot (vacuum)."""
        referenced: set[str] = set()
        for sid in self.snapshot_ids():
            for f in self.snapshot(sid)["files"]:
                referenced.add(os.path.dirname(f))
        removed = 0
        for sub in os.listdir(self.data_dir):
            full = os.path.join(self.data_dir, sub)
            if full not in referenced:
                shutil.rmtree(full)
                removed += 1
        return removed
