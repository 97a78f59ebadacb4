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

    # -- bucketed / merge-on-read commits --------------------------------------
    #
    # Iceberg-v2-style layout for the frontier (north_rule: "partitioned
    # Iceberg-backed priority frontier" at 10^10 rows): data is hash-bucketed
    # by a stable key (pmod(xxhash64(host), NB) so politeness sees every row
    # of a host in ONE bucket), the base is written once, and each round
    # APPENDS per-bucket delta files carrying full replacement rows tagged
    # with a monotone __rev column (the snapshot id). Readers merge
    # last-wins per key WITHIN each bucket — a narrow, shuffle-free plan —
    # and compaction folds deltas back into the base when they outgrow it.
    # This replaces the full-table overwrite per round: a round commits
    # O(changed rows), not O(frontier).
    #
    # ``zone_fn`` (optional on every bucketed commit) computes per-file ZONE
    # MAP stats for the files just written — with real Iceberg these are the
    # manifest column stats writers emit for free; the shim recomputes them in
    # one narrow pass over the new files only. Zones live in
    # meta["buckets"]["zones"] = {file: {...}} and let planners skip buckets
    # that provably cannot contribute (operators/frontier_select pruned SELECT).

    def _write_bucketed(self, df: DataFrame, sid: int) -> tuple[dict[str, list[str]], dict[str, int]]:
        """df must carry an int ``__fb`` bucket column; one file per bucket.
        Row groups are capped small (1 MB vs the 128 MB default) so sorted
        buckets give zone-pruned readers row-group-granular predicate
        pushdown; on a real cluster the default is fine — 128 MB over a
        sorted multi-GB bucket is already selective."""
        sub = os.path.join(self.data_dir, f"s{sid}-{uuid.uuid4().hex[:8]}")
        df.write.mode("errorifexists").option(
            "parquet.block.size", str(1 << 20)
        ).partitionBy("__fb").parquet(sub)
        buckets: dict[str, list[str]] = {}
        counts: dict[str, int] = {}
        total_bytes = 0
        for d in sorted(os.listdir(sub)):
            if not d.startswith("__fb="):
                continue
            b = d.split("=", 1)[1]
            files = sorted(
                os.path.join(sub, d, f)
                for f in os.listdir(os.path.join(sub, d))
                if f.endswith(".parquet")
            )
            buckets[b] = files
            for f in files:
                counts[f] = pq.ParquetFile(f).metadata.num_rows
                total_bytes += os.path.getsize(f)
        self.last_commit_bytes = total_bytes
        return buckets, counts

    def overwrite_bucketed(
        self,
        df: DataFrame,
        n_buckets: int,
        meta: dict[str, Any] | None = None,
        zone_fn=None,
    ) -> int:
        buckets, counts = self._write_bucketed(df, self._next_sid())
        files = [f for fs in buckets.values() for f in fs]
        meta = dict(meta or {})
        meta["buckets"] = {
            "n": n_buckets,
            "base": buckets,
            "delta": {},
            "zones": zone_fn(files) if zone_fn else {},
        }
        return self._commit("overwrite", files, counts, meta)

    def append_bucketed_delta(
        self, df: DataFrame, meta: dict[str, Any] | None = None, zone_fn=None
    ) -> int:
        parent = self.snapshot()
        if parent is None or "buckets" not in parent["meta"]:
            raise ValueError("append_bucketed_delta requires a bucketed base")
        new_buckets, new_counts = self._write_bucketed(df, self._next_sid())
        new_files = [f for fs in new_buckets.values() for f in fs]
        bk = {
            "n": parent["meta"]["buckets"]["n"],
            "base": parent["meta"]["buckets"]["base"],
            "delta": {
                b: list(fs) for b, fs in parent["meta"]["buckets"]["delta"].items()
            },
            "zones": dict(parent["meta"]["buckets"].get("zones", {})),
        }
        for b, fs in new_buckets.items():
            bk.setdefault("delta", {}).setdefault(b, [])
            bk["delta"][b] = bk["delta"].get(b, []) + fs
        if zone_fn:
            bk["zones"].update(zone_fn(new_files))
        meta = dict(meta or {})
        meta["buckets"] = bk
        files = parent["files"] + new_files
        counts = {**parent["row_counts"], **new_counts}
        return self._commit("append", files, counts, meta)

    def overwrite_buckets_partial(
        self,
        df: DataFrame,
        buckets: list[str],
        meta: dict[str, Any] | None = None,
        zone_fn=None,
    ) -> int:
        """Rewrite ONLY ``buckets``: their base becomes the files written from
        ``df`` (which must contain exactly those buckets' rows, ``__fb``
        tagged) and their deltas clear; every other bucket keeps its base and
        delta files untouched. This is what makes compaction o(table): cold
        buckets are neither read nor rewritten (VERDICT r2 "What's missing"
        #3 / frontier compaction scoping)."""
        parent = self.snapshot()
        if parent is None or "buckets" not in parent["meta"]:
            raise ValueError("overwrite_buckets_partial requires a bucketed base")
        pbk = parent["meta"]["buckets"]
        new_buckets, new_counts = self._write_bucketed(df, self._next_sid())
        unknown = set(new_buckets) - set(buckets)
        if unknown:
            raise ValueError(f"df contains rows outside target buckets: {unknown}")
        base = {b: list(fs) for b, fs in pbk["base"].items()}
        delta = {b: list(fs) for b, fs in pbk.get("delta", {}).items()}
        zones = dict(pbk.get("zones", {}))
        for b in buckets:
            for f in base.get(b, []) + delta.get(b, []):
                zones.pop(f, None)
            base[b] = new_buckets.get(b, [])
            delta.pop(b, None)
        new_files = [f for fs in new_buckets.values() for f in fs]
        if zone_fn:
            zones.update(zone_fn(new_files))
        files = [f for fs in base.values() for f in fs] + [
            f for fs in delta.values() for f in fs
        ]
        counts = {f: parent["row_counts"][f] for f in files if f in parent["row_counts"]}
        counts.update(new_counts)
        meta = dict(meta or {})
        meta["buckets"] = {"n": pbk["n"], "base": base, "delta": delta, "zones": zones}
        return self._commit("replace", files, counts, meta)

    def bucket_plan(
        self, snapshot_id: int | None = None
    ) -> dict[str, dict[str, list[str]]]:
        """bucket → {"base": [files], "delta": [files in commit order]}."""
        snap = self.snapshot(snapshot_id)
        if snap is None or "buckets" not in snap["meta"]:
            raise ValueError(f"icetable {self.path}: not a bucketed table")
        bk = snap["meta"]["buckets"]
        out: dict[str, dict[str, list[str]]] = {}
        for b, fs in bk["base"].items():
            out[b] = {"base": list(fs), "delta": []}
        for b, fs in bk.get("delta", {}).items():
            out.setdefault(b, {"base": [], "delta": []})["delta"] = list(fs)
        return out

    def bucket_zones(self, snapshot_id: int | None = None) -> dict[str, dict]:
        """file → zone-map stats dict (empty for files committed without a
        zone_fn — planners must treat a missing entry as 'unknown, scan')."""
        snap = self.snapshot(snapshot_id)
        if snap is None or "buckets" not in snap["meta"]:
            raise ValueError(f"icetable {self.path}: not a bucketed table")
        return snap["meta"]["buckets"].get("zones", {})

    def delta_fraction(self) -> float:
        """delta rows / base rows at the current snapshot (compaction gauge)."""
        snap = self.snapshot()
        bk = snap["meta"]["buckets"]
        counts = snap["row_counts"]
        base = sum(counts[f] for fs in bk["base"].values() for f in fs)
        delta = sum(counts[f] for fs in bk.get("delta", {}).values() for f in fs)
        return (delta / base) if base else float("inf")

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

    def expire_snapshots(self, keep_last: int = 10) -> int:
        """Iceberg-style retention: drop all but the newest ``keep_last``
        snapshot JSONs (never the current one), then vacuum data dirs no
        surviving snapshot references. Bounds metadata AND data growth for
        long crawls — without it every frontier delta/compaction generation
        stays pinned forever. Returns the number of snapshots removed."""
        ids = self.snapshot_ids()
        current = self.current_snapshot_id()
        keep = set(ids[-keep_last:])
        if current is not None:
            keep.add(current)
        removed = 0
        for sid in ids:
            if sid not in keep:
                os.remove(os.path.join(self.meta_dir, f"snap-{sid}.json"))
                removed += 1
        if removed:
            self.expire_orphans()
        return removed

    def expire_orphans(self) -> int:
        """Remove data dirs not referenced by any snapshot (vacuum).

        Bucketed commits nest files one level deeper (``s<id>-<uuid>/
        __fb=<b>/part-*``), so a top-level dir is referenced if any snapshot
        file lives anywhere UNDER it — not only directly inside it."""
        referenced: set[str] = set()
        for sid in self.snapshot_ids():
            for f in self.snapshot(sid)["files"]:
                d = os.path.dirname(f)
                while len(d) > len(self.data_dir):
                    referenced.add(d)
                    d = os.path.dirname(d)
        removed = 0
        for sub in os.listdir(self.data_dir):
            full = os.path.join(self.data_dir, sub)
            if full not in referenced:
                shutil.rmtree(full)
                removed += 1
        return removed
