"""URL-seen membership — distributed bucketed CUCKOO filter.

north_rule names "a distributed Bloom/cuckoo URL-seen filter"; rounds 1-2
shipped the Bloom half (operators/seen.py) and documented cuckoo as an
omission. This closes it with the classic partial-key cuckoo filter
(Fan et al., CoNLL'14 — public algorithm): per bucket, a table of
``m_slots × ways`` 16-bit fingerprints; key u gets

    fp  = (xxh64(u) & 0xFFFF) or 1           (fingerprints are non-zero)
    i1  = h(u) mod m_slots
    i2  = i1 XOR (h(fp) mod m_slots)         (m_slots is a power of two)

and lives in either index. The XOR alternation means a stored (index, fp)
pair is enough to re-derive its partner index — which is what makes shard
REBUILD/merge and DELETION possible without the original keys, the two
things a Bloom filter cannot do:

- no false negatives for inserted keys (same contract as the Bloom probe —
  the exact anti-join downstream keeps total exactness);
- FPR ≈ 2 · ways / 2^16 at the slot level (~1.2e-4 at ways=4), independent
  of load until the table saturates (uses ~fingerprint_bits/load space);
- ``delete`` removes a key's fingerprint, so a crawl can *unsee* URLs
  (re-crawl invalidation) — the operational reason cuckoo filters exist.

Distribution mirrors BloomSeen: the filter is a TABLE of shards
``(bucket:int, slots:binary, n_keys:long)`` with bucket = pmod(url_hash, B);
build/probe/delete are grouped/cogrouped pandas ops over numpy uint16
arrays — vectorized, no per-row Python in probe (insert's eviction walk is a
bounded per-overflow-item loop, a tiny fraction at sane loads). The probe
uses cogroup so a bucket's slot table is never replicated per candidate row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, StructField, StructType

from ..functions.hashing import xxh64_u64_vec
from ..schemas import BLOOM_SHARD as CUCKOO_SHARD  # same shard table shape

_FP_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_IDX_GOLDEN = np.uint64(0xC2B2AE3D27D4EB4F)


def _fingerprints(u: np.ndarray) -> np.ndarray:
    """Non-zero 16-bit fingerprints from unsigned u64 keys."""
    fp = (xxh64_u64_vec(u ^ _FP_GOLDEN) & np.uint64(0xFFFF)).astype(np.uint16)
    fp[fp == 0] = 1
    return fp


def _i1(u: np.ndarray, m_slots: int) -> np.ndarray:
    return (xxh64_u64_vec(u ^ _IDX_GOLDEN) % np.uint64(m_slots)).astype(np.int64)


def _alt_index(idx: np.ndarray, fp: np.ndarray, m_slots: int) -> np.ndarray:
    """Partner index: i XOR h(fp), mod m_slots (power of two)."""
    h = xxh64_u64_vec(fp.astype(np.uint64)) % np.uint64(m_slots)
    return (idx.astype(np.uint64) ^ h).astype(np.int64) % m_slots


class _Table:
    """In-kernel dense slot table for one bucket (numpy uint16, 0 = empty)."""

    def __init__(self, m_slots: int, ways: int, slots: np.ndarray | None = None):
        self.m = m_slots
        self.ways = ways
        self.slots = (
            slots if slots is not None else np.zeros((m_slots, ways), dtype=np.uint16)
        )

    def _bulk_place(self, idx: np.ndarray, fp: np.ndarray) -> np.ndarray:
        """Vectorized placement sweep: for each way, the first pending item
        per index lands in that way if the slot is empty. Returns the mask of
        items still unplaced (the eviction loop's small remainder) — the hot
        path stays numpy, no per-item Python."""
        pending = np.ones(len(idx), dtype=bool)
        for target in (idx, _alt_index(idx, fp, self.m)):
            for w in range(self.ways):
                p = np.flatnonzero(pending)
                if not p.size:
                    return pending
                t = target[p]
                empty = self.slots[t, w] == 0
                order = np.argsort(t, kind="stable")
                firsts = np.ones(len(order), dtype=bool)
                ts = t[order]
                if len(order) > 1:
                    firsts[1:] = ts[1:] != ts[:-1]
                winners = p[order[firsts & empty[order]]]
                self.slots[target[winners], w] = fp[winners]
                pending[winners] = False
        return pending

    def insert_pairs(
        self, idx: np.ndarray, fp: np.ndarray, max_kicks: int = 500
    ) -> int:
        """Insert (index, fp) pairs; returns the number that could not be
        placed even after eviction (0 at sane loads — callers raise).
        Bulk-vectorized placement first; only collision leftovers walk the
        per-item eviction loop."""
        pending = self._bulk_place(idx, fp)
        if not pending.any():
            return 0
        idx, fp = idx[pending], fp[pending]
        rng = np.random.default_rng(42)  # deterministic eviction walk
        failed = 0
        for i, f in zip(idx.tolist(), fp.tolist()):
            f = np.uint16(f)
            placed = False
            cur = i
            for _ in range(2):
                row = self.slots[cur]
                empty = np.flatnonzero(row == 0)
                if empty.size:
                    row[empty[0]] = f
                    placed = True
                    break
                cur = int(
                    _alt_index(np.array([cur]), np.array([f], dtype=np.uint16), self.m)[0]
                )
            if placed:
                continue
            # eviction random walk from i1
            cur, f_cur = i, f
            for _ in range(max_kicks):
                way = int(rng.integers(self.ways))
                f_cur, self.slots[cur, way] = self.slots[cur, way], f_cur
                cur = int(
                    _alt_index(
                        np.array([cur]), np.array([f_cur], dtype=np.uint16), self.m
                    )[0]
                )
                row = self.slots[cur]
                empty = np.flatnonzero(row == 0)
                if empty.size:
                    row[empty[0]] = f_cur
                    placed = True
                    break
            if not placed:
                failed += 1
        return failed

    def contains(self, idx1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        """Vectorized membership for (i1, fp) pairs."""
        idx2 = _alt_index(idx1, fp, self.m)
        fpc = fp[:, None]
        return ((self.slots[idx1] == fpc) | (self.slots[idx2] == fpc)).any(axis=1)

    def delete(self, idx1: np.ndarray, fp: np.ndarray) -> int:
        """Remove ONE matching fingerprint per key (i1 first, then i2).
        Returns how many were found and removed."""
        removed = 0
        idx2 = _alt_index(idx1, fp, self.m)
        for i1_, i2_, f in zip(idx1.tolist(), idx2.tolist(), fp.tolist()):
            for cur in (i1_, i2_):
                row = self.slots[cur]
                hit = np.flatnonzero(row == f)
                if hit.size:
                    row[hit[0]] = 0
                    removed += 1
                    break
        return removed


class CuckooSeen:
    """Parameters for one bucketed cuckoo filter (build/probe/delete/merge).

    Same call shapes as operators.seen.BloomSeen, so ``filter_new`` accepts
    either backend. Sizing: a shard holds m_slots × ways fingerprints; keep
    expected keys/bucket ≲ 0.95 · m_slots · ways or build raises (a cuckoo
    filter fails loudly at saturation instead of degrading silently)."""

    def __init__(self, n_buckets: int = 256, m_slots: int = 1 << 12, ways: int = 4):
        assert m_slots & (m_slots - 1) == 0, "m_slots must be a power of two"
        self.n_buckets = n_buckets
        self.m_slots = m_slots
        self.ways = ways

    def bucket_col(self, url_hash: str = "url_hash") -> F.Column:
        return F.pmod(F.col(url_hash), F.lit(self.n_buckets)).cast("int")

    # -- build -----------------------------------------------------------------

    def build(self, hashes: DataFrame, url_hash: str = "url_hash") -> DataFrame:
        """(url_hash) rows → shard table, one shard per non-empty bucket."""
        m, ways = self.m_slots, self.ways

        def _build(pdf: pd.DataFrame) -> pd.DataFrame:
            u = pdf[url_hash].to_numpy(dtype=np.int64).view(np.uint64)
            t = _Table(m, ways)
            failed = t.insert_pairs(_i1(u, m), _fingerprints(u))
            if failed:
                raise ValueError(
                    f"cuckoo bucket {int(pdf['bucket'].iloc[0])} over capacity: "
                    f"{failed} of {len(u)} keys unplaced — raise m_slots/ways"
                )
            return pd.DataFrame(
                {
                    "bucket": [int(pdf["bucket"].iloc[0])],
                    "bitset": [t.slots.tobytes()],
                    "n_keys": [len(u)],
                }
            )

        return (
            hashes.withColumn("bucket", self.bucket_col(url_hash))
            .groupBy("bucket")
            .applyInPandas(_build, CUCKOO_SHARD)
        )

    # -- merge -----------------------------------------------------------------

    def merge(self, *shard_dfs: DataFrame) -> DataFrame:
        """Fold multiple shard rows per bucket into one by re-inserting the
        stored (index, fp) pairs — possible WITHOUT the original keys because
        the XOR alternation re-derives each pair's partner index."""
        m, ways = self.m_slots, self.ways

        def _merge(pdf: pd.DataFrame) -> pd.DataFrame:
            acc = _Table(
                m, ways,
                np.frombuffer(pdf["bitset"].iloc[0], dtype=np.uint16)
                .reshape(m, ways)
                .copy(),
            )
            for blob in pdf["bitset"].iloc[1:]:
                slots = np.frombuffer(blob, dtype=np.uint16).reshape(m, ways)
                idx, way = np.nonzero(slots)
                failed = acc.insert_pairs(idx, slots[idx, way])
                if failed:
                    raise ValueError("cuckoo merge over capacity — raise m_slots")
            return pd.DataFrame(
                {
                    "bucket": [int(pdf["bucket"].iloc[0])],
                    "bitset": [acc.slots.tobytes()],
                    "n_keys": [int(pdf["n_keys"].sum())],
                }
            )

        df = shard_dfs[0]
        for other in shard_dfs[1:]:
            df = df.unionByName(other)
        return df.groupBy("bucket").applyInPandas(_merge, CUCKOO_SHARD)

    # -- probe -----------------------------------------------------------------

    def probe(
        self, candidates: DataFrame, shards: DataFrame, url_hash: str = "url_hash"
    ) -> DataFrame:
        """Append ``maybe_seen``; False ⇒ certainly not inserted. A bucket may
        hold several shard rows between compactions — a key is maybe-seen if
        ANY shard contains it (OR over shards ≡ Bloom's OR-of-shards)."""
        m, ways = self.m_slots, self.ways
        out_schema = StructType(
            candidates.schema.fields
            + [StructField("maybe_seen", BooleanType(), False)]
        )
        cand_cols = [f.name for f in candidates.schema.fields]

        def _probe(cand: pd.DataFrame, shard: pd.DataFrame) -> pd.DataFrame:
            out = cand[cand_cols].copy()
            if shard.empty:
                out["maybe_seen"] = False
                return out
            u = cand[url_hash].to_numpy(dtype=np.int64).view(np.uint64)
            i1, fp = _i1(u, m), _fingerprints(u)
            hit = np.zeros(len(u), dtype=bool)
            for blob in shard["bitset"]:
                t = _Table(m, ways, np.frombuffer(blob, dtype=np.uint16).reshape(m, ways))
                hit |= t.contains(i1, fp)
            out["maybe_seen"] = hit
            return out

        cand_b = candidates.withColumn("__bucket", self.bucket_col(url_hash))
        return (
            cand_b.groupBy("__bucket")
            .cogroup(shards.groupBy("bucket"))
            .applyInPandas(_probe, out_schema)
        )

    # -- delete ----------------------------------------------------------------

    def delete(
        self, shards: DataFrame, keys: DataFrame, url_hash: str = "url_hash"
    ) -> DataFrame:
        """New shard table with ``keys`` removed (one fingerprint per key) —
        the re-crawl/unsee operation a Bloom filter cannot express. Keys that
        were never inserted may, with FPR probability, evict a colliding
        fingerprint: semantically safe here (the filter stays a no-false-
        negative pre-filter for the REMAINING keys; the exact seen table is
        always the source of truth downstream)."""
        m, ways = self.m_slots, self.ways
        out_cols = [f.name for f in CUCKOO_SHARD.fields]

        def _delete(shard: pd.DataFrame, kdf: pd.DataFrame) -> pd.DataFrame:
            if shard.empty:
                return pd.DataFrame({c: [] for c in out_cols})
            if len(shard) > 1:
                raise ValueError(
                    "cuckoo delete requires compacted shards (one row per "
                    "bucket) — call merge() first"
                )
            t = _Table(
                m, ways,
                np.frombuffer(shard["bitset"].iloc[0], dtype=np.uint16)
                .reshape(m, ways)
                .copy(),
            )
            removed = 0
            if not kdf.empty:
                u = kdf[url_hash].to_numpy(dtype=np.int64).view(np.uint64)
                removed = t.delete(_i1(u, m), _fingerprints(u))
            return pd.DataFrame(
                {
                    "bucket": [int(shard["bucket"].iloc[0])],
                    "bitset": [t.slots.tobytes()],
                    "n_keys": [int(shard["n_keys"].iloc[0]) - removed],
                }
            )

        keyed = keys.withColumn("bucket", self.bucket_col(url_hash))
        return (
            shards.groupBy("bucket")
            .cogroup(keyed.groupBy("bucket"))
            .applyInPandas(_delete, CUCKOO_SHARD)
        )
