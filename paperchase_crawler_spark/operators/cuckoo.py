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

    def widen(self, new_ways: int) -> None:
        """Grow associativity in place (zero-padded new ways). Pair-exact:
        every stored (index, fp) keeps its index, so membership answers are
        unchanged — this is the one growth axis a partial-key filter can take
        WITHOUT the original keys (growing m_slots would need i1 mod the new
        size, which a stored index mod the old size cannot recover)."""
        if new_ways <= self.ways:
            return
        wider = np.zeros((self.m, new_ways), dtype=np.uint16)
        wider[:, : self.ways] = self.slots
        self.slots = wider
        self.ways = new_ways

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
    ) -> tuple[np.ndarray, np.ndarray]:
        """Insert (index, fp) pairs; returns the pairs that could not be
        placed even after eviction (empty at sane loads — callers either
        raise or widen and re-insert them). A failed eviction walk returns
        the IN-HAND displaced pair, not the original item — every swap along
        the walk stayed in the table, so (placed ∪ returned) is exactly the
        input multiset and nothing is silently dropped. Bulk-vectorized
        placement first; only collision leftovers walk the per-item loop."""
        empty_pair = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint16))
        pending = self._bulk_place(idx, fp)
        if not pending.any():
            return empty_pair
        idx, fp = idx[pending], fp[pending]
        rng = np.random.default_rng(42)  # deterministic eviction walk
        left_idx: list[int] = []
        left_fp: list[int] = []
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
                left_idx.append(cur)
                left_fp.append(int(f_cur))
        if not left_idx:
            return empty_pair
        return (
            np.asarray(left_idx, dtype=np.int64),
            np.asarray(left_fp, dtype=np.uint16),
        )

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


def _insert_with_growth(
    t: _Table, idx: np.ndarray, fp: np.ndarray, max_ways: int, what: str
) -> _Table:
    """Insert pairs, doubling associativity on saturation up to ``max_ways``.

    Associativity (ways) is the ONE growth axis a partial-key cuckoo filter
    can take without the original keys: widening keeps every stored (index,
    fp) pair at its index, so membership answers are exactly preserved.
    Growing m_slots instead would need each pair's i1 mod the NEW size, and a
    stored index mod the old size cannot recover that bit — a full rebuild
    from the exact seen table (which this engine always keeps — operators/
    seen.py downstream anti-join) is the operational path for slot growth.
    Cost of widening: slot-level FPR ≈ 2·ways/2^16 doubles per step, which is
    why ``max_ways`` caps it (ways=64 ⇒ FPR ≈ 2e-3, still a >500× duplicate-
    traffic reducer); past the cap the filter fails loudly as before."""
    while True:
        idx, fp = t.insert_pairs(idx, fp)
        if not len(idx):
            return t
        if t.ways * 2 > max_ways:
            raise ValueError(
                f"cuckoo {what} over capacity at max_ways={max_ways}: "
                f"{len(idx)} pairs unplaced — raise m_slots (full rebuild) "
                "or max_ways"
            )
        t.widen(t.ways * 2)


class CuckooSeen:
    """Parameters for one bucketed cuckoo filter (build/probe/delete/merge).

    Same call shapes as operators.seen.BloomSeen, so ``filter_new`` accepts
    either backend. Sizing: a shard holds m_slots × ways fingerprints; a
    bucket whose DISTINCT keys exceed ~0.95 · m_slots · ways auto-resizes by
    doubling ways (see _insert_with_growth — exact, key-free) up to
    ``max_ways``, past which build/merge raise (fail-loud beats silent
    degradation). Probe/merge/delete accept shards of ANY ways mix: a
    shard's ways is derived from its blob length, so resized and original
    shards coexist in one table."""

    def __init__(
        self,
        n_buckets: int = 256,
        m_slots: int = 1 << 12,
        ways: int = 4,
        max_ways: int = 64,
    ):
        assert m_slots & (m_slots - 1) == 0, "m_slots must be a power of two"
        self.n_buckets = n_buckets
        self.m_slots = m_slots
        self.ways = ways
        self.max_ways = max(max_ways, ways)

    def _from_blob(self, blob: bytes) -> _Table:
        """Rehydrate a shard blob; its ways is encoded by its length."""
        ways = len(blob) // (2 * self.m_slots)
        return _Table(
            self.m_slots,
            ways,
            np.frombuffer(blob, dtype=np.uint16).reshape(self.m_slots, ways).copy(),
        )

    def bucket_col(self, url_hash: str = "url_hash") -> F.Column:
        return F.pmod(F.col(url_hash), F.lit(self.n_buckets)).cast("int")

    # -- build -----------------------------------------------------------------

    def build(self, hashes: DataFrame, url_hash: str = "url_hash") -> DataFrame:
        """(url_hash) rows → shard table, one shard per non-empty bucket.
        Duplicate keys are dropped up front (np.unique): the BloomSeen
        backend this is call-compatible with tolerates duplicates, so build
        must too — without it each duplicate would burn a slot and a
        non-distinct input could spuriously saturate (and n_keys would
        double-count through merge)."""
        m, ways, max_ways = self.m_slots, self.ways, self.max_ways

        def _build(pdf: pd.DataFrame) -> pd.DataFrame:
            u = np.unique(pdf[url_hash].to_numpy(dtype=np.int64).view(np.uint64))
            t = _insert_with_growth(
                _Table(m, ways), _i1(u, m), _fingerprints(u), max_ways,
                f"bucket {int(pdf['bucket'].iloc[0])} build",
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
        the XOR alternation re-derives each pair's partner index. Shards of
        different ways merge fine: the widest one seeds the accumulator, and
        the accumulator itself widens on saturation (up to max_ways)."""
        max_ways = self.max_ways
        from_blob = self._from_blob

        def _merge(pdf: pd.DataFrame) -> pd.DataFrame:
            blobs = sorted(pdf["bitset"], key=len, reverse=True)
            acc = from_blob(blobs[0])
            for blob in blobs[1:]:
                t = from_blob(blob)
                idx, way = np.nonzero(t.slots)
                acc = _insert_with_growth(
                    acc, idx.astype(np.int64), t.slots[idx, way], max_ways, "merge"
                )
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
        m = self.m_slots
        from_blob = self._from_blob
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
                hit |= from_blob(blob).contains(i1, fp)
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
        m = self.m_slots
        from_blob = self._from_blob
        out_cols = [f.name for f in CUCKOO_SHARD.fields]

        def _delete(shard: pd.DataFrame, kdf: pd.DataFrame) -> pd.DataFrame:
            if shard.empty:
                return pd.DataFrame({c: [] for c in out_cols})
            if len(shard) > 1:
                raise ValueError(
                    "cuckoo delete requires compacted shards (one row per "
                    "bucket) — call merge() first"
                )
            t = from_blob(shard["bitset"].iloc[0])
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
