"""Distributed cuckoo filter: no false negatives, FPR bound, merge ≡ union,
deletion (the capability Bloom lacks), filter_new drop-in equivalence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from paperchase_crawler_spark.operators.cuckoo import CuckooSeen
from paperchase_crawler_spark.operators.seen import anti_join_seen, filter_new

CK = dict(n_buckets=16, m_slots=1 << 10, ways=4)


def _keys(spark, lo, hi, salt=0):
    return spark.range(lo, hi).select(
        (F.xxhash64(F.col("id") + salt)).alias("url_hash")
    )


def test_no_false_negatives_and_fpr_bound(spark):
    ck = CuckooSeen(**CK)
    seen = _keys(spark, 0, 20_000)
    shards = ck.build(seen).localCheckpoint()
    probed = ck.probe(seen, shards).agg(
        F.count("*").alias("n"), F.count_if("maybe_seen").alias("hit")
    ).collect()[0]
    assert probed["hit"] == probed["n"]  # NO false negatives
    fresh = _keys(spark, 100_000, 140_000, salt=7)
    fp = ck.probe(fresh, shards).agg(
        F.count("*").alias("n"), F.count_if("maybe_seen").alias("hit")
    ).collect()[0]
    # slot-level FPR ≈ 2·ways/2^16 ≈ 1.2e-4; allow generous slack
    assert fp["hit"] / fp["n"] < 0.005


def test_merge_equals_union_build(spark):
    ck = CuckooSeen(**CK)
    a, b = _keys(spark, 0, 5_000), _keys(spark, 5_000, 10_000)
    merged = ck.merge(ck.build(a), ck.build(b)).localCheckpoint()
    probe_all = ck.probe(_keys(spark, 0, 10_000), merged)
    assert probe_all.filter(~F.col("maybe_seen")).count() == 0
    # one shard row per bucket after merge
    assert merged.groupBy("bucket").count().filter("count > 1").count() == 0


def test_delete_unsees_keys(spark):
    ck = CuckooSeen(**CK)
    seen = _keys(spark, 0, 10_000)
    shards = ck.build(seen).localCheckpoint()
    gone = _keys(spark, 0, 1_000)
    kept = _keys(spark, 1_000, 10_000)
    after = ck.delete(shards, gone).localCheckpoint()
    # remaining keys keep the no-false-negative contract
    kept_probe = ck.probe(kept, after).agg(
        F.count("*").alias("n"), F.count_if("maybe_seen").alias("hit")
    ).collect()[0]
    assert kept_probe["hit"] == kept_probe["n"]
    # deleted keys now probe false (up to fingerprint-collision noise)
    gone_hits = ck.probe(gone, after).filter("maybe_seen").count()
    assert gone_hits <= 3


def test_filter_new_cuckoo_equals_exact(spark):
    """CuckooSeen is a drop-in backend for operators.seen.filter_new: the
    cuckoo-accelerated result must equal the plain exact anti-join."""
    ck = CuckooSeen(**CK)
    seen = _keys(spark, 0, 8_000)
    cand = _keys(spark, 4_000, 12_000)
    shards = ck.build(seen).localCheckpoint()
    got = sorted(r[0] for r in filter_new(cand, seen, ck, shards).collect())
    want = sorted(r[0] for r in anti_join_seen(cand, seen).collect())
    assert got == want


def test_build_raises_at_saturation_when_growth_capped(spark):
    # max_ways == ways disables auto-resize → the classic fail-loud contract
    ck = CuckooSeen(n_buckets=1, m_slots=1 << 6, ways=2, max_ways=2)  # 128 slots
    with pytest.raises(Exception, match="over capacity"):
        ck.build(_keys(spark, 0, 1_000)).collect()


def test_build_tolerates_duplicate_keys(spark):
    """BloomSeen tolerates duplicate input keys, so the drop-in cuckoo must
    too: each key repeated 4× at a volume that would over-saturate if
    duplicates burned slots. n_keys counts DISTINCT keys."""
    ck = CuckooSeen(n_buckets=1, m_slots=1 << 5, ways=2, max_ways=2)  # 64 slots
    one = _keys(spark, 0, 50)
    dup = one.unionAll(one).unionAll(one).unionAll(one)  # 200 rows, 50 distinct
    shards = ck.build(dup).localCheckpoint()
    assert shards.agg(F.sum("n_keys")).collect()[0][0] == 50
    probed = ck.probe(one, shards).agg(
        F.count("*").alias("n"), F.count_if("maybe_seen").alias("hit")
    ).collect()[0]
    assert probed["hit"] == probed["n"]


def test_auto_resize_grows_ways_no_false_negatives(spark):
    """Past ~0.95·m·ways the shard auto-resizes by doubling associativity
    (the key-free growth axis — widening keeps every (index, fp) pair at its
    index, so membership is exactly preserved); FPR stays within the widened
    bound 2·ways/2^16."""
    ck = CuckooSeen(n_buckets=1, m_slots=1 << 6, ways=2)  # 128 slots, grows
    seen = _keys(spark, 0, 1_000)  # needs ways ≥ 16
    shards = ck.build(seen).localCheckpoint()
    blob_len = len(shards.select("bitset").collect()[0][0])
    ways_used = blob_len // (2 * ck.m_slots)
    assert ways_used >= 16  # resize actually happened
    probed = ck.probe(seen, shards).agg(
        F.count("*").alias("n"), F.count_if("maybe_seen").alias("hit")
    ).collect()[0]
    assert probed["hit"] == probed["n"]  # NO false negatives after resize
    fresh = _keys(spark, 100_000, 140_000, salt=11)
    fp = ck.probe(fresh, shards).agg(
        F.count("*").alias("n"), F.count_if("maybe_seen").alias("hit")
    ).collect()[0]
    # slot-level FPR bound at the widened associativity, with 3× slack
    assert fp["hit"] / fp["n"] < 3 * 2 * ways_used / (1 << 16)


def test_merge_mixed_ways_shards(spark):
    """A resized shard and an original-width shard merge into one row whose
    membership covers both inputs (the accumulator widens as needed)."""
    ck = CuckooSeen(n_buckets=1, m_slots=1 << 6, ways=2)
    a = _keys(spark, 0, 1_000)      # forces resize
    b = _keys(spark, 1_000, 1_050)  # fits at ways=2
    merged = ck.merge(ck.build(a), ck.build(b)).localCheckpoint()
    assert merged.count() == 1
    probed = ck.probe(_keys(spark, 0, 1_050), merged).agg(
        F.count("*").alias("n"), F.count_if("maybe_seen").alias("hit")
    ).collect()[0]
    assert probed["hit"] == probed["n"]
