"""Bucketed Bloom: no false negatives, bounded FPR, filter_new ≡ exact."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from paperchase_crawler_spark.operators.seen import BloomSeen, anti_join_seen, filter_new


def _hashes(spark, vals):
    return spark.createDataFrame([(int(v),) for v in vals], "url_hash long")


def test_no_false_negatives_and_fpr(spark):
    rng = random.Random(42)
    member = [rng.randrange(-(2**63), 2**63) for _ in range(5000)]
    other = [rng.randrange(-(2**63), 2**63) for _ in range(5000)]
    other = [x for x in other if x not in set(member)]
    bloom = BloomSeen(n_buckets=16, m_bits=1 << 14, k=7)
    shards = bloom.build(_hashes(spark, member))
    probed = bloom.probe(_hashes(spark, member + other), shards)
    got = {r.url_hash: r.maybe_seen for r in probed.collect()}
    assert all(got[m] for m in member), "Bloom false negative!"
    fpr = sum(got[o] for o in other) / len(other)
    # ~312 keys per bucket in 16384 bits, k=7 → theoretical FPR ≈ 2e-4
    assert fpr <= 0.01, fpr


def test_merge_is_union(spark):
    a, b = list(range(100)), list(range(50, 200))
    bloom = BloomSeen(n_buckets=4, m_bits=1 << 12, k=5)
    merged = bloom.merge(bloom.build(_hashes(spark, a)), bloom.build(_hashes(spark, b)))
    probed = bloom.probe(_hashes(spark, list(range(200))), merged)
    assert all(r.maybe_seen for r in probed.collect())
    assert {r.n_keys for r in merged.collect()} != set()


def test_filter_new_equals_exact(spark):
    rng = random.Random(7)
    seen_vals = [rng.randrange(-(2**63), 2**63) for _ in range(2000)]
    cand_vals = seen_vals[::3] + [rng.randrange(-(2**63), 2**63) for _ in range(1000)]
    seen = _hashes(spark, seen_vals)
    cands = _hashes(spark, cand_vals).withColumn("tag", F.col("url_hash") % 10)
    bloom = BloomSeen(n_buckets=8, m_bits=1 << 13, k=5)
    shards = bloom.build(seen)
    exact = sorted(r.url_hash for r in anti_join_seen(cands, seen).collect())
    accel = sorted(r.url_hash for r in filter_new(cands, seen, bloom, shards).collect())
    assert accel == exact
    cols = filter_new(cands, seen, bloom, shards).columns
    assert cols == cands.columns  # schema preserved, no leak of maybe_seen
