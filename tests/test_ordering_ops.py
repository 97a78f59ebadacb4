"""Distributed exact rank / top-k vs the naive single-partition truth."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from paperchase_crawler_spark.operators.ordering import (
    global_topk,
    global_topk_ranked,
    with_global_rank,
)


def _df(spark, n=500, seed=1):
    rng = random.Random(seed)
    rows = [(rng.randrange(5), i, rng.random()) for i in range(n)]
    rng.shuffle(rows)
    return spark.createDataFrame(rows, "depth int, disc_seq long, junk double").repartition(7)


def test_with_global_rank_matches_sort(spark):
    df = _df(spark)
    got = {
        r.disc_seq: r.rank
        for r in with_global_rank(df, ["depth", "disc_seq"], "rank", start=100).collect()
    }
    want = sorted((r.depth, r.disc_seq) for r in df.collect())
    for i, (_, seq) in enumerate(want):
        assert got[seq] == 100 + i


def test_global_topk_matches_sort(spark):
    df = _df(spark, n=300, seed=2)
    want = sorted((r.depth, r.disc_seq) for r in df.collect())[:37]
    got = sorted((r.depth, r.disc_seq) for r in global_topk(df, ["depth", "disc_seq"], 37).collect())
    assert got == want


def test_global_topk_ranked_matches_sort(spark):
    df = _df(spark, n=400, seed=4)
    want = sorted((r.depth, r.disc_seq) for r in df.collect())
    for k in (1, 37, 400, 9999):
        got = {
            r.rank: (r.depth, r.disc_seq)
            for r in global_topk_ranked(df, ["depth", "disc_seq"], k, "rank", start=7).collect()
        }
        assert len(got) == min(k, 400)
        for i in range(min(k, 400)):
            assert got[7 + i] == want[i]
    assert global_topk_ranked(df.limit(0), ["depth", "disc_seq"], 5, "rank").count() == 0


def test_global_topk_edges(spark):
    df = _df(spark, n=20, seed=3)
    assert global_topk(df, ["depth", "disc_seq"], 0).count() == 0
    assert global_topk(df, ["depth", "disc_seq"], 10**6).count() == 20
    empty = df.filter(F.lit(False))
    assert global_topk(empty, ["depth", "disc_seq"], 5).count() == 0
    assert with_global_rank(empty, ["depth", "disc_seq"], "rank").count() == 0
