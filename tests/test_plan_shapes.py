"""Plan-shape regression guard (r2 verdict item 8).

The headline scale operators earned their bucketed/banded equi-join shapes in
rounds 1-2; this test pins them so a future edit cannot silently reintroduce
an all-pairs join or a single-partition funnel. Checks the PHYSICAL plan for:

- no CartesianProduct
- no BroadcastNestedLoopJoin (except q_ann_bruteforce, whose broadcast of the
  tiny query side against the streaming corpus IS the intended zero-shuffle
  design — there the guard is that the corpus side never shuffles)
- no `Exchange SinglePartition` (a global sort/window funnel)
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"

SCALE_QUERIES = [
    "q_dedup_jaccard",
    "q_dedup_minhash_lsh",
    "q_dedup_simhash",
    "q_dedup_image_phash",
    "q_dedup_embedding",
    "q_ann_lsh",
    "q_ann_ivf",
    "q_politeness_selection",
    "q_global_topk_lineitems",
]


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def queries():
    import __spark_entry__ as e

    return e.queries()


@pytest.mark.parametrize("name", SCALE_QUERIES)
def test_no_allpairs_or_single_partition(spark, queries, name):
    plan = _plan(queries[name](spark, SF))
    assert "CartesianProduct" not in plan, f"{name} regressed to a cartesian"
    assert "BroadcastNestedLoopJoin" not in plan, f"{name} regressed to BNLJ"
    assert "Exchange SinglePartition" not in plan, (
        f"{name} funnels through one partition"
    )


# first-match exactly-once emission (r4 for the Hamming kernel, r5 for the
# minhash + embedding paths): candidate pairs are unique BY CONSTRUCTION, so
# the final plan must carry NO aggregate at all — the old trailing
# .distinct() was a full shuffle+agg of the pair set. (The signature/code
# computations upstream sit behind a checkpoint cut, so any aggregate in the
# executed plan is the distinct creeping back.)
FIRST_MATCH_QUERIES = [
    "q_dedup_minhash_lsh",
    "q_dedup_simhash",
    "q_dedup_image_phash",
    "q_dedup_embedding",
]


@pytest.mark.parametrize("name", FIRST_MATCH_QUERIES)
def test_first_match_emission_has_no_pair_aggregate(spark, queries, name):
    plan = _plan(queries[name](spark, SF))
    assert "Aggregate" not in plan, (
        f"{name} re-grew a pair-set distinct (or another aggregate) — "
        "first-match emission should make candidates unique by construction"
    )


def test_jaccard_cap_stage_is_partial_agg_not_window(spark, queries):
    """The shingle freq-cap must be a groupBy (map-side partial aggregation)
    + broadcast ANTI-join of the over-cap shingles — the r4
    Window.partitionBy('shingle') form put ALL f rows of a hot shingle in
    one task, making the cap stage itself the web-scale straggler the cap
    exists to prevent. The cap sits behind a checkpoint cut in the full
    query, so its plan is asserted on the stage directly; the full query
    plan is asserted Window-free."""
    from paperchase_crawler_spark.operators import dedup as D

    plan = _plan(queries["q_dedup_jaccard"](spark, SF))
    assert "Window" not in plan, "jaccard cap regressed to a window"
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sh = D.shingle_table(docs, "text", "doc_id", 3)
    cap_plan = _plan(D.capped_shingles(sh, 64))
    assert "Window" not in cap_plan
    assert "LeftAnti" in cap_plan and "BroadcastExchange" in cap_plan, (
        "over-cap shingles should be removed by a broadcast anti-join"
    )
    # the freq count must partial-aggregate (map-side combine), the property
    # the window form lacked
    assert "partial_count" in cap_plan or "partial count" in cap_plan.lower()


def test_ann_bruteforce_is_broadcast_map_side(spark, queries):
    """Brute-force ANN: the DESIGNED plan broadcasts the small query side and
    streams the corpus map-side — a BNLJ is expected, but the corpus side
    must not shuffle and nothing may collapse to one partition."""
    plan = _plan(queries["q_ann_bruteforce"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "Exchange SinglePartition" not in plan
    assert "BroadcastExchange" in plan  # the query side is broadcast


def test_frontier_select_has_no_shuffle(spark, tmp_path):
    """The bucket-scan half of SELECT: one Arrow task per bucket, the only
    Exchange is the tiny NB-row manifest repartition."""
    from pyspark.sql import functions as F

    from paperchase_crawler_spark.operators.frontier_select import (
        compute_frontier_zones,
        frontier_bucket_col,
        merged_frontier,
        select_candidates,
    )
    from paperchase_crawler_spark.schemas import FRONTIER
    from paperchase_crawler_spark.sources.icetable import IceTable

    rows = [
        (f"https://h{i % 3}.example/p/{i}", i, f"h{i % 3}.example", 0, i,
         0.0, "queued", 0, None)
        for i in range(30)
    ]
    tbl = IceTable(str(tmp_path / "f"))
    df = (
        spark.createDataFrame(rows, FRONTIER)
        .withColumn("__rev", F.lit(0).cast("int"))
        .withColumn("__fb", frontier_bucket_col(4, 1))
        .repartition(4, F.col("__fb"))
    )
    tbl.overwrite_bucketed(
        df, n_buckets=4,
        zone_fn=lambda files: compute_frontier_zones(spark, files),
    )
    for build in (
        lambda: select_candidates(spark, tbl, max_tokens=4),
        lambda: merged_frontier(spark, tbl),
    ):
        plan = _plan(build())
        assert plan.count("Exchange") <= 1
        assert "CartesianProduct" not in plan
