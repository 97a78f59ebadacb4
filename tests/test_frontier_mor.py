"""Bucketed merge-on-read frontier: delta semantics, compaction, salts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oracle.crawler import crawl as oracle_crawl
from paperchase_crawler_spark import simweb
from paperchase_crawler_spark.operators.frontier_select import (
    frontier_bucket_col,
    merged_frontier,
    select_candidates,
)
from paperchase_crawler_spark.plans.crawl import CrawlRunner, run_crawl
from paperchase_crawler_spark.schemas import FRONTIER
from paperchase_crawler_spark.sources.icetable import IceTable

SEEDS = simweb.seed_urls(8)


def _frontier_rows(spark, rows):
    return spark.createDataFrame(rows, FRONTIER)


def _row(url, state="queued", depth=0, seq=0, rd=0, done=None):
    host = url.split("/")[2]
    return (url, hash(url) % (1 << 40), host, depth, seq, -float(depth), state, rd, done)


@pytest.fixture
def tbl(tmp_path):
    return IceTable(str(tmp_path / "f"))


def _write(tbl, df, nb, rev):
    staged = (
        df.withColumn("__rev", F.lit(rev).cast("int"))
        .withColumn("__fb", frontier_bucket_col(nb, 1))
        .repartition(nb, F.col("__fb"))
    )
    if tbl.current_snapshot_id() is None:
        tbl.overwrite_bucketed(staged, n_buckets=nb)
    else:
        tbl.append_bucketed_delta(staged)


def test_delta_overrides_base(spark, tbl):
    base = [_row(f"https://h{i % 3}.example/p/{i}", seq=i) for i in range(20)]
    _write(tbl, _frontier_rows(spark, base), nb=4, rev=0)
    # flip 5 rows to fetched via a delta
    upd = [
        _row(f"https://h{i % 3}.example/p/{i}", state="fetched", seq=i, done=1)
        for i in range(5)
    ]
    _write(tbl, _frontier_rows(spark, upd), nb=4, rev=1)
    merged = merged_frontier(spark, tbl)
    assert merged.count() == 20
    assert merged.filter(F.col("state") == "fetched").count() == 5
    # and the no-shuffle candidate path sees only the still-queued rows
    cand = select_candidates(spark, tbl, max_tokens=100)
    got = {r["disc_seq"] for r in cand.collect()}
    assert got == set(range(5, 20))


def test_candidates_rank_is_true_host_rank(spark, tbl):
    rows = [_row(f"https://h0.example/p/{i}", depth=i % 2, seq=i) for i in range(10)]
    _write(tbl, _frontier_rows(spark, rows), nb=4, rev=0)
    cand = select_candidates(spark, tbl, max_tokens=3).collect()
    assert len(cand) == 3  # one host → top-3 overall
    by_rank = sorted((r["__host_rank"], r["depth"], r["disc_seq"]) for r in cand)
    want = sorted((r[3], r[4]) for r in rows)[:3]  # (depth, seq) R3 order
    assert [(d, s) for _, d, s in by_rank] == want


def test_crawl_equivalence_with_salts_and_eager_compaction(spark, tmp_path):
    """salts>1 (giant-host defense → exact window cut) and compaction every
    round (delta_frac=0) must not change any artifact."""
    oracle = oracle_crawl(SEEDS, rounds=3, round_budget=120)
    runner = run_crawl(
        spark, str(tmp_path / "s"), SEEDS, 3, 120,
        with_bytes=False, frontier_buckets=4, frontier_salts=2,
        compact_delta_frac=0.0,
    )
    eng = [
        (r["seq"], r["round"], r["canon_url"])
        for r in runner.ordering_df().orderBy("seq").collect()
    ]
    assert eng == oracle.ordering
    assert {r["url_hash"] for r in runner.seen_df().collect()} == oracle.seen
    # eager compaction → frontier has no deltas at rest
    assert runner.frontier.delta_fraction() == 0.0


def test_compaction_is_shuffle_free_and_exact(spark, tbl):
    """compacted_frontier: per-bucket merge plan has no Exchange (rows never
    change bucket) and equals the shuffled groupBy/max_by reference. The
    public merged_frontier view (bucket-local since r3) must match both and
    itself stay Exchange-free."""
    from paperchase_crawler_spark.operators.frontier_select import (
        compacted_frontier,
        merged_frontier_reference,
    )

    base = [_row(f"https://h{i % 5}.example/p/{i}", seq=i) for i in range(30)]
    _write(tbl, _frontier_rows(spark, base), nb=4, rev=0)
    upd = [
        _row(f"https://h{i % 5}.example/p/{i}", state="fetched", seq=i, done=1)
        for i in range(7)
    ]
    _write(tbl, _frontier_rows(spark, upd), nb=4, rev=1)
    compacted = compacted_frontier(spark, tbl, next_rev=2)
    plan = compacted._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1  # only the tiny manifest repartition
    cols = [f.name for f in FRONTIER.fields]
    got = sorted(tuple(r) for r in compacted.select(*cols).collect())
    want = sorted(
        tuple(r)
        for r in merged_frontier_reference(spark, tbl).select(*cols).collect()
    )
    assert got == want
    assert {r[6] for r in got} == {"queued", "fetched"}
    pub = merged_frontier(spark, tbl)
    pub_plan = pub._jdf.queryExecution().executedPlan().toString()
    assert pub_plan.count("Exchange") <= 1  # no caller can trip a full shuffle
    assert sorted(tuple(r) for r in pub.select(*cols).collect()) == want


def test_maintenance_keeps_resume_working(spark, tmp_path):
    """expire_snapshots between rounds must not break crash-resume or change
    any artifact (the checkpointed current snapshots are always retained)."""
    oracle = oracle_crawl(SEEDS, rounds=3, round_budget=120)
    wd = str(tmp_path / "m")
    runner = CrawlRunner(spark, wd, round_budget=120, with_bytes=False)
    runner.init_from_seeds(SEEDS)
    runner.run(2)
    removed = runner.maintain(keep_last=1)
    assert sum(removed.values()) > 0
    resumed = CrawlRunner.resume(spark, wd)
    resumed.run(1)
    eng = [
        (r["seq"], r["round"], r["canon_url"])
        for r in resumed.ordering_df().orderBy("seq").collect()
    ]
    assert eng == oracle.ordering
    assert {r["url_hash"] for r in resumed.seen_df().collect()} == oracle.seen


def test_frontier_delta_commit_is_o_changed(spark, tmp_path):
    """A round's frontier commit writes o(frontier) bytes (the delta), and
    the snapshot metadata proves it: delta rows ≪ base rows."""
    runner = CrawlRunner(
        spark, str(tmp_path / "d"), round_budget=10, with_bytes=False,
        frontier_buckets=4,
    )
    runner.init_from_seeds(simweb.seed_urls(400))
    base_bytes = runner.frontier.last_commit_bytes
    runner.run(1)
    snap = runner.frontier.snapshot()
    assert snap["op"] == "append"  # delta, not a rewrite
    frac = runner.frontier.delta_fraction()
    assert 0 < frac <= runner.compact_delta_frac
    assert runner.frontier.last_commit_bytes < base_bytes * 25  # sanity: bounded
