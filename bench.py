"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS] plus a 3-round engine crawl.

Prints exactly ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "crawl": {...}}

Query timings force full materialization through the noop sink (count()
alone would let Catalyst prune work). The crawl reports frontier throughput
(URLs selected+committed per wall-second) and fetched images/sec — the
BASELINE.json metric; the two-parallelism scaling evidence lives in
scripts/bench_scaling.py → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

HEADLINE = [
    "q01_pricing_summary",
    "q05_region_revenue",
    "q_top_orders_per_customer",
    "q_global_topk_lineitems",
    "q_politeness_selection",
    "q_events_hourly",
    "q_sessionize",
    "q_dedup_jaccard",
    "q_dedup_minhash_lsh",
    "q_dedup_simhash",
    "q_dedup_image_phash",
    "q_ann_bruteforce",
    "q_ann_lsh",
    "q_text_quality",
    "q_langid",
    "q_fingerprint",
]


def _frontier_round(spark, budget: int, warmup: bool = True) -> dict:
    """One crawl round over a cached 2M-URL / 400k-host Zipf bucketed
    merge-on-read frontier — shares bench/round_job.run_round_bench with the
    multi-parallelism scaling evidence (scripts/bench_scaling.py).

    Run twice: budget 400k (> eligible supply ≈ 178k — every queued row
    matters, so SELECT must scan all queued-bearing buckets) and budget 25k
    (budget ≪ supply, the 10^10 design-point regime: a round wants a sliver
    of the frontier — the zone-map pruned SELECT reads only the depth range
    that can win and still matches the exact cut; t_select is the number to
    watch)."""
    from bench.round_job import run_round_bench
    from scripts.bench_scaling import fixture_path, gen_frontier

    rows, hosts, nb, salts = 2_000_000, 400_000, 64, 2
    repo = os.path.dirname(os.path.abspath(__file__))
    path = fixture_path(os.path.join(repo, "BENCH", "fixtures"), rows, hosts, nb, salts)
    gen_frontier(path, rows, hosts, nb, salts, spark=spark)
    stats = run_round_bench(
        spark, path, budget, hosts, frontier_salts=salts, warmup=warmup
    )
    return {
        "t_round": stats["t_round"],
        "t_select": stats["t_select"],
        "frontier_rows": stats["n_frontier"],
        "n_selected": stats["n_selected"],
        "n_images": stats["n_images"],
        "n_new": stats["n_new"],
        "frontier_urls_per_sec": stats["urls_per_sec"],
        "images_per_sec": stats["images_per_sec"],
        "select_pruning": stats["select_pruning"],
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("paperchase-bench")
        .config("spark.sql.shuffle.partitions", str(2 * cpus))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    timings: dict[str, float] = {}
    t_all = time.time()
    # untimed warmup: first-query cost is JVM codegen/session spin-up, not
    # plan cost (round-1 analysis: q01 measured 6s warm-up vs ~2s warm).
    # Warm with a NON-headline query so no measured query gets a same-plan
    # codegen-cache advantage over the others (r2 advice).
    qs["q_brand_part_agg"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    for name in HEADLINE:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    # flagship crawl: 200 seeds x 3 rounds, real image bytes
    from paperchase_crawler_spark import simweb
    from paperchase_crawler_spark.plans.crawl import run_crawl

    t0 = time.time()
    workdir = tempfile.mkdtemp(prefix="paperchase_bench_")
    runner = run_crawl(
        spark, workdir, simweb.seed_urls(200), rounds=3, round_budget=5000
    )
    crawl_sec = time.time() - t0
    n_urls = runner.next_seq
    n_seen = runner.next_disc_seq
    n_images = runner._corpus_rows
    timings["crawl_3rounds"] = round(crawl_sec, 3)

    # frontier-scale single round (the BASELINE.md headline number): one full
    # select→fetch→expand→seen round over a 2M-URL Zipf frontier, generated
    # once and cached under BENCH/fixtures
    frontier_stats = _frontier_round(spark, budget=400_000)
    timings["frontier_round_2m"] = frontier_stats.pop("t_round")
    # pruned-SELECT variant: budget ≪ supply, so the zone-map planner reads
    # only the winning depth range (t_select is the win; its own row)
    pruned_stats = _frontier_round(spark, budget=25_000, warmup=False)
    timings["frontier_round_2m_pruned_select"] = pruned_stats.pop("t_select")
    pruned_stats.pop("t_round")

    total = time.time() - t_all
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    out = {
        "metric": "headline_queries_plus_crawl",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "crawl": {
            "urls_fetched": n_urls,
            "urls_discovered": n_seen,
            "images_fetched": n_images,
            "urls_per_sec": round(n_urls / crawl_sec, 2),
            "images_per_sec": round(n_images / crawl_sec, 2),
        },
        "frontier_round": frontier_stats,
        "frontier_round_pruned": pruned_stats,
        "cpus": cpus,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
