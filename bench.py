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
    "q_ann_bruteforce",
    "q_ann_lsh",
    "q_text_quality",
    "q_langid",
    "q_fingerprint",
]


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
        "cpus": cpus,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
