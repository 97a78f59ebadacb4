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


def _frontier_round(spark) -> dict:
    """One crawl round over a cached 2M-URL / 400k-host Zipf frontier —
    in-session equivalent of bench/round_job.py (which spark-submits the
    same phases for the two-parallelism scaling evidence)."""
    import time as _t

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from paperchase_crawler_spark.functions.hashing import xxh64_u64_vec
    from paperchase_crawler_spark.functions.spark_udfs import (
        IMAGES_SCHEMA,
        OUTLINKS_SCHEMA,
        canonicalize_udf,
        fetch_images_map_in_pandas,
        fetch_outlinks_map_in_pandas,
    )
    from paperchase_crawler_spark.operators.politeness import select_round
    from paperchase_crawler_spark.operators.seen import BloomSeen, filter_new

    rows, hosts, budget = 2_000_000, 400_000, 400_000
    repo = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(repo, "BENCH", "fixtures", f"frontier{rows}h{hosts}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        w = np.arange(1, hosts + 1, dtype=np.float64) ** -1.2
        cdf = np.cumsum(w) / w.sum()

        def _mk(batches):
            for pdf in batches:
                ids = pdf["id"].to_numpy(np.uint64)
                with np.errstate(over="ignore"):
                    hz = xxh64_u64_vec(ids * np.uint64(13))
                z = np.searchsorted(cdf, hz / 2.0**64, side="right")
                yield pd.DataFrame(
                    {
                        "canon_url": [
                            f"https://host{zz}.example/page/{i}"
                            for zz, i in zip(z, ids)
                        ],
                        "host": [f"host{zz}.example" for zz in z],
                        "depth": (ids % np.uint64(6)).astype(np.int32),
                        "disc_seq": ids.astype(np.int64),
                    }
                )

        (
            spark.range(rows)
            .repartition(64)
            .mapInPandas(_mk, "canon_url string, host string, depth int, disc_seq long")
            .withColumn("url_hash", F.xxhash64("canon_url"))
            .withColumn("state", F.lit("queued"))
            .write.mode("overwrite")
            .parquet(path)
        )
    frontier = spark.read.parquet(path)
    hs = spark.range(hosts).select(
        F.concat(F.lit("host"), F.col("id"), F.lit(".example")).alias("host"),
        F.lit(1).alias("crawl_delay_rounds"),
        (2 + F.col("id") % 4).cast("int").alias("tokens_per_round"),
        F.lit(-1000000).alias("last_round"),
    )
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    t0 = _t.time()
    queued = frontier.filter(F.col("state") == "queued").join(
        F.broadcast(hs), on="host", how="inner"
    )
    ranked = (
        select_round(queued, 1, budget, n_salts=16, rank_col="seq")
        .select("canon_url", "url_hash", "host", "depth", "disc_seq", "seq")
        .localCheckpoint()
    )
    n_selected = ranked.count()
    fetched = (
        ranked.repartition(n_parts, F.col("url_hash"))
        .mapInPandas(fetch_outlinks_map_in_pandas(), OUTLINKS_SCHEMA)
        .localCheckpoint()
    )
    t_f0 = _t.time()
    (
        fetched.filter("has_image")
        .select("canon_url", "url_hash")
        .repartition(4 * spark.sparkContext.defaultParallelism, F.col("url_hash"))
        .mapInPandas(fetch_images_map_in_pandas(True), IMAGES_SCHEMA)
        .write.mode("overwrite")
        .format("noop")
        .save()
    )
    t_imgs = _t.time() - t_f0
    n_images = int(
        fetched.agg(F.sum(F.col("has_image").cast("long"))).collect()[0][0]
    )
    raw = fetched.select("seq", F.posexplode("outlinks").alias("pos", "raw_url"))
    cand = raw.withColumn("canon_url", canonicalize_udf("raw_url")).withColumn(
        "url_hash", F.xxhash64("canon_url")
    )
    dedup = (
        cand.groupBy("url_hash")
        .agg(F.min(F.struct("seq", "pos", "canon_url")).alias("s"))
        .select("url_hash", "s.canon_url")
    )
    seen = frontier.select("url_hash")
    bloom = BloomSeen(n_buckets=1024, m_bits=1 << 18, k=7)
    shards = bloom.build(seen).localCheckpoint()
    shards.count()
    n_new = filter_new(dedup, seen, bloom, shards).count()
    t_round = _t.time() - t0
    return {
        "t_round": round(t_round, 3),
        "frontier_rows": rows,
        "n_selected": n_selected,
        "n_images": n_images,
        "n_new": n_new,
        "frontier_urls_per_sec": round((n_selected + n_new) / t_round, 1),
        "images_per_sec": round(n_images / t_imgs, 1),
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
    frontier_stats = _frontier_round(spark)
    timings["frontier_round_2m"] = frontier_stats.pop("t_round")

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
        "cpus": cpus,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
