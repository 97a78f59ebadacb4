"""Full multi-round crawl as a spark-submit --py-files job (north_rule
deployment shape for the complete loop, not just the single-round bench).

Runs the whole BSP crawl (init from seeds → R rounds → snapshot-committed
tables), optionally kills itself between rounds and resumes from the atomic
checkpoint, and verifies the final crawl ordering + URL-seen set against the
single-threaded oracle in-process. Prints one JSON line.

Usage:
  spark-submit --py-files engine.zip bench/crawl_job.py \
      --workdir /tmp/crawl --seeds 50 --rounds 4 --budget 500 [--resume-after 2]
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--seeds", type=int, default=50)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--budget", type=int, default=500)
    ap.add_argument("--resume-after", type=int, default=0,
                    help="simulate a restart: build a fresh runner from the "
                         "checkpoint after this many rounds")
    ap.add_argument("--with-bytes", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("paperchase-crawl").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from oracle.crawler import crawl as oracle_crawl
    from paperchase_crawler_spark import simweb
    from paperchase_crawler_spark.plans.crawl import CrawlRunner

    seeds = simweb.seed_urls(args.seeds)
    t0 = time.time()
    runner = CrawlRunner(
        spark, args.workdir, round_budget=args.budget, with_bytes=args.with_bytes
    )
    runner.init_from_seeds(seeds)
    done = 0
    if args.resume_after > 0:
        runner.run(min(args.resume_after, args.rounds))
        done = min(args.resume_after, args.rounds)
        runner = CrawlRunner.resume(spark, args.workdir)  # fresh object, disk-only
    runner.run(args.rounds - done)
    wall = time.time() - t0

    oracle = oracle_crawl(seeds, rounds=args.rounds, round_budget=args.budget)
    eng_order = [
        (r["seq"], r["round"], r["canon_url"])
        for r in runner.ordering_df().orderBy("seq").collect()
    ]
    eng_seen = {r["url_hash"] for r in runner.seen_df().collect()}
    print(
        json.dumps(
            {
                "rounds": args.rounds,
                "resumed_after": args.resume_after,
                "n_fetched": runner.next_seq,
                "n_seen": runner.next_disc_seq,
                "n_images": runner._corpus_rows,
                "wall_sec": round(wall, 2),
                "urls_per_sec": round(runner.next_seq / wall, 2),
                "ordering_equals_oracle": eng_order == oracle.ordering,
                "seen_equals_oracle": eng_seen == oracle.seen,
            }
        )
    )


if __name__ == "__main__":
    main()
