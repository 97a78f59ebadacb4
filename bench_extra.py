"""Round-6 optimization harness (guide §1): per-query isolation with the
noop sink, repeated timings, and .explain("formatted") capture.

NOT the driver bench — bench.py is frozen for measurement. This file exists
so OPTIMIZATION_r06.md can cite per-query numbers and plan files measured
under the same session shape as bench.py (same master/conf), without the
crawl/frontier stages mixed in.

Usage:
  python bench_extra.py [--reps 3] [--explain-dir plans/r06 --suffix before]
                        [--only q_dedup_jaccard,q_langid] [--all]
Prints one JSON line: {"queries": {name: [sec, ...]}, ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--only", default=None)
    ap.add_argument("--all", action="store_true", help="all 40 queries, not just headline")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import SparkSession

    import importlib.util as _ilu

    import __spark_entry__ as entrymod

    # bench.py (module) is shadowed by the bench/ package — load it by path
    # to reuse its frozen HEADLINE list
    _spec = _ilu.spec_from_file_location(
        "_bench_py", os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench.py")
    )
    _bench = _ilu.module_from_spec(_spec)
    _spec.loader.exec_module(_bench)
    HEADLINE = _bench.HEADLINE

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("paperchase-bench-extra")
        .config("spark.sql.shuffle.partitions", str(2 * cpus))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "8192")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = list(qs) if args.all else list(HEADLINE)
    if args.only:
        names = [n for n in args.only.split(",") if n]

    # same untimed warmup as bench.py
    spark.sparkContext.setJobDescription("warmup q_brand_part_agg")
    qs["q_brand_part_agg"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    out: dict[str, list[float]] = {}
    for name in names:
        out[name] = []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            t_build = time.time() - t0
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            out[name].append(round(dt, 3))
            if rep == 0:
                out.setdefault("__build_sec", {})  # type: ignore[arg-type]
                out["__build_sec"][name] = round(t_build, 3)  # type: ignore[index]
            if rep == 0 and args.explain_dir:
                os.makedirs(args.explain_dir, exist_ok=True)
                p = os.path.join(args.explain_dir, f"{name}_{args.suffix}.txt")
                with open(p, "w") as f:
                    f.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"
                    ))
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "queries": out}))


if __name__ == "__main__":
    main()
