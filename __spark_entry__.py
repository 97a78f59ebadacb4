"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship: a deterministic simweb crawl through the
full engine (politeness, robots, Bloom-free exact seen filter, snapshot
tables) and returns corpus + crawl stats. ``queries()`` / ``oracle_sql()``
expose one DuckDB-checked entry per operator family (SURVEY.md §2.2) plus the
training-data operators (dedup / similarity / text analysis) — implementations
live in paperchase_crawler_spark.plans.driver_queries.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: crawl a deterministic synthetic web end-to-end (8 seeds ×
    2 rounds, budget 60) through the Spark engine, then summarize the fetched
    image+caption corpus per format. Also touches sf0.001 testdata to prove
    the scan path."""
    from paperchase_crawler_spark import simweb
    from paperchase_crawler_spark.plans.crawl import run_crawl

    workdir = tempfile.mkdtemp(prefix="paperchase_entry_")
    runner = run_crawl(
        spark, workdir, simweb.seed_urls(8), rounds=2, round_budget=60
    )
    corpus = runner.corpus_df()
    n_fetched = runner.ordering_df().count()
    n_seen = runner.seen_df().count()
    lineitem_rows = spark.read.parquet(
        "/root/testdata/sf0.001/lineitem.parquet"
    ).count()
    return (
        corpus.groupBy("fmt")
        .agg(
            F.count("*").alias("n_images"),
            F.round(F.avg("w"), 2).alias("avg_w"),
            F.round(F.avg("h"), 2).alias("avg_h"),
            F.sum(F.length("bytes")).alias("total_bytes"),
        )
        .withColumn("n_fetched", F.lit(n_fetched).cast("long"))
        .withColumn("n_seen", F.lit(n_seen).cast("long"))
        .withColumn("sf0001_lineitem_rows", F.lit(lineitem_rows).cast("long"))
        .orderBy("fmt")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from paperchase_crawler_spark.plans.driver_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from paperchase_crawler_spark.plans.driver_queries import ORACLE_SQL

    return dict(ORACLE_SQL)
