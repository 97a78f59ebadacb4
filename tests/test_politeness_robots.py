"""R5 salted politeness selection + R6 robots gate: Spark ops vs plain Python."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from oracle.crawler import robots_blocked
from paperchase_crawler_spark.operators.politeness import per_host_topk_salted, select_round
from paperchase_crawler_spark.operators.robots import blocked_expr


def _frontier(spark, n=400, hosts=7, seed=5):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        z = rng.choice([0] * 6 + list(range(1, hosts)))  # skew toward host0
        rows.append(
            (
                f"https://host{z}.example/page/{i}",
                f"host{z}.example",
                rng.randrange(3),
                i,
                1 + z % 3,
                2 + z % 4,
                -(10**6) if z % 2 == 0 else 1,
            )
        )
    return spark.createDataFrame(
        rows,
        "canon_url string, host string, depth int, disc_seq long, "
        "crawl_delay_rounds int, tokens_per_round int, last_round int",
    ).repartition(6)


def _py_select(rows, round_no, budget):
    by_host = {}
    for r in rows:
        if round_no - r["last_round"] < r["crawl_delay_rounds"]:
            continue
        by_host.setdefault(r["host"], []).append(r)
    cands = []
    for host, entries in by_host.items():
        entries.sort(key=lambda e: (e["depth"], e["disc_seq"]))
        cands.extend(entries[: entries[0]["tokens_per_round"]])
    cands.sort(key=lambda e: (e["depth"], e["disc_seq"]))
    return [(c["depth"], c["disc_seq"]) for c in cands[:budget]]


def test_per_host_topk_salted_exact(spark):
    df = _frontier(spark)
    got = per_host_topk_salted(df, n_salts=4).collect()
    by_host = {}
    for r in df.collect():
        by_host.setdefault(r["host"], []).append(r)
    want = set()
    for host, entries in by_host.items():
        entries.sort(key=lambda e: (e["depth"], e["disc_seq"]))
        want |= {(host, e["disc_seq"]) for e in entries[: entries[0]["tokens_per_round"]]}
    assert {(r["host"], r["disc_seq"]) for r in got} == want


def test_select_round_matches_python(spark):
    df = _frontier(spark)
    rows = [r.asDict() for r in df.collect()]
    for budget in (5, 12, 1000):
        got = sorted(
            (r["depth"], r["disc_seq"])
            for r in select_round(df, 2, budget, n_salts=4).collect()
        )
        assert got == sorted(_py_select(rows, 2, budget))


def test_robots_blocked_expr_matches_oracle(spark):
    rules = [
        [],
        [{"allow": False, "prefix": "/page/9"}],
        [{"allow": False, "prefix": "/p"}, {"allow": True, "prefix": "/page"}],
        [{"allow": True, "prefix": "/"}, {"allow": False, "prefix": "/secret"}],
    ]
    paths = ["/", "/page/9", "/page/91", "/page/8", "/p", "/secret/x", "/page"]
    rows = [(p, [(r["allow"], r["prefix"]) for r in rs]) for rs in rules for p in paths]
    df = spark.createDataFrame(
        rows, "path string, robots_rules array<struct<allow:boolean,prefix:string>>"
    )
    got = df.withColumn("blocked", blocked_expr("path", "robots_rules")).collect()
    for row in got:
        rules_dicts = [{"allow": r["allow"], "prefix": r["prefix"]} for r in row["robots_rules"]]
        assert row["blocked"] == robots_blocked(row["path"], rules_dicts), row
