"""Driver-contract smoke inside pytest: a fast subset of queries() checked
against oracle_sql() through DuckDB at sf0.001 (the full set runs via
scripts/check_contract.py at sf0.01)."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

FAST_SUBSET = [
    "q01_pricing_summary",
    "q_top_orders_per_customer",
    "q_rollup_lineitem",
    "q_sessionize",
    "q_events_json",
    "q_url_canonicalize",
    "q_dedup_exact",
    "q_dedup_minhash_lsh",
    "q_ann_bruteforce",
    "q_text_quality",
    "q_langid",
    "q_fingerprint",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def _canon(df):
    cols = sorted(df.columns)
    rows = []
    for row in df[cols].itertuples(index=False):
        rows.append(
            tuple(
                round(v, 6) if isinstance(v, float) and not math.isnan(v) else v
                for v in row
            )
        )
    return cols, sorted(rows, key=repr)


@pytest.mark.parametrize("name", FAST_SUBSET)
def test_query_matches_oracle(spark, duck, name):
    sp = entrymod.queries()[name](spark, SF).toPandas()
    dk = duck.execute(entrymod.oracle_sql()[name]).df()
    sc, sr = _canon(sp)
    dc, dr = _canon(dk)
    assert sc == dc
    assert len(sr) == len(dr)
    assert sr == dr


def test_registry_consistency():
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 25
