"""Pin the Python/numpy XXH64 twins bit-equal to Spark's F.xxhash64."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from paperchase_crawler_spark.functions.hashing import (
    h64,
    xxh64_long,
    xxh64_str,
    xxh64_u64_vec,
)

STRS = ["", "a", "ab", "abc", "abcd", "https://host0.example/page/0",
        "üñïçødé ☃", "x" * 31, "y" * 32, "z" * 100, "\x00\x01"]
LONGS = [0, 1, -1, 42, 2**63 - 1, -(2**63), 123456789, -987654321]


def test_spark_string_pin(spark):
    df = spark.createDataFrame([(s,) for s in STRS], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for s in STRS:
        assert got[s] == xxh64_str(s)


def test_spark_long_pin(spark):
    df = spark.createDataFrame([(x,) for x in LONGS], "x long")
    got = {r["x"]: r["h"] for r in df.select("x", F.xxhash64("x").alias("h")).collect()}
    for x in LONGS:
        assert got[x] == xxh64_long(x)


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=1, max_size=200))
@settings(max_examples=50, deadline=None)
def test_vectorized_matches_scalar(xs):
    arr = np.array(xs, dtype=np.uint64)
    vec = xxh64_u64_vec(arr)
    for x, v in zip(xs, vec):
        assert int(v) == h64(x)
