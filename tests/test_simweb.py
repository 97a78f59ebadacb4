"""simweb fixture: scalar (oracle) path == vectorized (engine) path; skew."""

from __future__ import annotations

import numpy as np

from paperchase_crawler_spark import simweb
from paperchase_crawler_spark.functions.hashing import xxh64_str
from paperchase_crawler_spark.functions.urlnorm import canon_url, host_of


def _hashes(n=80):
    return np.array(
        [xxh64_str(canon_url(u)) for u in simweb.seed_urls(n)], dtype=np.int64
    )


def test_outlinks_scalar_equals_vectorized():
    hs = _hashes()
    vec = simweb.outlinks_batch(hs)
    for i, h in enumerate(hs):
        assert vec[i] == simweb.outlinks_for(int(h))


def test_images_scalar_equals_vectorized():
    hs = _hashes(40)
    ib = simweb.images_batch(hs)
    for i, h in enumerate(hs):
        im = simweb.image_for(int(h))
        if im is None:
            assert not ib["has_image"][i]
        else:
            assert ib["has_image"][i]
            assert (ib["w"][i], ib["h"][i], ib["fmt"][i]) == (im["w"], im["h"], im["fmt"])
            assert ib["bytes"][i] == im["bytes"]
            assert ib["caption"][i] == im["caption"]
            assert int(ib["phash"][i]) == im["phash"]


def test_zipf_hot_host_skew():
    hs = _hashes(200)
    links = [l for ls in simweb.outlinks_batch(hs) for l in ls]
    hosts = [host_of(canon_url(l)) for l in links]
    frac0 = hosts.count("host0.example") / len(hosts)
    assert 0.12 <= frac0 <= 0.30  # FIXTURES.md: host0 ~ 20% of links


def test_politeness_and_robots_shape():
    rows = simweb.host_state_rows()
    assert len(rows) == simweb.HOSTS
    for z in (0, 1, 5, 999):
        r = rows[z]
        assert r["crawl_delay_rounds"] == 1 + z % 3
        assert r["tokens_per_round"] == 2 + z % 4
        assert (len(r["robots_rules"]) > 0) == (z % 5 == 0)


def test_image_fetch_arrow_equals_pandas(spark):
    """fetch_images_map_in_arrow (production hot path) emits exactly the rows
    fetch_images_map_in_pandas does — byte-for-byte."""
    from pyspark.sql import functions as F

    from paperchase_crawler_spark.functions.spark_udfs import (
        IMAGES_SCHEMA,
        fetch_images_map_in_arrow,
        fetch_images_map_in_pandas,
    )

    rows = spark.range(600).select(
        F.concat(F.lit("https://h.example/p/"), F.col("id")).alias("canon_url"),
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"),
    ).repartition(3)
    via_pandas = rows.mapInPandas(fetch_images_map_in_pandas(True), IMAGES_SCHEMA)
    via_arrow = rows.mapInArrow(fetch_images_map_in_arrow(True), IMAGES_SCHEMA)

    def key(df):
        return sorted(
            (r["image_id"],
             bytes(r["bytes"]) if r["bytes"] is not None else None,
             r["w"], r["h"], r["fmt"], r["caption"], r["phash"])
            for r in df.collect()
        )

    assert key(via_arrow) == key(via_pandas)
