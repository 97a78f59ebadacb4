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
