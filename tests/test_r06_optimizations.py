"""Round-6 optimization parity pins: every rewrite that changed an
operator's internals must produce BIT-IDENTICAL results to the r5 form it
replaced (the optimization round's contract: faster, never different).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from paperchase_crawler_spark.functions import text as T
from paperchase_crawler_spark.functions.text import md5_int60
from paperchase_crawler_spark.operators import dedup as D

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _simhash64_r5(df, text_col, id_col, bits=D.SIMHASH_BITS):
    """The r5 per-bit SUM(CASE) reference implementation, kept verbatim as
    the parity oracle for the packed-vote rewrite."""
    w = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("word"),
    ).withColumn("wh", md5_int60(F.col("word")))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("wh"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(bits)
    ]
    agg = w.groupBy("doc_id").agg(*votes)
    sim = F.lit(0).cast("long")
    for j in range(bits):
        sim = sim + F.when(F.col(f"v{j}") > 0, F.lit(1 << j).cast("long")).otherwise(0)
    return agg.select("doc_id", sim.alias("simhash"))


def test_simhash_packed_votes_match_per_bit_reference(spark):
    docs = _docs(spark)
    got = {r.doc_id: r.simhash for r in D.simhash64(docs, "text", "doc_id").collect()}
    want = {
        r.doc_id: r.simhash for r in _simhash64_r5(docs, "text", "doc_id").collect()
    }
    assert got == want and len(got) > 0


def test_simhash_packed_votes_edge_docs(spark):
    # single word, repeated word (distinct → one vote), exact tie on a bit
    # (2 words: count==1, 2*1 > 2 false → bit 0 like the ±1 sum's v=0)
    rows = [(1, "alpha"), (2, "alpha alpha alpha"), (3, "alpha beta"), (4, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.simhash for r in D.simhash64(df, "text", "doc_id").collect()}
    want = {r.doc_id: r.simhash for r in _simhash64_r5(df, "text", "doc_id").collect()}
    assert got == want
    assert got[1] == got[2]  # distinct words → same single-word vote


def test_simhash_packed_lane_overflow_raises(spark):
    import pytest

    # 2^lane distinct words would overflow a 2-bit lane: force tiny lanes by
    # calling with bits=6 (lane=2, capacity 4) on a 5-distinct-word doc
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    with pytest.raises(Exception) as ei:
        D.simhash64(df, "text", "doc_id", bits=6).collect()
    assert "lane overflow" in str(ei.value)


def test_langid_staged_matches_column_form(spark):
    from paperchase_crawler_spark.plans.driver_queries import q_langid

    got = sorted(
        (r.lang, r.predicted, r.n) for r in q_langid(spark, SF).collect()
    )
    d = _docs(spark)
    want = sorted(
        (r.lang, r.predicted, r.n)
        for r in d.select("lang", T.langid(F.col("text")).alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert got == want and len(got) > 0


def test_fingerprint_nondistinct_matches_distinct(spark):
    d = _docs(spark)
    a = d.select(
        "doc_id",
        F.array_min(
            F.transform(T.word_kgrams(F.col("text"), 4, distinct=True), md5_int60)
        ).alias("fp"),
    )
    b = d.select("doc_id", T.fingerprint(F.col("text"), 4).alias("fp"))
    ga = {r.doc_id: r.fp for r in a.collect()}
    gb = {r.doc_id: r.fp for r in b.collect()}
    assert ga == gb and len(ga) > 0


def test_global_topk_small_k_is_take_ordered(spark):
    """Small k must plan as TakeOrderedAndProject (bounded per-partition
    heaps, no range exchange, no sampling/count jobs); large k keeps the
    range-partitioned exact cut."""
    from paperchase_crawler_spark.operators.ordering import (
        TAKE_ORDERED_MAX_K,
        global_topk,
    )

    df = spark.range(10_000).select(
        (F.col("id") % 13).alias("depth"), F.col("id").alias("disc_seq")
    )
    plan = global_topk(df, ["depth", "disc_seq"], 100)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan.lower()
    big = global_topk(df, ["depth", "disc_seq"], TAKE_ORDERED_MAX_K + 1)
    plan_big = big._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" not in plan_big


def test_minhash_numeric_band_keys_match_string_form(spark):
    """The (band, bk0..bk{r-1}) long-tuple join key must produce the exact
    pair set of the r5 concat_ws string-bucket form (equality of the long
    tuple ⟺ equality of the joined string — md5_int60 renders commaless)."""
    docs = _docs(spark)
    got = sorted(
        (r.doc_a, r.doc_b)
        for r in D.minhash_lsh_pairs(docs, "text", "doc_id", k=3, n_hashes=8, bands=4).collect()
    )
    # reference: brute-force recompute of band collisions in python
    sig = D.minhash_signatures(docs, "text", "doc_id", k=3, n_hashes=8).collect()
    sigs = {r.doc_id: [r[f"h{i}"] for i in range(8)] for r in sig}
    want = set()
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            for band in range(4):
                if (
                    sigs[a][2 * band] == sigs[b][2 * band]
                    and sigs[a][2 * band + 1] == sigs[b][2 * band + 1]
                ):
                    want.add((a, b))
                    break
    assert got == sorted(want) and len(got) > 0


def test_with_global_rank_max_rows_hint_matches_range_path(spark):
    """The max_rows upper-bound hint must yield exactly the range path's
    ranks (positional id over the single TakeOrdered partition), for bounds
    equal to, above, and far above the true row count — and fall back to
    the range path past TAKE_ORDERED_MAX_K."""
    import random

    from paperchase_crawler_spark.operators.ordering import (
        TAKE_ORDERED_MAX_K,
        with_global_rank,
    )

    rng = random.Random(9)
    rows = [(rng.randrange(7), i) for i in range(400)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "depth int, disc_seq long").repartition(5)
    want = {
        r.disc_seq: r.rank
        for r in with_global_rank(df, ["depth", "disc_seq"], "rank", start=3).collect()
    }
    for bound in (400, 401, 5000, TAKE_ORDERED_MAX_K, TAKE_ORDERED_MAX_K + 1):
        out, total = with_global_rank(
            df, ["depth", "disc_seq"], "rank", start=3, with_total=True,
            max_rows=bound,
        )
        got = {r.disc_seq: r.rank for r in out.collect()}
        assert got == want and total == 400, bound
    out0 = with_global_rank(
        df.limit(0), ["depth", "disc_seq"], "rank", max_rows=0
    )
    assert out0.count() == 0


def test_ivf_hot_cell_guard_is_result_identical(spark):
    """The salted cell-skew guard must produce exactly the unguarded rows
    (every ordered pair meets at one salt) — same contract as the LSH
    hot-bucket guard."""
    from paperchase_crawler_spark.operators import similarity as S

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("cell_idx"), "embedding"
    )
    plain = sorted(map(tuple, S.ivf_topk(e, cents, k=3, nprobe=2).collect()))
    guarded = sorted(
        map(
            tuple,
            S.ivf_topk(e, cents, k=3, nprobe=2, hot_cell_cap=5, n_salts=3).collect(),
        )
    )
    assert plain == guarded and len(plain) > 0


def test_word_kgrams_unrolled_matches_slice_form(spark):
    """k<=8 builds grams via unrolled element_at concat — must equal the
    slice+concat_ws form exactly (incl. short docs and empty strings)."""
    rows = [
        (1, "a b c d e f g h i j"),
        (2, "one two three"),
        (3, "solo"),
        (4, ""),
        (5, "x " * 12 + "y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    def slice_gram_fn(k):
        # factory, not default-arg lambda (pyspark reads lambda arity)
        return lambda i: F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), i, k))

    for k in (2, 3, 4, 9):
        ref = F.when(
            F.size(F.split(F.col("text"), " ")) >= k,
            F.transform(
                F.sequence(F.lit(1), F.size(F.split(F.col("text"), " ")) - (k - 1)),
                slice_gram_fn(k),
            ),
        ).otherwise(F.expr("array()").cast("array<string>"))
        got = {r.doc_id: r.g for r in df.select("doc_id", T.word_kgrams(F.col("text"), k, distinct=False).alias("g")).collect()}
        want = {r.doc_id: r.g for r in df.select("doc_id", ref.alias("g")).collect()}
        assert got == want, k


def test_materialize_mode_context_restores_and_unpersists(spark, tmp_path):
    """The context manager must restore the previous mode and free every
    disk-mode persist it created, success or error (ADVICE r5 leak)."""
    import pytest

    assert D._MATERIALIZE_MODE == "local"
    df = spark.createDataFrame([(i,) for i in range(10)], "x long")
    # a session-level reliable checkpoint dir (set by earlier tests) makes
    # disk mode take the df.checkpoint branch — the persist-leak guard only
    # has something to clean on the persist(DISK_ONLY) fallback
    persist_path = spark.sparkContext.getCheckpointDir() is None
    with D.materialize_mode("disk"):
        assert D._MATERIALIZE_MODE == "disk"
        m = D._materialize(df)
        if persist_path:
            assert m.storageLevel.useDisk and len(D._PERSISTED) == 1
        assert m._pc_rows == 10
    assert D._MATERIALIZE_MODE == "local" and len(D._PERSISTED) == 0
    if persist_path:
        assert m.storageLevel.useDisk is False  # unpersisted on exit
    with pytest.raises(RuntimeError):
        with D.materialize_mode("disk"):
            D._materialize(df)
            raise RuntimeError("boom")
    assert D._MATERIALIZE_MODE == "local" and len(D._PERSISTED) == 0


def test_auto_n_blocks_warns_past_banding_horizon():
    """Past the widest affordable layout the projected rows-per-key exceeds
    the load target — must warn loudly instead of degrading silently (r5
    verdict What's-missing #1)."""
    import warnings

    import pytest

    with pytest.warns(RuntimeWarning, match="widest affordable banding"):
        nb = D.auto_n_blocks(10**10, 64, 6)
    assert nb == 9  # still returns the widest layout
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert D.auto_n_blocks(400_000, 64, 6) == 7  # in-horizon: no warning


def test_capped_shingles_broadcast_guard(spark):
    """The over-cap anti-join must drop the broadcast hint when the possible
    over-cap list is no longer tiny (ADVICE r5: unconditional broadcast was
    unbounded in corpus size). Both forms produce identical rows."""
    docs = _docs(spark)
    sh = D.shingle_table(docs, "text", "doc_id", 3)
    plan_b = D.capped_shingles(sh, 64, broadcast=True)._jdf.queryExecution().executedPlan().toString()
    plan_s = D.capped_shingles(sh, 64, broadcast=False)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan_b
    assert "LeftAnti" in plan_s
    a = sorted((r.doc_id, r.shingle) for r in D.capped_shingles(sh, 8, True).collect())
    b = sorted((r.doc_id, r.shingle) for r in D.capped_shingles(sh, 8, False).collect())
    assert a == b and len(a) > 0


def test_fetch_outlinks_arrow_matches_pandas(spark):
    """The Arrow-native pass-1 fetch (no Python string objects) must emit
    byte-identical rows to the pandas form it replaced in the crawl loop."""
    from pyspark.sql import functions as F

    from paperchase_crawler_spark.functions.spark_udfs import (
        OUTLINKS_SCHEMA,
        fetch_outlinks_map_in_arrow,
        fetch_outlinks_map_in_pandas,
    )

    df = spark.range(500).select(
        F.concat(F.lit("https://host"), (F.col("id") % 37).cast("string"),
                 F.lit(".example/page/"), F.col("id").cast("string")).alias("canon_url"),
        F.xxhash64(F.concat(F.lit("u"), F.col("id").cast("string"))).alias("url_hash"),
        F.concat(F.lit("host"), (F.col("id") % 37).cast("string"), F.lit(".example")).alias("host"),
        (F.col("id") % 5).cast("int").alias("depth"),
        F.col("id").alias("disc_seq"),
        F.lit(0).cast("int").alias("round_disc"),
        F.col("id").alias("seq"),
    ).repartition(3)

    def rows(out_df):
        return sorted(
            (r.canon_url, r.url_hash, r.host, r.depth, r.disc_seq,
             r.round_disc, r.seq, r.status, tuple(r.outlinks), r.has_image)
            for r in out_df.collect()
        )

    got = rows(df.mapInArrow(fetch_outlinks_map_in_arrow(), OUTLINKS_SCHEMA))
    want = rows(df.mapInPandas(fetch_outlinks_map_in_pandas(), OUTLINKS_SCHEMA))
    assert got == want and len(got) == 500


def test_outlinks_batch_arrow_matches_scalar(spark):
    import numpy as np
    import pyarrow as pa

    from paperchase_crawler_spark import simweb

    rng = np.random.default_rng(11)
    hashes = rng.integers(-2**63, 2**63, 2000, dtype=np.int64)
    off, flat = simweb.outlinks_batch_arrow(hashes)
    got = pa.ListArray.from_arrays(pa.array(off, type=pa.int32()), flat).to_pylist()
    want = [simweb.outlinks_for(int(h)) for h in hashes]
    assert got == want


def test_hamming_reuses_materialized_count(spark):
    """auto_n_blocks must read the _pc_rows stamp from the materialization
    instead of launching its own count job (r5 verdict What's-wrong #2)."""
    df = spark.createDataFrame(
        [(i, i * 7919) for i in range(100)], "doc_id long, h long"
    )
    m = D._reuse(D._spread(df))
    assert getattr(m, "_pc_rows", None) == 100
    # reused path keeps the stamp through the projection
    out = D.hamming_dup_pairs(m, "h", "doc_id", bits=60, max_hamming=3, reused=True)
    out.collect()  # plan builds + runs without an extra count
