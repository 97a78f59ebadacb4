"""Deduplication operators for large-scale training-data pipelines.

All five classic families, Spark-first (built-in columns + joins; no Python
in any hot path). Each has an ANSI-SQL-expressible formulation used by the
DuckDB oracle in __spark_entry__.py, so the driver's correctness gate covers
them end to end.

Scale notes (100 TB): exact dedup is a hash groupBy (partial+final agg);
shingle/minhash/simhash fan-out is explode → groupBy on the (band, signature)
or shingle key, which shuffles only (key, doc_id) pairs — never document
text; candidate pairs are verified locally per key group. Skewed shingles
(very common n-grams) should be frequency-capped before the self-join — see
``jaccard_pairs(max_doc_freq=...)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import md5_int60, word_kgrams


def _spread(df: DataFrame) -> DataFrame:
    """Rebalance a source that arrives under-partitioned (a small-SF corpus
    is one parquet file → ONE task) so the hash-heavy signature stages use
    every core. No-op when the input already has enough partitions — at real
    scale the file count provides the parallelism and this adds nothing."""
    n = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df


def _reuse(df: DataFrame, spread: bool = True) -> DataFrame:
    """Materialize a small intermediate that multiple plan branches (a
    self-join's two sides, sizes + join) would otherwise RECOMPUTE —
    signature/shingle computation is the dominant cost of every dedup
    family, so paying it once halves the query (measured: minhash 9.3 s →
    ~1.5 s at sf0.1). EAGER on purpose: with a lazy checkpoint the two
    shuffle-write stages of a self-join run inside one job BEFORE the
    checkpoint exists and each recomputes the lineage (measured on simhash).
    ``spread`` re-spreads the checkpoint across cores and matters as much as
    the checkpoint itself for BROADCAST-join consumers: AQE coalesces the
    small aggregate to ONE partition, and a broadcast-join PROBE from a
    1-partition stream runs single-threaded — with skewed buckets that probe
    is the whole query (measured: simhash's 8.9M candidate probes in one
    task, 3.5 s → 0.4 s once spread). For SHUFFLE-join consumers pass
    spread=False — the join re-shuffles by its key anyway and the extra
    round-robin exchange only costs (measured on jaccard: 3.3 s → 2.0 s).
    Cluster note: swap localCheckpoint for persist(StorageLevel.DISK_ONLY)
    if executor loss matters."""
    ck = df.localCheckpoint(eager=True)
    if not spread:
        return ck
    n = df.sparkSession.sparkContext.defaultParallelism
    return ck.repartition(n)


def _banding_diag(stage: str, df: DataFrame) -> DataFrame:
    """Opt-in banding-recall diagnostics (set SPARK_GRAFT_BANDING_DIAG=1):
    log a banded stage's row count to stderr. The banded jaccard/embedding
    paths are exact BY CONSTRUCTION on the contract data (the DuckDB twin's
    hash match proves it), but a future scale-factor bump that changes the
    shingle-frequency cap's bite or grazes LSH planes should be DIAGNOSABLE
    (candidate counts collapsing/exploding), not just a red hash. Costs one
    extra count job per tagged stage, so off by default (r3 advice item)."""
    import os as _os
    import sys as _sys

    if _os.environ.get("SPARK_GRAFT_BANDING_DIAG"):
        print(f"[banding-diag] {stage}: {df.count()} rows", file=_sys.stderr)
    return df


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id row per exact text duplicate group (md5 keyed)."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def shingle_table(
    df: DataFrame, text_col: str, id_col: str, k: int = 3
) -> DataFrame:
    """(doc_id, shingle) rows — distinct word k-grams per document."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_kgrams(F.col(text_col), k)).alias("shingle"),
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    threshold: float = 0.8,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs (doc_a < doc_b, jaccard ≥ t).

    shingle self-join → per-pair intersection counts → |A∪B| = |A|+|B|-|A∩B|.
    ``max_doc_freq`` drops ubiquitous shingles before the self-join (the skew
    defense at scale: a shingle in f docs contributes f² join rows).
    """
    sh = shingle_table(_spread(df), text_col, id_col, k)
    if max_doc_freq is not None:
        # doc-frequency via an unordered window over shingle: one shuffle,
        # no recompute of the shingle plan for a join-back, and the hot
        # shingle costs f rows in one task instead of the f² join rows the
        # cap exists to prevent
        w = Window.partitionBy("shingle")
        sh = (
            sh.withColumn("__f", F.count("*").over(w))
            .filter(F.col("__f") <= max_doc_freq)
            .drop("__f")
        )
    # three consumers (sizes + both self-join sides) — compute shingles once;
    # the self-join is a SHUFFLE join on shingle, so no re-spread needed
    sh = _banding_diag("jaccard.shingles_after_cap", _reuse(sh, spread=False))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, on="shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    inter = _banding_diag("jaccard.candidate_pairs", inter)
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("n_shingles", "na")
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "n_shingles", "nb"
            ),
            "doc_b",
        )
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 4).alias("jaccard"))
    )


def minhash_signatures(
    df: DataFrame, text_col: str, id_col: str, k: int = 3, n_hashes: int = 8
) -> DataFrame:
    """(doc_id, h0..h{n-1}): minhash signature via portable md5-int hashes.

    Hash family i: md5(shingle || '#i') → 60-bit int; signature_i = min over
    the doc's shingles. Identical formulation exists in ANSI SQL.
    """
    grams = df.select(
        F.col(id_col).alias("doc_id"),
        word_kgrams(F.col(text_col), k).alias("grams"),
    )

    def _hash_fn(i: int):
        # one-arg lambda via factory: a two-arg lambda would be interpreted
        # by F.transform as (element, index) and clobber the closure var
        return lambda g: md5_int60(F.concat(g, F.lit(f"#{i}")))

    cols = [
        F.array_min(F.transform(F.col("grams"), _hash_fn(i))).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    return grams.select("doc_id", *cols)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    n_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """LSH candidate pairs: docs sharing any full band of the signature.

    n_hashes/bands rows per band; banding → bucket groupBy → pairs within
    bucket. Returns distinct (doc_a < doc_b) candidates. At scale the
    band-bucket join shuffles only (bucket_key, doc_id)."""
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(_spread(df), text_col, id_col, k, n_hashes)
    # ONE band-exploded equi-join on (band, bucket) instead of a union of
    # per-band self-joins: the union form recomputes the signature plan 2×
    # per band (2×bands scans of the corpus); this computes it once per join
    # side and shuffles only (band, bucket, doc_id)
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                ",",
                *[
                    F.col(f"h{b * rows_per_band + j}").cast("string")
                    for j in range(rows_per_band)
                ],
            ).alias("bucket"),
        )
        for b in range(bands)
    ]
    banded = sig.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    # both self-join sides reuse ONE signature computation (the md5 fan-out
    # dominates the query; without this the broadcast side recomputes it)
    banded = _reuse(banded)
    l, r = banded.alias("l"), banded.alias("r")
    return (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )


def simhash64(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, simhash): 32-bit simhash over distinct word unigrams.

    Bit j of each word's md5-int votes ±1; simhash bit j = majority vote.
    32 bits (not 64) so the per-bit extraction stays portable SQL. Hot path:
    explode words → groupBy doc × popcount algebra, all JVM-side.
    """
    w = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("word"),
    ).withColumn("wh", md5_int60(F.col("word")))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("wh"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(32)
    ]
    agg = w.groupBy("doc_id").agg(*votes)
    sim = F.lit(0).cast("long")
    for j in range(32):
        sim = sim + F.when(F.col(f"v{j}") > 0, F.lit(1 << j).cast("long")).otherwise(0)
    return agg.select("doc_id", sim.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    banded: bool = True,
) -> DataFrame:
    """Near-dup pairs by simhash Hamming distance ≤ max_hamming.

    Default (``banded=True``) is the scale path: split the 32-bit hash into
    ``max_hamming + 1`` bit blocks — by pigeonhole, Hamming ≤ max_hamming
    implies at least one block is EQUAL — equi-join per block on
    (block_idx, block_value), then verify exact Hamming and distinct the
    pairs. Identical output to the pairwise form (property-tested), but the
    join is a shuffled equi-join on the block key, never a cartesian.

    ``banded=False`` keeps the O(N²) pairwise reference (oracle-scale only).
    """
    s = _reuse(simhash64(_spread(df), text_col, id_col))
    return hamming_dup_pairs(
        s, "simhash", "doc_id", bits=32, max_hamming=max_hamming,
        banded=banded, reused=True,
    )


def hamming_dup_pairs(
    df: DataFrame,
    hash_col: str,
    id_col: str,
    bits: int,
    max_hamming: int,
    banded: bool = True,
    reused: bool = False,
) -> DataFrame:
    """Near-dup pairs (doc_a, doc_b, hamming) on a PRECOMPUTED ``bits``-wide
    integer hash column — the shared kernel behind simhash text dedup and
    perceptual-hash image dedup.

    Default (``banded=True``) is the scale path: split the hash into
    ``max_hamming + 1`` bit blocks — by pigeonhole, Hamming ≤ max_hamming
    implies at least one block is EQUAL — equi-join per block on
    (block_idx, block_value), then verify exact Hamming and distinct the
    pairs. Identical output to the pairwise form (property-tested), but the
    join is a shuffled equi-join on the block key, never a cartesian.
    Negative (full-range int64) hashes are fine: the block mask strips
    shiftright's sign extension, and bit_count(xor) is sign-agnostic.

    ``banded=False`` keeps the O(N²) pairwise reference (oracle-scale only).
    ``reused=True`` skips the internal materialization when the caller
    already checkpointed ``df`` (the self-join would otherwise recompute the
    hash lineage once per side)."""
    s = df.select(id_col, hash_col) if reused else _reuse(
        _spread(df.select(id_col, hash_col))
    )
    ida, idb = f"a.{id_col}", f"b.{id_col}"
    hx = F.bit_count(F.col(f"a.{hash_col}").bitwiseXOR(F.col(f"b.{hash_col}")))
    if not banded:
        a, b = s.alias("a"), s.alias("b")
        return (
            a.join(b, F.col(ida) < F.col(idb))
            .withColumn("hamming", hx)
            .filter(F.col("hamming") <= max_hamming)
            .select(
                F.col(ida).alias("doc_a"), F.col(idb).alias("doc_b"), "hamming"
            )
        )
    n_blocks = max_hamming + 1
    bounds = [i * bits // n_blocks for i in range(n_blocks + 1)]

    def _block(col: F.Column, i: int) -> F.Column:
        return F.shiftright(col, bounds[i]).bitwiseAND(
            F.lit((1 << (bounds[i + 1] - bounds[i])) - 1)
        )

    blocks = F.array(
        *[
            F.struct(F.lit(i).alias("blk"), _block(F.col(hash_col), i).alias("val"))
            for i in range(n_blocks)
        ]
    )
    ex = s.select(
        id_col, hash_col, F.explode(blocks).alias("b")
    ).select(
        id_col, hash_col, F.col("b.blk").alias("blk"), F.col("b.val").alias("val")
    )
    # exactly-once emission WITHOUT a distinct: a pair that matches on
    # several blocks is kept only at its SMALLEST matching block (all
    # earlier blocks must differ) — cheap codegen'd bit algebra in the join
    # filter replaces a full shuffle+agg of the pair set (measured: the
    # distinct was the single most expensive stage of the skewed simhash
    # contract query)
    ha, hb = F.col(f"a.{hash_col}"), F.col(f"b.{hash_col}")
    first_match = F.lit(True)
    for j in range(n_blocks - 1):
        first_match = first_match & (
            (F.col("a.blk") <= j) | (_block(ha, j) != _block(hb, j))
        )
    a, b = ex.alias("a"), ex.alias("b")  # both sides read the checkpointed s
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col(ida) < F.col(idb))
            & first_match,
        )
        .select(
            F.col(ida).alias("doc_a"),
            F.col(idb).alias("doc_b"),
            hx.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def image_dup_pairs(
    df: DataFrame,
    phash_col: str = "phash",
    id_col: str = "image_id",
    max_hamming: int = 6,
    banded: bool = True,
) -> DataFrame:
    """Corpus-level near-duplicate IMAGE detection: pairs whose 64-bit
    perceptual hash (codecs/phash.py — stored on every corpus row at fetch
    time, so this never touches image bytes) differ by ≤ ``max_hamming``
    bits. Composes the stored phash with the banded-Hamming pigeonhole
    equi-join (hamming_dup_pairs) — the image twin of simhash text dedup,
    and the missing first-class member the r3 review called out. Returns
    (img_a, img_b, hamming). At 10^10 images this is a shuffled equi-join
    on (block, value) with an in-bucket exact verify — never all-pairs."""
    pairs = hamming_dup_pairs(
        df, phash_col, id_col, bits=64, max_hamming=max_hamming, banded=banded
    )
    return pairs.select(
        F.col("doc_a").alias("img_a"),
        F.col("doc_b").alias("img_b"),
        "hamming",
    )


def _lsh_band_codes(
    v: F.Column, dim: int, n_bands: int, rows_per_band: int, seed: int
) -> list[F.Column]:
    """One sign-LSH code column per band: bit j of band b =
    sign(dot(v, plane_{b*r+j})). Planes are seeded-deterministic literals
    baked into the plan — no shuffle, no Python; the whole code computation
    is narrow JVM column algebra over the vector in place."""
    import numpy as np

    planes = np.random.RandomState(seed).standard_normal(
        (n_bands * rows_per_band, dim)
    )
    codes = []
    for b in range(n_bands):
        code = F.lit(0).cast("long")
        for j in range(rows_per_band):
            p = F.array(*[F.lit(float(x)) for x in planes[b * rows_per_band + j]])
            dot = F.aggregate(
                F.zip_with(v, p, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            code = code + F.when(dot > 0, F.lit(1 << j).cast("long")).otherwise(0)
        codes.append(code)
    return codes


def embedding_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    n_bands: int | None = 4,
    rows_per_band: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs by embedding cosine ≥ threshold.

    Default is the scale path: banded sign-LSH candidate generation (union
    of per-band exact-code equi-joins) followed by an exact cosine verify —
    the join shuffles on (band, code), never all pairs. A pair at angle θ
    collides in one band with prob (1-θ/π)^rows_per_band; near-dups
    (θ → 0) collide with prob → 1 in EVERY band, so recall at real dup
    thresholds is 1 up to astronomically unlikely plane-grazing flips
    (property-tested == the exact form on the contract data).

    ``n_bands=None`` is the exact all-pairs reference (oracle scale only) —
    the DuckDB twin of the contract query computes this form.
    """
    normed = _spread(df).select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn(
        "norm",
        F.sqrt(F.aggregate(F.col("v"), F.lit(0.0), lambda a, x: a + x * x)),
    )
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    if n_bands is None:
        normed = _reuse(normed)
        a, b = normed.alias("a"), normed.alias("b")
        cand = a.join(b, F.col("a.vid") < F.col("b.vid"))
    else:
        codes = _lsh_band_codes(
            F.col("v"), dim, n_bands, rows_per_band, seed
        )
        ex = normed.select(
            "vid",
            "v",
            "norm",
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(i).alias("band"), c.alias("code"))
                        for i, c in enumerate(codes)
                    ]
                )
            ).alias("bc"),
        ).select(
            "vid", "v", "norm",
            F.col("bc.band").alias("band"),
            F.col("bc.code").alias("code"),
        )
        # both join sides reuse ONE band-code computation (n_bands ×
        # rows_per_band plane dot products per row — the dominant cost)
        ex = _reuse(ex)
        a, b = ex.alias("a"), ex.alias("b")
        cand = _banding_diag(
            "embedding.banded_candidates",
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.code") == F.col("b.code"))
                & (F.col("a.vid") < F.col("b.vid")),
            ),
        )
    return (
        cand.withColumn("cosine", dot / (F.col("a.norm") * F.col("b.norm")))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("a.vid").alias("vec_a"),
            F.col("b.vid").alias("vec_b"),
            F.round("cosine", 4).alias("cosine"),
        )
        .distinct()
    )


def dup_clusters(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Resolve near-dup PAIRS into CLUSTERS: (doc_id, cluster_id) for every
    id appearing in ``pairs``, cluster_id = the minimum id in the connected
    component. This is the step a real training-data dedup pipeline needs
    after any pair generator (exact / minhash / simhash / image phash /
    embedding): transitive closure so "keep one representative per
    component" is well-defined — pairs alone under-delete chained
    duplicates (A~B, B~C must collapse to one survivor, not two).

    Algorithm: distributed min-label propagation (the classic iterative
    connected-components shape): every node starts labeled with itself; each
    round every node takes the min of its own label and its neighbours'
    labels; stop when no label changed. Converges in O(component diameter)
    rounds — near-dup components are cliquish (diameter ≲ 3) so this is
    2-4 rounds in practice. Per round: one shuffle join on the edge key +
    one aggregation — both scale-shaped; labels are re-materialized each
    round (localCheckpoint) so the iterative lineage never compounds. At
    10^10 ids the same loop runs with persist(DISK_ONLY) and the standard
    large-star/small-star optimization halves round count; the semantics
    here are the contract."""
    edges = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
    sym = _reuse(
        edges.unionByName(
            edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
        ).distinct(),
        spread=False,
    )
    labels = sym.select(F.col("a").alias("doc_id")).distinct().withColumn(
        "cluster_id", F.col("doc_id")
    )
    labels = _reuse(labels, spread=False)
    for _ in range(max_iter):
        nb_min = (
            sym.join(
                labels.select(
                    F.col("doc_id").alias("b"),
                    F.col("cluster_id").alias("nb_label"),
                ),
                on="b",
            )
            .groupBy("a")
            .agg(F.min("nb_label").alias("nb_min"))
        )
        new_labels = (
            labels.join(
                nb_min.withColumnRenamed("a", "doc_id"), on="doc_id", how="left"
            )
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("nb_min"), F.col("cluster_id")),
                ).alias("cluster_id"),
            )
        )
        new_labels = _reuse(new_labels, spread=False)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="doc_id")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"dup_clusters did not converge in {max_iter} iterations — component "
        "diameter exceeds the bound; raise max_iter"
    )
