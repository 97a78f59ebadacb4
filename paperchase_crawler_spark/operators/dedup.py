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
    sh = shingle_table(df, text_col, id_col, k)
    if max_doc_freq is not None:
        freq = sh.groupBy("shingle").agg(F.count("*").alias("__f"))
        sh = (
            sh.join(freq.filter(F.col("__f") <= max_doc_freq), "shingle", "inner")
            .drop("__f")
        )
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
    sig = minhash_signatures(df, text_col, id_col, k, n_hashes)
    pairs = None
    for b in range(bands):
        cols = [f"h{b * rows_per_band + j}" for j in range(rows_per_band)]
        banded = sig.select(
            "doc_id", F.concat_ws(",", *[F.col(c).cast("string") for c in cols]).alias("bucket")
        )
        l, r = banded.alias("l"), banded.alias("r")
        p = (
            l.join(r, on="bucket")
            .filter(F.col("l.doc_id") < F.col("r.doc_id"))
            .select(
                F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
            )
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    return pairs.distinct()


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
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by simhash Hamming distance ≤ max_hamming.

    Pairwise here (fine at oracle scale); the scale path blocks by simhash
    bytes (4 rotations × 8-bit blocks) before comparing — same pattern as
    minhash banding."""
    s = simhash64(df, text_col, id_col)
    a, b = s.alias("a"), s.alias("b")
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .withColumn(
            "hamming",
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            "hamming",
        )
    )


def embedding_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
) -> DataFrame:
    """Near-dup pairs by embedding cosine ≥ threshold (exact, pairwise).

    Dot/norm via JVM higher-order functions (zip_with + aggregate) — no
    Python. The scale path pre-blocks with LSH (similarity.lsh_bucketed)."""
    normed = df.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn(
        "norm",
        F.sqrt(F.aggregate(F.col("v"), F.lit(0.0), lambda a, x: a + x * x)),
    )
    a, b = normed.alias("a"), normed.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(b, F.col("a.vid") < F.col("b.vid"))
        .withColumn("cosine", dot / (F.col("a.norm") * F.col("b.norm")))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("a.vid").alias("vec_a"),
            F.col("b.vid").alias("vec_b"),
            F.round("cosine", 4).alias("cosine"),
        )
    )
