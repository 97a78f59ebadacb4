"""Bucketed merge-on-read frontier + shuffle-free politeness pre-cut.

The 10^10 design point (north_rule: "partitioned Iceberg-backed priority
frontier") cannot re-shuffle the whole frontier every round. Layout invariant
(sources/icetable.py bucketed ops):

- physical bucket ``__fb = pmod(xxhash64(host), nb) * salts +
  pmod(url_hash, salts)`` — every row of a host lives in ``salts`` buckets,
  every version of a URL in exactly ONE bucket;
- the base is written once; each round appends per-bucket DELTA files of full
  replacement rows tagged with a monotone ``__rev`` (the snapshot id);
- compaction folds deltas into a fresh base when they outgrow it.

``select_candidates`` plans one narrow task per bucket (per-bucket file scans
coalesced to one partition, unioned — NO shuffle): each task merges last-wins
by url_hash, keeps queued rows, and emits each host's top-``max_tokens`` rows
by R3 order with their per-(host, salt-bucket) rank. Because a host's rows sit
entirely inside its ``salts`` buckets, survivors are ≤ salts × max_tokens per
host — the exact politeness cut and the global budget cut then run on that
tiny set. A frontier round therefore shuffles O(selected + discovered), never
O(frontier). ``salts`` is the giant-host defense: it splits one host's rows
across tasks at the cost of the small exact second cut (operators/politeness
two-pass argument).

The merge/top-k kernel is Arrow-native (mapInArrow + numpy lexsort): URL
strings are never materialized as Python objects (input_hint: no per-row
Python).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark.sql.types import IntegerType, StructField, StructType

from ..schemas import FRONTIER
from ..sources.icetable import IceTable

# StructType.add mutates in place — build copies
FRONTIER_REV_SCHEMA = StructType(
    list(FRONTIER.fields) + [StructField("__rev", IntegerType(), False)]
)
_SELECT_OUT_SCHEMA = StructType(
    list(FRONTIER.fields) + [StructField("__host_rank", IntegerType(), False)]
)


def _pa_schema(spark_schema: StructType):
    """Fixed Arrow schema for kernel output: mapInArrow requires every
    emitted batch to carry the IDENTICAL schema, while per-bucket parquet
    reads drift in nullability (concat promotion depends on the bucket's
    file mix) — so every batch is cast to this."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(spark_schema)


def frontier_bucket_col(nb: int, salts: int = 1) -> Column:
    return (
        F.pmod(F.xxhash64("host"), F.lit(nb)) * salts
        + F.pmod(F.col("url_hash"), F.lit(salts))
    ).cast("int")


def _merge_topk_fn(max_tokens: int):
    """Arrow kernel: read this task's bucket files with pyarrow, last-wins
    merge by url_hash → queued filter → per-host top-max_tokens by
    (depth, disc_seq). Exact per task because a bucket holds every version
    of its URLs and every row of its (host, salt) — several buckets landing
    in one task only widens the (still-complete) host set.

    Input rows are (bucket, files) manifest entries — a Python-side bucket
    scan via mapInArrow rather than a 2×NB-leaf union plan, because without
    a catalog Spark has no bucket-aware scan: a per-bucket union costs
    seconds of driver plan-build per round and splinters the scan into
    per-leaf stubs, while this is one plan leaf whose tasks read their own
    files at pyarrow speed (measured ~10× faster end-to-end). With a real
    Iceberg catalog this becomes a bucket-transform storage-partitioned scan
    and the kernel below keeps only the merge+top-k part."""

    def fn(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        files: list[str] = []
        for rb in batches:
            for flist in rb.column("files").to_pylist():
                files.extend(flist)
        if not files:
            return
        names = [f.name for f in FRONTIER_REV_SCHEMA.fields]
        # normalize column order + promote nullability per file: different
        # commits may lay columns out (or infer nullability) differently
        tbl = pa.concat_tables(
            [pq.read_table(f).select(names) for f in files],
            promote_options="permissive",
        ).combine_chunks()
        uh = tbl.column("url_hash").to_numpy()
        rev = tbl.column("__rev").to_numpy()
        order = np.lexsort((rev, uh))
        uh_sorted = uh[order]
        last = np.ones(len(order), dtype=bool)
        if len(order) > 1:
            last[:-1] = uh_sorted[1:] != uh_sorted[:-1]
        merged = tbl.take(pa.array(order[last]))
        merged = merged.filter(pc.equal(merged.column("state"), "queued"))
        if merged.num_rows == 0:
            return
        merged = merged.combine_chunks()
        hc = merged.column("host").chunk(0).dictionary_encode().indices.to_numpy()
        depth = merged.column("depth").to_numpy()
        seq = merged.column("disc_seq").to_numpy()
        o2 = np.lexsort((seq, depth, hc))
        hc_s = hc[o2]
        starts = np.zeros(len(o2), dtype=bool)
        starts[0] = True
        if len(o2) > 1:
            starts[1:] = hc_s[1:] != hc_s[:-1]
        start_pos = np.flatnonzero(starts)
        run_len = np.diff(np.append(start_pos, len(o2)))
        rank = np.arange(len(o2)) - np.repeat(start_pos, run_len)
        keep = rank < max_tokens
        out = (
            merged.take(pa.array(o2[keep]))
            .drop_columns(["__rev"])
            .append_column("__host_rank", pa.array(rank[keep].astype(np.int32)))
        )
        # mapInArrow matches by POSITION and requires identical batch
        # schemas: normalize order AND cast away per-bucket nullability drift
        out = out.select([f.name for f in _SELECT_OUT_SCHEMA.fields]).cast(
            _pa_schema(_SELECT_OUT_SCHEMA)
        )
        yield from out.to_batches(max_chunksize=8192)

    return fn


def select_candidates(
    spark: SparkSession, tbl: IceTable, max_tokens: int
) -> DataFrame:
    """Per-host top-``max_tokens`` queued candidates with per-(host, salt)
    rank ``__host_rank`` — one Arrow task per bucket reading only its own
    files; the only thing that moves is the NB-row file manifest."""
    plan = tbl.bucket_plan()
    rows = [
        (int(b), plan[b]["base"] + plan[b]["delta"]) for b in sorted(plan, key=int)
    ]
    manifest = spark.createDataFrame(
        rows, "bucket int, files array<string>"
    ).repartition(len(rows), "bucket")
    return manifest.mapInArrow(_merge_topk_fn(max_tokens), _SELECT_OUT_SCHEMA)


def exact_per_host_cut(candidates: DataFrame, salts: int) -> DataFrame:
    """Exact per-host top-``tokens_per_round`` from the bucket-local pre-cut.

    salts == 1: a host is whole inside one task, so __host_rank is the TRUE
    host rank — a filter suffices (no shuffle at all). salts > 1: survivors
    are ≤ salts × max_tokens per host, so the standard tiny exact window
    applies (same two-pass exactness argument as operators/politeness)."""
    if salts == 1:
        return candidates.filter(
            F.col("__host_rank") < F.col("tokens_per_round")
        ).drop("__host_rank")
    w = Window.partitionBy("host").orderBy(
        F.col("depth").asc(), F.col("disc_seq").asc()
    )
    return (
        candidates.drop("__host_rank")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.col("tokens_per_round"))
        .drop("__rn")
    )


def _merge_buckets_fn(next_rev: int):
    """Arrow kernel for COMPACTION: per manifest row (one bucket), last-wins
    merge of base ∪ deltas, re-tagged with the compacted commit's __rev and
    the bucket's __fb — rows never leave their bucket, so the compacted base
    can be written back with NO shuffle (one task per bucket reads its own
    files and writes its own file)."""

    def fn(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        names = [f.name for f in FRONTIER_REV_SCHEMA.fields]
        base_names = [f.name for f in FRONTIER.fields]
        for rb in batches:
            buckets = rb.column("bucket").to_pylist()
            file_lists = rb.column("files").to_pylist()
            for bucket, files in zip(buckets, file_lists):
                if not files:
                    continue
                tbl = pa.concat_tables(
                    [pq.read_table(f).select(names) for f in files],
                    promote_options="permissive",
                ).combine_chunks()
                uh = tbl.column("url_hash").to_numpy()
                rev = tbl.column("__rev").to_numpy()
                order = np.lexsort((rev, uh))
                uh_sorted = uh[order]
                last = np.ones(len(order), dtype=bool)
                if len(order) > 1:
                    last[:-1] = uh_sorted[1:] != uh_sorted[:-1]
                merged = tbl.take(pa.array(order[last])).select(base_names)
                n = merged.num_rows
                out = merged.append_column(
                    "__rev", pa.array(np.full(n, next_rev, dtype=np.int32))
                ).append_column(
                    "__fb", pa.array(np.full(n, bucket, dtype=np.int32))
                )
                yield from out.cast(_pa_schema(_COMPACT_SCHEMA)).to_batches(
                    max_chunksize=8192
                )

    return fn


_COMPACT_SCHEMA = StructType(
    list(FRONTIER_REV_SCHEMA.fields) + [StructField("__fb", IntegerType(), False)]
)


def compacted_frontier(
    spark: SparkSession, tbl: IceTable, next_rev: int
) -> DataFrame:
    """Merged frontier WITH layout columns (__rev, __fb), bucket-local and
    shuffle-free — feed straight to overwrite_bucketed for compaction."""
    plan = tbl.bucket_plan()
    rows = [
        (int(b), plan[b]["base"] + plan[b]["delta"]) for b in sorted(plan, key=int)
    ]
    manifest = spark.createDataFrame(
        rows, "bucket int, files array<string>"
    ).repartition(len(rows), "bucket")
    return manifest.mapInArrow(_merge_buckets_fn(next_rev), _COMPACT_SCHEMA)


def merged_frontier(spark: SparkSession, tbl: IceTable) -> DataFrame:
    """General merged view (tests / non-hot consumers): last-wins by url_hash
    over base ∪ deltas via max_by(row, __rev) — pays one shuffle, which the
    select path above exists to avoid."""
    plan = tbl.bucket_plan()
    files = [f for b in plan.values() for f in b["base"] + b["delta"]]
    raw = spark.read.schema(FRONTIER_REV_SCHEMA).parquet(*files)
    cols = [f.name for f in FRONTIER.fields]
    return (
        raw.groupBy("url_hash")
        .agg(F.max_by(F.struct(*cols), F.col("__rev")).alias("s"))
        .select(*[F.col(f"s.{c}").alias(c) for c in cols])
    )
