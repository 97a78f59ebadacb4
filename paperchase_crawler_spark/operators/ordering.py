"""Exact global total-order rank / top-k without a single-partition sort.

A naive ``row_number().over(Window.orderBy(...))`` or a full ``orderBy`` pulls
every row through ONE task — the classic scale killer (SURVEY.md §4.3). These
operators keep the cut exact while staying distributed:

1. ``repartitionByRange`` on the total-order key → partition i holds a
   contiguous key range, ranges ascending with i.
2. per-partition row counts (one tiny job, P rows to the driver),
3. driver-side cumulative sum → per-partition rank offsets (or the boundary
   partition for top-k),
4. ``row_number`` windowed *within* each range partition (+ offset).

Result is exact and deterministic whenever the key tuple is unique (ours is:
disc_seq is unique), independent of physical partitioning. Memory per task is
O(rows/P); nothing global ever materializes in one place.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PID = "__pid"
_RN = "__rn"


def _range_partitioned(df: DataFrame, keys: list[str]) -> DataFrame:
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    # repartitionByRange executes its CHILD twice per action: once in the
    # range-boundary sampling pass, once in the real shuffle-map pass. The
    # children fed to the rank operators are exactly the expensive cut
    # lineages (bucket Arrow scans, salted windows, UDF-bearing expand
    # plans), so a lazy local checkpoint in between makes the child compute
    # once — the sampling pass materializes it and the map pass reads the
    # cached blocks (guide §2.4 "remove shuffles/passes outright").
    return (
        df.localCheckpoint(eager=False)
        .repartitionByRange(n, *[F.col(k) for k in keys])
        .withColumn(_PID, F.spark_partition_id())
    )


def with_global_rank(
    df: DataFrame, keys: list[str], rank_col: str, start: int = 0,
    with_total: bool = False, max_rows: int | None = None,
):
    """Add ``rank_col`` = 0-based position of each row in the total order
    given by ``keys`` (ascending), offset by ``start``. Exact, distributed.
    ``with_total`` returns ``(df, total_rows)`` — the count is already known
    from the per-partition counts job, so callers needing it skip their own
    count action.

    ``max_rows``: an UPPER BOUND on df's row count, when the caller already
    holds one (the crawl bounds new discoveries by the collected outlink
    total). A small bound turns the rank into the same single-job
    TakeOrderedAndProject positional path as global_topk_ranked — the
    limit(max_rows) keeps every row because the bound is an upper bound —
    instead of the sampling pass + counts job of the range path. Bounds
    above TAKE_ORDERED_MAX_K fall through to the range path, so the hint
    can never funnel a large set through one partition."""
    if max_rows is not None and max_rows <= TAKE_ORDERED_MAX_K:
        top = df.orderBy(*[F.col(k).asc() for k in keys]).limit(max_rows)
        rank = F.when(
            F.spark_partition_id() == 0,
            F.monotonically_increasing_id() + F.lit(start).cast("long"),
        ).otherwise(
            F.raise_error(
                F.lit(
                    "with_global_rank: take-ordered path expected a single "
                    "sorted partition"
                )
            ).cast("long")
        )
        ranked = top.withColumn(rank_col, rank).localCheckpoint(eager=False)
        if with_total:
            return ranked, ranked.count()
        return ranked
    part = _range_partitioned(df, keys).localCheckpoint(eager=False)
    counts = {
        r[_PID]: r["cnt"]
        for r in part.groupBy(_PID).agg(F.count("*").alias("cnt")).collect()
    }

    def _ret(out: DataFrame):
        return (out, sum(counts.values())) if with_total else out

    offsets: dict[int, int] = {}
    acc = start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    if not offsets:
        return _ret(df.withColumn(rank_col, F.lit(0).cast("long")).limit(0))
    off_map = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    w = Window.partitionBy(_PID).orderBy(*[F.col(k).asc() for k in keys])
    return _ret(
        part.withColumn(_RN, F.row_number().over(w))
        .withColumn(
            rank_col,
            (F.col(_RN).cast("long") - 1 + off_map[F.col(_PID)]).cast("long"),
        )
        .drop(_PID, _RN)
    )


def global_topk_ranked(
    df: DataFrame,
    keys: list[str],
    k: int,
    rank_col: str,
    start: int = 0,
    count_pred=None,
    with_total: bool = False,
):
    """Exact smallest-k rows by ``keys`` WITH their global 0-based rank
    (+``start``), in one range-partition pass — fuses global_topk +
    with_global_rank so the crawl SELECT stage pays one shuffle, one
    checkpoint, one count job instead of two of each.

    ``count_pred`` (a boolean Column) piggybacks an exact predicate count on
    the SAME per-partition counts job and changes the return to
    ``(df, n_pred)`` — the zone-map pruned SELECT uses it to verify its
    exactness bound without a second pass (frontier_select). ``with_total``
    appends ``min(k, total_rows)`` — the exact output size, already known
    from the per-partition counts — so callers can size downstream stages
    (the fetch partition count) without their own count job."""
    if k <= 0:
        # guard BEFORE any job: an empty offsets map would otherwise build
        # create_map() of VOID type (found by the budget=0 edge test)
        empty = df.withColumn(rank_col, F.lit(0).cast("long")).limit(0)
        out = (empty,) if count_pred is None else (empty, 0)
        if with_total:
            out = (*out, 0)
        return out[0] if len(out) == 1 else out
    if count_pred is None and k <= TAKE_ORDERED_MAX_K:
        # small-k fast path: TakeOrderedAndProject emits ONE partition in
        # sort order (per-partition bounded heaps + ordered merge), so the
        # global rank is just the positional id — no range exchange, no
        # boundary-sampling pass, no counts collect: a single job, whose
        # count doubles as the checkpoint materializer AND the exact output
        # size for with_total. The partition-id guard raises loudly if a
        # future Spark ever plans this differently instead of mis-ranking
        # silently. count_pred callers (the zone-pruned SELECT verify) need
        # per-partition counts over the FULL survivor set and keep the
        # range-partitioned path below.
        top = df.orderBy(*[F.col(kk).asc() for kk in keys]).limit(k)
        rank = F.when(
            F.spark_partition_id() == 0,
            F.monotonically_increasing_id() + F.lit(start).cast("long"),
        ).otherwise(
            F.raise_error(
                F.lit(
                    "global_topk_ranked: take-ordered path expected a single "
                    "sorted partition"
                )
            ).cast("long")
        )
        ranked = top.withColumn(rank_col, rank).localCheckpoint(eager=False)
        n_out = ranked.count()
        return (ranked, n_out) if with_total else ranked
    part = _range_partitioned(df, keys).localCheckpoint(eager=False)
    aggs = [F.count("*").alias("cnt")]
    if count_pred is not None:
        aggs.append(F.count_if(count_pred).alias("npred"))
    rows = part.groupBy(_PID).agg(*aggs).collect()
    counts = sorted((r[_PID], r["cnt"]) for r in rows)
    n_pred = sum(r["npred"] for r in rows) if count_pred is not None else None
    n_out = min(k, sum(c for _, c in counts))

    def _ret(out: DataFrame):
        parts = (out,) if count_pred is None else (out, n_pred)
        if with_total:
            parts = (*parts, n_out)
        return parts[0] if len(parts) == 1 else parts

    if not counts:
        return _ret(df.withColumn(rank_col, F.lit(0).cast("long")).limit(0))
    acc = 0
    offsets: dict[int, int] = {}
    boundary_pid, take_in_boundary = None, 0
    for pid, cnt in counts:
        if acc >= k:
            break
        offsets[pid] = acc + start
        if acc + cnt > k:
            boundary_pid, take_in_boundary = pid, k - acc
        acc += cnt
    kept = part.filter(F.col(_PID).isin(list(offsets)))
    w = Window.partitionBy(_PID).orderBy(*[F.col(kk).asc() for kk in keys])
    ranked = kept.withColumn(_RN, F.row_number().over(w))
    if boundary_pid is not None:
        ranked = ranked.filter(
            (F.col(_PID) != boundary_pid) | (F.col(_RN) <= take_in_boundary)
        )
    off_map = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    return _ret(
        ranked.withColumn(
            rank_col,
            (F.col(_RN).cast("long") - 1 + off_map[F.col(_PID)]).cast("long"),
        ).drop(_PID, _RN)
    )


# Below this k, sort+limit plans as TakeOrderedAndProject: every partition
# keeps a k-row bounded heap and only P×k rows reach the final merge — no
# range-exchange, no sampling pass, no counts job, and no full sort of any
# partition. Above it, P×k rows through one merge stops being small and the
# range-partitioned path (sampling job + counts job, but fully distributed)
# wins. 64k keeps the merge ≤ a few MB per thousand partitions.
TAKE_ORDERED_MAX_K = 65_536


def global_topk(df: DataFrame, keys: list[str], k: int) -> DataFrame:
    """Exact smallest-k rows by ``keys``. Small k (the common case: crawl
    budgets, report top-k) goes through sort+limit = TakeOrderedAndProject —
    per-partition bounded heaps, one job, zero extra actions. Large k keeps
    the range-partitioned exact cut: only the single boundary range
    partition pays a window; partitions entirely inside/outside the cut are
    passed/dropped by a metadata-only filter."""
    if k <= 0:
        return df.limit(0)
    if k <= TAKE_ORDERED_MAX_K:
        return df.orderBy(*[F.col(kk).asc() for kk in keys]).limit(k)
    part = _range_partitioned(df, keys).localCheckpoint(eager=False)
    counts = sorted(
        (r[_PID], r["cnt"])
        for r in part.groupBy(_PID).agg(F.count("*").alias("cnt")).collect()
    )
    total = sum(c for _, c in counts)
    if total <= k:
        return part.drop(_PID)
    acc = 0
    boundary_pid, take_in_boundary = -1, 0
    keep_full: list[int] = []
    for pid, cnt in counts:
        if acc + cnt <= k:
            keep_full.append(pid)
            acc += cnt
            if acc == k:
                break
        else:
            boundary_pid, take_in_boundary = pid, k - acc
            break
    full = part.filter(F.col(_PID).isin(keep_full)) if keep_full else None
    if take_in_boundary > 0:
        w = Window.partitionBy(_PID).orderBy(*[F.col(kk).asc() for kk in keys])
        edge = (
            part.filter(F.col(_PID) == boundary_pid)
            .withColumn(_RN, F.row_number().over(w))
            .filter(F.col(_RN) <= take_in_boundary)
            .drop(_RN)
        )
        full = edge if full is None else full.unionByName(edge)
    assert full is not None
    return full.drop(_PID)
