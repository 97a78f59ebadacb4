"""As-of (time-travel) join: for each left row, the latest right row with
right_time <= left_time per key.

Spark has no native ASOF JOIN; the idiomatic construction is cogrouped
``applyInPandas`` over ``pd.merge_asof`` — each key group is sorted and
merged in one Arrow batch, so the shuffle carries only the two key-partitioned
sides (SURVEY.md §2.2 joins row). DuckDB's native ASOF JOIN is the oracle.

Determinism: callers must ensure the right side has unique time values per
key (pre-aggregate duplicates) — both engines then agree exactly.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StructType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    out_schema: StructType | str,
    right_cols: list[str],
) -> DataFrame:
    """Left as-of join; output = left columns + ``right_cols`` (null when no
    right row precedes the left time)."""
    left_cols = left.columns

    def _merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if l.empty:
            return pd.DataFrame(columns=left_cols + right_cols)
        l = l.sort_values(left_time, kind="mergesort")
        if r.empty:
            out = l[left_cols].copy()
            for c in right_cols:
                out[c] = None
            return out
        r = r.sort_values(right_time, kind="mergesort")
        merged = pd.merge_asof(
            l,
            r[[right_time] + right_cols],
            left_on=left_time,
            right_on=right_time,
            direction="backward",
        )
        return merged[left_cols + right_cols]

    return (
        left.groupBy(key)
        .cogroup(right.groupBy(key))
        .applyInPandas(lambda l, r: _merge(l, r), out_schema)
    )
