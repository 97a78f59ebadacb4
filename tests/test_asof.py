"""Cogrouped merge_asof operator vs a plain-Python reference."""

from __future__ import annotations

import datetime as dt

from paperchase_crawler_spark.operators.asof import asof_join


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def test_asof_backward_join(spark):
    left = spark.createDataFrame(
        [
            (1, "a", _ts(5)),
            (2, "a", _ts(1)),
            (3, "b", _ts(10)),
            (4, "c", _ts(2)),  # key with no right rows at all
            (5, "a", _ts(3, 12)),
        ],
        "event_id long, k string, ets timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            ("a", _ts(2), 100),
            ("a", _ts(3), 101),
            ("a", _ts(6), 102),
            ("b", _ts(1), 200),
        ],
        "k string, ots timestamp_ntz, ref long",
    )
    out = asof_join(
        left,
        right,
        key="k",
        left_time="ets",
        right_time="ots",
        out_schema="event_id long, k string, ets timestamp_ntz, ref long",
        right_cols=["ref"],
    )
    got = {r.event_id: r.ref for r in out.collect()}
    assert got == {1: 101, 2: None, 3: 200, 4: None, 5: 101}
