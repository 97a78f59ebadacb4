"""Structured Streaming surface (SURVEY.md §2.2 streaming rows).

The crawl loop itself is deliberately batch-iterative (deterministic round
barriers + snapshot resume — SURVEY.md §3.3), but the engine exposes the full
streaming operator surface over event streams: watermarked tumbling/sliding
windows, session windows, and stateful per-key processing. The same
transformations run in batch mode (used by the DuckDB-checked queries) and in
readStream mode (tested with a file source + availableNow trigger in
tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over an events parquet directory."""
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(path)


def hourly_type_counts(events: DataFrame, watermark: str | None = "10 minutes") -> DataFrame:
    """Tumbling 1-hour windows per event_type: count + total value.

    Works identically on batch and streaming inputs; the watermark bounds
    state for late data in streaming mode."""
    src = events.withWatermark("ts", watermark) if watermark and events.isStreaming else events
    return (
        src.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionized(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization via session_window (streaming-native op):
    per (user, session) event counts and value sums."""
    src = events.withWatermark("ts", "10 minutes") if events.isStreaming else events
    return (
        src.groupBy(
            F.session_window("ts", f"{gap_minutes} minutes").alias("sw"), "user_id"
        )
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            "user_id",
            F.date_format(F.col("sw.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            "total_value",
        )
    )


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful per-key streaming operator via applyInPandasWithState:
    maintains a running (n_events, total_value) per user across micro-batches
    (the streaming twin of the crawl loop's carried host_state; SURVEY.md
    §2.2 'stateful per-key op' row). Emits one updated row per user per
    micro-batch."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def _update(key, pdfs, state):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, round(total, 6)))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_user_totals_tws(events: DataFrame) -> DataFrame:
    """Same running per-user totals via transformWithStateInPandas — Spark
    4.x's current arbitrary-stateful-processing API (typed state handles,
    timers, RocksDB-backed state store), exercised alongside the
    applyInPandasWithState form above so both stateful surfaces stay
    covered. Emits one updated row per user per micro-batch; the batch
    ground-truth check lives in tests/test_streaming.py."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _UserTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", "n long, total double")

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._totals.get() if self._totals.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 4)],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_UserTotals(),
        outputStructType="user_id long, n_events long, total_value double",
        outputMode="Update",
        timeMode="None",
    )


def run_stream_to_memory(
    stream_df: DataFrame, query_name: str, output_mode: str = "complete"
):
    """availableNow-triggered run into an in-memory sink; returns the query
    after it drains (test/driver harness helper)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
