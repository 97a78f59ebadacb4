"""Structured Streaming surface: file source → watermarked windowed aggs →
memory sink, equal to the batch formulation of the same transformation."""

from __future__ import annotations

import shutil

import pytest

from pyspark.sql import functions as F

from paperchase_crawler_spark.streaming.events import (
    hourly_type_counts,
    read_events_stream,
    run_stream_to_memory,
    sessionized,
    stateful_user_totals,
    stateful_user_totals_tws,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture
def events_dir(tmp_path):
    # file-source streams need a directory; stage the parquet there
    d = tmp_path / "events"
    d.mkdir()
    shutil.copy(f"{SF}/events.parquet", d / "part-0.parquet")
    return str(d)


def _sorted_rows(df_or_rows):
    rows = df_or_rows.collect() if hasattr(df_or_rows, "collect") else df_or_rows
    return sorted(tuple(r) for r in rows)


def test_hourly_stream_equals_batch(spark, events_dir):
    batch = hourly_type_counts(spark.read.parquet(events_dir))
    stream = hourly_type_counts(read_events_stream(spark, events_dir))
    assert stream.isStreaming
    run_stream_to_memory(stream, "hourly_t")
    got = spark.sql("SELECT * FROM hourly_t")
    assert _sorted_rows(got) == _sorted_rows(batch)
    assert got.count() > 0


def test_stateful_user_totals(spark, events_dir):
    stream = stateful_user_totals(read_events_stream(spark, events_dir))
    q = (
        stream.writeStream.format("memory")
        .queryName("user_totals_t")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # last emitted row per user == the batch ground truth
    got = {
        r.user_id: (r.n_events, round(r.total_value, 2))
        for r in spark.sql("SELECT * FROM user_totals_t").collect()
    }
    want = {
        r.user_id: (r.n, round(r.t, 2))
        for r in spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert got == want


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithStateInPandas' state-server protocol requires "
    "google.protobuf, which this sandbox does not ship (no pip); the "
    "operator wiring is still importable/plannable — see "
    "test_transform_with_state_plans below",
)
def test_transform_with_state_user_totals(spark, events_dir):
    """transformWithStateInPandas (Spark 4.x stateful API, RocksDB-backed
    state) reproduces the batch ground truth, same check as the
    applyInPandasWithState twin."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = stateful_user_totals_tws(read_events_stream(spark, events_dir))
        q = (
            stream.writeStream.format("memory")
            .queryName("user_totals_tws")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    got = {
        r.user_id: (r.n_events, round(r.total_value, 2))
        for r in spark.sql("SELECT * FROM user_totals_tws").collect()
    }
    want = {
        r.user_id: (r.n, round(r.t, 2))
        for r in spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert got == want


def test_transform_with_state_plans(spark, events_dir):
    """The transformWithStateInPandas operator builds and analyzes (the part
    that doesn't need the protobuf state protocol): streaming plan contains
    the TransformWithStateInPySpark node with our output schema."""
    stream = stateful_user_totals_tws(read_events_stream(spark, events_dir))
    assert stream.isStreaming
    assert [f.name for f in stream.schema.fields] == [
        "user_id", "n_events", "total_value",
    ]
    assert "transformWithState" in stream._jdf.queryExecution().logical().toString()


def test_session_window_stream(spark, events_dir):
    stream = sessionized(read_events_stream(spark, events_dir), gap_minutes=30)
    run_stream_to_memory(stream, "sessions_t")
    got = spark.sql("SELECT * FROM sessions_t")
    batch = sessionized(spark.read.parquet(events_dir), gap_minutes=30)
    assert _sorted_rows(got) == _sorted_rows(batch)
    # sanity: multiple sessions exist for at least one user
    users = got.groupBy("user_id").count().filter("count > 1").count()
    assert users > 0
