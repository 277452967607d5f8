"""Structured Streaming path: the availableNow micro-batch run must agree
with the batch twin of the same rollup."""

from __future__ import annotations

from aspep_etl_spark.sources.registry import load_table
from aspep_etl_spark.streaming import hourly_rollup_batch, run_streaming_rollup, sessionize


def test_stateful_sessionize_matches_batch(spark, sf_dir):
    from pyspark.sql import functions as F

    from aspep_etl_spark.streaming.stateful import run_streaming_sessionize

    batch = (
        sessionize(load_table(spark, sf_dir, "events"), gap_seconds=1800)
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min(F.col("ts").cast("string")).alias("session_start"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    b = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["session_start"], r["total_value"])
        for r in batch.collect()
    }
    s = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["session_start"], r["total_value"])
        for r in run_streaming_sessionize(spark, f"{sf_dir}/events.parquet").collect()
    }
    assert b == s
    assert len(b) > 50


def test_streaming_rollup_matches_batch(spark, sf_dir):
    batch = {
        (r["hour_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in hourly_rollup_batch(load_table(spark, sf_dir, "events")).collect()
    }
    stream = {
        (r["hour_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in run_streaming_rollup(spark, f"{sf_dir}/events.parquet").collect()
    }
    assert batch == stream
    assert len(batch) > 100
