"""Structured Streaming path: the availableNow micro-batch run must agree
with the batch twin of the same rollup."""

from __future__ import annotations

from aspep_etl_spark.sources.registry import load_table
from aspep_etl_spark.streaming import hourly_rollup_batch, run_streaming_rollup


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
