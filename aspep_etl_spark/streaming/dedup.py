"""[EXT] Streaming deduplication (SURVEY.md §2.9/§2.11): debounce repeated
events with ``dropDuplicatesWithinWatermark`` — the state-bounded
streaming form of exact dedup.

The batch twin (`debounce_batch`) keeps a deterministic survivor
(min event_id) per (user, event_type, minute) and is oracle-checkable;
the streaming variant keeps whichever row arrives first (inherent to
streaming dedup), so its check is key-set equality against the batch twin
plus the driver's rows-only gate.  Watermark bounds the dedup state: keys
older than the delay are evicted, which is what makes this runnable
forever at 100 TB/day — an unbounded ``dropDuplicates`` would grow state
without limit.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEBOUNCE_KEYS = ["user_id", "event_type", "minute"]


def _with_minute(events: DataFrame) -> DataFrame:
    return events.withColumn("minute", F.date_trunc("minute", F.col("ts")))


def debounce_batch(events: DataFrame) -> DataFrame:
    """Deterministic batch twin: min-event_id survivor per debounce key,
    with the collapsed-duplicate count — one hash-agg shuffle."""
    return (
        _with_minute(events)
        .groupBy(*DEBOUNCE_KEYS)
        .agg(F.min("event_id").alias("event_id"), F.count("*").alias("n_collapsed"))
        .select(
            "user_id",
            "event_type",
            F.col("minute").cast("string").alias("minute"),
            "event_id",
            "n_collapsed",
        )
    )


def run_streaming_debounce(spark: SparkSession, events_path: str) -> DataFrame:
    """Debounce through Structured Streaming with Trigger.AvailableNow:
    readStream → watermark → ``dropDuplicatesWithinWatermark`` on the
    debounce key → append-mode memory sink."""
    from .events import events_stream, run_to_memory

    out = (
        _with_minute(events_stream(spark, events_path))
        .withWatermark("minute", "2 hours")
        .dropDuplicatesWithinWatermark(DEBOUNCE_KEYS)
        .select(
            "user_id",
            "event_type",
            F.col("minute").cast("string").alias("minute"),
            "event_id",
        )
    )
    return run_to_memory(out, "events_debounce_stream", "append")
