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


def run_streaming_dedup(spark: SparkSession, events_path: str) -> DataFrame:
    """[EXT r6b4] Watermarked at-least-once INGEST dedup — the
    exact-key cousin of the debounce above (which collapses distinct
    events sharing a minute key; this one collapses REDELIVERIES of the
    same event).

    At-least-once transports (log replays, task retries upstream of a
    non-idempotent sink) hand the engine the same event twice; the fix
    is ``withWatermark`` + ``dropDuplicates`` on the event key, which
    keeps ONE state entry per key and — because the key includes the
    event-time column — expires it once the watermark passes.  State is
    bounded by one watermark window of DISTINCT keys at any event rate,
    which is what makes this the 100 TB ingest-dedup pattern (the batch
    analog, ``dedup_exact``, re-keys the whole corpus per run).

    Verification runs bounded (availableNow → memory sink); redelivery
    is simulated by unioning two independent file-stream readers over
    the same events file, so every event arrives exactly twice.  Both
    copies are bit-identical, so whichever arrival wins the state race
    the emitted row is the same — the output is deterministic and
    equals the distinct event projection, which is the DuckDB twin
    (single input file ⇒ single micro-batch, the same oracle-promotion
    argument as ``streaming_sessionize`` / ``streaming_stream_join``)."""
    from .events import events_stream, run_to_memory

    s1 = events_stream(spark, events_path)
    s2 = events_stream(spark, events_path)
    deduped = (
        s1.unionByName(s2)
        .withWatermark("ts", "1 hour")
        .dropDuplicates(["event_id", "ts"])
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.unix_micros(F.col("ts")).alias("ts_us"),
            "value",
        )
    )
    return run_to_memory(deduped, "events_streaming_dedup", "append")
