"""[EXT] Watermarked stream-stream join (SURVEY.md §2.9 extension).

The one stateful-join shape Structured Streaming supports natively:
two watermarked streams, an equi-key plus a TIME-RANGE predicate, inner
join in append mode.  The time bound is what lets the engine expire
join state — without it the click buffer grows forever; with a 1-hour
watermark and a 30-minute range, state per key is bounded by one hour
of events (Spark drops buffered rows once the watermark passes the
range bound).  That state-expiry story is the whole reason this is the
100 TB attribution-join pattern, vs. the batch as-of join which needs
the full history co-partitioned.

Verification runs bounded (`availableNow` → memory sink).  Over a
single input file availableNow runs one micro-batch, so no pair spans
a batch boundary and the emission equals the batch inner join — the
same promotion argument as ``streaming_sessionize`` (r4 verdict ask
#3); the DuckDB oracle replays the batch twin exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .events import events_stream, run_to_memory

_RANGE_MIN = 30


def _click_purchase_join(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """The shared logical plan: same-user purchases within
    [click_ts, click_ts + 30 min], delay in whole seconds."""
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    j = c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {_RANGE_MIN} MINUTES")
        ),
    )
    return j.select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        (
            F.unix_timestamp("purchase_ts") - F.unix_timestamp("click_ts")
        ).alias("delay_s"),
    )


def click_purchase_join_batch(events: DataFrame) -> DataFrame:
    """Batch twin on one events frame — the oracle-checkable form."""
    return _click_purchase_join(
        events.filter(F.col("event_type") == "click"),
        events.filter(F.col("event_type") == "purchase"),
    )


def run_streaming_click_purchase_join(
    spark: SparkSession, events_path: str
) -> DataFrame:
    """Run the join as a genuine stream-stream join: two independent
    file-stream readers over the same source, both watermarked 1 hour,
    inner join with the time-range bound, append mode."""
    clicks = (
        events_stream(spark, events_path)
        .filter(F.col("event_type") == "click")
        .withWatermark("ts", "1 hour")
    )
    purchases = (
        events_stream(spark, events_path)
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "1 hour")
    )
    out = _click_purchase_join(clicks, purchases)
    return run_to_memory(out, "events_click_purchase_join_stream", "append")
