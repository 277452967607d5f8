"""[EXT] Time-bounded event attribution — the stream-stream join shape
(SURVEY.md §2.9 extension; the reference is batch-only).

Attribution ("which click led to this purchase?") is the canonical
stream-stream join: two event streams, a key equality, and a time-range
predicate.  The SAME plan body serves batch and streaming — in streaming,
both sides carry watermarks and the range predicate is exactly what lets
Spark bound join state (clicks older than ``purchase watermark −
horizon`` are evicted; unbounded stream-stream joins without a time
constraint grow state forever and are a deploy-time mistake, not an
option this module offers).

``attribution_pairs`` emits ALL (click, purchase) pairs inside the
horizon — the streaming-safe part (append-mode compatible).
``last_touch`` reduces to one click per purchase (latest, id tie-break) —
a keyed aggregation that in streaming would need its own output-mode
consideration, so it is exposed as the batch/post-processing step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def attribution_pairs(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon_seconds: int = 7200,
) -> DataFrame:
    """All (click, purchase) pairs for the same user with
    ``purchase.ts − horizon ≤ click.ts ≤ purchase.ts``.

    Inputs need columns (event_id, user_id, ts); batch or streaming
    frames (streaming callers must ``withWatermark`` BOTH sides first —
    the range predicate below is what makes the join state prunable).
    One shuffle on ``user_id`` per side; the range predicate rides the
    join as a post-filter of the equi-join, never a nested loop."""
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
    ).alias("c")
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
    ).alias("p")
    cond = (
        (F.col("c.c_user_id") == F.col("p.user_id"))
        & (F.col("c.click_ts") <= F.col("p.purchase_ts"))
        & (
            F.col("c.click_ts")
            >= F.col("p.purchase_ts") - F.expr(f"INTERVAL {horizon_seconds} SECOND")
        )
    )
    return c.join(p, cond).select(
        "purchase_id", "user_id", "purchase_ts", "click_id", "click_ts"
    )


def last_touch(pairs: DataFrame) -> DataFrame:
    """Last-touch reduction: the latest in-horizon click per purchase
    (click_ts then click_id tie-break, so the survivor is deterministic
    on every engine).  One keyed window shuffle."""
    w = Window.partitionBy("purchase_id").orderBy(
        F.desc("click_ts"), F.desc("click_id")
    )
    return (
        pairs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "purchase_id",
            "user_id",
            F.col("purchase_ts").cast("string").alias("purchase_ts"),
            "click_id",
            (
                F.unix_micros("purchase_ts") - F.unix_micros("click_ts")
            ).alias("lag_us"),
        )
    )


def run_streaming_attribution(
    spark: SparkSession,
    events_path: str,
    horizon_seconds: int = 7200,
    watermark: str = "4 hours",
) -> DataFrame:
    """Run the pair join as a genuine stream-stream join (both sides
    watermarked, availableNow, append memory sink) and return the
    materialized pairs.  State bound: clicks are dropped once the
    purchase-side watermark passes ``click_ts + horizon``."""
    from .events import events_stream, run_to_memory

    stream = events_stream(spark, events_path)
    clicks = stream.filter(F.col("event_type") == "click").withWatermark(
        "ts", watermark
    )
    purchases = stream.filter(F.col("event_type") == "purchase").withWatermark(
        "ts", watermark
    )
    out = attribution_pairs(clicks, purchases, horizon_seconds).select(
        "purchase_id",
        "user_id",
        F.col("purchase_ts").cast("string").alias("purchase_ts"),
        "click_id",
    )
    return run_to_memory(out, "events_attribution_stream", "append")
