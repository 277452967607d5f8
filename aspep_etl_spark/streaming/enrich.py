"""[EXT] Stream-static enrichment and the foreachBatch CDC-upsert sink
(SURVEY.md §2.9 extensions — the reference pipeline is batch-only,
``process_aspep/assets.py``; these are the two streaming building blocks a
production incremental pipeline needs beyond windowed aggregation).

Stream-static join
------------------
Joining a micro-batch stream against a slowly-changing dimension is the
canonical enrichment shape.  Spark re-plans the static side per
micro-batch, so a small dimension rides as a broadcast hash join — the
stream side never shuffles.  The same function body serves the batch twin
(hand it two batch frames), which is what the DuckDB oracle checks.

foreachBatch upsert sink
------------------------
Streaming CDC (latest-wins merge into a keyed store) cannot be expressed
as a plain ``writeStream`` append — it needs per-batch MERGE semantics.
``foreachBatch`` hands each micro-batch to batch code, where the engine's
``upsert_latest`` (one keyed window, union-by-name) merges into the
store.  Idempotence under micro-batch REPLAY (checkpoint recovery
re-delivers the last batch) comes from latest-wins by (key, order_col)
being insensitive to duplicate delivery — merging the same updates twice
is a no-op.  With Delta/Iceberg the inner merge becomes the table
format's native ``MERGE INTO``; the pure-parquet store rewrite here keeps
the same call shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.setops import upsert_latest


def enrich_with_dim(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    broadcast_dim: bool = True,
    how: str = "left",
) -> DataFrame:
    """Stream-static (or batch-batch) dimension enrichment.

    ``dim`` must be a STATIC frame (re-read per micro-batch by the
    streaming engine — this is how slowly-changing dims refresh without
    restarting the query).  ``broadcast_dim`` pins the broadcast-hash
    plan; disable only for dimension tables too large to broadcast, which
    at streaming enrichment scale usually means the design is wrong
    (pre-aggregate the dim instead)."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on, how)


def run_stream_upsert(
    spark,
    updates_path: str,
    store_path: str,
    keys: list[str],
    order_col: str,
    checkpoint_dir: str,
    tiebreak_cols: list[str] | None = None,
    max_files_per_trigger: int | None = None,
) -> None:
    """Apply a parquet-directory CDC feed to a keyed parquet store via
    ``foreachBatch`` + ``upsert_latest``, bounded with
    ``Trigger.AvailableNow`` (the catch-up/backfill production pattern —
    a live feed would run the same query without the trigger).

    Each batch: read current store (empty-safe), latest-wins merge, write
    back atomically-enough for a single writer (overwrite).  At lake
    scale swap the inner body for ``MERGE INTO`` on a real table format —
    the streaming plumbing (checkpoint, trigger, batch handoff) is
    unchanged.
    """
    import os

    static = spark.read.parquet(updates_path)
    reader = spark.readStream.schema(static.schema)
    if max_files_per_trigger is not None:
        # AvailableNow honors read limits since Spark 3.3 — this splits the
        # backfill into several micro-batches, exercising repeated merges.
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(updates_path)

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        if os.path.isdir(store_path) and any(
            f.endswith(".parquet") for f in os.listdir(store_path)
        ):
            base = s.read.parquet(store_path)
        else:
            base = s.createDataFrame([], batch.schema)
        merged = upsert_latest(base, batch, keys, order_col, tiebreak_cols)
        # Write to a scratch dir first, THEN swap directories: overwriting
        # the path a lazy plan is still reading from is a data race, and
        # collecting the store through the driver would not survive scale.
        import shutil

        tmp = f"{store_path}__staging"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.isdir(store_path):
            shutil.rmtree(store_path)
        os.replace(tmp, store_path)

    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
