"""[EXT] Streaming sketch maintenance: keep a Count-Min sketch current
as micro-batches arrive.

The CMS relation (``operators/sketch.py``) is algebraically mergeable —
union + sum IS the merge — which makes streaming maintenance a
``foreachBatch`` one-liner: sketch the batch, union with the stored
sketch, re-aggregate, swap.  State is bounded at depth × width counters
FOREVER, whatever the stream's key cardinality — the property that makes
sketches the right tool for heavy-hitter monitoring on unbounded
streams (an exact groupBy's state grows without bound).

The equality the tests pin is exact, not approximate: because the merge
is algebraic, the sketch after N micro-batches equals the sketch built
from the same rows in one batch, bit for bit.  (Same verification
pattern as the other availableNow-vs-batch twins in this package.)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from ..operators.sketch import cms_build


def run_streaming_cms(
    spark,
    events_path: str,
    store_path: str,
    key_col: str,
    checkpoint_dir: str,
    depth: int = 4,
    width: int = 256,
    max_files_per_trigger: int | None = None,
) -> None:
    """Maintain a CMS parquet store over a parquet event feed with
    ``Trigger.AvailableNow`` (catch-up pattern; a live feed runs the same
    query untriggered).  Each batch: sketch the new rows, merge with the
    stored sketch by union + sum, atomically swap the store directory —
    the same scratch-then-swap discipline as ``run_stream_upsert``."""
    # Generic parquet feed reader (the sketch needs no timestamp
    # normalization, so this does not route through events_stream):
    # static schema, single-file paths via parent-dir glob, optional
    # read limit so availableNow splits into several micro-batches.
    static = spark.read.parquet(events_path)
    reader = spark.readStream.schema(static.schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if os.path.isfile(events_path):
        reader = reader.option("pathGlobFilter", os.path.basename(events_path))
        stream = reader.parquet(os.path.dirname(events_path))
    else:
        stream = reader.parquet(events_path)

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        delta = cms_build(batch, key_col, depth, width)
        if os.path.isdir(store_path) and any(
            f.endswith(".parquet") for f in os.listdir(store_path)
        ):
            base = s.read.parquet(store_path)
            merged = (
                base.unionByName(delta)
                .groupBy("d", "bucket")
                .sum("cnt")
                .withColumnRenamed("sum(cnt)", "cnt")
            )
        else:
            merged = delta
        scratch = store_path.rstrip("/") + ".staging"
        merged.write.mode("overwrite").parquet(scratch)
        final = s.read.parquet(scratch)
        final.write.mode("overwrite").parquet(store_path)

    (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
