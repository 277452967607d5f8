"""Session-level cached-block bookkeeping.

Spark frees persisted/localCheckpointed RDD blocks through the async
ContextCleaner only after the JVM garbage-collects the owning Dataset —
which can lag arbitrarily behind the Python driver.  Operators that
persist reused subtrees (n-gram posting lists, per-round component
labels) therefore leave blocks behind that steal executor storage memory
from later queries in the same session (measured on the bench harness:
an untouched mapInPandas query degrades 3.6s → 10.9s after 11 uncleaned
queries).  These helpers make block lifetime explicit:

- ``persistent_rdd_ids`` / ``unpersist_rdds``: surgical bookkeeping for
  iterative operators that supersede their own checkpoints round by
  round (see ``operators/components.py``);
- ``free_cached_blocks``: whole-session sweep for harnesses and
  notebooks where each query is an independent job.

Driver-side metadata only — no job is launched; ``unpersist`` is async
(non-blocking) so the executor-side drop overlaps the next job.  The
id-set snapshots assume a single driver thread creating persisted RDDs
(true for this engine's operators); concurrent sessions sharing a
SparkContext should use their own bookkeeping.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def persistent_rdd_ids(spark: SparkSession) -> set[int]:
    """Ids of every RDD currently registered with storage in this context
    (persisted or localCheckpointed)."""
    return {int(k) for k in spark.sparkContext._jsc.getPersistentRDDs().keys()}


def unpersist_rdds(
    spark: SparkSession, ids: set[int], blocking: bool = False
) -> int:
    """Unpersist exactly the RDDs in ``ids``; returns how many were found.

    Used by iterative operators to free a superseded round's checkpoint
    blocks as soon as the next round is materialized, instead of letting
    O(rounds) label frames pile up until the JVM gets around to GC."""
    n = 0
    for rid, rdd in list(spark.sparkContext._jsc.getPersistentRDDs().items()):
        if int(rid) in ids:
            rdd.unpersist(blocking)
            n += 1
    return n


def free_cached_blocks(spark: SparkSession) -> int:
    """Unpersist every lingering RDD and clear the SQL cache; returns how
    many RDDs were dropped.

    Harness/notebook hygiene between independent jobs — NOT for use while
    a returned DataFrame still depends on its checkpoint blocks (a
    localCheckpointed frame has no lineage to recompute from; consume it
    before sweeping)."""
    import gc

    gc.collect()  # drop py4j refs so the JVM side is collectable
    n = 0
    for _rid, rdd in list(spark.sparkContext._jsc.getPersistentRDDs().items()):
        rdd.unpersist(False)
        n += 1
    spark.catalog.clearCache()
    return n
