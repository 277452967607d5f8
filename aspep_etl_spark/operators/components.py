"""[EXT] Connected components over a pair/edge table — the clustering step
after near-dup pair generation (dedup.py): every document in a component is
a duplicate-family member and one survivor per component is kept.

Scale design
------------
Iterative min-label propagation in DataFrame ops (no GraphX/graphframes
dependency).  Each round:

1. neighbor-min: every node takes the minimum label among itself and its
   direct neighbors — one shuffle on the edge join;
2. pointer-jump: every node then takes its LABEL's label
   (``label = label_of(label)``) — the classic shortcut that collapses
   chains, giving O(log diameter) convergence instead of O(diameter)
   (Kiveris et al., "Connected Components in MapReduce and Beyond",
   SoCC'14 — the large-star/small-star family).

Each round ends in an eager ``localCheckpoint`` of the label frame: that
single materialization both TRUNCATES LINEAGE (a bare ``persist`` leaves
the logical plan growing join-on-derived-self per iteration — analysis
time compounds superlinearly on deep graphs) and serves as the
convergence action (the changed-flag is computed inside the round and
probed with a ``limit(1).count()`` on the already-materialized frame, so
there is no extra per-round join).  The loop is in the driver but ALL
data movement is distributed joins.

Block lifetime: once a round's checkpoint is materialized, the previous
round's blocks are dead weight — they are freed eagerly via
``cache.unpersist_rdds`` instead of waiting on the async ContextCleaner,
so peak storage is 2 label frames regardless of round count.  The FINAL
label frame's blocks stay alive deliberately: a localCheckpointed frame
has no lineage to recompute from, so the returned DataFrame depends on
them until the caller consumes it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..cache import persistent_rdd_ids, unpersist_rdds


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 25,
) -> DataFrame:
    """Label every node reachable through ``pairs`` with the minimum node
    id of its component.  Output: ``(node, component)``, one row per
    distinct node appearing in any pair.

    Deterministic: component labels are min-ids, independent of execution
    order.  Raises if the fixpoint is not reached in ``max_iters`` rounds
    (pointer-jumping makes that ~log2(longest chain), so 25 covers any
    realistic graph).
    """
    spark = pairs.sparkSession
    # the src/dst union reads `pairs` TWICE — persist it so an expensive
    # upstream (e.g. the blocked-linkage candidate plan feeding
    # linkage_entity_clusters) evaluates once; released in the finally
    # alongside edges
    pairs = pairs.persist()
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .persist()
    )
    before = persistent_rdd_ids(spark)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    labels_ids = persistent_rdd_ids(spark) - before
    try:
        for _ in range(max_iters):
            # 1) neighbor-min: min(component) over {self} ∪ neighbors
            neigh = (
                edges.join(labels, edges.dst == labels.node)
                .groupBy("src")
                .agg(F.min("component").alias("__nc"))
            )
            stepped = labels.join(neigh, labels.node == neigh.src, "left").select(
                "node",
                F.col("component").alias("__old"),
                F.least(
                    F.col("component"), F.coalesce(F.col("__nc"), F.col("component"))
                ).alias("component"),
            )
            # 2) pointer-jump: component = component-of(component); the
            # changed-flag rides along so convergence needs no extra join
            lookup = stepped.select(
                F.col("node").alias("__ln"), F.col("component").alias("__lc")
            )
            before = persistent_rdd_ids(spark)
            jumped = (
                stepped.join(lookup, stepped.component == F.col("__ln"), "left")
                .select(
                    "node",
                    F.coalesce(F.col("__lc"), F.col("component")).alias("component"),
                    (
                        F.coalesce(F.col("__lc"), F.col("component"))
                        != F.col("__old")
                    ).alias("__chg"),
                )
                .localCheckpoint()  # eager: materializes AND truncates lineage
            )
            new_ids = persistent_rdd_ids(spark) - before
            changed = jumped.filter(F.col("__chg")).limit(1).count()
            # the superseded round's blocks are dead once `jumped` is
            # materialized — free them now, don't wait for JVM GC
            unpersist_rdds(spark, labels_ids)
            labels_ids = new_ids
            labels = jumped.select("node", "component")
            if changed == 0:
                return labels
        raise RuntimeError(f"connected_components did not converge in {max_iters} rounds")
    finally:
        edges.unpersist()
        pairs.unpersist()
