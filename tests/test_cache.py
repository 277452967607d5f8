"""cache.py block bookkeeping: surgical frees hit only their targets, the
session sweep clears everything, and a swept localCheckpoint frame is the
documented footgun (no lineage to recompute from)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aspep_etl_spark.cache import (
    free_cached_blocks,
    persistent_rdd_ids,
    unpersist_rdds,
)


def test_surgical_unpersist_frees_only_targets(spark):
    free_cached_blocks(spark)
    a = spark.range(100).persist()
    a.count()
    ids_a = persistent_rdd_ids(spark)
    b = spark.range(200).persist()
    b.count()
    ids_b = persistent_rdd_ids(spark) - ids_a
    assert ids_b and ids_a

    freed = unpersist_rdds(spark, ids_b)
    assert freed == len(ids_b)
    remaining = persistent_rdd_ids(spark)
    assert remaining == ids_a  # a untouched, b gone
    assert a.count() == 100
    free_cached_blocks(spark)


def test_session_sweep_clears_everything_and_reports_count(spark):
    free_cached_blocks(spark)
    spark.range(10).persist().count()
    df = spark.range(20).withColumn("x", F.col("id") * 2).localCheckpoint()
    assert df.count() == 20
    assert len(persistent_rdd_ids(spark)) >= 2
    n = free_cached_blocks(spark)
    assert n >= 2
    assert persistent_rdd_ids(spark) == set()


def test_operators_leave_bounded_blocks(spark, sf_dir):
    """connected_components frees superseded rounds internally: after
    consuming its output, at most the final label frame (plus nothing
    else) remains registered."""
    free_cached_blocks(spark)
    from aspep_etl_spark.operators.components import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(20)] + [(100, 101)], "id_a: long, id_b: long"
    )
    out = connected_components(pairs)
    assert out.count() == 23  # 21-node chain + 2-node island
    assert len(persistent_rdd_ids(spark)) <= 1
    free_cached_blocks(spark)
