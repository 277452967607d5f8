"""Determinism under physical layout: the contract queries most exposed
to partition-order effects (window tie-breaks, hash sampling, iterative
centroids, merge survivors) must produce IDENTICAL results when the
shuffle partition count changes — at 1000 executors the layout is never
the same twice, so any layout sensitivity is a latent correctness bug."""

from __future__ import annotations

import pytest


QUERIES = [
    "sample_stratified",
    "docs_split",
    "orders_upsert_merge",
    "ann_ivf_topk",
    "w3_rank_null_parity",
    "user_modal_event",
    "events_debounce",
]


@pytest.mark.parametrize("name", QUERIES)
def test_layout_invariant(spark, sf_dir, name):
    from aspep_etl_spark.plans import contract

    fn = contract.SPARK_QUERIES[name]
    base = {tuple(r) for r in fn(spark, sf_dir).collect()}
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        relaid = {tuple(r) for r in fn(spark, sf_dir).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert relaid == base
