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
    # round-4 queries whose rounded float aggregates would be the first
    # casualties of partition-order summation (the driver's vanilla
    # session uses a different shuffle partition count than get_spark):
    "events_value_trend",         # regr_* moment sums
    "events_attribution_linear",  # sum of 1/n credits
    "docs_bigram_logprob",        # avg(log10) over shuffled rows
    "graph_pagerank",             # per-node rounded contribution sums
    "events_user_ewma",           # in-array fold — invariant by design
    "docs_classifier_score",      # in-array fold — invariant by design
    "events_gap_survival",        # integer counts + in-array prefix fold
    "events_kmv_distinct",        # k-min hash sets — order-free
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
