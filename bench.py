#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Each query executes to completion through the noop sink (full distributed
compute, no driver-side collect) and is timed wall-clock.

Methodology: one untimed warmup pass over the query list, then TWO timed
passes with the per-query MINIMUM reported (standard benchmark-harness
practice, cf. JMH / spark-sql-perf).  The warmup amortizes first-touch
costs that are environment noise, not plan cost — Python worker spawn,
Arrow init, parquet footer reads on a cold page cache, codegen
compilation — which on a cold VM can dominate the first execution of a
query by 3-4× (measured: the mapInPandas pipeline query runs 14.9s cold /
3.5s steady-state on a freshly booted host).  The min-of-passes collapses
the remaining single-observation noise (GC pauses, JIT recompilation —
measured up to 3× between identical back-to-back runs of the same
warm query); ``warmup: true`` + ``passes: 2`` mark the methodology in
the output line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the flagship + one representative per operator family.
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_revenue",
    "flagship_ratio_rank",
    "a1_grouped_median",
    "a1_grouped_median_approx",
    "w1_lag_deltas",
    "w3_rank_null_parity",
    "events_sessionize",
    "dedup_ngram_jaccard",
    "text_quality",
    "ann_cosine_topk",
    "aspep_extended_pipeline",
    "docs_classifier_score",
]

# Queries added to the headline set after round 3 — excluded from the
# like-for-like r3_queryset_total subtotal.
_POST_R3_QUERIES = {"a1_grouped_median_approx", "docs_classifier_score"}


def main() -> None:
    from aspep_etl_spark.cache import free_cached_blocks
    from aspep_etl_spark.plans.contract import SPARK_QUERIES
    from aspep_etl_spark.session import get_spark

    # 128 MB input splits (the engine default) are right for cluster-scale
    # scans but leave a ~25 MB local bench file as one task; small splits
    # let local[N] parallelize the scan stage.
    spark = get_spark(
        app_name="aspep-etl-spark-bench",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": os.environ.get(
                "SPARK_GRAFT_MAX_PARTITION_BYTES", "8m"
            ),
            "spark.sql.files.openCostInBytes": "1m",
        },
    )
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    timings: dict[str, float] = {}

    # Untimed warmup pass: absorbs Python-worker spawn, Arrow/codegen init
    # and cold-page-cache parquet reads so the timed pass measures plans.
    for name in BENCH_QUERIES:
        SPARK_QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        free_cached_blocks(spark)

    n_passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))
    for _ in range(n_passes):
        for name in BENCH_QUERIES:
            t0 = time.time()
            SPARK_QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)
            free_cached_blocks(spark)

    total = round(sum(timings.values()), 3)
    # like-for-like vs rounds ≤3: a1_grouped_median_approx was ADDED to the
    # headline set in r4, so the raw total is not comparable across rounds —
    # this subtotal is the r3 query set under the current code
    r3_subtotal = round(
        sum(v for k, v in timings.items() if k not in _POST_R3_QUERIES), 3
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "r3_queryset_total": r3_subtotal,
                "warmup": True,
                "passes": n_passes,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
