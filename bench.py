#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Each query executes to completion through the noop sink (full distributed
compute, no driver-side collect) and is timed wall-clock.
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
    "w1_lag_deltas",
    "w3_rank_null_parity",
    "events_sessionize",
    "dedup_ngram_jaccard",
    "text_quality",
    "ann_cosine_topk",
    "aspep_extended_pipeline",
]


def main() -> None:
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

    # Warm the JVM/codegen once so per-query numbers measure the plans.
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()

    for name in BENCH_QUERIES:
        t0 = time.time()
        SPARK_QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
