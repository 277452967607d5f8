#!/usr/bin/env python
"""Dump per-query `explain("formatted")` files for the optimization round.

Usage: python tools/dump_plans_r12.py [--vanilla] OUT_DIR SUFFIX [query ...]

Writes OUT_DIR/<query>_<SUFFIX>.txt for each named query (default: the
bench.py headline set).  Run once from the previous round's checkout with
SUFFIX=before and once from HEAD with SUFFIX=after so the judge can diff
plan shapes without running Spark.

Session caveat (r11 ADVICE): by default plans are dumped under
``get_spark``'s tuned session (64 MB broadcast threshold, AQE advisory
sizes), NOT the vanilla SparkSession the driver uses — fine for
before/after diffing (both arms use the same session), but join
strategies can differ from driver-session plans.  Pass ``--vanilla`` to
dump under a bare ``SparkSession.builder.getOrCreate()`` for
driver-faithful shapes.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_revenue",
    "flagship_ratio_rank",
    "a1_grouped_median",
    "a1_grouped_median_sketch",
    "w1_lag_deltas",
    "w3_rank_null_parity",
    "events_sessionize",
    "dedup_ngram_jaccard",
    "text_quality",
    "ann_cosine_topk",
    "aspep_extended_pipeline",
    "docs_classifier_score",
    "dedup_embedding_cosine",
    "docs_dsir_weights",
    "docs_nb_crossval_capped",
]

USAGE = "usage: python tools/dump_plans_r12.py [--vanilla] OUT_DIR SUFFIX [query ...]"


def main() -> None:
    args = sys.argv[1:]
    vanilla = "--vanilla" in args
    if vanilla:
        args.remove("--vanilla")
    if len(args) < 2:
        print(USAGE, file=sys.stderr)
        sys.exit(2)
    out_dir, suffix = args[0], args[1]
    names = args[2:] or HEADLINE

    from aspep_etl_spark.plans.contract import SPARK_QUERIES

    unknown = [n for n in names if n not in SPARK_QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}\n{USAGE}", file=sys.stderr)
        sys.exit(2)

    os.makedirs(out_dir, exist_ok=True)
    if vanilla:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.appName(f"dump-plans-{suffix}").getOrCreate()
    else:
        from aspep_etl_spark.session import get_spark

        spark = get_spark(app_name=f"dump-plans-{suffix}")
    for name in names:
        df = SPARK_QUERIES[name](spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue().rstrip() + "\n")
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
