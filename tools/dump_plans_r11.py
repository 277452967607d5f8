#!/usr/bin/env python
"""Dump per-query `explain("formatted")` files for the optimization round.

Usage: python tools/dump_plans_r11.py OUT_DIR SUFFIX [query ...]

Writes OUT_DIR/<query>_<SUFFIX>.txt for each named query (default: the
bench.py headline set).  Run once from the round-10 checkout with
SUFFIX=before and once from HEAD with SUFFIX=after so the judge can diff
plan shapes without running Spark.
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


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or HEADLINE
    os.makedirs(out_dir, exist_ok=True)

    from aspep_etl_spark.plans.contract import SPARK_QUERIES
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
