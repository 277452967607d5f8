#!/usr/bin/env python
"""End-to-end demo: the LLM training-data curation pipeline over the
documents corpus — exact dedup → near-dup families → benchmark
decontamination → quality gate → PII redaction → train/val/test split —
with the stage funnel and the domain-mix table of the final train split.

Usage: python examples/run_llm_curation.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from aspep_etl_spark.plans.curation import curate_documents, llm_curation_funnel
    from aspep_etl_spark.plans.relational_extra import docs_domain_mix
    from aspep_etl_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="llm-curation")

    print("== curation funnel ==")
    llm_curation_funnel(spark, sf_dir).orderBy("stage").show(truncate=False)

    st = curate_documents(spark, sf_dir)
    print("== curated sample (train) ==")
    st["curated"].filter("split = 'train'").select(
        "doc_id", "lang", "split", "text"
    ).show(3, truncate=60)

    print("== domain mix (full corpus, for comparison) ==")
    docs_domain_mix(spark, sf_dir).orderBy("source", "lang").show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
