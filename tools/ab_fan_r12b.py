#!/usr/bin/env python
"""Interleaved env-toggle A/B of the adaptive scan fan on the two r12b
tier adoptions (docs_nb_crossval, docs_logreg_train) at
``$SPARK_GRAFT_SF_DIR`` — same methodology as the r12 fan A/Bs (PERF.md
"adaptive scan fan-out ADOPTED"): one session, arms alternated per pass
via ``$SPARK_GRAFT_FAN_MIN_BYTES`` (huge = fan off, default = on), noop
sink, cached blocks freed after every run, min-of-passes per arm
reported with the full observation arrays.

Usage: SPARK_GRAFT_SF_DIR=.localdata/sf1 python tools/ab_fan_r12b.py \
           [passes] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", ".localdata/sf1")
PASSES = int(sys.argv[1]) if len(sys.argv) > 1 else 6
QUERIES = sys.argv[2:] or ["docs_nb_crossval", "docs_logreg_train"]

OFF = "999999999999"


def main() -> None:
    from aspep_etl_spark.cache import free_cached_blocks
    from aspep_etl_spark.plans.contract import SPARK_QUERIES
    from aspep_etl_spark.session import get_spark

    spark = get_spark(
        app_name="ab-fan-r12b",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "8m",
            "spark.sql.files.openCostInBytes": "1m",
        },
    )
    obs: dict[str, dict[str, list[float]]] = {
        q: {"off": [], "on": []} for q in QUERIES
    }
    # warmup: one run per arm per query (JIT/codegen)
    for arm in ("off", "on"):
        os.environ["SPARK_GRAFT_FAN_MIN_BYTES"] = OFF if arm == "off" else "2097152"
        for q in QUERIES:
            SPARK_QUERIES[q](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            free_cached_blocks(spark)
    for p in range(PASSES):
        for arm in ("off", "on") if p % 2 == 0 else ("on", "off"):
            os.environ["SPARK_GRAFT_FAN_MIN_BYTES"] = (
                OFF if arm == "off" else "2097152"
            )
            for q in QUERIES:
                spark.sparkContext.setJobDescription(f"ab:{q}:{arm}:{p}")
                t0 = time.time()
                SPARK_QUERIES[q](spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                obs[q][arm].append(round(time.time() - t0, 3))
                free_cached_blocks(spark)
    out = {
        q: {
            "off_min": min(o["off"]),
            "on_min": min(o["on"]),
            "speedup": round(min(o["off"]) / min(o["on"]), 2),
            "off": o["off"],
            "on": o["on"],
        }
        for q, o in obs.items()
    }
    out["sf_dir"] = SF_DIR
    out["loadavg"] = open("/proc/loadavg").read().split()[:3]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
