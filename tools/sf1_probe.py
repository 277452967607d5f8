#!/usr/bin/env python
"""Incremental per-query prober for the sf1 dress rehearsal: times each
named contract query at $SPARK_GRAFT_SF_DIR, printing as it goes (so a
pathological query is identified by the last line, not a silent hang).
"""
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aspep_etl_spark.session import get_spark  # noqa: E402
from aspep_etl_spark.plans.contract import SPARK_QUERIES  # noqa: E402
from aspep_etl_spark.cache import free_cached_blocks  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/.localdata/sf1")

spark = get_spark(
    app_name="sf1-probe",
    extra_conf={
        "spark.sql.files.maxPartitionBytes": "16m",
        "spark.sql.files.openCostInBytes": "1m",
    },
)
for name in sys.argv[1:]:
    t0 = time.time()
    try:
        SPARK_QUERIES[name](spark, SF).write.format("noop").mode("overwrite").save()
        print(f"TIMING {name} {time.time()-t0:.2f}s", flush=True)
    except Exception as ex:
        print(f"FAIL {name} {time.time()-t0:.2f}s :: {str(ex)[:400]}", flush=True)
    free_cached_blocks(spark)
spark.stop()
