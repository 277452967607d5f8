"""Sinks: year-partitioned canonical store + JSON-array publisher."""

from __future__ import annotations

import gzip
import json
import os

from pyspark.sql import functions as F

from aspep_etl_spark.sinks import gzip_publish, write_canonical_store, write_json_array


def test_canonical_store_partition_pruning(spark, tmp_path):
    path = str(tmp_path / "store")
    df = spark.createDataFrame(
        [(1, 2003, "a"), (2, 2004, "b"), (3, 2004, "c")], ["id", "year", "v"]
    )
    write_canonical_store(df, path)
    assert sorted(p for p in os.listdir(path) if p.startswith("year=")) == [
        "year=2003",
        "year=2004",
    ]
    back = spark.read.parquet(path).filter(F.col("year") == 2004)
    assert back.count() == 2


def test_json_array_publisher(spark, tmp_path):
    path = str(tmp_path / "out" / "artifact.json")
    df = spark.createDataFrame(
        [("WI", 2017, 42327514.0), ("MO", 2024, float("nan"))],
        ["state_code", "year", "total_pay"],
    )
    write_json_array(df, path)
    with open(path) as f:
        data = json.load(f)
    assert data[0] == {"state_code": "WI", "year": 2017, "total_pay": 42327514.0}
    assert data[1]["total_pay"] is None  # NaN → null, strict JSON

    gz = gzip_publish(path)
    with gzip.open(gz) as f:
        assert json.load(f) == data
