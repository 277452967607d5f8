"""Testdata table loaders (TESTDATA.md tables; driver contract
__spark_entry__.py — every queries() entry reads through here).

Handles the one parquet physical-type wrinkle in the driver's data: the
``events`` table stores ``ts`` as INT64 TIMESTAMP(NANOS), which Spark 4
refuses outright ([PARQUET_TYPE_ILLEGAL]).  The loader flips the session to
``nanosAsLong`` and rebuilds a microsecond TIMESTAMP with **integer**
division — nanosecond epochs (~1.7e18) exceed 2^53, so a double-division
round-trip would corrupt timestamps by whole microseconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    if name != "events":
        return spark.read.parquet(path)

    # Runtime-settable SQL conf; also works when the caller (the driver)
    # built its own SparkSession without this flag.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
