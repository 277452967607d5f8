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


#: The canonical table set (TESTDATA.md); `register_views` publishes these.
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


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


def register_views(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> list[str]:
    """Publish the canonical tables as temp views so users run plain
    ``spark.sql("SELECT ... FROM lineitem JOIN orders ...")`` — the same
    names the DuckDB oracle layer uses, with the events-timestamp wrinkle
    already normalized.  Views are lazy: registering all ten costs only
    parquet footer reads.  Returns the registered names.

    Missing files are skipped (a user may materialize a subset), so this
    also works on a directory holding only e.g. ``documents``/
    ``embeddings`` for the LLM-curation surface."""
    import os

    done: list[str] = []
    for name in tables or TABLES:
        if not os.path.exists(f"{sf_dir}/{name}.parquet"):
            continue
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
        done.append(name)
    return done
