"""Testdata table loaders (TESTDATA.md tables; driver contract
__spark_entry__.py — every queries() entry reads through here).

Handles the parquet physical-type wrinkle in the driver's data: the
``events`` table has stored ``ts`` either as INT64 TIMESTAMP(NANOS) —
which Spark 4 refuses outright ([PARQUET_TYPE_ILLEGAL]) — or, in newer
generations, as TIMESTAMP(MICROS) with ``isAdjustedToUTC=false``, which
Spark reads as TIMESTAMP_NTZ (watermarks and several time functions
require plain TIMESTAMP).  The loader normalizes both to a microsecond
TIMESTAMP: the nanos path flips the session to ``nanosAsLong`` and
rebuilds with **integer** division (nanosecond epochs ~1.7e18 exceed
2^53, so a double-division round-trip would corrupt timestamps by whole
microseconds); the NTZ path casts, which in this UTC container maps
wall-clock to the identical instant DuckDB's naive TIMESTAMP shows.
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

    # Runtime-settable SQL confs; also works when the caller (the driver)
    # built its own SparkSession without these flags.  The UTC pin makes
    # the NTZ→LTZ cast (and every epoch-derived op downstream: cast to
    # long in sessionize, hourly window alignment) independent of the
    # host JVM zone, so the loader is self-sufficient rather than
    # relying on the container default being UTC.
    #
    # DELIBERATELY session-global and not restored: downstream
    # tz-sensitive ops (date_trunc, window alignment) are analyzed
    # LATER, under whatever tz the session then has — restoring the
    # previous zone here would realign them off the oracle contract.
    # UTC-pinned analytics sessions are this engine's convention
    # (session.py sets the same); callers needing another zone should
    # set it after loading and own the divergence.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(ts_type, T.TimestampNTZType):
        # Explicit LTZ type (not the "timestamp" alias, which resolves
        # through spark.sql.timestampType and becomes a no-op if a
        # caller session defaults to TIMESTAMP_NTZ).
        df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
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
