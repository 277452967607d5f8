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


#: Fan-out floor: below this compressed size the per-task overhead of the
#: extra exchange (shuffle fences, Python-worker batch setup, more tasks in
#: every downstream stage) outweighs the parallelism — measured at sf0.1
#: (594 KB documents): dsir fan +23%, classifier fan a wash, extended
#: pipeline fan +43%.  Env-overridable for other deployments.
_FAN_MIN_BYTES = 2 * 1024 * 1024


def fan_for_compute(df: DataFrame, path: str, min_bytes: int | None = None) -> DataFrame:
    """Scale-adaptive scan fan-out for compute-heavy single-pass consumers
    (guide §2.5 "input skew": a compact/unsplittable input whose derived
    per-row work is far heavier than its bytes).

    Parquet splits only at ROW-GROUP boundaries — a byte-split holding no
    row-group midpoint reads nothing — and this corpus's small files are
    single-row-group, so their scans are ONE effective task no matter how
    many byte splits the planner makes.  When (and only when) the scan is
    genuinely undersubscribed, redistribute rows round-robin across the
    session's cores so the regex/vector/Arrow work downstream runs at full
    parallelism.  Conditions (all must hold, else the plan is unchanged):

    - compressed input ≥ ``min_bytes`` (default 2 MB,
      ``$SPARK_GRAFT_FAN_MIN_BYTES``) — below it the exchange overhead wins
      (measured, see ``_FAN_MIN_BYTES``);
    - effective scan parallelism — min(byte splits, total parquet row
      groups; footers read only when the file count is small enough that
      the answer could still be "undersubscribed") — is under HALF the
      session's cores.  At 100 TB splits ≫ cores, so this is a no-op
      exactly where a payload shuffle would be a catastrophe.

    Round-robin ``repartition(n)`` is retry-safe (sort-before-repartition,
    SPARK-23207) and row-set-preserving; every caller aggregates or ranks
    downstream, so results are order-independent.
    """
    import os

    spark = df.sparkSession
    if min_bytes is None:
        min_bytes = int(
            os.environ.get("SPARK_GRAFT_FAN_MIN_BYTES", _FAN_MIN_BYTES)
        )
    try:
        files = (
            [path]
            if os.path.isfile(path)
            else [
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith(".parquet")
            ]
        )
        if sum(os.path.getsize(f) for f in files) < min_bytes:
            return df
        par = spark.sparkContext.defaultParallelism
        splits = df.rdd.getNumPartitions()
        eff = splits
        # row-group-aware refinement: only worth footer reads while the
        # file count alone doesn't already prove full subscription
        if len(files) * 2 <= par:
            import pyarrow.parquet as pq

            eff = min(
                splits,
                sum(pq.ParquetFile(f).metadata.num_row_groups for f in files),
            )
        if eff * 2 > par:
            return df
    except Exception:  # noqa: BLE001 — fan is an optimization, never a gate
        return df
    return df.repartition(par)


def load_table(
    spark: SparkSession, sf_dir: str, name: str, fan_compute: bool = False
) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    if name != "events":
        df = spark.read.parquet(path)
        return fan_for_compute(df, path) if fan_compute else df

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
    return fan_for_compute(df, path) if fan_compute else df


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
