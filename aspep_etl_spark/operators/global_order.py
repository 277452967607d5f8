"""[EXT] Distributed total-order primitives — global row number and
global running sum WITHOUT a single-partition window.

A partition-less ``Window.orderBy`` (the natural Spark spelling of
NTILE / cumulative share) funnels the whole input through ONE task —
the last scale-killer shape the r4 verdict flagged in the registry
(`customer_rfm_segments`, `customer_abc_analysis`,
`orders_price_deciles`).  These helpers replace it with the classic
two-pass distributed prefix scheme (the same shape as
``RDD.zipWithIndex``, re-expressed on the DataFrame API):

1. ``repartitionByRange`` on the total-order key — a parallel
   distributed sort; the range partitioner guarantees partition ``i``
   holds keys strictly before partition ``i+1`` in the requested order.
2. One tiny per-partition aggregate (count / sum) whose result is
   collected — bounded by the partition count, NOT the data (a
   documented driver scalar, like the pagerank degree normalizer at
   ``operators/pagerank.py:70``), and prefix-scanned on the driver.
3. A per-partition window (partitioned by ``spark_partition_id()``)
   adds the local rank / running sum to the broadcast partition offset.

Every stage is parallel: the widest shuffle is the range exchange
itself, the per-partition window never sees more than one partition's
rows, and the only driver materialization is #partitions rows.  The
results are EXACT — identical to the single-partition window — so the
scaled queries reuse the same DuckDB oracles as their exact twins.

Determinism: ``spark_partition_id()`` is pinned by persisting the
range-partitioned frame before the offsets job, so the offset pass and
the rank pass observe the same physical layout (and the range
partitioner's reservoir sampling is itself seed-deterministic for a
deterministic input, so even a cache-evicted recompute re-derives the
same boundaries).  Exactness of the running sum additionally requires
an associativity-safe value type — pass DECIMAL, not DOUBLE, when the
result must be invariant to the partition split (see
``customer_abc_analysis_scaled``).

Reference parity note: the reference engine has no global-rank
operator; these exist so the engine's OWN analytics layer
(`plans/analytics_extra.py`) has no single-partition sort anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

_PID = "__go_pid"


def _ranged(df: DataFrame, order_cols: list[Column], num_partitions: int | None):
    n = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    ranged = (
        df.repartitionByRange(n, *order_cols)
        .withColumn(_PID, F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    return ranged


def _offsets_df(ranged: DataFrame, per_part: DataFrame):
    """Prefix-scan the (pid, measure) rows on the driver (≤ #partitions
    rows — a bounded driver scalar) into a (pid, offset) frame typed
    like the measure itself (so DECIMAL stays DECIMAL)."""
    from pyspark.sql import types as T

    rows = sorted(per_part.collect(), key=lambda r: r[0])
    measure_type = per_part.schema[1].dataType
    acc = None
    out = []
    for pid, val in rows:
        out.append((pid, acc))
        acc = val if acc is None else acc + val
    schema = T.StructType(
        [
            T.StructField(_PID, T.IntegerType()),
            T.StructField("__go_offset", measure_type),
        ]
    )
    spark = per_part.sparkSession
    return spark.createDataFrame(out, schema), acc


def global_row_number(
    df: DataFrame,
    order_cols: list[Column],
    rank_col: str = "__rank",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Exact 1-based global row number over ``order_cols`` (Columns,
    including ``.desc()`` forms — the order must be a total order, i.e.
    include a unique tie-break key).  Returns ``(df, total_rows)`` —
    the total is already a driver scalar from the offsets pass, so
    NTILE-style bucket math needs no extra job."""
    ranged = _ranged(df, order_cols, num_partitions)
    per_part = ranged.groupBy(_PID).agg(F.count("*").alias("__n"))
    offsets, total = _offsets_df(ranged, per_part)
    w = Window.partitionBy(_PID).orderBy(*order_cols)
    out = (
        ranged.join(F.broadcast(offsets), _PID, "left")
        .withColumn(
            rank_col,
            F.row_number().over(w)
            + F.coalesce(F.col("__go_offset"), F.lit(0)).cast("long"),
        )
        .drop(_PID, "__go_offset")
    )
    return out, int(total or 0)


def ntile_expr(rank_col: str, n_rows: int, k: int) -> Column:
    """ANSI NTILE(k) bucket from an exact global rank column: the first
    ``n mod k`` buckets get ``ceil(n/k)`` rows.  Pure INTEGER arithmetic
    (``DIV``, never float division — float ceil goes off-by-one when a
    2^50-scale quotient rounds across an integer), so it reproduces
    ``ntile() OVER (ORDER BY ...)`` bit-for-bit on every engine."""
    q, r = divmod(int(n_rows), k)
    big, qq = q + 1, max(q, 1)
    cut = r * big  # ranks 1..cut live in the r larger buckets
    return F.expr(
        f"CAST(CASE WHEN {rank_col} <= {cut} "
        f"THEN ({rank_col} + {big - 1}) DIV {big} "
        f"ELSE {r} + (({rank_col} - {cut}) + {qq - 1}) DIV {qq} END AS INT)"
    )


def global_running_sum(
    df: DataFrame,
    order_cols: list[Column],
    value_col: str,
    out_col: str = "__running",
    num_partitions: int | None = None,
):
    """Exact inclusive running sum of ``value_col`` in the total order
    ``order_cols``.  For bit-exact invariance to the partition split,
    ``value_col`` should be DECIMAL (associative); a DOUBLE column
    would pick up partition-boundary association differences.  Returns
    ``(df, grand_total)`` — the total is a driver scalar from the
    offsets pass (Decimal for DECIMAL inputs)."""
    ranged = _ranged(df, order_cols, num_partitions)
    per_part = ranged.groupBy(_PID).agg(F.sum(value_col).alias("__s"))
    offsets, total = _offsets_df(ranged, per_part)
    sum_type = per_part.schema[1].dataType
    w = (
        Window.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    zero = F.lit(0).cast(sum_type)
    out = (
        ranged.join(F.broadcast(offsets), _PID, "left")
        .withColumn(
            out_col,
            F.sum(value_col).over(w) + F.coalesce(F.col("__go_offset"), zero),
        )
        .drop(_PID, "__go_offset")
    )
    return out, total


def global_running_max(
    df: DataFrame,
    order_cols: list[Column],
    value_col: str,
    out_col: str = "__running_max",
    num_partitions: int | None = None,
    exclusive: bool = True,
) -> DataFrame:
    """Exact running MAX of ``value_col`` in the total order
    ``order_cols`` — same two-pass distributed prefix scheme as
    ``global_running_sum`` (max is associative AND commutative, so
    unlike the sum there is no DECIMAL caveat: the result is invariant
    to the partition split for any type).  ``exclusive=True`` (the
    default) computes the max over STRICTLY PRECEDING rows — the shape
    dominance tests need (``plans/analytics_extra.orders_pareto_frontier``);
    the first row's value is NULL.  Single extra job: the ≤ #partitions
    per-partition maxima collected and prefix-scanned on the driver."""
    ranged = _ranged(df, order_cols, num_partitions)
    per_part = ranged.groupBy(_PID).agg(F.max(value_col).alias("__m"))
    from pyspark.sql import types as T

    rows = sorted(per_part.collect(), key=lambda r: r[0])
    acc = None
    out_rows = []
    for pid, val in rows:
        out_rows.append((pid, acc))
        if val is not None:
            acc = val if acc is None else max(acc, val)
    schema = T.StructType(
        [
            T.StructField(_PID, T.IntegerType()),
            T.StructField("__go_prev_max", per_part.schema[1].dataType),
        ]
    )
    offsets = df.sparkSession.createDataFrame(out_rows, schema)
    w = (
        Window.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1 if exclusive else 0)
    )
    return (
        ranged.join(F.broadcast(offsets), _PID, "left")
        .withColumn(
            out_col, F.greatest(F.max(value_col).over(w), F.col("__go_prev_max"))
        )
        .drop(_PID, "__go_prev_max")
    )
