"""[EXT] Bucketed interval (range) join — point-in-interval matching
without a nested-loop join.

The naive ``points JOIN intervals ON ts BETWEEN start AND end`` compiles
to BroadcastNestedLoopJoin (fine for a handful of intervals, quadratic
disaster otherwise).  This operator makes the join EQUI-joinable: every
interval is exploded to the coarse time buckets it covers, every point
maps to exactly one bucket, and the band predicate is applied after the
bucket equi-join.  Each (point, interval) pair meets in exactly one
bucket — the point's own — so no dedup pass is needed.

Scale: one shuffle on ``__bucket`` for the points (or zero if the
exploded interval side broadcasts); interval explosion is
``(end-start)/bucket_width`` rows per interval, so pick a width near the
typical interval length.  This is the standard bucketed range-join
strategy (what Databricks' range-join hints and KDB's window joins do).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_width_s: int = 86_400,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= ts < end``.  All of ``points``' and ``intervals``' columns
    survive (names must not collide).  ``bucket_width_s`` is the coarse
    bucket size in seconds."""
    w = F.lit(bucket_width_s)
    ib = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / w).cast("long"),
                F.floor(F.unix_timestamp(F.col(end_col)) / w).cast("long"),
            )
        ),
    )
    pb = points.withColumn(
        "__bucket", F.floor(F.unix_timestamp(F.col(ts_col)) / w).cast("long")
    )
    # the band predicate rides IN the join condition (not a post-filter),
    # so how="left" keeps unmatched points with null interval columns
    cond = (
        (pb["__bucket"] == ib["__bucket"])
        & (pb[ts_col] >= ib[start_col])
        & (pb[ts_col] < ib[end_col])
    )
    return pb.join(ib, cond, how).drop("__bucket")
