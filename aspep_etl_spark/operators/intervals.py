"""[EXT] Interval-overlap join with time-grid bucketing.

The missing third temporal-join shape next to the as-of join
(``operators/asof.py``, point-to-nearest) and the SCD2 join
(point-in-interval): INTERVAL × INTERVAL overlap.  A naive overlap
join is a range predicate Spark can only execute as a broadcast
nested loop or cartesian; the scale path here is the same grid trick
as the geo radius join (``operators/geo.py``) and the rolling-distinct
range join: explode each interval onto the fixed-width grid cells it
touches, equi-join on the cell, then verify the exact overlap
predicate and de-duplicate pairs that met in several cells.

Cell width trades fan-out (long intervals explode onto many cells)
against join selectivity (wide cells bucket unrelated intervals
together); pick it near the typical interval length.  Correctness is
width-independent — the contract oracle is the DIRECT range join, so
the gate itself proves the bucketing lossless, and the grid key is
also the natural storage partitioning for an interval lake at 100 TB.

Intervals are CLOSED [start, end] in integer units (the contract
query uses epoch microseconds end-to-end: all-integer arithmetic, no
timestamp edge cases across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    lstart: str,
    lend: str,
    rstart: str,
    rend: str,
    grid: int = 86_400_000_000,
) -> DataFrame:
    """All (left, right) row pairs whose closed intervals
    [lstart, lend] and [rstart, rend] overlap; column sets must be
    disjoint.  One equi-shuffle on the grid cell; pairs spanning
    several shared cells are de-duplicated."""
    lb = left.withColumn(
        "__cell",
        F.explode(F.expr(f"sequence({lstart} div {grid}, {lend} div {grid})")),
    )
    rb = right.withColumn(
        "__cell",
        F.explode(F.expr(f"sequence({rstart} div {grid}, {rend} div {grid})")),
    )
    return (
        lb.join(rb, "__cell")
        .filter((F.col(lstart) <= F.col(rend)) & (F.col(rstart) <= F.col(lend)))
        .drop("__cell")
        .distinct()
    )
