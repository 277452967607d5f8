"""[EXT] Table profiling + Z-order layout keys — the storage/ops side of
running an engine over a 100 TB lake.

``table_profile`` is the one-scan column audit (null rate, cardinality,
bounds) every ingestion run should log; ``zorder_key`` computes the
bit-interleaved Morton code that makes multi-dimensional range queries
prune file-level min/max zones (the technique behind Delta OPTIMIZE
ZORDER / Iceberg sort orders) — here as a plain deterministic expression
usable with ``sortWithinPartitions``/``write.sortBy``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def table_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column profile in ONE scan: a single aggregate computes every
    column's null count, exact distinct count, and string-cast min/max,
    then a ``stack`` pivots to one audit row per column.  Cast numeric
    columns to a stable text form upstream (e.g. pre-round doubles) if
    cross-engine comparison matters."""
    aggs = []
    for c in cols:
        aggs += [
            # coalesce: SUM over zero rows is NULL; an empty table must
            # profile as 0 nulls, not null-propagate through the audit
            F.coalesce(
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)), F.lit(0)
            ).alias(f"__n_{c}"),
            F.count_distinct(F.col(c)).alias(f"__d_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__lo_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__hi_{c}"),
        ]
    one = df.agg(*aggs)
    stacked = " , ".join(
        f"'{c}', `__n_{c}`, `__d_{c}`, `__lo_{c}`, `__hi_{c}`" for c in cols
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stacked}) AS "
        f"(column, n_nulls, n_distinct, min_value, max_value)"
    ).select(
        "column",
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_value",
        "max_value",
    )


def _spread_bits_sql(expr: str) -> str:
    """SQL for the classic 16→32 bit spread (insert a 0 between every
    bit) — plain shifts/masks, identical text works in Spark and DuckDB."""
    s = expr
    for shift, mask in ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)):
        s = f"(({s} | ({s} << {shift})) & {mask})"
    return s


def zorder_key(x: str, y: str, bits: int = 16) -> Column:
    """Morton (Z-curve) interleave of two non-negative integer expressions
    truncated to ``bits`` bits each: nearby (x, y) points share zkey
    prefixes, so sorting a table by this column clusters multi-dimensional
    ranges into few contiguous zones.  Pure bit arithmetic — identical in
    any engine with shifts (the oracle twin uses the same generated SQL)."""
    if not 1 <= bits <= 16:
        raise ValueError("bits must be in [1, 16]")
    mask = (1 << bits) - 1
    sx = _spread_bits_sql(f"(CAST({x} AS BIGINT) & {mask})")
    sy = _spread_bits_sql(f"(CAST({y} AS BIGINT) & {mask})")
    return F.expr(f"{sx} | ({sy} << 1)")


def zorder_sql(x: str, y: str, bits: int = 16) -> str:
    """The identical expression as SQL text, for oracle twins."""
    mask = (1 << bits) - 1
    sx = _spread_bits_sql(f"(CAST({x} AS BIGINT) & {mask})")
    sy = _spread_bits_sql(f"(CAST({y} AS BIGINT) & {mask})")
    return f"{sx} | ({sy} << 1)"
