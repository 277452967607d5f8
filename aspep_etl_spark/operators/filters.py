"""Filters and point lookups (SURVEY.md §2.2, P5-P9).

All of these are plain Catalyst predicates: expressed declaratively they are
pushed to the parquet scan (check ``PushedFilters`` in the explain output)
and, for `year`, prune partitions of the canonical `partitionBy("year")`
store outright.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import max_abs_numeric


def filter_year_range(df: DataFrame, start: int, end: int, col: str = "year") -> DataFrame:
    """Half-open year-range predicate (P5, reference assets.py:281):
    start <= year < end.  Partition-prunes on the canonical store."""
    return df.filter((F.col(col) >= start) & (F.col(col) < end))


def filter_significant(df: DataFrame, numeric_cols: list[str], threshold: float = 1.0) -> DataFrame:
    """Row-significance filter (P8, reference assets.py:479-480): keep rows
    whose max |numeric| exceeds the threshold.  All-null rows drop (null
    predicate → filtered), matching pandas skipna + NaN>1 == False."""
    return df.filter(max_abs_numeric(numeric_cols) > threshold)


def point_lookup(df: DataFrame, conditions: dict[str, object], columns: list[str] | None = None):
    """Golden-row point lookup (P9, reference asset_checks.py:47-59).

    On the canonical store this compiles to partition pruning (year) +
    parquet row-group min/max skipping — not a full scan.
    """
    pred: Column = F.lit(True)
    for k, v in conditions.items():
        pred = pred & (F.col(k) == F.lit(v))
    out = df.filter(pred)
    if columns:
        out = out.select(*columns)
    return out
