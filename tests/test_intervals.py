"""Interval-overlap join (operators/intervals.py): hand-checkable
overlap sets, grid-width invariance, and multi-cell de-duplication."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aspep_etl_spark.operators.intervals import interval_overlap_join


def _join(spark, lrows, rrows, grid):
    l = spark.createDataFrame(lrows, "lid long, s_start long, s_end long")
    r = spark.createDataFrame(rrows, "rid long, w_start long, w_end long")
    out = interval_overlap_join(l, r, "s_start", "s_end", "w_start", "w_end", grid)
    return sorted((row["lid"], row["rid"]) for row in out.collect())


CASES = [
    # (left, right, expected pairs)
    (
        [(1, 0, 100), (2, 200, 300), (3, 1000, 1000)],
        [(10, 50, 250), (20, 1000, 1000), (30, 301, 400)],
        [(1, 10), (2, 10), (3, 20)],
    ),
    # touching endpoints are overlaps for CLOSED intervals
    ([(1, 0, 100)], [(10, 100, 200), (20, 101, 200)], [(1, 10)]),
]


@pytest.mark.parametrize("grid", [7, 100, 10_000])
@pytest.mark.parametrize("lrows,rrows,expected", CASES)
def test_overlap_matches_brute_force_any_grid(spark, grid, lrows, rrows, expected):
    assert _join(spark, lrows, rrows, grid) == expected


def test_long_interval_spanning_many_cells_dedupes(spark):
    # left interval spans 50 cells of width 10 and overlaps one right
    # interval in 30 of them -> exactly ONE output pair
    out = _join(spark, [(1, 0, 500)], [(10, 200, 500)], 10)
    assert out == [(1, 10)]


def test_output_carries_both_sides_columns(spark):
    l = spark.createDataFrame([(1, 0, 10)], "lid long, s_start long, s_end long")
    r = spark.createDataFrame([(2, 5, 20)], "rid long, w_start long, w_end long")
    out = interval_overlap_join(l, r, "s_start", "s_end", "w_start", "w_end", 100)
    assert set(out.columns) == {"lid", "s_start", "s_end", "rid", "w_start", "w_end"}
