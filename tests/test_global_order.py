"""Distributed total-order primitives (operators/global_order.py):
equality with the single-partition window forms they replace, integer
NTILE math, and decimal running-sum exactness across partition splits."""

from __future__ import annotations

from decimal import Decimal

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from aspep_etl_spark.operators.global_order import (
    global_row_number,
    global_running_sum,
    ntile_expr,
)


@pytest.fixture()
def frame(spark):
    # values with heavy ties so tie-break determinism is exercised
    rows = [(i, (i * 7) % 13, float((i * 3) % 5) + 0.25) for i in range(257)]
    return spark.createDataFrame(rows, "id long, k long, v double")


def test_global_row_number_matches_window_row_number(frame):
    order = [F.col("k").asc(), F.col("id").desc()]
    got, total = global_row_number(frame, order, rank_col="r", num_partitions=7)
    assert total == 257
    w = Window.orderBy(*order)
    want = frame.withColumn("r", F.row_number().over(w))
    assert (
        got.select("id", "r").exceptAll(want.select("id", "r")).isEmpty()
    )


@pytest.mark.parametrize("n,k", [(257, 10), (9, 10), (100, 7), (1, 3)])
def test_ntile_expr_matches_ntile(spark, n, k):
    df = spark.range(n).select((F.col("id") + 1).alias("rank"))
    got = df.withColumn("b", ntile_expr("rank", n, k))
    want = spark.range(n).select(
        (F.col("id") + 1).alias("rank"),
        F.ntile(k).over(Window.orderBy("id")).alias("b"),
    )
    assert got.exceptAll(want).isEmpty()


def test_global_running_sum_decimal_exact_any_split(frame):
    dec = frame.withColumn("d", F.col("v").cast("decimal(10,2)"))
    order = [F.col("v").desc(), F.col("id").asc()]
    w = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = dec.withColumn("cum", F.sum("d").over(w)).select("id", "cum")
    expected_total = dec.agg(F.sum("d")).first()[0]
    for nparts in (3, 11):
        got, total = global_running_sum(
            dec, order, "d", out_col="cum", num_partitions=nparts
        )
        assert got.select("id", "cum").exceptAll(want).isEmpty()
        assert isinstance(total, Decimal)
        assert total == expected_total


def test_global_row_number_empty_input(spark):
    df = spark.createDataFrame([], "id long, v double")
    got, total = global_row_number(df, [F.col("v").asc(), F.col("id").asc()])
    assert total == 0
    assert got.count() == 0
