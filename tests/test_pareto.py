"""Pareto frontier (orders_pareto_frontier + global_running_max): the
running-max sweep must equal the quadratic NOT-EXISTS dominance spec,
and the primitive must match a single-partition window."""

from __future__ import annotations

import pytest
from pyspark.sql import Window, functions as F

from aspep_etl_spark.operators.global_order import global_running_max


def test_running_max_equals_single_partition_window(spark):
    import random

    rng = random.Random(7)
    rows = [(i, rng.randint(0, 50), rng.randint(0, 10**6)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, k long, v long")
    got = global_running_max(
        df, [F.asc("k"), F.asc("id")], "v", "m", num_partitions=8
    )
    w = Window.orderBy(F.asc("k"), F.asc("id")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    want = df.withColumn("m", F.max("v").over(w))
    assert sorted(map(tuple, got.select("id", "m").collect())) == sorted(
        map(tuple, want.select("id", "m").collect())
    )


@pytest.mark.parametrize("n_points", [1, 50])
def test_frontier_equals_not_exists_spec(spark, n_points):
    import random

    rng = random.Random(13)
    pts = [(i, float(rng.randint(1, 30)), rng.randint(1, 30)) for i in range(n_points)]
    df = spark.createDataFrame(pts, "id long, price double, d long")
    dd = df.groupBy("price", "d").agg(F.count("*").alias("n"))
    swept = global_running_max(
        dd, [F.asc("price"), F.desc("d")], "d", "dmax", num_partitions=4
    )
    got = sorted(
        (r["price"], r["d"])
        for r in swept.filter(
            F.col("dmax").isNull() | (F.col("dmax") < F.col("d"))
        ).collect()
    )
    # quadratic spec in python
    uniq = {(p, d) for _, p, d in pts}
    want = sorted(
        (p, d)
        for (p, d) in uniq
        if not any(
            (q < p and e >= d) or (q == p and e > d) for (q, e) in uniq
        )
    )
    assert got == want
