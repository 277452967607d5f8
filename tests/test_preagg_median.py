"""Parity pin for ``grouped_median_mean_preagg`` — the r12 A/B twin of
the ``F.median`` percentile path (r11 VERDICT ask #4).

The A/B's verdict was a measured NEGATIVE (PERF.md r12: sf0.1 1.283 s →
2.107 s, sf1 0.865 s → 1.770 s, interleaved min-of-passes): lineitem's
``l_extendedprice`` is ~97% distinct, so the (keys, value) pre-aggregation
compresses nothing and pays an explode plus two extra Exchanges.
``a1_grouped_median`` therefore stays on ``F.median``.  The twin is kept
(unwired) because its selection math is the reusable part: it reproduces
``Percentile.getPercentile``'s double arithmetic exactly, which this test
pins so the A/B stays reproducible and the twin stays correct for inputs
where value cardinality IS low enough to win.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from aspep_etl_spark.operators.stats import (
    grouped_median_mean_preagg,
    grouped_stats_fused,
)
from aspep_etl_spark.sources.registry import load_table


@pytest.fixture(scope="module")
def sf(sf_dir):
    return sf_dir


def test_preagg_matches_percentile_path_exactly(spark, sf):
    """Bit-exact (pre-round) median parity and round-4 mean parity with
    the shipped fused aggregate, on the real a1 grouping."""
    li = load_table(spark, sf, "lineitem")
    keys = ["l_returnflag", "l_linestatus"]
    cols = ["l_quantity", "l_extendedprice"]
    a = grouped_stats_fused(li, keys, cols)
    b = grouped_median_mean_preagg(li, keys, cols)
    sel = lambda df: sorted(
        map(
            tuple,
            df.select(
                *keys,
                *[F.col(f"__median__{c}") for c in cols],
                *[F.round(f"__mean__{c}", 4) for c in cols],
            ).collect(),
        )
    )
    assert sel(a) == sel(b)


def test_preagg_median_even_and_odd_groups(spark):
    """Interpolated even-n midpoint and exact odd-n element, including a
    duplicated middle value (the getPercentile lowerKey==higherKey arm)."""
    rows = [
        ("a", 1.0), ("a", 3.0), ("a", 4.0), ("a", 10.0),     # even: (3+4)/2
        ("b", 1.0), ("b", 7.0), ("b", 9.0),                   # odd: 7
        ("c", 2.0), ("c", 5.0), ("c", 5.0), ("c", 8.0),       # even, dup mid: 5
    ]
    df = spark.createDataFrame(rows, "k string, v double")
    got = {
        r["k"]: r["__median__v"]
        for r in grouped_median_mean_preagg(df, ["k"], ["v"]).collect()
    }
    exp = {
        r["k"]: r["m"]
        for r in df.groupBy("k").agg(F.median("v").alias("m")).collect()
    }
    assert got == exp == {"a": 3.5, "b": 7.0, "c": 5.0}


def test_preagg_plan_is_codegen_hash_agg(spark, sf):
    """The twin's plan must carry the codegen hash partial aggregate at
    (keys, value) grain and no ObjectHashAggregate percentile buffers."""
    import contextlib
    import io

    li = load_table(spark, sf, "lineitem")
    df = grouped_median_mean_preagg(
        li, ["l_returnflag", "l_linestatus"], ["l_quantity", "l_extendedprice"]
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="simple")
    plan = buf.getvalue()
    assert "ObjectHashAggregate" not in plan
    assert "HashAggregate" in plan
