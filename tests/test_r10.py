"""Round-7 additions: incremental JOIN-view maintenance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _direct(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "c_mktsegment",
            F.date_trunc("month", F.col("o_orderdate")).cast("date").cast("string").alias("month"),
        )
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("long").alias("revenue_cents"),
        )
    )


def _rows(df):
    return {
        (r["c_mktsegment"], r["month"]): (r["n_orders"], r["revenue_cents"])
        for r in df.collect()
    }


def test_mv_join_incremental_equals_direct(spark, sf_dir):
    """The bilinear delta refresh merged into the base MV must equal the
    flat full recompute — the maintenance algebra end-to-end."""
    from aspep_etl_spark.plans.analytics_r10 import mv_join_incremental

    assert _rows(mv_join_incremental(spark, sf_dir)) == _rows(_direct(spark, sf_dir))


@pytest.mark.parametrize("omod,cmod", [(2, 3), (7, 1)])
def test_mv_join_split_invariance(spark, sf_dir, omod, cmod, monkeypatch):
    """The merged view must not depend on WHERE the base/delta split
    falls — including the degenerate all-customers-changed split
    (cmod=1 routes every customer into the delta side, so the base MV
    is empty and the refresh carries everything)."""
    import aspep_etl_spark.plans.analytics_r10 as r10

    monkeypatch.setattr(r10, "_MVJ_O_MOD", omod)
    monkeypatch.setattr(r10, "_MVJ_C_MOD", cmod)
    assert _rows(r10.mv_join_incremental(spark, sf_dir)) == _rows(_direct(spark, sf_dir))


def test_mv_join_delta_terms_nonempty(spark, sf_dir):
    """The chosen moduli actually exercise all three delta terms (a split
    that zeroes one term would let a broken bilinear expansion pass)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o_new = o.filter(F.col("o_orderkey") % 13 == 0)
    c_new = c.filter(F.col("c_custkey") % 17 == 0)
    o_old = o.filter(F.col("o_orderkey") % 13 != 0)
    c_old = c.filter(F.col("c_custkey") % 17 != 0)
    assert o_new.join(c_old, o_new.o_custkey == c_old.c_custkey).count() > 0
    assert o_old.join(c_new, o_old.o_custkey == c_new.c_custkey).count() > 0
    assert o_new.join(c_new, o_new.o_custkey == c_new.c_custkey).count() > 0


def test_mv_join_plan_broadcasts_dim_deltas(spark, sf_dir):
    """All three delta joins broadcast the dim side; no cartesian, no
    sort-merge join of fact with fact."""
    import contextlib
    import io

    from aspep_etl_spark.plans.analytics_r10 import mv_join_incremental

    df = mv_join_incremental(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="simple")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 4  # base + 3 delta dim joins


def test_mv_join_retraction_equals_post_delete_recompute(spark, sf_dir):
    from aspep_etl_spark.plans.analytics_r10 import mv_join_retraction

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderkey") % 19 != 0
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    direct = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "c_mktsegment",
            F.date_trunc("month", F.col("o_orderdate")).cast("date").cast("string").alias("month"),
        )
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("long").alias("revenue_cents"),
        )
    )
    assert _rows(mv_join_retraction(spark, sf_dir)) == _rows(direct)


def test_mv_join_retraction_full_cancellation_empties_view(spark, sf_dir, monkeypatch):
    """Degenerate pin of the zero-support drop rule: cancelling EVERY
    order must leave an empty view (exact integer zeros, no residue)."""
    import aspep_etl_spark.plans.analytics_r10 as r10

    monkeypatch.setattr(r10, "_MVJ_DEL_MOD", 1)
    assert r10.mv_join_retraction(spark, sf_dir).count() == 0


def test_mv_join_dim_update_equals_post_update_recompute(spark, sf_dir):
    """The retract/insert pair per affected fact row must move every
    order between segment groups exactly once."""
    from aspep_etl_spark.plans.analytics_r10 import mv_join_dim_update

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey",
        F.when(
            F.col("c_custkey") % 23 == 0, F.concat(F.col("c_mktsegment"), F.lit("_V2"))
        )
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
    )
    direct = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "c_mktsegment",
            F.date_trunc("month", F.col("o_orderdate")).cast("date").cast("string").alias("month"),
        )
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("long").alias("revenue_cents"),
        )
    )
    assert _rows(mv_join_dim_update(spark, sf_dir)) == _rows(direct)


def test_mv_join_dim_update_conserves_orders(spark, sf_dir):
    """A dim update relabels rows, never creates or destroys them: total
    n_orders and revenue must equal the base view's totals."""
    from aspep_etl_spark.plans.analytics_r10 import (
        mv_join_dim_update,
        mv_join_retraction,
    )

    upd = mv_join_dim_update(spark, sf_dir).agg(
        F.sum("n_orders"), F.sum("revenue_cents")
    ).first()
    base = _direct(spark, sf_dir).agg(
        F.sum("n_orders"), F.sum("revenue_cents")
    ).first()
    assert tuple(upd) == tuple(base)
