"""Strong rank audit applied to the BENCHED sketch-median plan.

``a1_grouped_median_sketch`` is the headline bench slot (one mergeable
streaming hash-agg, the actual 100 TB plan), but its DuckDB oracle only
checks an in-[min,max] flag — a much weaker invariant than the
rank-count audit that ``a1_grouped_median_approx`` carries (r9 ADVICE
nit).  This test closes that gap periodically: it recomputes the SAME
single-pass sketch aggregate the bench slot runs, then rank-audits each
group's percentile element against the raw data — the element's
occupied rank interval must intersect the slackened window
n*(0.5 +/- 1/accuracy*100) and it must be a genuine data element.  Any
sketch regression (wrong rank, interpolated non-element) fails here
even though the headline oracle would still hash-green.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from aspep_etl_spark.operators.stats import APPROX_MEDIAN_ACCURACY


def test_sketch_median_rank_window(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    keys = ["l_returnflag", "l_linestatus"]
    cols = ("l_quantity", "l_extendedprice")
    acc = F.lit(APPROX_MEDIAN_ACCURACY)

    # the bench slot's aggregate: ONE pass, mergeable partials only
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs.append(F.percentile_approx(c, F.lit(0.5), acc).alias(f"apx_{c}"))
    sk = li.groupBy(*keys).agg(*aggs)

    # rank audit: second scan joins the sketch back to the raw rows
    rank_aggs = [F.first("n_rows").alias("n_rows")]
    for c in cols:
        rank_aggs += [
            F.sum((F.col(c) < F.col(f"apx_{c}")).cast("long")).alias(f"lt_{c}"),
            F.sum((F.col(c) <= F.col(f"apx_{c}")).cast("long")).alias(f"le_{c}"),
        ]
    audited = li.join(F.broadcast(sk), keys).groupBy(*keys).agg(*rank_aggs)

    rows = audited.collect()
    assert rows, "no groups — fixture data missing"
    checked = 0
    for r in rows:
        n = r["n_rows"]
        if n < 100:  # the same small-group guard the contract documents
            continue
        lo = math.ceil(n * 0.49)
        hi = math.floor(n * 0.51)
        for c in cols:
            lt, le = r[f"lt_{c}"], r[f"le_{c}"]
            assert le > lt, f"{c}: sketch returned a non-element for {r}"
            assert le >= lo and lt < hi, (
                f"{c}: rank interval ({lt}, {le}] misses window "
                f"[{lo}, {hi}) for n={n} in group {r}"
            )
            checked += 1
    assert checked >= 4, "audit skipped every group — fixture too small"
