"""Grouped cohort statistics + union-back (SURVEY.md §2.4, A1-A3).

``grouped_stats`` runs ONE aggregation pass computing every requested
statistic for every measure — a single shuffle on the grouping keys with
map-side partial aggregation (Catalyst's partial+final hash agg).  The
reference runs two separate pandas groupbys (assets.py:366-367); fusing them
halves the shuffle volume, which matters when the fact table is 100 TB.

Median is exact (`F.median`, Spark ≥3.4) by default.  At extreme scale
request ``"median_approx"`` instead — ``percentile_approx(c, 0.5,
accuracy)`` is a mergeable sketch (partial+final, no per-group sort),
and the golden-check budget is rel_tol=1e-3 (reference
asset_checks.py:60), well within approx reach at the default accuracy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .setops import union_by_name

#: percentile_approx accuracy (max rank error = 1/accuracy) for the
#: "median_approx" stat; 10⁴ keeps grouped medians well inside the
#: reference's rel 1e-3 golden budget while staying sketch-sized.
APPROX_MEDIAN_ACCURACY = 10_000

def _mean_ordered(c):
    """Mean as a left fold over the VALUE-SORTED group — bitwise
    run-reproducible (and cross-engine reproducible) regardless of
    partitioning, unlike ``F.avg`` whose float sum order is
    partition-dependent.  Only for bounded-grain cohorts (the ASPEP stats
    stage groups an already-aggregated fact: ≤ #states rows per group at
    ANY raw-data scale) — ``collect_list`` on an unbounded group would
    buffer it; use plain ``"mean"`` there."""
    vals = F.sort_array(F.collect_list(c))
    total = F.aggregate(vals, F.lit(0.0), lambda a, x: a + x)
    n = F.count(c)
    return F.when(n > 0, total / n)


_STAT_FNS = {
    "median": F.median,
    "mean": F.avg,
    "mean_ordered": _mean_ordered,
    "median_approx": lambda c: F.percentile_approx(
        c, F.lit(0.5), F.lit(APPROX_MEDIAN_ACCURACY)
    ),
}


def grouped_stats_fused(
    df: DataFrame,
    group_keys: list[str],
    stat_cols: list[str],
    stats: tuple[str, ...] = ("median", "mean"),
) -> DataFrame:
    """ONE aggregation computing every (stat, column) pair — a single
    shuffle with map-side partial agg; output columns are ``__{stat}__{col}``.
    """
    agg_exprs = [
        _STAT_FNS[s](F.col(c)).alias(f"__{s}__{c}")
        for c in stat_cols
        for s in stats
    ]
    return df.groupBy(*group_keys).agg(*agg_exprs)


def grouped_median_mean_preagg(
    df: DataFrame,
    group_keys: list[str],
    stat_cols: list[str],
) -> DataFrame:
    """Exact grouped median+mean via (keys, value) PRE-AGGREGATION
    (guide §2.3 "aggregate before you shuffle") — the A/B twin of the
    ``grouped_stats_fused`` percentile path (r11 VERDICT ask #4).

    Shape: one scan exploding each row into (col_id, value), a codegen
    hash partial+final aggregate at (keys, col_id, value) grain, a
    window cumsum per (keys, col_id) for weighted-rank selection, and a
    pivot back to one row per key group.  Versus ``F.median``'s
    ObjectHashAggregate this trades the Java-serialized per-task
    OpenHashMap percentile buffers (and the final single-task per-group
    sort of every distinct value) for codegen aggregation and a
    distributed sort — at the cost of two extra Exchanges of
    value-grain rows.

    Selection reproduces ``F.median``'s ``Percentile.getPercentile``
    double math exactly: position = 0.5·(n−1) (exact in binary64),
    lower/higher its floor/ceil, result
    (higher−position)·v[lower] + (position−lower)·v[higher] — so where
    both indices land on one distinct value the result is that value
    bit-for-bit, and the even-n midpoint is fl((vl+vh)/2) on both
    formulations.  Mean is Σ(value·count)/n — a different (but still
    partition-order-free per distinct value) summation than ``F.avg``'s;
    callers rounding to ≤6 dp are unaffected (verified against the
    DuckDB oracles at every SF).
    """
    from pyspark.sql import Window

    structs = F.array(
        *[
            F.struct(F.lit(i).alias("cid"), F.col(c).alias("v"))
            for i, c in enumerate(stat_cols)
        ]
    )
    g = (
        df.select(*group_keys, F.explode(structs).alias("s"))
        .groupBy(*group_keys, F.col("s.cid").alias("cid"), F.col("s.v").alias("v"))
        .agg(F.count("*").alias("cnt"))
    )
    part = [*group_keys, "cid"]
    w_run = (
        Window.partitionBy(*part)
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(*part)
    g = (
        g.withColumn("cum", F.sum("cnt").over(w_run))
        .withColumn("n", F.sum("cnt").over(w_all))
        .withColumn("wsum", F.sum(F.col("v") * F.col("cnt")).over(w_all))
    )
    pos = F.lit(0.5) * (F.col("n") - 1).cast("double")
    lo = F.floor(pos)
    hi = F.ceil(pos)
    prev = F.col("cum") - F.col("cnt")
    sel = (
        g.withColumn("vl", F.when((prev <= lo) & (lo < F.col("cum")), F.col("v")))
        .withColumn("vh", F.when((prev <= hi) & (hi < F.col("cum")), F.col("v")))
        .filter(F.col("vl").isNotNull() | F.col("vh").isNotNull())
        .groupBy(*part)
        .agg(
            F.max("vl").alias("vl"),
            F.max("vh").alias("vh"),
            F.first("n").alias("n"),
            F.first("wsum").alias("wsum"),
        )
    )
    posf = F.lit(0.5) * (F.col("n") - 1).cast("double")
    lof = F.floor(posf).cast("double")
    hif = F.ceil(posf).cast("double")
    median = F.when(
        lof == hif, F.col("vl")
    ).otherwise((hif - posf) * F.col("vl") + (posf - lof) * F.col("vh"))
    mean = F.col("wsum") / F.col("n").cast("double")
    per_col = sel.select(
        *group_keys,
        "cid",
        median.alias("__med"),
        mean.alias("__mean"),
    )
    aggs = []
    for i, c in enumerate(stat_cols):
        aggs.append(
            F.max(F.when(F.col("cid") == i, F.col("__med"))).alias(
                f"__median__{c}"
            )
        )
        aggs.append(
            F.max(F.when(F.col("cid") == i, F.col("__mean"))).alias(
                f"__mean__{c}"
            )
        )
    return per_col.groupBy(*group_keys).agg(*aggs)


def grouped_stats(
    df: DataFrame,
    group_keys: list[str],
    stat_cols: list[str],
    stats: tuple[str, ...] = ("median", "mean"),
) -> dict[str, DataFrame]:
    """Compute grouped statistics for every stat column in one shuffle.

    Returns {stat_name: DataFrame[group_keys..., stat_cols...]} — the fused
    aggregate is computed once and each per-stat view is a cheap projection.
    """
    fused = grouped_stats_fused(df, group_keys, stat_cols, stats)
    out = {}
    for s in stats:
        out[s] = fused.select(
            *group_keys, *[F.col(f"__{s}__{c}").alias(c) for c in stat_cols]
        )
    return out


def append_cohort_stats(
    fact: DataFrame,
    group_keys: list[str],
    stat_cols: list[str],
    exclude_filter=None,
    stat_labels: dict[str, str] | None = None,
    label_col: str = "state_code",
    scope_col: str | None = "state_scope",
    scope_value: str = "stats",
) -> DataFrame:
    """derive_stats' A1-A3 composite: grouped median+mean over the non-rollup
    rows, stamped with pseudo-key labels, unioned back into the fact table
    by name with missing columns null (reference assets.py:359-376).
    """
    stat_labels = stat_labels or {"median": "US-median", "mean": "US-mean"}
    base = fact.filter(exclude_filter) if exclude_filter is not None else fact
    per_stat = grouped_stats(base, group_keys, stat_cols, tuple(stat_labels))
    frames = [fact]
    for stat, label in stat_labels.items():
        stat_df = per_stat[stat].withColumn(label_col, F.lit(label))
        if scope_col is not None:
            stat_df = stat_df.withColumn(scope_col, F.lit(scope_value))
        frames.append(stat_df)
    return union_by_name(frames)


def sketch_median_rank_audit(
    spark,
    sf_dir: str,
    keys: tuple[str, ...] = ("l_returnflag", "l_linestatus"),
    cols: tuple[str, ...] = ("l_quantity", "l_extendedprice"),
    min_group: int = 100,
) -> dict:
    """Strong rank audit of the BENCHED sketch-median plan
    (``a1_grouped_median_sketch``), runnable from any sweep.

    The headline slot's DuckDB oracle only checks an in-[min,max] flag (the
    sketch value is engine-specific so it cannot be emitted raw) — a much
    weaker invariant than the rank-count audit its registry twin
    ``a1_grouped_median_approx`` carries.  This audit closes the gap
    mechanically: it recomputes the SAME single-pass
    ``percentile_approx(…, 0.5, APPROX_MEDIAN_ACCURACY)`` aggregate the
    bench slot runs, then rank-audits each group's percentile element
    against the raw rows — the element's occupied rank interval
    ``(lt, le]`` must intersect the slackened window ``n*(0.5 ± 0.01)``
    and the element must be genuine data (``le > lt``).  Any sketch
    regression (wrong rank, interpolated non-element) trips this audit
    even though the headline oracle would still hash-green.

    Returns ``{"ok", "groups_checked", "violations"}`` — callers decide
    whether to raise (pytest) or fail a sweep (check_correctness).
    """
    import math

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    acc = F.lit(APPROX_MEDIAN_ACCURACY)
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs.append(F.percentile_approx(c, F.lit(0.5), acc).alias(f"apx_{c}"))
    sk = li.groupBy(*keys).agg(*aggs)

    rank_aggs = [F.first("n_rows").alias("n_rows")]
    for c in cols:
        rank_aggs += [
            F.sum((F.col(c) < F.col(f"apx_{c}")).cast("long")).alias(f"lt_{c}"),
            F.sum((F.col(c) <= F.col(f"apx_{c}")).cast("long")).alias(f"le_{c}"),
        ]
    audited = li.join(F.broadcast(sk), list(keys)).groupBy(*keys).agg(*rank_aggs)

    checked = 0
    violations: list[str] = []
    for r in audited.collect():
        n = r["n_rows"]
        if n < min_group:  # tiny groups: the ±1% window rounds to nothing
            continue
        lo = math.ceil(n * 0.49)
        hi = math.floor(n * 0.51)
        group = {k: r[k] for k in keys}
        for c in cols:
            lt, le = r[f"lt_{c}"], r[f"le_{c}"]
            checked += 1
            if le <= lt:
                violations.append(f"{c}: non-element for {group}")
            elif not (le >= lo and lt < hi):
                violations.append(
                    f"{c}: rank interval ({lt}, {le}] misses [{lo}, {hi}) "
                    f"for n={n} in {group}"
                )
    if checked == 0:
        violations.append("audit skipped every group — input too small")
    return {"ok": not violations, "groups_checked": checked, "violations": violations}
