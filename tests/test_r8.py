"""Value/structure tests for the round-6 batch-4 operators
(plans/analytics_r8.py): HLL registers and both estimate branches
against a hashlib+pure-Python recomputation, record-linkage match-set
derivation from the corruption recipe, the bucketed join's
shuffle-free plan, and streaming-dedup equality with the batch
distinct."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from aspep_etl_spark.operators.sketch import hll_alpha_mm, hll_build, hll_estimate
from aspep_etl_spark.plans.analytics_r8 import (
    customer_record_linkage,
    layout_bucketed_join,
)


def _md5i(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _py_hll(keys, p):
    """Independent register + estimate recomputation (pure Python)."""
    m = 1 << p
    rem = 32 - p
    regs: dict[int, int] = {}
    for k in keys:
        h = _md5i(f"hll|{k}")
        bucket, w = h >> rem, h % (1 << rem)
        rho = rem + 1 if w == 0 else rem + 1 - w.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rho)
    z = sum(2.0 ** -r for r in regs.values()) + (m - len(regs))
    e_raw = hll_alpha_mm(p) / z
    v = m - len(regs)
    if e_raw <= 2.5 * m and v > 0:
        return regs, round(m * math.log(m / v), 4)
    return regs, round(e_raw, 4)


def test_hll_registers_hand_values(spark):
    keys = [f"u{i}" for i in range(40)]
    df = spark.createDataFrame([Row(g="a", k=k) for k in keys])
    got = {
        (r["bucket"], r["r"])
        for r in hll_build(df, "k", ["g"], p=5).collect()
    }
    exp_regs, _ = _py_hll(keys, 5)
    assert got == set(exp_regs.items())


@pytest.mark.parametrize("n,p", [(5, 5), (500, 5), (60, 4)])
def test_hll_estimate_matches_python(spark, n, p):
    """Both branches: n=5 (linear counting), n=500 (raw estimate),
    n=60 @ p=4 (raw path at a different m / alpha constant)."""
    keys = [f"user-{i}" for i in range(n)]
    df = spark.createDataFrame([Row(g="x", k=k) for k in keys])
    reg = hll_build(df, "k", ["g"], p=p)
    est = hll_estimate(reg, ["g"], p=p).collect()[0]["hll_est"]
    _, exp = _py_hll(keys, p)
    assert est == exp


def test_hll_merge_is_register_max(spark):
    """Sketch(A ∪ B) == bucket-wise max-merge of Sketch(A), Sketch(B) —
    the mergeability that lets partial aggregation do the work."""
    a = spark.createDataFrame([Row(k=f"u{i}") for i in range(0, 120)])
    b = spark.createDataFrame([Row(k=f"u{i}") for i in range(80, 200)])
    whole = hll_build(a.union(b), "k", [], p=5)
    merged = (
        hll_build(a, "k", [], p=5)
        .union(hll_build(b, "k", [], p=5))
        .groupBy("bucket")
        .agg(F.max("r").alias("r"))
    )
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))


def test_hll_estimate_accuracy_on_events(spark, sf_dir):
    """m=32 ⇒ σ ≈ 1.04/√32 ≈ 18%; assert every per-type estimate is
    within 3σ of the exact distinct count."""
    rows = (
        __import__("aspep_etl_spark.plans.analytics_r8", fromlist=["x"])
        .events_hll_distinct(spark, sf_dir)
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r["hll_est"] - r["exact_distinct"]) <= 0.55 * r["exact_distinct"]


def test_hll_rollup_merge_equals_direct_build(spark, sf_dir):
    """The weekly estimate from max-merged DAILY registers must equal
    the estimate from registers built directly on the week's raw events
    — the reaggregation identity that lets rollups skip the raw pass."""
    from aspep_etl_spark.plans.analytics_r8 import _HLL_P, events_hll_daily_rollup
    from aspep_etl_spark.sources.registry import load_table

    out = {r["week"]: r["hll_est_week"] for r in events_hll_daily_rollup(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("week", F.col("ts")).cast("date").alias("week"), "user_id"
    )
    direct = hll_estimate(
        hll_build(ev, "user_id", ["week"], p=_HLL_P), ["week"], p=_HLL_P
    )
    exp = {r["week"]: r["hll_est"] for r in direct.collect()}
    assert out == exp


def test_record_linkage_match_set_from_recipe(spark, sf_dir):
    """Derive the expected TRUE-match key set straight from the
    corruption recipe: a self-pair survives iff its corruption mode
    keeps the 15-char block prefix (modes 0/1 — '#'→'@' and the 'X'
    prefix both break it) and the score clears 6.0 (segment dropout
    kills the 2.5-weight modes but not exact-name matches)."""
    import pandas as pd

    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    expected = set()
    for key in cust["c_custkey"]:
        hv = _md5i(f"rl|{key}")
        mode, seg_drop = hv % 4, hv % 5 == 0
        if mode in (2, 3):
            continue  # blocking miss: prefix corrupted
        name_w = 4.0 if mode == 0 else 2.5
        score = name_w + 3.0 + (-0.5 if seg_drop else 1.0)
        if score >= 6.0:
            expected.add(int(key))
    out = customer_record_linkage(spark, sf_dir).collect()
    got_true = {r["a_key"] for r in out if r["true_match"]}
    assert got_true == expected
    # structural: a name at distance > 2 can never clear the threshold
    assert all(r["name_dist"] <= 2 for r in out)
    # false positives are possible (near-key names + close balances) but
    # every one must carry the full balance+segment agreement evidence
    for r in out:
        if not r["true_match"]:
            assert r["cents_diff"] <= 10 and r["name_dist"] > 0


@pytest.fixture(scope="module")
def tiled_customer_dirs(sf_dir, tmp_path_factory):
    """customer tiled T× exactly the way tools/make_sfn.py scales sf1:
    keys offset by the stride, NAMES AND VALUES KEPT — the duplicate-name
    skew that blew the round-6 single-stream linkage plan up 11.2× at
    sf1."""
    import duckdb

    root = tmp_path_factory.mktemp("linkage_tiles")
    con = duckdb.connect()
    src = f"{sf_dir}/customer.parquet"
    stride = con.sql(f"SELECT max(c_custkey)+1 FROM '{src}'").fetchone()[0]
    dirs = {}
    for t in (2, 4):
        d = root / f"t{t}"
        d.mkdir()
        con.sql(
            f"""COPY (SELECT c_custkey + i*{stride} AS c_custkey, c_name,
                             c_nationkey, c_acctbal, c_mktsegment
                      FROM '{src}', range({t}) r(i))
                TO '{d}/customer.parquet' (FORMAT PARQUET)"""
        )
    con.close()
    return {t: str(root / f"t{t}") for t in (2, 4)}


def test_record_linkage_candidates_output_proportional_under_name_skew(
    spark, tiled_customer_dirs
):
    """Pin the round-7 two-stream linkage plan's candidate volume under
    duplicate-name tiling (the sf1 skew): candidate pairs must track the
    EMITTED output (which legitimately grows ~T² when every name has T
    copies), not the block-occupancy quadratic the old single-stream
    plan paid.  Measured on this corpus the ratio is exactly 1.0;
    the pin allows 3× headroom for corpus drift."""
    from aspep_etl_spark.plans.analytics_r8 import _linkage_candidates

    counts = {}
    for t, d in tiled_customer_dirs.items():
        cand = _linkage_candidates(spark, d).count()
        emit = customer_record_linkage(spark, d).count()
        counts[t] = (cand, emit)
        assert cand <= 3 * emit + 150 * t, (t, cand, emit)
    # growth T=2 → T=4 stays pinned to output growth (no superquadratic
    # block-mass term): candidate growth ≤ emitted growth × 1.25
    (c2, e2), (c4, e4) = counts[2], counts[4]
    assert c4 / c2 <= 1.25 * (e4 / e2), counts


def test_record_linkage_two_stream_plan_matches_brute_force(
    spark, tiled_customer_dirs
):
    """Set-level oracle for the lossless decomposition: on the T=2 tiled
    corpus (duplicate names present, so the exact-name stream carries
    a_key≠b_key pairs), a brute-force cross join scored with the same
    Fellegi–Sunter expressions and the ORIGINAL block-membership
    predicate must emit exactly the two-stream plan's pair set."""
    d = tiled_customer_dirs[2]
    from aspep_etl_spark.plans.analytics_r8 import _linkage_sides

    a, b = _linkage_sides(spark, d)
    brute = a.crossJoin(b)
    nd = F.levenshtein(F.col("a_name"), F.col("b_name"))
    cd = F.abs(F.col("a_cents") - F.col("b_cents"))
    score = (
        F.when(nd == 0, F.lit(4.0)).when(nd <= 2, F.lit(2.5)).otherwise(F.lit(-2.0))
        + F.when(cd <= 10, F.lit(3.0)).otherwise(F.lit(-1.5))
        + F.when(F.col("a_segment") == F.col("b_segment"), F.lit(1.0)).otherwise(F.lit(-0.5))
    )
    block = (
        (F.col("a_nat") == F.col("b_nat"))
        & (F.substring("a_name", 1, 15) == F.substring("b_name", 1, 15))
        & (
            F.abs(
                F.floor(F.col("a_cents") / 100.0).cast("long")
                - F.floor(F.col("b_cents") / 100.0).cast("long")
            )
            <= 1
        )
    )
    expected = {
        (r["a_key"], r["b_key"])
        for r in brute.filter(block & (score >= 6.0)).select("a_key", "b_key").collect()
    }
    got = {
        (r["a_key"], r["b_key"])
        for r in customer_record_linkage(spark, d).collect()
    }
    assert got == expected
    # and the tiled corpus really exercises the exact-name cross-tile path
    assert any(ak != bk for ak, bk in got)


def test_bucketed_join_plan_is_shuffle_free(spark, sf_dir):
    """With broadcast disabled, the bucketed orders⋈customer join must
    plan as a SortMergeJoin with exactly ONE Exchange in the whole
    query — the final groupBy's — i.e. the join itself reads both
    sides pre-partitioned from the bucket layout.  (Count nodes in
    mode='simple': formatted prints every node twice — PERF.md.)"""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = layout_bucketed_join(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # no shuffle on either join key — the only exchanges are the
        # final groupBy's (on c_mktsegment) and the orderBy's range
        assert "hashpartitioning(o_custkey" not in plan
        assert "hashpartitioning(c_custkey" not in plan
        assert plan.count("Exchange hashpartitioning") == 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_streaming_dedup_equals_batch_distinct(spark, sf_dir):
    """The doubled stream deduplicates back to exactly the batch event
    set — every event exactly once."""
    from aspep_etl_spark.sources.registry import load_table
    from aspep_etl_spark.streaming.dedup import run_streaming_dedup

    out = run_streaming_dedup(spark, f"{sf_dir}/events.parquet")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "value",
    )
    got = sorted(map(tuple, out.collect()))
    exp = sorted(map(tuple, ev.collect()))
    assert got == exp
