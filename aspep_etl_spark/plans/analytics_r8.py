"""[EXT] Round-6 batch 4: HLL distinct sketch, record linkage, bucketed
join layout, and streaming dedup — each with a hash-exact DuckDB twin.

- ``events_hll_distinct`` — HyperLogLog distinct-count estimation per
  event type (Flajolet et al. 2007), reported against the exact
  distinct count.  Completes the mergeable-sketch family (CMS = counts,
  KMV = distincts at dim grain, AGMS = join sizes, Bloom = membership,
  quantile sketch = order statistics): unlike KMV's ``collect_set``
  state, the HLL register relation never exceeds m = 2^p rows per group
  at ANY cardinality, and the groupBy-max IS the merge, so the shuffle
  carries registers, not keys.  Every step is public md5/bit/integer
  arithmetic (ρ via binary digit COUNT, never float log2), so the
  registers AND the estimate are cross-engine reproducible; the one
  libm call (ln in the small-range correction) is absorbed by
  round(·, 4).
- ``customer_record_linkage`` — Fellegi–Sunter record linkage (1969):
  probabilistic entity resolution between two customer feeds.  The
  "dirty" second feed is derived deterministically (md5-hash-selected
  truncation / character-swap / prefix noise, cent-level balance
  jitter, segment dropout), then BLOCKING on (nationkey, 15-char name
  prefix) bounds candidate pairs — the no-all-pairs discipline every
  dedup operator here follows; records whose corruption touches the
  prefix (the '#'→'@' swap and the 'X'-prefix modes) fall outside
  their block — the classic blocking recall loss, REPORTED not hidden
  (true_match column).  Field agreement weights (levenshtein band on
  name, cent distance on balance, segment equality) are all multiples
  of 0.5, so the score sum is exact in both binary64 (Spark) and
  DECIMAL (DuckDB) — no literal-folding divergence by construction.
- ``layout_bucketed_join`` — bucketed-table co-located join: both join
  sides written with ``bucketBy(8, key).sortBy(key)``, so the join
  plans as a SortMergeJoin with ZERO Exchange and ZERO Sort (pinned in
  tests/test_physical_plans.py with broadcast disabled).  This is the
  data-layout half of the shuffle-avoidance story the zonemap /
  compaction / zorder entries started: at 100 TB the nightly
  orders⋈customer repeats daily, and pre-bucketing both fact tables
  amortizes the shuffle into the write path once.  Revenue totals are
  integer cents, so the aggregate is order-insensitive-exact.
- ``streaming_dedup`` — watermarked streaming deduplication
  (streaming/dedup.py): two unioned file-stream readers simulate
  at-least-once redelivery; ``withWatermark + dropDuplicates`` emits
  each event once with state bounded by one watermark window.  Oracle:
  the distinct event projection (single-file ⇒ single micro-batch
  promotion argument, as streaming_sessionize / streaming_stream_join).

Reference parity: all [EXT] — the reference (``process_aspep/``) is a
batch workbook pipeline with none of this tier.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.registry import load_table as _t

R8_QUERIES: dict = {}
R8_ORACLE_SQL: dict = {}


# --------------------------------------------------------------------------
# events_hll_distinct
# --------------------------------------------------------------------------

_HLL_P = 5  # m = 32 registers; 150 distinct users/type ⇒ raw-estimate path


def events_hll_distinct(spark, sf_dir):
    """Distinct users per event type: HLL(p=5) estimate vs exact count.
    m=32 is deliberately small so the raw-estimate branch (not just
    linear counting) fires on the testdata; the hand-value test
    exercises the linear-counting branch at tiny cardinality."""
    from ..operators.sketch import hll_build, hll_estimate

    ev = _t(spark, sf_dir, "events")
    reg = hll_build(ev, "user_id", ["event_type"], p=_HLL_P)
    est = hll_estimate(reg, ["event_type"], p=_HLL_P)
    exact = ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.count_distinct("user_id").alias("exact_distinct"),
    )
    return est.join(exact, "event_type").select(
        "event_type", "n_events", "exact_distinct", "hll_est"
    )


def _hll_sql() -> str:
    from ..operators.sketch import hll_alpha_mm

    p = _HLL_P
    m = 1 << p
    rem = 32 - p
    return f"""
WITH h AS (
  SELECT event_type,
         CAST('0x' || substr(md5('hll|' || user_id::VARCHAR), 1, 8) AS BIGINT) AS hv
  FROM events
), rhos AS (
  SELECT event_type, hv >> {rem} AS bucket,
         CASE WHEN hv % {1 << rem} = 0 THEN {rem + 1}
              ELSE {rem + 1} - length(bin(hv % {1 << rem})) END AS rho
  FROM h
), reg AS (
  SELECT event_type, bucket, max(rho) AS r FROM rhos GROUP BY event_type, bucket
), agg AS (
  SELECT event_type,
         sum(power(2.0::DOUBLE, -r)) AS zp,
         count(*) AS present
  FROM reg GROUP BY event_type
), est AS (
  SELECT event_type,
         CASE WHEN ({hll_alpha_mm(p)!r}::DOUBLE / (zp + ({m} - present))) <= {2.5 * m!r}::DOUBLE
                   AND ({m} - present) > 0
              THEN round({float(m)!r}::DOUBLE * ln({float(m)!r}::DOUBLE / ({m} - present)), 4)
              ELSE round({hll_alpha_mm(p)!r}::DOUBLE / (zp + ({m} - present)), 4)
         END AS hll_est
  FROM agg
), exact AS (
  SELECT event_type, count(*)::BIGINT AS n_events,
         count(DISTINCT user_id)::BIGINT AS exact_distinct
  FROM events GROUP BY event_type
)
SELECT e.event_type, x.n_events, x.exact_distinct, e.hll_est
FROM est e JOIN exact x USING (event_type)
"""


R8_QUERIES["events_hll_distinct"] = events_hll_distinct
R8_ORACLE_SQL["events_hll_distinct"] = _hll_sql()


# --------------------------------------------------------------------------
# events_hll_daily_rollup
# --------------------------------------------------------------------------


def events_hll_daily_rollup(spark, sf_dir):
    """Sketch REAGGREGATION — the property that justifies storing
    sketches instead of raw keys: daily HLL registers roll up to exact
    weekly registers by bucket-wise max, so the weekly distinct-user
    estimate needs NO second pass over the events.  At 100 TB this is
    the materialized-rollup pattern: persist ≤ m register rows per
    (day, dim) cell, answer any calendar-range distinct query by
    merging cells.  The naive alternative — summing daily estimates —
    overcounts returning users; both are emitted so the bias is
    visible next to the exact count."""
    from ..operators.sketch import hll_build, hll_estimate

    ev = _t(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", F.col("ts")).cast("date")
    )
    daily_reg = hll_build(ev, "user_id", ["day"], p=_HLL_P)
    week = F.date_trunc("week", F.col("day")).cast("date").alias("week")
    week_reg = daily_reg.select(week, "bucket", "r").groupBy("week", "bucket").agg(
        F.max("r").alias("r")
    )
    week_est = hll_estimate(week_reg, ["week"], p=_HLL_P).withColumnRenamed(
        "hll_est", "hll_est_week"
    )
    naive = (
        hll_estimate(daily_reg, ["day"], p=_HLL_P)
        .select(week, "hll_est")
        .groupBy("week")
        .agg(
            F.count("*").alias("n_days"),
            F.round(F.sum("hll_est"), 4).alias("sum_daily_est"),
        )
    )
    exact = (
        ev.select(F.date_trunc("week", F.col("ts")).cast("date").alias("week"), "user_id")
        .groupBy("week")
        .agg(F.count_distinct("user_id").alias("exact_distinct"))
    )
    return (
        week_est.join(naive, "week")
        .join(exact, "week")
        .select("week", "n_days", "exact_distinct", "hll_est_week", "sum_daily_est")
        .orderBy("week")
    )


def _hll_rollup_sql() -> str:
    from ..operators.sketch import hll_alpha_mm

    p = _HLL_P
    m = 1 << p
    rem = 32 - p
    est = (
        "CASE WHEN ({amm}::DOUBLE / (zp + ({m} - present))) <= {em}::DOUBLE"
        " AND ({m} - present) > 0"
        " THEN round({mf}::DOUBLE * ln({mf}::DOUBLE / ({m} - present)), 4)"
        " ELSE round({amm}::DOUBLE / (zp + ({m} - present)), 4) END"
    ).format(amm=repr(hll_alpha_mm(p)), m=m, em=repr(2.5 * m), mf=repr(float(m)))
    return f"""
WITH h AS (
  SELECT date_trunc('day', ts) AS day,
         CAST('0x' || substr(md5('hll|' || user_id::VARCHAR), 1, 8) AS BIGINT) AS hv
  FROM events
), rhos AS (
  SELECT day, hv >> {rem} AS bucket,
         CASE WHEN hv % {1 << rem} = 0 THEN {rem + 1}
              ELSE {rem + 1} - length(bin(hv % {1 << rem})) END AS rho
  FROM h
), daily_reg AS MATERIALIZED (
  SELECT day, bucket, max(rho) AS r FROM rhos GROUP BY day, bucket
), daily_est AS (
  SELECT day, {est.replace('zp', 'dzp').replace('present', 'dpresent')} AS hll_est
  FROM (SELECT day, sum(power(2.0::DOUBLE, -r)) AS dzp, count(*) AS dpresent
        FROM daily_reg GROUP BY day)
), week_reg AS (
  SELECT date_trunc('week', day) AS week, bucket, max(r) AS r
  FROM daily_reg GROUP BY week, bucket
), week_est AS (
  SELECT week, {est} AS hll_est_week
  FROM (SELECT week, sum(power(2.0::DOUBLE, -r)) AS zp, count(*) AS present
        FROM week_reg GROUP BY week)
), naive AS (
  SELECT date_trunc('week', day) AS week, count(*)::BIGINT AS n_days,
         round(sum(hll_est), 4) AS sum_daily_est
  FROM daily_est GROUP BY week
), exact AS (
  SELECT date_trunc('week', ts) AS week,
         count(DISTINCT user_id)::BIGINT AS exact_distinct
  FROM events GROUP BY week
)
SELECT w.week, n.n_days, x.exact_distinct, w.hll_est_week, n.sum_daily_est
FROM week_est w JOIN naive n USING (week) JOIN exact x USING (week)
ORDER BY w.week
"""


R8_QUERIES["events_hll_daily_rollup"] = events_hll_daily_rollup
R8_ORACLE_SQL["events_hll_daily_rollup"] = _hll_rollup_sql()


# --------------------------------------------------------------------------
# customer_record_linkage
# --------------------------------------------------------------------------


def customer_record_linkage(spark, sf_dir):
    """Blocked Fellegi–Sunter linkage of customer vs a deterministically
    dirtied copy of itself; emits pairs scoring ≥ 6.0 with per-field
    evidence and the ground-truth flag.  One equi-join on the
    (nationkey, name-prefix) block key — at corpus scale the prefix
    length grows with log10(n) to keep blocks bounded."""
    cust = _t(spark, sf_dir, "customer")
    hv = F.conv(
        F.substring(F.md5(F.concat(F.lit("rl|"), F.col("c_custkey").cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    base = cust.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.floor(F.col("c_acctbal") * 100).cast("long").alias("cents"),
        "c_mktsegment",
        hv.alias("hv"),
    )
    b = base.select(
        F.col("c_custkey").alias("b_key"),
        F.when(F.col("hv") % 4 == 1, F.expr("substring(c_name, 1, length(c_name) - 1)"))
        .when(F.col("hv") % 4 == 2, F.replace(F.col("c_name"), F.lit("#"), F.lit("@")))
        .when(F.col("hv") % 4 == 3, F.concat(F.lit("X"), F.col("c_name")))
        .otherwise(F.col("c_name"))
        .alias("b_name"),
        F.col("c_nationkey").alias("b_nat"),
        (F.col("cents") + F.col("hv") % 7 - 3).alias("b_cents"),
        F.when(F.col("hv") % 5 == 0, F.lit("UNKNOWN"))
        .otherwise(F.col("c_mktsegment"))
        .alias("b_segment"),
    )
    a = base.select(
        F.col("c_custkey").alias("a_key"),
        F.col("c_name").alias("a_name"),
        F.col("c_nationkey").alias("a_nat"),
        F.col("cents").alias("a_cents"),
        F.col("c_mktsegment").alias("a_segment"),
        F.substring("c_name", 1, 15).alias("blk"),
    )
    pairs = a.join(
        b,
        (F.col("a_nat") == F.col("b_nat"))
        & (F.col("blk") == F.substring("b_name", 1, 15)),
    )
    name_dist = F.levenshtein(F.col("a_name"), F.col("b_name"))
    cents_diff = F.abs(F.col("a_cents") - F.col("b_cents"))
    score = (
        F.when(name_dist == 0, F.lit(4.0)).when(name_dist <= 2, F.lit(2.5)).otherwise(F.lit(-2.0))
        + F.when(cents_diff <= 10, F.lit(3.0)).otherwise(F.lit(-1.5))
        + F.when(F.col("a_segment") == F.col("b_segment"), F.lit(1.0)).otherwise(F.lit(-0.5))
    )
    return (
        pairs.select(
            "a_key",
            "b_key",
            name_dist.cast("long").alias("name_dist"),
            cents_diff.alias("cents_diff"),
            F.round(score, 1).alias("score"),
            (F.col("a_key") == F.col("b_key")).alias("true_match"),
        )
        .filter(F.col("score") >= 6.0)
        .orderBy("a_key", "b_key")
    )


_RL_SQL = """
WITH h AS (
  SELECT c_custkey, c_name, c_nationkey,
         CAST(floor(c_acctbal * 100) AS BIGINT) AS cents,
         c_mktsegment,
         CAST('0x' || substr(md5('rl|' || c_custkey::VARCHAR), 1, 8) AS BIGINT) AS hv
  FROM customer
), b AS (
  SELECT c_custkey AS b_key,
         CASE WHEN hv % 4 = 1 THEN substr(c_name, 1, length(c_name) - 1)
              WHEN hv % 4 = 2 THEN replace(c_name, '#', '@')
              WHEN hv % 4 = 3 THEN 'X' || c_name
              ELSE c_name END AS b_name,
         c_nationkey AS b_nat,
         cents + (hv % 7) - 3 AS b_cents,
         CASE WHEN hv % 5 = 0 THEN 'UNKNOWN' ELSE c_mktsegment END AS b_segment
  FROM h
), a AS (
  SELECT c_custkey AS a_key, c_name AS a_name, c_nationkey AS a_nat,
         cents AS a_cents, c_mktsegment AS a_segment,
         substr(c_name, 1, 15) AS blk
  FROM h
), scored AS (
  SELECT a.a_key, b.b_key,
         levenshtein(a.a_name, b.b_name) AS name_dist,
         abs(a.a_cents - b.b_cents) AS cents_diff,
         (CASE WHEN levenshtein(a.a_name, b.b_name) = 0 THEN 4.0
               WHEN levenshtein(a.a_name, b.b_name) <= 2 THEN 2.5
               ELSE -2.0 END
          + CASE WHEN abs(a.a_cents - b.b_cents) <= 10 THEN 3.0 ELSE -1.5 END
          + CASE WHEN a.a_segment = b.b_segment THEN 1.0 ELSE -0.5 END) AS score
  FROM a JOIN b ON a.a_nat = b.b_nat AND a.blk = substr(b.b_name, 1, 15)
)
SELECT a_key, b_key, name_dist::BIGINT AS name_dist,
       cents_diff::BIGINT AS cents_diff,
       round(score, 1)::DOUBLE AS score,
       (a_key = b_key) AS true_match
FROM scored WHERE score >= 6.0 ORDER BY a_key, b_key
"""

R8_QUERIES["customer_record_linkage"] = customer_record_linkage
R8_ORACLE_SQL["customer_record_linkage"] = _RL_SQL


# --------------------------------------------------------------------------
# layout_bucketed_join
# --------------------------------------------------------------------------


def layout_bucketed_join(spark, sf_dir):
    """orders ⋈ customer revenue per market segment, read from
    bucketed+sorted tables so the join needs no shuffle and no sort.
    The bucketed copies are written once per (process, sf) under /tmp
    (8 buckets on the join key, the write-path shuffle that the nightly
    join then amortizes); subsequent calls in the same session reuse
    them via the catalog.  Revenue is exact integer cents."""
    import os
    import re

    tag = re.sub(r"\W+", "_", os.path.basename(os.path.normpath(sf_dir)))
    pid = os.getpid()
    base = f"/tmp/aspep_bucketed/{tag}_{pid}"
    ot = f"aspep_bkt_orders_{tag}_{pid}"
    ct = f"aspep_bkt_customer_{tag}_{pid}"
    if not spark.catalog.tableExists(ot):
        (
            _t(spark, sf_dir, "orders")
            .select("o_orderkey", "o_custkey", "o_totalprice")
            # one write task per bucket (same Murmur3 hash as bucketBy)
            # ⇒ exactly one file per bucket, the layout a compacted
            # production table would have
            .repartition(8, "o_custkey")
            .write.bucketBy(8, "o_custkey")
            .sortBy("o_custkey")
            .option("path", f"{base}/orders")
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(ot)
        )
    if not spark.catalog.tableExists(ct):
        (
            _t(spark, sf_dir, "customer")
            .select("c_custkey", "c_mktsegment")
            .repartition(8, "c_custkey")
            .write.bucketBy(8, "c_custkey")
            .sortBy("c_custkey")
            .option("path", f"{base}/customer")
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(ct)
        )
    o, c = spark.table(ot), spark.table(ct)
    j = o.join(c, o["o_custkey"] == c["c_custkey"])
    return (
        j.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias(
                "revenue_cents"
            ),
        )
        .orderBy("c_mktsegment")
    )


_BUCKETED_SQL = """
SELECT c.c_mktsegment,
       count(*)::BIGINT AS n_orders,
       sum(CAST(floor(o.o_totalprice * 100) AS BIGINT))::BIGINT AS revenue_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
"""

R8_QUERIES["layout_bucketed_join"] = layout_bucketed_join
R8_ORACLE_SQL["layout_bucketed_join"] = _BUCKETED_SQL


# --------------------------------------------------------------------------
# streaming_dedup
# --------------------------------------------------------------------------


def streaming_dedup(spark, sf_dir):
    """Watermarked streaming dedup over a doubled (simulated-redelivery)
    events stream — each event emitted exactly once; see
    streaming/dedup.py for the state-expiry story and the single-batch
    oracle-promotion argument."""
    from ..streaming.dedup import run_streaming_dedup

    return run_streaming_dedup(spark, f"{sf_dir}/events.parquet")


_STREAM_DEDUP_SQL = """
SELECT event_id, user_id, event_type,
       epoch_us(ts)::BIGINT AS ts_us, value
FROM events
"""

R8_QUERIES["streaming_dedup"] = streaming_dedup
R8_ORACLE_SQL["streaming_dedup"] = _STREAM_DEDUP_SQL
