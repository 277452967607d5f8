"""[EXT] Count-Min sketch as a first-class dataflow relation.

Heavy-hitter detection on a high-cardinality key normally needs a full
groupBy on that key; a Count-Min sketch bounds the state at
depth × width counters regardless of input size, at the cost of
one-sided overestimation.  Like ``operators/bloom.py``, the sketch here
is a small RELATION, not a driver-side object:

- ``cms_build``: one aggregation producing (d, bucket, cnt) rows —
  at most depth·width of them.  The groupBy IS the merge operation:
  partial aggregation merges per-partition sketches map-side, so the
  shuffle carries counters, not keys.  Sketches from different inputs
  union+sum to the sketch of the union (mergeable — the property that
  makes CMS work in distributed and streaming settings).
- ``cms_estimate``: probe keys fan out to their depth (d, bucket)
  coordinates and broadcast-join the sketch; the estimate is the MIN
  counter across rows (missing bucket → 0).  Estimates NEVER
  underestimate the true count (structural; pinned in tests), and
  overestimate by at most ~2·N/width with probability 1 - 2^-depth.

Hashing reuses the md5 8-hex-prefix integer (seed-prefixed per row),
so a DuckDB oracle reproduces the sketch — and therefore the exact
estimates — bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(key: Column, seed: Column, width: int) -> Column:
    # seed is a COLUMN from an exploded 0..depth-1 sequence: exploding a
    # cheap literal sequence FIRST and hashing once per generated row
    # avoids the explode-fence pathology (an inline array-of-md5 child is
    # re-evaluated per emitted element — see operators/bloom.py, PERF.md)
    h32 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("cms"), seed.cast("string"), F.lit("|"), key)),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return h32 % F.lit(width)


def _seed_rows(k: int) -> Column:
    return F.explode(F.sequence(F.lit(0), F.lit(k - 1)))


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Aggregate a key column into a Count-Min sketch relation
    (d, bucket, cnt) with one partial+final aggregation."""
    rows = df.select(
        F.col(key_col).cast("string").alias("__k"), _seed_rows(depth).alias("d")
    ).select("d", _bucket(F.col("__k"), F.col("d"), width).alias("bucket"))
    return rows.groupBy("d", "bucket").agg(F.count("*").alias("cnt"))


def cms_estimate(
    keys: DataFrame,
    key_col: str,
    cms: DataFrame,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Append ``cms_est`` (long) per input row: the min-counter estimate
    of the key's frequency in the sketched input.  The sketch join is
    broadcast by construction (≤ depth·width rows).  Input rows must be
    distinct (the probe fan-out collapses back with a groupBy over the
    original columns)."""
    cols = keys.columns
    fan = keys.select(*cols, _seed_rows(depth).alias("d")).select(
        *cols,
        "d",
        _bucket(F.col(key_col).cast("string"), F.col("d"), width).alias("bucket"),
    )
    joined = fan.join(F.broadcast(cms), ["d", "bucket"], "left")
    return (
        joined.withColumn("__c", F.coalesce(F.col("cnt"), F.lit(0)))
        .groupBy(*cols)
        .agg(F.min("__c").cast("long").alias("cms_est"))
    )


def kmv_build(
    df: DataFrame, key_col: str, group_cols: list[str] | None = None, k: int = 64
) -> DataFrame:
    """K-minimum-values distinct sketch per group: the k smallest md5
    hashes of the key, as a sorted array column.

    The classic mergeable distinct estimator (Bar-Yossef et al.; the
    ancestor of HLL): hash values spread uniformly on [0, 1), so the
    k-th smallest hash h_k estimates distinct count as (k-1)/h_k.
    Unlike ``approx_count_distinct`` (whose HLL internals are
    engine-private) every step here is public md5 arithmetic, so the
    sketch AND the estimate are cross-engine reproducible — the property
    the oracle gate needs.

    Keys project map-side to an 8-hex md5 prefix (32 bits — collision
    mass is negligible against KMV's own ~1/sqrt(k) error for k ≤ ~2^10
    and cardinalities ≤ ~10^6), then one partial+final aggregate
    collects the distinct hashes per group and keeps the k smallest.
    Honest scale caveat: ``collect_set`` state grows with a group's
    distinct cardinality BEFORE the slice, so this form is for
    dim-cardinality groups (it is exact there anyway below k); at
    >10^6-distinct groups pre-shrink with a (group, hash) distinct +
    per-group rank ≤ k stage so the aggregate only ever sees k rows —
    same estimate, bounded state.
    """
    gcols = group_cols or []
    h = F.substring(F.md5(F.concat(F.lit("kmv|"), F.col(key_col).cast("string"))), 1, 8)
    rows = df.select(*gcols, h.alias("__h"))
    return (
        rows.groupBy(*gcols)
        .agg(F.slice(F.array_sort(F.collect_set("__h")), 1, k).alias("kmv"))
    )


def hll_build(
    df: DataFrame, key_col: str, group_cols: list[str] | None = None, p: int = 5
) -> DataFrame:
    """HyperLogLog register relation per group: (group..., bucket, r)
    with at most m = 2**p rows per group, r = max ρ seen in the bucket.

    Flajolet et al. 2007's estimator as PUBLIC arithmetic (unlike
    ``approx_count_distinct``, whose HLL register layout is
    engine-private): the md5 8-hex prefix is a 32-bit integer; the top
    ``p`` bits pick the register, and ρ = (number of leading zeros of
    the remaining ``32-p`` bits) + 1.  ρ is computed via the BINARY
    DIGIT COUNT of the remainder (``length(bin(w))``) — never
    ``floor(log2(w))``, whose float rounding at exact powers of two is
    engine-dependent — so the register relation is bit-for-bit
    reproducible in DuckDB.

    Like ``cms_build``/``kmv_build``, the groupBy IS the merge: partial
    aggregation folds per-partition registers map-side with ``max``, so
    the shuffle carries ≤ m rows per group regardless of input size —
    the mergeability that makes HLL the industry-standard distinct
    sketch at 100 TB (KMV's ``collect_set`` state grows with group
    cardinality until sliced; HLL's never exceeds m registers)."""
    gcols = group_cols or []
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("hll|"), F.col(key_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    rem_bits = 32 - p
    rows = df.select(
        *gcols,
        F.shiftright(h, rem_bits).cast("long").alias("bucket"),
        (h % F.lit(1 << rem_bits)).alias("__w"),
    ).select(
        *gcols,
        "bucket",
        F.when(F.col("__w") == 0, F.lit(rem_bits + 1))
        .otherwise(F.lit(rem_bits + 1) - F.length(F.conv(F.col("__w"), 10, 2)))
        .cast("int")
        .alias("rho"),
    )
    return rows.groupBy(*gcols, "bucket").agg(F.max("rho").alias("r"))


def hll_alpha_mm(p: int) -> float:
    """α_m · m² for the raw HLL estimate, folded to ONE binary64
    constant in Python so both engines consume the identical literal
    (DuckDB folds decimal-literal products in DECIMAL arithmetic,
    Spark in binary64 — injecting the pre-folded repr sidesteps the
    divergence; see PERF.md literal-folding rule)."""
    m = 1 << p
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1.0 + 1.079 / m))
    return alpha * m * m


def hll_estimate(registers: DataFrame, group_cols: list[str], p: int = 5) -> DataFrame:
    """Collapse a register relation to one ``hll_est`` row per group.

    Z = Σ 2^−r over all m registers (absent register ⇒ 2⁰ = 1); every
    2^−r is an exact binary64 power of two and the m-term sum spans
    < 53 bits, so Z is EXACT on both engines.  Raw estimate
    α_m·m²/Z, with Flajolet's small-range correction m·ln(m/V) when
    E ≤ 2.5m and V (empty registers) > 0 — the only libm call, absorbed
    by round(·, 4).  (The 32-bit large-range correction is omitted:
    cardinalities here are ≪ 2³²; a production corpus would hash to 64
    bits and never need it.)"""
    m = 1 << p
    amm = hll_alpha_mm(p)
    agg = registers.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("__z_present"),
        F.count("*").alias("__present"),
    )
    z = F.col("__z_present") + (F.lit(m) - F.col("__present")).cast("double")
    v = F.lit(m) - F.col("__present")
    e_raw = F.lit(amm) / z
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(e_raw)
    return agg.select(*group_cols, F.round(est, 4).alias("hll_est"))


def kmv_estimate(kmv_col: Column, k: int = 64) -> Column:
    """Distinct-count estimate from a KMV array: exact |sketch| when the
    group has fewer than k distinct hashes (the sketch IS the distinct
    set), else (k-1) / h_k with h_k scaled from the 8-hex prefix."""
    n = F.size(kmv_col)
    h_k = (
        F.conv(F.element_at(kmv_col, k), 16, 10).cast("double")
        / F.lit(float(1 << 32))
    )
    return F.when(n < k, n.cast("double")).otherwise(
        F.round(F.lit(float(k - 1)) / h_k, 4)
    )
