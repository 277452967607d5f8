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
