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


def _bucket(key: Column, seed: int, width: int) -> Column:
    h32 = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"cms{seed}"), F.lit("|"), key)), 1, 8),
        16,
        10,
    ).cast("long")
    return h32 % F.lit(width)


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Aggregate a key column into a Count-Min sketch relation
    (d, bucket, cnt) with one partial+final aggregation."""
    rows = df.select(
        F.posexplode(
            F.array(
                *[_bucket(F.col(key_col).cast("string"), s, width) for s in range(depth)]
            )
        ).alias("d", "bucket")
    )
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
    broadcast by construction (≤ depth·width rows)."""
    cols = keys.columns
    fan = keys.select(
        *cols,
        F.posexplode(
            F.array(
                *[_bucket(F.col(key_col).cast("string"), s, width) for s in range(depth)]
            )
        ).alias("d", "bucket"),
    )
    joined = fan.join(F.broadcast(cms), ["d", "bucket"], "left")
    return (
        joined.withColumn("__c", F.coalesce(F.col("cnt"), F.lit(0)))
        .groupBy(*cols)
        .agg(F.min("__c").cast("long").alias("cms_est"))
    )
