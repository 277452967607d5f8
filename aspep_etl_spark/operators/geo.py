"""[EXT] Geospatial radius join via grid-cell bucketing.

Spatial "find everything within R km" joins degenerate to a cartesian
product if written naively; the scalable relational form is the same
bucket-then-verify pattern as the interval join (operators/ranges.py):

1. assign every point to a (lat_cell, lon_cell) grid cell whose size is
   at least the search radius in degrees,
2. explode ONE side to its 3×3 neighborhood of cells and equi-join on
   the cell key (each candidate pair meets exactly once: the expanded
   side's offset that lands on the other point's cell is unique, and the
   id ordering kills the mirror match),
3. verify candidates with the exact haversine distance.

The join is a plain hash equi-join on the cell key — never a
BroadcastNestedLoopJoin (plan-pinned in tests) — and candidate volume is
bounded by local density, not corpus size.  At 100 TB the cell key is
also the storage partitioning (geohash-style layout), making the join
co-located.

The DuckDB oracle deliberately uses the BRUTE-FORCE all-pairs form, so
it independently verifies that the bucketing misses nothing (a bucketed
oracle would share any blind spot).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km (double), identical arithmetic to the
    SQL oracle's formula."""
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
        * F.sin(dlon / 2)
        * F.sin(dlon / 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def radius_join(
    points: DataFrame,
    radius_km: float,
    cell_deg: float,
    id_col: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """All point pairs (id_a < id_b) within ``radius_km``, via 3×3
    neighbor-cell candidate generation + exact haversine verify.

    ``cell_deg`` must cover the radius in degrees at the data's
    latitudes: radius_km/111.0 for latitude, radius_km/(111.0·cos(lat))
    for longitude — pick the larger.  Asserted lower bound for latitude
    only (longitude shrink is data-dependent).

    Antimeridian: when 360 divides evenly into ``cell_deg`` cells (the
    usual choice), longitude cells WRAP — a pair straddling ±180° meets
    in the wrapped neighbor cell like any other pair.  With a
    non-divisor ``cell_deg`` wrapping is impossible on a flat cell id,
    so pairs across ±180° would be silently missed — rejected outright
    rather than returning wrong results."""
    assert cell_deg * 111.0 >= radius_km, "cell_deg too small for radius"
    n_lon = 360.0 / cell_deg
    if abs(n_lon - round(n_lon)) > 1e-9:
        raise ValueError(
            f"cell_deg={cell_deg} does not divide 360 evenly; longitude "
            "cells could not wrap at the antimeridian and cross-meridian "
            "pairs would be silently dropped — pick a divisor of 360"
        )
    n_lon_cells = int(round(n_lon))
    assert n_lon_cells >= 4, "grid too coarse for distinct 3x3 neighborhoods"

    def _wrap(c: Column) -> Column:
        return F.pmod(c, F.lit(n_lon_cells))

    p = points.select(
        F.col(id_col).alias("id"),
        F.col(lat_col).alias("lat"),
        F.col(lon_col).alias("lon"),
        F.floor(F.col(lat_col) / cell_deg).cast("long").alias("cx"),
        _wrap(F.floor(F.col(lon_col) / cell_deg).cast("long")).alias("cy"),
    )
    offsets = F.expr(
        "explode(flatten(transform(sequence(-1, 1), "
        "dx -> transform(sequence(-1, 1), dy -> struct(dx, dy)))))"
    )
    expanded = p.select(
        F.col("id").alias("id_a"),
        F.col("lat").alias("lat_a"),
        F.col("lon").alias("lon_a"),
        "cx",
        "cy",
        offsets.alias("o"),
    ).select(
        "id_a",
        "lat_a",
        "lon_a",
        (F.col("cx") + F.col("o.dx")).alias("jx"),
        _wrap(F.col("cy") + F.col("o.dy")).alias("jy"),
    )
    base = p.select(
        F.col("id").alias("id_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    cand = expanded.join(base, ["jx", "jy"]).filter(F.col("id_a") < F.col("id_b"))
    dist = haversine_km(
        F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b")
    )
    return (
        cand.withColumn("distance_km", dist)
        .filter(F.col("distance_km") <= F.lit(radius_km))
        .select("id_a", "id_b", F.round("distance_km", 3).alias("distance_km"))
    )
