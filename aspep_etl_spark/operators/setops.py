"""Set operations and canonical sort (SURVEY.md §2.6/§2.7, U1/O1)."""

from __future__ import annotations

from functools import reduce
from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def union_by_name(frames: Iterable[DataFrame]) -> DataFrame:
    """Union-all by column name, tolerating missing columns (null-filled).

    Parity with ``pd.concat(..., ignore_index=True)`` outer column alignment
    (reference assets.py:313,376,449).  Narrow op — no shuffle.
    """
    frames = list(frames)
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), frames)


def sort_canonical(df: DataFrame, keys=("state", "year", "gov_function")) -> DataFrame:
    """Global multi-key total sort (O1, reference assets.py:322).

    Spark implements this as a range-partitioned sort (sampled split points),
    which scales to arbitrary data sizes; only invoke at publish time — the
    canonical parquet store does not need a total order.
    """
    return df.orderBy(*keys)


def upsert_latest(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    order_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """CDC-style merge ([EXT]): latest-wins upsert of ``updates`` into
    ``base`` by ``keys``, ordered by ``order_col`` (a version / commit
    timestamp) with an optional total-order tie-break so the survivor is
    deterministic on every engine.

    Union-by-name (schemas may drift; missing columns null-fill) then one
    row_number window — a single shuffle on the key.  This is the
    pure-parquet equivalent of ``MERGE INTO``; with Delta/Iceberg the same
    call becomes the table format's native merge.
    """
    from pyspark.sql import Window

    merged = base.unionByName(updates, allowMissingColumns=True)
    order = [F.desc(order_col)] + [F.desc(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
