"""Set operations and canonical sort (SURVEY.md §2.6/§2.7, U1/O1)."""

from __future__ import annotations

from functools import reduce
from typing import Iterable

from pyspark.sql import DataFrame


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
