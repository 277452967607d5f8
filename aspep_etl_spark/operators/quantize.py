"""[EXT] Embedding quantization operators — int8 min/max quantize with
reconstruction-error accounting, the storage-shrink step before ANN
indexing at corpus scale.

All JVM-side array expressions (transform / zip_with / array_min/max) —
no Python, no shuffle; the only shuffle is the caller's final aggregate.
Rounding is ``floor(v + 0.5)`` rather than ``round`` so the half-way rule
is identical on every engine an oracle might run on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_quantize_stats(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Attach per-vector int8 quantization signals:

    - ``q_scale``: (max − min) / 255, with constant vectors getting scale 1
      so they quantize to all-zero losslessly;
    - ``q_max_err``: max absolute error of dequantize(quantize(x)) where
      q_i = floor((x_i − min) / scale + 0.5).

    Built entirely from ``Column`` objects (no pseudo-column plumbing), so
    it composes like any other ``withColumns`` call; Catalyst CSEs the
    repeated min/scale subtrees.
    """
    e = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    mn = F.array_min(e)
    mx = F.array_max(e)
    scale = F.when(mx > mn, (mx - mn) / F.lit(255.0)).otherwise(F.lit(1.0))

    def dequant(x: Column) -> Column:
        return mn + F.floor((x - mn) / scale + F.lit(0.5)).cast("int") * scale

    err = F.array_max(F.transform(e, lambda x: F.abs(x - dequant(x))))
    return df.withColumns({"q_scale": scale, "q_max_err": err})
