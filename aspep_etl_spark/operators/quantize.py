"""[EXT] Embedding quantization operators — int8 min/max quantize with
reconstruction-error accounting, the storage-shrink step before ANN
indexing at corpus scale.

All JVM-side array expressions (transform / zip_with / array_min/max) —
no Python, no shuffle; the only shuffle is the caller's final aggregate.
Rounding is ``floor(v + 0.5)`` rather than ``round`` so the half-way rule
is identical on every engine an oracle might run on.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def quantize_stats(vec_col: str) -> dict[str, Column]:
    """Per-vector int8 quantization signals: scale and max absolute
    reconstruction error of dequantize(quantize(x)).

    q_i = floor((x_i - min) / scale + 0.5) with scale = (max - min)/255
    (constant vectors get scale 1 so they quantize to all-zero losslessly).
    """
    e = F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))")
    mn = F.array_min(e)
    mx = F.array_max(e)
    scale = F.when(mx > mn, (mx - mn) / F.lit(255.0)).otherwise(F.lit(1.0))
    return {
        "q_scale": scale,
        "q_max_err": F.expr(
            "array_max(transform(__e, x -> abs(x - (__mn + "
            "CAST(floor((x - __mn) / __scale + 0.5D) AS INT) * __scale))))"
        ),
        "__e": e,
        "__mn": mn,
        "__scale": scale,
    }


def with_quantize_stats(df, vec_col: str = "embedding"):
    """Attach q_scale / q_max_err columns (helpers dropped)."""
    cols = quantize_stats(vec_col)
    return (
        df.withColumns({"__e": cols["__e"], "__mn": cols["__mn"], "__scale": cols["__scale"]})
        .withColumns({"q_scale": F.col("__scale"), "q_max_err": cols["q_max_err"]})
        .drop("__e", "__mn", "__scale")
    )
