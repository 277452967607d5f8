"""[EXT] Distributed power iteration — top principal component of an
embedding corpus (the PCA direction used for whitening, ABTT-style
dominant-direction removal, and drift monitoring in embedding pipelines).

Like the Lloyd's operator (``clustering.py``), the contract is pinned for
cross-engine reproducibility: deterministic init (e₀), a fixed iteration
count, and rounding at every aggregation boundary, so the whole
computation unrolls to ANSI SQL (the `embedding_top_component` oracle).

Scale design: each iteration is one map-only pass scoring every vector
against the current direction (a dim-sized literal) plus ONE posexplode
aggregation shuffle for the weighted sum; the driver only ever holds the
dim-sized direction vector — the same metadata-scale collect the KMeans
update makes.  The FINAL iteration stays entirely in-plan (the norm is a
broadcast scalar), so the returned DataFrame is distributed end-to-end.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _lit_arr(xs: list[float]) -> str:
    if not all(math.isfinite(x) for x in xs):
        raise ValueError("non-finite component in direction vector")
    return f"array({', '.join(f'{x!r}D' for x in xs)})"


def top_eigenvector(
    df: DataFrame,
    vec_col: str = "embedding",
    iters: int = 3,
    round_dp: int = 6,
) -> DataFrame:
    """Power-iterate v ← Σᵢ cᵢ (cᵢ·v) / ‖·‖ over mean-centered vectors
    cᵢ, starting from e₀, for ``iters`` rounds; returns the distributed
    (pos, loading) frame of the final normalized direction.

    Sign convention: power iteration's sign is init-dependent; with the
    pinned e₀ init and rounded updates it is deterministic (and identical
    in the SQL unroll), so no sign canonicalization is needed.
    """
    e = df.select(
        F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("e")
    )
    # mean vector (rounded) — one posexplode aggregation, dim-sized result
    mu = [
        float(r["m"])
        for r in (
            e.select(F.posexplode("e").alias("pos", "val"))
            .groupBy("pos")
            .agg(F.round(F.avg("val"), round_dp).alias("m"))
            .orderBy("pos")
            .collect()
        )
    ]
    dim = len(mu)
    # MATERIALIZATION FENCE (see PERF.md / operators/dedup.py): the
    # posexplode in weighted_sum would otherwise re-evaluate the
    # cast+zip_with centering per EMITTED ELEMENT (O(dim²) per row), and
    # the driver loop would rebuild it from the scan every iteration.
    # Persisted for the loop AND the returned plan's final pass; sweep
    # with cache.free_cached_blocks after consuming, like the dedup ops.
    centered = e.select(
        F.expr(f"zip_with(e, {_lit_arr(mu)}, (x, m) -> x - m)").alias("c")
    ).persist()

    def weighted_sum(v: list[float]) -> DataFrame:
        """w_p = round(Σᵢ (cᵢ·v) · cᵢ[p], dp) — map-only score + one
        posexplode aggregation."""
        scored = centered.select(
            "c",
            F.expr(
                f"aggregate(zip_with(c, {_lit_arr(v)}, (x, y) -> x * y),"
                f" 0D, (a, z) -> a + z)"
            ).alias("s"),
        )
        return (
            scored.select("s", F.posexplode("c").alias("pos", "cv"))
            .groupBy("pos")
            .agg(F.round(F.sum(F.col("s") * F.col("cv")), round_dp).alias("w"))
        )

    v = [1.0] + [0.0] * (dim - 1)
    for _ in range(iters - 1):
        rows = weighted_sum(v).orderBy("pos").collect()
        w = [float(r["w"]) for r in rows]
        norm = round(math.sqrt(sum(x * x for x in w)), round_dp)
        if norm == 0.0:
            raise ValueError("power iteration collapsed to the zero vector")
        v = [round(x / norm, round_dp) for x in w]

    # final round stays in-plan: norm is a broadcast scalar join
    wf = weighted_sum(v)
    norm_f = wf.agg(
        F.round(F.sqrt(F.sum(F.col("w") * F.col("w"))), round_dp).alias("n")
    )
    return wf.crossJoin(F.broadcast(norm_f)).select(
        "pos", F.round(F.col("w") / F.col("n"), round_dp).alias("loading")
    )
