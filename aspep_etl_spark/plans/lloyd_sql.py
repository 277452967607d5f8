"""Shared DuckDB-CTE builder for the deterministic Lloyd's iterations.

The KMeans used by ``embedding_clusters`` (operators/clustering.py) is
deliberately oracle-replayable: pinned per-label init, fixed iteration
count, ``round(·, dp)`` on both the squared-distance argmin and the
centroid component means, ties to the lowest cluster id.  This module
unrolls those iterations as DuckDB CTEs so any consumer query (the
cluster × label profile, the SemDeDup semantic dedup) can build on the
IDENTICAL assignment relation.

Split out of ``plans/contract.py`` in round 6 so ``plans/analytics_r7.py``
can reuse the assignment chain without a circular import.
"""

from __future__ import annotations


def _assign_select(prev: str, dp: int) -> str:
    """The rounded-sq-distance argmin assignment against centroid CTE
    ``prev`` (ties -> lowest cluster id), as a ranked subquery."""
    return (
        f"SELECT v.vec_id, v.label, v.e, {prev}.cl,\n"
        f"       row_number() OVER (PARTITION BY v.vec_id ORDER BY\n"
        f"         round(list_dot_product(v.e, v.e) + list_dot_product({prev}.c, {prev}.c)\n"
        f"               - 2 * list_dot_product(v.e, {prev}.c), {dp}), {prev}.cl) AS rn\n"
        f"    FROM v, {prev}"
    )


def lloyd_assign_prefix(k: int = 4, iters: int = 3, dp: int = 6) -> str:
    """The WITH-chain through the final per-vector assignment CTE ``af``
    (vec_id, label, e, cl) — extend with further CTEs / a final SELECT."""
    parts = [
        f"""WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
c0 AS (
  SELECT label AS cl, e AS c FROM (
    SELECT label, e, row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
    FROM v WHERE label < {k}) WHERE rn = 1
)"""
    ]
    prev = "c0"
    for t in range(1, iters + 1):
        parts.append(
            f""",
a{t} AS (
  SELECT vec_id, label, e, cl FROM (
    {_assign_select(prev, dp)}) WHERE rn = 1
),
c{t} AS (
  SELECT cl, list(m ORDER BY pos) AS c FROM (
    SELECT cl, pos, round(avg(val), {dp}) AS m FROM (
      SELECT cl, unnest(e) AS val, generate_subscripts(e, 1) AS pos FROM a{t})
    GROUP BY cl, pos)
  GROUP BY cl
)"""
        )
        prev = f"c{t}"
    parts.append(
        f""",
af AS MATERIALIZED (
  SELECT vec_id, label, e, cl FROM (
    {_assign_select(prev, dp)}) WHERE rn = 1
)"""
    )
    return "".join(parts)


def lloyd_profile_sql(k: int = 4, iters: int = 3, dp: int = 6) -> str:
    """The full ``embedding_clusters`` oracle: cluster × label contingency
    over the final assignment."""
    return (
        lloyd_assign_prefix(k, iters, dp)
        + """
SELECT cl AS cluster, label, count(*)::BIGINT AS n FROM af
GROUP BY cl, label"""
    )
