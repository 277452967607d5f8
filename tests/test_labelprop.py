"""Label propagation (operators/labelprop.py): hand-checkable community
structure, determinism, and tie-break semantics."""

from __future__ import annotations

from aspep_etl_spark.operators.labelprop import label_propagation


def _lp(spark, pairs, iters=4):
    df = spark.createDataFrame(pairs, "u long, v long")
    return {
        r["node"]: r["community"]
        for r in label_propagation(df, iters=iters).collect()
    }


def test_two_triangles_with_bridge(spark):
    # {1,2,3} and {4,5,6} cliques joined by (3,4): converges to two
    # communities labeled by each clique's dominant propagated label
    edges = [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)]
    out = _lp(spark, edges)
    assert out == {1: 1, 2: 1, 3: 1, 4: 3, 5: 3, 6: 3}


def test_single_clique_collapses_to_min_label(spark):
    edges = [(1, 2), (1, 3), (2, 3)]
    out = _lp(spark, edges)
    assert set(out.values()) == {1}


def test_deterministic_across_runs(spark):
    edges = [(i, j) for i in range(1, 8) for j in range(i + 1, 8) if (i + j) % 3]
    assert _lp(spark, edges) == _lp(spark, edges)


def test_one_round_adopts_most_frequent_min(spark):
    # node 10's neighbors carry labels {1,2,3} (identity init, all count
    # 1) -> after one round node 10 holds min label 1
    edges = [(10, 1), (10, 2), (10, 3)]
    out = _lp(spark, edges, iters=1)
    assert out[10] == 1
